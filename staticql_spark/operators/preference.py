"""Pairwise-preference and label-quality operators for RLHF-style
training data.

A preference-data pipeline (reward modeling, arena evals, rater QC)
needs three readouts the pretraining operators don't cover:

- ``bt_ratings``: Bradley-Terry strength estimation from raw pairwise
  comparisons via the classic MM iteration (Hunter, "MM algorithms for
  generalized Bradley-Terry models", Annals of Statistics 2004) — the
  batch-correct way to rank models/completions from win/loss records
  (order-independent, unlike sequential Elo).
- ``win_matrix``: per-pair win rates with Wilson lower confidence
  bounds — the raw arena matrix behind the ratings.
- ``fleiss_kappa``: chance-corrected inter-rater agreement over
  categorical labels (Fleiss, Psychological Bulletin 1971; generalized
  to varying ratings-per-item) — the label-quality gate before any
  preference data enters training.

Scale shape (the 100 TB contract): raw comparisons/labels cross exactly
ONE map-side-combined shuffle into per-pair / per-item-category counts;
everything after runs on the aggregated table (O(items²) sparse pairs,
O(items × categories) counts), with the Bradley-Terry iterations
joining the tiny rating vector back as a broadcast — no collect, no
driver-side data loop, same idiom as classify.logreg_fit.

Engine portability (the oracle contract): rational arithmetic only
(division + one IEEE-exact sqrt in the Wilson bound — sqrt is correctly
rounded per IEEE 754, unlike libm transcendentals), per-iteration
``round(·, 9)`` determinism barriers, and every cross-row fold of
rounded doubles summed in DECIMAL(38,9) so summation order can't move
the result (the repo-wide exact-mean idiom).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import ensure_parallelism


def bt_ratings(
    comparisons: DataFrame,
    winner_col: str = "winner",
    loser_col: str = "loser",
    iters: int = 5,
    alpha: float = 0.5,
    out_round: int = 6,
) -> DataFrame:
    """Bradley-Terry ratings from raw (winner, loser) comparison rows.

    MM update (Hunter 2004, eq. 1.4): with w_ij = wins of i over j and
    n_ij = w_ij + w_ji, repeat
    ``pi_i <- W_i / sum_j n_ij / (pi_i + pi_j)`` (W_i = total wins of
    i), then rescale to mean 1 — the scale is not identified, and mean
    normalization keeps every op rational (a geometric mean would drag
    in exp/ln).  ``alpha`` adds a half-win smoothing to BOTH directions
    of every OBSERVED pair (keeps the comparison graph's MM update
    finite when an item never wins; unobserved pairs stay absent).

    Returns one row per item: (item, n_comps, wins, rating) — raw
    comparison/win counts plus the mean-1 strength, ``out_round``-dp.

    Determinism: pi starts at exactly 1.0; each iteration's denominator
    folds 9dp-rounded terms in DECIMAL(38,9); pi is re-rounded to 9dp
    after the mean rescale, so both engines walk the identical
    trajectory (the logreg_fit gradient-barrier strategy).

    Scale: ONE shuffle of the raw comparisons into unordered pair
    counts (map-side combinable); each iteration is one groupBy over
    the sparse pair table with the rating vector broadcast into it and
    a 1-row normalization crossJoin.  ``localCheckpoint(eager=False)``
    per iteration keeps the unrolled plan shallow.
    """
    w, l = F.col(winner_col).cast("long"), F.col(loser_col).cast("long")
    und = (
        ensure_parallelism(comparisons)
        .select(
            F.least(w, l).alias("lo"),
            F.greatest(w, l).alias("hi"),
            (w < l).cast("int").alias("lo_won"),
        )
        .groupBy("lo", "hi")
        .agg(
            (F.sum("lo_won").cast("double") + F.lit(alpha)).alias("wlo"),
            ((F.count("*") - F.sum("lo_won")).cast("double") + F.lit(alpha)).alias(
                "whi"
            ),
        )
    )
    n = (F.col("wlo") + F.col("whi")).alias("n")
    dir_ = (
        und.select(F.col("lo").alias("i"), F.col("hi").alias("j"),
                   F.col("wlo").alias("wij"), n)
        .unionAll(
            und.select(F.col("hi").alias("i"), F.col("lo").alias("j"),
                       F.col("whi").alias("wij"), n)
        )
        .localCheckpoint(eager=False)
    )
    wins = (
        dir_.groupBy("i")
        .agg(
            F.sum("wij").alias("w"),
            F.sum(F.col("wij") - F.lit(alpha)).cast("long").alias("wins_raw"),
            F.sum(F.col("n") - F.lit(2.0 * alpha)).cast("long").alias("n_comps"),
        )
        .localCheckpoint(eager=False)
    )
    pi = wins.select("i", F.lit(1.0).alias("pi"))
    d9 = lambda c: F.round(c, 9).cast("decimal(38,9)")
    for _ in range(iters):
        den = (
            dir_.join(F.broadcast(pi.select(F.col("i"), F.col("pi").alias("pi_i"))), "i")
            .join(
                F.broadcast(
                    pi.select(F.col("i").alias("j"), F.col("pi").alias("pi_j"))
                ),
                "j",
            )
            .groupBy("i")
            .agg(
                F.sum(d9(F.col("n") / (F.col("pi_i") + F.col("pi_j"))))
                .cast("double")
                .alias("den")
            )
        )
        raw = wins.join(den, "i").select(
            "i", (F.col("w") / F.col("den")).alias("praw")
        )
        s = raw.agg(
            F.sum(d9(F.col("praw"))).cast("double").alias("s"),
            F.count("*").cast("long").alias("n_items"),
        )
        pi = raw.crossJoin(F.broadcast(s)).select(
            "i",
            F.round(F.col("praw") * F.col("n_items") / F.col("s"), 9).alias("pi"),
        ).localCheckpoint(eager=False)
    return pi.join(wins, "i").select(
        F.col("i").alias("item"),
        F.col("n_comps"),
        F.col("wins_raw").alias("wins"),
        F.round(F.col("pi"), out_round).alias("rating"),
    )


def bt_ties(
    comparisons: DataFrame,
    a_col: str = "item_a",
    b_col: str = "item_b",
    outcome_col: str = "outcome",
    iters: int = 5,
    alpha: float = 0.5,
    out_round: int = 6,
) -> DataFrame:
    """Bradley-Terry ratings WITH ties (Rao & Kupper, JASA 1967) from raw
    (item_a, item_b, outcome) rows, outcome 0 = a wins, 1 = b wins,
    2 = tie.  Arena data has draws; :func:`bt_ratings`' plain MM must
    drop them, discarding real signal — here a tie counts toward BOTH
    items' numerators and the tie-propensity parameter theta >= 1 is
    estimated jointly: P(i beats j) = p_i / (p_i + theta p_j),
    P(tie) = (theta^2 - 1) p_i p_j / ((p_i + theta p_j)(p_j + theta p_i)).

    MM updates (Hunter, "MM algorithms for generalized Bradley-Terry
    models", Annals of Statistics 2004, §4 / model (4)): with
    a_ij = w_ij + t_ij (wins of i over j plus their ties, both
    ``alpha``-smoothed on observed pairs so the update stays finite and
    theta stays off its boundary),

        p_i   <- sum_j a_ij / D_i,
        D_i    = sum_j [ a_ij / (p_i + theta p_j)
                         + theta a_ji / (p_j + theta p_i) ],
        theta <- g + sqrt(g^2 + 1),   g = T / S,
        S      = sum_{i,j} a_ij p_j / (p_i + theta p_j),  T = total ties,

    cyclic per iteration (p first, then theta), mean-1 rescale on p.
    sqrt is IEEE-correctly-rounded, so the trajectory is engine-exact
    under the same 9dp DECIMAL(38,9) fold barriers as bt_ratings.

    Returns (item, n_comps, wins, ties, rating, theta) — raw counts, the
    mean-1 strength, and the shared tie parameter (same value every row).

    Scale: ONE map-side-combined shuffle of raw outcomes into unordered
    pair counts; each iteration re-keys the O(pairs) directed table with
    the rating vector broadcast in and theta riding as a 1-row broadcast
    — iteration cost independent of raw comparison volume, the
    bt_ratings plan contract.
    """
    a, b = F.col(a_col).cast("long"), F.col(b_col).cast("long")
    o = F.col(outcome_col).cast("int")
    # canonicalize to (lo, hi): lo_won / hi_won / tie indicator columns
    lo_is_a = a < b
    und = (
        ensure_parallelism(comparisons)
        .select(
            F.least(a, b).alias("lo"),
            F.greatest(a, b).alias("hi"),
            F.when(lo_is_a, (o == 0).cast("int"))
            .otherwise((o == 1).cast("int"))
            .alias("lo_won"),
            (o == 2).cast("int").alias("tied"),
        )
        .groupBy("lo", "hi")
        .agg(
            (F.sum("lo_won").cast("double") + F.lit(alpha)).alias("wlo"),
            (
                F.sum(1 - F.col("lo_won") - F.col("tied")).cast("double")
                + F.lit(alpha)
            ).alias("whi"),
            (F.sum("tied").cast("double") + F.lit(alpha)).alias("t"),
            F.count("*").cast("long").alias("n_raw"),
            F.sum("lo_won").cast("long").alias("wlo_raw"),
            F.sum("tied").cast("long").alias("t_raw"),
        )
    )
    # directed rows: a_ij = wins of i over j + their ties (smoothed)
    dir_ = (
        und.select(
            F.col("lo").alias("i"), F.col("hi").alias("j"),
            (F.col("wlo") + F.col("t")).alias("a"),
        )
        .unionAll(
            und.select(
                F.col("hi").alias("i"), F.col("lo").alias("j"),
                (F.col("whi") + F.col("t")).alias("a"),
            )
        )
        .localCheckpoint(eager=False)
    )
    counts = (
        und.select(
            F.col("lo").alias("i"), F.col("n_raw").alias("n"),
            F.col("wlo_raw").alias("w"), F.col("t_raw").alias("t"),
        )
        .unionAll(
            und.select(
                F.col("hi").alias("i"), F.col("n_raw").alias("n"),
                (F.col("n_raw") - F.col("wlo_raw") - F.col("t_raw")).alias("w"),
                F.col("t_raw").alias("t"),
            )
        )
        .groupBy("i")
        .agg(
            F.sum("n").cast("long").alias("n_comps"),
            F.sum("w").cast("long").alias("wins"),
            F.sum("t").cast("long").alias("ties"),
        )
        .localCheckpoint(eager=False)
    )
    num = dir_.groupBy("i").agg(F.sum("a").alias("numer")).localCheckpoint(
        eager=False
    )
    # T = total smoothed ties (each unordered pair's t counted once)
    tot = und.agg(
        F.sum(F.col("t")).alias("bigt"), F.count("*").cast("long").alias("n_pairs")
    ).localCheckpoint(eager=False)
    pi = num.select("i", F.lit(1.0).alias("pi"))
    theta = tot.select(F.lit(2.0).alias("theta"))
    d9 = lambda c: F.round(c, 9).cast("decimal(38,9)")
    for _ in range(iters):
        joined = (
            dir_.join(
                F.broadcast(pi.select(F.col("i"), F.col("pi").alias("pi_i"))), "i"
            )
            .join(
                F.broadcast(
                    pi.select(F.col("i").alias("j"), F.col("pi").alias("pi_j"))
                ),
                "j",
            )
            .join(F.broadcast(theta), how="cross")
            .withColumn(
                "x", F.col("a") / (F.col("pi_i") + F.col("theta") * F.col("pi_j"))
            )
        )
        # p update: row (i,j) credits x to D_i and theta*x to D_j
        den = (
            joined.select(F.col("i").alias("k"), F.col("x").alias("c"))
            .unionAll(
                joined.select(
                    F.col("j").alias("k"), (F.col("theta") * F.col("x")).alias("c")
                )
            )
            .groupBy("k")
            .agg(F.sum(d9(F.col("c"))).cast("double").alias("den"))
        )
        raw = num.join(den, num["i"] == den["k"]).select(
            "i", (F.col("numer") / F.col("den")).alias("praw")
        )
        s = raw.agg(
            F.sum(d9(F.col("praw"))).cast("double").alias("s"),
            F.count("*").cast("long").alias("n_items"),
        )
        pi = raw.crossJoin(F.broadcast(s)).select(
            "i",
            F.round(F.col("praw") * F.col("n_items") / F.col("s"), 9).alias("pi"),
        ).localCheckpoint(eager=False)
        # theta update at the NEW p: S = sum a_ij p_j / (p_i + theta p_j)
        sden = (
            dir_.join(
                F.broadcast(pi.select(F.col("i"), F.col("pi").alias("pi_i"))), "i"
            )
            .join(
                F.broadcast(
                    pi.select(F.col("i").alias("j"), F.col("pi").alias("pi_j"))
                ),
                "j",
            )
            .join(F.broadcast(theta), how="cross")
            .agg(
                F.sum(
                    d9(
                        F.col("a") * F.col("pi_j")
                        / (F.col("pi_i") + F.col("theta") * F.col("pi_j"))
                    )
                )
                .cast("double")
                .alias("s")
            )
        )
        g = F.col("bigt") / F.col("s")
        theta = tot.crossJoin(F.broadcast(sden)).select(
            F.round(g + F.sqrt(g * g + F.lit(1.0)), 9).alias("theta")
        ).localCheckpoint(eager=False)
    return (
        pi.join(counts, "i")
        .crossJoin(F.broadcast(theta))
        .select(
            F.col("i").alias("item"),
            "n_comps",
            "wins",
            "ties",
            F.round(F.col("pi"), out_round).alias("rating"),
            F.round(F.col("theta"), out_round).alias("theta"),
        )
    )


def win_matrix(
    comparisons: DataFrame,
    winner_col: str = "winner",
    loser_col: str = "loser",
    z: float = 1.96,
    out_round: int = 6,
) -> DataFrame:
    """Per-unordered-pair arena matrix: comparison count, directional
    wins, win rate of the lower-id item, and its Wilson score lower
    confidence bound (Wilson, JASA 1927) at ``z`` (default 95%) — the
    bound arena leaderboards rank by when counts are small, because a
    2/2 record must not outrank a 95/100 one.

    One map-side-combined shuffle of the raw comparisons; the Wilson
    arithmetic is rational ops plus one IEEE-exact sqrt, identical
    across engines.
    """
    w, l = F.col(winner_col).cast("long"), F.col(loser_col).cast("long")
    agg = (
        ensure_parallelism(comparisons)
        .select(
            F.least(w, l).alias("item_a"),
            F.greatest(w, l).alias("item_b"),
            (w < l).cast("int").alias("a_won"),
        )
        .groupBy("item_a", "item_b")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("a_won").cast("long").alias("wins_a"),
        )
    )
    nn = F.col("n").cast("double")
    p = F.col("wins_a").cast("double") / nn
    z2 = F.lit(z) * F.lit(z)
    num = p + z2 / (F.lit(2.0) * nn) - F.lit(z) * F.sqrt(
        (p * (F.lit(1.0) - p) + z2 / (F.lit(4.0) * nn)) / nn
    )
    den = F.lit(1.0) + z2 / nn
    return agg.select(
        "item_a",
        "item_b",
        "n",
        "wins_a",
        (F.col("n") - F.col("wins_a")).alias("wins_b"),
        F.round(p, out_round).alias("win_rate_a"),
        F.round(num / den, out_round).alias("wilson_lb_a"),
    )


def arena_sliding(
    comparisons: DataFrame,
    time_col: str = "t_us",
    winner_col: str = "winner",
    loser_col: str = "loser",
    window_us: int = 7 * 86400 * 1_000_000,
    slide_us: int = 2 * 86400 * 1_000_000,
    z: float = 1.96,
    out_round: int = 6,
    max_fanout: int = 1024,
) -> DataFrame:
    """Sliding-window arena matrix: :func:`win_matrix` per overlapping
    time window -> (win_start_us, item_a, item_b, n, wins_a, wins_b,
    win_rate_a, wilson_lb_a).

    A live leaderboard needs win rates over RECENT comparisons, not the
    all-time matrix — model updates and rater drift make month-old
    comparisons stale evidence.  Windows are [k*slide, k*slide+window);
    each comparison lands in the ceil(window/slide) windows containing
    its timestamp via an in-row ``sequence`` explode (bounded fan-out,
    guarded by ``max_fanout`` at construct time), then ONE map-side-
    combined shuffle aggregates (window, pair) counts.  The Wilson lower
    bound (Wilson, JASA 1927) is the same rational-ops-plus-IEEE-sqrt
    expression as :func:`win_matrix`, so small-n windows can't outrank
    well-sampled ones.

    Window membership uses exact LONG floor division (``asof``'s pmod
    idiom), so boundary timestamps bucket identically on any engine and
    for pre-epoch (negative) times.  ``time_col`` is integer epoch-µs
    (:func:`staticql_spark.operators.asof.epoch_us`).

    Scale: the explode multiplies rows by at most window/slide BEFORE
    the partial aggregate, and the partial aggregate collapses to
    |windows| x |observed pairs| per task — the exchange never carries
    per-comparison rows.  No window functions over raw rows, no
    collect; downstream rank-by-bound is a filter on the result.
    """
    if window_us <= 0 or slide_us <= 0:
        raise ValueError("window_us and slide_us must be positive")
    fanout = -(-window_us // slide_us)
    if fanout > max_fanout:
        raise ValueError(
            f"window/slide fan-out {fanout} exceeds max_fanout={max_fanout}; "
            "widen the slide or raise the cap deliberately"
        )
    from .asof import _floordiv_long

    t = F.col(time_col).cast("long")
    w, l = F.col(winner_col).cast("long"), F.col(loser_col).cast("long")
    k_min = _floordiv_long(t - F.lit(window_us), slide_us) + F.lit(1)
    k_max = _floordiv_long(t, slide_us)
    agg = (
        ensure_parallelism(comparisons)
        .select(
            F.explode(F.sequence(k_min, k_max)).alias("k"),
            F.least(w, l).alias("item_a"),
            F.greatest(w, l).alias("item_b"),
            (w < l).cast("int").alias("a_won"),
        )
        .groupBy("k", "item_a", "item_b")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("a_won").cast("long").alias("wins_a"),
        )
    )
    nn = F.col("n").cast("double")
    p = F.col("wins_a").cast("double") / nn
    z2 = F.lit(z) * F.lit(z)
    num = p + z2 / (F.lit(2.0) * nn) - F.lit(z) * F.sqrt(
        (p * (F.lit(1.0) - p) + z2 / (F.lit(4.0) * nn)) / nn
    )
    den = F.lit(1.0) + z2 / nn
    return agg.select(
        (F.col("k") * F.lit(slide_us)).alias("win_start_us"),
        "item_a",
        "item_b",
        "n",
        "wins_a",
        (F.col("n") - F.col("wins_a")).alias("wins_b"),
        F.round(p, out_round).alias("win_rate_a"),
        F.round(num / den, out_round).alias("wilson_lb_a"),
    )


def fleiss_kappa(
    labels: DataFrame,
    item_col: str = "item",
    cat_col: str = "cat",
    out_round: int = 6,
) -> DataFrame:
    """Fleiss' kappa over categorical labels, generalized to a varying
    number of ratings per item (items with fewer than 2 ratings carry
    no agreement signal and are excluded from BOTH the per-item mean
    and the chance marginals).

    Per kept item i with n_i ratings and category counts n_ij:
    ``P_i = (sum_j n_ij^2 - n_i) / (n_i (n_i - 1))`` (the fraction of
    agreeing rating pairs); ``P_bar`` is their mean; the chance rate is
    ``P_e = sum_j p_j^2`` with ``p_j`` the pooled category share; and
    ``kappa = (P_bar - P_e) / (1 - P_e)`` (0.0 when P_e == 1, i.e. a
    single observed category — agreement is then trivially complete
    and chance-uncorrectable).

    Returns ONE summary row: (n_items, n_ratings, p_bar, p_e, kappa).

    Determinism: P_i and p_j^2 are single divisions of exact integer
    counts; their cross-row folds sum 9dp-rounded values in
    DECIMAL(38,9).  Scale: one (item, cat) count shuffle, one per-item
    reduce, one per-category reduce — all map-side combinable; the
    summary is a 1-row crossJoin of two scalar aggregates.
    """
    cnt = (
        ensure_parallelism(labels)
        .groupBy(F.col(item_col).alias("item"), F.col(cat_col).alias("cat"))
        .agg(F.count("*").cast("long").alias("c"))
    )
    per = cnt.groupBy("item").agg(
        F.sum("c").alias("n_i"), F.sum(F.col("c") * F.col("c")).alias("s_i")
    )
    kept = per.filter(F.col("n_i") >= 2).localCheckpoint(eager=False)
    d9 = lambda c: F.round(c, 9).cast("decimal(38,9)")
    p_i = (F.col("s_i") - F.col("n_i")).cast("double") / (
        F.col("n_i") * (F.col("n_i") - F.lit(1))
    ).cast("double")
    pbar = kept.agg(
        F.count("*").cast("long").alias("n_items"),
        F.sum("n_i").cast("long").alias("n_ratings"),
        (F.sum(d9(p_i)).cast("double") / F.count("*")).alias("p_bar"),
    )
    catp = (
        cnt.join(kept.select("item"), "item")
        .groupBy("cat")
        .agg(F.sum("c").alias("cj"))
    )
    tot = catp.agg(F.sum("cj").alias("tot"))
    pj = F.col("cj").cast("double") / F.col("tot").cast("double")
    pe = (
        catp.crossJoin(F.broadcast(tot))
        .agg(F.sum(d9(pj * pj)).cast("double").alias("p_e"))
    )
    kappa = F.when(
        F.col("p_e") < 1.0,
        (F.col("p_bar") - F.col("p_e")) / (F.lit(1.0) - F.col("p_e")),
    ).otherwise(F.lit(0.0))
    return pbar.crossJoin(F.broadcast(pe)).select(
        "n_items",
        "n_ratings",
        F.round("p_bar", out_round).alias("p_bar"),
        F.round("p_e", out_round).alias("p_e"),
        F.round(kappa, out_round).alias("kappa"),
    )


def bt_reliability(
    comparisons: DataFrame,
    ratings: DataFrame,
    winner_col: str = "winner",
    loser_col: str = "loser",
    buckets: int = 5,
    out_round: int = 6,
) -> DataFrame:
    """Calibration audit for Bradley-Terry ratings -> one row per
    predicted-probability bucket: (bucket, n_pairs, n_comps, exp_rate,
    obs_rate, gap).

    The BT model predicts ``P(a beats b) = r_a / (r_a + r_b)``; a
    well-fit rating table's OBSERVED win rates should track that
    prediction across the probability range (the reliability-diagram
    idea behind doc_calibration, applied to the arena).  Pairs are
    bucketed by predicted probability (lower-id item's side, matching
    :func:`win_matrix`'s orientation), and each bucket compares the
    count-weighted expected rate against the observed one; ``gap`` is
    observed minus expected.  Pairs whose ratings sum to zero (both
    items at the 6dp floor) carry no prediction and are excluded.

    Determinism: predictions derive from the 6dp-rounded published
    ratings (the same numbers a consumer would read), the expected-win
    fold sums 9dp-rounded ``pred * n`` terms in DECIMAL(38,9), and the
    observed side is integer-exact.

    Scale: one comparison-count shuffle (shared shape with win_matrix);
    the ratings table joins in twice as a broadcast; buckets aggregate
    |pairs| rows.
    """
    w, l = F.col(winner_col).cast("long"), F.col(loser_col).cast("long")
    agg = (
        ensure_parallelism(comparisons)
        .select(
            F.least(w, l).alias("item_a"),
            F.greatest(w, l).alias("item_b"),
            (w < l).cast("int").alias("a_won"),
        )
        .groupBy("item_a", "item_b")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("a_won").cast("long").alias("wins_a"),
        )
    )
    ra = ratings.select(
        F.col("item").alias("item_a"), F.col("rating").alias("r_a")
    )
    rb = ratings.select(
        F.col("item").alias("item_b"), F.col("rating").alias("r_b")
    )
    joined = (
        agg.join(F.broadcast(ra), "item_a")
        .join(F.broadcast(rb), "item_b")
        .filter((F.col("r_a") + F.col("r_b")) > 0)
    )
    pred = F.col("r_a") / (F.col("r_a") + F.col("r_b"))
    bucket = F.least(
        F.floor(pred * F.lit(float(buckets))).cast("int"),
        F.lit(buckets - 1),
    )
    d9 = lambda c: F.round(c, 9).cast("decimal(38,9)")
    return (
        joined.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.sum("n").cast("long").alias("n_comps"),
            (
                F.sum(d9(pred * F.col("n"))).cast("double") / F.sum("n")
            ).alias("__exp"),
            (
                F.sum("wins_a").cast("double") / F.sum("n").cast("double")
            ).alias("__obs"),
        )
        .select(
            "bucket",
            "n_pairs",
            "n_comps",
            F.round("__exp", out_round).alias("exp_rate"),
            F.round("__obs", out_round).alias("obs_rate"),
            F.round(F.col("__obs") - F.col("__exp"), out_round).alias("gap"),
        )
    )


def rater_consensus(
    labels: DataFrame,
    item_col: str = "item",
    rater_col: str = "rater",
    cat_col: str = "cat",
    out_round: int = 6,
) -> DataFrame:
    """Per-rater agreement with the consensus -> (rater, n_labels,
    n_agree, agree_rate).

    :func:`fleiss_kappa` grades the rater POOL; this grades each rater:
    the share of their labels that match the item's modal label (ties
    broken toward the smallest category, so the consensus is
    deterministic).  The standard arena/rater-QC readout — a rater far
    below the pool's rate is miscalibrated or adversarial, and their
    labels get down-weighted or re-queued before the preference data
    trains anything.

    Items with a single rating are EXCLUDED (r9 ADVICE): the lone rater
    trivially defines the modal label and always "agrees" with
    themselves, inflating agree_rate — the same n_i >= 2 floor
    :func:`fleiss_kappa` applies, so the two QC readouts grade the same
    multiply-rated population.  A rater whose labels all land on
    singleton items gets no row (n_labels counts consensus-graded
    labels only).

    Scale: one (item, category) count shuffle (map-side combinable),
    a per-item window bounded by |categories| to pick the mode, one
    item-keyed join back onto the raw labels, one rater-keyed count
    aggregate.  agree_rate is a single integer division, rounded once.
    """
    from pyspark.sql import Window as W

    cnt = (
        ensure_parallelism(labels)
        .groupBy(F.col(item_col).alias("item"), F.col(cat_col).alias("cat"))
        .agg(F.count("*").alias("c"))
    )
    w = W.partitionBy("item").orderBy(F.desc("c"), F.asc("cat"))
    maj = (
        cnt.withColumn("rn", F.row_number().over(w))
        .withColumn("n_i", F.sum("c").over(W.partitionBy("item")))
        .filter((F.col("rn") == 1) & (F.col("n_i") >= 2))
        .select("item", F.col("cat").alias("maj_cat"))
    )
    per = labels.select(
        F.col(item_col).alias("item"),
        F.col(rater_col).alias("rater"),
        F.col(cat_col).alias("cat"),
    ).join(maj, "item")
    return (
        per.groupBy("rater")
        .agg(
            F.count("*").cast("long").alias("n_labels"),
            F.sum((F.col("cat") == F.col("maj_cat")).cast("int"))
            .cast("long")
            .alias("n_agree"),
        )
        .select(
            "rater",
            "n_labels",
            "n_agree",
            F.round(
                F.col("n_agree").cast("double") / F.col("n_labels").cast("double"),
                out_round,
            ).alias("agree_rate"),
        )
    )


def rater_bias(
    scores: DataFrame,
    item_col: str = "item",
    rater_col: str = "rater",
    score_col: str = "score",
    out_round: int = 6,
) -> DataFrame:
    """Per-rater severity/leniency on NUMERIC scores -> (rater, n_scored,
    mean_score, mean_gap).

    :func:`rater_consensus` grades categorical agreement; this is its
    numeric sibling and the second half of the rater-QC readout the r9
    verdict asked for: for every score a rater gave, compare it against
    the leave-one-out mean of the item's OTHER raters, and report the
    rater's average gap.  A consistently positive gap is a lenient
    rater, a negative one severe — the per-rater offset reward-model
    pipelines subtract (or down-weight) before training.  Items scored
    by a single rater are excluded (no peers to compare against — the
    same n_i >= 2 floor as fleiss_kappa / rater_consensus).

    Determinism: per-item sums fold 6dp-rounded scores in
    DECIMAL(38,6); the leave-one-out mean is one subtraction and one
    division of those exact sums; per-rater gap means fold 9dp-rounded
    gaps in DECIMAL(38,9) and divide once.

    Scale: one (item) count/sum shuffle (map-side combinable), one
    item-keyed equi join back onto the raw scores (AQE picks broadcast
    when the item table is small), one rater-keyed aggregate.  No
    windows over raw rows, no per-rater collect.
    """
    d6 = lambda c: F.round(c, 6).cast("decimal(38,6)")
    base = ensure_parallelism(scores).select(
        F.col(item_col).alias("item"),
        F.col(rater_col).alias("rater"),
        F.round(F.col(score_col).cast("double"), 6).alias("v"),
    ).filter(F.col("v").isNotNull())
    per_item = base.groupBy("item").agg(
        F.sum(d6(F.col("v"))).alias("isum"),
        F.count("*").cast("long").alias("n_i"),
    )
    j = base.join(per_item, "item").filter(F.col("n_i") >= 2)
    gap = F.col("v") - (
        (F.col("isum").cast("double") - F.col("v"))
        / (F.col("n_i") - F.lit(1)).cast("double")
    )
    return (
        j.groupBy("rater")
        .agg(
            F.count("*").cast("long").alias("n_scored"),
            (
                F.sum(d6(F.col("v"))).cast("double")
                / F.count("*").cast("double")
            ).alias("__mean"),
            (
                F.sum(F.round(gap, 9).cast("decimal(38,9)")).cast("double")
                / F.count("*").cast("double")
            ).alias("__gap"),
        )
        .select(
            "rater",
            "n_scored",
            F.round("__mean", out_round).alias("mean_score"),
            F.round("__gap", out_round).alias("mean_gap"),
        )
    )


def rater_severity(
    scores: DataFrame,
    reference: DataFrame,
    item_col: str = "item",
    rater_col: str = "rater",
    score_col: str = "score",
    ref_col: str = "ref_score",
    out_round: int = 6,
) -> DataFrame:
    """Per-rater severity vs a FIXED per-item reference -> (rater,
    n_scored, mean_score, mean_gap).

    :func:`rater_bias` compares each score against the leave-one-out
    mean of the item's OTHER raters — the right batch diagnostic, but
    its gaps are NOT order-free: every new label of an item retroactively
    moves every prior gap on that item, so there is no streamable state.
    This variant freezes the comparison point: ``reference`` is a
    per-item expected score (yesterday's item means, a golden
    calibration set, the deployed reward model's prediction), and each
    rater's gap is ``score - reference`` — a plain per-event quantity
    whose per-rater mean IS an order-free running sum.  That makes it
    the severity readout a live labeling dashboard can keep current
    (see :func:`~staticql_spark.streaming.stream_rater_severity`, the
    streaming twin that shares this exact arithmetic), at the cost of
    measuring drift against the frozen reference rather than against
    the live peer consensus.  Items absent from the reference are
    excluded (inner join) — they have no defined expectation.

    Determinism: scores and references are 6dp-rounded once; gaps are
    9dp-rounded and folded in DECIMAL(38,9), score means in
    DECIMAL(38,6) (the module's exact-mean idiom), each divided once.

    Scale: ONE item-keyed equi join (the reference is item-unique and
    usually dimension-sized — AQE broadcasts it) + one rater-keyed
    map-side-combinable aggregate.  No windows, no self-join, no
    per-item state.
    """
    d6 = lambda c: F.round(c, 6).cast("decimal(38,6)")
    base = ensure_parallelism(scores).select(
        F.col(item_col).alias("item"),
        F.col(rater_col).alias("rater"),
        F.round(F.col(score_col).cast("double"), 6).alias("v"),
    ).filter(F.col("v").isNotNull())
    ref = reference.select(
        F.col(item_col).alias("item"),
        F.round(F.col(ref_col).cast("double"), 6).alias("ref"),
    ).filter(F.col("ref").isNotNull())
    j = base.join(ref, "item")
    gap = F.col("v") - F.col("ref")
    return (
        j.groupBy("rater")
        .agg(
            F.count("*").cast("long").alias("n_scored"),
            (
                F.sum(d6(F.col("v"))).cast("double")
                / F.count("*").cast("double")
            ).alias("__mean"),
            (
                F.sum(F.round(gap, 9).cast("decimal(38,9)")).cast("double")
                / F.count("*").cast("double")
            ).alias("__gap"),
        )
        .select(
            "rater",
            "n_scored",
            F.round("__mean", out_round).alias("mean_score"),
            F.round("__gap", out_round).alias("mean_gap"),
        )
    )


def krippendorff_alpha(
    labels: DataFrame,
    item_col: str = "item",
    cat_col: str = "cat",
    out_round: int = 6,
) -> DataFrame:
    """Krippendorff's alpha (nominal data) over categorical labels — the
    missing-data-robust reliability coefficient that complements
    :func:`fleiss_kappa`: alpha is defined for ANY pattern of raters per
    item (kappa's varying-n_i generalization is ad hoc; alpha's
    coincidence-matrix formulation is the canonical one, Krippendorff
    2004 ch. 11).

    Per item i with n_i >= 2 ratings and per-category counts n_ic
    (single-rating items carry no pairable values and are excluded):

    - observed disagreement mass ``sum_i (n_i^2 - sum_c n_ic^2)/(n_i-1)``
      (ordered cross-category rating pairs, coincidence-normalized),
    - expected from the pooled marginals:
      ``alpha = 1 - (n-1) * observed / (n^2 - sum_c n_c^2)``
      with ``n = sum n_i`` and ``n_c`` the pooled category totals.

    Returns ONE row: (n_items, n_ratings, d_o, d_e, alpha), where d_o /
    d_e are the per-pair disagreement rates (observed/n and
    (n^2-sum n_c^2)/(n(n-1))).  A single observed category makes
    disagreement impossible AND unexpected (d_e = 0): alpha = 1.0 by
    convention (complete, chance-uncorrectable agreement — mirrors
    fleiss_kappa's documented degenerate-marginals policy).

    Determinism: everything is exact integer counts except the per-item
    division by (n_i - 1); those quotients are 9dp-rounded and folded in
    DECIMAL(38,9) (the fleiss_kappa barrier).  Scale: one (item, cat)
    count shuffle, one per-item reduce, one per-category reduce — all
    map-side combinable; the summary is a 1-row crossJoin of two scalar
    aggregates.
    """
    cnt = (
        ensure_parallelism(labels)
        .groupBy(F.col(item_col).alias("item"), F.col(cat_col).alias("cat"))
        .agg(F.count("*").cast("long").alias("c"))
    )
    per = cnt.groupBy("item").agg(
        F.sum("c").alias("n_i"), F.sum(F.col("c") * F.col("c")).alias("s_i")
    )
    kept = per.filter(F.col("n_i") >= 2).localCheckpoint(eager=False)
    d9 = lambda c: F.round(c, 9).cast("decimal(38,9)")
    term = (F.col("n_i") * F.col("n_i") - F.col("s_i")).cast("double") / (
        F.col("n_i") - F.lit(1)
    ).cast("double")
    obs = kept.agg(
        F.count("*").cast("long").alias("n_items"),
        F.sum("n_i").cast("long").alias("n_ratings"),
        F.sum(d9(term)).cast("double").alias("o_mass"),
    )
    catp = (
        cnt.join(kept.select("item"), "item")
        .groupBy("cat")
        .agg(F.sum("c").alias("cj"))
        .agg(F.sum(F.col("cj") * F.col("cj")).cast("long").alias("s_c"))
    )
    n = F.col("n_ratings").cast("double")
    d_o = F.col("o_mass") / n
    d_e = (n * n - F.col("s_c").cast("double")) / (n * (n - F.lit(1.0)))
    alpha = F.when(
        (n * n - F.col("s_c").cast("double")) == F.lit(0.0), F.lit(1.0)
    ).otherwise(
        F.lit(1.0)
        - (n - F.lit(1.0))
        * F.col("o_mass")
        / (n * n - F.col("s_c").cast("double"))
    )
    return obs.crossJoin(catp).select(
        "n_items",
        "n_ratings",
        F.round(d_o, out_round).alias("d_o"),
        F.round(d_e, out_round).alias("d_e"),
        F.round(alpha, out_round).alias("alpha"),
    )


def consensus_labels(
    labels: DataFrame,
    item_col: str = "item",
    cat_col: str = "cat",
    out_round: int = 6,
) -> DataFrame:
    """Per-item consensus label -> (item, n_labels, consensus_cat,
    n_consensus, consensus_share).

    The ITEM-side companion to :func:`rater_consensus` (which grades
    raters against this very modal label): for every labeled item,
    the modal category (ties broken toward the smallest category, so
    the consensus is deterministic), how many labels back it, and the
    share of the item's labels that agree.  This is the frame a
    labeling pipeline materializes as its "current truth" table — the
    streaming twin (:func:`staticql_spark.streaming.stream_consensus`)
    keeps it live as label events arrive.

    Singleton items ARE included (their consensus is trivially their
    one label, share 1.0): unlike rater grading, downstream consumers
    of the consensus table need a row for every labeled item.

    Scale: one (item, category) count shuffle (map-side combinable) and
    a per-item window bounded by |categories| — never a window or join
    over the raw label rows.
    """
    from pyspark.sql import Window as W

    cnt = (
        ensure_parallelism(labels)
        .groupBy(F.col(item_col).alias("item"), F.col(cat_col).alias("cat"))
        .agg(F.count("*").cast("long").alias("c"))
    )
    w = W.partitionBy("item").orderBy(F.desc("c"), F.asc("cat"))
    return (
        cnt.withColumn("rn", F.row_number().over(w))
        .withColumn("n_labels", F.sum("c").over(W.partitionBy("item")))
        .filter(F.col("rn") == 1)
        .select(
            "item",
            F.col("n_labels").cast("long").alias("n_labels"),
            F.col("cat").alias("consensus_cat"),
            F.col("c").alias("n_consensus"),
            F.round(
                F.col("c").cast("double") / F.col("n_labels").cast("double"),
                out_round,
            ).alias("consensus_share"),
        )
    )


def rater_confusion(
    labels: DataFrame,
    item_col: str = "item",
    rater_col: str = "rater",
    cat_col: str = "cat",
) -> DataFrame:
    """Per-rater confusion matrix vs the item consensus -> (rater,
    consensus_cat, label_cat, n) — the CATEGORY-RESOLVED rater-QC
    readout: :func:`rater_consensus` says how often a rater agrees with
    the modal label, this says WHAT they confuse it with (systematically
    labeling "harmful" as "borderline" is a different intervention than
    random noise), which is the matrix a labeling-ops dashboard renders
    per rater before deciding re-training vs down-weighting.

    The consensus is :func:`consensus_labels`' modal pick (ties toward
    the smallest category — deterministic), INCLUDING the rater's own
    label in the vote; diagonal cells (consensus_cat = label_cat) are
    the agreements.  Exact integer counts only — nothing to round,
    engine-exact by construction.

    Scale: the raw label stream crosses exactly ONE map-side-combined
    (item, rater, category) count shuffle; the per-item consensus is
    derived from THAT aggregate (a second groupBy over the already-
    aggregated frame — never a second scan of raw labels), the modal
    window runs over the |items| x |categories|-bounded count frame,
    and the final join keys the two small aggregates on item (AQE
    broadcasts the one-row-per-item consensus side).  Output bounded by
    |raters| x |categories|^2 rows.
    """
    from pyspark.sql import Window as W

    g = (
        ensure_parallelism(labels)
        .groupBy(
            F.col(item_col).alias("item"),
            F.col(rater_col).alias("rater"),
            F.col(cat_col).alias("label_cat"),
        )
        .agg(F.count("*").cast("long").alias("n"))
        .localCheckpoint(eager=False)
    )
    # consensus from the SAME aggregate: per-(item, cat) totals, modal
    # pick with the consensus_labels (count desc, cat asc) tiebreak
    cnt = g.groupBy("item", F.col("label_cat").alias("cat")).agg(
        F.sum("n").cast("long").alias("c")
    )
    w = W.partitionBy("item").orderBy(F.desc("c"), F.asc("cat"))
    cons = (
        cnt.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("item", F.col("cat").alias("consensus_cat"))
    )
    return (
        g.join(cons, "item")
        .groupBy("rater", "consensus_cat", "label_cat")
        .agg(F.sum("n").cast("long").alias("n"))
    )
