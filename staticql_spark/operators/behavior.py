"""User-behavior analytics over event logs — cohort retention and
ordered funnels.  (The first-order transition matrix lives as the
`events_markov` entry composition and its stateful streaming twin
`streaming.stream_event_transitions` — not duplicated here.)

The product-analytics layer a training-data pipeline's upstream event
store answers questions from (parity surface: the reference's events
fixtures exercise grouped aggregation + ordering, reference
src/query/*.ts; these operators extend that family the way a warehouse
would).  Every operator reduces the raw event stream to a per-user or
per-pair frame FIRST — group sizes bound the shuffle, raw events never
cross the wire more than once — and every output is deterministic
(explicit tiebreaks, 6-dp rounding before any threshold/ordering) so
the DuckDB oracles hash-match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def retention_matrix(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_age_days: int = 30,
) -> DataFrame:
    """Cohort retention triangle: users grouped by FIRST-active day, one
    row per (cohort_day, age) with the count still active ``age`` days
    later and the retention rate vs the cohort's size.

    Classic growth-analytics shape: cohort_day = min(active day) per
    user; a user contributes one row per distinct active day, aged
    relative to their cohort.  Age 0 covers every cohort member by
    construction (everyone is active on their first day), so the cohort
    size is the age-0 count — computed with a window over the output
    frame, never a second scan.

    Scale: the raw stream reduces to the distinct (user, day) frame in
    one map-side-combined aggregate (bounded by users x days, ~1000x
    smaller than events); the cohort day is a whole-partition window MIN
    over that frame — no cohort aggregate, no join back, no broadcast
    risk (the repo-wide derived-column rule: a window beats
    owner-aggregate+join because the derivation computes once, not once
    per join side); output is |cohorts| x |ages| rows.
    """
    active = (
        df.select(
            F.col(user_col).alias("u"), F.to_date(F.col(ts_col)).alias("d")
        )
        .filter(F.col("u").isNotNull() & F.col("d").isNotNull())
        .distinct()
    )
    cohort_day = F.min("d").over(W.partitionBy("u"))
    aged = active.select(
        cohort_day.alias("cohort_day"),
        F.datediff(F.col("d"), cohort_day).alias("age"),
    ).filter(F.col("age") <= max_age_days)
    counts = aged.groupBy("cohort_day", "age").agg(
        F.count("*").cast("long").alias("n_active")
    )
    size = F.max(F.when(F.col("age") == 0, F.col("n_active"))).over(
        W.partitionBy("cohort_day")
    )
    return counts.select(
        "cohort_day",
        "age",
        "n_active",
        size.cast("long").alias("cohort_size"),
        F.round(F.col("n_active") / size, 6).alias("retention"),
    )



def funnel_report(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_gap_minutes: int | None = None,
) -> DataFrame:
    """Ordered funnel: per step, how many users reached it IN ORDER —
    step k counts users with an event of type ``steps[k]`` at or after
    their earliest qualifying step-(k-1) time (the same >= convention at
    every stage, mirrored in the oracle).  Returns one row per step:
    (step_idx, step, n_users, conv_from_prev, conv_from_first), ratios
    rounded to 6.  ``max_gap_minutes`` adds the conversion-window
    constraint real funnels use: step k must land within the gap of the
    step-(k-1) time (both bounds inclusive, mirrored in the oracle) —
    note the windowed chain is still greedy on the earliest qualifying
    time, so like all windowed funnels it can miss a conversion a later
    anchor would have caught (the industry-standard trade).

    The sequential constraint is computed as a chain of per-user MIN
    timestamps: t_k = min ts of step-k events with ts >= t_{k-1} — the
    time_to_convert idiom extended to k steps.  Each stage is one
    filtered events frame joined to the (user, t_{k-1}) frame on the
    SAME user key (Catalyst reuses the hash partitioning across stages,
    and each stage's frame only shrinks), never a per-user event-array
    collect — so a bot user with 10^6 events costs aggregate time, not
    executor memory.
    """
    from . import _persist_scoped

    # Each stage frame is consumed TWICE: by the next stage's join and by
    # the `reached` union branch.  Unpinned, branch i of the union re-ran
    # stages 1..i from the raw events — 1+2+..+k = O(k²) event scans (the
    # r13 before-plan showed 10 scans for 4 steps).  Pinning each stage
    # (a bounded per-user (user, t) frame) computes every stage once: k
    # event scans total.  Values are unchanged — persist is evaluation
    # plumbing, not semantics.
    stage = _persist_scoped(
        df.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t"))
    )
    reached = stage.select(
        F.lit(1).alias("step_idx"), F.col(user_col).alias("u")
    )
    for i, s in enumerate(steps[1:], start=2):
        within = F.col(ts_col) >= F.col("t")
        if max_gap_minutes is not None:
            within = within & (
                F.col(ts_col)
                <= F.col("t") + F.expr(f"INTERVAL {int(max_gap_minutes)} MINUTES")
            )
        stage = _persist_scoped(
            df.filter(F.col(type_col) == s)
            .join(stage, user_col)
            .filter(within)
            .groupBy(user_col)
            .agg(F.min(ts_col).alias("t"))
        )
        reached = reached.unionByName(
            stage.select(F.lit(i).alias("step_idx"), F.col(user_col).alias("u"))
        )
    counts = reached.groupBy("step_idx").agg(
        F.count("*").cast("long").alias("n_users")
    )
    # every step keeps a row (an empty stage reports 0, not a hole) and
    # the ratios run on the |steps|-row frame: windows, not rescans
    all_steps = df.sparkSession.createDataFrame(
        [(i + 1, s) for i, s in enumerate(steps)], "step_idx INT, step STRING"
    )
    full = all_steps.join(counts, "step_idx", "left").select(
        "step_idx", "step", F.coalesce("n_users", F.lit(0)).cast("long").alias("n_users")
    )
    prev = F.lag("n_users").over(W.orderBy("step_idx"))
    first = F.first("n_users").over(
        W.orderBy("step_idx").rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return full.select(
        "step_idx",
        "step",
        "n_users",
        F.when(prev > 0, F.round(F.col("n_users") / prev, 6)).alias(
            "conv_from_prev"
        ),
        F.when(first > 0, F.round(F.col("n_users") / first, 6)).alias(
            "conv_from_first"
        ),
    )


def session_paths(
    df: DataFrame,
    gap_minutes: int = 30,
    max_len: int = 5,
    top_k: int = 20,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_col: str = "event_id",
) -> DataFrame:
    """Top-k session paths: gap-sessionize each user's stream, take each
    session's first ``max_len`` event types in (ts, order) order as a
    ``a>b>c`` path string, count sessions per path — the "how do users
    actually move" report next to the per-edge transition matrix
    (events_markov), which can't see multi-step routes.

    Session boundaries are the lag-gap rule (new session when the gap to
    the previous event exceeds ``gap_minutes``), computed in exact
    integer microseconds so both engines cut identically.  The per-
    session event collect is bounded by the session itself (gap-bounded,
    inherently short) TIMES nothing — only (ts, order, type) triples are
    collected, and the path truncates at ``max_len``.  Ranking is
    (count desc, path asc) — deterministic at the top_k boundary.

    Scale: one user-key window pass (two window functions share the
    frame), one (user, session) aggregate, one path count — all
    map-side combined; output is ``top_k`` rows.
    """
    from .asof import epoch_us

    w = W.partitionBy(user_col).orderBy(ts_col, order_col)
    us = epoch_us(df, ts_col)
    gap_us = gap_minutes * 60 * 1_000_000
    seq = df.select(
        F.col(user_col).alias("u"),
        us.alias("e"),
        F.col(order_col).alias("o"),
        F.col(type_col).alias("et"),
    )
    w = W.partitionBy("u").orderBy("e", "o")
    seq = seq.withColumn(
        "ns",
        F.when(
            F.lag("e").over(w).isNull()
            | ((F.col("e") - F.lag("e").over(w)) > gap_us),
            1,
        ).otherwise(0),
    ).withColumn(
        "sid", F.sum("ns").over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
    )
    sessions = seq.groupBy("u", "sid").agg(
        F.sort_array(F.collect_list(F.struct("e", "o", "et"))).alias("evs")
    )
    path = F.concat_ws(
        ">", F.transform(F.slice(F.col("evs"), 1, max_len), lambda s: s["et"])
    )
    counts = sessions.select(path.alias("path")).groupBy("path").agg(
        F.count("*").cast("long").alias("n_sessions")
    )
    return counts.orderBy(F.desc("n_sessions"), F.asc("path")).limit(top_k)


def ab_cuped(
    events: DataFrame,
    value_event: str = "purchase",
    id_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    type_col: str = "event_type",
) -> DataFrame:
    """A/B experiment readout with CUPED variance reduction (Deng,
    Xu, Kohavi & Walker, WSDM 2013): per-user post-period metric
    adjusted by the pre-period covariate, ``adj = post - theta *
    (pre - mean(pre))`` with the pooled ``theta = cov(pre, post) /
    var(pre)`` — the standard trick that cuts experiment runtime by the
    pre/post correlation squared.  Deterministic harness framing:
    variant = ``user_id % 2`` and the pre/post boundary is the exact
    midpoint of the event-time span in integer microseconds (no RNG, no
    config).

    One summary row: (n_a, n_b, mean_post_a, mean_post_b, theta,
    diff_raw, diff_cuped, var_reduction) — diff_* are B minus A,
    var_reduction is the realized ``1 - var(adj)/var(post)`` pooled.

    Determinism contract (the repo's exact-mean idiom): per-user pre and
    post fold 4dp-rounded values in DECIMAL(27,4) (summation-order-free,
    engine-identical); the second-moment sums fold 6dp-rounded products
    in DECIMAL(38,6); every division happens once, in double, at the
    end.  The ITT frame is ALL users seen in the event log (a user with
    no qualifying events counts as 0 spend — dropping them would bias
    both arms toward active users).  var(pre) == 0 degrades theta to 0
    (CUPED falls back to the raw diff) instead of dividing by zero.

    Scale: events cross ONE user-keyed shuffle into the per-user frame;
    the variant aggregate is map-side combinable to 2 rows; the final
    row is pure arithmetic.  The ts-span bounds come from one map-side
    min/max aggregate, broadcast as a 1-row cross join.
    """
    from . import asof

    ts_us = asof.epoch_us(events, ts_col)
    span = events.agg(
        F.min(ts_us).alias("__t0"), F.max(ts_us).alias("__t1")
    ).select(
        # integer `div`, not `/`: float division of ~1e15 sums truncates
        # differently across engines on odd sums
        F.expr("(__t0 + __t1) div 2").cast("long").alias("__mid")
    )
    ev = events.crossJoin(F.broadcast(span))
    val = F.when(
        F.col(type_col) == value_event, F.round(F.col(value_col), 4)
    ).otherwise(F.lit(0.0))
    per_user = ev.groupBy(id_col).agg(
        F.sum(
            F.when(ts_us < F.col("__mid"), val).otherwise(F.lit(0.0)).cast(
                "decimal(27,4)"
            )
        )
        .cast("double")
        .alias("pre"),
        F.sum(
            F.when(ts_us >= F.col("__mid"), val).otherwise(F.lit(0.0)).cast(
                "decimal(27,4)"
            )
        )
        .cast("double")
        .alias("post"),
    )
    d6 = lambda c: F.round(c, 6).cast("decimal(38,6)")
    by_variant = per_user.groupBy(
        (F.col(id_col) % 2).cast("int").alias("variant")
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(d6(F.col("pre"))).alias("s_pre"),
        F.sum(d6(F.col("post"))).alias("s_post"),
        F.sum(d6(F.col("pre") * F.col("post"))).alias("s_xy"),
        F.sum(d6(F.col("pre") * F.col("pre"))).alias("s_xx"),
        F.sum(d6(F.col("post") * F.col("post"))).alias("s_yy"),
    )
    pick = lambda v, c: F.sum(F.when(F.col("variant") == v, F.col(c)))
    pooled = by_variant.agg(
        pick(0, "n").alias("n_a"),
        pick(1, "n").alias("n_b"),
        (pick(0, "s_post").cast("double") / pick(0, "n")).alias("__mpost_a"),
        (pick(1, "s_post").cast("double") / pick(1, "n")).alias("__mpost_b"),
        (pick(0, "s_pre").cast("double") / pick(0, "n")).alias("__mpre_a"),
        (pick(1, "s_pre").cast("double") / pick(1, "n")).alias("__mpre_b"),
        F.sum("n").cast("long").alias("__n"),
        F.sum("s_pre").cast("double").alias("__sx"),
        F.sum("s_post").cast("double").alias("__sy"),
        F.sum("s_xy").cast("double").alias("__sxy"),
        F.sum("s_xx").cast("double").alias("__sxx"),
        F.sum("s_yy").cast("double").alias("__syy"),
    )
    mx = F.col("__sx") / F.col("__n")
    my = F.col("__sy") / F.col("__n")
    cov = F.col("__sxy") / F.col("__n") - mx * my
    var_pre = F.col("__sxx") / F.col("__n") - mx * mx
    var_post = F.col("__syy") / F.col("__n") - my * my
    theta = F.when(var_pre > 0, cov / var_pre).otherwise(F.lit(0.0))
    adj_a = F.col("__mpost_a") - theta * (F.col("__mpre_a") - mx)
    adj_b = F.col("__mpost_b") - theta * (F.col("__mpre_b") - mx)
    var_red = F.when(
        (var_pre > 0) & (var_post > 0), cov * cov / (var_pre * var_post)
    ).otherwise(F.lit(0.0))
    return pooled.select(
        "n_a",
        "n_b",
        F.round("__mpost_a", 6).alias("mean_post_a"),
        F.round("__mpost_b", 6).alias("mean_post_b"),
        F.round(theta, 6).alias("theta"),
        F.round(F.col("__mpost_b") - F.col("__mpost_a"), 6).alias("diff_raw"),
        F.round(adj_b - adj_a, 6).alias("diff_cuped"),
        F.round(var_red, 6).alias("var_reduction"),
    )


def mann_kendall(
    series: DataFrame,
    group_col: str = "grp",
    time_col: str = "t",
    value_col: str = "v",
    z_crit: float = 1.96,
    out_round: int = 6,
) -> DataFrame:
    """Mann-Kendall trend test per group -> (grp, n_periods, s_stat,
    var_s, z, trend).

    The standard non-parametric monotone-trend detector for metric
    series (daily volumes, quality rates): S = sum over ordered period
    pairs of sign(v_j - v_i); under H0, S is ~normal with the
    tie-corrected variance var_S = [n(n-1)(2n+5) - sum_t t(t-1)(2t+5)]
    / 18, and the continuity-corrected z = (S -/+ 1)/sqrt(var_S) flags
    ``increasing`` / ``decreasing`` past ``z_crit`` (no distributional
    assumption, robust to outliers — the reason ops dashboards prefer
    it over an OLS slope).

    Input is a PRE-AGGREGATED series (group, period, value) — e.g. the
    (event_type, day, count) frame one map-side-combined shuffle
    produces from raw events.  The pairwise step then self-joins the
    AGGREGATE within each group: |groups| x n^2/2 rows where n is the
    period count (a year of days = 66k pairs per group), never a pair
    expansion over raw rows — the operator's cost at 100 TB is the
    daily-count shuffle that precedes it.  S and the tie counts are
    exact integers; the two double divisions happen once per group and
    are rounded last.
    """
    # the series is re-read by the pair join (both sides) and the tie
    # aggregate; without a pin each consumer re-derives it from the RAW
    # events (measured 10 parquet scans at sf0.001) — the input is
    # small by contract (one row per (group, period)), so one lazy
    # checkpoint collapses the derivation into a single job
    s = series.select(
        F.col(group_col).alias("grp"),
        F.col(time_col).cast("long").alias("t"),
        F.col(value_col).cast("double").alias("v"),
    ).filter(F.col("v").isNotNull()).localCheckpoint(eager=False)
    pairs = (
        s.alias("a")
        .join(s.alias("b"), "grp")
        .filter(F.col("a.t") < F.col("b.t"))
        .groupBy("grp")
        .agg(F.sum(F.signum(F.col("b.v") - F.col("a.v")).cast("long")).alias("s_stat"))
    )
    ties = (
        s.groupBy("grp", "v")
        .agg(F.count("*").cast("long").alias("tc"))
        .groupBy("grp")
        .agg(
            F.sum(F.col("tc") * (F.col("tc") - 1) * (2 * F.col("tc") + 5)).alias(
                "tie_term"
            ),
            F.sum("tc").cast("long").alias("n_periods"),
        )
    )
    n = F.col("n_periods")
    var_s = (
        (n * (n - 1) * (2 * n + 5) - F.col("tie_term")).cast("double") / F.lit(18.0)
    )
    # LEFT join: a single-period group emits no pair row (a.t < b.t is
    # empty for n=1), but the docstring promises a row per group — keep
    # it with S = 0, var_S = 0, z = 0, no_trend (r12 ADVICE low)
    joined = (
        ties.join(pairs, "grp", "left")
        .withColumn("s_stat", F.coalesce("s_stat", F.lit(0).cast("long")))
        .withColumn("var_s", var_s)
    )
    z = (
        F.when(
            (F.col("s_stat") > 0) & (F.col("var_s") > 0),
            (F.col("s_stat") - 1).cast("double") / F.sqrt("var_s"),
        )
        .when(
            (F.col("s_stat") < 0) & (F.col("var_s") > 0),
            (F.col("s_stat") + 1).cast("double") / F.sqrt("var_s"),
        )
        .otherwise(F.lit(0.0))
    )
    zr = F.round(z, out_round)
    return joined.select(
        "grp",
        "n_periods",
        "s_stat",
        F.round("var_s", out_round).alias("var_s"),
        zr.alias("z"),
        F.when(zr > z_crit, F.lit("increasing"))
        .when(zr < -z_crit, F.lit("decreasing"))
        .otherwise(F.lit("no_trend"))
        .alias("trend"),
    )


def cusum_counts(
    series: DataFrame,
    group_col: str = "grp",
    time_col: str = "t",
    value_col: str = "v",
    k_sigma: float = 4.0,
    out_round: int = 6,
) -> DataFrame:
    """One-sided (high) CUSUM change-point chart per group ->
    (grp, t, v, cusum, alarm).

    The classic sequential shift detector for count series (Page 1954):
    accumulate deviations above the group mean and alarm when the
    accumulation crosses ``k_sigma`` standard deviations — it catches a
    sustained level shift (a broken producer, a bot ramp) far earlier
    than per-point outlier rules, and complements :func:`mann_kendall`
    (gradual monotone drift) with the abrupt-change case.

    The textbook recursion S_t = max(0, S_{t-1} + (v_t - mean)) is not
    a prefix sum, but it equals ``P_t - min(P_0..P_t)`` for the plain
    prefix sums P of the deviations — two ordered windows over the
    per-(group, period) AGGREGATE, never the raw events.  The min MUST
    include the empty-prefix baseline P_0 = 0 (S_0 = 0): the window
    min below only sees P_1..P_t, so it is clamped with ``least(0, .)``
    — without the clamp a series whose first deviations are positive
    (starts above its mean, e.g. [6,5,5,4] -> S=[1,1,1,0]) undercounts
    to all-zero and alarms late (r12 ADVICE, high).  Arithmetic is
    EXACT integers end-to-end (r12): deviations are scaled by n
    (``n*v_t - total`` is a long, no fractional mean), prefix sums and
    prefix mins stay long, and the single ``/ n`` division plus the
    sigma comparison happen once per row on 6dp-rounded values — so the
    running recursion cannot accumulate engine-specific float error.
    Input is a pre-aggregated (group, period, value) frame, the
    mann_kendall contract.
    """
    # same re-read pin as mann_kendall: stats and the row side both
    # consume the series; the input is one row per (group, period)
    s = series.select(
        F.col(group_col).alias("grp"),
        F.col(time_col).cast("long").alias("t"),
        F.col(value_col).cast("long").alias("v"),
    ).localCheckpoint(eager=False)
    stats = s.groupBy("grp").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("v").cast("long").alias("tot"),
        F.sum(F.col("v") * F.col("v")).cast("long").alias("tot2"),
    )
    j = s.join(F.broadcast(stats), "grp")
    wo = W.partitionBy("grp").orderBy("t").rowsBetween(W.unboundedPreceding, 0)
    # scaled deviation n*v - tot is exact long; its prefix sum / prefix
    # min stay long, so S_t * n = P_t - min(P_<=t) is exact
    p = F.sum(F.col("n") * F.col("v") - F.col("tot")).over(wo)
    # clamp the running min to the P_0 = 0 baseline: min over P_1..P_t
    # alone misses series that start above their mean (r12 ADVICE high)
    run = j.withColumn("__p", p).withColumn(
        "__pmin", F.least(F.lit(0).cast("long"), F.min("__p").over(wo))
    )
    nn = F.col("n").cast("double")
    # population sigma from the exact integer sums: n^2*var = n*tot2 - tot^2
    sigma = F.sqrt(
        (F.col("n") * F.col("tot2") - F.col("tot") * F.col("tot")).cast("double")
    ) / nn
    cusum = F.round(
        (F.col("__p") - F.col("__pmin")).cast("double") / nn, out_round
    )
    thr = F.round(F.lit(k_sigma) * sigma, out_round)
    return run.select(
        "grp",
        "t",
        "v",
        cusum.alias("cusum"),
        (cusum > thr).alias("alarm"),
    )


def theil_sen(
    series: DataFrame,
    group_col: str = "grp",
    time_col: str = "t",
    value_col: str = "v",
    out_round: int = 6,
) -> DataFrame:
    """Theil-Sen slope estimator per group -> (grp, n_periods, n_pairs,
    slope) — the MAGNITUDE companion to :func:`mann_kendall` (which
    only answers "is there a monotone trend"): the median of all
    pairwise slopes (v_j - v_i)/(t_j - t_i), robust to ~29% outliers
    where an OLS slope is wrecked by one bad day.

    Same input contract as mann_kendall: a PRE-AGGREGATED (group,
    period, value) series; the pairwise step self-joins the AGGREGATE
    (|groups| x n^2/2 rows — a year of days is 66k slopes per group,
    never a pair expansion over raw events).  The median is the LOWER
    median — the element at rank ceil(m/2) of the ascending slopes —
    deliberately NOT the two-element average, which lands on exact
    half-unit rounding boundaries ((a+b)/2 of 9dp values) where engines
    disagree; a single order statistic of 9dp-rounded slopes is
    engine-exact by construction, and ties in slope VALUES make the
    rank choice value-deterministic even though row_number's tie order
    is not.  Groups with one period emit (n_pairs=0, slope=0.0) — the
    mann_kendall n=1 contract.

    The ranking window partitions by group over the PAIR aggregate
    (n^2/2 rows per group, bounded by the period count's square — tiny
    relative to raw data; a decade of daily periods is 6.7M slopes).
    """
    s = series.select(
        F.col(group_col).alias("grp"),
        F.col(time_col).cast("long").alias("t"),
        F.col(value_col).cast("double").alias("v"),
    ).filter(F.col("v").isNotNull()).localCheckpoint(eager=False)
    slopes = (
        s.alias("a")
        .join(s.alias("b"), "grp")
        .filter(F.col("a.t") < F.col("b.t"))
        .select(
            "grp",
            F.round(
                (F.col("b.v") - F.col("a.v")) / (F.col("b.t") - F.col("a.t")).cast("double"),
                9,
            ).alias("slope"),
        )
    )
    w = W.partitionBy("grp").orderBy(F.asc("slope"))
    ranked = slopes.withColumn("rn", F.row_number().over(w))
    counts = slopes.groupBy("grp").agg(F.count("*").cast("long").alias("n_pairs"))
    med = (
        ranked.join(F.broadcast(counts), "grp")
        # lower median = element at rank ceil(m/2) = (m+1) div 2
        .filter(F.col("rn") == F.expr("(n_pairs + 1) div 2"))
        .select("grp", "n_pairs", F.col("slope").alias("__med"))
    )
    periods = s.groupBy("grp").agg(F.count("*").cast("long").alias("n_periods"))
    return (
        periods.join(med, "grp", "left")
        .select(
            "grp",
            "n_periods",
            F.coalesce("n_pairs", F.lit(0).cast("long")).alias("n_pairs"),
            F.round(F.coalesce("__med", F.lit(0.0)), out_round).alias("slope"),
        )
    )
