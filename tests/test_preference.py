"""Preference/label-quality operators: Bradley-Terry MM, Wilson win
matrix, Fleiss' kappa.

Twin discipline (r8 verdict lesson): every brute-force twin folds
cross-row sums of rounded doubles in ``Decimal`` exactly like the
operator — never in binary floats — so a one-ulp tie can't make the
TWIN wrong while the operator and oracle agree.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

from staticql_spark.operators import preference


def r9(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("1e-9"), ROUND_HALF_UP))


def r6(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("1e-6"), ROUND_HALF_UP))


def dsum(vals) -> float:
    """Decimal-exact fold of 9dp-rounded doubles (the operator's
    DECIMAL(38,9) sum), returned as double."""
    acc = Decimal(0)
    for v in vals:
        acc += Decimal(repr(r9(v)))
    return float(acc)


def bt_twin(comparisons, iters=5, alpha=0.5):
    """Pure-Python MM twin of preference.bt_ratings (Hunter 2004),
    Decimal folds matching the operator's determinism barriers."""
    und: dict[tuple[int, int], list[float]] = {}
    for w, l in comparisons:
        lo, hi = min(w, l), max(w, l)
        rec = und.setdefault((lo, hi), [alpha, alpha])
        rec[0 if w == lo else 1] += 1.0
    dir_: dict[int, list[tuple[int, float, float]]] = {}
    wins: dict[int, float] = {}
    for (lo, hi), (wlo, whi) in und.items():
        n = wlo + whi
        dir_.setdefault(lo, []).append((hi, wlo, n))
        dir_.setdefault(hi, []).append((lo, whi, n))
        wins[lo] = wins.get(lo, 0.0) + wlo
        wins[hi] = wins.get(hi, 0.0) + whi
    pi = {i: 1.0 for i in dir_}
    n_items = len(pi)
    for _ in range(iters):
        praw = {}
        for i, edges in dir_.items():
            den = dsum(n / (pi[i] + pi[j]) for j, _, n in edges)
            praw[i] = wins[i] / den
        s = dsum(praw.values())
        pi = {i: r9(p * n_items / s) for i, p in praw.items()}
    return {i: r6(p) for i, p in pi.items()}


def test_bt_ratings_matches_python_twin(spark):
    # deterministic synthetic comparisons over 6 items: item i beats
    # item j in ceil-proportional counts of an exact BT model with
    # strengths 1..6, plus a few asymmetric extras to break symmetry
    comps = []
    for i in range(6):
        for j in range(i):
            # 10 comparisons per ordered pair: i wins per its strength
            wi = round(10 * (i + 1) / (i + j + 2))
            comps += [(i, j)] * wi + [(j, i)] * (10 - wi)
    comps += [(5, 0)] * 3 + [(4, 1)] * 2
    df = spark.createDataFrame(comps, "winner: long, loser: long")
    got = {
        r["item"]: r["rating"]
        for r in preference.bt_ratings(df, iters=5, alpha=0.5).collect()
    }
    want = bt_twin(comps, iters=5, alpha=0.5)
    assert got == want
    # exact-BT ground truth: ratings strictly increase with strength
    ordered = [got[i] for i in range(6)]
    assert ordered == sorted(ordered) and len(set(ordered)) == 6
    # mean-1 normalization (up to the 6dp output rounding)
    assert abs(sum(ordered) / 6 - 1.0) < 1e-5


def test_bt_ratings_counts_and_smoothing(spark):
    # an item that never wins still gets a finite positive rating via
    # the alpha smoothing (the MM update would otherwise send it to 0)
    comps = [(1, 0)] * 4 + [(2, 1)] * 3 + [(2, 0)] * 5
    df = spark.createDataFrame(comps, "winner: long, loser: long")
    rows = {r["item"]: r for r in preference.bt_ratings(df).collect()}
    assert rows[0]["wins"] == 0 and rows[0]["rating"] > 0.0
    assert rows[0]["n_comps"] == 9 and rows[2]["n_comps"] == 8
    assert rows[2]["wins"] == 8
    assert rows[0]["rating"] < rows[1]["rating"] < rows[2]["rating"]


def test_win_matrix_wilson(spark):
    comps = [(0, 1)] * 95 + [(1, 0)] * 5 + [(2, 3)] * 2 + [(3, 2)] * 2
    df = spark.createDataFrame(comps, "winner: long, loser: long")
    rows = {
        (r["item_a"], r["item_b"]): r
        for r in preference.win_matrix(df).collect()
    }
    r01 = rows[(0, 1)]
    assert (r01["n"], r01["wins_a"], r01["wins_b"]) == (100, 95, 5)
    assert r01["win_rate_a"] == 0.95
    # twin: identical float expression order
    z, n, p = 1.96, 100.0, 0.95
    z2 = z * z
    lb = (p + z2 / (2.0 * n) - z * math.sqrt((p * (1.0 - p) + z2 / (4.0 * n)) / n)) / (
        1.0 + z2 / n
    )
    assert r01["wilson_lb_a"] == r6(lb)
    # small-sample sanity: a 2/2 record's Wilson LB must sit far below
    # the 95/100 record's
    assert rows[(2, 3)]["wilson_lb_a"] < r01["wilson_lb_a"]
    assert rows[(2, 3)]["win_rate_a"] == 0.5


# Fleiss (1971) / Landis-Koch worked example: 10 subjects, 14 raters,
# 5 categories -> P_bar ~ 0.378, P_e ~ 0.213, kappa ~ 0.210.
_FLEISS_TABLE = [
    [0, 0, 0, 0, 14],
    [0, 2, 6, 4, 2],
    [0, 0, 3, 5, 6],
    [0, 3, 9, 2, 0],
    [2, 2, 8, 1, 1],
    [7, 7, 0, 0, 0],
    [3, 2, 6, 3, 0],
    [2, 5, 3, 2, 2],
    [6, 5, 2, 1, 0],
    [0, 2, 2, 3, 7],
]


def test_fleiss_kappa_literature_example(spark):
    labels = [
        (item, cat)
        for item, row in enumerate(_FLEISS_TABLE)
        for cat, c in enumerate(row)
        for _ in range(c)
    ]
    df = spark.createDataFrame(labels, "item: long, cat: long")
    row = preference.fleiss_kappa(df).collect()[0]
    assert row["n_items"] == 10 and row["n_ratings"] == 140
    # Decimal-fold twin of the operator's exact arithmetic
    p_is = [
        (sum(c * c for c in r) - 14) / (14 * 13) for r in _FLEISS_TABLE
    ]
    p_bar = dsum(p_is) / 10
    cat_tot = [sum(r[j] for r in _FLEISS_TABLE) for j in range(5)]
    p_e = dsum((c / 140.0) * (c / 140.0) for c in cat_tot)
    assert row["p_bar"] == r6(p_bar)
    assert row["p_e"] == r6(p_e)
    assert row["kappa"] == r6((p_bar - p_e) / (1.0 - p_e))
    assert abs(row["kappa"] - 0.210) < 0.001


def test_fleiss_kappa_excludes_singletons_and_degenerate(spark):
    # items with a single rating carry no pair signal; a single observed
    # category makes P_e = 1 and kappa degrades to 0.0 instead of 0/0
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "a"), (3, "a"), (3, "a"), (3, "a")],
        "item: long, cat: string",
    )
    row = preference.fleiss_kappa(df).collect()[0]
    assert row["n_items"] == 2 and row["n_ratings"] == 5
    assert row["p_bar"] == 1.0 and row["p_e"] == 1.0 and row["kappa"] == 0.0


def test_bt_reliability_near_calibrated_on_exact_bt_data(spark):
    # comparisons generated from an exact BT model (win counts
    # proportional to (i+1)/(i+j+2)) must yield near-zero reliability
    # gaps when audited against the fitted ratings
    comps = []
    for i in range(8):
        for j in range(i):
            wi = round(20 * (i + 1) / (i + j + 2))
            comps += [(i, j)] * wi + [(j, i)] * (20 - wi)
    df = spark.createDataFrame(comps, "winner: long, loser: long")
    ratings = preference.bt_ratings(df, iters=8, alpha=0.5)
    rows = preference.bt_reliability(df, ratings, buckets=4).collect()
    assert rows, "no buckets"
    assert sum(r["n_pairs"] for r in rows) == 28  # all pairs bucketed
    for r in rows:
        assert abs(r["gap"]) < 0.08, rows
        assert r["gap"] == round(r["obs_rate"] - r["exp_rate"], 6) or \
            abs(r["gap"] - (r["obs_rate"] - r["exp_rate"])) < 2e-6


def test_rater_consensus_modal_agreement_and_ties(spark):
    # item 1: majority "b" (2 vs 1); item 2: TIE a/b -> smallest ("a");
    # item 3: SINGLETON — excluded (n_i >= 2, the fleiss_kappa floor),
    # so rater 1's trivial self-agreement must not inflate their rate
    # and rater 2 (singleton-only) gets no row at all (r9 ADVICE)
    rows = [
        (1, 0, "b"), (1, 0, "b"), (1, 1, "a"),
        (2, 0, "a"), (2, 1, "b"),
        (3, 1, "c"), (4, 2, "a"),
    ]
    df = spark.createDataFrame(rows, "item: long, rater: long, cat: string")
    got = {
        r["rater"]: (r["n_labels"], r["n_agree"], r["agree_rate"])
        for r in preference.rater_consensus(df).collect()
    }
    assert got == {0: (3, 3, 1.0), 1: (2, 0, 0.0)}


def bt_ties_twin(comps, iters=5, alpha=0.5):
    """Pure-Python MM twin of preference.bt_ties (Rao-Kupper 1967 via
    Hunter 2004 §4), Decimal folds matching the operator's barriers."""
    und: dict[tuple[int, int], list[float]] = {}
    for a, b, o in comps:
        lo, hi = min(a, b), max(a, b)
        rec = und.setdefault((lo, hi), [alpha, alpha, alpha])
        if o == 2:
            rec[2] += 1.0
        elif (a < b) == (o == 0):  # the lower-id item won
            rec[0] += 1.0
        else:
            rec[1] += 1.0
    dir_: dict[int, list[tuple[int, float]]] = {}
    numer: dict[int, float] = {}
    bigt = 0.0
    for (lo, hi), (wlo, whi, t) in und.items():
        dir_.setdefault(lo, []).append((hi, wlo + t))
        dir_.setdefault(hi, []).append((lo, whi + t))
        numer[lo] = numer.get(lo, 0.0) + wlo + t
        numer[hi] = numer.get(hi, 0.0) + whi + t
        bigt += t
    pi = {i: 1.0 for i in dir_}
    theta = 2.0
    n_items = len(pi)
    for _ in range(iters):
        terms: dict[int, list[float]] = {i: [] for i in dir_}
        for i, edges in dir_.items():
            for j, a in edges:
                x = a / (pi[i] + theta * pi[j])
                terms[i].append(x)
                terms[j].append(theta * x)
        praw = {i: numer[i] / dsum(terms[i]) for i in dir_}
        s = dsum(praw.values())
        pi = {i: r9(p * n_items / s) for i, p in praw.items()}
        big_s = dsum(
            a * pi[j] / (pi[i] + theta * pi[j])
            for i, edges in dir_.items()
            for j, a in edges
        )
        g = bigt / big_s
        theta = r9(g + math.sqrt(g * g + 1.0))
    return {i: r6(p) for i, p in pi.items()}, r6(theta)


def test_bt_ties_matches_python_twin(spark):
    # deterministic synthetic outcomes over 5 items: stronger items win
    # proportionally more; every third residual comparison is a TIE
    comps = []
    for i in range(5):
        for j in range(i):
            for t in range(12):
                r = t % (i + j + 4)
                if r <= j:
                    comps.append((i, j, 1))      # j (weaker id) wins
                elif r <= j + 2:
                    comps.append((i, j, 2))      # tie
                else:
                    comps.append((i, j, 0))      # i wins
    df = spark.createDataFrame(comps, "item_a: long, item_b: long, outcome: int")
    rows = {r["item"]: r for r in preference.bt_ties(df, iters=5).collect()}
    want_pi, want_theta = bt_ties_twin(comps, iters=5)
    assert {i: r["rating"] for i, r in rows.items()} == want_pi
    assert all(r["theta"] == want_theta for r in rows.values())
    assert want_theta > 1.0  # ties present -> tie propensity off boundary
    # counts are raw (unsmoothed) and consistent
    n_ties = sum(1 for c in comps if c[2] == 2)
    assert sum(r["ties"] for r in rows.values()) == 2 * n_ties
    assert sum(r["n_comps"] for r in rows.values()) == 2 * len(comps)
    # the 12-comparison cycle only approximates the (i+1)/(j+1) odds, so
    # mid-ids can swap — but the extremes must order correctly
    ordered = [rows[i]["rating"] for i in range(5)]
    assert ordered[0] == min(ordered) and ordered[0] < ordered[4]
    # mean-1 normalization (up to 6dp output rounding)
    assert abs(sum(ordered) / 5 - 1.0) < 1e-5


def test_bt_ties_all_ties_and_no_ties(spark):
    # all ties: every item identical -> equal mean-1 ratings, theta large
    df = spark.createDataFrame(
        [(0, 1, 2)] * 4 + [(1, 2, 2)] * 4 + [(0, 2, 2)] * 4,
        "item_a: long, item_b: long, outcome: int",
    )
    rows = {r["item"]: r for r in preference.bt_ties(df).collect()}
    assert {r["rating"] for r in rows.values()} == {1.0}
    assert all(r["wins"] == 0 and r["ties"] == 8 for r in rows.values())
    # no ties at all: smoothing keeps theta finite and ratings ordered
    df2 = spark.createDataFrame(
        [(1, 0, 0)] * 6 + [(2, 1, 0)] * 6 + [(2, 0, 0)] * 6,
        "item_a: long, item_b: long, outcome: int",
    )
    rows2 = {r["item"]: r for r in preference.bt_ties(df2).collect()}
    assert rows2[0]["rating"] < rows2[1]["rating"] < rows2[2]["rating"]
    assert all(r["ties"] == 0 for r in rows2.values())
    assert rows2[0]["theta"] >= 1.0


def test_rater_bias_leave_one_out(spark):
    # item 10 scored by raters {0: 4.0, 1: 2.0} -> gaps +2.0 / -2.0;
    # item 11 by {0: 3.0, 1: 3.0, 2: 0.0} -> peer means 1.5/1.5/3.0,
    # gaps +1.5/+1.5/-3.0; item 12 is a SINGLETON -> excluded entirely
    rows = [
        (10, 0, 4.0), (10, 1, 2.0),
        (11, 0, 3.0), (11, 1, 3.0), (11, 2, 0.0),
        (12, 2, 99.0),
    ]
    df = spark.createDataFrame(rows, "item: long, rater: long, score: double")
    got = {
        r["rater"]: (r["n_scored"], r["mean_score"], r["mean_gap"])
        for r in preference.rater_bias(df).collect()
    }
    assert got == {
        0: (2, 3.5, 1.75),   # gaps +2.0, +1.5 -> mean 1.75
        1: (2, 2.5, -0.25),  # gaps -2.0, +1.5 -> mean -0.25
        2: (1, 0.0, -3.0),   # the singleton 99.0 never enters
    }


def test_arena_sliding_window_membership_and_wilson(spark):
    # window=10µs sliding 4µs -> fan-out 3; windows are [4k, 4k+10).
    # t=0 lands in k=-2,-1,0 (negative window starts exercise the exact
    # floor division — truncating div would misplace these); t=9 in
    # k=0,1,2; t=10 in k=1,2 only (right-open boundary).
    rows = [(0, 1, 2), (9, 2, 1), (10, 1, 2)]
    df = spark.createDataFrame(rows, "t_us: long, winner: long, loser: long")
    got = {
        r["win_start_us"]: (r["n"], r["wins_a"], r["win_rate_a"], r["wilson_lb_a"])
        for r in preference.arena_sliding(df, window_us=10, slide_us=4).collect()
    }
    z = 1.96

    def wilson(wins, n):
        p = wins / n
        return round(
            (p + z * z / (2 * n) - z * math.sqrt((p * (1 - p) + z * z / (4 * n)) / n))
            / (1 + z * z / n),
            6,
        )

    assert got == {
        -8: (1, 1, 1.0, wilson(1, 1)),
        -4: (1, 1, 1.0, wilson(1, 1)),
        0: (2, 1, 0.5, wilson(1, 2)),
        4: (2, 1, 0.5, wilson(1, 2)),
        8: (2, 1, 0.5, wilson(1, 2)),
    }


def test_arena_sliding_fanout_guard(spark):
    df = spark.createDataFrame([(0, 1, 2)], "t_us: long, winner: long, loser: long")
    try:
        preference.arena_sliding(df, window_us=1_000_000, slide_us=1, max_fanout=1024)
        raise AssertionError("expected ValueError on 1M-window fan-out")
    except ValueError as e:
        assert "fan-out" in str(e)


def test_krippendorff_alpha_matches_twin_and_handles_missing(spark):
    # classic missing-data pattern (raters skip items): alpha must use
    # only pairable (n_i >= 2) items; twin recomputes the coincidence
    # formula with the operator's Decimal barrier
    labels = [
        (1, "a"), (1, "a"), (1, "b"),
        (2, "b"), (2, "b"),
        (3, "a"), (3, "b"), (3, "c"), (3, "c"),
        (4, "a"),            # single rating: excluded
        (5, "c"), (5, "c"),
    ]
    df = spark.createDataFrame(labels, "item: long, cat: string")
    row = preference.krippendorff_alpha(df).collect()[0]

    from collections import Counter, defaultdict

    by_item = defaultdict(list)
    for i, c in labels:
        by_item[i].append(c)
    kept = {i: Counter(cs) for i, cs in by_item.items() if len(cs) >= 2}
    n = sum(sum(c.values()) for c in kept.values())
    o_mass = dsum(
        (sum(c.values()) ** 2 - sum(v * v for v in c.values()))
        / (sum(c.values()) - 1)
        for c in kept.values()
    )
    marg = Counter()
    for c in kept.values():
        marg.update(c)
    s_c = sum(v * v for v in marg.values())
    alpha = 1.0 - (n - 1) * o_mass / (n * n - s_c)
    assert row["n_items"] == 4 and row["n_ratings"] == n
    assert row["d_o"] == r6(o_mass / n)
    assert row["d_e"] == r6((n * n - s_c) / (n * (n - 1.0)))
    assert row["alpha"] == r6(alpha)
    # hand check: perfect-agreement-only data -> alpha = 1
    perfect = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b"), (2, "b")], "item: long, cat: string"
    )
    assert preference.krippendorff_alpha(perfect).collect()[0]["alpha"] == 1.0


def test_krippendorff_alpha_single_category_degenerate(spark):
    # one observed category: disagreement impossible AND unexpected
    # (d_e = 0) -> alpha = 1.0 by the documented convention
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "a"), (2, "a"), (2, "a")],
        "item: long, cat: string",
    )
    row = preference.krippendorff_alpha(df).collect()[0]
    assert row["d_e"] == 0.0 and row["alpha"] == 1.0


def test_consensus_labels_modal_pick_and_singletons(spark):
    from staticql_spark.operators.preference import consensus_labels

    rows = [
        # item 1: b wins 2-1
        (1, "b"), (1, "b"), (1, "a"),
        # item 2: tie a vs c -> smallest cat wins
        (2, "c"), (2, "a"),
        # item 3: singleton -> included, share 1.0
        (3, "z"),
    ]
    df = spark.createDataFrame(rows, "item long, cat string")
    got = {
        r["item"]: (
            r["n_labels"], r["consensus_cat"], r["n_consensus"],
            r["consensus_share"],
        )
        for r in consensus_labels(df).collect()
    }
    assert got == {
        1: (3, "b", 2, round(2 / 3, 6)),
        2: (2, "a", 1, 0.5),
        3: (1, "z", 1, 1.0),
    }


def test_rater_severity_fixed_reference(spark):
    # r13: the streamable severity variant — gaps vs a FROZEN per-item
    # reference, so each gap is a per-event constant (unlike rater_bias'
    # retroactively-moving leave-one-out mean).  Items absent from the
    # reference are excluded (no defined expectation); singletons are
    # KEPT (the reference is their peer, no n_i >= 2 floor).
    scores = spark.createDataFrame(
        [
            (10, 0, 4.0), (10, 1, 2.0),
            (11, 0, 3.0), (11, 1, 3.0), (11, 2, 0.0),
            (12, 2, 5.0),            # singleton: kept (ref exists)
            (13, 0, 7.0),            # item 13 has NO reference: dropped
        ],
        "item: long, rater: long, score: double",
    )
    ref = spark.createDataFrame(
        [(10, 3.0), (11, 2.0), (12, 4.5)], "item: long, ref_score: double"
    )
    got = {
        r["rater"]: (r["n_scored"], r["mean_score"], r["mean_gap"])
        for r in preference.rater_severity(scores, ref).collect()
    }
    assert got == {
        0: (2, 3.5, 1.0),    # gaps +1.0 (4-3), +1.0 (3-2)
        1: (2, 2.5, 0.0),    # gaps -1.0, +1.0
        2: (2, 2.5, -0.75),  # gaps -2.0 (0-2), +0.5 (5-4.5)
    }
