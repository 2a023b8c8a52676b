"""Property tests: the preference family and the quantile sketch vs
brute-force Python twins — for ANY small random comparison/label/value
set (one-sided sweeps, never-winners, all-tied values, duplicate rows)
the operators must equal the direct definition.

Twin discipline (r8 verdict): every cross-row fold of rounded doubles
in a twin runs in Decimal, matching the operator's DECIMAL(38,9) sums.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from staticql_spark.operators import preference
from staticql_spark.operators.sketch import qsketch, qsketch_quantiles
from tests.test_preference import bt_twin, dsum, r6, r9

# comparisons over a tiny item domain: duplicates, self-pair-free,
# skewed directions all arise naturally
comparison_lists = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 5)).filter(
        lambda t: t[0] != t[1]
    ),
    min_size=1,
    max_size=60,
)


@given(comps=comparison_lists)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_bt_ratings_property_matches_twin(spark, comps):
    df = spark.createDataFrame(comps, "winner: long, loser: long")
    got = {
        r["item"]: (r["n_comps"], r["wins"], r["rating"])
        for r in preference.bt_ratings(df, iters=3, alpha=0.5).collect()
    }
    want_r = bt_twin(comps, iters=3, alpha=0.5)
    n_comps = {}
    wins = {}
    for w, l in comps:
        n_comps[w] = n_comps.get(w, 0) + 1
        n_comps[l] = n_comps.get(l, 0) + 1
        wins[w] = wins.get(w, 0) + 1
    want = {
        i: (n_comps[i], wins.get(i, 0), want_r[i]) for i in n_comps
    }
    assert got == want


@given(comps=comparison_lists)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_win_matrix_property_matches_twin(spark, comps):
    df = spark.createDataFrame(comps, "winner: long, loser: long")
    got = {
        (r["item_a"], r["item_b"]): (
            r["n"], r["wins_a"], r["wins_b"], r["win_rate_a"], r["wilson_lb_a"]
        )
        for r in preference.win_matrix(df).collect()
    }
    agg: dict[tuple[int, int], list[int]] = {}
    for w, l in comps:
        a, b = min(w, l), max(w, l)
        rec = agg.setdefault((a, b), [0, 0])
        rec[0] += 1
        rec[1] += 1 if w == a else 0
    want = {}
    for (a, b), (n, wa) in agg.items():
        nn, p, z = float(n), wa / float(n), 1.96
        z2 = z * z
        lb = (
            p + z2 / (2.0 * nn)
            - z * math.sqrt((p * (1.0 - p) + z2 / (4.0 * nn)) / nn)
        ) / (1.0 + z2 / nn)
        want[(a, b)] = (n, wa, n - wa, r6(p), r6(lb))
    assert got == want


label_lists = st.lists(
    st.tuples(st.integers(0, 6), st.integers(0, 3)),
    min_size=1,
    max_size=60,
)


@given(labels=label_lists)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_fleiss_kappa_property_matches_twin(spark, labels):
    df = spark.createDataFrame(labels, "item: long, cat: long")
    row = preference.fleiss_kappa(df).collect()[0]
    cnt: dict[tuple[int, int], int] = {}
    for i, c in labels:
        cnt[(i, c)] = cnt.get((i, c), 0) + 1
    per: dict[int, list[int]] = {}
    for (i, _c), n in cnt.items():
        per.setdefault(i, []).append(n)
    kept = {i: ns for i, ns in per.items() if sum(ns) >= 2}
    if not kept:
        # no item carries pair signal: the operator emits an empty or
        # degenerate frame; the driver-facing derivation always has
        # ratings, so just assert the counts
        assert row["n_items"] == 0
        return
    n_items = len(kept)
    n_ratings = sum(sum(ns) for ns in kept.values())
    p_is = []
    for ns in kept.values():
        n_i = sum(ns)
        p_is.append((sum(x * x for x in ns) - n_i) / (n_i * (n_i - 1)))
    p_bar = dsum(p_is) / n_items
    cat_tot: dict[int, int] = {}
    for (i, c), n in cnt.items():
        if i in kept:
            cat_tot[c] = cat_tot.get(c, 0) + n
    tot = float(n_ratings)
    p_e = dsum((c / tot) * (c / tot) for c in cat_tot.values())
    kappa = (p_bar - p_e) / (1.0 - p_e) if p_e < 1.0 else 0.0
    assert (row["n_items"], row["n_ratings"]) == (n_items, n_ratings)
    assert row["p_bar"] == r6(p_bar)
    assert row["p_e"] == r6(p_e)
    assert row["kappa"] == r6(kappa)


tcl_rows = st.lists(
    st.tuples(st.sampled_from(["A", "B", "C"]), st.integers(0, 4)),
    min_size=1,
    max_size=50,
)


@given(rows=tcl_rows)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_tcloseness_property_matches_twin(spark, rows):
    from staticql_spark.operators.privacy import tcloseness_report

    df = spark.createDataFrame(rows, "cell string, s long")
    got = {
        r["cell"]: (r["n_rows"], r["emd"])
        for r in tcloseness_report(df, ["cell"], "s", t=0.2).collect()
    }
    vals = sorted({s for _, s in rows})
    m = len(vals)
    tot = len(rows)
    q = {v: sum(1 for _, s in rows if s == v) / float(tot) for v in vals}
    want = {}
    for cell in {c for c, _ in rows}:
        mine = [s for c, s in rows if c == cell]
        n = len(mine)
        # the operator's exact fold (r9 ADVICE): each (p - q) term is
        # 9dp-rounded HALF_UP (Spark F.round semantics on doubles) and
        # accumulated in Decimal, so the twin is order-free like the op
        cum, terms = Decimal(0), []
        for v in vals:
            term = Decimal(
                sum(1 for s in mine if s == v) / float(n) - q[v]
            ).quantize(Decimal("1e-9"), rounding=ROUND_HALF_UP)
            cum += term
            terms.append(abs(cum))
        emd = r6(float(sum(terms)) / (m - 1)) if m > 1 else 0.0
        want[cell] = (n, emd)
    assert got == want


qs_rows = st.lists(
    st.tuples(st.integers(0, 10_000), st.integers(-50, 50)),
    min_size=1,
    max_size=60,
    unique_by=lambda t: t[0],
)


@given(rows=qs_rows)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_qsketch_quantiles_property_matches_twin(spark, rows):
    import hashlib

    df = spark.createDataFrame(
        [(k, float(v)) for k, v in rows], "k: long, x: double"
    )
    k = 16
    got = {
        r["q"]: (r["est_v"], r["sketch_n"])
        for r in qsketch_quantiles(
            qsketch(df, "x", "k", k=k), qs=(0.0, 0.3, 0.5, 1.0)
        ).collect()
    }
    hv = sorted(
        (
            int(hashlib.md5(f"qsk1|{key}".encode()).hexdigest()[:15], 16),
            float(v),
        )
        for key, v in rows
    )[:k]
    byv = sorted(hv, key=lambda p: (p[1], p[0]))
    n = len(byv)
    want = {}
    for q in (0.0, 0.3, 0.5, 1.0):
        rank = max(1, math.ceil(q * n))
        want[q] = (byv[rank - 1][1], n)
    assert got == want


label_lists = st.lists(
    st.tuples(
        st.integers(0, 4),                  # item
        st.integers(0, 3),                  # rater
        st.sampled_from(["a", "b", "c"]),   # category
    ),
    min_size=1,
    max_size=40,
)


@given(labels=label_lists)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_rater_confusion_property_matches_twin(spark, labels):
    # for ANY label multiset (modal ties, singleton items, repeated
    # (item, rater) rows) the confusion cells must equal the direct
    # definition with the (count desc, category asc) modal tiebreak
    df = spark.createDataFrame(labels, "item: long, rater: long, cat: string")
    got = {
        (r["rater"], r["consensus_cat"], r["label_cat"]): r["n"]
        for r in preference.rater_confusion(df).collect()
    }
    from collections import Counter, defaultdict

    per_item = defaultdict(Counter)
    for it, _, c in labels:
        per_item[it][c] += 1
    cons = {
        it: min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        for it, cnt in per_item.items()
    }
    want = Counter((r, cons[it], c) for it, r, c in labels)
    assert got == dict(want)
