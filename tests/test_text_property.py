"""Property tests: corpus-concentration and ranking-eval operators vs
brute-force Python twins — for ANY random corpus / ranking pair
(all-hapax groups, all-tied frequencies, disjoint lists, reversed
orders) the operators must equal the direct definitions.
"""

from __future__ import annotations

import pytest

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from staticql_spark.operators import text
from staticql_spark.operators.similarity import kendall_tau_overlap

# small token alphabet so heavy ties and hapax floods both arise
corpus_strategy = st.lists(
    st.tuples(
        st.sampled_from(["en", "fr"]),
        st.lists(
            st.sampled_from(["a", "b", "c", "d", "e", "f", "g"]),
            min_size=1,
            max_size=12,
        ),
    ),
    min_size=1,
    max_size=10,
)


@given(docs=corpus_strategy)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow  # soak-grade: excluded from the default gate (pytest.ini)
def test_gini_property_matches_bruteforce(spark, docs):
    rows = [(i, " ".join(toks), lang) for i, (lang, toks) in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {
        r["grp"]: (r["vocab"], r["n_tokens"], r["gini"])
        for r in text.gini_concentration(df).collect()
    }
    per_lang = {}
    for lang, toks in docs:
        per_lang.setdefault(lang, Counter()).update(toks)
    for lang, cnt in per_lang.items():
        xs = sorted(cnt.values())
        n, s = len(xs), sum(xs)
        rank_mass = sum((i + 1) * x for i, x in enumerate(xs))
        gini = 2.0 * rank_mass / (n * s) - (n + 1.0) / n
        assert got[lang] == (n, s, round(gini, 6)), (lang, xs)


# per-query rankings: a permutation prefix of a small item universe
rankings_strategy = st.lists(
    st.tuples(
        st.integers(0, 2),                              # query id
        st.permutations(list(range(10))),               # item order (list a)
        st.permutations(list(range(10))),               # item order (list b)
        st.integers(1, 5),                              # k_a
        st.integers(1, 5),                              # k_b
    ),
    min_size=1,
    max_size=3,
    unique_by=lambda t: t[0],
)


@given(qs=rankings_strategy)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow  # soak-grade: excluded from the default gate (pytest.ini)
def test_kendall_tau_property_matches_bruteforce(spark, qs):
    a_rows, b_rows = [], []
    for q, perm_a, perm_b, ka, kb in qs:
        a_rows += [(q, item, r + 1) for r, item in enumerate(perm_a[:ka])]
        b_rows += [(q, item, r + 1) for r, item in enumerate(perm_b[:kb])]
    schema = "query_id long, neighbor_id long, rank long"
    a = spark.createDataFrame(a_rows, schema)
    b = spark.createDataFrame(b_rows, schema)
    got = {
        r["query_id"]: (r["n_overlap"], r["concordant"], r["discordant"], r["tau"])
        for r in kendall_tau_overlap(a, b).collect()
    }
    for q, perm_a, perm_b, ka, kb in qs:
        ra = {item: r + 1 for r, item in enumerate(perm_a[:ka])}
        rb = {item: r + 1 for r, item in enumerate(perm_b[:kb])}
        ov = sorted(set(ra) & set(rb), key=lambda i: ra[i])
        c = d = 0
        for i in range(len(ov)):
            for j in range(i + 1, len(ov)):
                x, y = ov[i], ov[j]   # ra[x] < ra[y] by sort
                if rb[y] > rb[x]:
                    c += 1
                elif rb[y] < rb[x]:
                    d += 1
        m = len(ov)
        tau = round((c - d) / (m * (m - 1) / 2.0), 6) if m >= 2 else 0.0
        assert got[q] == (m, c, d, tau), (q, ov)
