"""Property test: asof_join equals the per-row brute-force definition —
for ANY keyed time series (duplicate timestamps, missing keys, empty
sides), the attached value is the right row with the greatest ts <= left
ts, ties resolved by the declared tiebreak, absent matches null."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from staticql_spark.operators.asof import asof_join

KEYS = ["a", "b"]


@given(
    left=st.lists(
        st.tuples(st.sampled_from(KEYS), st.integers(0, 20)),
        min_size=0, max_size=12,
    ),
    right=st.lists(
        st.tuples(st.sampled_from(KEYS), st.integers(0, 20)),
        min_size=0, max_size=12,
    ),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_asof_matches_bruteforce(spark, left, right):
    if not left:
        return
    lrows = [(k, t, i) for i, (k, t) in enumerate(left)]
    rrows = [(k, t, i, float(i * 10)) for i, (k, t) in enumerate(right)]
    ldf = spark.createDataFrame(lrows, "key string, lts long, lid long")
    rdf = spark.createDataFrame(rrows, "key string, rts long, rid long, v double")

    out = asof_join(
        ldf, rdf, on="key", left_ts="lts", right_ts="rts",
        value_cols=["v", "rid"], tiebreak="rid",
    )
    got = {r["lid"]: (r["v"], r["rid"]) for r in out.collect()}

    def brute(k, t):
        cands = [(rt, rid, v) for (rk, rt, rid, v) in rrows if rk == k and rt <= t]
        if not cands:
            return (None, None)
        rt, rid, v = max(cands, key=lambda c: (c[0], c[1]))
        return (v, rid)

    want = {lid: brute(k, t) for (k, t, lid) in lrows}
    assert got == want
    assert len(got) == len(lrows)  # every left row survives exactly once
