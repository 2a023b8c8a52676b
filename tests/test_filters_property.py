"""Property test: filter compilation matches the reference's any-element
semantics on array fields (SURVEY §7.3.2 risk item P5) for arbitrary data.

The Python model below IS the reference semantics (src/utils/field.ts
resolveField + per-element index fan-out): a filter on an array-valued field
matches a row iff ANY element matches; never whole-array equality.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from staticql_spark.plans.filters import Filter, compile_filters

_elem = st.text(alphabet="abcXYZ-", min_size=0, max_size=4)


def _model_match(tags: list[str], val: str, flt_op: str, needles: list[str]) -> bool:
    if flt_op == "eq":
        return val in tags
    if flt_op == "startsWith":
        return any(t.startswith(val) for t in tags)
    return any(t in needles for t in tags)  # in


@given(
    rows=st.lists(st.lists(_elem, min_size=0, max_size=4), min_size=0, max_size=12),
    op=st.sampled_from(["eq", "startsWith", "in"]),
    needle=_elem,
    needles=st.lists(_elem, min_size=1, max_size=3),
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_array_filter_any_element_semantics(spark, rows, op, needle, needles):
    df = spark.createDataFrame(
        [(i, tags) for i, tags in enumerate(rows)], "id long, tags array<string>"
    )
    value = needles if op == "in" else needle
    cond = compile_filters(df, [Filter("tags", op, value)])
    got = {r["id"] for r in df.filter(cond).collect()}
    expected = {
        i for i, tags in enumerate(rows) if _model_match(tags, needle, op, needles)
    }
    assert got == expected
