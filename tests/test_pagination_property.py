"""Property test: keyset pagination is a complete, ordered, exactly-once
traversal — for any data (incl. heavy order-key duplicates), any page size,
and both directions of the sort.

This is the invariant the reference's cursor machinery promises
(src/utils/pagenation.ts); OFFSET paging breaks it under concurrent inserts,
keyset paging cannot.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from staticql_spark.plans.pagination import keyset_page_df


@given(
    page_size=st.integers(min_value=1, max_value=7),
    n=st.integers(min_value=0, max_value=30),
    dup_mod=st.integers(min_value=1, max_value=4),
    desc=st.booleans(),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow  # soak-grade: excluded from the default gate (pytest.ini)
def test_keyset_paging_total_ordered_exactly_once(spark, page_size, n, dup_mod, desc):
    rows = [(i, f"g{i % dup_mod}") for i in range(n)]
    df = spark.createDataFrame(rows, "key long, grp string")

    expected = sorted(rows, key=lambda r: (r[1], r[0]), reverse=False)
    if desc:
        # order col desc, tiebreak still asc within equal groups
        expected = sorted(rows, key=lambda r: (r[1], r[0]))
        expected = sorted(expected, key=lambda r: r[1], reverse=True)

    visited = []
    after = None
    for _ in range(n + 2):  # bounded loop: must terminate
        page = keyset_page_df(
            df, [(F.col("grp"), desc)], F.col("key"), after, page_size
        ).collect()
        if not page:
            break
        visited.extend((r["key"], r["grp"]) for r in page)
        last = page[-1]
        after = [last["grp"], last["key"]]
    else:
        pytest.fail("pagination did not terminate")

    assert visited == expected


@given(
    page_size=st.integers(min_value=1, max_value=5),
    n=st.integers(min_value=0, max_value=25),
    null_mod=st.integers(min_value=2, max_value=4),
    desc=st.booleans(),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_keyset_paging_with_nulls_loses_nothing(spark, page_size, n, null_mod, desc):
    # NULLs in the order column (walk order = Spark defaults: asc NULLS
    # FIRST, desc NULLS LAST) — the walk must still visit every row exactly
    # once, including pages that END on a NULL order value
    rows = [(i, None if i % null_mod == 0 else f"g{i % 3}") for i in range(n)]
    df = spark.createDataFrame(rows, "key long, grp string")

    def keyfn(r):
        # asc: nulls first; desc handled by reversing group order only
        return ((r[1] is not None, r[1] or ""), r[0])

    expected = sorted(rows, key=keyfn)
    if desc:
        groups = sorted({r[1] for r in rows if r[1] is not None}, reverse=True)
        order = groups + [None]
        expected = [r for g in order
                    for r in sorted(rows, key=lambda x: x[0]) if r[1] == g]

    visited = []
    after = None
    for _ in range(n + 2):
        page = keyset_page_df(
            df, [(F.col("grp"), desc)], F.col("key"), after, page_size
        ).collect()
        if not page:
            break
        visited.extend((r["key"], r["grp"]) for r in page)
        last = page[-1]
        after = [last["grp"], last["key"]]
    else:
        pytest.fail("pagination did not terminate")

    assert visited == expected
