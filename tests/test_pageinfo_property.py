"""Property test: the staticql Page/PageInfo machinery is a complete
forward traversal with exact flag semantics, and the ``before`` direction
reproduces the preceding page (SURVEY §7.3.3 — the two PageInfo branches).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from staticql_spark.plans.pagination import paginate

_val = st.one_of(st.none(), st.text(alphabet="abcd", min_size=0, max_size=3))


@given(
    vals=st.lists(_val, min_size=1, max_size=16),
    page_size=st.integers(min_value=1, max_value=5),
    desc=st.booleans(),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow  # soak-grade: excluded from the default gate (pytest.ini)
def test_pageinfo_forward_walk_and_before_inverse(spark, vals, page_size, desc):
    rows = [(f"s{i:02d}", v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "slug string, name string")
    order = sorted(
        rows, key=lambda r: (r[1] or "", r[0]), reverse=desc
    )

    pages = []
    cursor = None
    for pageno in range(len(rows) + 2):
        page = paginate(
            df,
            "name",
            F.col("name"),
            F.col("slug"),
            direction="desc" if desc else "asc",
            page_size=page_size,
            cursor=cursor,
            cursor_direction="after",
        )
        if not page.data:
            assert pageno > 0, "first page of nonempty table cannot be empty"
            break
        pages.append(page)
        # forward flags: prev iff a cursor was used, next iff more rows exist
        assert page.page_info.has_previous_page == (cursor is not None)
        seen = sum(len(p.data) for p in pages)
        assert page.page_info.has_next_page == (seen < len(rows))
        if not page.page_info.has_next_page:
            break
        cursor = page.page_info.end_cursor
    else:
        pytest.fail("pagination did not terminate")

    walked = [(r["slug"], r["name"]) for p in pages for r in p.data]
    assert walked == order

    # 'before' from page k's start cursor reproduces page k-1 exactly
    for k in range(1, len(pages)):
        back = paginate(
            df,
            "name",
            F.col("name"),
            F.col("slug"),
            direction="desc" if desc else "asc",
            page_size=page_size,
            cursor=pages[k].page_info.start_cursor,
            cursor_direction="before",
        )
        assert [(r["slug"], r["name"]) for r in back.data] == [
            (r["slug"], r["name"]) for r in pages[k - 1].data
        ]
        # backward walk: next iff we came from somewhere, prev iff overflow
        assert back.page_info.has_next_page is True
        assert back.page_info.has_previous_page == (k > 1)
