"""Cursor (keyset) pagination compiled to filter + orderBy + limit(n+1).

Reference semantics reproduced (src/utils/pagenation.ts, src/QueryBuilder.ts
:188-301):
- cursor = base64(JSON {slug, order: {key: value}}) — encode/decode in
  staticql_spark.functions.
- ordering is (order_value, slug) with STRING comparison (index values are
  stringified; src/constants.ts:43-57 sorts by (v, vs)); slug is the
  tiebreaker, making pagination total and deterministic.
- ``after`` cursor: keyset predicate (v, s) > (cv, cs) in walk order;
  ``before``: reversed walk, re-reversed for presentation
  (src/PrefixTreeWalker.ts:27-136).
- page probe fetches pageSize+1 rows; the overflow row sets hasNextPage
  (src/QueryBuilder.ts:276-295). hasPreviousPage = a cursor was supplied in
  the forward direction (or overflow in the backward one).

Why keyset instead of offset at 100 TB: the predicate pushes into the scan
(min/max pruning on the sort column), and limit(n+1) terminates early —
no global sort materialization, no OFFSET scan-and-discard.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import decode_cursor, encode_cursor


@dataclass
class PageInfo:
    has_next_page: bool
    has_previous_page: bool
    start_cursor: str | None
    end_cursor: str | None


@dataclass
class Page:
    data: list  # list[Row]
    page_info: PageInfo


def _keyset_predicate(
    order_col: Column, slug_col: Column, cv: str | None, cs: str, forward: bool
) -> Column:
    """(order, slug) strictly beyond (cv, cs) in walk direction.

    NULL order values sort first (Spark default asc_nulls_first matches the
    reference's treatment of missing values as empty string '' — lowest).
    """
    oc = F.coalesce(order_col, F.lit(""))
    cvl = F.lit(cv if cv is not None else "")
    if forward:
        return (oc > cvl) | ((oc == cvl) & (slug_col > F.lit(cs)))
    return (oc < cvl) | ((oc == cvl) & (slug_col < F.lit(cs)))


def paginate(
    df: DataFrame,
    order_key: str,
    order_col: Column,
    slug_col: Column,
    *,
    direction: str = "asc",
    page_size: int = 20,
    cursor: str | None = None,
    cursor_direction: str = "after",
) -> Page:
    """Execute one page. ``order_col`` must already be stringified."""
    descending = direction == "desc"
    backward = cursor_direction == "before"
    # walk order: logical order, reversed when paging backwards
    walk_desc = descending != backward

    work = df
    if cursor is not None:
        cur = decode_cursor(cursor)
        cv = cur["order"].get(order_key)
        work = work.filter(
            _keyset_predicate(order_col, slug_col, cv, cur["slug"], forward=not walk_desc)
        )

    oc = F.coalesce(order_col, F.lit(""))
    # Carry the RESOLVED order value alongside each row: for a dot-path
    # order key (e.g. 'combinedHerbs.slug') the collected Row has no field
    # named order_key, and encoding the slug instead (the old fallback)
    # poisons the next page's keyset predicate. The reference encodes the
    # resolved index value (QueryBuilder.ts encodeCursorCallback).
    # Collision-safe carrier name: a source may legitimately own any short
    # column name, so uniquify until free rather than clobbering user data.
    ov = "__staticql_ov"
    while ov in work.columns:
        ov += "_"
    work = work.withColumn(ov, order_col.cast("string"))
    if walk_desc:
        work = work.orderBy(oc.desc(), slug_col.desc())
    else:
        work = work.orderBy(oc.asc(), slug_col.asc())

    rows = work.limit(page_size + 1).collect()
    overflow = len(rows) > page_size
    rows = rows[:page_size]
    if backward:
        rows.reverse()

    if backward:
        has_prev = overflow
        has_next = cursor is not None
    else:
        has_prev = cursor is not None
        has_next = overflow

    def _cursor_for(row) -> str:
        slug = row["slug"]
        return encode_cursor(str(slug), {order_key: row[ov]})

    info = PageInfo(
        has_next_page=has_next,
        has_previous_page=has_prev,
        start_cursor=_cursor_for(rows[0]) if rows else None,
        end_cursor=_cursor_for(rows[-1]) if rows else None,
    )
    data = [_strip_ov(r, ov) for r in rows]
    return Page(data=data, page_info=info)


def _strip_ov(row, ov: str):
    """Drop the internal order-value carrier field from a collected Row."""
    from pyspark.sql import Row

    d = row.asDict()
    d.pop(ov, None)
    return Row(**d)


def _beyond(col: Column, a, desc: bool) -> Column:
    """Rows strictly beyond value ``a`` in walk order, null-aware.

    Walk order matches Spark's sort defaults: asc = NULLS FIRST, desc =
    NULLS LAST. A bare ``col > lit(a)`` is null-rejecting twice over — a
    NULL row value never compares, and ``a is None`` (the previous page
    ended on a NULL) nulls the whole predicate — so a null-bearing order
    column silently drops rows mid-walk.
    """
    if a is None:
        # asc: NULLs lead, so everything non-null is beyond; desc: NULLs
        # trail, so nothing is beyond.
        return F.lit(False) if desc else col.isNotNull()
    return (col.isNull() | (col < F.lit(a))) if desc else (col > F.lit(a))


def _same(col: Column, a) -> Column:
    """Null-safe equality against a cursor value."""
    return col.isNull() if a is None else col.eqNullSafe(F.lit(a))


def keyset_page_df(
    df: DataFrame,
    order_cols: list[tuple[Column, bool]],
    tiebreak: Column,
    after: list | None,
    page_size: int,
) -> DataFrame:
    """Generic keyset page as a *DataFrame* (Spark-native surface; used by
    the oracle-checked pagination queries). ``order_cols`` = [(col, desc)].
    ``after`` = values of (order_cols..., tiebreak) from the previous page's
    last row, or None for page 1. Order columns may contain NULLs (walk
    order = Spark sort defaults: asc NULLS FIRST, desc NULLS LAST); the
    tiebreak must be non-null and unique."""
    cols = [c for c, _ in order_cols] + [tiebreak]
    if after is not None:
        pred = None
        for i, (col, desc) in enumerate(list(order_cols) + [(tiebreak, False)]):
            gt = _beyond(col, after[i], desc)
            eq_prefix = None
            for j in range(i):
                e = _same(cols[j], after[j])
                eq_prefix = e if eq_prefix is None else (eq_prefix & e)
            term = gt if eq_prefix is None else (eq_prefix & gt)
            pred = term if pred is None else (pred | term)
        df = df.filter(pred)
    order_exprs = [c.desc() if d else c.asc() for c, d in order_cols] + [tiebreak.asc()]
    return df.orderBy(*order_exprs).limit(page_size)
