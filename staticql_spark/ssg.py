"""SSG export sink — run a query at build time, emit a static JSON payload.

Parity: ``staticQuery(staticql, fn)`` (reference src/ssg.ts:48-58) returns
``{data, pageInfo, generatedAt}``; the CLI writes it next to the static
site. Here ``static_query`` returns the payload dict and ``export_query``
writes it as one JSON file (driver-side write is correct here: an SSG page
is by definition a small page of rows, bounded by page_size).
"""

from __future__ import annotations

import json
from collections.abc import Callable
from datetime import datetime, timezone

from .plans.pagination import Page
from .query import QueryBuilder


def _row_to_jsonable(row) -> dict:
    d = row.asDict(recursive=True)
    return {k: v for k, v in d.items()}


def static_query(staticql, fn: Callable[[object], QueryBuilder]) -> dict:
    """Run ``fn(staticql)`` (which must return a built QueryBuilder) and
    shape the result as the reference's SSG payload."""
    builder = fn(staticql)
    page: Page = builder.exec()
    return {
        "data": [_row_to_jsonable(r) for r in page.data],
        "pageInfo": {
            "hasNextPage": page.page_info.has_next_page,
            "hasPreviousPage": page.page_info.has_previous_page,
            "startCursor": page.page_info.start_cursor,
            "endCursor": page.page_info.end_cursor,
        },
        "generatedAt": datetime.now(timezone.utc).isoformat(),
    }


def export_query(staticql, fn: Callable[[object], QueryBuilder], out_path: str) -> dict:
    payload = static_query(staticql, fn)
    with open(out_path, "w", encoding="utf-8") as f:
        json.dump(payload, f, ensure_ascii=False, default=str)
    return payload
