"""Scalar helpers shared across the engine (reference §2.8 parity).

All pure-Python pieces (slug/path math, cursor codec, prefix hex) plus the
Column-level stringify used by the staticql surface.
"""

from __future__ import annotations

import base64
import json
import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------- slug/path
# Reference: src/SourceConfigResolver.ts:143-212 — slug is the file path
# relative to the glob base with "/" <-> "--"; extension stripped.

SLUG_SEP = "--"


def path_to_slug(rel_path: str) -> str:
    no_ext = re.sub(r"\.[^/.]+$", "", rel_path)
    return no_ext.replace("/", SLUG_SEP)


def slug_to_path(slug: str, ext: str) -> str:
    return slug.replace(SLUG_SEP, "/") + ext


def glob_base_and_regex(pattern: str) -> tuple[str, re.Pattern]:
    """Split a glob into its static base dir and a regex matching the rest.

    Supports ``*`` (no slash), ``**`` (any depth) and ``?`` — the subset the
    reference's globs use (SourceConfigResolver.ts:184-212).
    """
    parts = pattern.split("/")
    base: list[str] = []
    for p in parts:
        if any(ch in p for ch in "*?["):
            break
        base.append(p)
    rest = "/".join(parts[len(base):])
    rx = ""
    i = 0
    while i < len(rest):
        c = rest[i]
        if rest[i : i + 3] == "**/":
            rx += "(?:.*/)?"
            i += 3
        elif rest[i : i + 2] == "**":
            rx += ".*"
            i += 2
        elif c == "*":
            rx += "[^/]*"
            i += 1
        elif c == "?":
            rx += "[^/]"
            i += 1
        else:
            rx += re.escape(c)
            i += 1
    return "/".join(base), re.compile("^" + rx + "$")


# ---------------------------------------------------------------- prefix hex
# Reference: src/constants.ts:21-27 — each of the first `depth` Unicode code
# points of a value maps to a 4-hex-digit dir name ("a"->"0061","あ"->"3042").


def prefix_hex_path(value: str, depth: int = 1) -> str:
    cps = [f"{ord(c):04x}" for c in value[:depth]]
    return "/".join(cps) if cps else "0000"


# ---------------------------------------------------------------- cursor codec
# Reference: src/utils/pagenation.ts:84-107 — base64(JSON {slug, order}).


def encode_cursor(slug: str, order: dict[str, str] | None = None) -> str:
    payload = {"slug": slug, "order": order or {}}
    return base64.b64encode(json.dumps(payload, ensure_ascii=False).encode("utf-8")).decode("ascii")


def decode_cursor(cursor: str) -> dict:
    try:
        data = json.loads(base64.b64decode(cursor).decode("utf-8"))
    except Exception as exc:  # noqa: BLE001 - parity: invalid cursor is a user error
        raise ValueError(f"invalid cursor: {cursor!r}") from exc
    if not isinstance(data, dict) or "slug" not in data:
        raise ValueError(f"invalid cursor: {cursor!r}")
    data.setdefault("order", {})
    return data


# ---------------------------------------------------------------- stringify


def stringify(col: Column) -> Column:
    """Reference stringifies every index/order/filter value
    (src/utils/field.ts:40 ``String(v)``). Arrays stringify element-wise."""
    return col.cast("string")


def stringify_elements(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("string"))
