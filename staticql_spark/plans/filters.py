"""Filter compilation: staticql predicates -> Catalyst Columns.

Semantics parity:
- ops: ``eq`` / ``startsWith`` / ``in`` (reference: src/QueryBuilder.ts:590-616).
- values compare as *strings* (every index value is ``String(v)`` —
  src/utils/field.ts:40); we stringify the column side, so ``eq`` on a
  numeric column matches the reference's behavior.
- array fields match if ANY element matches (each element gets its own
  index entry — src/IndexBuilder.ts:767-791). ``eq`` on array<...> is
  membership, not whole-array equality (SURVEY §7.3.2).
- dot paths traverse structs and arrays-of-structs, flattening
  (src/utils/field.ts:23-41): ``a.b`` on array<struct<b>> -> array of b.
- filters on non-indexed fields raise the reference's needs-index error
  (src/QueryBuilder.ts:332-352) unless the engine is run in open mode.

Everything compiles to built-in expressions (exists / array_contains /
startswith) — JVM-side, codegen-friendly, pushdown-eligible.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

VALID_OPS = ("eq", "startsWith", "in")


@dataclass(frozen=True)
class Filter:
    field: str
    op: str
    value: object

    def __post_init__(self) -> None:
        if self.op not in VALID_OPS:
            raise ValueError(f"unsupported filter op: {self.op!r}")


class NeedsIndexError(ValueError):
    """Parity with the reference's `[src] needs index: [...]` error."""

    def __init__(self, source: str, filters: list[Filter]):
        payload = json.dumps(
            [{"field": f.field, "op": f.op, "value": f.value} for f in filters],
            ensure_ascii=False,
            separators=(",", ":"),
        )
        super().__init__(f"[{source}] needs index: {payload}")
        self.source = source
        self.filters = filters


def _array_path_column(df: DataFrame, path: str) -> tuple[Column, bool]:
    """Dot-path resolution over structs AND arrays-of-structs
    (e.g. ``combinedHerbs.slug`` on array<struct<slug,...>>), flattening and
    stringifying like resolveField (src/utils/field.ts:23-41)."""
    parts = path.split(".")
    dtype: T.DataType = df.schema
    col: Column | None = None
    in_array = False
    for part in parts:
        if isinstance(dtype, T.ArrayType) and isinstance(dtype.elementType, T.StructType):
            elem = dtype.elementType
            if part not in elem.fieldNames():
                raise ValueError(f"unknown field {path!r} (at {part!r})")
            inner = elem[part].dataType
            col = F.transform(col, lambda x: x.getField(part))  # noqa: B023
            if isinstance(inner, T.ArrayType):
                col = F.flatten(col)
                inner = inner.elementType
            dtype = T.ArrayType(inner)
            in_array = True
        elif isinstance(dtype, T.StructType):
            if part not in dtype.fieldNames():
                raise ValueError(f"unknown field {path!r} (at {part!r})")
            dtype = dtype[part].dataType
            col = F.col(part) if col is None else col.getField(part)
            if isinstance(dtype, T.ArrayType) and not isinstance(
                dtype.elementType, T.StructType
            ):
                in_array = True
        else:
            raise ValueError(f"cannot descend at {part!r} in {path!r}")
    assert col is not None
    if isinstance(dtype, T.ArrayType):
        dtype = dtype.elementType
    if in_array:
        col = F.filter(
            F.transform(col, lambda x: x.cast("string")), lambda x: x.isNotNull()
        )
        return col, True
    return col.cast("string"), False


def field_column(df: DataFrame, path: str) -> tuple[Column, bool]:
    """Public dot-path resolver: (stringified column, is_array)."""
    return _array_path_column(df, path)


def compile_filter(df: DataFrame, flt: Filter) -> Column:
    col, is_array = field_column(df, flt.field)
    if flt.op == "eq":
        v = F.lit(str(flt.value))
        return F.array_contains(col, v) if is_array else col == v
    if flt.op == "startsWith":
        v = str(flt.value)
        if is_array:
            return F.exists(col, lambda x: x.startswith(v))
        return col.startswith(v)
    if flt.op == "in":
        values = [str(v) for v in flt.value]
        if is_array:
            return F.arrays_overlap(col, F.array(*[F.lit(v) for v in values]))
        return col.isin(values)
    raise AssertionError(flt.op)


def compile_filters(df: DataFrame, filters: list[Filter]) -> Column | None:
    """AND-conjunction (reference: getMatchedIndexes andMode=true,
    src/QueryBuilder.ts:507-645). Catalyst merges the chain into one
    predicate and pushes eligible parts into the scan."""
    cond = None
    for flt in filters:
        c = compile_filter(df, flt)
        cond = c if cond is None else (cond & c)
    return cond
