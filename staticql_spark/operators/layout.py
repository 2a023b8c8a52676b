"""Data-layout keys: Z-order (Morton) interleaving for multi-dimensional
file clustering.

Parquet pruning is only as good as the layout: sorting by one column
gives perfect min/max pruning on it and none on any other.  Writing a
100 TB table sorted by the Z-value of its two or three hottest filter
columns gives every one of them partial pruning power — the standard
lakehouse OPTIMIZE ZORDER BY recipe, expressed here as a plain column so
it composes with `repartitionByRange(zkey).sortWithinPartitions(zkey)`
before any write.

The interleave is an UNROLLED sum of (bit << position) terms — pure
integer arithmetic inside whole-stage codegen (a higher-order-function
fold would run interpreted, the repo's measured 2× penalty class), and
bit-for-bit reproducible in any SQL engine.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key(cols: Sequence[Column], bits: int = 16) -> Column:
    """Morton Z-value of pre-bucketed non-negative ints (< 2**bits each).

    Bit i of column j lands at output position i*len(cols)+j, so the
    curve alternates dimensions at every bit level.  Callers bucket raw
    values first (:func:`range_bucket`); total bits must stay < 63.
    """
    n = len(cols)
    if n * bits >= 63:
        raise ValueError("zorder_key: n_cols * bits must stay below 63")
    terms = []
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            terms.append(bit * F.lit(1 << (i * n + j)))
    z = terms[0]
    for t in terms[1:]:
        z = z + t
    return z


def range_bucket(c: Column, lo: Column, hi: Column, buckets: int) -> Column:
    """Linear bucket of ``c`` into [0, buckets) over the [lo, hi] range,
    in exact integer arithmetic (`div`, the repo-wide floor-division rule)."""
    span = hi - lo + F.lit(1)
    raw = F.call_function("div", (c - lo) * F.lit(buckets), span)
    return F.least(F.greatest(raw, F.lit(0)), F.lit(buckets - 1))
