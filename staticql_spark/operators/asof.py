"""As-of and range joins — time-series join families the reference engine
has no analog for (SURVEY §2.3 lists them as absent join forms) and Spark
has no native operator for either. Both are built as compositions of
existing DataFrame ops so Catalyst/AQE keep optimizing around them:

- ``asof_join``: union-then-window. One shuffle on the join key, constant
  per-row state (the "last seen right row" carried by ``last(...,
  ignorenulls=True)``), no range explosion, no per-key driver loop. This
  is the standard distributed as-of formulation (the same shape Flink's
  temporal join and kdb's aj compile to): at 100 TB it costs exactly one
  hash shuffle of left+right on the key — the same as the equi join a
  user would otherwise mis-write.

- ``range_join``: bucketed equi join. Each right row lands in one
  time bucket of width = the span of the match window; each left row
  probes the (at most two) buckets its window overlaps, via a 2-element
  ``sequence`` explode — NOT a cross join, NOT an unbounded explode. The
  equi-join on (key, bucket) shuffles both sides once; the exact range
  predicate then filters within the matched bucket pairs. Candidate
  blow-up is bounded by window-width × per-bucket density, never O(n²).

Timestamps are normalized to epoch microseconds with TZ-free arithmetic
(``timestampdiff`` against an NTZ epoch) so results are identical under
any session timezone — the hazard class that bit round 1's event queries.

Internal working columns use the ``__asof_`` / ``__rj_`` prefixes so a
source that legitimately owns names like ``_side`` or ``_bkt`` is never
silently overwritten (same discipline as pagination's ``__staticql_ov``).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_EPOCH_NTZ = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def epoch_us(df: DataFrame, ts_col: str) -> Column:
    """Epoch-microseconds of a timestamp column, timezone-free.

    TIMESTAMP_NTZ diffs against an NTZ epoch (pure wall-clock math);
    numeric columns pass through; TIMESTAMP (LTZ) casts through the
    internal micros representation.
    """
    dt = df.schema[ts_col].dataType
    if isinstance(dt, (T.LongType, T.IntegerType, T.DoubleType)):
        return F.col(ts_col).cast("long")
    if isinstance(dt, T.TimestampNTZType):
        return F.expr(f"timestampdiff(MICROSECOND, {_EPOCH_NTZ}, {ts_col})")
    # TIMESTAMP (LTZ): the internal value is an instant in micros.
    return F.unix_micros(F.col(ts_col))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    *,
    tolerance_us: int | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """Backward inclusive as-of join: attach to every left row the right
    row with the greatest ``right_ts`` <= ``left_ts`` for the same key(s).

    Unmatched left rows keep null value columns (left-outer semantics),
    matching DuckDB's ``ASOF LEFT JOIN``.

    Determinism: right rows sort before left rows at equal timestamps
    (inclusive match), and ``tiebreak`` (a unique-ish right column, e.g.
    an event id) orders duplicate (key, ts) right rows so "last" is
    well-defined — the same first-match-determinism discipline as the
    relation joins (relations.py). Without a tiebreak, callers must
    guarantee (key, ts) uniqueness on the right.

    Scale: one shuffle, partitioned by the join key. A pathologically hot
    key serializes its own window; for that shape use ``range_join`` with
    a time bucket in the key instead.
    """
    keys = [on] if isinstance(on, str) else list(on)
    clash = set(value_cols) & set(left.columns)
    if clash:
        raise ValueError(
            f"asof_join: value_cols collide with left columns {sorted(clash)};"
            " alias the right-side columns first"
        )
    l_us, r_us = epoch_us(left, left_ts), epoch_us(right, right_ts)

    lhs = left.withColumn("__asof_ts", l_us).withColumn("__asof_side", F.lit(1))
    rhs = right.select(
        *keys,
        r_us.alias("__asof_ts"),
        F.lit(0).alias("__asof_side"),
        *[F.col(c) for c in value_cols],
        (F.col(tiebreak) if tiebreak else F.lit(0)).alias("__asof_tie"),
    )
    # Align schemas for the union: left carries null value columns.
    for c in value_cols:
        lhs = lhs.withColumn(c, F.lit(None).cast(rhs.schema[c].dataType))
    lhs = lhs.withColumn("__asof_tie", F.lit(0).cast(rhs.schema["__asof_tie"].dataType))
    unioned = lhs.select(*rhs.columns, *[c for c in lhs.columns if c not in rhs.columns]).unionByName(
        rhs, allowMissingColumns=True
    )

    w = (
        Window.partitionBy(*keys)
        .orderBy("__asof_ts", "__asof_side", "__asof_tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[F.last(c, ignorenulls=True).over(w).alias(f"__asof_m_{c}") for c in value_cols],
        F.last(F.when(F.col("__asof_side") == 0, F.col("__asof_ts")), ignorenulls=True)
        .over(w)
        .alias("__asof_m_ts"),
    )
    out = carried.filter(F.col("__asof_side") == 1)
    if tolerance_us is not None:
        stale = F.col("__asof_m_ts") < F.col("__asof_ts") - F.lit(tolerance_us)
        for c in value_cols:
            out = out.withColumn(f"__asof_m_{c}", F.when(stale, F.lit(None)).otherwise(F.col(f"__asof_m_{c}")))
        out = out.withColumn("__asof_m_ts", F.when(stale, F.lit(None)).otherwise(F.col("__asof_m_ts")))
    keep = [c for c in left.columns]
    return out.select(
        *keep, *[F.col(f"__asof_m_{c}").alias(c) for c in value_cols]
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    *,
    lower_us: int,
    upper_us: int,
    include_lower: bool = True,
    include_upper: bool = True,
    right_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Interval join (inner): pair left rows with right rows whose
    timestamp falls in [left_ts + lower_us, left_ts + upper_us] (bounds
    configurable) for the same key(s), via bucketing — never a cross join.

    Bucket width = (upper_us - lower_us): a left row's window then spans
    at most two buckets, so the probe side is exploded at most 2× (a
    bounded ``sequence``), the join is a plain equi join on (key, bucket),
    and the exact range predicate prunes within buckets.

    Left-outer shapes ("count follow-ups, zeros included") compose from
    this: aggregate the inner result per left key, then left-join the
    counts back onto the left table — two narrow shuffles instead of an
    all-columns anti join.
    """
    if upper_us <= lower_us:
        raise ValueError("range_join: upper_us must be > lower_us")
    keys = [on] if isinstance(on, str) else list(on)
    width = upper_us - lower_us
    rcols = list(right_cols) if right_cols is not None else [
        c for c in right.columns if c not in keys
    ]
    clash = set(rcols) & set(left.columns)
    if clash:
        raise ValueError(
            f"range_join: right columns collide with left columns {sorted(clash)};"
            " alias the right side first"
        )

    l_us, r_us = epoch_us(left, left_ts), epoch_us(right, right_ts)

    def bucket(t: Column) -> Column:
        # Exact floor division in long arithmetic: double division can
        # round t/width onto an integer boundary and flip the bucket,
        # silently dropping boundary matches. pmod keeps it sign-correct.
        return ((t - F.pmod(t, F.lit(width))) / F.lit(width)).cast("long")

    lhs = left.withColumn("__rj_l_us", l_us)
    rhs = right.select(
        *keys, r_us.alias("__rj_r_us"), *[F.col(c).alias(f"__rj_r_{c}") for c in rcols]
    ).withColumn("__rj_bkt", bucket(F.col("__rj_r_us")))

    lo, hi = F.col("__rj_l_us") + F.lit(lower_us), F.col("__rj_l_us") + F.lit(upper_us)
    probe = lhs.withColumn(
        "__rj_bkt", F.explode(F.sequence(bucket(lo), bucket(hi)))
    )
    in_lo = (F.col("__rj_r_us") >= lo) if include_lower else (F.col("__rj_r_us") > lo)
    in_hi = (F.col("__rj_r_us") <= hi) if include_upper else (F.col("__rj_r_us") < hi)
    joined = probe.join(rhs, on=keys + ["__rj_bkt"], how="inner").filter(in_lo & in_hi)

    out_cols = list(left.columns) + [F.col(f"__rj_r_{c}").alias(c) for c in rcols]
    return joined.select(*out_cols)
