"""As-of and range joins — time-series join families the reference engine
has no analog for (SURVEY §2.3 lists them as absent join forms) and Spark
has no native operator for either. Both are built as compositions of
existing DataFrame ops so Catalyst/AQE keep optimizing around them:

- ``asof_join``: union-then-window. One shuffle on the join key, constant
  per-row state (the "last seen right row" carried as one struct by
  ``last(..., ignorenulls=True)``), no range explosion, no per-key driver
  loop; ``coarse_bucket_us`` splits hot keys across time buckets. This
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


def _floordiv_long(t: Column, width: int) -> Column:
    """Floor division of an epoch-µs column by a positive width, entirely
    in LONG arithmetic (`div`): ``(t - pmod(t, w)) / w`` through `/` would
    be double division, exact only while the numerator is <= 2^53 — beyond
    that the rounded quotient lands boundary rows in the wrong bucket.
    pmod keeps the result sign-correct for negative timestamps."""
    return F.call_function("div", t - F.pmod(t, F.lit(width)), F.lit(width))


def _null_safe_on(a: str, b: str, cols: Sequence[str]) -> Column:
    """AND-chain of null-safe equalities between two aliased frames.

    The coarse-bucket fix-up joins must group NULL join keys together —
    exactly as the plain path's window partitioning does — so a plain
    null-rejecting equi join would silently lose cross-bucket matches for
    NULL-keyed rows. ``<=>`` is still an equi-join key for Spark's
    planner (hash/sort-merge eligible), so the join strategy is unchanged.
    """
    cond = None
    for c in cols:
        e = F.col(f"{a}.`{c}`").eqNullSafe(F.col(f"{b}.`{c}`"))
        cond = e if cond is None else cond & e
    return cond


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
    coarse_bucket_us: int | None = None,
) -> DataFrame:
    """Backward inclusive as-of join: attach to every left row the right
    row with the greatest ``right_ts`` <= ``left_ts`` for the same key(s).

    Unmatched left rows keep null value columns (left-outer semantics),
    matching DuckDB's ``ASOF LEFT JOIN``.

    The matched right row is carried as ONE struct (timestamp + all value
    columns), so a null in a right value column is attached as that null —
    per-column ``last(ignorenulls)`` would instead resurrect an older
    non-null value and silently mix columns from different right rows.

    Determinism: right rows sort before left rows at equal timestamps
    (inclusive match), and ``tiebreak`` (a unique-ish right column, e.g.
    an event id) orders duplicate (key, ts) right rows so "last" is
    well-defined — the same first-match-determinism discipline as the
    relation joins (relations.py). Without a tiebreak, callers must
    guarantee (key, ts) uniqueness on the right.

    Scale: one shuffle, partitioned by the join key. A pathologically hot
    key serializes its own window; pass ``coarse_bucket_us`` (e.g. 1 hour
    in micros) to split every key's timeline into fixed buckets: the
    carry-forward window then runs per (key, bucket) — parallelism is
    key × bucket — and a per-bucket summary (one row per non-empty
    bucket) is carried across buckets to fix up rows whose match lies in
    an earlier bucket. Output is identical to the plain path; cost is two
    extra narrow shuffles over #distinct(key, bucket) rows. SCALE.md
    documents when to flip it.
    """
    keys = [on] if isinstance(on, str) else list(on)
    clash = set(value_cols) & set(left.columns)
    if clash:
        raise ValueError(
            f"asof_join: value_cols collide with left columns {sorted(clash)};"
            " alias the right-side columns first"
        )
    if "__asof_ts" in value_cols:
        raise ValueError("asof_join: '__asof_ts' is a reserved name")
    l_us, r_us = epoch_us(left, left_ts), epoch_us(right, right_ts)

    rhs = right.select(
        *keys,
        r_us.alias("__asof_ts"),
        F.lit(0).alias("__asof_side"),
        (F.col(tiebreak) if tiebreak else F.lit(0)).alias("__asof_tie"),
        F.struct(
            r_us.alias("__asof_ts"), *[F.col(c) for c in value_cols]
        ).alias("__asof_p"),
    )
    lhs = left.select(
        "*",
        l_us.alias("__asof_ts"),
        F.lit(1).alias("__asof_side"),
        F.lit(0).cast(rhs.schema["__asof_tie"].dataType).alias("__asof_tie"),
        F.lit(None).cast(rhs.schema["__asof_p"].dataType).alias("__asof_p"),
    )
    unioned = lhs.unionByName(rhs, allowMissingColumns=True)

    order = [F.col("__asof_ts"), F.col("__asof_side"), F.col("__asof_tie")]
    if coarse_bucket_us is None:
        w = (
            Window.partitionBy(*keys)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        out = unioned.withColumn(
            "__asof_m", F.last("__asof_p", ignorenulls=True).over(w)
        ).filter(F.col("__asof_side") == 1)
    else:
        width = int(coarse_bucket_us)
        if width <= 0:
            raise ValueError("asof_join: coarse_bucket_us must be > 0")
        t = F.col("__asof_ts")
        bucketed = unioned.withColumn("__asof_bkt", _floordiv_long(t, width))
        # Phase 1: carry within each (key, bucket) — the hot key's window
        # is now split across its buckets instead of one serial partition.
        w1 = (
            Window.partitionBy(*keys, "__asof_bkt")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        local = bucketed.withColumn(
            "__asof_loc", F.last("__asof_p", ignorenulls=True).over(w1)
        )
        # Phase 2: per-bucket final right payload (one row per non-empty
        # (key, bucket)), carried across STRICTLY EARLIER buckets per key.
        # This window orders #distinct buckets per key — bounded by
        # time-span / width, not by the hot key's row count.
        summ = (
            bucketed.filter(F.col("__asof_side") == 0)
            .groupBy(*keys, "__asof_bkt")
            .agg(
                F.max_by(
                    "__asof_p", F.struct("__asof_ts", "__asof_tie")
                ).alias("__asof_fin")
            )
        )
        all_bkts = bucketed.select(*keys, "__asof_bkt").distinct()
        w2 = (
            Window.partitionBy(*keys)
            .orderBy("__asof_bkt")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        jcols = [*keys, "__asof_bkt"]
        carry = (
            all_bkts.alias("__ab")
            .join(summ.alias("__sm"), _null_safe_on("__ab", "__sm", jcols), "left")
            .select(
                *[F.col(f"__ab.`{c}`").alias(c) for c in jcols],
                F.col("__sm.__asof_fin").alias("__asof_fin"),
            )
            .withColumn("__asof_in", F.last("__asof_fin", ignorenulls=True).over(w2))
            .select(*keys, "__asof_bkt", "__asof_in")
        )
        out = (
            local.filter(F.col("__asof_side") == 1)
            .alias("__lo")
            .join(carry.alias("__ca"), _null_safe_on("__lo", "__ca", jcols), "left")
            .select("__lo.*", F.col("__ca.__asof_in").alias("__asof_in"))
            .withColumn("__asof_m", F.coalesce("__asof_loc", "__asof_in"))
        )

    m = F.col("__asof_m")
    if tolerance_us is not None:
        stale = m["__asof_ts"] < F.col("__asof_ts") - F.lit(tolerance_us)
        out = out.withColumn(
            "__asof_m", F.when(stale, F.lit(None).cast(rhs.schema["__asof_p"].dataType)).otherwise(m)
        )
    return out.select(
        *left.columns, *[F.col("__asof_m")[c].alias(c) for c in value_cols]
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
        return _floordiv_long(t, width)

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


def interval_concurrency(
    df: DataFrame,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Sweep-line concurrent-interval counts over DATE intervals — "how
    many orders are open / items in transit / sessions live on each
    day".  The classic naive formulation explodes every interval into
    its covered days (an interval spanning a year costs 365 rows); the
    sweep line emits exactly TWO delta rows per interval (+1 at start,
    -1 the day after end), aggregates them per day, and takes a running
    sum — O(2·|rows|) regardless of interval length.

    Returns (d, net, open_count): per-day net change and the number of
    intervals covering that day (inclusive of both endpoints).  Days
    with no boundary are absent — the count is constant between emitted
    rows, which is what a downstream plot/join interpolates.  Rows with
    a NULL endpoint are dropped (an open-ended interval never closes —
    feed a sentinel end date if "still open" should count forever).

    Scale: the running-sum window runs over the per-DAY AGGREGATE
    (|distinct days| rows — bounded by the calendar, not the data), so
    the single-partition window that makes global running sums a scale
    bug elsewhere is harmless here; the raw rows cross one map-side-
    combined date-keyed shuffle.
    """
    # drop half-open rows BEFORE splitting into deltas: a NULL start must
    # not leave its -1 end delta behind (and vice versa)
    df = df.filter(F.col(start_col).isNotNull() & F.col(end_col).isNotNull())
    starts = df.select(
        F.to_date(F.col(start_col)).alias("d"), F.lit(1).alias("__delta")
    )
    ends = df.select(
        F.date_add(F.to_date(F.col(end_col)), 1).alias("d"),
        F.lit(-1).alias("__delta"),
    )
    deltas = (
        starts.union(ends)
        .groupBy("d")
        .agg(F.sum("__delta").cast("long").alias("net"))
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return deltas.withColumn("open_count", F.sum("net").over(w).cast("long"))
