"""Skew mitigation for large joins — the hand-rolled complement to AQE.

AQE's skew-join splitting (enabled in session.py) handles most runtime skew;
``salted_join`` is for the pathological case AQE cannot fix: a single hot
key on BOTH sides, or aggregations over a hot group.

- ``salted_join(left, right, key, salts)``: replicate the (small) right side
  ``salts`` times, scatter the left side across salt buckets with a
  deterministic per-row salt, join on (key, salt). The hot key's rows spread
  over ``salts`` tasks instead of one straggler.
- ``two_phase_agg``: classic partial/final split for hot-group aggregation —
  group by (key, salt) first, then re-aggregate by key. Sum/count compose;
  avg is carried as (sum, count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi join on ``key`` with salt-scatter on the left, replicate on the
    right. Deterministic salt (hash of the whole left row, not a RNG) keeps
    the plan replayable."""
    salted_left = left.withColumn(
        "_salt", F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(salts))
    )
    salted_right = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    )
    out = salted_left.join(salted_right, [key, "_salt"], how)
    return out.drop("_salt")


def two_phase_agg(
    df: DataFrame,
    key: str,
    value: str,
    salts: int = 16,
) -> DataFrame:
    """sum/count/avg of ``value`` per ``key`` via salted partial aggregation.

    Phase 1 shuffles on (key, salt) — hot keys split across tasks; phase 2
    shuffles |keys| x salts pre-aggregated rows only.
    """
    # Salt by a per-ROW position hash, never by hash(value): a hot key whose
    # rows share one constant value (all-zeros spam) hashes to a single salt
    # and does not split. A position-derived salt scatters even fully
    # identical rows; it is partition-layout-dependent, which is harmless
    # here — the salt only buckets the partial aggregation, and sums/counts
    # re-combine identically under any scatter.
    partial = (
        df.withColumn(
            "_salt",
            F.pmod(
                F.hash(F.spark_partition_id(), F.monotonically_increasing_id()),
                F.lit(salts),
            ),
        )
        .groupBy(key, "_salt")
        .agg(F.sum(value).alias("_s"), F.count("*").alias("_c"))
    )
    return partial.groupBy(key).agg(
        F.sum("_s").alias(f"sum_{value}"),
        F.sum("_c").alias("n_rows"),
        (F.sum("_s") / F.sum("_c")).alias(f"avg_{value}"),
    )
