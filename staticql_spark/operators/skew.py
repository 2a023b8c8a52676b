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
    id_col: str | None = None,
) -> DataFrame:
    """sum/count/avg of ``value`` per ``key`` via salted partial aggregation.

    Phase 1 shuffles on (key, salt) — hot keys split across tasks; phase 2
    shuffles |keys| x salts pre-aggregated rows only.

    Pass ``id_col`` (any unique-ish row attribute, e.g. a primary key) to get
    a fully DETERMINISTIC salt: the phase-1 shuffle key is then reproducible
    across task retries, so a fetch failure re-runs only the lost map tasks.
    """
    if id_col is not None:
        # Preferred: salt from a stable row attribute. Deterministic map
        # output — no indeterminate-stage resubmission on executor loss.
        salt = F.pmod(F.hash(F.col(id_col)), F.lit(salts))
    else:
        # Fallback: positional salt. Never hash(value) — a hot key whose rows
        # share one constant value (all-zeros spam) hashes to a single salt
        # and does not split. monotonically_increasing_id already embeds the
        # partition id in its high bits, so it alone scatters identical rows.
        # COST: this is a nondeterministic shuffle key, so Spark marks the
        # map stage indeterminate — a shuffle-fetch failure forces the whole
        # stage (not just lost tasks) to re-run. Results are still correct
        # under any scatter (sums/counts recombine identically); prefer
        # ``id_col`` when one exists to avoid the retry amplification.
        salt = F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(salts))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(F.sum(value).alias("_s"), F.count("*").alias("_c"))
    )
    return partial.groupBy(key).agg(
        F.sum("_s").alias(f"sum_{value}"),
        F.sum("_c").alias("n_rows"),
        (F.sum("_s") / F.sum("_c")).alias(f"avg_{value}"),
    )


def skew_report(df: DataFrame, key: str, top: int = 10) -> DataFrame:
    """Join/agg-key skew diagnostic — run it BEFORE picking a strategy for
    a big shuffle: the heaviest ``top`` keys with their share of all rows
    and their multiple of the mean key size. A `x_mean` in the hundreds on
    the head key is the signal to reach for `salted_join`/`two_phase_agg`
    or an as-of `coarse_bucket_us` (a shuffle partition is only as fast as
    its biggest key).

    One map-side-combined groupBy over the key, then TakeOrdered on the
    |keys|-row count table; the two global stats ride along as a broadcast
    1-row cross join. Returns (key_value, n, pct_of_rows, x_mean) with the
    key stringified so any key type profiles the same way.
    """
    counts = (
        df.select(F.col(key).cast("string").alias("key_value"))
        .groupBy("key_value")
        .agg(F.count("*").alias("n"))
    )
    stats = counts.agg(
        F.sum("n").alias("__rows"), F.avg("n").alias("__mean")
    )
    return (
        counts.crossJoin(F.broadcast(stats))
        .select(
            "key_value",
            "n",
            F.round(F.col("n") * 100.0 / F.col("__rows"), 4).alias("pct_of_rows"),
            F.round(F.col("n") / F.col("__mean"), 4).alias("x_mean"),
        )
        .orderBy(F.col("n").desc(), F.col("key_value").asc())
        .limit(top)
    )
