"""Deterministic distinct-count sketching (KMV / bottom-k).

HyperLogLog (`approx_count_distinct`) is the built-in answer, but its
estimate is implementation-specific — no cross-engine oracle can verify
it. The K-Minimum-Values sketch is the classic alternative (Bar-Yossef
et al. 2002) with a fully deterministic definition: hash every value with
a fixed function, keep the k smallest distinct hashes, and estimate
ndv ≈ (k-1) / h_(k) where h_(k) is the k-th smallest hash normalized to
[0, 1). Same md5-derived 60-bit integer hash as the rest of the repo
(text.hash_sample, dedup shingles), so DuckDB reproduces the sketch —
and the estimate — bit-for-bit.

Scale shape: the distinct() shuffles only 8-byte hashes with map-side
combine, and the k-smallest step compiles to TakeOrderedAndProject —
per-partition top-k heaps merged on the driver, never a global sort.
Sketches of two tables can be unioned (merge = k smallest of the union),
which is what makes KMV a sketch rather than just a sample.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# 15 hex chars = 60 bits: exact in long AND in double (< 2^53 after the
# normalize divide's rounding is irrelevant — the ratio is one division).
_HASH_SPACE = float(16 ** 15)


def kmv_hash(col, salt: str = "kmv1"):
    """60-bit uniform hash of a value, identical in Spark and DuckDB."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + "|"), col.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")


def kmv_distinct(df: DataFrame, col: str, k: int = 256, salt: str = "kmv1") -> DataFrame:
    """One-row summary: KMV estimate of ndv(col) next to the exact count.

    Columns: sketch_k (rows actually in the sketch — min(k, ndv)),
    kth_hash (the sketch's max hash, exact long), est_ndv (the (k-1)/u
    estimator rounded to 2, or the exact count when ndv < k), exact_ndv.
    """
    hashes = (
        df.select(kmv_hash(F.col(col), salt).alias("h"))
        .filter(F.col("h").isNotNull())
        .distinct()
    )
    sketch = hashes.orderBy("h").limit(k)
    agg = sketch.agg(
        F.count("h").alias("sketch_k"), F.max("h").alias("kth_hash")
    )
    est = F.when(
        F.col("sketch_k") < F.lit(k), F.col("sketch_k").cast("double")
    ).otherwise(
        (F.lit(float(k - 1)) / (F.col("kth_hash").cast("double") / F.lit(_HASH_SPACE)))
    )
    exact = df.select(F.countDistinct(col).alias("exact_ndv"))
    return agg.withColumn("est_ndv", F.round(est, 2)).crossJoin(exact)
