"""Large-scale pipeline operators (beyond the reference's surface).

- dedup: exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding near-dup
- similarity: exact cosine top-k, LSH-bucketed ANN, IVF ANN
- text: tokenization, quality scoring, language ID, fingerprinting
- multimodal: binary payload plumbing with stubbed codecs
- bucketing: shuffle-free co-located joins
- skew: salted joins / two-phase aggregation
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Repartition a narrow input up to the session's core count before
    CPU-heavy per-row work.

    Parquet splits at row-group granularity, so a compact table (one file,
    one row group) scans as ONE partition no matter how many cores exist —
    and every downstream map runs single-threaded. For compute-dense
    operators (regex scoring, shingling, hashing, vector math) one small
    round-robin shuffle of the input unlocks full parallelism; the shuffle
    cost is O(input bytes), always dwarfed by the per-row compute it
    parallelizes. Inputs that already have >= defaultParallelism partitions
    (any real 100 TB table) pass through untouched.

    The width probe is ``df.inputFiles()`` (a catalog/metadata call), NOT
    ``df.rdd.getNumPartitions()``: the RDD conversion forces full physical
    planning of the DataFrame on every operator call. File count slightly
    undercounts splits for multi-row-group files (worst case: one redundant
    repartition of an input small enough to sit in one file), and returns
    [] for non-file sources, which pass through untouched — local
    createDataFrame inputs are already sliced to defaultParallelism. On a
    cluster where even the file listing is unwanted, set
    ``spark.staticql.ensureParallelism=off`` to make this a no-op.
    """
    spark = df.sparkSession
    if spark.conf.get("spark.staticql.ensureParallelism", "auto") == "off":
        return df
    target = spark.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:  # streaming sources raise; never block the pipeline
        return df
    if files and len(files) < target:
        return df.repartition(target)
    return df


from . import bucketing, dedup, multimodal, similarity, skew, text  # noqa: E402

__all__ = [
    "bucketing",
    "dedup",
    "ensure_parallelism",
    "multimodal",
    "similarity",
    "skew",
    "text",
]
