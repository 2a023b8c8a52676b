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
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
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
