"""sf0.1 bisect of the dedup_incremental bench gap (r10): BENCH r10
still shows ~3.1 s vs r8's 1.04 even with the width gate off, so the
r9 verdict's attribution (static verify width) cannot be the whole
story.  Three forms, interleaved A,B,C x 3 reps in ONE bench-like
session against the same prebuilt persisted index:

  A. r8 form verbatim (no probe reductions, default verify width);
  B. r9 probe reductions (band-key semi join, folded collide\re-crawl
     id set) with NO width logic — isolates the reductions' cost;
  C. the live r10 form (reductions + batch-gated counted width).

If B ~= C >> A, the sf0.1 gap is the price of the batch-proportional
probe reductions (the at-scale contract), not the width — accepted and
documented rather than regressed (SCALE.md §19).

Usage: python scripts/ab_incr_sf01_bisect.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from staticql_spark.operators import dedup
from staticql_spark.operators.dedup import _pairs_within, minhash_index, verify_jaccard
from staticql_spark.session import get_spark

SF = "/root/testdata/sf0.1"


def incr_r8(new_df, old_bands, old_shingles, threshold=0.2, max_bucket=1000):
    """The r8 form verbatim: no old-side reductions, default width."""
    new_bands, new_dsh = minhash_index(new_df, "text", "doc_id", 3, 16, 4)
    tagged = old_bands.select(
        "doc_id", "band", "key", F.lit(False).alias("is_new")
    ).unionByName(new_bands.withColumn("is_new", F.lit(True)))
    buckets = (
        tagged.groupBy("band", "key")
        .agg(F.array_sort(F.collect_list(F.struct(F.col("doc_id"), F.col("is_new")))).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= max_bucket)
                & F.exists("ids", lambda x: x["is_new"]))
    )
    cands = (
        buckets.select(F.explode(_pairs_within("ids")).alias("p"))
        .filter(F.col("p.id_a.is_new") | F.col("p.id_b.is_new"))
        .filter(F.col("p.id_a.doc_id") != F.col("p.id_b.doc_id"))
        .select(F.col("p.id_a.doc_id").alias("id_a"),
                F.col("p.id_b.doc_id").alias("id_b"))
        .distinct()
    )
    old_only = old_shingles.join(new_dsh.select("doc_id"), "doc_id", "left_anti")
    dsh_all = old_only.unionByName(new_dsh)
    return verify_jaccard(cands, dsh_all, "doc_id").filter(
        F.col("jaccard") >= threshold
    )


def incr_r9_nowidth(new_df, old_bands, old_shingles, threshold=0.2, max_bucket=1000):
    """r9 probe reductions verbatim, default verify width, no counts."""
    new_bands, new_dsh = minhash_index(new_df, "text", "doc_id", 3, 16, 4)
    new_dsh = new_dsh.persist()
    batch_keys = new_bands.select("band", "key").distinct()
    old_hit = old_bands.join(batch_keys, ["band", "key"], "left_semi")
    tagged = old_hit.select(
        "doc_id", "band", "key", F.lit(False).alias("is_new")
    ).unionByName(new_bands.withColumn("is_new", F.lit(True)))
    buckets = (
        tagged.groupBy("band", "key")
        .agg(F.array_sort(F.collect_list(F.struct(F.col("doc_id"), F.col("is_new")))).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= max_bucket)
                & F.exists("ids", lambda x: x["is_new"]))
    )
    cands = (
        buckets.select(F.explode(_pairs_within("ids")).alias("p"))
        .filter(F.col("p.id_a.is_new") | F.col("p.id_b.is_new"))
        .filter(F.col("p.id_a.doc_id") != F.col("p.id_b.doc_id"))
        .select(F.col("p.id_a.doc_id").alias("id_a"),
                F.col("p.id_b.doc_id").alias("id_b"))
        .distinct()
    )
    old_keep_ids = (
        old_hit.select("doc_id").distinct()
        .join(new_dsh.select("doc_id"), "doc_id", "left_anti")
    )
    old_only = old_shingles.join(old_keep_ids, "doc_id", "left_semi")
    dsh_all = old_only.unionByName(new_dsh)
    return verify_jaccard(cands, dsh_all, "doc_id").filter(
        F.col("jaccard") >= threshold
    )


def main():
    spark = get_spark("ab_incr_sf01_bisect")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    new = docs.filter(F.col("doc_id") % 5 == 0)
    idx = entry._lsh_index_old(spark, SF)  # prebuilt, outside timings

    forms = [
        ("a_r8", lambda: incr_r8(new, idx.bands, idx.shingles)),
        ("b_r9reductions_nowidth",
         lambda: incr_r9_nowidth(new, idx.bands, idx.shingles)),
        ("c_r10_live",
         lambda: dedup.incremental_lsh_pairs(new, idx.bands, idx.shingles,
                                             threshold=0.2)),
    ]
    out = {"metric": "ab_incr_sf01_bisect", "unit": "sec"}
    for label, _ in forms:
        out[label] = []
    # row-count sanity: all three forms must agree
    counts = {label: fn().count() for label, fn in forms}
    out["rowcounts"] = counts
    spark.catalog.clearCache()
    for _ in range(3):
        for label, fn in forms:
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            out[label].append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
    sys.stdout.write("\n" + json.dumps(out, sort_keys=True) + "\n")


if __name__ == "__main__":
    main()
