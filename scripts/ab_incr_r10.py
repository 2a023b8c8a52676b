"""Interleaved A/B of incremental_lsh_pairs r9 static-wide verify width
vs r10 adaptive width, at BOTH shapes the r9 verdict ordered locked:

  * sf0.1 bench shape (~12k-doc batch, tiny candidate mass) — the r9
    static 8x-parallelism width triple-repartitioned it into 256
    partitions and regressed the bench 2.7x; adaptive must restore the
    r8-like time (no explicit repartition below default parallelism).
  * 500k-doc soak shape (100k batch, ~31M colliding pairs) — the static
    width fixed a measured spill (29.6 -> 22.2 s); adaptive must pick an
    equivalent width and keep exec <= ~31 s.

Same session, order A,B,A,B per shape (order-bias gotcha), index
prebuilt once per shape outside timings, noop sink.  Prints one JSON
line for SCALE.md.

Usage: python scripts/ab_incr_r10.py
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
from scripts.soak_r5b import OUT, build

SF = "/root/testdata/sf0.1"


def incremental_r9_static(new_df, old_bands, old_shingles, threshold=0.2,
                          max_bucket=1000):
    """The r9 form verbatim: static 8x-parallelism verify width (floor 64)."""
    id_col = "doc_id"
    new_bands, new_dsh = minhash_index(new_df)
    new_dsh = new_dsh.persist()
    batch_keys = new_bands.select("band", "key").distinct()
    old_hit = old_bands.join(batch_keys, ["band", "key"], "left_semi")
    tagged = old_hit.select(
        id_col, "band", "key", F.lit(False).alias("is_new")
    ).unionByName(new_bands.withColumn("is_new", F.lit(True)))
    buckets = (
        tagged.groupBy("band", "key")
        .agg(F.array_sort(F.collect_list(F.struct(F.col(id_col), F.col("is_new")))).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= max_bucket)
                & F.exists("ids", lambda x: x["is_new"]))
    )
    cands = (
        buckets.select(F.explode(_pairs_within("ids")).alias("p"))
        .filter(F.col("p.id_a.is_new") | F.col("p.id_b.is_new"))
        .filter(F.col(f"p.id_a.{id_col}") != F.col(f"p.id_b.{id_col}"))
        .select(F.col(f"p.id_a.{id_col}").alias("id_a"),
                F.col(f"p.id_b.{id_col}").alias("id_b"))
        .distinct()
    )
    old_keep_ids = (
        old_hit.select(id_col).distinct()
        .join(new_dsh.select(id_col), id_col, "left_anti")
    )
    old_only = old_shingles.join(old_keep_ids, id_col, "left_semi")
    dsh_all = old_only.unionByName(new_dsh)
    wide = max(new_df.sparkSession.sparkContext.defaultParallelism * 8, 64)
    return verify_jaccard(cands, dsh_all, id_col, partitions=wide).filter(
        F.col("jaccard") >= threshold
    )


def main():
    spark = get_spark("ab_incr_r10")
    spark.sparkContext.setLogLevel("ERROR")
    build(spark)
    import __spark_entry__ as entry

    out = {"metric": "ab_incr_r10", "unit": "sec"}
    for shape, root in (("sf01", SF), ("soak500k", OUT)):
        docs = spark.read.parquet(f"{root}/documents.parquet")
        new = docs.filter(F.col("doc_id") % 5 == 0)
        idx = entry._lsh_index_old(spark, root)  # build once, outside timings

        def run_static():
            return incremental_r9_static(new, idx.bands, idx.shingles)

        def run_adaptive():
            return dedup.incremental_lsh_pairs(new, idx.bands, idx.shingles,
                                               threshold=0.2)

        for label, thunk in ((f"{shape}_a_r9static", run_static),
                             (f"{shape}_b_r10adaptive", run_adaptive)):
            out[label] = []
        for _ in range(2):
            for label, thunk in ((f"{shape}_a_r9static", run_static),
                                 (f"{shape}_b_r10adaptive", run_adaptive)):
                t0 = time.perf_counter()
                thunk().write.format("noop").mode("overwrite").save()
                out[label].append(round(time.perf_counter() - t0, 2))
                spark.catalog.clearCache()
    sys.stdout.write("\n" + json.dumps(out, sort_keys=True) + "\n")


if __name__ == "__main__":
    main()


