"""Interleaved A/B of incremental_lsh_pairs r8-form vs r9-form at the
500k-doc soak (r8 verdict #5).  Same session, order A,B,A,B (the
order-bias gotcha), index prebuilt once, noop sink.  Prints one JSON
line for SCALE.md.

Usage: python scripts/ab_incr_r9.py
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
from scripts.soak_r5b import OUT


def incremental_r8(new_df, old_bands, old_shingles, threshold=0.2, max_bucket=1000):
    """The r8 form, verbatim (pre-reduction A side)."""
    id_col = "doc_id"
    new_bands, new_dsh = minhash_index(new_df)
    tagged = old_bands.select(
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
    old_only = old_shingles.join(new_dsh.select(id_col), id_col, "left_anti")
    dsh_all = old_only.unionByName(new_dsh)
    return verify_jaccard(cands, dsh_all, id_col).filter(F.col("jaccard") >= threshold)


def main():
    spark = get_spark("ab_incr_r9")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{OUT}/documents.parquet")
    new = docs.filter(F.col("doc_id") % 5 == 0)
    import __spark_entry__ as entry

    idx = entry._lsh_index_old(spark, OUT)  # build once, outside timings

    def run_a():
        return incremental_r8(new, idx.bands, idx.shingles)

    def run_b():
        return dedup.incremental_lsh_pairs(new, idx.bands, idx.shingles, threshold=0.2)

    out = {"metric": "ab_incr_r9", "unit": "sec", "a_r8": [], "b_r9": []}
    for _ in range(2):
        for label, thunk in (("a_r8", run_a), ("b_r9", run_b)):
            t0 = time.perf_counter()
            thunk().write.format("noop").mode("overwrite").save()
            out[label].append(round(time.perf_counter() - t0, 2))
    sys.stdout.write("\n" + json.dumps(out, sort_keys=True) + "\n")


if __name__ == "__main__":
    main()
