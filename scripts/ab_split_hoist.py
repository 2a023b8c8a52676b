"""A/B the r9 split-hoist (r8 verdict #4): chunk_dedup with F.split
re-evaluated inside the per-element lambdas (the r8 form) vs the hoisted
once-per-row tokenization, over the 500k-doc soak corpus
(.scale_sf10/documents.parquet).  Also times incremental_chunk_dedup
(the soak key's shape) against a 100k-doc batch.  Prints one JSON line;
numbers land in SCALE.md.

Usage: python scripts/ab_split_hoist.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from staticql_spark.operators import dedup
from staticql_spark.operators.dedup import ensure_parallelism
from staticql_spark.session import get_spark
from scripts.soak_r5b import OUT


def chunk_dedup_r8(df, text_col="text", id_col="doc_id", width=8, min_docs=2):
    """The pre-hoist r8 form, verbatim: split re-evaluated inside the
    extraction and rebuild lambdas (kept here only as the A side)."""
    df = ensure_parallelism(df)

    def toks(c):
        return F.split(c, " ")

    n_chunks = F.greatest(
        F.ceil(F.size(toks(F.col(text_col))) / F.lit(width)).cast("int"),
        F.lit(1),
    )
    chunk_at = lambda t, p: F.array_join(F.slice(t, p * width + 1, width), " ")
    chunks = df.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.md5(chunk_at(toks(F.col(text_col)), i)),
            )
        ).alias("pos", "h"),
    )
    cnts = chunks.groupBy("h").agg(F.count_distinct(F.col(id_col)).alias("nd"))
    flags = chunks.join(cnts, "h").select(
        id_col, "pos", (F.col("nd") < min_docs).alias("keep")
    )
    per_doc = flags.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_chunks"),
        F.sum((~F.col("keep")).cast("long")).alias("n_dropped"),
        F.sort_array(
            F.collect_list(F.when(F.col("keep"), F.col("pos")))
        ).alias("kept_pos"),
    )
    return df.join(per_doc, id_col).select(
        id_col,
        "n_chunks",
        "n_dropped",
        F.array_join(
            F.transform(
                F.col("kept_pos"), lambda p: chunk_at(toks(F.col(text_col)), p)
            ),
            " ",
        ).alias("clean_text"),
    )


def drain(df):
    t0 = time.perf_counter()
    # checksum drain: every clean_text byte is produced and folded, no
    # driver collect of the texts themselves
    row = df.agg(
        F.count("*").alias("n"),
        F.sum(F.crc32(F.col("clean_text"))).alias("ck"),
        F.sum("n_dropped").alias("nd"),
    ).collect()[0]
    return time.perf_counter() - t0, (row["n"], row["ck"], row["nd"])


def main():
    spark = get_spark("ab_split_hoist")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{OUT}/documents.parquet")
    batch = docs.filter(F.col("doc_id") % 5 == 0)  # 100k-doc batch

    out = {"metric": "ab_split_hoist", "docs": docs.count(), "unit": "sec"}

    t_old, sig_old = drain(chunk_dedup_r8(docs))
    t_new, sig_new = drain(dedup.chunk_dedup(docs))
    assert sig_old == sig_new, (sig_old, sig_new)
    out["chunk_dedup_old"] = round(t_old, 2)
    out["chunk_dedup_new"] = round(t_new, 2)

    # incremental shape: index over the other 400k, clean the 100k batch
    old_corpus = docs.filter(F.col("doc_id") % 5 != 0)
    idx = dedup.chunk_index(old_corpus)
    idx.write.mode("overwrite").parquet("/tmp/ab_chunk_idx")
    idxp = spark.read.parquet("/tmp/ab_chunk_idx")
    t_inc, sig_inc = drain(dedup.incremental_chunk_dedup(batch, idxp))
    out["incremental_new"] = round(t_inc, 2)
    out["batch_docs"] = batch.count()

    print(json.dumps(out, sort_keys=True), flush=True)


if __name__ == "__main__":
    main()
