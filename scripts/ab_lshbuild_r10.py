"""Interleaved A/B of minhash_lsh_pairs r9 default-width verify vs r10
adaptive width (r9 verdict #4: the full lsh_pairs artifact build is the
dominant soak cost, 110 of 224 s).  Both shapes:

  * sf0.1 (~60k docs, modest pair mass) — adaptive must not regress the
    1.2 s-class build (below the width gate it is the r9 plan plus one
    count over the persisted pair frame);
  * 500k-doc near-replica soak — the verify join is the measured spill
    site; adaptive must widen it and land the build under ~80 s.

Same session, order A,B,A,B per shape, shared shingle cache cleared
between runs, noop sink.  Prints one JSON line for SCALE.md.

Usage: python scripts/ab_lshbuild_r10.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from staticql_spark.operators import dedup
from staticql_spark.operators.dedup import (
    _band_keys,
    _pairs_within,
    doc_shingles,
    sig_from_array,
    verify_jaccard,
)
from staticql_spark.session import get_spark
from scripts.soak_r5b import OUT, build

SF = "/root/testdata/sf0.1"


def lsh_pairs_r9(df, threshold=0.2, max_bucket=1000):
    """The r9 form verbatim: default-width verify join."""
    n, num_hashes, bands = 3, 16, 4
    dsh = doc_shingles(df, "text", "doc_id", n).cache()
    sig = dsh.select(F.col("doc_id"), sig_from_array(num_hashes))
    banded = _band_keys(sig, bands, num_hashes // bands, "doc_id")
    buckets = (
        banded.groupBy("band", "key")
        .agg(F.array_sort(F.collect_list(F.col("doc_id"))).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= max_bucket))
    )
    cands = (
        buckets.select(F.explode(_pairs_within("ids")).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )
    return verify_jaccard(cands, dsh, "doc_id").filter(
        F.col("jaccard") >= threshold
    )


def main():
    spark = get_spark("ab_lshbuild_r10")
    spark.sparkContext.setLogLevel("ERROR")
    build(spark)

    out = {"metric": "ab_lshbuild_r10", "unit": "sec"}
    for shape, root in (("sf01", SF), ("soak500k", OUT)):
        docs = spark.read.parquet(f"{root}/documents.parquet")

        def run_r9():
            return lsh_pairs_r9(docs)

        def run_r10():
            return dedup.minhash_lsh_pairs(
                docs, n=3, num_hashes=16, bands=4, threshold=0.2
            )

        for label in (f"{shape}_a_r9default", f"{shape}_b_r10adaptive"):
            out[label] = []
        for _ in range(2):
            for label, thunk in ((f"{shape}_a_r9default", run_r9),
                                 (f"{shape}_b_r10adaptive", run_r10)):
                t0 = time.perf_counter()
                thunk().write.format("noop").mode("overwrite").save()
                out[label].append(round(time.perf_counter() - t0, 2))
                spark.catalog.clearCache()
    sys.stdout.write("\n" + json.dumps(out, sort_keys=True) + "\n")


if __name__ == "__main__":
    main()
