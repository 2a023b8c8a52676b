"""Soak the r8 shared-artifact story at the sf10-equivalent corpora
(500k docs / 8k vectors — the deterministic soak_r5b build; r9 ADVICE correction: the embeddings multiplier yields 8,000 vectors, not 20k): time each
one-off artifact BUILD (entry.build_artifacts — k-means fit, SemDeDup
pairs, LSH pairs, contaminated spans, PQ indexes), then the consumers at
probe cost.  This is the honesty artifact for the "index build is a job,
not a query prefix" pattern: the r7 soak's 24.8 s
doc_contamination_by_source exec was the spans derivation — that cost
now appears ONCE, in the build table, and both span consumers run at
probe cost.  Writes SOAK_r8.json at the repo root.

Usage: python scripts/soak_r8.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from staticql_spark.session import get_spark
from scripts.soak_r5b import OUT, build as build_docs

CONSUMERS = [
    # span-decon pair (r7 verdict #6): both at probe cost now
    "doc_contamination_by_source",
    "doc_decontaminate_excise",
    # SemDeDup / LSH graph consumers
    "dedup_semantic",
    "dedup_semantic_keep",
    "dedup_components",
    "dedup_canonical_meta",
    "dedup_cluster_stats",
    # persisted-PQ-index consumers
    "ann_pq_adc",
    "ann_ivf_pq",
    "stream_pq_neardup",
    "kmeans_inertia",
    # incremental family over persisted snapshots (late r8)
    "dedup_incremental",
    "dedup_chunk_incremental",
    "dedup_semantic_incr",
]


def main():
    spark = get_spark("soak_r8")
    spark.sparkContext.setLogLevel("ERROR")
    build_docs(spark)
    n_docs = spark.read.parquet(f"{OUT}/documents.parquet").count()
    n_vec = spark.read.parquet(f"{OUT}/embeddings.parquet").count()
    print(f"corpus: {n_docs} docs, {n_vec} vectors", flush=True)

    t0 = time.perf_counter()
    builds = entry.build_artifacts(spark, OUT)
    print(f"artifact builds ({time.perf_counter()-t0:.1f}s total): {builds}",
          flush=True)

    qs = entry.queries()
    results = {}

    def timed(name, thunk):
        best = (1e9, 1e9)
        for _ in range(2):
            t0 = time.perf_counter()
            df = thunk()
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            best = min(best, (t1 - t0, t2 - t1), key=lambda x: x[0] + x[1])
        results[name] = {"construct": round(best[0], 2), "exec": round(best[1], 2)}
        print(f"{name}: construct={best[0]:.2f}s exec={best[1]:.2f}s", flush=True)

    for name in CONSUMERS:
        timed(name, lambda n=name: qs[n](spark, OUT))

    art = os.path.join(os.path.dirname(OUT), "SOAK_r8.json")
    with open(art, "w") as f:
        json.dump(
            {
                "metric": "soak_r8",
                "docs": n_docs,
                "vectors": n_vec,
                "unit": "sec",
                "artifact_build_sec": builds,
                "queries": results,
            },
            f,
            indent=1,
            sort_keys=True,
        )
    print(f"wrote {art}")


if __name__ == "__main__":
    main()
