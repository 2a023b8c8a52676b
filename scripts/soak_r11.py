"""r11 soak at the sf10-equivalent corpora (500k docs / 8k vectors —
the deterministic soak_r5b build): the SOAK_r10 protocol verbatim
(artifact builds timed explicitly, then the consumers best-of-2 with a
noop sink) so r10->r11 deltas isolate the r11 changes: the 60-bit long
band keys, the scoped persist registry, and the shared full-index
artifact build (ONE shingle+signature pass feeding the pair set via
lsh_pairs_from_index and the old-corpus snapshot via filtered views —
SOAK_r10's lsh_pairs 391 s + lsh_index_old ~60 s should collapse to
one lsh_index_full build + a cheaper pairs derivation).  Soak gate:
dedup_incremental exec stays in the r10 band (<= ~31 s accepted floor;
18.8 s was the r10 reading on a faster box).  Writes SOAK_r11.json.

Usage: python scripts/soak_r11.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
import bench
from staticql_spark.session import get_spark
from scripts.soak_r5b import OUT, build as build_docs
from scripts.soak_events import build as build_events

CONSUMERS = [
    # r11-changed keys first
    "dedup_incremental",
    "dedup_components",
    "doc_chunk_dedup",
    "dedup_chunk_incremental",
    # artifact-consumer families (SOAK_r10 comparables)
    "doc_contamination_by_source",
    "doc_decontaminate_excise",
    "dedup_semantic",
    "dedup_semantic_keep",
    "dedup_canonical_meta",
    "dedup_cluster_stats",
    "ann_pq_adc",
    "ann_ivf_pq",
    "stream_pq_neardup",
    "kmeans_inertia",
    "dedup_semantic_incr",
]


def main():
    spark = get_spark("soak_r11")
    spark.sparkContext.setLogLevel("ERROR")

    def sentinel_reps(k=3):
        reps = []
        for _ in range(k):
            t0 = time.perf_counter()
            bench._sentinel(spark).write.format("noop").mode("overwrite").save()
            reps.append(round(time.perf_counter() - t0, 3))
        return reps

    sent_pre = sentinel_reps()
    build_docs(spark)
    build_events(spark)
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

    art = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SOAK_r11.json"
    )
    with open(art, "w") as f:
        json.dump(
            {
                "metric": "soak_r11",
                "docs": n_docs,
                "vectors": n_vec,
                "unit": "sec",
                "artifact_build_sec": builds,
                "queries": results,
                "sentinel_pre": sent_pre,
                "sentinel_post": sentinel_reps(),
            },
            f,
            indent=1,
            sort_keys=True,
        )
    print(f"wrote {art}")


if __name__ == "__main__":
    main()
