"""Persist-lifecycle soak (r10 verdict #3 / ADVICE): repeated LARGE
incremental dedup runs in ONE long-lived session must keep the
executor storage footprint FLAT — before r11, every run leaked its
batch-shingle persist and (above the count gate) its counted pair
frame, and the r10 soak measured exactly that failure mode degrade a
downstream build 5.4x.

Protocol: the 500k-doc soak corpus, old index = doc_id % 5 != 0
(persisted parquet via lsh_build), then FIVE incremental runs with
five different 100k-doc batches (doc_id % 5 == 0..4; batches 1-4 are
full re-crawls of old docs, a valid path).  After each run: exec
seconds, live registry size, and the JVM's persistent-RDD count.
Then one downstream full-index build to show no storage squatting is
degrading later jobs.  Expect: RDD count bounded by the registry cap
(6) instead of growing 2-per-run, run times flat, downstream build in
the same band as a fresh-session build.

Writes SOAK_persist_r11.json at the repo root.

Usage: python scripts/soak_persist_r11.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from pyspark.sql import functions as F

from staticql_spark.operators import dedup
from staticql_spark.session import get_spark
from scripts.soak_r5b import OUT, build


def n_persistent_rdds(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def sentinel(spark, k=3):
    reps = []
    for _ in range(k):
        t0 = time.perf_counter()
        bench._sentinel(spark).write.format("noop").mode("overwrite").save()
        reps.append(round(time.perf_counter() - t0, 3))
    return reps


def main():
    spark = get_spark("soak_persist_r11")
    spark.sparkContext.setLogLevel("ERROR")
    build(spark)
    docs = spark.read.parquet(f"{OUT}/documents.parquet")

    out = {"metric": "soak_persist_r11", "unit": "sec"}
    out["sentinel_pre"] = sentinel(spark)

    idx_path = os.path.join(os.path.dirname(OUT), ".soak_lsh_old_r11")
    t0 = time.perf_counter()
    dedup.lsh_build(docs.filter(F.col("doc_id") % 5 != 0), idx_path)
    out["old_index_build"] = round(time.perf_counter() - t0, 3)
    idx = dedup.lsh_load(spark, idx_path)

    runs = []
    for residue in range(5):
        batch = docs.filter(F.col("doc_id") % 5 == residue)
        t0 = time.perf_counter()
        res = dedup.incremental_lsh_pairs(
            batch, idx.bands, idx.shingles, threshold=0.2
        )
        construct = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        res.write.format("noop").mode("overwrite").save()
        runs.append(
            {
                "residue": residue,
                "construct": construct,
                "exec": round(time.perf_counter() - t0, 3),
                "live_registry": len(dedup._LIVE_PERSISTS),
                "persistent_rdds": n_persistent_rdds(spark),
            }
        )
        print(json.dumps(runs[-1]), flush=True)
    out["incremental_runs"] = runs

    # downstream job AFTER five large runs: with storage squatting this
    # was the 5.4x-degraded victim in the r10 soak
    t0 = time.perf_counter()
    full_path = os.path.join(os.path.dirname(OUT), ".soak_lsh_full_r11")
    dedup.lsh_build(docs, full_path)
    out["downstream_full_index_build"] = round(time.perf_counter() - t0, 3)
    out["final_persistent_rdds"] = n_persistent_rdds(spark)
    out["registry_cap"] = dedup._MAX_LIVE_PERSISTS
    out["sentinel_post"] = sentinel(spark)

    import shutil

    shutil.rmtree(idx_path, ignore_errors=True)
    shutil.rmtree(full_path, ignore_errors=True)

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "SOAK_persist_r11.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
