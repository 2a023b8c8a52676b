"""Measure driver-side plan-construction cost against the fixed-work
sentinel (r10 verdict #3/#4: BENCH_r10's construct_total nearly doubled
vs r9 — 62.5 -> 116.6 s for 181 keys — and nobody separated host drift
from a real regression).

One session, artifacts prebuilt (so no construct absorbs a build),
construct-ONLY timing (the DataFrame is built, never executed) x 3 reps
min per HEADLINE key, sentinel reps before and after.  Prints one JSON
line with the per-key map, the total, and the r10 comparison ratios so
SCALE.md can record drift-vs-real per key.

Construct here is ALMOST all driver-side Python/Catalyst analysis — the
iterative operators (pagerank, CC paths, bpe) also do real distributed
work in eager localCheckpoint rounds, which is why artifacts are
prebuilt and reps are min'd.

Usage: python scripts/construct_r11.py [sf_dir]
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


def sentinel(spark, k=3):
    reps = []
    for _ in range(k):
        t0 = time.perf_counter()
        bench._sentinel(spark).write.format("noop").mode("overwrite").save()
        reps.append(round(time.perf_counter() - t0, 3))
    return reps


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("construct_r11")
    spark.sparkContext.setLogLevel("ERROR")

    import glob

    for p in sorted(glob.glob(f"{sf_dir}/*.parquet")):
        spark.read.parquet(p).count()
    entry.build_artifacts(spark, sf_dir)

    qs = entry.queries()
    out = {"metric": "construct_r11", "unit": "sec", "sf_dir": sf_dir}
    out["sentinel_pre"] = sentinel(spark)

    construct = {}
    for name in bench.HEADLINE:
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir)
            reps.append(round(time.perf_counter() - t0, 3))
        construct[name] = min(reps)
    out["construct_sec"] = construct
    out["construct_total"] = round(sum(construct.values()), 3)
    out["sentinel_post"] = sentinel(spark)

    # r10 comparison: per-key ratios vs the committed r10-HEAD
    # BENCH_FULL.json construct map (the driver's BENCH_r10.json carries
    # only construct_total); read from the repo root regardless of cwd
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bf = os.path.join(root, "BENCH_FULL.json")
    c10 = (
        json.load(open(bf)).get("construct_sec", {})
        if os.path.exists(bf)
        else {}
    )
    shared = [k for k in construct if k in c10 and c10[k] > 0.05]
    ratios = sorted(
        ((round(construct[k] / c10[k], 2), k) for k in shared), reverse=True
    )
    out["r10_construct_total_shared"] = round(sum(c10[k] for k in shared), 3)
    out["now_construct_total_shared"] = round(
        sum(construct[k] for k in shared), 3
    )
    out["worst_ratios_vs_r10"] = ratios[:10]
    out["median_ratio_vs_r10"] = (
        sorted(r for r, _ in ratios)[len(ratios) // 2] if ratios else None
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
