"""r13 verify-gate spill A/B (r12 verdict #5): convert the
_adaptive_verify_width insurance claim into a measured spill number —
or falsify it honestly.

Two findings shape this script's design (first run, 150k corpus,
2200m/0.25 squeeze): BOTH arms spilled ~1.75 GB identically, because
the spill lives in the SHARED candidate-derivation stages (distinct +
bucket agg) whose width the gate does not control; the verify join
itself — the only thing the gate widens — spilled zero at either
width.  So a full-pipeline A/B cannot attribute spill to the gate.
This version isolates the knob:

1. derive dsh + buckets + cands ONCE, persist (MEMORY_AND_DISK) and
   materialize them — shared-stage spill is spent before any arm runs;
2. interleave verify_jaccard(partitions=default 32) vs
   verify_jaccard(partitions=adaptive) A/B/A/B over the SAME persisted
   inputs, capturing per-rep AppStatusStore spill deltas — every
   spilled byte is verify-join-attributable;
3. corpus density is parameterized (SOAK_N_CLUSTERS x SOAK_CLUSTER,
   both sub-200k-doc) so the pair mass can be pushed to the regime the
   gate exists for: 199 clusters x 1000 members (the max_bucket cap) =
   199k docs but ~99M unique in-cluster pairs — 3x the 500k soak's
   31M-pair spill regime, all generated UNDER the doc gate.

Usage:
  SPARK_GRAFT_CPUS=32 SOAK_HEAP=3g [SOAK_MEMFRAC=0.3] \
  [SOAK_N_CLUSTERS=199 SOAK_CLUSTER=1000] \
      python scripts/soak_verifygate_r13.py
Writes SOAK_verifygate_r13.json (suffix via SOAK_VG_SUFFIX).
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "scripts"))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

import soak_dupdense_r12 as base

from staticql_spark.operators import dedup


def _session(heap: str, memfrac: str | None):
    b = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', os.cpu_count() or 4)}]"
        )
        .appName("soak-verifygate-r13")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", heap)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if memfrac:
        b = b.config("spark.memory.fraction", memfrac)
    return b.getOrCreate()


def _spill_totals(spark):
    # AppStatusStore.stageList(statuses, details, withSummaries,
    # unsortedQuantiles, taskStatus) — Spark 4 signature
    jvm = spark._jvm
    gw = spark.sparkContext._gateway
    store = spark._jsparkSession.sparkContext().statusStore()
    stages = store.stageList(
        jvm.java.util.ArrayList(), False, False,
        gw.new_array(jvm.double, 0), jvm.java.util.ArrayList(),
    )
    n = stages.size()
    mem = sum(stages.apply(i).memoryBytesSpilled() for i in range(n))
    disk = sum(stages.apply(i).diskBytesSpilled() for i in range(n))
    return int(mem), int(disk)


def main():
    heap = os.environ.get("SOAK_HEAP", "3g")
    memfrac = os.environ.get("SOAK_MEMFRAC")
    # corpus density knobs; SOAK_FILLER adds pair-free unique docs so a
    # 500k-doc / ~31M-pair corpus (the historical §19 soak shape) can
    # be reproduced: 250 clusters x 500 members + 375k filler
    base.N_CLUSTERS = int(os.environ.get("SOAK_N_CLUSTERS", "199"))
    base.CLUSTER = int(os.environ.get("SOAK_CLUSTER", "1000"))
    filler = int(os.environ.get("SOAK_FILLER", "0"))
    spark = _session(heap, memfrac)
    spark.sparkContext.setLogLevel("ERROR")

    docs = base.build_corpus(spark)
    if filler:
        base_n = base.N_CLUSTERS * base.CLUSTER
        uniq = spark.range(0, filler).select(
            (F.lit(10_000_000) + F.col("id")).alias("doc_id"),
            F.concat_ws(
                " ",
                *[
                    F.concat(F.lit(f"u{j}_"), F.col("id").cast("string"))
                    for j in range(40)
                ],
            ).alias("text"),
        )
        docs = docs.unionByName(uniq)
    docs = docs.persist(StorageLevel.MEMORY_AND_DISK)
    n = docs.count()
    default_w = int(spark.conf.get("spark.sql.shuffle.partitions"))

    # ---- shared derivation, spent ONCE before any arm ----
    t0 = time.perf_counter()
    dsh = dedup.doc_shingles(docs).persist(StorageLevel.MEMORY_AND_DISK)
    sig = dsh.select(F.col("doc_id"), dedup.sig_from_array(16))
    banded = dedup._band_keys(sig, 4, 4, "doc_id")
    buckets = (
        banded.groupBy("band", "key")
        .agg(F.array_sort(F.collect_list(F.col("doc_id"))).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= 1000))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    if os.environ.get("SOAK_CHUNKED"):
        # r13 expand_pairs_chunked: bounded in-row arrays (chunk^2) —
        # the r14-candidate fix for the max_bucket row-size hazard
        cands = (
            dedup.expand_pairs_chunked(buckets, chunk=128)
            .select("p.id_a", "p.id_b")
            .distinct()
        ).persist(StorageLevel.MEMORY_AND_DISK)
    else:
        cands = (
            buckets.select(F.explode(dedup._pairs_within("ids")).alias("p"))
            .select("p.id_a", "p.id_b")
            .distinct()
        ).persist(StorageLevel.MEMORY_AND_DISK)
    n_cands = cands.count()
    wide = dedup._adaptive_verify_width(spark, n, buckets)
    shared_sec = round(time.perf_counter() - t0, 2)
    m_sh, d_sh = _spill_totals(spark)

    out = {
        "n_docs": n,
        "n_clusters": base.N_CLUSTERS,
        "cluster": base.CLUSTER,
        "n_cands": n_cands,
        "default_width": default_w,
        "adaptive_width": wide,
        "heap": heap,
        "memory_fraction": memfrac or "default(0.6)",
        "shared_derivation_sec": shared_sec,
        "shared_mem_spilled_mb": round(m_sh / 2**20, 1),
        "shared_disk_spilled_mb": round(d_sh / 2**20, 1),
        "reps": [],
    }
    print({k: v for k, v in out.items() if k != "reps"}, flush=True)

    def run(label, partitions):
        m0, d0 = _spill_totals(spark)
        t0 = time.perf_counter()
        verified = dedup.verify_jaccard(cands, dsh, "doc_id", partitions=partitions)
        cnt = verified.filter(F.col("jaccard") >= 0.5).count()
        dt = round(time.perf_counter() - t0, 2)
        m1, d1 = _spill_totals(spark)
        rep = {
            "label": label,
            "width": partitions,
            "sec": dt,
            "pairs": cnt,
            "verify_mem_spilled_mb": round((m1 - m0) / 2**20, 1),
            "verify_disk_spilled_mb": round((d1 - d0) / 2**20, 1),
        }
        out["reps"].append(rep)
        print(rep, flush=True)

    arms = [
        ("old_default_width", default_w),
        ("r12_adaptive", wide if wide is not None else default_w),
    ]
    if os.environ.get("SOAK_ARM_NONE"):
        # the true r8 plan: NO explicit repartition — the join runs at
        # spark.sql.shuffle.partitions with AQE coalescing
        arms.insert(0, ("aqe_no_repartition", None))
    for _ in range(2):
        for label, width in arms:
            run(label, width)

    suffix = os.environ.get("SOAK_VG_SUFFIX", "")
    with open(os.path.join(ROOT, f"SOAK_verifygate_r13{suffix}.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
