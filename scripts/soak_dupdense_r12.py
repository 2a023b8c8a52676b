"""r12 dup-density soak: the corpus class the r11 verdict #2 flagged —
UNDER the 200k-doc gate but near-replica-dense — measured with the old
policy (default verify width, what pre-r12 code chose for any sub-gate
corpus) against the new _adaptive_verify_width decision.

Corpus: 150k docs as 1.5k clusters x 100 near-replicas (each doc
mutates one token of its cluster's 40-token base), exact-dedup-skipped
deliberately — the documented recipe violation the gate must absorb.
Candidate mass ~ 4 bands x 1500 x C(100,2) ~= 29.7M pre-distinct, so
the pair-mass estimate widens the verify join to the 8x-parallelism
ceiling while the old policy ran it at spark.sql.shuffle.partitions.

Protocol: interleaved A/B/A/B (SCALE.md §19/§20 — only interleaved
ratios are load-bearing on this host), one warm shingle build shared
via the registry, exec timed over a noop count of the verified pairs.
Writes SOAK_dupdense_r12.json.

Usage: python scripts/soak_dupdense_r12.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from staticql_spark.operators import dedup
from staticql_spark.session import get_spark

N_CLUSTERS = 1500
CLUSTER = 100


def build_corpus(spark):
    # deterministic near-replica clusters, built distributed (no driver
    # literals): doc_id = cluster * 1000 + member; token (doc_id % 40)
    # of the cluster's 40-token base is replaced per member
    ids = spark.range(0, N_CLUSTERS * CLUSTER).select(
        (F.col("id") / CLUSTER).cast("long").alias("c"),
        (F.col("id") % CLUSTER).alias("m"),
    )
    base = F.transform(
        F.sequence(F.lit(0), F.lit(39)),
        lambda i: F.concat_ws("_", F.lit("tok"), F.col("c").cast("string"), i.cast("string")),
    )
    text = F.array_join(
        F.transform(
            base,
            lambda t, i: F.when(
                i == (F.col("m") % 40), F.concat(F.lit("mut"), F.col("m").cast("string"))
            ).otherwise(t),
        ),
        " ",
    )
    return ids.select(
        (F.col("c") * 1000 + F.col("m")).alias("doc_id"), text.alias("text")
    )


def main():
    spark = get_spark("soak-dupdense-r12")
    spark.sparkContext.setLogLevel("ERROR")
    docs = build_corpus(spark).persist()
    n = docs.count()
    default_w = int(spark.conf.get("spark.sql.shuffle.partitions"))
    out = {"n_docs": n, "default_width": default_w, "reps": []}

    def run(label, partitions):
        dedup.release_persists()
        t0 = time.perf_counter()
        if partitions is None:
            pairs = dedup.minhash_lsh_pairs(docs, threshold=0.5)
        else:
            # pre-r12 sub-gate behavior: default-width verify, no
            # bucket count (emulated by pinning the width explicitly
            # through the index-derivation path's partitions knob)
            dsh = dedup._persist_scoped(dedup.doc_shingles(docs))
            sig = dsh.select(F.col("doc_id"), dedup.sig_from_array(16))
            banded = dedup._band_keys(sig, 4, 4, "doc_id")
            buckets = (
                banded.groupBy("band", "key")
                .agg(F.array_sort(F.collect_list(F.col("doc_id"))).alias("ids"))
                .filter((F.size("ids") >= 2) & (F.size("ids") <= 1000))
            )
            cands = (
                buckets.select(F.explode(dedup._pairs_within("ids")).alias("p"))
                .select("p.id_a", "p.id_b")
                .distinct()
            )
            verified = dedup.verify_jaccard(cands, dsh, "doc_id", partitions=partitions)
            pairs = verified.filter(F.col("jaccard") >= 0.5)
        cnt = pairs.count()
        dt = round(time.perf_counter() - t0, 2)
        out["reps"].append({"label": label, "sec": dt, "pairs": cnt})
        print(label, dt, "s", cnt, "pairs", flush=True)

    # interleaved A/B/A/B: A = old default-width policy, B = r12 gate
    for _ in range(2):
        run("old_default_width", default_w)
        run("r12_adaptive", None)

    suffix = os.environ.get("SOAK_DUPDENSE_SUFFIX", "")
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           f"SOAK_dupdense_r12{suffix}.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
