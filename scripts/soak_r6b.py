"""Soak the late-r6 operators at the sf10-equivalent corpus (500k docs,
8k vectors->20k after replication; same deterministic .scale_sf10 build
as scripts/soak_r5b.py).  Writes a BENCH-style JSON artifact to
SOAK_r6b.json at the repo root so SCALE.md numbers are reproducible.

Usage: python scripts/soak_r6b.py
Prints per-operator best-of-2 (construct_s, exec_s) with a noop sink.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from staticql_spark.session import get_spark
from scripts.soak_r5b import OUT, build

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RESULTS: dict[str, dict[str, float]] = {}


def timed(name, thunk):
    best = (1e9, 1e9)
    for _ in range(2):
        t0 = time.perf_counter()
        df = thunk()
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        best = min(best, (t1 - t0, t2 - t1), key=lambda p: p[0] + p[1])
    RESULTS[name] = {"construct": round(best[0], 2), "exec": round(best[1], 2)}
    print(f"{name}: construct={best[0]:.2f}s exec={best[1]:.2f}s")


def main():
    spark = get_spark("soak_r6b")
    spark.sparkContext.setLogLevel("ERROR")
    build(spark)
    docs = spark.read.parquet(f"{OUT}/documents.parquet")
    emb = spark.read.parquet(f"{OUT}/embeddings.parquet")
    from staticql_spark.operators import dedup, pq, text

    n_docs, n_vecs = docs.count(), emb.count()
    print(f"corpus: {n_docs} docs, {n_vecs} vectors")

    cbs = pq.pq_train(emb, m=4, dim=64, stride=100, iters=2)
    timed("pq_train(m=4, 2 Lloyd rounds)", lambda: cbs)
    codes = pq.pq_encode(emb, cbs, m=4, dim=64)
    timed("pq_encode", lambda: codes)
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    timed(
        f"pq_adc_topk({n_vecs // 50} queries, k=5)",
        lambda: pq.pq_adc_topk(queries, codes, cbs, k=5, m=4, dim=64),
    )
    timed(
        f"ivfpq_topk(nprobe=3, {n_vecs // 50} queries)",
        lambda: pq.ivfpq_topk(
            queries, emb, codes, cbs, k=5, m=4, dim=64, coarse_stride=100, nprobe=3
        ),
    )
    timed(
        "chunk_dedup(width=8, min_docs=2)",
        lambda: dedup.chunk_dedup(docs, width=8, min_docs=2),
    )
    timed(
        "shuffle_shards(n_shards=64, pos_buckets=128)",
        lambda: text.shuffle_shards(docs, n_shards=64, pos_buckets=128),
    )
    timed(
        "training_order(budget=100M, 64 shards)",
        lambda: text.training_order(
            docs, budget_tokens=100_000_000, n_shards=64, pos_buckets=128
        ),
    )
    from staticql_spark.operators.similarity import cell_prototypicality

    timed(
        "cell_prototypicality(stride=100)",
        lambda: cell_prototypicality(emb, drop_frac=0.25),
    )
    from staticql_spark.streaming import stream_pq_neardup

    old = emb.filter(F.col("vec_id") % 5 != 3)
    new = emb.filter(F.col("vec_id") % 5 == 3)
    cbs_old = pq.pq_train(old, m=4, dim=64, stride=100, iters=2)
    okeys = pq.code_keys(pq.pq_encode(old, cbs_old, m=4, dim=64))
    timed(
        "stream_pq_neardup(batch twin, old/new 4:1)",
        lambda: stream_pq_neardup(new, cbs_old, okeys, old, m=4, dim=64, threshold=0.35),
    )

    # exact quantiles over a 12M-row numeric column (deterministic:
    # sf0.1 lineitem prices replicated 20x with fixed offsets)
    li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    reps = spark.range(20).select(F.col("id").alias("rep"))
    big_vals = li.crossJoin(reps).select(
        (F.col("l_extendedprice") + F.col("rep") * 0.001).alias("l_extendedprice")
    )
    n_vals = big_vals.count()
    from staticql_spark.operators.profile import exact_quantiles

    timed(
        f"exact_quantiles({n_vals} rows, 4 qs)",
        lambda: exact_quantiles(big_vals, "l_extendedprice", [0.25, 0.5, 0.9, 0.99]),
    )

    from staticql_spark.operators.text import ccnet_buckets, training_order as _to  # noqa: F401

    timed(
        "ccnet_buckets(500k docs, two-phase rank)",
        lambda: ccnet_buckets(docs),
    )
    timed(
        "ivfpq_topk+recall corpus (encode reuse)",
        lambda: pq.ivfpq_topk(
            emb.filter(F.col("vec_id") % 50 == 0), emb, codes, cbs,
            k=5, m=4, dim=64, coarse_stride=100, nprobe=3,
        ),
    )

    with open(os.path.join(REPO, "SOAK_r6b.json"), "w") as f:
        f.write(
            json.dumps(
                {
                    "metric": "soak_r6b",
                    "corpus": {"docs": n_docs, "vectors": n_vecs},
                    "unit": "sec",
                    "queries": RESULTS,
                },
                separators=(",", ":"),
            )
            + "\n"
        )
    print("wrote SOAK_r6b.json")


if __name__ == "__main__":
    main()
