"""Soak the r7 operators (behavior analytics, last-touch attribution,
stream-transitions batch twin, numeric PSI, cross-set decon, grouped
HLL) at the sf10-equivalent corpora: the 500k-doc / 20k-vector build of
scripts/soak_r5b.py plus the 10M-row events build of
scripts/soak_events.py — all deterministic transforms of sf0.1 (no
RNG), so re-running regenerates identical corpora and a comparable
artifact.  Writes SOAK_r7.json at the repo root.

Usage: python scripts/soak_r7.py
Prints per-query best-of-2 (construct_s, exec_s) with a noop sink.
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
from scripts.soak_events import build as build_events

PICKS = [
    # events family (10M rows, 100x users)
    "events_retention_curve",
    "events_funnel_steps",
    "events_attribution_lasttouch",
    "stream_transitions",
    "stream_funnel",
    "events_session_paths",
    "hll_grouped_ndv",
    # docs family (500k docs)
    "profile_psi",
    "profile_psi_by_lang",
    "stream_psi",
    "doc_calibration",
    "doc_contamination_by_source",
    # embeddings family (8k vectors)
    "ann_semantic_decon",
    "embedding_debias",
    "ann_pq_quant_error",
]


def main():
    spark = get_spark("soak_r7")
    spark.sparkContext.setLogLevel("ERROR")
    build_docs(spark)
    build_events(spark)
    n_docs = spark.read.parquet(f"{OUT}/documents.parquet").count()
    n_ev = spark.read.parquet(f"{OUT}/events.parquet").count()
    print(f"corpus: {n_docs} docs, {n_ev} events")
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

    for name in PICKS:
        timed(name, lambda n=name: qs[n](spark, OUT))

    art = os.path.join(os.path.dirname(OUT), "SOAK_r7.json")
    with open(art, "w") as f:
        json.dump(
            {
                "metric": "soak_r7",
                "docs": n_docs,
                "events": n_ev,
                "unit": "sec",
                "queries": results,
            },
            f,
            indent=1,
            sort_keys=True,
        )
    print(f"wrote {art}")


if __name__ == "__main__":
    main()
