"""Soak the events-family operators at a 10M-row corpus (100x sf0.1:
same 30-day window, 100x the concurrent users — how event traffic
actually scales). Rebuilds the gitignored .scale_sf10/events.parquet if
missing, then times the entry compositions directly against the soak dir
(load_events passes through the written TIMESTAMP_NTZ column).

Usage: python scripts/soak_events.py
Prints per-query best-of-2 (construct_s, exec_s) with a noop sink.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as entry
from staticql_spark.session import get_spark
from staticql_spark.streaming import load_events

SF = "/root/testdata/sf0.1"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale_sf10")

PICKS = [
    "asof_click_purchase",
    "asof_hotkey_bucketed",
    "range_followups",
    "events_attribution",
    "events_sessionize",
    "events_funnel",
    "events_markov",
    "events_anomaly",
    "stream_first_seen",
    "latest_per_user",
    # late-r6 event-family additions
    "events_bot_score",
    "events_kanon",
    "events_ppr",
    "events_cooccurrence",
]


def build(spark):
    p = f"{OUT}/events.parquet"
    if not os.path.exists(p):
        ev = load_events(spark, f"{SF}/events.parquet")
        reps = spark.range(100).select(F.col("id").alias("rep"))
        big = ev.crossJoin(reps).select(
            (F.col("event_id") * 100 + F.col("rep")).alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("rep") * 10_000).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        big.repartition(32).write.mode("overwrite").parquet(p)


def main():
    import json

    spark = get_spark("soak_events")
    spark.sparkContext.setLogLevel("ERROR")
    build(spark)
    n = spark.read.parquet(f"{OUT}/events.parquet").count()
    print(f"corpus: {n} events")
    qs = entry.queries()
    results = {}
    for name in PICKS:
        best = (1e9, 1e9)
        for _ in range(2):
            t0 = time.perf_counter()
            df = qs[name](spark, OUT)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            best = min(best, (t1 - t0, t2 - t1), key=lambda x: x[0] + x[1])
        results[name] = {"construct": round(best[0], 2), "exec": round(best[1], 2)}
        print(f"{name}: construct={best[0]:.2f}s exec={best[1]:.2f}s", flush=True)
    # BENCH-style artifact so SCALE.md numbers are reproducible: corpus is
    # a deterministic transform of sf0.1 (no RNG), so re-running this
    # script regenerates the identical corpus and a comparable artifact
    art = os.path.join(os.path.dirname(OUT), "SOAK_events.json")
    with open(art, "w") as f:
        json.dump(
            {"metric": "soak_events", "rows": n, "unit": "sec", "queries": results},
            f, indent=1, sort_keys=True,
        )
    print(f"artifact: {art}")


def hotkey_ab():
    """A/B the as-of hot-key escape hatch in the regime it exists for:
    50% of all rows collapsed onto ONE user. Plain path serializes that
    key's 5M-row carry window into a single task; the bucketed path
    spreads it over (key, hour-bucket) tasks."""
    spark = get_spark("soak_hotkey")
    spark.sparkContext.setLogLevel("ERROR")
    build(spark)
    from staticql_spark.operators import asof as asof_op

    ev = spark.read.parquet(f"{OUT}/events.parquet")
    hot = ev.withColumn(
        "user_id", F.when(F.col("user_id") % 2 == 0, F.lit(1)).otherwise(F.col("user_id"))
    )
    clicks = hot.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purch = (
        hot.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"), F.max("event_id").alias("purchase_event"))
    )
    for label, kw in [("plain", {}), ("bucketed_1h", {"coarse_bucket_us": 3_600_000_000})]:
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            df = asof_op.asof_join(
                clicks, purch, on="user_id", left_ts="ts", right_ts="ts",
                value_cols=["purchase_value", "purchase_event"], **kw,
            )
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        print(f"hotkey asof {label}: {best:.2f}s", flush=True)


if __name__ == "__main__":
    if os.environ.get("SOAK_HOTKEY"):
        hotkey_ab()
    else:
        main()
