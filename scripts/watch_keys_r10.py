"""Within-session repeated measure of the r9 above-band watch keys
(doc_pii 1.96x, doc_quality 1.72x, doc_selfdedup 1.69x vs the 1.34x
host-drift median — r9 verdict #6).  Their code and plans are untouched
since r8, so if the r9 ratios were real engine regressions they must
reproduce here against the trivial-key drift controls (where_and,
cursor_after, window_running) measured in the SAME session, plus the
new fixed-work sentinel.  6 reps each, interleaved across keys so host
drift within the session hits all keys equally.

Usage: python scripts/watch_keys_r10.py
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

SF = "/root/testdata/sf0.1"
WATCH = ["doc_pii", "doc_quality", "doc_selfdedup"]
CONTROL = ["where_and", "cursor_after", "window_running"]
R8 = {"doc_pii": 0.073, "doc_quality": 0.298, "doc_selfdedup": 0.553,
      "where_and": 0.062, "cursor_after": 0.039, "window_running": 0.075}


def main():
    spark = get_spark("watch_r10")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    reps: dict[str, list[float]] = {k: [] for k in WATCH + CONTROL}
    sent: list[float] = []
    for _ in range(6):
        for k in WATCH + CONTROL:
            df = qs[k](spark, SF)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            reps[k].append(round(time.perf_counter() - t0, 3))
        t0 = time.perf_counter()
        bench._sentinel(spark).write.format("noop").mode("overwrite").save()
        sent.append(round(time.perf_counter() - t0, 3))
    out = {
        "metric": "watch_keys_r10",
        "unit": "sec",
        "reps": reps,
        "sentinel_reps": sent,
        "min": {k: min(v) for k, v in reps.items()},
        "vs_r8": {k: round(min(v) / R8[k], 2) for k, v in reps.items()},
    }
    sys.stdout.write("\n" + json.dumps(out, sort_keys=True) + "\n")


if __name__ == "__main__":
    main()
