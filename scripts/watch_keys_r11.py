"""Within-session repeated measure of the r10 above-band watch keys
(r10 verdict #5): events_tcloseness 1.96x (decimal EMD fold added in
r10 — a real change, re-measure its steady cost), events_rater_consensus
1.88x (n_i >= 2 window sum added — same), robust_outliers 2.03x
(UNTOUCHED since r8 — presumed drift, must not reproduce).  Measured
against the r9 bench values with trivial-key drift controls (where_and,
cursor_after, window_running) in the SAME session plus the fixed-work
sentinel, 6 reps interleaved so host drift hits all keys equally.

Reference values are the committed BENCH_r09/BENCH_r10 per-key numbers
(driver host): r9 is the pre-change baseline, r10 the inflated reading
under a 1.2-2x slow box.

Usage: python scripts/watch_keys_r11.py
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
WATCH = ["events_tcloseness", "events_rater_consensus", "robust_outliers"]
CONTROL = ["where_and", "cursor_after", "window_running"]


def main():
    spark = get_spark("watch_r11")
    spark.sparkContext.setLogLevel("ERROR")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    refs = {}
    for rnd in ("09", "10"):
        d = json.load(open(os.path.join(root, f"BENCH_r{rnd}.json")))
        refs[rnd] = d.get("parsed", d).get("queries", {})
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
        "metric": "watch_keys_r11",
        "unit": "sec",
        "reps": reps,
        "sentinel_reps": sent,
        "min": {k: min(v) for k, v in reps.items()},
        "vs_r9": {
            k: round(min(v) / refs["09"][k], 2)
            for k, v in reps.items()
            if k in refs["09"]
        },
        "vs_r10": {
            k: round(min(v) / refs["10"][k], 2)
            for k, v in reps.items()
            if k in refs["10"]
        },
    }
    sys.stdout.write("\n" + json.dumps(out, sort_keys=True) + "\n")


if __name__ == "__main__":
    main()
