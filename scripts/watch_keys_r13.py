"""Within-session repeated measure of the r12 bench SPREAD outliers
(r12 verdict #3): ann_rnn_pairs (reps 1.694 / 7.444 / 1.518 in the
committed BENCH_FULL — mid-rep max_ratio 4.9 vs best) and
events_tcloseness (0.888 / 1.968 / 0.699 — mid-rep 2.8x).  Neither
operator changed in r12, so the hypothesis is host noise (page-cache /
GC phase) rather than a plan cause; the test is whether the spread
REPRODUCES under interleaved measurement, where any host drift hits the
watch keys and the controls in the same round.

Protocol (watch_keys_r11): 6 reps, each round measuring every watch +
control key once plus the fixed-work sentinel, so a slow round shows up
in ALL keys of that round.  A plan cause would show a consistent
elevated tail or rep-position pattern in the watch keys only; host
noise shows as isolated spikes correlated with sentinel/control spikes
in the same round.

Usage: python scripts/watch_keys_r13.py  (writes JSON to stdout)
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
WATCH = ["ann_rnn_pairs", "events_tcloseness"]
CONTROL = ["where_and", "cursor_after", "window_running"]


def main():
    spark = get_spark("watch_r13")
    spark.sparkContext.setLogLevel("ERROR")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    full = json.load(open(os.path.join(root, "BENCH_FULL.json")))
    ref = {k: full["queries"].get(k) for k in WATCH + CONTROL}
    ref_reps = {k: full["reps"].get(k) for k in WATCH}
    qs = entry.queries()
    # construct once per key (mirrors bench: construct is not exec)
    dfs = {k: qs[k](spark, SF) for k in WATCH + CONTROL}
    reps: dict[str, list[float]] = {k: [] for k in WATCH + CONTROL}
    sent: list[float] = []
    for _ in range(6):
        for k in WATCH + CONTROL:
            t0 = time.perf_counter()
            dfs[k].write.format("noop").mode("overwrite").save()
            reps[k].append(round(time.perf_counter() - t0, 3))
        t0 = time.perf_counter()
        bench._sentinel(spark).write.format("noop").mode("overwrite").save()
        sent.append(round(time.perf_counter() - t0, 3))
    out = {
        "metric": "watch_keys_r13",
        "unit": "sec",
        "reps": reps,
        "sentinel_reps": sent,
        "min": {k: min(v) for k, v in reps.items()},
        "spread": {k: round(max(v) / min(v), 2) for k, v in reps.items()},
        "sentinel_spread": round(max(sent) / min(sent), 2),
        "bench_full_ref": {"queries": ref, "reps": ref_reps},
    }
    sys.stdout.write("\n" + json.dumps(out, sort_keys=True) + "\n")


if __name__ == "__main__":
    main()
