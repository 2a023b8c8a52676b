"""r13 late measurement (feeds the r14 retire-or-reground decision,
SCALE §22): interleaved, ORDER-ROTATED A/B of incremental_lsh_pairs
with its counted adaptive verify width (current) vs the pure r8 plan
(no pair count, no repartition — wide=None unconditionally), at both
locked shapes:

  * sf0.1 bench shape (~12k-doc batch): the count gate already skips
    counting here (batch < 50k), so the arms should be statistically
    identical — a sanity control.
  * 500k-doc soak shape (100k batch, ~31M colliding pairs): the arm
    where the counted width engages (width 256).  The r13 isolation
    soaks measured zero spill at ANY width in verify_jaccard's pinned
    shuffle-hash orientation, predicting the count (a serial barrier)
    plus the repartitions are pure overhead — this END-TO-END A/B is
    the number the r14 removal decision needs.

The wide=None arm is produced by raising dedup._INCR_COUNT_MIN_BATCH
above any batch size (the gate then never counts and never widens) —
the shipped code path itself, not a reimplementation.  Outputs are
compared for equality (pair counts) each rep.

Usage: python scripts/ab_incr_r13.py   (prints one JSON line)
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
from scripts.soak_r5b import OUT, build

SF = "/root/testdata/sf0.1"


def main():
    spark = get_spark("ab_incr_r13")
    spark.sparkContext.setLogLevel("ERROR")
    build(spark)
    import __spark_entry__ as entry

    out = {"metric": "ab_incr_r13", "unit": "sec"}
    for shape, root in (("sf01", SF), ("soak500k", OUT)):
        docs = spark.read.parquet(f"{root}/documents.parquet")
        new = docs.filter(F.col("doc_id") % 5 == 0)
        idx = entry._lsh_index_old(spark, root)  # build once, outside timings

        def run(counted: bool):
            saved = dedup._INCR_COUNT_MIN_BATCH
            if not counted:
                dedup._INCR_COUNT_MIN_BATCH = 10**12  # gate never engages
            try:
                df = dedup.incremental_lsh_pairs(
                    new, idx.bands, idx.shingles, threshold=0.2
                )
                t0 = time.perf_counter()
                n = df.count()
                dt = round(time.perf_counter() - t0, 2)
            finally:
                dedup._INCR_COUNT_MIN_BATCH = saved
            dedup.release_persists()
            spark.catalog.clearCache()
            return dt, n

        arms = [("a_counted", True), ("b_wide_none", False)]
        for label, _ in arms:
            out[f"{shape}_{label}"] = []
        pairs_seen = set()
        for rnd in range(2):
            order = arms if rnd % 2 == 0 else list(reversed(arms))
            for label, counted in order:
                dt, n = run(counted)
                out[f"{shape}_{label}"].append(dt)
                pairs_seen.add(n)
                print(shape, label, dt, "s", n, "pairs", flush=True)
        out[f"{shape}_pairs_identical"] = len(pairs_seen) == 1
    sys.stdout.write("\n" + json.dumps(out, sort_keys=True) + "\n")


if __name__ == "__main__":
    main()
