"""As-of join, bucketed range join, and KMV sketch — semantics pinned on
hand-built frames where the expected answer is enumerable by eye, plus the
determinism properties the operators promise (boundary inclusion, bucket
edges, tie-breaks)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from staticql_spark.operators.asof import asof_join, epoch_us, range_join
from staticql_spark.operators.sketch import kmv_distinct


def ts(minute: int, second: int = 0):
    return dt.datetime(2024, 1, 1, 10, minute, second)


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame(
        [
            ("a", ts(0), 100.0, 1),
            ("a", ts(10), 110.0, 2),
            ("a", ts(20), 120.0, 3),
            ("b", ts(5), 500.0, 4),
        ],
        "key string, qts timestamp_ntz, px double, qid long",
    )


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [
            ("a", ts(0), 1),    # exactly on quote 1 -> inclusive match
            ("a", ts(15), 2),   # between quotes 2 and 3 -> quote 2
            ("a", ts(25), 3),   # after all -> quote 3
            ("b", ts(4), 4),    # before b's only quote -> null
            ("c", ts(9), 5),    # no quotes for key -> null
        ],
        "key string, tts timestamp_ntz, tid long",
    )


def collect_map(df, key, *vals):
    return {r[key]: tuple(r[v] for v in vals) for r in df.collect()}


class TestAsofJoin:
    def test_backward_inclusive(self, quotes, trades):
        out = asof_join(
            trades, quotes, on="key", left_ts="tts", right_ts="qts",
            value_cols=["px", "qid"], tiebreak="qid",
        )
        got = collect_map(out, "tid", "px", "qid")
        assert got == {
            1: (100.0, 1),
            2: (110.0, 2),
            3: (120.0, 3),
            4: (None, None),
            5: (None, None),
        }

    def test_tolerance_nulls_stale_matches(self, quotes, trades):
        out = asof_join(
            trades, quotes, on="key", left_ts="tts", right_ts="qts",
            value_cols=["px"], tiebreak="qid",
            tolerance_us=6 * 60 * 1_000_000,
        )
        got = collect_map(out, "tid", "px")
        # trade 2 (t=15) is 5 min after quote 2 -> kept; trade 3 (t=25) is
        # 5 min after quote 3 -> kept; exact match kept; others null
        assert got == {1: (100.0,), 2: (110.0,), 3: (120.0,), 4: (None,), 5: (None,)}

    def test_duplicate_right_ts_resolved_by_tiebreak(self, spark, trades):
        dup = spark.createDataFrame(
            [("a", ts(0), 1.0, 1), ("a", ts(0), 2.0, 2)],
            "key string, qts timestamp_ntz, px double, qid long",
        )
        out = asof_join(
            trades.filter("tid = 1"), dup, on="key", left_ts="tts",
            right_ts="qts", value_cols=["px"], tiebreak="qid",
        )
        # last in (ts, tiebreak) order wins -> qid 2
        assert out.collect()[0]["px"] == 2.0

    def test_value_col_collision_raises(self, quotes, trades):
        with pytest.raises(ValueError, match="collide"):
            asof_join(
                trades.withColumn("px", F.lit(0.0)), quotes, on="key",
                left_ts="tts", right_ts="qts", value_cols=["px"],
            )


class TestRangeJoin:
    def test_window_and_boundaries(self, spark):
        left = spark.createDataFrame(
            [("a", 1_000_000, 1)], "key string, lts long, lid long"
        )
        # window [lts+0, lts+10s]; probe both bucket-boundary sides
        right = spark.createDataFrame(
            [
                ("a", 1_000_000, 10),       # == lower bound
                ("a", 6_000_000, 11),       # inside
                ("a", 11_000_000, 12),      # == upper bound
                ("a", 11_000_001, 13),      # just past
                ("b", 6_000_000, 14),       # wrong key
            ],
            "key string, rts long, rid long",
        )
        got = range_join(
            left, right, on="key", left_ts="lts", right_ts="rts",
            lower_us=0, upper_us=10_000_000, right_cols=["rid"],
        )
        assert sorted(r["rid"] for r in got.collect()) == [10, 11, 12]

        exclusive = range_join(
            left, right, on="key", left_ts="lts", right_ts="rts",
            lower_us=0, upper_us=10_000_000,
            include_lower=False, include_upper=False, right_cols=["rid"],
        )
        assert sorted(r["rid"] for r in exclusive.collect()) == [11]

    def test_matches_bruteforce_on_events(self, spark):
        from staticql_spark.streaming import load_events

        ev = load_events(spark, "/root/testdata/sf0.001/events.parquet")
        left = ev.filter("event_type = 'click'").select(
            "event_id", "user_id", "ts"
        )
        right = ev.select("user_id", "ts", F.col("event_id").alias("rid"))
        bucketed = range_join(
            left, right, on="user_id", left_ts="ts", right_ts="ts",
            lower_us=0, upper_us=300_000_000, include_lower=False,
            right_cols=["rid"],
        )
        l_us, r_us = epoch_us(left, "ts"), epoch_us(right, "ts")
        brute = (
            left.withColumn("_l", l_us)
            .join(right.withColumn("_r", r_us), "user_id")
            .filter((F.col("_r") > F.col("_l")) & (F.col("_r") <= F.col("_l") + 300_000_000))
        )
        got = {(r["event_id"], r["rid"]) for r in bucketed.collect()}
        want = {(r["event_id"], r["rid"]) for r in brute.collect()}
        assert got == want

    def test_right_col_collision_raises(self, spark):
        df = spark.createDataFrame([("a", 0, 1)], "key string, t long, x long")
        with pytest.raises(ValueError, match="collide"):
            range_join(df, df, on="key", left_ts="t", right_ts="t",
                       lower_us=0, upper_us=10)


class TestKmv:
    def test_small_ndv_is_exact(self, spark):
        df = spark.range(1000).select((F.col("id") % 37).alias("v"))
        row = kmv_distinct(df, "v", k=256).collect()[0]
        assert row["sketch_k"] == 37
        assert row["exact_ndv"] == 37
        assert row["est_ndv"] == 37.0  # below-k sketches report exactly

    def test_estimate_within_bound(self, spark):
        df = spark.range(20_000).select(F.col("id").alias("v"))
        row = kmv_distinct(df, "v", k=256).collect()[0]
        assert row["sketch_k"] == 256
        # KMV relative error ~ 1/sqrt(k) ≈ 6.3%; allow 4 sigma
        assert abs(row["est_ndv"] - 20_000) / 20_000 < 0.25

    def test_partitioning_invariant(self, spark):
        df = spark.range(5000).select((F.col("id") * 7919 % 1000).alias("v"))
        a = kmv_distinct(df.repartition(1), "v", k=64).collect()[0]
        b = kmv_distinct(df.repartition(16), "v", k=64).collect()[0]
        assert a == b


class TestCountMin:
    def test_estimates_upper_bound_exact(self, spark):
        from staticql_spark.operators.sketch import cm_estimate

        df = spark.range(3000).select((F.col("id") % 30).alias("v"))
        rows = cm_estimate(df, "v", probes=["0", "7", "29", "absent"],
                           depth=4, width=256).collect()
        got = {r["v"]: (r["est_count"], r["exact_count"]) for r in rows}
        assert set(got) == {"0", "7", "29", "absent"}
        for est, exact in got.values():
            assert est >= exact  # CM never underestimates
        # 30 distinct values in 4x256 buckets: collisions are unlikely, so
        # the present probes should be exact and the absent one near zero
        assert got["0"] == (100, 100)
        assert got["absent"][1] == 0

    def test_sketch_is_partitioning_invariant(self, spark):
        from staticql_spark.operators.sketch import cm_sketch

        df = spark.range(2000).select((F.col("id") % 50).alias("v"))
        a = sorted(map(tuple, cm_sketch(df.repartition(1), "v").collect()))
        b = sorted(map(tuple, cm_sketch(df.repartition(16), "v").collect()))
        assert a == b


def test_qsketch_union_merge_equals_direct_sketch(spark):
    # the defining sketch property: quantiles of A ∪ B computed from the
    # two per-side bottom-k sketches alone must equal the sketch built
    # over the concatenated data — bit-exact, because bottom-k-by-hash of
    # unique row keys composes under union
    from staticql_spark.operators.sketch import (
        qsketch, qsketch_quantiles, qsketch_union_quantiles,
    )

    a = spark.range(0, 3000).select(
        F.col("id").alias("k"), (F.col("id") % 97).cast("double").alias("x")
    )
    b = spark.range(3000, 5000).select(
        F.col("id").alias("k"), (F.col("id") % 13).cast("double").alias("x")
    )
    qs = (0.1, 0.5, 0.9)
    direct = qsketch_quantiles(qsketch(a.unionByName(b), "x", "k", k=64), qs)
    merged = qsketch_union_quantiles(
        qsketch(a, "x", "k", k=64), qsketch(b, "x", "k", k=64), k=64, qs=qs
    )
    d = {r["q"]: (r["est_v"], r["sketch_n"]) for r in direct.collect()}
    m = {r["q"]: (r["est_v"], r["sketch_n"]) for r in merged.collect()}
    assert d == m and len(d) == 3
    assert all(n == 64 for _, n in d.values())


def test_qsketch_quantiles_exact_on_small_input(spark):
    # when the data fits inside k, the sketch IS the data and the type-1
    # quantiles are the exact lower empirical quantiles
    from staticql_spark.operators.sketch import qsketch, qsketch_quantiles

    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([5, 1, 4, 2, 3])], "k: long, x: double"
    )
    got = {
        r["q"]: r["est_v"]
        for r in qsketch_quantiles(
            qsketch(df, "x", "k", k=512), qs=(0.0, 0.2, 0.5, 1.0)
        ).collect()
    }
    # n=5: rank(0.0)=1 -> 1.0, rank(0.2)=1 -> 1.0, rank(0.5)=ceil(2.5)=3
    # -> 3.0, rank(1.0)=5 -> 5.0
    assert got == {0.0: 1.0, 0.2: 1.0, 0.5: 3.0, 1.0: 5.0}
