"""Skew utilities: salted join / two-phase agg must be result-identical to
their plain counterparts."""

from __future__ import annotations

from pyspark.sql import functions as F

from staticql_spark.operators.skew import salted_join, two_phase_agg
from tests.conftest import SF_SMOKE


def test_salted_join_matches_plain_join(spark):
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    p = spark.read.parquet(f"{SF_SMOKE}/part.parquet").withColumnRenamed(
        "p_partkey", "l_partkey"
    )
    plain = li.join(p, "l_partkey").groupBy("l_partkey").count()
    salted = salted_join(li, p, "l_partkey", salts=4).groupBy("l_partkey").count()
    a = {(r["l_partkey"], r["count"]) for r in plain.collect()}
    b = {(r["l_partkey"], r["count"]) for r in salted.collect()}
    assert a == b


def test_two_phase_agg_matches_plain_agg(spark):
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    plain = {
        r["l_returnflag"]: (round(r["s"], 2), r["c"])
        for r in li.groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("s"), F.count("*").alias("c"))
        .collect()
    }
    salted = {
        r["l_returnflag"]: (round(r["sum_l_quantity"], 2), r["n_rows"])
        for r in two_phase_agg(li, "l_returnflag", "l_quantity", salts=8).collect()
    }
    assert plain == salted


def test_two_phase_agg_splits_constant_value_hot_key(spark):
    # one hot key, every row the SAME value: a hash(value) salt would land
    # all rows in one salt bucket and the "split" would be a no-op
    df = spark.createDataFrame(
        [("hot", 0.0)] * 5000 + [("cold", 1.0)] * 10, ["k", "v"]
    ).repartition(8)
    partial = (
        df.withColumn(
            "_salt",
            F.pmod(
                F.hash(F.spark_partition_id(), F.monotonically_increasing_id()),
                F.lit(16),
            ),
        )
        .groupBy("k", "_salt")
        .count()
    )
    n_salts = partial.filter(F.col("k") == "hot").count()
    assert n_salts > 1  # the hot group actually scatters
    out = {r["k"]: (r["sum_v"], r["n_rows"]) for r in two_phase_agg(df, "k", "v").collect()}
    assert out == {"hot": (0.0, 5000), "cold": (10.0, 10)}
