"""Bucketed-table layout — shuffle-free co-located joins (SCALE.md §3).

A join between two tables bucketed by the same key into the same bucket
count needs NO exchange: Spark plans a SortMergeJoin whose children read
pre-bucketed files directly. For the repeated fact⨝fact joins of a 100 TB
warehouse (lineitem⨝orders every query), paying one bucketed write removes
the per-query shuffle of both sides forever — the same trade the reference
makes when it denormalizes relation fields into its prefix index at build
time (src/IndexBuilder.ts:495-520), re-expressed in Spark's storage model.

Bucketing requires the session catalog (``saveAsTable``); plain
``.parquet(path)`` writes cannot carry bucket metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    num_buckets: int = 64,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) catalog table.

    Sorting within buckets additionally removes the sort step of later
    sort-merge joins, leaving a pure merge.
    """
    keys = [key] if isinstance(key, str) else list(key)
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed catalog tables — plan contains no Exchange
    under the join (verified by tests/test_plans.py::test_bucketed_join)."""
    on_cols = [on] if isinstance(on, str) else list(on)
    return spark.table(left_table).join(spark.table(right_table), on_cols, how)
