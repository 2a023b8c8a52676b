"""Local mimic of the driver's correctness gate: run each __spark_entry__
query on Spark AND its oracle on DuckDB over the same parquet, compare
row count, schema width, and order-insensitive values.

Deliberately adversarial vs our own session defaults: builds a VANILLA
SparkSession (no staticql_spark.session configs) under a NON-UTC timezone,
because the driver's harness does its own SparkSession and any query that
silently depends on get_spark()'s configs (nanosAsLong, UTC pin, ...) is
broken there even if green here with get_spark. Canonicalization mirrors
the driver: plain pandas sort_values — list/array cells crash it, which is
exactly the driver behavior we must survive.

Usage:  python tests/oracle_harness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    # Mirror the driver comparator: sort columns by name, then a plain
    # sort_values over all columns. No list→tuple rescue — a query that
    # emits array cells must fail here the way it fails in the driver.
    df = df[sorted(df.columns)].copy()
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(
            f"columns spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
        )
        return problems
    if problems:
        return problems
    a, b = canon(spark_pdf), canon(duck_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        # The driver's value hash is dtype-sensitive: an int64 Spark column vs a
        # float64 oracle column hash-mismatches even when every value compares
        # equal (DuckDB HUGEINT -> pandas float64 hid late_shipment_priority for
        # a full round). Flag the split loudly instead of coercing past it.
        int_a = pd.api.types.is_integer_dtype(av)
        int_b = pd.api.types.is_integer_dtype(bv)
        flt_a = pd.api.types.is_float_dtype(av)
        flt_b = pd.api.types.is_float_dtype(bv)
        if (int_a and flt_b) or (flt_a and int_b):
            problems.append(
                f"col {c} dtype split spark={av.dtype} duck={bv.dtype} "
                "(driver hash is dtype-sensitive; cast the oracle, e.g. ::BIGINT)"
            )
            continue
        try:
            if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
                ok = (
                    (av.isna() & bv.isna())
                    | (av.astype(float) == bv.astype(float))
                ).all()
            else:
                ok = av.astype(str).equals(bv.astype(str))
        except Exception as exc:  # noqa: BLE001
            problems.append(f"col {c}: compare error {exc}")
            continue
        if not ok:
            mism = (av.astype(str) != bv.astype(str)).to_numpy().nonzero()[0][:3]
            examples = [(c, i, av.iloc[i], bv.iloc[i]) for i in mism]
            problems.append(f"col {c} value mismatch, e.g. {examples}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from pyspark.sql import SparkSession

    # Vanilla session, non-UTC TZ — adversarial stand-in for the driver's.
    # Master defaults to local[32] to MATCH the driver: r6's one failure
    # (embedding_class_sep) passed at local[8] and failed at local[32]
    # because a float avg's summation order varies with partition count.
    tz = os.environ.get("ORACLE_HARNESS_TZ", "America/New_York")
    master = os.environ.get("ORACLE_HARNESS_MASTER", "local[32]")
    spark = (
        SparkSession.builder.master(master)
        .appName("oracle-harness-vanilla")
        .config("spark.sql.session.timeZone", tz)
        .config(
            "spark.sql.shuffle.partitions",
            os.environ.get("ORACLE_HARNESS_SHUFFLE", "32"),
        )
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_con(sf_dir)

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {exc}")
            failures += 1
            continue
        if name not in oracles:
            print(f"weak {name}: rows={len(spark_pdf)} (no oracle)")
            continue
        try:
            duck_pdf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {exc}")
            failures += 1
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            print(f"FAIL {name}: {problems}")
            failures += 1
        else:
            print(f"ok   {name}: rows={len(spark_pdf)}")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
