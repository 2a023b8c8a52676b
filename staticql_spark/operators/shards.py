"""Training-shard export sink: size-governed, deterministically ordered
output files plus a manifest — the delivery format of a training-data
pipeline (JSONL or Parquet shards a dataloader can stream and resume).

Scale shape: `repartitionByRange` on the order column gives one range
per shard (Spark samples the column to build balanced range bounds — no
driver-side data), `sortWithinPartitions` makes every shard internally
ordered, and `maxRecordsPerFile` hard-caps file size so a skewed range
can't produce a multi-GB shard. The manifest is one aggregation over
`input_file_name()` — |files| rows to the driver, never data rows.
"""

from __future__ import annotations

import json
import math
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def export_training_shards(
    df: DataFrame,
    out_dir: str,
    records_per_file: int = 100_000,
    order_col: str = "doc_id",
    fmt: str = "parquet",
) -> dict:
    """Write ``df`` as ordered shards under ``out_dir`` and a
    ``_manifest.json`` describing them; returns the manifest dict.

    Shards are globally range-ordered by ``order_col`` (shard k's ids all
    precede shard k+1's), each internally sorted, each at most
    ``records_per_file`` records. ``fmt`` is any Spark batch sink format
    ("parquet", "json" for JSONL shards, "csv").

    The manifest carries per-file record counts and [min, max] order-key
    ranges plus totals — what a dataloader needs for deterministic
    sharding/resume without listing or reading the files first.
    """
    out_dir = out_dir.rstrip("/")
    n_rows = df.count()
    num_ranges = max(1, math.ceil(n_rows / records_per_file))
    (
        df.repartitionByRange(num_ranges, F.col(order_col))
        .sortWithinPartitions(order_col)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", records_per_file)
        .format(fmt)
        .save(out_dir)
    )
    back = df.sparkSession.read.format(fmt).schema(df.schema).load(out_dir)
    files = (
        back.groupBy(F.input_file_name().alias("path"))
        .agg(
            F.count("*").alias("n_records"),
            F.min(order_col).alias("min_key"),
            F.max(order_col).alias("max_key"),
        )
        .orderBy("min_key")
        .collect()  # bounded: one row per shard file
    )
    manifest = {
        "format": fmt,
        "order_col": order_col,
        "records_per_file": records_per_file,
        "n_records": n_rows,
        "n_files": len(files),
        "files": [
            {
                "path": os.path.basename(r["path"]),
                "n_records": r["n_records"],
                "min_key": r["min_key"],
                "max_key": r["max_key"],
            }
            for r in files
        ],
    }
    with open(f"{out_dir}/_manifest.json", "w") as f:
        json.dump(manifest, f, indent=1, default=str)
    return manifest


def shard_checksums(
    df: DataFrame,
    content_cols: list[str],
    n_shards: int = 16,
    id_col: str = "doc_id",
    salt: str = "shard1",
) -> DataFrame:
    """Order-independent per-shard content checksums — the data-versioning
    primitive for export validation: two exports of the same corpus match
    shard-for-shard regardless of partitioning, task order, or row order,
    and any single changed/dropped/added row flips exactly one shard's
    checksum (XOR of per-row digests is commutative and self-inverse, so
    re-verifying 100 TB after a re-shuffle costs one map-side pass, and a
    mismatch localizes the diff to 1/``n_shards`` of the data).

    Row digest = first 60 bits of md5 over the ``content_cols`` joined
    with the 0x1f unit separator (the repo-wide engine-portable digest
    recipe); shard = md5(salt|id) mod ``n_shards`` — content edits move a
    row's digest but never its shard, so version diffs align.  Returns
    (shard_id, n_rows, xor_checksum) — one aggregation, map-side
    combined, |shards| rows out.
    """
    keyed = df.select(
        shard_of(id_col, n_shards, salt).alias("shard_id"),
        row_digest(content_cols).alias("__d"),
    )
    return keyed.groupBy("shard_id").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.expr("bit_xor(__d)").alias("xor_checksum"),
    )


def row_digest(content_cols: list[str]):
    """First 60 bits of md5 over the concatenation of PER-COLUMN md5
    hex digests (NULL column -> the 1-char sentinel ``-``) — the
    engine-portable row content digest.  Hashing columns individually
    first makes the payload uniquely decodable: every token is either
    32 hex chars or the non-hex ``-``, so NULL placement ((a,NULL,b)
    vs (a,b,NULL)) and separator-embedded values (('x\\x1fy','z') vs
    ('x','y\\x1fz') under the old concat_ws recipe) cannot collide."""
    payload = F.concat(
        *[
            F.coalesce(F.md5(F.col(c).cast("string")), F.lit("-"))
            for c in content_cols
        ]
    )
    return F.conv(F.substring(F.md5(payload), 1, 15), 16, 10).cast("long")


def shard_of(id_col: str, n_shards: int, salt: str = "shard1"):
    """Deterministic md5(salt|id) shard assignment — content edits move a
    row's digest but never its shard, so version diffs align."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt + "|"), F.col(id_col).cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        % n_shards
    )


def checksum_delta(
    old: DataFrame,
    new: DataFrame,
    content_cols: list[str],
    n_shards: int = 16,
    id_col: str = "doc_id",
    salt: str = "shard1",
) -> DataFrame:
    """Corpus-version diff at shard granularity — the follow-up question
    :func:`shard_checksums` exists to answer: given two versions of a
    corpus, WHICH shards changed?  Because the shard assignment hashes
    only the row id, an edited row stays in its shard and flips that
    shard's XOR; an added/dropped row changes one shard's count and XOR.
    Untouched shards compare equal, so a downstream consumer re-ingests
    1/``n_shards`` granules instead of 100 TB.

    Returns one row per shard present in either version: (shard_id,
    n_old, n_new, checksum_old, checksum_new, changed).  Missing shards
    count 0 with checksum 0 (the XOR identity — an empty shard and a
    shard whose digests cancel are both "nothing to ship").  Cost: one
    map-side-combined aggregation per version + a |shards|-row join.
    """
    a = shard_checksums(old, content_cols, n_shards, id_col, salt)
    b = shard_checksums(new, content_cols, n_shards, id_col, salt)
    zero = F.lit(0).cast("long")
    return (
        a.select(
            "shard_id",
            F.col("n_rows").alias("n_old"),
            F.col("xor_checksum").alias("checksum_old"),
        )
        .join(
            b.select(
                "shard_id",
                F.col("n_rows").alias("n_new"),
                F.col("xor_checksum").alias("checksum_new"),
            ),
            "shard_id",
            "full_outer",
        )
        .select(
            "shard_id",
            F.coalesce("n_old", zero).alias("n_old"),
            F.coalesce("n_new", zero).alias("n_new"),
            F.coalesce("checksum_old", zero).alias("checksum_old"),
            F.coalesce("checksum_new", zero).alias("checksum_new"),
        )
        .withColumn(
            "changed",
            (F.col("n_old") != F.col("n_new"))
            | (F.col("checksum_old") != F.col("checksum_new")),
        )
    )
