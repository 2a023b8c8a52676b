"""Slowly-changing-dimension (type 2) snapshot history — how a 100 TB
corpus keeps every document version queryable without ever rewriting
history.

``scd2_merge`` folds a new snapshot into a history table where each row
carries (valid_from, valid_to): rows whose content changed are CLOSED
(valid_to = batch timestamp) and re-opened with the new payload; deleted
ids are closed; unchanged open rows pass through untouched; new ids open
fresh.  The merge is two hash joins keyed on the id — the closed
majority of the history (valid_to IS NOT NULL) is never read beyond a
partition-prunable filter, so a daily merge costs the OPEN slice + the
batch, not the accumulated history.  Write the history parquet
partitioned by a date of ``valid_to`` (open rows in a `null` partition)
and the open-slice filter becomes partition pruning.

Versions are compared by a content fingerprint (md5 of the tracked
columns, computed map-side) — the same change test as corpus_diff.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _fp(cols: Sequence[str]):
    return F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols]))


def scd2_open(snapshot: DataFrame, id_col: str, tracked: Sequence[str], ts) -> DataFrame:
    """Bootstrap a history table from a first snapshot: all rows open."""
    return snapshot.select(
        id_col,
        *tracked,
        _fp(tracked).alias("__fp"),
        F.lit(ts).cast("long").alias("valid_from"),
        F.lit(None).cast("long").alias("valid_to"),
    )


def scd2_merge(
    history: DataFrame,
    snapshot: DataFrame,
    id_col: str,
    tracked: Sequence[str],
    ts,
) -> DataFrame:
    """History' = history ⊎ changes(snapshot) with type-2 semantics.

    Returns the full new history frame (closed rows unchanged, open rows
    closed/kept per the snapshot, new versions opened at ``ts``).
    """
    closed = history.filter(F.col("valid_to").isNotNull())
    open_ = history.filter(F.col("valid_to").isNull())
    snap = snapshot.select(id_col, *tracked, _fp(tracked).alias("__snap_fp"))

    j = open_.alias("o").join(
        snap.select(id_col, "__snap_fp").alias("s"),
        F.col(f"o.`{id_col}`") == F.col(f"s.`{id_col}`"),
        "full_outer",
    )
    # open rows: keep when fp unchanged; close when changed or id gone
    kept = j.filter(F.col("o.__fp") == F.col("s.__snap_fp")).select("o.*")
    closed_now = (
        j.filter(
            F.col("s.__snap_fp").isNull()
            | (F.col("o.__fp").isNotNull() & (F.col("o.__fp") != F.col("s.__snap_fp")))
        )
        .select("o.*")
        .filter(F.col("__fp").isNotNull())
        .withColumn("valid_to", F.lit(ts).cast("long"))
    )
    # snapshot rows: open a version when no matching open fp exists
    opened = (
        snap.alias("s2")
        .join(
            open_.select(id_col, F.col("__fp").alias("__open_fp")),
            id_col,
            "left",
        )
        .filter(
            F.col("__open_fp").isNull() | (F.col("__open_fp") != F.col("__snap_fp"))
        )
        .select(
            id_col,
            *tracked,
            F.col("__snap_fp").alias("__fp"),
            F.lit(ts).cast("long").alias("valid_from"),
            F.lit(None).cast("long").alias("valid_to"),
        )
    )
    return closed.unionByName(kept).unionByName(closed_now).unionByName(opened)


def scd2_as_of(history: DataFrame, at: int) -> DataFrame:
    """The snapshot that was current at time ``at`` (time travel)."""
    return history.filter(
        (F.col("valid_from") <= at)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > at))
    )
