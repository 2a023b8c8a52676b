"""Covering-index artifacts: build, layout, prefix parity, incremental refresh."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from staticql_spark.indexing import index_entries, load_index, save_indexes
from staticql_spark.streaming import apply_diff


def test_index_entries_shape(herbal):
    cfg = herbal.configs["herbs"]
    dfs = {n: herbal.df(n) for n in herbal.configs}
    entries = index_entries(dfs["herbs"], cfg, dfs)
    rows = entries.collect()
    fields = {r["field"] for r in rows}
    # slug always indexed; declared + relation-derived fields present
    assert "slug" in fields and "name" in fields and "tagSlugs" in fields
    # array fan-out: each tagSlug element gets its own entry
    tag_entries = [r for r in rows if r["field"] == "tagSlugs"]
    assert len(tag_entries) == 6  # 3 herbs x 2 tags
    # unicode prefix parity: name ゴボウ -> 30b4
    name_prefix = {r["v"]: r["prefix"] for r in rows if r["field"] == "name"}
    assert name_prefix["ゴボウ"] == "30b4"
    assert name_prefix["レモングラス"] == "30ec"
    # slug prefix ascii: arctium-lappa -> 0061
    slug_prefix = {r["v"]: r["prefix"] for r in rows if r["field"] == "slug"}
    assert slug_prefix["arctium-lappa"] == "0061"


def test_save_and_load_roundtrip(herbal, tmp_path):
    out = str(tmp_path / "index")
    save_indexes(herbal, out)
    idx = load_index(herbal.spark, out, "herbs")
    # partition pruning on (field, prefix) is the trie descent
    hit = idx.filter((F.col("field") == "slug") & (F.col("prefix") == "0063")).collect()
    assert {r["v"] for r in hit} == {"centella-asiatica", "cymbopogon-citratus"}


def test_relation_path_index_denormalized(herbal):
    cfg = herbal.configs["recipes"]
    dfs = {n: herbal.df(n) for n in herbal.configs}
    entries = index_entries(dfs["recipes"], cfg, dfs)
    rel = entries.filter(F.col("field") == "herbs.slug").collect()
    # recipe recipeGroup002--001 joins 2 herbs; recipeGroup001--001 joins 1
    by_slug: dict[str, set] = {}
    for r in rel:
        by_slug.setdefault(r["slug"], set()).add(r["v"])
    assert by_slug["recipeGroup002--001"] == {"centella-asiatica", "cymbopogon-citratus"}
    assert by_slug["recipeGroup001--001"] == {"arctium-lappa"}


def test_apply_diff_merge_semantics(spark):
    current = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3)], ["slug", "val"]
    )
    new_records = spark.createDataFrame(
        [("b", 20), ("d", 4)], ["slug", "val"]
    )
    diff = spark.createDataFrame(
        [("M", "src", "b"), ("D", "src", "c"), ("A", "src", "d")],
        ["status", "source", "slug"],
    )
    out = {r["slug"]: r["val"] for r in apply_diff(current, new_records, diff).collect()}
    assert out == {"a": 1, "b": 20, "d": 4}


@pytest.mark.slow  # soak-grade: excluded from the default gate (pytest.ini)
def test_refresh_removes_emptied_prefix_partition(spark, content_dir, tmp_path):
    """A changed value that moves to a different prefix partition must purge
    its old shard — including DELETING the directory when it empties
    (reference: IndexBuilder.ts:393-447 remove-dir-when-empty)."""
    import os
    import shutil

    from staticql_spark import define
    from staticql_spark.streaming import DIFF_SCHEMA, refresh_index_partitions
    from tests.conftest import CONFIG

    root = tmp_path / "content"
    shutil.copytree(content_dir, root)
    out = str(tmp_path / "idx")
    define(CONFIG)(base_dir=str(root), spark=spark).save_indexes(out)

    # レモングラス is the only herbs.name with prefix 30ec; renaming it must
    # delete that partition dir entirely
    assert os.path.isdir(f"{out}/herbs/field=name/prefix=30ec")
    p = root / "content" / "herbs" / "cymbopogon-citratus.md"
    p.write_text(
        p.read_text().replace("name: レモングラス", "name: lemongrass"),
        encoding="utf-8",
    )
    sql2 = define(CONFIG)(base_dir=str(root), spark=spark)
    diff = spark.createDataFrame([("M", "herbs", "cymbopogon-citratus")], DIFF_SCHEMA)
    refresh_index_partitions(sql2, "herbs", diff, out)

    assert not os.path.isdir(f"{out}/herbs/field=name/prefix=30ec")
    vals = {
        r["v"]
        for r in spark.read.parquet(f"{out}/herbs").filter("field = 'name'").collect()
    }
    assert "lemongrass" in vals and "レモングラス" not in vals


def test_prefix_supplementary_plane_char(spark):
    # U+1F600 has a 5-hex-digit code point: the prefix must carry all 5
    # digits (a truncating lpad would emit '1f60' and disagree with
    # functions.prefix_hex_path)
    from staticql_spark.config import SourceConfig
    from staticql_spark.functions import prefix_hex_path
    from staticql_spark.indexing import index_entries

    cfg = SourceConfig(name="s", pattern="*.md", type="markdown",
                       index_fields=["title"])
    df = spark.createDataFrame(
        [("a", "\U0001F600 grinning"), ("b", "plain")], ["slug", "title"]
    )
    rows = {r["v"]: r["prefix"] for r in index_entries(df, cfg, depth=1).collect()}
    assert rows["\U0001F600 grinning"] == "1f600"
    assert rows["plain"] == "0070"
    assert prefix_hex_path("\U0001F600 grinning") == "1f600"
    assert prefix_hex_path("plain") == "0070"
