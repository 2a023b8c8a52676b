"""Interleaved A/B + per-stage attribution for the r11 band-key change
(r10 verdict #2: attribute the full lsh_pairs build's candidate-
generation mass BEFORE optimizing, then try the md5-string -> 64-bit
band-key lever).

Two measurements, both at sf0.1 (~60k docs) and the 500k-doc
near-replica soak corpus:

  * stage attribution (current code): shingle+count, candidate
    generation (banded -> buckets -> i<j expansion -> distinct,
    materialized by count), and the end-to-end verified build — so the
    round's claims about WHERE the time goes rest on stage timings, not
    inference from deltas;
  * band-key A/B: the r10 form (32-char md5-hex STRING band key)
    rebuilt verbatim as a local replica vs the r11 form (60-bit BIGINT
    key via conv(substr(md5,1,15))), interleaved A,B,A,B with the
    scoped persist registry drained between runs, noop sink, plus the
    fixed-work sentinel before/after for host-drift normalization.

Prints one JSON line for SCALE.md.

Usage: python scripts/ab_bandkey_r11.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import bench
from staticql_spark.operators import dedup
from staticql_spark.operators.dedup import (
    _pairs_within,
    doc_shingles,
    sig_from_array,
    verify_jaccard,
)
from staticql_spark.session import get_spark
from scripts.soak_r5b import OUT, build

SF = "/root/testdata/sf0.1"


def band_keys_r10_string(sig, bands, rows_per_band, id_col):
    """The pre-r11 _band_keys verbatim: 32-char md5-hex STRING key."""
    band_cols = []
    for b in range(bands):
        band_key = F.md5(
            F.array_join(
                F.transform(
                    F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                    lambda x: x.cast("string"),
                ),
                "|",
            )
        )
        band_cols.append(F.struct(F.lit(b).alias("band"), band_key.alias("key")))
    return sig.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bk")
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))


def lsh_pairs_with(df, band_fn, threshold=0.2, max_bucket=1000, wide=None):
    """minhash_lsh_pairs with a pluggable band-key formulation and a
    PINNED verify width (so the A/B isolates the band exchange)."""
    n, num_hashes, bands = 3, 16, 4
    dsh = doc_shingles(df, "text", "doc_id", n).cache()
    sig = dsh.select(F.col("doc_id"), sig_from_array(num_hashes))
    banded = band_fn(sig, bands, num_hashes // bands, "doc_id")
    buckets = (
        banded.groupBy("band", "key")
        .agg(F.array_sort(F.collect_list(F.col("doc_id"))).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= max_bucket))
    )
    cands = (
        buckets.select(F.explode(_pairs_within("ids")).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )
    return dsh, cands, verify_jaccard(cands, dsh, "doc_id", partitions=wide).filter(
        F.col("jaccard") >= threshold
    )


def band_keys_r11_long(sig, bands, rows_per_band, id_col):
    from staticql_spark.operators.dedup import _band_keys

    return _band_keys(sig, bands, rows_per_band, id_col)


def sentinel(spark, k=3):
    reps = []
    for _ in range(k):
        t0 = time.perf_counter()
        bench._sentinel(spark).write.format("noop").mode("overwrite").save()
        reps.append(round(time.perf_counter() - t0, 3))
    return reps


def drain(spark, dsh=None):
    dedup.release_persists()
    if dsh is not None:
        dsh.unpersist()
    spark.catalog.clearCache()


def main():
    spark = get_spark("ab_bandkey_r11")
    spark.sparkContext.setLogLevel("ERROR")
    build(spark)

    out = {"metric": "ab_bandkey_r11", "unit": "sec"}
    out["sentinel_pre"] = sentinel(spark)

    for shape, root, wide in (("sf01", SF, None), ("soak500k", OUT, 256)):
        docs = spark.read.parquet(f"{root}/documents.parquet")

        # ---- stage attribution, current (r11 long-key) code ----------
        stages = {}
        dsh, cands, full = lsh_pairs_with(docs, band_keys_r11_long, wide=wide)
        t0 = time.perf_counter()
        n_docs = dsh.count()
        stages["shingle_count"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        n_cands = cands.count()
        stages["cand_generation"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        full.write.format("noop").mode("overwrite").save()
        stages["full_build_warm"] = round(time.perf_counter() - t0, 3)
        stages["n_docs"], stages["n_cands"] = n_docs, n_cands
        out[f"{shape}_stages"] = stages
        drain(spark, dsh)

        # ---- interleaved A/B: string key vs long key, end-to-end -----
        runs = {"r10_string": [], "r11_long": []}
        pair_counts = {}
        for label, fn in (
            ("r10_string", band_keys_r10_string),
            ("r11_long", band_keys_r11_long),
        ) * 2:
            dsh, cands, full = lsh_pairs_with(docs, fn, wide=wide)
            t0 = time.perf_counter()
            full.write.format("noop").mode("overwrite").save()
            runs[label].append(round(time.perf_counter() - t0, 3))
            if label not in pair_counts:
                pair_counts[label] = full.count()
            drain(spark, dsh)
        out[f"{shape}_ab_end_to_end"] = runs
        out[f"{shape}_pairs"] = pair_counts  # must be EQUAL across forms

        # ---- interleaved A/B: generation only (cands.count) ----------
        gen = {"r10_string": [], "r11_long": []}
        for label, fn in (
            ("r10_string", band_keys_r10_string),
            ("r11_long", band_keys_r11_long),
        ) * 2:
            dsh, cands, _ = lsh_pairs_with(docs, fn, wide=wide)
            dsh.count()  # pre-warm the shingle cache out of the timing
            t0 = time.perf_counter()
            cands.count()
            gen[label].append(round(time.perf_counter() - t0, 3))
            drain(spark, dsh)
        out[f"{shape}_ab_generation"] = gen

    out["sentinel_post"] = sentinel(spark)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
