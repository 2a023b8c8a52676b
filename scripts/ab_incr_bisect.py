"""Bisect the r9 incremental_lsh_pairs regression: A=r8 form,
B1=+persist(batch shingles), B2=B1+band-key semi, B3=B2+old-shingle id
semi (the full r9 form).  Interleaved x2, noop sink."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F
from staticql_spark.operators.dedup import _pairs_within, minhash_index, verify_jaccard
from staticql_spark.session import get_spark
from scripts.soak_r5b import OUT

def pipeline(new_df, old_bands, old_shingles, persist=False, band_semi=False, sh_semi=False):
    id_col = "doc_id"
    new_bands, new_dsh = minhash_index(new_df)
    if persist:
        new_dsh = new_dsh.persist()
    ob = old_bands
    if band_semi:
        bkeys = new_bands.select("band", "key").distinct()
        ob = old_bands.join(bkeys, ["band", "key"], "left_semi")
    tagged = ob.select(id_col, "band", "key", F.lit(False).alias("is_new")
        ).unionByName(new_bands.withColumn("is_new", F.lit(True)))
    buckets = (tagged.groupBy("band", "key")
        .agg(F.array_sort(F.collect_list(F.struct(F.col(id_col), F.col("is_new")))).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= 1000) & F.exists("ids", lambda x: x["is_new"])))
    cands = (buckets.select(F.explode(_pairs_within("ids")).alias("p"))
        .filter(F.col("p.id_a.is_new") | F.col("p.id_b.is_new"))
        .filter(F.col(f"p.id_a.{id_col}") != F.col(f"p.id_b.{id_col}"))
        .select(F.col(f"p.id_a.{id_col}").alias("id_a"), F.col(f"p.id_b.{id_col}").alias("id_b"))
        .distinct())
    osh = old_shingles
    if sh_semi:
        osh = old_shingles.join(ob.select(id_col).distinct(), id_col, "left_semi")
    old_only = osh.join(new_dsh.select(id_col), id_col, "left_anti")
    dsh_all = old_only.unionByName(new_dsh)
    return verify_jaccard(cands, dsh_all, id_col).filter(F.col("jaccard") >= 0.2)

def main():
    spark = get_spark("ab_bisect")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{OUT}/documents.parquet")
    new = docs.filter(F.col("doc_id") % 5 == 0)
    import __spark_entry__ as entry
    idx = entry._lsh_index_old(spark, OUT)
    variants = {
        "A_r8":  dict(persist=False, band_semi=False, sh_semi=False),
        "B1_persist": dict(persist=True, band_semi=False, sh_semi=False),
        "B2_bandsemi": dict(persist=True, band_semi=True, sh_semi=False),
        "B3_shsemi": dict(persist=True, band_semi=True, sh_semi=True),
    }
    out = {k: [] for k in variants}
    for _ in range(2):
        for k, kw in variants.items():
            t0 = time.perf_counter()
            pipeline(new, idx.bands, idx.shingles, **kw).write.format("noop").mode("overwrite").save()
            out[k].append(round(time.perf_counter() - t0, 2))
            sys.stdout.write(f"\n{k}: {out[k][-1]}\n"); sys.stdout.flush()
    sys.stdout.write("\n" + json.dumps(out, sort_keys=True) + "\n")

if __name__ == "__main__":
    main()
