"""r13 operator soak: the Zipf hapax-trim A/B at a scale where the
whale window actually hurts, plus scale sanity for the new
theil_sen / gini_concentration shapes.

1. zipf A/B — corpus engineered for the r12 ADVICE defect: per
   language only ~10 repeated tokens (base < top_n keeps the c=1
   class LIVE) and millions of hapaxes, so the pre-fix plan runs ONE
   row_number window partition holding the entire hapax vocabulary of
   each language.  Arms, interleaved A/B/A/B over the same persisted
   token counts:
     A = pre-fix replica (rank = row_number + base, filter AFTER —
         no literal bound, no WindowGroupLimit), inlined here;
     B = the shipped text.zipf_fit (literal row_number <= top_n bound
         -> Partial+Final WindowGroupLimit trims per map task).
   Results must be value-identical; the delta is the whale cost.

2. theil_sen at 1000 groups x 365 periods (66.4M pair slopes total,
   ~66k per group window) — the "decade of dailies" claim measured.

3. gini_concentration on the corpus from (1) — histogram-window shape
   at millions of types per group.

Usage: SPARK_GRAFT_CPUS=32 python scripts/soak_r13_ops.py
Writes SOAK_r13_ops.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import Window
from pyspark.sql import functions as F

from staticql_spark.operators import text
from staticql_spark.session import get_spark

N_DOCS = 60_000
TOKS_PER_DOC = 100  # ~6M tokens; ~5.94M hapax types per 2-lang corpus


def build_corpus(spark):
    # doc i, lang = i % 2; token j of doc i is a unique hapax
    # "h<lang>_<i>_<j>" except every 10th, which cycles through 10
    # repeated tokens — so base (10) < top_n (200) keeps c=1 live
    ids = spark.range(0, N_DOCS).select(
        F.col("id").alias("doc_id"), (F.col("id") % 2).cast("string").alias("lang")
    )
    toks = F.transform(
        F.sequence(F.lit(0), F.lit(TOKS_PER_DOC - 1)),
        lambda j: F.when(
            j % 10 == 0,
            F.concat(F.lit("common"), (j % 100).cast("string")),
        ).otherwise(
            F.concat_ws(
                "_", F.lit("h"), F.col("lang"), F.col("doc_id").cast("string"),
                j.cast("string"),
            )
        ),
    )
    return ids.select(
        "doc_id", "lang", F.array_join(toks, " ").alias("text")
    )


def zipf_prefix_replica(df, top_n=200):
    # the PRE-r13 plan, verbatim minus the literal __rn bound: the
    # count-class window runs over every row of each surviving class
    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    tf = (
        df.select(F.col("lang").alias("grp"),
                  F.explode(text.tokens(norm)).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("grp", "tok")
        .agg(F.count("*").cast("long").alias("c"))
    )
    hist = tf.groupBy("grp", "c").agg(F.count("*").cast("long").alias("n_c"))
    wbase = (
        Window.partitionBy("grp").orderBy(F.desc("c"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    base = hist.withColumn("base", F.coalesce(F.sum("n_c").over(wbase), F.lit(0)))
    live = base.filter(F.col("base") < top_n).select("grp", "c", "base")
    wtie = Window.partitionBy("grp", "c").orderBy(F.asc("tok"))
    ranked = (
        tf.join(F.broadcast(live), ["grp", "c"])
        .withColumn("rank", F.row_number().over(wtie) + F.col("base"))
        .filter(F.col("rank") <= top_n)
    )
    d9 = lambda col: F.round(col, 9).cast("decimal(38,9)")
    x = F.log(F.col("rank").cast("double"))
    y = F.log(F.col("c").cast("double"))
    agg = ranked.groupBy("grp").agg(
        F.count("*").cast("long").alias("n_ranks"),
        F.sum(d9(x)).cast("double").alias("sx"),
        F.sum(d9(y)).cast("double").alias("sy"),
        F.sum(d9(x * y)).cast("double").alias("sxy"),
        F.sum(d9(x * x)).cast("double").alias("sxx"),
        F.sum(d9(y * y)).cast("double").alias("syy"),
    )
    n = F.col("n_ranks").cast("double")
    cov_n = n * F.col("sxy") - F.col("sx") * F.col("sy")
    varx_n = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vary_n = n * F.col("syy") - F.col("sy") * F.col("sy")
    slope = F.when(varx_n > 0, cov_n / varx_n).otherwise(F.lit(0.0))
    return agg.select(
        "grp", "n_ranks",
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / n, 6).alias("intercept"),
        F.round(
            F.when((varx_n > 0) & (vary_n > 0),
                   cov_n * cov_n / (varx_n * vary_n)).otherwise(F.lit(0.0)),
            6,
        ).alias("r2"),
    )


def main():
    spark = get_spark("soak-r13-ops")
    spark.sparkContext.setLogLevel("ERROR")
    docs = build_corpus(spark).persist()
    n = docs.count()
    out = {"n_docs": n, "toks_per_doc": TOKS_PER_DOC, "zipf_reps": []}

    def run_zipf(label, fn):
        t0 = time.perf_counter()
        rows = sorted(tuple(r) for r in fn(docs).collect())
        dt = round(time.perf_counter() - t0, 2)
        out["zipf_reps"].append({"label": label, "sec": dt})
        print(label, dt, "s", flush=True)
        return rows

    got_a = got_b = None
    for _ in range(2):
        got_a = run_zipf("prefix_replica_whale", zipf_prefix_replica)
        got_b = run_zipf("r13_windowgrouplimit", lambda d: text.zipf_fit(d))
    out["zipf_identical"] = got_a == got_b

    # theil_sen: 1000 groups x 365 periods
    series = spark.range(0, 1000 * 365).select(
        (F.col("id") % 1000).cast("string").alias("grp"),
        (F.col("id") / 1000).cast("long").alias("t"),
        (
            (F.col("id") % 17).cast("double") + (F.col("id") / 1000).cast("long") * 0.5
        ).alias("v"),
    )
    from staticql_spark.operators.behavior import theil_sen

    t0 = time.perf_counter()
    ts = theil_sen(series).collect()
    out["theil_sen_1000x365_sec"] = round(time.perf_counter() - t0, 2)
    out["theil_sen_groups"] = len(ts)
    print("theil_sen", out["theil_sen_1000x365_sec"], "s", flush=True)

    t0 = time.perf_counter()
    g = text.gini_concentration(docs).collect()
    out["gini_sec"] = round(time.perf_counter() - t0, 2)
    out["gini_rows"] = sorted((r["grp"], r["vocab"], r["n_tokens"]) for r in g)
    print("gini", out["gini_sec"], "s", flush=True)

    with open(os.path.join(ROOT, "SOAK_r13_ops.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
