"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Execution is forced with the noop sink (full computation, no driver
materialization) so timings measure the engine, not result transfer.

Artifact format (r6): the external driver records only a 2000-char tail of
stdout, which is why the r4/r5 BENCH artifacts parsed as null once the set
grew past ~40 queries.  So:
  - stdout gets ONE compact line (< ~1900 chars): full-set totals, the
    stable CORE per-query map (cross-round comparable), and a per-run
    spread health summary (max/median rep-spread ratio + the worst
    offenders as [min, med, max] triples — the r3-contamination lesson:
    a healthy run has per-query spread within ~±15%, a contaminated one
    shows uniform 2-4x spread everywhere);
  - the FULL per-query detail (exec min + all reps + construct) is
    written to BENCH_FULL.json next to this script and committed with
    the round, so every number in SCALE.md stays reproducible.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry
from staticql_spark.session import get_spark

# HEADLINE covers 185 of the 255 registered queries (r11).  The 70 excluded
# keys are the long-stable set benched to convergence in earlier rounds
# (r1-r4): the TPC-H group-C shapes and small staticql-parity lookups
# (where_eq/point_lookup/...), simple set/pivot/window variants, and a
# few trained-index twins whose cost is the train step already timed via
# their headline sibling (ann_ivf_trained ~ ann_ivf_pq).  Their per-round
# numbers stopped moving (BENCH_r1-r4 deltas within host noise) — keeping
# them out holds the per-round wall-clock near the driver's budget while
# every operator family keeps at least one headline representative.
HEADLINE = [
    "where_and",
    "has_one_join",
    "has_many_agg",
    "belongs_to_join",
    "through_count",
    "cursor_after",
    "pricing_summary",
    "ship_priority",
    "market_share",
    "waiting_supplier",
    "customer_order_distribution",
    "topk_per_group",
    "region_revenue",
    "agg_distinct",
    "window_running",
    "events_windowed",
    "events_sessionize",
    "asof_click_purchase",
    "range_followups",
    "kmv_distinct",
    "doc_quality",
    "doc_lang",
    "doc_pii",
    "doc_decontaminate",
    "doc_selfdedup",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_cosine_topk",
    "ann_ivf",
    "stream_first_seen",
    # new in r4
    "asof_hotkey_bucketed",
    "dedup_incremental",
    "doc_rebalance",
    "doc_pack",
    # added to the headline set in r5 (per the r4 verdict): the remaining
    # composed/new queries.  NOTE for cross-round comparison: the headline
    # set grew 35 -> 41 here, so compare per-query times (or the r4 subset
    # sum), not raw totals.  pipeline_clean_corpus is the end-to-end
    # composition of stages also benched individually above.
    "pipeline_clean_corpus",
    "doc_split_leakfree",
    "events_funnel",
    "bpe_pair_counts",
    "doc_unigram_nll",
    "doc_curriculum",
    # new operators in r5 (set is now 46; compare per-query across rounds)
    "events_pagerank",
    "doc_weighted_sample",
    "doc_token_entropy",
    "kmv_union",
    "events_sequences",
    "fuzzy_match",
    "table_profile",
    "zorder_layout",
    "price_histogram",
    "skew_report",
    "doc_training_manifest",
    "ann_recall",
    "ann_hybrid_rrf",
    "events_next_prediction",
    "scd2_history",
    "corpus_diff",
    "corr_matrix",
    # added mid-r5 with their operators (set is now 53)
    "bpe_train",
    "bpe_encode",
    "doc_logreg",
    "dedup_lsh_recall",
    "doc_decontaminate_bloom",
    "dedup_semantic",
    "dedup_semantic_keep",
    "events_anomaly",
    "customer_rfm",
    "events_markov",
    # added late-r5 with their operators (set is now 61)
    "events_retention",
    "dedup_cluster_stats",
    "embedding_top_pc",
    "langid_confusion",
    "quality_quantile_norm",
    "events_decayed",
    "doc_gopher",
    "dedup_semantic_incr",
    "doc_dup_spans",
    "doc_dup_excise",
    "doc_dup_spans_anchored",
    # added in the second half of r5 (set is now 85)
    "doc_source_cap",
    "doc_dsir",
    "ann_knn_classify",
    "doc_mixture_epochs",
    "events_attribution",
    "pipeline_curate_mixture",
    # new in r6 (set is now 97)
    "stream_kmv",
    "kmv_grouped",
    "dedup_canonical_meta",
    "dedup_containment",
    "doc_term_pmi",
    "doc_bigram_nll",
    "events_cooccurrence",
    "ann_hard_negatives",
    "ann_cell_balance",
    "embedding_class_sep",
    "doc_length_budget",
    "doc_vocab_coverage",
    # late-r6 operators (set is now 128)
    "ann_pq_adc",
    "ann_ivf_pq",
    "stream_pq_neardup",
    "embedding_prototypes",
    "doc_training_order",
    "doc_temperature_mix",
    "events_kanon",
    "embedding_drift",
    "ann_label_noise",
    "multimodal_ahash",
    "exact_percentiles",
    "multimodal_audio_hash",
    "fd_discovery",
    "ri_report",
    "dedup_chunk_incremental",
    "kmv_join_estimate",
    "events_bot_score",
    "doc_vocab_drift",
    "pipeline_media_manifest",
    "dedup_triangles",
    "events_ppr",
    "ann_pq_recall",
    "supplier_pareto",
    "doc_ccnet_buckets",
    "ann_ivfpq_recall",
    # new in r8: partition-pruned probe of the persisted IVFADC index
    "ann_ivfpq_persisted",
    "events_cohort_ltv",
    "grouped_percentiles",
    "robust_outliers",
    "doc_chunk_dedup",
    "doc_shuffle_shards",
    "bpe_fertility",
    "kmeans_inertia",
    "doc_ngram_coverage",
    "shard_checksums",
    "events_dau_wau",
    "events_time_to_convert",
    "checksum_delta",
    "doc_dedup_funnel",
    "events_lpa",
    "stream_shard_ck",
    "dedup_minhash_1bit",
    "orders_backlog",
    "ann_rnn_pairs",
    "quality_gate_report",
    "events_forecast_baseline",
    "events_lpa_incr",
    "doc_decontaminate_excise",
    "pipeline_release_manifest",
    "hll_distinct",
    "hll_union",
    "events_seasonality",
    "events_ldiversity",
    "doc_vocab_growth",
    "source_ablation",
    # new in r7
    "events_retention_curve",
    "events_funnel_steps",
    "profile_psi",
    "ann_semantic_decon",
    "hll_grouped_ndv",
    "events_attribution_lasttouch",
    "stream_transitions",
    "embedding_debias",
    "profile_psi_by_lang",
    "stream_funnel",
    "events_session_paths",
    "doc_calibration",
    "ann_pq_quant_error",
    "doc_contamination_by_source",
    "stream_psi",
    "events_funnel_windowed",
    # new in r9
    "embedding_mrl_recall",
    "events_ab_cuped",
    "events_bt_ratings",
    "events_win_matrix",
    "events_rater_agreement",
    "events_tcloseness",
    "events_quantile_sketch",
    "stream_qsketch",
    "events_bt_reliability",
    "events_rater_consensus",
    # new in r10
    "events_bt_ties",
    "events_rater_bias",
    "events_arena_sliding",
    # new in r11
    "events_krippendorff",
    "ann_rbo",
    "doc_auc",
    "stream_arena",
    # new in r12
    "ann_mrr",
    "events_mann_kendall",
    "doc_zipf",
    "stream_consensus",
    "ann_ndcg",
    "events_cusum",
    "events_benford",
    "doc_simpson",
    # new in r13
    "stream_rater_severity",
    "doc_gini",
    "ann_kendall_tau",
    "events_theil_sen",
    "events_rater_confusion",
]

# BENCH_EXEMPT: the ONLY registry keys allowed to be absent from HEADLINE —
# the long-stable set benched to convergence in r1-r4 (rationale in the
# HEADLINE comment above: TPC-H group-C shapes, small staticql-parity
# lookups, simple set/pivot/window variants, trained-index twins whose
# cost is already timed via a headline sibling).  This list is EXPLICIT so
# tests/test_bench_contract.py can enforce that a newly registered query
# can never silently fall into the un-benched gap: every queries() key
# must be in HEADLINE or placed here deliberately (with the r-note below).
BENCH_EXEMPT = [
    # r1-r4 convergence set (70 keys, frozen r8)
    "ann_ivf_trained", "ann_lsh", "ann_quantized", "anti_join",
    "brand_supplier_count", "cheapest_supplier", "cm_heavy_hitters",
    "conditional_pivot", "corpus_report", "cube_rollup", "cursor_before",
    "dedup_components", "dedup_jaccard_hist", "dedup_keep",
    "dedup_minhash_sig", "dedup_ngram_jaccard", "disjunctive_filter_revenue",
    "doc_bm25", "doc_fingerprint", "doc_normalize", "doc_quality_filter",
    "doc_repetition", "doc_split", "doc_term_df", "doc_tokens", "doc_winnow",
    "dominant_supplier", "embedding_neardup", "embedding_quantize",
    "events_lag_gap", "events_props_json", "events_range_window",
    "events_sliding", "events_trending", "exists_subquery",
    "forecast_revenue", "full_outer_activity", "grouping_sets_agg",
    "has_many_collect", "idle_customer_balance", "important_part_value",
    "large_volume_customer", "late_shipment_priority", "latest_per_user",
    "multimodal_features", "nation_profit", "nation_volume_shipping",
    "order_page1", "order_priority_check", "order_value_percentiles",
    "pivot_priority", "point_lookup", "projection_prune", "promo_revenue",
    "returned_item_revenue", "rollup_agg", "salted_hot_key_agg",
    "scalar_subquery", "set_except", "set_intersect", "simhash_pairs",
    "small_qty_avg_yearly", "stratified_sample", "through_rows",
    "top_supplier", "union_distinct", "unpivot_metrics", "where_eq",
    "where_in", "where_startswith",
]

# CORE: the stable subset whose per-query numbers ride in the compact
# stdout line every round (cross-round comparable since r1-r3) plus the
# perf-watch queries named by round verdicts.  The FULL set's numbers are
# in BENCH_FULL.json.
CORE = HEADLINE[:35] + [
    "doc_training_manifest",
    "dedup_semantic_keep",
    "dedup_semantic",
    "doc_split_leakfree",
    "pipeline_clean_corpus",
    "pipeline_curate_mixture",
    "dedup_cluster_stats",
    "events_pagerank",
    "bpe_train",
    "doc_logreg",
    # new in r9
    "embedding_mrl_recall",
    "events_ab_cuped",
    "events_bt_ratings",
    "events_rater_agreement",
    "events_tcloseness",
]


def _sentinel(spark):
    """Fixed-work drift sentinel (r9 verdict #5): a constant-size synthetic
    aggregate — 64M generated rows hashed onto 9973 keys, one map-side-
    combined shuffle — with ZERO dependence on sf or any parquet input.
    Its time moves only with host conditions (CPU contention, page cache,
    JVM state), so cross-round per-query comparisons should normalize by
    the sentinel ratio instead of inferring drift from trivial-key
    medians (the r5->r6 and r8->r9 drift episodes, SCALE.md)."""
    from pyspark.sql import functions as F

    return (
        spark.range(0, 64_000_000, 1, 32)
        .select(
            (F.col("id") % 9973).alias("k"),
            F.xxhash64(F.col("id")).alias("v"),
        )
        .groupBy("k")
        .agg(F.count("*").alias("n"), F.sum(F.col("v") % 1000).alias("s"))
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # sentinel first (before any parquet warmup touches the page cache):
    # best-of-3 like every query; rep 1 eats codegen compile as usual
    sruns = []
    for _ in range(3):
        t0 = time.perf_counter()
        _sentinel(spark).write.format("noop").mode("overwrite").save()
        sruns.append(round(time.perf_counter() - t0, 3))
    sentinel_sec = min(sruns)

    queries = entry.queries()
    # JVM/codegen/scan warmup: touch every table once so timings measure
    # engine throughput, not first-use class loading + footer reads
    import glob

    for p in sorted(glob.glob(f"{sf_dir}/*.parquet")):
        spark.read.parquet(p).count()

    # r8: build the shared persisted artifacts (k-means fit, LSH /
    # SemDeDup pairs, contaminated spans, PQ indexes) UP FRONT and time
    # each build explicitly — these are one-off index-build jobs whose
    # consumers are benched at probe cost; timing them here keeps the
    # build cost a visible, attributable number instead of letting it
    # land in some first consumer's construct and vanish in min-of-reps.
    artifact_build = (
        entry.build_artifacts(spark, sf_dir)
        if hasattr(entry, "build_artifacts")
        else {}
    )
    artifact_build_total = round(sum(artifact_build.values()), 3)

    # r14 (r13 verdict #1/#2, measurement-bug fix, declared in
    # OPTIMIZATION_r14.md): the operators' bounded persist registry used
    # to survive across the 3 timed reps AND across sibling keys in this
    # process, so min-of-3 reported a number that excluded a key's own
    # pinned-frame computation (ann_rnn_pairs reps read [2.5, 0.16, 0.16])
    # and some keys started warm off a sibling's persists (ann_ndcg via
    # ann_mrr).  The registry is an optimization WITHIN one query
    # evaluation (multi-consumed frames computed once per action), so the
    # honest per-rep time releases it first: every rep is self-contained,
    # min-of-3 is steady-state cold (rep 1 still eats one-time codegen
    # compile), and "cold_sec" (rep-1) is recorded per key alongside the
    # min.  Old-methodology numbers stay committed in BENCH_r13/
    # BENCH_FULL artifacts for comparison.
    from staticql_spark.operators import release_persists

    timings: dict[str, float] = {}
    reps: dict[str, list[float]] = {}
    construct: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name in HEADLINE:
        # best of 3: run 1 includes one-time whole-stage-codegen class
        # compilation (measured 3-4x the steady-state on expression-heavy
        # queries), and this host shows ±25% background drift between
        # identical runs — a third rep keeps the minimum near sustained
        # engine throughput.  All reps are recorded in the artifact so
        # host contention is visible in the numbers themselves: a healthy
        # run has rep spread within ~±15%; a contaminated run (like the
        # r3 driver artifact) shows uniform 2-4x spread on every query.
        # Two timed phases per rep, both recorded:
        # - construct: building the DataFrame.  Mostly driver-side Catalyst
        #   analysis (fixed cost, amortized at scale), but for iterative
        #   operators (pagerank, connected-components paths) it includes
        #   their eager localCheckpoint rounds — REAL distributed work that
        #   timing only the write would silently exclude.
        # - exec (the headline "queries" map, metric-compatible with prior
        #   rounds): the noop write, i.e. engine throughput.
        runs, cruns = [], []
        for _ in range(3):
            release_persists()  # every rep self-contained (note above)
            t0 = time.perf_counter()
            df = queries[name](spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            cruns.append(round(t1 - t0, 3))
            runs.append(round(time.perf_counter() - t1, 3))
        timings[name] = min(runs)
        reps[name] = runs
        construct[name] = min(cruns)
        cold[name] = runs[0]

    total = round(sum(timings.values()), 3)
    sf_num = float(sf) if sf.replace(".", "").isdigit() else sf
    construct_total = round(sum(construct.values()), 3)

    # full artifact: everything, for the repo (committed per round)
    full = {
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "reps": reps,
        "cold_sec": cold,
        "persist_policy": (
            "operator persist registry released before EVERY rep (r14; "
            "r13 verdict #1/#2): reps are self-contained, min-of-3 is "
            "steady-state cold, cold_sec is rep-1 (includes one-time "
            "codegen compile + the key's own persist builds)"
        ),
        "construct_sec": construct,
        "construct_total": construct_total,
        "artifact_build_sec": artifact_build,
        "artifact_build_total": artifact_build_total,
        "sentinel_sec": sentinel_sec,
        "sentinel_reps": sruns,
        "sentinel_note": (
            "fixed-work 64M-row synthetic agg, sf-independent; divide a "
            "round's sentinel_sec by another round's to get the host-drift "
            "factor, then judge per-query ratios against THAT"
        ),
        # keys benched at probe cost over a shared persisted artifact
        # (r8 rewires): cross-round per-key diffs must not read their
        # derive->probe switch as an engine speedup (r8 ADVICE #4)
        "artifact_consumers": [
            k
            for k in (
                entry.artifact_consumer_keys()
                if hasattr(entry, "artifact_consumer_keys")
                else []
            )
            if k in timings
        ],
        "sf": sf_num,
    }
    # r14 (r13 verdict finding #4): the fixed BENCH_FULL.json path let the
    # driver's 8-core scaling run clobber the 32-core artifact.  The
    # cpu-count-versioned file is the durable artifact (32- and 8-core
    # runs coexist); BENCH_FULL.json remains the latest-run pointer for
    # existing tooling.
    here = os.path.dirname(os.path.abspath(__file__))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    for fname in (f"BENCH_FULL_c{cpus}.json", "BENCH_FULL.json"):
        with open(os.path.join(here, fname), "w") as f:
            json.dump(full, f, indent=1, sort_keys=True)

    # spread health: per-query max/min rep ratio; worst offenders carry
    # their [min, med, max] triple so a contaminated run self-diagnoses
    # from the compact line alone
    def ratio(rs):
        lo = max(min(rs), 1e-3)
        return round(max(rs) / lo, 2)

    ratios = {q: ratio(rs) for q, rs in reps.items()}
    srt = sorted(ratios, key=lambda q: -ratios[q])
    worst = {
        q: [min(reps[q]), sorted(reps[q])[1], max(reps[q])]
        for q in srt[:3]
    }
    rvals = sorted(ratios.values())
    compact = {
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "queries": {q: timings[q] for q in CORE if q in timings},
        "sf": sf_num,
        "n_queries": len(timings),
        # r14: sum of per-key rep-1 (self-contained cold) times — the
        # attributable companion to the min-of-3 headline (verdict #1)
        "cold_total": round(sum(cold.values()), 3),
        "construct_total": construct_total,
        "artifact_build_total": artifact_build_total,
        # fixed-work drift sentinel: sf-independent 64M-row agg; normalize
        # cross-round per-query ratios by the sentinel ratio (r9 verdict #5)
        "sentinel_sec": sentinel_sec,
        "spread": {
            "max_ratio": rvals[-1],
            "median_ratio": rvals[len(rvals) // 2],
            "worst": worst,
        },
        "full": f"BENCH_FULL_c{cpus}.json",
    }
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) > 1900:  # the driver keeps a 2000-char stdout tail
        compact["queries"] = {q: timings[q] for q in CORE[:30] if q in timings}
        line = json.dumps(compact, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()
