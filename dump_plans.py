"""Regenerate PLANS.md: formatted physical plans of representative queries.

Usage: python dump_plans.py   (writes PLANS.md at the repo root)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry
from staticql_spark.session import get_spark

PICKS = [
    ("entry (flagship: region revenue, 3 broadcast dims + 1 shuffle agg)", None),
    ("where_eq (P1: filter pushdown to parquet scan)", "where_eq"),
    ("projection_prune (P9: covering-column scan)", "projection_prune"),
    ("cursor_after (O3: keyset page = predicate + TakeOrdered limit)", "cursor_after"),
    ("pricing_summary (TPC-H Q1: partial+final hash agg)", "pricing_summary"),
    ("ship_priority (TPC-H Q3: selective joins, broadcast dim)", "ship_priority"),
    ("ann_ivf (IVF ANN: broadcast argmax + equi join on cell)", "ann_ivf"),
    ("market_share (TPC-H Q8: 7-way join, every dim broadcast)", "market_share"),
    ("waiting_supplier (TPC-H Q21: semi + anti join co-keyed on orderkey)", "waiting_supplier"),
    ("dedup_minhash_lsh (map-only signatures; first exchange = band join)", "dedup_minhash_lsh"),
    ("doc_decontaminate (broadcast bench grams; corpus never shuffles)", "doc_decontaminate"),
    ("asof_click_purchase (as-of join: union + window, no join operator)", "asof_click_purchase"),
    ("range_followups (interval join: bucketed equi join, bounded explode)", "range_followups"),
    ("kmv_distinct (KMV sketch: distinct hash shuffle + TakeOrdered bottom-k)", "kmv_distinct"),
    ("doc_selfdedup (gram->owner shuffle, uniform md5 keys)", "doc_selfdedup"),
    ("doc_bm25 (map-only tf, broadcast stats, TakeOrdered ranking)", "doc_bm25"),
    ("ann_quantized (int8-code cosine: exact integer dot/norm kernel)", "ann_quantized"),
    ("doc_quality_filter (per-lang median broadcast back against scored corpus)", "doc_quality_filter"),
    ("asof_hotkey_bucketed (bucketed as-of: per-(key,bucket) window + carry fix-up)", "asof_hotkey_bucketed"),
    ("dedup_incremental (new batch vs persisted index: old corpus text never pairs old x old)", "dedup_incremental"),
    ("doc_rebalance (tiny stratum-count agg broadcast back; corpus = one filter pass)", "doc_rebalance"),
    ("doc_unigram_nll (corpus LM: broadcast capped vocab, one groupBy(doc) partial agg)", "doc_unigram_nll"),
    ("doc_pack (two-phase prefix sum: per-bucket windows + |buckets|-row base offsets)", "doc_pack"),
    ("bpe_train (vocab-collapse shuffle; per-round pair agg + 1-row argmax broadcast)", "bpe_train"),
    ("doc_logreg (per-iteration k-double gradient agg + broadcast weight row)", "doc_logreg"),
    ("doc_decontaminate_bloom (fixed-size bitmap word-table broadcast probes)", "doc_decontaminate_bloom"),
    ("dedup_semantic (r8: persisted pairs artifact — the scan IS the query)", "dedup_semantic"),
    ("customer_rfm (exact quartile thresholds broadcast back; no global ntile)", "customer_rfm"),
    ("doc_dup_spans (gram-hash window dup test + per-doc island merge; 2 exchanges)", "doc_dup_spans"),
    ("doc_dup_excise (span cut via higher-order aggregate; groupBy+join co-keyed on doc)", "doc_dup_excise"),
    ("doc_dsir (two |bucket|-row LM aggs -> broadcast log-ratio table; one groupBy(doc))", "doc_dsir"),
    ("ann_knn_classify (exact top-k + broadcast pair table; corpus never shuffles)", "ann_knn_classify"),
    ("events_attribution (bucketed range join + per-purchase window + per-click agg)", "events_attribution"),
    ("ann_pq_adc (r8: persisted-index probe — codes scan + broadcast dtable + map-side sum)", "ann_pq_adc"),
    ("stream_pq_neardup (r8: in-row encode vs persisted key index, batch twin)", "stream_pq_neardup"),
    ("ann_ivfpq_persisted (r8: partition-pruned IVFADC probe of the persisted index)", "ann_ivfpq_persisted"),
    ("dedup_keep (r8: anti join against the persisted CC artifact)", "dedup_keep"),
    ("ann_ivf_pq (IVFADC: coarse-cell pruning joins ahead of the ADC sum)", "ann_ivf_pq"),
    ("doc_chunk_dedup (chunk DF count on md5 keys; text crosses one doc-keyed join)", "doc_chunk_dedup"),
    ("doc_shuffle_shards (two-phase bucketed rank + broadcast base offsets)", "doc_shuffle_shards"),
    ("doc_training_order (mixture plan broadcast + bounded explode + two-phase rank)", "doc_training_order"),
    ("embedding_drift (two broadcast-argmax assigns; |cells|-row full outer)", "embedding_drift"),
    ("exact_percentiles (two-phase counting; hash exchange on bkt, no global sort)", "exact_percentiles"),
    ("dedup_triangles (degree-oriented wedge join over LSH pairs)", "dedup_triangles"),
    ("doc_ccnet_buckets (two-phase per-lang rank; broadcast offsets)", "doc_ccnet_buckets"),
    ("shard_checksums (one map-side-combined agg; single 16-row exchange)", "shard_checksums"),
    ("checksum_delta (two checksum aggs + |shards|-row full outer)", "checksum_delta"),
    ("doc_ngram_coverage (bench grams broadcast; exchange carries <=|bench| rows)", "doc_ngram_coverage"),
    ("kmeans_inertia (broadcast-argmax assign + |cells|-row DECIMAL agg)", "kmeans_inertia"),
    ("events_dau_wau (7x explode ABOVE the distinct user-day aggregate)", "events_dau_wau"),
    ("orders_backlog (sweep line: day-aggregate window, no interval explode)", "orders_backlog"),
    ("dedup_minhash_1bit (pinned shuffle-hash sig probes; no unbounded broadcast)", "dedup_minhash_1bit"),
    ("quality_gate_report (map-only rule metrics -> |strata|-row agg, join-free r7)", "quality_gate_report"),
    # r7 operators
    ("events_retention_curve (join-free: distinct user-day -> window cohort MIN)", "events_retention_curve"),
    ("events_attribution_lasttouch (as-of union+window; no join operator)", "events_attribution_lasttouch"),
    ("profile_psi (two map-side bucket counts + 1-row broadcast total)", "profile_psi"),
    ("hll_grouped_ndv (register build WITHOUT hash-stream distinct)", "hll_grouped_ndv"),
    ("embedding_debias (decimal mean + decimal-Gram pc, broadcast back)", "embedding_debias"),
    ("events_session_paths (one user-key window pass -> session agg -> top-k)", "events_session_paths"),
    # r9 operators
    ("embedding_mrl_recall (per-dim broadcast brute passes; per-query top-k windows)", "embedding_mrl_recall"),
    ("events_ab_cuped (one user-keyed shuffle -> 2-row variant agg -> 1-row arithmetic)", "events_ab_cuped"),
    ("events_bt_ratings (one pair-count shuffle; MM iterations broadcast the rating vector)", "events_bt_ratings"),
    ("events_rater_agreement (one (item,cat) count shuffle; two scalar folds cross-joined)", "events_rater_agreement"),
    ("events_tcloseness (broadcast global dist into |cells| x m grid; bounded cum window)", "events_tcloseness"),
    ("events_quantile_sketch (TakeOrdered bottom-k heaps; quantile reads on <= k rows)", "events_quantile_sketch"),
    ("events_bt_reliability (pair counts + broadcast ratings; |pairs|-row bucket agg)", "events_bt_reliability"),
    ("events_rater_consensus (item-mode window bounded by |cats|; one item join + rater agg)", "events_rater_consensus"),
    ("events_bt_ties (Rao-Kupper BT: one pair-count shuffle; p and theta broadcast per MM iteration)", "events_bt_ties"),
    ("events_rater_bias (one item sum/count shuffle; item-keyed join back; rater agg)", "events_rater_bias"),
    ("events_arena_sliding (bounded in-row window explode; ONE combinable (k,pair) count shuffle)", "events_arena_sliding"),
    # r11 operators
    ("events_krippendorff (one (item,cat) count shuffle; per-item + per-cat reduces; 1-row crossJoin)", "events_krippendorff"),
    ("ann_rbo (two top-5 result sets: ONE (query,item) equi join; literal weight map; per-query sum)", "ann_rbo"),
    ("doc_auc (distinct-score agg; two-phase prefix sum — bucket window + |buckets| base offsets)", "doc_auc"),
    ("stream_arena (batch fallback = arena_sliding at 3d/1d: same bounded explode + one count shuffle)", "stream_arena"),
    ("dedup_components (pairs now derived from the persisted index: parquet scans, no re-shingle)", "dedup_components"),
    # r12 operators
    ("ann_mrr (two top-5 result sets: ONE (query,item) equi join + per-query min)", "ann_mrr"),
    ("ann_ndcg (same one-join shape; graded 9dp-decimal term fold, literal ideal DCG)", "ann_ndcg"),
    ("events_mann_kendall (checkpointed daily aggregate; pair join + tie agg over the TINY series)", "events_mann_kendall"),
    ("events_cusum (prefix-sum-minus-prefix-min windows over the checkpointed daily aggregate)", "events_cusum"),
    ("doc_zipf (one token-count shuffle; two-phase top-n rank — histogram base + tie-class window)", "doc_zipf"),
    ("stream_consensus (batch fallback: one (item,cat) count shuffle + |cats|-bounded window)", "stream_consensus"),
    ("events_bt_ratings (probe of the shared bt_ratings artifact: parquet scan, MM chain in build)", "events_bt_ratings"),
    ("events_benford (integer-cents digit map; ONE (grp,digit) count shuffle + broadcast totals)", "events_benford"),
    ("doc_simpson (one (grp,token) count shuffle; exact BIGINT c(c-1) fold, |groups|-row reduce)", "doc_simpson"),
    # r13 operators
    ("stream_rater_severity (batch fallback: item-keyed reference join + rater-keyed decimal-fold agg)", "stream_rater_severity"),
    ("doc_gini (one token-count shuffle; closed-form tie-class rank sums over the count histogram)", "doc_gini"),
    ("ann_kendall_tau (overlap equi join + per-query <=C(5,2) pair self-join; exact C/D counts)", "ann_kendall_tau"),
    ("events_theil_sen (checkpointed daily aggregate; pair slopes + lower-median rank window)", "events_theil_sen"),
    ("events_rater_confusion (one (item,cat) count shuffle; |cats|-bounded modal window; item join back)", "events_rater_confusion"),
]


def main() -> None:
    sf = "/root/testdata/sf0.001"
    spark = get_spark("plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    out = [
        "# PLANS — physical plans of representative queries",
        "",
        "Generated by `python dump_plans.py` (Spark `explain('formatted')`,",
        f"sf0.001 inputs). What to look for: `PushedFilters` reaching scans,",
        "`ReadSchema` pruned to needed columns, `BroadcastHashJoin` on dims,",
        "paired partial/final `HashAggregate`, `TakeOrderedAndProject` limits.",
        "",
    ]
    for title, key in PICKS:
        df = entry.entry(spark) if key is None else qs[key](spark, sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out += [f"## {title}", "", "```", plan.rstrip(), "```", ""]
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "PLANS.md")
    # preserve the hand-written roadmap footer (next-round candidates)
    tail = ""
    if os.path.exists(path):
        old = open(path).read()
        i = old.find("<!-- ROADMAP -->")
        if i != -1:
            tail = old[i:]
    with open(path, "w") as f:
        f.write("\n".join(out) + ("\n" + tail if tail else ""))
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
