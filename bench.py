#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Times include full result materialization (collect), which is how the
reference's criterion benches measure GetSimN round-trips."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# Headline set: the vector-store hot path, the scalable dedup pipeline,
# text analysis scans, the write path, and the windowed rollup.
BENCH_QUERIES = [
    "get_sim_n_cosine",
    "get_sim_n_euclidean",
    "get_sim_n_dot",
    "get_sim_n_cosine_filtered",
    "get_sim_n_batch",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "ann_pruned_lsh_topk",
    "ann_pruned_ivf_topk",
    "ann_pruned_batch_topk",
    "ann_pruned_batch_ivf_topk",
    "ann_after_mutations",
    "store_sql_door",
    "get_key",
    "get_pred_equals",
    "get_pred_nested",
    "del_pred",
    "store_lifecycle_counts",
    "store_incremental_mutations",
    "store_time_travel",
    "ai_convert_embeddings",
    "ai_get_sim_n",
    "doc_token_count",
    "doc_bpe_token_count",
    "doc_quality",
    "doc_lang_id",
    "lang_id_confusion",
    "doc_fingerprint",
    "doc_rolling_hash",
    "dedup_exact",
    "dedup_wordset",
    "minhash_lsh_pairs",
    "dedup_clusters",
    "ngram_jaccard_pairs",
    "simhash_fingerprints",
    "embedding_near_dup",
    "simhash_near_dup",
    "topk_per_label",
    "vocab_top_terms",
    "tfidf_top_terms",
    "bm25_search",
    "collocations_pmi",
    "hybrid_search_rrf",
    "quality_filter_c4",
    "pii_scrub",
    "asof_purchase_last_view",
    "embedding_kmeans",
    "semantic_dedup",
    "embedding_project",
    "ann_project_topk",
    "ann_pq_topk",
    "ann_ivfpq_residual_topk",
    "corpus_mixture",
    "sample_stratified",
    "train_test_split",
    "quality_decile_mix",
    "sample_weighted_quality",
    "events_gap_fill",
    "pack_sequences",
    "decontaminate_ngrams",
    "chunk_dedup",
    "doc_sliding_chunks",
    "events_purchase_view_window",
    "embedding_quantize_int8",
    "doc_length_percentiles",
    "corpus_export_roundtrip",
    "doc_repetition",
    "doc_unigram_logprob",
    "events_json_props",
    "events_funnel",
    "events_outliers",
    "sample_per_group_topn",
    "events_hourly_rollup",
    "events_sessionization",
    "streaming_hourly_rollup",
    "streaming_sessionization",
    "streaming_interval_join",
    "lineitem_pricing_rollup",
    "orders_top_customers",
    "regional_revenue",
    "multimodal_image_meta",
    "multimodal_audio_meta",
    "ai_embed_binary",
    "ai_face_attributes",
    # round 4 additions with a real data-plan cost profile. The other
    # new gates (ddl_lifecycle_counts, ai_upsert, streaming_*) are
    # job-count/trigger-latency bound — flat in data — and stay
    # correctness-only so the bench keeps measuring plans, not latency.
    "store_change_feed",
    "mmr_rerank_topk",
    "salted_join_orders_customers",
    "shipping_priority_topn",
    "promo_revenue_share",
    "returned_item_customers",
    "heavy_hitters_terms",
    "dedup_keep_best",
    "corpus_rebalance",
    "order_priority_exists",
    "dormant_rich_customers",
    "small_quantity_revenue",
    # round 4, later session: the partsupp-free TPC-H completion + cube
    "forecast_revenue_change",
    "volume_shipping",
    "nation_market_share",
    "late_shipment_priority",
    "customer_order_distribution",
    "top_supplier_revenue",
    "large_volume_customers",
    "sole_return_supplier",
    "events_rollup_cube",
    "ann_recall_eval",
    "graph_pagerank",
    "ann_ivfpq_residual_batch_topk",
    "dup_span_detect",
    "dup_span_strip",
    "dedup_incremental",
    "distinct_kmv",
    "decontaminate_semantic",
    "orders_price_bands",
    "knn_graph_lsh",
    "events_rolling_window",
    "label_centroids",
    "graph_label_propagation",
    "streaming_incremental_dedup",
    "quantile_histogram_events",
    "split_leakage_safe",
    "streaming_kmv_distinct",
    "graph_triangles",
    "quality_filter_per_lang",
    "cms_term_freq",
    "vocab_growth_curve",
    "doc_bigram_logprob",
    "phrase_search_postings",
    "event_transitions",
    "cohort_retention",
    "embedding_drift",
    "cms_join_size_estimate",
    "profile_events",
    "streaming_histogram",
    "skew_salt_advisor",
    "early_arriving_facts",
    "graph_personalized_pagerank",
    "robust_outliers_events",
    "orders_equi_depth_bands",
    "classifier_log_odds",
    "dsir_select_docs",
    "graph_kcore_peel",
    "distinct_hll",
    "kmv_overlap_sources",
    "streaming_hll_distinct",
    # round 5 additions
    "bloom_membership",
    "fuzzy_link_blocked",
    "streaming_heavy_hitters",
    "graph_link_prediction",
    # round 6 additions
    "fuzzy_link_dropped_blocks",
    "ann_drift_retrain",
    "contrastive_hard_negatives",
    "matryoshka_recall_eval",
    "tokenizer_fertility_by_lang",
    "knn_label_confusion_eval",
    "ann_batch_filtered_topk",
    "streaming_cms_counts",
    "streaming_embedding_drift",
    # round 7 additions
    "bpe_train_merges",
    "bpe_segment_fertility",
    "pipeline_dedup_quality_pack",
    "del_pred_audit",
    "pipeline_cluster_dedup_pack",
    "incremental_agg_refresh",
    "incremental_extrema_refresh",
    "streaming_materialized_view",
    # round 8 additions
    "streaming_materialized_view_keyed",
    "incremental_distinct_refresh",
    "incremental_join_refresh",
    "incremental_quantile_refresh",
    "streaming_materialized_join",
    "managed_view_lifecycle",
    "managed_view_quantile",
    "winnowing_overlap",
    "corpus_epoch_mix",
    "winnowing_incremental",
]


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("ahnlich_spark_bench")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()

    # Criterion-style warmup AT THE TARGET SF: run every benched query
    # once so timed runs measure steady-state execution — JIT-compiled
    # whole-stage codegen, warmed classloaders and shuffle services —
    # not first-run compilation (up to 4x noise on the join-heavy dedup
    # queries). Nothing is persisted/cached between runs: every timed
    # query recomputes its full lineage from parquet.
    entry_mod.entry(spark).collect()
    warm_dir = os.environ.get("SPARK_GRAFT_WARMUP_DIR", SF_DIR)
    if os.path.isdir(warm_dir):
        for name in BENCH_QUERIES:
            try:
                qs[name](spark, warm_dir).collect()
            except Exception:
                pass  # warmup is best-effort; the timed run will surface errors

    # best-of-N timed passes (criterion reports minima): the numbers
    # measure the PLAN, not transient host jitter — single-pass runs on
    # this box swing up to 20x on identical code (JIT/GC/CPU-steal;
    # measured: the same query 0.75s and 8.8s in back-to-back suite
    # passes). Three passes damp multi-second steal events that two
    # don't.
    passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3"))
    timings = {}
    for _ in range(passes):
        for name in BENCH_QUERIES:
            fn = qs[name]
            t0 = time.perf_counter()
            rows = fn(spark, SF_DIR).collect()
            elapsed = round(time.perf_counter() - t0, 3)
            if name not in timings or elapsed < timings[name]:
                timings[name] = elapsed
            del rows

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # Full per-query detail goes to a repo file (the queries map for
    # 130+ entries is ~4 KB — larger than the 2000-char stdout tail the
    # round driver records, which is why BENCH_r02..r04 show
    # parsed: null). The printed line stays a complete JSON object
    # under ~1900 chars: total + slowest-first queries until budget.
    detail = {
        "metric": "wall seconds, headline operator suite (collect-inclusive)",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "n_queries": len(timings),
    }
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as fh:
        json.dump(detail, fh, indent=1, sort_keys=True)
    out = {
        "metric": detail["metric"],
        "value": detail["value"],
        "unit": "sec",
        "sf": sf_val,
        "n_queries": len(timings),
        "detail": "BENCH_DETAIL.json",
        "queries": {},
        "queries_omitted": 0,
    }
    budget = 1900 - len(json.dumps(out))
    for name, sec in sorted(timings.items(), key=lambda kv: -kv[1]):
        cost = len(json.dumps(name)) + len(repr(sec)) + 4
        if budget - cost < 0:
            out["queries_omitted"] += 1
            continue
        out["queries"][name] = sec
        budget -= cost
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
