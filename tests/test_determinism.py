"""Partitioning-determinism: a result that changes when
spark.sql.shuffle.partitions changes is not reproducible at cluster
scale. A representative sample of queries (the decimal-exact, hash-keyed,
and integer-quantized families, including every round-4 determinism fix)
must produce IDENTICAL content under different partition counts."""

from __future__ import annotations

import pytest

from end_to_end_data_engineering_and_ml_system_spark.plans.registry import all_queries

SAMPLE = [
    "pricing_summary",            # decimal-exact aggregates
    "profit_by_nation_year",      # integer-cents products (r4 fix)
    "discount_band_revenue",      # integer-cents products
    "embedding_drift_by_dim",     # IEEE-quantized float32 sums (r4 fix)
    "doc_unigram_logprob",        # decimal-exact mean over window counts
    "drift_psi_events",           # shares + ln over integer counts
    "training_shuffle_shards",    # md5 shard + per-shard order
    "doc_duplicate_ngram_windows",# hash-keyed window counts
    "orders_cdc_merge_counts",    # full-outer merge + decimal checksum
    "token_cms_estimates",        # md5-bucket sketch + TakeOrdered ties
    "corpus_manifest",            # order-independent content checksum
    "user_activity_entropy",      # decimal-exact entropy terms
    "user_feature_store_row",     # multi-family entity join
    "events_hourly_gapfill",      # spine join + LOCF window
    "value_impute_by_group",      # broadcast-stats fill + decimal checksum
    "supplier_concentration_hhi", # integer-cents sum-of-squares
    "customer_cohort_ltv_curve",  # decimal running sum
    "error_burst_detection",      # integer moving-window sums (r4 fix)
    "price_quantity_ols",         # exact-integer sufficient statistics
    "source_unigram_jsd",         # ln-domain decimal sums
    "doc_readability_scores",     # regex counts + fixed IEEE formula
    # round-5 additions
    "quality_classifier_score_deciles",  # fixed-fold sigmoid + min/max
    "quality_classifier_confusion",      # logit-threshold integer cells
    "quality_classifier_pr_curve",       # threshold sweep, integer TP/FP/FN
    "preference_pairs",           # integer-bp rank + mirror self-join
    "reward_margin_stats",        # integer margins, one final division
    "events_mad_outlier_hours",   # dyadic medians -> integer comparison
    "events_l_diversity_audit",   # count + count_distinct grain
    "events_data_contract_report",# one-pass conditional sums
    "user_rate_limit_violations", # interval RANGE frame (rule 4)
    "event_series_correlation_matrix",  # DECIMAL(38,0) stats + sqrt
    "quality_classifier_auc",     # integer rank sums -> one division
    "corpus_pipeline_v2_learned", # logit gate + fingerprint dedup
    "bpe_initial_pair_counts",    # weighted pair counts, tie-broken topk
    "events_t_closeness_audit",   # exact-integer TV numerator
    "cross_source_duplicate_matrix",  # verified pairs -> source grain
    "preference_pairs_split_counts",  # md5-range pair membership
    "value_trimmed_mean_by_type", # UDAF over exact cents
    "hourly_seasonal_naive_mase", # integer error sums over the spine
    "kmeans_init_assignment_portable",  # decimal-exact distances
    "near_dup_triangle_census",   # ordered-edge triple join
    "tx_table_time_travel_counts",  # committed-manifest reads
    "term_posting_stats",         # posting-grain reduce, tie-broken topk
    "join_cardinality_estimate_vs_actual",  # exact counts + floored est
    "order_price_equidepth_histogram",      # NTILE over exact cents
    "weighted_doc_sample",        # md5-uniform sample keys
    "part_copurchase_lift",       # basket pairs, fixed-order lift
    "quality_classifier_brier",   # quantized decimal error sum
    "signup_to_purchase_latency_quantiles",  # dyadic quartiles
    "watermark_tolerance_curve",  # running-max window + delay sweep
    "sessions_per_user_histogram",  # interval-exact session gaps
    # round-6 additions
    "embedding_semdedup_kept",    # decimal-exact cosines, md5 centroids
    "embedding_semdedup_threshold_sweep",  # re-thresholded pairwise maxima
    "tx_table_zorder_pruned_scan",  # pruning is I/O-only, results exact
    # round-7 additions
    "nation_trade_pagerank",      # 1e-12-quantized iteration sums
    "part_copurchase_pagerank_topk",  # same contract, tie-broken topk
    "bm25_topk_docs",             # scalar-stats literals + rounded scores
    "events_column_profile",      # single-scan unpivot + decimal entropy
    "doc_bigram_logprob",         # decimal-exact mean over two windows
    "hybrid_rrf_retrieval",       # integer ranks -> exact 1/(60+r) sums
    "copurchase_label_communities",  # pure integer LPA rounds
    "part_copurchase_pagerank_weighted",  # integer weight normalizers
    "related_parts_ppr",          # seeded restart, quantized iterations
    "top_phrase_docs",            # integer trigram counts, tie-broken
    "nation_trade_graph_stats",   # exact counts, single divisions
    "events_daily_quality_drift", # ppm floor + dyadic median/MAD
    "copurchase_bfs_hop_histogram",  # integer min-propagation rounds
    "gbdt_best_first_stump",      # decimal histogram + fixed-order gains
    "events_dp_noisy_counts",     # md5-uniform seeded Laplace noise
    "corpus_pipeline_v3_perplexity",  # rounded-score NTILE band + dedup
    "copurchase_community_modularity",  # integer edge counts per label
    "dense_retrieval_ndcg",       # decimal DCG terms, rounded output
    # round-8 additions — the distributed-rank machinery uses
    # spark_partition_id over a range repartition, exactly the kind of
    # construction this suite exists to pin across shuffle widths
    "embedding_matryoshka_prefix_recall",  # prefix decimal sums + topk
    "part_jaccard_copurchase_similarity",  # capped pairs, one division
    "query_expansion_prf_retrieval",  # posting-grain decimal BM25 sums
    "weighted_doc_sample_by_lang",    # partitioned E-S keys
    "token_coverage_curve",           # global_row_number over the vocab
    "quality_classifier_reliability_bins",  # quantized mean prediction
    "source_mix_kl_divergence",       # shares + rounded ln terms
    "revenue_pareto_deciles",         # global_ntile over the aggregate
    "vocab_growth_heaps",             # global_running_sum prefix offsets
    # round-9 additions
    "quality_classifier_auc_distributed",  # per-partition U partials: the
    # merge MUST be partition-count-invariant (exact integer associativity)
]


def _content(df):
    rows = df.collect()
    return sorted(tuple(r) for r in rows)


@pytest.mark.parametrize("name", SAMPLE)
def test_result_identical_across_partitionings(spark, sf_dir, name):
    q = all_queries()[name]
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        a = _content(q.build(spark, sf_dir))
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = _content(q.build(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b, f"{name}: result depends on partition count"
    assert a, f"{name}: empty result proves nothing"
