"""Query registry: the engine's declared surface.

Every operator from SURVEY.md §2 lands here as a named query with

- ``build(spark, sf_dir) -> DataFrame`` — the Spark-native implementation,
- ``oracle`` — an equivalent ANSI-SQL string DuckDB can run on the same
  parquet tables (None for genuinely non-SQL-expressible ops, which get a
  weaker rows-only check),
- ``bench`` — whether bench.py times it as a headline query.

``__spark_entry__.py`` exposes this registry to the driver verbatim.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

BuildFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    build: BuildFn
    oracle: str | None = None
    bench: bool = False
    description: str = ""
    tags: tuple[str, ...] = field(default=())


_REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    bench: bool = False,
    description: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[BuildFn], BuildFn]:
    """Decorator registering a query implementation under ``name``."""

    def deco(fn: BuildFn) -> BuildFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(
            name=name,
            build=fn,
            oracle=oracle,
            bench=bench,
            description=description or (fn.__doc__ or "").strip().splitlines()[0]
            if (description or fn.__doc__)
            else "",
            tags=tuple(tags),
        )
        return fn

    return deco


# The correctness driver samples the FIRST 50 names in the dict returned by
# ``__spark_entry__.queries()``. As of round 8 every registered name carries
# driver evidence (297/297, zero unresolved failures across eight rounds), so
# from round 9 on the window is pure RECONFIRMATION, filled by two documented
# rules (each window name's reason lives in
# tests/test_registry_order.py::RECONFIRMATION_SLOTS, which the guard test
# enforces):
#   1. changed-implementation — the name's driver row predates a material
#      change to its plan (this round: the bounded_ranked_topk NULL-guard /
#      persist-tracking / k-ceiling rework touches every caller, the AUC
#      global-window retirement, the mlp id-type fix; plus the round-8-
#      changed names that fell outside the round-8 window, per NOTES);
#   2. evidence-freshness — with coverage complete, the window re-proves the
#      STALEST evidence first: these names' latest driver row is round 2,
#      the oldest tier in the ledger (49 names; bench headliners first).
# New queries registered mid-round go at the TOP (never driver-tested, so a
# slot is never wasted on them) displacing freshness slots to keep the
# 50-name window exact.
_DRIVER_PRIORITY: tuple[str, ...] = (
    # --- round-9 additions: never driver-tested ---
    "quality_classifier_auc_distributed",
    # --- changed-implementation reconfirmation (17) ---
    "quality_classifier_auc",
    "token_zipf_fit",
    "pq_init_assignment_portable",
    "kmeans_init_assignment_portable",
    "hybrid_rrf_retrieval",
    "dense_retrieval_ndcg",
    "embedding_matryoshka_prefix_recall",
    "embedding_semdedup_kept",
    "embedding_semdedup_threshold_sweep",
    "revenue_pareto_deciles",
    "customer_tier_migration",
    "order_price_equidepth_histogram",
    "corpus_pipeline_v3_perplexity",
    "vocab_growth_heaps",
    "token_coverage_curve",
    "mlp_ae_detect_loop",
    "part_copurchase_lift",
    # --- evidence-freshness reconfirmation (32): latest row is round 2 ---
    # bench headliners first
    "anomaly_score_routing",
    "doc_jaccard_near_dups",
    "doc_lsh_candidates",
    "doc_token_stats",
    "documents_dedup_exact",
    "embedding_ann_bruteforce",
    "embedding_norms",
    "events_window_counts",
    "pricing_summary",
    "revenue_by_nation",
    "token_frequency_topk",
    "top_orders_per_customer",
    # then the rest of the round-2 tier
    "anomaly_rate",
    "approx_distinct_users",
    "batched_model_inference",
    "capped_sample_count",
    "clean_null_counts",
    "customer_order_gaps",
    "customers_with_orders_semi",
    "distinct_user_stats",
    "doc_fingerprints",
    "doc_language_id",
    "doc_minhash_signatures",
    "doc_quality_scores",
    "doc_simhash",
    "embedding_cosine_topk",
    "embedding_lsh_candidates",
    "event_type_label_map",
    "event_type_pivot",
    "events_clean_pipeline",
    "events_enriched_by_customer",
    "events_json_roundtrip",
)


def all_queries() -> dict[str, Query]:
    _ensure_loaded()
    ordered = {
        name: _REGISTRY[name] for name in _DRIVER_PRIORITY if name in _REGISTRY
    }
    for name, q in _REGISTRY.items():
        if name not in ordered:
            ordered[name] = q
    return ordered


def bench_queries() -> dict[str, Query]:
    return {k: q for k, q in all_queries().items() if q.bench}


_loaded = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent)."""
    global _loaded
    if _loaded:
        return
    _loaded = True
    from . import queries  # noqa: F401  (registers on import)
    from . import queries_quality  # noqa: F401
    from . import queries_graph_retrieval  # noqa: F401
