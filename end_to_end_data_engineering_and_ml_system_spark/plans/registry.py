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
# driver evidence (298/298, zero unresolved failures across nine rounds), so
# the window is pure RECONFIRMATION, filled by two documented rules (each
# window name's reason lives in
# tests/test_registry_order.py::RECONFIRMATION_SLOTS, which the guard test
# enforces):
#   1. changed-implementation — the name's driver row predates a material
#      change to its plan (this round: the distributed-AUC LONG-partial
#      overflow guard);
#   2. evidence-freshness — with coverage complete, the window re-proves the
#      STALEST evidence first: the 17 names whose latest driver row is
#      round 2 (the tail of that tier left outside the round-9 window),
#      then the round-3 tier (bench headliners first; the 18 round-3 names
#      that don't fit are round-11's rotation candidates).
# New queries registered mid-round go at the TOP (never driver-tested, so a
# slot is never wasted on them) displacing freshness slots to keep the
# 50-name window exact.
_DRIVER_PRIORITY: tuple[str, ...] = (
    # --- changed-implementation reconfirmation (1) ---
    "quality_classifier_auc_distributed",
    # --- evidence-freshness (17): the rest of the round-2 tier ---
    "events_props_extract",
    "latest_events_topk",
    "lineitem_cube",
    "multimodal_payload_stats",
    "orders_rollup_by_year",
    "pca_reconstruction",
    "scaler_fit_stats",
    "score_stats",
    "seeded_split_counts",
    "serialized_model_scores",
    "stream_dedup_within_watermark",
    "stream_json_decode_counts",
    "stream_window_counts",
    "user_set_ops",
    "value_histogram",
    "value_percentiles_by_type",
    "zscore_features_sample",
    # --- evidence-freshness (32): round-3 tier, bench headliners first ---
    "benchmark_contamination",
    "cluster_aware_split_counts",
    "corpus_pipeline_summary",
    "doc_dedup_clusters",
    "doc_lsh_verified_near_dups",
    "etl_end_to_end",
    "events_asof_latest_order",
    "events_orders_range_join",
    "stream_flow_scoring",
    # then alphabetical through the rest of the round-3 tier
    "corpus_near_dedup_kept",
    "corpus_quality_filter",
    "customer_spend_quartiles",
    "customers_without_orders_anti",
    "distinct_users_hll_rollup",
    "doc_bpe_token_counts",
    "doc_edit_distance_near_dups",
    "doc_pii_redaction",
    "doc_repetition_signals",
    "doc_simhash_portable",
    "doc_tfidf_topk",
    "documents_dedup_keep_best",
    "embedding_ivf_topk",
    "embedding_ivf_topk_portable",
    "embedding_label_centroids",
    "embedding_near_dups",
    "embedding_quantize_int8",
    "embedding_random_projection_mse",
    "event_funnel_counts",
    "event_type_unpivot_roundtrip",
    "events_dedup_time_window",
    "events_resample_locf",
    "events_sliding_window",
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
