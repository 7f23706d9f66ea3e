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
# ``__spark_entry__.queries()``. Rounds 1-2 both exposed the same
# definition-order window, so the 72 queries registered later never produced
# a driver-side correctness row. This list pins the window to the queries
# that still lack driver evidence (the round-2 flagship surface: dedup
# clustering, corpus pipeline, contamination scan, OLAP pack, CDC/SCD,
# funnel/retention, sketches, streaming semantics) plus the two queries whose
# semantics changed this round and the round-3 flagship additions (cluster-
# aware split, left-outer stream-stream join, portable IVF, edit-distance
# dedup, random-projection scorer). Everything else keeps definition order
# after the priority block; the local gate still checks all registered
# queries, and still-unproven names rotate into the window next round.
_DRIVER_PRIORITY: tuple[str, ...] = (
    "doc_dedup_clusters",
    "corpus_pipeline_summary",
    "benchmark_contamination",
    "doc_lsh_verified_near_dups",
    "embedding_ivf_topk",
    "doc_tfidf_topk",
    "events_asof_latest_order",
    "stream_flow_scoring",
    "etl_end_to_end",
    "multimodal_feature_extract",
    "events_orders_range_join",
    "customers_without_orders_anti",
    "lineitem_grouping_sets",
    "event_type_unpivot_roundtrip",
    "events_sliding_window",
    "user_session_windows",
    "customer_spend_quartiles",
    "user_value_moving_avg",
    "value_trend_by_type",
    "events_window_counts_gapfilled",
    "events_resample_locf",
    "events_dedup_time_window",
    "user_latest_state",
    "user_state_intervals",
    "event_funnel_counts",
    "user_retention_cohorts",
    "distinct_users_hll_rollup",
    "value_quantiles_kll_rollup",
    "corpus_near_dedup_kept",
    "new_docs_vs_corpus_near_dups",
    "documents_dedup_keep_best",
    "corpus_quality_filter",
    "doc_bpe_token_counts",
    "doc_pii_redaction",
    "cluster_aware_split_counts",
    "stream_stream_left_outer_counts",
    "doc_simhash_portable",
    "doc_repetition_signals",
    "doc_edit_distance_near_dups",
    "embedding_random_projection_mse",
    "embedding_label_centroids",
    "embedding_quantize_int8",
    "embedding_near_dups",
    "embedding_ivf_topk_portable",
    "feature_correlations",
    "stream_stateful_user_counts",
    "stream_dead_letter_counts",
    "stream_stream_join_counts",
    "stream_session_windows",
    "stream_topk_alert_types",
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
