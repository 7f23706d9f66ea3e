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
# driver evidence (298/298, zero unresolved failures across ten rounds), so
# the window is pure RECONFIRMATION plus any genuinely new names, filled by
# three documented rules (each window name's reason lives in
# tests/test_registry_order.py::RECONFIRMATION_SLOTS, which the guard test
# enforces):
#   0. genuinely new — registered this round, never driver-tested (this
#      round: the two portable oracle-checked sampling siblings);
#   1. changed-implementation — the name's driver row predates a material
#      change to its plan (this round: the pq_encode argmin moved from a
#      window row_number to a map-side-combining min(struct) groupBy,
#      changing the physical plan of both PQ ANN queries);
#   2. evidence-freshness — with coverage complete, the window re-proves the
#      STALEST evidence first: the 18 names whose latest driver row is
#      round 3 (the tail of that tier left outside the round-10 window),
#      then the alphabetical head of the round-4 tier (the 20 round-4
#      names that don't fit are round-12's rotation candidates).
# New queries registered mid-round go at the TOP (never driver-tested, so a
# slot is never wasted on them) displacing freshness slots to keep the
# 50-name window exact.
_DRIVER_PRIORITY: tuple[str, ...] = (
    # --- genuinely new this round (2): portable sampling siblings ---
    "stratified_sample_counts_portable",
    "capped_sample_portable",
    # --- changed-implementation reconfirmation (2): pq_encode rewrite ---
    "embedding_pq_adc_topk",
    "embedding_ivfpq_topk",
    # --- evidence-freshness (18): the rest of the round-3 tier ---
    "events_window_counts_gapfilled",
    "feature_correlations",
    "lineitem_grouping_sets",
    "multimodal_feature_extract",
    "new_docs_vs_corpus_near_dups",
    "stream_dead_letter_counts",
    "stream_session_windows",
    "stream_stateful_user_counts",
    "stream_stream_join_counts",
    "stream_stream_left_outer_counts",
    "stream_topk_alert_types",
    "user_latest_state",
    "user_retention_cohorts",
    "user_session_windows",
    "user_state_intervals",
    "user_value_moving_avg",
    "value_quantiles_kll_rollup",
    "value_trend_by_type",
    # --- evidence-freshness (28): round-4 tier, alphabetical head ---
    "balanced_class_sample",
    "brand_bucket_revenue",
    "contrastive_negatives",
    "corpus_weighted_mix_counts",
    "corpus_yield_by_source",
    "customers_orders_full_outer",
    "doc_chunking",
    "doc_ngram_novelty",
    "doc_rare_token_stats",
    "doc_simhash_near_dups",
    "doc_token_packing",
    "embedding_lsh_signatures_portable",
    "embedding_near_dups_portable",
    "event_bigram_lift",
    "event_time_disorder_stats",
    "event_type_cooccurrence",
    "events_hourly_seasonality",
    "events_table_fingerprint",
    "events_table_profile",
    "events_zorder_keys",
    "fulfillment_latency_by_priority",
    "idle_rich_customers",
    "join_key_skew_profile",
    "multimodal_feature_histogram",
    "multimodal_frame_sample",
    "near_dup_similarity_histogram",
    "order_backlog_over_time",
    "part_supplier_diversity",
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
