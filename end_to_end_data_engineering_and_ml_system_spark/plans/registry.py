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
# driver evidence (zero unresolved failures across eleven rounds), so the
# window is pure RECONFIRMATION plus any genuinely new names, filled by
# three documented rules (each window name's reason lives in
# tests/test_registry_order.py::RECONFIRMATION_SLOTS, which the guard test
# enforces):
#   0. genuinely new — registered this round, never driver-tested;
#   1. changed-implementation — the name's driver row predates a material
#      change to its plan (this round: 18 names changed by the r12
#      operator reviews, plus the 13 stream_* + 5 table-format names whose
#      latest driver row predates the round-11 late-fix commits
#      b896baf..170e427; the 8 siblings from the committed plan's 29
#      already carry post-fix r11 driver rows, so re-slotting them would
#      waste slots — amendment documented in NOTES);
#   2. evidence-freshness — with coverage complete, the window re-proves
#      the STALEST evidence first: the remaining round-4-tier names (the
#      4 displaced by r12-changed slots roll to round 13).
# New queries registered mid-round go at the TOP (never driver-tested, so a
# slot is never wasted on them) displacing freshness slots to keep the
# 50-name window exact.
#
# _WINDOW_ROUND anchors "window-authoring time" for the evidence guard:
# a name counts as proven-at-authoring iff it appears in a CORRECTNESS
# artifact from a round STRICTLY BEFORE this one. This is invariant under
# any number of future artifacts landing (rounds >= _WINDOW_ROUND never
# count), which closes the r8/r9/r11 artifact-landing failure class at the
# model level instead of per-landing point fixes.
_WINDOW_ROUND: int = 12

_DRIVER_PRIORITY: tuple[str, ...] = (
    # --- genuinely new this round (1): decimal-exact ADC serving sibling ---
    "embedding_pq_adc_topk_portable",
    # --- changed-implementation (8): r12 similarity + graph-retrieval +
    # relational reviews (zero-norm cosine guard, banding width validation,
    # semdedup corpus anchor, modularity in-plan m, merge_upsert presence
    # indicators) ---
    "embedding_ann_bruteforce",
    "embedding_ivf_topk",
    "embedding_near_dups",
    "embedding_near_dups_portable",
    "embedding_semdedup_kept",
    "embedding_semdedup_threshold_sweep",
    "copurchase_community_modularity",
    "orders_cdc_merge_counts",
    # --- changed-implementation (5): r12 text-operator review (empty-text
    # ANSI guards in the quality ratios, tf-idf forced broadcast removed,
    # FFD bin-id namespace widened) ---
    "doc_quality_scores",
    "doc_tfidf_topk",
    "corpus_quality_filter",
    "corpus_pipeline_summary",
    "doc_pack_bins_ffd",
    "corpus_yield_by_source",
    # --- changed-implementation (3): r12 ml-pipeline + asof + aggregation
    # reviews (zero-variance correlation guard; NULL-time reference-row
    # drop; empty-input ratio guard) ---
    "feature_correlations",
    "events_asof_latest_order",
    "anomaly_rate",
    "multimodal_frame_sample",
    # --- changed-implementation (18): r11 late-fix commits landed after
    # these names' latest driver rows (streaming hardening + txlog review,
    # b896baf..170e427); local strict-gate green post-fix, driver re-proof
    # per the committed rotation plan ---
    "stream_contract_split_counts",
    "stream_copurchase_pagerank",
    "stream_dedup_within_watermark",
    "stream_doc_quality_deciles",
    "stream_drift_psi",
    "stream_embedding_topk",
    "stream_events_by_segment",
    "stream_flow_scoring",
    "stream_json_decode_counts",
    "stream_latest_state_merge",
    "stream_merge_into_tx_table",
    "stream_pq_index_update",
    "stream_window_counts",
    "corpus_dedup_snapshot_pipeline",
    "incremental_daily_agg_merge",
    "partition_pruned_counts",
    "snapshot_diff_counts",
    "tx_table_zorder_pruned_scan",
    # --- evidence-freshness (17): remaining round-4 tier ---
    "promo_revenue_by_year",
    "purchase_attribution_last_touch",
    "referential_integrity_report",
    "returned_items_customers",
    "returnflag_target_encoding",
    "revenue_share_by_segment",
    "sliding_7d_distinct_users",
    "small_quantity_part_revenue",
    "threshold_sweep_anomaly_rates",
    "token_budget_selection",
    "top_revenue_suppliers",
    "top_spend_days_with_ties",
    "unshipped_orders_topk",
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
