"""Registered queries must survive degenerate inputs under ANSI mode
(Spark 4's default): zero-variance groups, all-empty-document sources, and
empty tables are NULL/clear-error cases, never DIVIDE_BY_ZERO job kills.

The queries read their tables through ``plans.queries.load_table``; these
tests monkeypatch it to serve crafted degenerate frames, so the exact
inline expressions the driver runs are what gets exercised."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from end_to_end_data_engineering_and_ml_system_spark.plans import queries as Q
from end_to_end_data_engineering_and_ml_system_spark.plans.registry import (
    all_queries,
)


def _serve(monkeypatch, tables: dict):
    def fake_load(spark, sf_dir, name):
        if name not in tables:
            raise AssertionError(f"unexpected table {name}")
        return tables[name]

    monkeypatch.setattr(Q, "load_table", fake_load)


def test_value_trend_zero_variance_group_null_slope(spark, monkeypatch):
    """An event_type whose events all share ONE timestamp has zero x
    variance: the slope is undefined -> NULL (DuckDB's x/0), not an ANSI
    DIVIDE_BY_ZERO that kills every other group's result with it."""
    rows = [
        (1, "2024-03-01 10:00:00", 1, "burst", 5.0, None),
        (2, "2024-03-01 10:00:00", 1, "burst", 9.0, None),
        (3, "2024-03-01 10:00:00", 2, "burst", 7.0, None),
        (4, "2024-03-01 10:00:00", 2, "steady", 1.0, None),
        (5, "2024-03-02 10:00:00", 2, "steady", 2.0, None),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    _serve(monkeypatch, {"events": ev})
    out = {
        r["event_type"]: r
        for r in all_queries()["value_trend_by_type"].build(spark, "x").collect()
    }
    assert out["burst"]["slope_per_sec"] is None
    assert out["steady"]["slope_per_sec"] is not None


def test_span_dedup_savings_all_empty_source_null_frac(spark, monkeypatch):
    """A source whose documents are ALL empty has zero total tokens: the
    savings fraction is NULL, and the other sources still report."""
    rows = [
        (1, "", "en", "husks", 0),
        (2, "", "en", "husks", 0),
        (3, "alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "alpha beta gamma delta epsilon zeta eta theta iota kappa",
         "en", "real", 100),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars long"
    )
    _serve(monkeypatch, {"documents": docs})
    out = {
        r["source"]: r
        for r in all_queries()["doc_span_dedup_savings"]
        .build(spark, "x")
        .collect()
    }
    assert out["husks"]["savings_frac"] is None
    assert out["husks"]["total_tokens"] == 0
    assert out["real"]["savings_frac"] is not None


def test_top_order_concentration_empty_orders_clear_error(spark, monkeypatch):
    """An empty orders table has no p99: a clear ValueError, not a
    TypeError from float(None) or a NULL-threshold nonsense result."""
    empty = spark.createDataFrame(
        [],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp_ntz, "
        "o_orderpriority string",
    )
    _serve(monkeypatch, {"orders": empty})
    with pytest.raises(ValueError, match="empty orders"):
        all_queries()["top_order_revenue_concentration"].build(spark, "x")


def test_quality_gate_single_definition():
    """The corpus quality gate must come from ONE definition on both
    engine sides: the rendered oracle SQL of all three pipeline queries
    contains the shared gate string (a re-typed copy is how same-pipeline
    stages silently diverge — the BM25-predicate class)."""
    qs = all_queries()
    gate = Q._sql_quality_gate()
    for name in ("corpus_pipeline_summary", "corpus_yield_by_source"):
        assert gate in qs[name].oracle, name
    assert Q._sql_quality_gate("len(toks)") in qs["corpus_quality_filter"].oracle
    # and the Spark-side predicate renders from the same constants
    pred = str(Q._quality_gate()._jc)
    assert str(Q._QUALITY_MIN) in pred
    assert str(Q._GATE_TOKENS_MAX) in pred
