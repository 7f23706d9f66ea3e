"""Invariant tests for non-oracle aggregations and observe() instrumentation."""

from __future__ import annotations

from pyspark.sql import functions as F

from end_to_end_data_engineering_and_ml_system_spark.operators.aggregations import (
    with_stage_observation,
)
from end_to_end_data_engineering_and_ml_system_spark.plans.registry import all_queries
from end_to_end_data_engineering_and_ml_system_spark.sources.catalog import load_table


def test_approx_distinct_within_rsd(spark, sf_dir):
    row = all_queries()["approx_distinct_users"].build(spark, sf_dir).collect()[0]
    assert abs(row.approx_users - row.exact_users) / row.exact_users <= 0.05


def test_observe_counts_without_extra_job(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    observed, obs = with_stage_observation(
        ev.filter(F.col("value") > 0), "post_filter",
        F.sum(F.when(F.col("value") > 400, 1).otherwise(0)).alias("n_big"),
    )
    n = observed.count()  # one action; observation rides along
    assert obs.get["n_rows"] == n
    assert 0 <= obs.get["n_big"] <= n
