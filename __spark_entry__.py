"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over the engine's query registry
(``end_to_end_data_engineering_and_ml_system_spark.plans.registry``): every
implemented operator from SURVEY.md §2 is registered there with its Spark
implementation and (where SQL-expressible) a DuckDB oracle string.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from end_to_end_data_engineering_and_ml_system_spark.plans.registry import all_queries

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The dashboard-core analog: event-time tumbling-window counts per class
    (reference: scripts/streamlit_dashboard.py:150-153), fully distributed.
    """
    return all_queries()["events_window_counts"].build(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.build for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted for non-SQL-expressible ops."""
    return {
        name: q.oracle for name, q in all_queries().items() if q.oracle is not None
    }
