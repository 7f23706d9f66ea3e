"""Invariant tests for the non-oracle relational ops (sampling/splits) and
unit tests for the cleaning library."""

from __future__ import annotations

from pyspark.sql import functions as F

from end_to_end_data_engineering_and_ml_system_spark.operators.cleaning import (
    find_column,
    sanitize_columns,
    select_first_occurrence,
)
from end_to_end_data_engineering_and_ml_system_spark.operators.relational import (
    capped_sample,
    seeded_split,
)
from end_to_end_data_engineering_and_ml_system_spark.sources.catalog import load_table


def test_seeded_split_partitions_input(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    total = orders.count()
    train, test = seeded_split(orders, [0.8, 0.2], seed=42)
    n_train, n_test = train.count(), test.count()
    assert n_train + n_test == total
    # membership is disjoint and reproducible for the same seed+partitioning
    overlap = train.select("o_orderkey").intersect(test.select("o_orderkey")).count()
    assert overlap == 0
    train2, _ = seeded_split(orders, [0.8, 0.2], seed=42)
    assert train2.count() == n_train


def test_capped_sample_near_cap(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    total = li.count()
    cap = total // 3
    n = capped_sample(li, cap=cap, total=total, seed=42).count()
    assert 0.7 * cap <= n <= 1.3 * cap
    # under the cap: passthrough, no sampling
    assert capped_sample(li, cap=total + 1, total=total).count() == total


def test_sanitize_columns(spark):
    df = spark.createDataFrame(
        [(1, 2, 3, 4)], [" Flow Duration", "Flow Bytes/s", "Flow Bytes/s ", "8var"]
    )
    out = sanitize_columns(df)
    assert out.columns == ["Flow_Duration", "Flow_Bytes_s", "Flow_Bytes_s_1", "c_8var"]


def test_find_column_fuzzy(spark):
    df = spark.createDataFrame([(1, 2)], ["Fwd_Header_Length", "Label"])
    assert find_column(df, "fwd header length") == "Fwd_Header_Length"
    assert find_column(df, "LABEL") == "Label"
    assert find_column(df, "missing") is None


def test_select_first_occurrence(spark):
    a = spark.range(3).select(F.col("id"), (F.col("id") * 2).alias("id"))
    out = select_first_occurrence(a)
    assert out.columns == ["id"]
    assert [r.id for r in out.orderBy("id").collect()] == [0, 1, 2]
