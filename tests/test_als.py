"""Distributed ALS: exact alternating minimization invariants."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from end_to_end_data_engineering_and_ml_system_spark.ml.als import fit_als
from end_to_end_data_engineering_and_ml_system_spark.sources.catalog import (
    load_table,
)

from .conftest import SF_SMOKE


def _ratings(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("o_custkey").alias("user"),
            F.col("l_partkey").alias("item"),
        )
        .agg(F.count("*").cast("double").alias("rating"))
    )


def test_als_loss_non_increasing_and_improves(spark):
    r = _ratings(spark, SF_SMOKE)
    fit = fit_als(r, "user", "item", k=4, iters=3)
    for a, b in zip(fit.losses, fit.losses[1:]):
        assert b <= a + 1e-6, fit.losses
    assert fit.losses[-1] < 0.9 * fit.losses[0], "must actually improve"


def test_als_deterministic_across_partitionings(spark):
    r = _ratings(spark, SF_SMOKE)
    a = fit_als(r.repartition(3), "user", "item", k=4, iters=2)
    b = fit_als(r.repartition(11), "user", "item", k=4, iters=2)
    assert a.losses == b.losses
    for key in a.user_factors:
        assert np.array_equal(a.user_factors[key], b.user_factors[key])


def test_als_reconstructs_dominant_preferences(spark):
    # sanity: for the heaviest (user, item) cell, the model's predicted
    # score should be positive and larger than for a random non-purchased
    # pair of the same user
    r = _ratings(spark, SF_SMOKE).persist()
    top = r.orderBy(F.desc("rating"), "user", "item").first()
    fit = fit_als(r, "user", "item", k=4, iters=3)
    u = fit.user_factors[top["user"]]
    v = fit.item_factors[top["item"]]
    assert float(u @ v) > 0.5
    r.unpersist()
