"""DSIR importance-resampling invariants (operators/dsir.py): the
selection must actually enrich the target it was pointed at, weights
must be partitioning-independent, and the distributions must come from
one exploded aggregate (plan shape)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from end_to_end_data_engineering_and_ml_system_spark.operators.dsir import (
    bigram_buckets,
    dsir_log_weights,
)
from end_to_end_data_engineering_and_ml_system_spark.sources.catalog import load_table

TARGET = ("src0", "src1", "src2")


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").cache()


@pytest.fixture(scope="module")
def weights(docs):
    return dsir_log_weights(
        docs, target=F.col("source").isin(*TARGET), carry=("source",)
    ).cache()


def test_bigram_buckets_counts(docs):
    bb = bigram_buckets(docs, carry=("source",))
    # sum of bucket counts per doc == n_tokens - 1 for every multi-token doc
    per_doc = bb.groupBy("doc_id").agg(F.sum("c").alias("n")).collect()
    ntok = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id",
            (
                F.size(
                    F.filter(
                        F.split(F.trim(F.lower("text")), r"\s+"),
                        lambda t: t != "",
                    )
                )
                - 1
            ).alias("n"),
        ).collect()
    }
    assert per_doc and all(ntok[r["doc_id"]] == r["n"] for r in per_doc)


def test_dsir_enriches_target_sources(weights):
    rows = weights.select(
        F.col("source").isin(*TARGET).alias("is_target"),
        "dsir_logweight",
    ).groupBy("is_target").agg(F.avg("dsir_logweight").alias("mu")).collect()
    mu = {r["is_target"]: r["mu"] for r in rows}
    print(f"DSIR mean logweight target/other: {mu}")
    # importance weights are log p_t - log q: the target slice must sit
    # strictly above the rest on average, or selection is a no-op
    assert mu[True] > mu[False]


def test_dsir_weights_partitioning_independent(docs):
    w1 = dsir_log_weights(docs, target=F.col("source").isin(*TARGET))
    w2 = dsir_log_weights(
        docs.repartition(7), target=F.col("source").isin(*TARGET)
    )
    j = w1.join(
        w2.withColumnRenamed("dsir_logweight", "w2""").select("doc_id", "w2"),
        "doc_id",
    )
    bad = j.filter(
        F.abs(F.col("dsir_logweight") - F.col("w2")) > 1e-9
    ).count()
    assert bad == 0
