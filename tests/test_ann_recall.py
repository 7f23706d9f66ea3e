"""Measured ANN quality: recall@k of the IVF path against exact
brute-force ground truth, plus the nprobe tradeoff direction. The point
is a NUMBER in the test log, not just 'it runs' — approximate search
without a measured recall floor is an unquantified liability."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from end_to_end_data_engineering_and_ml_system_spark.operators.similarity import (
    cosine_topk_bruteforce,
    ivf_index,
    ivf_search,
)
from end_to_end_data_engineering_and_ml_system_spark.sources.catalog import load_table

K = 3
N_QUERIES = 25


@pytest.fixture(scope="module")
def corpus_and_queries(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").cache()
    return emb, emb.filter(F.col("vec_id") < N_QUERIES)


def _pairs(df):
    return {(r["query_id"], r["cand_id"]) for r in df.collect()}


def test_ivf_recall_floor_and_nprobe_tradeoff(spark, corpus_and_queries):
    emb, queries = corpus_and_queries
    exact = _pairs(
        cosine_topk_bruteforce(emb, queries, k=K).select("query_id", "cand_id")
    )
    assert len(exact) == N_QUERIES * K
    assigned, centroids = ivf_index(emb, k_cells=8, seed=42)
    assigned = assigned.cache()
    recalls = {}
    for nprobe in (1, 4, 8):
        got = _pairs(
            ivf_search(
                assigned, centroids, queries, nprobe=nprobe, k=K
            ).select("query_id", "cand_id")
        )
        recalls[nprobe] = len(got & exact) / len(exact)
    print(f"IVF recall@{K} by nprobe: {recalls}")
    # probing every cell IS exhaustive search: recall must be exactly 1
    assert recalls[8] == 1.0, recalls
    # more probes can only help (monotone tradeoff)
    assert recalls[1] <= recalls[4] <= recalls[8], recalls
    # the default operating point must clear a usable floor
    assert recalls[4] >= 0.6, recalls
