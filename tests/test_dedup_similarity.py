"""Invariant tests for the non-oracle dedup/similarity ops (SimHash, fast
ANN, embedding LSH)."""

from __future__ import annotations

from pyspark.sql import functions as F

from end_to_end_data_engineering_and_ml_system_spark.operators.dedup import (
    hamming64,
    simhash64,
)
from end_to_end_data_engineering_and_ml_system_spark.operators.similarity import (
    cosine_topk_bruteforce,
)
from end_to_end_data_engineering_and_ml_system_spark.plans.registry import all_queries
from end_to_end_data_engineering_and_ml_system_spark.sources.catalog import load_table


def test_simhash_identical_and_near(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base + " extra"
    far = "completely different words about databases and distributed systems"
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, near), (4, far)], ["id", "text"]
    )
    sigs = {
        r.id: r.sig
        for r in df.select("id", simhash64("text").alias("sig")).collect()
    }
    assert sigs[1] == sigs[2]  # identical text -> identical signature
    ham = df.select(
        hamming64(F.lit(sigs[1]), F.lit(sigs[3])).alias("near"),
        hamming64(F.lit(sigs[1]), F.lit(sigs[4])).alias("far"),
    ).collect()[0]
    assert ham.near < ham.far  # near-dup much closer in Hamming space
    assert ham.near <= 16


def test_bruteforce_ann_sane(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    out = cosine_topk_bruteforce(emb, emb.filter(F.col("vec_id") < 4), k=3)
    rows = out.collect()
    assert len(rows) == 4 * 3
    for r in rows:
        assert -1.0001 <= r.cosine <= 1.0001
        assert r.query_id != r.cand_id
    # rn is a proper ranking per query
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rn)
        assert [r.rn for r in rs] == [1, 2, 3]
        assert rs[0].cosine >= rs[1].cosine >= rs[2].cosine


def test_lsh_candidates_subset_of_pairs(spark, sf_dir):
    out = all_queries()["embedding_lsh_candidates"].build(spark, sf_dir)
    rows = out.collect()
    ids = set()
    for r in rows:
        assert r.id1 < r.id2
        ids.add((r.id1, r.id2))
    assert len(ids) == len(rows)  # distinct pairs


def test_ivf_search_recall_vs_bruteforce(spark, sf_dir):
    from pyspark.sql import functions as F

    from end_to_end_data_engineering_and_ml_system_spark.operators.similarity import (
        cosine_topk_bruteforce,
        ivf_index,
        ivf_search,
    )
    from end_to_end_data_engineering_and_ml_system_spark.sources.catalog import (
        load_table,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    exact = cosine_topk_bruteforce(emb, queries, k=3).select(
        "query_id", F.col("cand_id").alias("exact_cand")
    )
    assigned, centroids = ivf_index(emb, k_cells=8, seed=42)
    approx = ivf_search(assigned, centroids, queries, nprobe=4, k=3)
    assert approx.groupBy("query_id").count().filter("count != 3").count() == 0
    hits = exact.join(
        approx.select("query_id", F.col("cand_id").alias("exact_cand")),
        ["query_id", "exact_cand"],
    ).count()
    total = exact.count()
    # nprobe=4 of 8 cells must recover well over half the true neighbors
    assert hits / total >= 0.5, f"recall {hits}/{total}"


def test_lsh_verified_matches_exact_on_candidates(spark, sf_dir):
    from end_to_end_data_engineering_and_ml_system_spark.operators.dedup import (
        jaccard_pairs,
        lsh_candidate_pairs,
        lsh_verified_near_dups,
    )
    from end_to_end_data_engineering_and_ml_system_spark.sources.catalog import (
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    exact = jaccard_pairs(docs, "doc_id", "text", 3, 0.6)
    cands = lsh_candidate_pairs(docs, "doc_id", "text", 8, 2, 3)
    verified = lsh_verified_near_dups(docs, "doc_id", "text", 8, 2, 3, 0.6)
    expected = exact.join(cands, ["id1", "id2"]).select("id1", "id2", "jaccard")
    assert verified.exceptAll(expected).count() == 0
    assert expected.exceptAll(verified).count() == 0


def test_embedding_near_dups_subset_of_bruteforce(spark, sf_dir):
    from pyspark.sql import functions as F

    from end_to_end_data_engineering_and_ml_system_spark.operators.similarity import (
        cosine,
        embedding_near_dups,
    )
    from end_to_end_data_engineering_and_ml_system_spark.sources.catalog import (
        load_table,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    got = embedding_near_dups(emb, threshold=0.9).persist()
    # every verified pair really is >= threshold (exact check on the pair)
    a = emb.select(F.col("vec_id").alias("id1"), F.col("embedding").alias("v1"))
    b = emb.select(F.col("vec_id").alias("id2"), F.col("embedding").alias("v2"))
    back = got.join(a, "id1").join(b, "id2").select(
        "id1", "id2", "cosine", cosine(F.col("v1"), F.col("v2")).alias("exact")
    )
    assert back.filter(F.abs(F.col("cosine") - F.col("exact")) > 1e-9).count() == 0
    assert back.filter(F.col("exact") < 0.9).count() == 0
    # pairs are canonical (id1 < id2) and unique
    assert got.filter(F.col("id1") >= F.col("id2")).count() == 0
    assert got.count() == got.select("id1", "id2").distinct().count()
    got.unpersist()
