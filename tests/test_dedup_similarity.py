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


def test_hot_bucket_cap_bounds_candidates(spark):
    """A planted viral bucket (many identical docs) is dropped by
    max_bucket_size while normal-sized buckets are untouched."""
    from end_to_end_data_engineering_and_ml_system_spark.operators.dedup import (
        lsh_candidate_pairs,
    )

    viral = [(i, "spam spam spam wonderful spam lovely spam baked beans spam")
             for i in range(40)]
    normal = [
        (100, "the quick brown fox jumps over the lazy dog near the river"),
        (101, "the quick brown fox jumps over the lazy dog near the river"),
        (200, "databases shuffle partitions across executors for joins daily"),
    ]
    df = spark.createDataFrame(viral + normal, ["doc_id", "text"])

    uncapped = lsh_candidate_pairs(df, "doc_id", "text", 8, 2, 3)
    capped = lsh_candidate_pairs(df, "doc_id", "text", 8, 2, 3, max_bucket_size=10)

    # uncapped: the 40-replica group alone yields 40*39/2 pairs
    assert uncapped.count() >= 40 * 39 // 2
    # capped: the viral bucket is gone, the small pair survives
    got = {(r.id1, r.id2) for r in capped.collect()}
    assert (100, 101) in got
    assert all(not (a < 40 and b < 40) for a, b in got)


def test_hot_bucket_cap_no_change_on_fixture(spark, sf_dir):
    """On the fixture corpus (no viral buckets at cap=50) capping changes
    nothing — the guard only fires on genuinely hot buckets."""
    from end_to_end_data_engineering_and_ml_system_spark.operators.dedup import (
        lsh_candidate_pairs,
    )
    from end_to_end_data_engineering_and_ml_system_spark.sources.catalog import (
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    plain = lsh_candidate_pairs(docs, "doc_id", "text", 8, 2, 3)
    capped = lsh_candidate_pairs(docs, "doc_id", "text", 8, 2, 3, max_bucket_size=50)
    assert plain.exceptAll(capped).count() == 0
    assert capped.exceptAll(plain).count() == 0


def test_embedding_bucket_cap_subset(spark, sf_dir):
    """Capped ANN candidate pairs are a subset of the uncapped ones."""
    from end_to_end_data_engineering_and_ml_system_spark.operators.similarity import (
        lsh_bucket_candidates,
    )
    from end_to_end_data_engineering_and_ml_system_spark.sources.catalog import (
        load_table,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    plain = lsh_bucket_candidates(emb)
    capped = lsh_bucket_candidates(emb, max_bucket_size=20)
    assert capped.exceptAll(plain).count() == 0
    assert capped.count() <= plain.count()


def test_incremental_near_dups_cross_side_only(spark):
    from end_to_end_data_engineering_and_ml_system_spark.operators.dedup import (
        incremental_near_dups,
    )

    base = "the quick brown fox jumps over the lazy dog again and again today"
    corpus = spark.createDataFrame(
        [
            (1, base),
            (2, "completely unrelated text about spark physical plans and shuffles"),
            (3, base + " ok"),  # near-dup INSIDE the corpus: must not be reported
        ],
        ["doc_id", "text"],
    )
    new = spark.createDataFrame(
        [
            (100, base + " yes"),  # near-dup of corpus docs 1 and 3
            (101, "fresh document with entirely new content and no overlap at all"),
            (102, base + " yes!"),  # near-dup of 100 (same side): must not be reported
        ],
        ["doc_id", "text"],
    )
    got = incremental_near_dups(corpus, new, "doc_id", "text", threshold=0.5)
    pairs = {(r["new_id"], r["corpus_id"]) for r in got.collect()}
    assert (100, 1) in pairs and (100, 3) in pairs
    assert (102, 1) in pairs  # the other new near-dup also matches the corpus
    # no same-side pairs, no fresh-doc pairs
    assert all(n in (100, 102) and c in (1, 3) for n, c in pairs)
    jacs = [r["jaccard"] for r in got.collect()]
    assert all(0.5 <= j <= 1.0 for j in jacs)


def test_contamination_check_plants(spark):
    """A candidate that copies a benchmark span is flagged with the exact
    overlap fraction; a disjoint candidate never appears."""
    from end_to_end_data_engineering_and_ml_system_spark.operators.dedup import contamination_check

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        ["doc_id", "text"],
    )
    cand = spark.createDataFrame(
        [
            # copies the benchmark verbatim -> contamination 1.0
            (1, "the quick brown fox jumps over the lazy dog"),
            # shares a 4-token span ("quick brown fox jumps" -> 2 of its
            # 6 distinct shingles appear in the benchmark)
            (2, "a very quick brown fox jumps again and again"),
            # disjoint -> absent from the result
            (3, "completely unrelated words with zero common trigrams"),
        ],
        ["doc_id", "text"],
    )
    rows = {
        r["doc_id"]: r
        for r in contamination_check(
            cand, bench, "doc_id", "text", n=3, threshold=0.2
        ).collect()
    }
    assert set(rows) == {1, 2}
    assert rows[1]["contamination"] == 1.0
    assert rows[1]["shared_ngrams"] == rows[1]["n_ngrams"]
    assert rows[2]["shared_ngrams"] == 2
    assert rows[2]["n_ngrams"] == 7
    assert abs(rows[2]["contamination"] - 2 / 7) < 1e-12


def test_contamination_benchmark_set_broadcasts(spark, sf_dir):
    """The benchmark shingle set must ride a broadcast exchange — the corpus
    side is the 100 TB side and must not shuffle for the join."""
    from end_to_end_data_engineering_and_ml_system_spark.plans.registry import all_queries

    from tests.planutil import physical_plan

    df = all_queries()["benchmark_contamination"].build(spark, sf_dir)
    assert "BroadcastExchange" in physical_plan(df)


def test_int8_quantization_error_bounded(spark, sf_dir):
    """Reconstruction error of int8 codes is bounded by half a quantization
    step per dimension; codes stay inside [0, 255]."""
    from end_to_end_data_engineering_and_ml_system_spark.operators.similarity import quantize_int8_stats
    from end_to_end_data_engineering_and_ml_system_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    rows = quantize_int8_stats(emb, "embedding").collect()
    assert len(rows) > 0
    for r in rows:
        step = (r["mx"] - r["mn"]) / 255.0
        assert 0.0 <= r["mean_code"] <= 255.0
        # floor(x+0.5) rounds to nearest: per-value error <= step/2 (+ 1e-10
        # quantization slack from the integer error aggregate)
        assert r["mean_abs_err"] <= step / 2 + 1e-9


def test_edit_distance_pairs_vs_naive(spark):
    from end_to_end_data_engineering_and_ml_system_spark.operators.dedup import (
        edit_distance_pairs,
    )

    docs = [
        (1, "the quick brown fox jumps over the lazy dog", "en"),
        (2, "the quick brown fox jumped over the lazy dog", "en"),  # 2 edits
        (3, "the quick brown cat naps under the warm sun!", "en"),  # same blk
        (4, "a completely different document altogether here", "en"),
        (5, "the quick brown fox jumps over the lazy dog", "fr"),  # lang block
        (6, "the quick 中文 fox jumps over the lazy dog", "en"),  # non-ASCII stripped
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text", "lang"])
    got = {
        (r.doc_a, r.doc_b): r.prefix_edit_distance
        for r in edit_distance_pairs(
            df, "doc_id", "text", prefix_len=64, block_len=8,
            length_band=32, max_dist=8, extra_block_cols=("lang",),
        ).collect()
    }

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    import re

    def norm(s: str) -> str:
        return re.sub(r"[^ -~]", "", s)

    want = {}
    for i, (ida, ta, la) in enumerate(docs):
        for idb, tb, lb in docs[i + 1:]:
            na, nb = norm(ta), norm(tb)
            if la != lb or na[:8] != nb[:8] or abs(len(na) - len(nb)) > 32:
                continue
            d = lev(na[:64], nb[:64])
            if d <= 8:
                want[(min(ida, idb), max(ida, idb))] = d

    assert got == want
    assert (1, 2) in got  # the planted near-dup survives blocking
    assert (1, 5) not in got  # lang block separates identical text


def test_edit_distance_pairs_skips_all_non_ascii_docs(spark):
    """Documents whose text normalizes to '' (all-CJK/Cyrillic) must NOT be
    compared at all: they would otherwise share block '' with distance 0 —
    unrelated docs reported as exact dups and a quadratic empty block."""
    from end_to_end_data_engineering_and_ml_system_spark.operators.dedup import (
        edit_distance_pairs,
    )

    docs = [
        (1, "这是一个完全中文的文档", "zh"),
        (2, "另一个完全不同的中文文档内容", "zh"),
        (3, "Это русский документ", "zh"),
        (4, "ascii doc one two three", "zh"),
        (5, "ascii doc one two three!", "zh"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text", "lang"])
    got = {
        (r.doc_a, r.doc_b)
        for r in edit_distance_pairs(
            df, "doc_id", "text", extra_block_cols=("lang",)
        ).collect()
    }
    # docs 1-2 normalize to '' and are excluded outright (before the fix
    # they formed block '' at distance 0); doc 3 keeps only its two spaces
    # and matches nobody's block. Only the genuine ascii near-dup remains.
    assert got == {(4, 5)}


def test_cluster_aware_split_never_splits_a_pair(spark, sf_dir):
    from end_to_end_data_engineering_and_ml_system_spark.operators.dedup import (
        lsh_verified_near_dups,
    )
    from end_to_end_data_engineering_and_ml_system_spark.operators.graph import (
        dedup_cluster_labels,
    )
    from end_to_end_data_engineering_and_ml_system_spark.operators.relational import (
        deterministic_split,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = lsh_verified_near_dups(
        docs, "doc_id", "text", num_hashes=8, rows_per_band=2, n=3, threshold=0.6
    )
    labeled = dedup_cluster_labels(docs, pairs, "doc_id")
    split = deterministic_split(
        labeled, "cluster_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    ).select("doc_id", "split")
    assert pairs.count() > 0  # fixture must actually exercise the property
    straddlers = (
        pairs.join(
            split.select(F.col("doc_id").alias("id1"), F.col("split").alias("s1")),
            "id1",
        )
        .join(
            split.select(F.col("doc_id").alias("id2"), F.col("split").alias("s2")),
            "id2",
        )
        .filter(F.col("s1") != F.col("s2"))
    )
    assert straddlers.count() == 0


def test_simhash_pairs_exact_vs_bruteforce(spark):
    import itertools
    import random

    from end_to_end_data_engineering_and_ml_system_spark.operators.dedup import (
        simhash_near_dup_pairs,
    )

    rng = random.Random(11)
    base = rng.getrandbits(60)
    sigs = {0: base}
    # planted neighbors at hamming 1..5 plus random strangers
    for i, k in enumerate([1, 2, 3, 4, 5], start=1):
        s = base
        for b in rng.sample(range(60), k):
            s ^= 1 << b
        sigs[i] = s
    for i in range(6, 16):
        sigs[i] = rng.getrandbits(60)

    df = spark.createDataFrame(list(sigs.items()), "doc_id long, simhash long")
    got = {
        (r.id1, r.id2): r.hamming
        for r in simhash_near_dup_pairs(
            df, "doc_id", bits=60, chunks=4, max_hamming=3
        ).collect()
    }
    want = {}
    for a, b in itertools.combinations(sorted(sigs), 2):
        d = bin(sigs[a] ^ sigs[b]).count("1")
        if d <= 3:
            want[(a, b)] = d
    assert got == want  # pigeonhole banding loses nothing within radius 3
    assert (0, 1) in got and (0, 3) in got and (0, 4) not in got


def test_semdedup_identical_vectors_dropped(spark):
    from end_to_end_data_engineering_and_ml_system_spark.operators.similarity import (
        semdedup_portable,
    )

    # unit basis vectors -> norms and cosines are FP-exact (0.0 / 1.0)
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0]),   # identical to 1
        (3, [0.0, 1.0, 0.0]),
        (4, [0.0, 1.0, 0.0]),   # identical to 3
        (5, [0.0, 0.0, 1.0]),   # orthogonal to everything
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    out = semdedup_portable(df, k=2, tau=0.95).collect()
    by_id = {r.vec_id: r for r in out}
    assert len(by_id) == 5  # one row per corpus vector
    # identical vectors have identical centroid cosines -> same cluster,
    # and the higher id of each identical pair sees max_cos_prev == 1.0
    assert by_id[1].cluster_id == by_id[2].cluster_id
    assert by_id[3].cluster_id == by_id[4].cluster_id
    assert by_id[2].max_cos_prev == 1.0 and not by_id[2].is_kept
    assert by_id[4].max_cos_prev == 1.0 and not by_id[4].is_kept
    # the lowest id of every cluster always survives
    kept = {r.vec_id for r in out if r.is_kept}
    for cid in {r.cluster_id for r in out}:
        members = [r.vec_id for r in out if r.cluster_id == cid]
        assert min(members) in kept


def test_semdedup_fixture_invariants(spark, sf_dir):
    from end_to_end_data_engineering_and_ml_system_spark.operators.similarity import (
        semdedup_portable,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    t = semdedup_portable(emb, k=8, tau=0.3).persist()
    try:
        assert t.count() == n  # total assignment, no dup / dropped ids
        assert t.select("vec_id").distinct().count() == n
        # every nonempty cluster keeps at least its lowest-id member
        per = t.groupBy("cluster_id").agg(
            F.count("*").alias("m"),
            F.sum(F.col("is_kept").cast("int")).alias("k"),
        ).collect()
        assert all(r.k >= 1 for r in per)
        assert sum(r.m for r in per) == n
        # retention is monotone in tau (same pairwise maxima re-thresholded)
        kept_at = [
            t.filter(F.col("max_cos_prev") <= tau).count()
            for tau in (0.2, 0.3, 0.4)
        ]
        assert kept_at == sorted(kept_at)
        assert 0 < kept_at[0] <= kept_at[-1] <= n
    finally:
        t.unpersist()


def test_lsh_banding_rejects_non_divisible_params(spark, sf_dir):
    """num_hashes % rows_per_band != 0 silently dropped the trailing hashes
    (lower recall than requested), and rows_per_band > num_hashes produced
    ZERO bands — every doc vanished and the pipeline reported 'no
    near-dups' with no error. Both must raise."""
    import pytest
    from pyspark.sql import functions as F

    from end_to_end_data_engineering_and_ml_system_spark.operators.dedup import (
        lsh_verified_near_dups,
    )
    from end_to_end_data_engineering_and_ml_system_spark.sources.catalog import (
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    with pytest.raises(ValueError, match="divide num_hashes"):
        lsh_verified_near_dups(docs, "doc_id", "text", 8, 3, 3, 0.6).count()
    with pytest.raises(ValueError, match="divide num_hashes"):
        lsh_verified_near_dups(docs, "doc_id", "text", 8, 16, 3, 0.6).count()


def test_sign_sketch_banding_rejects_width_mismatch(spark, sf_dir):
    """Bands reaching past the signature width read all-zero bits — EVERY
    vector lands in those tables' bucket 0 (measured: all-pairs candidate
    blowup, the O(n^2) LSH exists to avoid) — and bands covering less than
    the width silently ignore trailing planes. Both must raise; >64 planes
    would wrap the bigint and collide planes, so that raises too."""
    import pytest

    from end_to_end_data_engineering_and_ml_system_spark.operators.similarity import (
        lsh_bucket_candidates,
        lsh_signatures_table,
    )
    from end_to_end_data_engineering_and_ml_system_spark.sources.catalog import (
        load_table,
    )

    emb = load_table(spark, sf_dir, "embeddings").limit(20)
    with pytest.raises(ValueError, match="signature width"):
        lsh_bucket_candidates(emb, num_planes=8, num_tables=4, planes_per_table=4)
    with pytest.raises(ValueError, match="signature width"):
        lsh_bucket_candidates(emb, num_planes=16, num_tables=2, planes_per_table=4)
    with pytest.raises(ValueError, match="wraps"):
        lsh_signatures_table(emb, num_planes=65)


def test_cosine_zero_norm_vector_never_tops_or_crashes(spark):
    """A zero-norm corpus vector must not crash ANSI mode (DIVIDE_BY_ZERO,
    Spark 4's default — one zero vector killed the whole top-k job) — it
    gets a NULL cosine in either SQL mode, sorts last, and never enters
    the top-k."""
    from pyspark.sql import functions as F

    from end_to_end_data_engineering_and_ml_system_spark.operators.similarity import (
        cosine_topk_bruteforce,
        embedding_near_dups,
    )

    rows = [(i, [float(i + j) for j in range(4)]) for i in range(1, 6)]
    rows.append((99, [0.0, 0.0, 0.0, 0.0]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = cosine_topk_bruteforce(emb, emb.filter("vec_id = 1"), k=3).collect()
    assert len(out) == 3
    assert all(r["cand_id"] != 99 for r in out)
    assert all(r["cosine"] is not None for r in out)
    # the verified near-dup path: zero vector's pairs drop at the threshold
    nd = embedding_near_dups(emb, threshold=0.5).collect()
    assert all(99 not in (r["id1"], r["id2"]) for r in nd)


def test_semdedup_keeps_rows_with_null_or_empty_vectors(spark):
    """'One row per corpus row' includes rows whose vector is NULL or
    empty: they must appear with cluster_id NULL and is_kept true instead
    of silently vanishing."""
    from pyspark.sql import functions as F

    from end_to_end_data_engineering_and_ml_system_spark.operators.similarity import (
        semdedup_portable,
    )

    rows = [(i, [float(i + j) for j in range(4)]) for i in range(1, 9)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).unionByName(
        spark.createDataFrame(
            [(100, None), (101, [])], "vec_id long, embedding array<double>"
        )
    )
    out = semdedup_portable(emb, k=4, tau=0.9).collect()
    assert len(out) == 10
    by_id = {r["vec_id"]: r for r in out}
    for vid in (100, 101):
        assert by_id[vid]["cluster_id"] is None
        assert by_id[vid]["is_kept"] is True
        assert by_id[vid]["max_cos_prev"] == -1.0
    assert all(by_id[i]["cluster_id"] is not None for i in range(1, 9))


def test_bruteforce_exact_mode_matches_fast_path_and_guards_zero_norm(spark):
    """exact=True keeps the brute-force contract (same neighbors, same
    broadcast-crossJoin shape) while making scores decimal-exact for
    cross-engine oracle checks; the zero-norm guard holds in exact mode
    too (ANSI DIVIDE_BY_ZERO class)."""
    from end_to_end_data_engineering_and_ml_system_spark.operators.similarity import (
        cosine_topk_bruteforce,
    )

    rows = [(i, [float(i * j % 7 + 1) for j in range(6)]) for i in range(1, 9)]
    rows.append((99, [0.0] * 6))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.filter("vec_id <= 2")
    fast = cosine_topk_bruteforce(emb, q, k=3).collect()
    exact = cosine_topk_bruteforce(emb, q, k=3, exact=True).collect()
    key = lambda rs: sorted((r["query_id"], r["rn"], r["cand_id"]) for r in rs)
    assert key(fast) == key(exact)
    assert all(r["cand_id"] != 99 and r["cosine"] is not None for r in exact)
    # scores agree to float noise; exact scores are the decimal fold
    fa = {(r["query_id"], r["cand_id"]): r["cosine"] for r in fast}
    for r in exact:
        assert abs(fa[(r["query_id"], r["cand_id"])] - r["cosine"]) < 1e-9


def test_property_hoisted_cosine_equivalent_to_inline(spark):
    """cosine_from_norms(a, b, sq_norm(a), sq_norm(b)) must agree with the
    inline cosine(a, b) on every pair — including zero-norm NULLs — for
    random vectors (hypothesis): the hoist is a pure plan optimization,
    never a semantics change."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
    from pyspark.sql import functions as F

    from end_to_end_data_engineering_and_ml_system_spark.operators.similarity import (
        cosine,
        cosine_from_norms,
        sq_norm,
    )

    finite = st.floats(
        min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
    )
    vec = st.one_of(
        st.lists(finite, min_size=4, max_size=4),
        st.just([0.0, 0.0, 0.0, 0.0]),  # force zero-norm coverage
    )

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=list(HealthCheck),
        derandomize=True,
    )
    @given(vs=st.lists(vec, min_size=2, max_size=6))
    def run(vs):
        rows = [(i, v) for i, v in enumerate(vs)]
        df = spark.createDataFrame(rows, "id long, v array<double>")
        a = df.select(F.col("id").alias("ia"), F.col("v").alias("va"))
        b = df.select(F.col("id").alias("ib"), F.col("v").alias("vb"))
        pairs = a.crossJoin(b)
        both = pairs.select(
            "ia",
            "ib",
            cosine(F.col("va"), F.col("vb")).alias("inline"),
            cosine_from_norms(
                F.col("va"),
                F.col("vb"),
                sq_norm(F.col("va")),
                sq_norm(F.col("vb")),
            ).alias("hoisted"),
        ).collect()
        for r in both:
            if r["inline"] is None:
                assert r["hoisted"] is None, (r, vs)
            else:
                assert r["hoisted"] is not None and (
                    abs(r["inline"] - r["hoisted"]) < 1e-12
                ), (r, vs)

    run()


def test_hoisted_cosine_subnormal_norms_no_infinity(spark):
    """Subnormal-scale vectors (squared norms down in the 1e-324 denormal
    range): the hoisted guard tests the PRODUCT sqrt(na)*sqrt(nb), same as
    inline cosine, so NULL-rows are bit-identical between the two forms and
    no row can ever divide by an underflowed denominator (Infinity)."""
    import math

    from pyspark.sql import functions as F

    from end_to_end_data_engineering_and_ml_system_spark.operators.similarity import (
        cosine,
        cosine_from_norms,
        sq_norm,
    )

    scales = [1e-170, 1e-165, 5e-324 ** 0.5, 1e-155, 1.0, 0.0]
    rows = [(i, [s, s * 2, s * 3, s]) for i, s in enumerate(scales)]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    a = df.select(F.col("id").alias("ia"), F.col("v").alias("va"))
    b = df.select(F.col("id").alias("ib"), F.col("v").alias("vb"))
    both = (
        a.crossJoin(b)
        .select(
            "ia",
            "ib",
            cosine(F.col("va"), F.col("vb")).alias("inline"),
            cosine_from_norms(
                F.col("va"),
                F.col("vb"),
                sq_norm(F.col("va")),
                sq_norm(F.col("vb")),
            ).alias("hoisted"),
        )
        .collect()
    )
    for r in both:
        assert (r["inline"] is None) == (r["hoisted"] is None), r
        if r["hoisted"] is not None:
            assert math.isfinite(r["hoisted"]), r
            assert abs(r["inline"] - r["hoisted"]) < 1e-9, r


def test_minhash_and_sets_matches_source_operators(spark, sf_dir):
    """The r15 combined per-doc frame (one tokenize+shingle pass feeding
    both LSH banding and exact-Jaccard verification) must be column-exact
    against the two operators it fuses: minhash_wide's signature columns
    and shingle_hash_sets' sorted hash arrays, over the >=1-shingle docs
    both pipelines consume."""
    from pyspark.sql import functions as F

    from end_to_end_data_engineering_and_ml_system_spark.operators.dedup import (
        minhash_and_sets,
        minhash_wide,
        shingle_hash_sets,
    )
    from end_to_end_data_engineering_and_ml_system_spark.sources.catalog import (
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    k = 4
    combined = {
        r["doc_id"]: r
        for r in minhash_and_sets(docs, "doc_id", "text", k, 3).collect()
    }
    wide = {r["doc_id"]: r for r in minhash_wide(docs, "doc_id", "text", k, 3).collect()}
    sets_ = {
        r["doc_id"]: r["sh_set"]
        for r in shingle_hash_sets(docs, "doc_id", "text", 3)
        .filter(F.size("sh_set") >= 1)
        .collect()
    }
    assert set(combined) == set(wide) == set(sets_)
    assert combined  # fixture has docs with shingles
    for doc_id, row in combined.items():
        for i in range(k):
            assert row[f"h{i}"] == wide[doc_id][f"h{i}"], (doc_id, i)
        assert list(row["sh_set"]) == list(sets_[doc_id]), doc_id


def test_minhash_token_precondition_matches_shingle_filter(spark):
    """minhash_wide / minhash_and_sets drop zero-shingle docs via the
    pushdown-cheap token-count precondition (size(toks) >= n). Pin the
    exact equivalence with the shingle-array form it replaced
    (size(shingles) >= 1) — a doc has >= 1 n-gram iff it has >= n tokens —
    across the edge shapes: empty text, whitespace-only, n-1 tokens,
    exactly n tokens, repeated-token docs (distinct shingles still
    non-empty), and NULL text (size = -1 either way)."""
    from pyspark.sql import functions as F

    from end_to_end_data_engineering_and_ml_system_spark.operators.dedup import (
        minhash_and_sets,
        minhash_wide,
        shingles,
    )
    from end_to_end_data_engineering_and_ml_system_spark.operators.text import (
        tokens,
    )

    docs = spark.createDataFrame(
        [
            (1, ""),
            (2, "   "),
            (3, "a b"),
            (4, "a b c"),
            (5, None),
            (6, "a a a a"),
            (7, "x y z w v"),
        ],
        "doc_id long, text string",
    )
    n = 3
    # ground truth: docs whose distinct-shingle array is non-empty
    want = {
        r["doc_id"]
        for r in docs.select(
            "doc_id", shingles(tokens("text"), n).alias("sh")
        )
        .filter(F.size("sh") >= 1)
        .collect()
    }
    got_wide = {
        r["doc_id"] for r in minhash_wide(docs, "doc_id", "text", 4, n).collect()
    }
    got_comb = {
        r["doc_id"]
        for r in minhash_and_sets(docs, "doc_id", "text", 4, n).collect()
    }
    assert got_wide == got_comb == want == {4, 6, 7}
    # and no all-NULL signature rows slipped through
    wide = minhash_wide(docs, "doc_id", "text", 4, n)
    assert wide.filter(F.col("h0").isNull()).count() == 0
