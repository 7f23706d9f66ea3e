"""Invariants for the chunking/packing text operators (their value-level
parity is oracle-checked; these pin the semantic properties)."""

from __future__ import annotations

from pyspark.sql import functions as F

from end_to_end_data_engineering_and_ml_system_spark.operators.text import (
    chunk_documents,
    pack_tokens_into_bins,
)
from end_to_end_data_engineering_and_ml_system_spark.sources.catalog import load_table


def test_chunks_cover_text_with_overlap(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    chunks = chunk_documents(docs, "doc_id", "text", chunk_chars=512, overlap=64)
    stats = (
        chunks.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(F.length("chunk_text")).alias("sum_len"),
            F.max(F.length("chunk_text")).alias("max_len"),
        )
        .join(docs.select("doc_id", F.length("text").alias("n")), "doc_id")
    )
    bad = stats.filter(
        (F.col("max_len") > 512)
        # total chunk chars = n + overlap per junction (except truncated tail)
        | (F.col("sum_len") < F.col("n"))
        | (F.col("sum_len") > F.col("n") + (F.col("n_chunks") - 1) * 64)
    )
    assert bad.count() == 0
    # reassembly: stripping the overlap from every non-first chunk
    # reconstructs the document exactly
    w_chunks = chunks.withColumn(
        "piece",
        F.when(F.col("chunk_no") == 0, F.col("chunk_text")).otherwise(
            F.substring("chunk_text", 65, 512)
        ),
    )
    rebuilt = (
        w_chunks.groupBy("doc_id")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("chunk_no", "piece"))),
                    lambda s: s.getField("piece"),
                ),
            ).alias("rebuilt")
        )
        .join(docs.select("doc_id", "text"), "doc_id")
    )
    assert rebuilt.filter(F.col("rebuilt") != F.col("text")).count() == 0


def test_token_packing_bins_bounded(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    packed = pack_tokens_into_bins(docs, "lang", "doc_id", "text", bin_tokens=2048)
    assert packed.count() == docs.count()  # every doc assigned exactly once
    per_bin = packed.groupBy("lang", "bin_id").agg(
        F.sum("n_tokens").alias("bin_total"), F.max("n_tokens").alias("biggest_doc")
    )
    # a bin overflows 2048 by at most its last document
    assert per_bin.filter(
        F.col("bin_total") >= 2048 + F.col("biggest_doc")
    ).count() == 0
    # bins are consecutive from 0 within each lang
    seq = per_bin.groupBy("lang").agg(
        F.min("bin_id").alias("lo"), F.max("bin_id").alias("hi"),
        F.count("*").alias("n_bins"),
    )
    assert seq.filter(
        (F.col("lo") != 0) | (F.col("n_bins") != F.col("hi") + 1)
    ).count() == 0


def test_repetition_signals_planted(spark):
    """A templated/repetitive doc scores high; a diverse doc scores 0."""
    from end_to_end_data_engineering_and_ml_system_spark.operators.text import repetition_signals

    docs = spark.createDataFrame(
        [
            # "buy now" repeated 5x: bigrams = 9 total, top "now buy"/"buy now"
            (1, "buy now buy now buy now buy now buy now"),
            # all-distinct tokens: zero duplicate n-grams
            (2, "one two three four five six seven"),
            # too short to measure (< 3 tokens) -> excluded
            (3, "hi there"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in repetition_signals(docs, "doc_id", "text").collect()}
    assert set(rows) == {1, 2}
    r1 = rows[1]
    assert r1["n_bigrams"] == 9
    assert r1["top_bigram_n"] == 5  # "buy now" x5
    assert abs(r1["top_bigram_frac"] - 5 / 9) < 1e-12
    assert abs(r1["dup_bigram_frac"] - (1 - 2 / 9)) < 1e-12
    assert r1["dup_trigram_frac"] > 0.7
    r2 = rows[2]
    assert r2["dup_bigram_frac"] == 0.0
    assert r2["dup_trigram_frac"] == 0.0
    assert r2["top_bigram_n"] == 1


def test_ffd_packing_invariants(spark, sf_dir):
    """Every doc packed exactly once; no bin over capacity (except dedicated
    oversize bins); FFD never uses more bins than running-total chunking."""
    from pyspark.sql import functions as F

    from end_to_end_data_engineering_and_ml_system_spark.operators.text import pack_bins_ffd, token_count
    from end_to_end_data_engineering_and_ml_system_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", token_count("text").alias("n_tokens")
    )
    cap = 200
    packed = pack_bins_ffd(docs, "doc_id", "n_tokens", capacity=cap, num_groups=8)
    packed.cache()
    n_docs = docs.count()
    assert packed.count() == n_docs
    assert packed.select("doc_id").distinct().count() == n_docs
    over = packed.filter("oversize").count()
    assert over == docs.filter(F.col("n_tokens") > cap).count()
    fills = (
        packed.filter(~F.col("oversize"))
        .groupBy("bin_id")
        .agg(F.sum("tokens").alias("fill"))
    )
    assert fills.filter(F.col("fill") > cap).count() == 0
    # efficiency: total bins <= naive one-doc-per-bin, and fill factor sane
    n_bins = packed.select("bin_id").distinct().count()
    assert n_bins < n_docs
    packed.unpersist()


def test_ffd_packing_deterministic(spark, sf_dir):
    from end_to_end_data_engineering_and_ml_system_spark.operators.text import pack_bins_ffd, token_count
    from end_to_end_data_engineering_and_ml_system_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", token_count("text").alias("n_tokens")
    )
    a = sorted(map(tuple, pack_bins_ffd(docs, "doc_id", "n_tokens", 200, 8).collect()))
    b = sorted(map(tuple, pack_bins_ffd(docs, "doc_id", "n_tokens", 200, 8).collect()))
    assert a == b


def test_duplicate_ngram_windows_planted(spark):
    from end_to_end_data_engineering_and_ml_system_spark.operators.text import (
        duplicate_ngram_windows,
    )

    shared = " ".join(f"s{i}" for i in range(8))  # one 8-token window
    docs = spark.createDataFrame(
        [
            (1, shared + " tail1 tail2"),
            (2, "lead1 lead2 " + shared),
            (3, " ".join(f"u{i}" for i in range(12))),  # all-unique doc
            (4, "too short"),  # < 8 tokens: no windows, no output row
        ],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in duplicate_ngram_windows(docs, "doc_id", "text").collect()}
    assert set(out) == {1, 2, 3}
    # doc1: 10 tokens -> 3 windows, exactly the leading one is shared
    assert out[1]["n_windows"] == 3 and out[1]["dup_windows"] == 1
    assert out[2]["n_windows"] == 3 and out[2]["dup_windows"] == 1
    assert out[3]["dup_windows"] == 0
    assert abs(out[1]["dup_window_frac"] - 1 / 3) < 1e-12


def test_duplicate_ngram_windows_self_repeat_not_cross_doc(spark):
    # a window repeated WITHIN one doc is not a cross-document duplicate
    from end_to_end_data_engineering_and_ml_system_spark.operators.text import (
        duplicate_ngram_windows,
    )

    block = " ".join(f"r{i}" for i in range(8))
    docs = spark.createDataFrame(
        [(1, block + " " + block)], "doc_id int, text string"
    )
    row = duplicate_ngram_windows(docs, "doc_id", "text").first()
    assert row["dup_windows"] == 0


def test_duplicate_ngram_spans_merge_adjacent_windows(spark):
    from end_to_end_data_engineering_and_ml_system_spark.operators.text import (
        duplicate_ngram_spans,
    )

    # 10 shared tokens -> three consecutive duplicated 8-windows in each
    # doc, which must coalesce into ONE span covering the shared run
    shared = " ".join(f"s{i}" for i in range(10))
    docs = spark.createDataFrame(
        [
            (1, shared + " t1 t2"),
            (2, "l1 l2 " + shared),
            (3, " ".join(f"u{i}" for i in range(12))),
        ],
        "doc_id int, text string",
    )
    out = {
        r["doc_id"]: (r["span_start"], r["span_end"], r["n_windows"])
        for r in duplicate_ngram_spans(docs, "doc_id", "text").collect()
    }
    # doc1: shared run at tokens 1..10 -> windows at pos 1,2,3 -> span 1..10
    assert out[1] == (1, 10, 3)
    # doc2: shared run at tokens 3..12 -> windows at pos 3,4,5 -> span 3..12
    assert out[2] == (3, 12, 3)
    assert 3 not in out  # all-unique doc has no spans


def test_duplicate_ngram_spans_disjoint_runs_stay_separate(spark):
    from end_to_end_data_engineering_and_ml_system_spark.operators.text import (
        duplicate_ngram_spans,
    )

    a = " ".join(f"a{i}" for i in range(8))
    b = " ".join(f"b{i}" for i in range(8))
    gap = " ".join(f"g{i}" for i in range(8))  # unique separator
    docs = spark.createDataFrame(
        [(1, f"{a} {gap} {b}"), (2, a), (3, b)], "doc_id int, text string"
    )
    spans = sorted(
        (r["span_start"], r["span_end"])
        for r in duplicate_ngram_spans(docs, "doc_id", "text").collect()
        if r["doc_id"] == 1
    )
    assert spans == [(1, 8), (17, 24)]


def test_chunk_udtf_matches_builtin_chunker(spark, sf_dir):
    from end_to_end_data_engineering_and_ml_system_spark.operators.text import (
        chunk_documents,
        chunk_documents_udtf,
    )
    from end_to_end_data_engineering_and_ml_system_spark.sources.catalog import (
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    builtin = {
        (r["doc_id"], r["chunk_no"], r["chunk_text"])
        for r in chunk_documents(docs, "doc_id", "text").collect()
    }
    chunk_documents_udtf(spark)
    docs.createOrReplaceTempView("docs_for_udtf")
    via_udtf = {
        tuple(r)
        for r in spark.sql(
            "SELECT c.doc_id, c.chunk_no, c.chunk_text "
            "FROM docs_for_udtf d, "
            "LATERAL chunk_udtf(d.doc_id, d.text) c"
        ).collect()
    }
    assert via_udtf == builtin
    assert builtin, "chunker must produce rows on the fixture corpus"


def test_quality_ratios_null_on_empty_text_ansi_safe(spark):
    """Empty/whitespace-only text must yield NULL ratios (not an ANSI
    DIVIDE_BY_ZERO crash — Spark 4's default mode — and not a legacy
    silent NULL with no contract) and a 0.0 composite quality."""
    from end_to_end_data_engineering_and_ml_system_spark.operators.text import (
        punct_ratio,
        quality_score,
        stopword_ratio,
        uppercase_ratio,
    )

    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "the cat sat, the cat sat.")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            punct_ratio("text").alias("p"),
            uppercase_ratio("text").alias("u"),
            stopword_ratio("text").alias("s"),
            quality_score("text").alias("q"),
        ).collect()
    }
    assert out[1]["p"] is None and out[1]["u"] is None and out[1]["s"] is None
    assert out[1]["q"] == 0.0
    assert out[2]["s"] is None  # whitespace-only: zero tokens
    assert out[3]["p"] is not None and out[3]["q"] is not None


def test_tf_idf_topk_does_not_force_broadcast_vocab(spark, sf_dir):
    """The idf table is vocabulary-sized — a forced broadcast hint is a
    hard ~8 GB failure at web-corpus scale. The logical plan must carry no
    broadcast hint; AQE decides at runtime."""
    from end_to_end_data_engineering_and_ml_system_spark.operators.text import (
        tf_idf_topk,
    )
    from end_to_end_data_engineering_and_ml_system_spark.sources.catalog import (
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents").limit(50)
    plan = tf_idf_topk(docs, "doc_id", "text")._jdf.queryExecution().logical().toString()
    assert "UnresolvedHint" not in plan and "hint" not in plan.lower()


def test_ffd_bin_ids_injective_across_groups(spark):
    """(group, local_bin) -> bin_id must stay injective: the old 10^6
    multiplier collided once a group packed over a million bins."""
    from end_to_end_data_engineering_and_ml_system_spark.operators.text import (
        _FFD_BINS_PER_GROUP,
        pack_bins_ffd,
    )

    assert _FFD_BINS_PER_GROUP >= 10**12
    docs = spark.range(200).select(
        F.col("id").alias("doc_id"), (F.col("id") % 150 + 20).alias("n_tokens")
    )
    packed = pack_bins_ffd(docs, "doc_id", "n_tokens", capacity=200, num_groups=4)
    rows = packed.collect()
    assert len(rows) == 200
    for r in rows:
        grp, b = divmod(r["bin_id"], _FFD_BINS_PER_GROUP)
        assert grp == r["pack_group"]
        assert 0 <= b < _FFD_BINS_PER_GROUP
