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
