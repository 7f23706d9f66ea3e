"""Measured banding quality: recall of the LSH-verified near-dup path
against the exact Jaccard similarity join — the number that justifies
running banding instead of the quadratic inverted index at corpus
scale."""

from __future__ import annotations

import pytest

from end_to_end_data_engineering_and_ml_system_spark.operators.dedup import (
    jaccard_pairs,
    lsh_verified_near_dups,
)
from end_to_end_data_engineering_and_ml_system_spark.sources.catalog import load_table

THRESHOLD = 0.6


def _pairs(df):
    return {(r["id1"], r["id2"]) for r in df.collect()}


def test_lsh_verified_recall_and_precision(spark, sf_dir):
    # unpersist on exit: a cached full-width documents relation would leak
    # into the shared session and defeat column pruning in later plan tests
    docs = load_table(spark, sf_dir, "documents").cache()
    try:
        exact = _pairs(
            jaccard_pairs(docs, "doc_id", "text", n=3, threshold=THRESHOLD)
        )
        assert exact, "fixtures must contain near-dup pairs for this to mean anything"
        got = _pairs(
            lsh_verified_near_dups(
                docs, "doc_id", "text", num_hashes=8, rows_per_band=2, n=3,
                threshold=THRESHOLD,
            )
        )
        # the verify step re-checks exact Jaccard on candidates, so the
        # banding path can only MISS pairs, never invent them: precision 1.0
        assert got <= exact, got - exact
        recall = len(got & exact) / len(exact)
        print(f"LSH-verified recall@threshold={THRESHOLD}: {recall:.3f} "
              f"({len(got)}/{len(exact)} pairs)")
        # 4 bands x 2 rows: P(candidate | j=0.6) = 1-(1-0.36)^4 ~ 0.83, and
        # true pairs skew well above the threshold -> expect much better
        assert recall >= 0.8, recall
    finally:
        docs.unpersist()
