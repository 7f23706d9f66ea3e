"""Every registered query with an oracle must match DuckDB on the fixtures.

This mirrors the driver's CORRECTNESS gate (row-count + schema +
order-insensitive value compare) at sf0.001 for speed; the driver runs the
same comparison at sf0.01.
"""

from __future__ import annotations

import pytest

from end_to_end_data_engineering_and_ml_system_spark.plans.registry import all_queries

from .oracle import compare, duckdb_run

QUERIES = all_queries()
WITH_ORACLE = sorted(n for n, q in QUERIES.items() if q.oracle is not None)
ROWS_ONLY = sorted(n for n, q in QUERIES.items() if q.oracle is None)

# A green oracle row on an EMPTY result proves nothing (0 == 0 matched for
# the round-2 range join whose date domains never overlapped). Every query
# must therefore return rows on the fixtures; a query that is legitimately
# empty at small SF goes here with a reason, so emptiness is always a
# conscious, reviewed decision.
MAY_BE_EMPTY: dict[str, str] = {}


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, sf_dir, name):
    q = QUERIES[name]
    spark_df = q.build(spark, sf_dir)
    oracle_df = duckdb_run(q.oracle, sf_dir)
    errs = compare(spark_df, oracle_df)
    assert not errs, f"{name}: " + "; ".join(errs)
    if name not in MAY_BE_EMPTY:
        assert spark_df.count() > 0, (
            f"{name}: empty result — the oracle match is vacuous. Make the "
            "query non-empty on the fixtures or add it to MAY_BE_EMPTY with "
            "a reason."
        )


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, sf_dir, name):
    q = QUERIES[name]
    df = q.build(spark, sf_dir)
    assert len(df.schema.fields) > 0
    if name not in MAY_BE_EMPTY:
        assert df.count() > 0, (
            f"{name}: empty result — a rows-only query that returns nothing "
            "verifies nothing. Make it non-empty on the fixtures or add it "
            "to MAY_BE_EMPTY with a reason."
        )
