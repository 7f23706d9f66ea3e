"""Deterministic numeric aggregate helpers.

Floating-point sums depend on accumulation order, which differs between
engines (and between runs under AQE). For oracle-comparable results we
aggregate through ``DECIMAL(28,10)`` — exact, order-independent — then cast
back to double. The matching DuckDB SQL pattern is
``CAST(SUM(CAST(x AS DECIMAL(28,10))) AS DOUBLE)``.

This also reflects the 100 TB stance: a metric that changes value when the
partitioning changes is not reproducible at scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(28,10)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dec_sum(col: Column | str, alias: str) -> Column:
    """Order-independent sum of a double column, returned as double."""
    return F.sum(_c(col).cast(DEC)).cast("double").alias(alias)


def dec_avg(col: Column | str, alias: str) -> Column:
    """Order-independent mean: exact decimal sum / non-null count."""
    c = _c(col)
    return (F.sum(c.cast(DEC)).cast("double") / F.count(c)).alias(alias)


def sql_dec_sum(expr: str, alias: str) -> str:
    """DuckDB-side mirror of :func:`dec_sum` for oracle strings."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(28,10))) AS DOUBLE) AS {alias}"


def sql_dec_avg(expr: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(28,10))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )
