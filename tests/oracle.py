"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a registry query on Spark and its oracle SQL on DuckDB over the same
parquet fixtures, then compares order-insensitively with columns sorted by
name — numeric columns with tolerance, everything else exactly.
"""

from __future__ import annotations

import math
import os
from typing import Any

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_run(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLES:
            path = os.path.join(sf_dir, f"{t}.parquet")
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
        return con.execute(sql).df()
    finally:
        con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            try:
                s = s.dt.tz_localize(None)
            except TypeError:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
    sort_cols = list(df.columns)
    return df.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)


def _value_eq(a: Any, b: Any) -> bool:
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-9)
    if isinstance(a, (list, np.ndarray)) or isinstance(b, (list, np.ndarray)):
        la, lb = list(a), list(b)
        return len(la) == len(lb) and all(_value_eq(x, y) for x, y in zip(la, lb))
    return a == b


def compare(spark_df, oracle_df: pd.DataFrame, rel_tol: float = 1e-9) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    errs: list[str] = []
    sp = spark_df.toPandas()
    if sorted(sp.columns) != sorted(oracle_df.columns):
        return [f"column mismatch: spark={sorted(sp.columns)} oracle={sorted(oracle_df.columns)}"]
    if len(sp) != len(oracle_df):
        return [f"row count mismatch: spark={len(sp)} oracle={len(oracle_df)}"]
    a, b = _normalize(sp), _normalize(oracle_df)
    for c in a.columns:
        sa, sb = a[c], b[c]
        if pd.api.types.is_float_dtype(sa) and pd.api.types.is_float_dtype(sb):
            ok = np.isclose(
                sa.to_numpy(), sb.to_numpy(), rtol=rel_tol, atol=1e-9, equal_nan=True
            )
            if not ok.all():
                i = int(np.argmin(ok))
                errs.append(
                    f"col {c}: {int((~ok).sum())} float mismatches, first at row {i}: "
                    f"spark={sa.iloc[i]!r} oracle={sb.iloc[i]!r}"
                )
        else:
            neq = [
                i
                for i in range(len(sa))
                if not _value_eq(sa.iloc[i], sb.iloc[i])
                and not (pd.isna(sa.iloc[i]) is True and pd.isna(sb.iloc[i]) is True)
            ]
            if neq:
                i = neq[0]
                errs.append(
                    f"col {c}: {len(neq)} mismatches, first at row {i}: "
                    f"spark={sa.iloc[i]!r} oracle={sb.iloc[i]!r}"
                )
    return errs
