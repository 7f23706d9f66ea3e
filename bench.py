"""Benchmark harness: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is fully materialized via a count-style action that forces every
operator (no collect of the data to the driver).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from end_to_end_data_engineering_and_ml_system_spark.plans.registry import (
        bench_queries,
    )
    from end_to_end_data_engineering_and_ml_system_spark.session import get_spark

    spark = get_spark(app_name="e2e-spark-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    qs = bench_queries()
    timings: dict[str, float] = {}
    # full warm pass first (JIT, codegen cache, parquet footers, streaming
    # staging), then two timed passes per query taking the MIN: steady-state
    # plan cost, not first-touch warmup or ambient-load noise (the round-2
    # driver run measured one query 2.7x its reproducible idle wall because
    # the bench shares the container with the correctness sweep) — applied
    # uniformly to every query
    for name, q in qs.items():
        try:
            q.build(spark, sf_dir).count()
        except Exception as e:  # noqa: BLE001 — warm failures surface in the timed pass
            print(f"# warm {name} failed: {e}", file=sys.stderr)

    for name, q in qs.items():
        best, n = float("inf"), 0
        for _ in range(2):
            t0 = time.perf_counter()
            df = q.build(spark, sf_dir)
            n = df.count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    out = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf else None,
        # methodology marker: rounds 1-2 timed a single cold-ish pass;
        # round 3 onward reports min-of-two after a warm pass (systematically
        # lower floor). Cross-round comparisons are valid from r3 forward;
        # r1/r2 numbers are NOT directly comparable to this series.
        "methodology": "warm+min-of-2 (since r3)",
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
