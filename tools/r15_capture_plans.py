"""Capture raw `.explain(formatted)` for every bench query into
plans/r15/<query>_<tag>.txt (tag = before/after). Streaming-tagged queries
return a memory-sink scan, so the streaming plan itself is not capturable
here — a marker file records that.

Usage: python tools/r15_capture_plans.py before|after [query ...]
"""

from __future__ import annotations

import os
import sys

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_DIR = os.path.join(ROOT, "plans", "r15")


def main() -> None:
    tag = sys.argv[1]
    only = set(sys.argv[2:])
    sys.path.insert(0, ROOT)
    from end_to_end_data_engineering_and_ml_system_spark.plans.registry import (
        bench_queries,
    )
    from end_to_end_data_engineering_and_ml_system_spark.session import get_spark

    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark(app_name=f"r15-plans-{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name, q in bench_queries().items():
        if only and name not in only:
            continue
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        if "streaming" in q.tags:
            with open(path, "w") as f:
                f.write(
                    "(streaming query: the returned frame is the memory-sink "
                    "scan; the micro-batch plan is exercised by "
                    "tests/test_streaming.py equivalence runs)\n"
                )
            continue
        df = q.build(spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(mode)
        with open(path, "w") as f:
            f.write(plan)
        from end_to_end_data_engineering_and_ml_system_spark.operators.relational import (  # noqa: E501
            release_rank_caches,
        )

        release_rank_caches()
        print(name, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
