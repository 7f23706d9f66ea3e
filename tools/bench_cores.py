"""Core-scaling bench: show that the compute-heavy dedup/graph family
actually scales with cores once the input is big enough to dominate fixed
job overhead.

Motivation (r15 verdict): at sf0.1 every bench query is sub-2s and
job-overhead-bound — the 8-core vs 32-core ratios all read ~1, so the
driver's own scaling block cannot measure the engine. This tool stages a
replicated MULTI-FILE copy of the sf0.1 fixtures (deterministic id shifts,
written as many parquet files so scans have real splits) and times the
dedup/graph operators at two core counts in FRESH processes (a JVM cannot
change its local[N] master). Nothing here touches the driver's bench
contract: bench.py is unchanged, the staged data lives in scratch and is
rebuilt from the fixtures on every invocation (no cross-run artifacts).

Usage:
  python tools/bench_cores.py                    # orchestrate: stage, run 8 and 32, print JSON
  python tools/bench_cores.py --child CPUS DIR   # internal: one core count

Output: one JSON line {"replicate": N, "queries": {name: {"c8": s, "c32": s,
"speedup_8to32": r}}, ...} — committed as BENCH_SCALE_r16.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPLICATE = int(os.environ.get("SPARK_GRAFT_SCALE_REPLICATE", "8"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FILES = 64  # staged parquet file count: real splits for every scan
CORE_COUNTS = (8, 32)


def _stage(spark, out_dir: str) -> None:
    """Replicate documents + lineitem REPLICATE times with shifted ids and
    write them as FILES-file parquet — multi-row-group inputs whose scans
    parallelize without any repartition-after-read crutch."""
    from pyspark.sql import functions as F

    from end_to_end_data_engineering_and_ml_system_spark.sources.catalog import (
        load_table,
    )

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    stride = 10_000_000
    reps = None
    for i in range(REPLICATE):
        part = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * stride))
        reps = part if reps is None else reps.unionByName(part)
    reps.repartition(FILES).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )
    reps = None
    for i in range(REPLICATE):
        # shift BOTH keys: shifted orders alone would multiply edge support
        # on a fixed-size graph (pagerank's per-iteration work would not
        # grow at all); disjoint partkey ranges make REPLICATE disjoint
        # graph copies, so nodes/edges — and the iteration joins — scale
        part = li.select(
            (F.col("l_orderkey") + F.lit(i * stride)).alias("l_orderkey"),
            (F.col("l_partkey") + F.lit(i * stride)).alias("l_partkey"),
        )
        reps = part if reps is None else reps.unionByName(part)
    reps.repartition(FILES).write.mode("overwrite").parquet(
        os.path.join(out_dir, "lineitem.parquet")
    )


def _queries(spark, data_dir: str):
    """The dedup/graph family over the staged tables. Returns
    {name: build_fn} where build_fn() -> DataFrame."""
    from pyspark.sql import functions as F

    from end_to_end_data_engineering_and_ml_system_spark.operators.dedup import (
        lsh_verified_near_dups,
    )
    from end_to_end_data_engineering_and_ml_system_spark.operators.graph import (
        connected_components,
        pagerank,
    )
    from end_to_end_data_engineering_and_ml_system_spark.plans.queries_graph_retrieval import (  # noqa: E501
        copurchase_edges_from_baskets,
    )

    docs = spark.read.parquet(os.path.join(data_dir, "documents.parquet"))
    li = spark.read.parquet(os.path.join(data_dir, "lineitem.parquet"))

    def verified():
        return lsh_verified_near_dups(docs, "doc_id", "text")

    def dedup_clusters():
        pairs = lsh_verified_near_dups(docs, "doc_id", "text").select(
            "id1", "id2"
        )
        return connected_components(
            pairs, "id1", "id2", assume_distinct=True
        ).groupBy("comp").count()

    def copurchase_pagerank():
        po = li.select(
            F.col("l_orderkey").alias("okey"),
            F.col("l_partkey").cast("long").alias("part"),
        )
        edges = copurchase_edges_from_baskets(po, keep_weight=False)
        r = pagerank(
            edges,
            iters=3,
            damping=0.85,
            assume_distinct=True,
            assume_symmetric=True,
        )
        return r.orderBy(F.col("rank").desc(), "id").limit(20)

    return {
        "lsh_verified_near_dups_x{}".format(REPLICATE): verified,
        "dedup_clusters_x{}".format(REPLICATE): dedup_clusters,
        "copurchase_pagerank_x{}".format(REPLICATE): copurchase_pagerank,
    }


def child(cpus: int, data_dir: str) -> None:
    from end_to_end_data_engineering_and_ml_system_spark.operators.relational import (  # noqa: E501
        release_rank_caches,
    )
    from end_to_end_data_engineering_and_ml_system_spark.session import (
        get_spark,
    )

    spark = get_spark(app_name=f"bench-cores-{cpus}", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, float] = {}
    for name, build in _queries(spark, data_dir).items():
        walls = []
        for _ in range(3):  # pass 1 warms; min of the last 2
            t0 = time.perf_counter()
            n = build().count()
            walls.append(time.perf_counter() - t0)
            release_rank_caches(blocking=True)
        out[name] = round(min(walls[1:]), 3)
        print(f"# c{cpus} {name}: {out[name]:.3f}s ({n} rows)", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), sys.argv[3])
        return

    from end_to_end_data_engineering_and_ml_system_spark.session import (
        get_spark,
    )

    data_dir = f"/tmp/bench_cores_stage_{os.getpid()}"
    spark = get_spark(app_name="bench-cores-stage", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    _stage(spark, data_dir)
    spark.stop()

    per_cpu: dict[int, dict[str, float]] = {}
    for cpus in CORE_COUNTS:
        env = dict(os.environ)
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", str(cpus), data_dir],
            capture_output=True,
            text=True,
            env=env,
            check=True,
        )
        sys.stderr.write(r.stderr[-2000:])
        per_cpu[cpus] = json.loads(r.stdout.strip().splitlines()[-1])

    lo, hi = CORE_COUNTS
    queries = {
        name: {
            f"c{lo}": per_cpu[lo][name],
            f"c{hi}": per_cpu[hi][name],
            f"speedup_{lo}to{hi}": round(per_cpu[lo][name] / per_cpu[hi][name], 2),
        }
        for name in per_cpu[lo]
    }
    print(
        json.dumps(
            {
                "metric": "core_scaling_dedup_graph_family",
                "replicate": REPLICATE,
                "staged_files": FILES,
                "sf_source": SF_DIR,
                "core_counts": list(CORE_COUNTS),
                "queries": queries,
            }
        )
    )
    import shutil

    shutil.rmtree(data_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
