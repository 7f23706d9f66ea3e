"""Scale-linearity probe: run selected operators on a 1x and an Nx
replicated corpus and print wall times — evidence that the distributed
shapes scale linearly rather than quadratically.

Replication shifts ids so replicas are distinct documents/vectors (the
pathological case for dedup operators: every shingle's doc-frequency
multiplies by N).

Usage: python tools/scale_probe.py [N] [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def replicate(df, id_col: str, n: int, stride: int = 10_000_000):
    out = None
    for i in range(n):
        part = df.withColumn(id_col, F.col(id_col) + F.lit(i * stride))
        out = part if out is None else out.unionByName(part)
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from end_to_end_data_engineering_and_ml_system_spark.operators.dedup import (
        edit_distance_pairs,
        lsh_verified_near_dups,
    )
    from end_to_end_data_engineering_and_ml_system_spark.operators.graph import (
        dedup_cluster_labels,
    )
    from end_to_end_data_engineering_and_ml_system_spark.session import get_spark
    from end_to_end_data_engineering_and_ml_system_spark.sources.catalog import (
        load_table,
    )

    spark = get_spark(app_name="scale-probe", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")

    def probe(name, fn):
        fn(docs).count()  # warm 1x
        t0 = time.perf_counter()
        fn(docs).count()
        t1 = time.perf_counter() - t0
        big = replicate(docs, "doc_id", n)
        t0 = time.perf_counter()
        fn(big).count()
        tn = time.perf_counter() - t0
        print(
            f"{name}: 1x={t1:.2f}s {n}x={tn:.2f}s ratio={tn / t1:.1f} "
            f"(linear would be ~{n})"
        )

    probe(
        "edit_distance_pairs",
        lambda d: edit_distance_pairs(
            d, "doc_id", "text", extra_block_cols=("lang",)
        ),
    )
    probe(
        "lsh_verified_near_dups",
        lambda d: lsh_verified_near_dups(
            d, "doc_id", "text", num_hashes=8, rows_per_band=2, n=3, threshold=0.6
        ),
    )
    probe(
        "cluster_labels",
        lambda d: dedup_cluster_labels(
            d,
            lsh_verified_near_dups(
                d, "doc_id", "text", num_hashes=8, rows_per_band=2,
                n=3, threshold=0.6,
            ),
            "doc_id",
        ),
    )


if __name__ == "__main__":
    main()
