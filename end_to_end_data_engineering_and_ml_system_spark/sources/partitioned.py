"""Partitioned & bucketed parquet layout — the 100 TB storage story.

The reference writes flat single-file CSVs (preprocess_cicids2017.py:23-35,
316-317); at scale the same tables must be laid out so queries touch only
the data they need:

- **Hive-style partitioning** by a low-cardinality derived key (e.g. event
  date): a predicate on the partition column prunes whole directories at
  plan time — the scan's ``PartitionFilters`` carries the predicate and
  unmatched files are never opened.
- **Bucketing** by a high-cardinality join key: both sides of a recurring
  join pre-shuffled into the same bucket layout join with ZERO runtime
  exchanges (``SortMergeJoin`` over bucketed scans, no ``Exchange``
  children) — the shuffle is paid once at write time, amortized over every
  subsequent join.
- **Salting** (operators/relational.py::salted_join) handles skewed keys
  that neither layout fixes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    dest_dir: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Hive-style partitioned parquet. Partition columns should be
    low-cardinality (a date, a class, a shard id) — one directory per
    value; high-cardinality keys belong in bucketing instead."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(dest_dir)


def overwrite_partitions_dynamic(
    df: DataFrame, dest_dir: str, partition_cols: list[str]
) -> None:
    """Idempotent backfill: overwrite ONLY the Hive partitions present in
    ``df``, leaving every other partition untouched — the correct-and-rerun
    primitive for daily pipelines (static overwrite mode would wipe the
    whole dataset; append mode would duplicate the corrected rows).
    Scoped via the conf so the session default is restored afterwards."""
    spark = df.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, "static")
    try:
        spark.conf.set(key, "dynamic")
        df.write.mode("overwrite").partitionBy(*partition_cols).parquet(
            dest_dir
        )
    finally:
        spark.conf.set(key, prev)


def read_pruned(
    spark: SparkSession, src_dir: str, predicate: str
) -> DataFrame:
    """Read with a partition predicate. Catalyst turns the predicate into
    ``PartitionFilters`` — verify with ``scan_partition_filters``."""
    return spark.read.parquet(src_dir).filter(predicate)


def scan_partition_filters(df: DataFrame) -> str:
    """The PartitionFilters clause of the plan's scan node (empty string if
    no pruning applies) — lets tests assert pruning instead of hoping."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "PartitionFilters" in line:
            start = line.index("PartitionFilters")
            return line[start:].split("]", 1)[0] + "]"
    return ""


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 8,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table (bucketing requires ``saveAsTable``; plain
    ``.parquet(path)`` cannot record bucket metadata)."""
    w = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table_name)


def count_exchanges(df: DataFrame) -> int:
    """Number of *shuffle* Exchange nodes in the executed plan — a bucketed
    co-located join must show 0. Broadcast exchanges don't count: they move
    a small table, not the data."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line
        and "ReusedExchange" not in line
        and "BroadcastExchange" not in line
    )


def compact_partitioned_dataset(
    spark: SparkSession,
    src_dir: str,
    dest_dir: str,
    partition_cols: list[str],
    target_file_bytes: int = 128 * 1024 * 1024,
) -> None:
    """Small-file compaction — the maintenance pass every long-lived 100 TB
    dataset needs: streaming sinks and fine-grained partition writes leave
    thousands of kB-sized parquet files whose per-file open/footer cost
    eventually dominates scans.

    Rewrites the dataset with ~``target_file_bytes`` per output file in each
    Hive partition, preserving the layout. Per-partition sizes come from the
    scan's own file metadata (``input_file_name``/``input_file_block_length``)
    — computed distributedly, never a driver-side directory walk — and the
    files-per-partition plan rides a broadcast join, not a generated CASE
    chain (a thousand-partition dataset would otherwise blow up the analyzer;
    see NOTES.md on superlinear constraint propagation). Output file count is
    enforced by hash-repartitioning on (partition key, spread), where spread
    fans a partition out only when it needs more than one file."""
    import os

    if os.path.abspath(src_dir) == os.path.abspath(dest_dir):
        # parquet overwrite deletes the destination before the read plan
        # finishes scanning it — in-place compaction needs a staging dir
        raise ValueError("compaction cannot write in place; use a staging dest_dir")
    df = spark.read.parquet(src_dir)
    sizes = (
        df.select(
            *partition_cols,
            F.input_file_name().alias("__f"),
            F.input_file_block_length().alias("__len"),
        )
        .groupBy(*partition_cols, "__f")
        .agg(F.first("__len").alias("__len"))
        .groupBy(*partition_cols)
        .agg(F.sum("__len").alias("__bytes"))
    )
    plan = sizes.withColumn(
        "__n_out",
        F.greatest(
            F.lit(1), F.ceil(F.col("__bytes") / F.lit(target_file_bytes))
        ).cast("int"),
    ).drop("__bytes")
    (
        df.join(F.broadcast(plan), partition_cols)
        .withColumn("__spread", (F.rand(42) * F.col("__n_out")).cast("int"))
        .repartition(*[F.col(c) for c in partition_cols], F.col("__spread"))
        .drop("__n_out", "__spread")
        .write.mode("overwrite")
        .partitionBy(*partition_cols)
        .parquet(dest_dir)
    )
