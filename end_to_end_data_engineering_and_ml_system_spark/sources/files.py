"""File source/sink surface beyond the parquet catalog (SURVEY §2.1).

- **Permissive CSV scan** (S1/S2/S3): explicit schema + PERMISSIVE mode with
  a corrupt-record column — the distributed version of pandas'
  ``on_bad_lines='warn'`` fallback (simulate_network_traffic.py:30-52).
  Explicit schemas, never ``inferSchema`` (which scans the data twice and
  guesses — at 100 TB both are unacceptable).
- **Single-file CSV sink** (S9): ``coalesce(1)`` exactly like the reference
  (preprocess_cicids2017.py:23-35) — correct only for small summaries; the
  scale path is partitioned parquet, so this helper refuses above a row cap.
- **JSON metadata sidecar** (S12): the pickle replaced with an engine-
  portable JSON file written via Spark (no driver pickling).
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv_permissive(
    spark: SparkSession,
    path: str,
    schema: StructType,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """CSV scan with pinned schema; malformed lines land in ``corrupt_col``
    instead of killing the job or silently vanishing.

    Note: Spark refuses lazy queries that reference *only* the corrupt-record
    column (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — cache the
    frame before splitting good/bad rows."""
    from pyspark.sql.types import StringType, StructField

    full = StructType(
        [*schema.fields, StructField(corrupt_col, StringType(), True)]
    )
    return (
        spark.read.option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .schema(full)
        .csv(path)
    )


def write_single_csv(df: DataFrame, dest_file: str, max_rows: int = 1_000_000) -> str:
    """Single-file CSV output with the part-file move the reference does by
    hand. Guarded: one file means one writer — refuse at scale."""
    n = df.count()
    if n > max_rows:
        raise ValueError(
            f"{n} rows > {max_rows}: single-file CSV is a driver-scale sink; "
            "write partitioned parquet instead"
        )
    tmp = dest_file + ".tmpdir"
    df.coalesce(1).write.mode("overwrite").option("header", True).csv(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.csv"))[0]
    shutil.move(part, dest_file)
    shutil.rmtree(tmp)
    return dest_file


def write_metadata_sidecar(df: DataFrame, dest_dir: str) -> str:
    """Small-table metadata sink (scaler stats, row counts) as JSON lines —
    the portable replacement for the reference's pickle (S12)."""
    df.coalesce(1).write.mode("overwrite").json(dest_dir)
    return dest_dir


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """JSON-lines scan with pinned schema — the interchange format training
    corpora actually ship in. Same contract as the CSV scan: PERMISSIVE mode
    with a corrupt-record column, never schema inference (a 100 TB corpus
    cannot afford the extra inference pass, and drifting inferred types break
    downstream casts silently)."""
    from pyspark.sql.types import StringType, StructField

    full = StructType(
        [*schema.fields, StructField(corrupt_col, StringType(), True)]
    )
    return (
        spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .schema(full)
        .json(path)
    )


def write_jsonl(df: DataFrame, dest_dir: str, partitions: int | None = None) -> str:
    """Partitioned JSON-lines sink (one file per task — the scale shape;
    readers glob the directory). ``partitions`` only coalesces down for
    small outputs; it never repartitions up, so no extra shuffle."""
    out = df.coalesce(partitions) if partitions else df
    out.write.mode("overwrite").json(dest_dir)
    return dest_dir
