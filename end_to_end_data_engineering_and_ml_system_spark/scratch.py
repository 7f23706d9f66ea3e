"""Scratch-space resolution for materialization and staging paths.

Several operators round-trip intermediate data through the filesystem
(plan-truncating parquet materialization in operators/flows_etl.py, the
micro-batch staging dir in streaming/pipeline.py, streaming checkpoints).
In local mode a ``tempfile`` path is fine, but on a real cluster the driver
and every executor must see the SAME path — a driver-local tmpdir silently
breaks the re-read (executors write their own local disks).

One session conf fixes all call sites at once:

    spark.conf.set("spark.e2e.scratchDir", "hdfs:///tmp/e2e-scratch")
    # or s3://bucket/scratch, or any shared POSIX mount

``scratch_root`` resolves that conf; callers join their own stable
subdirectories under it. When unset, callers fall back to a process-local
``tempfile`` location, which is documented as local-mode-only.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession

#: session conf naming a shared-filesystem scratch root (cluster mode)
SCRATCH_DIR_CONF = "spark.e2e.scratchDir"


def scratch_root(spark: SparkSession, subdir: str, local_default: str | None = None) -> str:
    """Resolve the scratch root for ``subdir``.

    Priority: ``spark.e2e.scratchDir`` session conf (shared FS, cluster-safe)
    joined with ``subdir``; else ``local_default`` if given; else a stable
    per-user tempdir (local mode only). The returned path is a *root* —
    callers create their own content under it and own idempotency/cleanup.
    """
    conf = spark.conf.get(SCRATCH_DIR_CONF, None)
    if conf:
        return conf.rstrip("/") + "/" + subdir
    if local_default is not None:
        return local_default
    return os.path.join(tempfile.gettempdir(), "e2e_spark_scratch", subdir)


def scratch_unique(spark: SparkSession, prefix: str) -> str:
    """A fresh, collision-free scratch directory path.

    Under the conf root when set (cluster-safe; path NOT created — the
    writer's own mkdirs/commit creates it); else a local
    ``tempfile.mkdtemp`` (which does create the directory). Uses ``uuid4``
    rather than timestamps so two concurrent jobs can never race on the
    same path.
    """
    import uuid

    conf = spark.conf.get(SCRATCH_DIR_CONF, None)
    name = f"{prefix}_{uuid.uuid4().hex}"
    if conf:
        return conf.rstrip("/") + "/" + name
    return tempfile.mkdtemp(prefix=prefix + "_")
