"""SparkSession factory tuned for the engine.

Local testing runs ``local[$SPARK_GRAFT_CPUS]`` in a single JVM; the configs
below are the ones that matter identically on a real multi-executor cluster:
AQE (runtime re-planning, skew-join handling, partition coalescing), Arrow
(vectorized Python interchange), and a shuffle-partition count sized to the
parallelism rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "e2e-spark-engine",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = cpus or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    # Local-mode shuffle scratch on tmpfs when available: this container's
    # /tmp sits on a virtio disk whose throughput wanders between sessions
    # (measured 10-15% on the shuffle-heavy dedup family; NOTES round 9),
    # while /dev/shm is RAM-backed. Real clusters manage spark.local.dir
    # themselves — env/explicit conf always wins here.
    if (
        "SPARK_LOCAL_DIRS" not in os.environ
        and os.access("/dev/shm", os.W_OK)
        and "spark.local.dir" not in (extra_conf or {})
    ):
        builder = builder.config("spark.local.dir", "/dev/shm/spark-scratch")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
