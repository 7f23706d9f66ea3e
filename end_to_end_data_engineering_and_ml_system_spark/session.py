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

_SCRATCH = "/dev/shm/spark-scratch"
_SCRATCH_MIN_FREE = 16 * 2**30  # below this, shuffle spill on RAM is a hazard


def _jvm_alive() -> bool:
    """Best-effort: is any java process running? (Linux /proc scan.)"""
    try:
        for pid in os.listdir("/proc"):
            if not pid.isdigit():
                continue
            try:
                with open(f"/proc/{pid}/comm") as fh:
                    if fh.read().strip() == "java":
                        return True
            except OSError:
                continue
    except OSError:
        return True  # can't tell — assume alive, skip cleanup
    return False


_SCRATCH_STALE_SECS = 24 * 3600  # no local session legitimately runs a day


def _reap_scratch(now: float | None = None) -> None:
    """Remove scratch debris left by killed sessions. Everything goes
    when no JVM is alive; otherwise only entries untouched for
    ``_SCRATCH_STALE_SECS`` (a live session's dirs are always younger).
    Handles plain files too (``rmtree`` alone silently skips them).
    Caveat: the liveness check scans THIS pid namespace — do not point
    multiple containers at one shared /dev/shm scratch."""
    import shutil
    import time

    if not os.path.isdir(_SCRATCH):
        return
    now = time.time() if now is None else now
    reap_all = not _jvm_alive()
    for entry in os.listdir(_SCRATCH):
        path = os.path.join(_SCRATCH, entry)
        try:
            if not reap_all and now - os.path.getmtime(path) < _SCRATCH_STALE_SECS:
                continue
            if os.path.isdir(path) and not os.path.islink(path):
                shutil.rmtree(path, ignore_errors=True)
            else:
                os.remove(path)
        except OSError:
            continue


def _tmpfs_scratch() -> str | None:
    """RAM-backed shuffle scratch dir, or None to keep Spark's default.
    Reaps debris from killed sessions (see ``_reap_scratch``) and refuses
    tmpfs when free space is low — shuffle spill must never exhaust RAM
    just to dodge a slow disk."""
    try:
        if not os.access("/dev/shm", os.W_OK):
            return None
        import shutil

        _reap_scratch()
        if shutil.disk_usage("/dev/shm").free < _SCRATCH_MIN_FREE:
            return None
        os.makedirs(_SCRATCH, exist_ok=True)
        return _SCRATCH
    except OSError:
        return None


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
    # themselves — env/explicit conf always wins here. Safety: a killed
    # session can't clean its scratch, and tmpfs debris is RAM — so reap
    # leftovers when no JVM is alive, and fall back to the disk default
    # when tmpfs free space is low.
    if (
        "SPARK_LOCAL_DIRS" not in os.environ
        and "spark.local.dir" not in (extra_conf or {})
    ):
        scratch = _tmpfs_scratch()
        if scratch:
            builder = builder.config("spark.local.dir", scratch)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
