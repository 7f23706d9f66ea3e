"""Schema-contract gate: publish-side compatibility between table
versions (pure metadata, no scan)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from end_to_end_data_engineering_and_ml_system_spark.sources.catalog import load_table
from end_to_end_data_engineering_and_ml_system_spark.sources.contracts import (
    SchemaCompatibilityError,
    assert_compatible,
    diff_report,
    schema_diff,
)


def test_diff_classifies_all_change_kinds(spark, sf_dir):
    cur = load_table(spark, sf_dir, "events")
    new = (
        cur.drop("props")                                   # removed
        .withColumn("value", F.col("value").cast("float"))  # type_changed
        .withColumn("ingest_day", F.to_date("ts"))          # added
    )
    diff = {d["column"]: d for d in schema_diff(cur, new)}
    assert diff["props"]["kind"] == "removed"
    assert diff["value"]["kind"] == "type_changed"
    assert (diff["value"]["old_type"], diff["value"]["new_type"]) == (
        "double",
        "float",
    )
    assert diff["ingest_day"]["kind"] == "added"
    assert len(diff) == 3  # untouched columns are not reported


def test_gate_blocks_breaking_allows_additive(spark, sf_dir):
    cur = load_table(spark, sf_dir, "events")
    additive = cur.withColumn("ingest_day", F.to_date("ts"))
    assert [d["kind"] for d in assert_compatible(cur, additive)] == ["added"]
    with pytest.raises(SchemaCompatibilityError, match="props: removed"):
        assert_compatible(cur, cur.drop("props"))
    with pytest.raises(SchemaCompatibilityError, match="double -> float"):
        assert_compatible(
            cur, cur.withColumn("value", F.col("value").cast("float"))
        )
    with pytest.raises(SchemaCompatibilityError, match="added"):
        assert_compatible(cur, additive, allow_added=False)


def test_identical_schemas_are_clean(spark, sf_dir):
    cur = load_table(spark, sf_dir, "events")
    assert schema_diff(cur, cur.select(*reversed(cur.columns))) == []
    assert diff_report(spark, cur, cur).count() == 0


def test_tmpfs_scratch_guard():
    """The tmpfs shuffle-scratch helper must refuse low-space tmpfs and
    never crash; when it returns a path it must exist and be writable."""
    from end_to_end_data_engineering_and_ml_system_spark import session as S

    p = S._tmpfs_scratch()
    if p is not None:
        import os

        assert os.path.isdir(p) and os.access(p, os.W_OK)
    # low-space refusal: force the threshold above total RAM
    orig = S._SCRATCH_MIN_FREE
    try:
        S._SCRATCH_MIN_FREE = 1 << 50
        assert S._tmpfs_scratch() is None
    finally:
        S._SCRATCH_MIN_FREE = orig


def test_scratch_reaper_files_and_staleness(tmp_path, monkeypatch):
    """The reaper must delete plain-file debris (rmtree alone skips it),
    keep fresh entries while a JVM is alive, and reap stale ones."""
    import os
    import time

    from end_to_end_data_engineering_and_ml_system_spark import session as S

    scratch = tmp_path / "scratch"
    scratch.mkdir()
    monkeypatch.setattr(S, "_SCRATCH", str(scratch))
    stale_dir = scratch / "blockmgr-dead"
    stale_dir.mkdir()
    (stale_dir / "shuffle.data").write_bytes(b"x")
    stale_file = scratch / "stray.tmp"
    stale_file.write_bytes(b"x")
    fresh_dir = scratch / "blockmgr-live"
    fresh_dir.mkdir()
    old = time.time() - S._SCRATCH_STALE_SECS - 60
    os.utime(stale_dir, (old, old))
    os.utime(stale_file, (old, old))
    # JVM alive: only stale entries go
    monkeypatch.setattr(S, "_jvm_alive", lambda: True)
    S._reap_scratch()
    assert not stale_dir.exists() and not stale_file.exists()
    assert fresh_dir.exists()
    # no JVM: everything goes
    monkeypatch.setattr(S, "_jvm_alive", lambda: False)
    S._reap_scratch()
    assert not fresh_dir.exists()
