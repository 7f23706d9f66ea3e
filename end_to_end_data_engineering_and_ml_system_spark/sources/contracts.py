"""Schema contracts: diff and compatibility gate between table versions.

The publish-side governance check a pipeline runs before replacing a
snapshot its consumers read: what columns appeared, vanished, or changed
type — and whether any of that BREAKS the contract (removals and type
changes do; additions are backward-compatible). Pure schema metadata:
no data is scanned, so the gate costs nothing at any table size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class SchemaCompatibilityError(ValueError):
    """The proposed schema breaks consumers of the current one."""


def _fields(df: DataFrame) -> dict[str, str]:
    return {f.name: f.dataType.simpleString() for f in df.schema.fields}


def schema_diff(current: DataFrame, proposed: DataFrame) -> list[dict]:
    """One record per changed column: ``kind`` in added / removed /
    type_changed, with old/new types where applicable. Column order
    changes are NOT flagged (consumers select by name)."""
    cur, new = _fields(current), _fields(proposed)
    out: list[dict] = []
    for name in sorted(set(cur) | set(new)):
        if name not in cur:
            out.append({"column": name, "kind": "added", "old_type": None,
                        "new_type": new[name]})
        elif name not in new:
            out.append({"column": name, "kind": "removed",
                        "old_type": cur[name], "new_type": None})
        elif cur[name] != new[name]:
            out.append({"column": name, "kind": "type_changed",
                        "old_type": cur[name], "new_type": new[name]})
    return out


def diff_report(
    spark: SparkSession, current: DataFrame, proposed: DataFrame
) -> DataFrame:
    """The diff as a DataFrame for writing next to the published table."""
    schema = "column string, kind string, old_type string, new_type string"
    rows = [
        (d["column"], d["kind"], d["old_type"], d["new_type"])
        for d in schema_diff(current, proposed)
    ]
    return spark.createDataFrame(rows, schema)


def assert_compatible(
    current: DataFrame,
    proposed: DataFrame,
    allow_added: bool = True,
) -> list[dict]:
    """Raise :class:`SchemaCompatibilityError` if the proposed schema
    breaks the current contract (column removals or type changes; and,
    with ``allow_added=False``, any change at all). Returns the diff when
    compatible, so callers can log the benign additions."""
    diff = schema_diff(current, proposed)
    breaking = [
        d
        for d in diff
        if d["kind"] in ("removed", "type_changed")
        or (not allow_added and d["kind"] == "added")
    ]
    if breaking:
        detail = "; ".join(
            f"{d['column']}: {d['kind']}"
            + (
                f" ({d['old_type']} -> {d['new_type']})"
                if d["kind"] == "type_changed"
                else ""
            )
            for d in breaking
        )
        raise SchemaCompatibilityError(f"breaking schema changes: {detail}")
    return diff
