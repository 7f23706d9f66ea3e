"""As-of (most-recent-match) join — a custom operator Spark lacks natively.

Implemented as the scalable union-sort trick rather than a range cross join:

1. tag left (probe) and right (reference) rows, union them on aligned columns;
2. one window per key ordered by (time, tag): ``last(ref_struct,
   ignorenulls)`` carries the latest whole reference ROW forward onto each
   probe row (struct-level carry: a NULL inside a value column of the
   latest row stays NULL — true as-of semantics);
3. filter back to probe rows.

Cost: one shuffle on the key + a sort within partitions — same order as a
sort-merge join, no range explosion, no skew amplification beyond the key
distribution itself. This is how as-of joins stay tractable at 100 TB.

Right rows must be unique per (key, time) — pre-aggregate if not, or ties
make the match nondeterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    tolerance: str | None = None,
) -> DataFrame:
    """For each left row, append the ``value_cols`` of the right row with the
    greatest ``right_time`` ≤ ``left_time`` for the same ``key`` (nulls when
    no such row).

    ``tolerance`` (an interval string, e.g. ``"30 minutes"``) additionally
    nulls out matches older than ``left_time - tolerance`` — pandas
    ``merge_asof(tolerance=...)`` semantics, the attribution-window shape.
    The bound is applied AFTER the carry (the reference row's time rides
    along in the struct), so it stays one window pass — no extra join."""
    # carry the whole reference row as ONE struct: last(ignorenulls) then
    # skips only missing reference ROWS, never a NULL inside a value column
    # of the latest row (true as-of / DuckDB ASOF semantics)
    overlap = sorted(set(value_cols) & set(left.columns))
    if overlap:
        raise ValueError(
            f"asof_join value_cols {overlap} collide with left columns — "
            "the output would carry two identically-named columns "
            "(ambiguous downstream); alias the right side first"
        )
    carry_cols = list(value_cols)
    if tolerance is not None and right_time not in carry_cols:
        carry_cols.append(right_time)
    ref_struct = F.struct(*[F.col(c) for c in carry_cols])
    lt = left.select(
        F.col(key).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_probe"),
        F.struct(*left.columns).alias("__left"),
        F.lit(None).cast(right.select(ref_struct).schema[0].dataType).alias("__ref"),
    )
    # a reference row with NULL time cannot be "the most recent row <= t" —
    # unfiltered it sorts FIRST (NULLs first under asc) and would be carried
    # as the match into every earlier probe of its key
    rt = right.filter(F.col(right_time).isNotNull()).select(
        F.col(key).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_probe"),
        F.lit(None).cast(lt.schema["__left"].dataType).alias("__left"),
        ref_struct.alias("__ref"),
    )
    unioned = lt.unionByName(rt)
    # reference rows sort before probe rows at equal time (__is_probe asc),
    # so a match at exactly left_time counts
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t"), F.col("__is_probe"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried: Column = F.last(F.col("__ref"), ignorenulls=True).over(w).alias("__m")
    matched = unioned.select("*", carried).filter(F.col("__is_probe") == 1)
    if tolerance is not None:
        in_window = F.col("__m").getField(right_time) >= F.col("__t") - F.expr(
            f"INTERVAL {tolerance}"
        )
        matched = matched.withColumn(
            "__m", F.when(in_window, F.col("__m"))
        )
    return matched.select(
        F.col("__left.*"),
        *[F.col("__m").getField(c).alias(c) for c in value_cols],
    )
