"""Distributed ALS matrix factorization — the recommendation trainer,
completing the workload families (relational, streaming, text/dedup,
similarity, supervised + clustering trainers, collaborative filtering).

Alternating least squares in its textbook distributed form (the same
public formulation MLlib's ALS implements, re-expressed on the DataFrame
API so the mechanics are visible) — and, unlike the other trainers in
this package, with the PARAMETERS THEMSELVES executor-resident: the
factor matrices are O(users + items), so the driver-held parameter
pattern that is correct for the 6-64-weight trainers would melt the
driver at catalog scale. Here NOTHING of O(entities) size ever leaves
the cluster:

- the RATINGS stay on the cluster, grouped by whichever side is being
  solved;
- the FACTORS are DataFrames ``(id long, f array<double>)``; each
  half-step is ``ratings ⋈ fixed-side factors`` (AQE broadcasts the
  factor side automatically while it is small; at catalog scale it
  becomes a plain shuffled hash join — either way, no driver transfer),
  then each entity's normal-equation terms (upper triangle of AᵀA and
  Aᵀr) are assembled by a codegen'd map-side-combined groupBy
  aggregation and ALL the k×k ridge systems (AᵀA + λI) x = Aᵀr are
  solved batched in one mapInPandas pass — one Python call per
  PARTITION, never per entity. The closed-form per-entity minimization
  cannot increase the regularized squared loss, so the loss sequence is
  non-increasing across half-steps, the pytest invariant;
- the LOSS is two joins (ratings ⋈ U ⋈ V) feeding one JVM hash
  aggregate; per-row e² is quantized onto an integer 1e-10 grid (a LONG)
  and summed as DECIMAL(38,0) — never a double, whose partials would
  drop low bits past 2^53 and break the bit-identical-across-
  partitionings guarantee the quantization exists to provide;
- determinism: init factors derive from md5 of (entity, dim) — no RNG —
  computed JVM-side with the exact same arithmetic as the original
  Python (int(md5[:8], 16) / 2^32), and the normal-equation terms are
  quantized to the same 1e-10 integer grid before summing, so the
  assembled systems — and therefore the factors — are bit-identical
  across partitionings with no accumulation-order pinning at all.

``fit_als_df`` is the scale path (factors in, factors out, as
DataFrames); ``fit_als`` is the small-scale convenience wrapper that
collects the final factors into dicts for tests and notebooks.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_Q = 1e10  # quantization grid (1e-10): loss terms + normal-equation sums


def init_factors_df(ids: DataFrame, k: int) -> DataFrame:
    """Deterministic md5 factor init, computed JVM-side: dim d of entity e
    is ``0.1 + 0.9 * int(md5(f"{e}:{d}")[:8], 16) / 2**32`` — bit-identical
    to the original driver-side Python init, with no RNG and no collect.
    ``ids`` must have a single LONG column named ``id``."""
    dim_expr = (
        "transform(sequence(0, {km1}), d -> "
        "0.1D + 0.9D * (cast(conv(substring(md5(concat(cast(id as string), "
        "':', cast(d as string))), 1, 8), 16, 10) as bigint) / 4294967296.0D)"
        ")"
    ).format(km1=k - 1)
    return ids.select("id", F.expr(dim_expr).alias("f"))


def _solve_side_df(
    ratings: DataFrame,
    solve_col: str,
    fixed_col: str,
    fixed_factors: DataFrame,
    k: int,
    reg: float,
) -> DataFrame:
    """One ALS half-step, fully on the cluster, with NO per-entity Python
    call: join the fixed side's factors onto the ratings, assemble each
    entity's normal-equation terms (the upper triangle of AᵀA and Aᵀr,
    k(k+1)/2 + k scalars) as a codegen'd JVM groupBy aggregation, then
    solve ALL entities' k×k ridge systems in one batched
    ``np.linalg.solve`` inside mapInPandas. Per-term products are
    quantized to the 1e-10 integer grid and summed as longs, so the
    assembled systems — and therefore the factors — are bit-identical on
    any partitioning without needing a per-entity accumulation order.
    This is the shape that survives 10⁸ entities: the expensive part is a
    map-side-combined hash aggregation; Python sees one Arrow batch per
    partition of the (entities × 44-scalar) table, not one call per
    entity."""
    joined = ratings.join(
        fixed_factors.withColumnRenamed("id", fixed_col), fixed_col
    ).select(solve_col, "rating", "f")
    q = F.lit(_Q)
    aggs = []
    for i in range(k):
        for j in range(i, k):
            aggs.append(
                F.sum(
                    F.round(
                        F.element_at("f", i + 1)
                        * F.element_at("f", j + 1)
                        * q
                    ).cast("long")
                ).alias(f"a_{i}_{j}")
            )
        aggs.append(
            F.sum(
                F.round(
                    F.col("rating") * F.element_at("f", i + 1) * q
                ).cast("long")
            ).alias(f"b_{i}")
        )
    g = joined.groupBy(F.col(solve_col).alias("id")).agg(*aggs)

    def solve_batch(batches):
        import pandas as pd

        eye = reg * np.eye(k)
        for pdf in batches:
            if not len(pdf):
                continue
            n = len(pdf)
            ata = np.empty((n, k, k))
            atr = np.empty((n, k))
            for i in range(k):
                for j in range(i, k):
                    v = pdf[f"a_{i}_{j}"].to_numpy(dtype=np.int64) / _Q
                    ata[:, i, j] = v
                    ata[:, j, i] = v
                atr[:, i] = pdf[f"b_{i}"].to_numpy(dtype=np.int64) / _Q
            x = np.linalg.solve(ata + eye, atr)
            yield pd.DataFrame(
                {"id": pdf["id"], "f": [row.tolist() for row in x]}
            )

    return g.mapInPandas(solve_batch, "id long, f array<double>")


def _dot(a, b):
    """JVM-side dot product of two array<double> columns; the zip_with +
    aggregate accumulation runs in index order, so the float result is a
    pure function of the two arrays (partitioning-independent)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _quantized_sum(df: DataFrame, row_expr) -> int:
    """Exact order-free sum of a per-row quantized contribution: each
    row's float is rounded onto the 1e-10 integer grid as a LONG, and the
    longs are summed as DECIMAL(38,0) — overflow-free and bit-identical
    on any partitioning. Returns the integer grid total."""
    row = df.select(
        F.sum(
            F.round(row_expr * F.lit(_Q)).cast("long").cast("decimal(38,0)")
        ).alias("s")
    ).first()
    return int(row["s"]) if row["s"] is not None else 0


def _loss_df(
    ratings: DataFrame,
    u: DataFrame,
    v: DataFrame,
    user_col: str,
    item_col: str,
    reg: float,
) -> float:
    """Regularized squared loss computed ENTIRELY JVM-side: ratings ⋈ U ⋈
    V for the data term, a scan of each factor table for the reg term —
    whole-stage-codegen projections feeding one hash aggregate each, no
    Python on the data path. Per-row contributions are quantized to the
    1e-10 integer grid before the exact decimal sum, so the loss is
    bit-identical on any partitioning."""
    j = (
        ratings.join(
            u.withColumnRenamed("id", user_col).withColumnRenamed("f", "uf"),
            user_col,
        )
        .join(
            v.withColumnRenamed("id", item_col).withColumnRenamed("f", "vf"),
            item_col,
        )
        .select("rating", "uf", "vf")
    )
    err = F.col("rating") - _dot(F.col("uf"), F.col("vf"))
    data_q = _quantized_sum(j, err * err)
    reg_expr = F.lit(reg) * _dot(F.col("f"), F.col("f"))
    reg_q = _quantized_sum(u, reg_expr) + _quantized_sum(v, reg_expr)
    return (data_q + reg_q) / _Q


@dataclass
class AlsFitResultDF:
    """Scale-path fit result: factors stay DataFrames (persisted)."""

    user_factors_df: DataFrame
    item_factors_df: DataFrame
    losses: list[float]  # after each half-step (U-solve, V-solve, ...)

    def unpersist(self) -> None:
        self.user_factors_df.unpersist()
        self.item_factors_df.unpersist()


@dataclass
class AlsFitResult:
    user_factors: dict
    item_factors: dict
    losses: list[float]  # after each half-step (U-solve, V-solve, ...)


def fit_als_df(
    ratings: DataFrame,
    user_col: str,
    item_col: str,
    k: int = 8,
    iters: int = 4,
    reg: float = 0.1,
) -> AlsFitResultDF:
    """``ratings`` needs (user_col, item_col, rating); ids must be LONG.
    Each iteration runs the user half-step then the item half-step,
    logging the regularized loss after each — exact alternating
    minimization, so the sequence never increases. Nothing of
    O(users + items) size ever touches the driver: factors are
    DataFrames end to end, each half-step's result is persisted and the
    previous generation unpersisted (the persist also truncates the
    recompute chain across iterations)."""
    ratings = ratings.select(
        F.col(user_col), F.col(item_col), F.col("rating")
    ).persist()
    try:
        v = init_factors_df(
            ratings.select(F.col(item_col).alias("id")).distinct(), k
        ).persist()
        v.count()
        u: DataFrame | None = None
        losses: list[float] = []
        for _ in range(iters):
            u_new = _solve_side_df(
                ratings, user_col, item_col, v, k, reg
            ).persist()
            u_new.count()
            if u is not None:
                u.unpersist()
            u = u_new
            losses.append(_loss_df(ratings, u, v, user_col, item_col, reg))
            v_new = _solve_side_df(
                ratings, item_col, user_col, u, k, reg
            ).persist()
            v_new.count()
            v.unpersist()
            v = v_new
            losses.append(_loss_df(ratings, u, v, user_col, item_col, reg))
        return AlsFitResultDF(
            user_factors_df=u, item_factors_df=v, losses=losses
        )
    finally:
        ratings.unpersist()


def fit_als(
    ratings: DataFrame,
    user_col: str,
    item_col: str,
    k: int = 8,
    iters: int = 4,
    reg: float = 0.1,
) -> AlsFitResult:
    """Small-scale convenience wrapper over ``fit_als_df``: identical
    training (same factors, same losses, bit for bit), with ONE terminal
    collect of the final factor tables into dicts for tests/notebooks.
    At catalog scale use ``fit_als_df`` and keep the factors distributed."""
    fit = fit_als_df(ratings, user_col, item_col, k=k, iters=iters, reg=reg)
    try:
        u = {
            r["id"]: np.array(r["f"])
            for r in fit.user_factors_df.collect()
        }
        v = {
            r["id"]: np.array(r["f"])
            for r in fit.item_factors_df.collect()
        }
    finally:
        fit.unpersist()
    return AlsFitResult(user_factors=u, item_factors=v, losses=fit.losses)
