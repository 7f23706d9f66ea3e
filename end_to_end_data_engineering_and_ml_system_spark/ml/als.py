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
  then ``groupBy(entity).applyInPandas`` assembles and solves that
  entity's normal equations (AᵀA + λI) x = Aᵀr in closed form, which
  cannot increase the regularized squared loss — so the loss sequence is
  non-increasing across half-steps, the pytest invariant;
- the LOSS is two joins (ratings ⋈ U ⋈ V) + a mapInPandas partial sum;
  per-row e² is quantized to an integer 1e-10 grid and the partials are
  carried as exact 128-bit integers split across two LONG columns (never
  a double — a double partial drops low bits past 2^53, breaking the
  bit-identical-across-partitionings guarantee the quantization exists
  to provide), summed exactly as Python ints on the driver (a handful of
  per-partition rows, not data);
- determinism: init factors derive from md5 of (entity, dim) — no RNG —
  computed JVM-side with the exact same arithmetic as the original
  Python (int(md5[:8], 16) / 2^32), and each per-entity solve sorts its
  ratings by the counterpart id first, fixing the float accumulation
  order so refits are bit-identical across partitionings.

``fit_als_df`` is the scale path (factors in, factors out, as
DataFrames); ``fit_als`` is the small-scale convenience wrapper that
collects the final factors into dicts for tests and notebooks.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_Q = 1e10  # loss quantization grid (1e-10), shared by data + reg terms
_SPLIT = 1 << 62  # partial sums ride as (high, low) longs: s = high*2^62 + low


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
    """One ALS half-step, fully on the cluster: join the fixed side's
    factors onto the ratings, then per-entity closed-form ridge solve over
    that entity's ratings (sorted by counterpart id for a fixed
    accumulation order). Returns the solved side as (id, f)."""

    def solve(pdf):
        import pandas as pd

        pdf = pdf.sort_values(fixed_col)
        a = np.array([list(v) for v in pdf["f"]])
        r = pdf["rating"].to_numpy(dtype=float)
        ata = a.T @ a + reg * np.eye(k)
        atr = a.T @ r
        x = np.linalg.solve(ata, atr)
        return pd.DataFrame(
            {"id": [pdf[solve_col].iloc[0]], "f": [x.tolist()]}
        )

    joined = ratings.join(
        fixed_factors.withColumnRenamed("id", fixed_col), fixed_col
    ).select(solve_col, fixed_col, "rating", "f")
    return joined.groupBy(solve_col).applyInPandas(
        solve, "id long, f array<double>"
    )


def _exact_partial_sum(df: DataFrame) -> int:
    """Sum a per-partition (high, low) long pair exactly on the driver.
    ``df`` rows are tiny (one per partition), never data-sized."""
    return sum(
        int(r["high"]) * _SPLIT + int(r["low"]) for r in df.collect()
    )


def _quantized_partials(int_iter_fn):
    """Wrap a per-batch int-sum generator into a (high, low) long schema."""

    def gen(batches):
        import pandas as pd

        s = 0
        for pdf in batches:
            if len(pdf):
                s += int_iter_fn(pdf)
        yield pd.DataFrame({"high": [s // _SPLIT], "low": [s % _SPLIT]})

    return gen


def _loss_df(
    ratings: DataFrame,
    u: DataFrame,
    v: DataFrame,
    user_col: str,
    item_col: str,
    reg: float,
) -> float:
    """Regularized squared loss with everything O(entities) staying on the
    cluster: ratings ⋈ U ⋈ V for the data term, a scan of each factor
    table for the reg term. Each row's contribution is quantized to the
    1e-10 integer grid so the aggregation is order-free (bit-identical on
    any partitioning); partials travel as exact split longs."""

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

    def data_term(pdf):
        uu = np.array([list(x) for x in pdf["uf"]])
        vv = np.array([list(x) for x in pdf["vf"]])
        r = pdf["rating"].to_numpy(dtype=float)
        e = r - (uu * vv).sum(axis=1)
        return int(np.rint((e * e) * _Q).astype("int64").sum())

    def reg_term(pdf):
        m = np.array([list(x) for x in pdf["f"]])
        return int(np.rint(reg * (m * m).sum(axis=1) * _Q).astype("int64").sum())

    data_q = _exact_partial_sum(
        j.mapInPandas(_quantized_partials(data_term), "high long, low long")
    )
    reg_q = _exact_partial_sum(
        u.mapInPandas(_quantized_partials(reg_term), "high long, low long")
    ) + _exact_partial_sum(
        v.mapInPandas(_quantized_partials(reg_term), "high long, low long")
    )
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
