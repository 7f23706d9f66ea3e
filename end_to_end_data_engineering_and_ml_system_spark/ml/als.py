"""Distributed ALS matrix factorization — the recommendation trainer,
completing the workload families (relational, streaming, text/dedup,
similarity, supervised + clustering trainers, now collaborative
filtering).

Alternating least squares in its textbook distributed form (the same
public formulation MLlib's ALS implements, re-expressed on the DataFrame
API so the mechanics are visible):

- the RATINGS stay on the cluster, grouped by whichever side is being
  solved (``applyInPandas`` over groupBy(user) / groupBy(item));
- the OTHER side's factor matrix is small (entities × k floats) and rides
  to executors inside the closure — the parameter-server shape shared
  with the AE/logistic/k-means trainers;
- each half-step solves an exact per-entity ridge system
  (AᵀA + λI) x = Aᵀr in closed form, which cannot increase the
  regularized squared loss — so the loss sequence is non-increasing
  across half-steps, the pytest invariant;
- determinism: init factors derive from md5 of (entity, dim) — no RNG —
  and each per-entity solve sorts its ratings by the counterpart id
  first, fixing the float accumulation order so refits are bit-identical
  across partitionings.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _md5_unit(entity, dim: int) -> float:
    """Deterministic uniform in [0, 1) from md5(entity:dim)."""
    h = hashlib.md5(f"{entity}:{dim}".encode()).hexdigest()[:8]
    return int(h, 16) / 4294967296.0


def _init_factors(ids: list, k: int) -> dict:
    return {
        e: np.array([0.1 + 0.9 * _md5_unit(e, d) for d in range(k)])
        for e in ids
    }


def _solve_side(
    ratings: DataFrame,
    solve_col: str,
    fixed_col: str,
    fixed_factors: dict,
    k: int,
    reg: float,
) -> dict:
    """One ALS half-step: per-entity closed-form ridge solve over that
    entity's ratings (sorted by counterpart id for a fixed accumulation
    order). Returns {entity: factor_vector}."""
    fixed_b = {e: v.tolist() for e, v in fixed_factors.items()}

    def solve(pdf):
        import pandas as pd

        pdf = pdf.sort_values(fixed_col)
        a = np.array([fixed_b[key] for key in pdf[fixed_col]])
        r = pdf["rating"].to_numpy(dtype=float)
        ata = a.T @ a + reg * np.eye(k)
        atr = a.T @ r
        x = np.linalg.solve(ata, atr)
        return pd.DataFrame(
            {"entity": [pdf[solve_col].iloc[0]], "factors": [x.tolist()]}
        )

    rows = (
        ratings.groupBy(solve_col)
        .applyInPandas(solve, "entity long, factors array<double>")
        .collect()
    )
    return {r["entity"]: np.array(r["factors"]) for r in rows}


def _loss(
    ratings: DataFrame,
    u: dict,
    v: dict,
    user_col: str,
    item_col: str,
    reg: float,
) -> float:
    """Regularized squared loss, computed distributed: per-partition
    partial sums of (r − u·v)² with both factor dicts in the closure."""
    ub = {e: x.tolist() for e, x in u.items()}
    vb = {e: x.tolist() for e, x in v.items()}

    # each row's e² is a fixed per-row float computation; quantizing it to
    # an integer (1e-10 grid) before summing makes the aggregation
    # order-free, so the reported loss is bit-identical on any
    # partitioning (same rule as the engine's decimal-exact aggregates)
    def partials(batches):
        import pandas as pd

        s = 0
        for pdf in batches:
            if not len(pdf):
                continue
            uu = np.array([ub[key] for key in pdf[user_col]])
            vv = np.array([vb[key] for key in pdf[item_col]])
            r = pdf["rating"].to_numpy(dtype=float)
            e = r - (uu * vv).sum(axis=1)
            s += int(np.rint((e * e) * 1e10).astype("int64").sum())
        yield pd.DataFrame({"s": [float(s)]})

    parts = ratings.mapInPandas(partials, "s double").collect()
    data_loss = sum(int(p["s"]) for p in parts) / 1e10
    reg_loss = reg * (
        sum(float(u[k_] @ u[k_]) for k_ in sorted(u))
        + sum(float(v[k_] @ v[k_]) for k_ in sorted(v))
    )
    return data_loss + reg_loss


@dataclass
class AlsFitResult:
    user_factors: dict
    item_factors: dict
    losses: list[float]  # after each half-step (U-solve, V-solve, ...)


def fit_als(
    ratings: DataFrame,
    user_col: str,
    item_col: str,
    k: int = 8,
    iters: int = 4,
    reg: float = 0.1,
) -> AlsFitResult:
    """``ratings`` needs (user_col, item_col, rating). Each iteration runs
    the user half-step then the item half-step, logging the regularized
    loss after each — exact alternating minimization, so the sequence
    never increases."""
    ratings = ratings.select(
        F.col(user_col), F.col(item_col), F.col("rating")
    ).persist()
    try:
        item_ids = [
            r["e"] for r in ratings.select(
                F.col(item_col).alias("e")
            ).distinct().collect()
        ]
        v = _init_factors(sorted(item_ids), k)
        u: dict = {}
        losses: list[float] = []
        for _ in range(iters):
            u = _solve_side(ratings, user_col, item_col, v, k, reg)
            losses.append(_loss(ratings, u, v, user_col, item_col, reg))
            v = _solve_side(ratings, item_col, user_col, u, k, reg)
            losses.append(_loss(ratings, u, v, user_col, item_col, reg))
        return AlsFitResult(user_factors=u, item_factors=v, losses=losses)
    finally:
        ratings.unpersist()
