"""Product quantization for embedding columns (Jégou, Douze, Schmid 2011,
"Product Quantization for Nearest Neighbor Search" — the public PQ/ADC
idea behind FAISS's IVF-PQ indexes).

A d-dim vector splits into ``m`` subvectors; each subspace trains its own
``ks``-centroid codebook; a vector is stored as m small codes (here
m=8 × ks=16 → 8 nibbles = 4 bytes per 64-float vector, a 64× compression
— the difference between an embedding table that fits in cluster memory
and one that doesn't at 100 TB). Search is asymmetric distance
computation (ADC): per query one tiny (m × ks) table of
query-subvector↔centroid distances, then every encoded vector's
approximate distance is m table lookups summed — no decode.

Spark shapes:

- **training** is the package's parameter-server loop (ml/training.py):
  per iteration ONE ``mapInPandas`` pass computes Lloyd partials for ALL
  m subspaces at once (the closure carries only the m×ks×dsub codebook,
  a few KB); the driver reduces #partitions × m × ks partial rows.
  Init is the deterministic md5-medoid pick (the ks rows with the
  smallest ``md5(id)`` seed every subspace from their own subvectors) —
  engine-portable, no RNG, same contract as ``fit_kmeans_lloyd``.
- **encoding** stays JVM-side: subvector explode → broadcast-join the
  m×ks codebook → ``zip_with`` squared distance → per-(vector, subspace)
  argmin. Long (id, sub, code) output is the join-friendly layout; at
  rest it compacts to an ``array<tinyint>`` per vector.
- **ADC search** is also pure DataFrame ops: the (query × sub × code)
  distance table is a small broadcast; encoded vectors join it on
  (sub, code) and one grouped sum + window top-k finishes — the scan is
  linear in the CODES, never touching the original floats.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PQ_PARTIAL_SCHEMA = (
    "sub int, code int, vec_sum array<double>, n long, distortion double"
)


def _pq_partials(codebooks: np.ndarray):
    """Fused per-partition Lloyd partials for every subspace: one pass
    over the Arrow batches yields m×ks rows of (subvector sum, count,
    distortion). Ties break to the lowest code (argmin), matching the
    portable oracle's rank tie-break."""
    m, ks, dsub = codebooks.shape

    def fn(batches):
        import pandas as pd

        sums = np.zeros((m, ks, dsub))
        counts = np.zeros((m, ks), dtype=np.int64)
        dist = np.zeros((m, ks))
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf["features"].to_numpy())  # (b, d)
            xs = x.reshape(len(x), m, dsub)
            for s in range(m):
                d2 = ((xs[:, s, None, :] - codebooks[s][None, :, :]) ** 2).sum(
                    axis=2
                )  # (b, ks)
                assign = d2.argmin(axis=1)
                for c in range(ks):
                    msk = assign == c
                    if msk.any():
                        sums[s, c] += xs[msk, s].sum(axis=0)
                        counts[s, c] += int(msk.sum())
                        dist[s, c] += float(d2[msk, c].sum())
        yield pd.DataFrame(
            {
                "sub": np.repeat(np.arange(m, dtype=np.int32), ks),
                "code": np.tile(np.arange(ks, dtype=np.int32), m),
                "vec_sum": [
                    sums[s, c].tolist() for s in range(m) for c in range(ks)
                ],
                "n": counts.reshape(-1),
                "distortion": dist.reshape(-1),
            }
        )

    return fn


@dataclass
class PqFitResult:
    codebooks: np.ndarray  # (m, ks, dsub)
    distortions: list[float]  # total distortion per iteration, BEFORE update


def init_codebooks(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    ks: int = 16,
) -> np.ndarray:
    """The deterministic md5-medoid iteration-0 codebook: the ks rows
    with the smallest md5(id) seed every subspace from their own
    subvectors. Engine-portable (no RNG, no float averaging), so encodes
    against it are oracle-checkable; plans as TakeOrderedAndProject."""
    init_rows = (
        corpus.select(id_col, vec_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(ks)
        .collect()
    )
    if len(init_rows) < ks:
        raise ValueError(f"need at least {ks} rows, got {len(init_rows)}")
    dim = len(init_rows[0][vec_col])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    seeds = np.array([list(r[vec_col]) for r in init_rows], dtype=float)
    return np.stack(
        [seeds[:, s * dsub : (s + 1) * dsub] for s in range(m)]
    )  # (m, ks, dsub)


def fit_pq(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    ks: int = 16,
    iters: int = 3,
) -> PqFitResult:
    """Train the m per-subspace codebooks with fused distributed Lloyd's.

    Per iteration: one mapInPandas aggregation (all m subspaces in the
    same pass), a driver reduce of #partitions × m × ks rows, a centroid
    update. Distortion (sum over subspaces of within-code squared error)
    is non-increasing across iterations — the pytest invariant. Driver
    state is the m×ks×dsub codebook: a few KB, independent of corpus
    size, so the driver-held pattern is correct here (unlike per-entity
    factors)."""
    codebooks = init_codebooks(corpus, id_col=id_col, vec_col=vec_col, m=m, ks=ks)
    m, ks, dsub = codebooks.shape
    feats = corpus.select(
        F.col(vec_col).cast("array<double>").alias("features")
    )
    distortions: list[float] = []
    for _ in range(iters):
        parts = feats.mapInPandas(
            _pq_partials(codebooks), PQ_PARTIAL_SCHEMA
        ).collect()
        sums = np.zeros_like(codebooks)
        counts = np.zeros((m, ks))
        total = 0.0
        for p in parts:
            sums[p["sub"], p["code"]] += np.asarray(p["vec_sum"])
            counts[p["sub"], p["code"]] += p["n"]
            total += p["distortion"]
        distortions.append(total)
        codebooks = codebooks.copy()
        nonempty = counts > 0
        codebooks[nonempty] = sums[nonempty] / counts[nonempty][:, None]
    return PqFitResult(codebooks=codebooks, distortions=distortions)


def codebook_df(spark, codebooks: np.ndarray) -> DataFrame:
    """The (m × ks)-row codebook as a broadcastable DataFrame."""
    m, ks, dsub = codebooks.shape
    rows = [
        (s, c, [float(v) for v in codebooks[s, c]])
        for s in range(m)
        for c in range(ks)
    ]
    return spark.createDataFrame(
        rows, "sub int, code int, centroid array<double>"
    )


def _subvectors(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    m: int,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """(id, *carry, sub, subvec): JVM slice per subspace, exploded — no
    Python. ``carry`` columns (e.g. the IVF cell id) ride along so no
    re-join on the full-size id key is needed downstream."""
    dim_expr = F.size(F.col(vec_col))
    dsub = (dim_expr / m).cast("int")
    subs = F.array(
        *[
            F.struct(
                F.lit(s).alias("sub"),
                F.slice(
                    F.col(vec_col).cast("array<double>"),
                    dsub * s + 1,
                    dsub,
                ).alias("subvec"),
            )
            for s in range(m)
        ]
    )
    return df.select(
        F.col(id_col), *[F.col(c) for c in carry], F.explode(subs).alias("e")
    ).select(
        id_col,
        *carry,
        F.col("e.sub").alias("sub"),
        F.col("e.subvec").alias("subvec"),
    )


def _sq_dist(a, b):
    d = F.zip_with(a, b, lambda x, y: (x - y) * (x - y))
    return F.aggregate(d, F.lit(0.0), lambda acc, v: acc + v)


def _sq_dist_exact(a, b):
    """Decimal-exact squared distance: each term quantized to
    DECIMAL(28,10) before the sum, so the argmin is order-free and
    bit-identical across engines (the portable-oracle contract)."""
    d = F.zip_with(a, b, lambda x, y: ((x - y) * (x - y)).cast("decimal(28,10)"))
    return F.aggregate(
        d,
        F.lit(0).cast("decimal(28,10)"),
        lambda acc, v: (acc + v).cast("decimal(28,10)"),
    )


def pq_encode(
    corpus: DataFrame,
    codebook: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    carry: tuple[str, ...] = (),
    exact: bool = False,
) -> DataFrame:
    """Encode the corpus to (id, *carry, sub, code): broadcast-join every
    subvector against its subspace's ks centroids, keep the argmin
    (ties -> lowest code). ks×m candidate rows per vector stream through
    whole-stage codegen; nothing leaves the JVM. ``exact=True`` ranks by
    decimal-exact distances (engine-portable argmin for oracle-checked
    paths); the float default is the throughput path.

    The argmin is ``min(struct(d2, code))`` under a groupBy — struct
    comparison is field-lexicographic, so it reproduces the old
    row_number-over-(d2, code) pick exactly, but with partial (map-side)
    aggregation: the ks candidates per (id, sub) collapse BEFORE the
    shuffle, so the exchange carries output-sized rows (m per vector)
    instead of ks×m candidate rows — a ks-fold shuffle-volume cut that is
    the difference between encode being scan-bound and exchange-bound at
    corpus scale."""
    sv = _subvectors(corpus, id_col, vec_col, m, carry=carry)
    # guarded spread before the ks-way candidate expansion: the zip_with
    # distance lambdas are interpreted per element, and off a 1-partition
    # fixture scan the whole ks×m×dsub battery ran in ONE task (r16: a
    # 5.3 s single-task job inside embedding_ivfpq_topk). Per-(id, sub)
    # argmin is partition-independent (min of per-row values), so results
    # are identical; no-op on well-split corpora (guide §2.5).
    from ..sources.catalog import spread_for_compute

    sv = spread_for_compute(sv, F.col(id_col), F.col("sub"))
    dist = _sq_dist_exact if exact else _sq_dist
    scored = sv.join(F.broadcast(codebook), "sub").select(
        id_col,
        *carry,
        "sub",
        "code",
        dist(F.col("subvec"), F.col("centroid")).alias("d2"),
    )
    return (
        scored.groupBy(id_col, *carry, "sub")
        .agg(F.min(F.struct("d2", "code")).alias("best"))
        .select(id_col, *carry, "sub", F.col("best.code").alias("code"))
    )


def pq_adc_topk(
    encoded: DataFrame,
    codebook: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 3,
    exact: bool = False,
) -> DataFrame:
    """ADC top-k: per query a tiny (m × ks) distance table (built as a
    small join, broadcast), then approximate distance = grouped sum of m
    lookups per (query, vector) and a window top-k. The corpus-side scan
    reads ONLY the integer codes. ``exact=True`` builds the lookup table
    with decimal-exact partial distances and ranks on their exact sum
    cast to double — the engine-portable serving path oracle-checked by
    embedding_pq_adc_topk_portable; the float default is the throughput
    path."""
    qsv = _subvectors(
        queries.select(F.col(id_col).alias("query_id"), vec_col),
        "query_id",
        vec_col,
        m,
    )
    dist = _sq_dist_exact if exact else _sq_dist
    table = qsv.join(codebook, "sub").select(
        "query_id",
        "sub",
        "code",
        dist(F.col("subvec"), F.col("centroid")).alias("pd"),
    )
    cand = encoded.select(F.col(id_col).alias("cand_id"), "sub", "code")
    adc_sum = F.sum("pd")
    if exact:
        # exact decimal sum, ranked as double so ordering is the
        # IEEE-identical value every engine computes from the same decimal
        adc_sum = adc_sum.cast("double")
    scored = (
        cand.join(F.broadcast(table), ["sub", "code"])
        .filter(F.col("cand_id") != F.col("query_id"))
        .groupBy("query_id", "cand_id")
        .agg(adc_sum.alias("adc_dist"), F.count("*").alias("n_sub"))
        .filter(F.col("n_sub") == m)  # guard: all m lookups present
        .drop("n_sub")
    )
    w = Window.partitionBy("query_id").orderBy("adc_dist", "cand_id")
    return scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )


def ivfpq_index(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k_cells: int = 8,
    m: int = 32,
    ks: int = 64,
    iters: int = 3,
    seed: int = 42,
):
    """IVF-PQ (the FAISS IVFADC layout): coarse KMeans cells + PQ over the
    RESIDUALS (x - centroid[cell]). Residual codebooks concentrate the
    quantizer's budget on within-cell variation, and the cell id becomes
    the partition key: at rest the (id, cell_id, sub, code) table is
    written partitioned by ``cell_id`` so a search's scan is partition-
    pruned to the probed cells — the same layout test_partitioned.py
    proves for plain IVF.

    Returns ``(encoded, centroids, codebook, fit)``: the coded corpus
    (carrying cell_id — no re-join on the full-size id key), the
    broadcastable coarse centroids, the broadcastable PQ codebook, and
    the PqFitResult (distortion curve for the convergence invariant)."""
    from .similarity import ivf_index

    assigned, centroids = ivf_index(
        corpus, id_col=id_col, vec_col=vec_col, k_cells=k_cells, seed=seed
    )
    resid = assigned.join(F.broadcast(centroids), "cell_id").select(
        id_col,
        "cell_id",
        F.zip_with(
            F.col(vec_col).cast("array<double>"),
            F.col("centroid"),
            lambda x, c: x - c,
        ).alias("residual"),
    )
    fit = fit_pq(resid, id_col=id_col, vec_col="residual", m=m, ks=ks, iters=iters)
    codebook = codebook_df(corpus.sparkSession, fit.codebooks)
    encoded = pq_encode(
        resid, codebook, id_col=id_col, vec_col="residual", m=m, carry=("cell_id",)
    )
    return encoded, centroids, codebook, fit


def ivfpq_search(
    encoded: DataFrame,
    centroids: DataFrame,
    codebook: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 32,
    nprobe: int = 4,
    k: int = 3,
) -> DataFrame:
    """IVF-PQ top-k: rank cells by exact query-centroid distance, build
    the per-(query, probed cell) ADC table from the query's RESIDUAL in
    that cell, then one join on (cell_id, sub, code) + grouped sum +
    window top-k. The corpus-side scan touches only the probed cells'
    codes (partition-pruned when ``encoded`` is written partitioned by
    cell_id) and never the original floats. The ADC table is
    |Q| x nprobe x m x ks rows — broadcast-sized by construction."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    qc = q.crossJoin(F.broadcast(centroids)).select(
        "query_id",
        "cell_id",
        F.zip_with("qv", "centroid", lambda x, c: x - c).alias("rq"),
        _sq_dist(F.col("qv"), F.col("centroid")).alias("cd2"),
    )
    wq = Window.partitionBy("query_id").orderBy("cd2", "cell_id")
    probes = (
        qc.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "cell_id", "rq")
    )
    table = _subvectors(probes, "query_id", "rq", m, carry=("cell_id",)).join(
        codebook, "sub"
    ).select(
        "query_id",
        "cell_id",
        "sub",
        "code",
        _sq_dist(F.col("subvec"), F.col("centroid")).alias("pd"),
    )
    cand = encoded.select(
        F.col(id_col).alias("cand_id"), "cell_id", "sub", "code"
    )
    scored = (
        cand.join(F.broadcast(table), ["cell_id", "sub", "code"])
        .filter(F.col("cand_id") != F.col("query_id"))
        .groupBy("query_id", "cand_id")
        .agg(F.sum("pd").alias("adc_dist"), F.count("*").alias("n_sub"))
        .filter(F.col("n_sub") == m)  # guard: all m lookups present
        .drop("n_sub")
    )
    w = Window.partitionBy("query_id").orderBy("adc_dist", "cand_id")
    return scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
