"""Similarity search over embedding columns (``array<float>``).

Two paths, as a 100 TB pipeline needs both:

- **Brute-force cosine top-k** (the exactness baseline): dot products as
  JVM ``zip_with``/``aggregate`` expressions — no Python, no explode, one
  crossJoin of (small query set) × (corpus) that Spark broadcasts.
- **Exact-reproducible variant** for cross-engine checks: position-explode +
  decimal sums, so the dot product is order-independent and bit-identical
  in any engine (float fold order never leaks into results).
- **LSH bucketing (random hyperplanes / sign sketch)**: b-bit signature per
  vector from deterministic pseudo-random ±1 planes derived from
  ``xxhash64(plane, position)``; same-bucket vectors are ANN candidates.
  Scale path: the corpus groups by bucket (shuffle on a short key), the
  exact cosine only runs within buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_product(a: Column, b: Column) -> Column:
    """JVM-side dot product of two float/double arrays (double accumulator;
    fast path — fold order is array order)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def sq_norm(a: Column) -> Column:
    return dot_product(a, a)


def cosine(a: Column, b: Column) -> Column:
    """NULL (never an error) when either vector has zero norm: unguarded,
    ANSI mode — Spark 4's default — throws DIVIDE_BY_ZERO on the first
    zero vector in the corpus, killing the whole job; legacy mode already
    NULLed implicitly. The explicit guard makes the contract mode-
    independent: NULL sorts last under desc and drops out of threshold
    filters, which is the semantics every caller wants."""
    denom = F.sqrt(sq_norm(a)) * F.sqrt(sq_norm(b))
    return F.when(denom > 0, dot_product(a, b) / denom)


def dot_product_exact(a: Column, b: Column) -> Column:
    """Order-independent dot product: each elementwise product rounds to
    DECIMAL(28,10) once, then sums exactly (decimal addition never rounds,
    so fold order cannot leak into the result). Bit-identical across
    engines that apply the same per-term rounding — the cross-engine
    contract the portable oracle queries rely on. Returns double."""
    prods = F.zip_with(
        a,
        b,
        lambda x, y: (x.cast("double") * y.cast("double")).cast(
            "decimal(28,10)"
        ),
    )
    return F.aggregate(
        prods,
        F.lit(0).cast("decimal(28,10)"),
        lambda acc, x: (acc + x).cast("decimal(28,10)"),
    ).cast("double")


def cosine_exact(a: Column, b: Column) -> Column:
    """Decimal-exact, zero-norm-guarded cosine (see ``cosine`` for the
    guard contract, ``dot_product_exact`` for the rounding contract)."""
    denom = F.sqrt(dot_product_exact(a, a)) * F.sqrt(dot_product_exact(b, b))
    return F.when(denom > 0, dot_product_exact(a, b) / denom)


def cosine_from_norms(
    a: Column, b: Column, na: Column, nb: Column, exact: bool = False
) -> Column:
    """Guarded cosine with the squared norms HOISTED to per-row columns.

    In a pairwise join, ``cosine(a, b)`` folds each vector's norm once per
    PAIR — and the zero-norm ``when`` guard folds the denominator a second
    time (measured +20% wall on the brute-force bench path). Computing
    ``na``/``nb`` once per ROW before the join makes the guard a two-scalar
    test and the per-pair work a single dot fold. Same NULL-on-zero-norm
    contract as ``cosine``.

    The guard tests the PRODUCT ``sqrt(na)*sqrt(nb)`` (like inline
    ``cosine``), not ``(na > 0) & (nb > 0)``: for subnormal norms each
    factor can be > 0 while their double product underflows to exactly 0,
    and the per-factor guard would then divide by zero (Infinity) where
    the inline form returns NULL. Still a two-scalar test per pair."""
    dp = dot_product_exact if exact else dot_product
    denom = F.sqrt(na) * F.sqrt(nb)
    return F.when(denom > 0, dp(a, b) / denom)


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    exact: bool = False,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector (query ids broadcast).

    ``exact=True`` swaps the double-accumulator fold for the decimal
    order-independent form — same plan shape (one broadcast crossJoin, no
    explode), cross-engine-reproducible scores for oracle checks."""
    nrm = (
        (lambda v: dot_product_exact(v, v)) if exact else sq_norm
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).withColumn("__qn", nrm(F.col("qv")))
    c = corpus.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cv")
    ).withColumn("__cn", nrm(F.col("cv")))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            cosine_from_norms(
                F.col("qv"),
                F.col("cv"),
                F.col("__qn"),
                F.col("__cn"),
                exact=exact,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id")
    )
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)


def _check_num_planes(num_planes: int) -> None:
    """Signatures live in one bigint: plane j sets bit j, so more than 64
    planes silently WRAPS (shiftleft is mod-64 — plane 64 collides with
    plane 0 and every 'extra' plane shadows an earlier one's bit)."""
    if not 1 <= num_planes <= 64:
        raise ValueError(
            f"num_planes={num_planes} must be in [1, 64] (one bigint bit "
            "per plane; >64 wraps shiftleft and collides planes)"
        )


def lsh_signature(vec: Column, num_planes: int = 16) -> Column:
    """Sign-sketch signature: bit j = sign of <vec, plane_j>, where
    plane_j[pos] = ±1 derived from xxhash64(j, pos). Deterministic, no
    stored plane matrix, computable streaming-side."""
    _check_num_planes(num_planes)
    out = F.lit(0).cast("bigint")
    for j in range(num_planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.size(vec) - 1),
                lambda x, pos: x.cast("double")
                * F.when(
                    F.xxhash64(F.lit(j), pos).bitwiseAND(F.lit(1)) == 1, F.lit(1.0)
                ).otherwise(F.lit(-1.0)),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        out = out + F.when(proj > 0, F.shiftleft(F.lit(1).cast("bigint"), j)).otherwise(
            F.lit(0).cast("bigint")
        )
    return out


def lsh_signatures_table(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 16,
) -> DataFrame:
    """(id, sig) sign-sketch signatures via posexplode + codegen'd
    projection sums — the batch shape of ``lsh_signature`` (measured ~4×
    faster than the interpreted per-plane ``aggregate`` loop: one pass over
    the exploded vector, map-side partial aggregation). Bits agree with the
    per-row form except when a projection is within float-rounding of zero
    (distributed sum order vs array fold order) — noise-level projections
    whose bucket membership is arbitrary in any floating formulation; do
    not join buckets computed by BOTH formulations and expect exact
    candidate parity."""
    _check_num_planes(num_planes)
    ex = corpus.select(
        F.col(id_col), F.posexplode(vec_col).alias("pos", "xf")
    ).select(id_col, "pos", F.col("xf").cast("double").alias("x"))
    projs = ex.groupBy(id_col).agg(
        *[
            F.sum(
                F.col("x")
                * F.when(
                    F.xxhash64(F.lit(j), F.col("pos")).bitwiseAND(F.lit(1)) == 1,
                    F.lit(1.0),
                ).otherwise(F.lit(-1.0))
            ).alias(f"p{j}")
            for j in range(num_planes)
        ]
    )
    sig = None
    for j in range(num_planes):
        bit = F.when(
            F.col(f"p{j}") > 0, F.shiftleft(F.lit(1).cast("bigint"), j)
        ).otherwise(F.lit(0).cast("bigint"))
        sig = bit if sig is None else sig + bit
    return projs.select(id_col, sig.alias("sig"))


def lsh_bucket_candidates(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 16,
    num_tables: int = 4,
    planes_per_table: int = 4,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """ANN candidate pairs: vectors sharing a sub-signature in ≥1 of
    ``num_tables`` tables (banding over the sign sketch — trades precision
    for recall exactly like MinHash bands).

    ``max_bucket_size`` drops viral buckets before the self-join (a bucket
    of k vectors emits k² candidate rows) — same guard as
    ``dedup.cap_bucket_size``."""
    sig = lsh_signatures_table(corpus, id_col, vec_col, num_planes)
    return band_signature_candidates(
        sig, id_col, num_tables, planes_per_table, max_bucket_size,
        num_planes=num_planes,
    )


def band_signature_candidates(
    sig: DataFrame,
    id_col: str = "vec_id",
    num_tables: int = 4,
    planes_per_table: int = 4,
    max_bucket_size: int | None = None,
    num_planes: int | None = None,
) -> DataFrame:
    """Band an ``(id, sig)`` bit-signature table into ``num_tables`` hash
    tables and emit distinct same-bucket candidate pairs (id1 < id2).
    Shared by the fast (xxhash64) and engine-portable (md5) sketch paths —
    banding is a pure projection, the only shuffle is the bucket equi-join.

    Pass ``num_planes`` (the signature width) whenever it is known: bands
    that reach past the width read all-zero bits, so EVERY vector lands in
    those tables' bucket 0 — an all-pairs candidate blowup, the exact O(n²)
    LSH exists to avoid — and bands that cover less than the width silently
    ignore the trailing planes (requested precision never applied). Both
    misconfigurations raise instead (same contract as
    dedup.lsh_buckets_wide's divisibility check)."""
    if num_tables < 1 or planes_per_table < 1:
        raise ValueError(
            f"num_tables={num_tables} and planes_per_table={planes_per_table} "
            "must be >= 1"
        )
    if num_planes is not None and num_tables * planes_per_table != num_planes:
        raise ValueError(
            f"num_tables ({num_tables}) x planes_per_table "
            f"({planes_per_table}) = {num_tables * planes_per_table} must "
            f"equal the signature width num_planes ({num_planes}): wider "
            "bands read all-zero bits (viral bucket 0 -> all-pairs blowup), "
            "narrower bands silently ignore trailing planes"
        )
    mask = (1 << planes_per_table) - 1
    tables = []
    for t in range(num_tables):
        sub = F.shiftright(F.col("sig"), t * planes_per_table).bitwiseAND(
            F.lit(mask)
        )
        tables.append(
            sig.select(
                F.col(id_col), F.lit(t).alias("table_id"), sub.alias("bucket")
            )
        )
    buckets = tables[0]
    for t in tables[1:]:
        buckets = buckets.unionByName(t)
    if max_bucket_size is not None:
        from .dedup import cap_bucket_size

        buckets = cap_bucket_size(buckets, ["table_id", "bucket"], max_bucket_size)
    # Explicit bucket-keyed repartition, NOT left to the join's implicit
    # exchange: the bucket rows are tiny (a few bytes each) so AQE's
    # byte-based coalescing collapses the implicit exchange to 1-2 tasks —
    # and those tasks then emit the join's quadratic-per-bucket pair
    # blowup single-threaded (measured: the whole candidate+verify path of
    # embedding_near_dups_portable ran as 2 tasks / 40 s of executor time
    # at sf0.1). A user-specified partition count is exempt from AQE
    # coalescing, the self-join reuses the one exchange (same keys, same
    # count), and parallelism is bounded by distinct (table, bucket) keys
    # either way — at scale the exchange is equally tiny, so pinning its
    # width costs nothing.
    p = sig.sparkSession.sparkContext.defaultParallelism
    buckets = buckets.repartition(p, "table_id", "bucket")
    a = buckets.select(F.col(id_col).alias("id1"), "table_id", "bucket")
    b = buckets.select(F.col(id_col).alias("id2"), "table_id", "bucket")
    return (
        a.join(b, ["table_id", "bucket"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .distinct()
    )


def ivf_index(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k_cells: int = 16,
    seed: int = 42,
):
    """IVF coarse quantizer: MLlib KMeans partitions the corpus into cells.

    Returns ``(assigned, centroids)``: the corpus with a ``cell_id`` column,
    and the small (k_cells × dim) centroid table. At scale the assigned
    corpus is written out partitioned by ``cell_id`` so a search touches
    only the probed cells' files (partition pruning); centroids stay a
    broadcast table."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = corpus.withColumn(
        "__features", array_to_vector(F.col(vec_col).cast("array<double>"))
    )
    model = KMeans(
        k=k_cells, seed=seed, featuresCol="__features", predictionCol="cell_id"
    ).fit(feat)
    assigned = model.transform(feat).select(id_col, vec_col, "cell_id")
    spark = corpus.sparkSession
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cell_id int, centroid array<double>",
    )
    return assigned, centroids


def ivf_search(
    assigned: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 4,
    k: int = 3,
) -> DataFrame:
    """ANN top-k: probe the ``nprobe`` nearest cells per query, exact cosine
    re-rank inside them. Both the centroid table and the query set ride
    broadcasts; the only distributed work is the within-cell re-rank, which
    scans ~nprobe/k_cells of the corpus instead of all of it."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).withColumn("__qn", sq_norm(F.col("qv")))
    # nearest nprobe cells per query (tiny cross join: |Q| × k_cells)
    qc = q.crossJoin(F.broadcast(centroids)).select(
        "query_id",
        "qv",
        "__qn",
        "cell_id",
        cosine(F.col("qv"), F.col("centroid")).alias("c_sim"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("c_sim").desc(), "cell_id")
    probes = (
        qc.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "qv", "__qn", "cell_id")
    )
    # per-row norms hoisted out of the pairwise re-rank expression (see
    # cosine_from_norms): the within-cell re-rank is the hot path here
    cand = assigned.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cv"), "cell_id"
    ).withColumn("__cn", sq_norm(F.col("cv")))
    scored = (
        cand.join(F.broadcast(probes), "cell_id")
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            cosine_from_norms(
                F.col("qv"), F.col("cv"), F.col("__qn"), F.col("__cn")
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), "cand_id")
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)


def centroids_long(
    corpus: DataFrame,
    group_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-group centroid in LONG format (group, dim, mean_val): posexplode
    the vectors, one partial-aggregated groupBy over (group, dim).

    The long shape is the 100 TB-friendly one — the shuffle carries one row
    per (group, dim) after map-side combine, aggregation is plain codegen'd
    sums (no per-row array rebuilds), and the result joins back to vectors
    by position without array UDFs. ``array_agg``-style wide centroids are
    a ``collect_list`` away when groups are small.

    Values are quantized to 1e-10 via ``floor(v*1e10 + 0.5)`` INTEGER
    arithmetic rather than a decimal cast: engines disagree on decimal tie
    rounding (Spark HALF_UP vs DuckDB half-even — any float that is an odd
    multiple of 2^-11 ties at scale 10), while floor over IEEE doubles is
    bit-identical everywhere. Exact int64 sums make the centroid
    partition-order-independent; headroom is ~1e9 rows/group at unit-scale
    values (switch the sum to decimal(38,0) beyond that)."""
    exploded = corpus.select(
        F.col(group_col),
        F.posexplode(F.col(vec_col)).alias("dim", "val"),
    )
    q = F.floor(F.col("val").cast("double") * F.lit(1e10) + F.lit(0.5))
    return exploded.groupBy(group_col, "dim").agg(
        (F.sum(q).cast("double") / F.lit(1e10) / F.count("val")).alias("mean_val"),
        F.count("val").alias("n_vecs"),
    )


def embedding_near_dups(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    num_planes: int = 16,
    num_tables: int = 4,
    planes_per_table: int = 4,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, the composed scale pipeline:
    sign-sketch LSH proposes candidates (~linear), exact cosine verifies
    only those pairs. Same shape as the text path
    (dedup.lsh_verified_near_dups); recall depends on the banding params —
    near-identical vectors agree on almost every plane, so they collide in
    ≥1 table with high probability."""
    cands = lsh_bucket_candidates(
        corpus, id_col, vec_col, num_planes, num_tables, planes_per_table,
        max_bucket_size,
    )
    # per-row norms hoisted out of the per-pair verify expression (see
    # cosine_from_norms) — computed once per corpus row, not once (guarded:
    # twice) per candidate pair
    vecs = corpus.select(F.col(id_col), F.col(vec_col).alias("__v")).withColumn(
        "__n", sq_norm(F.col("__v"))
    )
    j = (
        cands.join(
            vecs.select(
                F.col(id_col).alias("id1"),
                F.col("__v").alias("v1"),
                F.col("__n").alias("n1"),
            ),
            "id1",
        ).join(
            vecs.select(
                F.col(id_col).alias("id2"),
                F.col("__v").alias("v2"),
                F.col("__n").alias("n2"),
            ),
            "id2",
        )
    )
    return j.select(
        "id1",
        "id2",
        cosine_from_norms(
            F.col("v1"), F.col("v2"), F.col("n1"), F.col("n2")
        ).alias("cosine"),
    ).filter(F.col("cosine") >= threshold)


def lsh_signatures_portable(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 16,
) -> DataFrame:
    """Engine-portable sign-sketch signatures: plane signs from md5 (not
    Spark-only xxhash64) and projections summed as floor(x*sign*1e6 + 0.5)
    integers — the repo's decimal-tie-safe quantization (NOTES.md) — so any
    engine reproduces every bit. Same batch shape as
    :func:`lsh_signatures_table`: posexplode + codegen'd grouped sums, one
    signature row per vector on the shuffle. Quantization at 1e-6 only
    flips a bit when |<v, plane>| < 5e-7 — noise-level projections whose
    bucket membership is arbitrary in ANY floating formulation."""
    _check_num_planes(num_planes)
    ex = corpus.select(
        F.col(id_col), F.posexplode(vec_col).alias("pos", "xf")
    ).select(id_col, "pos", F.col("xf").cast("double").alias("x"))

    def sign(j: int):
        nib = F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{j}:"), F.col("pos").cast("string"))), 1, 1
            ),
            16,
            10,
        ).cast("int")
        return F.when(nib % 2 == 1, F.lit(1.0)).otherwise(F.lit(-1.0))

    # The plane signs are pure functions of (plane j, pos) with only
    # num_planes × n_dims distinct inputs (~1k), but evaluated inline they
    # ran the md5+conv battery num_planes times PER EXPLODED ROW —
    # ~10M md5 calls at sf0.1 (measured 34 s on the near-dups consumer;
    # guide §1.2 step 2, per-task work). Compute each sign ONCE over the
    # distinct positions (a ~n_dims-row frame off a pos-only projection —
    # cheap shuffle, no extra driver action, empty-safe) and broadcast-join
    # it back; the joined sign doubles are the identical ±1.0 literals, so
    # every projection sum — and the oracle hash — is bit-unchanged.
    signs = (
        ex.select("pos")
        .distinct()
        .select("pos", *[sign(j).alias(f"__s{j}") for j in range(num_planes)])
    )
    projs = (
        ex.join(F.broadcast(signs), "pos")
        .groupBy(id_col)
        .agg(
            *[
                F.sum(
                    F.floor(
                        F.col("x") * F.col(f"__s{j}") * F.lit(1000000.0)
                        + F.lit(0.5)
                    ).cast("bigint")
                ).alias(f"p{j}")
                for j in range(num_planes)
            ]
        )
    )
    sig = None
    for j in range(num_planes):
        bit = F.when(
            F.col(f"p{j}") > 0, F.shiftleft(F.lit(1).cast("bigint"), j)
        ).otherwise(F.lit(0).cast("bigint"))
        sig = bit if sig is None else sig + bit
    return projs.select(id_col, sig.alias("sig"))


def embedding_near_dups_portable(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.3,
    num_planes: int = 16,
    num_tables: int = 4,
    planes_per_table: int = 4,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Engine-portable embedding near-dup pairs: md5-plane sign-sketch LSH
    proposes candidates, an order-independent decimal-summed exact cosine
    verifies them. Bit-for-bit reproducible in any engine (DuckDB oracle in
    plans/queries.py) — the cross-engine-checkable sibling of
    :func:`embedding_near_dups`, same banded ~linear candidate shape.

    Scale shape: one posexplode of the corpus feeds both the signature sums
    and the pair dot products; candidates are an equi-join on (table,
    bucket); the verify joins candidates back to the exploded table on
    (id, pos) — no all-pairs stage anywhere. (An array-form verify —
    zip_with + exact-decimal F.aggregate per pair — was measured and
    REJECTED: higher-order decimal lambdas are interpreted per element,
    56 s vs 28 s for the codegen'd hash-aggregate SUM below on the same
    candidates.)"""
    sig = lsh_signatures_portable(corpus, id_col, vec_col, num_planes)
    cands = band_signature_candidates(
        sig, id_col, num_tables, planes_per_table, max_bucket_size,
        num_planes=num_planes,
    )
    ex = corpus.select(
        F.col(id_col), F.posexplode(vec_col).alias("pos", "xf")
    ).select(id_col, "pos", F.col("xf").cast("double").alias("x"))
    norms = ex.groupBy(id_col).agg(
        F.sum((F.col("x") * F.col("x")).cast("decimal(28,10)"))
        .cast("double")
        .alias("nrm")
    )
    dots = (
        cands.join(
            ex.select(F.col(id_col).alias("id1"), "pos", F.col("x").alias("x1")),
            "id1",
        )
        .join(
            ex.select(F.col(id_col).alias("id2"), "pos", F.col("x").alias("x2")),
            ["id2", "pos"],
        )
        .groupBy("id1", "id2")
        .agg(
            F.sum((F.col("x1") * F.col("x2")).cast("decimal(28,10)"))
            .cast("double")
            .alias("dot")
        )
    )
    return (
        dots.join(norms.select(F.col(id_col).alias("id1"), F.col("nrm").alias("n1")), "id1")
        .join(norms.select(F.col(id_col).alias("id2"), F.col("nrm").alias("n2")), "id2")
        .select(
            "id1",
            "id2",
            # zero-norm guard: same contract as cosine() — NULL, never a
            # DIVIDE_BY_ZERO under ANSI, and NULL fails the threshold
            F.when(
                (F.col("n1") > 0) & (F.col("n2") > 0),
                F.col("dot") / (F.sqrt("n1") * F.sqrt("n2")),
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def quantize_int8_stats(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Scalar int8 quantization of an embedding corpus, reported per
    dimension: (dim, mn, mx, n_vecs, mean_code, mean_abs_err).

    The 100 TB motivation: uint8 codes shrink embedding storage and every
    downstream shuffle 4× vs float32 (16× vs float64) at ~1% reconstruction
    error — the standard first step before ANN indexing at corpus scale.

    Shapes: per-dim min/max is one partial-aggregated groupBy over the
    posexploded corpus (shuffle rows = n_dims, not n_vectors); the stats
    broadcast back onto a second pass of the same explode. Engine-portable
    on purpose: codes are ``floor(x + 0.5)`` over IEEE doubles (bit-identical
    everywhere, no decimal tie rounding) and the error aggregate is a
    floor-quantized integer sum."""
    e = emb.select(F.posexplode(vec_col).alias("dim", "v")).select(
        "dim", F.col("v").cast("double").alias("val")
    )
    stats = e.groupBy("dim").agg(
        F.min("val").alias("mn"), F.max("val").alias("mx")
    )
    j = e.join(F.broadcast(stats), "dim")
    mn, mx, val = F.col("mn"), F.col("mx"), F.col("val")
    code = (
        F.when(mx > mn, F.floor((val - mn) / (mx - mn) * 255 + F.lit(0.5)))
        .otherwise(F.lit(0))
        .cast("bigint")
    )
    recon = mn + code.cast("double") / F.lit(255.0) * (mx - mn)
    err_q = F.floor(F.abs(val - recon) * F.lit(1e10) + F.lit(0.5)).cast("bigint")
    return (
        j.select("dim", "mn", "mx", code.alias("code"), err_q.alias("err_q"))
        .groupBy("dim", "mn", "mx")
        .agg(
            F.count("*").alias("n_vecs"),
            (F.sum("code").cast("double") / F.count("*")).alias("mean_code"),
            (F.sum("err_q").cast("double") / F.lit(1e10) / F.count("*")).alias(
                "mean_abs_err"
            ),
        )
        .select("dim", "mn", "mx", "n_vecs", "mean_code", "mean_abs_err")
    )


def semdedup_portable(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    tau: float = 0.3,
) -> DataFrame:
    """SemDeDup semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): partition embeddings into k clusters, then drop
    within-cluster semantic near-duplicates whose pairwise cosine exceeds
    ``tau``. Engine-portable deterministic variant:

    - **centroids** = the k corpus vectors with the smallest
      ``md5(id)`` — a seedless uniform pick any engine reproduces
      (cluster_id = md5 rank 0..k-1);
    - **assignment** = exact decimal-summed cosine argmax against the k
      centroids (ties -> lowest cluster_id);
    - **drop rule** = a vector is dropped when any *lower-id* member of
      its cluster has cosine > tau. The paper keeps one exemplar per
      near-dup group; lowest-id is its deterministic stand-in (drops are
      decided against all members, not only surviving ones — same kept
      set on cliques, order-free to evaluate).

    Returns ``(id, cluster_id, max_cos_prev, is_kept)`` — one row per
    corpus row, INCLUDING rows whose vector is NULL/empty (those get
    cluster_id NULL and are kept: nothing to compare); ``max_cos_prev`` is
    the max cosine to any lower-id cluster member (-1.0 when none), so
    callers can re-threshold without re-running the pairwise stage.

    Scale shape: k grows with the corpus (SemDeDup uses 50k clusters for
    5B LAION embeddings), so cluster sizes stay bounded and the only
    quadratic stage — the within-cluster self-join — is quadratic in the
    *cluster*, never the corpus. Assignment is a posexplode equi-join on
    position against a k×dim broadcast side; every sum is a codegen'd
    grouped decimal aggregate (order-independent, cross-engine exact)."""
    from ..sources.catalog import spread_for_compute

    ex_raw = corpus.select(
        F.col(id_col).alias("__id"), F.posexplode(vec_col).alias("pos", "xf")
    ).select("__id", "pos", F.col("xf").cast("double").alias("x"))
    # guarded spread before the k-way assignment fan-out and the
    # within-cluster pairwise join (single task off a 1-partition fixture
    # scan; decimal sums / per-key argmax are partition-independent). The
    # tiny centroid projections below read the raw 1-task form.
    ex = spread_for_compute(ex_raw, "__id", "pos")
    norms = ex.groupBy("__id").agg(
        F.sum((F.col("x") * F.col("x")).cast("decimal(28,10)"))
        .cast("double")
        .alias("nrm")
    )
    # distributed rank for the centroid pick — no single-partition
    # WindowExec either way: TakeOrdered + bounded self-join recovery for
    # small k, global_row_number past the O(k^2) ceiling (k grows with
    # the corpus here — 50k clusters for 5B LAION — so the bounded form's
    # cap must never gate this operator)
    from .relational import ranked_topk

    cent = ranked_topk(
        corpus.select(
            F.col(id_col).alias("cent_vid"),
            F.md5(F.col(id_col).cast("string")).alias("__r"),
        ),
        [("__r", "asc"), ("cent_vid", "asc")],
        k,
        out="__rk",
    ).select(
        "cent_vid",
        (F.col("__rk") - 1).cast("int").alias("cluster_id"),
    )
    cex = cent.join(ex_raw, cent.cent_vid == ex_raw.__id).select(
        "cluster_id", "pos", F.col("x").alias("cx")
    )
    cnorm = cent.join(norms, cent.cent_vid == norms.__id).select(
        "cluster_id", F.col("nrm").alias("cnrm")
    )
    adots = (
        ex.join(F.broadcast(cex), "pos")
        .groupBy("__id", "cluster_id")
        .agg(
            F.sum((F.col("x") * F.col("cx")).cast("decimal(28,10)"))
            .cast("double")
            .alias("dot")
        )
    )
    acos = (
        adots.join(norms, "__id")
        .join(F.broadcast(cnorm), "cluster_id")
        .select(
            "__id",
            "cluster_id",
            # zero-norm guard (ANSI would throw; NULL ranks last so a
            # zero vector still gets a deterministic lowest-id cluster)
            F.when(
                (F.col("nrm") > 0) & (F.col("cnrm") > 0),
                F.col("dot") / (F.sqrt("nrm") * F.sqrt("cnrm")),
            ).alias("c"),
        )
    )
    aw = Window.partitionBy("__id").orderBy(F.col("c").desc(), "cluster_id")
    assign = (
        acos.withColumn("rn", F.row_number().over(aw))
        .filter(F.col("rn") == 1)
        .select("__id", "cluster_id")
    )
    exc = ex.join(assign, "__id")
    pdots = (
        exc.alias("a")
        .join(
            exc.alias("b"),
            (F.col("a.cluster_id") == F.col("b.cluster_id"))
            & (F.col("a.pos") == F.col("b.pos"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .groupBy(
            F.col("a.cluster_id").alias("cluster_id"),
            F.col("a.__id").alias("id1"),
            F.col("b.__id").alias("id2"),
        )
        .agg(
            F.sum((F.col("a.x") * F.col("b.x")).cast("decimal(28,10)"))
            .cast("double")
            .alias("dot")
        )
    )
    pcos = (
        pdots.join(norms.select(F.col("__id").alias("id1"), F.col("nrm").alias("n1")), "id1")
        .join(norms.select(F.col("__id").alias("id2"), F.col("nrm").alias("n2")), "id2")
        .select(
            "id2",
            F.when(
                (F.col("n1") > 0) & (F.col("n2") > 0),
                F.col("dot") / (F.sqrt("n1") * F.sqrt("n2")),
            ).alias("pc"),
        )
    )
    max_prev = pcos.groupBy("id2").agg(F.max("pc").alias("max_cos_prev"))
    # anchor on the corpus, not the assignment: a row whose vector is NULL
    # or empty produces no positions, so it never reaches `assign` — it must
    # still keep its output row (cluster_id NULL, nothing to compare ->
    # kept) instead of silently vanishing from "one row per corpus vector"
    ids = corpus.select(F.col(id_col).alias("__id"))
    return (
        ids.join(assign, "__id", "left")
        .join(max_prev, F.col("__id") == max_prev.id2, "left")
        .select(
            F.col("__id").alias(id_col),
            "cluster_id",
            F.coalesce("max_cos_prev", F.lit(-1.0)).alias("max_cos_prev"),
            (F.coalesce("max_cos_prev", F.lit(-1.0)) <= F.lit(tau)).alias("is_kept"),
        )
    )
