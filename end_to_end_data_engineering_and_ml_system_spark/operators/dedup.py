"""Near-duplicate detection for training-data pipelines: n-gram Jaccard,
MinHash + LSH, SimHash. All formulations are the distributed shapes that
survive 100 TB:

- **Inverted-index Jaccard join**: explode distinct shingles → self-join on
  shingle → count shared per pair. Never materializes the O(n²) pair matrix;
  the join only produces pairs that share ≥1 shingle. At corpus scale add
  ``max_shingle_doc_freq`` to drop stop-shingles (a shingle in k docs yields
  k² join rows — frequency capping bounds the blowup, standard practice).
- **MinHash**: one explode + cross join with a tiny seed table + min-agg.
  The "random permutation" per seed is the lexicographic order of
  ``md5(seed || ':' || shingle)`` — engine-portable (md5 is identical
  everywhere) and uniform. Signatures are rows ``(id, seed, minhash)``,
  the shuffle-friendly long format.
- **LSH banding**: group signature rows into ``bands`` buckets of ``rows_per_band``
  hashes; bucket key = md5 of the ordered concatenation. Candidate pairs =
  self-join per (band, bucket) — only same-bucket pairs are generated.
- **SimHash**: 64-bit signature from per-token xxhash64 bit votes; near-dups
  have small Hamming distance. JVM-side bit arithmetic, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..sources.catalog import spread_for_compute
from .text import ngrams, tokens


def _spread_text(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, text) projection, hash-spread by id across the session's cores.

    Every pipeline in this module starts with tokenize + per-shingle md5 /
    xxhash64 over the raw text — by far the expensive per-row work — and on
    a single-row-group fixture scan all of it would otherwise run in ONE
    task (guide §2.5). Projecting first keeps the exchange to the two used
    columns (guide §2.3); the guard in ``spread_for_compute`` makes this a
    no-op on well-split inputs. Result-exact: ids are unique, and every
    consumer is an exact aggregate / equi-join / per-row hash projection."""
    return spread_for_compute(df.select(F.col(id_col), F.col(text_col)), id_col)


def shingles(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from a *materialized token array*
    column, as zip_with over shifted slices.

    Deliberately NOT ``transform(sequence(1, m), i -> element_at ...)``:
    that shape interpret-evaluates an O(m) element_at per lambda call and
    measured 10-20× slower (sf0.1: 9-18s vs 0.9s for the same 260k
    shingles). zip_with walks the arrays once."""
    return F.array_distinct(ngrams(toks, n))


def exploded_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """(id, n_shingles, shingle) long format — the inverted-index input.

    THE EXPLODE-GUARD DEVICE (referenced by every ``explode_outer`` +
    ``isNotNull`` pair in this repo): a plain ``explode(e)`` makes Catalyst
    infer a ``size(e) > 0 AND isnotnull(e)`` Filter below the Generate
    (InferFiltersFromGenerate), and filter pushdown then substitutes the
    column away — the inferred condition re-expands the whole derived-array
    pipeline (tokenize+ngrams+distinct here: the plan's ``split(trim(...))``
    count was 14) and FilterExec does not share those evaluations with the
    projection. ``explode_outer`` gets NO inferred guard; the explicit
    ``isNotNull`` on the GENERATED column cannot be pushed below the
    Generate (the column does not exist there), so it costs one null-check
    per row. Results are identical whenever the array's ELEMENTS are never
    NULL (split/concat_ws-derived arrays): outer emits exactly one
    null-element row for each empty/NULL array — the rows explode dropped.
    Measured on this operator: 1.20 → 0.36 s med at sf0.1 (−70%), plan
    tokenize count 14 → 1."""
    sh = _spread_text(df, id_col, text_col).select(
        F.col(id_col), tokens(text_col).alias("__toks")
    ).select(F.col(id_col), shingles(F.col("__toks"), n).alias("sh"))
    return sh.select(
        id_col,
        F.size("sh").alias("n_sh"),
        F.explode_outer("sh").alias("shingle"),
    ).filter(F.col("shingle").isNotNull())


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.6,
    max_shingle_doc_freq: int | None = None,
) -> DataFrame:
    """Similarity join: pairs (id1 < id2) with shingle-set Jaccard ≥ threshold."""
    s = exploded_shingles(df, id_col, text_col, n)
    # join on an 8-byte hash, not the shingle string: narrower shuffle, and
    # the inverted-index semantics are unchanged (shingles are distinct per
    # doc before hashing). The doc's shingle count rides along (8 bytes per
    # row on the exchange): the old shape re-tokenized the corpus in a
    # separate `sizes` table and re-attached it through TWO post-aggregation
    # joins — two extra full tokenize+shingle passes over the corpus text,
    # which is the expensive part of this pipeline at 100 TB. Capping, when
    # active, deliberately keeps the original sizes: the oracle's Jaccard
    # denominator uses the full distinct-shingle counts.
    s = s.select(id_col, "n_sh", F.xxhash64("shingle").alias("sh"))
    if max_shingle_doc_freq is not None:
        freq = s.groupBy("sh").agg(F.count("*").alias("df_"))
        keep = freq.filter(F.col("df_") <= max_shingle_doc_freq).select("sh")
        s = s.join(keep, "sh")
    # self-join with a merge hint, NOT broadcast: the two sides are the same
    # subplan, so the shuffle-on-sh exchange is computed once and reused
    # (broadcast would evaluate the explode twice — once to build, once to
    # probe — and can't work at corpus scale anyway). Measured ~1.8× faster.
    a = s.select(
        F.col(id_col).alias("id1"), F.col("n_sh").alias("n1"), "sh"
    ).hint("merge")
    b = s.select(
        F.col(id_col).alias("id2"), F.col("n_sh").alias("n2"), "sh"
    ).hint("merge")
    # n1/n2 are constant per doc id, so folding them into the pair
    # aggregation (min = the constant) is exact — no size-lookup joins
    pairs = (
        a.join(b, ["sh"])
        .filter(F.col("id1") < F.col("id2"))
        .groupBy("id1", "id2")
        .agg(
            F.count("*").alias("shared"),
            F.min("n1").alias("n1"),
            F.min("n2").alias("n2"),
        )
    )
    jac = F.col("shared").cast("double") / (
        F.col("n1") + F.col("n2") - F.col("shared")
    )
    return pairs.select("id1", "id2", jac.alias("jaccard")).filter(
        F.col("jaccard") >= threshold
    )


def minhash_wide(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int = 8, n: int = 3
) -> DataFrame:
    """Wide MinHash signatures: one row per doc, columns h0..h{k-1}.

    All k min-hashes are pure ARRAY PROJECTIONS over the per-doc shingle
    array (``array_min`` of the per-seed md5 transform) — ZERO shuffles.
    The previous shape exploded the shingles and folded the mins through a
    partial-aggregated groupBy: same md5 count, but one full exchange of
    per-doc signature rows that this formulation simply does not need (the
    min over a doc's shingles never has to leave the row the shingles are
    already on). Measured −1.7s on the sf0.1 signature stage with
    bit-identical output; at corpus scale it removes an O(corpus) shuffle.
    Banding stays a projection (no second shuffle), as before.

    Docs with zero shingles (empty/whitespace/too-short text) are dropped,
    exactly as the explode-based shape dropped them (no rows to explode);
    the token-count precondition pins that contract — ``array_min`` over
    an empty array would otherwise emit an all-NULL signature row.

    The zero-shingle drop is ``size(__toks) >= n`` (a doc has >= 1 n-gram
    shingle iff it has >= n tokens — NULL text gives size = -1, dropped
    either way), NOT ``size(__sh) >= 1``: Catalyst pushes filters through
    projections by SUBSTITUTION regardless of expression cost, so a
    predicate over the shingle array re-expands the whole
    tokenize+ngram+distinct pipeline inside the pushed-down Filter (the
    token array alone appeared 6x in the rewritten condition — every row
    paid ~7 tokenizes and 2 shingle builds). The token-count form pushes
    down as ONE tokenize; r15 A/B: signature stage −51% (1.44 → 0.70 s
    med at sf0.1), plan's split(trim(...)) count 8 → 3, bit-identical
    rows (equality pinned incl. empty/whitespace/short/NULL-text docs by
    test_minhash_token_precondition_matches_shingle_filter)."""
    df = _spread_text(df, id_col, text_col)
    sh = (
        df.select(F.col(id_col), tokens(text_col).alias("__toks"))
        .filter(F.size("__toks") >= n)
        .select(F.col(id_col), shingles(F.col("__toks"), n).alias("__sh"))
    )
    cols = [
        F.array_min(
            F.transform("__sh", lambda s: F.md5(F.concat(F.lit(f"{i}:"), s)))
        ).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return sh.select(id_col, *cols)


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int = 8, n: int = 3
) -> DataFrame:
    """Long-format MinHash signatures (id, seed, minhash) — the
    shuffle-friendly interchange shape; computed wide, unpivoted free."""
    wide = minhash_wide(df, id_col, text_col, num_hashes, n)
    pairs = F.array(
        *[
            F.struct(
                F.lit(i).cast("bigint").alias("seed"),
                F.col(f"h{i}").alias("minhash"),
            )
            for i in range(num_hashes)
        ]
    )
    return wide.select(id_col, F.explode(pairs).alias("p")).select(
        id_col, "p.seed", "p.minhash"
    )


def lsh_buckets_wide(
    wide: DataFrame, id_col: str, num_hashes: int, rows_per_band: int = 2
) -> DataFrame:
    """(id, band, bucket) from wide signatures: pure projection + explode,
    zero extra shuffles. Bucket key = md5 of the seed-ordered minhash
    concatenation within the band.

    ``num_hashes`` must divide evenly into bands: trailing hashes that do
    not fill a band would be computed-but-never-banded (silently lower
    recall than the requested signature width), and ``rows_per_band >
    num_hashes`` would yield ZERO bands — every document vanishes and the
    dedup pipeline reports 'no near-dups' with no error. Both raise."""
    if rows_per_band <= 0 or num_hashes % rows_per_band != 0:
        raise ValueError(
            f"rows_per_band={rows_per_band} must divide num_hashes="
            f"{num_hashes} evenly (a partial band would silently drop "
            "the trailing hashes; zero bands would drop every document)"
        )
    bands = num_hashes // rows_per_band
    rows = F.array(
        *[
            F.struct(
                F.lit(b).cast("bigint").alias("band"),
                F.md5(
                    F.concat_ws(
                        "|",
                        *[
                            F.col(f"h{b * rows_per_band + r}")
                            for r in range(rows_per_band)
                        ],
                    )
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    return wide.select(id_col, F.explode(rows).alias("bb")).select(
        id_col, "bb.band", "bb.bucket"
    )


def cap_bucket_size(
    buckets: DataFrame, bucket_keys: list[str], max_bucket_size: int
) -> DataFrame:
    """Drop rows belonging to buckets with more than ``max_bucket_size``
    members — the hot-bucket guard for LSH candidate generation.

    A single viral bucket of k members yields k² candidate pairs in the
    self-join; at corpus scale one such bucket dominates the whole stage
    (same stop-shingle pathology ``max_shingle_doc_freq`` caps on the exact
    Jaccard path). The size count is a window over the same (band, bucket)
    partitioning the candidate self-join shuffles on, so Catalyst reuses
    the exchange — no extra data pass."""
    from pyspark.sql import Window

    w = Window.partitionBy(*bucket_keys)
    return (
        buckets.withColumn("__bsz", F.count("*").over(w))
        .filter(F.col("__bsz") <= max_bucket_size)
        .drop("__bsz")
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    rows_per_band: int = 2,
    n: int = 3,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Distinct candidate pairs (id1 < id2) sharing ≥1 LSH band bucket.

    ``max_bucket_size`` caps hot buckets (see :func:`cap_bucket_size`);
    None keeps every bucket — exact banding semantics, quadratic in the
    largest bucket."""
    wide = minhash_wide(df, id_col, text_col, num_hashes, n)
    buckets = lsh_buckets_wide(wide, id_col, num_hashes, rows_per_band)
    if max_bucket_size is not None:
        buckets = cap_bucket_size(buckets, ["band", "bucket"], max_bucket_size)
    # merge hint for the same reason as jaccard_pairs: the two sides are
    # the same subplan, so the shuffle-on-(band,bucket) exchange is built
    # once and reused. Without it, now that the signature pipeline upstream
    # is a pure projection (cheap-looking to the planner), AQE broadcasts
    # one side — evaluating the whole tokenize+md5 pipeline TWICE (measured
    # ~2× the candidate-stage wall) and hitting the 8 GB broadcast cap at
    # corpus scale.
    a = buckets.select(F.col(id_col).alias("id1"), "band", "bucket").hint(
        "merge"
    )
    b = buckets.select(F.col(id_col).alias("id2"), "band", "bucket").hint(
        "merge"
    )
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .distinct()
    )


def simhash_table(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash) via explode + 64 codegen'd bit-vote sums.

    The batch shape of ``simhash64``: exploding tokens and summing the 64
    per-bit ±1 votes as grouped aggregates keeps everything in whole-stage
    codegen with map-side partial aggregation — measured ~5× faster than the
    interpreted per-bit ``aggregate`` loop, and the shuffle carries one
    64-long vote row per doc."""
    df = _spread_text(df, id_col, text_col)
    toked = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
    hashed = toked.select(id_col, F.xxhash64("tok").alias("h"))
    votes = hashed.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, F.lit(1)
                ).otherwise(F.lit(-1))
            ).alias(f"v{j}")
            for j in range(64)
        ]
    )
    sig = None
    for j in range(64):
        bit = F.when(
            F.col(f"v{j}") > 0, F.shiftleft(F.lit(1).cast("bigint"), j)
        ).otherwise(F.lit(0).cast("bigint"))
        sig = bit if sig is None else sig + bit
    return votes.select(id_col, sig.alias("simhash"))


def simhash64(col: Column | str) -> Column:
    """64-bit SimHash over whitespace tokens: per-bit ±1 votes from each
    token's xxhash64; bit set iff the vote sum is positive. Pure JVM bit
    arithmetic (no UDF); near-duplicate texts differ in few bits."""
    toks = tokens(col)
    hashes = F.transform(toks, lambda t: F.xxhash64(t))

    out = F.lit(0).cast("bigint")
    for j in range(64):
        # vote_j = sum over tokens of (bit_j(h) ? 1 : -1)
        votes = F.aggregate(
            hashes,
            F.lit(0).cast("bigint"),
            lambda acc, h: acc
            + F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(
                F.lit(-1)
            ),
        )
        out = out + F.when(
            votes > 0, F.shiftleft(F.lit(1).cast("bigint"), j)
        ).otherwise(F.lit(0).cast("bigint"))
    return out


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit signatures (popcount of xor)."""
    return F.bit_count(a.bitwiseXOR(b))


def shingle_hash_sets(
    df: DataFrame, id_col: str, text_col: str, n: int, out_id: str | None = None
) -> DataFrame:
    """(id, sh_set): sorted distinct shingle-hash array per document — THE
    exact-Jaccard verification-set definition, shared by every verify path
    (``lsh_verified_near_dups``, ``incremental_near_dups``,
    ``minhash_estimate_vs_exact``) so the three pipelines can never
    desynchronize on the hash or the sort."""
    oid = out_id or id_col
    df = _spread_text(df, id_col, text_col)
    return df.select(
        F.col(id_col).alias(oid), tokens(text_col).alias("__toks")
    ).select(
        oid,
        F.array_sort(
            F.transform(shingles(F.col("__toks"), n), lambda s: F.xxhash64(s))
        ).alias("sh_set"),
    )


def minhash_and_sets(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int, n: int
) -> DataFrame:
    """ONE tokenize+shingle pass computing BOTH per-doc dedup artifacts:
    the wide MinHash signature (h0..h{k-1}, exactly ``minhash_wide``'s
    expressions) and the sorted shingle-hash verification set (exactly
    ``shingle_hash_sets``'s). Callers that need signatures AND sets
    (``lsh_verified_near_dups``, ``minhash_estimate_vs_exact``) previously
    evaluated the tokenize+shingle subtree once per consumer — 3 full
    corpus scans of the most expensive per-row stage; persisting this
    combined frame (the caller's job, via ``_track_persist``) makes it one.
    Zero-shingle docs are dropped, as both source operators' consumers
    require (they can never be banding candidates) — via the same
    token-count precondition as ``minhash_wide`` (``size(__toks) >= n``,
    equivalent to ``size(__sh) >= 1`` but pushdown-cheap: a shingle-array
    predicate re-expands the whole tokenize+shingle pipeline inside the
    pushed-down Filter; see minhash_wide's docstring)."""
    sh = (
        _spread_text(df, id_col, text_col)
        .select(F.col(id_col), tokens(text_col).alias("__toks"))
        .filter(F.size("__toks") >= n)
        .select(F.col(id_col), shingles(F.col("__toks"), n).alias("__sh"))
    )
    cols = [
        F.array_min(
            F.transform("__sh", lambda s: F.md5(F.concat(F.lit(f"{i}:"), s)))
        ).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return sh.select(
        id_col,
        *cols,
        F.array_sort(
            F.transform("__sh", lambda s: F.xxhash64(s))
        ).alias("sh_set"),
    )


def lsh_verified_near_dups(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    rows_per_band: int = 2,
    n: int = 3,
    threshold: float = 0.6,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """The 100 TB near-dedup pipeline: LSH banding proposes candidate pairs,
    exact Jaccard verifies only those pairs.

    The exact similarity join (``jaccard_pairs``) blows up quadratically on
    replica-heavy corpora — every group of k near-identical docs contributes
    k² inverted-index join rows (measured: 10× corpus with 10-replica groups
    → 13× wall). Candidates from banding scale ~linearly, and verification
    is one ``array_intersect`` per candidate pair over the docs' shingle-hash
    arrays — no explode, no inverted-index shuffle.

    The per-doc signatures and verification sets come from ONE persisted
    combined frame (``minhash_and_sets``): banding, both verify joins, and
    the candidate self-join's two sides all read the cache, so the corpus
    text is tokenized+shingled exactly once per run (was 3×). The tracked
    persist is released by every harness between queries; at corpus scale
    the frame is O(docs × shingles) — the artifact a production dedup
    materializes anyway."""
    from .relational import _track_persist

    per_doc = _track_persist(
        minhash_and_sets(df, id_col, text_col, num_hashes, n)
    )
    hcols = [f"h{i}" for i in range(num_hashes)]
    buckets = lsh_buckets_wide(
        per_doc.select(id_col, *hcols), id_col, num_hashes, rows_per_band
    )
    if max_bucket_size is not None:
        buckets = cap_bucket_size(buckets, ["band", "bucket"], max_bucket_size)
    # merge hint — same rationale as lsh_candidate_pairs: the two sides are
    # the same cached subplan; one (band, bucket) exchange, built once
    a = buckets.select(F.col(id_col).alias("id1"), "band", "bucket").hint(
        "merge"
    )
    b = buckets.select(F.col(id_col).alias("id2"), "band", "bucket").hint(
        "merge"
    )
    cands = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .distinct()
    )
    sets_ = per_doc.select(id_col, "sh_set")
    j = (
        cands.join(sets_.select(F.col(id_col).alias("id1"), F.col("sh_set").alias("s1")), "id1")
        .join(sets_.select(F.col(id_col).alias("id2"), F.col("sh_set").alias("s2")), "id2")
    )
    inter = F.size(F.array_intersect(F.col("s1"), F.col("s2")))
    union = F.size(F.col("s1")) + F.size(F.col("s2")) - inter
    jac = inter.cast("double") / union
    return j.select("id1", "id2", jac.alias("jaccard")).filter(
        F.col("jaccard") >= threshold
    )


def simhash_table_portable(
    df: DataFrame, id_col: str, text_col: str, bits: int = 60
) -> DataFrame:
    """(id, simhash) like :func:`simhash_table`, but engine-portable.

    ``xxhash64`` exists only in Spark; this variant hashes each token with
    md5 and takes the first 15 hex chars (60 bits — 16 would overflow signed
    BIGINT), so any engine with md5 reproduces the signature bit-for-bit
    (DuckDB mirror: ``CAST(concat('0x', substr(md5(tok),1,15)) AS BIGINT)``).
    Same scale shape as the fast path: explode + ``bits`` codegen'd grouped
    vote sums, map-side partial aggregation, one vote row per doc on the
    shuffle. Use the xxhash64 table for throughput, this one when signatures
    must be reproducible outside Spark."""
    if not 1 <= bits <= 60:
        raise ValueError("bits must be in [1, 60]")
    df = _spread_text(df, id_col, text_col)
    toked = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
    h = F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("bigint")
    hashed = toked.select(id_col, h.alias("h"))
    votes = hashed.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, F.lit(1)
                ).otherwise(F.lit(-1))
            ).alias(f"v{j}")
            for j in range(bits)
        ]
    )
    sig = None
    for j in range(bits):
        bit = F.when(
            F.col(f"v{j}") > 0, F.shiftleft(F.lit(1).cast("bigint"), j)
        ).otherwise(F.lit(0).cast("bigint"))
        sig = bit if sig is None else sig + bit
    return votes.select(id_col, sig.alias("simhash"))


def incremental_near_dups(
    corpus: DataFrame,
    new: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    rows_per_band: int = 2,
    n: int = 3,
    threshold: float = 0.6,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-dups of a NEW document batch against an EXISTING corpus — the
    shape production dedup actually runs: a daily increment is checked
    against the accumulated 100 TB corpus, never corpus-vs-corpus.

    Returns (new_id, corpus_id, jaccard >= threshold). Only cross-side pairs
    are reported; dups *within* the new batch are `lsh_verified_near_dups`'s
    job. The candidate join is new-buckets × corpus-buckets on (band,
    bucket) — at scale the corpus side is precomputed once and stored
    partitioned by (band, bucket) (see sources/partitioned.py), so each
    increment shuffles only the new batch's buckets; ``max_bucket_size``
    caps hot corpus buckets the same way the self-join path does."""
    # one persisted combined signature+set frame PER SIDE (minhash_and_sets):
    # each side previously evaluated its tokenize+shingle subtree twice
    # (buckets + verify set) — now once, and the harnesses release the
    # tracked persists between queries
    from .relational import _track_persist

    hcols = [f"h{i}" for i in range(num_hashes)]
    pc = _track_persist(minhash_and_sets(corpus, id_col, text_col, num_hashes, n))
    pn = _track_persist(minhash_and_sets(new, id_col, text_col, num_hashes, n))
    cb = lsh_buckets_wide(
        pc.select(id_col, *hcols), id_col, num_hashes, rows_per_band
    ).select(F.col(id_col).alias("corpus_id"), "band", "bucket")
    if max_bucket_size is not None:
        # cap_bucket_size only touches the bucket keys — no rename
        # round-trip needed (and renaming to id_col would create a
        # duplicate column if id_col were 'band'/'bucket')
        cb = cap_bucket_size(cb, ["band", "bucket"], max_bucket_size)
    nb = lsh_buckets_wide(
        pn.select(id_col, *hcols), id_col, num_hashes, rows_per_band
    ).select(F.col(id_col).alias("new_id"), "band", "bucket")
    cands = nb.join(cb, ["band", "bucket"]).select("new_id", "corpus_id").distinct()

    def _sets(df: DataFrame, alias: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(alias), F.col("sh_set").alias(f"sh_{alias}")
        )

    j = cands.join(_sets(pn, "new_id"), "new_id").join(
        _sets(pc, "corpus_id"), "corpus_id"
    )
    inter = F.size(F.array_intersect(F.col("sh_new_id"), F.col("sh_corpus_id")))
    union = F.size(F.col("sh_new_id")) + F.size(F.col("sh_corpus_id")) - inter
    jac = inter.cast("double") / union
    return j.select("new_id", "corpus_id", jac.alias("jaccard")).filter(
        F.col("jaccard") >= threshold
    )


def contamination_check(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Benchmark-contamination scan: for each corpus document, the fraction
    of its distinct word n-grams that also occur anywhere in a benchmark
    corpus (the standard train/test-leakage check run before LLM training).

    Returns (id, n_ngrams, shared_ngrams, contamination) for documents at or
    above ``threshold``.

    Scale shape (100 TB corpus vs MB-scale benchmark): eval suites are tiny,
    so the benchmark's distinct-shingle set is built once and **broadcast**;
    the corpus is exploded exactly once and inner-joined against that
    broadcast set, so only matching shingle rows ever reach the per-document
    count shuffle. No corpus self-join, no pairwise comparison, and the
    corpus-side explode is map-side only."""
    cand = exploded_shingles(corpus, id_col, text_col, n)
    bench_sh = (
        exploded_shingles(benchmark, id_col, text_col, n)
        .select("shingle")
        .distinct()
    )
    shared = (
        cand.join(F.broadcast(bench_sh), "shingle")
        .groupBy(id_col)
        .agg(
            F.min("n_sh").cast("bigint").alias("n_ngrams"),
            F.count("*").alias("shared_ngrams"),
        )
    )
    contamination = F.col("shared_ngrams").cast("double") / F.col("n_ngrams")
    return shared.select(
        id_col,
        "n_ngrams",
        "shared_ngrams",
        contamination.alias("contamination"),
    ).filter(F.col("contamination") >= threshold)


def edit_distance_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    prefix_len: int = 64,
    block_len: int = 8,
    length_band: int = 32,
    max_dist: int = 8,
    extra_block_cols: tuple[str, ...] = (),
    min_norm_len: int = 1,
) -> DataFrame:
    """Blocked edit-distance near-dup pairs — the entity-resolution-style
    sibling of the shingle family: pairs whose normalized text PREFIXES are
    within ``max_dist`` Levenshtein edits.

    Blocking (the scale shape): candidates must agree on ``extra_block_cols``
    and on the first ``block_len`` normalized characters, and their
    normalized lengths must differ by at most ``length_band``. The join is a
    plain equi-join on the block key, so work is quadratic only within a
    block — the classic prefix-blocking trade: a near-dup differing inside
    the first ``block_len`` characters is missed, in exchange for never
    materializing the O(n²) pair matrix. The expensive ``levenshtein`` runs
    only on surviving candidates, JVM-side (no UDF).

    Text is normalized to printable ASCII first: Spark's levenshtein counts
    characters while engines like DuckDB count bytes, and on ASCII the two
    agree — making the operator's results portable across engines (this is
    also why the oracle for the registered query is exact).

    Rows whose normalization is shorter than ``min_norm_len`` are excluded:
    a document with no printable-ASCII content (all-CJK/Cyrillic text)
    would otherwise normalize to '' and land in one shared block where
    every pair scores prefix_edit_distance 0 — reporting completely
    different documents as exact near-dups AND growing that block
    quadratically. Callers comparing non-Latin corpora should block on a
    transliteration or use the shingle family instead."""
    norm = F.regexp_replace(F.col(text_col), "[^ -~]", "")
    t = df.select(
        F.col(id_col),
        *[F.col(c) for c in extra_block_cols],
        F.substring(norm, 1, prefix_len).alias("__pfx"),
        F.substring(norm, 1, block_len).alias("__blk"),
        F.length(norm).alias("__n"),
    ).filter(F.col("__n") >= F.lit(min_norm_len))
    a = t.alias("a")
    b = t.alias("b")
    block_eq = [F.col(f"a.{c}") == F.col(f"b.{c}") for c in extra_block_cols]
    cond = (
        F.col("a.__blk") == F.col("b.__blk"),
        *block_eq,
        F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
        F.abs(F.col("a.__n") - F.col("b.__n")) <= F.lit(length_band),
    )
    joined = a.join(b, list(cond), "inner")
    dist = F.levenshtein(F.col("a.__pfx"), F.col("b.__pfx"))
    return joined.select(
        F.col(f"a.{id_col}").alias("doc_a"),
        F.col(f"b.{id_col}").alias("doc_b"),
        dist.alias("prefix_edit_distance"),
    ).filter(F.col("prefix_edit_distance") <= max_dist)


def simhash_near_dup_pairs(
    sig_df: DataFrame,
    id_col: str,
    sig_col: str = "simhash",
    bits: int = 60,
    chunks: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """EXACT hamming-radius pairs over SimHash signatures via pigeonhole
    banding: split each ``bits``-wide signature into ``chunks`` equal
    chunks; two signatures within ``max_hamming <= chunks - 1`` bit flips
    MUST share at least one identical chunk (pigeonhole), so the
    chunk-equality self-join generates a candidate superset and the
    ``bit_count(xor)`` verify keeps exactly the true pairs — no recall
    loss, unlike probabilistic LSH banding.

    Scale shape: signatures explode to ``chunks`` rows each, the join is
    an equi-join on (chunk_no, chunk_value), and the verify is two integer
    instructions per candidate. Hot chunk values (e.g. the all-zeros chunk
    from short docs) can be capped with :func:`cap_bucket_size`."""
    if bits % chunks != 0:
        raise ValueError("chunks must divide bits evenly")
    if max_hamming > chunks - 1:
        raise ValueError(
            "pigeonhole exactness needs max_hamming <= chunks - 1"
        )
    width = bits // chunks
    mask = (1 << width) - 1
    chunk_rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("chunk_no"),
                F.shiftright(F.col(sig_col), i * width)
                .bitwiseAND(F.lit(mask))
                .alias("chunk_val"),
            )
            for i in range(chunks)
        ]
    )
    banded = sig_df.select(
        F.col(id_col), F.col(sig_col), F.explode(chunk_rows).alias("c")
    ).select(id_col, sig_col, "c.chunk_no", "c.chunk_val")
    a = banded.select(
        F.col(id_col).alias("id1"),
        F.col(sig_col).alias("sig1"),
        "chunk_no",
        "chunk_val",
    )
    b = banded.select(
        F.col(id_col).alias("id2"),
        F.col(sig_col).alias("sig2"),
        "chunk_no",
        "chunk_val",
    )
    cand = (
        a.join(b, ["chunk_no", "chunk_val"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2", "sig1", "sig2")
        .distinct()
    )
    hamming = hamming64(F.col("sig1"), F.col("sig2"))
    return cand.select(
        "id1", "id2", hamming.cast("int").alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)


def minhash_estimate_vs_exact(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    rows_per_band: int = 2,
    n: int = 3,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Calibration of the MinHash estimator against ground truth: for every
    LSH candidate pair, the signature-agreement estimate (matching seeds /
    num_hashes) next to the exact shingle-set Jaccard and their absolute
    error. This is the query that tells you whether ``num_hashes`` is
    enough BEFORE you trust banding thresholds on a new corpus.

    Scale shape: candidates come from banding (~linear), and every join is
    keyed on doc ids — the wide signature table and the shingle-set table
    are each one row per doc. The estimate is a pure projection over the
    joined wide signatures (no per-seed explode or join). Signatures, sets
    and the banding input all come from ONE persisted combined frame
    (``minhash_and_sets``) — previously 5 separate evaluations of the
    tokenize+shingle subtree (candidates + 2 signature sides + 2 set
    sides), now one pass."""
    from .relational import _track_persist

    per_doc = _track_persist(
        minhash_and_sets(df, id_col, text_col, num_hashes, n)
    )
    hcols = [f"h{i}" for i in range(num_hashes)]
    buckets = lsh_buckets_wide(
        per_doc.select(id_col, *hcols), id_col, num_hashes, rows_per_band
    )
    if max_bucket_size is not None:
        buckets = cap_bucket_size(buckets, ["band", "bucket"], max_bucket_size)
    ca = buckets.select(F.col(id_col).alias("id1"), "band", "bucket").hint(
        "merge"
    )
    cb = buckets.select(F.col(id_col).alias("id2"), "band", "bucket").hint(
        "merge"
    )
    cands = (
        ca.join(cb, ["band", "bucket"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .distinct()
    )
    w1 = per_doc.select(
        F.col(id_col).alias("id1"),
        *[F.col(f"h{i}").alias(f"a{i}") for i in range(num_hashes)],
    )
    w2 = per_doc.select(
        F.col(id_col).alias("id2"),
        *[F.col(f"h{i}").alias(f"b{i}") for i in range(num_hashes)],
    )
    s1 = per_doc.select(F.col(id_col).alias("id1"), F.col("sh_set").alias("s1"))
    s2 = per_doc.select(F.col(id_col).alias("id2"), F.col("sh_set").alias("s2"))
    j = cands.join(w1, "id1").join(w2, "id2").join(s1, "id1").join(s2, "id2")
    matches = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(num_hashes)
    )
    est = matches / F.lit(float(num_hashes))
    inter = F.size(F.array_intersect(F.col("s1"), F.col("s2")))
    union = F.size(F.col("s1")) + F.size(F.col("s2")) - inter
    exact = inter.cast("double") / union
    return j.select(
        "id1",
        "id2",
        est.alias("est_jaccard"),
        exact.alias("exact_jaccard"),
        F.abs(est - exact).alias("abs_err"),
    )
