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

from .text import tokens


def shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles (1-based ``element_at`` indexing so SQL
    mirrors align)."""
    toks = tokens(col)

    def make(i: Column) -> Column:
        parts = [F.element_at(toks, i + j) for j in range(n)]
        return F.concat_ws(" ", *parts)

    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(0)))
    return F.array_distinct(F.transform(idx, make))


def exploded_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """(id, n_shingles, shingle) long format — the inverted-index input."""
    sh = df.select(F.col(id_col), shingles(text_col, n).alias("sh"))
    return sh.select(
        id_col,
        F.size("sh").alias("n_sh"),
        F.explode("sh").alias("shingle"),
    )


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
    if max_shingle_doc_freq is not None:
        freq = s.groupBy("shingle").agg(F.count("*").alias("df_"))
        keep = freq.filter(F.col("df_") <= max_shingle_doc_freq).select("shingle")
        s = s.join(keep, "shingle")
    a = s.select(
        F.col(id_col).alias("id1"),
        F.col("n_sh").alias("n1"),
        "shingle",
    )
    b = s.select(
        F.col(id_col).alias("id2"),
        F.col("n_sh").alias("n2"),
        "shingle",
    )
    pairs = (
        a.join(b, ["shingle"])
        .filter(F.col("id1") < F.col("id2"))
        .groupBy("id1", "id2")
        .agg(
            F.count("*").alias("shared"),
            F.first("n1").alias("n1"),
            F.first("n2").alias("n2"),
        )
    )
    jac = F.col("shared").cast("double") / (
        F.col("n1") + F.col("n2") - F.col("shared")
    )
    return pairs.select("id1", "id2", jac.alias("jaccard")).filter(
        F.col("jaccard") >= threshold
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int = 8, n: int = 3
) -> DataFrame:
    """Long-format MinHash signatures: (id, seed, minhash)."""
    spark = df.sparkSession
    s = exploded_shingles(df, id_col, text_col, n).select(id_col, "shingle")
    seeds = spark.range(num_hashes).select(F.col("id").alias("seed"))
    return (
        s.crossJoin(F.broadcast(seeds))
        .groupBy(id_col, "seed")
        .agg(
            F.min(
                F.md5(F.concat(F.col("seed").cast("string"), F.lit(":"), F.col("shingle")))
            ).alias("minhash")
        )
    )


def lsh_buckets(
    signatures: DataFrame, id_col: str, rows_per_band: int = 2
) -> DataFrame:
    """(id, band, bucket): band bucket key = md5 of the seed-ordered minhash
    concatenation within the band."""
    sig = signatures.withColumn(
        "band", F.floor(F.col("seed") / F.lit(rows_per_band)).cast("bigint")
    )
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("seed", "minhash"))),
        lambda s: s.getField("minhash"),
    )
    return sig.groupBy(id_col, "band").agg(
        F.md5(F.concat_ws("|", ordered)).alias("bucket")
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    rows_per_band: int = 2,
    n: int = 3,
) -> DataFrame:
    """Distinct candidate pairs (id1 < id2) sharing ≥1 LSH band bucket."""
    sig = minhash_signatures(df, id_col, text_col, num_hashes, n)
    buckets = lsh_buckets(sig, id_col, rows_per_band)
    a = buckets.select(F.col(id_col).alias("id1"), "band", "bucket")
    b = buckets.select(F.col(id_col).alias("id2"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .distinct()
    )


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
