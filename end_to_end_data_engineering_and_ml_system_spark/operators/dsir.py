"""DSIR-style data selection: hashed n-gram importance resampling
(Xie, Santurkar, Ma, Liang 2023, "Data Selection for Language Models
via Importance Resampling" — the public method behind domain-targeted
pretraining-corpus selection).

A target domain is described by a predicate over the corpus (here: the
curated sources). Both the target slice and the full raw corpus are
reduced to bag-of-hashed-bigram distributions over ``B`` buckets
(+1-smoothed); each document's importance log-weight is

    lambda(doc) = sum_b c_doc[b] * (ln p_target[b] - ln q_raw[b])

and selection keeps the top-k by weight (or Gumbel-resamples — the
package's deterministic md5 A-ES sampler composes for that).

Spark shape — three scans' worth of work from ONE exploded projection:

- tokenize + bigram entirely JVM-side (``split``/``slice``/``zip_with``,
  no Python), md5-bucket with the package's engine-portable
  ``conv(substr(md5(x),1,8),16,10) % B`` idiom;
- the two distributions are grouped counts over the same exploded frame
  (target = filtered), each a ≤B-row aggregate that rides a broadcast
  back onto the per-doc bucket counts;
- per-doc weights are one more grouped sum — no UDF, no collect, and
  the bucket tables stay B rows no matter how many petabytes the raw
  corpus is. At 100 TB the raw/target distributions are precomputable
  once and reused across selection runs (same shape as the incremental
  dedup corpus side).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bigram_buckets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 256,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """(id, *carry, bucket, c): hashed-bigram bucket counts per document.

    Whitespace tokens -> adjacent pairs via ``zip_with`` over two offset
    slices (empty-safe for 0/1-token docs) -> md5 bucket. One projection
    + one explode + one groupBy; everything whole-stage codegen."""
    ts = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
        lambda t: t != "",
    )
    n = F.greatest(F.size(ts) - 1, F.lit(0))
    bg = F.zip_with(
        F.slice(ts, 1, n),
        F.slice(ts, 2, n),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    # explode_outer + isNotNull: see dedup.exploded_shingles (the inferred
    # explode guard re-expands the bigram pipeline; concat elements are
    # never NULL)
    exploded = docs.select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        F.explode_outer(bg).alias("ngram"),
    ).filter(F.col("ngram").isNotNull())
    bucket = (
        F.conv(F.substring(F.md5(F.col("ngram")), 1, 8), 16, 10).cast("bigint")
        % buckets
    )
    return exploded.groupBy(
        id_col, *carry, bucket.alias("bucket")
    ).agg(F.count("*").alias("c"))


def dsir_log_weights(
    docs: DataFrame,
    target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 256,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document DSIR importance log-weight against the ``target``
    predicate: (id, *carry, n_ngrams, dsir_logweight).

    The +1/(N+B) smoothing keeps every bucket finite, so ln() never sees
    a zero; the raw distribution is over ALL docs (target included),
    matching the paper's raw-pool formulation."""
    # feed the predicate through as a carried flag so target/raw counts
    # come from the SAME per-doc aggregate (one explode, one shuffle)
    flagged = docs.withColumn("__is_target", target)
    per_doc = bigram_buckets(
        flagged, id_col=id_col, text_col=text_col, buckets=buckets,
        carry=(*carry, "__is_target"),
    )
    raw = per_doc.groupBy("bucket").agg(
        F.sum("c").alias("r_c"),
        F.sum(F.when(F.col("__is_target"), F.col("c")).otherwise(0)).alias(
            "t_c"
        ),
    )
    totals = raw.agg(
        F.sum("r_c").alias("r_tot"), F.sum("t_c").alias("t_tot")
    )
    ratios = raw.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log((F.col("t_c") + 1) / (F.col("t_tot") + buckets))
            - F.log((F.col("r_c") + 1) / (F.col("r_tot") + buckets))
        ).alias("logratio"),
    )
    return (
        per_doc.join(F.broadcast(ratios), "bucket")
        .groupBy(id_col, *carry)
        .agg(
            F.sum("c").alias("n_ngrams"),
            F.sum(F.col("c") * F.col("logratio")).alias("dsir_logweight"),
        )
    )
