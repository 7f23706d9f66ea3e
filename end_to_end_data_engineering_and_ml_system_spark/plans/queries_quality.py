"""Learned-quality-filter, preference-data, and robust-monitoring queries.

Round-5 surface growth on top of the SURVEY.md §2 parity set:

- the fastText-style LEARNED quality classifier (train + score + audit) that
  LLM data pipelines run after the rule-based heuristics — reference analog:
  the trained-model scoring path of scripts/stream_anomaly_detector.py:230-260
  re-expressed as corpus filtering instead of flow scoring;
- RLHF preference-pair construction (chosen/rejected with a margin) — the
  data-prep step between corpus curation and reward-model training;
- l-diversity (the privacy audit k-anonymity alone misses);
- median/MAD robust outlier detection over event-time buckets (the monitor
  that survives the heavy-tailed traffic a mean/stddev z-score drowns in).

Determinism contract (NOTES.md rules): every cross-engine-compared number is
either an exact integer, a ratio of exact integers computed in one double
division, or a fixed-fold-order double expression whose sub-ulp variation is
absorbed by the driver's 9-decimal rounding; aggregates over doubles are
limited to order-independent min/max.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..ml.quality import (
    FROZEN_QUALITY_WEIGHTS,
    fluency_bp,
    quality_feature_counts,
    quality_logit,
    quality_probability,
    weak_label,
)
from ..sources.catalog import load_table
from .queries import _SQL_SHINGLES, _SQL_VERIFIED_PAIRS
from .queries_graph_retrieval import _MAX_BASKET as _MB
from .registry import register

# DuckDB mirror of ml.quality.quality_feature_counts: the exact integer
# counts every feature and label derives from.
_SQL_QCOUNTS = r"""
    SELECT
        doc_id,
        lang,
        CAST(length(text) AS BIGINT) AS chars,
        CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                             tk -> tk <> '')) AS BIGINT) AS toks,
        CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                             tk -> list_contains(
                                 ['the','a','an','and','or','of','to',
                                  'in','is','it'], tk)))
             AS BIGINT) AS nstop,
        CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g'))
             AS BIGINT) AS npunct,
        CAST(length(regexp_replace(text, '[^A-Z]', '', 'g'))
             AS BIGINT) AS nupper,
        CAST(length(regexp_replace(text, '[^0-9]', '', 'g'))
             AS BIGINT) AS ndigit
    FROM documents
"""

# DuckDB mirror of ml.quality.weak_label: fluency (stopword ratio >= 5%)
# AND substance (>= 200 chars), exact integer comparisons.
_SQL_WL = """(CASE WHEN toks > 0 AND nstop * 100 >= toks * 5
                   AND chars >= 200 THEN 1 ELSE 0 END)"""

# DuckDB mirror of ml.quality.fluency_bp: stopword fluency in basis points.
_SQL_FBP = """(CASE WHEN toks > 0
               THEN CAST(floor(CAST(nstop * 10000 AS DOUBLE)
                               / CAST(toks AS DOUBLE)) AS BIGINT)
               ELSE 0 END)"""

# DuckDB mirror of ml.quality.quality_logit(FROZEN_QUALITY_WEIGHTS): the
# SAME left-to-right fold and term order, literals generated from the one
# frozen constant so the two engines can never drift apart.
_W = [repr(float(w)) for w in FROZEN_QUALITY_WEIGHTS]
_SQL_Z = (
    f"({_W[0]}) * 1.0"
    f" + ({_W[1]}) * (ln(1.0 + CAST(chars AS DOUBLE)) / 10.0)"
    f" + ({_W[2]}) * (CASE WHEN toks > 0 THEN CAST(nstop AS DOUBLE)"
    f" / CAST(toks AS DOUBLE) ELSE 0.0 END)"
    f" + ({_W[3]}) * (CASE WHEN chars > 0 THEN CAST(npunct AS DOUBLE)"
    f" / CAST(chars AS DOUBLE) ELSE 0.0 END)"
    f" + ({_W[4]}) * (CASE WHEN chars > 0 THEN CAST(nupper AS DOUBLE)"
    f" / CAST(chars AS DOUBLE) ELSE 0.0 END)"
    f" + ({_W[5]}) * (CASE WHEN chars > 0 THEN CAST(ndigit AS DOUBLE)"
    f" / CAST(chars AS DOUBLE) ELSE 0.0 END)"
)


@register(
    "quality_classifier_training_curve",
    oracle=None,  # iterative float optimization: loss depends on float
    # summation order across partitions — invariant-tested instead
    # (monotone decreasing convex loss, accuracy beats majority class)
    description=(
        "distributed logistic-regression quality-filter training: per-epoch "
        "log-loss/accuracy series (fastText-style corpus filter trainer)"
    ),
    tags=("ml", "training", "text"),
)
def quality_classifier_training_curve(spark, sf_dir):
    """M7/A13-shape training loop on the LEARNED quality filter: weak labels
    from the rule heuristic, one mapInPandas gradient aggregation per epoch
    (data never leaves the cluster; only the 6-dim weight vector and
    #partitions partial rows move). The returned frame IS the reference's
    ``history.history`` analog (train_autoencoder.py:200-206)."""
    from ..ml.quality import fit_quality_classifier

    docs = load_table(spark, sf_dir, "documents")
    fit = fit_quality_classifier(docs, epochs=12, lr=4.0)
    rows = [
        (e, float(ls), float(ac))
        for e, (ls, ac) in enumerate(zip(fit.losses, fit.accuracies))
    ]
    return spark.createDataFrame(
        rows, "epoch int, train_logloss double, train_accuracy double"
    )


@register(
    "quality_classifier_score_deciles",
    oracle=f"""
        WITH c AS ({_SQL_QCOUNTS}),
        z AS (
            SELECT
                {_SQL_WL} AS wl,
                {_SQL_Z} AS z
            FROM c
        )
        SELECT
            CAST(floor((1.0 / (1.0 + exp(-z))) * 10.0) AS BIGINT) AS decile,
            COUNT(*) AS n_docs,
            CAST(SUM(wl) AS BIGINT) AS n_weak_pos,
            MIN(1.0 / (1.0 + exp(-z))) AS min_prob,
            MAX(1.0 / (1.0 + exp(-z))) AS max_prob
        FROM z
        GROUP BY 1
    """,
    description=(
        "frozen-weights quality-model score deciles vs weak labels — the "
        "calibration table for the learned corpus filter"
    ),
    tags=("ml", "text", "aggregate", "deterministic"),
)
def quality_classifier_score_deciles(spark, sf_dir):
    """Scoring is a pure projection (scan → codegen'd sigmoid of a 6-term
    dot product) + one grouped count on a 10-value key — the 100 TB filter
    pass. Doubles appear only per-row with a fixed fold order; the grouped
    outputs are counts and order-independent min/max."""
    docs = load_table(spark, sf_dir, "documents")
    counted = quality_feature_counts(docs)
    p = quality_probability()
    scored = counted.select(
        F.floor(p * 10.0).cast("bigint").alias("decile"),
        weak_label().alias("wl"),
        p.alias("p"),
    )
    return scored.groupBy("decile").agg(
        F.count("*").alias("n_docs"),
        F.sum("wl").cast("bigint").alias("n_weak_pos"),
        F.min("p").alias("min_prob"),
        F.max("p").alias("max_prob"),
    )


@register(
    "quality_classifier_confusion",
    oracle=f"""
        WITH c AS ({_SQL_QCOUNTS}),
        z AS (
            SELECT {_SQL_WL} AS wl, {_SQL_Z} AS z
            FROM c
        )
        SELECT
            CAST(wl AS INT) AS weak_label,
            CAST(CASE WHEN z >= 0.0 THEN 1 ELSE 0 END AS INT) AS predicted,
            COUNT(*) AS n_docs
        FROM z
        GROUP BY 1, 2
    """,
    description=(
        "confusion matrix of the frozen learned quality filter vs the "
        "rule-based weak labels"
    ),
    tags=("ml", "text", "aggregate", "deterministic"),
)
def quality_classifier_confusion(spark, sf_dir):
    """The model-vs-heuristic audit a data curator reads before swapping the
    learned filter in: 4-cell confusion, one projection + one tiny groupBy.
    The decision threshold is z ≥ 0 (p ≥ 0.5) — compared on the logit so no
    sigmoid is needed on the decision path."""
    docs = load_table(spark, sf_dir, "documents")
    counted = quality_feature_counts(docs)
    return (
        counted.select(
            weak_label().alias("weak_label"),
            (quality_logit() >= 0.0).cast("int").alias("predicted"),
        )
        .groupBy("weak_label", "predicted")
        .agg(F.count("*").alias("n_docs"))
    )


@register(
    "preference_pairs",
    oracle=f"""
        WITH c AS ({_SQL_QCOUNTS}),
        q AS (
            SELECT doc_id, lang, {_SQL_FBP} AS fbp FROM c
        ),
        r AS (
            SELECT
                doc_id, lang, fbp,
                ROW_NUMBER() OVER (
                    PARTITION BY lang ORDER BY fbp DESC, doc_id
                ) AS rk,
                COUNT(*) OVER (PARTITION BY lang) AS n
            FROM q
        )
        SELECT
            a.lang AS lang,
            a.doc_id AS chosen_doc_id,
            b.doc_id AS rejected_doc_id,
            CAST(a.fbp - b.fbp AS BIGINT) AS margin_bp
        FROM r a
        JOIN r b
          ON a.lang = b.lang AND b.rk = a.n - a.rk + 1 AND a.rk < b.rk
        WHERE a.fbp - b.fbp >= 300
    """,
    description=(
        "RLHF preference-pair construction: best-vs-worst quality pairing "
        "per language with a minimum margin"
    ),
    tags=("ml", "text", "window", "join", "deterministic"),
)
def preference_pairs(spark, sf_dir):
    """Chosen/rejected pair mining for reward-model training: rank docs per
    language by integer fluency basis points, mirror-pair rank i with rank
    n+1−i, keep pairs with margin ≥ 300 bp — a clear quality gap between
    the two sides of every pair. One window (shuffle by lang) + a self-join
    on (lang, rank): the join key is the partitioning the window already
    produced, and at 100 TB the per-lang rank would ride a range-partitioned
    sort rather than a single-reducer window (lang cardinality bounds
    parallelism here, same as the oracle semantics)."""
    docs = load_table(spark, sf_dir, "documents")
    q = quality_feature_counts(docs).select(
        "doc_id", "lang", fluency_bp().alias("fbp")
    )
    w = Window.partitionBy("lang").orderBy(
        F.desc("fbp"), F.asc("doc_id")
    )
    r = q.select(
        "doc_id",
        "lang",
        "fbp",
        F.row_number().over(w).alias("rk"),
        F.count("*").over(Window.partitionBy("lang")).alias("n"),
    )
    a = r.alias("a")
    b = r.alias("b")
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("b.rk") == F.col("a.n") - F.col("a.rk") + 1)
            & (F.col("a.rk") < F.col("b.rk")),
        )
        .where(F.col("a.fbp") - F.col("b.fbp") >= 300)
        .select(
            F.col("a.lang").alias("lang"),
            F.col("a.doc_id").alias("chosen_doc_id"),
            F.col("b.doc_id").alias("rejected_doc_id"),
            (F.col("a.fbp") - F.col("b.fbp")).cast("bigint").alias(
                "margin_bp"
            ),
        )
    )


@register(
    "reward_margin_stats",
    oracle=f"""
        WITH c AS ({_SQL_QCOUNTS}),
        q AS (
            SELECT doc_id, lang, {_SQL_FBP} AS fbp FROM c
        ),
        r AS (
            SELECT
                doc_id, lang, fbp,
                ROW_NUMBER() OVER (
                    PARTITION BY lang ORDER BY fbp DESC, doc_id
                ) AS rk,
                COUNT(*) OVER (PARTITION BY lang) AS n
            FROM q
        ),
        p AS (
            SELECT a.lang AS lang, a.fbp - b.fbp AS margin_bp
            FROM r a
            JOIN r b
              ON a.lang = b.lang AND b.rk = a.n - a.rk + 1 AND a.rk < b.rk
            WHERE a.fbp - b.fbp >= 300
        )
        SELECT
            lang,
            COUNT(*) AS n_pairs,
            CAST(SUM(margin_bp) AS BIGINT) AS sum_margin_bp,
            CAST(SUM(margin_bp) AS DOUBLE) / COUNT(*) AS avg_margin_bp,
            CAST(MIN(margin_bp) AS BIGINT) AS min_margin_bp,
            CAST(MAX(margin_bp) AS BIGINT) AS max_margin_bp
        FROM p
        GROUP BY 1
    """,
    description=(
        "per-language preference-pair margin distribution (reward-model "
        "training-data audit)"
    ),
    tags=("ml", "text", "aggregate", "deterministic"),
)
def reward_margin_stats(spark, sf_dir):
    """How much signal the preference pairs carry per language: pair count
    and exact-integer margin stats; the only double is one final division."""
    pairs = preference_pairs(spark, sf_dir)
    return pairs.groupBy("lang").agg(
        F.count("*").alias("n_pairs"),
        F.sum("margin_bp").cast("bigint").alias("sum_margin_bp"),
        (F.sum("margin_bp").cast("double") / F.count("*")).alias(
            "avg_margin_bp"
        ),
        F.min("margin_bp").cast("bigint").alias("min_margin_bp"),
        F.max("margin_bp").cast("bigint").alias("max_margin_bp"),
    )


@register(
    "events_l_diversity_audit",
    oracle="""
        SELECT
            event_type,
            CAST(hour(ts) AS BIGINT) AS hour_of_day,
            COUNT(*) AS class_size,
            COUNT(DISTINCT user_id) AS distinct_users,
            CAST(CASE WHEN COUNT(DISTINCT user_id) >= 3 THEN 1 ELSE 0 END
                 AS INT) AS meets_l3
        FROM events
        GROUP BY 1, 2
    """,
    description=(
        "l-diversity privacy audit: distinct sensitive values per "
        "quasi-identifier class (companion to k-anonymity)"
    ),
    tags=("privacy", "aggregate", "deterministic"),
)
def events_l_diversity_audit(spark, sf_dir):
    """k-anonymity says each (event_type, hour) class is big enough;
    l-diversity asks whether the SENSITIVE attribute (user identity) is
    actually varied inside it — a class of 50 rows all from one user is
    still a disclosure. count + count_distinct in one grouped pass;
    count_distinct partial-aggregates map-side on the (class, user) grain."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type", F.hour("ts").cast("bigint").alias("hour_of_day")
    ).agg(
        F.count("*").alias("class_size"),
        F.countDistinct("user_id").alias("distinct_users"),
        (F.countDistinct("user_id") >= 3).cast("int").alias("meets_l3"),
    )


@register(
    "events_mad_outlier_hours",
    oracle="""
        WITH h AS (
            SELECT date_trunc('hour', ts) AS hour, COUNT(*) AS n_events
            FROM events
            GROUP BY 1
        ),
        s1 AS (
            SELECT CAST(2.0 * median(n_events) AS BIGINT) AS med2 FROM h
        ),
        d AS (
            SELECT hour, n_events, med2,
                   abs(2 * n_events - med2) AS d2
            FROM h, s1
        ),
        s2 AS (
            SELECT CAST(2.0 * median(d2) AS BIGINT) AS m4 FROM d
        )
        SELECT
            hour,
            n_events,
            CAST(med2 AS DOUBLE) / 2.0 AS median_events,
            CAST(m4 AS DOUBLE) / 4.0 AS mad,
            CAST(CASE WHEN 10000 * d2 > 22239 * m4 THEN 1 ELSE 0 END AS INT)
                AS is_outlier
        FROM d, s2
    """,
    description=(
        "median/MAD robust outlier detection on hourly event counts "
        "(|x−med| > 3·1.4826·MAD), exact-integer comparison"
    ),
    tags=("analytics", "timeseries", "aggregate", "deterministic"),
)
def events_mad_outlier_hours(spark, sf_dir):
    """The robust version of the z-score burst monitor: median and MAD
    instead of mean/stddev, so one viral hour can't drag the baseline. The
    medians of integer counts are exact dyadics (med·2 and MAD·4 are
    integers), so the 3·1.4826·MAD threshold becomes the exact integer
    comparison 10000·(2|c−med|) > 22239·(4·MAD) — bit-stable on any engine
    and any partitioning. Two 1-row exact-percentile reads (the documented
    stats-to-literal pattern), then a pure projection over the hourly
    frame."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count("*").alias("n_events"))
    med = hourly.agg(
        F.expr("percentile(n_events, 0.5)").alias("m")
    ).first()["m"]
    med2 = int(round(2.0 * med))
    d = hourly.withColumn(
        "d2", F.abs(2 * F.col("n_events") - F.lit(med2))
    )
    mad_half = d.agg(F.expr("percentile(d2, 0.5)").alias("m")).first()["m"]
    m4 = int(round(2.0 * mad_half))
    return d.select(
        "hour",
        "n_events",
        F.lit(float(med2) / 2.0).alias("median_events"),
        F.lit(float(m4) / 4.0).alias("mad"),
        (10000 * F.col("d2") > F.lit(22239 * m4)).cast("int").alias(
            "is_outlier"
        ),
    )


@register(
    "bpe_learned_merges",
    oracle=None,  # iterative argmax loop — not SQL-expressible; the exact
    # merge sequence is verified against a pure-Python reference BPE in
    # tests/test_bpe.py (deterministic: integer counts, lexicographic
    # tie-break, no floats anywhere)
    description=(
        "distributed BPE tokenizer training: learned merge table with "
        "pair counts (vocab-table iteration, corpus scanned once)"
    ),
    tags=("ml", "text", "tokenizer", "no-oracle"),
)
def bpe_learned_merges(spark, sf_dir):
    """Tokenizer training as a first-class pipeline op: the corpus
    collapses to the word-frequency table in ONE shuffle, and every merge
    iteration runs on that vocab-bounded table (operators/bpe.py). Only
    the 1-row argmax reaches the driver per iteration."""
    from ..operators.bpe import learn_bpe_merges

    docs = load_table(spark, sf_dir, "documents")
    result = learn_bpe_merges(docs, n_merges=24)
    rows = [
        (i, left, right, cnt)
        for i, (left, right, cnt) in enumerate(result.merges)
    ]
    return spark.createDataFrame(
        rows, "merge_rank int, left string, right string, pair_count long"
    )


@register(
    "doc_bpe_learned_token_counts",
    oracle=None,  # depends on the learned merge sequence (see above);
    # application is greedy sequential within-word — verified against the
    # same pure-Python reference end to end
    description=(
        "per-document token counts under the learned BPE (distinct-word "
        "tokenization joined back to the corpus)"
    ),
    tags=("ml", "text", "tokenizer", "no-oracle"),
)
def doc_bpe_learned_token_counts(spark, sf_dir):
    """The corpus-side application shape: distinct words tokenized once
    with all learned merges, lengths broadcast-joined back — the corpus is
    never rewritten per merge, scanned exactly twice total."""
    from ..operators.bpe import bpe_token_lengths, learn_bpe_merges

    docs = load_table(spark, sf_dir, "documents")
    merges = learn_bpe_merges(docs, n_merges=24).merges
    return bpe_token_lengths(docs, merges, broadcast_vocab=True)


@register(
    "user_rate_limit_violations",
    oracle="""
        WITH w AS (
            SELECT
                user_id, ts,
                COUNT(*) OVER (
                    PARTITION BY user_id ORDER BY ts
                    RANGE BETWEEN INTERVAL '59.999999' SECOND PRECEDING
                          AND CURRENT ROW
                ) AS n_in_window
            FROM events
        )
        SELECT user_id, ts, CAST(n_in_window AS BIGINT) AS n_in_window
        FROM w
        WHERE n_in_window > 1
    """,
    description=(
        "sliding-window rate-limit audit: events where the same user sent "
        ">1 event in any trailing 60s window (exact RANGE frame)"
    ),
    tags=("analytics", "window", "abuse", "deterministic"),
)
def user_rate_limit_violations(spark, sf_dir):
    """Ingestion QoS / abuse detection without pre-bucketing artifacts: an
    exact per-event trailing count via a RANGE frame over integer epoch
    timestamps (tumbling buckets would miss straddling bursts;
    second-truncated epochs disagree with fractional event times). One
    shuffle on
    user_id; the frame scans each user's own ordered slice — integer
    counts, bit-stable anywhere."""
    ev = load_table(spark, sf_dir, "events")
    # interval RANGE frame directly over the (tz-naive) timestamp: exact
    # microsecond window semantics, identical in Spark and the oracle, and
    # free of session-timezone epoch conversions (the DataFrame API's
    # rangeBetween only takes numerics, hence the SQL window expression)
    trailing = (
        "COUNT(*) OVER (PARTITION BY user_id ORDER BY ts "
        "RANGE BETWEEN INTERVAL '59.999999' SECOND PRECEDING "
        "AND CURRENT ROW)"
    )
    return (
        ev.select(
            "user_id",
            "ts",
            F.expr(trailing).cast("bigint").alias("n_in_window"),
        )
        .where(F.col("n_in_window") > 1)
    )


@register(
    "events_data_contract_report",
    oracle="""
        SELECT * FROM (
            SELECT
                'event_id_unique' AS "check",
                CAST(CASE WHEN COUNT(*) = COUNT(DISTINCT event_id)
                     THEN 1 ELSE 0 END AS INT) AS passed,
                CAST(COUNT(*) - COUNT(DISTINCT event_id) AS BIGINT)
                    AS violations
            FROM events
            UNION ALL
            SELECT
                'value_non_negative',
                CAST(CASE WHEN SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END) = 0
                     THEN 1 ELSE 0 END AS INT),
                CAST(SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT)
            FROM events
            UNION ALL
            SELECT
                'user_id_not_null',
                CAST(CASE WHEN SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0
                     END) = 0 THEN 1 ELSE 0 END AS INT),
                CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT)
            FROM events
            UNION ALL
            SELECT
                'event_type_in_domain',
                CAST(CASE WHEN SUM(CASE WHEN event_type NOT IN
                     ('view','click','signup','purchase','error') THEN 1
                     ELSE 0 END) = 0 THEN 1 ELSE 0 END AS INT),
                CAST(SUM(CASE WHEN event_type NOT IN
                     ('view','click','signup','purchase','error') THEN 1
                     ELSE 0 END) AS BIGINT)
            FROM events
            UNION ALL
            SELECT
                'ts_not_null',
                CAST(CASE WHEN SUM(CASE WHEN ts IS NULL THEN 1 ELSE 0
                     END) = 0 THEN 1 ELSE 0 END AS INT),
                CAST(SUM(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            FROM events
        ) ORDER BY "check"
    """,
    description=(
        "Great-Expectations-style data contract: five checks (uniqueness, "
        "range, null, domain) evaluated in one aggregation pass"
    ),
    tags=("quality", "aggregate", "deterministic"),
)
def events_data_contract_report(spark, sf_dir):
    """The contract gate a pipeline runs before promoting a batch. All five
    checks fold into ONE full scan: conditional sums + one count_distinct
    (the only expansion; it partial-aggregates on the event_id grain), then
    the wide 1-row result unpivots to a (check, passed, violations) report.
    At 100 TB this is strictly cheaper than five separate validation
    queries — the scan dominates, so do it once."""
    ev = load_table(spark, sf_dir, "events")
    domain = ("view", "click", "signup", "purchase", "error")
    agg = ev.agg(
        F.count("*").alias("n"),
        F.countDistinct("event_id").alias("n_ids"),
        F.sum(F.when(F.col("value") < 0, 1).otherwise(0)).alias("neg_val"),
        F.sum(F.when(F.col("user_id").isNull(), 1).otherwise(0)).alias(
            "null_user"
        ),
        F.sum(
            F.when(~F.col("event_type").isin(*domain), 1).otherwise(0)
        ).alias("bad_type"),
        F.sum(F.when(F.col("ts").isNull(), 1).otherwise(0)).alias(
            "null_ts"
        ),
    )
    checks = agg.select(
        F.array(
            F.struct(
                F.lit("event_id_unique").alias("check"),
                (F.col("n") == F.col("n_ids")).cast("int").alias("passed"),
                (F.col("n") - F.col("n_ids")).cast("bigint").alias(
                    "violations"
                ),
            ),
            F.struct(
                F.lit("value_non_negative").alias("check"),
                (F.col("neg_val") == 0).cast("int").alias("passed"),
                F.col("neg_val").cast("bigint").alias("violations"),
            ),
            F.struct(
                F.lit("user_id_not_null").alias("check"),
                (F.col("null_user") == 0).cast("int").alias("passed"),
                F.col("null_user").cast("bigint").alias("violations"),
            ),
            F.struct(
                F.lit("event_type_in_domain").alias("check"),
                (F.col("bad_type") == 0).cast("int").alias("passed"),
                F.col("bad_type").cast("bigint").alias("violations"),
            ),
            F.struct(
                F.lit("ts_not_null").alias("check"),
                (F.col("null_ts") == 0).cast("int").alias("passed"),
                F.col("null_ts").cast("bigint").alias("violations"),
            ),
        ).alias("checks")
    )
    return (
        checks.select(F.explode("checks").alias("c"))
        .select("c.check", "c.passed", "c.violations")
        .orderBy("check")
    )


@register(
    "stream_doc_quality_deciles",
    oracle=f"""
        WITH c AS ({_SQL_QCOUNTS}),
        z AS (
            SELECT {_SQL_WL} AS wl, {_SQL_Z} AS z
            FROM c
        )
        SELECT
            CAST(floor((1.0 / (1.0 + exp(-z))) * 10.0) AS BIGINT) AS decile,
            COUNT(*) AS n_docs,
            CAST(SUM(wl) AS BIGINT) AS n_weak_pos
        FROM z
        GROUP BY 1
    """,
    description=(
        "learned quality filter applied IN the stream: per-decile counts "
        "over micro-batch corpus ingestion (batch-equivalent full oracle)"
    ),
    tags=("streaming", "ml", "text", "deterministic"),
)
def stream_doc_quality_deciles(spark, sf_dir):
    """The reference's flagship shape — a trained model scoring a stream
    (stream_anomaly_detector.py:230-260) — applied to corpus curation: as
    crawl shards land, each micro-batch rides the same codegen'd sigmoid
    projection as the batch filter, and the running decile histogram is an
    associative count aggregation, so the streamed result is bit-equal to
    the batch query over the full corpus (the oracle is exactly that batch
    SQL — a full oracle, not a rows-only check). No watermark needed:
    counts are monotone accumulators with no event-time eviction."""
    from ..streaming.pipeline import documents_stream, run_to_memory_sink

    s = documents_stream(spark, sf_dir)
    counted = quality_feature_counts(s)
    p = quality_probability()
    agg = (
        counted.select(
            F.floor(p * 10.0).cast("bigint").alias("decile"),
            weak_label().alias("wl"),
        )
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("wl").cast("bigint").alias("n_weak_pos"),
        )
    )
    return run_to_memory_sink(agg)


#: fixed decision thresholds for the PR sweep — committed constants, so the
#: oracle literals and the Spark plan can never drift apart
_PR_THRESHOLDS = (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)


@register(
    "quality_classifier_pr_curve",
    oracle=f"""
        WITH c AS ({_SQL_QCOUNTS}),
        z AS (
            SELECT {_SQL_WL} AS wl,
                   1.0 / (1.0 + exp(-({_SQL_Z}))) AS p
            FROM c
        ),
        t(thr) AS (VALUES {", ".join(f"({t})" for t in (0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))})
        SELECT
            thr AS threshold,
            CAST(SUM(CASE WHEN p >= thr AND wl = 1 THEN 1 ELSE 0 END)
                 AS BIGINT) AS tp,
            CAST(SUM(CASE WHEN p >= thr AND wl = 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS fp,
            CAST(SUM(CASE WHEN p < thr AND wl = 1 THEN 1 ELSE 0 END)
                 AS BIGINT) AS fn
        FROM z, t
        GROUP BY 1
    """,
    description=(
        "precision-recall sweep of the frozen quality filter over 9 fixed "
        "thresholds — exact TP/FP/FN counts in one pass"
    ),
    tags=("ml", "text", "aggregate", "deterministic"),
)
def quality_classifier_pr_curve(spark, sf_dir):
    """Operating-point selection for the learned filter: the corpus is
    scanned ONCE; the 9-threshold sweep is a tiny constant-table cross join
    (9x row multiplier on the already-projected (label, score) pair, far
    cheaper than 9 scans), then exact integer TP/FP/FN per threshold.
    Precision/recall/F1 derive from these counts downstream — keeping the
    compared surface pure integers sidesteps ratio-rounding divergence."""
    docs = load_table(spark, sf_dir, "documents")
    counted = quality_feature_counts(docs)
    scored = counted.select(
        weak_label().alias("wl"), quality_probability().alias("p")
    )
    thr = spark.createDataFrame(
        [(t,) for t in _PR_THRESHOLDS], "threshold double"
    )
    j = scored.crossJoin(F.broadcast(thr))
    pred = F.col("p") >= F.col("threshold")
    return j.groupBy("threshold").agg(
        F.sum(F.when(pred & (F.col("wl") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("tp"),
        F.sum(F.when(pred & (F.col("wl") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("fp"),
        F.sum(F.when(~pred & (F.col("wl") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("fn"),
    )


@register(
    "event_series_correlation_matrix",
    oracle="""
        WITH bounds AS (
            SELECT date_trunc('hour', MIN(ts)) AS h0,
                   date_trunc('hour', MAX(ts)) AS h1
            FROM events
        ),
        spine AS (
            SELECT t.event_type, s.hour
            FROM (SELECT DISTINCT event_type FROM events) t
            CROSS JOIN bounds
            CROSS JOIN LATERAL (
                SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR))
                    AS hour
            ) s
        ),
        c AS (
            SELECT event_type, date_trunc('hour', ts) AS hour,
                   COUNT(*) AS n
            FROM events GROUP BY 1, 2
        ),
        s AS (
            SELECT spine.event_type, spine.hour,
                   COALESCE(c.n, 0) AS n
            FROM spine LEFT JOIN c
              ON spine.event_type = c.event_type AND spine.hour = c.hour
        ),
        p AS (
            SELECT
                a.event_type AS type_a,
                bb.event_type AS type_b,
                CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
                CAST(SUM(a.n) AS DECIMAL(38,0)) AS sx,
                CAST(SUM(bb.n) AS DECIMAL(38,0)) AS sy,
                CAST(SUM(a.n * a.n) AS DECIMAL(38,0)) AS sxx,
                CAST(SUM(bb.n * bb.n) AS DECIMAL(38,0)) AS syy,
                CAST(SUM(a.n * bb.n) AS DECIMAL(38,0)) AS sxy
            FROM s a JOIN s bb
              ON a.hour = bb.hour AND a.event_type < bb.event_type
            GROUP BY 1, 2
        )
        SELECT
            type_a, type_b,
            CAST(n AS BIGINT) AS n_hours,
            CAST(n * sxy - sx * sy AS DOUBLE)
                / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                   * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS corr
        FROM p
    """,
    description=(
        "time-series similarity: pairwise Pearson correlation of hourly "
        "count series between event types, from exact integer sufficient "
        "statistics on a zero-filled hour spine"
    ),
    tags=("analytics", "timeseries", "aggregate", "deterministic"),
)
def event_series_correlation_matrix(spark, sf_dir):
    """Which traffic series move together (and which anti-correlate —
    e.g. errors vs purchases) — the similarity-search primitive for
    monitoring dashboards. Missing hours count as 0 via a generated spine
    (correlation over only-shared hours is a different, biased statistic).
    All six sufficient statistics per pair are EXACT integers
    (DECIMAL(38,0)); doubles appear only in the final
    subtract/divide/sqrt, each a single correctly-rounded IEEE op — so the
    matrix is bit-identical on any engine and partitioning. Scale shape:
    the (type,hour) grain reduces map-side; the pair join runs on the tiny
    spine table, never on raw events."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    ).first()
    spine_hours = spark.sql(
        "SELECT explode(sequence(TIMESTAMP_NTZ'{lo}', TIMESTAMP_NTZ'{hi}', "
        "INTERVAL 1 HOUR)) AS hour".format(lo=bounds["lo"], hi=bounds["hi"])
    )
    types = ev.select("event_type").distinct()
    spine = types.crossJoin(spine_hours)
    c = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count("*").alias("n"))
    s = (
        spine.join(c, ["event_type", "hour"], "left")
        .select(
            "event_type", "hour", F.coalesce(F.col("n"), F.lit(0)).alias("n")
        )
    )
    a = s.alias("a")
    b = s.alias("b")
    d38 = "decimal(38,0)"
    p = (
        a.join(
            b,
            (F.col("a.hour") == F.col("b.hour"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(
            F.count("*").cast(d38).alias("n"),
            F.sum("a.n").cast(d38).alias("sx"),
            F.sum("b.n").cast(d38).alias("sy"),
            F.sum(F.col("a.n") * F.col("a.n")).cast(d38).alias("sxx"),
            F.sum(F.col("b.n") * F.col("b.n")).cast(d38).alias("syy"),
            F.sum(F.col("a.n") * F.col("b.n")).cast(d38).alias("sxy"),
        )
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    return p.select(
        "type_a",
        "type_b",
        n.cast("bigint").alias("n_hours"),
        (
            (n * sxy - sx * sy).cast("double")
            / (
                F.sqrt((n * sxx - sx * sx).cast("double"))
                * F.sqrt((n * syy - sy * sy).cast("double"))
            )
        ).alias("corr"),
    )


@register(
    "bpe_fertility_by_lang",
    oracle=None,  # depends on the learned merge sequence (iterative) —
    # covered by the pure-Python reference parity tests in tests/test_bpe.py
    description=(
        "tokenizer fertility per language (BPE tokens per word) under the "
        "corpus-learned merges — the standard tokenizer-quality metric"
    ),
    tags=("ml", "text", "tokenizer", "no-oracle"),
)
def bpe_fertility_by_lang(spark, sf_dir):
    """Fertility (tokens/word) is how tokenizer quality is judged per
    language: high fertility means the vocab under-serves that language.
    Exact integer token/word sums per lang; one double division at the
    end. Reuses the twice-scanned-corpus tokenization shape of
    doc_bpe_learned_token_counts, plus one broadcast-joinable lang
    lookup."""
    from ..operators.bpe import bpe_token_lengths, learn_bpe_merges

    docs = load_table(spark, sf_dir, "documents")
    merges = learn_bpe_merges(docs, n_merges=24).merges
    per_doc = bpe_token_lengths(docs, merges, broadcast_vocab=True)
    with_lang = per_doc.join(docs.select("doc_id", "lang"), "doc_id")
    return with_lang.groupBy("lang").agg(
        F.sum("n_words").cast("bigint").alias("total_words"),
        F.sum("n_bpe_tokens").cast("bigint").alias("total_bpe_tokens"),
        # a language whose docs are ALL empty has zero words: fertility
        # is undefined -> NULL, never an ANSI DIVIDE_BY_ZERO
        F.when(
            F.sum("n_words") > 0,
            F.sum("n_bpe_tokens").cast("double")
            / F.sum("n_words").cast("double"),
        ).alias("fertility"),
    )


# Pinned merge fixture for the portable fertility sibling. The pairs are
# single chars, left != right, with PAIRWISE-DISJOINT character sets across
# merges — under those constraints greedy sequential application provably
# never interacts across merges (a merge consumes only its own two chars
# and its 2-char output can never equal a later merge's single-char
# operand), so each merge's symbol reduction equals the non-overlapping
# substring count of left||right in the ORIGINAL word. That makes the
# token length SQL-expressible: len(word) + 1 (end-of-word) - sum of
# per-merge substring counts — validated against the real _merge_word on
# 20k random words. Breaking any constraint (shared chars, multi-char
# operands) breaks the identity; change the SQL if you change the fixture.
_BPE_FIXTURE_MERGES: tuple = (("t", "h"), ("e", "r"), ("i", "n"), ("a", "s"))

_SQL_BPE_SUBCOUNT = (
    "(length(word) - length(replace(word, '{pair}', ''))) // 2"
)


@register(
    "bpe_fertility_portable",
    oracle=r"""
        WITH words AS (
            SELECT d.lang, t.w AS word
            FROM documents d,
                 unnest(list_filter(
                     regexp_split_to_array(trim(d.text), '\s+'),
                     tk -> tk <> '')) AS t(w)
        ),
        tok AS (
            SELECT lang,
                   CAST(length(word) + 1
                     - {th} - {er} - {in_} - {as_}
                     AS BIGINT) AS n_tok
            FROM words
        )
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS total_words,
               CAST(SUM(n_tok) AS BIGINT) AS total_bpe_tokens,
               CASE WHEN COUNT(*) > 0
                    THEN CAST(SUM(n_tok) AS DOUBLE)
                         / CAST(COUNT(*) AS DOUBLE)
               END AS fertility
        FROM tok
        GROUP BY 1
    """.format(
        th=_SQL_BPE_SUBCOUNT.format(pair="th"),
        er=_SQL_BPE_SUBCOUNT.format(pair="er"),
        in_=_SQL_BPE_SUBCOUNT.format(pair="in"),
        as_=_SQL_BPE_SUBCOUNT.format(pair="as"),
    ),
    description=(
        "tokenizer fertility per language under a PINNED merge table — the "
        "oracle-checked sibling of bpe_fertility_by_lang (only the merge "
        "LEARNING loop is iterative; the application step is the same "
        "mapInPandas tokenize + vocab join + agg, hash-checked here)"
    ),
    tags=("ml", "text", "tokenizer", "deterministic"),
)
def bpe_fertility_portable(spark, sf_dir):
    """Same plan as ``bpe_fertility_by_lang`` — distinct-word table
    tokenized once through the real merge-application pandas UDF, token
    lengths joined back, exact integer sums per lang, one double division
    — but with ``_BPE_FIXTURE_MERGES`` pinned instead of learned, which
    makes every output value cross-engine reproducible (see the fixture's
    disjointness contract above; fixtures are ASCII, so Spark's UTF-16
    split and DuckDB's codepoint length agree)."""
    from ..operators.bpe import bpe_token_lengths

    docs = load_table(spark, sf_dir, "documents")
    merges = [(l, r, i) for i, (l, r) in enumerate(_BPE_FIXTURE_MERGES)]
    per_doc = bpe_token_lengths(docs, merges, broadcast_vocab=True)
    with_lang = per_doc.join(docs.select("doc_id", "lang"), "doc_id")
    return with_lang.groupBy("lang").agg(
        F.sum("n_words").cast("bigint").alias("total_words"),
        F.sum("n_bpe_tokens").cast("bigint").alias("total_bpe_tokens"),
        F.when(
            F.sum("n_words") > 0,
            F.sum("n_bpe_tokens").cast("double")
            / F.sum("n_words").cast("double"),
        ).alias("fertility"),
    )


@register(
    "stream_embedding_topk",
    oracle="""
        WITH ex AS (
            SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
                   generate_subscripts(embedding, 1) AS pos
            FROM embeddings
        ),
        norms AS (
            SELECT vec_id,
                   CAST(SUM(CAST(x * x AS DECIMAL(28,10))) AS DOUBLE) AS nrm
            FROM ex GROUP BY 1
        ),
        dots AS (
            SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                   CAST(SUM(CAST(q.x * c.x AS DECIMAL(28,10))) AS DOUBLE)
                       AS dot
            FROM ex q
            JOIN ex c ON q.pos = c.pos
                      AND q.vec_id < 8 AND c.vec_id <> q.vec_id
            GROUP BY 1, 2
        ),
        cos AS (
            SELECT d.query_id, d.cand_id,
                   d.dot / (sqrt(nq.nrm) * sqrt(nc.nrm)) AS cosine
            FROM dots d
            JOIN norms nq ON d.query_id = nq.vec_id
            JOIN norms nc ON d.cand_id = nc.vec_id
        )
        SELECT query_id, cand_id, cosine
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rn
            FROM cos
        )
        WHERE rn <= 3
    """,
    description=(
        "incremental top-k similarity search: running top-3 nearest per "
        "query maintained across micro-batches of arriving vectors "
        "(batch-equivalent full oracle)"
    ),
    tags=("streaming", "similarity", "ann", "deterministic"),
)
def stream_embedding_topk(spark, sf_dir):
    """The live-retrieval-index refresh loop: candidate vectors arrive in
    micro-batches; each batch is scored against the broadcast query set
    with decimal-exact dot products and merged into the running top-3
    state (rotated parquet snapshots). Running top-k under a total order
    is an associative merge, so the final state is bit-equal to the batch
    top-k over all vectors — the oracle IS the batch SQL. Per-batch cost
    O(batch·queries + k·queries), independent of history."""
    from ..streaming.pipeline import (
        embeddings_stream,
        run_topk_similarity_merge,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    s = embeddings_stream(spark, sf_dir)
    return run_topk_similarity_merge(s, queries, k=3)


@register(
    "corpus_pipeline_v2_learned",
    oracle=f"""
        -- corpus pipeline with the LEARNED gate: model filter (z >= 0)
        -- -> exact dedup (keep lowest doc_id per normalized-content md5)
        -- -> per-language kept-doc/token accounting
        WITH c AS ({_SQL_QCOUNTS}),
        scored AS (
            SELECT doc_id, lang, toks, {_SQL_Z} AS z
            FROM c
        ),
        kept AS (
            SELECT s.doc_id, s.lang, s.toks
            FROM scored s
            WHERE s.z >= 0.0
        ),
        fp AS (
            SELECT k.doc_id, k.lang, k.toks,
                   md5(regexp_replace(lower(trim(d.text)), '\\s+', ' ', 'g'))
                       AS fp
            FROM kept k JOIN documents d USING (doc_id)
        ),
        dedup AS (
            SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY fp ORDER BY doc_id) AS rn
                FROM fp
            ) WHERE rn = 1
        )
        SELECT
            lang,
            COUNT(*) AS kept_docs,
            CAST(SUM(toks) AS BIGINT) AS kept_tokens
        FROM dedup
        GROUP BY 1
    """,
    description=(
        "corpus pipeline v2: learned-model quality gate -> exact dedup -> "
        "per-language kept accounting, one declarative plan"
    ),
    tags=("llm-data", "ml", "text", "dedup", "deterministic"),
)
def corpus_pipeline_v2_learned(spark, sf_dir):
    """The round-5 capstone composition: the trained filter replaces the
    rule heuristic as the corpus gate (decision on the logit, z ≥ 0 — no
    sigmoid needed), then exact dedup on the normalized-content
    fingerprint, then per-language yield accounting. Still ONE declarative
    plan: scan → projection gate → fingerprint window dedup → grouped
    rollup; the only shuffles are the dedup key and the final tiny
    group-by — identical shape to the v1 rule-based pipeline, so swapping
    the model in costs nothing at 100 TB."""
    from ..operators.text import fingerprint
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf_dir, "documents")
    counted = quality_feature_counts(docs)
    kept = counted.where(quality_logit() >= 0.0).select(
        "doc_id", "lang", F.col("n_toks_q").alias("toks"),
        fingerprint("text").alias("fp"),
    )
    w = W.partitionBy("fp").orderBy("doc_id")
    dedup = (
        kept.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
    )
    return dedup.groupBy("lang").agg(
        F.count("*").alias("kept_docs"),
        F.sum("toks").cast("bigint").alias("kept_tokens"),
    )


@register(
    "bpe_initial_pair_counts",
    oracle="""
        -- the BPE trainer's core statistic, SQL-expressible for the
        -- FIRST iteration (before any merge rewrites the symbols):
        -- adjacent character-pair counts over the word-frequency table,
        -- including the end-of-word marker pair
        WITH w AS (
            SELECT word, CAST(COUNT(*) AS BIGINT) AS wcount
            FROM (
                SELECT unnest(list_filter(
                    regexp_split_to_array(trim(text), '\\s+'),
                    tk -> tk <> '')) AS word
                FROM documents
            )
            GROUP BY 1
        ),
        pairs AS (
            SELECT substring(w.word, s.i, 1) AS left_sym,
                   CASE WHEN s.i = length(w.word)
                        THEN '▁'
                        ELSE substring(w.word, s.i + 1, 1) END AS right_sym,
                   w.wcount
            FROM w
            CROSS JOIN LATERAL (
                SELECT unnest(generate_series(1, length(w.word))) AS i
            ) s
        ),
        counted AS (
            SELECT left_sym, right_sym,
                   CAST(SUM(wcount) AS BIGINT) AS pair_count
            FROM pairs
            GROUP BY 1, 2
        )
        SELECT left_sym, right_sym, pair_count
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                ORDER BY pair_count DESC, left_sym, right_sym) AS rn
            FROM counted
        )
        WHERE rn <= 10
    """,
    description=(
        "BPE trainer core, oracle-checked: top-10 adjacent symbol-pair "
        "counts over the word-frequency table (iteration-0 statistic)"
    ),
    tags=("ml", "text", "tokenizer", "deterministic"),
)
def bpe_initial_pair_counts(spark, sf_dir):
    """Cross-engine proof of the distributed BPE core: the iteration-0
    pair-count table (explode-free zip_with pairs, weighted grouped sum,
    deterministic tie-broken top-10) checked against a from-scratch SQL
    recomputation. Later iterations aren't SQL-expressible (the merge
    rewrites symbols), so the full loop rides the pure-Python reference
    parity in tests/test_bpe.py — this query pins the one piece an oracle
    CAN see."""
    from ..operators.bpe import (
        _initial_symbols,
        _pair_counts,
        word_frequency_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    counts = _pair_counts(_initial_symbols(word_frequency_table(docs)))
    # top-10 via distributed TakeOrderedAndProject, not a global window
    return (
        counts.orderBy(F.desc("pair_count"), F.asc("left"), F.asc("right"))
        .limit(10)
        .select(
            F.col("left").alias("left_sym"),
            F.col("right").alias("right_sym"),
            F.col("pair_count").cast("bigint").alias("pair_count"),
        )
    )


@register(
    "bpe_merges_by_lang",
    oracle=None,  # iterative per-group training — per-group equality with
    # the single-corpus trainer and the pure-Python reference is asserted
    # in tests/test_bpe.py
    description=(
        "multilingual tokenizer training: per-language BPE merge tables "
        "from one corpus scan"
    ),
    tags=("ml", "text", "tokenizer", "no-oracle"),
)
def bpe_merges_by_lang(spark, sf_dir):
    """Per-language merge sequences — the multilingual tokenizer path.
    One corpus scan builds the (lang, word, count) table; each language's
    iterations then run on its own vocab-bounded slice (driver-local under
    the adaptive threshold, distributed above it)."""
    from ..operators.bpe import learn_bpe_merges_by_group

    docs = load_table(spark, sf_dir, "documents")
    by_lang = learn_bpe_merges_by_group(docs, "lang", n_merges=12)
    rows = [
        (lang, i, left, right, cnt)
        for lang, merges in sorted(by_lang.items())
        for i, (left, right, cnt) in enumerate(merges)
    ]
    return spark.createDataFrame(
        rows,
        "lang string, merge_rank int, left string, right string, "
        "pair_count long",
    )


@register(
    "quality_classifier_auc",
    oracle=f"""
        WITH c AS ({_SQL_QCOUNTS}),
        z AS (
            SELECT doc_id, {_SQL_WL} AS wl, {_SQL_Z} AS zz
            FROM c
        ),
        ranked AS (
            SELECT wl,
                   ROW_NUMBER() OVER (ORDER BY zz, doc_id) AS rk
            FROM z
        ),
        s AS (
            SELECT
                CAST(SUM(CASE WHEN wl = 1 THEN rk ELSE 0 END) AS BIGINT)
                    AS pos_rank_sum,
                CAST(SUM(wl) AS BIGINT) AS n_pos,
                CAST(SUM(1 - wl) AS BIGINT) AS n_neg
            FROM ranked
        )
        SELECT
            n_pos, n_neg,
            CAST(pos_rank_sum - n_pos * (n_pos + 1) / 2 AS DOUBLE)
                / (CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)) AS auc
        FROM s
    """,
    description=(
        "exact ROC-AUC of the frozen quality filter via the Mann-Whitney "
        "rank-sum (integer rank sums, one final division)"
    ),
    tags=("ml", "text", "aggregate", "deterministic"),
)
def quality_classifier_auc(spark, sf_dir):
    """Threshold-free model quality in one number: AUC as the normalized
    Mann-Whitney U from a global rank over (logit, doc_id).  Ranks and
    their sums are exact integers; the only double is the final division
    — so the statistic is bit-identical on any engine.  The rank comes
    from ``relational.global_row_number`` (range-repartition + broadcast
    prefix offsets — rank-identical to the window form under the
    ``(zz, doc_id)`` total order, with NO single-partition WindowExec),
    so the query scales with cluster width; the even leaner
    aggregation-only form is ``quality_classifier_auc_distributed``."""
    docs = load_table(spark, sf_dir, "documents")
    counted = quality_feature_counts(docs)
    from ..operators.relational import global_row_number

    z = counted.select(
        "doc_id", weak_label().alias("wl"), quality_logit().alias("zz")
    )
    ranked = global_row_number(
        z, [("zz", "asc"), ("doc_id", "asc")], out="rk"
    ).select("wl", "rk")
    # rank sums in DECIMAL(38,0): a BIGINT rank sum wraps silently once
    # n(n+1)/2 passes 2^63 (n ~ 4.3e9 rows — well inside 100-TB corpora);
    # decimal stays exact to 1e38 and casts to the identical double below
    s = ranked.agg(
        F.sum(
            F.when(F.col("wl") == 1, F.col("rk"))
            .otherwise(0)
            .cast("decimal(38,0)")
        ).alias("pos_rank_sum"),
        F.sum("wl").cast("bigint").alias("n_pos"),
        F.sum(1 - F.col("wl")).cast("bigint").alias("n_neg"),
    )
    return s.select(
        "n_pos",
        "n_neg",
        (
            (
                F.col("pos_rank_sum")
                - F.col("n_pos").cast("decimal(38,0)")
                * (F.col("n_pos") + 1)
                / 2
            ).cast("double")
            / (F.col("n_pos").cast("double") * F.col("n_neg").cast("double"))
        ).alias("auc"),
    )


_LONG_MAX = (1 << 63) - 1


def _check_local_rank_partials(parts) -> None:
    """Refuse partition sizes whose local-rank LONG sum could have wrapped.

    ``pos_lrk_sum`` is a LONG sum of local ranks, bounded above by
    n_i*(n_i+1)/2 for partition row count n_i. Counts are exact LONGs
    (a COUNT cannot overflow below 2^63 rows per partition), so checking
    them AFTER the collect soundly proves whether the already-computed
    partial could have exceeded LONG range — non-ANSI Spark wraps
    silently, and a wrapped partial would merge into a plausible-looking
    but wrong AUC. Raises with sizing guidance instead."""
    worst = max((int(r["n_rows"]) for r in parts), default=0)
    if worst * (worst + 1) // 2 > _LONG_MAX:
        raise ValueError(
            "quality_classifier_auc_distributed: a range partition holds "
            f"{worst} rows; its local rank sum can exceed LONG range "
            "(n*(n+1)/2 >= 2^63) and may have silently wrapped. Raise "
            "spark.sql.shuffle.partitions so every partition stays below "
            "~4.29e9 rows."
        )


@register(
    "quality_classifier_auc_distributed",
    bench=True,  # the 100-TB flagship statistic: exact AUC with no global rank
    oracle=f"""
        WITH c AS ({_SQL_QCOUNTS}),
        z AS (
            SELECT doc_id, {_SQL_WL} AS wl, {_SQL_Z} AS zz
            FROM c
        ),
        ranked AS (
            SELECT wl,
                   ROW_NUMBER() OVER (ORDER BY zz, doc_id) AS rk
            FROM z
        ),
        s AS (
            SELECT
                CAST(SUM(CASE WHEN wl = 1 THEN rk ELSE 0 END) AS BIGINT)
                    AS pos_rank_sum,
                CAST(SUM(wl) AS BIGINT) AS n_pos,
                CAST(SUM(1 - wl) AS BIGINT) AS n_neg
            FROM ranked
        )
        SELECT
            n_pos, n_neg,
            CAST(pos_rank_sum - n_pos * (n_pos + 1) / 2 AS DOUBLE)
                / (CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)) AS auc
        FROM s
    """,
    description=(
        "exact ROC-AUC via per-range-partition Mann-Whitney partials — "
        "aggregation-only, no row-level global rank materialized"
    ),
    tags=("ml", "text", "aggregate", "deterministic"),
)
def quality_classifier_auc_distributed(spark, sf_dir):
    """The 100-TB AUC plan: U is associative over disjoint score ranges,
    so the exact statistic needs NO global rank column at all.  Rows are
    range-partitioned on ``(zz, doc_id)`` (each partition owns a disjoint
    slice of the global order); within each partition a partitionBy
    window assigns LOCAL ranks (fully parallel, no single-reducer
    stage), and one grouped pass reduces each partition to three
    integers ``(n_rows, n_pos, pos_local_rank_sum)``.  The global
    positive-rank sum is then

        sum_i pos_local_rank_sum_i + n_pos_i * offset_i,
        offset_i = sum over j<i of n_rows_j

    — computed from an O(num_partitions)-row collect (bounded by cluster
    width, never data size).  Every intermediate is an exact integer;
    the final division runs in a Spark expression identical to
    ``quality_classifier_auc``'s, so the double is bit-identical.  No
    persist, no broadcast-back join: ONE materialization of the scored
    corpus.

    Overflow bounds: the global U is merged in arbitrary-precision Python
    and shipped as DECIMAL(38,0) (exact past the BIGINT wrap at ~4.3e9
    rows); the per-partition LONG partial ``pos_lrk_sum`` is bounded by
    n_i*(n_i+1)/2 for partition row count n_i, safe while n_i < ~4.29e9
    rows per partition. That bound is ENFORCED after the partials
    collect: partition counts (plain LONG counts, which cannot themselves
    overflow) prove whether the summed partial could have wrapped, and
    the merge raises with sizing guidance instead of returning a silently
    wrong AUC (non-ANSI Spark wraps LONG sums without error).
    Degenerate inputs: an empty corpus
    returns the oracle's (NULL, NULL, NULL) row; a single-class corpus
    divides by zero, which Spark surfaces as NULL auc (same behavior as
    the sibling windowed-rank form; engines differ here — IEEE engines
    return inf)."""
    return auc_distributed_from_docs(spark, load_table(spark, sf_dir, "documents"))


def auc_distributed_from_docs(spark, docs):
    """The plan body of ``quality_classifier_auc_distributed``, lifted to
    take the documents DataFrame directly so harnesses (the 10x scale
    probe) can run the exact shipped plan on replicated corpora.
    Expression-identical to the pre-lift registered query."""
    from ..operators.relational import _track_persist
    from ..sources.catalog import spread_for_compute

    # spread before the quality regexes/tokenize (guide §2.5 — one task on a
    # single-row-group scan otherwise) and persist the 3-column z frame: the
    # range exchange below SAMPLES its child to pick boundaries, so an
    # uncached z pays the full feature pass twice. The cache is 3 scalars a
    # row; the AUC merge is partitioning-independent, so results are
    # unchanged under the spread (exact integer partials).
    counted = quality_feature_counts(
        spread_for_compute(docs.select("doc_id", "text"), "doc_id")
    )
    z = _track_persist(
        counted.select(
            "doc_id", weak_label().alias("wl"), quality_logit().alias("zz")
        )
    )
    p = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    ranged = z.repartitionByRange(
        p, F.col("zz").asc(), F.col("doc_id").asc()
    ).withColumn("__pid", F.spark_partition_id())
    local = Window.partitionBy("__pid").orderBy("zz", "doc_id")
    parts = sorted(
        ranged.withColumn("__lrk", F.row_number().over(local).cast("long"))
        .groupBy("__pid")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("wl").cast("long").alias("n_pos"),
            F.sum(F.when(F.col("wl") == 1, F.col("__lrk")).otherwise(0))
            .cast("long")
            .alias("pos_lrk_sum"),
        )
        .collect(),
        key=lambda r: r["__pid"],
    )
    if not parts:  # empty corpus: aggregates over zero rows are NULL —
        # mirror the oracle's (NULL, NULL, NULL) row exactly
        return spark.createDataFrame(
            [(None, None, None)], "n_pos long, n_neg long, auc double"
        )
    _check_local_rank_partials(parts)
    pos_rank_sum, n_pos, n_rows = 0, 0, 0
    for r in parts:  # exact integer merge of per-range U partials
        pos_rank_sum += int(r["pos_lrk_sum"]) + int(r["n_pos"]) * n_rows
        n_pos += int(r["n_pos"])
        n_rows += int(r["n_rows"])
    # U computed in arbitrary-precision Python (the merge is driver-side
    # anyway): a BIGINT U wraps at n ~ 4.3e9 rows; shipped to Spark as
    # DECIMAL(38,0) so only the final double conversion rounds — the same
    # one rounding CAST(... AS DOUBLE) performs in the oracle
    from decimal import Decimal

    u = pos_rank_sum - n_pos * (n_pos + 1) // 2
    s = spark.createDataFrame(
        [(Decimal(u), n_pos, n_rows - n_pos)],
        "u decimal(38,0), n_pos long, n_neg long",
    )
    return s.select(
        "n_pos",
        "n_neg",
        (
            F.col("u").cast("double")
            / (F.col("n_pos").cast("double") * F.col("n_neg").cast("double"))
        ).alias("auc"),
    )


@register(
    "events_t_closeness_audit",
    oracle="""
        -- t-closeness: total-variation distance between each QI class's
        -- sensitive-attribute distribution (md5-bucketed user identity)
        -- and the global one.  TV = sum_i |n_i*N - m_i*N_c| / (2*N_c*N):
        -- the numerator is an EXACT integer (missing buckets included via
        -- the class x bucket grid), doubles only in the final division.
        WITH b AS (
            SELECT event_type,
                   CAST(hour(ts) AS BIGINT) AS hour_of_day,
                   CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)),
                        1, 8)) AS BIGINT) % 10 AS bucket
            FROM events
        ),
        g AS (
            SELECT bucket, CAST(COUNT(*) AS BIGINT) AS m FROM b GROUP BY 1
        ),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM b),
        cls AS (
            SELECT event_type, hour_of_day,
                   CAST(COUNT(*) AS BIGINT) AS n_class
            FROM b GROUP BY 1, 2
        ),
        cb AS (
            SELECT event_type, hour_of_day, bucket,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM b GROUP BY 1, 2, 3
        ),
        grid AS (
            SELECT c.event_type, c.hour_of_day, c.n_class, g.bucket, g.m,
                   COALESCE(cb.n, 0) AS n
            FROM cls c
            CROSS JOIN g
            LEFT JOIN cb ON cb.event_type = c.event_type
                        AND cb.hour_of_day = c.hour_of_day
                        AND cb.bucket = g.bucket
        )
        SELECT
            grid.event_type, grid.hour_of_day,
            CAST(MAX(grid.n_class) AS BIGINT) AS class_size,
            CAST(SUM(abs(grid.n * tot.n_total - grid.m * grid.n_class))
                 AS BIGINT) AS tv_numer,
            CAST(SUM(abs(grid.n * tot.n_total - grid.m * grid.n_class))
                 AS DOUBLE)
                / (2.0 * CAST(MAX(grid.n_class) AS DOUBLE)
                   * CAST(MAX(tot.n_total) AS DOUBLE)) AS tv_distance
        FROM grid, tot
        GROUP BY 1, 2
    """,
    description=(
        "t-closeness privacy audit: exact total-variation distance of "
        "each QI class's sensitive distribution from the global one"
    ),
    tags=("privacy", "aggregate", "deterministic"),
)
def events_t_closeness_audit(spark, sf_dir):
    """Completes the privacy triple (k-anonymity: classes big enough;
    l-diversity: sensitive values varied; t-closeness: sensitive MIX not
    skewed — a class can pass both k and l while still leaking that it is
    dominated by one user cohort). The sensitive attribute is the
    md5-bucketed user identity (portable hashing-trick idiom). Scale
    shape: three grouped passes over the (class, bucket) grains plus a
    tiny grid join — the bucket table is 10 rows, classes are
    |event_type|x24."""
    ev = load_table(spark, sf_dir, "events")
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
        ).cast("bigint")
        % 10
    )
    b = ev.select(
        "event_type",
        F.hour("ts").cast("bigint").alias("hour_of_day"),
        bucket.alias("bucket"),
    )
    g = b.groupBy("bucket").agg(F.count("*").cast("bigint").alias("m"))
    n_total = int(b.count())
    cls = b.groupBy("event_type", "hour_of_day").agg(
        F.count("*").cast("bigint").alias("n_class")
    )
    cb = b.groupBy("event_type", "hour_of_day", "bucket").agg(
        F.count("*").cast("bigint").alias("n")
    )
    grid = (
        cls.crossJoin(F.broadcast(g))
        .join(cb, ["event_type", "hour_of_day", "bucket"], "left")
        .select(
            "event_type",
            "hour_of_day",
            "n_class",
            "m",
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        )
    )
    numer = F.sum(
        F.abs(F.col("n") * F.lit(n_total) - F.col("m") * F.col("n_class"))
    ).cast("bigint")
    return grid.groupBy("event_type", "hour_of_day").agg(
        F.max("n_class").cast("bigint").alias("class_size"),
        numer.alias("tv_numer"),
        (
            numer.cast("double")
            / (
                2.0
                * F.max("n_class").cast("double")
                * F.lit(float(n_total))
            )
        ).alias("tv_distance"),
    )


@register(
    "cross_source_duplicate_matrix",
    oracle=f"""
        WITH RECURSIVE t AS ({_SQL_SHINGLES}),
        {_SQL_VERIFIED_PAIRS}
        SELECT
            least(d1.source, d2.source) AS source_a,
            greatest(d1.source, d2.source) AS source_b,
            CAST(COUNT(*) AS BIGINT) AS near_dup_pairs
        FROM vp
        JOIN documents d1 ON vp.id1 = d1.doc_id
        JOIN documents d2 ON vp.id2 = d2.doc_id
        GROUP BY 1, 2
    """,
    description=(
        "cross-source duplication matrix: verified near-dup pairs per "
        "source pair (mirror/scrape detection; diagonal = within-source "
        "duplication load)"
    ),
    tags=("llm-data", "dedup", "aggregate", "deterministic"),
)
def cross_source_duplicate_matrix(spark, sf_dir):
    """Mirror detection: many near-dup pairs between two sources means one
    scrapes the other — drop the copy, not random halves of both; the
    diagonal rows expose each source's internal duplication load. Rides
    the standard LSH-verified pair pipeline (banding projection,
    candidates ~linear, array_intersect verify), then joins only the pair
    ids against the doc→source lookup and rolls up to the |sources|² grain
    — no text moves after the verify."""
    from ..operators.dedup import lsh_verified_near_dups

    docs = load_table(spark, sf_dir, "documents")
    pairs = lsh_verified_near_dups(docs, "doc_id", "text", threshold=0.6)
    s1 = docs.select(
        F.col("doc_id").alias("id1"), F.col("source").alias("src1")
    )
    s2 = docs.select(
        F.col("doc_id").alias("id2"), F.col("source").alias("src2")
    )
    # s1/s2 are the CORPUS-sized doc->source projections: forcing them
    # into broadcasts ships the whole corpus's metadata to every executor
    # (hard 8 GB kill at web scale) — AQE broadcasts the actually-small
    # side (usually the verified-pair list) instead
    return (
        pairs.join(s1, "id1")
        .join(s2, "id2")
        .groupBy(
            F.least("src1", "src2").alias("source_a"),
            F.greatest("src1", "src2").alias("source_b"),
        )
        .agg(F.count("*").cast("bigint").alias("near_dup_pairs"))
    )


@register(
    "preference_pairs_split_counts",
    oracle=f"""
        WITH c AS ({_SQL_QCOUNTS}),
        q AS (
            SELECT doc_id, lang, {_SQL_FBP} AS fbp FROM c
        ),
        r AS (
            SELECT
                doc_id, lang, fbp,
                ROW_NUMBER() OVER (
                    PARTITION BY lang ORDER BY fbp DESC, doc_id
                ) AS rk,
                COUNT(*) OVER (PARTITION BY lang) AS n
            FROM q
        ),
        p AS (
            SELECT a.lang AS lang, a.doc_id AS chosen_doc_id,
                   a.fbp - b.fbp AS margin_bp
            FROM r a
            JOIN r b
              ON a.lang = b.lang AND b.rk = a.n - a.rk + 1 AND a.rk < b.rk
            WHERE a.fbp - b.fbp >= 300
        ),
        s AS (
            SELECT lang, margin_bp,
                   CASE WHEN u < 0.8 THEN 'train'
                        WHEN u < 0.9 THEN 'val'
                        ELSE 'test' END AS split
            FROM (
                SELECT p.*,
                       CAST(concat('0x', substr(md5(
                            CAST(chosen_doc_id AS VARCHAR)), 1, 8))
                            AS BIGINT) / 4294967296.0 AS u
                FROM p
            )
        )
        SELECT split,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(margin_bp) AS BIGINT) AS sum_margin_bp,
               CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
        FROM s
        GROUP BY 1
    """,
    description=(
        "leakage-safe RLHF pair splits: whole pairs assigned to "
        "train/val/test by hash of the pair key — no pair straddles splits"
    ),
    tags=("ml", "sampling", "split", "deterministic"),
)
def preference_pairs_split_counts(spark, sf_dir):
    """The split step a reward-model pipeline must get right: the UNIT of
    assignment is the pair, keyed on chosen_doc_id (each doc appears in at
    most one pair per side, so the key is unique per pair) — a random
    row-level split would put a pair's two documents' gradient signal on
    both sides of the eval boundary. Membership is the engine-portable
    md5-range projection; no extra shuffle beyond the pair pipeline's
    own."""
    from ..operators.relational import deterministic_split

    pairs = preference_pairs(spark, sf_dir)
    split = deterministic_split(
        pairs, "chosen_doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    return split.groupBy("split").agg(
        F.count("*").alias("n_pairs"),
        F.sum("margin_bp").cast("bigint").alias("sum_margin_bp"),
        F.countDistinct("lang").alias("n_langs"),
    )


@register(
    "value_trimmed_mean_by_type",
    oracle="""
        WITH c AS (
            SELECT event_type,
                   CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
            FROM events
        ),
        b AS (
            SELECT event_type,
                   quantile_cont(cents, 0.1) AS lo,
                   quantile_cont(cents, 0.9) AS hi
            FROM c GROUP BY 1
        )
        SELECT
            c.event_type,
            CAST(SUM(c.cents) AS DOUBLE) / COUNT(*) / 100.0
                AS trimmed_mean
        FROM c JOIN b ON c.event_type = b.event_type
        WHERE c.cents >= b.lo AND c.cents <= b.hi
        GROUP BY 1
    """,
    description=(
        "10-90% trimmed mean of event value per type via a grouped-agg "
        "pandas UDF (the declared UDAF surface), oracle-checked"
    ),
    tags=("aggregate", "udaf", "robust", "deterministic"),
)
def value_trimmed_mean_by_type(spark, sf_dir):
    """The custom-aggregate escape hatch, proven correct: a grouped-agg
    pandas UDF (Arrow-batched, one numpy computation per group) computes
    the outlier-robust trimmed mean the built-ins can't express directly —
    checked bit-level against the oracle's quantile_cont formulation.
    Exact integer cents inside; one double division per group at the end.
    At 100 TB each group's values land on one executor (the UDAF contract)
    — fine for bounded per-group cardinality; percentile-bounded built-in
    filtering is the fallback for giant groups."""
    from ..functions.scalars import trimmed_mean_cents_udaf

    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100.0 + 0.5).cast("bigint")
    tm = trimmed_mean_cents_udaf()
    return (
        ev.select("event_type", cents.alias("cents"))
        .groupBy("event_type")
        .agg((tm(F.col("cents")) / 100.0).alias("trimmed_mean"))
    )


@register(
    "tx_table_time_travel_counts",
    oracle="""
        SELECT 0 AS version,
               CAST(SUM(CASE WHEN event_type <> 'error' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_rows
        FROM events
        UNION ALL
        SELECT 1, CAST(COUNT(*) AS BIGINT) FROM events
        ORDER BY version
    """,
    description=(
        "versioned-table time travel: row counts of two committed "
        "snapshots read back through the transaction log"
    ),
    tags=("table-format", "source", "deterministic"),
)
def tx_table_time_travel_counts(spark, sf_dir):
    """The lakehouse read contract end-to-end: version 0 commits the
    non-error events, version 1 appends the errors (append reuses v0's
    immutable data files — only new files are written), and BOTH versions
    are then read back via the manifest. The oracle recomputes each
    snapshot's expected count from the raw table; matching proves commits
    are complete and time travel returns exactly the committed files."""
    from ..scratch import scratch_unique
    from ..sources.txlog import TxTable

    ev = load_table(spark, sf_dir, "events")
    t = TxTable(spark, scratch_unique(spark, "txdemo"))
    t.overwrite(ev.where(F.col("event_type") != "error"))
    t.append(ev.where(F.col("event_type") == "error"))
    rows = [
        (v, t.snapshot(version=v).count()) for v in t.versions()
    ]
    return spark.createDataFrame(rows, "version int, n_rows long").orderBy(
        "version"
    )


@register(
    "stream_merge_into_tx_table",
    oracle="""
        SELECT user_id,
               event_id AS last_event_id,
               ts AS last_ts
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC
            ) AS rn
            FROM events
        )
        WHERE rn = 1
    """,
    description=(
        "streaming MERGE INTO the transaction-log table: one committed "
        "version per micro-batch; final snapshot equals the batch SCD1 "
        "view (full oracle)"
    ),
    tags=("streaming", "cdc", "table-format", "deterministic"),
)
def stream_merge_into_tx_table(spark, sf_dir):
    """The versioned streaming-upsert loop: each micro-batch commits a
    MERGE version into the txlog table, leaving an auditable one-version-
    per-batch history, and the final snapshot is batch-split-independent
    (ordering by (ts, event_id), not arrival) — so the streaming query
    shares the batch SCD1 oracle verbatim. The invariant that the table
    accumulated one version per non-empty batch is asserted in
    tests/test_streaming.py."""
    from ..scratch import scratch_unique
    from ..sources.txlog import TxTable
    from ..streaming.pipeline import events_stream, run_merge_into_table

    table = TxTable(spark, scratch_unique(spark, "txmerge"))
    state = run_merge_into_table(
        events_stream(spark, sf_dir), table, "user_id", ["ts", "event_id"]
    )
    return state.select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("ts").alias("last_ts"),
    )


@register(
    "kmeans_inertia_curve",
    oracle=None,  # iterative float optimization (centroid means depend on
    # float summation order) — Lloyd's monotone-inertia guarantee and the
    # deterministic init are pytest invariants; iteration 0 is
    # oracle-checked below
    description=(
        "distributed Lloyd's k-means on embeddings: per-iteration total "
        "inertia (deterministic md5-medoid init, parameter-server loop)"
    ),
    tags=("ml", "training", "clustering", "no-oracle"),
)
def kmeans_inertia_curve(spark, sf_dir):
    """The third canonical trainer (after the linear AE and the logistic
    filter): one mapInPandas aggregation per Lloyd's iteration collects
    #partitions × k partial rows; only the k×d centroid matrix moves.
    Inertia is non-increasing by construction — the invariant pytest
    pins."""
    from ..ml.training import fit_kmeans_lloyd

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda v: v.cast("double")).alias(
            "features"
        ),
    )
    fit = fit_kmeans_lloyd(emb, "vec_id", k=8, iters=6)
    return spark.createDataFrame(
        [(i, float(x)) for i, x in enumerate(fit.inertias)],
        "iteration int, inertia double",
    )


@register(
    "kmeans_init_assignment_portable",
    oracle="""
        -- iteration 0 of Lloyd's under the deterministic md5-medoid init,
        -- recomputed from scratch: cluster sizes of the first assignment.
        -- squared distances sum DECIMAL-exact (order-free), ties broken by
        -- medoid rank.
        WITH m AS (
            SELECT vec_id AS medoid_id,
                   ROW_NUMBER() OVER (
                       ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
                   ) - 1 AS cluster_rank
            FROM embeddings
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
            LIMIT 8
        ),
        ex AS (
            SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
                   generate_subscripts(embedding, 1) AS pos
            FROM embeddings
        ),
        cx AS (
            SELECT m.cluster_rank, e.pos, e.x AS c
            FROM m JOIN ex e ON e.vec_id = m.medoid_id
        ),
        d AS (
            SELECT e.vec_id, c.cluster_rank,
                   SUM(CAST((e.x - c.c) * (e.x - c.c) AS DECIMAL(28,10)))
                       AS d2
            FROM ex e JOIN cx c ON e.pos = c.pos
            GROUP BY 1, 2
        ),
        a AS (
            SELECT vec_id, cluster_rank,
                   ROW_NUMBER() OVER (
                       PARTITION BY vec_id ORDER BY d2, cluster_rank
                   ) AS rn
            FROM d
        )
        SELECT CAST(cluster_rank AS INT) AS cluster_rank,
               CAST(COUNT(*) AS BIGINT) AS n_assigned
        FROM a
        WHERE rn = 1
        GROUP BY 1
    """,
    description=(
        "Lloyd's iteration-0 assignment under the md5-medoid init, "
        "oracle-checked (decimal-exact distances, rank tie-break)"
    ),
    tags=("ml", "clustering", "deterministic"),
)
def kmeans_init_assignment_portable(spark, sf_dir):
    """Cross-engine proof of the k-means core: the deterministic init and
    the nearest-centroid assignment recomputed declaratively (posexplode +
    pos-join + decimal-exact squared distances + rank-tie argmin) and
    checked against a from-scratch SQL oracle — the same pin-the-portable-
    core pattern as bpe_initial_pair_counts. Later iterations average
    floats and stay rows-only by necessity."""
    from pyspark.sql.window import Window as W

    from ..operators.relational import bounded_ranked_topk

    emb = load_table(spark, sf_dir, "embeddings")
    # top-8 medoids by md5 order via distributed TakeOrdered + bounded
    # self-join rank — no global-window single reducer on the corpus
    m = bounded_ranked_topk(
        emb.select(
            F.col("vec_id").alias("medoid_id"),
            F.md5(F.col("vec_id").cast("string")).alias("__h"),
        ),
        [("__h", "asc"), ("medoid_id", "asc")],
        8,
        out="__rk",
    ).select(
        "medoid_id", (F.col("__rk") - 1).cast("int").alias("cluster_rank")
    )
    ex = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "xf")
    ).select("vec_id", "pos", F.col("xf").cast("double").alias("x"))
    cx = m.join(
        ex.select(
            F.col("vec_id").alias("medoid_id"),
            "pos",
            F.col("x").alias("c"),
        ),
        "medoid_id",
    )
    d = (
        ex.join(F.broadcast(cx.select("cluster_rank", "pos", "c")), "pos")
        .groupBy("vec_id", "cluster_rank")
        .agg(
            F.sum(
                (
                    (F.col("x") - F.col("c")) * (F.col("x") - F.col("c"))
                ).cast("decimal(28,10)")
            ).alias("d2")
        )
    )
    a = d.withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("vec_id").orderBy("d2", "cluster_rank")
        ),
    ).where(F.col("rn") == 1)
    return a.groupBy(
        F.col("cluster_rank").cast("int").alias("cluster_rank")
    ).agg(F.count("*").cast("bigint").alias("n_assigned"))


@register(
    "hourly_seasonal_naive_mase",
    oracle="""
        -- seasonal-naive benchmark forecast (yhat[h] = y[h-168]) scored
        -- with MASE: mean|err| over mean|one-step naive err|, both sums of
        -- exact integer count differences; doubles only in the final
        -- division.
        WITH bounds AS (
            SELECT date_trunc('hour', MIN(ts)) AS h0,
                   date_trunc('hour', MAX(ts)) AS h1
            FROM events
        ),
        spine AS (
            SELECT t.event_type, s.hour
            FROM (SELECT DISTINCT event_type FROM events) t
            CROSS JOIN bounds
            CROSS JOIN LATERAL (
                SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR))
                    AS hour
            ) s
        ),
        c AS (
            SELECT event_type, date_trunc('hour', ts) AS hour,
                   COUNT(*) AS n
            FROM events GROUP BY 1, 2
        ),
        y AS (
            SELECT spine.event_type, spine.hour,
                   COALESCE(c.n, 0) AS n
            FROM spine LEFT JOIN c
              ON spine.event_type = c.event_type AND spine.hour = c.hour
        ),
        l AS (
            SELECT event_type, hour, n,
                   LAG(n, 168) OVER (
                       PARTITION BY event_type ORDER BY hour) AS season,
                   LAG(n, 1) OVER (
                       PARTITION BY event_type ORDER BY hour) AS prev
            FROM y
        )
        SELECT
            event_type,
            CAST(COUNT(*) AS BIGINT) AS n_scored,
            CAST(SUM(abs(n - season)) AS BIGINT) AS sum_abs_err,
            CAST(SUM(abs(n - prev)) AS BIGINT) AS sum_abs_naive_err,
            CAST(SUM(abs(n - season)) AS DOUBLE)
                / CAST(SUM(abs(n - prev)) AS DOUBLE) AS mase
        FROM l
        WHERE season IS NOT NULL AND prev IS NOT NULL
        GROUP BY 1
    """,
    description=(
        "seasonal-naive hourly forecast benchmark scored with MASE "
        "(exact integer error sums over the zero-filled spine)"
    ),
    tags=("analytics", "timeseries", "forecast", "deterministic"),
)
def hourly_seasonal_naive_mase(spark, sf_dir):
    """The forecasting-benchmark discipline: before any model ships, beat
    seasonal-naive (same hour last week) — MASE < 1 means you did. All
    error sums are exact integer count differences over the zero-filled
    hour spine; the lag windows ride the per-type ordered slice (one
    shuffle on event_type)."""
    from pyspark.sql.window import Window as W

    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    ).first()
    spine_hours = spark.sql(
        "SELECT explode(sequence(TIMESTAMP_NTZ'{lo}', TIMESTAMP_NTZ'{hi}', "
        "INTERVAL 1 HOUR)) AS hour".format(lo=bounds["lo"], hi=bounds["hi"])
    )
    types = ev.select("event_type").distinct()
    spine = types.crossJoin(spine_hours)
    c = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count("*").alias("n"))
    y = spine.join(c, ["event_type", "hour"], "left").select(
        "event_type", "hour", F.coalesce(F.col("n"), F.lit(0)).alias("n")
    )
    w = W.partitionBy("event_type").orderBy("hour")
    l = y.select(
        "event_type",
        "n",
        F.lag("n", 168).over(w).alias("season"),
        F.lag("n", 1).over(w).alias("prev"),
    ).where(F.col("season").isNotNull() & F.col("prev").isNotNull())
    return l.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_scored"),
        F.sum(F.abs(F.col("n") - F.col("season")))
        .cast("bigint")
        .alias("sum_abs_err"),
        F.sum(F.abs(F.col("n") - F.col("prev")))
        .cast("bigint")
        .alias("sum_abs_naive_err"),
        # a CONSTANT hourly series (e.g. an always-quiet type) makes the
        # one-step naive error 0: MASE is undefined -> NULL (DuckDB x/0),
        # not an ANSI DIVIDE_BY_ZERO killing every other type's score
        F.when(
            F.sum(F.abs(F.col("n") - F.col("prev"))) > 0,
            F.sum(F.abs(F.col("n") - F.col("season"))).cast("double")
            / F.sum(F.abs(F.col("n") - F.col("prev"))).cast("double"),
        ).alias("mase"),
    )


@register(
    "near_dup_triangle_census",
    oracle=f"""
        WITH RECURSIVE t AS ({_SQL_SHINGLES}),
        {_SQL_VERIFIED_PAIRS}
        SELECT
            CAST((SELECT COUNT(*) FROM vp) AS BIGINT) AS n_edges,
            CAST(COUNT(*) AS BIGINT) AS n_triangles
        FROM vp ab
        JOIN vp bc ON ab.id2 = bc.id1
        JOIN vp ac ON ac.id1 = ab.id1 AND ac.id2 = bc.id2
    """,
    description=(
        "triangle census of the verified near-dup graph: cliquish replica "
        "groups vs chain-like gradual drift (second graph primitive after "
        "connected components)"
    ),
    tags=("dedup", "graph", "aggregate", "deterministic"),
)
def near_dup_triangle_census(spark, sf_dir):
    """Whether near-dups form CLIQUES (replica floods — safe to keep one
    canonical doc) or CHAINS (gradual drift — transitive clustering may
    over-merge) is the triangle density question. Edges are ordered
    (id1<id2), so each triangle is counted exactly once by the
    ab⋈bc⋈ac join; at corpus scale the standard degree-ordered orientation
    keeps the join linear in edges (near-dup graphs are sparse — the
    candidates are ~linear by construction)."""
    from ..operators.dedup import lsh_verified_near_dups

    docs = load_table(spark, sf_dir, "documents")
    vp = lsh_verified_near_dups(docs, "doc_id", "text", threshold=0.6)
    n_edges = vp.count()
    ab = vp.alias("ab")
    bc = vp.alias("bc")
    ac = vp.alias("ac")
    tri = (
        ab.join(bc, F.col("ab.id2") == F.col("bc.id1"))
        .join(
            ac,
            (F.col("ac.id1") == F.col("ab.id1"))
            & (F.col("ac.id2") == F.col("bc.id2")),
        )
        .count()
    )
    return spark.createDataFrame(
        [(n_edges, tri)], "n_edges long, n_triangles long"
    )


@register(
    "term_posting_stats",
    oracle="""
        -- inverted-index build, summarized: per-term document frequency,
        -- total occurrences, and the first (lowest-id) posting — the
        -- search-index construction shape, top-25 terms by df with
        -- lexicographic tie-break
        WITH tok AS (
            SELECT doc_id, unnest(list_filter(
                regexp_split_to_array(trim(text), '\\s+'),
                tk -> tk <> '')) AS term
            FROM documents
        ),
        post AS (
            SELECT term, doc_id, COUNT(*) AS tf
            FROM tok GROUP BY 1, 2
        ),
        stats AS (
            SELECT term,
                   CAST(COUNT(*) AS BIGINT) AS df,
                   CAST(SUM(tf) AS BIGINT) AS total_occurrences,
                   CAST(MIN(doc_id) AS BIGINT) AS first_doc_id
            FROM post GROUP BY 1
        )
        SELECT term, df, total_occurrences, first_doc_id
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                ORDER BY df DESC, term) AS rn
            FROM stats
        )
        WHERE rn <= 25
    """,
    description=(
        "inverted-index construction stats: per-term df / occurrences / "
        "first posting, top-25 by document frequency"
    ),
    tags=("text", "index", "aggregate", "deterministic"),
)
def term_posting_stats(spark, sf_dir):
    """The search-index build as a declarative plan: explode terms, reduce
    to the (term, doc) posting grain (map-side combined — within-doc
    repeats collapse before the shuffle), then the per-term rollup. At
    100 TB the posting grain IS the index; this query materializes its
    health stats. Deterministic: integer counts, lexicographic
    tie-break."""
    from ..operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    # explode_outer + isNotNull: see dedup.exploded_shingles (guard device)
    tok = docs.select(
        "doc_id", F.explode_outer(tokens("text")).alias("term")
    ).filter(F.col("term").isNotNull())
    post = tok.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
    stats = post.groupBy("term").agg(
        F.count("*").cast("bigint").alias("df"),
        F.sum("tf").cast("bigint").alias("total_occurrences"),
        F.min("doc_id").cast("bigint").alias("first_doc_id"),
    )
    # distributed TakeOrderedAndProject — no global-window single reducer
    return stats.orderBy(F.desc("df"), F.asc("term")).limit(25)


@register(
    "join_cardinality_estimate_vs_actual",
    oracle="""
        -- the textbook CBO estimate |R ⋈ S| ≈ |R|·|S| / max(d_R, d_S)
        -- versus ground truth, per join — the estimator audit an optimizer
        -- engineer runs when plans pick bad strategies. Exact integers in,
        -- one double division out.
        WITH s AS (
            SELECT
                (SELECT COUNT(*) FROM orders) AS n_o,
                (SELECT COUNT(DISTINCT o_custkey) FROM orders) AS d_o,
                (SELECT COUNT(*) FROM customer) AS n_c,
                (SELECT COUNT(DISTINCT c_custkey) FROM customer) AS d_c,
                (SELECT COUNT(*) FROM orders o
                 JOIN customer c ON o.o_custkey = c.c_custkey) AS actual_oc,
                (SELECT COUNT(*) FROM lineitem) AS n_l,
                (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem) AS d_l,
                (SELECT COUNT(DISTINCT o_orderkey) FROM orders) AS d_ok,
                (SELECT COUNT(*) FROM lineitem l
                 JOIN orders o ON l.l_orderkey = o.o_orderkey) AS actual_lo
        )
        SELECT * FROM (
            SELECT 'orders_customer' AS join_name,
                   CAST(n_o AS BIGINT) AS n_left,
                   CAST(n_c AS BIGINT) AS n_right,
                   CAST(floor(n_o * n_c / greatest(d_o, d_c)) AS BIGINT)
                       AS estimated_rows,
                   CAST(actual_oc AS BIGINT) AS actual_rows,
                   CAST(floor(n_o * n_c / greatest(d_o, d_c)) AS DOUBLE)
                       / CAST(actual_oc AS DOUBLE) AS est_over_actual
            FROM s
            UNION ALL
            SELECT 'lineitem_orders',
                   CAST(n_l AS BIGINT), CAST(n_o AS BIGINT),
                   CAST(floor(n_l * n_o / greatest(d_l, d_ok)) AS BIGINT),
                   CAST(actual_lo AS BIGINT),
                   CAST(floor(n_l * n_o / greatest(d_l, d_ok)) AS DOUBLE)
                       / CAST(actual_lo AS DOUBLE)
            FROM s
        ) ORDER BY join_name
    """,
    description=(
        "CBO estimator audit: textbook equi-join cardinality estimate vs "
        "ground truth for the two core joins"
    ),
    tags=("optimizer", "diagnostics", "aggregate", "deterministic"),
)
def join_cardinality_estimate_vs_actual(spark, sf_dir):
    """Why plans go wrong, quantified: the uniform-frequency estimate
    |R|·|S|/max(d_R,d_S) against the true join size. A ratio near 1 means
    NDV statistics alone would plan this join well; far from 1 flags skew
    that needs histograms (or the engine's salting/AQE paths). All inputs
    are exact integer counts — the estimate division floors identically
    in both engines (DuckDB integer / is double division, so both sides
    CAST the double quotient to BIGINT)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    n_o = orders.count()
    d_o = orders.select("o_custkey").distinct().count()
    n_c = cust.count()
    d_c = cust.select("c_custkey").distinct().count()
    actual_oc = orders.join(
        cust, orders.o_custkey == cust.c_custkey
    ).count()
    n_l = li.count()
    d_l = li.select("l_orderkey").distinct().count()
    d_ok = orders.select("o_orderkey").distinct().count()
    actual_lo = li.join(orders, li.l_orderkey == orders.o_orderkey).count()

    def row(name, nl, nr, dl, dr, actual):
        est = int(nl * nr / max(dl, dr))
        return (name, nl, nr, est, actual, float(est) / float(actual))

    rows = [
        row("lineitem_orders", n_l, n_o, d_l, d_ok, actual_lo),
        row("orders_customer", n_o, n_c, d_o, d_c, actual_oc),
    ]
    return spark.createDataFrame(
        sorted(rows),
        "join_name string, n_left long, n_right long, estimated_rows long,"
        " actual_rows long, est_over_actual double",
    )


@register(
    "order_price_equidepth_histogram",
    bench=True,
    oracle="""
        -- equi-DEPTH histogram (equal counts per bucket, data-driven
        -- edges) — the histogram an optimizer actually wants, vs the
        -- equi-width value_histogram. Deterministic: NTILE over exact
        -- integer cents with key tie-break.
        WITH c AS (
            SELECT o_orderkey,
                   CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)
                       AS cents
            FROM orders
        ),
        b AS (
            SELECT cents,
                   NTILE(10) OVER (ORDER BY cents, o_orderkey) AS bucket
            FROM c
        )
        SELECT
            CAST(bucket AS INT) AS bucket,
            CAST(COUNT(*) AS BIGINT) AS n_orders,
            CAST(MIN(cents) AS DOUBLE) / 100.0 AS lo_price,
            CAST(MAX(cents) AS DOUBLE) / 100.0 AS hi_price
        FROM b
        GROUP BY 1
    """,
    description=(
        "equi-depth price histogram: 10 equal-count buckets with "
        "data-driven edges (NTILE over exact cents)"
    ),
    tags=("analytics", "aggregate", "optimizer", "deterministic"),
)
def order_price_equidepth_histogram(spark, sf_dir):
    """Equal-count buckets expose the distribution's shape where
    equal-width buckets pile everything into two bars — and equi-depth
    edges are exactly what CBO histograms store. The tiling is the
    DISTRIBUTED exact NTILE (operators/relational.py::global_ntile):
    range-repartition on (cents, key), rank within each range partition,
    add broadcast prefix offsets — bit-identical to the single-window
    NTILE with no single-reducer stage, so the plan survives 100x."""
    from ..operators.relational import global_ntile

    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("bigint")
    b = global_ntile(
        orders.select(cents.alias("cents"), F.col("o_orderkey")),
        10,
        [("cents", "asc"), ("o_orderkey", "asc")],
        out="bucket",
    )
    return b.groupBy(F.col("bucket").cast("int").alias("bucket")).agg(
        F.count("*").cast("bigint").alias("n_orders"),
        (F.min("cents").cast("double") / 100.0).alias("lo_price"),
        (F.max("cents").cast("double") / 100.0).alias("hi_price"),
    )


@register(
    "weighted_doc_sample",
    oracle="""
        -- weighted sampling without replacement, distributed and
        -- engine-portable: Efraimidis-Spirakis keys k = ln(u)/w with u a
        -- deterministic md5 uniform — the top-50 by key IS a weighted
        -- sample (longer docs proportionally likelier), no RNG state, no
        -- driver pass
        WITH u AS (
            SELECT doc_id, lang, n_chars,
                   CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),
                        1, 8)) AS BIGINT) / 4294967296.0 AS uni
            FROM documents
        ),
        k AS (
            SELECT doc_id, lang, n_chars,
                   ln(uni) / CAST(n_chars AS DOUBLE) AS skey
            FROM u
            WHERE uni > 0 AND n_chars > 0
        )
        SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
        FROM (
            SELECT *, ROW_NUMBER() OVER (ORDER BY skey DESC, doc_id) AS rn
            FROM k
        )
        WHERE rn <= 50
    """,
    description=(
        "weighted sampling without replacement via Efraimidis-Spirakis "
        "keys over deterministic md5 uniforms (top-k by key, no RNG state)"
    ),
    tags=("sampling", "deterministic"),
)
def weighted_doc_sample(spark, sf_dir):
    """Length-weighted corpus sampling, the distributed way: each row
    computes its own sample key k = ln(u)/w from an md5-uniform (exact
    dyadic, identical on any engine), and the weighted sample is just
    TakeOrdered top-k on the key — one pass, no RNG state to coordinate,
    reproducible forever. This is the standard one-pass weighted
    reservoir idea as a declarative plan; the seeded-randomSplit family
    (R1/R2) stays engine-specific while this one is oracle-checked."""
    docs = load_table(spark, sf_dir, "documents")
    uni = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("bigint")
        / F.lit(4294967296.0)
    )
    k = docs.select(
        "doc_id",
        "lang",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        # the where() below drops these rows, but ANSI evaluation order
        # is optimizer-dependent (the filter only protects the division if
        # pushdown reorders it below this projection) — guard in-place
        F.when(
            (uni > 0) & (F.col("n_chars") > 0),
            F.log(uni) / F.col("n_chars").cast("double"),
        ).alias("skey"),
    ).where((uni > 0) & (F.col("n_chars") > 0))
    # top-50 by key IS the sample: orderBy().limit() compiles to a
    # distributed TakeOrderedAndProject — no global-window single reducer
    return (
        k.orderBy(F.desc("skey"), F.asc("doc_id"))
        .limit(50)
        .select("doc_id", "lang", "n_chars")
    )


@register(
    "signup_to_purchase_latency_quantiles",
    oracle="""
        -- activation speed: per-user first signup -> first purchase
        -- latency, exact quartiles over integer second deltas (dyadic
        -- medians, engine-stable)
        WITH f AS (
            SELECT user_id,
                   MIN(CASE WHEN event_type = 'signup' THEN ts END)
                       AS first_signup,
                   MIN(CASE WHEN event_type = 'purchase' THEN ts END)
                       AS first_purchase
            FROM events
            GROUP BY 1
        ),
        d AS (
            SELECT CAST(floor(epoch(first_purchase))
                        - floor(epoch(first_signup)) AS BIGINT) AS delta_s
            FROM f
            WHERE first_signup IS NOT NULL
              AND first_purchase IS NOT NULL
              AND first_purchase >= first_signup
        )
        SELECT
            CAST(COUNT(*) AS BIGINT) AS n_users,
            quantile_cont(delta_s, 0.25) AS p25_s,
            quantile_cont(delta_s, 0.50) AS p50_s,
            quantile_cont(delta_s, 0.75) AS p75_s
        FROM d
    """,
    description=(
        "activation latency: first-signup to first-purchase quartiles "
        "(exact percentiles over integer second deltas)"
    ),
    tags=("analytics", "funnel", "aggregate", "deterministic"),
)
def signup_to_purchase_latency_quantiles(spark, sf_dir):
    """The activation-speed KPI: one conditional-min reduce on the user
    grain (map-side combined), then exact quartiles over integer second
    deltas — interpolated midpoints are dyadic, so the numbers are
    bit-stable on any engine. Truncated epoch seconds keep the delta an
    exact integer (determinism rule: fractional epochs are floats in the
    oracle engine)."""
    ev = load_table(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
            "first_signup"
        ),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("first_purchase"),
    )
    d = f.where(
        F.col("first_signup").isNotNull()
        & F.col("first_purchase").isNotNull()
        & (F.col("first_purchase") >= F.col("first_signup"))
    ).select(
        (
            F.unix_timestamp("first_purchase")
            - F.unix_timestamp("first_signup")
        )
        .cast("bigint")
        .alias("delta_s")
    )
    return d.agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.expr("percentile(delta_s, 0.25)").alias("p25_s"),
        F.expr("percentile(delta_s, 0.50)").alias("p50_s"),
        F.expr("percentile(delta_s, 0.75)").alias("p75_s"),
    )


@register(
    "quality_classifier_brier",
    oracle=f"""
        WITH c AS ({_SQL_QCOUNTS}),
        z AS (
            SELECT {_SQL_WL} AS wl,
                   1.0 / (1.0 + exp(-({_SQL_Z}))) AS p
            FROM c
        )
        SELECT
            CAST(COUNT(*) AS BIGINT) AS n_docs,
            CAST(SUM(CAST((p - wl) * (p - wl) AS DECIMAL(28,10)))
                 AS DOUBLE) / COUNT(*) AS brier
        FROM z
    """,
    description=(
        "Brier score of the frozen quality filter (decimal-exact sum of "
        "squared probability errors)"
    ),
    tags=("ml", "text", "aggregate", "deterministic"),
)
def quality_classifier_brier(spark, sf_dir):
    """Proper-scoring-rule calibration in one number, completing the eval
    suite (deciles, confusion, PR, AUC, Brier). Each row's (p−y)² is the
    identical fixed-fold double expression on both engines; quantizing to
    DECIMAL(28,10) before the sum makes the aggregation order-free, so
    the mean is bit-stable on any partitioning."""
    docs = load_table(spark, sf_dir, "documents")
    counted = quality_feature_counts(docs)
    p = quality_probability()
    err = p - weak_label().cast("double")
    scored = counted.select((err * err).cast("decimal(28,10)").alias("e2"))
    return scored.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        (F.sum("e2").cast("double") / F.count("*")).alias("brier"),
    )


@register(
    "stream_contract_split_counts",
    oracle="""
        SELECT
            CAST(CASE WHEN value >= 0 AND user_id IS NOT NULL
                      AND event_type IN
                          ('view','click','signup','purchase','error')
                 THEN 1 ELSE 0 END AS INT) AS passed,
            CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events
        GROUP BY 1
    """,
    description=(
        "data-contract gate IN the stream: per-micro-batch pass/violation "
        "split, accumulated counts equal the batch gate (full oracle)"
    ),
    tags=("streaming", "quality", "deterministic"),
)
def stream_contract_split_counts(spark, sf_dir):
    """The promotion gate applied at ingestion time instead of after the
    fact: every micro-batch splits rows by the contract predicate (range,
    null, enum-domain checks — a pure projection), and the running
    pass/violation counts are associative, so the streamed result is
    bit-equal to the batch gate over the full table — the oracle IS that
    batch SQL. The violating side of this split is what feeds a
    dead-letter sink in production (see run_dead_letter_foreach_batch)."""
    from ..streaming.pipeline import events_stream, run_to_memory_sink

    domain = ("view", "click", "signup", "purchase", "error")
    s = events_stream(spark, sf_dir)
    # coalesce(..., 0): a NULL value makes the conjunction NULL, which must
    # bucket under passed=0 (NULL-as-violation) to match the oracle's
    # CASE WHEN ... THEN 1 ELSE 0 semantics.
    passed = F.coalesce(
        (
            (F.col("value") >= 0)
            & F.col("user_id").isNotNull()
            & F.col("event_type").isin(*domain)
        ).cast("int"),
        F.lit(0),
    )
    agg = s.select(passed.alias("passed")).groupBy("passed").agg(
        F.count("*").alias("n_events")
    )
    return run_to_memory_sink(agg)


@register(
    "als_training_curve",
    oracle=None,  # alternating closed-form solves over floats — the exact
    # non-increase guarantee and cross-partitioning determinism are pytest
    # invariants (tests/test_als.py)
    description=(
        "distributed ALS matrix factorization on the customer x part "
        "purchase matrix: regularized loss per half-step"
    ),
    tags=("ml", "training", "recommendation", "no-oracle"),
)
def als_training_curve(spark, sf_dir):
    """Collaborative filtering joins the trainer family: the customer×part
    implicit-feedback matrix (purchase counts) factorized by alternating
    per-entity ridge solves — ratings stay grouped on the cluster, only
    the small factor matrices move, and exact alternating minimization
    makes the loss sequence non-increasing by construction. The factors
    are DataFrame-resident end to end (``fit_als_df``): only the loss
    scalars — one per half-step — ever reach the driver."""
    from ..ml.als import fit_als_df

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    ratings = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("o_custkey").alias("user"),
            F.col("l_partkey").alias("item"),
        )
        .agg(F.count("*").cast("double").alias("rating"))
    )
    fit = fit_als_df(ratings, "user", "item", k=8, iters=3)
    fit.unpersist()
    return spark.createDataFrame(
        [(i, float(x)) for i, x in enumerate(fit.losses)],
        "half_step int, reg_loss double",
    )


@register(
    "part_copurchase_lift",
    oracle=f"""
        -- association mining on the order basket: top part pairs by lift
        -- = P(a,b) / (P(a)·P(b)) over orders, all from exact integer
        -- counts (support floor 3 kills noise pairs)
        WITH po0 AS (
            SELECT DISTINCT l_orderkey AS okey, l_partkey AS part
            FROM lineitem
        ),
        -- k^2 guard (the shared cap_baskets constant): baskets over
        -- {_MB} distinct parts are dropped from the analysis entirely
        -- (inert on TPC-H: baskets hold <= 7 parts)
        ok AS (SELECT okey FROM po0 GROUP BY 1 HAVING COUNT(*) <= {_MB}),
        po AS (SELECT po0.* FROM po0 JOIN ok ON po0.okey = ok.okey),
        n AS (SELECT CAST(COUNT(DISTINCT okey) AS BIGINT) AS n_orders
              FROM po),
        pc AS (
            SELECT part, CAST(COUNT(*) AS BIGINT) AS n_part
            FROM po GROUP BY 1
        ),
        pairs AS (
            SELECT a.part AS part_a, b.part AS part_b,
                   CAST(COUNT(*) AS BIGINT) AS n_both
            FROM po a JOIN po b
              ON a.okey = b.okey AND a.part < b.part
            GROUP BY 1, 2
            HAVING COUNT(*) >= 3
        )
        SELECT part_a, part_b, n_both,
               CAST(n_both AS DOUBLE) * CAST(n.n_orders AS DOUBLE)
                   / (CAST(ca.n_part AS DOUBLE)
                      * CAST(cb.n_part AS DOUBLE)) AS lift
        FROM pairs
        JOIN pc ca ON ca.part = pairs.part_a
        JOIN pc cb ON cb.part = pairs.part_b
        CROSS JOIN n
        ORDER BY lift DESC, part_a, part_b
        LIMIT 20
    """,
    description=(
        "market-basket association mining: top part pairs by lift over "
        "order baskets (support floor, exact integer counts)"
    ),
    tags=("analytics", "association", "join", "deterministic"),
)
def part_copurchase_lift(spark, sf_dir):
    """The classic basket analysis on the relational side (the events
    bigram-lift query's heavyweight sibling): distinct (order, part) pairs
    self-join within the basket, guarded by the max-basket cap (baskets
    over 64 distinct parts are dropped before the self-join — the pair
    blowup is quadratic in basket size, and one viral basket would emit
    k^2 pairs; inert on TPC-H where baskets hold <= 7). Lift from exact
    integer counts with a fixed multiply/divide order; deterministic
    top-20 with lexicographic tie-breaks."""
    from .queries_graph_retrieval import cap_baskets

    li = load_table(spark, sf_dir, "lineitem")
    po = cap_baskets(
        li.select(
            F.col("l_orderkey").alias("okey"),
            F.col("l_partkey").alias("part"),
        ).distinct()
    )
    n_orders = po.select("okey").distinct().count()
    pc = po.groupBy("part").agg(F.count("*").cast("bigint").alias("n_part"))
    a = po.alias("a")
    b = po.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.okey") == F.col("b.okey"))
            & (F.col("a.part") < F.col("b.part")),
        )
        .groupBy(
            F.col("a.part").alias("part_a"), F.col("b.part").alias("part_b")
        )
        .agg(F.count("*").cast("bigint").alias("n_both"))
        .where(F.col("n_both") >= 3)
    )
    ca = pc.select(F.col("part").alias("part_a"), F.col("n_part").alias("na"))
    cb = pc.select(F.col("part").alias("part_b"), F.col("n_part").alias("nb"))
    out = (
        pairs.join(ca, "part_a")
        .join(cb, "part_b")
        .select(
            "part_a",
            "part_b",
            "n_both",
            (
                F.col("n_both").cast("double")
                * F.lit(float(n_orders))
                / (F.col("na").cast("double") * F.col("nb").cast("double"))
            ).alias("lift"),
        )
    )
    return out.orderBy(
        F.desc("lift"), F.asc("part_a"), F.asc("part_b")
    ).limit(20)


@register(
    "als_related_parts",
    oracle=None,  # derives from the iterative ALS factors — determinism
    # across partitionings is the pytest invariant; the serving math
    # itself (factor cosine top-k) mirrors the oracle-checked
    # embedding_cosine_topk shape
    description=(
        "recommendation serving: top-3 related parts by ALS factor "
        "cosine for the five most-purchased parts"
    ),
    tags=("ml", "recommendation", "similarity", "no-oracle"),
)
def als_related_parts(spark, sf_dir):
    """The serving side of the collaborative-filtering family: train ALS
    on the purchase matrix, then answer 'customers who bought X also
    like...' by factor-space cosine, computed DISTRIBUTED — the query
    parts broadcast against the item-factor table through the
    oracle-checked ``cosine_topk_bruteforce`` shape, so serving scales
    with the catalog instead of collecting the factor matrix to the
    driver."""
    from ..ml.als import fit_als_df
    from ..operators.similarity import cosine_topk_bruteforce

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    ratings = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("o_custkey").alias("user"),
            F.col("l_partkey").alias("item"),
        )
        .agg(F.count("*").cast("double").alias("rating"))
    )
    top_parts = (
        ratings.groupBy("item")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("item"))
        .limit(5)
        .select("item")
    )
    fit = fit_als_df(ratings, "user", "item", k=8, iters=3)
    factors = fit.item_factors_df
    out = (
        cosine_topk_bruteforce(
            factors,
            factors.join(
                F.broadcast(top_parts), factors.id == top_parts.item
            ).select("id", "f"),
            id_col="id",
            vec_col="f",
            k=3,
        )
        .select(
            F.col("query_id").alias("part"),
            F.col("cand_id").alias("related_part"),
            F.col("rn").alias("rank"),
            "cosine",
        )
        .orderBy("part", "rank")
    )
    rows = out.collect()  # 15 rows — materialize before unpersisting factors
    fit.unpersist()
    return spark.createDataFrame(
        rows, "part long, related_part long, rank int, cosine double"
    )


@register(
    "watermark_tolerance_curve",
    oracle="""
        -- how many events a watermark of delay D would DROP, for a sweep
        -- of candidate delays — the tuning table behind the ST4 choice.
        -- Same deterministic md5-jitter arrival model as
        -- event_time_disorder_stats; an event is dropped at delay D when
        -- its event time lags the running max by MORE than D seconds.
        WITH j AS (
            SELECT user_id, ts, event_id,
                   floor(epoch(ts)) +
                   CAST(concat('0x',
                        substr(md5(CAST(event_id AS VARCHAR)), 1, 8))
                        AS BIGINT) % 86401 AS arrival_s
            FROM events
        ),
        w AS (
            SELECT ts,
                   MAX(ts) OVER (PARTITION BY user_id
                                 ORDER BY arrival_s, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND 1 PRECEDING) AS prior_max
            FROM j
        ),
        lagged AS (
            SELECT CASE WHEN ts < prior_max
                        THEN CAST(floor(epoch(prior_max)) AS BIGINT)
                             - CAST(floor(epoch(ts)) AS BIGINT)
                        ELSE 0 END AS lag_s,
                   1 AS one
            FROM w
        ),
        d(delay_s) AS (VALUES (0), (60), (600), (3600), (21600), (86400))
        SELECT
            CAST(delay_s AS BIGINT) AS delay_s,
            CAST(SUM(CASE WHEN lag_s > delay_s THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_dropped,
            CAST(SUM(CASE WHEN lag_s > delay_s THEN 1 ELSE 0 END)
                 AS DOUBLE) / SUM(one) AS drop_frac
        FROM lagged, d
        GROUP BY 1
    """,
    description=(
        "watermark tuning table: events dropped at each candidate delay "
        "(0s..1d sweep over the deterministic arrival model)"
    ),
    tags=("streaming", "quality", "window", "deterministic"),
)
def watermark_tolerance_curve(spark, sf_dir):
    """ST4 tuning, quantified: the completeness-vs-latency tradeoff as a
    table — each candidate watermark delay with exactly how many events it
    would drop. One running-max window (the disorder query's shape), then
    a 6-value constant cross join with conditional integer sums — the
    sweep costs one scan, not six."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    jitter = (
        F.conv(
            F.substring(F.md5(F.col("event_id").cast("string")), 1, 8),
            16,
            10,
        ).cast("bigint")
        % 86401
    )
    j = ev.select(
        "user_id",
        "ts",
        "event_id",
        (F.unix_timestamp("ts") + jitter).alias("arrival_s"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("arrival_s", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lag = F.when(
        F.col("ts") < F.col("prior_max"),
        F.unix_timestamp("prior_max") - F.unix_timestamp("ts"),
    ).otherwise(0)
    lagged = j.select(
        F.max("ts").over(w).alias("prior_max"), "ts"
    ).select(lag.alias("lag_s"))
    delays = spark.createDataFrame(
        [(0,), (60,), (600,), (3600,), (21600,), (86400,)], "delay_s long"
    )
    x = lagged.crossJoin(F.broadcast(delays))
    dropped = F.sum(
        F.when(F.col("lag_s") > F.col("delay_s"), 1).otherwise(0)
    )
    return x.groupBy("delay_s").agg(
        dropped.cast("bigint").alias("n_dropped"),
        (dropped.cast("double") / F.count("*")).alias("drop_frac"),
    )


@register(
    "sessions_per_user_histogram",
    oracle="""
        -- engagement shape: how many 30-min-gap sessions each user has,
        -- as a histogram (the engagement-depth companion to DAU): new
        -- session when the gap from the previous event exceeds 30 min
        WITH g AS (
            SELECT user_id, ts,
                   LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       AS prev_ts
            FROM events
        ),
        s AS (
            SELECT user_id,
                   CAST(SUM(CASE WHEN prev_ts IS NULL
                                 OR ts - prev_ts >= INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
            FROM g
            GROUP BY 1
        )
        SELECT n_sessions,
               CAST(COUNT(*) AS BIGINT) AS n_users
        FROM s
        GROUP BY 1
    """,
    description=(
        "sessions-per-user histogram (30-min gap sessionization reduced "
        "to per-user counts, then the engagement-depth distribution)"
    ),
    tags=("analytics", "session", "window", "deterministic"),
)
def sessions_per_user_histogram(spark, sf_dir):
    """Engagement depth, not just reach: the per-user session count
    distribution. One lag window per user lane (the proven session-gap
    definition shared with user_session_windows), a user-grain reduce,
    then the tiny histogram grain — integer counts everywhere."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select(
        "user_id", "ts", F.lag("ts").over(w).alias("prev_ts")
    )
    # interval comparison on the naive timestamps (determinism rule 4:
    # epoch() is fractional in the oracle engine, unix_timestamp truncates)
    new_sess = F.when(
        F.col("prev_ts").isNull()
        | F.expr("ts - prev_ts >= INTERVAL 30 MINUTE"),
        1,
    ).otherwise(0)
    s = g.groupBy("user_id").agg(
        F.sum(new_sess).cast("bigint").alias("n_sessions")
    )
    return s.groupBy("n_sessions").agg(
        F.count("*").cast("bigint").alias("n_users")
    )


@register(
    "tx_table_zorder_pruned_scan",
    oracle="""
        SELECT 'value' AS pruned_on,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events WHERE value BETWEEN 200.0 AND 500.0
        UNION ALL
        SELECT 'user_id' AS pruned_on,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events WHERE user_id BETWEEN 0 AND 20
    """,
    description=(
        "OPTIMIZE ZORDER on the tx table, then metadata-pruned range "
        "scans on BOTH clustered columns (full oracle on the raw table)"
    ),
    tags=("table-format", "source", "deterministic"),
)
def tx_table_zorder_pruned_scan(spark, sf_dir):
    """Multi-column data skipping end-to-end: four appends land events in
    hash-arbitrary data dirs (every dir overlaps every range — zero
    skipping), then ``optimize`` z-orders the table on (user_id, value)
    with equi-depth quantile codes, and ``snapshot_pruned`` answers a
    selective range on EITHER column reading only the overlapping dirs.
    The oracle recomputes both scans on the raw table: matching proves the
    pruning is metadata-only planning, never a semantic change. (The
    dirs-skipped assertions live in tests/test_txlog.py — file layout
    isn't SQL-expressible.)"""
    from ..scratch import scratch_unique
    from ..sources.txlog import TxTable

    ev = load_table(spark, sf_dir, "events")
    t = TxTable(
        spark,
        scratch_unique(spark, "txzorder"),
        stats_cols=("value", "user_id"),
    )
    for i in range(4):
        t.append(ev.filter(F.pmod(F.xxhash64("event_id"), F.lit(4)) == i))
    t.optimize(["user_id", "value"], num_buckets=16)

    def scan(col, lo, hi, label):
        return t.snapshot_pruned(col, lo, hi).agg(
            F.lit(label).alias("pruned_on"),
            F.count("*").cast("bigint").alias("n_rows"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )

    return scan("value", 200.0, 500.0, "value").unionByName(
        scan("user_id", 0, 20, "user_id")
    )


# ---------------------------------------------------------------------------
# Gradient-boosted stumps — fifth trainer family (round 7)
# ---------------------------------------------------------------------------

_GBDT_FEATURES_SQL = """
        SELECT l.l_orderkey AS okey,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
               CAST(COUNT(DISTINCT l.l_partkey) AS BIGINT) AS n_parts,
               CAST(MAX(CAST(ROUND(l.l_discount * 10000) AS BIGINT))
                    AS BIGINT) AS max_disc_bp,
               CAST(ROUND(ANY_VALUE(o.o_totalprice) * 100) AS BIGINT)
                   AS price_cents
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1
"""


def _gbdt_feature_frame(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    return (
        li.groupBy(F.col("l_orderkey").alias("okey"))
        .agg(
            F.count("*").cast("long").alias("n_items"),
            F.sum(F.col("l_quantity").cast("long")).cast("long").alias(
                "sum_qty"
            ),
            F.countDistinct("l_partkey").cast("long").alias("n_parts"),
            F.max(F.round(F.col("l_discount") * 10000).cast("long"))
            .cast("long")
            .alias("max_disc_bp"),
        )
        .join(
            orders.select(
                F.col("o_orderkey").alias("okey"),
                F.round(F.col("o_totalprice") * 100)
                .cast("long")
                .alias("price_cents"),
            ),
            "okey",
        )
    )


_GBDT_FEATS = ("max_disc_bp", "n_items", "n_parts", "sum_qty")
_GBDT_B = 16


@register(
    "gbdt_best_first_stump",
    oracle="WITH feat AS MATERIALIZED ("
    + _GBDT_FEATURES_SQL
    + """),
        st AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(price_cents AS DECIMAL(28,10)))
                        AS DOUBLE) AS sy,
                   """
    + ", ".join(
        f"CAST(MIN({c}) AS BIGINT) AS mn_{c},"
        f" CAST(MAX({c}) AS BIGINT) AS mx_{c}"
        for c in _GBDT_FEATS
    )
    + """
            FROM feat
        ),
        resid AS (
            SELECT f.*, CAST(f.price_cents AS DOUBLE) - st.sy / st.n AS r
            FROM feat f CROSS JOIN st
        ),
        hist AS (
            """
    + "\nUNION ALL\n".join(
        f"""SELECT '{c}' AS feature,
                   (({c} - st.mn_{c}) * {_GBDT_B})
                       // (st.mx_{c} - st.mn_{c} + 1) AS bucket,
                   SUM(CAST(r AS DECIMAL(28,10))) AS s,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM resid CROSS JOIN st GROUP BY 1, 2"""
        for c in _GBDT_FEATS
    )
    + """
        ),
        pref AS (
            SELECT feature, bucket,
                   SUM(s) OVER (PARTITION BY feature ORDER BY bucket)
                       AS run_s,
                   SUM(cnt) OVER (PARTITION BY feature ORDER BY bucket)
                       AS run_n,
                   SUM(s) OVER (PARTITION BY feature) AS tot_s,
                   SUM(cnt) OVER (PARTITION BY feature) AS tot_n
            FROM hist
        ),
        gains AS (
            SELECT feature, CAST(bucket AS BIGINT) AS threshold_bucket,
                   CAST(run_s AS DOUBLE) * CAST(run_s AS DOUBLE) / run_n
                   + CAST(tot_s - run_s AS DOUBLE)
                     * CAST(tot_s - run_s AS DOUBLE) / (tot_n - run_n)
                       AS gain,
                   CAST(run_s AS DOUBLE) / run_n AS gamma_l,
                   CAST(tot_s - run_s AS DOUBLE) / (tot_n - run_n)
                       AS gamma_r
            FROM pref
            WHERE run_n < tot_n
        )
        SELECT feature, threshold_bucket, gain, gamma_l, gamma_r
        FROM gains
        ORDER BY gain DESC, feature, threshold_bucket
        LIMIT 1
    """,
    description=(
        "boosting trainer core, oracle-checked: the exact best first "
        "stump (feature, bucket threshold, leaf values) from the "
        "residual histogram — from-scratch SQL vs the distributed fit"
    ),
    tags=("ml", "training", "boosting", "deterministic"),
)
def gbdt_best_first_stump(spark, sf_dir):
    """The oracle-checked core of the fifth trainer family (LS-Boost over
    histogram stumps, ml/boosting.py) — same device as
    kmeans_init_assignment_portable and bpe_initial_pair_counts: the
    first training step recomputed from scratch by DuckDB must match the
    distributed trainer bit for bit (decimal-exact residual histogram,
    exact integer bucketization, fixed-order double gains), proving the
    iteration machinery rather than just the curve's shape."""
    from ..ml.boosting import fit_gbdt_stumps

    fit = fit_gbdt_stumps(
        _gbdt_feature_frame(spark, sf_dir),
        list(_GBDT_FEATS),
        "price_cents",
        rounds=1,
        n_buckets=_GBDT_B,
    )
    s = fit.stumps[0]
    return spark.createDataFrame(
        [
            (
                s.feature,
                s.threshold_bucket,
                s.gain,
                s.gamma_l,
                s.gamma_r,
            )
        ],
        "feature string, threshold_bucket long, gain double, "
        "gamma_l double, gamma_r double",
    )


@register(
    "gbdt_training_curve",
    oracle=None,  # 5 greedy rounds over double residuals — the exact
    # non-increase guarantee and cross-partitioning determinism are pytest
    # invariants (tests/test_ml.py); the round-0 machinery is oracle-checked
    # by gbdt_best_first_stump
    description=(
        "gradient-boosted stumps on order features predicting order value: "
        "training SSE and chosen split per round (monotone by construction)"
    ),
    tags=("ml", "training", "boosting", "no-oracle"),
)
def gbdt_training_curve(spark, sf_dir):
    """LS-Boost training curve: per round the SSE before adding that
    round's stump, plus the stump chosen. One histogram aggregation per
    round; predictions live in the expression tree (never materialized),
    so the whole 5-round fit is 6 Spark jobs over one cached-free scan
    chain. The SSE sequence is non-increasing by construction."""
    from ..ml.boosting import fit_gbdt_stumps

    fit = fit_gbdt_stumps(
        _gbdt_feature_frame(spark, sf_dir),
        list(_GBDT_FEATS),
        "price_cents",
        rounds=5,
        n_buckets=_GBDT_B,
    )
    rows = [
        (
            i,
            fit.sses[i],
            fit.stumps[i].feature if i < len(fit.stumps) else None,
            fit.stumps[i].threshold_bucket if i < len(fit.stumps) else None,
            fit.stumps[i].gain if i < len(fit.stumps) else None,
        )
        for i in range(len(fit.sses))
    ]
    return spark.createDataFrame(
        rows,
        "round int, sse double, feature string, threshold_bucket long, "
        "gain double",
    )


# ---------------------------------------------------------------------------
# Differential-privacy release (completes the k/l/t/DP privacy quartet)
# ---------------------------------------------------------------------------


@register(
    "events_dp_noisy_counts",
    oracle="""
        WITH c AS (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_true
            FROM events
            WHERE event_type IS NOT NULL
            GROUP BY 1
        ),
        u AS (
            SELECT event_type, n_true,
                   CAST(concat('0x',
                        substr(md5(concat('dp-v1|', event_type)), 1, 8))
                        AS BIGINT) / 4294967296.0 AS uni
            FROM c
        )
        SELECT event_type,
               ROUND(n_true
                     + (CASE WHEN uni < CAST(0.5 AS DOUBLE)
                             THEN CAST(1.0 AS DOUBLE)
                             ELSE CAST(-1.0 AS DOUBLE) END)
                       * (CAST(1.0 AS DOUBLE) / CAST(0.5 AS DOUBLE))
                       * ln(CAST(1.0 AS DOUBLE)
                            - CAST(2.0 AS DOUBLE)
                              * abs(uni - CAST(0.5 AS DOUBLE))),
                     6) AS n_released
        FROM u
        ORDER BY event_type
    """,
    description=(
        "ε-DP histogram release (ε=0.5): Laplace(1/ε) noise via the "
        "inverse CDF over the engine-portable md5 uniform — the SEEDED "
        "form, so the release is reproducible and oracle-checkable"
    ),
    tags=("privacy", "governance", "aggregate", "deterministic"),
)
def events_dp_noisy_counts(spark, sf_dir):
    """The release step after the k-anonymity / l-diversity / t-closeness
    audits pass: per-category counts with Laplace(Δf/ε) noise (Δf = 1 for
    a disjoint histogram, ε = 0.5). Production DP uses fresh randomness;
    a REPRODUCIBLE pipeline wants the seeded form — noise derived from
    the engine-portable md5 uniform (operators/relational.py::
    hash_uniform) through the Laplace inverse CDF, so reruns, engine
    migrations, and the DuckDB oracle all release the identical values.
    The RELEASE carries only the noised counts — publishing n_true
    alongside would void the privacy guarantee entirely — and the seed
    string ('dp-v1|') must be treated as a secret and excluded from any
    real release: anyone holding it can invert the noise. Noise is
    pointwise double math rounded at 6 decimals (the libm-ln
    convention)."""
    from ..operators.relational import hash_uniform

    events = load_table(spark, sf_dir, "events")
    c = (
        events.filter(F.col("event_type").isNotNull())
        .groupBy("event_type")
        .agg(F.count("*").cast("long").alias("n_true"))
    )
    uni = hash_uniform(F.col("event_type"), "dp-v1|")
    sign = F.when(uni < F.lit(0.5), F.lit(1.0)).otherwise(F.lit(-1.0))
    scale = F.lit(1.0) / F.lit(0.5)  # Δf/ε with Δf=1, ε=0.5
    noise = (
        sign
        * scale
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(uni - F.lit(0.5)))
    )
    return c.select(
        "event_type",
        F.round(F.col("n_true") + noise, 6).alias("n_released"),
    ).orderBy("event_type")


@register(
    "tx_table_point_lookup_bloom",
    oracle="""
        WITH pick AS (
            SELECT user_id FROM events
            WHERE user_id IS NOT NULL
            GROUP BY 1
            ORDER BY COUNT(*) DESC, user_id
            LIMIT 1
        )
        SELECT e.user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(DISTINCT e.event_type) AS BIGINT) AS n_types
        FROM events e JOIN pick USING (user_id)
        GROUP BY 1
    """,
    description=(
        "Bloom-sidecar point lookup on the txlog table: the busiest "
        "user's rows fetched via per-dir bloom pruning (full oracle)"
    ),
    tags=("table-format", "index", "deterministic"),
)
def tx_table_point_lookup_bloom(spark, sf_dir):
    """The needle-in-100TB read path: events land in the table as four
    hash-bucketed appends (each dir spans the whole user_id range, so
    min/max skipping prunes NOTHING — exactly the case bloom sidecars
    exist for), then the busiest user is fetched through
    ``point_lookup``, which consults only the per-dir bloom bitmaps
    before touching parquet. The row filter still applies, so bloom
    false positives cost I/O, never correctness — the returned counts
    equal the plain batch scan (the oracle)."""
    from ..scratch import scratch_unique
    from ..sources.txlog import TxTable

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    t = TxTable(
        spark, scratch_unique(spark, "txbloom"), bloom_cols=("user_id",)
    )
    for i in range(4):
        t.append(ev.filter(F.pmod(F.xxhash64("event_id"), F.lit(4)) == i))
    busiest = (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), "user_id")
        .first()["user_id"]
    )
    return (
        t.point_lookup("user_id", int(busiest))
        .groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.countDistinct("event_type").cast("long").alias("n_types"),
        )
    )


@register(
    "tx_table_delete_counts",
    oracle="""
        -- SQL DELETE semantics: removed only where the predicate is
        -- TRUE, so NULL-valued rows survive
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events
        WHERE value IS NULL OR value < 100 OR value > 400
        GROUP BY 1
        ORDER BY event_type
    """,
    description=(
        "DELETE WHERE on the txlog table: range delete with disjoint "
        "dirs carried over unrewritten; remaining counts (full oracle)"
    ),
    tags=("table-format", "cdc", "deterministic"),
)
def tx_table_delete_counts(spark, sf_dir):
    """GDPR-shaped DML: events land as four VALUE-RANGE-bucketed appends
    (so the delete range misses some dirs entirely), then
    ``delete_range(value, 100, 400)`` commits a new version rewriting
    only the overlapping dirs — the carried dirs are byte-identical
    paths, asserted in tests/test_txlog.py. The surviving per-type
    counts equal the batch complement filter (the oracle); time travel
    still reads the pre-delete version."""
    from ..scratch import scratch_unique
    from ..sources.txlog import TxTable

    ev = load_table(spark, sf_dir, "events")
    t = TxTable(spark, scratch_unique(spark, "txdelete"), stats_cols=("value",))
    splits = [(None, 0.0), (0.0, 100.0), (100.0, 400.0), (400.0, None)]
    for lo, hi in splits:
        part = ev
        if lo is not None:
            part = part.filter(F.col("value") >= lo)
        if hi is not None:
            part = part.filter(F.col("value") < hi)
        if lo is None:
            part = ev.filter(
                F.col("value").isNull() | (F.col("value") < 0.0)
            )
        t.append(part)
    t.delete_range("value", 100.0, 400.0)
    return (
        t.snapshot()
        .groupBy("event_type")
        .agg(F.count("*").cast("long").alias("n_events"))
        .orderBy("event_type")
    )


@register(
    "corpus_pipeline_v3_perplexity",
    oracle=f"""
        -- v3 capstone: learned gate -> bigram-LM perplexity BAND (cut the
        -- extreme deciles: low = boilerplate, high = gibberish — the
        -- CCNet shape) -> exact dedup -> per-language accounting
        WITH c AS ({_SQL_QCOUNTS}),
        scored AS (
            SELECT doc_id, lang, toks, {_SQL_Z} AS z FROM c
        ),
        gate AS (
            SELECT doc_id, lang, toks FROM scored WHERE z >= 0.0
        ),
        t AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(trim(text), '\\s+'),
                               tk -> tk <> '') AS tk
            FROM documents
        ),
        v AS (
            SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v
            FROM (SELECT unnest(tk) AS tok FROM t)
        ),
        bi AS (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(tk)),
                                         i -> tk[i])) AS w1,
                   unnest(list_transform(range(1, len(tk)),
                                         i -> tk[i+1])) AS w2
            FROM t WHERE len(tk) >= 2
        ),
        g AS (SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS m
              FROM bi GROUP BY 1, 2, 3),
        w AS (
            SELECT doc_id, m,
                   CAST(SUM(m) OVER (PARTITION BY w1, w2) AS BIGINT) AS c2,
                   CAST(SUM(m) OVER (PARTITION BY w1) AS BIGINT) AS c1
            FROM g
        ),
        ppl AS (
            SELECT doc_id,
                   ROUND(CAST(SUM(CAST(m AS DECIMAL(9,0))
                            * CAST(ln(CAST(c1 + v.v AS DOUBLE))
                                   - ln(CAST(c2 + 1 AS DOUBLE))
                                   AS DECIMAL(28,10))) AS DOUBLE)
                       / SUM(m), 6) AS nlp
            FROM w CROSS JOIN v
            GROUP BY doc_id
        ),
        banded AS (
            SELECT gate.doc_id, gate.lang, gate.toks
            FROM gate JOIN (
                SELECT doc_id,
                       NTILE(10) OVER (ORDER BY nlp, doc_id) AS dec
                FROM ppl
            ) d ON d.doc_id = gate.doc_id
            WHERE d.dec BETWEEN 2 AND 9
        ),
        fp AS (
            SELECT b.doc_id, b.lang, b.toks,
                   md5(regexp_replace(lower(trim(d.text)), '\\s+', ' ', 'g'))
                       AS fp
            FROM banded b JOIN documents d USING (doc_id)
        ),
        dedup AS (
            SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY fp ORDER BY doc_id) AS rn
                FROM fp
            ) WHERE rn = 1
        )
        SELECT lang,
               COUNT(*) AS kept_docs,
               CAST(SUM(toks) AS BIGINT) AS kept_tokens
        FROM dedup
        GROUP BY 1
    """,
    description=(
        "corpus pipeline v3: learned gate -> bigram-perplexity decile "
        "band (CCNet shape) -> exact dedup -> per-language accounting"
    ),
    tags=("llm-data", "ml", "text", "dedup", "quality", "deterministic"),
)
def corpus_pipeline_v3_perplexity(spark, sf_dir):
    """The capstone composition grows an LM stage: after the learned
    gate, every doc is scored by the corpus's own add-one bigram LM
    (doc_bigram_logprob's single-scan double-window shape) and the
    extreme DECILES are cut — decile 1 is boilerplate (too predictable),
    decile 10 is gibberish (too surprising): the CCNet perplexity-band
    idea with the band defined by ranks, not absolute thresholds, so the
    same query works at every corpus size. Scores are rounded to 6
    decimals BEFORE the NTILE ordering (ties then break on doc_id), so
    decile membership is cross-engine deterministic. The tiling is the
    distributed exact NTILE (relational.global_ntile: range-repartition +
    local rank + broadcast prefix offsets — no single-reducer stage); at
    100 TB a cheaper variant is two approx-quantile cuts broadcast into
    the filter, same result set up to quantile error."""
    from pyspark.sql.window import Window as W

    from ..operators.text import fingerprint, tokens

    docs = load_table(spark, sf_dir, "documents")
    counted = quality_feature_counts(docs)
    gate = counted.where(quality_logit() >= 0.0).select(
        "doc_id", "lang", F.col("n_toks_q").alias("toks")
    )
    toks = docs.select("doc_id", tokens("text").alias("tk"))
    vocab = int(
        # explode_outer + isNotNull: see dedup.exploded_shingles (guard device)
        toks.select(F.explode_outer("tk").alias("tok"))
        .filter(F.col("tok").isNotNull())
        .agg(F.countDistinct("tok"))
        .first()[0]
    )
    sz = F.size("tk")
    pairs = (
        toks.filter(sz >= 2)
        .select(
            "doc_id",
            F.explode_outer(
                F.arrays_zip(
                    F.slice("tk", 1, sz - 1).alias("w1"),
                    F.slice("tk", 2, sz - 1).alias("w2"),
                )
            ).alias("p"),
        )
        .filter(F.col("p").isNotNull())
        .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    g = pairs.groupBy("doc_id", "w1", "w2").agg(
        F.count("*").cast("long").alias("m")
    )
    c2 = F.sum("m").over(W.partitionBy("w1", "w2")).cast("long")
    c1 = F.sum("m").over(W.partitionBy("w1")).cast("long")
    term = F.log((c1 + F.lit(vocab)).cast("double")) - F.log(
        (c2 + F.lit(1)).cast("double")
    )
    ppl = (
        g.select(
            "doc_id",
            "m",
            (F.col("m").cast("decimal(9,0)") * term.cast("decimal(28,10)")).alias("__t"),
        )
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum("__t").cast("double") / F.sum("m"), 6
            ).alias("nlp")
        )
    )
    # exact deciles WITHOUT a global-window single reducer: distributed
    # NTILE (range-repartition + local rank + broadcast prefix offsets)
    from ..operators.relational import global_ntile

    deciles = global_ntile(
        ppl, 10, [("nlp", "asc"), ("doc_id", "asc")], out="dec"
    ).select("doc_id", "dec")
    banded = gate.join(
        deciles.filter(F.col("dec").between(2, 9)), "doc_id"
    )
    fp = banded.join(docs.select("doc_id", "text"), "doc_id").select(
        "doc_id", "lang", "toks", fingerprint("text").alias("fp")
    )
    w = W.partitionBy("fp").orderBy("doc_id")
    dedup = fp.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") == 1
    )
    return dedup.groupBy("lang").agg(
        F.count("*").alias("kept_docs"),
        F.sum("toks").cast("long").alias("kept_tokens"),
    )


@register(
    "tx_table_schema_evolution_counts",
    oracle="""
        -- rows ingested BEFORE the ADD COLUMN read back NULL; rows after
        -- carry the computed tier — membership via the md5-range split
        WITH tagged AS (
            SELECT CASE
                WHEN CAST(concat('0x',
                     substr(md5(concat('evo|', CAST(event_id AS VARCHAR))),
                            1, 8)) AS BIGINT) / 4294967296.0 < 0.5
                THEN NULL
                ELSE CASE WHEN value >= 200 THEN 'high' ELSE 'low' END
            END AS tier
            FROM events
        )
        SELECT tier, CAST(COUNT(*) AS BIGINT) AS n_events
        FROM tagged
        GROUP BY 1
        ORDER BY tier NULLS FIRST
    """,
    description=(
        "ALTER TABLE ADD COLUMN on the txlog table: metadata-only "
        "evolution, old rows NULL through the mergeSchema read (oracle)"
    ),
    tags=("table-format", "schema-evolution", "deterministic"),
)
def tx_table_schema_evolution_counts(spark, sf_dir):
    """Schema evolution end to end: half the events land before the
    ``add_column('tier')`` evolution (they read back NULL — the commit
    touches no data file), the other half lands after, carrying the
    widened schema; committed-schema enforcement applies to the evolved
    shape from the moment of the ALTER. Membership in the two eras is
    the engine-portable md5-range split, so the per-tier counts have a
    full batch oracle."""
    from ..operators.relational import hash_uniform
    from ..scratch import scratch_unique
    from ..sources.txlog import TxTable

    ev = load_table(spark, sf_dir, "events")
    u = hash_uniform(F.col("event_id"), "evo|")
    t = TxTable(spark, scratch_unique(spark, "txevolve"))
    t.append(ev.filter(u < 0.5))
    t.add_column("tier", "string")
    t.append(
        ev.filter(~(u < 0.5)).withColumn(
            "tier",
            F.when(F.col("value") >= 200, "high").otherwise("low"),
        )
    )
    return (
        t.snapshot()
        .groupBy("tier")
        .agg(F.count("*").cast("long").alias("n_events"))
        .orderBy(F.col("tier").asc_nulls_first())
    )


# ---------------------------------------------------------------------------
# Round 8: per-language weighted sampling, vocabulary coverage, classifier
# calibration, corpus-mix divergence, txlog delete-all/restore
# ---------------------------------------------------------------------------


@register(
    "weighted_doc_sample_by_lang",
    oracle="""
        -- the PARTITIONED form of weighted_doc_sample: Efraimidis-
        -- Spirakis keys ranked within each language — the shape that
        -- scales (per-group window, no global order anywhere), and the
        -- sampler a multilingual corpus actually needs (quotas per lang)
        WITH u AS (
            SELECT doc_id, lang, n_chars,
                   CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),
                        1, 8)) AS BIGINT) / 4294967296.0 AS uni
            FROM documents
        ),
        k AS (
            SELECT doc_id, lang, n_chars,
                   ln(uni) / CAST(n_chars AS DOUBLE) AS skey
            FROM u
            WHERE uni > 0 AND n_chars > 0
        )
        SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS n_chars
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY lang ORDER BY skey DESC, doc_id) AS rn
            FROM k
        )
        WHERE rn <= 10
    """,
    description=(
        "per-language weighted sampling without replacement: top-10 "
        "Efraimidis-Spirakis keys within each lang (partitioned window)"
    ),
    tags=("sampling", "llm-data", "deterministic"),
)
def weighted_doc_sample_by_lang(spark, sf_dir):
    """weighted_doc_sample's scalable sibling: the same deterministic
    md5-uniform E-S keys, ranked WITHIN each language by a partitioned
    window — every language's quota computes in parallel with no global
    order anywhere, which is both the plan you want at 100 TB and the
    sampler a multilingual pretraining mix actually runs (per-language
    quotas, longer docs proportionally likelier)."""
    from ..operators.relational import hash_uniform, top_n_per_key

    docs = load_table(spark, sf_dir, "documents")
    uni = hash_uniform(F.col("doc_id"))
    k = docs.select(
        "doc_id",
        "lang",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        # the where() below drops these rows, but ANSI evaluation order
        # is optimizer-dependent (the filter only protects the division if
        # pushdown reorders it below this projection) — guard in-place
        F.when(
            (uni > 0) & (F.col("n_chars") > 0),
            F.log(uni) / F.col("n_chars").cast("double"),
        ).alias("skey"),
    ).where((uni > 0) & (F.col("n_chars") > 0))
    return top_n_per_key(
        k, ["lang"], [F.desc("skey"), F.asc("doc_id")], 10
    ).select("lang", "doc_id", "n_chars")


@register(
    "token_coverage_curve",
    oracle="""
        -- Zipf in actionable form: what share of the corpus's token MASS
        -- do the top 10 / 100 / 1000 vocabulary types cover? The number
        -- that sizes stopword lists, cache tiers, and softmax shortlists.
        WITH freq AS (
            SELECT tok, CAST(COUNT(*) AS BIGINT) AS n
            FROM (
                SELECT unnest(list_filter(
                    regexp_split_to_array(trim(text), '\\s+'),
                    tk -> tk <> '')) AS tok
                FROM documents
            )
            GROUP BY 1
        ),
        ranked AS (
            SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, tok) AS rk
            FROM freq
        ),
        tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t,
                       CAST(COUNT(*) AS BIGINT) AS v
                FROM freq)
        SELECT c.cutoff,
               CAST(SUM(CASE WHEN rk <= c.cutoff THEN n ELSE 0 END)
                    AS BIGINT) AS tokens_covered,
               CAST(SUM(CASE WHEN rk <= c.cutoff THEN n ELSE 0 END)
                    AS DOUBLE) / tot.t AS coverage,
               CAST(LEAST(c.cutoff, tot.v) AS BIGINT) AS types_used
        FROM ranked
        CROSS JOIN (SELECT unnest([10, 100, 1000]) AS cutoff) c
        CROSS JOIN tot
        GROUP BY c.cutoff, tot.t, tot.v
    """,
    description=(
        "vocabulary coverage curve: share of total token mass covered by "
        "the top 10/100/1000 types (distributed global rank)"
    ),
    tags=("text", "llm-data", "aggregate", "deterministic"),
)
def token_coverage_curve(spark, sf_dir):
    """How head-heavy is the corpus? Frequency table (map-side combined),
    then the DISTRIBUTED global rank over the whole vocabulary
    (relational.global_row_number — the vocab scales with the corpus, so
    no single-reducer window), then one grouped conditional sum per
    cutoff. Coverage is one double division of exact integers."""
    from ..operators.relational import global_row_number
    from ..operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    freq = (
        # explode_outer + isNotNull: see dedup.exploded_shingles (guard device)
        docs.select(F.explode_outer(tokens("text")).alias("tok"))
        .filter(F.col("tok").isNotNull())
        .groupBy("tok")
        .agg(F.count("*").cast("long").alias("n"))
    )
    ranked = global_row_number(
        freq, [("n", "desc"), ("tok", "asc")], out="rk"
    )
    # totals from the RANKED frame: it reads the helper's cached
    # range-partitioned copy, so the tokenize+explode+groupBy pipeline
    # is never executed a second time
    tot = ranked.agg(
        F.sum("n").cast("long").alias("t"),
        F.count("*").cast("long").alias("v"),
    )
    cuts = spark.createDataFrame([(10,), (100,), (1000,)], "cutoff int")
    return (
        ranked.crossJoin(F.broadcast(cuts))
        .crossJoin(F.broadcast(tot))
        .groupBy("cutoff", "t", "v")
        .agg(
            F.sum(F.when(F.col("rk") <= F.col("cutoff"), F.col("n")).otherwise(0))
            .cast("bigint")
            .alias("tokens_covered")
        )
        .select(
            "cutoff",
            "tokens_covered",
            (F.col("tokens_covered").cast("double") / F.col("t")).alias(
                "coverage"
            ),
            F.least(F.col("cutoff").cast("bigint"), F.col("v"))
            .cast("bigint")
            .alias("types_used"),
        )
    )


@register(
    "quality_classifier_reliability_bins",
    oracle=f"""
        -- calibration (reliability diagram): per predicted-probability
        -- decile, the mean prediction vs the observed weak-positive rate.
        -- Mean prediction via an order-free quantized sum (floor(p*1e10
        -- + 0.5) summed as DECIMAL(38,0) — the Brier-score convention);
        -- both rates are single double divisions of exact integers.
        WITH c AS ({_SQL_QCOUNTS}),
        z AS (
            SELECT {_SQL_WL} AS wl,
                   1.0 / (1.0 + exp(-({_SQL_Z}))) AS p
            FROM c
        ),
        b AS (
            SELECT CAST(floor(p * 10.0) AS BIGINT) AS bin, wl,
                   CAST(floor(p * 1e10 + 0.5) AS BIGINT) AS pq
            FROM z
        )
        SELECT bin,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(wl) AS BIGINT) AS n_weak_pos,
               CAST(SUM(CAST(pq AS DECIMAL(38,0))) AS DOUBLE)
                   / (1e10 * COUNT(*)) AS mean_pred,
               CAST(SUM(wl) AS DOUBLE) / COUNT(*) AS frac_pos
        FROM b
        GROUP BY 1
    """,
    description=(
        "reliability diagram of the frozen quality filter: mean predicted "
        "probability vs observed weak-positive rate per decile bin"
    ),
    tags=("ml", "evaluation", "calibration", "deterministic"),
)
def quality_classifier_reliability_bins(spark, sf_dir):
    """The eval the deciles/PR/AUC/Brier suite still lacked: CALIBRATION.
    A filter whose scores are used as sampling weights or thresholds must
    mean what it says — bin predictions into deciles and compare the mean
    predicted probability with the observed positive rate. Mean-of-doubles
    is order-dependent, so the mean comes from the established quantized
    integer sum (floor(p*1e10 + 0.5) into DECIMAL(38,0) — exact under any
    partitioning; sigmoid outputs are transcendental, so the quantization
    is tie-safe)."""
    docs = load_table(spark, sf_dir, "documents")
    counted = quality_feature_counts(docs)
    p = quality_probability()
    b = counted.select(
        F.floor(p * 10.0).cast("bigint").alias("bin"),
        weak_label().alias("wl"),
        F.floor(p * F.lit(1e10) + F.lit(0.5))
        .cast("bigint")
        .alias("pq"),
    )
    return b.groupBy("bin").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("wl").cast("bigint").alias("n_weak_pos"),
        (
            F.sum(F.col("pq").cast("decimal(38,0)")).cast("double")
            / (F.lit(1e10) * F.count("*"))
        ).alias("mean_pred"),
        (F.sum("wl").cast("double") / F.count("*")).alias("frac_pos"),
    )


@register(
    "source_mix_kl_divergence",
    oracle="""
        -- how far is the corpus's source mix from the uniform target?
        -- per-source KL terms p*ln(p*S) (the mixture-rebalancing signal
        -- corpus_temperature_mix acts on), shares as single divisions,
        -- ln-domain doubles rounded at 6 (libm convention)
        WITH c AS (
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM documents
            GROUP BY 1
        ),
        t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total,
                     CAST(COUNT(*) AS BIGINT) AS s
              FROM c)
        SELECT source, n_docs,
               CAST(n_docs AS DOUBLE) / t.total AS share,
               ROUND((CAST(n_docs AS DOUBLE) / t.total)
                     * ln((CAST(n_docs AS DOUBLE) / t.total) * t.s),
                     6) AS kl_term
        FROM c CROSS JOIN t
        ORDER BY source
    """,
    description=(
        "corpus source-mix divergence: per-source share and KL term vs "
        "the uniform target mix"
    ),
    tags=("llm-data", "aggregate", "monitoring", "deterministic"),
)
def source_mix_kl_divergence(spark, sf_dir):
    """The drift number a curation pipeline watches between crawl
    snapshots: KL(observed source mix ‖ uniform). Per-source terms are
    returned (not just the scalar) because the ACTION is per-source —
    which source to up/down-weight — and the temperature-mix query
    consumes exactly these shares. One grouped count, one broadcast
    1-row total; shares are single divisions, the ln rounded at 6."""
    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs")
    )
    t = c.agg(
        F.sum("n_docs").cast("long").alias("total"),
        F.count("*").cast("long").alias("s"),
    )
    share = F.col("n_docs").cast("double") / F.col("total")
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "source",
            "n_docs",
            share.alias("share"),
            F.round(
                share * F.log(share * F.col("s").cast("double")), 6
            ).alias("kl_term"),
        )
        .orderBy("source")
    )


@register(
    "tx_table_delete_all_restore_counts",
    oracle="""
        -- DELETE-everything then RESTORE: the final snapshot equals the
        -- original table (the oracle), and the empty intermediate version
        -- must read back as a schema-stable EMPTY frame (its count rides
        -- along as a constant column — if the empty read raised, the
        -- query itself would fail)
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(0 AS BIGINT) AS n_at_empty_version
        FROM events
        WHERE event_type IS NOT NULL
        GROUP BY 1
    """,
    description=(
        "txlog DELETE removing every row leaves the table readable "
        "(empty snapshot of the committed schema); RESTORE recovers it"
    ),
    tags=("table-format", "deterministic"),
)
def tx_table_delete_all_restore_counts(spark, sf_dir):
    """The failure mode the empty-commit fix closed, as driver evidence:
    a DELETE WHERE that matches every row commits a version with NO data
    dirs — snapshot() must return an empty DataFrame of the committed
    schema (not an unreadable UNABLE_TO_INFER_SCHEMA error), and RESTORE
    must bring the full table back as a new audited commit. The final
    per-type counts equal the plain batch scan; the empty version's
    count (necessarily 0) is carried as a column so the read path is
    exercised inside the checked result."""
    from ..scratch import scratch_unique
    from ..sources.txlog import TxTable

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isNotNull())
        .select("event_id", "event_type", "value")
    )
    t = TxTable(spark, scratch_unique(spark, "txdelall"))
    v_data = t.append(ev)
    t.delete_range("event_id", 0, 1 << 62)  # removes every row
    n_empty = t.snapshot().count()  # readable, schema-stable, 0 rows
    t.restore(v_data)
    return (
        t.snapshot()
        .groupBy("event_type")
        .agg(F.count("*").cast("bigint").alias("n_events"))
        .withColumn(
            "n_at_empty_version", F.lit(n_empty).cast("bigint")
        )
    )
