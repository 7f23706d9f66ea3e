"""Same-host A/B: do the r12 ANSI guards cost wall time, or was the bench
delta host noise?  (VERDICT r12 item 4.)

Two queries regressed in the driver bench coincident with gaining guards:

- ``embedding_ann_bruteforce`` (+27%): ``similarity.cosine`` gained a
  zero-norm ``when`` guard;
- ``corpus_pipeline_summary`` (+23%): the text quality ratios gained
  empty-text ``when`` guards.

This script runs both queries at sf0.1 on one warm session, interleaving
the GUARDED (shipping) and UNGUARDED (pre-r12 expression, monkeypatched —
safe on fixtures: no zero vectors / empty docs) variants A/B/A/B..., and
prints per-variant walls + medians.  Interleaving on one JVM removes the
host-drift confound the closing r12 runs showed.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
ROUNDS = int(os.environ.get("AB_ROUNDS", "6"))


def main() -> None:
    from end_to_end_data_engineering_and_ml_system_spark.operators import (
        similarity,
        text,
    )
    from end_to_end_data_engineering_and_ml_system_spark.plans.registry import (
        all_queries,
    )

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.ui.enabled", "false")
        .appName("ab_guard_cost")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    guarded_cosine = similarity.cosine
    guarded_ratios = (
        text.punct_ratio,
        text.uppercase_ratio,
        text.stopword_ratio,
    )

    def unguarded_cosine(a, b):
        return similarity.dot_product(a, b) / (
            F.sqrt(similarity.sq_norm(a)) * F.sqrt(similarity.sq_norm(b))
        )

    def unguarded_punct(col):
        c = F.col(col) if isinstance(col, str) else col
        kept = F.length(F.regexp_replace(c, r"[^.!?,;:]", ""))
        return kept.cast("double") / F.length(c)

    def unguarded_upper(col):
        c = F.col(col) if isinstance(col, str) else col
        return F.length(F.regexp_replace(c, r"[^A-Z]", "")).cast(
            "double"
        ) / F.length(c)

    def unguarded_stop(col, stopwords=text.STOPWORDS_EN):
        toks = text.tokens(col)
        sw = F.array(*[F.lit(s) for s in stopwords])
        n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
        return n_stop.cast("double") / F.size(toks)

    def set_variant(v: str) -> None:
        if v == "guarded":
            similarity.cosine = guarded_cosine
            (
                text.punct_ratio,
                text.uppercase_ratio,
                text.stopword_ratio,
            ) = guarded_ratios
        else:
            similarity.cosine = unguarded_cosine
            text.punct_ratio = unguarded_punct
            text.uppercase_ratio = unguarded_upper
            text.stopword_ratio = unguarded_stop

    qs = all_queries()
    targets = ["embedding_ann_bruteforce", "corpus_pipeline_summary"]
    walls: dict[str, dict[str, list[float]]] = {
        q: {"guarded": [], "unguarded": []} for q in targets
    }
    # warm both variants once (plan compilation, file listing, page cache)
    for v in ("guarded", "unguarded"):
        set_variant(v)
        for q in targets:
            qs[q].build(spark, SF_DIR).count()
    for i in range(ROUNDS):
        for v in ("guarded", "unguarded") if i % 2 == 0 else (
            "unguarded",
            "guarded",
        ):
            set_variant(v)
            for q in targets:
                t0 = time.perf_counter()
                qs[q].build(spark, SF_DIR).count()
                walls[q][v].append(time.perf_counter() - t0)
    set_variant("guarded")
    out = {}
    for q in targets:
        g, u = walls[q]["guarded"], walls[q]["unguarded"]
        out[q] = {
            "guarded_median": round(statistics.median(g), 4),
            "unguarded_median": round(statistics.median(u), 4),
            "guarded_all": [round(x, 4) for x in g],
            "unguarded_all": [round(x, 4) for x in u],
            "guard_cost_pct": round(
                100.0
                * (statistics.median(g) - statistics.median(u))
                / statistics.median(u),
                1,
            ),
        }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
