"""Same-host A/B harnesses for bench-delta attribution.

Two modes, one warm JVM, interleaved A/B/A/B ordering (removes the
host-drift confound that plagues cross-run comparisons):

1. **Guard-cost mode** (default): is the ANSI zero-norm / empty-text
   ``when`` guard measurable wall time, or noise?  Runs the shipping
   (guarded) expressions against monkeypatched unguarded ones — safe on
   fixtures: no zero vectors / empty docs.  Post-r13 the brute-force ANN
   path calls ``cosine_from_norms`` (the hoisted form), NOT ``cosine``,
   so THAT is what gets patched — patching ``cosine`` would run identical
   code in both variants and report ~0% regardless (ADVICE r13 item 1).

2. **Plain A/B mode** (``--queries name1,name2``): no monkeypatch — just
   interleaved warm timings of the named registry queries, for settling
   "nominal regression or host noise" questions (VERDICT r13 item 6).
   With one variant the output is per-query medians + spread.
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


def _session() -> SparkSession:
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.ui.enabled", "false")
        .appName("ab_guard_cost")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def plain_ab(query_names: list[str]) -> None:
    """Interleaved warm timings of registry queries, no code variants —
    median + min/max spread per query on ONE host/JVM, the cheapest way
    to decide whether a cross-round bench delta was real."""
    from end_to_end_data_engineering_and_ml_system_spark.plans.registry import (
        all_queries,
    )

    spark = _session()
    qs = all_queries()
    for q in query_names:
        if q not in qs:
            raise SystemExit(f"unknown query: {q}")
    walls: dict[str, list[float]] = {q: [] for q in query_names}
    for q in query_names:  # warm: plan compile, file listing, page cache
        qs[q].build(spark, SF_DIR).count()
    for i in range(ROUNDS):
        order = query_names if i % 2 == 0 else list(reversed(query_names))
        for q in order:
            t0 = time.perf_counter()
            qs[q].build(spark, SF_DIR).count()
            walls[q].append(time.perf_counter() - t0)
    out = {
        q: {
            "median": round(statistics.median(w), 4),
            "min": round(min(w), 4),
            "max": round(max(w), 4),
            "spread_pct": round(100.0 * (max(w) - min(w)) / min(w), 1),
            "all": [round(x, 4) for x in w],
        }
        for q, w in walls.items()
    }
    print(json.dumps(out, indent=2))


def guard_cost() -> None:
    from end_to_end_data_engineering_and_ml_system_spark.operators import (
        similarity,
        text,
    )
    from end_to_end_data_engineering_and_ml_system_spark.plans.registry import (
        all_queries,
    )

    spark = _session()

    guarded_cfn = similarity.cosine_from_norms
    guarded_ratios = (
        text.punct_ratio,
        text.uppercase_ratio,
        text.stopword_ratio,
    )

    def unguarded_cfn(a, b, na, nb, exact=False):
        # the hoisted hot path minus its when-guard: one divide, no test
        dp = similarity.dot_product_exact if exact else similarity.dot_product
        return dp(a, b) / (F.sqrt(na) * F.sqrt(nb))

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
            similarity.cosine_from_norms = guarded_cfn
            (
                text.punct_ratio,
                text.uppercase_ratio,
                text.stopword_ratio,
            ) = guarded_ratios
        else:
            similarity.cosine_from_norms = unguarded_cfn
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
    if len(sys.argv) > 2 and sys.argv[1] == "--queries":
        plain_ab([q.strip() for q in sys.argv[2].split(",") if q.strip()])
    else:
        guard_cost()
