"""Registered queries — the engine's declared, oracle-checked surface.

Each query cites the reference operator(s) it re-expresses (SURVEY.md §2 ids,
file:line into /root/reference). Column aliases match the oracle SQL exactly:
the driver sorts columns by name before hashing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import dec_avg, dec_sum, sql_dec_avg, sql_dec_sum
from ..sources.catalog import load_table
from .registry import register

# ---------------------------------------------------------------------------
# Flagship: the dashboard's core query (A8 + A11 + T1/T2)
# reference: scripts/streamlit_dashboard.py:150-153 (5s tumbling buckets),
# :132-133 (mean confidence), re-expressed as a native event-time window agg
# instead of a driver-side pandas groupby over a ring buffer.
# ---------------------------------------------------------------------------


@register(
    "events_window_counts",
    oracle="""
        SELECT
            to_timestamp(floor(epoch(ts) / 5) * 5) AS bucket_start,
            event_type,
            COUNT(*) AS n_events,
            {avg_value}
        FROM events
        GROUP BY 1, 2
    """.format(avg_value=sql_dec_avg("value", "avg_value")),
    bench=True,
    description="5s tumbling-window counts + mean value per event_type (A8/A11)",
    tags=("window-agg", "streaming-analog"),
)
def events_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "5 seconds").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), dec_avg("value", "avg_value"))
        .select(
            F.col("w.start").alias("bucket_start"),
            "event_type",
            "n_events",
            "avg_value",
        )
    )


# ---------------------------------------------------------------------------
# Pricing summary — grouped multi-aggregate (A1/A2/A4/A5 analog on lineitem).
# reference: preprocess_cicids2017.py:89-95 (grouped counts), :279-280
# (mean/std fit) — here as one distributed single-pass agg, not N jobs.
# ---------------------------------------------------------------------------


@register(
    "pricing_summary",
    oracle="""
        SELECT
            l_returnflag,
            l_linestatus,
            {sum_qty},
            {sum_base_price},
            {avg_qty},
            {avg_price},
            {avg_disc},
            COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """.format(
        sum_qty=sql_dec_sum("l_quantity", "sum_qty"),
        sum_base_price=sql_dec_sum("l_extendedprice", "sum_base_price"),
        avg_qty=sql_dec_avg("l_quantity", "avg_qty"),
        avg_price=sql_dec_avg("l_extendedprice", "avg_price"),
        avg_disc=sql_dec_avg("l_discount", "avg_disc"),
    ),
    bench=True,
    description="TPC-H Q1-style grouped multi-aggregate (A1/A2/A4/A5)",
    tags=("aggregation",),
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity", "sum_qty"),
            dec_sum("l_extendedprice", "sum_base_price"),
            dec_avg("l_quantity", "avg_qty"),
            dec_avg("l_extendedprice", "avg_price"),
            dec_avg("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Top-k latest events (T1/T2): sort descending by time, head k.
# reference: streamlit_dashboard.py:93-101, 217-231.
# ---------------------------------------------------------------------------


@register(
    "latest_events_topk",
    oracle="""
        SELECT event_id, ts, user_id, event_type, value
        FROM events
        ORDER BY ts DESC, event_id DESC
        LIMIT 20
    """,
    description="top-k latest events by timestamp (T1/T2)",
    tags=("sort", "limit"),
)
def latest_events_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select("event_id", "ts", "user_id", "event_type", "value")
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .limit(20)
    )
