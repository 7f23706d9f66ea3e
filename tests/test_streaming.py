"""Streaming semantics: batch-equivalence replay + foreachBatch routing."""

from __future__ import annotations

from pyspark.sql import functions as F

from end_to_end_data_engineering_and_ml_system_spark.sources.catalog import load_table
from end_to_end_data_engineering_and_ml_system_spark.streaming.pipeline import (
    dedup_within_watermark,
    events_stream,
    run_routed_foreach_batch,
    run_to_memory_sink,
)


def test_stream_dedup_keeps_unique_keys(spark, sf_dir):
    # event_id is unique -> watermarked dedup must keep every row
    out = run_to_memory_sink(
        dedup_within_watermark(events_stream(spark, sf_dir)).select("event_id"),
        output_mode="append",
    )
    total = load_table(spark, sf_dir, "events").count()
    assert out.count() == total
    assert out.distinct().count() == total


def test_foreach_batch_routing_partitions_stream(spark, sf_dir):
    def score(batch_df):
        return batch_df.withColumn(
            "prediction",
            F.when(F.col("value") > 400, "anomaly").otherwise("normal"),
        )

    normal, anomaly = run_routed_foreach_batch(events_stream(spark, sf_dir), score)
    assert len(normal) >= 2  # multi-file staging -> multiple micro-batches
    total = load_table(spark, sf_dir, "events").count()
    assert sum(normal) + sum(anomaly) == total
    expected_anomaly = (
        load_table(spark, sf_dir, "events").filter(F.col("value") > 400).count()
    )
    assert sum(anomaly) == expected_anomaly
