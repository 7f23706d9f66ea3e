"""Declared event schemas — the pinned-schema surface for Kafka decode.

Mirrors the reference's explicit 65-field flow StructType
(/root/reference/scripts/stream_anomaly_detector.py:75-171) and its event
envelope (common_kafka/topics.py:25-107): identifier/timestamp fields stay
strings at ingest (the reference never parses the ISO timestamp in-stream,
SURVEY §1 Types), every numeric feature is a nullable double "for safety",
and the engine parses timestamps with ``to_timestamp`` downstream where
event-time semantics need them (F7/ST4).
"""

from __future__ import annotations

from pyspark.sql.types import DoubleType, StringType, StructField, StructType

#: the 66 flow feature columns (FIXTURES.md §1); the detector excludes the
#: two *_std stragglers from its 64-feature model input
#: (stream_anomaly_detector.py:231)
FLOW_FEATURES: tuple[str, ...] = (
    "flow_duration", "total_fwd_packets", "total_length_of_fwd_packets",
    "fwd_packet_length_max", "fwd_packet_length_min", "fwd_packet_length_mean",
    "fwd_packet_length_std", "bwd_packet_length_max", "bwd_packet_length_min",
    "bwd_packet_length_mean", "bwd_packet_length_std", "flow_bytes_s",
    "flow_packets_s", "flow_iat_mean", "flow_iat_std", "flow_iat_max",
    "flow_iat_min", "fwd_iat_total", "fwd_iat_mean", "fwd_iat_std",
    "fwd_iat_max", "fwd_iat_min", "bwd_iat_total", "bwd_iat_mean",
    "bwd_iat_std", "bwd_iat_max", "bwd_iat_min", "bwd_psh_flags",
    "bwd_urg_flags", "fwd_header_length", "bwd_header_length", "fwd_packets_s",
    "bwd_packets_s", "min_packet_length", "max_packet_length",
    "packet_length_mean", "packet_length_std", "packet_length_variance",
    "fin_flag_count", "syn_flag_count", "psh_flag_count", "ack_flag_count",
    "cwe_flag_count", "average_packet_size", "fwd_header_length_1",
    "fwd_avg_bytes_bulk", "fwd_avg_packets_bulk", "fwd_avg_bulk_rate",
    "bwd_avg_bytes_bulk", "bwd_avg_packets_bulk", "bwd_avg_bulk_rate",
    "subflow_fwd_packets", "subflow_fwd_bytes", "subflow_bwd_packets",
    "init_win_bytes_forward", "init_win_bytes_backward", "act_data_pkt_fwd",
    "min_seg_size_forward", "active_mean", "active_std", "active_max",
    "active_min", "idle_mean", "idle_std", "idle_max", "idle_min",
)

#: excluded from the 64-feature model input (stream_anomaly_detector.py:231)
EXCLUDED_FEATURES: tuple[str, ...] = ("active_std", "idle_std")

#: the model's declared 64-feature input, in order — feeds
#: ``ml.pipeline.align_features`` (M3)
MODEL_FEATURES: tuple[str, ...] = tuple(
    f for f in FLOW_FEATURES if f not in EXCLUDED_FEATURES
)


def flow_event_schema() -> StructType:
    """The full flow-event StructType for ``from_json`` decode (F1):
    envelope strings + nullable double features."""
    fields = [
        StructField("flow_id", StringType(), True),
        StructField("event_id", StringType(), True),
        StructField("event_type", StringType(), True),
        StructField("timestamp", StringType(), True),
    ]
    fields += [StructField(f, DoubleType(), True) for f in FLOW_FEATURES]
    fields.append(StructField("label", StringType(), True))
    return StructType(fields)


def flow_event_ddl() -> str:
    """Same schema as a DDL string (what the kafka decode helpers take)."""
    parts = [
        "flow_id string", "event_id string", "event_type string",
        "timestamp string",
    ]
    parts += [f"{f} double" for f in FLOW_FEATURES]
    parts.append("label string")
    return ", ".join(parts)
