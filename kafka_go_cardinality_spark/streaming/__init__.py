"""Structured Streaming surface — the reference's native mode (SURVEY.md
§2.1 C1-C12, §2.3 E18-E19)."""

from kafka_go_cardinality_spark.streaming.ref_emulation import (
    interval_from,
    reference_flush_emulation,
)
from kafka_go_cardinality_spark.streaming.pipeline import (
    FIXED_DURATION,
    USER_MSG_SCHEMA,
    file_user_source,
    kafka_config,
    kafka_stats_sink,
    kafka_user_source,
    parse_user_events,
    replay_to_memory,
    session_activity,
    sliding_cardinality,
    stop_gracefully,
    stream_cardinality,
    stream_exact_cardinality,
    synthetic_wire_frame,
    to_stat_json,
)

__all__ = [
    "FIXED_DURATION",
    "USER_MSG_SCHEMA",
    "file_user_source",
    "interval_from",
    "kafka_config",
    "reference_flush_emulation",
    "kafka_stats_sink",
    "kafka_user_source",
    "parse_user_events",
    "replay_to_memory",
    "session_activity",
    "sliding_cardinality",
    "stop_gracefully",
    "stream_cardinality",
    "stream_exact_cardinality",
    "synthetic_wire_frame",
    "to_stat_json",
]
