"""Structured Streaming forget-table: continuous increments → keyed
decaying state with TTL eviction."""

from forgettable_spark.streaming.forget_stream import (
    read_increment_stream,
    streaming_snapshot,
    streaming_forget_table,
    streaming_exact_dedup,
    windowed_event_counts,
)

__all__ = [
    "read_increment_stream",
    "streaming_snapshot",
    "streaming_forget_table",
    "streaming_exact_dedup",
    "windowed_event_counts",
]
