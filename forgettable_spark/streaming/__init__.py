"""Structured Streaming forget-table: continuous increments → keyed
decaying state with TTL eviction."""

from forgettable_spark.streaming.forget_stream import (
    read_increment_stream,
    streaming_snapshot,
    streaming_forget_table,
    streaming_chunk_dedup,
    streaming_exact_dedup,
    streaming_simhash_dedup,
    windowed_event_counts,
)
from forgettable_spark.streaming.publish import (
    publish_batch,
    publish_stream_to_table,
)
from forgettable_spark.streaming.admit import (
    admit_batch,
    admission_stream,
)

__all__ = [
    "admit_batch",
    "admission_stream",
    "read_increment_stream",
    "streaming_snapshot",
    "streaming_forget_table",
    "streaming_chunk_dedup",
    "streaming_exact_dedup",
    "streaming_simhash_dedup",
    "windowed_event_counts",
    "publish_batch",
    "publish_stream_to_table",
]
