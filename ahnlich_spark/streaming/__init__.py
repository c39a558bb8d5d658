"""Structured Streaming operators.

The reference is strictly request/response (no watermarks, windows, or
state anywhere in its surface — SURVEY.md §2.5), so nothing here mirrors
it. These are the streaming faces of the batch training-data-pipeline
operators: the SAME transformation functions run under ``readStream``
with watermarks, which is the Spark-native way to keep one codebase for
backfill (batch over 100 TB of history) and ingest (the live tail)."""

from ahnlich_spark.streaming.pipeline import (
    EVENTS_SCHEMA,
    hourly_rollup,
    read_events_stream,
    rebucket_keyed_state,
    running_user_totals,
    session_rollup,
    streaming_exact_dedup,
    streaming_set_ingest,
)

__all__ = [
    "EVENTS_SCHEMA",
    "hourly_rollup",
    "read_events_stream",
    "rebucket_keyed_state",
    "running_user_totals",
    "session_rollup",
    "streaming_exact_dedup",
    "streaming_set_ingest",
]
