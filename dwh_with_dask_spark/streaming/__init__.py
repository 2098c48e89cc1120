"""Structured Streaming surface (ABSENT-IN-REFERENCE; SURVEY.md §2B.9)."""

from dwh_with_dask_spark.streaming.events import (
    read_events_stream,
    session_counts,
    tumbling_counts,
)

__all__ = ["read_events_stream", "tumbling_counts", "session_counts"]
