"""Structured Streaming extensions (the reference is batch-only — SURVEY.md
§2.8); the events table doubles as a replayable stream."""

from data_pipeline_ine_spark.streaming.events import (
    read_event_stream,
    sessionize,
    tumbling_counts,
)

__all__ = ["read_event_stream", "tumbling_counts", "sessionize"]
