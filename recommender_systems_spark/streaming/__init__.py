"""Structured Streaming operators (engine extension — the reference is
batch-only, SURVEY §2.9; the ``events`` table invites the streaming
twin of the batch window aggregate)."""

from recommender_systems_spark.streaming.events import (  # noqa: F401
    EVENTS_SCHEMA,
    stream_window_agg,
)
