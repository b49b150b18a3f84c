"""Streaming projection: event stream → last-write-wins materialized view."""

from nexus_event_stream_spark.streaming.projection import (  # noqa: F401
    ParquetViewStore,
    start_projection,
)
