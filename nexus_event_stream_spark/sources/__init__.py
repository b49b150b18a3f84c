"""Source connectors: Kafka (production) and file/memory (tests/dev)."""

from nexus_event_stream_spark.sources.streams import (  # noqa: F401
    file_event_stream,
    kafka_event_stream,
    parse_events,
)
