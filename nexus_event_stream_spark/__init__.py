"""nexus_event_stream_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
the reference CQRS/event-streaming system ``oragazz0/nexus-event-stream``
(see SURVEY.md): keyed CDC-style event ingestion (created/updated/deleted),
a last-write-wins materialized view, and indexed serving queries — rebuilt
idiomatically on Spark (DataFrame/SQL/Catalyst/Structured Streaming) and
extended with large-scale LLM-data-pipeline operators (dedup, similarity
search, multimodal columns, text analysis).

Nothing here is a translation of the reference's Django/Go/Redis code; the
reference defines WHAT to compute, Spark decides HOW.
"""

__version__ = "0.1.0"

from nexus_event_stream_spark.session import get_spark  # noqa: F401
