"""Declared query catalog (SURVEY.md §2.11) — Spark builders + SQL oracles."""

from nexus_event_stream_spark.plans.catalog import (  # noqa: F401
    CATALOG,
    QuerySpec,
    oracle_sql,
    queries,
)
