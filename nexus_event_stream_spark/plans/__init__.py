"""Declared query catalog (SURVEY.md §2.11) — Spark builders + SQL oracles."""

from nexus_event_stream_spark.plans.catalog import (  # noqa: F401
    CATALOG,
    QuerySpec,
    oracle_sql,
    queries,
)

# Importing registers the X-tier LLM-pipeline and extended-relational
# queries into CATALOG.
from nexus_event_stream_spark.plans import (  # noqa: E402,F401
    ext2_catalog,
    ext_catalog,
    llm_catalog,
)
