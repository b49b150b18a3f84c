"""Declared query catalog (SURVEY.md §2.11) — Spark builders + SQL oracles."""

from nexus_event_stream_spark.plans.catalog import (  # noqa: F401
    CATALOG,
    QuerySpec,
    oracle_sql,
    queries,
)

# Importing registers the X-tier queries into CATALOG. Order matters for
# the driver's CORRECTNESS gate, which checks at most the first 50
# registered queries: the LLM-pipeline catalog (the north-star mandate)
# registers immediately after the R-tier catalog, ahead of the relational
# breadth waves. The whole catalog is kept ≤ 50 entries (breadth queries
# are consolidated suites — see SURVEY.md §2.11) so every registered
# query gets a driver correctness row every round.
from nexus_event_stream_spark.plans import llm_catalog  # noqa: E402,F401
from nexus_event_stream_spark.plans import ext_catalog  # noqa: E402,F401
from nexus_event_stream_spark.plans import ext2_catalog  # noqa: E402,F401
