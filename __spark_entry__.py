"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``nexus_event_stream_spark`` (see SURVEY.md §2.11
for the declared catalog); this module is a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import nexus_event_stream_spark.plans as _plans
from nexus_event_stream_spark.plans import catalog as _catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the reference system's essence end-to-end
    (SURVEY.md §7 M0): scan → LWW fold (window) → delete-evict filter →
    projection, i.e. the live materialized view of the event stream
    (data-plane/internal/projection/signal.go:38-67).
    """
    return _catalog.q_delete_semantics(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (see §2.11)."""
    return _catalog.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB twins of ``queries()``; keys missing here are rows-only."""
    return _catalog.oracle_sql()
