"""Reference-domain scalar functions (SURVEY.md §2.8) as column expressions.

Everything is a Catalyst expression (CASE WHEN / built-ins) — JVM-side,
codegen-able, no Python in the hot path. Each preserves the reference's
documented quirks exactly.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column
from pyspark.sql import functions as F

from nexus_event_stream_spark.schemas import PRIORITY_SCORES


def priority_display_to_score(
    col: Column | str, mapping: Mapping[str, int] = PRIORITY_SCORES
) -> Column:
    """Display string → numeric score; unknown → 0 (Go zero-value quirk,
    data-plane/internal/projection/signal.go:21-25,85).
    """
    c = F.col(col) if isinstance(col, str) else col
    expr = None
    for display, score in mapping.items():
        branch = F.when(c == F.lit(display), F.lit(score))
        expr = branch if expr is None else expr.when(c == F.lit(display), F.lit(score))
    return expr.otherwise(F.lit(0))


def priority_score_to_display(
    col: Column | str, mapping: Mapping[str, int] = PRIORITY_SCORES
) -> Column:
    """Numeric code → display string (control-plane/nexus/core/models.py:16-19,
    published at signals.py:51); unknown code → NULL.
    """
    c = F.col(col) if isinstance(col, str) else col
    expr = None
    for display, score in mapping.items():
        branch = F.when(c == F.lit(score), F.lit(display))
        expr = branch if expr is None else expr.when(c == F.lit(score), F.lit(display))
    return expr.otherwise(F.lit(None))


def rfc3339_to_unix(col: Column | str) -> Column:
    """Timestamp-string → unix seconds; unparseable → 0 (projection/
    signal.go:147-153 — the documented 0.0-fallback quirk).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(F.unix_timestamp(F.to_timestamp(c)), F.lit(0)).cast("bigint")


def truncate_ellipsis(col: Column | str, max_len: int = 40) -> Column:
    """CLI display truncation (data-plane/cmd/cli/main.go:165-170):
    strings longer than ``max_len`` become ``max_len - 1`` chars + '…'.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        F.length(c) > max_len,
        F.concat(F.substring(c, 1, max_len - 1), F.lit("…")),
    ).otherwise(c)
