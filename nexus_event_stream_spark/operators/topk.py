"""Sorted serving reads: newest-first top-k and pagination.

The reference serves these from Redis sorted-set indexes (ZRANGE REV over
``signals:by_created_at``, hardcoded range 0-49 — data-plane/internal/
projection/signal.go:70-81, handler/signal.go:45). In Spark the same query
is ``orderBy(desc).limit(k)``, which Catalyst plans as
``TakeOrderedAndProject`` — a per-partition top-k followed by a k-row merge
on the driver. No global sort, no index structure to maintain: at 100 TB
each task keeps only k rows in a heap.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def newest_first(
    df: DataFrame,
    ts_col: str = "created_at",
    tiebreak: Sequence[str] = (),
    limit: int = 50,
) -> DataFrame:
    """Top-``limit`` newest rows (handler/signal.go:45's ZRANGE 0 49).

    Ties broken by ``tiebreak`` desc — the ZSet analogue is member-lexical
    ordering within equal scores; here a unique key keeps it deterministic.
    """
    order = [F.col(ts_col).desc()] + [F.col(c).desc() for c in tiebreak]
    return df.orderBy(*order).limit(limit)


def paginate(
    df: DataFrame,
    order_by: Sequence[str],
    page: int,
    page_size: int = 10,
    descending: bool = True,
) -> DataFrame:
    """Page ``page`` (1-based) of ``page_size`` rows — DRF
    PageNumberPagination semantics (control-plane/nexus/settings.py:61-64).

    Implemented as ``orderBy + offset + limit``, which Catalyst collapses
    into a single ``TakeOrderedAndProject(limit=page*page_size,
    offset=(page-1)*page_size)``: every task keeps only a ``page*page_size``
    row heap and the driver merges — no global sort, no single-partition
    window. OFFSET pagination is still inherently a scan of the first
    ``page*page_size`` ranks; for deep pages at scale, keyset pagination
    (filter on the last-seen sort key) is the right call.
    """
    cols = [F.col(c).desc() if descending else F.col(c).asc() for c in order_by]
    lo = (page - 1) * page_size + 1
    hi = page * page_size
    return df.orderBy(*cols).offset(lo - 1).limit(hi - lo + 1)
