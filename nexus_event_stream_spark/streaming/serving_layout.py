"""Read-optimized serving layout over the streaming projection.

The two flagship tiers composed (VERDICT r6): the ingest path owns the
write-optimized layout — ``BucketedViewStore`` buckets by KEY HASH so a
micro-batch rewrites only the buckets it touches — but the serving reads
the reference optimizes for (newest-first listings, priority equality:
``data-plane/internal/projection/signal.go:13-16,70-96`` ZSet indexes)
want the opposite: files clustered on (priority, created_at) so a read
touches O(selectivity) files. Hash buckets scatter every priority and
every time range across ALL buckets — a top-50-newest against the raw
store reads every bucket file.

This module is the OPTIMIZE step between them:

- :func:`publish_serving_snapshot` re-clusters the store's LIVE view
  (tombstones already folded out) into a Z-ordered layout on
  ``(priority_code, created_at)`` with a skipping manifest — the same
  periodic-maintenance shape as Delta ``OPTIMIZE ZORDER``. The view is
  keyed state, bounded by |live keys| (≪ the event log), so a full
  re-cluster per maintenance window is the honest cost — incremental
  upsert into a sorted layout would re-create the LWW merge problem the
  bucketed store already solves on the write side. The published store
  version rides along; re-publishing an unchanged store is a no-op.
- :func:`serve_filter_priority` / :func:`serve_list_newest` are the two
  reference reads through :func:`pruned_read` — file-count-bounded by
  the manifest, residual predicate always re-applied (sound by
  construction). The newest-first read derives a SOUND top-k time bound
  from the manifest alone (:func:`topk_prune_bound`): ≥k non-null rows
  provably sit at or above the bound, so files entirely below it cannot
  hold a top-k row — the lake-scale replacement for the reference's
  ``ZRANGE 0 49`` (core/views.py top-50 cap).

Freshness contract: reads serve the last published snapshot — the same
eventual-consistency the reference's Redis view already has; cadence is
the caller's maintenance schedule. Locally the publish is an in-place
overwrite; a production deployment versions the snapshot directory
through the pointer backends (streaming/commit.py) like every other
store, so readers never observe a half-published layout.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nexus_event_stream_spark.functions.domain import priority_display_to_score
from nexus_event_stream_spark.operators.clustering import (
    pruned_read,
    topk_prune_bound,
    zorder_write,
)
from nexus_event_stream_spark.schemas import PRIORITY_SCORES
from nexus_event_stream_spark.streaming.projection import BucketedViewStore

_SOURCE_MARKER = "_source_version.json"  # "_" prefix: invisible to data scans

#: The serving clustering dimensions: priority equality + time range are
#: the reference's two indexed access paths (signal.go ZSets).
SERVING_COLS = ("priority_code", "created_at")


def publish_serving_snapshot(
    spark: SparkSession,
    store: BucketedViewStore,
    path: str,
    n_files: int = 32,
) -> dict:
    """Re-cluster the store's live view into the serving layout.

    Returns ``{"published": bool, "store_version": int, "n_files": int}``;
    ``published=False`` means the store hasn't advanced since the last
    publish (the no-op fast path a scheduled compactor needs)."""
    cur = store.current()
    if cur is None:
        raise ValueError("store has no committed state to publish")
    marker_path = os.path.join(path, _SOURCE_MARKER)
    try:
        with open(marker_path) as fh:
            if json.load(fh)["store_version"] == cur["version"]:
                return {
                    "published": False,
                    "store_version": cur["version"],
                    "n_files": n_files,
                }
    except (OSError, json.JSONDecodeError, KeyError):
        pass
    live = store.read_live(spark)
    if live is None:
        raise ValueError("store live view is empty")
    serving = live.withColumn(
        "priority_code", priority_display_to_score("priority")
    )
    zorder_write(serving, path, list(SERVING_COLS), n_files=n_files)
    tmp = marker_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"store_version": cur["version"]}, fh)
    os.replace(tmp, marker_path)
    return {
        "published": True,
        "store_version": cur["version"],
        "n_files": n_files,
    }


def serve_filter_priority(
    spark: SparkSession, path: str, priority: str
) -> tuple[DataFrame, dict]:
    """Equality read on the display priority through the manifest —
    touches only files whose priority_code range covers the code.
    Unknown display values encode 0 (the Go zero-value quirk the whole
    engine preserves) and return empty against the 1..3 coded layout."""
    code = PRIORITY_SCORES.get(priority, 0)
    df, stats = pruned_read(
        spark, path, {"priority_code": (float(code), float(code))}
    )
    return df.drop("priority_code"), stats


def serve_list_newest(
    spark: SparkSession, path: str, k: int = 50
) -> tuple[DataFrame, dict]:
    """Top-``k`` newest through the manifest: derive the sound time bound
    (≥k rows provably at/above it), read only files whose created_at
    range reaches it, then order + limit. Ties at the bound are included
    in the scan, so the result equals the full-scan top-k exactly."""
    bound = topk_prune_bound(path, "created_at", k)
    preds = {"created_at": (bound, None)} if bound is not None else {}
    if preds:
        df, stats = pruned_read(spark, path, preds)
    else:
        df = spark.read.parquet(path)
        n = len([f for f in os.listdir(path) if f.endswith(".parquet")])
        stats = {"files_total": n, "files_read": n}
    return (
        df.drop("priority_code")
        .orderBy(F.col("created_at").desc(), F.col("id"))
        .limit(k),
        stats,
    )
