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
    its own latest-per-key, full-outer-join it against the view on the key,
    and pick the LWW winner per key by lexicographic (ts, *tiebreak)
    comparison. Touches only |view| + |batch| rows — one shuffle on the key
    — yet is provably equivalent to re-folding all history (property-tested
    in tests/test_properties.py), so cross-batch out-of-order arrival is
    harmless, not just within-batch.

    Winner rules per key:
    - key only in view  → view row survives;
    - key only in batch → batch row applies (upsert) unless it's a delete
      (delete of a never-seen key: silent no-op, signal_test.go:116-130);
    - both → greater (ts, tiebreak) wins; a batch event with a NULL
      timestamp wins unconditionally (the reference's 2-key delete envelope
      carries no timestamps and applies on arrival — signals.py:83-88);
    - if the winner is a delete, the key is evicted.

    At-least-once replay is harmless: a replayed event compares equal and
    produces the same row (consumer.go:46-51 semantics, made structural).
    """
    batch_latest = latest_state(batch, key=key, ts_col=ts_col, tiebreak=tiebreak)
    keys = list(key)
    view_cols = view.columns  # VIEW_SCHEMA order, no action column

    v = view.alias("v")
    b = batch_latest.alias("b")
    joined = v.join(b, on=[F.col(f"v.{k}").eqNullSafe(F.col(f"b.{k}")) for k in keys], how="full_outer")

    order_cols = [ts_col, *tiebreak]
    b_ord = F.struct(*[F.col(f"b.{c}") for c in order_cols])
    v_ord = F.struct(*[F.col(f"v.{c}") for c in order_cols])
    b_present = F.col(f"b.{keys[0]}").isNotNull()
    v_present = F.col(f"v.{keys[0]}").isNotNull()
    batch_wins = b_present & (
        ~v_present | F.col(f"b.{ts_col}").isNull() | (b_ord >= v_ord)
    )

    merged = joined.select(
        batch_wins.alias("__bw"),
        F.when(batch_wins, F.col(f"b.{action_col}")).alias("__action"),
        *[
            F.when(batch_wins, F.col(f"b.{c}")).otherwise(F.col(f"v.{c}")).alias(c)
            for c in view_cols
        ],
    )
    live = merged.filter(
        (~F.col("__bw")) | (F.col("__action") != F.lit(delete_marker))
    )
    return live.select(*view_cols)
