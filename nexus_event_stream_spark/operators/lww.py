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
from functools import lru_cache

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _latest_window(key: Sequence[str], ts_col: str, tiebreak: Sequence[str]):
    # NULLS FIRST under desc: an event without a timestamp ranks as the
    # latest. The reference's 2-key delete envelope carries no timestamps
    # (tests.py:134-139) and applies on arrival — within a micro-batch
    # "arrival" degrades to "wins the fold", consistent with the
    # null-ts-wins rule in lww_merge_batch. Timestamped events (all of the
    # driver catalog) are unaffected.
    order: list[Column] = [F.col(ts_col).desc_nulls_first()]
    order += [F.col(c).desc_nulls_first() for c in tiebreak]
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
    return live_view(latest, action_col=action_col, delete_marker=delete_marker)


def live_view(
    state: DataFrame,
    action_col: str = "action",
    delete_marker: str = "deleted",
) -> DataFrame:
    """Serving projection of a state table: tombstones out, action dropped
    (domain/signal.go:34-44 — the stored hash has no action field)."""
    return state.filter(
        F.col(action_col).isNull() | (F.col(action_col) != F.lit(delete_marker))
    ).drop(action_col)


def lww_merge_batch(
    state: DataFrame,
    batch: DataFrame,
    key: Sequence[str] = ("id",),
    ts_col: str = "updated_at",
    tiebreak: Sequence[str] = (),
    action_col: str = "action",
) -> DataFrame:
    """Merge a micro-batch of events into the keyed STATE table (MERGE
    emulation). The state keeps one row per key *including delete
    tombstones* — without them, a delete followed (in arrival order) by an
    older out-of-order create would resurrect the entity; with them the
    merge is provably equivalent to re-folding all history for any batch
    split (property-tested in tests/test_properties.py). Serving reads go
    through ``live_view``.

    Mechanics: reduce the batch to its latest-per-key, full-outer-join
    against the state, pick the per-key winner by lexicographic
    (ts, *tiebreak) comparison — one shuffle over |state| + |batch| rows.
    A batch event with a NULL timestamp wins unconditionally (the 2-key
    delete envelope carries none and applies on arrival, signals.py:83-88).
    At-least-once replay is harmless: a replayed event compares equal and
    yields the same row (consumer.go:46-51 semantics, made structural).

    Tombstone GC at scale: tombstones only matter within the maximum
    out-of-order horizon (the streaming watermark); a periodic compaction
    can drop tombstones older than that horizon, bounding state size.
    """
    batch_latest = latest_state(batch, key=key, ts_col=ts_col, tiebreak=tiebreak)

    # Explicit presence flags: key columns can themselves be NULL (the join
    # uses eqNullSafe), so presence must not be inferred from them.
    v = state.withColumn("__vp", F.lit(True)).alias("v")
    b = batch_latest.withColumn("__bp", F.lit(True)).alias("b")
    join_cond, out_cols = _merge_exprs(
        tuple(state.columns), tuple(key), ts_col, tuple(tiebreak)
    )
    return v.join(b, on=list(join_cond), how="full_outer").select(*out_cols)


@lru_cache(maxsize=64)
def _merge_exprs(
    state_cols: tuple[str, ...],
    key: tuple[str, ...],
    ts_col: str,
    tiebreak: tuple[str, ...],
) -> tuple[tuple[Column, ...], tuple[Column, ...]]:
    """The join condition + winner projection of ``lww_merge_batch``.

    Every expression here references columns only through the ``v``/``b``
    dataset aliases, so the Column objects are independent of any concrete
    DataFrame and safely reusable across epochs. Memoized because building
    this tree costs ~0.35 s of py4j round-trips per call — per MICRO-BATCH
    on the streaming path — while the cached tuple is free.
    """
    join_cond = tuple(
        F.col(f"v.{k}").eqNullSafe(F.col(f"b.{k}")) for k in key
    )
    order_cols = [ts_col, *tiebreak]

    def _ord(prefix: str) -> Column:
        # The fold orders desc_nulls_first — a NULL field ranks ABOVE any
        # value — but bare struct comparison ranks NULL smallest, so a null
        # tiebreak (tolerant reader can null created_at/title) would flip
        # the winner between incremental merge and full re-fold. Encode
        # NULL-ness as a leading boolean: (true, NULL) > (false, x), and
        # two NULLs tie on the flag.
        return F.struct(
            *[
                F.struct(
                    F.col(f"{prefix}.{c}").isNull().alias("n"),
                    F.col(f"{prefix}.{c}").alias("v"),
                ).alias(c)
                for c in order_cols
            ]
        )

    b_ord = _ord("b")
    v_ord = _ord("v")
    b_present = F.col("b.__bp").isNotNull()
    v_present = F.col("v.__vp").isNotNull()
    b_ts = F.col(f"b.{ts_col}")
    v_ts = F.col(f"v.{ts_col}")
    # Null-ts events rank ABOVE any timestamp (the fold's desc_nulls_first):
    # a null-ts batch event always wins, but a null-ts state row (a 2-key
    # delete tombstone) also beats any timestamped batch event — otherwise
    # at-least-once redelivery after a delete would resurrect the entity.
    batch_wins = b_present & (
        ~v_present | b_ts.isNull() | (v_ts.isNotNull() & (b_ord >= v_ord))
    )
    out_cols = tuple(
        F.when(batch_wins, F.col(f"b.{c}")).otherwise(F.col(f"v.{c}")).alias(c)
        for c in state_cols
    )
    return join_cond, out_cols
