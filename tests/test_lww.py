"""LWW projection behavior — mirrors the reference's projection tests
(data-plane/internal/projection/signal_test.go, SURVEY.md §5 / FIXTURES.md):
create/update/delete apply, idempotent replay, delete-nonexistent no-op.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from nexus_event_stream_spark.operators.lww import (
    latest_live_state,
    latest_state,
    live_view,
    lww_merge_batch,
)
from nexus_event_stream_spark.schemas import EVENT_SCHEMA, VIEW_SCHEMA

UTC = dt.timezone.utc


def ev(action, id_, seq, title="Server Alert", **kw):
    """Event row; seq doubles as a monotonically-increasing updated_at."""
    base = dict(
        action=action,
        id=id_,
        title=title,
        content=kw.get("content", "CPU at 95%"),
        priority=kw.get("priority", "High"),
        author=kw.get("author", "otavio"),
        created_at=kw.get("created_at", dt.datetime(2026, 2, 23, 18, 0, tzinfo=UTC)),
        updated_at=dt.datetime(2026, 2, 23, 18, 0, seq, tzinfo=UTC),
    )
    return tuple(base[f.name] for f in EVENT_SCHEMA.fields)


def make_events(spark, rows):
    return spark.createDataFrame(rows, EVENT_SCHEMA)


def test_create_then_update_keeps_latest(spark):
    df = make_events(
        spark,
        [
            ev("created", "signal-1", 0, title="v1"),
            ev("updated", "signal-1", 1, title="v2"),
        ],
    )
    out = latest_live_state(df).collect()
    assert len(out) == 1
    assert out[0]["title"] == "v2"
    assert "action" not in latest_live_state(df).columns  # domain/signal.go:34-44


def test_delete_evicts_key(spark):
    df = make_events(
        spark,
        [
            ev("created", "signal-1", 0),
            ev("created", "signal-2", 0),
            ev("deleted", "signal-1", 1),
        ],
    )
    out = latest_live_state(df).collect()
    assert [r["id"] for r in out] == ["signal-2"]


def test_delete_nonexistent_is_noop(spark):
    # projection/signal_test.go:116-130 — evict of unknown id: no error,
    # no effect on other keys.
    df = make_events(
        spark,
        [ev("created", "signal-2", 0), ev("deleted", "ghost", 1)],
    )
    out = latest_live_state(df).collect()
    assert [r["id"] for r in out] == ["signal-2"]


def test_duplicate_replay_idempotent(spark):
    # projection/signal_test.go:132-151 — applying the same event twice
    # leaves exactly one row (at-least-once delivery tolerance).
    rows = [ev("created", "signal-1", 0)]
    df = make_events(spark, rows + rows)
    assert latest_live_state(df).count() == 1


def test_out_of_order_replay_converges(spark):
    # LWW on (updated_at, tiebreak) makes the fold order-insensitive —
    # the reference needs single-partition ordering instead (README fix).
    a = ev("created", "signal-1", 0, title="old")
    b = ev("updated", "signal-1", 5, title="new")
    for order in ([a, b], [b, a]):
        out = latest_live_state(make_events(spark, order)).collect()
        assert out[0]["title"] == "new"


def test_latest_state_tiebreak_deterministic(spark):
    # Equal timestamps → unique tiebreak column decides, both directions.
    rows = [
        ("created", "k", "t1", "c", "Low", "a", None, dt.datetime(2026, 1, 1)),
        ("updated", "k", "t2", "c", "Low", "a", None, dt.datetime(2026, 1, 1)),
    ]
    df = spark.createDataFrame(rows, EVENT_SCHEMA)
    out = latest_state(df, key=["id"], ts_col="updated_at", tiebreak=["title"])
    assert out.collect()[0]["title"] == "t2"


def test_incremental_merge_equals_full_fold(spark):
    """foreachBatch merge path ≡ re-folding all history (SURVEY.md §3.2).
    The state table keeps tombstones; the live view filters them."""
    history = [
        ev("created", "s1", 0, title="s1v1"),
        ev("created", "s2", 1),
        ev("updated", "s1", 2, title="s1v2"),
    ]
    batch = [
        ev("deleted", "s2", 3),
        ev("updated", "s1", 4, title="s1v3"),
        ev("created", "s3", 5),
    ]
    state = latest_state(make_events(spark, history), key=["id"])
    merged = lww_merge_batch(state, make_events(spark, batch))
    live = live_view(merged)
    full = latest_live_state(make_events(spark, history + batch))
    assert sorted(live.columns) == sorted([f.name for f in VIEW_SCHEMA.fields])
    # tombstone retained in state, absent from the live view
    assert {r["id"] for r in merged.collect()} == {"s1", "s2", "s3"}
    got = {(r["id"], r["title"]) for r in live.collect()}
    want = {(r["id"], r["title"]) for r in full.collect()}
    assert got == want == {("s1", "s1v3"), ("s3", "Server Alert")}
