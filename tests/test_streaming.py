"""End-to-end streaming projection: file event stream → LWW parquet view.

Drives the same pipeline the Kafka path uses (source → tolerant parse →
foreachBatch merge), asserting the reference's delivery/idempotency
contracts (SURVEY.md §2.9): replay-safe, restart-safe via checkpoint,
malformed events dropped and acknowledged.
"""

from __future__ import annotations

import json
import os

import pytest

from nexus_event_stream_spark.operators.lww import latest_live_state
from nexus_event_stream_spark.sources.streams import file_event_stream, parse_events
from nexus_event_stream_spark.streaming.projection import (
    ParquetViewStore,
    start_projection,
)


def event(action, id_, seq, title="t"):
    e = {
        "action": action,
        "id": id_,
        "title": title,
        "content": "c",
        "priority": "High",
        "author": "otavio",
        "created_at": "2026-02-23T15:00:00-03:00",
        "updated_at": f"2026-02-23T15:{seq:02d}:00-03:00",
    }
    if action == "deleted":
        e = {"action": "deleted", "id": id_, "updated_at": e["updated_at"]}
    return json.dumps(e)


def write_batch(src_dir: str, name: str, lines: list[str]) -> None:
    tmp = os.path.join(src_dir, f".{name}.tmp")
    with open(tmp, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    os.replace(tmp, os.path.join(src_dir, f"{name}.json"))


@pytest.fixture()
def dirs(tmp_path):
    src = tmp_path / "events"
    src.mkdir()
    return str(src), str(tmp_path / "view"), str(tmp_path / "ckpt")


def run_stream(spark, src, view, ckpt):
    events = parse_events(file_event_stream(spark, src))
    q = start_projection(spark, events, view, ckpt)
    q.processAllAvailable()
    q.stop()


def view_rows(spark, view):
    df = ParquetViewStore(view).read_live(spark)
    return {} if df is None else {r["id"]: r.asDict() for r in df.collect()}


def test_stream_folds_events_into_view(spark, dirs):
    src, view, ckpt = dirs
    write_batch(src, "b0", [
        event("created", "s1", 1, "v1"),
        event("created", "s2", 1),
        event("updated", "s1", 2, "v2"),
    ])
    run_stream(spark, src, view, ckpt)
    got = view_rows(spark, view)
    assert set(got) == {"s1", "s2"}
    assert got["s1"]["title"] == "v2"


def test_delete_and_malformed_across_batches(spark, dirs):
    src, view, ckpt = dirs
    write_batch(src, "b0", [event("created", "s1", 1), event("created", "s2", 1)])
    write_batch(src, "b1", [
        "{not valid json}",            # dropped, not fatal (consumer.go:39-44)
        event("deleted", "s1", 2),
        event("created", "s3", 1),
        event("deleted", "ghost", 9),  # delete-nonexistent: silent no-op
    ])
    run_stream(spark, src, view, ckpt)
    assert set(view_rows(spark, view)) == {"s2", "s3"}


def test_restart_with_checkpoint_resumes_no_duplication(spark, dirs):
    src, view, ckpt = dirs
    write_batch(src, "b0", [event("created", "s1", 1, "v1")])
    run_stream(spark, src, view, ckpt)
    v0 = ParquetViewStore(view).current()["version"]

    # second run: same checkpoint, new events only
    write_batch(src, "b1", [event("updated", "s1", 2, "v2"), event("created", "s2", 1)])
    run_stream(spark, src, view, ckpt)
    got = view_rows(spark, view)
    assert got["s1"]["title"] == "v2" and set(got) == {"s1", "s2"}

    # third run with nothing new: view untouched (no spurious epochs applied)
    run_stream(spark, src, view, ckpt)
    assert set(view_rows(spark, view)) == {"s1", "s2"}
    assert ParquetViewStore(view).current()["version"] >= v0


def test_tombstone_compaction(spark, dirs):
    import datetime as dt

    from nexus_event_stream_spark.streaming.projection import compact_tombstones

    src, view, ckpt = dirs
    write_batch(src, "b0", [
        event("created", "s1", 1),
        event("created", "s2", 1),
        event("deleted", "s2", 2),   # old tombstone (2026-02-23)
    ])
    run_stream(spark, src, view, ckpt)
    store = ParquetViewStore(view)
    assert {r["id"] for r in store.read(spark).collect()} == {"s1", "s2"}

    # horizon after the tombstone's event time → tombstone collected
    compact_tombstones(spark, store, dt.datetime(2026, 3, 1))
    assert {r["id"] for r in store.read(spark).collect()} == {"s1"}
    # live view unchanged by compaction
    assert set(view_rows(spark, view)) == {"s1"}

    # horizon before event times → nothing collectable → no-op (no rewrite)
    write_batch(src, "b1", [event("deleted", "s1", 3)])
    run_stream(spark, src, view, ckpt)
    v_before = store.current()["version"]
    assert compact_tombstones(spark, store, dt.datetime(2026, 1, 1)) is None
    assert store.current()["version"] == v_before
    assert {r["id"] for r in store.read(spark).collect()} == {"s1"}


def test_stream_equals_batch_fold(spark, dirs):
    """Batch LWW over all history ≡ incremental streamed folds (SURVEY §7 M2)."""
    src, view, ckpt = dirs
    batches = [
        [event("created", "s1", 1, "a"), event("created", "s2", 1)],
        [event("updated", "s1", 3, "b"), event("deleted", "s2", 2)],
        [event("created", "s3", 1), event("updated", "s1", 2, "stale")],
    ]
    for i, b in enumerate(batches):
        write_batch(src, f"b{i}", b)
    run_stream(spark, src, view, ckpt)

    all_lines = [(line,) for b in batches for line in b]
    batch_df = parse_events(spark.createDataFrame(all_lines, "value string"))
    expected = latest_live_state(
        batch_df, key=["id"], ts_col="updated_at", tiebreak=["created_at", "title"]
    )
    want = {(r["id"], r["title"]) for r in expected.collect()}
    got = {(v["id"], v["title"]) for v in view_rows(spark, view).values()}
    assert got == want == {("s1", "b"), ("s3", "t")}
