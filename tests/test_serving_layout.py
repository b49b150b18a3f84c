"""Streaming-projection → Z-ordered serving layout composition
(streaming/serving_layout.py): the write-optimized hash-bucketed store
feeds a periodic OPTIMIZE into the read-optimized clustered layout, and
the reference's two serving reads (top-50 newest, priority equality) run
through manifest pruning — fewer files touched than the raw store, with
results hash-identical to the live view."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from nexus_event_stream_spark.schemas import EVENT_SCHEMA
from nexus_event_stream_spark.streaming.projection import (
    BucketedViewStore,
    apply_batch_bucketed,
)
from nexus_event_stream_spark.streaming.serving_layout import (
    publish_serving_snapshot,
    serve_filter_priority,
    serve_list_newest,
)

TS = dt.datetime(2026, 2, 23, 15, 0, tzinfo=dt.timezone.utc)
PRIORITIES = ["Low", "Medium", "High"]


def _batch(spark, lo, n, minute0):
    rows = []
    for i in range(lo, lo + n):
        t = TS + dt.timedelta(minutes=minute0 + (i - lo))
        rows.append(
            (
                "updated",
                f"sig-{i:05d}",
                f"title-{i}",
                "content",
                PRIORITIES[i % 3],
                f"user-{i % 7}",
                t,
                t,
            )
        )
    return spark.createDataFrame(rows, EVENT_SCHEMA)


def _store_data_files(store_path):
    out = []
    for root, _dirs, files in os.walk(store_path):
        out += [
            os.path.join(root, f)
            for f in files
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        ]
    return out


@pytest.fixture(scope="module")
def published(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("serving")
    store = BucketedViewStore(str(base / "store"), n_buckets=16)
    # stream 4 epochs in (640 keys + 160 updates), then one delete epoch
    for e in range(4):
        apply_batch_bucketed(
            spark, store, _batch(spark, e * 200, 200, e * 300), e, "run"
        )
    deletes = spark.createDataFrame(
        [
            ("deleted", f"sig-{i:05d}", None, None, None, None, None,
             TS + dt.timedelta(days=2))
            for i in range(0, 100, 7)
        ],
        EVENT_SCHEMA,
    )
    apply_batch_bucketed(spark, store, deletes, 4, "run")
    path = str(base / "layout")
    rep = publish_serving_snapshot(spark, store, path, n_files=16)
    assert rep["published"] is True
    return store, path


def test_republish_unchanged_store_is_noop(spark, published):
    store, path = published
    rep = publish_serving_snapshot(spark, store, path, n_files=16)
    assert rep["published"] is False


def test_list_newest_prunes_and_matches_live_view(spark, published):
    store, path = published
    got, stats = serve_list_newest(spark, path, k=50)
    got_rows = [(r["id"], r["title"], r["created_at"]) for r in got.collect()]
    # oracle: the same top-50 straight off the live view
    live = store.read_live(spark)
    want_rows = [
        (r["id"], r["title"], r["created_at"])
        for r in live.orderBy(F.col("created_at").desc(), F.col("id"))
        .limit(50)
        .collect()
    ]
    assert got_rows == want_rows  # hash-identical, order included
    # the clustered layout serves the read from a file subset; the raw
    # hash-bucketed store scatters time across EVERY bucket file
    assert stats["files_read"] < stats["files_total"]
    assert stats["files_read"] < len(_store_data_files(store.path))
    # deleted keys never surface
    assert all(not r[0].endswith("-00000") or r[0] != "sig-00000" for r in got_rows)


def test_filter_priority_prunes_and_matches_live_view(spark, published):
    store, path = published
    live = store.read_live(spark)
    for p in PRIORITIES:
        got, stats = serve_filter_priority(spark, path, p)
        got_ids = sorted(r["id"] for r in got.collect())
        want_ids = sorted(
            r["id"] for r in live.filter(F.col("priority") == p).collect()
        )
        assert got_ids == want_ids, p
        assert stats["files_read"] < stats["files_total"], p
        assert stats["files_read"] < len(_store_data_files(store.path)), p
    # unknown display value → code 0 → empty (the preserved Go quirk)
    got, _ = serve_filter_priority(spark, path, "Critical")
    assert got.count() == 0


def test_topk_bound_is_sound_on_every_k(spark, published):
    from nexus_event_stream_spark.operators.clustering import topk_prune_bound

    store, path = published
    live = store.read_live(spark)
    n_live = live.count()
    for k in (1, 10, 200, n_live, n_live + 50):
        got, _ = serve_list_newest(spark, path, k=k)
        want = live.orderBy(F.col("created_at").desc(), F.col("id")).limit(k)
        assert [r["id"] for r in got.collect()] == [
            r["id"] for r in want.collect()
        ], k
    # beyond the table, the bound must admit everything (None → full scan)
    assert topk_prune_bound(path, "created_at", n_live * 2) is None


def test_streaming_scheduled_publish(spark, tmp_path):
    """The maintenance hook wired into start_projection: a bucketed
    projection stream publishes the serving layout every
    ``publish_every`` epochs inline — command log in, pruned reference
    reads out, no separate batch job."""
    import pytest

    from nexus_event_stream_spark.command import SignalCommands
    from nexus_event_stream_spark.sources.streams import (
        file_event_stream,
        parse_events,
    )
    from nexus_event_stream_spark.streaming.projection import (
        BucketedViewStore,
        start_projection,
    )

    log_dir = str(tmp_path / "log")
    cmds = SignalCommands(log_dir, author="otavio")
    ids = [
        cmds.create(f"sig {i}", f"content {i}", priority=(i % 3) + 1)
        for i in range(30)
    ]
    cmds.delete(ids[0])

    events = parse_events(file_event_stream(spark, log_dir))
    view_path = str(tmp_path / "view")
    serving_path = str(tmp_path / "serving")
    q = start_projection(
        spark,
        events,
        view_path,
        str(tmp_path / "ckpt"),
        bucketed=True,
        n_buckets=8,
        serving_path=serving_path,
        publish_every=1,  # file source → one epoch; publish on it
    )
    q.processAllAvailable()
    q.stop()

    store = BucketedViewStore(view_path, n_buckets=8)
    live = store.read_live(spark)
    got, stats = serve_list_newest(spark, serving_path, k=10)
    want = [
        r["id"]
        for r in live.orderBy(F.col("created_at").desc(), F.col("id"))
        .limit(10)
        .collect()
    ]
    assert [r["id"] for r in got.collect()] == want
    assert ids[0] not in {r["id"] for r in got.collect()}  # tombstone folded
    got_p, _ = serve_filter_priority(spark, serving_path, "High")
    assert sorted(r["id"] for r in got_p.collect()) == sorted(
        r["id"] for r in live.filter(F.col("priority") == "High").collect()
    )

    # serving_path without bucketed mode is a config error
    with pytest.raises(ValueError, match="bucketed"):
        start_projection(
            spark, events, view_path, str(tmp_path / "ckpt2"),
            serving_path=serving_path,
        )
