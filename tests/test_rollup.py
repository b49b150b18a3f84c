"""Continuous time-bucket rollup (streaming/rollup.py) vs one-shot batch.

Contracts pinned:
- streamed store ≡ one-shot batch aggregate over the same events (exact
  integer cents), through a real Structured Streaming file-source run
- late data re-merges a closed bucket (the capability plain append-mode
  windows lack) — final state identical to as-if-on-time
- replayed epochs NEVER double-count (strictly-monotone guard, across
  tokens/runs), incl. replay after an empty-batch epoch advance
- per-epoch writes touch only the time buckets in the batch (manifest
  locality, the 100 TB write-cost bound)
- hour→day coarsening from stored partials ≡ day rollup from raw events
  (mergeable-partials exactness — no raw re-scan)
- real-time view (stored ∪ un-applied tail) ≡ full batch aggregate
- both commit backends drive the same bytes
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nexus_event_stream_spark.io import load_table
from nexus_event_stream_spark.streaming.commit import (
    ConditionalPutBackend,
    PosixRenameBackend,
)
from nexus_event_stream_spark.streaming.rollup import (
    RollupStore,
    coarsen,
    finalize,
    start_rollup,
)

SF_DIR = "/root/testdata/sf0.001"


def batch_rollup(events, grain_trunc="hour"):
    """Driver-side oracle: one-shot exact-integer aggregate."""
    rows = (
        events.groupBy(
            F.date_trunc(grain_trunc, "ts").alias("bucket_ts"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias(
                "sum_cents"
            ),
            F.min(F.round(F.col("value") * 100, 0).cast("bigint")).alias(
                "min_cents"
            ),
            F.max(F.round(F.col("value") * 100, 0).cast("bigint")).alias(
                "max_cents"
            ),
        )
        .collect()
    )
    return {
        (r.bucket_ts, r.event_type): (
            r.n_events,
            r.sum_cents,
            r.min_cents,
            r.max_cents,
        )
        for r in rows
    }


def stored_rows(spark, store):
    df = store.read(spark)
    assert df is not None
    return {
        (r.bucket_ts, r.event_type): (
            r.n_events,
            r.sum_cents,
            r.min_cents,
            r.max_cents,
        )
        for r in df.collect()
    }


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF_DIR, "events").select(
        "ts", "event_type", "value"
    )


@pytest.mark.parametrize("backend_cls", [PosixRenameBackend, ConditionalPutBackend])
def test_epoch_applies_match_batch_oracle(spark, events, tmp_path, backend_cls):
    store = RollupStore(
        str(tmp_path / "rollup"), backend=backend_cls(), n_buckets=8
    )
    # three epochs split by event hash — arbitrary interleaving of buckets
    for epoch in range(3):
        store.apply_batch(
            spark,
            events.filter(F.pmod(F.xxhash64("ts", "value"), F.lit(3)) == epoch),
            epoch,
        )
    assert stored_rows(spark, store) == batch_rollup(events)


def test_late_data_remerges_closed_bucket(spark, events, tmp_path):
    store = RollupStore(str(tmp_path / "rollup"), n_buckets=8)
    hours = sorted(
        r[0] for r in events.select(F.date_trunc("hour", "ts")).distinct().collect()
    )
    first = hours[0]
    on_time = events.filter(F.date_trunc("hour", "ts") != F.lit(first))
    late = events.filter(F.date_trunc("hour", "ts") == F.lit(first))
    store.apply_batch(spark, on_time, 0)
    before = stored_rows(spark, store)
    assert not any(k[0] == first for k in before)
    store.apply_batch(spark, late, 1)  # last Tuesday arrives today
    assert stored_rows(spark, store) == batch_rollup(events)


def test_replay_never_double_counts(spark, events, tmp_path):
    store = RollupStore(str(tmp_path / "rollup"), n_buckets=8)
    half = events.filter(F.pmod(F.xxhash64("ts", "value"), F.lit(2)) == 0)
    rest = events.filter(F.pmod(F.xxhash64("ts", "value"), F.lit(2)) == 1)
    store.apply_batch(spark, half, 0)
    store.apply_batch(spark, rest, 1)
    want = stored_rows(spark, store)
    store.apply_batch(spark, rest, 1)  # same-run replay
    store.apply_batch(spark, half, 0)  # crash-replay from an older offset
    assert stored_rows(spark, store) == want
    # empty-batch epoch still advances the guard
    store.apply_batch(spark, events.limit(0), 2)
    assert store.current()["epoch"] == 2
    store.apply_batch(spark, rest, 2)  # replay landing after the advance
    assert stored_rows(spark, store) == want


def test_epoch_writes_touch_only_batch_buckets(spark, events, tmp_path):
    store = RollupStore(str(tmp_path / "rollup"), n_buckets=8)
    hours = sorted(
        r[0] for r in events.select(F.date_trunc("hour", "ts")).distinct().collect()
    )
    assert len(hours) >= 2
    store.apply_batch(
        spark, events.filter(F.date_trunc("hour", "ts") == F.lit(hours[0])), 0
    )
    manifest0 = dict(store.current()["manifest"])
    store.apply_batch(
        spark, events.filter(F.date_trunc("hour", "ts") == F.lit(hours[1])), 1
    )
    manifest1 = store.current()["manifest"]
    changed = {b for b in manifest1 if manifest1[b] != manifest0.get(b)}
    # hour[1] hashes to exactly one bucket — only that entry may move
    assert len(changed) == 1
    assert all(manifest1[b] == v for b, v in manifest0.items() if b not in changed)


def test_coarsen_exact_vs_raw_day_rollup(spark, events, tmp_path):
    store = RollupStore(str(tmp_path / "rollup"), n_buckets=8)
    store.apply_batch(spark, events, 0)
    got = {
        (r.bucket_ts, r.event_type): (r.n_events, r.sum_cents, r.min_cents, r.max_cents)
        for r in coarsen(store.read(spark), "1 day", ("event_type",)).collect()
    }
    assert got == batch_rollup(events, "day")


def test_realtime_view_merges_tail(spark, events, tmp_path):
    store = RollupStore(str(tmp_path / "rollup"), n_buckets=8)
    applied = events.filter(F.pmod(F.xxhash64("ts", "value"), F.lit(4)) != 0)
    tail = events.filter(F.pmod(F.xxhash64("ts", "value"), F.lit(4)) == 0)
    store.apply_batch(spark, applied, 0)
    got = {
        (r.bucket_ts, r.event_type): (r.n_events, round(r.sum_value, 2))
        for r in store.realtime(spark, tail).collect()
    }
    want = {
        k: (v[0], round(v[1] / 100.0, 2))
        for k, v in batch_rollup(events).items()
    }
    assert got == want
    # finalized avg sanity on one key
    fin = finalize(store.read(spark), ("event_type",)).collect()
    for r in fin:
        assert r.avg_value == pytest.approx(r.sum_value / r.n_events)


def test_structured_streaming_end_to_end(spark, events, tmp_path):
    """Real file-source streaming run, one file per micro-batch epoch."""
    src = tmp_path / "src"
    src.mkdir()
    for i in range(3):
        events.filter(
            F.pmod(F.xxhash64("ts", "value"), F.lit(3)) == i
        ).coalesce(1).write.parquet(str(src / f"slice={i}"))
    stream = spark.readStream.schema(events.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(str(src) + "/slice=*")
    store = RollupStore(str(tmp_path / "rollup"), n_buckets=8)
    q = start_rollup(spark, stream, store, str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()
    assert store.current()["epoch"] >= 1
    assert stored_rows(spark, store) == batch_rollup(events)
