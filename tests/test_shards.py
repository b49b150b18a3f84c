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
