"""Pointer-commit backends (streaming/commit.py): the CAS contract that
makes snapshot commits safe where rename is not atomic (object stores).

No SparkSession needed — the backends are pure pointer-file protocols;
their integration with the stores is pinned by the parametrized fixtures
in tests/test_bucketed_store.py and tests/test_streaming_dedup.py.
"""

from __future__ import annotations

import os

import pytest

from nexus_event_stream_spark.streaming.commit import (
    CommitConflictError,
    ConditionalPutBackend,
    PosixRenameBackend,
)


@pytest.mark.parametrize("backend_cls", [PosixRenameBackend, ConditionalPutBackend])
def test_read_commit_roundtrip(tmp_path, backend_cls):
    b = backend_cls()
    ptr = str(tmp_path / "_CURRENT")
    assert b.read(ptr) is None
    b.commit(ptr, {"version": 0, "epoch": 0}, expected=None)
    assert b.read(ptr) == {"version": 0, "epoch": 0}
    b.commit(ptr, {"version": 1, "epoch": 1}, expected={"version": 0, "epoch": 0})
    assert b.read(ptr) == {"version": 1, "epoch": 1}


def test_conditional_put_rejects_stale_expected(tmp_path):
    """The lost-update anomaly surfaces as CommitConflictError: writer B
    read version 0, writer A committed version 1 meanwhile — B's commit
    must be rejected and the pointer left at A's value."""
    b = ConditionalPutBackend()
    ptr = str(tmp_path / "_CURRENT")
    b.commit(ptr, {"version": 0}, expected=None)
    stale = b.read(ptr)
    b.commit(ptr, {"version": 1}, expected=stale)  # writer A wins
    with pytest.raises(CommitConflictError):
        b.commit(ptr, {"version": 1, "writer": "B"}, expected=stale)
    assert b.read(ptr) == {"version": 1}


def test_conditional_put_rejects_create_over_existing(tmp_path):
    """expected=None means 'must not exist yet' — two initializers racing
    to create the same store cannot both win."""
    b = ConditionalPutBackend()
    ptr = str(tmp_path / "_CURRENT")
    b.commit(ptr, {"version": 0}, expected=None)
    with pytest.raises(CommitConflictError):
        b.commit(ptr, {"version": 0, "writer": "B"}, expected=None)


def test_conditional_put_releases_lock_after_conflict(tmp_path):
    """A rejected commit must not leave the sidecar lock behind (that
    would wedge every later writer until timeout)."""
    b = ConditionalPutBackend()
    ptr = str(tmp_path / "_CURRENT")
    b.commit(ptr, {"version": 0}, expected=None)
    with pytest.raises(CommitConflictError):
        b.commit(ptr, {"version": 9}, expected={"version": 7})
    assert not os.path.exists(ptr + ".lock")
    # and the next well-formed commit goes straight through
    b.commit(ptr, {"version": 1}, expected={"version": 0})
    assert b.read(ptr) == {"version": 1}


def test_conditional_put_lock_contention_times_out(tmp_path):
    """A crashed writer that left its lock behind blocks others only
    until the bounded timeout, then surfaces as a retryable conflict."""
    b = ConditionalPutBackend(lock_timeout=0.1, poll=0.01)
    ptr = str(tmp_path / "_CURRENT")
    with open(ptr + ".lock", "w"):
        pass  # orphaned lock from a dead writer
    with pytest.raises(CommitConflictError):
        b.commit(ptr, {"version": 0}, expected=None)


def test_store_level_conflict_surfaces_not_clobbers(tmp_path, spark):
    """Two ParquetViewStore writers on the same path under CAS: the
    writer holding a stale snapshot gets CommitConflictError instead of
    silently overwriting the other's commit (the S3 deployment bug the
    backend exists to prevent)."""
    from nexus_event_stream_spark.streaming.projection import ParquetViewStore

    path = str(tmp_path / "view")
    a = ParquetViewStore(path, backend=ConditionalPutBackend())
    b = ParquetViewStore(path, backend=ConditionalPutBackend())
    df = spark.range(3).selectExpr("cast(id as string) id")

    a.write(df.limit(1), epoch=0, run_token="A")
    ver_a = a.current()["version"]

    # b read the store before a's second write, then commits after it
    stale = b.current()
    a.write(df.limit(2), epoch=1, run_token="A")
    with pytest.raises(CommitConflictError):
        b.backend.commit(
            b._pointer_path(), {"version": 99, "epoch": 0}, expected=stale
        )
    assert a.current()["version"] == ver_a + 1  # a's commit intact
