"""Streaming CMS frequency store (streaming/cms_store.py): accumulated
epochs ≡ one-shot build, additive replay suppression, score-then-fold
rarity semantics, rebuild-from-survivors takedown path."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from nexus_event_stream_spark.operators.cms import cms_build, cms_estimate
from nexus_event_stream_spark.streaming.cms_store import CMSStore
from nexus_event_stream_spark.streaming.commit import (
    ConditionalPutBackend,
    PosixRenameBackend,
)
from nexus_event_stream_spark.streaming.replay import ReplayMismatchError


@pytest.fixture()
def store_dir():
    d = tempfile.mkdtemp(prefix="cmsstore_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(params=["rename", "cas"])
def backend(request):
    if request.param == "rename":
        return PosixRenameBackend()
    return ConditionalPutBackend()


def _keys(spark, items):
    return spark.createDataFrame([(x,) for x in items], "k string")


E0 = ["alpha", "alpha", "beta", "gamma"]
E1 = ["alpha", "delta", "delta", "beta"]
E2 = ["epsilon"] * 5


def test_accumulated_equals_one_shot(spark, store_dir, backend):
    store = CMSStore(store_dir, w=128, d=3, backend=backend)
    store.apply_batch(_keys(spark, E0), "k", epoch=0, run_token="r1")
    store.apply_batch(_keys(spark, E1), "k", epoch=1, run_token="r1")
    sk = store.apply_batch(_keys(spark, E2), "k", epoch=2, run_token="r1")
    oneshot = cms_build(_keys(spark, E0 + E1 + E2), "k", w=128, d=3)
    assert sk.rows == oneshot.rows and sk.n_total == oneshot.n_total


def test_replayed_epoch_never_double_counts(spark, store_dir, backend):
    store = CMSStore(store_dir, w=64, d=3, backend=backend)
    store.apply_batch(_keys(spark, E0), "k", epoch=0, run_token="r1")
    sk1 = store.apply_batch(_keys(spark, E1), "k", epoch=1, run_token="r1")
    # redelivery: same epoch, same run — a no-op returning committed state
    sk2 = store.apply_batch(_keys(spark, E1), "k", epoch=1, run_token="r1")
    assert sk2.rows == sk1.rows and sk2.n_total == sk1.n_total
    # a DIFFERENT run presenting a regressed epoch is the silent-drop
    # hazard the additive guard must refuse
    with pytest.raises(ReplayMismatchError):
        store.apply_batch(_keys(spark, E1), "k", epoch=0, run_token="r2")


def test_score_then_fold_and_restart(spark, store_dir):
    s1 = CMSStore(store_dir, w=128, d=3)
    s1.apply_batch(_keys(spark, ["seen"] * 3), "k", epoch=0, run_token="r1")
    # fresh handle, same path: the committed history serves immediately
    s2 = CMSStore(store_dir, w=128, d=3)
    hist = s2.current_sketch()
    probe = _keys(spark, ["seen", "novel"]).select(
        "k", cms_estimate(hist, "k").alias("est")
    )
    got = {r.k: r.est for r in probe.collect()}
    assert got["seen"] >= 3 and got["novel"] == 0
    # geometry mismatch is loud, not silent corruption
    with pytest.raises(ValueError, match=r"\(w=128, d=3\)"):
        CMSStore(store_dir, w=64, d=3).current_sketch()


def test_rebuild_from_survivors_drops_forgotten_mass(spark, store_dir):
    store = CMSStore(store_dir, w=128, d=3)
    store.apply_batch(
        _keys(spark, ["keep"] * 2 + ["victim"] * 7), "k",
        epoch=0, run_token="r1",
    )
    assert store.current_sketch().n_total == 9
    store.rebuild(spark, _keys(spark, ["keep"] * 2), "k")
    sk = store.current_sketch()
    assert sk.n_total == 2
    est = {
        r.k: r.est
        for r in _keys(spark, ["keep", "victim"])
        .select("k", cms_estimate(sk, "k").alias("est"))
        .collect()
    }
    assert est["keep"] == 2 and est["victim"] == 0
    # epoch/token carried: the guard stays armed after a rebuild
    cur = store.current()
    assert cur["epoch"] == 0 and cur["run_token"] == "r1"


def test_weighted_batches(spark, store_dir):
    store = CMSStore(store_dir, w=64, d=3)
    df = spark.createDataFrame([("x", 4), ("y", 1)], "k string, w long")
    sk = store.apply_batch(
        df, "k", epoch=0, run_token="r1", weight=F.col("w")
    )
    assert sk.n_total == 5
