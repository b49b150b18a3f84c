"""Streaming IVF-PQ index maintenance (streaming/ann_index.py): frozen
quantizers + append-only epoch publish. The binding invariant: an index
grown epoch-by-epoch is IDENTICAL (rows and search results) to one built
over the finished corpus in one shot — append changes availability, never
results."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nexus_event_stream_spark.io import load_table
from nexus_event_stream_spark.operators.similarity import (
    ivf_pq_topk,
    ivf_train_centroids,
    pq_build_index,
    pq_train_codebooks,
)
from nexus_event_stream_spark.streaming.ann_index import PQIndexStore
from nexus_event_stream_spark.streaming.commit import (
    ConditionalPutBackend,
    PosixRenameBackend,
)


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def quantizers(corpus):
    cents = ivf_train_centroids(corpus, n_centroids=8, iters=3)
    books = pq_train_codebooks(corpus, m=8, ksub=16, iters=3)
    return cents, books


@pytest.mark.parametrize(
    "backend", [PosixRenameBackend(), ConditionalPutBackend()]
)
def test_streamed_index_equals_one_shot(
    spark, tmp_path, corpus, quantizers, backend
):
    cents, books = quantizers
    store = PQIndexStore(
        str(tmp_path / "idx"), cents, books, backend=backend
    )
    for e in range(3):
        assert store.append(
            corpus.filter(F.col("vec_id") % 3 == e), e, "run"
        )
    assert store.n_indexed == corpus.count()

    # rows identical to the one-shot build (same frozen quantizers)
    got = {
        (r["vec_id"], r["centroid_id"], tuple(r["codes"]))
        for r in store.read(spark).collect()
    }
    want = {
        (r["vec_id"], r["centroid_id"], tuple(r["codes"]))
        for r in pq_build_index(corpus, cents, books).collect()
    }
    assert got == want

    # search results identical to the batch tier, rank included
    qrows = corpus.filter("vec_id < 3").collect()
    queries = [(int(r.vec_id), list(r.embedding)) for r in qrows]
    got_s = [
        (r["query_id"], r["vec_id"], r["rank"])
        for r in store.search(corpus, queries, k=5, nprobe=3)
        .orderBy("query_id", "rank")
        .collect()
    ]
    want_s = [
        (r["query_id"], r["vec_id"], r["rank"])
        for r in ivf_pq_topk(corpus, cents, books, queries, k=5, nprobe=3)
        .orderBy("query_id", "rank")
        .collect()
    ]
    assert got_s == want_s


def test_replay_is_noop_and_empty_batch_advances(
    spark, tmp_path, corpus, quantizers
):
    cents, books = quantizers
    store = PQIndexStore(str(tmp_path / "idx"), cents, books)
    store.append(corpus.filter("vec_id % 2 = 0"), 0, "run")
    n0 = store.n_indexed
    assert store.append(corpus.limit(5), 0, "run") is False  # crash replay
    assert store.n_indexed == n0
    # empty batch: epoch advances (monotone guard), index unchanged
    assert store.append(corpus.filter("vec_id < 0"), 1, "run") is True
    assert store.current()["epoch"] == 1 and store.n_indexed == n0


def test_quantizer_pinning(spark, tmp_path, corpus, quantizers):
    cents, books = quantizers
    path = str(tmp_path / "idx")
    PQIndexStore(path, cents, books)
    # restart: quantizers reload from disk, no args needed
    again = PQIndexStore(path)
    assert again.centroids.shape == (8, cents.shape[1] if hasattr(cents, "shape") else len(cents[0]))
    # different quantizers over an existing index are an explicit error
    import numpy as np

    with pytest.raises(ValueError, match="comparable"):
        PQIndexStore(path, np.asarray(cents) + 1.0, books)
    # a NEW index without quantizers is an explicit error
    with pytest.raises(ValueError, match="trained"):
        PQIndexStore(str(tmp_path / "fresh"))


def test_foreach_batch_wiring(spark, tmp_path, corpus, quantizers):
    """End-to-end through Structured Streaming: a parquet file stream of
    embeddings drains through foreach_batch into the store."""
    cents, books = quantizers
    src = str(tmp_path / "src")
    for i in range(2):
        corpus.filter(F.col("vec_id") % 2 == i).write.mode(
            "overwrite"
        ).parquet(f"{src}/part{i}")
    stream = (
        spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/part*")
    )
    store = PQIndexStore(str(tmp_path / "idx"), cents, books)
    q = (
        stream.writeStream.foreachBatch(store.foreach_batch("run"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert store.n_indexed == corpus.count()
    assert store.read(spark).count() == corpus.count()


def test_compact_collapses_dirs_rows_identical(spark, tmp_path, corpus, quantizers):
    cents, books = quantizers
    store = PQIndexStore(str(tmp_path / "idx"), cents, books)
    for e in range(4):
        store.append(corpus.filter(F.col("vec_id") % 4 == e), e, "run")
    before = {
        (r["vec_id"], r["centroid_id"], tuple(r["codes"]))
        for r in store.read(spark).collect()
    }
    assert store.compact(spark) == 4
    assert len(store.current()["dirs"]) == 1
    after = {
        (r["vec_id"], r["centroid_id"], tuple(r["codes"]))
        for r in store.read(spark).collect()
    }
    assert after == before
    assert store.compact(spark) == 0  # already compact: no-op
    # appends continue on top of the compacted base
    assert store.n_indexed == corpus.count()


def test_retrain_trigger_via_embedding_drift(spark, tmp_path, corpus, quantizers):
    """Quantizer decay is the IVF analog of Z-order layout decay: frozen
    codebooks mismatch a drifted embedding distribution and recall erodes
    silently. The training-time profile pinned at index creation is the
    instrument — identical distribution passes, a scale break trips."""
    from nexus_event_stream_spark.operators.drift import embedding_profile

    cents, books = quantizers
    prof = embedding_profile(corpus)
    store = PQIndexStore(
        str(tmp_path / "idx"), cents, books, training_profile=prof
    )
    # same distribution → no retrain
    rep = store.needs_retrain(embedding_profile(corpus))
    assert rep["drifted"] is False
    # a new encoder rescales the space → retrain trigger
    scaled = corpus.select(
        "vec_id",
        F.transform("embedding", lambda x: x * F.lit(3.0)).alias("embedding"),
    )
    rep2 = store.needs_retrain(embedding_profile(scaled))
    assert rep2["drifted"] is True and "norm_scale_shift" in rep2["flags"]
    # the profile survives a store reload from disk
    again = PQIndexStore(str(tmp_path / "idx"))
    assert again.needs_retrain(embedding_profile(scaled))["drifted"] is True
    # unarmed store: explicit error, not a silent pass
    bare = PQIndexStore(str(tmp_path / "bare"), cents, books)
    with pytest.raises(ValueError, match="training_profile"):
        bare.needs_retrain(prof)
