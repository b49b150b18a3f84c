"""Multimodal plumbing: binary columns + Arrow-batched stub decode."""

from __future__ import annotations

from nexus_event_stream_spark.io import load_table
from nexus_event_stream_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_image_real,
    decode_image_stub,
    documents_as_media,
    extract_image_features,
)

import pytest


def test_media_schema_and_payload_roundtrip(spark, sf_dir):
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    row = media.first()
    assert isinstance(row["payload"], (bytes, bytearray))
    assert row["n_bytes"] == len(row["payload"])
    assert set(media.columns) == {"media_id", "kind", "mime", "n_bytes", "payload"}


def test_extract_features_mapinpandas(spark, sf_dir):
    media = documents_as_media(load_table(spark, sf_dir, "documents")).limit(20)
    feats = extract_image_features(media)
    rows = feats.collect()
    assert len(rows) == 20
    for r in rows:
        assert len(r["feature"]) == FEATURE_DIM
        assert r["width"] >= 16 and r["height"] >= 16
    # deterministic stub: same input → same features
    again = {r["media_id"]: r["feature"] for r in extract_image_features(media).collect()}
    assert all(again[r["media_id"]] == r["feature"] for r in rows)


def test_resize_changes_payload_proportionally(spark, sf_dir):
    from nexus_event_stream_spark.operators.multimodal import resize_images

    media = documents_as_media(load_table(spark, sf_dir, "documents")).limit(10)
    out = resize_images(media, target_w=32, target_h=32).collect()
    originals = {r["media_id"]: r["payload"] for r in media.collect()}
    assert len(out) == 10
    for r in out:
        assert (r["width"], r["height"]) == (32, 32)
        assert 0 < len(r["payload"]) <= len(originals[r["media_id"]])


def test_sample_frames_fanout(spark, sf_dir):
    from nexus_event_stream_spark.operators.multimodal import sample_frames

    media = documents_as_media(load_table(spark, sf_dir, "documents")).limit(5)
    out = sample_frames(media, n_frames=4, frame_bytes=8).collect()
    assert len(out) == 20  # 1→N fan-out
    by_media = {}
    for r in out:
        by_media.setdefault(r["media_id"], []).append(r)
    for rows in by_media.values():
        assert sorted(r["frame_idx"] for r in rows) == [0, 1, 2, 3]
        assert all(len(r["frame"]) <= 8 for r in rows)


def test_real_decoder_is_explicitly_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image_real(b"\x89PNG")


def test_stub_decode_handles_empty():
    w, h, f = decode_image_stub(b"")
    assert (w, h) == (16, 16) and f == [0.0] * FEATURE_DIM
