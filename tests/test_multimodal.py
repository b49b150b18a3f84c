"""Multimodal plumbing: binary columns + Arrow-batched REAL PNG codec."""

from __future__ import annotations

import pytest

from nexus_event_stream_spark.functions.png import (
    decode_png,
    encode_png,
    resize_nearest,
)
from nexus_event_stream_spark.io import load_table
from nexus_event_stream_spark.functions.wav import decode_wav, encode_wav
from nexus_event_stream_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_image,
    decode_doc_media,
    documents_as_media,
    extract_image_features,
    resize_images,
    sample_frames,
    synthesize_doc_media,
)

# golden 3×2 grayscale image (known pixels, asymmetric so filter bugs show)
GOLD_W, GOLD_H = 3, 2
GOLD_PIXELS = bytes([10, 200, 30, 120, 0, 255])


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_roundtrip_every_filter(ftype):
    payload = encode_png(GOLD_W, GOLD_H, GOLD_PIXELS, filter_type=ftype)
    assert payload.startswith(b"\x89PNG\r\n\x1a\n")
    w, h, ct, px = decode_png(payload)
    assert (w, h, ct) == (GOLD_W, GOLD_H, 0)
    assert px == GOLD_PIXELS


def test_png_rgb_roundtrip():
    pixels = bytes(range(2 * 2 * 3))
    payload = encode_png(2, 2, pixels, color_type=2, filter_type=4)
    w, h, ct, px = decode_png(payload)
    assert (w, h, ct) == (2, 2, 2)
    assert px == pixels


def test_png_rejects_malformed():
    good = encode_png(GOLD_W, GOLD_H, GOLD_PIXELS)
    with pytest.raises(ValueError):
        decode_png(b"JFIF not a png")
    corrupt = bytearray(good)
    corrupt[-6] ^= 0xFF  # flip a bit inside IEND's CRC
    with pytest.raises(ValueError):
        decode_png(bytes(corrupt))


def test_resize_nearest_identity_and_downsample():
    assert (
        resize_nearest(GOLD_PIXELS, GOLD_W, GOLD_H, GOLD_W, GOLD_H) == GOLD_PIXELS
    )
    small = resize_nearest(GOLD_PIXELS, GOLD_W, GOLD_H, 1, 1)
    assert small == bytes([GOLD_PIXELS[0]])


def test_decode_image_histogram_feature():
    w, h, feat = decode_image(encode_png(GOLD_W, GOLD_H, GOLD_PIXELS))
    assert (w, h) == (GOLD_W, GOLD_H)
    assert len(feat) == FEATURE_DIM
    assert abs(sum(feat) - 1.0) < 1e-4  # fractions (each rounded to 6dp)
    # pixels 10,30,0 → bin 0; 120 → bin 3; 200 → bin 6; 255 → bin 7
    assert feat[0] == round(3 / 6, 6) and feat[3] == round(1 / 6, 6)


def test_media_schema_and_payload_roundtrip(spark, sf_dir):
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    row = media.first()
    assert isinstance(row["payload"], (bytes, bytearray))
    assert row["n_bytes"] == len(row["payload"])
    assert set(media.columns) == {"media_id", "kind", "mime", "n_bytes", "payload"}


def png_media(spark, n=12):
    rows = [
        (i, bytes(encode_png(4 + i, 3 + i % 2, bytes((i * 7 + j) % 256 for j in range((4 + i) * (3 + i % 2))), filter_type=i % 5)))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "media_id long, payload binary")


def test_extract_features_mapinpandas_real_decode(spark):
    media = png_media(spark, 12)
    rows = extract_image_features(media).collect()
    assert len(rows) == 12
    for r in rows:
        assert r["width"] == 4 + r["media_id"]
        assert r["height"] == 3 + r["media_id"] % 2
        assert len(r["feature"]) == FEATURE_DIM
    # deterministic: same input → same features
    again = {
        r["media_id"]: r["feature"] for r in extract_image_features(media).collect()
    }
    assert all(again[r["media_id"]] == r["feature"] for r in rows)


def test_extract_features_malformed_yields_nulls(spark):
    bad = spark.createDataFrame(
        [(1, b"not a png"), (2, None)], "media_id long, payload binary"
    )
    rows = extract_image_features(bad).collect()
    assert len(rows) == 2
    assert all(r["width"] is None and r["feature"] is None for r in rows)


def test_resize_real_roundtrip(spark):
    media = png_media(spark, 6)
    out = resize_images(media, target_w=2, target_h=2).collect()
    assert len(out) == 6
    for r in out:
        w, h, ct, px = decode_png(r["payload"])
        assert (w, h) == (2, 2)
        assert len(px) == 4


def test_sample_frames_fanout(spark, sf_dir):
    media = documents_as_media(load_table(spark, sf_dir, "documents")).limit(5)
    out = sample_frames(media, n_frames=4, frame_bytes=8).collect()
    assert len(out) == 20  # 1→N fan-out
    by_media = {}
    for r in out:
        by_media.setdefault(r["media_id"], []).append(r)
    for rows in by_media.values():
        assert sorted(r["frame_idx"] for r in rows) == [0, 1, 2, 3]
        assert all(len(r["frame"]) <= 8 for r in rows)


def test_wav_roundtrip_mono_and_stereo():
    samples = [0, 32767, -32768, 123, -456, 7]
    rate, ch, out = decode_wav(encode_wav(samples, sample_rate=8000))
    assert (rate, ch) == (8000, 1) and out.tolist() == samples
    rate, ch, out = decode_wav(encode_wav(samples, sample_rate=44100, channels=2))
    assert (rate, ch) == (44100, 2) and out.tolist() == samples


def test_wav_rejects_malformed():
    with pytest.raises(ValueError):
        decode_wav(b"ID3 not a wav")
    good = bytearray(encode_wav([1, 2, 3]))
    good[0:4] = b"RIFX"  # wrong magic
    with pytest.raises(ValueError):
        decode_wav(bytes(good))


def test_doc_media_pipeline_matches_rules(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(25)
    out = decode_doc_media(synthesize_doc_media(docs)).collect()
    assert len(out) == 25
    for r in out:
        did = r["doc_id"]
        assert r["width"] == 4 + did % 13
        assert r["height"] == 3 + did % 7
        assert r["png_filter"] == did % 5
        n = r["width"] * r["height"]
        assert r["sum_pixels"] == sum((did * 31 + i) % 256 for i in range(n))
        ns = 64 + did % 129
        assert (r["sample_rate"], r["n_samples"]) == (8000, ns)
        assert r["sum_abs_samples"] == sum(
            abs(((did * 17 + i * i) % 65536) - 32768) for i in range(ns)
        )
        nf = 2 + did % 3
        assert r["n_frames"] == nf
        assert r["sum_frame_pixels"] == sum(
            (did * 31 + f * 97 + i) % 256 for f in range(nf) for i in range(n)
        )
        assert r["jpeg_width"] == 8 + did % 31
        assert r["jpeg_height"] == 5 + did % 17
        assert r["jpeg_components"] == 1 + did % 3
        assert r["jpeg_progressive"] == (did % 2 == 1)
        assert r["jpeg_orientation"] == ((did % 9) or None)


def test_sample_frames_jpeg_still_tier(spark):
    """A structurally valid JPEG payload is recognized by the marker walk
    (functions/jpeg.py) and served as a single-frame still — every
    sampled row carries the intact payload, not byte windows; a corrupt
    JPEG falls through to the byte-window tier."""
    from nexus_event_stream_spark.functions.jpeg import jpeg_meta, synthesize_jpeg

    good = synthesize_jpeg(40, 30, orientation=6, scan_bytes=128)
    bad = b"\xff\xd8" + b"\x00" * 120  # signature but no marker stream
    media = spark.createDataFrame(
        [(1, good), (2, bad)], "media_id long, payload binary"
    )
    rows = sample_frames(media, n_frames=3, frame_bytes=8).collect()
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(bytes(r["frame"]))
    assert by_media[1] == [good] * 3
    for frame in by_media[1]:
        assert jpeg_meta(frame)["width"] == 40  # still a decodable JPEG
    assert all(len(f) <= 8 for f in by_media[2])  # tolerant fallback


def test_sample_frames_progressive_jpeg_scan_tier(spark):
    """A multi-scan (progressive) JPEG samples SCANS the way MP4 samples
    frames: n_frames evenly spaced scans, each row the scan's raw
    entropy bytes sliced at the ranges jpeg_scan_ranges resolves."""
    from nexus_event_stream_spark.functions.jpeg import (
        jpeg_scan_ranges,
        synthesize_jpeg,
    )

    prog = synthesize_jpeg(64, 48, progressive=True, n_scans=5, scan_bytes=40)
    scans = jpeg_scan_ranges(prog)
    assert len(scans) == 5
    media = spark.createDataFrame(
        [(7, prog)], "media_id long, payload binary"
    )
    rows = sorted(
        sample_frames(media, n_frames=3).collect(),
        key=lambda r: r["frame_idx"],
    )
    assert [r["frame_idx"] for r in rows] == [0, 1, 2]
    # picks(5) with n_frames=3 → scans 0, 2, 4
    want = [
        prog[scans[k]["data_offset"] : scans[k]["data_end"]] for k in (0, 2, 4)
    ]
    assert [bytes(r["frame"]) for r in rows] == want
    assert len({bytes(r["frame"]) for r in rows}) == 3  # distinct scans


# -- APNG: real video frames -------------------------------------------------


def _frames(w, h, nf, salt=0):
    return [
        bytes((salt + f * 97 + i) % 256 for i in range(w * h))
        for f in range(nf)
    ]


def test_apng_roundtrip_multi_frame_filters():
    from nexus_event_stream_spark.functions.png import decode_apng, encode_apng

    w, h, nf = 6, 4, 5
    frames = _frames(w, h, nf, salt=11)
    payload = encode_apng(w, h, frames, filter_type=[f % 5 for f in range(nf)])
    gw, gh, ct, got = decode_apng(payload)
    assert (gw, gh, ct) == (w, h, 0)
    assert got == frames


def test_apng_plain_png_is_single_frame():
    from nexus_event_stream_spark.functions.png import decode_apng

    px = bytes(range(12))
    w, h, ct, frames = decode_apng(encode_png(4, 3, px))
    assert (w, h, ct) == (4, 3, 0)
    assert frames == [px]


def test_apng_rejects_malformed():
    from nexus_event_stream_spark.functions.png import decode_apng, encode_apng

    with pytest.raises(ValueError):
        decode_apng(b"\x00" * 40)
    good = bytearray(encode_apng(3, 2, _frames(3, 2, 2)))
    good[40] ^= 0xFF  # corrupt a byte inside a chunk → CRC failure
    with pytest.raises(ValueError):
        decode_apng(bytes(good))


def test_sample_frames_real_apng_pixel_exact(spark):
    """encode N frames → sample_frames → each output is a standalone PNG
    whose pixels are EXACTLY the source frame at the evenly spaced index."""
    from nexus_event_stream_spark.functions.png import encode_apng

    w, h, nf = 5, 4, 7
    frames = _frames(w, h, nf, salt=3)
    media = spark.createDataFrame(
        [(1, bytearray(encode_apng(w, h, frames, filter_type=2)))],
        "media_id long, payload binary",
    )
    out = sorted(
        sample_frames(media, n_frames=4).collect(), key=lambda r: r["frame_idx"]
    )
    assert [r["frame_idx"] for r in out] == [0, 1, 2, 3]
    expect_idx = [(i * (nf - 1)) // 3 for i in range(4)]  # 0, 2, 4, 6
    for r, k in zip(out, expect_idx):
        gw, gh, _ct, px = decode_png(bytes(r["frame"]))
        assert (gw, gh) == (w, h)
        assert px == frames[k]


from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 6),
    h=st.integers(1, 6),
    nf=st.integers(1, 5),
    data=st.data(),
)
def test_apng_roundtrip_property(w, h, nf, data):
    from nexus_event_stream_spark.functions.png import decode_apng, encode_apng

    n = w * h
    frames = [
        bytes(data.draw(st.lists(st.integers(0, 255), min_size=n, max_size=n)))
        for _ in range(nf)
    ]
    filts = data.draw(st.lists(st.integers(0, 4), min_size=nf, max_size=nf))
    got = decode_apng(encode_apng(w, h, frames, filter_type=filts))
    assert got == (w, h, 0, frames)


# -- property-based codec round-trips (hypothesis) --------------------------

from hypothesis import given, settings, strategies as st


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 8),
    h=st.integers(1, 8),
    ct=st.sampled_from([0, 2, 6]),
    ftype=st.integers(0, 4),
    data=st.data(),
)
def test_png_roundtrip_property(w, h, ct, ftype, data):
    from nexus_event_stream_spark.functions.png import CHANNELS

    n = w * h * CHANNELS[ct]
    pixels = bytes(
        data.draw(st.lists(st.integers(0, 255), min_size=n, max_size=n))
    )
    got = decode_png(encode_png(w, h, pixels, color_type=ct, filter_type=ftype))
    assert got == (w, h, ct, pixels)


@settings(max_examples=40, deadline=None)
@given(
    samples=st.lists(st.integers(-32768, 32767), min_size=0, max_size=64),
    rate=st.sampled_from([8000, 16000, 44100]),
)
def test_wav_roundtrip_property(samples, rate):
    rate2, ch2, out2 = decode_wav(encode_wav(samples, sample_rate=rate))
    assert (rate2, ch2, out2.tolist()) == (rate, 1, samples)


def test_decode_doc_media_dhash_matches_perceptual_hashes(spark, sf_dir):
    """The q_binary_meta perceptual leg (r14) must report the SAME
    dHash the dedup tier computes: decode_doc_media's image_dhash /
    gif_dhash columns vs operators/phash.perceptual_hashes run directly
    on the identical payload columns — one kernel, two surfaces."""
    from nexus_event_stream_spark.operators.multimodal import (
        decode_doc_media,
        synthesize_doc_media,
    )
    from nexus_event_stream_spark.operators.phash import perceptual_hashes
    from pyspark.sql import functions as F

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", F.col("text").cast("string").alias("text"))
        .limit(40)
    )
    media = synthesize_doc_media(docs).cache()
    try:
        got = {
            r["doc_id"]: (r["image_dhash"], r["gif_dhash"])
            for r in decode_doc_media(media)
            .select("doc_id", "image_dhash", "gif_dhash")
            .collect()
        }
        img = {
            r["doc_id"]: r["phash"]
            for r in perceptual_hashes(
                media.select("doc_id", F.col("image").alias("payload")),
                id_col="doc_id",
            ).collect()
        }
        gif = {
            r["doc_id"]: r["phash"]
            for r in perceptual_hashes(
                media.select("doc_id", F.col("gif").alias("payload")),
                id_col="doc_id",
            ).collect()
        }
        assert len(got) == 40
        for did, (idh, gdh) in got.items():
            assert idh == img[did] and idh is not None
            assert gdh == gif[did] and gdh is not None
    finally:
        media.unpersist()
