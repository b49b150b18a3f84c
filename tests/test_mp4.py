"""ISO BMFF (MP4) container codec: sample-table round-trips, demuxer
resolution (stsc/stco chunk math, stts timing), malformed-input guards,
and the sample_frames integration tier."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from nexus_event_stream_spark.functions.mp4 import (
    encode_mp4,
    extract_samples,
    parse_mp4,
)


def synth_frames(n: int, seed: int = 7) -> list[bytes]:
    """Deterministic opaque 'encoded frame' payloads of varying size —
    stand-ins for coded pictures (codec decode is environment-capped)."""
    return [
        bytes((seed * 31 + f * 97 + i) % 256 for i in range(10 + (f * 13) % 37))
        for f in range(n)
    ]


def test_round_trip_offsets_sizes_times():
    frames = synth_frames(7)  # odd count → short final chunk
    data = encode_mp4(frames, width=64, height=48, frame_duration=40)
    info = parse_mp4(data)
    assert info["brand"] == "isom"
    assert info["codec"] == "mp4v"
    assert info["timescale"] == 1000
    assert info["n_samples"] == 7
    assert info["duration"] == 7 * 40
    assert info["sample_sizes"] == [len(f) for f in frames]
    assert info["sample_times"] == [i * 40 for i in range(7)]
    # offsets resolve to the exact payload bytes
    assert extract_samples(data, info) == frames
    # offsets are strictly increasing and contiguous within the mdat
    offs = info["sample_offsets"]
    assert all(b > a for a, b in zip(offs, offs[1:]))


def test_chunk_runs_exercised():
    """7 samples at 2 per chunk → 4 chunks, final chunk holds 1 sample —
    the stsc run table must carry two entries and resolve correctly."""
    frames = synth_frames(7)
    data = encode_mp4(frames, samples_per_chunk=2)
    info = parse_mp4(data)
    # chunk 4 starts exactly at the last sample's offset
    assert info["sample_offsets"][-1] + info["sample_sizes"][-1] <= len(data)
    assert extract_samples(data) == frames


def test_single_frame_and_single_chunk():
    frames = synth_frames(1)
    data = encode_mp4(frames)
    assert extract_samples(data) == frames
    data2 = encode_mp4(synth_frames(4), samples_per_chunk=100)
    assert extract_samples(data2) == synth_frames(4)


def test_codec_and_dims_round_trip():
    data = encode_mp4(synth_frames(3), width=320, height=240, codec="avc1")
    assert parse_mp4(data)["codec"] == "avc1"


def test_malformed_inputs_raise():
    frames = synth_frames(3)
    data = encode_mp4(frames)
    with pytest.raises(ValueError):
        parse_mp4(b"")
    with pytest.raises(ValueError):
        parse_mp4(b"\x00" * 64)  # size-0 boxes / no ftyp
    with pytest.raises(ValueError):
        parse_mp4(data[: len(data) // 2])  # truncated moov
    # corrupt a box size field inside moov → bounded-walk failure
    bad = bytearray(data)
    moov_at = data.rfind(b"moov") - 4
    struct.pack_into(">I", bad, moov_at, 2**31)
    with pytest.raises(ValueError):
        parse_mp4(bytes(bad))
    with pytest.raises(ValueError):
        encode_mp4([])


@given(
    st.integers(min_value=1, max_value=20),
    st.integers(min_value=1, max_value=5),
    st.integers(min_value=1, max_value=200),
)
@settings(max_examples=60, deadline=None)
def test_round_trip_property(n, spc, duration):
    frames = synth_frames(n, seed=n * 7 + spc)
    data = encode_mp4(
        frames, samples_per_chunk=spc, frame_duration=duration
    )
    info = parse_mp4(data)
    assert extract_samples(data, info) == frames
    assert info["sample_times"] == [i * duration for i in range(n)]


def test_sample_frames_mp4_tier(spark):
    """The integration tier: an MP4 payload yields the EXACT encoded
    frame payloads via the sample tables (not byte windows), evenly
    spaced; a non-media payload still degrades to byte windows."""
    from nexus_event_stream_spark.operators.multimodal import sample_frames

    frames = synth_frames(10)
    mp4 = encode_mp4(frames)
    media = spark.createDataFrame(
        [(1, mp4), (2, b"not a video at all, just some bytes")],
        "media_id long, payload binary",
    )
    out = sample_frames(media, n_frames=4).collect()
    mp4_rows = sorted(
        (r["frame_idx"], bytes(r["frame"])) for r in out if r["media_id"] == 1
    )
    # picks for 10 frames, 4 samples: indices 0, 3, 6, 9
    assert mp4_rows == [
        (0, frames[0]), (1, frames[3]), (2, frames[6]), (3, frames[9])
    ]
    fallback = [r for r in out if r["media_id"] == 2]
    assert len(fallback) == 4  # same row shape, byte-window tier


def test_decode_doc_media_malformed_mp4_yields_nulls(spark):
    """Tolerant reader on the driver-checked path: a corrupted mp4video
    column nulls only the mp4 quantities; the other codecs' outputs and
    the batch itself survive."""
    from nexus_event_stream_spark.operators.multimodal import (
        decode_doc_media,
        synthesize_doc_media,
    )

    docs = spark.createDataFrame(
        [(7, "some text"), (8, "other words")], "doc_id long, text string"
    )
    from pyspark.sql import functions as F

    media = synthesize_doc_media(docs).withColumn(
        "mp4video",
        F.when(F.col("doc_id") == 7, F.lit(b"corrupted")).otherwise(
            F.col("mp4video")
        ),
    )
    rows = {r["doc_id"]: r for r in decode_doc_media(media).collect()}
    assert rows[7]["n_mp4_samples"] is None and rows[7]["mp4_byte_sum"] is None
    assert rows[7]["sum_pixels"] is not None  # other codecs unaffected
    assert rows[8]["n_mp4_samples"] == 2 + 8 % 4


def test_sample_frames_demuxes_fragmented_mp4(spark):
    """The frame-sampling tier needs no fMP4 special-casing: the parser
    resolves fragments to the same sample tables, so evenly-spaced
    encoded frames slice straight out of a CMAF-style payload."""
    from nexus_event_stream_spark.functions.mp4 import encode_fmp4
    from nexus_event_stream_spark.operators.multimodal import sample_frames

    frames = synth_frames(6)
    media = spark.createDataFrame(
        [(1, encode_fmp4(frames, frames_per_fragment=2))],
        "media_id long, payload binary",
    )
    out = sorted(
        (r["frame_idx"], bytes(r["frame"]))
        for r in sample_frames(media, n_frames=3).collect()
    )
    # picks for 6 frames, 3 samples: indices 0, 2, 5
    assert out == [(0, frames[0]), (1, frames[2]), (2, frames[5])]


def test_hostile_tables_raise_valueerror_fast():
    """The reproduced hostile-input cases: huge fixed-size stsz count
    must not allocate, truncated tables and struct underflows must raise
    ValueError (the documented contract), samples_per_chunk=0 must not
    hang, and a zero-sample container must not crash decode_doc_media's
    list bookkeeping (covered via parse returning empty tables)."""
    frames = synth_frames(3)
    data = encode_mp4(frames)

    with pytest.raises(ValueError):
        encode_mp4(frames, samples_per_chunk=0)

    def patch_box(payload: bytes, typ: bytes, rel_off: int, value: bytes) -> bytes:
        at = payload.rfind(typ) + 4 + rel_off
        return payload[:at] + value + payload[at + len(value) :]

    # stsz fixed-size path with sample_count 0xFFFFFFFF: bounded rejection
    bad = patch_box(data, b"stsz", 4, struct.pack(">II", 1, 0xFFFFFFFF))
    with pytest.raises(ValueError):
        parse_mp4(bad)
    # co64-sized hostile counts on stco / stsc / stts: truncation errors
    for typ, off in ((b"stco", 4), (b"stsc", 4), (b"stts", 4)):
        bad = patch_box(data, typ, off, struct.pack(">I", 0x00FFFFFF))
        with pytest.raises(ValueError):
            parse_mp4(bad)

    # hostile stsc first_chunk values: the run-expansion
    # `[spc] * (last - first + 1)` must NEVER see an unvalidated
    # first_chunk — a 654-byte file with first_chunk=5M used to allocate
    # an 80 MB list before the coverage check ran. 3 frames at
    # samples_per_chunk=2 gives a genuine 2-entry stsc (entry1 at
    # rel-offset 8, entry2 at rel-offset 20 inside the full-box payload).
    for rel, val in (
        (20, 5_000_000),  # second run's first_chunk way past chunk list
        (20, 0),          # first_chunk below 1
        (20, 1),          # not strictly increasing (== first run's)
        (8, 2),           # first run does not start at chunk 1
    ):
        bad = patch_box(data, b"stsc", rel, struct.pack(">I", val))
        with pytest.raises(ValueError):
            parse_mp4(bad)


def test_fmp4_roundtrip_and_fragment_resolution():
    """Fragmented layout: moov has EMPTY sample tables; every sample must
    be recovered from moof/traf/trun with default-base-is-moof
    addressing, timestamps anchored by each fragment's tfdt."""
    from nexus_event_stream_spark.functions.mp4 import encode_fmp4

    frames = [bytes((i * 7 + j) % 256 for j in range(8 + i)) for i in range(5)]
    data = encode_fmp4(frames, width=4, height=3, frames_per_fragment=2)
    info = parse_mp4(data)
    assert info["fragmented"] is True
    assert info["n_fragments"] == 3  # 2+2+1
    assert info["n_samples"] == 5
    assert info["sample_times"] == [0, 40, 80, 120, 160]
    assert info["duration"] == 200  # fragments know what moov declares as 0
    assert info["brand"] == "iso5"
    assert extract_samples(data, info) == frames

    # one frame per fragment: the degenerate CMAF-chunk shape
    solo = encode_fmp4(frames, frames_per_fragment=1)
    si = parse_mp4(solo)
    assert si["n_fragments"] == 5 and extract_samples(solo, si) == frames

    # progressive files keep reporting unfragmented
    assert parse_mp4(encode_mp4(frames))["fragmented"] is False


def test_fmp4_hostile_inputs_raise_valueerror_fast():
    """trun is attacker-controlled per-fragment metadata: hostile sample
    counts must be rejected BEFORE the resolution loop runs, truncation
    and missing traf must surface as ValueError."""
    from nexus_event_stream_spark.functions.mp4 import encode_fmp4

    frames = synth_frames(4)
    data = encode_fmp4(frames, frames_per_fragment=2)

    def patch_box(payload: bytes, typ: bytes, rel_off: int, value: bytes) -> bytes:
        at = payload.rfind(typ) + 4 + rel_off
        return payload[:at] + value + payload[at + len(value) :]

    # trun sample_count 0xFFFFFFFF (full-box payload: verflags at rel 0,
    # sample_count at rel 4): bounded rejection, no allocation
    bad = patch_box(data, b"trun", 4, struct.pack(">I", 0xFFFFFFFF))
    with pytest.raises(ValueError):
        parse_mp4(bad)

    # truncated mid-mdat: the box walk must reject the bad size
    with pytest.raises(ValueError):
        parse_mp4(data[:-3])

    # a moof whose traf 4CC is mangled carries no sample description
    at = data.rfind(b"traf")
    with pytest.raises(ValueError):
        parse_mp4(data[:at] + b"trXf" + data[at + 4 :])


def test_fmp4_roundtrip_property():
    """Any frame-count / frame-size / fragment-packing combination must
    demux back exactly (the progressive twin of this property already
    guards encode_mp4)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from nexus_event_stream_spark.functions.mp4 import encode_fmp4

    @given(
        st.lists(st.binary(min_size=1, max_size=24), min_size=1, max_size=9),
        st.integers(min_value=1, max_value=4),
        st.integers(min_value=1, max_value=90),
    )
    @settings(max_examples=60, deadline=None)
    def check(frames, fpf, dur):
        data = encode_fmp4(frames, frames_per_fragment=fpf, frame_duration=dur)
        info = parse_mp4(data)
        n = len(frames)
        assert extract_samples(data, info) == frames
        assert info["n_samples"] == n
        assert info["n_fragments"] == (n + fpf - 1) // fpf
        assert info["sample_times"] == [i * dur for i in range(n)]
        assert info["duration"] == n * dur

    check()


def test_parse_mp4_fuzz_never_leaks_other_exceptions():
    """The tolerant-reader contract under fuzz: arbitrary bytes — pure
    noise, and mutations of VALID progressive/fragmented files (the
    adversarial case: plausible box structure, corrupt tables) — either
    parse or raise ValueError. Any other exception type would escape the
    decode kernels' per-payload guards as a batch-failing bug."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from nexus_event_stream_spark.functions.mp4 import encode_fmp4

    base_p = encode_mp4(synth_frames(3))
    base_f = encode_fmp4(synth_frames(3))

    @given(
        st.integers(min_value=0, max_value=2),
        st.binary(min_size=0, max_size=64),
        st.integers(min_value=0, max_value=10_000),
    )
    @settings(max_examples=300, deadline=None)
    def check(mode, blob, pos):
        if mode == 0:
            data = blob  # pure noise
        else:
            base = base_p if mode == 1 else base_f
            pos %= max(len(base), 1)
            data = base[:pos] + blob + base[pos + len(blob) :]
        try:
            info = parse_mp4(data)
            assert isinstance(info, dict)
        except ValueError:
            pass  # the documented contract

    check()


def test_empty_mdhd_payload_at_eof_raises_valueerror():
    """An mdhd box with an empty payload ending exactly at EOF used to
    leak IndexError from `data[hs]`; the contract is ValueError only."""

    def box(typ: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + typ + payload

    data = box(b"ftyp", b"isom") + box(
        b"moov", box(b"trak", box(b"mdia", box(b"mdhd", b"")))
    )
    with pytest.raises(ValueError):
        parse_mp4(data)


def test_size_zero_box_extends_to_eof():
    """ISO BMFF allows the final box to declare size 0 = 'to end of
    file' (common for streamed mdat); the walker must accept it."""
    frames = synth_frames(4)
    data = encode_mp4(frames)
    # rewrite the LAST top-level box's (moov) size field to 0
    moov_at = data.rfind(b"moov") - 4
    patched = data[:moov_at] + struct.pack(">I", 0) + data[moov_at + 4 :]
    assert extract_samples(patched) == frames


def test_zero_sample_container_yields_nulls_not_batch_failure(spark):
    """A valid container whose stsz declares zero samples must null the
    mp4 columns for that row only (reproduced: unequal result-list
    lengths used to fail the entire Arrow batch)."""
    from pyspark.sql import functions as F

    from nexus_event_stream_spark.operators.multimodal import (
        decode_doc_media,
        synthesize_doc_media,
    )

    base = encode_mp4(synth_frames(2))
    at = base.rfind(b"stsz") + 4 + 4
    zero_sample = base[:at] + struct.pack(">II", 0, 0) + base[at + 8 :]
    docs = spark.createDataFrame(
        [(3, "words here"), (4, "more words")], "doc_id long, text string"
    )
    media = synthesize_doc_media(docs).withColumn(
        "mp4video",
        F.when(F.col("doc_id") == 3, F.lit(zero_sample)).otherwise(
            F.col("mp4video")
        ),
    )
    rows = {r["doc_id"]: r for r in decode_doc_media(media).collect()}
    assert rows[3]["mp4_last_time"] is None  # zero samples → no timestamp
    assert rows[3]["sum_pixels"] is not None
    assert rows[4]["n_mp4_samples"] == 2 + 4 % 4
