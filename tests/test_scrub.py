"""Media metadata scrubbing (functions/scrub.py + operators/multimodal.py
scrub_media): metadata containers drop, coded bytes stay byte-identical,
unparseable payloads pass through flagged."""

from __future__ import annotations

import struct

import pytest

from nexus_event_stream_spark.functions.jpeg import (
    jpeg_meta,
    jpeg_scan_ranges,
    synthesize_jpeg,
)
from nexus_event_stream_spark.functions.png import (
    SIGNATURE,
    decode_png,
    encode_png,
)
from nexus_event_stream_spark.functions.scrub import (
    scrub_jpeg,
    scrub_png,
    scrub_wav,
)
from nexus_event_stream_spark.functions.wav import decode_wav, encode_wav


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _splice_png_meta(png: bytes) -> bytes:
    """Insert tEXt + tIME chunks right after IHDR (legal placement)."""
    ihdr_end = len(SIGNATURE) + 8 + 13 + 4
    meta = _png_chunk(b"tEXt", b"Author\x00Jane Q. Public") + _png_chunk(
        b"tIME", struct.pack(">HBBBBB", 2026, 8, 15, 12, 0, 0)
    )
    return png[:ihdr_end] + meta + png[ihdr_end:]


def test_scrub_jpeg_drops_exif_and_comments_keeps_scans():
    p = synthesize_jpeg(40, 30, orientation=6, n_scans=3, progressive=True)
    # splice a COM segment after SOI
    com = b"\xff\xfe" + struct.pack(">H", 14) + b"shot by Jane"
    p = p[:2] + com + p[2:]
    assert jpeg_meta(p)["orientation"] == 6
    clean, dropped = scrub_jpeg(p)
    assert sorted(dropped) == ["APP1", "COM"]
    m = jpeg_meta(clean)
    assert m["orientation"] is None  # EXIF gone
    assert (m["width"], m["height"], m["progressive"]) == (40, 30, True)
    # every scan's entropy bytes byte-identical
    before = [
        p[s["data_offset"] : s["data_end"]] for s in jpeg_scan_ranges(p)
    ]
    after = [
        clean[s["data_offset"] : s["data_end"]]
        for s in jpeg_scan_ranges(clean)
    ]
    assert before == after
    # idempotent: a second scrub drops nothing
    clean2, dropped2 = scrub_jpeg(clean)
    assert clean2 == clean and dropped2 == []
    with pytest.raises(ValueError):
        scrub_jpeg(b"\x00\x01")


def test_scrub_png_drops_text_chunks_keeps_pixels():
    pixels = bytes((i * 7) % 256 for i in range(20 * 10))
    png = encode_png(20, 10, pixels, 0)
    dirty = _splice_png_meta(png)
    clean, dropped = scrub_png(dirty)
    assert sorted(dropped) == ["tEXt", "tIME"]
    assert clean == png  # byte-identical to the never-dirty encoding
    w, h, ct, out_pixels = decode_png(clean)
    assert (w, h, out_pixels) == (20, 10, pixels)
    assert b"Jane Q. Public" not in clean
    assert scrub_png(clean) == (clean, [])
    with pytest.raises(ValueError):
        scrub_png(b"not a png")


def test_scrub_wav_drops_info_list_keeps_samples():
    samples = [((i * 37) % 65536) - 32768 for i in range(200)]
    wav = encode_wav(samples, sample_rate=8000)
    # splice a LIST/INFO chunk (artist name) before data
    info = b"INFOIART" + struct.pack("<I", 8) + b"Jane Doe"
    lst = b"LIST" + struct.pack("<I", len(info)) + info
    # insert after fmt chunk: RIFF(12) + fmt(8+16)
    at = 12 + 8 + 16
    dirty = wav[:at] + lst + wav[at:]
    dirty = dirty[:4] + struct.pack("<I", len(dirty) - 8) + dirty[8:]
    clean, dropped = scrub_wav(dirty)
    assert dropped == ["LIST"]
    assert clean == wav
    rate, ch, out = decode_wav(clean)
    assert (rate, ch, out.tolist()) == (8000, 1, samples)
    assert b"Jane Doe" not in clean
    with pytest.raises(ValueError):
        scrub_wav(b"RIFFxxxxNOPE")


def test_scrub_media_kernel_mixed_formats(spark):
    from nexus_event_stream_spark.operators.multimodal import scrub_media

    jpeg = synthesize_jpeg(8, 8, orientation=3)
    png = _splice_png_meta(encode_png(4, 4, bytes(16), 0))
    wav = encode_wav([0, 1, -1, 2])
    junk = b"\x00\x01\x02 not media"
    media = spark.createDataFrame(
        [(1, jpeg), (2, png), (3, wav), (4, junk), (5, None)],
        "media_id long, payload binary",
    )
    rows = {
        int(r.media_id): r for r in scrub_media(media).collect()
    }
    assert rows[1].scrubbed and list(rows[1].dropped_tags) == ["APP1"]
    assert jpeg_meta(bytes(rows[1].payload))["orientation"] is None
    assert rows[2].scrubbed and "tEXt" in list(rows[2].dropped_tags)
    assert decode_png(bytes(rows[2].payload))[3] == bytes(16)
    assert rows[3].scrubbed and list(rows[3].dropped_tags) == []
    # unrecognized / NULL payloads pass through UNCHANGED, flagged
    assert not rows[4].scrubbed and bytes(rows[4].payload) == junk
    assert not rows[5].scrubbed and bytes(rows[5].payload or b"") == b""
    # zero shuffle
    plan = (
        scrub_media(media)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_scrub_mp4_neutralizes_udta_in_place():
    """udta/meta boxes (GPS, author, device strings) become same-size
    free boxes — byte length identical, every demuxed sample byte-exact
    (stco offsets are absolute; removal would corrupt them)."""
    import struct as _st

    from nexus_event_stream_spark.functions.mp4 import encode_mp4, parse_mp4
    from nexus_event_stream_spark.functions.scrub import scrub_mp4

    frames = [bytes([i] * (6 + i)) for i in range(5)]
    base = encode_mp4(frames)

    def box(tag: bytes, payload: bytes) -> bytes:
        return _st.pack(">I", 8 + len(payload)) + tag + payload

    gps = box(b"udta", box(b"\xa9xyz", b"+37.7749-122.4194/"))
    author = box(b"meta", b"\x00" * 4 + box(b"ilst", b"Jane Doe shot this"))
    # real muxers put metadata at the file tail or inside moov (ahead of
    # mdat would shift stco offsets) — test both supported placements:
    # meta as a moov child (moov rebuilt to include it), udta trailing
    moov_start = base.find(b"moov") - 4
    moov_size = _st.unpack(">I", base[moov_start : moov_start + 4])[0]
    moov_end = moov_start + moov_size
    moov_body = base[moov_start + 8 : moov_end]
    new_moov = box(b"moov", moov_body + author)
    dirty = base[:moov_start] + new_moov + base[moov_end:] + gps
    before = parse_mp4(dirty)
    clean, dropped = scrub_mp4(dirty)
    assert sorted(dropped) == ["moov/meta", "udta"]
    assert len(clean) == len(dirty)  # in-place: byte length identical
    assert b"Jane Doe" not in clean and b"122.4194" not in clean
    after = parse_mp4(clean)
    assert after["sample_offsets"] == before["sample_offsets"]
    assert after["sample_sizes"] == before["sample_sizes"]
    for off, sz in zip(after["sample_offsets"], after["sample_sizes"]):
        assert clean[off : off + sz] == dirty[off : off + sz]
    # idempotent; malformed raises
    again, dropped2 = scrub_mp4(clean)
    assert again == clean and dropped2 == []
    import pytest as _pytest

    with _pytest.raises(ValueError):
        scrub_mp4(b"\x00\x00\x00\x05xxxx")


def test_scrub_media_routes_mp4(spark):
    import struct as _st

    from nexus_event_stream_spark.functions.mp4 import encode_mp4
    from nexus_event_stream_spark.operators.multimodal import scrub_media

    base = encode_mp4([b"abcdef", b"ghijkl"])
    udta = _st.pack(">I", 8 + 10) + b"udta" + b"author: me"
    media = spark.createDataFrame(
        [(1, base + udta)], "media_id long, payload binary"
    )
    r = scrub_media(media).collect()[0]
    assert r.scrubbed and list(r.dropped_tags) == ["udta"]
    assert b"author" not in bytes(r.payload)
    assert len(bytes(r.payload)) == len(base) + 18


def test_scrub_jpeg_keeps_icc_and_adobe_markers():
    """APP2 (ICC profile) and APP14 (Adobe color-transform flag) are
    color-structural, not PII — scrubbing must keep them or Adobe
    YCCK/CMYK files decode with wrong colors."""
    p = synthesize_jpeg(8, 8, orientation=1)
    icc = b"\xff\xe2" + struct.pack(">H", 2 + 14) + b"ICC_PROFILE\x00ab"
    adobe = b"\xff\xee" + struct.pack(">H", 2 + 12) + b"Adobe\x00" + bytes(6)
    vendor = b"\xff\xe5" + struct.pack(">H", 2 + 6) + b"vendor"
    dirty = p[:2] + icc + adobe + vendor + p[2:]
    clean, dropped = scrub_jpeg(dirty)
    assert sorted(dropped) == ["APP1", "APP5"]
    assert b"ICC_PROFILE" in clean and b"Adobe" in clean
    assert b"vendor" not in clean
    # idempotent — the kept markers don't re-drop
    clean2, dropped2 = scrub_jpeg(clean)
    assert clean2 == clean and dropped2 == []


def test_scrub_mp4_preserves_largesize_header():
    """A udta/meta box using a 64-bit largesize (size==1) header keeps
    bytes 8-16 (the largesize field itself) when neutralized — zeroing
    it would leave a size==1 box claiming largesize=0, structurally
    invalid for every downstream parser."""
    import struct as _st

    from nexus_event_stream_spark.functions.mp4 import encode_mp4, parse_mp4
    from nexus_event_stream_spark.functions.scrub import scrub_mp4

    base = encode_mp4([b"abcdef", b"ghijkl"])
    payload = b"author: Jane Doe, GPS +37.77"
    big = (
        _st.pack(">I", 1)
        + b"udta"
        + _st.pack(">Q", 16 + len(payload))
        + payload
    )
    dirty = base + big
    before = parse_mp4(dirty)
    clean, dropped = scrub_mp4(dirty)
    assert dropped == ["udta"]
    assert len(clean) == len(dirty)
    off = len(base)
    # header: size==1, type rewritten to free, largesize INTACT
    assert _st.unpack(">I", clean[off : off + 4])[0] == 1
    assert clean[off + 4 : off + 8] == b"free"
    assert _st.unpack(">Q", clean[off + 8 : off + 16])[0] == 16 + len(payload)
    assert clean[off + 16 :] == bytes(len(payload))
    assert b"Jane Doe" not in clean
    # the scrubbed file still walks + demuxes identically
    after = parse_mp4(clean)
    assert after["sample_offsets"] == before["sample_offsets"]
    again, dropped2 = scrub_mp4(clean)
    assert again == clean and dropped2 == []


def test_scrub_jpeg_drops_mpf_keeps_only_icc_app2():
    """APP2 is kept ONLY for ICC profiles: MPF (embedded preview images
    on phone photos) and other APP2 payloads are metadata and must
    drop."""
    p = synthesize_jpeg(8, 8)
    icc = b"\xff\xe2" + struct.pack(">H", 2 + 14) + b"ICC_PROFILE\x00ab"
    mpf = b"\xff\xe2" + struct.pack(">H", 2 + 10) + b"MPF\x00" + b"thumb!"
    dirty = p[:2] + icc + mpf + p[2:]
    clean, dropped = scrub_jpeg(dirty)
    assert dropped == ["APP2"]
    assert b"ICC_PROFILE" in clean and b"MPF\x00" not in clean
    assert scrub_jpeg(clean) == (clean, [])


def test_scrub_mp4_recurses_through_largesize_containers():
    """A moov that uses a 64-bit largesize header: recursion must start
    after the 16-byte header, or the largesize field is parsed as the
    first child's box header — and a nested meta would escape."""
    import struct as _st

    from nexus_event_stream_spark.functions.scrub import scrub_mp4

    meta = _st.pack(">I", 8 + 12) + b"meta" + b"Jane's notes"
    mvhd = _st.pack(">I", 8 + 4) + b"mvhd" + bytes(4)
    body = mvhd + meta
    big_moov = (
        _st.pack(">I", 1) + b"moov" + _st.pack(">Q", 16 + len(body)) + body
    )
    ftyp = _st.pack(">I", 8 + 8) + b"ftyp" + b"isom\x00\x00\x00\x01"
    dirty = ftyp + big_moov
    clean, dropped = scrub_mp4(dirty)
    assert dropped == ["moov/meta"]
    assert b"Jane's notes" not in clean and len(clean) == len(dirty)
    # mvhd untouched, moov header (incl. largesize) intact
    assert clean[: len(ftyp) + 16 + len(mvhd)] == dirty[: len(ftyp) + 16 + len(mvhd)]
    again, d2 = scrub_mp4(clean)
    assert again == clean and d2 == []


def test_scrub_gif_drops_comment_and_app_keeps_pixels_and_loop():
    """GIF comment + non-NETSCAPE application extensions drop; pixels,
    delays and the NETSCAPE loop block survive byte-identically (r13 —
    the GIF branch of the media PII tier)."""
    import numpy as np

    from nexus_event_stream_spark.functions.gif import (
        _sub_blocks,
        decode_gif,
        encode_gif,
        gif_meta,
        gray_palette,
    )
    from nexus_event_stream_spark.functions.scrub import scrub_gif

    rng = np.random.RandomState(5)
    frames = [
        bytes(rng.randint(0, 256, 24 * 16).astype(np.uint8))
        for _ in range(2)
    ]
    g = encode_gif(24, 16, frames, gray_palette(), delays_cs=[7, 9], loop=3)
    # splice metadata: a comment and an XMP application extension
    dirty = (
        g[:-1]
        + b"\x21\xfe" + _sub_blocks(b"shot at 51.5N -0.1E by jane")
        + b"\x21\xff" + _sub_blocks(b"XMP DataXMP<x:xmpmeta author='jane'/>")
        + b"\x3b"
    )
    clean, dropped = scrub_gif(dirty)
    assert sorted(dropped) == ["app:XMP DataXMP", "comment"]
    assert b"jane" not in clean and b"51.5N" not in clean
    assert clean == g  # extensions out, everything else byte-identical
    w, h, got, delays = decode_gif(clean)
    assert delays == [7, 9]
    assert gif_meta(clean)["loop"] == 3  # NETSCAPE kept (structural)
    ref = decode_gif(g)[2]
    assert got == ref
    # clean of clean is a fixpoint
    again, dropped2 = scrub_gif(clean)
    assert again == clean and dropped2 == []
