"""JPEG metadata codec (functions/jpeg.py): marker-walk parsing with
EXIF orientation, roundtripped against the synthesizer and hardened
against hostile input — same discipline as the PNG/WAV/MP4 family."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from nexus_event_stream_spark.functions.jpeg import (
    jpeg_meta,
    jpeg_scan_ranges,
    synthesize_jpeg,
)


@given(
    w=st.integers(1, 0xFFFF),
    h=st.integers(1, 0xFFFF),
    ncomp=st.sampled_from([1, 3, 4]),
    prog=st.booleans(),
    orient=st.one_of(st.none(), st.integers(1, 8)),
    big=st.booleans(),
)
@settings(max_examples=80, deadline=None)
def test_roundtrip_property(w, h, ncomp, prog, orient, big):
    m = jpeg_meta(
        synthesize_jpeg(w, h, ncomp, prog, orient, exif_big_endian=big)
    )
    assert (m["width"], m["height"], m["n_components"]) == (w, h, ncomp)
    assert m["progressive"] is prog
    assert m["orientation"] == orient


def test_both_exif_endiannesses_parse():
    for big in (False, True):
        m = jpeg_meta(synthesize_jpeg(10, 20, orientation=6, exif_big_endian=big))
        assert m["orientation"] == 6


def test_hostile_inputs_raise_cleanly():
    good = synthesize_jpeg(100, 50, orientation=3)
    for bad in (
        b"",
        b"\x00\x01\x02\x03",
        b"\xff\xd8",                      # signature only, no SOF
        good[:20],                         # truncated mid-segment
        good[:2] + b"\x00" + good[3:],     # marker byte corrupted
        good.replace(b"\xff\xc0", b"\xff\xfe", 1),  # SOF → COM: no frame
    ):
        with pytest.raises(ValueError):
            jpeg_meta(bad)


def test_corrupt_exif_is_tolerated_not_fatal():
    """Orientation is enrichment: a truncated/garbage EXIF block yields
    None, never an exception — the wild is full of broken EXIF."""
    j = bytearray(synthesize_jpeg(8, 8, orientation=5))
    app1_at = j.find(b"\xff\xe1")
    seg_len = struct.unpack(">H", j[app1_at + 2 : app1_at + 4])[0]
    # zero the TIFF header magic inside APP1 (keeps lengths intact)
    j[app1_at + 4 + 6 : app1_at + 4 + 8] = b"ZZ"
    m = jpeg_meta(bytes(j))
    assert m["orientation"] is None
    assert (m["width"], m["height"]) == (8, 8)
    assert seg_len > 2  # sanity: we really did hit the APP1 segment


def test_ff_stuffing_and_restart_markers_in_scan():
    """A scan byte of FF is stuffed (FF00) by the synthesizer; injected
    restart markers (FFD0-D7) inside the scan must not derail the walk."""
    j = bytearray(synthesize_jpeg(33, 44, scan_bytes=200))
    eoi = j.rfind(b"\xff\xd9")
    j[eoi - 4 : eoi - 2] = b"\xff\xd3"  # RST3 mid-scan
    m = jpeg_meta(bytes(j))
    assert (m["width"], m["height"]) == (33, 44)


@given(st.binary(min_size=0, max_size=300))
@settings(max_examples=200, deadline=None)
def test_fuzz_never_crashes_beyond_valueerror(blob):
    """Random bytes either parse (if they happen to be structurally valid)
    or raise ValueError — never IndexError/struct.error/hangs."""
    try:
        m = jpeg_meta(blob)
        assert set(m) == {
            "width", "height", "n_components", "progressive", "orientation"
        }
    except ValueError:
        pass


@given(st.data())
@settings(max_examples=60, deadline=None)
def test_fuzz_mutated_valid_jpegs(data):
    """Bit-flip a valid JPEG anywhere: parse must return metadata or
    raise ValueError, never crash."""
    base = bytearray(synthesize_jpeg(64, 32, orientation=2))
    i = data.draw(st.integers(0, len(base) - 1))
    base[i] ^= data.draw(st.integers(1, 255))
    try:
        jpeg_meta(bytes(base))
    except ValueError:
        pass


# ---- per-scan byte ranges (the MP4-per-sample-range analogue) -------------


def test_scan_ranges_closed_form_on_progressive():
    """n_scans=3 progressive: three ranges, stream-ordered, disjoint,
    each slice starting right after its SOS segment and ending at the
    next marker; the synthesizer's deterministic fillers make every
    boundary checkable closed-form against a re-walk of the stream."""
    p = synthesize_jpeg(64, 48, progressive=True, n_scans=3, scan_bytes=32)
    assert jpeg_meta(p)["progressive"] is True
    scans = jpeg_scan_ranges(p)
    assert [s["scan_idx"] for s in scans] == [0, 1, 2]
    for s in scans:
        # SOS marker where claimed, data starts after the SOS header
        assert p[s["sos_offset"] : s["sos_offset"] + 2] == b"\xff\xda"
        seg_len = struct.unpack(
            ">H", p[s["sos_offset"] + 2 : s["sos_offset"] + 4]
        )[0]
        assert s["data_offset"] == s["sos_offset"] + 2 + seg_len
        assert s["n_bytes"] == s["data_end"] - s["data_offset"] > 0
        # scan data contains no unstuffed marker: every FF is followed
        # by 00 or a restart marker
        data = p[s["data_offset"] : s["data_end"]]
        for i, b in enumerate(data[:-1]):
            if b == 0xFF:
                assert data[i + 1] == 0 or 0xD0 <= data[i + 1] <= 0xD7
        # the next thing after a scan is a marker (next SOS or EOI)
        nxt = p[s["data_end"] : s["data_end"] + 2]
        assert nxt in (b"\xff\xda", b"\xff\xd9") or nxt[0:1] == b"\xff"
    # stream-ordered and disjoint
    for a, b in zip(scans, scans[1:]):
        assert a["data_end"] <= b["sos_offset"]
    # filler lengths grow with scan index (seeded per scan: 32+7s before
    # stuffing) and the fillers are pairwise distinct
    slices = [p[s["data_offset"] : s["data_end"]] for s in scans]
    assert len(set(slices)) == 3
    assert [s["n_bytes"] >= 32 + 7 * i for i, s in enumerate(scans)]
    # last scan ends at EOI
    assert p[scans[-1]["data_end"] :] == b"\xff\xd9"


def test_scan_ranges_single_scan_and_errors():
    p = synthesize_jpeg(8, 8, orientation=5)
    scans = jpeg_scan_ranges(p)
    assert len(scans) == 1 and scans[0]["scan_idx"] == 0
    assert p[scans[0]["data_end"] :] == b"\xff\xd9"
    with pytest.raises(ValueError):
        jpeg_scan_ranges(b"\x00\x01\x02\x03")
    with pytest.raises(ValueError):
        jpeg_scan_ranges(p[: scans[0]["sos_offset"]])  # headers, no scan
    # n_scans validation
    with pytest.raises(ValueError):
        synthesize_jpeg(8, 8, n_scans=0)


@given(
    w=st.integers(1, 300),
    h=st.integers(1, 300),
    n=st.integers(1, 5),
    sb=st.integers(1, 80),
)
@settings(max_examples=40, deadline=None)
def test_scan_ranges_roundtrip_property(w, h, n, sb):
    """Every synthesized layout yields exactly n scans whose ranges tile
    the post-header stream: each scan's data follows its SOS header, and
    each next SOS starts where the previous scan ended."""
    p = synthesize_jpeg(w, h, progressive=n > 1, n_scans=n, scan_bytes=sb)
    scans = jpeg_scan_ranges(p)
    assert len(scans) == n
    for a, b in zip(scans, scans[1:]):
        assert b["sos_offset"] == a["data_end"]
    assert p[scans[-1]["data_end"] :] == b"\xff\xd9"
    # jpeg_meta is unaffected by scan multiplicity
    m = jpeg_meta(p)
    assert (m["width"], m["height"]) == (w, h)


def test_truncated_scan_runs_to_eof():
    """A JPEG whose trailing EOI is stripped (crawl truncation): the last
    scan's range ends at len(payload) — the final entropy byte is scan
    data, not dropped — and scrub_jpeg preserves it byte-exactly."""
    from nexus_event_stream_spark.functions.scrub import scrub_jpeg

    p = synthesize_jpeg(8, 8, n_scans=2, progressive=True)
    trunc = p[:-2]  # strip EOI
    scans = jpeg_scan_ranges(trunc)
    assert len(scans) == 2
    assert scans[-1]["data_end"] == len(trunc)
    assert (
        trunc[scans[-1]["data_offset"] :]
        == p[scans[-1]["data_offset"] : -2]
    )
    # scrub of the truncated file keeps every entropy byte
    clean, dropped = scrub_jpeg(trunc)
    assert dropped == []
    assert clean == trunc
