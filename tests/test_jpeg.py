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
