"""Baseline JPEG pixel codec (functions/jpeg_codec.py).

Roundtrip pins: our own baseline encoder produces golden targets whose
decode must land within quantization-bounded error of the source
pixels — at quality=100 every quantizer is 1, so the only error left is
the float IDCT + rounding (pinned ≤ 1 level). Structural rejections
(progressive, placeholder tables, truncation) must be ValueError —
the phash decoder_fn boundary catches exactly that.
"""

from __future__ import annotations

import numpy as np
import pytest

from nexus_event_stream_spark.functions.jpeg import (
    jpeg_meta,
    synthesize_jpeg,
)
from nexus_event_stream_spark.functions.jpeg_codec import (
    _ZIGZAG,
    decode_baseline_jpeg,
    decode_jpeg_rgb,
    encode_baseline_jpeg,
)


def _gradient(h: int, w: int) -> np.ndarray:
    y, x = np.mgrid[0:h, 0:w]
    return ((x * 3 + y * 2) % 256).astype(np.uint8)


def _rgb(h: int, w: int) -> np.ndarray:
    y, x = np.mgrid[0:h, 0:w]
    out = np.zeros((h, w, 3), dtype=np.uint8)
    out[..., 0] = (x * 5) % 256
    out[..., 1] = (y * 7) % 256
    out[..., 2] = ((x + y) * 3) % 256
    return out


def test_zigzag_is_the_standard_order():
    # first and last entries of the T.81 zigzag sequence (natural index
    # per zigzag position)
    assert _ZIGZAG[:10] == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert _ZIGZAG[-6:] == [61, 54, 47, 55, 62, 63]
    assert sorted(_ZIGZAG) == list(range(64))


def test_grayscale_roundtrip_q100_idct_bound():
    gray = _gradient(40, 56)
    payload = encode_baseline_jpeg(gray, quality=100)
    w, h, planes = decode_baseline_jpeg(payload)
    assert (w, h) == (56, 40)
    assert len(planes) == 1
    err = np.abs(planes[0] - gray.astype(np.float64))
    assert err.max() <= 1.0  # all-ones quant: only IDCT/rounding error


def test_grayscale_roundtrip_quality_ladder():
    gray = _gradient(33, 41)  # non-multiple-of-8 dims exercise padding
    for quality, bound in ((95, 2.0), (75, 6.0), (40, 16.0)):
        payload = encode_baseline_jpeg(gray, quality=quality)
        w, h, planes = decode_baseline_jpeg(payload)
        assert (w, h) == (41, 33)
        err = np.abs(planes[0] - gray.astype(np.float64))
        assert err.max() <= bound, (quality, err.max())


def test_rgb_roundtrip_444_and_420():
    rgb = _rgb(33, 47)
    for sub, bound in (("4:4:4", 8.0), ("4:2:0", 24.0)):
        payload = encode_baseline_jpeg(rgb, quality=90, subsampling=sub)
        w, h, nc, out = decode_jpeg_rgb(payload)
        assert (w, h, nc) == (47, 33, 3)
        err = np.abs(out.astype(np.float64) - rgb.astype(np.float64))
        assert err.max() <= bound, (sub, err.max())
        assert err.mean() <= bound / 4


def test_metadata_agrees_with_the_marker_parser():
    for px, ncomp in ((_gradient(24, 40), 1), (_rgb(24, 40), 3)):
        m = jpeg_meta(encode_baseline_jpeg(px, quality=80))
        assert m["width"] == 40 and m["height"] == 24
        assert m["n_components"] == ncomp
        assert m["progressive"] is False


def test_restart_interval_roundtrip():
    gray = _gradient(48, 64)  # 48 MCUs at 8x8 → several RST resyncs
    plain = encode_baseline_jpeg(gray, quality=90)
    rst = encode_baseline_jpeg(gray, quality=90, restart_interval=3)
    assert b"\xff\xdd" in rst and b"\xff\xdd" not in plain
    assert any(bytes([0xFF, 0xD0 + i]) in rst for i in range(8))
    _w, _h, p_plain = decode_baseline_jpeg(plain)
    _w, _h, p_rst = decode_baseline_jpeg(rst)
    # restart markers change framing, not pixels
    assert np.allclose(p_plain[0], p_rst[0], atol=1e-9)


def test_420_subsampling_declared_and_smaller():
    rgb = _rgb(40, 40)
    p444 = encode_baseline_jpeg(rgb, quality=85, subsampling="4:4:4")
    p420 = encode_baseline_jpeg(rgb, quality=85, subsampling="4:2:0")
    assert len(p420) < len(p444)  # quarter the chroma blocks


def test_progressive_rejected_for_the_decoder_fn_boundary():
    # a REAL stream whose frame header is progressive: take a valid
    # baseline file and flip its SOF0 marker to SOF2 (tables stay valid,
    # so the rejection exercises the frame-profile branch specifically)
    good = bytearray(encode_baseline_jpeg(_gradient(16, 16), quality=90))
    sof = good.index(b"\xff\xc0")
    good[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="progressive"):
        decode_baseline_jpeg(bytes(good))
    # and the synthesized progressive file (placeholder tables) is
    # rejected too — message aside, never a crash
    with pytest.raises(ValueError):
        decode_baseline_jpeg(synthesize_jpeg(16, 16, progressive=True))


def test_placeholder_tables_rejected():
    # synthesize_jpeg's filler file has all-zero quantizers — must be a
    # clean ValueError (the phash media fixture depends on this staying
    # undecodable), never a crash or garbage pixels
    with pytest.raises(ValueError):
        decode_baseline_jpeg(synthesize_jpeg(8, 8))


def test_truncation_and_junk_rejected():
    good = encode_baseline_jpeg(_gradient(24, 24), quality=85)
    with pytest.raises(ValueError):
        decode_baseline_jpeg(good[: len(good) // 2])
    with pytest.raises(ValueError):
        decode_baseline_jpeg(b"\x00\x01 not a jpeg")
    # corrupt the entropy stream's tail: either a clean ValueError or a
    # decode (a flipped bit can still be a valid stream) — never a crash
    corrupt = bytearray(good)
    corrupt[-20] ^= 0xFF
    try:
        decode_baseline_jpeg(bytes(corrupt))
    except ValueError:
        pass


def test_encoder_input_validation():
    with pytest.raises(ValueError):
        encode_baseline_jpeg(_gradient(8, 8), quality=0)
    with pytest.raises(ValueError):
        encode_baseline_jpeg(_gradient(8, 8), subsampling="4:1:1")
    with pytest.raises(ValueError):
        encode_baseline_jpeg(np.zeros((4, 4, 2), dtype=np.uint8))


def test_crafted_dimensions_rejected_before_allocation():
    # 200-byte payload declaring a 65535x65535 frame: the SOF header is
    # attacker-controlled and must be rejected BEFORE any grid allocates
    import struct

    out = bytearray(b"\xff\xd8")
    dqt = b"\x00" + bytes(range(1, 65))
    out += b"\xff\xdb" + struct.pack(">H", len(dqt) + 2) + dqt
    sof = struct.pack(">BHHB", 8, 65535, 65535, 1) + b"\x01\x11\x00"
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    with pytest.raises(ValueError, match="max_pixels"):
        decode_baseline_jpeg(bytes(out))
    # and a legitimate image over a CALLER-LOWERED cap rejects the same way
    good = encode_baseline_jpeg(_gradient(40, 40), quality=85)
    with pytest.raises(ValueError, match="max_pixels"):
        decode_baseline_jpeg(good, max_pixels=100)


def test_empty_sos_body_is_a_clean_value_error():
    import struct

    good = bytearray(encode_baseline_jpeg(_gradient(16, 16), quality=85))
    sos = good.index(b"\xff\xda")
    crafted = bytes(good[:sos]) + b"\xff\xda\x00\x02" + b"\xff\xd9"
    with pytest.raises(ValueError):
        decode_baseline_jpeg(crafted)
    # the phash default decoder's contract: None, never a crash —
    # whatever a crafted stream raises
    from nexus_event_stream_spark.operators.phash import (
        default_image_decoder,
    )

    assert default_image_decoder(crafted) is None
