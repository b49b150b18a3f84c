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


# ---------------------------------------------------------------------------
# Progressive profile (SOF2) — r11
# ---------------------------------------------------------------------------
#
# The load-bearing pin is CROSS-PROFILE IDENTITY: progressive
# transmission reorders the SAME quantized coefficients, so a
# progressive encode at the same quality/subsampling must decode
# PIXEL-IDENTICAL to the baseline stream. The two entropy layers
# (run/size vs spectral bands + EOBn runs + correction bits) check each
# other rather than themselves.

from nexus_event_stream_spark.functions.jpeg_codec import (  # noqa: E402
    decode_jpeg,
    decode_progressive_jpeg,
    encode_progressive_jpeg,
)


def _assert_identical(base_bytes: bytes, prog_bytes: bytes) -> None:
    wb, hb, pb = decode_baseline_jpeg(base_bytes)
    wp, hp, pp = decode_progressive_jpeg(prog_bytes)
    assert (wb, hb) == (wp, hp) and len(pb) == len(pp)
    for a, c in zip(pb, pp):
        assert np.abs(a - c).max() == 0.0


@pytest.mark.parametrize("quality", [100, 85, 40])
def test_progressive_decodes_pixel_identical_to_baseline(quality):
    rng = np.random.RandomState(11)
    for px, sub in [
        (_gradient(24, 40), "4:4:4"),
        (rng.randint(0, 256, (33, 17, 3)).astype(np.uint8), "4:4:4"),
        (_rgb(32, 48), "4:2:0"),
    ]:
        base = encode_baseline_jpeg(px, quality=quality, subsampling=sub)
        prog = encode_progressive_jpeg(px, quality=quality, subsampling=sub)
        _assert_identical(base, prog)
        # the dispatcher routes each profile to its decoder
        assert decode_jpeg(base)[0] == decode_jpeg(prog)[0]
        # and the metadata parser agrees on the profile flag
        assert jpeg_meta(base)["progressive"] is False
        assert jpeg_meta(prog)["progressive"] is True


def test_spectral_selection_only_script():
    """Al=0 everywhere — pure spectral selection, no successive
    approximation: bands split three ways on luma."""
    px = _rgb(40, 24)
    script = [
        ([0, 1, 2], 0, 0, 0, 0),
        ([0], 1, 5, 0, 0),
        ([0], 6, 20, 0, 0),
        ([0], 21, 63, 0, 0),
        ([1], 1, 63, 0, 0),
        ([2], 1, 63, 0, 0),
    ]
    base = encode_baseline_jpeg(px, quality=70)
    prog = encode_progressive_jpeg(px, quality=70, scan_script=script)
    _assert_identical(base, prog)


def test_deep_successive_approximation_chain():
    """Al=3 first scans refined bit-by-bit down to 0 — every refinement
    level exercises the correction-bit decode path."""
    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, (48, 40)).astype(np.uint8)
    script = [
        ([0], 0, 0, 0, 3),
        ([0], 1, 63, 0, 3),
        ([0], 0, 0, 3, 2),
        ([0], 1, 63, 3, 2),
        ([0], 0, 0, 2, 1),
        ([0], 1, 63, 2, 1),
        ([0], 0, 0, 1, 0),
        ([0], 1, 63, 1, 0),
    ]
    base = encode_baseline_jpeg(px, quality=85)
    prog = encode_progressive_jpeg(px, quality=85, scan_script=script)
    _assert_identical(base, prog)


def test_eobn_runs_on_flat_regions():
    """A mostly-flat image drives long end-of-band runs (EOBn symbols
    with r > 0 and extra bits) in both first and refinement AC scans."""
    px = np.full((96, 96), 128, dtype=np.uint8)
    px[0, 0] = 255  # one busy block so the scan isn't ALL EOB
    base = encode_baseline_jpeg(px, quality=85)
    prog = encode_progressive_jpeg(px, quality=85)
    _assert_identical(base, prog)


def test_progressive_restart_interval_resync():
    px = _rgb(40, 56)
    with_ri = encode_progressive_jpeg(px, quality=75, restart_interval=3)
    without = encode_progressive_jpeg(px, quality=75)
    a = decode_progressive_jpeg(with_ri)
    b = decode_progressive_jpeg(without)
    for x, y in zip(a[2], b[2]):
        assert np.abs(x - y).max() == 0.0
    assert b"\xff\xd0" in with_ri and b"\xff\xd0" not in without


def test_progressive_rgb_convenience_matches_baseline():
    px = _rgb(24, 24)
    _, _, _, rgb_b = decode_jpeg_rgb(encode_baseline_jpeg(px, quality=90))
    _, _, _, rgb_p = decode_jpeg_rgb(encode_progressive_jpeg(px, quality=90))
    assert (rgb_b == rgb_p).all()


def test_progressive_profile_routing_errors():
    px = _gradient(16, 16)
    base = encode_baseline_jpeg(px, quality=85)
    prog = encode_progressive_jpeg(px, quality=85)
    # each decoder rejects the other profile by frame marker
    with pytest.raises(ValueError, match="baseline"):
        decode_progressive_jpeg(base)
    with pytest.raises(ValueError, match="progressive|codec"):
        decode_baseline_jpeg(prog)
    # arithmetic-coded frame marker → dispatcher rejects
    arith = bytearray(prog)
    arith[arith.index(b"\xff\xc2") + 1] = 0xCA
    with pytest.raises(ValueError, match="arithmetic|profile"):
        decode_jpeg(bytes(arith))
    # the synthesized progressive file (placeholder tables, no real
    # entropy data) stays a clean ValueError through the dispatcher
    with pytest.raises(ValueError):
        decode_jpeg(synthesize_jpeg(16, 16, progressive=True))
    # truncated mid-scan → clean error, and the phash decoder maps None
    from nexus_event_stream_spark.operators.phash import (
        default_image_decoder,
    )

    with pytest.raises(ValueError):
        decode_progressive_jpeg(prog[: len(prog) // 2])
    assert default_image_decoder(prog[: len(prog) // 2]) is None
    # a real progressive file now lights up in the default decoder
    assert default_image_decoder(prog) is not None


def test_progressive_scan_script_validation():
    px = _gradient(16, 16)
    with pytest.raises(ValueError, match="non-interleaved"):
        encode_progressive_jpeg(
            np.repeat(px[:, :, None], 3, 2),
            scan_script=[([0, 1, 2], 0, 0, 0, 0), ([0, 1], 1, 63, 0, 0)],
        )
    with pytest.raises(ValueError, match="Se"):
        encode_progressive_jpeg(px, scan_script=[([0], 0, 5, 0, 0)])
    with pytest.raises(ValueError, match="missing component"):
        encode_progressive_jpeg(px, scan_script=[([1], 0, 0, 0, 0)])
    # decoder-side: an interleaved AC scan is structurally invalid —
    # craft one by patching a valid single-comp AC SOS to name 3 comps
    prog = bytearray(encode_progressive_jpeg(_rgb(16, 16), quality=85))
    # find an AC SOS (ns=1): header FF DA len ns=1 ...
    i = prog.index(b"\xff\xda\x00\x08\x01")
    crafted = (
        bytes(prog[:i])
        + b"\xff\xda\x00\x0c\x03\x01\x00\x02\x00\x03\x00\x01\x3f\x00"
        + b"\xff\xd9"
    )
    with pytest.raises(ValueError, match="non-interleaved"):
        decode_progressive_jpeg(crafted)
