"""GIF87a/89a codec (functions/gif.py) + perceptual-dedup wiring.

The r12-verdict done-bar: a planted GIF re-encode of a PNG original
collapses in ``perceptual_dedup`` under the DEFAULT decoder; an
animated-GIF 2×-fps twin collapses in ``perceptual_video_dedup``;
hostile inputs (truncations, bit flips, bad LZW, decompression bombs)
raise ``ValueError`` from the codec and map to undecoded singletons at
the operator boundary — never an arbitrary crash.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from nexus_event_stream_spark.functions.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
    gif_meta,
    gray_palette,
)
from nexus_event_stream_spark.functions.png import encode_png, resize_nearest
from nexus_event_stream_spark.operators.phash import (
    default_image_decoder,
    default_video_decoder,
    perceptual_dedup,
)


def gray_of(frame_rgb: bytes, w: int, h: int) -> np.ndarray:
    a = np.frombuffer(frame_rgb, np.uint8).reshape(h, w, 3)
    return a[:, :, 0]


def make_img(seed: int, w: int = 64, h: int = 48) -> np.ndarray:
    rng = np.random.RandomState(seed)
    x = np.linspace(0, 1, w)[None, :]
    y = np.linspace(0, 1, h)[:, None]
    f = rng.uniform(0.5, 1.2, 4)
    img = (
        128
        + 70 * np.sin(2 * np.pi * f[0] * x) * np.cos(2 * np.pi * f[1] * y)
        + 40 * np.sin(2 * np.pi * (f[2] * x + f[3] * y))
    )
    return np.clip(img, 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# codec
# ---------------------------------------------------------------------------


def test_lzw_roundtrip_randomized():
    rng = np.random.RandomState(7)
    for _ in range(30):
        mcs = int(rng.randint(2, 9))
        n = int(rng.randint(1, 6000))
        data = bytes(rng.randint(0, 1 << mcs, n).astype(np.uint8))
        assert bytes(_lzw_decode(_lzw_encode(data, mcs), mcs, n)) == data


def test_lzw_table_overflow_roundtrip():
    """>4095 dictionary entries forces the encoder's clear-code reset
    path and the decoder's width ceiling."""
    rng = np.random.RandomState(1)
    data = bytes(rng.randint(0, 256, 60_000).astype(np.uint8))
    assert bytes(_lzw_decode(_lzw_encode(data, 8), 8, len(data))) == data


def test_still_roundtrip_gray_and_header():
    img = make_img(3)
    g = encode_gif(64, 48, [img.tobytes()], gray_palette())
    assert g[:6] == b"GIF87a"  # plain still needs no 89a extensions
    w, h, frames, delays = decode_gif(g)
    assert (w, h, len(frames), delays) == (64, 48, 1, [0])
    assert gray_of(frames[0], w, h).tobytes() == img.tobytes()


def test_interlaced_roundtrip():
    img = make_img(5, 48, 31)  # odd height exercises pass boundaries
    g = encode_gif(48, 31, [img.tobytes()], gray_palette(), interlace=True)
    w, h, frames, _ = decode_gif(g)
    assert gray_of(frames[0], w, h).tobytes() == img.tobytes()


def test_small_palette_roundtrip():
    pal = bytes([0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 0, 255])
    rng = np.random.RandomState(2)
    idx = bytes(rng.randint(0, 4, 12 * 9).astype(np.uint8))
    w, h, frames, _ = decode_gif(encode_gif(12, 9, [idx], pal))
    got = np.frombuffer(frames[0], np.uint8).reshape(9, 12, 3)
    exp = (
        np.frombuffer(pal, np.uint8)
        .reshape(4, 3)[np.frombuffer(idx, np.uint8)]
        .reshape(9, 12, 3)
    )
    assert (got == exp).all()


def test_animated_roundtrip_delays_and_meta():
    a, b = make_img(1), make_img(2)
    g = encode_gif(
        64, 48, [a.tobytes(), b.tobytes()], gray_palette(),
        delays_cs=[10, 25], loop=0,
    )
    assert g[:6] == b"GIF89a"
    w, h, frames, delays = decode_gif(g)
    assert delays == [10, 25]
    assert gray_of(frames[0], w, h).tobytes() == a.tobytes()
    assert gray_of(frames[1], w, h).tobytes() == b.tobytes()
    m = gif_meta(g)
    assert m == {
        "version": "89a", "width": 64, "height": 48, "n_frames": 2,
        "gct_size": 256, "loop": 0, "total_delay_cs": 35,
    }


def test_transparency_composites_over_previous_frame():
    """A transparent index leaves the previously-rendered canvas pixel —
    the delta-frame mechanism animated GIFs rely on."""
    base = np.full((8, 8), 200, np.uint8)
    delta = np.full((8, 8), 7, np.uint8)  # 7 = transparent everywhere...
    delta[0, 0] = 50  # ...except one pixel
    g = encode_gif(
        8, 8, [base.tobytes(), delta.tobytes()], gray_palette(),
        delays_cs=[5, 5], transparent=7,
    )
    w, h, frames, _ = decode_gif(g)
    f2 = gray_of(frames[1], w, h)
    assert f2[0, 0] == 50
    assert (f2.ravel()[1:] == 200).all()  # transparent pixels persisted


def test_disposal_background_and_previous():
    """Disposal 2 clears the frame's rectangle to the background color
    before the next frame; disposal 3 restores the pre-frame canvas."""
    pal = gray_palette()
    a = np.full((4, 4), 100, np.uint8)
    b = np.full((4, 4), 180, np.uint8)
    t = np.full((4, 4), 9, np.uint8)  # fully transparent probe frame

    def build(disposal: int) -> bytes:
        # frame b carries the disposal mode; frame t then reveals what
        # the canvas was restored to
        out = bytearray(b"GIF89a")
        out += struct.pack("<HHBBB", 4, 4, 0x87, 0, 0)  # GCT 256, bg=0
        out += pal
        for frame, disp, trans in ((a, 0, None), (b, disposal, None), (t, 0, 9)):
            packed = (disp & 7) << 2 | (1 if trans is not None else 0)
            out += b"\x21\xf9\x04" + bytes([packed])
            out += struct.pack("<H", 5) + bytes([trans or 0, 0])
            out += b"\x2c" + struct.pack("<HHHHB", 0, 0, 4, 4, 0)
            out += bytes([8]) + b""
            from nexus_event_stream_spark.functions.gif import (
                _lzw_encode as enc,
                _sub_blocks as sb,
            )
            out += sb(enc(frame.tobytes(), 8))
        out += b"\x3b"
        return bytes(out)

    for disposal, want in ((2, 0), (3, 100)):
        w, h, frames, _ = decode_gif(build(disposal))
        assert len(frames) == 3
        probe = gray_of(frames[2], w, h)
        assert (probe == want).all(), (disposal, probe[0, 0])


def test_hostile_inputs_raise_valueerror_only():
    """Truncations at every boundary + random bit flips: the decoder
    either returns a valid decode or raises ValueError — nothing else.
    (The test_jpeg.py fuzz discipline.)"""
    img = make_img(4, 24, 16)
    g = encode_gif(
        24, 16, [img.tobytes(), img.tobytes()], gray_palette(),
        delays_cs=[5, 5], loop=0,
    )
    for cut in range(0, len(g), 7):
        try:
            decode_gif(g[:cut])
        except ValueError:
            pass
        try:
            gif_meta(g[:cut])
        except ValueError:
            pass
    rng = np.random.RandomState(0)
    for _ in range(300):
        mut = bytearray(g)
        for _ in range(int(rng.randint(1, 4))):
            mut[int(rng.randint(len(mut)))] ^= 1 << int(rng.randint(8))
        try:
            decode_gif(bytes(mut))
        except ValueError:
            pass


def test_decompression_bomb_capped():
    bomb = bytearray(b"GIF87a")
    bomb += struct.pack("<HHBBB", 65535, 65535, 0x80, 0, 0)
    bomb += bytes(6)  # 2-entry GCT
    with pytest.raises(ValueError, match="too large"):
        decode_gif(bytes(bomb))


def test_many_tiny_frames_bomb_capped():
    """A KB-sized GIF whose logical screen passes the per-frame cap but
    whose many 1x1 frames each force a full-canvas copy must stop at the
    TOTAL-output cap instead of materialising gigabytes (r13 advice)."""
    w = h = 4000  # 16M pixels: at the per-frame cap, 48 MB RGB canvas
    bomb = bytearray(b"GIF87a")
    bomb += struct.pack("<HHBBB", w, h, 0x80, 0, 0)
    bomb += bytes(6)  # 2-entry GCT
    # 1x1 frame: LZW mcs=2 → codes clear(4), 0, end(5) LSB-first
    frame = (
        b"\x2c" + struct.pack("<HHHHB", 0, 0, 1, 1, 0)
        + b"\x02" + b"\x02\x44\x01" + b"\x00"
    )
    bomb += frame * 8
    bomb += b"\x3b"
    assert len(bomb) < 200  # the whole point: tiny input, huge output
    with pytest.raises(ValueError, match="animation too large"):
        decode_gif(bytes(bomb))


def test_gif_meta_truncations_raise_valueerror_only():
    """gif_meta at EVERY truncation point: ValueError or a valid dict,
    never IndexError (r13 advice — the phash/scrub callers catch only
    ValueError)."""
    img = make_img(5, 16, 12)
    g = encode_gif(
        16, 12, [img.tobytes()] * 2, gray_palette(),
        delays_cs=[3, 3], loop=2,
    )
    for cut in range(len(g)):
        try:
            gif_meta(g[:cut])
        except ValueError:
            pass


def test_image_decoder_tolerates_nonvalueerror_gif_failures(monkeypatch):
    """The tolerant-decoder contract is None-never-crash: a decode_gif
    failure beyond ValueError (MemoryError-class) degrades to undecoded
    instead of killing the micro-batch (r13 advice)."""
    import nexus_event_stream_spark.functions.gif as gifmod
    from nexus_event_stream_spark.operators.phash import (
        default_video_decoder,
    )

    def boom(_payload):
        raise MemoryError("allocation refused")

    monkeypatch.setattr(gifmod, "decode_gif", boom)
    payload = b"GIF89a" + bytes(32)
    assert default_image_decoder(payload) is None
    assert default_video_decoder(payload) is None


def test_encode_validation():
    with pytest.raises(ValueError, match="power of two"):
        encode_gif(2, 2, [bytes(4)], bytes(9))
    with pytest.raises(ValueError, match="beyond palette"):
        encode_gif(2, 2, [bytes([0, 1, 2, 3])], bytes([0] * 6))
    with pytest.raises(ValueError, match="pixels"):
        encode_gif(2, 2, [bytes(3)], gray_palette())


# ---------------------------------------------------------------------------
# default-decoder wiring + dedup pins (the verdict done-bar)
# ---------------------------------------------------------------------------


def test_default_image_decoder_decodes_gif():
    img = make_img(6)
    gray = default_image_decoder(
        encode_gif(64, 48, [img.tobytes()], gray_palette())
    )
    assert gray is not None and gray.shape == (48, 64)
    assert np.abs(gray - img.astype(np.float64)).max() < 1e-9
    assert default_image_decoder(b"GIF89a\x00\x01") is None  # tolerant


def test_gif_reencode_collapses_in_perceptual_dedup(spark):
    """PNG original + GIF re-encode + resized GIF collapse to one
    keeper under the DEFAULT decoder; a distinct GIF survives; a
    truncated GIF degrades to an undecoded singleton."""
    img = make_img(11)
    up = resize_nearest(img.tobytes(), 64, 48, 128, 96, 1)
    g_ok = encode_gif(64, 48, [img.tobytes()], gray_palette())
    rows = [
        (0, encode_png(64, 48, img.tobytes(), 0)),
        (1, g_ok),
        (2, encode_gif(128, 96, [up], gray_palette())),
        (10, encode_gif(64, 48, [make_img(12).tobytes()], gray_palette())),
        (20, g_ok[: len(g_ok) // 2]),
    ]
    out = perceptual_dedup(
        spark.createDataFrame(rows, "media_id long, payload binary")
    ).collect()
    keep = {int(r.media_id): int(r.keep_id) for r in out}
    decoded = {int(r.media_id): bool(r.decoded) for r in out}
    assert keep[0] == keep[1] == keep[2] == 0
    assert keep[10] == 10 and decoded[10]
    assert keep[20] == 20 and not decoded[20]


def test_animated_gif_fps_twin_collapses_in_video_dedup(spark):
    """An animated GIF and its 2×-fps re-encode of the SAME timeline
    collapse in perceptual_video_dedup under the DEFAULT decoder (the
    APNG/MJPEG pin, now for GIF)."""
    from nexus_event_stream_spark.operators.phash import (
        perceptual_video_dedup,
    )

    def frames_of(seed: int, n: int, dt: float) -> list[bytes]:
        rng = np.random.RandomState(seed)
        grid = rng.randint(30, 226, size=(8, 12)).astype(np.float64)
        phase = rng.uniform(0, 2 * np.pi, 12)
        out = []
        for i in range(n):
            drift = 15.0 * np.sin(0.12 * (i * dt) + phase)[None, :]
            f = np.clip(grid + drift, 0, 255).astype(np.uint8)
            out.append(np.repeat(np.repeat(f, 4, 0), 4, 1).tobytes())
        return out

    def clip(seed: int, fps2: bool = False) -> bytes:
        n, dt = (12, 0.5) if fps2 else (6, 1.0)
        return encode_gif(
            48, 32, frames_of(seed, n, dt), gray_palette(),
            delays_cs=[int(10 * dt)] * n, loop=0,
        )

    media = spark.createDataFrame(
        [
            (0, clip(21)),
            (1, clip(21, fps2=True)),
            (2, clip(22)),
        ],
        "media_id long, payload binary",
    )
    keep = {
        r.media_id: r.keep_id
        for r in perceptual_video_dedup(media, max_hamming=8).collect()
    }
    assert keep[0] == keep[1] == 0
    assert keep[2] == 2


def test_default_video_decoder_gif_and_still():
    a, b = make_img(1, 16, 12), make_img(2, 16, 12)
    g = encode_gif(
        16, 12, [a.tobytes(), b.tobytes()], gray_palette(), delays_cs=[5, 5]
    )
    frames = default_video_decoder(g)
    assert frames is not None and len(frames) == 2
    assert np.abs(frames[1] - b.astype(np.float64)).max() < 1e-9
    # a 1-frame GIF is a 1-frame video, same as plain PNG
    still = encode_gif(16, 12, [a.tobytes()], gray_palette())
    assert len(default_video_decoder(still)) == 1
    assert default_video_decoder(b"GIF87a") is None


# ---------------------------------------------------------------------------
# property tests (hypothesis): codec invariants over generated inputs
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=40, deadline=None)
@given(
    data=st.binary(min_size=1, max_size=2000),
    mcs=st.integers(min_value=2, max_value=8),
)
def test_lzw_roundtrip_property(data, mcs):
    clamped = bytes(b % (1 << mcs) for b in data)
    assert bytes(
        _lzw_decode(_lzw_encode(clamped, mcs), mcs, len(clamped))
    ) == clamped


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=30),
    n_frames=st.integers(min_value=1, max_value=3),
    interlace=st.booleans(),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_gif_roundtrip_property(w, h, n_frames, interlace, seed):
    """Any frame stack round-trips byte-exact through encode → decode
    (grayscale identity palette ⇒ red channel == index stream)."""
    rng = np.random.RandomState(seed)
    frames = [
        bytes(rng.randint(0, 256, w * h).astype(np.uint8))
        for _ in range(n_frames)
    ]
    delays = [int(rng.randint(0, 100)) for _ in range(n_frames)]
    g = encode_gif(
        w, h, frames, gray_palette(),
        delays_cs=delays if n_frames > 1 else None,
        interlace=interlace,
    )
    gw, gh, got, got_delays = decode_gif(g)
    assert (gw, gh) == (w, h) and len(got) == n_frames
    for want, fr in zip(frames, got):
        assert gray_of(fr, w, h).tobytes() == want
    if n_frames > 1:
        assert got_delays == delays
    m = gif_meta(g)
    assert (m["width"], m["height"], m["n_frames"]) == (w, h, n_frames)
