"""JPEG pixel codec — pure stdlib + numpy, no image libraries.

JPEG is the dominant crawled image format; without a pixel decode its
perceptual hash is NULL and the media dedup tier goes blind on most of a
real crawl. This module implements the two Huffman DCT profiles of
ITU-T T.81 that crawled JPEGs actually use — baseline-sequential
(SOF0/1, the vast majority) and progressive (SOF2, most of the rest) —
from the public spec:

- ``decode_baseline_jpeg``: full baseline decoder — marker walk (reuses
  functions/jpeg.py ``_segments``), DQT (8/16-bit), DHT canonical
  Huffman tables, SOF0/SOF1 with arbitrary sampling factors (4:4:4,
  4:2:0, 4:2:2, ...), DRI/RSTn restart intervals, FF00 byte
  de-stuffing, dequantize → inverse zigzag → vectorized 2-D IDCT (one
  einsum over all blocks of a component) → per-component nearest
  upsample to frame resolution.
- ``decode_progressive_jpeg``: progressive decoder (T.81 Annex G) —
  multi-scan spectral selection + successive approximation over
  per-component quantized-coefficient accumulators (DC first/refine,
  AC first with EOBn end-of-band runs, AC refinement with
  correction-bit insertion), interleaved DC scans + non-interleaved AC
  scans, per-scan restart intervals; shares the dequant/IDCT/upsample
  tail with the baseline path.
- ``decode_jpeg``: the profile dispatcher media kernels call.
  Arithmetic-coded (SOF9+) and lossless files raise ``ValueError`` —
  they route through the ``decoder_fn`` deployment boundary, same as
  video codecs.
- ``encode_baseline_jpeg`` / ``encode_progressive_jpeg``: real encoders
  (grayscale or YCbCr 4:4:4 / 4:2:0, libjpeg-style quality scaling of
  the Annex-K quantization tables, optional restart intervals) — the
  golden-target generators for the decoders' roundtrip pins. Both emit
  the SAME quantized coefficients at the same settings, so a
  progressive encode must decode PIXEL-IDENTICAL to the baseline
  stream — the cross-profile pin that checks the two entropy layers
  against each other rather than against themselves. The Huffman
  tables are simple canonical codes declared in the DHT segments
  (decoders always build tables from the stream, so any valid prefix
  code roundtrips and interoperates).

Decoder exactness: everything except the IDCT is integer-exact per the
spec; the IDCT is float64 (T.81 Annex A defines the ideal transform and
bounds conforming-decoder error; float64 is far inside the bound).
Roundtrip error at quality=100 (all-ones quant tables) is pinned ≤ 2
levels in tests/test_jpeg_codec.py.

Reference parity: none — north-star multimodal tier (the reference has
no media handling). Format facts from the public ITU-T T.81 / JFIF
specs, same provenance note as functions/jpeg.py.
"""

from __future__ import annotations

import struct

from nexus_event_stream_spark.functions.jpeg import (
    SOS,
    _segments,
)

_SOF_BASELINE = {0xC0, 0xC1}
_SOF_PROGRESSIVE = {0xC2, 0xC6, 0xCA, 0xCE}
_SOF_OTHER = {0xC3, 0xC5, 0xC7, 0xC9, 0xCB, 0xCD, 0xCF}
_DQT, _DHT, _DRI = 0xDB, 0xC4, 0xDD

#: Annex K luminance / chrominance quantization tables (natural order).
_QUANT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
_QUANT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]


def _zigzag_order() -> list[int]:
    """Natural-order index for each zigzag position (diagonal walk,
    odd diagonals descend, even ascend — derived, not hardcoded)."""
    out = []
    for s in range(15):
        ij = [(i, s - i) for i in range(min(s, 7), -1, -1) if 0 <= s - i < 8]
        if s % 2 == 1:
            ij = ij[::-1]
        out.extend(i * 8 + j for i, j in ij)
    return out


_ZIGZAG = _zigzag_order()


def _dct_matrix():
    """Orthonormal 8-point DCT-II matrix M: forward S = M s Mᵀ,
    inverse s = Mᵀ S M — the T.81 Annex A transform. Cached: the
    encoder's per-block path must not rebuild 64 cosines per call."""
    import numpy as np

    global _DCT_M
    if _DCT_M is None:
        m = np.zeros((8, 8), dtype=np.float64)
        for u in range(8):
            c = np.sqrt(0.125) if u == 0 else np.sqrt(0.25)
            for x in range(8):
                m[u, x] = c * np.cos((2 * x + 1) * u * np.pi / 16)
        _DCT_M = m
    return _DCT_M


_DCT_M = None


# ---------------------------------------------------------------------------
# Huffman machinery (canonical codes per T.81 Annex C)
# ---------------------------------------------------------------------------


def _build_decode_table(bits: list[int], vals: bytes) -> dict:
    """(length, code) -> symbol from a DHT BITS/HUFFVAL declaration."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if k >= len(vals):
                raise ValueError("DHT: fewer values than BITS declares")
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits: list[int], vals: list[int]) -> dict:
    """symbol -> (code, length), same canonical assignment."""
    table: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


#: Encoder-side canonical tables: 12 DC categories at length 5, the 162
#: baseline AC symbols (EOB, ZRL, 16 runs × 10 sizes) at length 9. Any
#: valid prefix code interoperates — decoders build from the DHT stream.
_ENC_DC_BITS = [0, 0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_DC_VALS = list(range(12))
_ENC_AC_VALS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_ENC_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0]


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


class _BitReader:
    """MSB-first bit reader over de-stuffed entropy bytes."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("entropy stream exhausted")
            self.acc = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map a t-bit magnitude to its signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _category(v: int) -> int:
    """Bit category of a coefficient value (0 for 0)."""
    return abs(v).bit_length()


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _quality_tables(quality: int):
    """libjpeg-style quality scaling of the Annex-K tables (clipped to
    [1, 255] — baseline requires 8-bit quant values)."""
    import numpy as np

    if not 1 <= quality <= 100:
        raise ValueError("quality must be in [1, 100]")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (_QUANT_LUMA, _QUANT_CHROMA):
        t = (np.array(base, dtype=np.int64) * scale + 50) // 100
        out.append(np.clip(t, 1, 255).reshape(8, 8))
    return out


def _encode_blocks(blocks, quant, dc_tab, ac_tab, writer, dc_pred):
    """DCT+quantize+entropy-code a (n, 8, 8) stack; returns new DC pred."""
    import numpy as np

    m = _dct_matrix()
    coeffs = np.einsum("ux,nxy,vy->nuv", m, blocks - 128.0, m)
    q = np.round(coeffs / quant).astype(np.int64)
    zz = np.array(_ZIGZAG)
    for n in range(q.shape[0]):
        flat = q[n].reshape(64)[zz]
        diff = int(flat[0]) - dc_pred
        dc_pred = int(flat[0])
        t = _category(diff)
        code, length = dc_tab[t]
        writer.write(code, length)
        if t:
            writer.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
        run = 0
        nz = np.nonzero(flat[1:])[0]
        last_nz = int(nz[-1]) + 1 if len(nz) else 0
        for i in range(1, last_nz + 1):
            v = int(flat[i])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = ac_tab[0xF0]  # ZRL
                writer.write(code, length)
                run -= 16
            s = _category(v)
            code, length = ac_tab[(run << 4) | s]
            writer.write(code, length)
            writer.write(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if last_nz < 63:
            code, length = ac_tab[0x00]  # EOB
            writer.write(code, length)
    return dc_pred


def _tile_blocks(plane):
    """(H, W) float plane (H, W multiples of 8) -> (n, 8, 8) stack in
    row-major block order."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )


def encode_baseline_jpeg(
    pixels,
    quality: int = 85,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """Encode an (H, W) grayscale or (H, W, 3) RGB uint8 array as a
    baseline-sequential JFIF JPEG. ``subsampling`` is ``"4:4:4"`` or
    ``"4:2:0"`` (ignored for grayscale); ``restart_interval`` > 0 emits
    DRI + RSTn markers every that many MCUs (decoder-resync pins)."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.float64)
    if px.ndim == 2:
        planes = [px]
    elif px.ndim == 3 and px.shape[2] == 3:
        r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    else:
        raise ValueError("pixels must be (H, W) or (H, W, 3)")
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    h, w = px.shape[:2]
    if h < 1 or w < 1 or h > 0xFFFF or w > 0xFFFF:
        raise ValueError("dimensions must be in [1, 65535]")
    ncomp = len(planes)
    sub = subsampling == "4:2:0" and ncomp == 3
    samp = [(2, 2), (1, 1), (1, 1)] if sub else [(1, 1)] * ncomp
    hmax = max(s[0] for s in samp[:ncomp])
    vmax = max(s[1] for s in samp[:ncomp])
    qluma, qchroma = _quality_tables(quality)

    out = bytearray(b"\xff\xd8")
    # JFIF APP0
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
    # DQT (zigzag order on the wire)
    zz = np.array(_ZIGZAG)
    for tq, tbl in enumerate([qluma, qchroma][: 1 if ncomp == 1 else 2]):
        body = bytes([tq]) + bytes(tbl.reshape(64)[zz].astype(np.uint8))
        out += b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body
    # SOF0
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for i in range(ncomp):
        sof += struct.pack(
            ">BBB", i + 1, (samp[i][0] << 4) | samp[i][1], 0 if i == 0 else 1
        )
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    # DHT: one DC + one AC table per class pair (shared across chroma)
    n_tables = 1 if ncomp == 1 else 2
    for th in range(n_tables):
        for tc, (bits, vals) in enumerate(
            [(_ENC_DC_BITS, _ENC_DC_VALS), (_ENC_AC_BITS, _ENC_AC_VALS)]
        ):
            body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
            out += b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    sos = bytes([ncomp])
    for i in range(ncomp):
        td_ta = 0 if i == 0 else 0x11
        sos += struct.pack(">BB", i + 1, td_ta)
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    dc_tab = _build_encode_table(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_tab = _build_encode_table(_ENC_AC_BITS, _ENC_AC_VALS)

    # pad planes (edge replication) to MCU multiples, downsample chroma
    mcu_h, mcu_w = 8 * vmax, 8 * hmax
    mcus_y = -(-h // mcu_h)
    mcus_x = -(-w // mcu_w)
    comp_blocks = []
    for i, plane in enumerate(planes):
        hi, vi = samp[i]
        # component resolution (box-mean downsample for chroma)
        if (hi, vi) != (hmax, vmax):
            fy, fx = vmax // vi, hmax // hi
            py = np.pad(
                plane,
                ((0, (-h) % fy), (0, (-w) % fx)),
                mode="edge",
            )
            plane = py.reshape(
                py.shape[0] // fy, fy, py.shape[1] // fx, fx
            ).mean(axis=(1, 3))
        ch, cw = plane.shape
        th_, tw_ = mcus_y * vi * 8, mcus_x * hi * 8
        plane = np.pad(
            plane, ((0, th_ - ch), (0, tw_ - cw)), mode="edge"
        )
        comp_blocks.append(plane)

    writer = _BitWriter()
    dc_pred = [0] * ncomp
    rst = 0
    since_rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and since_rst == restart_interval:
                writer.flush()
                out += writer.out
                writer = _BitWriter()
                out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                since_rst = 0
                dc_pred = [0] * ncomp
            for i in range(ncomp):
                hi, vi = samp[i]
                quant = qluma if i == 0 else qchroma
                for by in range(vi):
                    for bx in range(hi):
                        y0 = (my * vi + by) * 8
                        x0 = (mx * hi + bx) * 8
                        block = comp_blocks[i][y0 : y0 + 8, x0 : x0 + 8]
                        dc_pred[i] = _encode_blocks(
                            block[None, :, :],
                            quant,
                            dc_tab,
                            ac_tab,
                            writer,
                            dc_pred[i],
                        )
            since_rst += 1
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def _parse_dqt(body: bytes, quant: dict) -> None:
    """DQT segment → natural-order (8, 8) float tables keyed by id."""
    import numpy as np

    pos = 0
    while pos < len(body):
        pq, tq = body[pos] >> 4, body[pos] & 0x0F
        pos += 1
        n = 64 * (2 if pq else 1)
        if pos + n > len(body):
            raise ValueError("truncated DQT")
        if pq:
            vals = np.frombuffer(body[pos : pos + n], dtype=">u2").astype(
                np.float64
            )
        else:
            vals = np.frombuffer(
                body[pos : pos + n], dtype=np.uint8
            ).astype(np.float64)
        if (vals == 0).any():
            raise ValueError("DQT: zero quantizer value")
        tbl = np.empty(64, dtype=np.float64)
        tbl[np.array(_ZIGZAG)] = vals  # wire is zigzag order
        quant[tq] = tbl.reshape(8, 8)
        pos += n


def _parse_dht(body: bytes, huff: dict) -> None:
    """DHT segment → (class, id) -> decode table entries."""
    pos = 0
    while pos + 17 <= len(body):
        tc, th = body[pos] >> 4, body[pos] & 0x0F
        bits = list(body[pos + 1 : pos + 17])
        nvals = sum(bits)
        pos += 17
        if pos + nvals > len(body):
            raise ValueError("truncated DHT")
        huff[(tc, th)] = _build_decode_table(bits, body[pos : pos + nvals])
        pos += nvals
    if pos != len(body):
        raise ValueError("trailing DHT bytes")


def _split_intervals(scan_bytes: bytes) -> list[bytes]:
    """Split an entropy-coded scan at restart markers and de-stuff each
    interval (FF00 → FF)."""
    intervals: list[bytes] = []
    cur = bytearray()
    i = 0
    n = len(scan_bytes)
    while i < n:
        b = scan_bytes[i]
        if b == 0xFF and i + 1 < n:
            nxt = scan_bytes[i + 1]
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                intervals.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
        cur.append(b)
        i += 1
    intervals.append(bytes(cur))
    return intervals


def _reconstruct(w: int, h: int, comps, grids):
    """Shared decoder tail: vectorized IDCT per component grid of
    DEQUANTIZED frequency blocks, crop to component resolution, nearest
    upsample to frame resolution. Returns ``(w, h, [plane, ...])``."""
    import numpy as np

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    m = _dct_matrix()
    planes = []
    for ci, (_cid, hi, vi, _tq) in enumerate(comps):
        g = grids[ci]
        blocks = _tile_blocks(g)
        pix = np.einsum("ux,nuv,vy->nxy", m, blocks, m) + 128.0
        gh, gw = g.shape
        plane = (
            pix.reshape(gh // 8, gw // 8, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(gh, gw)
        )
        cw = -(-w * hi // hmax)
        ch = -(-h * vi // vmax)
        plane = plane[:ch, :cw]
        if (hi, vi) != (hmax, vmax):
            plane = np.repeat(
                np.repeat(plane, vmax // vi, axis=0), hmax // hi, axis=1
            )
        planes.append(np.clip(plane[:h, :w], 0.0, 255.0))
    return w, h, planes


def decode_baseline_jpeg(payload: bytes, max_pixels: int = 8_000_000):
    """Decode a baseline-sequential JPEG to full-resolution component
    planes: ``(width, height, [plane, ...])`` with each plane a float64
    (H, W) array in [0, 255] (Y/Cb/Cr for 3-component JFIF files, the
    single gray plane for 1-component). Raises ``ValueError`` on
    progressive / arithmetic / lossless profiles and on any structural
    or entropy-stream corruption (tolerant callers catch it — the
    ``decoder_fn`` boundary convention).

    ``max_pixels`` bounds the frame area BEFORE any allocation: the SOF
    header is attacker-controlled (a 200-byte payload can declare
    65535×65535 = 34 GB of grids) and the per-MCU Huffman loop is
    Python-bound, so an unbounded decode is an executor-OOM/stall
    vector on the default media-ingest path. Frames above the cap raise
    ``ValueError`` and ride the ``decoder_fn`` boundary like
    progressive files; raise the cap only with the memory and patience
    to back it (8 MP ≈ a few hundred MB of float64 planes)."""
    import numpy as np

    quant: dict[int, object] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> decode table
    restart_interval = 0
    frame = None  # (h, w, [(cid, hi, vi, tq), ...])
    scan = None  # ([(comp_idx, td, ta), ...], scan_bytes)

    for marker, _off, b0, b1, s0, s1 in _segments(payload):
        if b0 is None:
            continue
        body = payload[b0:b1]
        if marker == _DQT:
            _parse_dqt(body, quant)
        elif marker == _DHT:
            _parse_dht(body, huff)
        elif marker == _DRI:
            if len(body) < 2:
                raise ValueError("truncated DRI")
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker in _SOF_PROGRESSIVE:
            raise ValueError(
                "progressive JPEG: route through a codec-backed decoder_fn"
            )
        elif marker in _SOF_OTHER:
            raise ValueError("non-baseline JPEG profile")
        elif marker in _SOF_BASELINE:
            if len(body) < 6:
                raise ValueError("truncated SOF")
            prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("baseline requires 8-bit precision")
            if h == 0 or w == 0 or ncomp == 0:
                raise ValueError("empty frame")
            if h * w > max_pixels:
                raise ValueError(
                    f"frame {w}x{h} exceeds max_pixels={max_pixels}"
                )
            if len(body) < 6 + 3 * ncomp:
                raise ValueError("truncated SOF components")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = struct.unpack(
                    ">BBB", body[6 + 3 * i : 9 + 3 * i]
                )
                hi, vi = hv >> 4, hv & 0x0F
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise ValueError("invalid sampling factors")
                comps.append((cid, hi, vi, tq))
            frame = (h, w, comps)
        elif marker == SOS:
            if frame is None:
                raise ValueError("SOS before SOF")
            if not body:
                raise ValueError("empty SOS header")
            ns = body[0]
            if len(body) < 1 + 2 * ns + 3:
                raise ValueError("truncated SOS header")
            comp_ids = [c[0] for c in frame[2]]
            sel = []
            for i in range(ns):
                cs, tdta = body[1 + 2 * i], body[2 + 2 * i]
                if cs not in comp_ids:
                    raise ValueError("SOS names unknown component")
                sel.append((comp_ids.index(cs), tdta >> 4, tdta & 0x0F))
            if ns != len(comp_ids):
                raise ValueError(
                    "baseline decoder expects a single interleaved scan"
                )
            scan = (sel, payload[s0:s1])
            break  # baseline: one scan holds the whole image

    if frame is None or scan is None:
        raise ValueError("no SOF/SOS found")
    h, w, comps = frame
    sel, scan_bytes = scan
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # split the entropy stream at restart markers, de-stuff each interval
    intervals = _split_intervals(scan_bytes)

    # per-component coefficient block grids
    grids = []
    for _cid, hi, vi, _tq in comps:
        grids.append(
            np.zeros((mcus_y * vi * 8, mcus_x * hi * 8), dtype=np.float64)
        )

    def tables_for(ci: int):
        for idx, td, ta in sel:
            if idx == ci:
                dc = huff.get((0, td))
                ac = huff.get((1, ta))
                if dc is None or ac is None:
                    raise ValueError("scan references undeclared DHT table")
                return dc, ac
        raise ValueError("component missing from scan")

    # hoist the per-block constants out of the MCU loop — the loop is
    # Python-bound already; re-resolving tables per MCU and rebuilding
    # the zigzag index array per BLOCK was pure overhead on every
    # crawled JPEG
    zz = np.array(_ZIGZAG)
    comp_tables = []
    for ci, (_cid, _hi, _vi, tq) in enumerate(comps):
        qt = quant.get(tq)
        if qt is None:
            raise ValueError("frame references undeclared DQT table")
        dc_tab, ac_tab = tables_for(ci)
        comp_tables.append((dc_tab, ac_tab, qt))

    reader = _BitReader(intervals[0])
    interval_idx = 0
    dc_pred = [0] * len(comps)
    since_rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and since_rst == restart_interval:
                interval_idx += 1
                if interval_idx >= len(intervals):
                    raise ValueError("missing restart interval data")
                reader = _BitReader(intervals[interval_idx])
                dc_pred = [0] * len(comps)
                since_rst = 0
            for ci, (_cid, hi, vi, tq) in enumerate(comps):
                dc_tab, ac_tab, qt = comp_tables[ci]
                for by in range(vi):
                    for bx in range(hi):
                        flat = np.zeros(64, dtype=np.float64)
                        t = reader.read_symbol(dc_tab)
                        if t > 11:
                            raise ValueError("invalid DC category")
                        diff = _extend(reader.read_bits(t), t)
                        dc_pred[ci] += diff
                        flat[0] = dc_pred[ci]
                        k = 1
                        while k < 64:
                            rs = reader.read_symbol(ac_tab)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past block end")
                            flat[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        block = np.empty(64, dtype=np.float64)
                        block[zz] = flat
                        y0 = (my * vi + by) * 8
                        x0 = (mx * hi + bx) * 8
                        grids[ci][y0 : y0 + 8, x0 : x0 + 8] = (
                            block.reshape(8, 8) * qt
                        )
            since_rst += 1

    # vectorized IDCT per component, crop, upsample to frame resolution
    return _reconstruct(w, h, comps, grids)


# ---------------------------------------------------------------------------
# Progressive profile (SOF2, Huffman) — ITU-T T.81 Annex G
#
# Progressive transmission reorders the SAME quantized coefficients a
# baseline stream carries into multiple scans: spectral selection (each
# scan covers a zigzag band [Ss, Se]) and successive approximation (a
# first scan sends coefficients point-transformed by 2^Al, refinement
# scans send one bit of precision each). That identity is the codec's
# load-bearing correctness pin: a progressive encode of the same
# coefficients must decode PIXEL-IDENTICAL to the baseline stream.
# ---------------------------------------------------------------------------

#: Progressive AC symbol set: EOBn run codes (r<<4, r=0..14), ZRL, and
#: the 160 run/size codes — all at one canonical length (176 < 2^9 - 1,
#: so the all-ones code stays unassigned per the spec recommendation).
_ENC_PAC_VALS = (
    [r << 4 for r in range(15)]
    + [0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
_ENC_PAC_BITS = [0, 0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0]


def _default_scan_script(ncomp: int):
    """The libjpeg-shaped default progression: DC first at Al=1 then a
    DC refinement; luma AC split spectrally (1-5 then 6-63) at Al=2 with
    two successive-approximation refinements; chroma AC whole-band at
    Al=1 with one refinement. Every decoder code path (spectral bands,
    EOBn runs, new-nonzero + correction-bit refinement) is exercised."""
    if ncomp == 1:
        return [
            ([0], 0, 0, 0, 1),
            ([0], 1, 5, 0, 2),
            ([0], 6, 63, 0, 2),
            ([0], 1, 63, 2, 1),
            ([0], 0, 0, 1, 0),
            ([0], 1, 63, 1, 0),
        ]
    return [
        ([0, 1, 2], 0, 0, 0, 1),
        ([0], 1, 5, 0, 2),
        ([2], 1, 63, 0, 1),
        ([1], 1, 63, 0, 1),
        ([0], 6, 63, 0, 2),
        ([0], 1, 63, 2, 1),
        ([0, 1, 2], 0, 0, 1, 0),
        ([2], 1, 63, 1, 0),
        ([0], 1, 63, 1, 0),
        ([1], 1, 63, 1, 0),
    ]


class _ProgressiveACState:
    """Per-scan encoder state for EOBn run-length coding: the run of
    blocks whose band ended early, plus the correction bits buffered
    behind the pending EOB symbol (refinement scans only)."""

    def __init__(self, writer: _BitWriter, ac_tab: dict) -> None:
        self.writer = writer
        self.ac_tab = ac_tab
        self.eobrun = 0
        self.pending: list[int] = []

    def flush(self) -> None:
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            code, length = self.ac_tab[nbits << 4]
            self.writer.write(code, length)
            if nbits:
                self.writer.write(
                    self.eobrun & ((1 << nbits) - 1), nbits
                )
            self.eobrun = 0
            for b in self.pending:
                self.writer.write(b, 1)
            self.pending = []

    def end_block(self, extra_bits: list[int]) -> None:
        self.eobrun += 1
        self.pending.extend(extra_bits)
        if self.eobrun == 0x7FFF:  # EOBn ceiling (nbits ≤ 14)
            self.flush()


def _encode_ac_first(blk, Ss, Se, Al, st: _ProgressiveACState) -> None:
    """First AC scan for one block: run/size coding of the
    point-transformed band with cross-block EOBn runs (T.81 G.1.2.2)."""
    w, ac_tab = st.writer, st.ac_tab
    r = 0
    for k in range(Ss, Se + 1):
        v = int(blk[k])
        if v == 0:
            r += 1
            continue
        a = (-v if v < 0 else v) >> Al
        if a == 0:  # point transform zeroed it for this scan
            r += 1
            continue
        st.flush()
        while r > 15:
            code, length = ac_tab[0xF0]
            w.write(code, length)
            r -= 16
        s = a.bit_length()
        code, length = ac_tab[(r << 4) | s]
        w.write(code, length)
        w.write((a if v >= 0 else ~a) & ((1 << s) - 1), s)
        r = 0
    if r > 0:
        st.end_block([])


def _encode_ac_refine(blk, Ss, Se, Al, st: _ProgressiveACState) -> None:
    """Refinement AC scan for one block (T.81 G.1.2.3): newly-nonzero
    coefficients are run-coded at magnitude 1; already-nonzero ones
    contribute one correction bit each, buffered behind the symbol (or
    EOB run) they trail."""
    w, ac_tab = st.writer, st.ac_tab
    absval = [(-int(v) if v < 0 else int(v)) >> Al for v in blk[Ss : Se + 1]]
    eob_pos = Ss - 1  # index of the last NEWLY-nonzero coefficient
    for i, a in enumerate(absval):
        if a == 1:
            eob_pos = Ss + i
    r = 0
    br: list[int] = []
    for k in range(Ss, Se + 1):
        a = absval[k - Ss]
        if a == 0:
            r += 1
            continue
        while r > 15 and k <= eob_pos:
            st.flush()
            code, length = ac_tab[0xF0]
            w.write(code, length)
            r -= 16
            for b in br:
                w.write(b, 1)
            br = []
        if a > 1:  # history coefficient: one correction bit
            br.append(a & 1)
            continue
        st.flush()
        code, length = ac_tab[(r << 4) | 1]
        w.write(code, length)
        w.write(1 if int(blk[k]) >= 0 else 0, 1)
        for b in br:
            w.write(b, 1)
        br = []
        r = 0
    if r > 0 or br:
        st.end_block(br)


def encode_progressive_jpeg(
    pixels,
    quality: int = 85,
    subsampling: str = "4:4:4",
    scan_script=None,
    restart_interval: int = 0,
) -> bytes:
    """Encode an (H, W) grayscale or (H, W, 3) RGB uint8 array as a
    progressive (SOF2) JFIF JPEG carrying EXACTLY the coefficients the
    baseline encoder would at the same quality/subsampling — the golden
    target for :func:`decode_progressive_jpeg`'s cross-profile pins.

    ``scan_script`` is a list of ``(comp_indices, Ss, Se, Ah, Al)``
    tuples (default: :func:`_default_scan_script`). ``restart_interval``
    > 0 emits DRI + per-scan RSTn markers every that many MCUs (one
    block per MCU in non-interleaved scans)."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.float64)
    if px.ndim == 2:
        planes = [px]
    elif px.ndim == 3 and px.shape[2] == 3:
        r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    else:
        raise ValueError("pixels must be (H, W) or (H, W, 3)")
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    h, w = px.shape[:2]
    if h < 1 or w < 1 or h > 0xFFFF or w > 0xFFFF:
        raise ValueError("dimensions must be in [1, 65535]")
    ncomp = len(planes)
    sub = subsampling == "4:2:0" and ncomp == 3
    samp = [(2, 2), (1, 1), (1, 1)] if sub else [(1, 1)] * ncomp
    hmax = max(s[0] for s in samp[:ncomp])
    vmax = max(s[1] for s in samp[:ncomp])
    qluma, qchroma = _quality_tables(quality)
    if scan_script is None:
        scan_script = _default_scan_script(ncomp)
    for comps_s, Ss, Se, Ah, Al in scan_script:
        if any(c >= ncomp for c in comps_s):
            raise ValueError("scan script names missing component")
        if Ss == 0 and Se != 0:
            raise ValueError("DC scans must have Se == 0")
        if Ss > 0 and len(comps_s) != 1:
            raise ValueError("AC scans must be non-interleaved")

    mcus_y = -(-h // (8 * vmax))
    mcus_x = -(-w // (8 * hmax))
    # per-component quantized coefficient grids (nby, nbx, 64) zigzag
    m = _dct_matrix()
    zz = np.array(_ZIGZAG)
    coef = []
    for i, plane in enumerate(planes):
        hi, vi = samp[i]
        if (hi, vi) != (hmax, vmax):
            fy, fx = vmax // vi, hmax // hi
            py = np.pad(
                plane, ((0, (-h) % fy), (0, (-w) % fx)), mode="edge"
            )
            plane = py.reshape(
                py.shape[0] // fy, fy, py.shape[1] // fx, fx
            ).mean(axis=(1, 3))
        ch, cw = plane.shape
        th_, tw_ = mcus_y * vi * 8, mcus_x * hi * 8
        plane = np.pad(plane, ((0, th_ - ch), (0, tw_ - cw)), mode="edge")
        blocks = _tile_blocks(plane)
        freq = np.einsum("ux,nxy,vy->nuv", m, blocks - 128.0, m)
        quant = qluma if i == 0 else qchroma
        q = np.round(freq / quant).astype(np.int64)
        nby, nbx = th_ // 8, tw_ // 8
        coef.append(q.reshape(nby, nbx, 64)[..., zz])  # zigzag order

    out = bytearray(b"\xff\xd8")
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
    for tq, tbl in enumerate([qluma, qchroma][: 1 if ncomp == 1 else 2]):
        body = bytes([tq]) + bytes(tbl.reshape(64)[zz].astype(np.uint8))
        out += b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for i in range(ncomp):
        sof += struct.pack(
            ">BBB", i + 1, (samp[i][0] << 4) | samp[i][1], 0 if i == 0 else 1
        )
    out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof
    for tc, (bits, vals) in enumerate(
        [(_ENC_DC_BITS, _ENC_DC_VALS), (_ENC_PAC_BITS, _ENC_PAC_VALS)]
    ):
        body = bytes([tc << 4]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    dc_tab = _build_encode_table(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_tab = _build_encode_table(_ENC_PAC_BITS, list(_ENC_PAC_VALS))

    for comps_s, Ss, Se, Ah, Al in scan_script:
        sos = bytes([len(comps_s)])
        for ci in comps_s:
            sos += struct.pack(">BB", ci + 1, 0x00)
        sos += bytes([Ss, Se, (Ah << 4) | Al])
        out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

        # unit list: interleaved DC scans walk MCUs; everything else
        # walks the single component's USED block grid in raster order
        if Ss == 0 and len(comps_s) > 1:
            units = []
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    blocks_u = []
                    for ci in comps_s:
                        hi, vi = samp[ci]
                        for by in range(vi):
                            for bx in range(hi):
                                blocks_u.append(
                                    (ci, my * vi + by, mx * hi + bx)
                                )
                    units.append(blocks_u)
        else:
            ci = comps_s[0]
            hi, vi = samp[ci]
            bw = -(-(-(-w * hi // hmax)) // 8)
            bh = -(-(-(-h * vi // vmax)) // 8)
            units = [[(ci, by, bx)] for by in range(bh) for bx in range(bw)]

        writer = _BitWriter()
        st = _ProgressiveACState(writer, ac_tab)
        dc_pred = {ci: 0 for ci in comps_s}
        rst = 0
        since_rst = 0
        for unit in units:
            if restart_interval and since_rst == restart_interval:
                st.flush()
                writer.flush()
                out += writer.out
                writer = _BitWriter()
                st = _ProgressiveACState(writer, ac_tab)
                out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                since_rst = 0
                dc_pred = {ci: 0 for ci in comps_s}
            for ci, by, bx in unit:
                blk = coef[ci][by, bx]
                if Ss == 0 and Ah == 0:  # DC first
                    v = int(blk[0]) >> Al
                    diff = v - dc_pred[ci]
                    dc_pred[ci] = v
                    t = _category(diff)
                    code, length = dc_tab[t]
                    writer.write(code, length)
                    if t:
                        writer.write(
                            diff if diff >= 0 else diff + (1 << t) - 1, t
                        )
                elif Ss == 0:  # DC refine: one raw bit per block
                    writer.write((int(blk[0]) >> Al) & 1, 1)
                elif Ah == 0:
                    _encode_ac_first(blk, Ss, Se, Al, st)
                else:
                    _encode_ac_refine(blk, Ss, Se, Al, st)
            since_rst += 1
        st.flush()
        writer.flush()
        out += writer.out
    out += b"\xff\xd9"
    return bytes(out)


def _decode_scan_progressive(
    sel, Ss, Se, Ah, Al, scan_bytes, comps, samp_dims, coef, huff, ri
):
    """Apply one progressive scan to the per-component coefficient
    arrays (zigzag order, in place). ``samp_dims`` carries
    (mcus_y, mcus_x, hmax, vmax, w, h)."""
    mcus_y, mcus_x, hmax, vmax, w, h = samp_dims
    if Ss == 0:
        if Se != 0:
            raise ValueError("DC scan with Se != 0")
    else:
        if len(sel) != 1:
            raise ValueError("progressive AC scans must be non-interleaved")
        if Se < Ss or Se > 63:
            raise ValueError("invalid spectral band")

    # resolve tables up front (DC-refine scans need none)
    dc_tabs = {}
    ac_tab = None
    if Ss == 0 and Ah == 0:
        for ci, td, _ta in sel:
            tab = huff.get((0, td))
            if tab is None:
                raise ValueError("scan references undeclared DC table")
            dc_tabs[ci] = tab
    elif Ss > 0:
        _ci, _td, ta = sel[0]
        ac_tab = huff.get((1, ta))
        if ac_tab is None:
            raise ValueError("scan references undeclared AC table")

    if Ss == 0 and len(sel) > 1:
        units = []
        for my in range(mcus_y):
            for mx in range(mcus_x):
                blocks_u = []
                for ci, _td, _ta in sel:
                    _cid, hi, vi, _tq = comps[ci]
                    for by in range(vi):
                        for bx in range(hi):
                            blocks_u.append(
                                (ci, my * vi + by, mx * hi + bx)
                            )
                units.append(blocks_u)
    else:
        ci = sel[0][0]
        _cid, hi, vi, _tq = comps[ci]
        bw = -(-(-(-w * hi // hmax)) // 8)
        bh = -(-(-(-h * vi // vmax)) // 8)
        units = [[(ci, by, bx)] for by in range(bh) for bx in range(bw)]

    intervals = _split_intervals(scan_bytes)
    reader = _BitReader(intervals[0])
    interval_idx = 0
    dc_pred = {c[0]: 0 for c in sel}
    eobrun = 0
    since_rst = 0
    p1 = 1 << Al
    m1 = -p1

    for unit in units:
        if ri and since_rst == ri:
            interval_idx += 1
            if interval_idx >= len(intervals):
                raise ValueError("missing restart interval data")
            reader = _BitReader(intervals[interval_idx])
            dc_pred = {c[0]: 0 for c in sel}
            eobrun = 0
            since_rst = 0
        for ci, by, bx in unit:
            blk = coef[ci][by, bx]
            if Ss == 0 and Ah == 0:  # DC first
                t = reader.read_symbol(dc_tabs[ci])
                if t > 11:
                    raise ValueError("invalid DC category")
                dc_pred[ci] += _extend(reader.read_bits(t), t)
                blk[0] = dc_pred[ci] << Al
            elif Ss == 0:  # DC refine
                if reader.read_bit():
                    blk[0] |= p1
            elif Ah == 0:  # AC first (T.81 G.1.2.2 decode)
                if eobrun > 0:
                    eobrun -= 1
                    continue
                k = Ss
                while k <= Se:
                    rs = reader.read_symbol(ac_tab)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r == 15:  # ZRL
                            k += 16
                            continue
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += reader.read_bits(r)
                        break
                    k += r
                    if k > Se:
                        raise ValueError("AC run past spectral band")
                    blk[k] = _extend(reader.read_bits(s), s) << Al
                    k += 1
            else:  # AC refine (T.81 G.1.2.3 decode)
                k = Ss
                if eobrun == 0:
                    while k <= Se:
                        rs = reader.read_symbol(ac_tab)
                        r, s = rs >> 4, rs & 0x0F
                        newval = 0
                        if s == 0:
                            if r != 15:
                                eobrun = 1 << r
                                if r:
                                    eobrun += reader.read_bits(r)
                                break
                            # r == 15: ZRL — skip 16 zero-history slots
                        else:
                            if s != 1:
                                raise ValueError(
                                    "refinement scan with size > 1"
                                )
                            newval = p1 if reader.read_bit() else m1
                        while k <= Se:
                            if blk[k] != 0:
                                if (
                                    reader.read_bit()
                                    and (blk[k] & p1) == 0
                                ):
                                    blk[k] += p1 if blk[k] >= 0 else m1
                            else:
                                r -= 1
                                if r < 0:
                                    break
                            k += 1
                        if newval:
                            if k > Se:
                                raise ValueError(
                                    "refinement run past spectral band"
                                )
                            blk[k] = newval
                        k += 1
                if eobrun > 0:
                    while k <= Se:
                        if blk[k] != 0:
                            if reader.read_bit() and (blk[k] & p1) == 0:
                                blk[k] += p1 if blk[k] >= 0 else m1
                        k += 1
                    eobrun -= 1
        since_rst += 1


def decode_progressive_jpeg(payload: bytes, max_pixels: int = 8_000_000):
    """Decode a progressive (SOF2, Huffman) JPEG to full-resolution
    component planes — same contract as :func:`decode_baseline_jpeg`.
    Accumulates quantized coefficients across every scan (spectral
    selection + successive approximation, T.81 Annex G), then runs the
    shared dequantize → IDCT → upsample tail. Raises ``ValueError`` on
    baseline / arithmetic / lossless profiles and on any structural or
    entropy corruption."""
    import numpy as np

    quant: dict[int, object] = {}
    huff: dict[tuple[int, int], dict] = {}
    ri = 0
    frame = None
    coef = None
    samp_dims = None
    n_scans = 0

    for marker, _off, b0, b1, s0, s1 in _segments(payload):
        if b0 is None:
            continue
        body = payload[b0:b1]
        if marker == _DQT:
            _parse_dqt(body, quant)
        elif marker == _DHT:
            _parse_dht(body, huff)
        elif marker == _DRI:
            if len(body) < 2:
                raise ValueError("truncated DRI")
            ri = struct.unpack(">H", body[:2])[0]
        elif marker in _SOF_BASELINE:
            raise ValueError("baseline JPEG: use decode_baseline_jpeg")
        elif marker in _SOF_OTHER or marker in (_SOF_PROGRESSIVE - {0xC2}):
            raise ValueError("unsupported JPEG profile (arithmetic/lossless)")
        elif marker == 0xC2:
            if len(body) < 6:
                raise ValueError("truncated SOF")
            prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("progressive DCT requires 8-bit precision")
            if h == 0 or w == 0 or ncomp == 0:
                raise ValueError("empty frame")
            if h * w > max_pixels:
                raise ValueError(
                    f"frame {w}x{h} exceeds max_pixels={max_pixels}"
                )
            if len(body) < 6 + 3 * ncomp:
                raise ValueError("truncated SOF components")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = struct.unpack(
                    ">BBB", body[6 + 3 * i : 9 + 3 * i]
                )
                hi, vi = hv >> 4, hv & 0x0F
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise ValueError("invalid sampling factors")
                comps.append((cid, hi, vi, tq))
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcus_y = -(-h // (8 * vmax))
            mcus_x = -(-w // (8 * hmax))
            frame = (h, w, comps)
            samp_dims = (mcus_y, mcus_x, hmax, vmax, w, h)
            coef = [
                np.zeros((mcus_y * vi, mcus_x * hi, 64), dtype=np.int32)
                for _cid, hi, vi, _tq in comps
            ]
        elif marker == SOS:
            if frame is None:
                raise ValueError("SOS before SOF")
            if not body:
                raise ValueError("empty SOS header")
            ns = body[0]
            if len(body) < 1 + 2 * ns + 3:
                raise ValueError("truncated SOS header")
            h, w, comps = frame
            comp_ids = [c[0] for c in comps]
            sel = []
            for i in range(ns):
                cs, tdta = body[1 + 2 * i], body[2 + 2 * i]
                if cs not in comp_ids:
                    raise ValueError("SOS names unknown component")
                sel.append((comp_ids.index(cs), tdta >> 4, tdta & 0x0F))
            Ss = body[1 + 2 * ns]
            Se = body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            Ah, Al = ahal >> 4, ahal & 0x0F
            _decode_scan_progressive(
                sel, Ss, Se, Ah, Al, payload[s0:s1], comps,
                samp_dims, coef, huff, ri,
            )
            n_scans += 1

    if frame is None or n_scans == 0:
        raise ValueError("no SOF2/SOS found")
    h, w, comps = frame
    zz = np.array(_ZIGZAG)
    grids = []
    for ci, (_cid, hi, vi, tq) in enumerate(comps):
        qt = quant.get(tq)
        if qt is None:
            raise ValueError("frame references undeclared DQT table")
        qz = qt.reshape(64)[zz]  # quant value per ZIGZAG position
        deq = coef[ci].astype(np.float64) * qz
        nby, nbx = deq.shape[:2]
        nat = np.zeros_like(deq)
        nat[:, :, zz] = deq  # scatter zigzag → natural order
        grids.append(
            nat.reshape(nby, nbx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(nby * 8, nbx * 8)
        )
    return _reconstruct(w, h, comps, grids)


def decode_jpeg(payload: bytes, max_pixels: int = 8_000_000):
    """Profile dispatcher: route to the baseline or progressive decoder
    by the frame marker — the one entry point media kernels call.
    Raises ``ValueError`` for arithmetic/lossless profiles and all
    structural corruption (the tolerant-reader boundary)."""
    for marker, _off, _b0, _b1, _s0, _s1 in _segments(payload):
        if marker in _SOF_BASELINE:
            return decode_baseline_jpeg(payload, max_pixels=max_pixels)
        if marker == 0xC2:
            return decode_progressive_jpeg(payload, max_pixels=max_pixels)
        if marker in _SOF_OTHER or marker in (_SOF_PROGRESSIVE - {0xC2}):
            raise ValueError("unsupported JPEG profile (arithmetic/lossless)")
        if marker == SOS:
            break
    raise ValueError("no supported SOF marker before scan data")


def decode_jpeg_rgb(payload: bytes):
    """Decode to ``(width, height, n_components, uint8 (H, W, C))`` —
    YCbCr→RGB (BT.601/JFIF) for 3-component files, pass-through
    otherwise; baseline and progressive profiles both route through
    :func:`decode_jpeg`. The multimodal-tier convenience twin of
    functions/png.py's RGB output."""
    import numpy as np

    w, h, planes = decode_jpeg(payload)
    if len(planes) == 3:
        y, cb, cr = planes
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        arr = np.stack([r, g, b], axis=2)
    else:
        arr = np.stack(planes, axis=2)
    return w, h, arr.shape[2], np.clip(np.round(arr), 0, 255).astype(np.uint8)
