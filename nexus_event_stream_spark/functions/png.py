"""Pure-Python PNG codec — stdlib only (``zlib``, ``struct``).

Real codec, not a stub: writes and reads the PNG container (signature,
IHDR/IDAT/IEND chunks, CRC-32 validation, zlib-deflated scanlines) with
all five scanline filters (None/Sub/Up/Average/Paeth) implemented on both
paths. Supports 8-bit grayscale (color type 0), RGB (2) and RGBA (6),
non-interlaced — the subset a training-data pipeline materializes for
thumbnails/features. PIL/libpng are not in this container; this module
exists so the multimodal kernels (operators/multimodal.py) exercise a
genuine decode, and so the catalog's q_binary_meta can verify decoded
dimensions and pixel sums against a closed-form SQL oracle.
"""

from __future__ import annotations

import struct
import zlib

SIGNATURE = b"\x89PNG\r\n\x1a\n"

#: color type → samples per pixel (8-bit depth ⇒ bytes per pixel)
CHANNELS = {0: 1, 2: 3, 6: 4}


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_scanline(ftype: int, cur: bytes, prev: bytes, bpp: int) -> bytes:
    """Raw scanline → filtered bytes (encoder side)."""
    if ftype == 0:  # None filter: identity — skip the per-byte loop
        return bytes(cur)
    out = bytearray(len(cur))
    for i, x in enumerate(cur):
        a = cur[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 0:
            out[i] = x
        elif ftype == 1:
            out[i] = (x - a) & 0xFF
        elif ftype == 2:
            out[i] = (x - b) & 0xFF
        elif ftype == 3:
            out[i] = (x - (a + b) // 2) & 0xFF
        elif ftype == 4:
            out[i] = (x - _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
    return bytes(out)


def _unfilter_scanline(ftype: int, cur: bytes, prev: bytes, bpp: int) -> bytes:
    """Filtered bytes → reconstructed scanline (decoder side)."""
    if ftype == 0:  # None filter: identity — skip the per-byte loop
        return bytes(cur)
    recon = bytearray(len(cur))
    for i, x in enumerate(cur):
        a = recon[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 0:
            recon[i] = x
        elif ftype == 1:
            recon[i] = (x + a) & 0xFF
        elif ftype == 2:
            recon[i] = (x + b) & 0xFF
        elif ftype == 3:
            recon[i] = (x + (a + b) // 2) & 0xFF
        elif ftype == 4:
            recon[i] = (x + _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
    return bytes(recon)


def _compress_frame(
    width: int, height: int, pixels: bytes, color_type: int, filter_type: int
) -> bytes:
    """Filter + deflate one frame's scanlines (the IDAT/fdAT payload)."""
    ch = CHANNELS[color_type]
    stride = width * ch
    if len(pixels) != stride * height:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes, expected {stride * height}"
        )
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        cur = pixels[y * stride : (y + 1) * stride]
        raw.append(filter_type)
        raw += _filter_scanline(filter_type, cur, prev, ch)
        prev = cur
    return zlib.compress(bytes(raw), 6)


def _reconstruct(raw: bytes, width: int, height: int, ch: int) -> bytes:
    """Inflated filtered stream → raw pixels (shared by PNG and APNG)."""
    stride = width * ch
    if len(raw) != (stride + 1) * height:
        raise ValueError("frame data size does not match dimensions")
    out = bytearray()
    prev = bytes(stride)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        cur = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        prev = _unfilter_scanline(ftype, cur, prev, ch)
        out += prev
    return bytes(out)


def encode_png(
    width: int,
    height: int,
    pixels: bytes,
    color_type: int = 0,
    filter_type: int = 0,
) -> bytes:
    """Encode 8-bit pixels (row-major, ``width*height*channels`` bytes)
    into a PNG, applying ``filter_type`` to every scanline."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", _compress_frame(width, height, pixels, color_type, filter_type))
        + _chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG → ``(width, height, color_type, pixels)``.

    Validates the signature and every chunk CRC; raises ``ValueError`` on
    malformed input (callers that follow the engine's tolerant-reader
    convention catch it and emit nulls).
    """
    if not payload or bytes(payload[:8]) != SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    payload = bytes(payload)
    off = 8
    width = height = color_type = None
    idat = bytearray()
    while off + 12 <= len(payload):
        (length,) = struct.unpack(">I", payload[off : off + 4])
        tag = payload[off + 4 : off + 8]
        data = payload[off + 8 : off + 8 + length]
        if len(data) != length:
            raise ValueError("truncated chunk")
        (crc,) = struct.unpack(
            ">I", payload[off + 8 + length : off + 12 + length]
        )
        if crc != zlib.crc32(tag + data) & 0xFFFFFFFF:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        if tag == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if color_type not in CHANNELS:
                raise ValueError(f"unsupported color type {color_type}")
            if comp or filt or interlace:
                raise ValueError("unsupported compression/filter/interlace")
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        off += 12 + length
    if width is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    ch = CHANNELS[color_type]
    return width, height, color_type, _reconstruct(raw, width, height, ch)


# ---------------------------------------------------------------------------
# APNG (animated PNG) — the container video frame sampling decodes.
# Spec: the acTL chunk declares the animation, each frame is an fcTL
# control chunk followed by its data (IDAT for the first frame when its
# fcTL precedes IDAT, fdAT with a leading sequence number afterwards);
# sequence numbers are shared across fcTL and fdAT and strictly increase.
# ---------------------------------------------------------------------------


def encode_apng(
    width: int,
    height: int,
    frames: list[bytes],
    color_type: int = 0,
    filter_type: int = 0,
    delay_num: int = 1,
    delay_den: int = 10,
) -> bytes:
    """Encode full-canvas frames as an APNG (frame 0 doubles as the
    default image). ``filter_type`` may be an int or a per-frame list —
    letting a synthetic corpus exercise every scanline filter across
    frames."""
    if not frames:
        raise ValueError("APNG needs at least one frame")
    filts = (
        list(filter_type)
        if isinstance(filter_type, (list, tuple))
        else [filter_type] * len(frames)
    )
    if len(filts) != len(frames):
        raise ValueError("one filter_type per frame required")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    actl = struct.pack(">II", len(frames), 0)  # num_frames, loop forever
    out = bytearray(SIGNATURE)
    out += _chunk(b"IHDR", ihdr)
    out += _chunk(b"acTL", actl)
    seq = 0
    for k, (px, ft) in enumerate(zip(frames, filts)):
        fctl = struct.pack(
            ">IIIIIHHBB", seq, width, height, 0, 0, delay_num, delay_den, 0, 0
        )
        out += _chunk(b"fcTL", fctl)
        seq += 1
        data = _compress_frame(width, height, px, color_type, ft)
        if k == 0:
            out += _chunk(b"IDAT", data)
        else:
            out += _chunk(b"fdAT", struct.pack(">I", seq) + data)
            seq += 1
    out += _chunk(b"IEND", b"")
    return bytes(out)


def decode_apng(payload: bytes) -> tuple[int, int, int, list[bytes]]:
    """Decode an APNG → ``(width, height, color_type, [frame pixels])``.

    A plain PNG (no acTL) decodes as a single-frame animation, so callers
    can treat every PNG-family payload uniformly. Validates signature,
    every chunk CRC, fcTL/fdAT sequence numbering, and the acTL frame
    count; only full-canvas frames (offset 0, canvas-sized) are supported
    — the subset this engine's synthetic corpus and thumbnail pipelines
    produce. Raises ``ValueError`` on malformed input (tolerant-reader
    callers catch and emit nulls).
    """
    if not payload or bytes(payload[:8]) != SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    payload = bytes(payload)
    off = 8
    width = height = color_type = None
    num_frames = None
    seqs: list[int] = []
    frames: list[bytearray] = []  # compressed data per fcTL-opened frame
    default_is_frame0 = False
    saw_idat = False
    while off + 12 <= len(payload):
        (length,) = struct.unpack(">I", payload[off : off + 4])
        tag = payload[off + 4 : off + 8]
        data = payload[off + 8 : off + 8 + length]
        if len(data) != length:
            raise ValueError("truncated chunk")
        (crc,) = struct.unpack(">I", payload[off + 8 + length : off + 12 + length])
        if crc != zlib.crc32(tag + data) & 0xFFFFFFFF:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        if tag == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if color_type not in CHANNELS:
                raise ValueError(f"unsupported color type {color_type}")
            if comp or filt or interlace:
                raise ValueError("unsupported compression/filter/interlace")
        elif tag == b"acTL":
            num_frames, _plays = struct.unpack(">II", data)
        elif tag == b"fcTL":
            seq, fw, fh, x0, y0, _dn, _dd, _disp, _blend = struct.unpack(
                ">IIIIIHHBB", data
            )
            seqs.append(seq)
            if (fw, fh, x0, y0) != (width, height, 0, 0):
                raise ValueError("sub-canvas APNG frames not supported")
            if not saw_idat:
                default_is_frame0 = True
            frames.append(bytearray())
        elif tag == b"IDAT":
            saw_idat = True
            if frames and default_is_frame0:
                frames[0] += data
            elif num_frames is None:
                # plain PNG: treat the image as the only frame
                if not frames:
                    frames.append(bytearray())
                frames[0] += data
            # else: default image excluded from the animation — skip
        elif tag == b"fdAT":
            if not frames:
                raise ValueError("fdAT before any fcTL")
            seqs.append(struct.unpack(">I", data[:4])[0])
            frames[-1] += data[4:]
        elif tag == b"IEND":
            break
        off += 12 + length
    if width is None:
        raise ValueError("missing IHDR")
    if num_frames is not None and num_frames != len(frames):
        raise ValueError(
            f"acTL declares {num_frames} frames, found {len(frames)}"
        )
    if seqs != sorted(seqs) or len(set(seqs)) != len(seqs):
        raise ValueError("fcTL/fdAT sequence numbers not strictly increasing")
    ch = CHANNELS[color_type]
    out = [
        _reconstruct(zlib.decompress(bytes(fd)), width, height, ch)
        for fd in frames
    ]
    if not out:
        raise ValueError("no frame data")
    return width, height, color_type, out


def resize_nearest(
    pixels: bytes,
    width: int,
    height: int,
    target_w: int,
    target_h: int,
    channels: int = 1,
) -> bytes:
    """Nearest-neighbor resample of an 8-bit row-major pixel buffer."""
    out = bytearray(target_w * target_h * channels)
    for ty in range(target_h):
        sy = ty * height // target_h
        for tx in range(target_w):
            sx = tx * width // target_w
            src = (sy * width + sx) * channels
            dst = (ty * target_w + tx) * channels
            out[dst : dst + channels] = pixels[src : src + channels]
    return bytes(out)
