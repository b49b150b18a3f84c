"""Media metadata scrubbing — the multimodal twin of the text tier's
``pii_redact`` (operators/quality.py).

Crawled media carries personal data OUTSIDE the pixels/samples: JPEG
EXIF blocks hold GPS coordinates, device serials, and timestamps; PNG
text chunks hold author/software/comment strings; RIFF LIST/INFO chunks
hold artist/engineer names. A training-data pipeline that redacts
emails from text but ships EXIF GPS has not redacted anything. These
scrubbers remove the metadata CONTAINERS wholesale (never parse-and-
filter inside them — an unrecognized field in a dropped block can't
leak) while leaving the coded image/audio bytes byte-identical:

- JPEG: drop APP1 (EXIF/XMP), vendor APPn notes, and COM segments;
  keep APP0 (JFIF — structural), APP2 (ICC color profile) and APP14
  (Adobe color-transform flag — decoders need it to pick YCCK/CMYK
  handling), tables, frame headers, and every entropy-coded scan
  VERBATIM.
- PNG: drop the ancillary metadata chunks tEXt/zTXt/iTXt/eXIf/tIME;
  keep critical and structural chunks (IHDR/PLTE/IDAT/IEND, the APNG
  acTL/fcTL/fdAT family, transparency/gamma) with their original CRCs.
- WAV/RIFF: drop LIST (INFO), 'bext' (broadcast-wave originator), and
  'iXML' chunks; keep fmt /data verbatim (sizes re-summed in the RIFF
  header).
- MP4 (ISO BMFF): neutralize ``udta``/``meta`` boxes IN PLACE as
  same-size ``free`` boxes — removal would shift the absolute ``stco``
  chunk offsets and break every demux; same-size zeroing keeps the
  sample tables byte-valid.
- GIF (r13): drop comment extensions (0xFE — author/tool strings, the
  GIF metadata surface) and application extensions (0xFF — XMP rides
  here) EXCEPT NETSCAPE2.0, which is structural (the loop count changes
  playback, exactly like JFIF APP0); image descriptors, color tables,
  GCEs and the LZW pixel data are copied verbatim.

Each scrubber returns ``(clean_bytes, dropped_tags)`` so the pipeline
can account for what it removed; unrecognized FORMATS are the caller's
problem (the Spark kernel in operators/multimodal.py passes them
through flagged, tolerant-reader style), but unrecognized CHUNKS within
a known format are KEPT — dropping only a known-metadata denylist means
a structural chunk this module has never heard of cannot be destroyed.

Format facts are public (ITU-T T.81/JFIF/EXIF, the PNG spec, the RIFF
spec). No reference counterpart — north-star privacy tier.
"""

from __future__ import annotations

import struct

__all__ = ["scrub_jpeg", "scrub_png", "scrub_wav", "scrub_mp4", "scrub_gif"]

#: PNG ancillary chunks that exist to carry metadata (PII surface)
_PNG_DROP = {b"tEXt", b"zTXt", b"iTXt", b"eXIf", b"tIME"}
#: RIFF chunks that carry provenance/author metadata
_WAV_DROP = {b"LIST", b"bext", b"iXML"}


def scrub_jpeg(payload: bytes) -> tuple[bytes, list[str]]:
    """Strip metadata APPn and COM segments from a JPEG; everything
    else — including every entropy-coded scan — is copied verbatim
    (consumer of ``functions/jpeg.py``'s shared segment walk, so
    framing fixes land once). APP0 (JFIF), APP2 (ICC profile) and
    APP14 (Adobe color-transform marker) are structural/color
    metadata, not PII, and are KEPT — Adobe YCCK/CMYK files decode
    with wrong colors without APP14. Raises ``ValueError`` on the
    same structural corruption ``jpeg_meta`` does."""
    from .jpeg import _segments

    out = bytearray()
    dropped: list[str] = []
    for marker, off, b0, b1, s0, s1 in _segments(payload):
        if b0 is None:  # standalone marker (SOI/EOI/RSTn/TEM)
            out += payload[off : off + 2]
            continue
        # keep: APP0 (JFIF), APP14 (Adobe color transform), and APP2
        # ONLY when it actually carries an ICC profile — APP2 is also
        # MPF (embedded preview images + per-image attributes on phone
        # photos) and FPXR, which are exactly the metadata this
        # scrubber promises to remove
        keep = marker == 0xE0 or marker == 0xEE or (
            marker == 0xE2
            and payload[off + 4 : off + 16] == b"ICC_PROFILE\x00"
        )
        if (
            0xE0 <= marker <= 0xEF and not keep
        ) or marker == 0xFE:  # metadata APPn, COM
            dropped.append("COM" if marker == 0xFE else f"APP{marker - 0xE0}")
            continue
        out += payload[off:b1]  # marker + length + body, verbatim
        if s0 is not None:
            out += payload[s0:s1]  # scan entropy bytes, verbatim
    return bytes(out), dropped


def scrub_png(payload: bytes) -> tuple[bytes, list[str]]:
    """Strip the metadata chunks (``_PNG_DROP``) from a PNG/APNG; kept
    chunks are copied verbatim (original bytes, original CRCs)."""
    from .png import SIGNATURE

    if not payload.startswith(SIGNATURE):
        raise ValueError("not a PNG: bad signature")
    out = bytearray(SIGNATURE)
    dropped: list[str] = []
    pos = len(SIGNATURE)
    while pos + 8 <= len(payload):
        length = struct.unpack(">I", payload[pos : pos + 4])[0]
        tag = payload[pos + 4 : pos + 8]
        end = pos + 8 + length + 4
        if end > len(payload):
            raise ValueError("truncated PNG chunk")
        if tag in _PNG_DROP:
            dropped.append(tag.decode("latin-1"))
        else:
            out += payload[pos:end]
        pos = end
        if tag == b"IEND":
            break
    return bytes(out), dropped


def scrub_wav(payload: bytes) -> tuple[bytes, list[str]]:
    """Strip LIST/bext/iXML chunks from a RIFF/WAVE file; fmt /data (and
    any other unrecognized chunk) are copied verbatim and the RIFF size
    re-summed."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    body = bytearray(b"WAVE")
    dropped: list[str] = []
    pos = 12
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        length = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        end = pos + 8 + length + (length & 1)  # chunks are word-aligned
        if pos + 8 + length > len(payload):
            raise ValueError("truncated RIFF chunk")
        if tag in _WAV_DROP:
            dropped.append(tag.decode("latin-1").strip())
        else:
            body += payload[pos : min(end, len(payload))]
        pos = end
    return b"RIFF" + struct.pack("<I", len(body)) + bytes(body), dropped


def scrub_mp4(payload: bytes) -> tuple[bytes, list[str]]:
    """Neutralize MP4 metadata boxes IN PLACE: every ``udta`` (user
    data — GPS location, author, device strings) and ``meta`` box at the
    top level or directly inside ``moov``/``trak`` becomes a ``free``
    box of the SAME SIZE with a zeroed payload.

    Same-size replacement is the point, not a shortcut: ``stco`` chunk
    offsets are ABSOLUTE file offsets, so removing bytes ahead of
    ``mdat`` would silently break every sample table downstream
    (functions/mp4.py parse_mp4 and every real demuxer). The classic
    in-place scrub keeps the byte layout identical — sample extraction
    before and after is byte-exact (pinned). Returns
    ``(clean_bytes, dropped_tags)`` with tags like ``"udta"``/
    ``"moov/meta"``. Raises ``ValueError`` on a malformed box walk."""
    out = bytearray(payload)
    dropped: list[str] = []

    def neutralize(start: int, end: int, body: int) -> None:
        # ``body`` is the first payload byte: start+8 for a 32-bit
        # header, start+16 when a 64-bit largesize header is in use —
        # the largesize field itself must survive (a ``free`` box with
        # size==1 + largesize is valid ISO BMFF; zeroing it would make
        # downstream parsers read largesize=0 on a size==1 box).
        out[start + 4 : start + 8] = b"free"
        out[body:end] = bytes(end - body)

    def walk(lo: int, hi: int, prefix: str, depth: int) -> None:
        pos = lo
        while pos + 8 <= hi:
            size = struct.unpack(">I", out[pos : pos + 4])[0]
            typ = bytes(out[pos + 4 : pos + 8])
            body = pos + 8
            if size == 1:  # 64-bit largesize — not emitted by our writer
                if pos + 16 > hi:
                    raise ValueError("truncated largesize box header")
                size = struct.unpack(">Q", out[pos + 8 : pos + 16])[0]
                body = pos + 16
            if size < (body - pos) or pos + size > hi:
                raise ValueError(f"invalid box size at offset {pos}")
            if typ in (b"udta", b"meta"):
                dropped.append(prefix + typ.decode("latin-1"))
                neutralize(pos, pos + size, body)
            elif typ in (b"moov", b"trak") and depth < 2:
                # children start AFTER the (possibly 64-bit) header —
                # recursing at pos+8 would parse a largesize field as
                # the first child's box header
                walk(body, pos + size, prefix + typ.decode("latin-1") + "/", depth + 1)
            pos += size
        if pos != hi:
            raise ValueError("trailing bytes are not a whole box")

    if len(payload) < 8:
        raise ValueError("not an MP4: too short for a box header")
    walk(0, len(out), "", 0)
    return bytes(out), dropped


def scrub_gif(payload: bytes) -> tuple[bytes, list[str]]:
    """Strip comment (0xFE) and non-NETSCAPE application (0xFF)
    extensions from a GIF87a/89a stream; every other block — headers,
    color tables, graphic-control extensions, plain-text blocks, image
    descriptors and their LZW data — is copied verbatim, so pixels and
    animation behavior are byte-identical. Returns
    ``(clean_bytes, dropped_tags)`` with tags like ``"comment"`` /
    ``"app:XMP DataXMP"``; raises ``ValueError`` on a malformed walk."""
    from .gif import HEADER_87, HEADER_89, _read_sub_blocks

    if len(payload) < 13 or payload[:6] not in (HEADER_87, HEADER_89):
        raise ValueError("not a GIF payload")
    packed = payload[10]
    pos = 13
    if packed & 0x80:
        pos += 3 * (2 << (packed & 0x07))
    out = bytearray(payload[:pos])
    dropped: list[str] = []
    n = len(payload)
    while pos < n:
        block = payload[pos]
        if block == 0x3B:  # trailer
            out.append(0x3B)
            pos += 1
            break
        if block == 0x21:
            label = payload[pos + 1] if pos + 1 < n else None
            if label is None:
                raise ValueError("extension truncated")
            data, end = _read_sub_blocks(payload, pos + 2)
            if label == 0xFE:
                dropped.append("comment")
            elif label == 0xFF and data[:11] != b"NETSCAPE2.0":
                dropped.append(
                    "app:" + data[:11].decode("latin-1", "replace").strip()
                )
            else:
                out += payload[pos:end]
            pos = end
            continue
        if block != 0x2C:
            raise ValueError(f"unknown block 0x{block:02x}")
        start = pos
        if pos + 10 > n:
            raise ValueError("image descriptor truncated")
        ipacked = payload[pos + 9]
        pos += 10
        if ipacked & 0x80:
            pos += 3 * (2 << (ipacked & 0x07))
        pos += 1  # LZW min code size
        _, pos = _read_sub_blocks(payload, pos)
        out += payload[start:pos]
    return bytes(out), dropped
