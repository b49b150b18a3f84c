"""JPEG metadata codec: pure-stdlib marker-walk parsing.

The multimodal tier treats media as opaque ``binary`` columns with typed
metadata (operators/multimodal.py). For crawled images the metadata a
100 TB pipeline actually filters on — dimensions, component count,
baseline vs progressive, EXIF orientation — lives in the JPEG marker
stream BEFORE any entropy-coded data, so extracting it reads a few
hundred bytes per blob and never needs a pixel decode (which the
sandbox cannot do anyway: no image libraries — same boundary as the
MP4 tier, functions/mp4.py).

Format facts used (all public: ITU-T T.81 / JFIF / EXIF specs):

- A JPEG is a sequence of ``FF xx`` markers. Standalone markers
  (SOI/EOI/RSTn/TEM) carry no payload; every other marker is followed
  by a 2-byte big-endian length that INCLUDES the length field itself
  (so < 2 is structurally invalid).
- Frame dimensions and component count come from the SOF segment:
  SOF0 (baseline) / SOF1 / SOF2 (progressive) / SOF3, layout
  ``precision u8, height u16, width u16, n_components u8``.
- EXIF orientation is TIFF tag 0x0112 inside the APP1 segment whose
  payload starts with ``Exif\\0\\0``; the TIFF header declares its own
  endianness (``II`` little / ``MM`` big) — both occur in the wild.
- Entropy-coded scan data after SOS may contain ``FF`` bytes only as
  ``FF 00`` (stuffing) or ``FF D0-D7`` (restart markers); the walk
  resumes marker scanning accordingly. Metadata parsing stops at the
  first SOF + orientation found — tail corruption in the scan does not
  poison metadata extraction, mirroring the tolerant-reader stance of
  the event decoder.

``synthesize_jpeg`` builds a structurally valid marker stream around a
filler scan (quant/Huffman tables are placeholder segments, the scan is
deterministic noise) — real enough to roundtrip every metadata field
this module parses, clearly NOT a pixel-accurate encoder (a baseline
DCT+Huffman encoder needs no external libs but serves no query in this
engine; the parse side is the production artifact).

Reference parity: none — north-star multimodal tier (the reference has
no media handling).
"""

from __future__ import annotations

import struct

SOI = 0xD8
EOI = 0xD9
SOS = 0xDA
APP1 = 0xE1
#: SOF markers that carry frame dims. C4 (DHT), C8 (JPG), CC (DAC) are
#: NOT frame headers despite sitting in the C0-CF range.
_SOF_MARKERS = {
    0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
    0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF,
}
_PROGRESSIVE = {0xC2, 0xC6, 0xCA, 0xCE}
_STANDALONE = {0xD8, 0xD9, 0x01} | set(range(0xD0, 0xD8))  # SOI/EOI/TEM/RSTn


def _exif_orientation(app1: bytes) -> int | None:
    """Tag 0x0112 from an APP1/EXIF payload; None when absent/malformed.
    Malformed EXIF is tolerated (None), NOT an error: orientation is an
    optional enrichment and the wild is full of truncated EXIF blocks."""
    if not app1.startswith(b"Exif\x00\x00"):
        return None
    tiff = app1[6:]
    if len(tiff) < 8:
        return None
    if tiff[:2] == b"II":
        end = "<"
    elif tiff[:2] == b"MM":
        end = ">"
    else:
        return None
    try:
        if struct.unpack(end + "H", tiff[2:4])[0] != 42:
            return None
        ifd_off = struct.unpack(end + "I", tiff[4:8])[0]
        if ifd_off + 2 > len(tiff):
            return None
        n = struct.unpack(end + "H", tiff[ifd_off : ifd_off + 2])[0]
        for i in range(n):
            e = ifd_off + 2 + i * 12
            if e + 12 > len(tiff):
                return None
            tag, typ, _cnt = struct.unpack(end + "HHI", tiff[e : e + 8])
            if tag == 0x0112 and typ == 3:  # SHORT
                val = struct.unpack(end + "H", tiff[e + 8 : e + 10])[0]
                return val if 1 <= val <= 8 else None
    except struct.error:
        return None
    return None


def _segments(payload: bytes):
    """Yield every JPEG segment as ``(marker, marker_off, body_start,
    body_end, scan_start, scan_end)`` — THE marker walk; ``jpeg_meta``,
    ``jpeg_scan_ranges``, and ``functions/scrub.py`` are all thin
    consumers so a framing fix lands once. ``body_*`` are None for
    standalone markers (SOI/EOI/RSTn/TEM); ``scan_*`` are set only on
    SOS and cover the entropy-coded bytes after the header. A scan that
    runs to END-OF-PAYLOAD (truncated file, no EOI) ends at
    ``len(payload)`` — the final byte is scan data, not dropped. Raises
    ``ValueError`` on structural corruption."""
    n = len(payload)
    if n < 4 or payload[0] != 0xFF or payload[1] != SOI:
        raise ValueError("not a JPEG: missing FFD8 signature")
    yield (SOI, 0, None, None, None, None)
    pos = 2
    while pos + 1 < n:
        if payload[pos] != 0xFF:
            raise ValueError(f"marker expected at offset {pos}")
        marker = payload[pos + 1]
        if marker == 0xFF:  # fill byte padding before a marker
            pos += 1
            continue
        marker_off = pos
        pos += 2
        if marker == EOI:
            yield (marker, marker_off, None, None, None, None)
            return
        if marker in _STANDALONE:
            yield (marker, marker_off, None, None, None, None)
            continue
        if pos + 2 > n:
            raise ValueError("truncated segment length")
        seg_len = struct.unpack(">H", payload[pos : pos + 2])[0]
        if seg_len < 2 or pos + seg_len > n:
            raise ValueError("invalid segment length")
        body_start, body_end = pos + 2, pos + seg_len
        pos += seg_len
        scan_start = scan_end = None
        if marker == SOS:
            # entropy-coded data: skip to the next real marker (FF00 is
            # a stuffed byte, FFD0-D7 are restart markers inside the scan)
            scan_start = pos
            while pos + 1 < n:
                if payload[pos] == 0xFF and payload[pos + 1] not in (
                    0x00, *range(0xD0, 0xD8),
                ):
                    break
                pos += 1
            else:
                pos = n  # scan runs to EOF — the tail byte is scan data
            scan_end = pos
        yield (marker, marker_off, body_start, body_end, scan_start, scan_end)


def jpeg_meta(payload: bytes) -> dict:
    """Parse ``{width, height, n_components, progressive, orientation}``
    from a JPEG byte string. Raises ``ValueError`` on structural
    corruption (bad signature, truncated segment, missing SOF);
    orientation is None when no valid EXIF tag exists."""
    meta: dict | None = None
    orientation: int | None = None
    for marker, _off, b0, b1, _s0, _s1 in _segments(payload):
        if b0 is None:
            continue
        body = payload[b0:b1]
        if marker in _SOF_MARKERS:
            if len(body) < 6:
                raise ValueError("truncated SOF segment")
            _prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if meta is None:  # first frame header wins (multi-frame: rare)
                meta = {
                    "width": w,
                    "height": h,
                    "n_components": ncomp,
                    "progressive": marker in _PROGRESSIVE,
                }
        elif marker == APP1 and orientation is None:
            orientation = _exif_orientation(body)
        if meta is not None and orientation is not None:
            break
    if meta is None:
        raise ValueError("no SOF frame header found")
    return {**meta, "orientation": orientation}


def jpeg_scan_ranges(payload: bytes) -> list[dict]:
    """Byte ranges of every entropy-coded scan — the JPEG analogue of the
    MP4 tier's per-sample ranges (functions/mp4.py sample_offsets/sizes).

    A progressive JPEG carries MULTIPLE scans, each refining the image
    (DC first, AC bands after); their boundaries live in the marker
    stream, so range extraction — like metadata parsing — never needs a
    pixel decode. Returns one dict per scan, in stream order::

        {"scan_idx":    0-based scan number,
         "sos_offset":  offset of the scan's FFDA marker,
         "data_offset": first entropy-coded byte (after the SOS header),
         "data_end":    offset of the next marker (exclusive),
         "n_bytes":     data_end - data_offset}

    ``payload[data_offset:data_end]`` is the scan's raw entropy data
    (FF00 stuffing and FFD0-D7 restart markers intact, exactly as a
    decoder consumes it); ``payload[:data_end] + FFD9`` is the standard
    progressive-prefix trick for a coarse decodable rendering. A scan
    truncated at end-of-payload (no EOI) ends at ``len(payload)``.
    Raises ``ValueError`` on the same structural corruption
    ``jpeg_meta`` does.
    """
    scans: list[dict] = []
    for marker, marker_off, _b0, _b1, s0, s1 in _segments(payload):
        if marker == SOS:
            scans.append(
                {
                    "scan_idx": len(scans),
                    "sos_offset": marker_off,
                    "data_offset": s0,
                    "data_end": s1,
                    "n_bytes": s1 - s0,
                }
            )
    if not scans:
        raise ValueError("no SOS scan found")
    return scans


def synthesize_jpeg(
    width: int,
    height: int,
    n_components: int = 3,
    progressive: bool = False,
    orientation: int | None = None,
    scan_bytes: int = 64,
    exif_big_endian: bool = False,
    n_scans: int = 1,
) -> bytes:
    """A structurally valid JPEG marker stream carrying exactly the
    metadata ``jpeg_meta`` parses (deterministic filler scan, placeholder
    tables — see module docstring). ``n_scans > 1`` emits that many
    SOS+scan segments with distinct spectral-selection headers and
    distinct deterministic fillers — the multi-scan layout of a real
    progressive file, for exercising ``jpeg_scan_ranges``."""
    if not (0 < width <= 0xFFFF and 0 < height <= 0xFFFF):
        raise ValueError("dimensions must fit u16")
    out = bytearray(b"\xff\xd8")
    if orientation is not None:
        end = ">" if exif_big_endian else "<"
        tiff = (
            (b"MM" if exif_big_endian else b"II")
            + struct.pack(end + "H", 42)
            + struct.pack(end + "I", 8)
            + struct.pack(end + "H", 1)  # one IFD entry
            + struct.pack(end + "HHI", 0x0112, 3, 1)
            + struct.pack(end + "H", orientation)
            + b"\x00\x00"  # value padding
            + struct.pack(end + "I", 0)  # next IFD
        )
        app1 = b"Exif\x00\x00" + tiff
        out += b"\xff\xe1" + struct.pack(">H", len(app1) + 2) + app1
    # placeholder DQT (a real one is 65 bytes of table data)
    dqt = b"\x00" + bytes(64)
    out += b"\xff\xdb" + struct.pack(">H", len(dqt) + 2) + dqt
    sof = 0xC2 if progressive else 0xC0
    comps = b"".join(
        struct.pack(">BBB", i + 1, 0x11, 0) for i in range(n_components)
    )
    body = struct.pack(">BHHB", 8, height, width, n_components) + comps
    out += bytes([0xFF, sof]) + struct.pack(">H", len(body) + 2) + body
    # placeholder DHT
    dht = b"\x00" + bytes(16) + b""
    out += b"\xff\xc4" + struct.pack(">H", len(dht) + 2) + dht
    if n_scans < 1:
        raise ValueError("n_scans must be >= 1")
    for s in range(n_scans):
        # SOS header + deterministic filler scan (FF bytes stuffed as
        # FF00). Multi-scan: spectral selection Ss/Se varies per scan
        # (DC pass then AC bands, the progressive layout) and the filler
        # seed folds the scan index so every scan's bytes differ.
        ss, se = (0, 0) if (n_scans > 1 and s == 0) else (s, 0x3F)
        sos = struct.pack(">B", n_components) + b"".join(
            struct.pack(">BB", i + 1, 0) for i in range(n_components)
        ) + struct.pack(">BBB", ss, se, 0)
        out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
        scan = bytearray()
        x = (width * 31 + height * 17 + 57 * s) & 0xFF
        while len(scan) < scan_bytes + 7 * s:
            x = (x * 109 + 89) & 0xFF
            scan.append(x)
            if x == 0xFF:
                scan.append(0x00)  # byte stuffing, as a real encoder would
        out += scan
    out += b"\xff\xd9"
    return bytes(out)
