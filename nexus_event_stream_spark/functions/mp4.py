"""Pure-stdlib ISO BMFF (MP4) CONTAINER codec — box parser + writer.

The public container format (ISO/IEC 14496-12): a file is a sequence of
length-prefixed boxes; the ``moov`` movie box carries per-track sample
TABLES that map every sample (video frame) to its exact byte range in
``mdat`` and its timestamp:

- ``stts``  decode-time runs      → per-sample durations/timestamps
- ``stsz``  sample sizes          → byte length per frame
- ``stsc``  sample→chunk runs     → how samples pack into chunks
- ``stco``/``co64`` chunk offsets → absolute file offset of each chunk

Resolving those four tables is exactly what real demuxers do, and it is
what lets ``operators/multimodal.sample_frames`` pull the k-th encoded
frame's bytes out of an MP4 without decoding anything. CODEC payload
decode (H.264 etc.) is NOT attempted — no media libraries exist in this
environment — so extracted samples are the encoded-frame bytes; the
container plumbing (walk, validate, resolve, slice) is real and tested.

The writer emits a minimal valid file (ftyp + mdat + moov with a full
``stbl``) whose sample payloads are caller-supplied opaque bytes —
deterministic synthetic "frames" in tests, standing in for coded
pictures. Chunking is deliberately non-trivial (``samples_per_chunk``
packing with a short final chunk) so the parser's stsc/stco resolution
is genuinely exercised rather than collapsing to one-chunk-per-sample.
"""

from __future__ import annotations

import struct


def _box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + typ + payload


def _full(typ: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(typ, struct.pack(">I", (version << 24) | flags) + payload)


_UNITY_MATRIX = struct.pack(
    ">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000
)


def encode_mp4(
    frames: list[bytes],
    width: int = 0,
    height: int = 0,
    timescale: int = 1000,
    frame_duration: int = 40,
    codec: str = "mp4v",
    samples_per_chunk: int = 2,
) -> bytes:
    """Write ``frames`` (opaque encoded-sample payloads) into a minimal
    valid MP4: one video track, constant frame duration, samples packed
    ``samples_per_chunk`` per chunk (final chunk short when n is not a
    multiple — the pattern that exercises stsc run resolution)."""
    if not frames:
        raise ValueError("encode_mp4 requires at least one frame")
    if len(codec) != 4:
        raise ValueError("codec must be a 4CC")
    if samples_per_chunk < 1:
        raise ValueError("samples_per_chunk must be >= 1")
    n = len(frames)
    duration = n * frame_duration

    ftyp = _box(
        b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isom" + b"iso2" + b"mp41"
    )
    mdat = _box(b"mdat", b"".join(frames))
    data_start = len(ftyp) + 8  # first sample byte (after mdat header)

    # chunk layout: offsets are ABSOLUTE file offsets (stco semantics)
    chunk_offsets: list[int] = []
    off = data_start
    i = 0
    while i < n:
        chunk_offsets.append(off)
        cnt = min(samples_per_chunk, n - i)
        off += sum(len(f) for f in frames[i : i + cnt])
        i += cnt
    n_chunks = len(chunk_offsets)
    last = n - (n_chunks - 1) * samples_per_chunk
    stsc_entries = [(1, min(samples_per_chunk, n), 1)]
    if n_chunks > 1 and last != samples_per_chunk:
        stsc_entries.append((n_chunks, last, 1))

    stsd_entry = (
        struct.pack(">I", 86)
        + codec.encode("ascii")
        + b"\x00" * 6
        + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16  # pre_defined / reserved
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)  # frame_count
        + b"\x00" * 32  # compressorname
        + struct.pack(">Hh", 0x0018, -1)
    )
    stbl = _box(
        b"stbl",
        _full(b"stsd", 0, 0, struct.pack(">I", 1) + stsd_entry)
        + _full(
            b"stts", 0, 0, struct.pack(">III", 1, n, frame_duration)
        )
        + _full(
            b"stsc",
            0,
            0,
            struct.pack(">I", len(stsc_entries))
            + b"".join(struct.pack(">III", *e) for e in stsc_entries),
        )
        + _full(
            b"stsz",
            0,
            0,
            struct.pack(">II", 0, n)
            + b"".join(struct.pack(">I", len(f)) for f in frames),
        )
        + _full(
            b"stco",
            0,
            0,
            struct.pack(">I", n_chunks)
            + b"".join(struct.pack(">I", c) for c in chunk_offsets),
        ),
    )
    minf = _box(
        b"minf",
        _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
        + _box(
            b"dinf",
            _full(
                b"dref",
                0,
                0,
                struct.pack(">I", 1) + _full(b"url ", 0, 1, b""),
            ),
        )
        + stbl,
    )
    mdia = _box(
        b"mdia",
        _full(
            b"mdhd",
            0,
            0,
            struct.pack(">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0),
        )
        + _full(
            b"hdlr",
            0,
            0,
            struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"nexus\x00",
        )
        + minf,
    )
    tkhd = _full(
        b"tkhd",
        0,
        7,
        struct.pack(">IIII", 0, 0, 1, 0)
        + struct.pack(">I", duration)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + _UNITY_MATRIX
        + struct.pack(">II", width << 16, height << 16),
    )
    mvhd = _full(
        b"mvhd",
        0,
        0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">IHH", 0x10000, 0x0100, 0)
        + b"\x00" * 8
        + _UNITY_MATRIX
        + b"\x00" * 24
        + struct.pack(">I", 2),  # next_track_id
    )
    moov = _box(b"moov", mvhd + _box(b"trak", tkhd + mdia))
    return ftyp + mdat + moov


def _walk(data: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for each box in a range,
    validating size fields (the malformed-container guard)."""
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError("truncated box header")
        size = struct.unpack_from(">I", data, pos)[0]
        typ = data[pos + 4 : pos + 8]
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise ValueError("truncated largesize box")
            size = struct.unpack_from(">Q", data, pos + 8)[0]
            hdr = 16
        elif size == 0:  # spec: box extends to the end of the enclosure
            size = end - pos
            hdr = 8
        else:
            hdr = 8
        if size < hdr or pos + size > end:
            raise ValueError(f"bad box size {size} for {typ!r}")
        yield typ, pos + hdr, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, typ: bytes):
    for t, s, e in _walk(data, start, end):
        if t == typ:
            return s, e
    raise ValueError(f"missing box {typ!r}")


def parse_mp4(data: bytes) -> dict:
    """Parse the container and RESOLVE the sample tables.

    Returns ``{brand, codec, timescale, duration, n_samples,
    sample_offsets, sample_sizes, sample_times}`` where offsets are
    absolute byte positions of each encoded frame (stsc runs expanded to
    chunks, sizes accumulated within chunks — the standard demuxer
    algorithm) and times are decode timestamps in timescale units from
    the stts runs. Raises ValueError on malformed structure (struct
    underflows included — the documented contract is ValueError only).
    """
    try:
        return _parse_mp4(data)
    except (struct.error, IndexError) as exc:
        # struct underflows AND bare indexing past end-of-payload (e.g. an
        # mdhd box whose payload is empty at EOF) both mean "malformed
        # container" — the documented contract is ValueError only.
        raise ValueError(f"malformed MP4: {exc}") from exc


def _parse_mp4(data: bytes) -> dict:
    if len(data) < 8:
        raise ValueError("not an MP4: too short")
    boxes = {t: (s, e) for t, s, e in _walk(data, 0, len(data))}
    if b"ftyp" not in boxes or b"moov" not in boxes:
        raise ValueError("not an MP4: missing ftyp/moov")
    fs, _fe = boxes[b"ftyp"]
    brand = data[fs : fs + 4].decode("ascii", "replace")

    ms, me = boxes[b"moov"]
    ts_, te = _find(data, ms, me, b"trak")
    ds, de = _find(data, ts_, te, b"mdia")
    hs, he = _find(data, ds, de, b"mdhd")
    version = data[hs]
    if version == 1:
        timescale, duration = struct.unpack_from(">IQ", data, hs + 4 + 16)
    else:
        _c, _m, timescale, duration = struct.unpack_from(">IIII", data, hs + 4)
    ns, ne = _find(data, ds, de, b"minf")
    bs, be = _find(data, ns, ne, b"stbl")

    # stsd → codec 4CC of the first sample entry
    ss, se = _find(data, bs, be, b"stsd")
    codec = data[ss + 8 + 4 : ss + 8 + 8].decode("ascii", "replace")

    # stsz → sizes
    zs, ze = _find(data, bs, be, b"stsz")
    fixed, n = struct.unpack_from(">II", data, zs + 4)
    if fixed:
        # bound BEFORE allocating: a malicious count of 2^32-1 would
        # otherwise build a multi-GB list and OOM the Python worker —
        # the opposite of the tolerant-reader contract
        if fixed * n > len(data):
            raise ValueError("stsz fixed-size total exceeds file size")
        sizes = [fixed] * n
    else:
        if zs + 12 + 4 * n > ze:
            raise ValueError("stsz table truncated")
        sizes = list(struct.unpack_from(f">{n}I", data, zs + 12))

    # stco / co64 → chunk offsets
    try:
        cs, ce = _find(data, bs, be, b"stco")
        cn = struct.unpack_from(">I", data, cs + 4)[0]
        if cs + 8 + 4 * cn > ce:
            raise ValueError("stco table truncated")
        chunks = list(struct.unpack_from(f">{cn}I", data, cs + 8))
    except ValueError:
        cs, ce = _find(data, bs, be, b"co64")
        cn = struct.unpack_from(">I", data, cs + 4)[0]
        if cs + 8 + 8 * cn > ce:
            raise ValueError("co64 table truncated")
        chunks = list(struct.unpack_from(f">{cn}Q", data, cs + 8))

    # stsc runs → samples-per-chunk for every chunk
    xs, xe = _find(data, bs, be, b"stsc")
    en = struct.unpack_from(">I", data, xs + 4)[0]
    if xs + 8 + 12 * en > xe:
        raise ValueError("stsc table truncated")
    runs = [
        struct.unpack_from(">III", data, xs + 8 + 12 * i) for i in range(en)
    ]
    # validate the run starts BEFORE expanding: first_chunk values are
    # unvalidated 32-bit ints from the file, and `[spc] * (last - first + 1)`
    # with a hostile first_chunk near 2^32 would allocate a multi-GB list
    # (the same OOM class the stsz fixed-size guard blocks) before the
    # coverage check below ever runs.
    for i, (first, _spc, _sdi) in enumerate(runs):
        if first < 1 or first > len(chunks):
            raise ValueError("stsc first_chunk out of chunk-list range")
        if i > 0 and first <= runs[i - 1][0]:
            raise ValueError("stsc first_chunk values not strictly increasing")
    if runs and runs[0][0] != 1:
        raise ValueError("stsc runs do not start at chunk 1")
    spc_by_chunk: list[int] = []
    for i, (first, spc, _sdi) in enumerate(runs):
        last = runs[i + 1][0] - 1 if i + 1 < len(runs) else len(chunks)
        spc_by_chunk.extend([spc] * (last - first + 1))
    if len(spc_by_chunk) != len(chunks):
        raise ValueError("stsc runs do not cover the chunk list")

    # resolve absolute per-sample offsets
    offsets: list[int] = []
    si = 0
    for chunk_off, spc in zip(chunks, spc_by_chunk):
        off = chunk_off
        for _ in range(spc):
            if si >= n:
                break
            offsets.append(off)
            off += sizes[si]
            si += 1
    if si != n:
        raise ValueError("sample tables resolve to fewer samples than stsz")
    for off, size in zip(offsets, sizes):
        if off + size > len(data):
            raise ValueError("sample range beyond end of file")

    # stts runs → decode timestamps
    tts, tte = _find(data, bs, be, b"stts")
    tn = struct.unpack_from(">I", data, tts + 4)[0]
    if tts + 8 + 8 * tn > tte:
        raise ValueError("stts table truncated")
    times: list[int] = []
    t = 0
    for i in range(tn):
        cnt, delta = struct.unpack_from(">II", data, tts + 8 + 8 * i)
        for _ in range(cnt):
            if len(times) >= n:
                break
            times.append(t)
            t += delta
    if len(times) != n:
        raise ValueError("stts runs do not cover every sample")

    return {
        "brand": brand,
        "codec": codec,
        "timescale": timescale,
        "duration": duration,
        "n_samples": n,
        "sample_offsets": offsets,
        "sample_sizes": sizes,
        "sample_times": times,
    }


def extract_samples(data: bytes, info: dict | None = None) -> list[bytes]:
    """The encoded-frame payloads, sliced straight from the sample
    tables — no codec decode, just the container doing its job."""
    info = info or parse_mp4(data)
    return [
        data[o : o + s]
        for o, s in zip(info["sample_offsets"], info["sample_sizes"])
    ]
