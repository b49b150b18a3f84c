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


def encode_fmp4(
    frames: list[bytes],
    width: int = 0,
    height: int = 0,
    timescale: int = 1000,
    frame_duration: int = 40,
    codec: str = "mp4v",
    frames_per_fragment: int = 2,
) -> bytes:
    """Write ``frames`` as a FRAGMENTED MP4 (fMP4/CMAF segment shape):
    ftyp + moov (empty sample tables + ``mvex``/``trex`` defaults) +
    one ``moof``+``mdat`` pair per fragment. Each ``traf`` carries
    tfhd (default-base-is-moof), tfdt (base decode time) and a trun
    whose data_offset is relative to the moof box start — the layout
    streaming pipelines actually ingest (DASH/HLS segments), where
    sample metadata arrives per-fragment instead of in one up-front
    stbl."""
    if not frames:
        raise ValueError("encode_fmp4 requires at least one frame")
    if len(codec) != 4:
        raise ValueError("codec must be a 4CC")
    if frames_per_fragment < 1:
        raise ValueError("frames_per_fragment must be >= 1")
    n = len(frames)

    ftyp = _box(
        b"ftyp", b"iso5" + struct.pack(">I", 0x200) + b"iso5" + b"isom" + b"cmfc"
    )
    stsd_entry = (
        struct.pack(">I", 86)
        + codec.encode("ascii")
        + b"\x00" * 6
        + struct.pack(">H", 1)
        + b"\x00" * 16
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)
        + b"\x00" * 32
        + struct.pack(">Hh", 0x0018, -1)
    )
    # empty sample tables: every sample is described by the fragments
    stbl = _box(
        b"stbl",
        _full(b"stsd", 0, 0, struct.pack(">I", 1) + stsd_entry)
        + _full(b"stts", 0, 0, struct.pack(">I", 0))
        + _full(b"stsc", 0, 0, struct.pack(">I", 0))
        + _full(b"stsz", 0, 0, struct.pack(">II", 0, 0))
        + _full(b"stco", 0, 0, struct.pack(">I", 0)),
    )
    minf = _box(
        b"minf",
        _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
        + _box(
            b"dinf",
            _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b"")),
        )
        + stbl,
    )
    mdia = _box(
        b"mdia",
        _full(
            b"mdhd",
            0,
            0,
            struct.pack(">IIIIHH", 0, 0, timescale, 0, 0x55C4, 0),
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
        + struct.pack(">I", 0)  # duration unknown up front in fMP4
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + _UNITY_MATRIX
        + struct.pack(">II", width << 16, height << 16),
    )
    mvhd = _full(
        b"mvhd",
        0,
        0,
        struct.pack(">IIII", 0, 0, timescale, 0)
        + struct.pack(">IHH", 0x10000, 0x0100, 0)
        + b"\x00" * 8
        + _UNITY_MATRIX
        + b"\x00" * 24
        + struct.pack(">I", 2),
    )
    trex = _full(
        b"trex",
        0,
        0,
        struct.pack(">IIIII", 1, 1, frame_duration, 0, 0),
    )
    moov = _box(
        b"moov", mvhd + _box(b"trak", tkhd + mdia) + _box(b"mvex", trex)
    )

    out = [ftyp, moov]
    seq = 0
    for i in range(0, n, frames_per_fragment):
        group = frames[i : i + frames_per_fragment]
        seq += 1

        def _traf(data_offset: int) -> bytes:
            tfhd = _full(
                b"tfhd", 0, 0x020000, struct.pack(">I", 1)
            )  # default-base-is-moof, track 1
            tfdt = _full(
                b"tfdt", 0, 0, struct.pack(">I", i * frame_duration)
            )
            trun = _full(
                b"trun",
                0,
                0x1 | 0x200,  # data-offset + sample-size present
                struct.pack(">Ii", len(group), data_offset)
                + b"".join(struct.pack(">I", len(f)) for f in group),
            )
            return _box(b"traf", tfhd + tfdt + trun)

        def _moof(data_offset: int) -> bytes:
            mfhd = _full(b"mfhd", 0, 0, struct.pack(">I", seq))
            return _box(b"moof", mfhd + _traf(data_offset))

        # data_offset is moof-relative; the field is fixed-width so the
        # size of moof does not depend on its value — build once with a
        # placeholder to learn the size, then rebuild with the real one
        moof_size = len(_moof(0))
        out.append(_moof(moof_size + 8))  # samples start after mdat header
        out.append(_box(b"mdat", b"".join(group)))
    return b"".join(out)


def _walk_boxes(data: bytes, start: int, end: int):
    """Yield (type, box_start, payload_start, payload_end) for each box
    in a range, validating size fields (the malformed-container guard).
    ``box_start`` includes the header — it is the anchor fMP4's
    default-base-is-moof addressing is relative to."""
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
        yield typ, pos, pos + hdr, pos + size
        pos += size


def _walk(data: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for each box in a range."""
    for typ, _bs, ps, pe in _walk_boxes(data, start, end):
        yield typ, ps, pe


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


def _trex_defaults(data: bytes, ms: int, me: int) -> tuple[int | None, int | None]:
    """(default_sample_duration, default_sample_size) from moov/mvex/trex,
    or (None, None) when the movie has no fragment defaults."""
    try:
        vs, ve = _find(data, ms, me, b"mvex")
        ts, te = _find(data, vs, ve, b"trex")
    except ValueError:
        return None, None
    if ts + 24 > te:
        raise ValueError("trex truncated")
    _tid, _sdi, dur, size, _fl = struct.unpack_from(">IIIII", data, ts + 4)
    return dur, size


def _resolve_fragments(
    data: bytes,
    moofs: list[tuple[int, int, int]],
    default_dur: int | None,
    default_size: int | None,
) -> tuple[list[int], list[int], list[int], int]:
    """Resolve every moof/traf/trun to absolute sample byte ranges and
    decode timestamps — the fMP4 twin of the stbl resolution. Returns
    (offsets, sizes, times, end_time)."""
    offsets: list[int] = []
    sizes: list[int] = []
    times: list[int] = []
    t = 0
    for box_start, ps, pe in moofs:
        trafs = [(s, e) for typ, s, e in _walk(data, ps, pe) if typ == b"traf"]
        if not trafs:
            raise ValueError("moof without traf")
        for tfs, tfe in trafs:
            base = box_start  # default-base-is-moof / first-traf default
            tf_dur, tf_size = default_dur, default_size
            truns: list[tuple[int, int]] = []
            for typ, s, e in _walk(data, tfs, tfe):
                if typ == b"tfhd":
                    if s + 8 > e:
                        raise ValueError("tfhd truncated")
                    flags = struct.unpack_from(">I", data, s)[0] & 0xFFFFFF
                    p = s + 8  # after verflags + track_id
                    if flags & 0x1:  # explicit base_data_offset
                        if p + 8 > e:
                            raise ValueError("tfhd truncated")
                        base = struct.unpack_from(">Q", data, p)[0]
                        p += 8
                    if flags & 0x2:
                        p += 4
                    if flags & 0x8:
                        if p + 4 > e:
                            raise ValueError("tfhd truncated")
                        tf_dur = struct.unpack_from(">I", data, p)[0]
                        p += 4
                    if flags & 0x10:
                        if p + 4 > e:
                            raise ValueError("tfhd truncated")
                        tf_size = struct.unpack_from(">I", data, p)[0]
                        p += 4
                    if flags & 0x20:
                        p += 4
                    if p > e:
                        raise ValueError("tfhd truncated")
                elif typ == b"tfdt":
                    if s + 8 > e:
                        raise ValueError("tfdt truncated")
                    if data[s] == 1:
                        if s + 12 > e:
                            raise ValueError("tfdt truncated")
                        t = struct.unpack_from(">Q", data, s + 4)[0]
                    else:
                        t = struct.unpack_from(">I", data, s + 4)[0]
                elif typ == b"trun":
                    truns.append((s, e))
            pos: int | None = None
            for s, e in truns:
                if s + 8 > e:
                    raise ValueError("trun truncated")
                flags = struct.unpack_from(">I", data, s)[0] & 0xFFFFFF
                cnt = struct.unpack_from(">I", data, s + 4)[0]
                entry = 4 * (
                    bool(flags & 0x100)
                    + bool(flags & 0x200)
                    + bool(flags & 0x400)
                    + bool(flags & 0x800)
                )
                fixed = (4 if flags & 0x1 else 0) + (4 if flags & 0x4 else 0)
                # bound BEFORE iterating: a hostile sample_count near 2^32
                # must not drive the append loop (same OOM class as the
                # stsz/stsc guards)
                if cnt > len(data) or s + 8 + fixed + cnt * entry > e:
                    raise ValueError("trun truncated or sample count hostile")
                p = s + 8
                if flags & 0x1:
                    doff = struct.unpack_from(">i", data, p)[0]
                    p += 4
                    pos = base + doff
                elif pos is None:
                    pos = base
                if flags & 0x4:
                    p += 4
                for _ in range(cnt):
                    dur, sz = tf_dur, tf_size
                    if flags & 0x100:
                        dur = struct.unpack_from(">I", data, p)[0]
                        p += 4
                    if flags & 0x200:
                        sz = struct.unpack_from(">I", data, p)[0]
                        p += 4
                    if flags & 0x400:
                        p += 4
                    if flags & 0x800:
                        p += 4
                    if sz is None or dur is None:
                        raise ValueError(
                            "trun sample lacks size/duration and no "
                            "tfhd/trex default exists"
                        )
                    offsets.append(pos)
                    sizes.append(sz)
                    times.append(t)
                    pos += sz
                    t += dur
    return offsets, sizes, times, t


def _parse_mp4(data: bytes) -> dict:
    if len(data) < 8:
        raise ValueError("not an MP4: too short")
    tops = list(_walk_boxes(data, 0, len(data)))
    boxes = {t: (s, e) for t, _b0, s, e in tops}
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

    moofs = [(b0, s, e) for t, b0, s, e in tops if t == b"moof"]
    if moofs:
        # fragmented: samples are described per-fragment (moof/traf/trun),
        # the stbl is empty by construction
        offsets, sizes, times, end_t = _resolve_fragments(
            data, moofs, *_trex_defaults(data, ms, me)
        )
        n = len(sizes)
        for off, size in zip(offsets, sizes):
            if off + size > len(data):
                raise ValueError("sample range beyond end of file")
        return {
            "brand": brand,
            "codec": codec,
            "timescale": timescale,
            # fMP4 declares duration 0 up front; the fragments know it
            "duration": duration if duration else end_t,
            "n_samples": n,
            "sample_offsets": offsets,
            "sample_sizes": sizes,
            "sample_times": times,
            "fragmented": True,
            "n_fragments": len(moofs),
        }

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
        "fragmented": False,
        "n_fragments": 0,
    }


def extract_samples(data: bytes, info: dict | None = None) -> list[bytes]:
    """The encoded-frame payloads, sliced straight from the sample
    tables — no codec decode, just the container doing its job."""
    info = info or parse_mp4(data)
    return [
        data[o : o + s]
        for o, s in zip(info["sample_offsets"], info["sample_sizes"])
    ]
