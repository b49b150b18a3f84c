"""Multimodal column plumbing: opaque binary payloads + typed metadata.

North-star extension. Image/audio/video payloads are carried as Spark
``binary`` columns beside typed metadata; the heavy per-item work
(decode, feature-extract, resize, frame-sample) runs as Arrow-batched
``mapInPandas`` so each Python worker sees columnar batches, not rows.

Image decode/encode/resize are REAL: a pure-stdlib PNG codec
(functions/png.py — full container parse, CRC validation, all five
scanline filters, nearest-neighbor resample). Video is REAL at two
levels: the APNG container (animated PNG: acTL/fcTL/fdAT chunks, same
codec) decodes to actual pixel frames, and MP4/ISO-BMFF containers
(functions/mp4.py — box walk, stts/stsc/stsz/stco sample-table
resolution) demux to exact encoded-frame byte ranges + timestamps, the
real demuxer algorithm; only the codec-payload decode (H.264 etc.) is
environment-capped (no media libraries in this box). Payloads that are
neither fall back to deterministic byte windows — the tolerant-reader
convention (consumer.go:39-44): decode failures degrade, never fail
the batch.

Scale notes: binary payloads dominate row size, so
``spark.sql.files.maxPartitionBytes`` (not row count) controls partition
memory; metadata-only queries never touch the blob column thanks to
parquet column pruning — keep payloads in their own column, never inside
a struct with hot metadata.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nexus_event_stream_spark.functions.png import (
    CHANNELS,
    decode_apng,
    decode_png,
    encode_apng,
    encode_png,
    resize_nearest,
)
from nexus_event_stream_spark.functions.jpeg import (
    jpeg_meta,
    jpeg_scan_ranges,
    synthesize_jpeg,
)
from nexus_event_stream_spark.functions.wav import decode_wav, encode_wav

#: Metadata schema carried beside every binary payload.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

#: Output of the (stubbed) image decoder.
IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

FEATURE_DIM = 8


def decode_image(payload: bytes) -> tuple[int, int, list[float]]:
    """Real PNG decode → (width, height, 8-bin intensity histogram).

    The feature is the fraction of pixel samples falling in each of 8
    equal intensity bands — deterministic, and exactly reproducible from
    the pixel rule when the payload was synthesized.
    Raises ValueError on malformed payloads.
    """
    width, height, _color_type, pixels = decode_png(payload)
    feat = [0] * FEATURE_DIM
    for b in pixels:
        feat[b >> 5] += 1  # 256 intensities / 8 bins = 32 per bin
    n = len(pixels) or 1
    return width, height, [round(f / n, 6) for f in feat]


def extract_image_features(media: DataFrame) -> DataFrame:
    """mapInPandas decode: Arrow batches in, feature rows out.

    Column pruning matters: select exactly (media_id, payload) before the
    Python stage so only the needed columns cross the Arrow boundary.
    Malformed payloads yield null width/height/feature (tolerant reader).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ws, hs, feats = [], [], []
            for p in pdf["payload"]:
                try:
                    w, h, f = decode_image(p)
                except Exception:  # malformed → nulls, never fail the batch
                    w = h = f = None
                ws.append(w)
                hs.append(h)
                feats.append(f)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "feature": feats,
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        batches, IMAGE_FEATURES_SCHEMA
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def resize_image(payload: bytes, target_w: int, target_h: int) -> bytes:
    """Real resize: PNG decode → nearest-neighbor resample → PNG encode."""
    width, height, color_type, pixels = decode_png(payload)
    resized = resize_nearest(
        pixels, width, height, target_w, target_h, CHANNELS[color_type]
    )
    return encode_png(target_w, target_h, resized, color_type)


def resize_images(media: DataFrame, target_w: int = 32, target_h: int = 32) -> DataFrame:
    """Batch resize via mapInPandas (only media_id+payload cross Arrow).
    Malformed payloads yield a null output payload (tolerant reader)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for p in pdf["payload"]:
                try:
                    out.append(resize_image(p, target_w, target_h))
                except Exception:
                    out.append(None)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": target_w,
                    "height": target_h,
                    "payload": out,
                }
            )

    return media.select("media_id", "payload").mapInPandas(batches, RESIZED_SCHEMA)


SCRUBBED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("scrubbed", T.BooleanType()),
        T.StructField("dropped_tags", T.ArrayType(T.StringType())),
    ]
)


def scrub_media(media: DataFrame) -> DataFrame:
    """Strip embedded metadata (EXIF/GPS, PNG text chunks, RIFF INFO)
    from every recognized payload — the multimodal twin of the text
    tier's ``pii_redact``: (media_id, payload, scrubbed, dropped_tags).

    Format sniffing by signature: JPEG/PNG/WAV payloads run the matching
    ``functions/scrub.py`` scrubber (coded image/audio bytes stay
    byte-identical — only metadata containers drop); unrecognized or
    structurally corrupt payloads pass through UNCHANGED with
    ``scrubbed=false`` (tolerant reader — a scrub stage must never
    destroy data it cannot parse, and the flag is the audit trail for
    quarantining what it could not clean). One Arrow pass, zero shuffle,
    payloads never cross the driver."""
    from nexus_event_stream_spark.functions.scrub import (
        scrub_gif,
        scrub_jpeg,
        scrub_mp4,
        scrub_png,
        scrub_wav,
    )
    from nexus_event_stream_spark.functions.png import SIGNATURE

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            outs, flags, tags = [], [], []
            for p in pdf["payload"]:
                p = p or b""
                try:
                    if p[:2] == b"\xff\xd8":
                        clean, dropped = scrub_jpeg(p)
                    elif p.startswith(SIGNATURE):
                        clean, dropped = scrub_png(p)
                    elif p[:4] == b"RIFF":
                        clean, dropped = scrub_wav(p)
                    elif p[4:8] == b"ftyp":
                        clean, dropped = scrub_mp4(p)
                    elif p[:6] in (b"GIF87a", b"GIF89a"):
                        clean, dropped = scrub_gif(p)
                    else:
                        raise ValueError("unrecognized format")
                    outs.append(clean)
                    flags.append(True)
                    tags.append(dropped)
                except Exception:
                    outs.append(p)
                    flags.append(False)
                    tags.append([])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": outs,
                    "scrubbed": flags,
                    "dropped_tags": tags,
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        batches, SCRUBBED_SCHEMA
    )


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(media: DataFrame, n_frames: int = 4, frame_bytes: int = 16) -> DataFrame:
    """Uniform frame sampling from a video payload, one output row per
    sampled frame (1→N Arrow fan-out).

    Three tiers, most-real first:
    - PNG-family payloads (APNG animations and plain PNGs): REAL decoded
      frames — the animation is decoded (functions/png.py decode_apng)
      and ``n_frames`` evenly spaced frames are re-encoded as standalone
      PNGs, each output row itself a decodable image.
    - MP4 (ISO BMFF) payloads: REAL container demux — the sample tables
      (stts/stsc/stsz/stco, functions/mp4.py) resolve every frame's
      exact byte range, and ``n_frames`` evenly spaced ENCODED frames
      are sliced out. Codec decode of those payloads (H.264 etc.) is the
      one environment-capped step — no media libraries in this box — so
      rows carry the encoded-frame bytes a downstream decoder wants.
    - JPEG payloads: the marker walk (functions/jpeg.py) resolves every
      entropy-coded SCAN's byte range. A multi-scan (progressive) JPEG
      samples ``n_frames`` evenly spaced scans and slices their raw
      entropy bytes — the exact per-sample-range shape of the MP4 tier
      (each row an encoded refinement pass; pixel decode stays the
      environment-capped step). A single-scan JPEG is a still: every
      sampled index resolves to frame 0, the whole payload — the same
      shape a plain (non-animated) PNG produces through decode_apng.
      Structural corruption falls through to the byte-window tier.
    - anything else: evenly spaced ``frame_bytes`` byte windows — the
      tolerant-reader fallback (consumer.go:39-44), same row shape.
    """
    from nexus_event_stream_spark.functions.mp4 import parse_mp4

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def picks(count: int) -> list[int]:
            return [
                (i * (count - 1)) // max(n_frames - 1, 1)
                for i in range(n_frames)
            ]

        for pdf in it:
            ids, idxs, frames = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                p = p or b""
                try:
                    w, h, ct, fx = decode_apng(p)
                    for i, k in enumerate(picks(len(fx))):
                        ids.append(mid)
                        idxs.append(i)
                        frames.append(encode_png(w, h, fx[k], ct))
                    continue
                except Exception:
                    pass
                try:
                    info = parse_mp4(p)
                    offs, szs = info["sample_offsets"], info["sample_sizes"]
                    if not offs:
                        raise ValueError("no samples")
                    # slice ONLY the picked frames — copying every sample
                    # of a large file to keep n_frames of them would
                    # double per-payload memory in this hot path
                    for i, k in enumerate(picks(len(offs))):
                        ids.append(mid)
                        idxs.append(i)
                        frames.append(p[offs[k] : offs[k] + szs[k]])
                    continue
                except Exception:
                    pass
                if p[:2] == b"\xff\xd8":
                    try:
                        # one marker walk does double duty: it raises on
                        # the same structural corruption jpeg_meta does
                        # AND yields the scan ranges (a second full walk
                        # per payload would dominate this hot kernel)
                        scans = jpeg_scan_ranges(p)
                        if len(scans) > 1:
                            # progressive: sample scans like MP4 samples
                            for i, k in enumerate(picks(len(scans))):
                                ids.append(mid)
                                idxs.append(i)
                                frames.append(
                                    p[
                                        scans[k]["data_offset"] : scans[k][
                                            "data_end"
                                        ]
                                    ]
                                )
                        else:  # single-scan still
                            for i in range(n_frames):
                                ids.append(mid)
                                idxs.append(i)
                                frames.append(p)
                        continue
                    except Exception:
                        pass
                for i in range(n_frames):
                    off = (i * max(len(p) - frame_bytes, 0)) // max(
                        n_frames - 1, 1
                    )
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(p[off : off + frame_bytes])
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return media.select("media_id", "payload").mapInPandas(batches, FRAMES_SCHEMA)


#: Deterministic synthetic-media rule shared by the Spark kernels and the
#: DuckDB oracle of q_binary_meta. Image (8-bit grayscale PNG):
#:   width  = 4 + doc_id % 13          height = 3 + doc_id % 7
#:   filter = doc_id % 5               pixel_i = (doc_id*31 + i) % 256
#: Cycling the filter over doc_id means the corpus exercises ALL FIVE PNG
#: filters on both encode and decode — any filter bug breaks the oracle's
#: pixel-sum hash. Audio (16-bit mono PCM WAV @ 8 kHz):
#:   n_samples = 64 + doc_id % 129
#:   sample_i  = ((doc_id*17 + i*i) % 65536) - 32768
#: with |sample| summed on decode — any sample-unpack bug breaks the hash.
#: Video (APNG, same canvas as the image):
#:   n_frames  = 2 + doc_id % 3        frame filter = (doc_id + f) % 5
#:   pixel_{f,i} = (doc_id*31 + f*97 + i) % 256
#: decoded to frame count + total pixel sum across frames — any
#: acTL/fcTL/fdAT or per-frame filter bug breaks the hash.
#: MP4 container (functions/mp4.py; opaque synthetic coded frames —
#: codec decode is environment-capped, the container demux is real):
#:   n_mp4     = 2 + doc_id % 4        frame_duration = 40
#:   len(frame_f)   = 8 + (doc_id + f) % 9
#:   frame_f byte_i = (doc_id*13 + f*41 + i) % 256
#: demuxed (stts/stsc/stsz/stco resolution) to sample count, byte total,
#: last decode timestamp, and the byte-value sum over every extracted
#: sample — any box-walk, chunk-math, or slicing bug breaks the hash.
#: Fragmented MP4 (fMP4/CMAF: moov carries only mvex/trex defaults;
#: samples arrive per-fragment in moof/traf/trun — the DASH/HLS segment
#: shape real ingest sees):
#:   n_fmp4    = 3 + doc_id % 5        frames_per_fragment = 2
#:   len(frame_f)   = 6 + (doc_id*3 + f) % 7
#:   frame_f byte_i = (doc_id*7 + f*29 + i) % 256
#: demuxed via trun data-offset/size resolution (default-base-is-moof)
#: to fragment count, sample count, last tfdt-anchored timestamp and the
#: byte-value sum — any traf/trun bug breaks the hash.
#: JPEG (functions/jpeg.py; marker-walk metadata, no pixel decode —
#: entropy decode is environment-capped like the MP4 codec payloads):
#:   width  = 8 + doc_id % 31          height = 5 + doc_id % 17
#:   n_components = 1 + doc_id % 3     progressive = doc_id % 2 == 1
#:   orientation  = doc_id % 9 (0 → absent/NULL), EXIF endianness
#:   alternating little/big over doc_id — both TIFF byte orders are
#:   exercised; any marker-walk, SOF-parse, or EXIF-IFD bug breaks the
#:   hash.
DOC_MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("size_class", T.StringType()),
        T.StructField("png_filter", T.IntegerType()),
        T.StructField("image", T.BinaryType()),
        T.StructField("audio", T.BinaryType()),
        T.StructField("video", T.BinaryType()),
        T.StructField("mp4video", T.BinaryType()),
        T.StructField("fmp4video", T.BinaryType()),
        T.StructField("jpeg", T.BinaryType()),
        T.StructField("gif", T.BinaryType()),
    ]
)

DECODED_DOC_MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("size_class", T.StringType()),
        T.StructField("png_filter", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sum_pixels", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("sum_abs_samples", T.LongType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("sum_frame_pixels", T.LongType()),
        T.StructField("n_mp4_samples", T.IntegerType()),
        T.StructField("mp4_sample_bytes", T.LongType()),
        T.StructField("mp4_last_time", T.LongType()),
        T.StructField("mp4_byte_sum", T.LongType()),
        T.StructField("n_fmp4_fragments", T.IntegerType()),
        T.StructField("n_fmp4_samples", T.IntegerType()),
        T.StructField("fmp4_last_time", T.LongType()),
        T.StructField("fmp4_byte_sum", T.LongType()),
        T.StructField("jpeg_width", T.IntegerType()),
        T.StructField("jpeg_height", T.IntegerType()),
        T.StructField("jpeg_components", T.IntegerType()),
        T.StructField("jpeg_progressive", T.BooleanType()),
        T.StructField("jpeg_orientation", T.IntegerType()),
        T.StructField("gif_n_frames", T.IntegerType()),
        T.StructField("gif_pixel_sum", T.LongType()),
        T.StructField("gif_total_delay", T.IntegerType()),
        T.StructField("gif_loop", T.IntegerType()),
        T.StructField("image_dhash", T.LongType()),
        T.StructField("gif_dhash", T.LongType()),
    ]
)


def doc_image_dims(doc_id: int) -> tuple[int, int, int]:
    return 4 + doc_id % 13, 3 + doc_id % 7, doc_id % 5


def synthesize_doc_media(docs: DataFrame) -> DataFrame:
    """Encode a real PNG and a real WAV per document from the
    deterministic rules above (metadata columns ride through the Arrow
    boundary as passthroughs, so no join is needed downstream)."""
    meta = docs.select(
        "doc_id",
        F.octet_length("text").cast("long").alias("n_bytes"),
        F.when(F.octet_length("text") > 300, F.lit("large"))
        .otherwise(F.lit("small"))
        .alias("size_class"),
    )

    from nexus_event_stream_spark.functions.mp4 import encode_fmp4, encode_mp4

    from nexus_event_stream_spark.functions.gif import (
        encode_gif,
        gray_palette,
    )

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pal = gray_palette()
        for pdf in it:
            filts, images, audios, videos, mp4s, fmp4s, jpegs, gifs = (
                [], [], [], [], [], [], [], [],
            )
            for did in pdf["doc_id"]:
                did = int(did)
                w, h, f = doc_image_dims(did)
                px = bytes((did * 31 + i) % 256 for i in range(w * h))
                filts.append(f)
                images.append(encode_png(w, h, px, color_type=0, filter_type=f))
                n = 64 + did % 129
                samples = [
                    ((did * 17 + i * i) % 65536) - 32768 for i in range(n)
                ]
                audios.append(encode_wav(samples, sample_rate=8000))
                nf = 2 + did % 3
                frames = [
                    bytes((did * 31 + fi * 97 + i) % 256 for i in range(w * h))
                    for fi in range(nf)
                ]
                videos.append(
                    encode_apng(
                        w,
                        h,
                        frames,
                        color_type=0,
                        filter_type=[(did + fi) % 5 for fi in range(nf)],
                    )
                )
                nm = 2 + did % 4
                mp4s.append(
                    encode_mp4(
                        [
                            bytes(
                                (did * 13 + fi * 41 + i) % 256
                                for i in range(8 + (did + fi) % 9)
                            )
                            for fi in range(nm)
                        ],
                        width=w,
                        height=h,
                    )
                )
                nm2 = 3 + did % 5
                fmp4s.append(
                    encode_fmp4(
                        [
                            bytes(
                                (did * 7 + fi * 29 + i) % 256
                                for i in range(6 + (did * 3 + fi) % 7)
                            )
                            for fi in range(nm2)
                        ],
                        width=w,
                        height=h,
                        frames_per_fragment=2,
                    )
                )
                jpegs.append(
                    synthesize_jpeg(
                        8 + did % 31,
                        5 + did % 17,
                        n_components=1 + did % 3,
                        progressive=did % 2 == 1,
                        orientation=(did % 9) or None,
                        exif_big_endian=did % 2 == 0,
                    )
                )
                # animated GIF (r13, functions/gif.py): same canvas as
                # the PNG, grayscale identity palette so the index IS
                # the luma; every 4th doc interlaced — the oracle gate
                # covers the de-interlace path too
                ng = 2 + did % 3
                gifs.append(
                    encode_gif(
                        w,
                        h,
                        [
                            bytes(
                                (did * 19 + fi * 53 + i) % 256
                                for i in range(w * h)
                            )
                            for fi in range(ng)
                        ],
                        pal,
                        delays_cs=[4 + (did + fi) % 6 for fi in range(ng)],
                        interlace=did % 4 == 0,
                        loop=did % 3,
                    )
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["n_bytes"],
                    "size_class": pdf["size_class"],
                    "png_filter": pd.array(filts, dtype="int32"),
                    "image": images,
                    "audio": audios,
                    "video": videos,
                    "mp4video": mp4s,
                    "fmp4video": fmp4s,
                    "jpeg": jpegs,
                    "gif": gifs,
                }
            )

    return meta.mapInPandas(gen, DOC_MEDIA_SCHEMA)


def decode_doc_media(media: DataFrame) -> DataFrame:
    """Decode the synthesized PNGs and WAVs back to dimensions, exact
    pixel sum, and exact absolute-sample energy — the quantities the SQL
    oracle recomputes closed-form."""

    from nexus_event_stream_spark.functions.gif import decode_gif, gif_meta
    from nexus_event_stream_spark.functions.mp4 import (
        extract_samples,
        parse_mp4,
    )

    from nexus_event_stream_spark.operators.phash import (
        default_image_decoder,
        dhash_bytes,
    )

    def dec(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ws, hs, sums = [], [], []
            i_dh, g_dh = [], []
            rates, counts, energies = [], [], []
            nframes, fsums = [], []
            m_ns, m_bytes, m_last, m_sum = [], [], [], []
            f_nf, f_ns, f_last, f_sum = [], [], [], []
            j_w, j_h, j_nc, j_prog, j_or = [], [], [], [], []
            g_nf, g_sum, g_delay, g_loop = [], [], [], []
            for p in pdf["image"]:
                try:
                    w, h, _ct, px = decode_png(p)
                    ws.append(w)
                    hs.append(h)
                    sums.append(sum(px))
                except Exception:
                    ws.append(None)
                    hs.append(None)
                    sums.append(None)
                # the perceptual tier's OWN path (operators/phash.py:
                # default_image_decoder -> dhash_bytes), not a shortcut
                # through the already-decoded pixels — this is what puts
                # the dHash kernel under the driver's value-hash gate
                gray = default_image_decoder(p) if p is not None else None
                i_dh.append(
                    dhash_bytes(gray)
                    if gray is not None and gray.size
                    else None
                )
            for p in pdf["audio"]:
                try:
                    rate, _ch, samples = decode_wav(p)
                    rates.append(rate)
                    counts.append(len(samples))
                    # widen BEFORE abs: int16 abs(-32768) wraps to -32768
                    energies.append(
                        int(np.abs(samples.astype(np.int64)).sum())
                    )
                except Exception:
                    rates.append(None)
                    counts.append(None)
                    energies.append(None)
            for p in pdf["video"]:
                try:
                    _w, _h, _ct, frames = decode_apng(p)
                    nframes.append(len(frames))
                    fsums.append(sum(sum(fr) for fr in frames))
                except Exception:
                    nframes.append(None)
                    fsums.append(None)
            for p in pdf["mp4video"]:
                # compute every value BEFORE appending any: a partial
                # append followed by the except-branch appends would
                # leave the four lists at unequal lengths and fail the
                # whole Arrow batch (e.g. a valid zero-sample container,
                # where sample_times[-1] raises)
                try:
                    info = parse_mp4(p)
                    chunks = extract_samples(p, info)
                    ns = info["n_samples"]
                    nb = sum(info["sample_sizes"])
                    lt = info["sample_times"][-1] if info["sample_times"] else None
                    bs = sum(sum(c) for c in chunks)
                except Exception:
                    ns = nb = lt = bs = None
                m_ns.append(ns)
                m_bytes.append(nb)
                m_last.append(lt)
                m_sum.append(bs)
            for p in pdf["fmp4video"]:
                try:
                    info = parse_mp4(p)
                    if not info["fragmented"]:
                        raise ValueError("expected a fragmented container")
                    chunks = extract_samples(p, info)
                    nf = info["n_fragments"]
                    ns = info["n_samples"]
                    lt = info["sample_times"][-1] if info["sample_times"] else None
                    bs = sum(sum(c) for c in chunks)
                except Exception:
                    nf = ns = lt = bs = None
                f_nf.append(nf)
                f_ns.append(ns)
                f_last.append(lt)
                f_sum.append(bs)
            for p in pdf["jpeg"]:
                try:
                    m = jpeg_meta(p)
                    jw, jh = m["width"], m["height"]
                    jnc, jpg = m["n_components"], m["progressive"]
                    jo = m["orientation"]
                except Exception:
                    jw = jh = jnc = jpg = jo = None
                j_w.append(jw)
                j_h.append(jh)
                j_nc.append(jnc)
                j_prog.append(jpg)
                j_or.append(jo)
            for p in pdf["gif"]:
                # full pixel decode (LZW + de-interlace + compositing);
                # identity grayscale palette -> the RED channel of the
                # composited frame IS the encoded index stream
                try:
                    _w, _h, frames, delays = decode_gif(p)
                    nf = len(frames)
                    ps = sum(sum(fr[0::3]) for fr in frames)
                    td = sum(delays)
                    lp = gif_meta(p)["loop"]
                except Exception:
                    nf = ps = td = lp = None
                g_nf.append(nf)
                g_sum.append(ps)
                g_delay.append(td)
                g_loop.append(lp)
                # frame-0 composite through phash's decoder: LZW +
                # de-interlace + identity-palette luma — the oracle's
                # integer twin is exact for EVERY doc_id (validated
                # exhaustively over a full pattern period; see q_binary_meta)
                gray = default_image_decoder(p) if p is not None else None
                g_dh.append(
                    dhash_bytes(gray)
                    if gray is not None and gray.size
                    else None
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["n_bytes"],
                    "size_class": pdf["size_class"],
                    "png_filter": pdf["png_filter"],
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "sum_pixels": pd.array(sums, dtype="Int64"),
                    "sample_rate": pd.array(rates, dtype="Int32"),
                    "n_samples": pd.array(counts, dtype="Int32"),
                    "sum_abs_samples": pd.array(energies, dtype="Int64"),
                    "n_frames": pd.array(nframes, dtype="Int32"),
                    "sum_frame_pixels": pd.array(fsums, dtype="Int64"),
                    "n_mp4_samples": pd.array(m_ns, dtype="Int32"),
                    "mp4_sample_bytes": pd.array(m_bytes, dtype="Int64"),
                    "mp4_last_time": pd.array(m_last, dtype="Int64"),
                    "mp4_byte_sum": pd.array(m_sum, dtype="Int64"),
                    "n_fmp4_fragments": pd.array(f_nf, dtype="Int32"),
                    "n_fmp4_samples": pd.array(f_ns, dtype="Int32"),
                    "fmp4_last_time": pd.array(f_last, dtype="Int64"),
                    "fmp4_byte_sum": pd.array(f_sum, dtype="Int64"),
                    "jpeg_width": pd.array(j_w, dtype="Int32"),
                    "jpeg_height": pd.array(j_h, dtype="Int32"),
                    "jpeg_components": pd.array(j_nc, dtype="Int32"),
                    "jpeg_progressive": pd.array(j_prog, dtype="boolean"),
                    "jpeg_orientation": pd.array(j_or, dtype="Int32"),
                    "gif_n_frames": pd.array(g_nf, dtype="Int32"),
                    "gif_pixel_sum": pd.array(g_sum, dtype="Int64"),
                    "gif_total_delay": pd.array(g_delay, dtype="Int32"),
                    "gif_loop": pd.array(g_loop, dtype="Int32"),
                    "image_dhash": pd.array(i_dh, dtype="Int64"),
                    "gif_dhash": pd.array(g_dh, dtype="Int64"),
                }
            )

    return media.mapInPandas(dec, DECODED_DOC_MEDIA_SCHEMA)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter used by tests/bench: treat document text bytes as an opaque
    payload so the multimodal plumbing can run on driver testdata."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.octet_length(F.col("text")).cast("long").alias("n_bytes"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )
