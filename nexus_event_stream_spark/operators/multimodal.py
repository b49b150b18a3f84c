"""Multimodal column plumbing: opaque binary payloads + typed metadata.

North-star extension. Image/audio/video payloads are carried as Spark
``binary`` columns beside typed metadata; the heavy per-item work
(decode, feature-extract, resize, frame-sample) runs as Arrow-batched
``mapInPandas`` so each Python worker sees columnar batches, not rows.

The actual codecs (PIL/ffmpeg/etc.) are NOT in this container, so the
decode kernels are STUBBED: ``decode_image_stub`` produces a deterministic
fake feature vector from the bytes. The Spark-side contract — schemas,
batch iteration, partition sizing, column pruning — is real and tested;
swapping a stub for a real codec changes one inner function only.

Scale notes: binary payloads dominate row size, so
``spark.sql.files.maxPartitionBytes`` (not row count) controls partition
memory; metadata-only queries never touch the blob column thanks to
parquet column pruning — keep payloads in their own column, never inside
a struct with hot metadata.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


def decode_image_stub(payload: bytes) -> tuple[int, int, list[float]]:
    """Deterministic fake decode: dims and an 8-dim feature from the bytes.

    Replace with a real codec (PIL.Image.open etc.) when available —
    NotImplementedError semantics are provided by ``decode_image_real``.
    """
    if payload is None:
        return 0, 0, [0.0] * FEATURE_DIM
    n = len(payload)
    width = 16 + n % 64
    height = 16 + (n // 64) % 64
    feat = [0.0] * FEATURE_DIM
    for i, byte in enumerate(payload[:256]):
        feat[i % FEATURE_DIM] += byte / 255.0
    return width, height, [round(f, 6) for f in feat]


def decode_image_real(payload: bytes):
    raise NotImplementedError(
        "image codecs are not available in this environment; "
        "decode_image_stub provides the deterministic test double"
    )


def extract_image_features(media: DataFrame) -> DataFrame:
    """mapInPandas decode: Arrow batches in, feature rows out.

    Column pruning matters: select exactly (media_id, payload) before the
    Python stage so only the needed columns cross the Arrow boundary.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [decode_image_stub(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "feature": [d[2] for d in decoded],
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


def resize_image_stub(payload: bytes, target_w: int, target_h: int) -> bytes:
    """Deterministic fake resize: proportionally subsample the byte stream
    (a real kernel decodes → interpolates → re-encodes; same signature)."""
    if not payload:
        return b""
    n = max(1, int(len(payload) * (target_w * target_h) / (64 * 64)))
    step = max(1, len(payload) // n)
    return payload[::step][:n]


def resize_images(media: DataFrame, target_w: int = 32, target_h: int = 32) -> DataFrame:
    """Batch resize via mapInPandas (only media_id+payload cross Arrow)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": target_w,
                    "height": target_h,
                    "payload": [
                        resize_image_stub(p, target_w, target_h)
                        for p in pdf["payload"]
                    ],
                }
            )

    return media.select("media_id", "payload").mapInPandas(batches, RESIZED_SCHEMA)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(media: DataFrame, n_frames: int = 4, frame_bytes: int = 16) -> DataFrame:
    """Uniform frame sampling from a video-like payload: n_frames evenly
    spaced byte windows per payload, one output row per frame (explode
    shape). A real kernel seeks keyframes; the Spark-side contract —
    1→N row fan-out through Arrow — is identical.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                p = p or b""
                for i in range(n_frames):
                    off = (i * max(len(p) - frame_bytes, 0)) // max(n_frames - 1, 1)
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(p[off : off + frame_bytes])
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return media.select("media_id", "payload").mapInPandas(batches, FRAMES_SCHEMA)


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
