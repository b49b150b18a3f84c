"""Pure-Python WAV (RIFF/WAVE PCM) codec — stdlib ``struct`` + numpy.

Real container: RIFF header, ``fmt `` chunk (PCM, mono/stereo, 16-bit),
``data`` chunk of little-endian int16 samples, with size validation on
decode. ffmpeg/soundfile are not in this container; this module exists so
the multimodal audio kernels (operators/multimodal.py) exercise a genuine
decode and the catalog's q_binary_meta can verify decoded sample counts
and energy against a closed-form SQL oracle.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(
    samples: list[int], sample_rate: int = 8000, channels: int = 1
) -> bytes:
    """Encode int16 PCM samples (interleaved if stereo) into a WAV file."""
    for s in samples:
        if not -32768 <= s <= 32767:
            raise ValueError(f"sample {s} out of int16 range")
    data = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * channels * 2
    block_align = channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, 16
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[int, int, "np.ndarray"]:
    """Decode a WAV → ``(sample_rate, channels, samples)`` where samples
    is an int16 numpy array (zero-copy view of the data chunk — the
    audio kernels consume numpy anyway, and a Python list materialized
    one object per sample in the decode hot path). Beware int16
    overflow downstream: cast to a wider dtype before ``abs``/``sum``.

    Raises ``ValueError`` on malformed input (bad magic, truncated chunks,
    non-PCM, non-16-bit) — callers follow the engine's tolerant-reader
    convention and emit nulls.
    """
    payload = bytes(payload or b"")
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    (riff_size,) = struct.unpack("<I", payload[4:8])
    if riff_size + 8 > len(payload):
        raise ValueError("truncated RIFF payload")
    off = 12
    sample_rate = channels = None
    data = None
    while off + 8 <= len(payload):
        tag = payload[off : off + 4]
        (length,) = struct.unpack("<I", payload[off + 4 : off + 8])
        chunk = payload[off + 8 : off + 8 + length]
        if len(chunk) != length:
            raise ValueError(f"truncated {tag!r} chunk")
        if tag == b"fmt ":
            if length < 16:
                raise ValueError("fmt chunk too short")
            audio_format, channels, sample_rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", chunk[:16]
            )
            if audio_format != 1:
                raise ValueError(f"unsupported audio format {audio_format}")
            if bits != 16:
                raise ValueError(f"unsupported bit depth {bits}")
        elif tag == b"data":
            data = chunk
        off += 8 + length + (length & 1)  # chunks are word-aligned
    if sample_rate is None or data is None:
        raise ValueError("missing fmt or data chunk")
    if len(data) % 2:
        raise ValueError("odd data chunk length for 16-bit samples")
    samples = np.frombuffer(data, dtype="<i2")
    return sample_rate, channels, samples
