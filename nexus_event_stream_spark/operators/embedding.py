"""Embedding generation plumbing — batch text→vector encoding as a
Spark stage.

The ENCODER is the one environment-capped step (no torch/onnx/
sentence-transformers in this container — the same boundary as codec
decode in the multimodal tier), so the model call is isolated behind
``encoder_fn`` and the default is a clearly-documented DETERMINISTIC
FAKE (hashed bag-of-words projection). Everything around it — Arrow
batching, schema, normalization, padding discipline, composition with
chunking and the ANN tiers — is the real production plumbing and is
what this module tests.

The default ``hashed_bow_encoder`` is not a pretend transformer; it is
the classic feature-hashing text embedding (hash each token into one of
``dim`` signed buckets, L2-normalize — Weinberger et al. 2009, "Feature
Hashing for Large Scale Multitask Learning"): deterministic,
partition-independent, and similarity-bearing enough that chunk→embed→
ANN round-trips are testable end to end (near-identical texts map to
near-identical vectors). A deployment passes its model client as
``encoder_fn(list[str]) -> ndarray[n, dim]`` and nothing else changes.

Scale shape: one zero-shuffle Arrow kernel; each executor batch makes
ONE ``encoder_fn`` call (the batch-inference shape every embedding
service wants — per-row calls would be the latency disaster). Driver
holds nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, types as T

__all__ = ["embed_documents", "hashed_bow_encoder"]


def hashed_bow_encoder(dim: int = 64, seed: int = 9):
    """The default deterministic encoder: signed feature-hashing of
    whitespace tokens into ``dim`` buckets, L2-normalized. A REAL
    (if shallow) text embedding — not a stub that returns zeros — so
    similarity structure survives for end-to-end tests; swap in the
    model client for production quality."""
    import numpy as np

    mask = (1 << 61) - 1

    def encode(texts):
        out = np.zeros((len(texts), dim), dtype=np.float64)
        for i, t in enumerate(texts):
            for tok in (t or "").split():
                h = 0
                for ch in tok:
                    h = (h * 1099511628211 + ord(ch) + seed) & mask
                out[i, h % dim] += 1.0 if (h >> 32) & 1 else -1.0
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0
        return out / norms

    return encode


def embed_documents(
    docs: DataFrame,
    encoder_fn=None,
    dim: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_col, embedding) — one vector per document/chunk, encoded in
    Arrow-batch-sized ``encoder_fn`` calls. Empty/NULL texts embed as
    the zero vector (present but similarity-neutral — dropping rows
    here would silently desync chunk tables; filter downstream if
    wanted). Output plugs straight into operators/similarity.py /
    semdedup.py / streaming/ann_index.py (``vec_id``-style long id +
    ``array<double>``)."""
    encode = encoder_fn or hashed_bow_encoder(dim)
    # id type mirrors the input schema (string/int ids fail at the API
    # boundary, not inside the Arrow kernel)
    out_schema = T.StructType(
        [
            docs.schema[id_col],
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )

    def batches(it):
        import pandas as pd

        for pdf in it:
            texts = ["" if t is None else str(t) for t in pdf[text_col]]
            vecs = encode(texts)
            if len(texts) and (
                getattr(vecs, "ndim", 0) != 2 or vecs.shape[0] != len(texts)
            ):
                raise ValueError(
                    f"encoder_fn returned shape "
                    f"{getattr(vecs, 'shape', None)} for {len(texts)} texts"
                )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "embedding": [list(map(float, v)) for v in vecs],
                }
            )

    return docs.select(id_col, text_col).mapInPandas(batches, out_schema)
