"""Corpus drift detection: compare snapshots through persisted sketches.

The operational question every recurring 100 TB ingest faces: *"is this
week's crawl still the same distribution we trained on last week — or did
a source rot, a boilerplate farm flood in, a language mix shift?"*
Re-scanning both snapshots to answer is a double-corpus job; diffing them
row-wise is a corpus² join. This module answers it from KB-scale state:

- **profile** (``corpus_profile``): one pass over a snapshot folds it into
  the sketch family — a quantile sketch of document lengths
  (operators/quantiles.py), a Misra-Gries token-frequency sketch
  (operators/heavy_hitters.py), and a KMV sketch of content shingles
  (operators/sketches.py), plus the exact doc count. The profile is one
  JSON blob: persist it next to the snapshot manifest (the same pattern as
  the KMV persistence tier) and every later comparison is driver math.
- **compare** (``drift_report``): two profiles → metrics with no data
  access at all: length-quantile shifts (relative, per decile), token
  frequency L1 distance over the union of heavy-hitter supports (each
  side normalized by its own mass — bounded [0, 2]), content Jaccard
  (KMV), and cardinality ratio. ``flags`` marks metrics past thresholds
  so a scheduler can gate promotion on it, the same publish-gate shape as
  operators/expectations.py.

Every underlying sketch is deterministic (hash-derived or
alternating-offset), so "no drift" on identical data is EXACT zero, not
merely small — pinned by test.

Scale shape: building a profile costs three scan-shaped jobs (lengths
and tokens fold in mapInPandas passes — the exact doc count rides free on
the length sketch; shingle KMV is a distinct + TakeOrdered) — all
corpus-size-independent state. Comparing costs zero jobs. Reference parity: no analogue; north-star corpus-profiling tier.
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nexus_event_stream_spark.functions.text import tokens
from nexus_event_stream_spark.operators.heavy_hitters import (
    MGSummary,
    mg_sketch,
)
from nexus_event_stream_spark.operators.quantiles import (
    QuantileSketch,
    quantile_sketch,
)
from nexus_event_stream_spark.operators.sketches import (
    KMVSketch,
    kmv_jaccard,
    kmv_sketch,
    shingle_rows,
)

#: Default comparison thresholds — tuned loose: drift gates should page on
#: distribution breaks, not on sampling wiggle.
DRIFT_THRESHOLDS = {
    "max_len_quantile_shift": 0.25,  # any decile moved >25 % relatively
    "max_token_l1": 0.5,  # heavy-hitter mass displaced
    "min_content_jaccard": 0.05,  # near-zero shingle overlap = new corpus
    "max_doc_ratio_jump": 4.0,  # corpus grew/shrank >4x
}

_QS = [round(0.1 * i, 1) for i in range(1, 10)]  # deciles 0.1..0.9


@dataclass(frozen=True)
class CorpusProfile:
    """One snapshot's distribution fingerprint, all sketch-sized."""

    n_docs: int
    lengths: QuantileSketch
    token_freq: MGSummary
    shingles: KMVSketch

    def to_json(self) -> str:
        return json.dumps(
            {
                "kind": "corpus_profile",
                "n_docs": self.n_docs,
                "lengths": json.loads(self.lengths.to_json()),
                "token_freq": json.loads(self.token_freq.to_json()),
                "shingles": self.shingles.to_dict(),
            }
        )

    @staticmethod
    def from_json(s: str) -> "CorpusProfile":
        d = json.loads(s)
        if d.get("kind") != "corpus_profile":
            raise ValueError(f"not a corpus profile: {d.get('kind')!r}")
        return CorpusProfile(
            n_docs=int(d["n_docs"]),
            lengths=QuantileSketch.from_json(json.dumps(d["lengths"])),
            token_freq=MGSummary.from_json(json.dumps(d["token_freq"])),
            shingles=KMVSketch.from_dict(d["shingles"]),
        )


def corpus_profile(
    docs: DataFrame,
    text_col: str = "text",
    quantile_k: int = 256,
    token_capacity: int = 512,
    shingle_n: int = 5,
    kmv_k: int = 256,
) -> CorpusProfile:
    """Fold one snapshot into its profile: THREE scan-shaped jobs
    (lengths, tokens, shingles); nothing row-sized reaches the driver.
    ``n_docs`` counts documents with non-NULL text — it rides for free on
    the length sketch's exact ``n`` instead of a fourth scan."""
    lengths = quantile_sketch(
        docs.select(F.length(F.col(text_col)).alias("len")), "len", k=quantile_k
    )
    n_docs = lengths.n
    toks = docs.select(
        F.explode(tokens(F.lower(F.col(text_col)))).alias("tok")
    ).where(F.length("tok") > 0)
    token_freq = mg_sketch(toks, "tok", capacity=token_capacity)
    shingles = kmv_sketch(
        shingle_rows(docs, text_col, n=shingle_n), "shingle", k=kmv_k
    )
    return CorpusProfile(
        n_docs=n_docs,
        lengths=lengths,
        token_freq=token_freq,
        shingles=shingles,
    )


def merge_profiles(a: CorpusProfile, b: CorpusProfile) -> CorpusProfile:
    """Combine two profiles into the union corpus's profile WITHOUT data
    access — every constituent sketch is closed under merge (KMV exactly,
    quantile/MG with additive error). This is what lets per-shard or
    per-epoch profiles roll up into a snapshot profile."""
    from nexus_event_stream_spark.operators.heavy_hitters import mg_merge
    from nexus_event_stream_spark.operators.quantiles import quantile_merge
    from nexus_event_stream_spark.operators.sketches import kmv_merge

    return CorpusProfile(
        n_docs=a.n_docs + b.n_docs,
        lengths=quantile_merge(a.lengths, b.lengths),
        token_freq=mg_merge(a.token_freq, b.token_freq),
        shingles=kmv_merge(a.shingles, b.shingles),
    )


def _len_shifts(a: QuantileSketch, b: QuantileSketch) -> dict[str, float]:
    out = {}
    for q in _QS:
        va, vb = a.quantile(q), b.quantile(q)
        denom = max(abs(va), 1e-9)
        out[f"p{int(q * 100)}"] = abs(vb - va) / denom
    return out


def _token_l1(a: MGSummary, b: MGSummary) -> float:
    """L1 distance between the two heavy-hitter frequency vectors, each
    normalized by its own observed mass. Bounded [0, 2]; 0 on identical
    corpora (deterministic sketches)."""
    mass_a = sum(a.counts.values()) or 1
    mass_b = sum(b.counts.values()) or 1
    support = set(a.counts) | set(b.counts)
    return sum(
        abs(a.counts.get(t, 0) / mass_a - b.counts.get(t, 0) / mass_b)
        for t in support
    )


@dataclass(frozen=True)
class EmbeddingProfile:
    """Embedding-space fingerprint: per-dimension mean and variance (one
    aggregation — k+1 tiny values), a quantile sketch of vector norms,
    and the exact count. Mergeable via the standard sufficient-statistics
    identities (sum, sum-of-squares, n add across shards)."""

    n: int
    dim: int
    sums: tuple[float, ...]  # Σ x_i per dimension
    sqsums: tuple[float, ...]  # Σ x_i² per dimension
    norms: QuantileSketch

    @property
    def mean(self) -> list[float]:
        return [s / self.n for s in self.sums]

    @property
    def variance(self) -> list[float]:
        return [
            max(0.0, sq / self.n - (s / self.n) ** 2)
            for s, sq in zip(self.sums, self.sqsums)
        ]

    def to_json(self) -> str:
        return json.dumps(
            {
                "kind": "embedding_profile",
                "n": self.n,
                "dim": self.dim,
                "sums": list(self.sums),
                "sqsums": list(self.sqsums),
                "norms": json.loads(self.norms.to_json()),
            }
        )

    @staticmethod
    def from_json(s: str) -> "EmbeddingProfile":
        d = json.loads(s)
        if d.get("kind") != "embedding_profile":
            raise ValueError(f"not an embedding profile: {d.get('kind')!r}")
        return EmbeddingProfile(
            n=int(d["n"]),
            dim=int(d["dim"]),
            sums=tuple(d["sums"]),
            sqsums=tuple(d["sqsums"]),
            norms=QuantileSketch.from_json(json.dumps(d["norms"])),
        )


#: mapInPandas partition-summary schema for embedding_profile: one row per
#: non-empty partition carrying that partition's sufficient statistics AND
#: its norm quantile-compactor state (JSON levels + exact lo/hi) — the
#: norm sketch rides the same pass instead of a second corpus scan.
_EMB_SUMMARY_SCHEMA = T.StructType(
    [
        T.StructField("dim", T.IntegerType()),  # -1 flags a ragged partition
        T.StructField("n", T.LongType()),
        T.StructField("sums", T.ArrayType(T.DoubleType())),
        T.StructField("sqsums", T.ArrayType(T.DoubleType())),
        T.StructField("nan_count", T.LongType()),
        T.StructField("norm_levels", T.StringType()),
        T.StructField("norm_lo", T.DoubleType()),
        T.StructField("norm_hi", T.DoubleType()),
    ]
)


def embedding_profile(
    df: DataFrame, vec_col: str = "embedding", quantile_k: int = 256
) -> EmbeddingProfile:
    """Profile an embedding column (``array<float>``): ONE ``mapInPandas``
    pass computes each partition's per-dimension sum / sum-of-squares as a
    single numpy matrix reduction — no posexplode, so the |vecs|·dim row
    inflation the explode formulation paid (3 orders of magnitude at
    768–4096 dims) never materializes — AND folds the per-row norms into a
    partition-local quantile compactor, so the norm sketch costs no second
    corpus scan (the norms are one more numpy reduction over the matrix
    already in cache). The driver merges one O(dim + k·log) summary row
    per partition. NULL/empty VECTORS are skipped; NULL/NaN ELEMENTS
    inside a vector are an explicit error (a silent skip would bias that
    dimension's mean/variance low with nothing downstream able to tell).
    Ragged vectors (differing lengths) are an explicit error too."""
    from nexus_event_stream_spark.operators.quantiles import (
        _Compactor,
        _freeze,
        quantile_merge,
    )

    vecs = df.where(
        F.col(vec_col).isNotNull() & (F.size(vec_col) > 0)
    ).select(F.col(vec_col).alias("v"))

    def run(batches):
        dim = 0
        n = 0
        nan_count = 0
        sums = sqsums = None
        ragged = False
        comp = _Compactor(quantile_k)
        norm_lo, norm_hi = np.inf, -np.inf
        for pdf in batches:
            if ragged or not len(pdf):
                continue
            col = pdf["v"]
            lens = col.map(len).to_numpy()
            if dim == 0:
                dim = int(lens[0])
                sums = np.zeros(dim, dtype=np.float64)
                sqsums = np.zeros(dim, dtype=np.float64)
            if (lens != dim).any():
                ragged = True
                continue
            # float64 BEFORE squaring: a float32 square carries ~6e-8
            # relative error that the E[x²]−E[x]² identity amplifies
            # catastrophically for dims with mean ≫ spread. None elements
            # arrive as NaN under this cast and are counted, not skipped.
            mat = np.array(list(col), dtype=np.float64)
            nan_count += int(np.isnan(mat).sum())
            n += mat.shape[0]
            sq = mat * mat
            sums += np.nansum(mat, axis=0)
            sqsums += np.nansum(sq, axis=0)
            norms = np.sqrt(np.nansum(sq, axis=1))
            if len(norms):
                norm_lo = min(norm_lo, float(norms.min()))
                norm_hi = max(norm_hi, float(norms.max()))
                comp.extend(norms)
        if ragged:
            yield pd.DataFrame(
                [(-1, 0, [], [], 0, "[]", 0.0, 0.0)],
                columns=_EMB_SUMMARY_SCHEMA.names,
            )
        elif n:
            yield pd.DataFrame(
                [
                    (
                        dim,
                        n,
                        list(sums),
                        list(sqsums),
                        nan_count,
                        json.dumps([list(l) for l in comp.levels]),
                        norm_lo,
                        norm_hi,
                    )
                ],
                columns=_EMB_SUMMARY_SCHEMA.names,
            )

    parts = vecs.mapInPandas(run, schema=_EMB_SUMMARY_SCHEMA).collect()
    if any(r["dim"] == -1 for r in parts) or len({r["dim"] for r in parts}) > 1:
        raise ValueError(
            "ragged embedding column: vectors have differing lengths"
        )
    if not parts:
        return EmbeddingProfile(
            n=0, dim=0, sums=(), sqsums=(),
            norms=QuantileSketch(k=quantile_k, n=0, lo=0.0, hi=0.0, levels=((),)),
        )
    if (bad := sum(r["nan_count"] for r in parts)) > 0:
        raise ValueError(
            f"embedding column contains {bad} NULL/NaN element(s) inside "
            "vectors: a profile that silently skipped them would bias the "
            "affected dimensions' mean/variance low — clean or impute first"
        )
    dim = parts[0]["dim"]
    sums = np.zeros(dim, dtype=np.float64)
    sqsums = np.zeros(dim, dtype=np.float64)
    n = 0
    norms = QuantileSketch(k=quantile_k, n=0, lo=0.0, hi=0.0, levels=((),))
    for r in parts:
        n += r["n"]
        sums += np.asarray(r["sums"], dtype=np.float64)
        sqsums += np.asarray(r["sqsums"], dtype=np.float64)
        part_comp = _Compactor(quantile_k)
        for h, lvl in reversed(
            list(enumerate(json.loads(r["norm_levels"])))
        ):
            if lvl:
                part_comp.merge_level(h, lvl)
        norms = quantile_merge(
            norms,
            _freeze(part_comp, r["n"], r["norm_lo"], r["norm_hi"]),
        )
    return EmbeddingProfile(
        n=n,
        dim=dim,
        sums=tuple(float(x) for x in sums),
        sqsums=tuple(float(x) for x in sqsums),
        norms=norms,
    )


def merge_embedding_profiles(
    a: EmbeddingProfile, b: EmbeddingProfile
) -> EmbeddingProfile:
    """Exact merge of the sufficient statistics (+ norm-sketch merge)."""
    if a.n == 0:
        return b
    if b.n == 0:
        return a
    if a.dim != b.dim:
        raise ValueError(f"dimension mismatch: {a.dim} != {b.dim}")
    from nexus_event_stream_spark.operators.quantiles import quantile_merge

    return EmbeddingProfile(
        n=a.n + b.n,
        dim=a.dim,
        sums=tuple(x + y for x, y in zip(a.sums, b.sums)),
        sqsums=tuple(x + y for x, y in zip(a.sqsums, b.sqsums)),
        norms=quantile_merge(a.norms, b.norms),
    )


#: Embedding drift thresholds — centroid rotation and scale changes.
EMBEDDING_DRIFT_THRESHOLDS = {
    "min_mean_cosine": 0.9,  # centroid direction rotated
    "max_norm_shift": 0.25,  # median vector norm moved >25 %
    "max_variance_ratio": 4.0,  # total variance blew up / collapsed
}


def embedding_drift_report(
    a: EmbeddingProfile,
    b: EmbeddingProfile,
    thresholds: dict | None = None,
) -> dict:
    """Compare two embedding profiles — zero data access. The centroid
    cosine catches direction shifts (a new encoder, a new modality mix);
    the norm quantile shift catches scale changes; the total-variance
    ratio catches collapse (all vectors suddenly identical) or blow-up."""
    t = {**EMBEDDING_DRIFT_THRESHOLDS, **(thresholds or {})}
    if a.n == 0 or b.n == 0:
        return {
            "metrics": {"n_a": a.n, "n_b": b.n},
            "flags": ["empty_embeddings"]
            if a.n != b.n
            else ["both_embeddings_empty"],
            "drifted": True,
        }
    if a.dim != b.dim:
        return {
            "metrics": {"dim_a": a.dim, "dim_b": b.dim},
            "flags": ["dimension_mismatch"],
            "drifted": True,
        }
    ma, mb = a.mean, b.mean
    dot = sum(x * y for x, y in zip(ma, mb))
    na = math.sqrt(sum(x * x for x in ma))
    nb = math.sqrt(sum(x * x for x in mb))
    med_a, med_b = a.norms.quantile(0.5), b.norms.quantile(0.5)
    # the centroid carries direction signal only when its norm is clearly
    # above the SAMPLING noise floor: the mean of n vectors of typical norm
    # ‖v‖ in a mean-centered / whitened space has ‖mean‖ ≈ ‖v‖/√n purely
    # from sampling noise (not the 1e-12 regime — at n=1e6 the floor is
    # ~1e-3·‖v‖), and the cosine of two such noise vectors is random in
    # [-1, 1] — comparing it would page every healthy epoch. Require both
    # centroids to clear the floor by a safety factor before emitting a
    # rotation verdict; no signal → cos = None.
    scale = max(abs(med_a), abs(med_b), 1e-12)
    noise_floor = 4.0 * scale / math.sqrt(max(min(a.n, b.n), 1))
    if na > noise_floor and nb > noise_floor:
        cos: float | None = dot / (na * nb)
    else:
        cos = None
    norm_shift = abs(med_b - med_a) / max(abs(med_a), 1e-9)
    var_a = sum(a.variance) or 1e-12
    var_b = sum(b.variance) or 1e-12
    var_ratio = max(var_a, var_b) / min(var_a, var_b)
    metrics = {
        "mean_cosine": cos,
        "norm_shift": norm_shift,
        "variance_ratio": var_ratio,
        "n_a": a.n,
        "n_b": b.n,
    }
    flags = []
    if cos is not None and cos < t["min_mean_cosine"]:
        flags.append("centroid_rotation")
    if norm_shift > t["max_norm_shift"]:
        flags.append("norm_scale_shift")
    if var_ratio > t["max_variance_ratio"]:
        flags.append("variance_break")
    return {"metrics": metrics, "flags": flags, "drifted": bool(flags)}


def drift_report(
    a: CorpusProfile,
    b: CorpusProfile,
    thresholds: dict | None = None,
) -> dict:
    """Compare two profiles — zero data access. Returns
    ``{metrics: {...}, flags: [...], drifted: bool}``; ``flags`` names
    every threshold the pair violates."""
    t = {**DRIFT_THRESHOLDS, **(thresholds or {})}
    if a.n_docs == 0 or b.n_docs == 0:
        # an empty snapshot IS the most severe drift (a vanished corpus) —
        # flag it instead of crashing on the empty quantile sketch
        return {
            "metrics": {"n_docs_a": a.n_docs, "n_docs_b": b.n_docs},
            "flags": ["empty_snapshot"]
            if a.n_docs != b.n_docs
            else ["both_snapshots_empty"],
            "drifted": True,
        }
    len_shifts = _len_shifts(a.lengths, b.lengths)
    token_l1 = _token_l1(a.token_freq, b.token_freq)
    jac = kmv_jaccard(a.shingles, b.shingles)
    # both sides are > 0 here — the empty-snapshot gate above returned
    ratio = max(a.n_docs, b.n_docs) / min(a.n_docs, b.n_docs)
    metrics = {
        "len_quantile_shift": len_shifts,
        "max_len_quantile_shift": max(len_shifts.values()),
        "token_l1": token_l1,
        "content_jaccard": jac,
        "doc_ratio": ratio,
        "n_docs_a": a.n_docs,
        "n_docs_b": b.n_docs,
    }
    flags = []
    if metrics["max_len_quantile_shift"] > t["max_len_quantile_shift"]:
        flags.append("length_distribution_shift")
    if token_l1 > t["max_token_l1"]:
        flags.append("token_frequency_shift")
    if jac < t["min_content_jaccard"]:
        flags.append("content_overlap_collapse")
    if ratio > t["max_doc_ratio_jump"]:
        flags.append("doc_count_jump")
    return {"metrics": metrics, "flags": flags, "drifted": bool(flags)}
