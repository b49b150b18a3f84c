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
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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
    ratio = (
        max(a.n_docs, b.n_docs) / max(min(a.n_docs, b.n_docs), 1)
        if (a.n_docs or b.n_docs)
        else 1.0
    )
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
