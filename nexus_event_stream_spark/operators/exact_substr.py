"""Token-level exact substring dedup (the ExactSubstr tier).

Lee et al. 2022, "Deduplicating Training Data Makes Language Models
Better" (arXiv:2107.06499): any token span of length >= ``min_len`` that
occurs more than once in the corpus is a training-data duplicate; every
occurrence except the corpus-first is removed. This is the published
dedup grain the repo's other text tiers structurally miss:

- ``segment_dedup`` (operators/quality.py) hashes NON-overlapping
  ``n``-word segments, so a shared span shifted by even one word never
  aligns (the documented miss in tests/test_quality.py).
- ``cdc_dedup`` catches shifted *copies* at content-defined-chunk grain
  but only when whole chunks repeat — a >=50-token span shared between
  otherwise-distinct documents spanning a chunk boundary slips through.

The paper builds a corpus-wide suffix array — a single-machine
construction. The distributed formulation here needs no driver state:

1. **Anchors (winnowing).** Per document, hash every ``k``-token gram
   and select the rightmost-minimum gram of every window of
   ``W = min_len - k + 1`` consecutive grams (Schleimer et al. 2003,
   robust winnowing). The winnowing theorem gives the exactness
   guarantee this pass needs: any duplicated span of length
   ``>= W + k - 1 = min_len`` contains a full gram-window in both
   occurrences, the window's hash sequence is identical in both, so the
   SAME gram (by content) is selected in both. One Arrow kernel,
   vectorized (token hashes -> one int64 convolution -> sliding-window
   argmin); selection depends only on local content, never on absolute
   offsets.
2. **Candidate filter.** One shuffle on the anchor hash; anchors whose
   hash occurs >= 2 times corpus-wide survive. Hash collisions only ADD
   candidates (extra verification work), never drop a real duplicate.
   Typical corpora keep ~2/(W+1) of token positions as anchors and a
   small fraction of those as candidates — this is what replaces the
   naive all-sliding-windows shuffle (28 bytes/token at 100 TB) with a
   candidates-only one.
3. **Verify (extend around anchors).** Join candidates back to their
   documents (keyed equi-join) and hash the ``W`` sliding ``min_len``-
   token windows that contain each candidate anchor (md5 of the exact
   window text — the same collision budget as ``segment_dedup``). Every
   duplicated ``min_len``-window contains a shared surviving anchor
   (step 1), so every one of them is hashed here: the pruning is exact,
   not approximate.
4. **First-occurrence flag + coverage.** The shared
   ``first_occurrence_flag`` machinery (one uniform md5 shuffle) keeps
   the corpus-first occurrence of each window (ordered by doc_id, pos)
   and marks the rest; a token is removed iff a duplicate-flagged
   window covers it. Interval union per document is a sorted fold —
   maximal duplicated spans fall out as merged intervals, which is the
   "extend matches" step done declaratively.

Scale (100 TB): phase-1 is a zero-shuffle Arrow projection; the anchor
shuffle carries ~n/13 rows of 20 bytes at the default grain; verify
touches only documents containing candidate anchors; the two remaining
shuffles are keyed and uniform (md5 / doc id). A fully-duplicated
corpus degrades to the naive sliding-window volume — the work IS the
duplication in that regime. No driver-side state at any step.

Reference scope note: the reference engine (nexus-event-stream,
data-plane/internal/projection/signal.go) has no corpus-dedup surface;
this is a north-star LLM-pipeline extension declared in SURVEY.md §2.11.
"""

from __future__ import annotations

import zlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nexus_event_stream_spark.functions.text import tokens
from nexus_event_stream_spark.operators.quality import first_occurrence_flag

#: int64 wraparound polynomial base for combining token hashes into
#: k-gram hashes (FNV-1a prime — any odd multiplier works; wraparound
#: mod 2^64 is deterministic and content-local, which is all winnowing
#: selection needs).
_GRAM_BASE = 1099511628211


def _token_split(text: str | None) -> list[str]:
    """Executor-side twin of functions.text.tokens (``F.split(c, " ")``):
    split on SINGLE spaces, keeping empty tokens, '' -> ['']."""
    if text is None:
        return []
    return text.split(" ")


def _winnow_anchors(toks: list[str], k: int, w: int) -> list[tuple[int, int]]:
    """Winnowing-selected k-gram anchors of a token list as
    ``(start_pos, gram_hash)`` pairs: the rightmost-minimum gram hash of
    every window of ``w`` consecutive gram hashes, deduplicated.
    Vectorized: per-token crc32 -> one int64 convolution for the gram
    hashes -> sliding-window rightmost-argmin."""
    import numpy as np

    n = len(toks)
    if n < k or n - k + 1 < w:
        return []
    th = np.array(
        [zlib.crc32(t.encode("utf-8")) for t in toks], dtype=np.int64
    )
    weights = np.int64(_GRAM_BASE) ** np.arange(k - 1, -1, -1, dtype=np.int64)
    gh = np.convolve(th, weights, mode="valid")  # len n-k+1, int64 wrap
    win = np.lib.stride_tricks.sliding_window_view(gh, w)
    # rightmost min: argmin over the reversed window
    idx = (w - 1) - np.argmin(win[:, ::-1], axis=1)
    pos = np.unique(np.arange(len(win)) + idx)
    return [(int(p), int(gh[p])) for p in pos.tolist()]


def _gram_hash_at(toks: list[str], pos: int, k: int) -> int:
    """The same int64-wraparound polynomial hash the anchor kernel's
    convolution computes, for a single gram (the tests' property pin
    that the vectorized form equals the sequential definition).
    np.convolve applies the weight vector reversed, so with descending
    powers the token at window offset j carries weight ``B^j`` — the
    sequential twin is a right-to-left fold."""
    acc = 0
    for t in reversed(toks[pos : pos + k]):
        acc = (acc * _GRAM_BASE + zlib.crc32(t.encode("utf-8"))) % (1 << 64)
    return acc - (1 << 64) if acc >= (1 << 63) else acc


def _window_starts(n: int, anchor_positions, L: int, W: int) -> list[int]:
    """Start offsets of every ``L``-token window containing any of the
    anchor positions, clamped to the document bounds — the verify
    neighborhood (shared with streaming/exact_substr.py)."""
    starts: set[int] = set()
    for a in anchor_positions:
        a = int(a)
        lo = max(0, a - (W - 1))
        hi = min(a, n - L)
        starts.update(range(lo, hi + 1))
    return sorted(starts)


def _window_hashes(toks: list[str], starts, L: int) -> list[str]:
    """md5 of the exact window text per start (position-aligned with
    ``starts``) — the verify hash both engines share."""
    import hashlib

    return [
        hashlib.md5(" ".join(toks[s : s + L]).encode("utf-8")).hexdigest()
        for s in starts
    ]


def _strip_spans(
    toks: list[str], starts, L: int
) -> tuple[int, int, str]:
    """(n_tokens, dup_tokens, clean_text) for SORTED duplicate window
    starts: merged-interval sweep, O(|starts| + n) (shared with the
    streaming twin)."""
    n = len(toks)
    intervals: list[list[int]] = []
    for s in [] if starts is None else starts:
        s = int(s)
        e = min(s + L, n)
        if intervals and s <= intervals[-1][1]:
            if e > intervals[-1][1]:
                intervals[-1][1] = e
        else:
            intervals.append([s, e])
    pieces: list[str] = []
    prev = 0
    for s, e in intervals:
        pieces.extend(toks[prev:s])
        prev = e
    pieces.extend(toks[prev:])
    return n, sum(e - s for s, e in intervals), " ".join(pieces)


def exact_substr_dedup(
    df: DataFrame,
    min_len: int = 50,
    anchor_k: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    emit_text: bool = False,
) -> DataFrame:
    """Corpus-wide exact-substring dedup at sliding ``min_len``-token
    grain: per input row ``<id_col>, n_tokens, dup_tokens`` (+
    ``clean_text`` with ``emit_text=True``).

    A token is a duplicate iff some ``min_len``-token window covering it
    occurs elsewhere in the corpus EARLIER (ordered by doc id, then
    position) — the sliding-window generalization of ``segment_dedup``'s
    first-occurrence-wins rule, which is exactly the span rule of Lee et
    al. 2022 with the corpus-first copy kept. ``clean_text`` is the
    surviving tokens space-joined (the package's reassembly convention).
    Every input row comes back exactly once (empty/short/NULL documents
    report ``dup_tokens = 0``).

    ``anchor_k`` is the winnowing gram size (default ``min_len // 2``):
    larger k -> fewer chance anchor collisions (less verify work),
    smaller k -> cheaper phase-1 hashing. Correctness is independent of
    the choice (see module docstring — the winnowing guarantee needs
    only ``k <= min_len``).
    """
    if min_len < 2:
        raise ValueError(f"min_len must be >= 2, got {min_len}")
    k = anchor_k if anchor_k is not None else max(min_len // 2, 1)
    if not 1 <= k <= min_len:
        raise ValueError(f"anchor_k must be in [1, min_len], got {k}")
    L = min_len
    W = L - k + 1

    id_field = df.schema[id_col]
    anchor_schema = T.StructType(
        [
            T.StructField("doc_id", id_field.dataType),
            T.StructField("pos", T.IntegerType()),
            T.StructField("ahash", T.LongType()),
        ]
    )

    def anchor_batches(it):
        import pandas as pd

        for pdf in it:
            ids, poss, hashes = [], [], []
            for did, text in zip(pdf["doc_id"], pdf["__text"]):
                toks = _token_split(text)
                if len(toks) < L:
                    continue
                for p, h in _winnow_anchors(toks, k, W):
                    ids.append(did)
                    poss.append(p)
                    hashes.append(h)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "pos": pd.array(poss, dtype="Int32"),
                    "ahash": pd.array(hashes, dtype="Int64"),
                }
            )

    src = df.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("__text")
    )
    anchors = src.mapInPandas(anchor_batches, anchor_schema)

    # candidate filter: anchor hashes occurring >= 2 times corpus-wide
    # (one shuffle on the uniform int64 hash; collisions only add work)
    wcnt = Window.partitionBy("ahash")
    cand = (
        anchors.withColumn("__cnt", F.count(F.lit(1)).over(wcnt))
        .filter(F.col("__cnt") >= 2)
        .groupBy("doc_id")
        .agg(F.collect_list("pos").alias("__anchor_pos"))
    )

    # verify: hash the W sliding L-windows containing each candidate
    # anchor (md5 of the exact window text — exactness lives here)
    win_schema = T.StructType(
        [
            T.StructField("doc_id", id_field.dataType),
            T.StructField("pos", T.IntegerType()),
            T.StructField("whash", T.StringType()),
        ]
    )

    def window_batches(it):
        import pandas as pd

        for pdf in it:
            ids, poss, hashes = [], [], []
            for did, text, apos in zip(
                pdf["doc_id"], pdf["__text"], pdf["__anchor_pos"]
            ):
                toks = _token_split(text)
                n = len(toks)
                if n < L:
                    continue
                starts = _window_starts(n, apos, L, W)
                whs = _window_hashes(toks, starts, L)
                for s, wh in zip(starts, whs):
                    ids.append(did)
                    poss.append(s)
                    hashes.append(wh)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "pos": pd.array(poss, dtype="Int32"),
                    "whash": hashes,
                }
            )

    cand_docs = src.join(cand, "doc_id")
    windows = cand_docs.mapInPandas(window_batches, win_schema)

    # first-occurrence flag (shared machinery: one uniform md5 shuffle)
    flagged = first_occurrence_flag(windows, "whash")
    dup_starts = (
        flagged.filter(F.col("is_dup") == 1)
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("pos")).alias("__dup_starts"))
    )

    # coverage: interval union of [s, s+L-1] over the sorted starts —
    # a Catalyst fold, the declarative "extend matches" step
    base = src.join(dup_starts, "doc_id", "left")
    toks_col = F.coalesce(
        tokens(F.col("__text")), F.array().cast("array<string>")
    )
    starts_col = F.coalesce(
        F.col("__dup_starts"), F.array().cast("array<int>")
    )
    init = F.struct(
        F.lit(0).cast("bigint").alias("cov"),
        F.lit(-1).cast("bigint").alias("end"),
    )

    def step(acc, s):
        s64 = s.cast("bigint")
        add = F.greatest(
            s64 + L - F.greatest(acc["end"] + 1, s64), F.lit(0).cast("bigint")
        )
        return F.struct(
            (acc["cov"] + add).alias("cov"),
            F.greatest(acc["end"], s64 + L - 1).alias("end"),
        )

    stats = base.withColumns(
        {
            "n_tokens": F.size(toks_col).cast("bigint"),
            "dup_tokens": F.aggregate(
                starts_col, init, step, lambda acc: acc["cov"]
            ),
        }
    )
    if not emit_text:
        return stats.select(
            F.col("doc_id").alias(id_col), "n_tokens", "dup_tokens"
        )

    out_schema = T.StructType(
        [
            id_field,
            T.StructField("n_tokens", T.LongType()),
            T.StructField("dup_tokens", T.LongType()),
            T.StructField("clean_text", T.StringType()),
        ]
    )

    def clean_batches(it):
        import pandas as pd

        for pdf in it:
            ids, nts, dts, cleans = [], [], [], []
            for did, text, starts in zip(
                pdf["doc_id"], pdf["__text"], pdf["__dup_starts"]
            ):
                ids.append(did)
                if text is None:
                    nts.append(0)
                    dts.append(0)
                    cleans.append(None)
                    continue
                toks = _token_split(text)
                # merged-interval sweep over the SORTED starts — the
                # per-start bitmap loop was O(|starts|·L) in exactly the
                # heavy-duplication regime (consecutive starts overlap
                # in L-1 positions); _strip_spans is O(|starts| + n)
                n, dup, clean = _strip_spans(toks, starts, L)
                nts.append(n)
                dts.append(dup)
                cleans.append(clean)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "n_tokens": pd.array(nts, dtype="Int64"),
                    "dup_tokens": pd.array(dts, dtype="Int64"),
                    "clean_text": cleans,
                }
            )

    return base.select("doc_id", "__text", "__dup_starts").mapInPandas(
        clean_batches, out_schema
    )
