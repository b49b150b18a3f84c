"""Distributed unigram-LM (SentencePiece-style) tokenizer training +
Viterbi encoding — the BPE sibling (Kudo 2018, arXiv:1804.10959).

Same 100 TB discipline as operators/bpe.py: the corpus is read EXACTLY
once (the word-histogram shuffle); everything iterative — EM expected
counts, loss-based pruning — is bounded by |word vocab| and |piece
vocab|, never by corpus size. Two trainers share the histogram:

- ``train_unigram`` (default): the |vocab|-bounded histogram is
  collected once and EM runs driver-local — the ``train_bpe``
  precedent (a per-iteration Spark job would pay a scheduler round
  trip for work that is a few ms of numpy).
- ``train_unigram_distributed``: the E-step as Spark jobs — a
  mapInPandas kernel computes per-partition partial expected counts
  via the SAME forward-backward routine, one groupBy(piece).sum
  reduces them, the M-step normalizes driver-side. Kept for the
  (rare) histogram that exceeds driver memory; value-identical to the
  local path up to float summation order (pinned in
  tests/test_unigram.py).

Algorithm (the standard formulation):

1. Seed: every substring of histogram words up to ``max_piece_len``,
   scored by freq·len, top ``seed_size`` kept — plus ALL single
   characters (never pruned, so every training word stays encodable).
2. EM: E-step computes expected piece counts with forward-backward
   over each word's segmentation lattice under current log-probs;
   M-step renormalizes.
3. Prune: while |V| > vocab_size, drop the ``shrink`` fraction of
   multi-char pieces with the smallest removal loss, approximated per
   SentencePiece as expected_count(x) · (viterbi_logp(x without x) −
   logp(x)), then re-run EM.
4. Encode: per-word Viterbi (max-prob segmentation), leftmost-longest
   on exact ties for determinism; characters never seen in training
   pass through as single-char pieces with the UNK penalty.

Reference parity: no analogue (the reference tokenizes nothing) —
north-star tokenization tier beside operators/bpe.py, closing the one
mainstream tokenizer family the engine lacked (r12 verdict #6).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nexus_event_stream_spark.operators.bpe import word_histogram

#: log-prob assigned to an out-of-vocabulary character at encode time
UNK_LOGP = -20.0

_NEG_INF = float("-inf")


# ---------------------------------------------------------------------------
# lattice routines (pure functions of (word, logp dict) — shared verbatim
# by the local trainer, the distributed E-step kernel and the encoder)
# ---------------------------------------------------------------------------


def _forward_backward(
    word: str, logp: dict[str, float], max_len: int
) -> tuple[dict[str, float], float]:
    """Expected piece counts for ONE word under the unigram model.

    Returns ``(piece → E[count | word], total log-likelihood)``. The
    lattice has a node per character boundary; alpha/beta are log-sum
    accumulators; a piece's posterior is
    exp(alpha[i] + logp(piece) + beta[j] − Z).
    """
    n = len(word)
    alpha = [_NEG_INF] * (n + 1)
    alpha[0] = 0.0
    arcs: list[tuple[int, int, str, float]] = []
    for i in range(n):
        if alpha[i] == _NEG_INF:
            continue
        for j in range(i + 1, min(i + max_len, n) + 1):
            piece = word[i:j]
            lp = logp.get(piece)
            if lp is None:
                continue
            arcs.append((i, j, piece, lp))
            cand = alpha[i] + lp
            a = alpha[j]
            alpha[j] = (
                cand
                if a == _NEG_INF
                else max(a, cand) + math.log1p(math.exp(-abs(a - cand)))
            )
    z = alpha[n]
    if z == _NEG_INF:
        return {}, _NEG_INF
    beta = [_NEG_INF] * (n + 1)
    beta[n] = 0.0
    for i, j, piece, lp in reversed(arcs):
        if beta[j] == _NEG_INF:
            continue
        cand = beta[j] + lp
        b = beta[i]
        beta[i] = (
            cand
            if b == _NEG_INF
            else max(b, cand) + math.log1p(math.exp(-abs(b - cand)))
        )
    expected: dict[str, float] = {}
    for i, j, piece, lp in arcs:
        if alpha[i] == _NEG_INF or beta[j] == _NEG_INF:
            continue
        post = math.exp(alpha[i] + lp + beta[j] - z)
        if post > 0.0:
            expected[piece] = expected.get(piece, 0.0) + post
    return expected, z


def viterbi_segment(
    word: str, logp: dict[str, float], max_len: int | None = None
) -> tuple[list[str], float]:
    """Max-probability segmentation of one word; ties break toward the
    LONGEST last piece (deterministic). OOV characters become
    single-char pieces at ``UNK_LOGP`` so encoding is total."""
    if max_len is None:
        max_len = max((len(p) for p in logp), default=1)
    n = len(word)
    best = [_NEG_INF] * (n + 1)
    back: list[tuple[int, str] | None] = [None] * (n + 1)
    best[0] = 0.0
    for j in range(1, n + 1):
        for i in range(max(0, j - max_len), j):
            if best[i] == _NEG_INF:
                continue
            piece = word[i:j]
            lp = logp.get(piece)
            if lp is None:
                if j - i != 1:
                    continue
                lp = UNK_LOGP
            cand = best[i] + lp
            # >= : on an exact score tie prefer the SMALLER i (longer
            # final piece) — scanned in increasing i, so take strictly
            # better later candidates only
            if cand > best[j] or (cand == best[j] and back[j] is None):
                best[j] = cand
                back[j] = (i, piece)
    pieces: list[str] = []
    j = n
    while j > 0:
        i, piece = back[j]  # total by construction (single chars always arc)
        pieces.append(piece)
        j = i
    pieces.reverse()
    return pieces, best[n]


# ---------------------------------------------------------------------------
# training
# ---------------------------------------------------------------------------


def _seed_pieces(
    hist: list[tuple[str, int]], seed_size: int, max_piece_len: int
) -> dict[str, float]:
    """Initial piece log-probs: all single chars + the top ``seed_size``
    multi-char substrings by freq·len, probs ∝ that score."""
    counts: dict[str, float] = {}
    chars: dict[str, float] = {}
    for word, freq in hist:
        n = len(word)
        for i in range(n):
            chars[word[i]] = chars.get(word[i], 0.0) + freq
            for j in range(i + 2, min(i + max_piece_len, n) + 1):
                sub = word[i:j]
                counts[sub] = counts.get(sub, 0.0) + freq * (j - i)
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:seed_size]
    scores = dict(top)
    scores.update(chars)
    total = sum(scores.values())
    return {p: math.log(s / total) for p, s in scores.items()}


def _m_step(expected: dict[str, float]) -> dict[str, float]:
    # c > 0 alone is not enough: a subnormal count (≈5e-324) divided by
    # the total underflows to exactly 0.0 and log() raises — such a
    # piece is EM-dead, so it drops out like a zero-count piece (single
    # chars never hit this: the 1e-9-of-total floor keeps their
    # quotient finite)
    total = sum(expected.values())
    out: dict[str, float] = {}
    for p, c in expected.items():
        if c <= 0.0:
            continue
        q = c / total
        if q > 0.0:
            out[p] = math.log(q)
    return out


def _em_round(
    hist: list[tuple[str, int]], logp: dict[str, float], max_len: int
) -> tuple[dict[str, float], float]:
    """One local EM iteration over the histogram: returns (new log-probs,
    corpus log-likelihood). Pieces with zero expected count drop out —
    except single characters, which are re-floored (encodability)."""
    expected: dict[str, float] = {}
    ll = 0.0
    for word, freq in hist:
        exp_w, z = _forward_backward(word, logp, max_len)
        if z == _NEG_INF:
            continue
        ll += freq * z
        for p, c in exp_w.items():
            expected[p] = expected.get(p, 0.0) + freq * c
    # Single-char floor relative to TOTAL mass (encodability): a floor
    # relative to the min collapses exponentially round over round
    # (floor -> floor*1e-6 -> ...) until it underflows to 0.0 and the
    # M-step silently drops the character.
    floor = sum(expected.values()) * 1e-9 or 1.0
    for p in logp:
        if len(p) == 1 and expected.get(p, 0.0) < floor:
            expected[p] = floor
    return _m_step(expected), ll


def _prune(
    logp: dict[str, float],
    expected: dict[str, float],
    vocab_size: int,
    shrink: float,
) -> dict[str, float]:
    """Drop the lowest-loss multi-char pieces (SentencePiece's removal
    approximation: expected·(alt-segmentation logp − own logp), where
    alt is the piece Viterbi-segmented WITHOUT itself)."""
    singles = {p for p in logp if len(p) == 1}
    multi = [p for p in logp if len(p) > 1]
    if len(logp) <= vocab_size or not multi:
        return logp
    max_len = max(len(p) for p in logp)
    losses: list[tuple[float, str]] = []
    for p in multi:
        own = logp[p]
        without = {q: lp for q, lp in logp.items() if q != p}
        _, alt = viterbi_segment(p, without, max_len)
        losses.append((expected.get(p, 0.0) * (own - alt), p))
    # keep the most painful-to-remove pieces
    losses.sort(key=lambda t: (-t[0], t[1]))
    n_keep = max(
        vocab_size - len(singles), int(len(multi) * (1.0 - shrink))
    )
    kept = {p for _, p in losses[:n_keep]} | singles
    return {p: lp for p, lp in logp.items() if p in kept}


def train_unigram_local(
    hist: list[tuple[str, int]],
    vocab_size: int,
    max_piece_len: int = 8,
    seed_size: int | None = None,
    em_iters: int = 2,
    shrink: float = 0.25,
) -> dict[str, float]:
    """The driver-local core: word histogram → {piece: logp} of at most
    ``vocab_size`` entries (never below the single-char alphabet).
    Exposed separately so tests can pin the Spark trainers against it
    on the same histogram."""
    if vocab_size < 1:
        raise ValueError("vocab_size must be positive")
    if not 0.0 < shrink < 1.0:
        raise ValueError("shrink must be in (0, 1)")
    seed = seed_size if seed_size is not None else 8 * vocab_size
    logp = _seed_pieces(hist, seed, max_piece_len)
    while True:
        expected: dict[str, float] = {}
        for _ in range(em_iters):
            logp, _ll = _em_round(hist, logp, max_piece_len)
        # one extra E pass for the pruner's expected counts
        for word, freq in hist:
            exp_w, z = _forward_backward(word, logp, max_piece_len)
            if z == _NEG_INF:
                continue
            for p, c in exp_w.items():
                expected[p] = expected.get(p, 0.0) + freq * c
        if len(logp) <= vocab_size:
            return logp
        pruned = _prune(logp, expected, vocab_size, shrink)
        if len(pruned) == len(logp):  # nothing prunable: alphabet-bound
            return logp
        logp = pruned


def _collect_histogram(
    docs: DataFrame, text_col: str
) -> list[tuple[str, int]]:
    """(word, freq) rows, deterministically ordered. Bounded collect:
    |distinct words| — the train_bpe contract (SCALE.md)."""
    hist = (
        word_histogram(docs, text_col)
        .select(F.array_join("symbols", "").alias("w"), "freq")
        .collect()
    )
    # strip the BPE end-of-word marker the shared histogram appends
    # (suffix-checked so a pathological word can never lose real chars,
    # matching train_unigram_distributed's substring path)
    from nexus_event_stream_spark.operators.bpe import EOW

    out = [
        (r.w[: -len(EOW)] if r.w.endswith(EOW) else r.w, int(r.freq))
        for r in hist
    ]
    return sorted(out)


def train_unigram(
    docs: DataFrame,
    vocab_size: int = 1024,
    text_col: str = "text",
    max_piece_len: int = 8,
    seed_size: int | None = None,
    em_iters: int = 2,
    shrink: float = 0.25,
) -> dict[str, float]:
    """ONE corpus shuffle (the shared ``word_histogram``) → driver-local
    EM + pruning. Returns {piece: log-prob}."""
    return train_unigram_local(
        _collect_histogram(docs, text_col),
        vocab_size,
        max_piece_len=max_piece_len,
        seed_size=seed_size,
        em_iters=em_iters,
        shrink=shrink,
    )


def expected_counts_distributed(
    docs_hist: DataFrame, logp: dict[str, float], max_piece_len: int
) -> DataFrame:
    """The distributed E-step: per-partition partial expected counts
    (mapInPandas over (word, freq) rows, piece table in the closure)
    reduced by ONE groupBy(piece).sum — map-side combined, |V| rows
    out. The building block ``train_unigram_distributed`` iterates."""
    schema = T.StructType(
        [
            T.StructField("piece", T.StringType()),
            T.StructField("expected", T.DoubleType()),
            T.StructField("ll", T.DoubleType()),
        ]
    )

    def estep(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        partial: dict[str, float] = {}
        ll = 0.0
        for pdf in it:
            for word, freq in zip(pdf["w"], pdf["freq"]):
                exp_w, z = _forward_backward(word, logp, max_piece_len)
                if z == _NEG_INF:
                    continue
                ll += freq * z
                for p, c in exp_w.items():
                    partial[p] = partial.get(p, 0.0) + freq * c
        yield pd.DataFrame(
            {
                "piece": list(partial) + ["\x00ll"],
                "expected": list(partial.values()) + [0.0],
                "ll": [0.0] * len(partial) + [ll],
            }
        )

    return (
        docs_hist.mapInPandas(estep, schema)
        .groupBy("piece")
        .agg(
            F.sum("expected").alias("expected"), F.sum("ll").alias("ll")
        )
    )


def train_unigram_distributed(
    docs: DataFrame,
    vocab_size: int = 1024,
    text_col: str = "text",
    max_piece_len: int = 8,
    seed_size: int | None = None,
    em_iters: int = 2,
    shrink: float = 0.25,
) -> dict[str, float]:
    """The same algorithm with the E-step as Spark jobs (for histograms
    beyond driver memory). Seeding and pruning remain |V|-bounded
    driver work over aggregates; per EM round the corpus-scaled cost is
    one kernel pass + one |V|-row shuffle. Matches ``train_unigram`` up
    to float summation order (tests pin logp agreement at 1e-9 and
    IDENTICAL final piece sets / Viterbi encodes)."""
    if vocab_size < 1:
        raise ValueError("vocab_size must be positive")
    from nexus_event_stream_spark.operators.bpe import EOW

    hist_df = (
        word_histogram(docs, text_col)
        .select(
            F.expr(
                f"substring(array_join(symbols, ''), 1, "
                f"char_length(array_join(symbols, '')) - {len(EOW)})"
            ).alias("w"),
            "freq",
        )
        .persist()
    )
    try:
        # seeding needs substring counts — one dedicated aggregate pass
        # (corpus-bounded work stays in executors; the driver sees only
        # the |seed| top rows + the alphabet)
        seed = seed_size if seed_size is not None else 8 * vocab_size
        sub_schema = T.StructType(
            [
                T.StructField("piece", T.StringType()),
                T.StructField("score", T.DoubleType()),
                T.StructField("is_char", T.BooleanType()),
            ]
        )

        def substrings(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            agg: dict[str, float] = {}
            chars: dict[str, float] = {}
            for pdf in it:
                for word, freq in zip(pdf["w"], pdf["freq"]):
                    n = len(word)
                    for i in range(n):
                        chars[word[i]] = chars.get(word[i], 0.0) + freq
                        for j in range(i + 2, min(i + max_piece_len, n) + 1):
                            s = word[i:j]
                            agg[s] = agg.get(s, 0.0) + freq * (j - i)
            yield pd.DataFrame(
                {
                    "piece": list(agg) + list(chars),
                    "score": list(agg.values()) + list(chars.values()),
                    "is_char": [False] * len(agg) + [True] * len(chars),
                }
            )

        subs = (
            hist_df.mapInPandas(substrings, sub_schema)
            .groupBy("piece", "is_char")
            .agg(F.sum("score").alias("score"))
        )
        chars_rows = subs.filter("is_char").collect()
        top_rows = (
            subs.filter(~F.col("is_char"))
            .orderBy(F.desc("score"), F.asc("piece"))
            .limit(seed)
            .collect()
        )
        scores = {r.piece: float(r.score) for r in top_rows}
        scores.update({r.piece: float(r.score) for r in chars_rows})
        total = sum(scores.values())
        logp = {p: math.log(s / total) for p, s in scores.items()}

        def distributed_expected(cur: dict[str, float]) -> tuple[dict, float]:
            rows = expected_counts_distributed(
                hist_df, cur, max_piece_len
            ).collect()
            exp = {
                r.piece: float(r.expected)
                for r in rows
                if r.piece != "\x00ll" and r.expected > 0.0
            }
            ll = sum(float(r.ll) for r in rows)
            return exp, ll

        while True:
            expected: dict[str, float] = {}
            for _ in range(em_iters):
                expected, _ll = distributed_expected(logp)
                # same total-relative single-char floor as _em_round
                floor = sum(expected.values()) * 1e-9 or 1.0
                for p in logp:
                    if len(p) == 1 and expected.get(p, 0.0) < floor:
                        expected[p] = floor
                logp = _m_step(expected)
            expected, _ll = distributed_expected(logp)
            if len(logp) <= vocab_size:
                return logp
            pruned = _prune(logp, expected, vocab_size, shrink)
            if len(pruned) == len(logp):
                return logp
            logp = pruned
    finally:
        hist_df.unpersist()


# ---------------------------------------------------------------------------
# encoding
# ---------------------------------------------------------------------------


def unigram_encode(
    docs: DataFrame,
    pieces: dict[str, float],
    text_col: str = "text",
    out_col: str = "unigram_tokens",
) -> DataFrame:
    """Viterbi-encode documents with a trained piece table: each word
    becomes its max-probability segmentation (the bpe_encode shape —
    Arrow-batched mapInPandas, piece table in the closure, per-batch
    word memoization)."""
    max_len = max((len(p) for p in pieces), default=1)
    out_schema = T.StructType(
        list(docs.schema.fields)
        + [T.StructField(out_col, T.ArrayType(T.StringType()))]
    )

    def encode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}
        for pdf in it:
            toks = []
            for text in pdf[text_col]:
                row: list[str] = []
                for w in (text or "").split(" "):
                    if not w:
                        continue
                    if w not in cache:
                        cache[w] = viterbi_segment(w, pieces, max_len)[0]
                    row.extend(cache[w])
                toks.append(row)
            out = pdf.copy()
            out[out_col] = toks
            yield out

    return docs.mapInPandas(encode, out_schema)
