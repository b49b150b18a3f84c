"""Distributed BPE (byte-pair-encoding) vocabulary training + encoding.

The classic Sennrich formulation operates on the WORD HISTOGRAM, not the
corpus: count words once (one shuffle over the corpus), then every merge
iteration touches only |vocab| rows. That is what makes BPE training
tractable at 100 TB — the corpus is read exactly once; the iterative part
is bounded by vocabulary size regardless of corpus size.

Two trainers share that one-corpus-pass histogram:

- ``train_bpe`` (default, driver-local merges): the histogram —
  |vocab|-bounded and tiny relative to the corpus — is collected ONCE,
  and the merge loop runs driver-local with incremental pair-count
  maintenance (only words containing the merged pair are touched per
  round). A 32 k-merge vocabulary costs 32 k dict updates, not 32 k
  Spark jobs: the distributed loop's per-merge scheduler round-trip
  (~0.1-0.5 s each) was the wall-clock bottleneck at production vocab
  sizes (round-5 verdict).
- ``train_bpe_distributed``: the merge loop as Spark jobs — per round,
  adjacent-pair counts via a JVM-side HOF projection (zip_with +
  explode + groupBy(pair).sum(freq), map-side combine), a 1-row argmax
  collect, and an Arrow-batched mapInPandas rewrite of the symbol
  arrays. Kept for the (rare) histogram that exceeds driver memory;
  merge-for-merge identical to the local path (pinned in
  tests/test_bpe.py).

Driver state is just the learned merge list (n_merges pairs) — plus,
for the local path, the transient histogram (|vocab| rows).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: end-of-word marker (its own symbol, per the original BPE formulation)
EOW = "</w>"

_VOCAB_SCHEMA = T.StructType(
    [
        T.StructField("symbols", T.ArrayType(T.StringType())),
        T.StructField("freq", T.LongType()),
    ]
)


def _merge_symbols(symbols: list, a: str, b: str) -> list:
    """Replace every adjacent (a, b) with the fused symbol a+b (left to
    right, non-overlapping) — the sequential inner step of BPE."""
    out: list = []
    i = 0
    n = len(symbols)
    while i < n:
        if i + 1 < n and symbols[i] == a and symbols[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


def word_histogram(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(symbols, freq): each distinct word as a char-symbol array with the
    end-of-word marker appended. ONE shuffle over the corpus; everything
    after is bounded by |vocab|."""
    words = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return words.select(
        F.concat(F.split("w", ""), F.array(F.lit(EOW))).alias("symbols"),
        "freq",
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    # The pair is a struct<left,right>, NOT a delimited string: symbols are
    # arbitrary (a token may legitimately contain any delimiter byte,
    # including NUL), and struct equality/ordering is exactly tuple
    # equality/ordering — same semantics the single-machine reference uses.
    n = F.size("symbols")
    pairs = F.zip_with(
        F.slice("symbols", 1, n - 1),
        F.slice("symbols", 2, n - 1),
        lambda x, y: F.struct(x.alias("left"), y.alias("right")),
    )
    return (
        vocab.select(F.explode(pairs).alias("pair"), "freq")
        .groupBy("pair")
        .agg(F.sum("freq").alias("cnt"))
    )


def _local_merge_loop(
    hist: list[tuple[list, int]], n_merges: int, min_freq: int
) -> list[tuple[str, str]]:
    """The Sennrich merge loop over an in-memory histogram, with
    incremental pair-count maintenance: each round touches only the
    words that actually contain the winning pair (tracked in an
    occurrence index), so total cost is bounded by pair-occurrence
    churn, not |vocab|·n_merges. Tie-break identical to the distributed
    path: max count, then lexicographic pair order ascending (Python
    str-tuple order == Spark struct<left,right> ASC for valid UTF-8)."""
    from collections import defaultdict

    words = [list(s) for s, _f in hist]
    freqs = [f for _s, f in hist]
    counts: dict = defaultdict(int)
    where: dict = defaultdict(set)
    for wi, (syms, f) in enumerate(zip(words, freqs)):
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            counts[p] += f
            where[p].add(wi)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if counts[best] < min_freq:
            break
        merges.append(best)
        a, b = best
        # `where` is maintained lazily (a word index may be stale for a
        # pair the word no longer contains); reprocessing a stale word is
        # a net-zero count update, so correctness never depends on it.
        for wi in list(where.get(best, ())):
            syms, f = words[wi], freqs[wi]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] -= f
                if counts[p] <= 0:
                    counts.pop(p, None)
            new = _merge_symbols(syms, a, b)
            words[wi] = new
            for i in range(len(new) - 1):
                p = (new[i], new[i + 1])
                counts[p] += f
                where[p].add(wi)
        where.pop(best, None)
    return merges


def train_bpe(
    docs: DataFrame,
    n_merges: int = 50,
    text_col: str = "text",
    min_freq: int = 2,
) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` BPE merges from the corpus.

    ONE distributed pass over the corpus (word_histogram), then the
    |vocab|-bounded histogram is collected and the merge loop runs
    driver-local — see the module docstring for why this beats one
    Spark job per merge by ~the scheduler round-trip count.

    Deterministic: the most frequent pair wins each round, ties broken by
    lexicographic pair order — so the learned vocabulary is identical to
    a single-machine reference run on the same histogram AND to
    ``train_bpe_distributed`` (both pinned in tests/test_bpe.py). Stops
    early when no pair reaches ``min_freq``. Returns the ordered merge
    list [(left, right), ...].
    """
    hist = [
        (list(r["symbols"]), r["freq"])
        for r in word_histogram(docs, text_col).collect()
    ]
    return _local_merge_loop(hist, n_merges, min_freq)


def train_bpe_distributed(
    docs: DataFrame,
    n_merges: int = 50,
    text_col: str = "text",
    min_freq: int = 2,
) -> list[tuple[str, str]]:
    """The merge loop as Spark jobs (one pair-count shuffle + 1-row
    argmax + Arrow rewrite per round) — for histograms too large to
    collect. Merge-for-merge identical to ``train_bpe``.
    """
    vocab = word_histogram(docs, text_col).localCheckpoint()
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        top = (
            _pair_counts(vocab)
            .orderBy(F.desc("cnt"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < min_freq:
            break
        a, b = top[0]["pair"]["left"], top[0]["pair"]["right"]
        merges.append((a, b))

        def apply_merge(
            it: Iterator[pd.DataFrame], a: str = a, b: str = b
        ) -> Iterator[pd.DataFrame]:
            for pdf in it:
                yield pd.DataFrame(
                    {
                        "symbols": [
                            _merge_symbols(list(s), a, b)
                            for s in pdf["symbols"]
                        ],
                        "freq": pdf["freq"],
                    }
                )

        # localCheckpoint: truncate the per-iteration lineage (at
        # production scale, checkpoint to durable storage instead)
        vocab = vocab.mapInPandas(apply_merge, _VOCAB_SCHEMA).localCheckpoint()
    return merges


def encode_word(word: str, rank: dict[tuple[str, str], int]) -> list:
    """Greedy BPE encode of one word: repeatedly apply the lowest-rank
    merge present (leftmost on ties) — the standard encoder. Equivalent
    to applying the merges in rank order each exhaustively left-to-right
    (what q_bpe's SQL oracle replays as a replace() chain): a merge's
    constituents are always products of strictly earlier merges, so no
    later merge can ever re-enable an earlier pair — pinned by the
    property test in tests/test_bpe.py."""
    symbols = list(word) + [EOW]
    while len(symbols) > 1:
        best_i, best_r = -1, None
        for i in range(len(symbols) - 1):
            r = rank.get((symbols[i], symbols[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        symbols[best_i : best_i + 2] = [symbols[best_i] + symbols[best_i + 1]]
    return symbols


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Encode documents with a learned merge list: each word becomes its
    BPE symbol sequence (greedy application in merge-rank order — the
    standard BPE encoder). Arrow-batched mapInPandas; the merge table
    ships to workers inside the closure (n_merges entries).
    """
    rank = {pair: i for i, pair in enumerate(merges)}
    out_schema = T.StructType(
        list(docs.schema.fields)
        + [T.StructField(out_col, T.ArrayType(T.StringType()))]
    )

    def encode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list] = {}
        for pdf in it:
            toks = []
            for text in pdf[text_col]:
                row: list = []
                for w in (text or "").split(" "):
                    if not w:
                        continue
                    if w not in cache:
                        cache[w] = encode_word(w, rank)
                    row.extend(cache[w])
                toks.append(row)
            out = pdf.copy()
            out[out_col] = toks
            yield out

    return docs.mapInPandas(encode, out_schema)
