"""WordPiece encoding — greedy longest-match-first subword tokenization.

Completes the mainstream trained-tokenizer families next to BPE
(operators/bpe.py, merge-rank greedy) and unigram-LM
(operators/unigram.py, Viterbi): WordPiece is the BERT-style encoder
(Wu et al. 2016; the Hugging Face ``tokenizers`` WordPiece model is the
de-facto spec this module matches) — per word, repeatedly take the
LONGEST vocab piece that prefixes the remaining characters, marking
word-internal pieces with a ``##`` continuation prefix; if at any point
no piece matches, the WHOLE word becomes the unknown token (the
documented all-or-nothing HF semantics, not a per-char fallback).

WordPiece has no training loop of its own here: its vocab is derived
from either trained family (``vocab_from_pieces`` over a unigram piece
table or BPE symbol inventory), which is how production BERT vocabs
were built on top of a learned subword inventory. Encoding is the
bpe_encode/unigram_encode execution shape — one Arrow-batched
``mapInPandas`` pass, vocab in the closure, per-batch word memoization
— zero shuffles, embarrassingly parallel, so the 100 TB cost is one
corpus read (SCALE.md tokenizer row).

Reference parity: no analogue (the reference processes no text-model
features) — north-star LLM-pipeline extension tier, same role as
operators/bpe.py.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

#: the BERT-conventional defaults
UNK_TOKEN = "[UNK]"
CONTINUATION = "##"

#: HF WordPiece guard: words longer than this become UNK outright (a
#: pathological unbroken string would otherwise cost O(n·max_piece) per
#: word with nothing useful to show for it)
MAX_INPUT_CHARS = 100


def vocab_from_pieces(
    pieces: Iterable[str], continuation: str = CONTINUATION
) -> set[str]:
    """A WordPiece vocab from a flat subword inventory (unigram piece
    table keys, or a BPE symbol set): every piece is admitted both
    word-initial (as-is) and word-internal (``##``-prefixed) — the
    standard construction when deriving a WordPiece vocab from a learned
    inventory that doesn't distinguish position."""
    out: set[str] = set()
    for p in pieces:
        if not p:
            continue
        out.add(p)
        out.add(continuation + p)
    return out


def wordpiece_segment(
    word: str,
    vocab: set[str],
    unk: str = UNK_TOKEN,
    continuation: str = CONTINUATION,
    max_input_chars: int = MAX_INPUT_CHARS,
) -> list[str]:
    """Greedy longest-match-first segmentation of one word; returns
    ``[unk]`` when the word exceeds ``max_input_chars`` or any remainder
    has no matching piece (whole-word UNK — the HF WordPiece contract)."""
    n = len(word)
    if n == 0:
        return []
    if n > max_input_chars:
        return [unk]
    out: list[str] = []
    start = 0
    while start < n:
        end = n
        piece = None
        while end > start:
            sub = word[start:end]
            if start > 0:
                sub = continuation + sub
            if sub in vocab:
                piece = sub
                break
            end -= 1
        if piece is None:
            return [unk]
        out.append(piece)
        start = end
    return out


def wordpiece_encode(
    docs: DataFrame,
    vocab: Iterable[str],
    text_col: str = "text",
    out_col: str = "wordpiece_tokens",
    unk: str = UNK_TOKEN,
    continuation: str = CONTINUATION,
    max_input_chars: int = MAX_INPUT_CHARS,
) -> DataFrame:
    """Encode documents with a WordPiece vocab: each space-split word
    becomes its greedy longest-match piece sequence (the
    bpe_encode/unigram_encode shape — Arrow-batched ``mapInPandas``,
    vocab in the closure, per-batch word memoization)."""
    vset = set(vocab)
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
                        cache[w] = wordpiece_segment(
                            w, vset, unk, continuation, max_input_chars
                        )
                    row.extend(cache[w])
                toks.append(row)
            out = pdf.copy()
            out[out_col] = toks
            yield out

    return docs.mapInPandas(encode, out_schema)
