"""WordPiece encoder (operators/wordpiece.py): golden pins vs the
published HF/BERT semantics, a brute-force longest-match reference twin
(the test_unigram.py discipline), and the Spark mapInPandas path."""

from __future__ import annotations

import pytest

from nexus_event_stream_spark.operators.wordpiece import (
    CONTINUATION,
    MAX_INPUT_CHARS,
    UNK_TOKEN,
    vocab_from_pieces,
    wordpiece_encode,
    wordpiece_segment,
)

#: the canonical BERT-docs example vocabulary
BERT_VOCAB = {
    "un", "##want", "##ed", "want", "##anted", "wa", "##nt",
    "runn", "##ing", "run", "hug", "##s", "h", "##u", "##g",
}


def reference_segment(word: str, vocab: set[str]) -> list[str]:
    """Single-machine reference: literal transcription of the HF
    WordPiece algorithm description (greedy longest prefix, whole-word
    UNK on any failure)."""
    if len(word) > MAX_INPUT_CHARS:
        return [UNK_TOKEN]
    tokens, start = [], 0
    while start < len(word):
        match = None
        for end in range(len(word), start, -1):
            cand = word[start:end]
            if start > 0:
                cand = CONTINUATION + cand
            if cand in vocab:
                match = (cand, end)
                break
        if match is None:
            return [UNK_TOKEN]
        tokens.append(match[0])
        start = match[1]
    return tokens


def test_bert_golden_examples():
    # the classic example: longest-match picks "un" + "##want" + "##ed"
    assert wordpiece_segment("unwanted", BERT_VOCAB) == [
        "un", "##want", "##ed",
    ]
    assert wordpiece_segment("running", BERT_VOCAB) == ["runn", "##ing"]
    assert wordpiece_segment("hugs", BERT_VOCAB) == ["hug", "##s"]
    # longest FIRST piece wins even when a shorter split exists
    assert wordpiece_segment("want", BERT_VOCAB) == ["want"]
    # any unmatched remainder → the WHOLE word is UNK (not partial)
    assert wordpiece_segment("unwantedx", BERT_VOCAB) == [UNK_TOKEN]
    assert wordpiece_segment("xyz", BERT_VOCAB) == [UNK_TOKEN]
    assert wordpiece_segment("", BERT_VOCAB) == []


def test_max_input_chars_guard():
    vocab = {"a", "##a"}
    assert wordpiece_segment("a" * MAX_INPUT_CHARS, vocab) == (
        ["a"] + ["##a"] * (MAX_INPUT_CHARS - 1)
    )
    assert wordpiece_segment("a" * (MAX_INPUT_CHARS + 1), vocab) == [
        UNK_TOKEN
    ]


def test_vocab_from_pieces_both_positions():
    v = vocab_from_pieces(["ab", "c", ""])
    assert v == {"ab", "##ab", "c", "##c"}


def test_matches_reference_on_random_inputs():
    import random

    rng = random.Random(7)
    alpha = "abcd"
    for _ in range(300):
        vocab = {
            ("##" if rng.random() < 0.5 else "")
            + "".join(rng.choice(alpha) for _ in range(rng.randint(1, 3)))
            for _ in range(rng.randint(2, 12))
        }
        word = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 10)))
        assert wordpiece_segment(word, vocab) == reference_segment(
            word, vocab
        ), (word, sorted(vocab))


def test_spark_encode_matches_local_twin(spark):
    corpus = [
        (1, "unwanted running hugs"),
        (2, "want unwantedx"),
        (3, ""),
        (4, None),
        (5, "  unwanted  "),
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    out = {
        r.doc_id: r.wordpiece_tokens
        for r in wordpiece_encode(docs, BERT_VOCAB).collect()
    }
    for did, text in corpus:
        want = []
        for w in (text or "").split(" "):
            if w:
                want.extend(reference_segment(w, BERT_VOCAB))
        assert out[did] == want, did


def test_unigram_vocab_wiring(spark):
    """The derived-vocab path: a unigram piece table (all single chars
    present — the alphabet floor) yields a WordPiece vocab that encodes
    the whole corpus with zero UNKs, and the Spark path agrees with the
    reference twin."""
    from nexus_event_stream_spark.operators.unigram import train_unigram

    corpus = [
        (1, "the windowed aggregation runs fast"),
        (2, "the fast scan aggregates the window"),
        (3, "windowed scan runs"),
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    logp = train_unigram(docs, vocab_size=30, max_piece_len=5)
    vocab = vocab_from_pieces(logp)
    out = {
        r.doc_id: r.wordpiece_tokens
        for r in wordpiece_encode(docs, vocab).collect()
    }
    for did, text in corpus:
        want = []
        for w in text.split(" "):
            if w:
                want.extend(reference_segment(w, vocab))
        assert out[did] == want, did
        assert UNK_TOKEN not in out[did]
    # round trip: pieces concatenate back to the original words
    joined = "".join(
        t.removeprefix(CONTINUATION) for t in out[1]
    )
    assert joined == corpus[0][1].replace(" ", "")
