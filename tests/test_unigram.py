"""Unigram-LM tokenizer (operators/unigram.py) — the BPE sibling.

Oracle discipline (the r12 verdict's done-bar): the lattice routines
are pinned against brute-force enumeration of ALL segmentations (the
single-machine reference implementation), the Spark trainer against the
driver-local core on the same histogram (identical piece sets, logp at
1e-9, identical Viterbi encodes), and the encoder against per-word
driver Viterbi.
"""

from __future__ import annotations

import itertools
import math

import numpy as np
import pytest

from nexus_event_stream_spark.operators.unigram import (
    UNK_LOGP,
    _em_round,
    _forward_backward,
    train_unigram,
    train_unigram_distributed,
    train_unigram_local,
    unigram_encode,
    viterbi_segment,
)


def brute_segmentations(word: str, pieces: set[str]):
    """Every segmentation of ``word`` into pieces (exponential — tiny
    words only)."""
    n = len(word)
    for cuts in itertools.product([0, 1], repeat=n - 1):
        bounds = [0] + [i + 1 for i, c in enumerate(cuts) if c] + [n]
        segs = [word[a:b] for a, b in zip(bounds, bounds[1:])]
        if all(s in pieces for s in segs):
            yield segs


def rand_model(rng, word: str) -> dict[str, float]:
    """Random log-probs over all substrings of ``word`` up to length 3,
    some randomly dropped (singles kept — encodability)."""
    subs = {
        word[i:j]
        for i in range(len(word))
        for j in range(i + 1, min(i + 3, len(word)) + 1)
        if j - i == 1 or rng.rand() > 0.3
    }
    raw = {s: rng.uniform(0.05, 1.0) for s in subs}
    z = sum(raw.values())
    return {s: math.log(v / z) for s, v in raw.items()}


def test_forward_backward_matches_bruteforce():
    rng = np.random.RandomState(0)
    for trial in range(40):
        word = "".join(rng.choice(list("abc"), rng.randint(2, 8)))
        logp = rand_model(rng, word)
        got_exp, got_z = _forward_backward(word, logp, 3)
        probs, counts = [], {}
        for segs in brute_segmentations(word, set(logp)):
            p = math.exp(sum(logp[s] for s in segs))
            probs.append(p)
            for s in segs:
                counts[s] = counts.get(s, 0.0) + p
        z = sum(probs)
        assert math.isclose(math.exp(got_z), z, rel_tol=1e-9), trial
        want = {s: c / z for s, c in counts.items()}
        assert set(got_exp) == set(want)
        for s in want:
            assert math.isclose(got_exp[s], want[s], rel_tol=1e-9), (trial, s)


def test_viterbi_matches_bruteforce_max():
    rng = np.random.RandomState(1)
    for trial in range(40):
        word = "".join(rng.choice(list("abcd"), rng.randint(2, 9)))
        logp = rand_model(rng, word)
        segs, score = viterbi_segment(word, logp, 3)
        assert "".join(segs) == word
        best = max(
            sum(logp[s] for s in ss)
            for ss in brute_segmentations(word, set(logp))
        )
        assert math.isclose(score, best, rel_tol=1e-9), trial
        assert math.isclose(
            sum(logp[s] for s in segs), best, rel_tol=1e-9
        )


def test_viterbi_oov_chars_are_unk_singles():
    logp = {"a": math.log(0.5), "b": math.log(0.5)}
    segs, score = viterbi_segment("axb", logp)
    assert segs == ["a", "x", "b"]
    assert math.isclose(score, logp["a"] + UNK_LOGP + logp["b"])


def test_em_likelihood_is_monotone():
    hist = [("abab", 50), ("abc", 30), ("cab", 20), ("a", 10)]
    from nexus_event_stream_spark.operators.unigram import _seed_pieces

    logp = _seed_pieces(hist, 64, 4)
    lls = []
    for _ in range(5):
        logp, _ = _em_round(hist, logp, 4)
        _, ll = _em_round(hist, logp, 4)  # ll AT the new params
        lls.append(ll)
    assert all(b >= a - 1e-9 for a, b in zip(lls, lls[1:]))


def test_trained_vocab_keeps_frequent_pieces_and_encodes_corpus():
    words = {
        "walking": 50, "talking": 40, "walked": 30, "talked": 25,
        "thematic": 20, "theory": 20, "rare": 1, "zigzag": 1,
    }
    hist = sorted(words.items())
    logp = train_unigram_local(hist, vocab_size=24, max_piece_len=6)
    assert len(logp) <= 24
    singles = {p for p in logp if len(p) == 1}
    assert singles == set("".join(words))  # alphabet never pruned
    # the shared high-frequency morphemes survive pruning
    kept = set(logp)
    assert "ing" in kept or "king" in kept
    assert any(p.startswith("walk") or p == "alk" for p in kept if len(p) > 2)
    # every training word remains encodable without UNK arcs
    for w in words:
        segs, score = viterbi_segment(w, logp)
        assert "".join(segs) == w and score > 5 * UNK_LOGP


def test_vocab_size_floor_is_the_alphabet():
    hist = [("aaab", 5), ("ab", 3)]
    logp = train_unigram_local(hist, vocab_size=1, max_piece_len=4)
    assert set(p for p in logp if len(p) == 1) == {"a", "b"}


def test_validation():
    with pytest.raises(ValueError, match="vocab_size"):
        train_unigram_local([("ab", 1)], 0)
    with pytest.raises(ValueError, match="shrink"):
        train_unigram_local([("ab", 1)], 4, shrink=1.5)


CORPUS = [
    (0, "walking and talking they walked the walkway"),
    (1, "the theory of walking was thematic"),
    (2, "they talked and talked about the walkway"),
    (3, None),
]


def test_spark_trainer_matches_local_and_encodes(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    local = train_unigram(docs, vocab_size=40, max_piece_len=6)
    # re-derive the histogram the Spark path consumed and train locally
    words: dict[str, int] = {}
    for _, text in CORPUS:
        for w in (text or "").split(" "):
            if w:
                words[w] = words.get(w, 0) + 1
    twin = train_unigram_local(
        sorted(words.items()), vocab_size=40, max_piece_len=6
    )
    assert set(local) == set(twin)
    for p in local:
        assert math.isclose(local[p], twin[p], rel_tol=1e-9), p

    out = unigram_encode(docs, local).collect()
    got = {r.doc_id: r.unigram_tokens for r in out}
    for did, text in CORPUS:
        want = []
        for w in (text or "").split(" "):
            if w:
                want.extend(viterbi_segment(w, local)[0])
        assert got[did] == want, did


def test_distributed_trainer_matches_local(spark):
    """Same corpus → the distributed E-step trainer lands on the SAME
    final piece set, logp within 1e-9 (float summation order is the
    only difference), and identical Viterbi encodes."""
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    local = train_unigram(docs, vocab_size=40, max_piece_len=6)
    dist = train_unigram_distributed(docs, vocab_size=40, max_piece_len=6)
    assert set(dist) == set(local)
    for p in local:
        assert math.isclose(dist[p], local[p], rel_tol=1e-9, abs_tol=1e-9), p
    for w in ("walking", "thematic", "walkway"):
        assert viterbi_segment(w, dist)[0] == viterbi_segment(w, local)[0]


def test_m_step_survives_subnormal_expected_counts():
    """A piece whose expected count underflows to a subnormal (c > 0 but
    c/total == 0.0) must drop out of the M-step instead of raising a
    math domain error — hit by real corpora (r14, found by the WordPiece
    wiring test's training run)."""
    from nexus_event_stream_spark.operators.unigram import _m_step

    out = _m_step({"a": 10.0, "dead": 5e-323, "b": 10.0})
    assert set(out) == {"a", "b"}
    assert math.isclose(out["a"], math.log(0.5), rel_tol=1e-12)
    # and the full trainer runs on a corpus that used to trigger it
    words: dict[str, int] = {}
    for t in (
        "the windowed aggregation runs fast",
        "the fast scan aggregates the window",
        "windowed scan runs",
    ):
        for w in t.split():
            words[w] = words.get(w, 0) + 1
    logp = train_unigram_local(
        sorted(words.items()), vocab_size=30, max_piece_len=5
    )
    assert len(logp) >= 20


def test_collect_histogram_preserves_long_words(spark):
    """The driver-side histogram must not truncate pathological words:
    pre-r14 a >1M-char word lost real trailing characters to the
    unconditional EOW strip after a 1M slice (r13 advice). The strip is
    now suffix-checked and sliceless."""
    from nexus_event_stream_spark.operators.unigram import (
        _collect_histogram,
    )

    long_word = "ab" * 500_001  # 1_000_002 chars > the old 1M slice
    docs = spark.createDataFrame(
        [(1, f"{long_word} tiny"), (2, "tiny")],
        "doc_id long, text string",
    )
    hist = dict(_collect_histogram(docs, "text"))
    assert hist == {long_word: 1, "tiny": 2}


# ---------------------------------------------------------------------------
# property tests (hypothesis): lattice invariants over generated models
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=40, deadline=None)
@given(
    word=st.text(alphabet="abc", min_size=1, max_size=8),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_lattice_invariants_property(word, seed):
    """For any word and random piece model: (1) forward-backward Z
    equals the brute-force segmentation-probability sum, (2) every
    expected count is the brute-force posterior, (3) Viterbi returns an
    achievable max-probability segmentation that reassembles the word,
    (4) per-position expected coverage sums to exactly 1 (each char is
    covered by exactly one piece in every segmentation)."""
    rng = np.random.RandomState(seed)
    logp = rand_model(rng, word)
    exp, z = _forward_backward(word, logp, 3)
    probs, counts = [], {}
    for segs in brute_segmentations(word, set(logp)):
        p = math.exp(sum(logp[s] for s in segs))
        probs.append(p)
        for s in segs:
            counts[s] = counts.get(s, 0.0) + p
    assert math.isclose(math.exp(z), sum(probs), rel_tol=1e-9)
    for s, c in counts.items():
        assert math.isclose(exp[s], c / sum(probs), rel_tol=1e-9)
    # coverage: sum over pieces of expected * len == len(word)
    assert math.isclose(
        sum(exp[s] * len(s) for s in exp), len(word), rel_tol=1e-9
    )
    segs, score = viterbi_segment(word, logp, 3)
    assert "".join(segs) == word
    best = max(
        sum(logp[s] for s in ss)
        for ss in brute_segmentations(word, set(logp))
    )
    assert math.isclose(score, best, rel_tol=1e-9)
