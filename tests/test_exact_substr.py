"""ExactSubstr token-level dedup (operators/exact_substr.py).

The binding pin is pure-Python-oracle EQUALITY: a naive all-sliding-
windows oracle (dict of window text -> occurrence list, corpus-first
kept) must agree with the distributed winnowing-anchor formulation on
every document — n_tokens, dup_tokens, AND the reassembled clean text —
including on randomized corpora with planted shared spans. Plus the
corpus segment_dedup structurally misses (the 1-word-shift corpus from
test_quality.py), which this tier must catch.
"""

from __future__ import annotations

import random
import zlib

from nexus_event_stream_spark.operators.exact_substr import (
    _GRAM_BASE,
    _gram_hash_at,
    _winnow_anchors,
    exact_substr_dedup,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _w(lo, hi, tag="w"):
    return " ".join(f"{tag}{i}" for i in range(lo, hi))


def _oracle(texts: list[str | None], L: int):
    """Naive spec: every sliding L-token window, corpus-first occurrence
    (ordered by doc_id, pos) kept, all later occurrences' tokens removed."""
    toks_by = {
        d: ([] if t is None else t.split(" ")) for d, t in enumerate(texts)
    }
    occ: dict[str, list[tuple[int, int]]] = {}
    for d in sorted(toks_by):
        toks = toks_by[d]
        for s in range(len(toks) - L + 1):
            occ.setdefault(" ".join(toks[s : s + L]), []).append((d, s))
    covered = {d: [False] * len(toks_by[d]) for d in toks_by}
    for sites in occ.values():
        for d, s in sites[1:]:
            for i in range(s, s + L):
                covered[d][i] = True
    return {
        d: (
            len(toks_by[d]),
            sum(covered[d]),
            " ".join(t for t, c in zip(toks_by[d], covered[d]) if not c),
        )
        for d in toks_by
    }


def _check_against_oracle(spark, texts, L, anchor_k=None):
    df = _docs(spark, texts)
    exp = _oracle(texts, L)
    got = {
        r.doc_id: r
        for r in exact_substr_dedup(
            df, min_len=L, anchor_k=anchor_k, emit_text=True
        ).collect()
    }
    assert set(got) == set(exp)
    for d, (n, dup, clean) in exp.items():
        r = got[d]
        assert r.n_tokens == n, (d, r, n)
        assert r.dup_tokens == dup, (d, r.dup_tokens, dup)
        if texts[d] is None:
            assert r.clean_text is None
        else:
            assert r.clean_text == clean, (d, r.clean_text, clean)
    # the stats-only path (Catalyst interval fold) must agree exactly
    stats = {
        r.doc_id: r
        for r in exact_substr_dedup(df, min_len=L, anchor_k=anchor_k).collect()
    }
    for d in exp:
        assert stats[d].n_tokens == got[d].n_tokens
        assert stats[d].dup_tokens == got[d].dup_tokens
    return got


def test_gram_hash_matches_convolution():
    import numpy as np

    toks = ["a", "bb", "ccc", "dd", "e", "ff", "a", "bb"]
    th = np.array([zlib.crc32(t.encode()) for t in toks], dtype=np.int64)
    weights = np.int64(_GRAM_BASE) ** np.arange(2, -1, -1, dtype=np.int64)
    gh = np.convolve(th, weights, mode="valid")
    for p in range(len(toks) - 2):
        assert int(gh[p]) == _gram_hash_at(toks, p, 3)


def test_winnowing_anchors_are_offset_invariant():
    """The winnowing guarantee's mechanical core: a shared span's
    interior anchors land at the same span-relative offsets regardless
    of absolute position."""
    span = _w(0, 40, "s").split(" ")
    a = ["x0", "x1"] + span + ["y0"]
    b = ["z%d" % i for i in range(9)] + span
    k, wnd = 4, 5
    in_a = {
        p - 2 for p, _ in _winnow_anchors(a, k, wnd) if 2 <= p <= 2 + 40 - k
    }
    in_b = {
        p - 9 for p, _ in _winnow_anchors(b, k, wnd) if 9 <= p <= 9 + 40 - k
    }
    # interior selections (full hash window inside the span) must coincide;
    # only selections whose window straddles the span edge may differ
    interior = {p for p in in_a if p >= wnd - 1} & {
        p for p in in_b if p >= wnd - 1
    }
    assert interior  # at least one shared interior anchor exists
    for p in interior:
        assert _gram_hash_at(a, p + 2, k) == _gram_hash_at(b, p + 9, k)


def test_catches_the_segment_dedup_boundary_miss(spark):
    """The documented miss: segment_dedup at n=50 cannot see a shared
    50-word span shifted by one word. ExactSubstr must remove it."""
    shared = _w(0, 50, "s")
    texts = [
        shared + " " + _w(0, 50),  # doc0: owns first occurrence
        shared + " " + _w(100, 150),  # doc1: aligned copy
        _w(200, 250) + " " + shared,  # doc2: aligned at segment 2
        "pre " + shared + " " + _w(300, 348),  # doc3: the 1-word shift
    ]
    got = _check_against_oracle(spark, texts, L=50)
    assert got[0].dup_tokens == 0
    assert got[1].dup_tokens == 50
    assert got[2].dup_tokens == 50
    assert got[3].dup_tokens == 50  # segment_dedup misses this one
    assert got[3].clean_text == "pre " + _w(300, 348)


def test_long_shared_span_fully_removed(spark):
    """A shared span LONGER than min_len: interval union of the
    overlapping duplicated windows removes the whole span once."""
    span = _w(0, 70, "s")
    texts = [
        _w(0, 30) + " " + span + " " + _w(30, 55),
        _w(100, 117) + " " + span + " " + _w(200, 230),
    ]
    got = _check_against_oracle(spark, texts, L=50)
    assert got[0].dup_tokens == 0
    assert got[1].dup_tokens == 70
    assert got[1].clean_text == _w(100, 117) + " " + _w(200, 230)


def test_below_min_len_never_removed(spark):
    span = _w(0, 49, "s")  # one short of the grain
    texts = [
        span + " " + _w(0, 40),
        _w(100, 140) + " " + span,
    ]
    got = _check_against_oracle(spark, texts, L=50)
    assert got[0].dup_tokens == 0 and got[1].dup_tokens == 0


def test_within_document_repetition(spark):
    span = _w(0, 50, "s")
    texts = [span + " " + _w(0, 20) + " " + span]
    got = _check_against_oracle(spark, texts, L=50)
    assert got[0].n_tokens == 120
    assert got[0].dup_tokens == 50
    assert got[0].clean_text == span + " " + _w(0, 20)


def test_rows_preserved_for_edge_documents(spark):
    texts = [
        "",  # one empty token under the split convention
        "short doc",
        None,
        _w(0, 60),
        _w(0, 60),  # full duplicate of doc3
    ]
    got = _check_against_oracle(spark, texts, L=50)
    assert set(got) == {0, 1, 2, 3, 4}
    assert got[3].dup_tokens == 0
    assert got[4].dup_tokens == 60
    assert got[4].clean_text == ""


def test_oracle_equality_randomized_corpora(spark):
    """Seeded randomized corpora: small vocab (chance window repeats at
    small L are WANTED — they exercise the candidate filter on noise),
    planted cross-doc spans at random misaligned offsets, a planted
    within-doc repeat, plus short/empty docs."""
    for seed in (7, 23):
        rng = random.Random(seed)
        vocab = [f"v{i}" for i in range(25)]
        texts = []
        for _ in range(10):
            n = rng.randint(3, 70)
            texts.append(" ".join(rng.choice(vocab) for _ in range(n)))
        span = " ".join(rng.choice(vocab) for _ in range(17))
        # plant the span into three docs at random offsets
        for d in rng.sample(range(10), 3):
            toks = texts[d].split(" ")
            at = rng.randint(0, len(toks))
            texts[d] = " ".join(toks[:at] + span.split(" ") + toks[at:])
        texts.append("")  # edge rows ride along
        texts.append(span)  # doc that IS exactly one window + planted copies
        _check_against_oracle(spark, texts, L=8, anchor_k=4)
        _check_against_oracle(spark, texts, L=8)  # default anchor_k too


def test_partition_independence(spark):
    span = _w(0, 55, "s")
    texts = [
        _w(0, 30) + " " + span,
        span + " " + _w(100, 130),
        _w(200, 280),
    ]
    df = _docs(spark, texts).repartition(7)
    exp = _oracle(texts, 50)
    got = {
        r.doc_id: r
        for r in exact_substr_dedup(df, min_len=50, emit_text=True).collect()
    }
    for d, (n, dup, clean) in exp.items():
        assert (got[d].n_tokens, got[d].dup_tokens, got[d].clean_text) == (
            n,
            dup,
            clean,
        )


def test_recipe_stage_catches_boundary_straddling_spans(spark):
    """CorpusRecipe.exact_substr_min_len composes the tier after the
    segment-grain passage dedup: the 1-word-shifted shared span the
    segment stage misses is removed by the sliding stage, first copy
    kept, everything else byte-preserved."""
    from nexus_event_stream_spark.pipeline import (
        CorpusRecipe,
        prepare_training_corpus,
    )

    shared = _w(0, 50, "s")
    docs = _docs(
        spark,
        [
            shared + " " + _w(0, 50),
            "pre " + shared + " " + _w(300, 348),  # the 1-word shift
        ],
    )
    recipe = CorpusRecipe(
        quality=False,
        redact_pii=False,
        exact_dedup=False,
        near_dedup=False,
        passage_dedup_n=50,
        exact_substr_min_len=50,
    )
    corpus, stages = prepare_training_corpus(docs, recipe)
    out = {r.doc_id: r.text for r in corpus.collect()}
    assert "exact_substr" in stages
    assert out[0] == shared + " " + _w(0, 50)  # first copy intact
    assert out[1] == "pre " + _w(300, 348)  # shifted copy stripped
