"""Char-n-gram LM perplexity scoring (operators/lm.py) vs a pure-Python
oracle.

The oracle reimplements training (plain dict counting over string
slices) and scoring (the textbook recursive stupid backoff) with NO
shared code — hashes never appear in it — so agreement checks the whole
chain: rolling-hash windows, partial-count merge, pruning/cap ranking,
the vectorized backoff climb, and the OOV floor."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from nexus_event_stream_spark.io import load_table
from nexus_event_stream_spark.operators.lm import (
    BACKOFF_ALPHA,
    perplexity_score,
    train_char_lm,
)

SF_DIR = "/root/testdata/sf0.001"


def oracle_counts(texts, n):
    counts = {k: {} for k in range(1, n + 1)}
    for t in texts:
        for k in range(1, n + 1):
            for i in range(len(t) - k + 1):
                g = t[i : i + k]
                counts[k][g] = counts[k].get(g, 0) + 1
    return counts


def oracle_score(text, counts, n, total):
    """Recursive stupid backoff, log10 per char, summed."""

    def s(i, k):
        # score char text[i] with up to (k-1) chars of context
        if k == 1:
            c = counts[1].get(text[i], 0)
            return c / total if c else 1.0 / (10.0 * total)
        if i - k + 1 < 0:
            return s(i, k - 1)
        g = text[i - k + 1 : i + 1]
        ctx = text[i - k + 1 : i]
        cg, cc = counts[k].get(g, 0), counts[k - 1].get(ctx, 0)
        if cg and cc:
            return cg / cc
        return BACKOFF_ALPHA * s(i, k - 1)

    return sum(math.log10(s(i, n)) for i in range(len(text)))


@pytest.fixture(scope="module")
def tiny(spark):
    texts = [
        "the cat sat on the mat",
        "the dog sat on the log",
        "a cat and a dog sat",
        "streaming tables join windows",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return df, texts


def test_training_counts_match_oracle(spark, tiny):
    """min_count=1, no cap: every oracle gram is in the model with the
    exact count, and totals line up (model stores hashes, so membership
    checks via re-scoring a one-gram probe string)."""
    df, texts = tiny
    n = 3
    model = train_char_lm(df, n=n, min_count=1, max_grams=10**9)
    want = oracle_counts(texts, n)
    assert model["n"] == n
    assert model["total_chars"] == sum(len(t) for t in texts)
    for k in range(1, n + 1):
        h, c = model["orders"][k]
        assert len(h) == len(want[k])
        assert int(c.sum()) == sum(want[k].values())
        # count MULTISET matches exactly (hash-blind comparison)
        assert sorted(int(x) for x in c) == sorted(want[k].values())


def test_scores_match_recursive_oracle(spark, tiny):
    df, texts = tiny
    n = 3
    model = train_char_lm(df, n=n, min_count=1, max_grams=10**9)
    counts = oracle_counts(texts, n)
    total = sum(len(t) for t in texts)
    got = {
        int(r.doc_id): (float(r.log10_prob), float(r.ppl_char), int(r.n_chars))
        for r in perplexity_score(df, model).collect()
    }
    for i, t in enumerate(texts):
        want_lp = oracle_score(t, counts, n, total)
        assert got[i][0] == pytest.approx(want_lp, abs=1e-9), i
        assert got[i][1] == pytest.approx(10 ** (-want_lp / len(t)), rel=1e-9)
        assert got[i][2] == len(t)
    # unseen text scores too (backoff all the way to OOV floors)
    probe = spark.createDataFrame([(99, "zzqx")], "doc_id long, text string")
    r = perplexity_score(probe, model).first()
    assert r.ppl_char > got[0][1]


def test_discrimination_on_real_corpus(spark):
    """Train on the driver documents; an in-domain doc scores far lower
    perplexity than gibberish and than reversed-alphabet text — the
    CCNet filtering signal."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    model = train_char_lm(docs, n=3, min_count=2)
    sample = docs.limit(3).collect()
    probes = [(0, sample[0].text), (1, "xq zvvkjq pf wjx qzkv jjj"),
              (2, "ÿþýü ûúùø ÷öõô")]
    pdf = spark.createDataFrame(probes, "doc_id long, text string")
    ppl = {int(r.doc_id): float(r.ppl_char) for r in perplexity_score(pdf, model).collect()}
    assert ppl[0] < ppl[1] < ppl[2]
    assert ppl[0] < 25  # in-domain char ppl is small
    # empty/NULL docs: ppl 1.0 (no evidence), not NaN/inf
    edge = spark.createDataFrame(
        [(7, ""), (8, None)], "doc_id long, text string"
    )
    for r in perplexity_score(edge, model).collect():
        assert float(r.ppl_char) == 1.0 and int(r.n_chars) == 0


def test_min_count_and_cap_prune(spark, tiny):
    df, texts = tiny
    full = train_char_lm(df, n=2, min_count=1, max_grams=10**9)
    pruned = train_char_lm(df, n=2, min_count=3, max_grams=10**9)
    want = oracle_counts(texts, 2)
    for k in (1, 2):
        assert len(pruned["orders"].get(k, ((), ()))[0]) == sum(
            1 for c in want[k].values() if c >= 3
        )
        assert len(full["orders"][k][0]) == len(want[k])
    capped = train_char_lm(df, n=2, min_count=1, max_grams=5)
    for k in (1, 2):
        h, c = capped["orders"][k]
        assert len(h) == 5
        # the cap keeps the MOST FREQUENT grams: its floor count must be
        # >= the count of every dropped gram
        kept_min = int(c.min())
        all_sorted = sorted(want[k].values(), reverse=True)
        assert kept_min >= all_sorted[5] or kept_min == all_sorted[4]


def test_training_partition_independent(spark, tiny):
    df, _ = tiny
    m1 = train_char_lm(df.coalesce(1), n=3, min_count=1, max_grams=10**9)
    m7 = train_char_lm(df.repartition(7), n=3, min_count=1, max_grams=10**9)
    for k in m1["orders"]:
        assert (m1["orders"][k][0] == m7["orders"][k][0]).all()
        assert (m1["orders"][k][1] == m7["orders"][k][1]).all()


def test_scoring_plan_zero_shuffle(spark, tiny):
    df, _ = tiny
    model = train_char_lm(df, n=2, min_count=1)
    plan = (
        perplexity_score(df, model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # pure map-side Arrow kernel


def test_batch_scorer_bit_identical_to_single_doc_spec(spark, tiny):
    """_score_batch (the whole-batch kernel the scorer runs) must be
    BIT-identical to _score_doc (the readable per-doc spec), across doc
    lengths shorter than the order and mixed orders."""
    import numpy as np

    from nexus_event_stream_spark.operators.lm import (
        _codepoints,
        _score_batch,
        _score_doc,
    )

    df, texts = tiny
    model = train_char_lm(df, n=3, min_count=1, max_grams=10**9)
    probes = texts + ["a", "ab", "zzqx unseen", "the cat", "x"]
    cps = [_codepoints(t) for t in probes]
    got = _score_batch(cps, model)
    want = np.array([_score_doc(c, model) for c in cps])
    assert (got == want).all()  # bit identity, not approx


# ---- DSIR importance resampling -------------------------------------------


def test_importance_weights_match_spec(spark, tiny):
    import numpy as np

    from nexus_event_stream_spark.operators.lm import (
        _codepoints,
        _score_doc,
        importance_weights,
    )

    df, texts = tiny
    target = train_char_lm(df.filter("doc_id < 2"), n=3, min_count=1)
    raw = train_char_lm(df, n=3, min_count=1)
    got = {
        int(r.doc_id): (float(r.log10_ratio), float(r.weight))
        for r in importance_weights(df, target, raw).collect()
    }
    for i, t in enumerate(texts):
        cp = _codepoints(t)
        want = (_score_doc(cp, target) - _score_doc(cp, raw)) / len(t)
        assert got[i][0] == pytest.approx(want, abs=1e-12)
        assert got[i][1] == pytest.approx(10.0 ** want, rel=1e-12)
    # raw full-sequence mode
    got_raw = {
        int(r.doc_id): float(r.log10_ratio)
        for r in importance_weights(df, target, raw, normalize="none").collect()
    }
    for i, t in enumerate(texts):
        cp = _codepoints(t)
        assert got_raw[i] == pytest.approx(
            _score_doc(cp, target) - _score_doc(cp, raw), abs=1e-9
        )
    with pytest.raises(ValueError):
        importance_weights(df, target, raw, normalize="nope")


def test_dsir_select_prefers_target_like_docs(spark):
    """Two disjoint styles; the target LM is trained on style A only.
    Selecting half the corpus must overwhelmingly pick style-A docs —
    the DSIR selection property — and be replayable."""
    import random

    from nexus_event_stream_spark.operators.lm import dsir_select

    rng = random.Random(42)
    a_words = ["table", "join", "window", "stream", "merge", "filter"]
    b_words = ["zyx", "qwv", "kjh", "pqr", "xxz", "vvq"]
    rows = []
    for i in range(200):
        words = a_words if i % 2 == 0 else b_words
        rows.append(
            (i, " ".join(rng.choice(words) for _ in range(20)))
        )
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    target = train_char_lm(
        docs.filter("doc_id % 2 = 0"), n=3, min_count=1
    )
    raw = train_char_lm(docs, n=3, min_count=1)
    picked = dsir_select(docs, target, raw, k=100).collect()
    assert len(picked) == 100
    a_frac = sum(1 for r in picked if r.doc_id % 2 == 0) / 100
    assert a_frac > 0.9  # style A dominates the selection
    # replayable: identical selection on a different partitioning
    again = {
        int(r.doc_id)
        for r in dsir_select(
            docs.repartition(7), target, raw, k=100
        ).collect()
    }
    assert again == {int(r.doc_id) for r in picked}
    # selected rows carry the provenance columns
    assert {"log10_ratio", "weight"} <= set(picked[0].asDict())


def test_non_ascii_grams_survive_the_table(spark):
    """Regression (review r9): gram hashes with bit 63 set were sorted
    SIGNED while lookups searchsort unsigned — non-ASCII grams silently
    missed. Train on CJK/emoji text; every trained gram must look up at
    its exact count, and in-domain CJK text must beat gibberish CJK."""
    import numpy as np

    from nexus_event_stream_spark.operators.lm import (
        _codepoints,
        _gram_hashes,
        _lookup,
    )

    texts = [
        "数据 处理 管道 的 质量 过滤 阶段 😀",
        "数据 管道 的 过滤 阶段 很 重要 😀",
        "データ パイプライン の 品質 フィルタ",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    n = 3
    model = train_char_lm(df, n=n, min_count=1, max_grams=10**9)
    # the tables must be sorted UNSIGNED (monotone as uint64)
    for k in range(1, n + 1):
        h, _c = model["orders"][k]
        assert (np.diff(h.astype(np.uint64).view(np.uint64)) > 0).all()
    # every oracle gram hits its exact count — including bit-63 hashes
    want = oracle_counts(texts, n)
    hit63 = 0
    for k in range(1, n + 1):
        for g, cnt in want[k].items():
            hv = _gram_hashes(_codepoints(g), k)[:1]
            if int(hv[0]) >> 63:
                hit63 += 1
            got = int(_lookup(model, k, hv)[0])
            assert got == cnt, (k, g, got, cnt)
    assert hit63 > 0  # the regression surface was actually exercised
    # and the gate signal works on non-ASCII: in-domain < gibberish
    probes = spark.createDataFrame(
        [(0, texts[0]), (1, "㑇 ㅱ ㊋ 🜚 𐃯 ꬿ")],
        "doc_id long, text string",
    )
    ppl = {
        int(r.doc_id): float(r.ppl_char)
        for r in perplexity_score(probes, model).collect()
    }
    assert ppl[0] < ppl[1]


def test_importance_weights_string_ids(spark, tiny):
    """The id column rides through with its INPUT type — a string doc id
    must work end-to-end, not fail inside the Arrow kernel."""
    from nexus_event_stream_spark.operators.lm import importance_weights

    df, texts = tiny
    target = train_char_lm(df.filter("doc_id < 2"), n=3, min_count=1)
    raw = train_char_lm(df, n=3, min_count=1)
    sdf = df.selectExpr("concat('doc-', doc_id) AS doc_id", "text")
    got = importance_weights(sdf, target, raw)
    assert dict(got.dtypes)["doc_id"] == "string"
    rows = {r.doc_id: float(r.log10_ratio) for r in got.collect()}
    base = {
        f"doc-{int(r.doc_id)}": float(r.log10_ratio)
        for r in importance_weights(df, target, raw).collect()
    }
    assert rows == base
