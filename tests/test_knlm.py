"""Word-level interpolated Kneser-Ney bigram LM (operators/knlm.py):
driver-twin equality, the exact-normalization property, sub-distribution
under pruning, OOV/NULL handling, gate behavior, and the plan shape
(one corpus-grain training shuffle; broadcast scoring)."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from nexus_event_stream_spark.operators.knlm import (
    BOS,
    EOS,
    kn_gate,
    kn_perplexity,
    kn_transition_probs,
    train_kn_bigram,
)

CORPUS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the log"),
    (2, "the cat ate the fish"),
    (3, "a dog ate a bone"),
    (4, "the mat sat on the cat"),
    (5, "cats and dogs and cats"),
]


def _twin(rows, min_count=1, discount=None):
    """Pure-Python interpolated-KN twin — same tokenization, same
    formula, independent code path."""
    from collections import Counter

    big = Counter()
    for _i, t in rows:
        if t is None:
            continue
        ws = [BOS] + [w for w in t.split() if w] + [EOS]
        for a, b in zip(ws, ws[1:]):
            big[(a, b)] += 1
    c1 = Counter()
    fwd = Counter()
    bwd = Counter()
    for (a, b), c in big.items():
        c1[a] += c
        fwd[a] += 1
        bwd[b] += 1
    t_types = len(big)
    n1 = sum(1 for c in big.values() if c == 1)
    n2 = sum(1 for c in big.values() if c == 2)
    d = discount if discount is not None else (
        n1 / (n1 + 2.0 * n2) if n1 else 0.5
    )
    v = len(bwd)
    pruned = {k: c for k, c in big.items() if c >= min_count}

    def p(a, b):
        pcont = (bwd.get(b, 0) + 1) / (t_types + v + 1)
        if c1.get(a, 0) == 0:
            return pcont
        c = pruned.get((a, b), 0)
        return (max(c - d, 0.0) + d * fwd[a] * pcont) / c1[a]

    def ppl(t):
        if t is None:
            return None
        ws = [BOS] + [w for w in t.split() if w] + [EOS]
        lps = [math.log(p(a, b)) for a, b in zip(ws, ws[1:])]
        return math.exp(-sum(lps) / len(lps))

    return p, ppl, d


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_perplexity_matches_driver_twin(spark, corpus_df):
    model = train_kn_bigram(corpus_df)
    _p, ppl, d = _twin(CORPUS)
    assert model.discount == pytest.approx(d)
    got = {
        r["doc_id"]: (r["n_transitions"], r["kn_ppl"])
        for r in kn_perplexity(corpus_df, model).collect()
    }
    assert len(got) == len(CORPUS)
    for did, text in CORPUS:
        n_expected = len([w for w in text.split() if w]) + 1
        assert got[did][0] == n_expected
        assert got[did][1] == pytest.approx(ppl(text), rel=1e-9)
    model.unpersist()


def test_conditional_sums_to_one_over_vocab_plus_unk(spark, corpus_df):
    """The KN interpolation is EXACTLY normalized: for every seen
    context, Σ_{w2 ∈ vocab ∪ {unk}} P(w2|w1) == 1 — driven through the
    Spark scoring primitive itself on a contexts × candidates grid."""
    model = train_kn_bigram(corpus_df)
    vocab = [r["w2"] for r in model.continuations.collect()]
    grid = (
        model.contexts.select("w1")
        .crossJoin(
            corpus_df.sparkSession.createDataFrame(
                [(w,) for w in vocab] + [("__oov__",)], "w2 string"
            )
        )
    )
    sums = (
        kn_transition_probs(model, grid)
        .groupBy("w1")
        .agg(F.sum("p").alias("s"))
        .collect()
    )
    assert len(sums) > 0
    for r in sums:
        assert r["s"] == pytest.approx(1.0, abs=1e-12), r["w1"]
    model.unpersist()


def test_min_count_pruning_is_a_subdistribution(spark, corpus_df):
    """Pruning the bigram table keeps full-count context totals, so a
    pruned model can only LOWER a transition probability (sub-
    distribution) — and the pruned sums stay ≤ 1."""
    full = train_kn_bigram(corpus_df, min_count=1)
    pruned = train_kn_bigram(corpus_df, min_count=2)
    assert pruned.discount == pytest.approx(full.discount)
    grid = full.bigrams.select("w1", "w2")
    pf = {
        (r["w1"], r["w2"]): r["p"]
        for r in kn_transition_probs(full, grid).collect()
    }
    pp = {
        (r["w1"], r["w2"]): r["p"]
        for r in kn_transition_probs(pruned, grid).collect()
    }
    assert any(pp[k] < pf[k] - 1e-15 for k in pf)  # something was pruned
    for k in pf:
        assert pp[k] <= pf[k] + 1e-12
    _p, ppl, _d = _twin(CORPUS, min_count=2)
    got = {
        r["doc_id"]: r["kn_ppl"]
        for r in kn_perplexity(corpus_df, pruned).collect()
    }
    for did, text in CORPUS:
        assert got[did] == pytest.approx(ppl(text), rel=1e-9)
    full.unpersist()
    pruned.unpersist()


def test_oov_and_null_and_gate(spark, corpus_df):
    model = train_kn_bigram(corpus_df)
    probe = spark.createDataFrame(
        [
            (10, "the cat sat on the mat"),      # in-distribution
            (11, "zq wv xj qq zz pp kk"),        # all-OOV gibberish
            (12, None),                           # unscorable
            (13, ""),                             # empty: BOS->EOS only
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_transitions"], r["kn_ppl"])
        for r in kn_perplexity(probe, model).collect()
    }
    assert got[10][1] < got[11][1]  # gibberish scores far worse
    assert got[12] == (0, None)     # NULL text: no fabricated score
    assert got[13][0] == 1 and got[13][1] is not None
    threshold = got[10][1] * 1.5
    kept = sorted(
        r["doc_id"]
        for r in kn_gate(probe, model, max_ppl=threshold).collect()
    )
    assert 10 in kept and 11 not in kept and 12 not in kept
    model.unpersist()


def test_training_and_scoring_plan_shape(spark, corpus_df):
    """Training reaches corpus grain in ONE Exchange (the (w1,w2)
    groupBy); broadcast scoring's only real Exchange is the final
    per-doc aggregation — the three model joins are broadcast-hash."""
    model = train_kn_bigram(corpus_df)
    plan = model.bigrams._jdf.queryExecution().executedPlan().toString()
    # AQE prints the plan twice (Final + Initial) — pin the final only
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning") == 1
    # tokenization materialized ONCE per row: a split() inlined into the
    # pair-building HOF would re-tokenize per element (no CSE in
    # lambdas) — O(n^2) per doc
    assert final.count("split(") == 1
    scored = kn_perplexity(corpus_df, model)
    splan = scored._jdf.queryExecution().executedPlan().toString()
    assert splan.count("BroadcastHashJoin") >= 3
    # corpus-side shuffles: the per-doc agg (and its AQE reuse) only —
    # no sort-merge join anywhere
    assert "SortMergeJoin" not in splan
    model.unpersist()


def test_recipe_kn_perplexity_gate(spark, corpus_df):
    """r14: the KN word-model gate as a recipe opt-in (the lm_model /
    cms_model pattern) — an in-domain doc survives, OOV gibberish
    drops, and the stage lands between the char-LM and CMS gates."""
    from nexus_event_stream_spark.pipeline import (
        CorpusRecipe,
        prepare_training_corpus,
    )

    model = train_kn_bigram(corpus_df)
    docs = spark.createDataFrame(
        [
            (0, "the cat sat on the mat"),
            (1, "zxq wvv kjq pfw jxq zkv jjq qqz"),
        ],
        "doc_id long, text string",
    )
    in_ppl = {
        r["doc_id"]: r["kn_ppl"]
        for r in kn_perplexity(docs, model).collect()
    }
    recipe = CorpusRecipe(
        quality=False, redact_pii=False, exact_dedup=False,
        near_dedup=False, kn_model=model,
        kn_ppl_max=in_ppl[0] * 1.5,
    )
    corpus, stages = prepare_training_corpus(docs, recipe)
    assert [r.doc_id for r in corpus.collect()] == [0]
    assert "kn_perplexity" in stages
    model.unpersist()
