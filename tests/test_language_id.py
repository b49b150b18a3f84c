"""Char-LM language identification + per-language recipe routing
(operators/lm.language_id, pipeline lang_models/lang_quality_thresholds).

The binding pins: a multi-language synthetic corpus routes to its true
labels (misrouted rate pinned at 0 on held-out docs from the training
generators), one zero-shuffle kernel scores ALL models, and the
per-language quality thresholds gate each language by ITS OWN rules
inside prepare_training_corpus.
"""

from __future__ import annotations

import random

import pytest

from nexus_event_stream_spark.operators.lm import language_id, train_char_lm

#: three synthetic "languages" sharing the ASCII script (same alphabet —
#: the regime where stopword heuristics need per-language lists but
#: likelihood argmax just works): distinct phonotactics via distinct
#: syllable inventories.
_SYLLABLES = {
    "aa": ["ka", "to", "mi", "ra", "su", "ne"],
    "bb": ["sch", "ter", "ung", "ein", "ber", "den"],
    "cc": ["ette", "eau", "oir", "que", "les", "ons"],
}


def _word(rng: random.Random, lang: str) -> str:
    return "".join(
        rng.choice(_SYLLABLES[lang]) for _ in range(rng.randint(1, 3))
    )


def _sentence(rng: random.Random, lang: str, n_words: int) -> str:
    return " ".join(_word(rng, lang) for _ in range(n_words))


def _corpus(spark, lang: str, n_docs: int, seed: int, n_words: int = 40):
    rng = random.Random(seed)
    rows = [(i, _sentence(rng, lang, n_words)) for i in range(n_docs)]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def models(spark):
    return {
        lang: train_char_lm(
            _corpus(spark, lang, 40, seed=10 + i), n=3, min_count=2
        )
        for i, lang in enumerate(sorted(_SYLLABLES))
    }


def test_held_out_docs_route_to_true_labels(spark, models):
    """Misrouted-doc rate pinned: 0 on held-out docs (fresh seeds) from
    each language's own generator."""
    rows, labels = [], {}
    did = 0
    for i, lang in enumerate(sorted(_SYLLABLES)):
        rng = random.Random(99 + i)  # held out: not the training seeds
        for _ in range(15):
            rows.append((did, _sentence(rng, lang, 30)))
            labels[did] = lang
            did += 1
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in language_id(df, models).collect()}
    misrouted = sum(1 for d, r in got.items() if r.lang != labels[d])
    assert misrouted == 0
    # confidence margin is strictly positive on every routed doc
    assert all(r.lang_margin > 0 for r in got.values())


def test_empty_null_and_single_model_edges(spark, models):
    df = spark.createDataFrame(
        [(0, ""), (1, None), (2, _sentence(random.Random(5), "aa", 20))],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in language_id(df, models).collect()}
    assert got[0].lang is None and got[1].lang is None
    assert got[2].lang == "aa"
    one = {r.doc_id: r for r in language_id(
        df, {"aa": models["aa"]}
    ).collect()}
    assert one[2].lang == "aa" and one[2].lang_margin == 0.0
    with pytest.raises(ValueError, match="at least one model"):
        language_id(df, {})


def test_zero_shuffle_one_kernel_for_all_models(spark, models):
    df = _corpus(spark, "aa", 5, seed=3)
    out = language_id(df, models, keep_cols=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    # keep_cols passes the inputs through
    assert out.columns == [
        "doc_id", "text", "lang", "lang_log10_per_char", "lang_margin",
    ]


def test_per_language_quality_routing_in_recipe(spark, models):
    """Short docs pass in 'aa' (lowered floor) but fail in 'bb' (raised
    floor); the lang column rides into the final corpus; unidentified
    docs use the base thresholds."""
    from nexus_event_stream_spark.pipeline import (
        CorpusRecipe,
        prepare_training_corpus,
    )

    rng = random.Random(7)
    rows = []
    # ids 0-4: aa docs of 5 words → pass only under aa's min_words=3
    for i in range(5):
        rows.append((i, _sentence(rng, "aa", 5)))
    # ids 10-14: bb docs of 20 words → fail under bb's min_words=30
    for i in range(10, 15):
        rows.append((i, _sentence(rng, "bb", 20)))
    # ids 20-24: cc docs of 40 words → unlisted language, base rules pass
    for i in range(20, 25):
        rows.append((i, _sentence(rng, "cc", 40)))
    rows.append((30, None))  # unidentified: base rules (fails min_words)
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    recipe = CorpusRecipe(
        quality=True,
        redact_pii=False,
        exact_dedup=False,
        near_dedup=False,
        lang_models=models,
        lang_quality_thresholds={
            "aa": {"min_words": 3},
            "bb": {"min_words": 30},
        },
    )
    corpus, stages = prepare_training_corpus(docs, recipe)
    got = {r.doc_id: r.lang for r in corpus.collect()}
    assert sorted(got) == [0, 1, 2, 3, 4, 20, 21, 22, 23, 24]
    assert all(got[i] == "aa" for i in range(5))
    assert all(got[i] == "cc" for i in range(20, 25))
    assert "language_id" in stages and list(stages)[0] == "language_id"
    # without routing, the base min_words=3 default... the GLOBAL rules
    # would keep the bb docs too — the routing is what drops them
    base = CorpusRecipe(
        quality=True, redact_pii=False, exact_dedup=False, near_dedup=False,
        lang_models=models,
    )
    corpus_base, _ = prepare_training_corpus(docs, base)
    assert sorted(r.doc_id for r in corpus_base.collect()) == [
        0, 1, 2, 3, 4, 10, 11, 12, 13, 14, 20, 21, 22, 23, 24,
    ]


def test_lang_thresholds_require_models(spark):
    from nexus_event_stream_spark.pipeline import (
        CorpusRecipe,
        prepare_training_corpus,
    )

    docs = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="lang_models"):
        prepare_training_corpus(
            docs,
            CorpusRecipe(lang_quality_thresholds={"aa": {"min_words": 1}}),
        )


def test_per_language_repetition_routing_in_recipe(spark, models):
    """A chorus-like doc (high top-2gram coverage) passes under a
    language whose cap is RAISED, drops under the base caps — the
    repetition twin of the quality routing."""
    from nexus_event_stream_spark.pipeline import (
        CorpusRecipe,
        prepare_training_corpus,
    )

    rng = random.Random(11)
    loop_aa = " ".join(["kato mira"] * 20)          # top-2gram ≈ 100%
    loop_cc = " ".join(["etteoir ques"] * 20)        # same shape, cc script
    clean_aa = _sentence(rng, "aa", 60)
    docs = spark.createDataFrame(
        [(0, loop_aa), (1, loop_cc), (2, clean_aa)],
        "doc_id long, text string",
    )
    recipe = CorpusRecipe(
        repetition=True,
        quality=False,
        redact_pii=False,
        exact_dedup=False,
        near_dedup=False,
        lang_models=models,
        # aa tolerates total repetition (top-gram coverage counts each
        # overlapping occurrence's full char weight, so it can exceed
        # 100% — the published count x len definition; caps go high)
        lang_repetition_thresholds={"aa": {
            **{f"max_top_{n}gram_char_frac_pct": 1000 for n in (2, 3, 4)},
            **{f"max_dup_{n}gram_char_frac_pct": 100 for n in range(5, 11)},
        }},
    )
    corpus, stages = prepare_training_corpus(docs, recipe)
    assert sorted(r.doc_id for r in corpus.collect()) == [0, 2]
    assert "repetition" in stages

    with pytest.raises(ValueError, match="lang_models"):
        prepare_training_corpus(
            docs,
            CorpusRecipe(
                repetition=True,
                lang_repetition_thresholds={"aa": {}},
            ),
        )


def test_per_language_stopwords_in_recipe(spark, models):
    """The r12 stopword routing end to end: with a per-language stopword
    table and a raised min_stopwords floor, an 'aa' doc built from aa
    function words passes (counted against ITS list) while the same
    floor drops it when only the English default is in play — the
    signal, not just the threshold, is language-routed."""
    from nexus_event_stream_spark.operators.quality import (
        QUALITY_THRESHOLDS,
    )
    from nexus_event_stream_spark.pipeline import (
        CorpusRecipe,
        prepare_training_corpus,
    )

    # an aa doc salted with two aa 'function words' (its own stopwords);
    # body built from multi-syllable aa words only — the generator can
    # emit the single syllable 'to', which IS an English stopword and
    # would let the unrouted floor pass by accident
    aa_stop = ("kato", "mira")
    body = " ".join(["kami", "rasu", "nemi", "tosu", "raka", "mine"] * 4)
    docs = spark.createDataFrame(
        [(0, f"kato {body} mira")], "doc_id long, text string"
    )
    common = dict(
        quality=True,
        redact_pii=False,
        exact_dedup=False,
        near_dedup=False,
        lang_models=models,
        quality_thresholds={**QUALITY_THRESHOLDS, "min_stopwords": 2},
    )
    routed, _ = prepare_training_corpus(
        docs, CorpusRecipe(lang_stopwords={"aa": aa_stop}, **common)
    )
    assert [r.doc_id for r in routed.collect()] == [0]
    unrouted, _ = prepare_training_corpus(docs, CorpusRecipe(**common))
    assert unrouted.count() == 0  # English list finds no stopwords


def test_lang_stopwords_require_models(spark):
    from nexus_event_stream_spark.pipeline import (
        CorpusRecipe,
        prepare_training_corpus,
    )

    docs = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="lang_models"):
        prepare_training_corpus(
            docs, CorpusRecipe(lang_stopwords={"aa": ("ka",)})
        )
