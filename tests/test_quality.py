"""Unit tests for the corpus-hygiene operators (operators/quality.py).

The driver oracle checks these on the synthetic word-soup corpus; the
tests here exercise the semantics the corpus cannot — documents with real
PII spans, cross-document duplicated passages, benchmark contamination,
and each quality-threshold branch — with closed-form expectations.
"""

from __future__ import annotations

import pytest

from nexus_event_stream_spark.operators.quality import (
    QUALITY_THRESHOLDS,
    benchmark_ngrams,
    decontaminate,
    pii_redact,
    quality_signals,
    segment_dedup,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


# ---------------------------------------------------------------------------
# quality signals
# ---------------------------------------------------------------------------


def test_quality_signal_values_closed_form(spark):
    df = _docs(spark, ["the cat sat on the mat"])
    row = quality_signals(df).collect()[0]
    assert row.n_words == 6
    assert row.sum_word_chars == 3 + 3 + 3 + 2 + 3 + 3
    assert row.n_distinct_words == 5  # 'the' twice
    assert row.n_bigrams == 5
    assert row.top_bigram_n == 1  # all 5 bigrams distinct
    assert row.n_stopwords == 2  # 'the' x2 ('on'/'cat'... not in list)
    assert row.n_alpha_words == 6
    assert row.mean_word_len == pytest.approx(17 / 6)
    assert row.dup_word_frac == pytest.approx(1 / 6)
    assert row.quality_pass == 1


def test_quality_rules_fail_each_branch(spark):
    rows = {
        r.doc_id: r
        for r in quality_signals(
            _docs(
                spark,
                [
                    "too short",  # < min_words
                    "a a a a a a a a a a",  # dup fraction + top bigram
                    "1 2 3 4 5 6 7 8 9 10",  # alpha fraction
                    "xxxxxxxxxxxxxxxxx yyyyyyyyyyyyyyy zzzzzzzzzzzzz",
                    # ^ mean word length > max
                ],
            )
        ).collect()
    }
    assert all(rows[i].quality_pass == 0 for i in range(4))
    # and the reasons are the intended ones
    assert rows[0].n_words < QUALITY_THRESHOLDS["min_words"]
    assert rows[1].dup_word_frac == pytest.approx(0.9)
    assert rows[1].top_bigram_frac == 1.0
    assert rows[2].n_alpha_words == 0
    assert rows[3].mean_word_len > QUALITY_THRESHOLDS["max_mean_word_len"]


def test_top_bigram_repeated(spark):
    row = quality_signals(_docs(spark, ["x y x y x y z"])).collect()[0]
    # bigrams: xy yx xy yx xy yz → 'x y' occurs 3 times
    assert row.top_bigram_n == 3
    assert row.n_bigrams == 6


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------


def test_pii_redact_counts_and_replacement(spark):
    text = (
        "contact bob.smith+x@example.co.uk or call +1 (415) 555-0137 "
        "from host 192.168.1.10 today"
    )
    row = pii_redact(_docs(spark, [text])).collect()[0]
    assert row.n_email == 1
    assert row.n_phone == 1
    assert row.n_ipv4 == 1
    assert "<EMAIL>" in row.redacted
    assert "<PHONE>" in row.redacted
    assert "<IP>" in row.redacted
    assert "example.co.uk" not in row.redacted
    assert "415" not in row.redacted
    assert "192.168" not in row.redacted


def test_pii_clean_text_untouched(spark):
    text = "no personal data here just words"
    row = pii_redact(_docs(spark, [text])).collect()[0]
    assert (row.n_email, row.n_ipv4, row.n_phone) == (0, 0, 0)
    assert row.redacted == text


# ---------------------------------------------------------------------------
# passage-level exact dedup
# ---------------------------------------------------------------------------


def test_segment_dedup_first_occurrence_wins(spark):
    # doc0 and doc1 share the segment "p q r"; doc0 owns the first
    # occurrence (smaller doc_id) so only doc1's copy is a duplicate
    df = _docs(spark, ["p q r a b c", "p q r x y z", "u v w"])
    rows = {r.doc_id: r for r in segment_dedup(df, n=3).collect()}
    assert rows[0].n_segments == 2 and rows[0].dup_segments == 0
    assert rows[1].n_segments == 2 and rows[1].dup_segments == 1
    assert rows[1].clean_n_words == 3
    assert rows[2].n_segments == 1 and rows[2].dup_segments == 0


def test_segment_dedup_within_doc_and_tail(spark):
    # 8 words, n=3 → 2 segments + 2 tail words; the repeated "a b c"
    # INSIDE one doc dedups too (position breaks the tie); tail words kept
    rows = segment_dedup(_docs(spark, ["a b c a b c t1 t2"]), n=3).collect()
    r = rows[0]
    assert r.n_segments == 2 and r.dup_segments == 1
    assert r.clean_n_words == 8 - 3


def test_segment_dedup_short_doc_no_segments(spark):
    r = segment_dedup(_docs(spark, ["one two"]), n=3).collect()[0]
    assert r.n_segments == 0 and r.dup_segments == 0
    assert r.clean_n_words == 2


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------


def test_decontaminate_counts_distinct_overlaps(spark):
    bench = benchmark_ngrams(_docs(spark, ["the quick brown fox jumps"]), n=3)
    corpus = _docs(
        spark,
        [
            "we saw the quick brown fox jumps high",  # 2 benchmark 3-grams...
            "totally unrelated text with no overlap at all",
            "the quick brown the quick brown",  # repeated gram counts ONCE
        ],
    )
    rows = {r.doc_id: r for r in decontaminate(corpus, bench, n=3).collect()}
    # doc0 grams include 'the quick brown','quick brown fox','brown fox jumps'
    assert rows[0].n_contaminated == 3
    assert rows[1].n_contaminated == 0
    assert rows[2].n_contaminated == 1  # distinct overlap, not occurrences
    # distinct grams: 'the quick brown','quick brown the','brown the quick'
    assert rows[2].n_grams == 3


def test_decontaminate_short_docs_emit_rows(spark):
    bench = benchmark_ngrams(_docs(spark, ["a b c d"]), n=3)
    rows = decontaminate(_docs(spark, ["xy"]), bench, n=3).collect()
    assert rows[0].n_grams == 0 and rows[0].n_contaminated == 0


# ---------------------------------------------------------------------------
# streaming composability
# ---------------------------------------------------------------------------


def test_quality_filter_composes_with_structured_streaming(spark, tmp_path):
    # quality_signals + pii_redact are pure projections (no window/agg),
    # so the SAME operators run unchanged on a streaming DataFrame — the
    # shape a live ingest-time corpus filter needs. Stateless projections
    # need no watermark and no state store.
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [
            (0, "the cat sat on the mat quite happily today"),
            (1, "a a a a a a a a a a a a"),  # fails quality
            (2, "write to team.lead@example.com for details please ok"),
        ],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(src)
    stream_df = spark.readStream.schema("doc_id long, text string").parquet(src)
    out = pii_redact(quality_signals(stream_df)).filter("quality_pass = 1")
    q = (
        out.select("doc_id", "redacted")
        .writeStream.format("memory")
        .queryName("q_hygiene_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r.doc_id: r for r in spark.sql("SELECT * FROM q_hygiene_stream").collect()}
    assert set(rows) == {0, 2}  # doc 1 filtered by the quality gate
    assert "<EMAIL>" in rows[2].redacted


def test_segment_dedup_emit_text_reassembles(spark):
    df = _docs(spark, ["p q r a b c t1", "p q r x y z", "one two"])
    rows = {
        r.doc_id: r for r in segment_dedup(df, n=3, emit_text=True).collect()
    }
    # doc0 keeps both segments + tail word
    assert rows[0].clean_text == "p q r a b c t1"
    # doc1 loses the duplicated "p q r", keeps its second segment
    assert rows[1].clean_text == "x y z"
    # sub-segment doc: whole text survives as tail
    assert rows[2].clean_text == "one two"
    # clean_n_words always agrees with the reassembled text
    for r in rows.values():
        assert r.clean_n_words == len(r.clean_text.split(" "))


def test_segment_dedup_emit_text_within_doc(spark):
    r = segment_dedup(
        _docs(spark, ["a b c a b c t1 t2"]), n=3, emit_text=True
    ).collect()[0]
    assert r.clean_text == "a b c t1 t2"


# ---------------------------------------------------------------------------
# property pins vs pure-Python references
# ---------------------------------------------------------------------------

from collections import Counter  # noqa: E402

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_WORDS = ["aa", "b", "ccc", "dd", "e", "the"]
corpus_strategy = st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=1, max_size=12).map(" ".join),
    min_size=1,
    max_size=8,
)


def _ref_segment_dedup(texts, n):
    """Pure-Python C4 span rule: first (doc, pos) occurrence wins."""
    seen = set()
    out = {}
    for doc_id, text in enumerate(texts):
        w = text.split(" ")
        kept, dups, nseg = [], 0, len(w) // n
        for i in range(nseg):
            seg = " ".join(w[i * n : i * n + n])
            if seg in seen:
                dups += 1
            else:
                seen.add(seg)
                kept.extend(w[i * n : i * n + n])
        kept.extend(w[nseg * n :])
        out[doc_id] = (nseg, dups, " ".join(kept))
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=corpus_strategy, n=st.integers(min_value=1, max_value=4))
def test_segment_dedup_matches_python_reference(spark, texts, n):
    rows = {
        r.doc_id: r
        for r in segment_dedup(_docs(spark, texts), n=n, emit_text=True).collect()
    }
    ref = _ref_segment_dedup(texts, n)
    for doc_id, (nseg, dups, clean) in ref.items():
        r = rows[doc_id]
        assert (r.n_segments, r.dup_segments) == (nseg, dups)
        assert r.clean_text == clean
        assert r.clean_n_words == len(clean.split(" ")) if clean else True


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=corpus_strategy)
def test_quality_signals_match_python_reference(spark, texts):
    rows = {r.doc_id: r for r in quality_signals(_docs(spark, texts)).collect()}
    for doc_id, text in enumerate(texts):
        w = text.split(" ")
        bg = [" ".join(w[i : i + 2]) for i in range(len(w) - 1)]
        r = rows[doc_id]
        assert r.n_words == len(w)
        assert r.sum_word_chars == sum(len(x) for x in w)
        assert r.n_distinct_words == len(set(w))
        assert r.top_bigram_n == (max(Counter(bg).values()) if bg else 0)
        assert r.n_stopwords == sum(w_.lower() in ("the", "a", "and", "of", "to", "in") for w_ in w)


def test_decontaminate_hashed_grams_identical_counts(spark):
    bench_docs = _docs(spark, ["the quick brown fox jumps over lazy dogs"])
    corpus = _docs(
        spark,
        [
            "we saw the quick brown fox jumps high",
            "totally unrelated text with no overlap at all",
        ],
    )
    plain = {
        r.doc_id: (r.n_grams, r.n_contaminated)
        for r in decontaminate(
            corpus, benchmark_ngrams(bench_docs, n=3), n=3
        ).collect()
    }
    hashed = {
        r.doc_id: (r.n_grams, r.n_contaminated)
        for r in decontaminate(
            corpus,
            benchmark_ngrams(bench_docs, n=3, hash_grams=True),
            n=3,
            hash_grams=True,
        ).collect()
    }
    assert plain == hashed
    assert plain[0][1] > 0 and plain[1][1] == 0


# ---------------------------------------------------------------------------
# content-defined chunking
# ---------------------------------------------------------------------------

from pyspark.sql import functions as F  # noqa: E402

from nexus_event_stream_spark.operators.quality import (  # noqa: E402
    cdc_chunks,
    cdc_dedup,
)


def _passage(seed: int, n: int = 160) -> str:
    # deterministic pseudo-random text with enough entropy for boundaries
    out = []
    x = seed
    for _ in range(n):
        x = (1103515245 * x + 12345) % (2**31)
        out.append(chr(97 + x % 26))
    return "".join(out)


def test_cdc_chunks_cover_text_and_are_content_defined(spark):
    p = _passage(3)
    df = spark.createDataFrame([(0, p)], "doc_id long, text string")
    chunks = df.select(cdc_chunks(F.col("text"), divisor=16, window=4).alias("c"))
    arr = chunks.collect()[0].c
    assert "".join(arr) == p  # chunks partition the text exactly
    assert len(arr) > 3  # divisor 16 → boundaries actually fire


def test_cdc_dedup_detects_shifted_duplicates(spark):
    # the same passage embedded at DIFFERENT offsets: fixed word
    # segments would miss it; content-defined chunks collide
    p = _passage(7, 300)
    docs = spark.createDataFrame(
        [
            (0, _passage(1, 40) + p),
            (1, _passage(2, 97) + p + _passage(4, 31)),
            (2, _passage(5, 280)),  # unrelated
        ],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r
        for r in cdc_dedup(docs, divisor=16, window=4).collect()
    }
    # doc1 shares the passage's interior chunks with doc0 (first wins)
    assert rows[1].dup_chunks > 0
    assert rows[1].dup_chars > 150  # most of the 300-char passage caught
    assert rows[0].dup_chunks == 0
    assert rows[2].dup_chunks == 0


def test_cdc_dedup_short_and_exact_copies(spark):
    docs = spark.createDataFrame(
        [(0, "tiny"), (1, _passage(9, 120)), (2, _passage(9, 120))],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in cdc_dedup(docs, divisor=16, window=4).collect()}
    assert rows[0].n_chunks == 1 and rows[0].dup_chunks == 0  # sub-window doc
    # exact copy: every chunk of doc2 duplicates doc1
    assert rows[2].dup_chunks == rows[2].n_chunks
    assert rows[2].dup_chars == 120


from hypothesis import HealthCheck as _HC  # noqa: E402
from hypothesis import given as _given, settings as _settings  # noqa: E402
from hypothesis import strategies as _st  # noqa: E402


@_settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[_HC.function_scoped_fixture],
)
@_given(
    texts=_st.lists(
        _st.text(
            alphabet=_st.characters(min_codepoint=32, max_codepoint=126),
            min_size=0,
            max_size=200,
        ),
        min_size=1,
        max_size=5,
    ),
    divisor=_st.sampled_from([8, 16, 64]),
    window=_st.sampled_from([2, 4, 8]),
)
def test_cdc_chunks_partition_exactly_any_text(spark, texts, divisor, window):
    # invariant: chunks always reassemble the exact input, for any
    # printable text (including empty and sub-window strings)
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rows = df.select(
        "doc_id", "text",
        cdc_chunks(F.col("text"), divisor=divisor, window=window).alias("c"),
    ).collect()
    for r in rows:
        assert "".join(r.c) == r.text


@_settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[_HC.function_scoped_fixture],
)
@_given(
    texts=_st.lists(
        _st.text(
            # full printable-BMP range: the bit-identity claim must hold
            # for multi-byte codepoints too (utf-32 codes ≫ 127 stress
            # the int64-wraparound equivalence argument)
            alphabet=_st.characters(
                min_codepoint=32, max_codepoint=0x2FFF,
                blacklist_categories=("Cs",),
            ),
            min_size=0,
            max_size=200,
        ),
        min_size=1,
        max_size=5,
    ),
    divisor=_st.sampled_from([8, 16, 64]),
    window=_st.sampled_from([2, 4, 8]),
)
def test_cdc_arrow_kernel_bit_identical(spark, texts, divisor, window):
    """The Arrow-migration pin (VERDICT r7 #5): the vectorized
    convolution kernel places EXACTLY the boundaries the Catalyst HOF
    fold places, for any printable text, divisor, and window."""
    from nexus_event_stream_spark.operators.quality import _cdc_chunks_py

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rows = df.select(
        "doc_id", "text",
        cdc_chunks(F.col("text"), divisor=divisor, window=window).alias("c"),
    ).collect()
    min_len = max(divisor // 4, 1)
    for r in rows:
        assert _cdc_chunks_py(r.text, divisor, window, min_len) == list(r.c)


def test_cdc_dedup_kernels_agree(spark):
    """cdc_dedup(kernel='arrow') is row-identical to the Catalyst path on
    the shifted-duplicate corpus (same chunks → same first-occurrence
    verdicts → same per-doc stats)."""
    base = "the quick brown fox jumps over the lazy dog " * 6
    docs = spark.createDataFrame(
        [
            (1, base + "unique tail one"),
            (2, "PREFIX SHIFTS EVERYTHING " + base + "tail two"),
            (3, "nothing in common with the others at all"),
            (4, None),
        ],
        "doc_id long, text string",
    )
    a = {
        r.doc_id: (r.n_chunks, r.dup_chunks, r.dup_chars)
        for r in cdc_dedup(docs, divisor=16, window=4).collect()
    }
    b = {
        r.doc_id: (r.n_chunks, r.dup_chunks, r.dup_chars)
        for r in cdc_dedup(docs, divisor=16, window=4, kernel="arrow").collect()
    }
    assert a == b and set(a) == {1, 2, 3, 4}


# ---------------------------------------------------------------------------
# production grain (VERDICT r6): GPT-3 appendix-C 13-grams, C4-style 50-word
# segments — the published parameters, not the sf0.01-tuned ones
# ---------------------------------------------------------------------------


def _w(lo, hi, tag="w"):
    return " ".join(f"{tag}{i}" for i in range(lo, hi))


def test_decontaminate_at_production_13gram_grain(spark):
    # benchmark: 30 words → 18 distinct 13-grams
    bench_text = _w(0, 30, "b")
    bench = benchmark_ngrams(_docs(spark, [bench_text]), n=13)
    assert bench.count() == 30 - 13 + 1
    corpus = _docs(
        spark,
        [
            _w(0, 120),                                    # clean
            _w(0, 40) + " " + _w(5, 18, "b") + " " + _w(40, 80),   # exactly 13 bench words → 1 gram
            _w(0, 30) + " " + _w(3, 23, "b") + " " + _w(30, 60),   # 20 bench words → 8 grams
            _w(0, 50) + " " + _w(0, 12, "b") + " " + _w(50, 90),   # 12 < grain → 0
        ],
    )
    rows = {r.doc_id: r for r in decontaminate(corpus, bench, n=13).collect()}
    assert rows[0].n_contaminated == 0
    assert rows[1].n_contaminated == 1
    assert rows[2].n_contaminated == 20 - 13 + 1
    assert rows[3].n_contaminated == 0
    # hashed-gram variant must agree exactly (the production broadcast form)
    bench_h = benchmark_ngrams(_docs(spark, [bench_text]), n=13, hash_grams=True)
    rows_h = {
        r.doc_id: r
        for r in decontaminate(corpus, bench_h, n=13, hash_grams=True).collect()
    }
    assert all(
        rows[d].n_contaminated == rows_h[d].n_contaminated for d in rows
    )


def test_segment_dedup_at_production_50word_grain(spark):
    shared = _w(0, 50, "s")  # one full 50-word segment
    docs = _docs(
        spark,
        [
            shared + " " + _w(0, 50),            # doc0: owns first occurrence
            shared + " " + _w(100, 150),         # doc1: aligned copy → dup
            _w(200, 250) + " " + shared,         # doc2: aligned at segment 2 → dup
            "pre " + shared + " " + _w(300, 348),  # doc3: shifted 1 word → word-aligned rule MISSES (cdc_dedup is the shift-robust tier)
        ],
    )
    rows = {r.doc_id: r for r in segment_dedup(docs, n=50).collect()}
    assert rows[0].n_segments == 2 and rows[0].dup_segments == 0
    assert rows[1].n_segments == 2 and rows[1].dup_segments == 1
    assert rows[1].clean_n_words == 50
    assert rows[2].n_segments == 2 and rows[2].dup_segments == 1
    assert rows[2].clean_n_words == 50
    assert rows[3].dup_segments == 0  # the documented alignment miss
    # reassembled text drops exactly the duplicated segment
    clean = {
        r.doc_id: r.clean_text
        for r in segment_dedup(docs, n=50, emit_text=True).collect()
    }
    assert clean[1] == _w(100, 150)
    assert clean[2] == _w(200, 250)


def test_pipeline_at_production_grain(spark):
    """The composed recipe at published parameters: 13-gram
    decontamination + 50-word passage dedup over a corpus with planted
    contamination and passage copies — exact expected survivors."""
    from nexus_event_stream_spark.pipeline import (
        CorpusRecipe,
        prepare_training_corpus,
    )

    filler = {i: _w(1000 * i, 1000 * i + 120) for i in range(5)}
    bench_text = _w(0, 40, "b")
    shared50 = _w(0, 50, "s")
    docs = _docs(
        spark,
        [
            filler[0],                                     # 0: clean, survives intact
            filler[1] + " " + _w(10, 26, "b"),             # 1: 16 bench words ≥ 13-grain → dropped
            shared50 + " " + filler[2],                    # 2: owns the shared passage
            shared50 + " " + filler[3],                    # 3: aligned copy → passage stripped, doc survives
            filler[4] + " " + _w(0, 12, "b"),              # 4: 12 bench words < grain → survives
        ],
    )
    bench = _docs(spark, [bench_text])
    recipe = CorpusRecipe(
        quality=False,
        redact_pii=False,
        exact_dedup=False,
        near_dedup=False,
        benchmark=bench,
        decontaminate_n=13,
        passage_dedup_n=50,
    )
    corpus, _ = prepare_training_corpus(docs, recipe)
    out = {r.doc_id: r.text for r in corpus.collect()}
    assert set(out) == {0, 2, 3, 4}        # doc1 decontaminated away
    assert out[0] == filler[0]
    assert out[2] == shared50 + " " + filler[2]   # first occurrence keeps passage
    assert out[3] == filler[3]                    # copy loses exactly the passage
    assert out[4] == filler[4] + " " + _w(0, 12, "b")


# ---------------------------------------------------------------------------
# cross-document boilerplate line removal (RefinedWeb's line tier)
# ---------------------------------------------------------------------------


def _py_norm_line(s: str) -> str:
    import re

    return re.sub(r"\s+", " ", s.strip()).lower()


def test_boilerplate_lines_and_strip_match_oracle(spark):
    from nexus_event_stream_spark.operators.quality import (
        boilerplate_lines,
        strip_boilerplate_lines,
    )

    nav = "Home | About | Contact"
    cookie = "  We use  COOKIES to improve your experience  "
    docs = []
    for i in range(20):
        body = [nav, f"unique prose line number {i} about rivers",
                f"second unique line {i}"]
        if i % 2 == 0:
            body.insert(1, cookie)
        if i == 7:
            body.append("home | about |  contact")  # normalizes to nav
        docs.append((i, "\n".join(body)))
    docs.append((100, nav))            # all-boilerplate doc
    docs.append((101, None))           # NULL text
    df = spark.createDataFrame(docs, "doc_id long, text string")

    boiler = boilerplate_lines(df, min_doc_frac=0.3, min_docs=5)
    got_lines = sorted(r.line for r in boiler.collect())
    # oracle: distinct-doc counts over normalized lines, floor = max(5, .3*22)=6
    from collections import Counter

    cnt = Counter()
    for _i, t in docs:
        for ln in sorted({_py_norm_line(x) for x in (t or "").split("\n")}):
            if len(ln) >= 4:
                cnt[ln] += 1
    want_lines = sorted(l for l, c in cnt.items() if c >= max(5, int(0.3 * len(docs))))
    assert got_lines == want_lines
    assert _py_norm_line(nav) in got_lines and _py_norm_line(cookie) in got_lines
    # explicit-id form (the r10 review nit): identical mined set, and
    # reproducible across partitionings by construction
    boiler_id = boilerplate_lines(
        df.repartition(7), min_doc_frac=0.3, min_docs=5, id_col="doc_id"
    )
    assert sorted(r.line for r in boiler_id.collect()) == want_lines

    out = {r.doc_id: r.text for r in strip_boilerplate_lines(df, boiler).collect()}
    assert len(out) == len(docs)  # every row preserved, incl. all-boiler + NULL
    for i, t in docs:
        if t is None:
            assert out[i] == ""
            continue
        want = "\n".join(
            x for x in t.split("\n") if _py_norm_line(x) not in want_lines
        )
        assert out[i] == want, i
    assert out[100] == ""  # all-boilerplate doc came back empty, not dropped
    # kept lines keep their EXACT original text (case/spacing untouched)
    assert "unique prose line number 3 about rivers" in out[3]
    # partition independence
    out7 = {
        r.doc_id: r.text
        for r in strip_boilerplate_lines(df.repartition(7), boiler).collect()
    }
    assert out7 == out


def test_boilerplate_stage_in_recipe(spark):
    from nexus_event_stream_spark.pipeline import (
        CorpusRecipe,
        prepare_training_corpus,
    )

    nav = "Home | About | Contact"
    prose = (
        "a perfectly reasonable paragraph about distributed stream "
        "processing engines and their checkpoint semantics today"
    )
    docs = spark.createDataFrame(
        [(i, nav + "\n" + prose + f" variant {i}") for i in range(30)],
        "doc_id long, text string",
    )
    corpus, stages = prepare_training_corpus(
        docs,
        CorpusRecipe(
            boilerplate_line_frac=0.2, near_dedup=False, exact_dedup=False
        ),
    )
    assert "boilerplate_lines" in stages
    assert list(stages)[0] == "boilerplate_lines"
    texts = [r.text for r in corpus.collect()]
    assert texts and all(nav not in t for t in texts)
    assert all("reasonable paragraph" in t for t in texts)


# ---------------------------------------------------------------------------
# Gopher repetition-removal suite (Rae et al. 2021 Table A1)
# ---------------------------------------------------------------------------

from nexus_event_stream_spark.operators.quality import (  # noqa: E402
    REPETITION_THRESHOLDS,
    repetition_signals,
)


def _ref_repetition(text):
    """Pure-Python oracle mirroring the repo's conventions exactly:
    single-space tokenization, space-only trim on line/para units."""
    toks = text.split(" ")
    out = {"rep_word_chars": sum(len(t) for t in toks)}
    for kind, sep in (("line", "\n"), ("para", "\n\n")):
        units = [u.strip(" ") for u in text.split(sep)]
        units = [u for u in units if u != ""]
        c = Counter(units)
        out[f"n_{kind}s"] = len(units)
        out[f"{kind}_chars"] = sum(len(u) for u in units)
        out[f"dup_{kind}_n"] = len(units) - len(c)
        out[f"dup_{kind}_chars"] = sum(
            (cnt - 1) * len(u) for u, cnt in c.items()
        )
    for n in (2, 3, 4):
        grams = [
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        ]
        c = Counter(grams)
        if c:
            # Rae et al. A1: the MODE gram by count wins; ties break
            # toward the larger char coverage.
            cmax = max(c.values())
            out[f"top_{n}gram_chars"] = max(
                cmax * (len(g) - (n - 1))
                for g, cnt in c.items()
                if cnt == cmax
            )
        else:
            out[f"top_{n}gram_chars"] = 0
    for n in range(5, 11):
        grams = [
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        ]
        cnt = Counter(grams)
        covered = set()
        for i, g in enumerate(grams):
            if cnt[g] > 1:
                covered.update(range(i, i + n))
        out[f"dup_{n}gram_chars"] = sum(len(toks[p]) for p in covered)
    return out


def test_repetition_signals_closed_form(spark):
    df = repetition_signals(
        _docs(
            spark,
            [
                "x y x y x y z",          # top-2gram "x y" x3 covers 6/7 chars
                "a b c d e a b c d e",    # dup 5-gram covers ALL 10 positions
                "l1\nl1\nl2\n\np2\n\np2",  # line + para duplicates
                # full cascade depth: a repeated 10-token block keeps
                # every dup_{5..10} tier nonzero (gates must not clip)
                " ".join([f"t{i}" for i in range(10)] * 2),
            ],
        )
    )
    rows = {r.doc_id: r for r in df.collect()}
    r0 = rows[0]
    assert (r0.rep_word_chars, r0.top_2gram_chars) == (7, 6)
    assert r0.top_2gram_char_frac == pytest.approx(6 / 7)
    assert r0.dup_5gram_chars == 0
    assert r0.repetition_pass == 0  # 86% > the 20% top-2gram cap
    r1 = rows[1]
    assert (r1.rep_word_chars, r1.dup_5gram_chars) == (10, 10)
    assert r1.dup_5gram_char_frac == pytest.approx(1.0)
    assert r1.repetition_pass == 0
    r2 = rows[2]
    assert (r2.n_lines, r2.dup_line_n, r2.line_chars, r2.dup_line_chars) == (
        5, 2, 10, 4,
    )
    assert (r2.n_paras, r2.dup_para_n, r2.para_chars, r2.dup_para_chars) == (
        3, 1, 12, 2,
    )
    assert r2.dup_line_frac == pytest.approx(2 / 5)
    assert r2.dup_para_char_frac == pytest.approx(2 / 12)
    r3 = rows[3]
    assert r3.rep_word_chars == 40
    for n in range(5, 11):  # every covered position counted once
        assert getattr(r3, f"dup_{n}gram_chars") == 40, n
    assert r3.dup_10gram_char_frac == pytest.approx(1.0)


def test_repetition_pass_and_empty_doc(spark):
    # long enough that no single unique n-gram exceeds the char caps
    clean = " ".join(f"w{i:03d}" for i in range(80))
    rows = {
        r.doc_id: r
        for r in repetition_signals(_docs(spark, [clean, ""])).collect()
    }
    assert rows[0].repetition_pass == 1
    r = rows[1]  # empty doc: every signal 0, passes vacuously
    assert r.rep_word_chars == 0 and r.n_lines == 0 and r.n_paras == 0
    assert r.dup_line_frac == 0.0 and r.top_2gram_char_frac == 0.0
    assert r.repetition_pass == 1
    # custom thresholds flow through
    strict = dict(REPETITION_THRESHOLDS, max_top_2gram_char_frac_pct=0)
    rows = repetition_signals(
        _docs(spark, ["a b c"]), thresholds=strict
    ).collect()
    assert rows[0].repetition_pass == 0  # any repeated?? no - top covers >0


_rep_units = st.lists(
    st.sampled_from(["aa b", "c dd e", "aa b", "ff", "g hh aa b c"]),
    min_size=0,
    max_size=8,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.tuples(
            _rep_units,
            st.lists(
                st.sampled_from([" ", "\n", "\n\n", " \n "]),
                min_size=7,
                max_size=7,
            ),
        ),
        min_size=1,
        max_size=5,
    ),
    engine=st.sampled_from(["arrow", "catalyst"]),
)
def test_repetition_signals_match_python_reference(spark, docs, engine):
    texts = [
        "".join(
            u + (seps[i] if i < len(units) - 1 else "")
            for i, u in enumerate(units)
        )
        for units, seps in docs
    ]
    rows = {
        r.doc_id: r
        for r in repetition_signals(
            _docs(spark, texts), engine=engine
        ).collect()
    }
    for doc_id, text in enumerate(texts):
        ref = _ref_repetition(text)
        r = rows[doc_id]
        for k, v in ref.items():
            assert getattr(r, k) == v, (k, text, engine)


def test_repetition_engines_identical_including_null(spark):
    """arrow (default kernel) ≡ catalyst (the zero-Python spec): same
    schema, same values — integer signals, IEEE-double fracs, pass —
    including NULL text (≡ empty: vacuous pass) and the full-cascade
    doc."""
    texts = [
        None,
        "",
        "x y x y x y z",
        "l1\nl1\nl2\n\np2\n\np2",
        " ".join([f"t{i}" for i in range(10)] * 2),
        "buy now " * 40,
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    a = {r.doc_id: r.asDict() for r in repetition_signals(df, engine="arrow").collect()}
    c = {r.doc_id: r.asDict() for r in repetition_signals(df, engine="catalyst").collect()}
    assert repetition_signals(df, engine="arrow").columns == repetition_signals(df, engine="catalyst").columns
    assert a == c
    assert a[0]["repetition_pass"] == 1 and a[0]["n_lines"] == 0  # NULL ≡ empty
    with pytest.raises(ValueError, match="engine"):
        repetition_signals(df, engine="pandas")


def test_repetition_signals_zero_exchange(spark):
    # catalyst spec: zero Exchange AND zero Python
    df = repetition_signals(_docs(spark, ["a b\nc"]), engine="catalyst")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan
    # arrow kernel: still map-side only (one Python stage, no shuffle)
    plan_a = (
        repetition_signals(_docs(spark, ["a b\nc"]))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan_a


def test_repetition_stage_in_recipe(spark):
    from nexus_event_stream_spark.pipeline import (
        CorpusRecipe,
        prepare_training_corpus,
    )

    looping = "buy now " * 40  # top-2gram coverage ~100%
    clean = " ".join(f"w{i:03d}" for i in range(80))
    docs = spark.createDataFrame(
        [(0, looping.strip()), (1, clean)], "doc_id long, text string"
    )
    corpus, stages = prepare_training_corpus(
        docs,
        CorpusRecipe(
            repetition=True,
            quality=False,
            redact_pii=False,
            exact_dedup=False,
            near_dedup=False,
        ),
    )
    assert "repetition" in stages
    ids = [r.doc_id for r in corpus.collect()]
    assert ids == [1]


# ---------------------------------------------------------------------------
# Luhn-validated payment-card redaction (opt-in, r11)
# ---------------------------------------------------------------------------


def test_cc_redaction_luhn_gated(spark):
    from nexus_event_stream_spark.operators.quality import pii_redact as pr

    valid_sp = "4111 1111 1111 1111"        # Visa test PAN, Luhn-valid
    valid_ds = "5500-0000-0000-0004"        # Mastercard test PAN
    invalid = "4111 1111 1111 1112"          # fails Luhn: NOT redacted
    rows = {
        r.doc_id: r
        for r in pr(
            _docs(
                spark,
                [
                    f"pay with {valid_sp} or {valid_ds} thanks",
                    f"order id {invalid} is just an order id",
                    f"twice {valid_sp} and again {valid_sp}",
                    "short 1234 5678 9012 number",  # 12 digits: out of range
                ],
            ),
            patterns=("email", "ipv4", "phone", "cc"),
        ).collect()
    }
    r0 = rows[0]
    assert r0.n_cc == 2
    assert valid_sp not in r0.redacted and valid_ds not in r0.redacted
    assert r0.redacted.count("<CC>") == 2
    r1 = rows[1]
    assert r1.n_cc == 0 and invalid in r1.redacted
    r2 = rows[2]
    assert r2.n_cc == 2 and r2.redacted.count("<CC>") == 2
    r3 = rows[3]
    assert r3.n_cc == 0 and "1234 5678 9012" in r3.redacted

    # default pattern set: schema unchanged, no n_cc column
    base = pr(_docs(spark, ["x"]))
    assert "n_cc" not in base.columns

    with pytest.raises(ValueError, match="unknown PII pattern"):
        pr(_docs(spark, ["x"]), patterns=("email", "ssn"))

    # zero shuffle / zero Python with the Luhn fold in the plan
    plan = (
        pr(_docs(spark, ["x"]), patterns=("cc",))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Python" not in plan


def test_repetition_composes_with_structured_streaming(spark, tmp_path):
    # repetition_signals is a pure projection (HOF folds, no agg), so
    # the SAME operator gates a stream — ingest-time Gopher repetition
    # removal with no state store and no watermark.
    src = str(tmp_path / "rep_src")
    spark.createDataFrame(
        [
            (0, " ".join(f"w{i}" for i in range(60))),  # clean
            (1, "buy now " * 40),                        # generation loop
        ],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = (
        repetition_signals(stream)
        .filter("repetition_pass = 1")
        .select("doc_id")
        .writeStream.format("memory")
        .queryName("q_repetition_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = [r.doc_id for r in spark.sql("select * from q_repetition_stream").collect()]
    assert got == [0]


def test_top_ngram_is_mode_by_count_not_max_coverage(spark):
    """Rae et al. A1 takes the MOST FREQUENT n-gram's coverage; a rarer
    but longer gram must NOT outrank the mode (r11 advice). Both engines.
    """
    # "x y"×3 (coverage 6) is the mode; "aaaaaaaa bbbbbbbb"×2 has
    # coverage 32 and would win under a max-of-count×chars definition.
    text = "x y x y x y aaaaaaaa bbbbbbbb aaaaaaaa bbbbbbbb"
    for engine in ("arrow", "catalyst"):
        r = repetition_signals(_docs(spark, [text]), engine=engine).collect()[0]
        assert r.top_2gram_chars == 6, engine
    ref = _ref_repetition(text)
    assert ref["top_2gram_chars"] == 6


def test_repetition_thresholds_partial_dict_merges(spark):
    """A partial thresholds dict OVERRIDES the defaults (recipe 'override'
    semantics) instead of replacing them with a KeyError bomb; unknown
    keys fail fast (r11 advice)."""
    rows = repetition_signals(
        _docs(spark, ["a b c d e f g h"]),
        thresholds={"max_top_2gram_char_frac_pct": 0},
    ).collect()
    assert rows[0].repetition_pass == 0  # the override applied
    rows = repetition_signals(
        _docs(spark, ["a b c d e f g h"]),
        thresholds={"max_top_2gram_char_frac_pct": 0},
        engine="catalyst",
    ).collect()
    assert rows[0].repetition_pass == 0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown repetition thresholds"):
        repetition_signals(
            _docs(spark, ["a b"]), thresholds={"max_typo_frac_pct": 1}
        )


def test_quality_signals_per_language_stopwords(spark):
    """n_stopwords routes on the lang column with a CASE chain: each doc
    counted against ITS OWN function-word list; NULL / unlisted lang fall
    back to the English default; the English path is value-identical to
    the historical default (r11 verdict item 2)."""
    from nexus_event_stream_spark.operators.quality import (
        STOPWORD_TABLES,
        quality_signals,
    )

    de = "der hund und die katze in berlin"
    df = spark.createDataFrame(
        [
            (0, "the cat sat on the mat", "en"),
            (1, de, "de"),
            (2, de, None),
            (3, de, "xx"),
        ],
        "doc_id long, text string, lang string",
    )
    routed = {
        r.doc_id: r.n_stopwords
        for r in quality_signals(df, stopwords=STOPWORD_TABLES).collect()
    }
    # en doc against en list: 'the' x2 — identical to the default path
    assert routed[0] == 2
    default = {
        r.doc_id: r.n_stopwords for r in quality_signals(df).collect()
    }
    assert default[0] == routed[0]
    # de doc against its OWN list: der, und, die, in
    assert routed[1] == 4
    # against the English default the same text scores only 'in'
    assert default[1] == 1
    # NULL lang and unlisted lang fall back to the English default
    assert routed[2] == 1 and routed[3] == 1
    # a plain tuple applies one list to every doc
    flat = {
        r.doc_id: r.n_stopwords
        for r in quality_signals(df, stopwords=("hund",)).collect()
    }
    assert flat[1] == 1 and flat[0] == 0
    # routing stays a pure projection — zero Exchange
    plan = (
        quality_signals(df, stopwords=STOPWORD_TABLES)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_quality_lang_col_validated_up_front(spark):
    """r12 advisory: with a routed stopwords dict, a missing/misnamed
    lang_col must fail at plan-build time with a clear message on BOTH
    engines — not as an opaque executor-side KeyError in the Arrow
    kernel mid-job."""
    from nexus_event_stream_spark.operators.quality import (
        STOPWORD_TABLES,
        quality_signals,
    )

    df = spark.createDataFrame(
        [(0, "the cat sat")], "doc_id long, text string"
    )
    for engine in ("arrow", "catalyst"):
        with pytest.raises(ValueError, match="lang_col 'lang'"):
            quality_signals(df, stopwords=STOPWORD_TABLES, engine=engine)
    # non-dict stopwords never require the column
    quality_signals(df, stopwords=("the",)).collect()


def test_quality_min_stopwords_floor(spark):
    """The Gopher stop-word floor: vacuous at the default 0 (historical
    pass flags unchanged), bites when raised."""
    from nexus_event_stream_spark.operators.quality import (
        QUALITY_THRESHOLDS,
        quality_signals,
    )

    df = _docs(spark, ["alpha beta gamma delta epsilon zeta"])  # 0 stopwords
    assert quality_signals(df).collect()[0].quality_pass == 1
    strict = dict(QUALITY_THRESHOLDS, min_stopwords=2)
    assert (
        quality_signals(df, thresholds=strict).collect()[0].quality_pass == 0
    )


def test_quality_signals_engines_value_identical(spark):
    """Arrow kernel ≡ Catalyst spec, including the NULL-text pattern and
    all three stopword modes (the repetition_signals dual-engine pin)."""
    import random

    from nexus_event_stream_spark.operators.quality import (
        STOPWORD_TABLES,
        quality_signals,
    )

    rng = random.Random(23)
    vocab = ["the", "cat", "a", "und", "der", "x", "1", "Zt", "", " "]
    rows = [(0, None, "de"), (1, "", None), (2, "  ", "xx")]
    for i in range(3, 40):
        words = " ".join(
            rng.choice(vocab) for _ in range(rng.randrange(0, 30))
        )
        rows.append((i, words, rng.choice(["en", "de", None, "zz"])))
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    for sw in (None, ("cat", "und"), STOPWORD_TABLES):
        a = {
            r["doc_id"]: r.asDict()
            for r in quality_signals(df, stopwords=sw, engine="arrow").collect()
        }
        c = {
            r["doc_id"]: r.asDict()
            for r in quality_signals(
                df, stopwords=sw, engine="catalyst"
            ).collect()
        }
        assert a == c, next(
            (k, {x: (a[k][x], c[k][x]) for x in a[k] if a[k][x] != c[k][x]})
            for k in a
            if a[k] != c[k]
        )
    with pytest.raises(ValueError, match="engine"):
        quality_signals(df, engine="nope")


def test_quality_thresholds_partial_dict_merges(spark):
    """r12 self-review: a partial quality thresholds dict overrides the
    defaults (the repetition_signals convention) on BOTH engines instead
    of KeyErroring in the executor kernel; unknown keys fail fast."""
    from nexus_event_stream_spark.operators.quality import quality_signals

    df = _docs(spark, ["the cat sat on the mat quite happily today ok"])
    for engine in ("arrow", "catalyst"):
        r = quality_signals(
            df, thresholds={"min_words": 50}, engine=engine
        ).collect()[0]
        assert r.quality_pass == 0, engine  # the override applied
    with pytest.raises(ValueError, match="unknown quality thresholds"):
        quality_signals(df, thresholds={"min_wordz": 1})
