"""Reference-corpus Bloom dedup (operators/bloom_dedup.py, Dolma tier).

Deterministic by construction: xxhash64 is a fixed function, so a given
(reference, probe) string set always produces the same hit set — the
planted-membership assertions below are exact, not probabilistic.
"""

from __future__ import annotations

from nexus_event_stream_spark.operators.bloom_dedup import (
    bloom_dedup_documents,
    bloom_dedup_paragraphs,
    reference_corpus_bloom,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


REF_TEXTS = [f"reference document number {i} with stable content" for i in range(50)]
REF_PARAS = [f"already trained paragraph {i} stays out" for i in range(30)]


def test_document_grain_drops_exact_recrawls(spark):
    ref = _df(spark, list(enumerate(REF_TEXTS)))
    bf = reference_corpus_bloom(ref, fpr=1e-6)
    incoming = _df(
        spark,
        [(100 + i, REF_TEXTS[i]) for i in range(10)]  # re-crawls
        + [(200 + i, f"genuinely novel page {i}") for i in range(20)]
        + [(300, None)],  # NULL text: no dup evidence, passes through
    )
    kept = sorted(
        r.doc_id for r in bloom_dedup_documents(incoming, bf).collect()
    )
    assert kept == sorted(list(range(200, 220)) + [300])


def test_document_grain_no_false_negatives_any_partitioning(spark):
    ref = _df(spark, list(enumerate(REF_TEXTS)))
    bf = reference_corpus_bloom(ref, fpr=1e-4)
    incoming = _df(spark, [(i, t) for i, t in enumerate(REF_TEXTS)])
    assert bloom_dedup_documents(incoming.repartition(7), bf).count() == 0


def test_paragraph_grain_strips_only_reference_units(spark):
    ref = _df(spark, list(enumerate("\n\n".join(REF_PARAS[i : i + 3]) for i in range(0, 30, 3))))
    bf = reference_corpus_bloom(ref, grain="paragraph", fpr=1e-6)
    fresh = ["a brand new paragraph about spark", "another fresh one"]
    mixed = f"{fresh[0]}\n\n{REF_PARAS[4]}\n\n{fresh[1]}\n\n{REF_PARAS[17]}"
    untouched = "solo novel paragraph\n\n\n  oddly   spaced novel one  "
    all_dup = f"{REF_PARAS[0]}\n\n{REF_PARAS[1]}"
    rows = {
        r.doc_id: r
        for r in bloom_dedup_paragraphs(
            _df(spark, [(0, mixed), (1, untouched), (2, all_dup), (3, None)]),
            bf,
        ).collect()
    }
    assert rows[0].text == "\n\n".join(fresh)  # order preserved
    assert (rows[0].n_paras, rows[0].dup_paras) == (4, 2)
    # zero hits -> byte-exact original, separator quirks intact
    assert rows[1].text == untouched and rows[1].dup_paras == 0
    # all-duplicate document: row PRESERVED with empty text
    assert rows[2].text == "" and (rows[2].n_paras, rows[2].dup_paras) == (2, 2)
    assert rows[3].text is None and (rows[3].n_paras, rows[3].dup_paras) == (0, 0)


def test_probe_plans_are_map_side_only(spark):
    ref = _df(spark, list(enumerate(REF_TEXTS)))
    bf = reference_corpus_bloom(ref, fpr=1e-4)
    incoming = _df(spark, [(0, "x")])
    for probe in (
        bloom_dedup_documents(incoming, bf),
        bloom_dedup_paragraphs(incoming, bf),
    ):
        plan = probe._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "Python" not in plan

    # sizing honesty: the auto-sized filter meets the requested FPR
    assert bf.fpr_estimate(len(REF_TEXTS)) <= 1e-4


def test_reference_dedup_stage_in_recipe(spark):
    from nexus_event_stream_spark.pipeline import (
        CorpusRecipe,
        prepare_training_corpus,
    )

    ref = _df(spark, list(enumerate(REF_TEXTS)))
    bf = reference_corpus_bloom(ref, fpr=1e-6)
    docs = _df(
        spark,
        [(0, REF_TEXTS[7]), (1, "a genuinely new training document")],
    )
    corpus, stages = prepare_training_corpus(
        docs,
        CorpusRecipe(
            reference_bloom=bf,
            quality=False,
            redact_pii=False,
            exact_dedup=False,
            near_dedup=False,
        ),
    )
    assert "reference_dedup" in stages
    assert [r.doc_id for r in corpus.collect()] == [1]


def test_join_probe_identical_to_expression_probe(spark):
    """The broadcast word-table path (the past-MAX_EXPR_WORDS shape) is
    result-IDENTICAL to the inline-literal path: same kept rows (document
    grain), same counts + rebuilt text byte-for-byte (paragraph grain),
    including the byte-exact zero-hit, all-dup-empty and NULL-text
    contracts."""
    from nexus_event_stream_spark.operators.bloom_dedup import (
        bloom_dedup_paragraphs_join,
    )

    ref = _df(spark, list(enumerate("\n\n".join(REF_PARAS[i : i + 3]) for i in range(0, 30, 3))))
    bf = reference_corpus_bloom(ref, grain="paragraph", fpr=1e-6)
    fresh = ["a brand new paragraph about spark", "another fresh one"]
    incoming = _df(
        spark,
        [
            (0, f"{fresh[0]}\n\n{REF_PARAS[4]}\n\n{fresh[1]}\n\n{REF_PARAS[17]}"),
            (1, "solo novel paragraph\n\n\n  oddly   spaced novel one  "),
            (2, f"{REF_PARAS[0]}\n\n{REF_PARAS[1]}"),
            (3, None),
        ],
    )
    via_expr = {
        r.doc_id: (r.text, r.n_paras, r.dup_paras)
        for r in bloom_dedup_paragraphs(incoming, bf).collect()
    }
    via_join = {
        r.doc_id: (r.text, r.n_paras, r.dup_paras)
        for r in bloom_dedup_paragraphs_join(incoming, bf).collect()
    }
    assert via_join == via_expr

    # document grain: the join path drops exactly the same rows
    bfd = reference_corpus_bloom(_df(spark, list(enumerate(REF_TEXTS))), fpr=1e-6)
    docs = _df(
        spark,
        [(100, REF_TEXTS[3]), (101, "novel page"), (102, None)],
    )
    from nexus_event_stream_spark.operators.bloom_dedup import _hit_flag_join
    from pyspark.sql import functions as F

    joined_kept = sorted(
        r.doc_id
        for r in _hit_flag_join(docs, F.col("text"), bfd)
        .where(~F.col("__bf_hit"))
        .collect()
    )
    expr_kept = sorted(
        r.doc_id for r in bloom_dedup_documents(docs, bfd).collect()
    )
    assert joined_kept == expr_kept == [101, 102]


def test_join_probe_null_id_rows_pass_through_byte_exact(spark):
    """NULL-id rows never match the join-back (null-unsafe equality) —
    they must come back with text BYTE-EXACT and zero counts, not have
    a NULL `when` condition silently null out the text (r11 advice)."""
    from nexus_event_stream_spark.operators.bloom_dedup import (
        bloom_dedup_paragraphs_join,
    )

    ref = _df(spark, [(0, REF_PARAS[0])])
    bf = reference_corpus_bloom(ref, grain="paragraph", fpr=1e-6)
    dirty = f"{REF_PARAS[0]}\n\nkept paragraph"
    rows = {
        r.doc_id: (r.text, r.n_paras, r.dup_paras)
        for r in bloom_dedup_paragraphs_join(
            spark.createDataFrame(
                [(None, dirty), (7, dirty)], "doc_id long, text string"
            ),
            bf,
        ).collect()
    }
    # keyed row is probed and stripped; NULL-id row passes byte-exact
    assert rows[7] == ("kept paragraph", 2, 1)
    assert rows[None] == (dirty, 0, 0)


def test_pipeline_forwards_id_col_to_paragraph_join_path(spark, monkeypatch):
    """The recipe stage must forward its id_col to bloom_dedup_paragraphs:
    past MAX_EXPR_WORDS the join path groups on it, and a corpus keyed
    `id` (no `doc_id` column) would AnalysisException (r11 advice)."""
    import nexus_event_stream_spark.operators.bloom_dedup as bd
    from nexus_event_stream_spark.pipeline import (
        CorpusRecipe,
        prepare_training_corpus,
    )

    monkeypatch.setattr(bd, "MAX_EXPR_WORDS", 0)  # force the join path
    ref = _df(spark, [(0, REF_PARAS[0])])
    bf = reference_corpus_bloom(ref, grain="paragraph", fpr=1e-6)
    docs = spark.createDataFrame(
        [(10, f"{REF_PARAS[0]}\n\nnovel body")], "id long, text string"
    )
    corpus, stages = prepare_training_corpus(
        docs,
        CorpusRecipe(
            reference_bloom=bf,
            reference_bloom_grain="paragraph",
            quality=False,
            redact_pii=False,
            exact_dedup=False,
            near_dedup=False,
        ),
        id_col="id",
    )
    assert "reference_dedup" in stages
    assert [(r.id, r.text) for r in corpus.collect()] == [(10, "novel body")]


# ---------------------------------------------------------------------------
# corpus-wide batch paragraph dedup (r13 — the q_dedup_paragraphs operator)
# ---------------------------------------------------------------------------


def test_dedup_paragraphs_matches_first_occurrence_oracle(spark):
    """Batch corpus-wide paragraph dedup equals the same pure-Python
    first-occurrence oracle the streaming tier is pinned against —
    cross-doc, within-doc, all-dup, zero-hit (byte-exact) and NULL
    shapes in one corpus."""
    from nexus_event_stream_spark.operators.bloom_dedup import (
        dedup_paragraphs,
    )

    P = [f"batch paragraph number {i} about dedup grains" for i in range(6)]
    quirky = f"{P[0]}\n\n\n  {P[1]}  "  # odd separators, zero-hit doc 0
    rows = [
        (0, quirky),
        (1, f"{P[2]}\n\n{P[3]}"),
        (2, f"{P[0]}\n\n{P[4]}"),          # cross-doc dup of P[0]
        (3, f"{P[5]}\n\n{P[5]}"),          # within-doc dup
        (4, f"{P[2]}\n\n{P[4]}"),          # ALL dups -> ''
        (5, None),
    ]

    # pure-Python corpus-wide first-occurrence oracle (doc id, pos order)
    seen: set[str] = set()
    want = {}
    for did, text in rows:
        if text is None:
            want[did] = (0, 0, None)
            continue
        units = [u.strip(" ") for u in text.split("\n\n")]
        units = [u for u in units if u != ""]
        kept, dup = [], 0
        for u in units:
            if u in seen:
                dup += 1
            else:
                seen.add(u)
                kept.append(u)
        want[did] = (
            len(units), dup, text if dup == 0 else "\n\n".join(kept)
        )

    out = dedup_paragraphs(_df(spark, rows))
    got = {r.doc_id: (r.n_paras, r.dup_paras, r.text) for r in out.collect()}
    assert got == want
    assert got[0] == (2, 0, quirky)  # byte-exact zero-hit contract
    assert got[4] == (2, 2, "")
    assert got[5] == (0, 0, None)


def test_dedup_paragraphs_plan_one_window_shuffle(spark):
    """One md5-uniform window shuffle + one keyed rebuild + the join
    back — and no cartesian/SMJ anywhere."""
    from nexus_event_stream_spark.operators.bloom_dedup import (
        dedup_paragraphs,
    )

    df = _df(spark, [(0, "a\n\nb"), (1, "b\n\nc")])
    plan = (
        dedup_paragraphs(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "Window" in plan
