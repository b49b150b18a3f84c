"""Overlapping chunking (operators/chunking.py) vs a Python oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nexus_event_stream_spark.io import load_table
from nexus_event_stream_spark.operators.chunking import chunk_documents

SF_DIR = "/root/testdata/sf0.001"


def oracle_chunks(text, size, overlap):
    words = [w for w in (text or "").split() if w]
    n = len(words)
    if n == 0:
        return []
    stride = size - overlap
    if n <= size:
        starts = [0]
    else:
        import math

        k = 1 + math.ceil((n - size) / stride)
        starts = [min(i * stride, n - size) for i in range(k)]
    return [
        (i, " ".join(words[s : s + size]), min(size, n - s), s)
        for i, s in enumerate(starts)
    ]


def test_matches_oracle_on_real_docs(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    size, overlap = 20, 5
    got: dict[int, list] = {}
    for r in chunk_documents(docs, size=size, overlap=overlap).collect():
        got.setdefault(int(r.doc_id), []).append(
            (int(r.chunk_idx), r.chunk_text, int(r.n_words), int(r.word_start))
        )
    for d in got:
        got[d].sort()
    want = {
        int(r.doc_id): oracle_chunks(r.text, size, overlap)
        for r in docs.collect()
    }
    want = {d: c for d, c in want.items() if c}
    assert got == want


def test_contract_properties(spark):
    text = " ".join(f"w{i}" for i in range(53))
    df = spark.createDataFrame(
        [(1, text), (2, "short doc"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    rows = sorted(
        chunk_documents(df, size=20, overlap=5).collect(),
        key=lambda r: (r.doc_id, r.chunk_idx),
    )
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(int(r.doc_id), []).append(r)
    # empty/NULL docs → zero chunks
    assert set(by_doc) == {1, 2}
    # short doc → exactly one chunk, itself
    assert len(by_doc[2]) == 1 and by_doc[2][0].chunk_text == "short doc"
    # 53 words, size 20, stride 15 → starts 0,15,30,33 (last flush)
    starts = [int(r.word_start) for r in by_doc[1]]
    assert starts == [0, 15, 30, 33]
    # every word covered; non-last consecutive pairs share exactly 5
    covered = set()
    for r in by_doc[1]:
        covered |= set(range(r.word_start, r.word_start + r.n_words))
        assert int(r.n_words) == len(r.chunk_text.split())
    assert covered == set(range(53))
    for a, b in zip(by_doc[1], by_doc[1][1:-1]):
        assert (a.word_start + a.n_words) - b.word_start == 5
    # validation
    with pytest.raises(ValueError):
        chunk_documents(df, size=10, overlap=10)
    # zero-shuffle, zero-Python plan
    plan = (
        chunk_documents(df, size=8, overlap=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Python" not in plan
