"""Scalar function library behavior incl. reference quirks (SURVEY.md §2.8)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nexus_event_stream_spark.functions.domain import (
    priority_display_to_score,
    priority_score_to_display,
    rfc3339_to_unix,
    truncate_ellipsis,
)
from nexus_event_stream_spark.functions.text import (
    char_ngrams,
    doc_fingerprint,
    token_count,
    word_ngrams,
)
from nexus_event_stream_spark.functions.vectors import cosine_similarity


def one(spark, col, **cols):
    names = list(cols)
    df = spark.createDataFrame(
        [tuple(cols[n] for n in names)], ", ".join(f"{n} string" for n in names)
    ) if all(isinstance(v, str) or v is None for v in cols.values()) else None
    assert df is not None
    return df.select(col.alias("out")).collect()[0]["out"]


def test_priority_scores_and_unknown_zero(spark):
    df = spark.createDataFrame(
        [("Low",), ("Medium",), ("High",), ("Bogus",), (None,)], "p string"
    )
    out = [r["s"] for r in df.select(priority_display_to_score("p").alias("s")).collect()]
    assert out == [1, 2, 3, 0, 0]  # projection/signal.go:21-25 unknown→0


def test_priority_display_roundtrip(spark):
    df = spark.createDataFrame([(1,), (2,), (3,), (0,)], "c int")
    out = [r["d"] for r in df.select(priority_score_to_display("c").alias("d")).collect()]
    assert out == ["Low", "Medium", "High", None]


def test_rfc3339_unparseable_zero(spark):
    # projection/signal.go:147-153 — bad timestamp scores 0, not error.
    df = spark.createDataFrame(
        [("2026-02-23T15:00:00-03:00",), ("garbage",), (None,)], "t string"
    )
    out = [r["u"] for r in df.select(rfc3339_to_unix("t").alias("u")).collect()]
    assert out[0] == 1771869600  # 2026-02-23T18:00:00Z
    assert out[1] == 0 and out[2] == 0


def test_truncate_ellipsis(spark):
    # cmd/cli/main.go:165-170
    long = "x" * 60
    df = spark.createDataFrame([(long,), ("short",)], "s string")
    out = [r["t"] for r in df.select(truncate_ellipsis("s", 40).alias("t")).collect()]
    assert out[0] == "x" * 39 + "…" and len(out[0]) == 40
    assert out[1] == "short"


def test_text_ngrams_and_fingerprint(spark):
    df = spark.createDataFrame([("a bb ccc dddd",), ("xy",)], "text string")
    rows = df.select(
        token_count("text").alias("n"),
        word_ngrams("text", 3).alias("w3"),
        char_ngrams("text", 5).alias("c5"),
        doc_fingerprint("text").alias("fp"),
    ).collect()
    assert rows[0]["n"] == 4
    assert rows[0]["w3"] == ["a bb ccc", "bb ccc dddd"]
    assert rows[0]["c5"][0] == "a bb " and len(rows[0]["c5"]) == 13 - 4
    assert rows[1]["w3"] == [] and rows[1]["c5"] == []
    assert rows[0]["fp"] != rows[1]["fp"] >= 0


def test_cosine_similarity_exact(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0]), ([1.0, 1.0], [1.0, 1.0])],
        "a array<float>, b array<float>",
    )
    out = [
        r["c"] for r in df.select(cosine_similarity("a", "b").alias("c")).collect()
    ]
    assert out[0] == 1.0 and out[1] == 0.0 and abs(out[2] - 1.0) < 1e-12


def test_char_entropy_closed_form(spark):
    import collections
    import math

    from pyspark.sql import functions as F

    from nexus_event_stream_spark.functions.text import char_entropy

    texts = ["aaaa", "abab", "abcd", "the cat sat on the mat", "", "x"]
    df = spark.createDataFrame(list(enumerate(texts)), "i long, t string")
    got = {r.i: r.e for r in df.select("i", char_entropy("t").alias("e")).collect()}
    for i, t in enumerate(texts):
        if not t:
            expect = 0.0
        else:
            c = collections.Counter(t)
            expect = -sum(v / len(t) * math.log2(v / len(t)) for v in c.values())
        assert abs(got[i] - expect) < 1e-9, (t, got[i], expect)
