"""Single-pass expectation suites (operators/expectations.py)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from nexus_event_stream_spark.io import load_table
from nexus_event_stream_spark.operators.expectations import (
    ExpectationError,
    check,
    enforce,
    expect_agg,
    expect_between,
    expect_complete,
    expect_in,
    expect_matches,
    expect_mean_between,
    expect_row_count,
    expect_unique,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def _by_name(report):
    return {r["name"]: r for r in report}


def test_full_suite_on_documents(spark, docs):
    n = docs.count()
    report = check(
        docs,
        [
            expect_row_count(lo=1),
            expect_complete("doc_id"),
            expect_unique("doc_id"),
            expect_complete("text", min_fraction=0.9),
            expect_between("doc_id", lo=0, hi=10**12),
            expect_agg(
                "avg_len", F.avg(F.length("text")), 1.0, None
            ),
        ],
    )
    r = _by_name(report)
    assert all(x["passed"] for x in report), report
    assert r["row_count"]["value"] == float(n)
    assert r["unique(doc_id)"]["value"] == 1.0


def test_failures_reported_not_thrown(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, None)], "k long, v string"
    )
    r = _by_name(
        check(
            df,
            [
                expect_unique("k"),           # 2/3 — fails
                expect_complete("v"),         # 2/3 — fails
                expect_row_count(lo=3, hi=3), # passes
            ],
        )
    )
    assert not r["unique(k)"]["passed"]
    assert abs(r["unique(k)"]["value"] - 2 / 3) < 1e-9
    assert not r["complete(v)"]["passed"]
    assert r["row_count"]["passed"]


def test_enforce_raises_with_failure_detail(spark):
    df = spark.createDataFrame([(1,), (1,)], "k long")
    with pytest.raises(ExpectationError) as ei:
        enforce(df, [expect_unique("k")])
    assert ei.value.failures[0]["name"] == "unique(k)"
    # passing gate returns the report
    rep = enforce(df, [expect_row_count(lo=2, hi=2)])
    assert rep[0]["passed"]


def test_between_matches_in_fraction_semantics(spark):
    df = spark.createDataFrame(
        [(1, "en"), (5, "de"), (50, "xx"), (None, None)],
        "v long, lang string",
    )
    r = _by_name(
        check(
            df,
            [
                # bounds over NON-NULL values only: 2 of 3 in [0,10]
                expect_between("v", 0, 10, min_fraction=0.9),
                expect_in("lang", ["en", "de"], min_fraction=0.6),
                expect_matches("lang", r"^[a-z]{2}$"),
            ],
        )
    )
    assert abs(r["between(v)"]["value"] - 2 / 3) < 1e-9
    assert not r["between(v)"]["passed"]
    assert abs(r["in(lang)"]["value"] - 2 / 3) < 1e-9
    assert r["in(lang)"]["passed"]
    assert r["matches(lang)"]["value"] == 1.0  # 'xx' matches the shape


def test_matches_is_full_match_not_substring(spark):
    """rlike is substring-find; expect_matches must anchor — a corpus of
    '123en456' junk may not pass a language-code contract."""
    df = spark.createDataFrame(
        [("en",), ("123en456",), ("ENGLISH-en",)], "lang string"
    )
    r = check(df, [expect_matches("lang", r"[a-z]{2}")])[0]
    assert abs(r["value"] - 1 / 3) < 1e-9
    assert not r["passed"]


def test_unique_counts_null_keys_against_the_ratio(spark):
    """'1.0 = a key' must mean every ROW is keyed: NULL keys lower the
    ratio rather than vanishing from the denominator."""
    df = spark.createDataFrame([(1,), (2,), (None,), (None,)], "k long")
    r = check(df, [expect_unique("k")])[0]
    assert abs(r["value"] - 0.5) < 1e-9
    assert not r["passed"]


def test_empty_frame_fails_closed(spark):
    """An empty corpus must FAIL its completeness gate, not pass it."""
    df = spark.createDataFrame([], "k long, v string")
    r = _by_name(
        check(df, [expect_complete("v"), expect_row_count(lo=1)])
    )
    assert not r["complete(v)"]["passed"]
    assert not r["row_count"]["passed"]


def test_approx_unique_within_tolerance(spark):
    df = spark.range(5000).select(F.col("id").alias("k"))
    r = check(df, [expect_unique("k", min_ratio=0.9, approx=True)])[0]
    assert r["passed"]
    assert abs(r["value"] - 1.0) < 0.1


def test_duplicate_names_rejected(spark):
    df = spark.range(1)
    with pytest.raises(ValueError):
        check(df, [expect_row_count(), expect_row_count()])


def test_single_pass_plan(spark, docs):
    """The whole suite is ONE aggregation: a single pair of
    HashAggregates (partial+final) around one Exchange — no per-check
    jobs, no extra scans."""
    suite = [
        expect_row_count(lo=1),
        expect_complete("text"),
        expect_between("doc_id", 0, 10**12),
        expect_matches("source", r"^[a-z_]+$", 0.5),
        expect_mean_between("doc_id", 0, 10**12),
    ]
    agg = docs.agg(
        *[e.metric.alias(f"__m{i}") for i, e in enumerate(suite)]
    )
    plan = agg._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
