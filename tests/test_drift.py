"""Corpus drift detection: exact-zero on identical snapshots, flags on
engineered distribution breaks, JSON persistence, zero-job comparison."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nexus_event_stream_spark.operators.drift import (
    CorpusProfile,
    corpus_profile,
    drift_report,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def base_profile(docs):
    return corpus_profile(docs)


def test_identical_snapshots_show_exact_zero_drift(docs, base_profile):
    again = corpus_profile(docs)
    rep = drift_report(base_profile, again)
    assert rep["drifted"] is False and rep["flags"] == []
    # deterministic sketches: identity, not just smallness
    assert rep["metrics"]["token_l1"] == 0.0
    assert rep["metrics"]["max_len_quantile_shift"] == 0.0
    assert rep["metrics"]["content_jaccard"] == 1.0
    assert rep["metrics"]["doc_ratio"] == 1.0


def test_subset_snapshot_is_not_flagged(docs, base_profile):
    # half the corpus, same distribution — a normal smaller batch
    half = docs.where(F.pmod(F.xxhash64("doc_id"), F.lit(2)) == 0)
    rep = drift_report(base_profile, corpus_profile(half))
    assert rep["drifted"] is False, rep


def test_length_distribution_break_is_flagged(docs, base_profile):
    truncated = docs.select(
        "doc_id", F.substring("text", 1, 30).alias("text")
    )
    rep = drift_report(base_profile, corpus_profile(truncated))
    assert "length_distribution_shift" in rep["flags"]


def test_content_replacement_is_flagged(spark, base_profile):
    alien = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("zq xv wk jn qp bz vx kw nj pq fz "),
            F.col("id").cast("string"),
            F.lit(" zzqq vvxx wwkk jjnn ppqq totally different tokens"),
        ).alias("text"),
    )
    rep = drift_report(base_profile, corpus_profile(alien))
    assert "content_overlap_collapse" in rep["flags"]
    assert "token_frequency_shift" in rep["flags"]
    assert rep["metrics"]["content_jaccard"] < 0.05


def test_doc_count_jump_is_flagged(docs, base_profile):
    tiny = docs.limit(50)
    rep = drift_report(base_profile, corpus_profile(tiny))
    assert "doc_count_jump" in rep["flags"]


def test_profile_json_roundtrip_and_offline_compare(docs, base_profile):
    blob = base_profile.to_json()
    back = CorpusProfile.from_json(blob)
    # comparing a restored profile against the live one is exact-zero —
    # i.e. last week's persisted JSON is a full substitute for the data
    rep = drift_report(back, base_profile)
    assert rep["drifted"] is False
    assert rep["metrics"]["token_l1"] == 0.0
    with pytest.raises(ValueError):
        CorpusProfile.from_json('{"kind": "nope"}')


def test_empty_snapshot_flags_instead_of_crashing(spark, base_profile):
    empty = corpus_profile(spark.createDataFrame([], "doc_id long, text string"))
    assert empty.n_docs == 0
    rep = drift_report(base_profile, empty)
    assert rep["drifted"] is True and rep["flags"] == ["empty_snapshot"]
    rep2 = drift_report(empty, empty)
    assert rep2["flags"] == ["both_snapshots_empty"]


def test_thresholds_overridable(docs, base_profile):
    rep = drift_report(
        base_profile,
        base_profile,
        thresholds={"max_doc_ratio_jump": 0.5},
    )
    assert "doc_count_jump" in rep["flags"]  # ratio 1.0 > 0.5 now
