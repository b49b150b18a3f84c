"""Deterministic sampling operators: replayability, exact strata counts,
monotone sample growth."""

from __future__ import annotations

from nexus_event_stream_spark.io import load_table
from nexus_event_stream_spark.operators.sampling import (
    hash_sample,
    stratified_sample_exact,
)

SF_DIR = "/root/testdata/sf0.001"


def test_hash_sample_deterministic_and_near_rate(spark):
    ev = load_table(spark, SF_DIR, "events")
    a = {r["event_id"] for r in hash_sample(ev, "event_id", 10).collect()}
    b = {r["event_id"] for r in hash_sample(ev, "event_id", 10).collect()}
    assert a == b  # replayable across runs/retries
    total = ev.count()
    assert 0.05 * total < len(a) < 0.15 * total  # ~10%


def test_hash_sample_grows_monotonically(spark):
    ev = load_table(spark, SF_DIR, "events")
    p10 = {r["event_id"] for r in hash_sample(ev, "event_id", 10).collect()}
    p20 = {r["event_id"] for r in hash_sample(ev, "event_id", 20).collect()}
    assert p10 < p20  # a bigger sample strictly contains the smaller one


def test_stratified_exact_counts_and_short_strata(spark):
    ev = load_table(spark, SF_DIR, "events")
    n = 25
    out = stratified_sample_exact(ev, "event_type", n, "event_id")
    counts = {
        r["event_type"]: r["count"]
        for r in out.groupBy("event_type").count().collect()
    }
    full = {
        r["event_type"]: r["count"]
        for r in ev.groupBy("event_type").count().collect()
    }
    assert counts == {t: min(n, c) for t, c in full.items()}


def test_stratified_sample_is_subset_of_larger(spark):
    ev = load_table(spark, SF_DIR, "events")
    small = {
        r["event_id"]
        for r in stratified_sample_exact(ev, "event_type", 5, "event_id").collect()
    }
    big = {
        r["event_id"]
        for r in stratified_sample_exact(ev, "event_type", 20, "event_id").collect()
    }
    assert small < big  # hash-rank order is stable → monotone growth


def test_stratified_rank_pushed_below_shuffle(spark):
    ev = load_table(spark, SF_DIR, "events")
    df = stratified_sample_exact(ev, "event_type", 10, "event_id")
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    # rank<=n pre-drops rows map-side — shuffle bytes bounded by n·strata
    assert "WindowGroupLimit" in plan
