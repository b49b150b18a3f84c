"""Misra-Gries heavy hitters: deterministic bounds, completeness above the
decrement mass, mergeability, and exactness when capacity suffices."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from nexus_event_stream_spark.operators.heavy_hitters import (
    MGSummary,
    _MGState,
    heavy_hitters,
    mg_merge,
    mg_sketch,
)


def _exact(df, col):
    return {
        r[col]: r["n"]
        for r in df.groupBy(col).agg(F.count("*").alias("n")).collect()
    }


def test_state_matches_exact_when_capacity_suffices():
    st = _MGState(capacity=100)
    rng = random.Random(7)
    truth: dict[str, int] = {}
    for _ in range(5000):
        x = f"t{rng.randrange(50)}"
        w = rng.randrange(1, 4)
        st.add(x, w)
        truth[x] = truth.get(x, 0) + w
    assert st.dec == 0
    assert st.summary() == truth


def test_state_bounds_under_pressure():
    st = _MGState(capacity=8)
    rng = random.Random(11)
    truth: dict[str, int] = {}
    for _ in range(20000):
        # zipf-ish: small ids hot
        x = f"t{min(rng.randrange(1, 200), rng.randrange(1, 200))}"
        st.add(x, 1)
        truth[x] = truth.get(x, 0) + 1
    s = st.summary()
    n = sum(truth.values())
    # MG guarantee: D <= N/(c+1); S(x) <= true(x) <= S(x) + D for all x
    assert st.dec <= n // (st.capacity + 1) + 1
    for x, t in truth.items():
        sx = s.get(x, 0)
        assert sx <= t <= sx + st.dec, (x, sx, t, st.dec)


def test_sketch_bounds_and_completeness_on_skewed_tokens(spark):
    # deterministic zipf-ish ids over 4 partitions
    df = (
        spark.range(0, 40000, 1, 4)
        .select(
            F.concat(
                F.lit("w"),
                F.least(
                    F.pmod(F.xxhash64("id"), F.lit(500)),
                    F.pmod(F.xxhash64("id", F.lit(1)), F.lit(500)),
                ),
            ).alias("tok")
        )
    )
    truth = _exact(df, "tok")
    sk = mg_sketch(df, "tok", capacity=64)
    assert sk.decrements <= sum(truth.values()) // 65 + 4
    for item, s in sk.counts.items():
        lo, hi = sk.bounds(item)
        assert lo <= truth[item] <= hi
    # completeness: every true count above D must be present
    for item, t in truth.items():
        if t > sk.decrements:
            assert item in sk.counts, (item, t, sk.decrements)


def test_heavy_hitters_topk_contains_exact_topk(spark):
    df = spark.range(0, 30000, 1, 4).select(
        F.concat(
            F.lit("w"),
            F.least(
                F.pmod(F.xxhash64("id"), F.lit(300)),
                F.pmod(F.xxhash64("id", F.lit(1)), F.lit(300)),
                F.pmod(F.xxhash64("id", F.lit(2)), F.lit(300)),
            ),
        ).alias("tok")
    )
    truth = _exact(df, "tok")
    exact_top5 = {
        k for k, _ in sorted(truth.items(), key=lambda kv: -kv[1])[:5]
    }
    hh = heavy_hitters(df, "tok", k=20, capacity=128).collect()
    assert hh and hh[0]["count_min"] <= hh[0]["count_max"]
    reported = {r["item"] for r in hh}
    assert exact_top5 <= reported
    for r in hh:
        assert r["count_min"] <= truth[r["item"]] <= r["count_max"]


def test_merge_preserves_bounds(spark):
    a = spark.range(0, 8000, 1, 2).select(
        F.concat(F.lit("a"), F.pmod(F.xxhash64("id"), F.lit(40))).alias("tok")
    )
    b = spark.range(0, 8000, 1, 2).select(
        F.concat(F.lit("a"), F.pmod(F.xxhash64("id", F.lit(9)), F.lit(60))).alias(
            "tok"
        )
    )
    truth = _exact(a.unionAll(b), "tok")
    merged = mg_merge(mg_sketch(a, "tok", 32), mg_sketch(b, "tok", 32))
    assert merged.capacity == 32 and len(merged.counts) <= 32
    for item in merged.counts:
        lo, hi = merged.bounds(item)
        assert lo <= truth[item] <= hi
    for item, t in truth.items():
        if t > merged.decrements:
            # may have been re-capped away only if below the cut — i.e.
            # items truly above D survive the merge cap
            lo, hi = merged.bounds(item)
            assert hi >= t


def test_truncation_recap_preserves_bounds(spark):
    # many distinct mid-weight items across partitions, tiny
    # max_candidates: truncation MUST fold the cut into decrements so
    # bounds() stays valid for dropped items too
    df = spark.range(0, 20_000, 1, 4).select(
        F.concat(F.lit("t"), F.pmod(F.xxhash64("id"), F.lit(200))).alias("tok")
    )
    truth = _exact(df, "tok")
    sk = mg_sketch(df, "tok", capacity=64, max_candidates=8)
    assert len(sk.counts) <= 8
    for item, t in truth.items():
        lo, hi = sk.bounds(item)
        assert lo <= t <= hi, (item, lo, t, hi, sk.decrements)


def test_json_roundtrip():
    sk = MGSummary(capacity=4, counts={"x": 3, "y": 9}, decrements=2)
    back = MGSummary.from_json(sk.to_json())
    assert back == sk


def test_null_items_skipped(spark):
    df = spark.createDataFrame(
        [("a",), (None,), ("a",), ("b",), (None,)], "tok string"
    )
    sk = mg_sketch(df, "tok", capacity=8)
    assert sk.counts == {"a": 2, "b": 1} and sk.decrements == 0


def test_documents_stopwords_surface(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok")
    ).where(F.length("tok") > 0)
    hh = heavy_hitters(toks, "tok", k=10, capacity=512).collect()
    truth = _exact(toks, "tok")
    assert len(hh) == 10
    for r in hh:
        assert r["count_min"] <= truth[r["item"]] <= r["count_max"]
