"""KMV sketch algebra (operators/sketches.py).

The load-bearing property is LOSSLESS union: merge(sketch(A), sketch(B))
must equal sketch(A ∪ B) exactly — that is what makes per-source /
per-snapshot sketches composable without revisiting data. Estimates are
then checked against exact answers within the k-determined error.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nexus_event_stream_spark.io import load_table
from nexus_event_stream_spark.operators.sketches import (
    DEFAULT_K,
    KMVSketch,
    kmv_estimate,
    kmv_intersection,
    kmv_jaccard,
    kmv_merge,
    kmv_sketch,
    kmv_sketches_by,
    source_overlap,
)


def _range_df(spark, lo: int, hi: int):
    return spark.range(lo, hi).select(F.col("id").cast("string").alias("v"))


def test_small_set_is_exact(spark):
    df = _range_df(spark, 0, 40)
    s = kmv_sketch(df, "v", k=256)
    assert s.exact and len(s.hashes) == 40
    assert kmv_estimate(s) == 40.0
    assert list(s.hashes) == sorted(set(s.hashes))  # sorted, distinct


def test_nulls_and_duplicates_ignored(spark):
    df = spark.createDataFrame(
        [("a",), ("a",), (None,), ("b",)], "v string"
    )
    s = kmv_sketch(df, "v", k=16)
    assert kmv_estimate(s) == 2.0


def test_estimate_within_kmv_error(spark):
    """n=20000 distinct, k=256 → relative std error ≈ 1/√(k−2) ≈ 6.3 %;
    4σ bound = 25 %. Deterministic (hash-seeded), so this never flakes."""
    n = 20000
    s = kmv_sketch(_range_df(spark, 0, n), "v", k=256)
    assert not s.exact
    est = kmv_estimate(s)
    assert abs(est - n) / n < 0.25


def test_union_merge_is_lossless(spark):
    """sketch(A ∪ B) == merge(sketch(A), sketch(B)) — exact equality."""
    a_df = _range_df(spark, 0, 5000)
    b_df = _range_df(spark, 3000, 9000)
    u_df = _range_df(spark, 0, 9000)
    k = 128
    sa, sb = kmv_sketch(a_df, "v", k), kmv_sketch(b_df, "v", k)
    su = kmv_sketch(u_df, "v", k)
    assert kmv_merge(sa, sb) == su


def test_union_merge_lossless_with_exact_side(spark):
    a_df = _range_df(spark, 0, 30)  # exact side (< k)
    b_df = _range_df(spark, 10, 5000)  # truncated side
    u_df = _range_df(spark, 0, 5000)
    k = 64
    assert kmv_merge(
        kmv_sketch(a_df, "v", k), kmv_sketch(b_df, "v", k)
    ) == kmv_sketch(u_df, "v", k)


def test_merge_is_commutative_associative():
    a = KMVSketch(4, (1, 5, 9, 12))
    b = KMVSketch(4, (2, 5, 7, 20))
    c = KMVSketch(4, (3, 4, 9, 11))
    assert kmv_merge(a, b) == kmv_merge(b, a)
    assert kmv_merge(kmv_merge(a, b), c) == kmv_merge(a, kmv_merge(b, c))


def test_jaccard_and_intersection_estimates(spark):
    """50 % overlap by construction: A=[0,6000), B=[3000,9000) →
    |A∩B|=3000, |A∪B|=9000, J=1/3."""
    k = 512
    sa = kmv_sketch(_range_df(spark, 0, 6000), "v", k)
    sb = kmv_sketch(_range_df(spark, 3000, 9000), "v", k)
    j = kmv_jaccard(sa, sb)
    assert abs(j - 1 / 3) < 0.12
    inter = kmv_intersection(sa, sb)
    assert abs(inter - 3000) / 3000 < 0.35
    # disjoint sets → (near-)zero
    sc = kmv_sketch(_range_df(spark, 100000, 106000), "v", k)
    assert kmv_jaccard(sa, sc) < 0.02
    # identical sets → 1 exactly (same hashes, same sketch)
    assert kmv_jaccard(sa, sa) == 1.0


def test_sketches_by_matches_per_group_sketch(spark, sf_dir):
    """The one-job grouped builder must agree exactly with building each
    group's sketch separately."""
    ev = load_table(spark, sf_dir, "events")
    grouped = kmv_sketches_by(ev, "event_type", F.col("user_id"), k=64)
    assert len(grouped) >= 2
    for g, sk in grouped.items():
        solo = kmv_sketch(
            ev.filter(F.col("event_type") == g), F.col("user_id"), k=64
        )
        assert sk == solo, g


def test_source_overlap_on_constructed_corpus(spark):
    """Three sources: 'wiki' and 'wiki_copy' share half their documents,
    'other' shares none — the overlap report must rank them accordingly."""
    base = [
        f"the quick brown fox jumps over dog number {i} in sentence {i*7}"
        for i in range(60)
    ]
    other = [
        f"completely different subject matter entirely unrelated text {i} token {i*3}"
        for i in range(60)
    ]
    fresh = [
        f"novel standalone material appearing nowhere else item {i} mark {i*11}"
        for i in range(30)
    ]
    rows = (
        [("wiki", t) for t in base]
        + [("wiki_copy", t) for t in base[:30] + fresh]
        + [("other", t) for t in other]
    )
    docs = spark.createDataFrame(rows, "source string, text string")
    rep = source_overlap(docs, "source", "text", n=3, k=256)
    by_pair = {(r["a"], r["b"]): r for r in rep}
    j_wiki_copy = by_pair[("wiki", "wiki_copy")]["jaccard"]
    j_wiki_other = by_pair[("other", "wiki")]["jaccard"]
    assert j_wiki_copy > 0.2
    assert j_wiki_other < 0.05
    assert by_pair[("other", "wiki_copy")]["jaccard"] < 0.05
    for r in rep:
        assert r["union"] >= r["intersection"] >= 0.0


def test_sketch_build_plan_is_bounded_topk(spark):
    """The sketch scan must end in TakeOrderedAndProject (per-task k-row
    heap), never a global sort, and dedupe map-side before the shuffle."""
    df = _range_df(spark, 0, 10000)
    plan_df = (
        df.select(
            F.pmod(F.xxhash64(F.col("v")), F.lit(1 << 61)).alias("__hv")
        )
        .where(F.col("__hv").isNotNull())
        .distinct()
        .orderBy("__hv")
        .limit(256)
    )
    plan = plan_df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    import re

    assert "TakeOrderedAndProject" in plan
    assert "HashAggregate" in plan  # map-side partial distinct
    # exactly one shuffle (formatted mode prints every node twice: tree
    # line + detail header — count the detail headers)
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1


def test_default_k_sane():
    assert DEFAULT_K >= 128  # ≤ ~9 % std error out of the box


def test_sketch_roundtrips_through_json():
    import json

    s = KMVSketch(4, (3, 7, 11, 40))
    back = KMVSketch.from_dict(json.loads(json.dumps(s.to_dict())))
    assert back == s
    assert kmv_jaccard(back, s) == 1.0


def test_sketch_load_rejects_incompatible_payloads():
    s = KMVSketch(4, (3, 7, 11, 40))
    with pytest.raises(ValueError):
        KMVSketch.from_dict({**s.to_dict(), "m": 123})  # wrong hash domain
    with pytest.raises(ValueError):
        KMVSketch.from_dict({**s.to_dict(), "kind": "hll"})
    with pytest.raises(ValueError):
        KMVSketch.from_dict({**s.to_dict(), "hashes": [7, 3, 11, 40]})
