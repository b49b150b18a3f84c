"""Exact bitmap distinct tier: exactness vs COUNT(DISTINCT), merge
idempotence, set algebra, persistence round-trip, and the single-
aggregation plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nexus_event_stream_spark.operators.bitmaps import (
    bitmap_buckets,
    bitmap_buckets_by,
    bitmap_cardinality,
    bitmap_distinct_count,
    bitmap_intersection_count,
    bitmap_jaccard,
    bitmap_union,
    read_bitmap_index,
    write_bitmap_index,
)


def test_exact_against_count_distinct(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    exact = li.select(F.countDistinct("l_orderkey")).collect()[0][0]
    assert bitmap_distinct_count(li, "l_orderkey") == exact


def test_negative_zero_and_boundary_keys(spark):
    vals = [-40000, -32769, -32768, -1, 0, 1, 2, 32768, 32769, 10**12, 10**12]
    df = spark.createDataFrame([(v,) for v in vals], "v bigint")
    assert bitmap_distinct_count(df, "v") == len(set(vals))


def test_nulls_excluded(spark):
    df = spark.createDataFrame([(1,), (None,), (2,), (None,)], "v bigint")
    assert bitmap_distinct_count(df, "v") == 2


def test_union_is_exact_and_idempotent(spark):
    a = spark.range(0, 1000).select((F.col("id") * 3).alias("v"))
    b = spark.range(0, 1000).select((F.col("id") * 5).alias("v"))
    ba, bb = bitmap_buckets(a, "v"), bitmap_buckets(b, "v")
    exact_union = a.unionAll(b).select(F.countDistinct("v")).collect()[0][0]
    assert bitmap_cardinality(bitmap_union(ba, bb)) == exact_union
    # idempotent: A ∪ A = A
    assert bitmap_cardinality(bitmap_union(ba, ba)) == bitmap_cardinality(ba)


def test_intersection_and_jaccard_exact(spark):
    a = spark.range(0, 900).select(F.col("id").alias("v"))  # 0..899
    b = spark.range(600, 1500).select(F.col("id").alias("v"))  # 600..1499
    ba, bb = bitmap_buckets(a, "v"), bitmap_buckets(b, "v")
    assert bitmap_intersection_count(ba, bb) == 300
    assert bitmap_jaccard(ba, bb) == pytest.approx(300 / 1500)
    empty = bitmap_buckets(
        spark.createDataFrame([], "v bigint"), "v"
    )
    assert bitmap_jaccard(empty, empty) == 0.0


def test_per_group_rollup_matches_global(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    per = bitmap_buckets_by(orders, "o_orderpriority", "o_custkey")
    # per-group cardinalities match per-group COUNT(DISTINCT)
    got = {
        r["grp"]: r["n"]
        for r in per.groupBy("grp")
        .agg(F.sum(F.expr("bitmap_count(bmp)")).alias("n"))
        .collect()
    }
    exact = {
        r["o_orderpriority"]: r["n"]
        for r in orders.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert got == exact
    # OR-merging the per-group tables reproduces the global exact count
    merged = bitmap_union(per.select("bucket", "bmp"))
    assert bitmap_cardinality(merged) == orders.select(
        F.countDistinct("o_custkey")
    ).collect()[0][0]


def test_persistence_roundtrip(spark, tmp_path):
    df = spark.range(0, 5000).select((F.col("id") % 777).alias("v"))
    b = bitmap_buckets(df, "v")
    path = str(tmp_path / "bmp_idx")
    write_bitmap_index(b, path)
    back = read_bitmap_index(spark, path)
    assert bitmap_cardinality(back) == 777
    # a later day unions against the persisted index without the old data
    day2 = spark.range(700, 900).select(F.col("id").alias("v"))
    assert (
        bitmap_cardinality(bitmap_union(back, bitmap_buckets(day2, "v")))
        == 900  # 0..776 ∪ 700..899
    )


def test_build_is_one_aggregation(spark):
    df = spark.range(0, 10000).select(F.col("id").alias("v"))
    plan = (
        bitmap_buckets(df, "v")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1  # partial agg → one shuffle → final
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_union_requires_input():
    with pytest.raises(ValueError):
        bitmap_union()
