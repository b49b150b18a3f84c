"""Bucketing (shuffle-free joins) + skew salting equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from nexus_event_stream_spark.io import load_table
from nexus_event_stream_spark.operators.partitioning import (
    bucketed_join,
    salted_sum_count,
    skew_salted_join,
    write_bucketed,
)
from nexus_event_stream_spark.plans.catalog import cents


def physical_plan(df) -> str:
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    # clean session-external leftovers (managed-table dirs survive sessions)
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    write_bucketed(orders, "b_orders", "o_orderkey", buckets=8)
    write_bucketed(lineitem, "b_lineitem", "o_orderkey", buckets=8)
    # Force the non-broadcast path: at real scale neither side broadcasts,
    # which is exactly when bucketing pays off.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey")
        plan = physical_plan(joined)
        assert ") Exchange" not in plan  # co-located buckets: no shuffle
        assert "SortMergeJoin" in plan
        # sanity: result matches the plain join
        plain = orders.join(lineitem, "o_orderkey")
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_salted_aggregate_equals_plain(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    salted = salted_sum_count(
        events,
        key=["event_type"],
        sum_cols={"sum_cents": cents("value")},
        unique_col="event_id",
        n=8,
    )
    plain = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(cents("value")).alias("sum_cents"),
    )
    got = {tuple(r) for r in salted.collect()}
    want = {tuple(r) for r in plain.collect()}
    assert got == want


def test_skew_salted_join_equals_plain(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    dim = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("user_id"), "c_name")
    )
    salted = skew_salted_join(events, dim, on="user_id", unique_col="event_id", n=4)
    plain = events.join(dim, "user_id")
    got = {(r["event_id"], r["c_name"]) for r in salted.collect()}
    want = {(r["event_id"], r["c_name"]) for r in plain.collect()}
    assert got == want
