"""Extended relational operators on constructed fixtures."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from nexus_event_stream_spark.operators.relational import (
    asof_join,
    band_join,
    sessionize,
    topk_per_group,
)


def ts(h, m=0):
    return dt.datetime(2026, 1, 1, h, m)


def test_asof_join_backward_with_ties_and_unmatched(spark):
    left = spark.createDataFrame(
        [(1, 10, ts(5)), (2, 10, ts(1)), (3, 20, ts(12))],
        "eid long, k long, t timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, ts(2), 100, "early"),
            (10, ts(5), 200, "exact"),   # equal timestamp → matches (≤)
            (10, ts(9), 300, "late"),
            (20, ts(3), 400, "other"),
        ],
        "k long, t timestamp, oid long, tag string",
    )
    out = {
        r["eid"]: (r["oid"], r["tag"])
        for r in asof_join(
            left.withColumnRenamed("t", "lt"),
            right,
            left_key="k",
            right_key="k",
            left_ts="lt",
            right_ts="t",
            payload=["oid", "tag"],
            right_tiebreak="oid",
        ).collect()
    }
    assert out[1] == (200, "exact")  # ≤ semantics: equal ts matches
    assert out[2] == (None, None)  # nothing at-or-before → null payload
    assert out[3] == (400, "other")


def test_sessionize_gap_splits(spark):
    rows = [
        (1, 1, ts(1, 0)), (2, 1, ts(1, 10)),  # session 1
        (3, 1, ts(2, 30)),                     # gap > 30min → session 2
        (4, 2, ts(1, 0)),                      # other user
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = {
        (r["user_id"], r["session_id"]): r["n_events"]
        for r in sessionize(df, gap_seconds=1800).collect()
    }
    assert out == {(1, 1): 2, (1, 2): 1, (2, 1): 1}


def test_topk_per_group(spark):
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 30.0), ("a", 3, 20.0), ("b", 4, 5.0)],
        "g string, id long, v double",
    )
    out = topk_per_group(df, ["g"], [F.col("v").desc(), F.col("id").asc()], 2)
    got = {(r["g"], r["id"]) for r in out.collect()}
    assert got == {("a", 2), ("a", 3), ("b", 4)}


def test_band_join_boundaries(spark):
    df = spark.createDataFrame(
        [(1, 0.0), (2, 49.99), (3, 50.0), (4, 500.0), (5, -1.0)],
        "id long, value double",
    )
    bands = [("low", 0.0, 50.0), ("high", 50.0, 1000.0)]
    out = {r["id"]: r["band"] for r in band_join(df, bands).collect()}
    assert out == {1: "low", 2: "low", 3: "high", 4: "high", 5: None}


def test_rollup_cube_equal_their_grouping_set_expansions(spark):
    # The catalog's q_grouping_breadth uses explicit GROUPING SETS; pin the
    # rollup()/cube() API shorthands to their documented expansions so the
    # consolidated query really does subsume both.
    df = spark.createDataFrame(
        [("A", "x", 1), ("A", "y", 2), ("B", "x", 3), ("B", "x", 4)],
        "f string, s string, v long",
    )

    def rows(d):
        return {
            (r["f"], r["s"], r["n"], r["sv"])
            for r in d.agg(
                F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
            ).collect()
        }

    cube = rows(df.cube("f", "s"))
    rollup = rows(df.rollup("f", "s"))
    gs_cube = rows(df.groupingSets([["f", "s"], ["f"], ["s"], []], "f", "s"))
    gs_rollup = rows(df.groupingSets([["f", "s"], ["f"], []], "f", "s"))
    assert cube == gs_cube
    assert rollup == gs_rollup
    assert rollup <= cube


def test_approx_count_distinct_within_rsd(spark):
    # HLL++ left the oracle catalog (sketches are engine-specific); its
    # behavior contract lives here: estimate within the configured rsd of
    # the exact count.
    df = spark.range(0, 5000).select((F.col("id") % 1000).alias("k"))
    est = df.agg(F.approx_count_distinct("k", rsd=0.02).alias("e")).first()["e"]
    assert abs(est - 1000) <= 1000 * 0.06  # 3× rsd safety margin


def test_pivot_api_equals_conditional_aggregation(spark):
    # q_user_profile uses conditional aggregation (one shuffle); pin the
    # groupBy().pivot() shorthand to the same results so the API surface
    # stays covered even though the catalog takes the cheaper plan.
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "b"), (2, "b"), (3, "c")], "k long, t string"
    )
    types = ["a", "b", "c"]
    via_pivot = {
        (r["k"], *[r[t] or 0 for t in types])
        for r in df.groupBy("k").pivot("t", types).count().collect()
    }
    via_case = {
        tuple(r)
        for r in df.groupBy("k")
        .agg(
            *[
                F.sum(F.when(F.col("t") == t, 1).otherwise(0)).alias(t)
                for t in types
            ]
        )
        .collect()
    }
    assert via_pivot == via_case
