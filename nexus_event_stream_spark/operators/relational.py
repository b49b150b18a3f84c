"""Extended relational operators beyond plain joins/aggs.

Spark lacks native as-of / interval joins; these are the standard scalable
formulations (union+window for as-of, broadcast non-equi for small-interval
dims), per the public Spark patterns for time-series work. Everything stays
in built-in operators — one shuffle each, no UDFs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    payload: Sequence[str],
    right_tiebreak: str,
) -> DataFrame:
    """Left as-of join: for each left row, the right row with the greatest
    ``right_ts`` ≤ ``left_ts`` for the same key (backward as-of, ties on
    right_ts resolved toward the greatest ``right_tiebreak``).

    Formulation: tag both sides, union on (key, ts), and take a running
    ``last(payload, ignorenulls)`` over a single key-partitioned window —
    one shuffle on the key, no range explosion, skew handled by AQE. This
    is the classic merge-asof-on-Spark shape (vs. ``pd.merge_asof`` inside
    ``applyInPandas``, which needs per-group memory).

    Right rows equal-dated with a left row sort *before* it (tag 0 < 1),
    implementing ≤. Unmatched left rows keep null payload (ASOF LEFT).

    The payload travels as ONE struct through ``last(ignorenulls)`` —
    per-column fills would stitch fields from *different* right rows
    whenever a payload value is legitimately NULL (matched-but-NULL must
    stay NULL, not inherit an older row's value).
    """
    r = right.select(
        F.col(right_key).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__tag"),
        F.col(right_tiebreak).alias("__tb"),
        F.struct(*[F.col(c) for c in payload]).alias("__payload"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}")
            for c in left.columns
        ],
    )
    payload_type = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in payload]
    )
    l = left.select(
        F.col(left_key).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(right.schema[right_tiebreak].dataType).alias("__tb"),
        F.lit(None).cast(payload_type).alias("__payload"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    merged = r.unionByName(l)
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__tag").asc(), F.col("__tb").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = merged.select(
        "__tag",
        *[F.col(f"__l_{c}").alias(c) for c in left.columns],
        F.last("__payload", ignorenulls=True).over(w).alias("__p"),
    )
    return (
        filled.filter(F.col("__tag") == 1)
        .select(
            *left.columns,
            *[F.col(f"__p.{c}").alias(c) for c in payload],
        )
    )


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    tiebreak: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since
    the previous event of the same key exceeds ``gap_seconds``.

    lag → boundary flag → running sum = session index; one shuffle on the
    key. (Streaming equivalent: ``session_window(ts, gap)``.)
    Output: key, session_id (1-based per key), n_events, session start/end.
    """
    w = Window.partitionBy(key).orderBy(F.col(ts_col).asc(), F.col(tiebreak).asc())
    prev_ts = F.lag(ts_col).over(w)
    # microsecond integers, NOT unix_timestamp (whole-second truncation
    # would misclassify sub-second events straddling the gap boundary)
    gap = F.unix_micros(F.col(ts_col)) - F.unix_micros(prev_ts)
    is_start = F.when(
        prev_ts.isNull() | (gap > gap_seconds * 1_000_000), 1
    ).otherwise(0)
    run = Window.partitionBy(key).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak).asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    with_sess = events.withColumn("session_id", F.sum(is_start).over(run))
    return with_sess.groupBy(key, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
    )


def topk_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
) -> DataFrame:
    """Top-k rows per group via ranking window (one shuffle on the group
    key; each partition keeps a sort, not a global one)."""
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= k)
        .drop("__rank")
    )


def band_join(
    df: DataFrame,
    bands: Sequence[tuple[str, float, float]],
    value_col: str = "value",
) -> DataFrame:
    """Interval/range join against a small in-memory band dimension:
    rows match bands where lo ≤ value < hi.

    The dim enters as literal rows and is broadcast; a non-equi join on a
    3-row side plans as BroadcastNestedLoopJoin — the right physical choice
    for tiny interval dims. (For large interval tables, bucketize the range
    key and equi-join on the bucket first.)
    """
    from nexus_event_stream_spark.io import spread

    spark = df.sparkSession
    dim = spark.createDataFrame(
        [(name, float(lo), float(hi)) for name, lo, hi in bands],
        "band string, lo double, hi double",
    )
    cond = (F.col(value_col) >= F.col("lo")) & (F.col(value_col) < F.col("hi"))
    # BNLJ probes every row against every band — spread the probe side so
    # the nested loop runs on all cores (single-file scans arrive as one
    # partition locally).
    return spread(df).join(F.broadcast(dim), cond, "left").drop("lo", "hi")
