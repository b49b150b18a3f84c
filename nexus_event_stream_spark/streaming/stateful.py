"""Custom stateful streaming operators (applyInPandasWithState).

The reference's only stateful computation is the LWW projection, which we
realize with foreachBatch MERGE (streaming/projection.py). These operators
cover the *general* custom-state surface a stream engine needs — arbitrary
per-key state machines with explicit timeouts — using Spark's
``applyInPandasWithState``: state lives in the state store (checkpointed,
bounded per key), groups arrive as Arrow batches.

Scale notes: state is per-key and O(1) here (a counter + latest timestamp),
so executors hold |keys|·O(1) state — the safe shape. Unbounded per-key
state (e.g. collecting all events) is the anti-pattern to avoid; watermark
+ timeout evict idle keys.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_cents", T.LongType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_cents", T.LongType()),
        T.StructField("last_ts_micros", T.LongType()),
    ]
)


def _update_running_totals(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold a user's new events into (count, exact-cents total, last ts)."""
    import datetime as dt

    n, total, last_us = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        n += len(pdf)
        # exact integer cents (same determinism rule as the batch catalog)
        total += int((pdf["value"] * 100).round().astype("int64").sum())
        if len(pdf):
            last_us = max(
                last_us, int(pd.to_datetime(pdf["ts"]).astype("int64").max() // 1000)
            )
    state.update((n, total, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_cents": [total],
            "last_ts": [dt.datetime.fromtimestamp(last_us / 1e6, dt.timezone.utc)],
        }
    )


def running_totals(events: DataFrame) -> DataFrame:
    """Per-user running totals as a custom stateful stream operator.

    Works on a streaming DataFrame with (user_id, ts, value); emits one
    updated row per key per micro-batch (update mode).
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update_running_totals,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def windowed_counts(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Event-time tumbling-hour aggregate with late-data watermarking —
    the streaming twin of the batch q_tumbling_window (late events beyond
    the watermark are dropped; within it, windows update in place).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))).alias(
                "sum_cents"
            ),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_cents",
        )
    )


def session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Event-time session windows (gap-based) per user — the streaming twin
    of the batch q_sessionize (ext_catalog). ``F.session_window`` grows a
    window while consecutive events arrive within ``gap``; a session closes
    and emits (in append mode) once the watermark passes its end. State per
    key is one open session, merged on arrival — bounded, unlike a
    collect-and-sort formulation.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias(
                "sum_cents"
            ),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_cents",
        )
    )
