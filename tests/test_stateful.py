"""Custom stateful streaming operators + Kafka payload contract."""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from nexus_event_stream_spark.schemas import EVENT_SCHEMA, TABLE_SCHEMAS
from nexus_event_stream_spark.sources.kafka_sink import events_to_kafka_payload
from nexus_event_stream_spark.streaming.stateful import running_totals, windowed_counts


EVENTS_DDL = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"


def write_parquet_batch(spark, src_dir, name, rows):
    df = spark.createDataFrame(rows, EVENTS_DDL)
    df.coalesce(1).write.mode("append").parquet(src_dir)
    # parquet stream source picks up new files per trigger
    return df


def events_stream(spark, src_dir):
    return (
        spark.readStream.schema(TABLE_SCHEMAS["events"])
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )


def row(eid, uid, h, val, typ="click"):
    import datetime as dt

    return (eid, dt.datetime(2026, 1, 1, h, 0), uid, typ, val, "{}")


def test_running_totals_state_accumulates_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    write_parquet_batch(spark, src, "b0", [row(1, 10, 1, 1.25), row(2, 10, 2, 2.50)])
    write_parquet_batch(spark, src, "b1", [row(3, 10, 3, 0.25), row(4, 20, 3, 9.99)])

    out = running_totals(events_stream(spark, src))
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("totals")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    # last emitted row per key reflects full accumulated state
    final = {
        r["user_id"]: r
        for r in spark.sql(
            "SELECT * FROM totals ORDER BY n_events"
        ).collect()
    }
    assert final[10]["n_events"] == 3 and final[10]["total_cents"] == 400
    assert final[20]["n_events"] == 1 and final[20]["total_cents"] == 999


def test_windowed_counts_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    rows = [row(1, 1, 1, 1.00), row(2, 1, 1, 2.00), row(3, 2, 2, 4.00)]
    batch_df = write_parquet_batch(spark, src, "b0", rows)

    agg = windowed_counts(events_stream(spark, src))
    q = (
        agg.writeStream.outputMode("update")
        .format("memory")
        .queryName("wincounts")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r["window_start"].hour, r["event_type"]): (r["n_events"], r["sum_cents"])
        for r in spark.sql("SELECT * FROM wincounts").collect()
    }
    assert got == {(1, "click"): (2, 300), (2, "click"): (1, 400)}


def test_kafka_payload_contract(spark):
    import datetime as dt

    full = (
        "created",
        "signal-1",
        "Server Alert",
        "CPU at 95%",
        "High",
        "otavio",
        dt.datetime(2026, 2, 23, 18, 0),
        dt.datetime(2026, 2, 23, 18, 5),
    )
    delete = ("deleted", "signal-2", None, None, None, None, None, None)
    df = spark.createDataFrame([full, delete], EVENT_SCHEMA)
    out = {r["key"]: json.loads(r["value"]) for r in events_to_kafka_payload(df).collect()}
    # key = entity id (signals.py:31)
    assert set(out) == {"signal-1", "signal-2"}
    assert out["signal-1"]["priority"] == "High"
    # delete envelope is exactly {action, id} (tests.py:134-139)
    assert out["signal-2"] == {"action": "deleted", "id": "signal-2"}
