"""Tolerant JSON event decoding — mirrors the reference's parser tests
(data-plane/internal/domain/signal_test.go; FIXTURES.md §1 fixtures):
malformed dropped not fatal, unknown fields ignored, delete is 2-key,
non-UTC offsets parsed TZ-aware.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from nexus_event_stream_spark.schemas import EVENT_SCHEMA

CANONICAL = (
    '{"action": "created", "id": "signal-1", "title": "Server Alert",'
    ' "content": "CPU at 95%", "priority": "High", "author": "otavio",'
    ' "created_at": "2026-02-23T15:00:00-03:00",'
    ' "updated_at": "2026-02-23T15:05:00-03:00"}'
)


def parse(spark, payloads: list[str]):
    # PERMISSIVE from_json yields an all-null struct for malformed input, so
    # the drop predicate is "required id present" — same rule the streaming
    # projection uses (an id-less event is unappliable either way).
    df = spark.createDataFrame([(p,) for p in payloads], "value string")
    return df.select(
        F.from_json("value", EVENT_SCHEMA).alias("e")
    ).select("e.*", F.col("e.id").isNotNull().alias("ok"))


def test_canonical_event_parses_tz_aware(spark):
    # domain/signal_test.go:9-19 — and the -03:00 offset must land as UTC.
    row = parse(spark, [CANONICAL]).collect()[0]
    assert row["id"] == "signal-1"
    assert row["priority"] == "High"
    # 15:00-03:00 == 18:00 UTC (session TZ pinned to UTC)
    assert row["created_at"] == dt.datetime(2026, 2, 23, 18, 0)
    assert row["updated_at"] == dt.datetime(2026, 2, 23, 18, 5)


def test_malformed_and_empty_are_dropped_not_fatal(spark):
    # consumer.go:39-44 — parse error → skip record, keep consuming.
    out = parse(spark, ["{not valid json}", "", CANONICAL])
    kept = out.filter(F.col("ok")).collect()
    assert len(kept) == 1 and kept[0]["id"] == "signal-1"


def test_unknown_fields_ignored(spark):
    # domain/signal_test.go:71-82
    payload = CANONICAL[:-1] + ', "wat": 42, "nested": {"x": 1}}'
    row = parse(spark, [payload]).collect()[0]
    assert row["ok"] and row["title"] == "Server Alert"


def test_delete_event_two_keys_missing_fields_null(spark):
    # tests.py:134-139 / json.Unmarshal zero-value semantics → null here.
    row = parse(spark, ['{"action": "deleted", "id": "signal-1"}']).collect()[0]
    assert row["action"] == "deleted" and row["id"] == "signal-1"
    assert row["title"] is None and row["updated_at"] is None
