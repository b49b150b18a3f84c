"""Per-epoch expectation monitoring (streaming/metrics.py)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nexus_event_stream_spark.io import load_table
from nexus_event_stream_spark.operators.expectations import (
    check,
    expect_between,
    expect_complete,
    expect_matches,
    expect_row_count,
    expect_unique,
)
from nexus_event_stream_spark.streaming.metrics import (
    epoch_reports,
    latest_report,
    observe_expectations,
)

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("lang", T.StringType()),
        T.StructField("text", T.StringType()),
    ]
)


def _suite():
    return [
        expect_row_count(lo=1),
        expect_complete("text", min_fraction=0.99),
        expect_matches("lang", r"[a-z]{2}", min_fraction=0.9),
        expect_between("doc_id", lo=0, hi=10**9),
        expect_unique("doc_id", min_ratio=0.99, approx=True),  # streaming-safe
    ]


def _write_docs(src: str, name: str, rows: list[dict]) -> None:
    tmp = os.path.join(src, f".{name}.tmp")
    with open(tmp, "w") as fh:
        fh.write("\n".join(json.dumps(r) for r in rows) + "\n")
    os.replace(tmp, os.path.join(src, f"{name}.json"))


def test_batch_observation_matches_check(spark, sf_dir):
    """Observation-read metrics must judge identically to check() —
    one evaluation semantic for both planes."""
    from pyspark.sql import Observation

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.lit("en").alias("lang"), "text"
    )
    suite = _suite()
    obs = Observation()
    observed = observe_expectations(docs, suite, obs)
    observed.write.format("noop").mode("overwrite").save()
    from nexus_event_stream_spark.operators.expectations import evaluate_values

    via_obs = evaluate_values(obs.get, suite)
    via_check = check(docs, suite)
    for a, b in zip(via_obs, via_check):
        assert a["name"] == b["name"] and a["passed"] == b["passed"]
        if a["name"].startswith("unique"):
            continue  # HLL++ estimate vs exact pass independently
        assert a["value"] == pytest.approx(b["value"])


def test_streaming_per_epoch_reports(spark, tmp_path):
    src = str(tmp_path / "in")
    os.makedirs(src)
    suite = _suite()
    _write_docs(
        src,
        "b0",
        [
            {"doc_id": i, "lang": "en", "text": f"clean document {i}"}
            for i in range(20)
        ],
    )
    stream = spark.readStream.schema(DOC_SCHEMA).json(src)
    observed = observe_expectations(stream, suite)
    q = (
        observed.writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        first = latest_report(q, suite)
        assert first is not None and first["passed"], first
        by_name = {r["name"]: r for r in first["report"]}
        assert by_name["row_count"]["value"] == 20.0
        # second epoch: a contract violation (null texts + bad lang)
        _write_docs(
            src,
            "b1",
            [
                {"doc_id": 100 + i, "lang": "XX9", "text": None}
                for i in range(10)
            ],
        )
        q.processAllAvailable()
        last = latest_report(q, suite)
        assert last is not None and not last["passed"]
        bad = {r["name"]: r for r in last["report"]}
        assert not bad["complete(text)"]["passed"]
        assert not bad["matches(lang)"]["passed"]
        series = epoch_reports(q, suite)
        # the timeseries carries both verdicts in order
        passed_flags = [e["passed"] for e in series]
        assert True in passed_flags and False in passed_flags
        assert passed_flags.index(True) < len(passed_flags) - 1
    finally:
        q.stop()


def test_observe_adds_no_shuffle(spark, sf_dir):
    """Observed metrics ride the existing pass: the plan gains a
    CollectMetrics node but NO Exchange beyond what the query had."""
    docs = load_table(spark, sf_dir, "documents")
    suite = [expect_row_count(lo=1), expect_complete("text")]
    plan = (
        observe_expectations(docs.select("doc_id", "text"), suite)
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    assert "CollectMetrics" in plan
    assert "Exchange" not in plan
