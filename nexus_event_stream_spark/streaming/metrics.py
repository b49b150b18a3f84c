"""Per-epoch expectation monitoring via ``df.observe`` — the streaming
face of the batch publish gate (operators/expectations.py).

``observe`` attaches the suite's aggregate expressions to the query
plan itself: metrics are computed inline with whichever pass the sink
already runs (zero extra jobs, zero extra scans) and surface in each
micro-batch's ``StreamingQueryProgress.observedMetrics``. The same
`Expectation` objects and the same evaluation semantics
(`evaluate_values`) are used for both planes, so "what the batch gate
enforces" and "what the stream monitor watches" cannot drift.

Constraint inherited from Spark: observed metrics on a STREAMING frame
must not use distinct aggregates — `expect_unique` needs
``approx=True`` there (HLL++ partials). Batch `observe` has no such
limit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from nexus_event_stream_spark.operators.expectations import (
    Expectation,
    _validate_names,
    evaluate_values,
)

DEFAULT_OBSERVATION = "expectations"


def observe_expectations(
    df: DataFrame,
    suite: list[Expectation],
    name: str = DEFAULT_OBSERVATION,
) -> DataFrame:
    """Attach the suite's metrics to ``df`` (batch or streaming).

    Returns the same rows, observed: downstream transformations and the
    sink are unchanged. Read results per epoch with `epoch_reports` /
    `latest_report`, or — batch — via a `pyspark.sql.Observation` passed
    as ``name``.
    """
    _validate_names(suite)
    return df.observe(
        name, *[e.metric.alias(f"__m{i}") for i, e in enumerate(suite)]
    )


def _progress_values(progress: dict | None, name: str) -> dict | None:
    if not progress:
        return None
    om = progress.get("observedMetrics", {})
    vals = om.get(name)
    if vals is None:
        return None
    # PySpark surfaces observed metrics as a Row (or dict from json)
    return vals if isinstance(vals, dict) else vals.asDict()


def latest_report(query, suite: list[Expectation], name: str = DEFAULT_OBSERVATION):
    """The most recent micro-batch's expectation report (or None before
    the first progress event). ``query`` is a StreamingQuery."""
    return _epoch_report(query.lastProgress, suite, name)


def epoch_reports(
    query, suite: list[Expectation], name: str = DEFAULT_OBSERVATION
) -> list[dict]:
    """One report per retained progress event (Spark keeps the last ~100):
    [{"batch_id": n, "report": [...], "passed": bool}, ...] — the metric
    TIMESERIES a corpus-drift monitor consumes."""
    out = []
    for p in query.recentProgress:
        r = _epoch_report(p, suite, name)
        if r is not None:
            out.append(r)
    return out


def _epoch_report(progress, suite, name):
    vals = _progress_values(progress, name)
    if vals is None:
        return None
    report = evaluate_values(vals, suite)
    return {
        "batch_id": progress.get("batchId"),
        "report": report,
        "passed": all(r["passed"] for r in report),
    }
