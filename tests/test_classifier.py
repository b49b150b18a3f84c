"""Distributed logistic-regression quality classifier
(operators/classifier.py): learnability, loss descent, agreement with a
single-machine numpy reference, and the pure-Catalyst inference plan."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from nexus_event_stream_spark.io import load_table
from nexus_event_stream_spark.operators.classifier import (
    accuracy,
    score_logreg,
    train_logreg,
)
from nexus_event_stream_spark.operators.quality import quality_signals

#: r15 two-tier suite (VERDICT r14 #6): this module is a multi-second
#: store/protocol INTEGRATION suite — the dominant cost of the ~93-min
#: full run that outgrew the driver's verification window. Skipped by
#: default (SPARK_GRAFT_FULL_TESTS=1 runs it); the operators it
#: exercises keep fast-tier unit coverage in the sibling suites.
pytestmark = pytest.mark.slow

FEATURES = [
    "n_words",
    "mean_word_len",
    "dup_word_frac",
    "top_bigram_frac",
    "n_stopwords",
]


#: thresholds tuned to actually split the synthetic corpus (the library
#: defaults pass every doc at this SF — a constant label teaches nothing)
_SPLIT_THRESHOLDS = {
    "min_words": 3,
    "max_words": 100_000,
    "min_mean_word_len": 2,
    "max_mean_word_len": 12,
    "max_dup_word_frac_pct": 50,
    "min_alpha_word_frac_pct": 80,
    "max_top_bigram_frac_pct": 10,
}


def _signals(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return quality_signals(docs, thresholds=_SPLIT_THRESHOLDS).select(
        "doc_id", "quality_pass", *FEATURES
    )


def test_learns_the_heuristic_labels(spark, sf_dir):
    sig = _signals(spark, sf_dir).persist()
    try:
        model = train_logreg(sig, FEATURES, "quality_pass", iters=40)
        # loss strictly improved over training
        assert model["losses"][-1] < model["losses"][0] * 0.8
        scored = score_logreg(sig, model, FEATURES)
        acc = accuracy(scored, "quality_score", "quality_pass")
        # the label is a threshold-AND of these features — not linearly
        # separable, but a logistic fit must beat the base rate clearly
        base = max(
            sig.agg(F.avg("quality_pass")).collect()[0][0] or 0.0,
            1 - (sig.agg(F.avg("quality_pass")).collect()[0][0] or 0.0),
        )
        assert acc > max(0.8, base)
    finally:
        sig.unpersist()


def test_matches_numpy_reference_training(spark):
    # same data, same schedule → same weights (float tolerance): the
    # distributed gradient sums implement exactly full-batch GD
    rng = np.random.default_rng(7)
    X = rng.normal(size=(400, 3))
    true_w = np.array([2.0, -1.5, 0.5])
    y = (X @ true_w + 0.3 > 0).astype(int)
    rows = [(float(a), float(b), float(c), int(t)) for (a, b, c), t in zip(X, y)]
    df = spark.createDataFrame(rows, "f1 double, f2 double, f3 double, y int")
    model = train_logreg(df, ["f1", "f2", "f3"], "y", iters=25, lr=1.0, l2=1e-4)

    # numpy twin with identical standardization, step decay and l2
    mean, std = X.mean(0), X.std(0)
    Z = (X - mean) / std
    w = np.zeros(3)
    b = 0.0
    for t in range(25):
        p = 1 / (1 + np.exp(-(Z @ w + b)))
        err = p - y
        step = 1.0 / (1 + t / 4)
        w -= step * (Z.T @ err / len(y) + 1e-4 * w)
        b -= step * err.mean()
    w_orig = w / std
    b_orig = b - float((w * mean / std).sum())
    assert np.allclose(model["weights"], w_orig, rtol=1e-6, atol=1e-8)
    assert model["bias"] == pytest.approx(b_orig, rel=1e-6)

    scored = score_logreg(df, model, ["f1", "f2", "f3"])
    assert accuracy(scored, "quality_score", "y") > 0.95


def test_inference_plan_pure_catalyst_no_shuffle(spark, sf_dir):
    sig = _signals(spark, sf_dir)
    model = {"weights": [0.1] * len(FEATURES), "bias": -0.3, "losses": []}
    plan = (
        score_logreg(sig, model, FEATURES)
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    assert plan.count(") Exchange") == 0
    assert "Python" not in plan


def test_empty_frame_rejected(spark):
    df = spark.createDataFrame([], "f1 double, y int")
    with pytest.raises(ValueError):
        train_logreg(df, ["f1"], "y", iters=1)


def test_null_rows_excluded_from_training(spark):
    rows = [(1.0, 0), (2.0, 1), (None, 1), (3.0, None), (4.0, 1)]
    df = spark.createDataFrame(rows, "f1 double, y int")
    clean = spark.createDataFrame(
        [(1.0, 0), (2.0, 1), (4.0, 1)], "f1 double, y int"
    )
    m_all = train_logreg(df, ["f1"], "y", iters=10)
    m_clean = train_logreg(clean, ["f1"], "y", iters=10)
    # NULL-bearing rows neither bias the gradient nor inflate n
    assert m_all["weights"] == pytest.approx(m_clean["weights"])
    assert m_all["bias"] == pytest.approx(m_clean["bias"])
