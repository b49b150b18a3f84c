"""Model-based quality scoring: distributed logistic regression.

Production corpus pipelines follow their heuristic filters with a
learned quality classifier (the fastText-style "looks like a reference
corpus" scorer in GPT-3/LLaMA data recipes). This module trains one on
Spark with NO ML library, using the same executor-partials pattern as
the distributed-Lloyd IVF trainer (operators/similarity.py):

- **Training** (`train_logreg`): each iteration is ONE DataFrame pass —
  the current weights enter the plan as literals, each row computes its
  sigmoid and per-feature gradient contribution JVM-side, and a single
  aggregate emits the k+1 gradient sums (map-side partials, then one
  tiny shuffle). The driver holds O(k) state: weights and the gradient
  step. A billion-row corpus costs `iters` scans; nothing row-sized
  ever reaches the driver.
- **Inference** (`score_logreg`): pure Catalyst — a literal dot product
  + sigmoid projection. Zero shuffle, zero Python, embarrassingly
  parallel (plan-pinned in tests/test_classifier.py).

Features are standardized once (mean/std from one aggregate) and the
standardization is FOLDED INTO the returned weights, so scoring needs
no preprocessing pass.

Determinism note: gradient sums are float additions whose association
order depends on partitioning — training is reproducible to float
tolerance, not bit-exact (inherent to all distributed ML); inference
given fixed weights is deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _margin(feature_cols: list[str], weights: list[float], bias: float) -> Column:
    m = F.lit(float(bias))
    for c, w in zip(feature_cols, weights):
        m = m + F.col(c).cast("double") * F.lit(float(w))
    return m


def train_logreg(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iters: int = 30,
    lr: float = 1.0,
    l2: float = 1e-4,
) -> dict:
    """Train binary logistic regression; returns
    ``{"weights": [...], "bias": b, "losses": [...]}`` in the ORIGINAL
    (unstandardized) feature space, ready for ``score_logreg``.

    ``label_col`` must be 0/1. Full-batch gradient descent with a
    1/(1+t/4) step decay; each iteration is one corpus pass producing
    k+2 numbers (k gradient sums, bias gradient, mean log-loss).
    Rows with a NULL feature or label are EXCLUDED from training (and
    raise if nothing remains); at scoring time such rows get a NULL
    score — decide their fate explicitly before a threshold filter
    (``score >= t`` silently drops NULLs).
    """
    k = len(feature_cols)
    # F.sum/avg silently skip NULLs: a NULL-bearing row would shrink the
    # gradient while still counting in n — biased updates with no
    # warning. Train on complete rows only, explicitly.
    df = df.na.drop(subset=[*feature_cols, label_col])
    stats = df.select(
        *[F.avg(F.col(c).cast("double")).alias(f"m{i}") for i, c in enumerate(feature_cols)],
        *[
            F.coalesce(F.stddev_pop(F.col(c).cast("double")), F.lit(0.0)).alias(
                f"s{i}"
            )
            for i, c in enumerate(feature_cols)
        ],
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    mean = [stats[f"m{i}"] or 0.0 for i in range(k)]
    std = [stats[f"s{i}"] if stats[f"s{i}"] else 1.0 for i in range(k)]
    n = stats["n"]
    if n == 0:
        raise ValueError("empty training frame")

    # standardized view: z_i = (x_i - mean_i) / std_i, built once
    zcols = [
        ((F.col(c).cast("double") - F.lit(mean[i])) / F.lit(std[i])).alias(f"z{i}")
        for i, c in enumerate(feature_cols)
    ]
    z = df.select(*zcols, F.col(label_col).cast("double").alias("y"))

    w = [0.0] * k
    b = 0.0
    losses: list[float] = []
    for t in range(iters):
        margin = _margin([f"z{i}" for i in range(k)], w, b)
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
        err = p - F.col("y")
        row = z.select(
            *[F.sum(err * F.col(f"z{i}")).alias(f"g{i}") for i in range(k)],
            F.sum(err).alias("gb"),
            # clamped log-loss (numerically safe at saturated sigmoids)
            F.avg(
                -(
                    F.col("y") * F.log(F.greatest(p, F.lit(1e-12)))
                    + (F.lit(1.0) - F.col("y"))
                    * F.log(F.greatest(F.lit(1.0) - p, F.lit(1e-12)))
                )
            ).alias("loss"),
        ).collect()[0]
        step = lr / (1.0 + t / 4.0)
        w = [
            wi - step * ((row[f"g{i}"] or 0.0) / n + l2 * wi)
            for i, wi in enumerate(w)
        ]
        b -= step * (row["gb"] or 0.0) / n
        losses.append(row["loss"])

    # fold standardization back into original-space weights:
    # margin = b + Σ w_i (x_i - m_i)/s_i  =  (b - Σ w_i m_i/s_i) + Σ (w_i/s_i) x_i
    w_orig = [wi / si for wi, si in zip(w, std)]
    b_orig = b - sum(wi * mi / si for wi, mi, si in zip(w, mean, std))
    return {"weights": w_orig, "bias": b_orig, "losses": losses}


def score_logreg(
    df: DataFrame,
    model: dict,
    feature_cols: list[str],
    out_col: str = "quality_score",
) -> DataFrame:
    """Append the model's probability — a literal dot product + sigmoid,
    pure Catalyst projection (no shuffle, no Python)."""
    margin = _margin(feature_cols, model["weights"], model["bias"])
    return df.withColumn(out_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-margin)))


def accuracy(df: DataFrame, score_col: str, label_col: str, threshold: float = 0.5):
    """Fraction of rows where thresholded score equals the 0/1 label."""
    pred = (F.col(score_col) >= threshold).cast("int")
    row = df.select(
        F.avg((pred == F.col(label_col).cast("int")).cast("double")).alias("acc")
    ).collect()[0]
    return row["acc"]
