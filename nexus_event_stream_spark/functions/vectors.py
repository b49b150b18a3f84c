"""Vector math over ``array<float>`` embedding columns — pure Catalyst.

Design note (determinism at scale): float dot-products are order-sensitive,
which breaks cross-engine verification and makes distributed re-runs
non-reproducible. We therefore compute similarity on *quantized integer*
vectors: each component is rounded to ``10^-scale`` and the dot product is
an exact BIGINT sum — bit-identical on any engine, any partitioning, any
reduction order. Cosine is then a single double division of exact integers.
Quantization error at scale=4 is ~1e-4 relative — far below any meaningful
similarity threshold.

All expressions are ``zip_with``/``aggregate`` higher-order functions:
JVM-side, no UDF, no Arrow transfer.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def quantize(col: Column | str, scale: int = 4) -> Column:
    """array<float> → array<bigint> of components rounded to 10^-scale."""
    c = F.col(col) if isinstance(col, str) else col
    factor = F.lit(float(10**scale))
    return F.transform(c, lambda x: F.round(x.cast("double") * factor, 0).cast("bigint"))


def int_dot(a: Column, b: Column) -> Column:
    """Exact integer dot product of two array<bigint> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )


def cosine_similarity(a: Column | str, b: Column | str, scale: int = 4) -> Column:
    """Deterministic cosine similarity of two array<float> columns.

    dot/sqrt(aa*bb) over quantized integers; zero-norm → NULL (div by zero
    under non-ANSI). Baseline path for brute-force similarity search; the
    LSH-bucketed variant (operators/similarity.py) reuses it per bucket.
    """
    qa = quantize(a, scale)
    qb = quantize(b, scale)
    dot = int_dot(qa, qb).cast("double")
    na = int_dot(qa, qa).cast("double")
    nb = int_dot(qb, qb).cast("double")
    return dot / F.sqrt(na * nb)
