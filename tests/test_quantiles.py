"""Mergeable quantile sketch: exactness below k, rank-error bounds under
compaction, weight conservation, merge validity, determinism, and JSON
round-trip."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from nexus_event_stream_spark.operators.quantiles import (
    QuantileSketch,
    _Compactor,
    quantile_merge,
    quantile_sketch,
)


def _rank_errors(sk: QuantileSketch, data: np.ndarray) -> float:
    """Max normalized distance from q·n to the TRUE RANK INTERVAL of the
    returned quantile value. A tied value occupies a rank interval
    [left, right); any q landing inside it is exact by definition."""
    data = np.sort(data)
    n = len(data)
    worst = 0.0
    for q in np.linspace(0.01, 0.99, 33):
        x = sk.quantile(float(q))
        left = np.searchsorted(data, x, side="left")
        right = np.searchsorted(data, x, side="right")
        t = q * n
        err = max(0.0, left - t, t - right)
        worst = max(worst, err / n)
    return worst


def test_exact_when_under_capacity():
    c = _Compactor(k=256)
    vals = np.arange(100, dtype=np.float64)
    c.extend(vals)
    sk = QuantileSketch(
        k=256, n=100, lo=0.0, hi=99.0,
        levels=tuple(tuple(l) for l in c.levels),
    )
    assert sk.quantile(0.5) == pytest.approx(49.0, abs=1)
    assert sk.quantile(0.0) == 0.0 and sk.quantile(1.0) == 99.0
    v, w = sk._weighted()
    assert int(w.sum()) == 100 and len(v) == 100


def test_weight_conserved_under_compaction():
    c = _Compactor(k=64)
    n = 100_003  # odd on purpose — exercises the withheld-element path
    c.extend((np.arange(n) * 2654435761 % 1_000_000).astype(np.float64))
    total = sum(len(lvl) << h for h, lvl in enumerate(c.levels))
    assert total == n


@pytest.mark.parametrize("dist", ["uniform", "zipfish", "constant_heavy"])
def test_rank_error_bound(dist):
    n, k = 200_000, 256
    base = (np.arange(n) * 2654435761 % n).astype(np.float64) / n
    if dist == "uniform":
        data = base
    elif dist == "zipfish":
        data = 1.0 / (base + 1e-4)
    else:
        data = np.where(base < 0.5, 7.0, base)  # 50 % duplicated point
    c = _Compactor(k)
    c.extend(data)
    sk = QuantileSketch(
        k=k, n=n, lo=float(data.min()), hi=float(data.max()),
        levels=tuple(tuple(l) for l in c.levels),
    )
    # deterministic-offset compaction: comfortably under 2 % at k=256
    assert _rank_errors(sk, data) <= 0.02, dist


def test_distributed_build_matches_local(spark):
    n = 50_000
    df = spark.range(0, n, 1, 8).select(
        (F.pmod(F.xxhash64("id"), F.lit(10_000)).cast("double") / 100.0).alias(
            "v"
        )
    )
    sk = quantile_sketch(df, "v", k=256)
    data = np.array([r["v"] for r in df.collect()])
    assert sk.n == n
    assert sk.lo == data.min() and sk.hi == data.max()
    assert _rank_errors(sk, data) <= 0.02
    v, w = sk._weighted()
    assert int(w.sum()) == n  # weight exactness survives the merge


def test_nulls_and_empty(spark):
    df = spark.createDataFrame(
        [(1.0,), (None,), (3.0,), (None,)], "v double"
    )
    sk = quantile_sketch(df, "v")
    assert sk.n == 2 and sk.lo == 1.0 and sk.hi == 3.0
    empty = quantile_sketch(
        spark.createDataFrame([], "v double"), "v"
    )
    assert empty.n == 0
    with pytest.raises(ValueError):
        empty.quantile(0.5)


def test_merge_is_valid_and_weight_exact(spark):
    a_data = (np.arange(30_000) * 2654435761 % 10_000).astype(np.float64)
    b_data = (np.arange(20_000) * 40503 % 10_000).astype(np.float64) + 5_000
    ca, cb = _Compactor(128), _Compactor(128)
    ca.extend(a_data)
    cb.extend(b_data)
    a = QuantileSketch(
        128, len(a_data), float(a_data.min()), float(a_data.max()),
        tuple(tuple(l) for l in ca.levels),
    )
    b = QuantileSketch(
        128, len(b_data), float(b_data.min()), float(b_data.max()),
        tuple(tuple(l) for l in cb.levels),
    )
    m = quantile_merge(a, b)
    both = np.concatenate([a_data, b_data])
    assert m.n == 50_000
    assert m.lo == both.min() and m.hi == both.max()
    v, w = m._weighted()
    assert int(w.sum()) == 50_000
    assert _rank_errors(m, both) <= 0.03  # additive error, still small


def test_deterministic_rebuild(spark):
    df = spark.range(0, 20_000, 1, 4).select(
        F.pmod(F.xxhash64("id"), F.lit(999)).cast("double").alias("v")
    )
    s1 = quantile_sketch(df, "v", k=128)
    s2 = quantile_sketch(df, "v", k=128)
    assert s1 == s2  # replayed pipeline → identical sketch


def test_json_roundtrip():
    c = _Compactor(64)
    c.extend(np.arange(5_000, dtype=np.float64))
    sk = QuantileSketch(
        64, 5_000, 0.0, 4_999.0, tuple(tuple(l) for l in c.levels)
    )
    back = QuantileSketch.from_json(sk.to_json())
    assert back == sk
    with pytest.raises(ValueError):
        QuantileSketch.from_json('{"kind": "bogus"}')


def test_agrees_with_spark_percentile_on_documents(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.length("text").cast("double").alias("len")
    )
    sk = quantile_sketch(docs, "len", k=256)
    exact = docs.agg(
        F.expr("percentile(len, array(0.5, 0.9, 0.99))").alias("p")
    ).collect()[0]["p"]
    n = docs.count()
    data = np.array([r["len"] for r in docs.collect()])
    sdata = np.sort(data)
    for q, e in zip([0.5, 0.9, 0.99], exact):
        got = sk.quantile(q)
        # compare by rank-interval distance, not value distance
        left = np.searchsorted(sdata, got, side="left")
        right = np.searchsorted(sdata, got, side="right")
        assert max(0.0, left - q * n, q * n - right) / n <= 0.02
