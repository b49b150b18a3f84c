"""Count-Min Sketch (operators/cms.py): one-sided frequency estimates
and the rare-gram document scorer built on them.

Determinism note: xxhash64 is a fixed function, so for the fixed key
sets below the collision pattern — and therefore every assertion — is
reproducible, not probabilistic.
"""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from nexus_event_stream_spark.operators.cms import (
    CMSketch,
    cms_build,
    cms_build_for,
    cms_estimate,
    cms_merge,
    cms_params,
    rare_gram_frac,
)

ITEMS = (
    ["alpha"] * 7 + ["beta"] * 3 + ["gamma"] * 1 + ["delta"] * 12
    + [f"unique_{i}" for i in range(20)]
)


def _items_df(spark, items):
    return spark.createDataFrame([(x,) for x in items], "k string")


def _estimates(spark, sk, keys):
    probe = spark.createDataFrame([(x,) for x in keys], "k string")
    rows = probe.select("k", cms_estimate(sk, "k").alias("est")).collect()
    return {r.k: r.est for r in rows}


def test_estimates_never_undercount_and_match_at_low_load(spark):
    sk = cms_build(_items_df(spark, ITEMS), "k", w=512, d=4)
    true = Counter(ITEMS)
    est = _estimates(spark, sk, list(true))
    for k, t in true.items():
        assert est[k] >= t  # the CMS invariant, always
        assert est[k] == t  # and exact at this load (fixed keys, w=512)
    assert sk.n_total == len(ITEMS)


def test_merge_is_cellwise_exact(spark):
    half = len(ITEMS) // 2
    a = cms_build(_items_df(spark, ITEMS[:half]), "k", w=256, d=3)
    b = cms_build(_items_df(spark, ITEMS[half:]), "k", w=256, d=3)
    full = cms_build(_items_df(spark, ITEMS), "k", w=256, d=3)
    merged = cms_merge(a, b)
    assert merged.rows == full.rows
    assert merged.n_total == full.n_total
    with pytest.raises(ValueError):
        cms_merge(a, cms_build(_items_df(spark, ITEMS), "k", w=128, d=3))


def test_weighted_build_and_json_roundtrip(spark):
    df = spark.createDataFrame(
        [("x", 5), ("y", 2), ("x", 1)], "k string, w long"
    )
    sk = cms_build(df, "k", w=64, d=3, weight=F.col("w"))
    assert sk.n_total == 8
    est = _estimates(spark, sk, ["x", "y"])
    assert est["x"] >= 6 and est["y"] >= 2
    rt = CMSketch.from_dict(sk.to_dict())
    assert rt == sk


def test_cms_params_and_sizing(spark):
    w, d = cms_params(epsilon=0.01, delta=0.01)
    assert w >= 272 and d == 5  # ceil(e/0.01), ceil(ln 100)
    sk = cms_build_for(
        _items_df(spark, ITEMS), "k", epsilon=0.05, delta=0.1
    )
    assert (sk.w, sk.d) == (55, 3)
    with pytest.raises(ValueError):
        cms_params(epsilon=0.0)


def test_rare_gram_frac_matches_true_count_oracle(spark):
    common = "the model trains on large corpora"  # appears in every doc
    docs = [
        (0, common),
        (1, common + " with unique suffix words here"),
        (2, "entirely novel sentence about bloom filters today"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    sk = cms_build(
        df.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, greatest(size(split(text,' '))-2,0)),"
                    " i -> concat_ws(' ', slice(split(text,' '), i, 3)))"
                )
            ).alias("g")
        ),
        "g",
        w=1024,
        d=4,
    )
    out = {
        r.doc_id: r
        for r in rare_gram_frac(df, sk, n=3, min_count=2).collect()
    }
    # Python oracle over TRUE counts (no collisions at this load)
    grams = {}
    for _, t in docs:
        w = t.split(" ")
        for i in range(len(w) - 2):
            g = " ".join(w[i : i + 3])
            grams[g] = grams.get(g, 0) + 1
    for doc_id, t in docs:
        w = t.split(" ")
        gs = [" ".join(w[i : i + 3]) for i in range(len(w) - 2)]
        rare = sum(grams[g] < 2 for g in gs)
        r = out[doc_id]
        assert (r.n_grams, r.rare_grams) == (len(gs), rare)
        assert r.rare_gram_frac == pytest.approx(rare / max(len(gs), 1))


def test_rare_gram_probe_is_map_side_only(spark):
    df = spark.createDataFrame([(0, "a b c d")], "doc_id long, text string")
    sk = cms_build(df, "text", w=64, d=3)
    plan = (
        rare_gram_frac(df, sk)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Python" not in plan
