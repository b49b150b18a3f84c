"""Deterministic sampling operators: replayability, exact strata counts,
monotone sample growth."""

from __future__ import annotations

from nexus_event_stream_spark.io import load_table
from nexus_event_stream_spark.operators.sampling import (
    hash_sample,
    stratified_sample_exact,
)

SF_DIR = "/root/testdata/sf0.001"


def test_hash_sample_deterministic_and_near_rate(spark):
    ev = load_table(spark, SF_DIR, "events")
    a = {r["event_id"] for r in hash_sample(ev, "event_id", 10).collect()}
    b = {r["event_id"] for r in hash_sample(ev, "event_id", 10).collect()}
    assert a == b  # replayable across runs/retries
    total = ev.count()
    assert 0.05 * total < len(a) < 0.15 * total  # ~10%


def test_hash_sample_grows_monotonically(spark):
    ev = load_table(spark, SF_DIR, "events")
    p10 = {r["event_id"] for r in hash_sample(ev, "event_id", 10).collect()}
    p20 = {r["event_id"] for r in hash_sample(ev, "event_id", 20).collect()}
    assert p10 < p20  # a bigger sample strictly contains the smaller one


def test_stratified_exact_counts_and_short_strata(spark):
    ev = load_table(spark, SF_DIR, "events")
    n = 25
    out = stratified_sample_exact(ev, "event_type", n, "event_id")
    counts = {
        r["event_type"]: r["count"]
        for r in out.groupBy("event_type").count().collect()
    }
    full = {
        r["event_type"]: r["count"]
        for r in ev.groupBy("event_type").count().collect()
    }
    assert counts == {t: min(n, c) for t, c in full.items()}


def test_stratified_sample_is_subset_of_larger(spark):
    ev = load_table(spark, SF_DIR, "events")
    small = {
        r["event_id"]
        for r in stratified_sample_exact(ev, "event_type", 5, "event_id").collect()
    }
    big = {
        r["event_id"]
        for r in stratified_sample_exact(ev, "event_type", 20, "event_id").collect()
    }
    assert small < big  # hash-rank order is stable → monotone growth


def test_stratified_rank_pushed_below_shuffle(spark):
    ev = load_table(spark, SF_DIR, "events")
    df = stratified_sample_exact(ev, "event_type", 10, "event_id")
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    # rank<=n pre-drops rows map-side — shuffle bytes bounded by n·strata
    assert "WindowGroupLimit" in plan


# ---------------------------------------------------------------------------
# deterministic corpus mixture
# ---------------------------------------------------------------------------

import pytest

from nexus_event_stream_spark.operators.sampling import (  # noqa: E402
    KNUTH,
    M31,
    M32,
    mix_corpus,
)


def _ref_copies(key, src, weights, salt=0):
    """Pure-Python twin of mix_corpus's copy count."""
    if src not in weights:
        return 0
    w = weights[src]
    base, frac = int(w), round((w - int(w)) * 1_000_000)
    salted = (key + salt * 1_000_003) % M31
    bucket = ((salted % M31) * KNUTH % M32) % 1_000_000
    return base + (1 if bucket < frac else 0)


def _mix_df(spark):
    rows = [(i, "wiki" if i % 3 == 0 else ("crawl" if i % 3 == 1 else "code"))
            for i in range(600)]
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_mix_corpus_matches_python_reference_exactly(spark):
    weights = {"wiki": 2.5, "crawl": 0.25, "code": 1.0}
    got = {}
    for r in mix_corpus(_mix_df(spark), weights).collect():
        got[(r.doc_id, r.source)] = max(got.get((r.doc_id, r.source), 0), r.copy_id)
    for i in range(600):
        src = "wiki" if i % 3 == 0 else ("crawl" if i % 3 == 1 else "code")
        expect = _ref_copies(i, src, weights)
        assert got.get((i, src), 0) == expect, (i, src)


def test_mix_corpus_rates_and_copy_ids(spark):
    weights = {"wiki": 2.5, "crawl": 0.25}
    out = mix_corpus(_mix_df(spark), weights).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    # 200 wiki docs x 2.5 -> ~500 rows; 200 crawl x 0.25 -> ~50 rows
    assert 440 <= len(by_src["wiki"]) <= 560
    assert 30 <= len(by_src["crawl"]) <= 70
    assert "code" not in by_src  # absent from the recipe -> dropped
    # copy_ids are 1..copies per doc, rows unique on (doc, copy)
    keys = [(r.doc_id, r.copy_id) for r in out]
    assert len(keys) == len(set(keys))
    # replayable: second run is the identical multiset
    again = [(r.doc_id, r.source, r.copy_id)
             for r in mix_corpus(_mix_df(spark), weights).collect()]
    assert sorted(again) == sorted((r.doc_id, r.source, r.copy_id) for r in out)


def test_mix_corpus_salt_decorrelates_gate(spark):
    weights = {"wiki": 0.5, "crawl": 0.5, "code": 0.5}
    a = {r.doc_id for r in mix_corpus(_mix_df(spark), weights, salt=0).collect()}
    b = {r.doc_id for r in mix_corpus(_mix_df(spark), weights, salt=7).collect()}
    assert a != b  # different gate...
    assert 200 <= len(b) <= 400  # ...same target rate


def test_mix_corpus_rejects_bad_recipes(spark):
    with pytest.raises(ValueError):
        mix_corpus(_mix_df(spark), {"wiki": -1.0})
    with pytest.raises(ValueError):
        mix_corpus(_mix_df(spark), {})


def test_mix_corpus_no_shuffle(spark):
    out = mix_corpus(_mix_df(spark), {"wiki": 1.5})
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert plan.count(") Exchange") == 0


# ------------------------------------------------------- weighted (ES) sample


from nexus_event_stream_spark.operators.sampling import (  # noqa: E402
    KNUTH,
    M31,
    M32,
    weighted_sample,
)


def _wdf(spark, n=2000):
    from pyspark.sql import functions as F

    # half the corpus at weight 4.0, half at 1.0
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, 4.0).otherwise(1.0).alias("w"),
    )


def test_weighted_sample_matches_python_reference(spark):
    import math

    df = _wdf(spark)
    k = 300
    got = {r["doc_id"] for r in weighted_sample(df, "w", k, "doc_id").collect()}
    rows = df.collect()
    scored = sorted(
        (
            -math.log((((i["doc_id"] % M31) * KNUTH) % M32 + 0.5) / M32)
            / i["w"],
            i["doc_id"],
        )
        for i in rows
    )
    want = {d for _s, d in scored[:k]}
    assert got == want


def test_weighted_sample_exact_size_and_replayable(spark):
    df = _wdf(spark)
    a = sorted(r["doc_id"] for r in weighted_sample(df, "w", 250, "doc_id").collect())
    b = sorted(r["doc_id"] for r in weighted_sample(df, "w", 250, "doc_id").collect())
    assert a == b and len(a) == 250


def test_weighted_sample_prefix_property(spark):
    df = _wdf(spark)
    small = {r["doc_id"] for r in weighted_sample(df, "w", 100, "doc_id").collect()}
    large = {r["doc_id"] for r in weighted_sample(df, "w", 400, "doc_id").collect()}
    assert small <= large


def test_weighted_sample_biases_toward_weight(spark):
    """Weight-4 docs are half the corpus; in a k=500 of n=2000 draw their
    expected share is ~0.7-0.8 (π_i ≈ k·w_i/W with saturation). A hard
    top-k-by-weight would give 1.0; unweighted 0.5. Deterministic —
    same hashes every run."""
    sample = weighted_sample(_wdf(spark), "w", 500, "doc_id").collect()
    heavy = sum(1 for r in sample if r["doc_id"] % 2 == 0) / len(sample)
    assert 0.6 < heavy < 0.95


def test_weighted_sample_excludes_nonpositive_and_exhausts(spark):
    from pyspark.sql import functions as F

    df = spark.range(10).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 3, 0.0).otherwise(2.0).alias("w"),
    )
    got = weighted_sample(df, "w", 100, "doc_id").collect()
    assert sorted(r["doc_id"] for r in got) == list(range(3, 10))


def test_weighted_sample_null_keys_never_win(spark):
    """A NULL key → NULL score; ascending sort is NULLS FIRST, so without
    the guard unkeyed rows would deterministically fill the top-k."""
    from pyspark.sql import functions as F

    df = spark.range(100).select(
        F.when(F.col("id") < 5, None).otherwise(F.col("id")).alias("doc_id"),
        F.lit(1.0).alias("w"),
    )
    got = weighted_sample(df, "w", 10, "doc_id").collect()
    assert len(got) == 10
    assert all(r["doc_id"] is not None for r in got)


def test_weighted_sample_plan_is_bounded_topk(spark):
    df = _wdf(spark)
    plan = (
        weighted_sample(df, "w", 50, "doc_id")
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan  # no shuffle of the corpus


def test_weighted_sample_per_group_matches_global_on_each_group(spark):
    """Per-group result == running weighted_sample separately per group
    (same keys, same order) — and WindowGroupLimit bounds the window."""
    from pyspark.sql import functions as F

    from nexus_event_stream_spark.operators.sampling import (
        weighted_sample_per_group,
    )

    df = _wdf(spark).withColumn("lang", (F.col("doc_id") % 3).cast("string"))
    got = weighted_sample_per_group(df, "lang", "w", 40, "doc_id")
    for g in ["0", "1", "2"]:
        solo = {
            r["doc_id"]
            for r in weighted_sample(
                df.filter(F.col("lang") == g), "w", 40, "doc_id"
            ).collect()
        }
        grouped = {
            r["doc_id"]
            for r in got.filter(F.col("lang") == g).collect()
        }
        assert grouped == solo, g
    plan = got._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "WindowGroupLimit" in plan


def test_temperature_mixture_weights_math(spark):
    from nexus_event_stream_spark.operators.sampling import (
        mix_corpus,
        temperature_mixture_weights,
    )

    sizes = {"big": 8000.0, "mid": 1500.0, "small": 500.0}
    # alpha=1: natural proportions → every weight exactly 1 (a no-op mix)
    w1 = temperature_mixture_weights(sizes, alpha=1.0)
    assert all(v == pytest.approx(1.0) for v in w1.values())
    # alpha=0: uniform across sources — each source's expected mass is
    # total/3, so weight = (total/3)/size
    w0 = temperature_mixture_weights(sizes, alpha=0.0)
    total = sum(sizes.values())
    for s, n in sizes.items():
        assert w0[s] == pytest.approx((total / 3) / n)
    # 0<alpha<1: monotone — smaller sources get strictly larger weights,
    # expected output mass == input total
    w = temperature_mixture_weights(sizes, alpha=0.3)
    assert w["small"] > w["mid"] > w["big"]
    assert sum(w[s] * sizes[s] for s in sizes) == pytest.approx(total)
    # target_total rescales linearly
    w2 = temperature_mixture_weights(sizes, alpha=0.3, target_total=2 * total)
    for s in sizes:
        assert w2[s] == pytest.approx(2 * w[s])
    # validation
    with pytest.raises(ValueError):
        temperature_mixture_weights(sizes, alpha=-0.1)
    with pytest.raises(ValueError):
        temperature_mixture_weights({"a": 0})
    # end-to-end: the realized mix matches the smoothed shares within
    # the fractional-gate tolerance
    rows = [(i, "big" if i < 800 else ("mid" if i < 950 else "small"))
            for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    counts = {"big": 800.0, "mid": 150.0, "small": 50.0}
    wts = temperature_mixture_weights(counts, alpha=0.3)
    mixed = mix_corpus(df, wts).groupBy("source").count().collect()
    got = {r["source"]: int(r["count"]) for r in mixed}
    p = {s: n / 1000 for s, n in counts.items()}
    z = sum(v**0.3 for v in p.values())
    for s in counts:
        want = (p[s] ** 0.3 / z) * 1000
        assert abs(got[s] - want) <= max(3, 0.05 * want), (s, got[s], want)
