"""Semantic dedup (operators/semdedup.py) vs a driver-side numpy oracle.

Strategy: the driver embeddings are near-random (pairwise cosine « eps),
so the tests PLANT duplicate groups — tiny deterministic perturbations of
chosen base vectors — and check (a) recall 1.0 on the planted groups,
(b) the pair set is EXACTLY the all-pairs oracle restricted to
same-cluster pairs (the documented SemDeDup approximation boundary),
(c) the farthest-from-centroid keeper policy matches the oracle including
tie-breaks, (d) the mapping is partition-independent, and (e) the banded
skew fallback still collapses the planted groups when one cluster holds
the whole corpus.

The HARNESS centralizes 545×64 floats for the oracle; the operator under
test never collects anything corpus-sized.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import types as T

from nexus_event_stream_spark.io import load_table
from nexus_event_stream_spark.operators.semdedup import (
    centroid_distances,
    derived_n_clusters,
    semantic_dedup,
    semantic_dedup_pairs,
)
from nexus_event_stream_spark.operators.similarity import ivf_train_centroids

SF_DIR = "/root/testdata/sf0.001"
EPS = 0.99
N_PLANT = 15  # planted groups of 3 (base + 2 perturbed mirrors)

_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ]
)


@pytest.fixture(scope="module")
def corpus(spark):
    """(df, ids ndarray, vecs ndarray) — 500 driver vectors + 45 planted
    mirrors (ids 1_000_000·r + base_id for r in 1,2)."""
    rows = (
        load_table(spark, SF_DIR, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = [int(r.vec_id) for r in rows]
    vecs = [np.array(r.embedding, dtype=np.float64) for r in rows]
    rng = np.random.default_rng(42)
    base = sorted(ids)[:N_PLANT]
    by_id = {int(r.vec_id): np.array(r.embedding, np.float64) for r in rows}
    for r in (1, 2):
        for b in base:
            ids.append(1_000_000 * r + b)
            vecs.append(by_id[b] + 1e-3 * rng.standard_normal(len(by_id[b])))
    x = np.stack(vecs)
    ids = np.array(ids, dtype=np.int64)
    df = spark.createDataFrame(
        [(int(i), v.tolist()) for i, v in zip(ids, x)], _SCHEMA
    )
    order = np.argsort(ids)
    return df, ids[order], x[order]


@pytest.fixture(scope="module")
def centroids(corpus):
    df, _, _ = corpus
    return ivf_train_centroids(df, n_centroids=8, iters=3)


def _oracle(ids, x, cents, eps=EPS):
    """All-pairs cosine oracle + cluster assignment + components/keepers."""
    xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-300)
    s = xn @ xn.T
    assign = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(2).argmin(1)
    cdist = np.linalg.norm(x - cents[assign], axis=1)
    n = len(ids)
    in_cluster_pairs = {}
    parent = {int(i): int(i) for i in ids}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for i in range(n):
        for j in range(i + 1, n):
            if s[i, j] >= eps and assign[i] == assign[j]:
                a, b = int(min(ids[i], ids[j])), int(max(ids[i], ids[j]))
                in_cluster_pairs[(a, b)] = s[i, j]
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    comps: dict[int, list[int]] = {}
    for i in ids:
        comps.setdefault(find(int(i)), []).append(int(i))
    dist_of = {int(i): float(d) for i, d in zip(ids, cdist)}
    keep = {}
    for members in comps.values():
        k = min(members, key=lambda m: (-dist_of[m], m))
        for m in members:
            keep[m] = k
    return in_cluster_pairs, keep, assign, dist_of


def test_pairs_match_in_cluster_oracle_exactly(corpus, centroids):
    df, ids, x = corpus
    want, _, _, _ = _oracle(ids, x, centroids)
    got = {
        (int(r.id_a), int(r.id_b)): float(r.cos)
        for r in semantic_dedup_pairs(df, centroids, eps=EPS).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9)
    # the planted mirrors are actually in there (not a vacuous pass)
    assert len(want) >= N_PLANT * 2


def test_planted_groups_collapse_and_keeper_policy(corpus, centroids):
    df, ids, x = corpus
    _, want_keep, _, _ = _oracle(ids, x, centroids)
    got = {
        int(r.vec_id): int(r.keep_id)
        for r in semantic_dedup(df, eps=EPS, centroids=centroids).collect()
    }
    assert got == want_keep
    # recall 1.0 on the planted groups: every mirror collapses to its base
    # group's keeper (same-cluster by construction — tiny perturbation)
    for b in sorted(set(i for i in ids if i < 1_000_000))[:N_PLANT]:
        trio = [b, 1_000_000 + b, 2_000_000 + b]
        assert len({got[t] for t in trio}) == 1, trio
    # non-duplicates keep themselves
    singles = [i for i, k in want_keep.items() if k == i and i < 1_000_000]
    assert len(singles) >= 400


def test_min_id_policy_and_partition_independence(corpus, centroids):
    df, ids, x = corpus
    pairs_oracle, _, _, _ = _oracle(ids, x, centroids)
    got = {
        int(r.vec_id): int(r.keep_id)
        for r in semantic_dedup(
            df.repartition(7), eps=EPS, centroids=centroids, keep="min_id"
        ).collect()
    }
    got1 = {
        int(r.vec_id): int(r.keep_id)
        for r in semantic_dedup(
            df.coalesce(1), eps=EPS, centroids=centroids, keep="min_id"
        ).collect()
    }
    assert got == got1  # partition-independent
    # min_id: paired docs share a keeper, and it is ≤ the pair minimum
    for (a, b) in pairs_oracle:
        assert got[a] == got[b]
        assert got[b] <= a


def test_banded_fallback_still_catches_planted_dups(corpus):
    """One cluster holding the whole corpus + a small band: the planted
    mirrors sit adjacent in (centroid-distance, id) order, so the banded
    comparison still finds them while bounding the work at O(n·band)."""
    df, ids, x = corpus
    one = np.mean(x, axis=0, keepdims=True)  # single centroid
    pairs = semantic_dedup_pairs(
        df, one, eps=EPS, max_pairwise=32
    ).collect()
    got_pairs = {(int(r.id_a), int(r.id_b)) for r in pairs}
    for b in sorted(set(int(i) for i in ids if i < 1_000_000))[:N_PLANT]:
        trio = [b, 1_000_000 + b, 2_000_000 + b]
        hits = [
            p
            for p in got_pairs
            if p[0] in trio and p[1] in trio
        ]
        # enough pairs to connect the trio into one component
        assert len(hits) >= 2, (b, hits)


def test_centroid_distances_matches_oracle(corpus, centroids):
    df, ids, x = corpus
    _, _, assign, dist_of = _oracle(ids, x, centroids)
    rows = centroid_distances(df, centroids).collect()
    assert len(rows) == len(ids)
    by_id = {int(i): (int(a), ) for i, a in zip(ids, assign)}
    for r in rows:
        assert int(r.centroid_id) == by_id[int(r.vec_id)][0]
        assert float(r.cdist) == pytest.approx(dist_of[int(r.vec_id)], abs=1e-9)


def test_keep_validation():
    with pytest.raises(ValueError):
        semantic_dedup(None, keep="nope")


def test_derived_n_clusters_math():
    """k ≈ n/avg_cluster_size, clamped to [1, max_clusters], monotone."""
    assert derived_n_clusters(0) == 1
    assert derived_n_clusters(1) == 1
    assert derived_n_clusters(4096) == 1
    assert derived_n_clusters(4097) == 2
    assert derived_n_clusters(545, avg_cluster_size=64) == 9
    assert derived_n_clusters(10**12) == 1 << 20  # driver-state ceiling
    assert derived_n_clusters(10**9, max_clusters=100) == 100
    # linear-k regime: n²/k = n·avg stays proportional to n
    for n in (10_000, 100_000, 1_000_000):
        k = derived_n_clusters(n, avg_cluster_size=2048)
        assert n / k <= 2048  # expected cluster size never above the knob


def test_cluster_size_distribution_under_derived_k(corpus):
    """With k derived from the corpus (avg 64 → k=9 on 545 vectors), the
    realized k-means cluster sizes stay near the target: no cluster
    exceeds a small multiple of avg_cluster_size, so the per-cluster
    pairwise GEMM term is bounded — the whole point of deriving k."""
    from nexus_event_stream_spark.operators.semdedup import derived_n_clusters
    from nexus_event_stream_spark.operators.similarity import ivf_assign

    df, ids, _ = corpus
    n = len(ids)
    avg = 64
    k = derived_n_clusters(n, avg_cluster_size=avg)
    assert k == 9
    cents = ivf_train_centroids(df, n_centroids=k, iters=3)
    sizes = (
        ivf_assign(df, cents)
        .groupBy("centroid_id")
        .count()
        .collect()
    )
    total = sum(int(r["count"]) for r in sizes)
    assert total == n
    biggest = max(int(r["count"]) for r in sizes)
    # bounded pairwise work: worst cluster ≤ 4× the target average
    assert biggest <= 4 * avg, [int(r["count"]) for r in sizes]
    # and the exact-GEMM cap is never hit at the derived k
    assert biggest <= 4096


def test_auto_k_semantic_dedup_collapses_planted(corpus):
    """n_clusters=None derives k from the corpus count (545 → k=1 at the
    default avg 4096 → single-cluster exact GEMM) and still collapses the
    planted mirror trios to one keeper each."""
    df, ids, _ = corpus
    got = {
        int(r.vec_id): int(r.keep_id)
        for r in semantic_dedup(df, eps=EPS, keep="min_id").collect()
    }
    assert len(got) == len(ids)
    for b in sorted(int(i) for i in ids if i < 1_000_000)[:N_PLANT]:
        trio = [b, 1_000_000 + b, 2_000_000 + b]
        assert got[trio[0]] == got[trio[1]] == got[trio[2]] == b
