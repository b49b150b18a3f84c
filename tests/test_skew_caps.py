"""Skew caps — the 100 TB defense for degenerate LSH buckets and
stop-grams, pinned on pathological corpora.

A web corpus full of boilerplate produces (a) one LSH bucket holding
every copy of the boilerplate — the unguarded bucket self-join is
quadratic on exactly that key — and (b) stop-grams shared by every
in-block doc, which make the posting self-join quadratic on one gram.
These tests pin that the caps bound the pair space structurally, that
they change NOTHING when no key is hot (result-identity — the catalog's
value-oracled queries run with caps off and must stay equivalent to the
capped operator on clean data), and that dedup clustering still groups
all boilerplate copies together (the star fallback preserves
connectivity through the hub).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from nexus_event_stream_spark.operators.dedup import (
    dedup_groups,
    minhash_dedup,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
)
from nexus_event_stream_spark.operators.similarity import ann_topk_per_vector

DOC_SCHEMA = "doc_id long, text string, source string"

BOILER = (
    "this website uses cookies to improve your experience please accept "
    "our terms of service and privacy policy before you continue reading "
    "the article below thank you for visiting our site today"
)
DISTINCT_TEXTS = [
    "the quick brown fox jumps over the lazy dog near the river bank",
    "colorless green ideas sleep furiously under a pale winter moon",
    "distributed query engines shuffle columnar batches across executors",
    "watermarks bound state growth in stateful stream processing jobs",
]
N_BOILER = 120


@pytest.fixture(scope="module")
def pathological(spark):
    """120 identical boilerplate docs + 4 distinct docs, one block."""
    rows = [(i, BOILER, "s1") for i in range(N_BOILER)]
    rows += [(1000 + j, t, "s1") for j, t in enumerate(DISTINCT_TEXTS)]
    return spark.createDataFrame(rows, DOC_SCHEMA)


# ---------------------------------------------------------------------------
# MinHash-LSH hot-bucket cap
# ---------------------------------------------------------------------------


def pair_set(df):
    return {(r["doc_a"], r["doc_b"]) for r in df.collect()}


def test_hot_bucket_cap_bounds_candidates(spark, pathological):
    sigs = minhash_signatures(pathological)
    uncapped = minhash_lsh_candidates(sigs, 4, 4).count()
    capped = pair_set(minhash_lsh_candidates(sigs, 4, 4, max_bucket_size=10))
    # identical docs share identical signatures → one bucket per band with
    # all 120 members: uncapped is the full clique, capped is the star.
    assert uncapped >= N_BOILER * (N_BOILER - 1) // 2
    star = {(0, i) for i in range(1, N_BOILER)}
    assert star <= capped
    # bound: star pairs + whatever small-bucket pairs exist — nowhere near
    # quadratic. (The 4 distinct docs don't collide with anything.)
    assert len(capped) < 2 * N_BOILER


def test_hot_bucket_star_preserves_dedup_clusters(spark, pathological):
    pairs = minhash_dedup(
        pathological, num_perm=16, shingle_n=3, bands=4, threshold=0.5,
        max_bucket_size=10,
    )
    groups = {
        r["doc_id"]: r["keep_id"]
        for r in dedup_groups(pathological, pairs).collect()
    }
    # every boilerplate copy maps to the hub (min id 0) — connectivity
    # through the star is enough for the component to stay whole
    assert all(groups[i] == 0 for i in range(N_BOILER))
    # distinct docs remain their own representatives
    assert all(groups[1000 + j] == 1000 + j for j in range(len(DISTINCT_TEXTS)))


def test_hot_bucket_cap_identity_when_no_bucket_hot(spark):
    rows = [(i, t, "s1") for i, t in enumerate(DISTINCT_TEXTS)]
    rows.append((9, DISTINCT_TEXTS[0] + " extra", "s1"))  # one near-dup pair
    docs = spark.createDataFrame(rows, DOC_SCHEMA)
    sigs = minhash_signatures(docs)
    exact = pair_set(minhash_lsh_candidates(sigs, 4, 4))
    capped = pair_set(minhash_lsh_candidates(sigs, 4, 4, max_bucket_size=10))
    assert exact == capped and exact  # non-trivial and identical


def test_caps_result_identical_on_real_corpus(spark, sf_dir):
    """On the driver's documents table (no degenerate buckets at this
    scale), capped and uncapped pipelines produce IDENTICAL verified
    pairs — the 'proven result-identical' face of the skew knobs: turning
    them on in production costs nothing when data is clean."""
    from nexus_event_stream_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    exact = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in minhash_dedup(docs, threshold=0.05).collect()
    }
    capped = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in minhash_dedup(docs, threshold=0.05, max_bucket_size=64).collect()
    }
    assert exact == capped and exact

    exact_ng = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in ngram_jaccard_pairs(docs, ["source"], threshold=0.05).collect()
    }
    capped_ng = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in ngram_jaccard_pairs(
            docs, ["source"], threshold=0.05, max_gram_df=200
        ).collect()
    }
    assert exact_ng == capped_ng


# ---------------------------------------------------------------------------
# n-gram Jaccard hot-gram cap
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def stop_gram_docs(spark):
    """Every doc ends with the same boilerplate sentence (shared grams);
    only docs 0 and 1 are genuinely near-identical."""
    tail = " all rights reserved contact us for more information"
    bodies = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "alpha beta gamma delta epsilon zeta eta iota",  # near-dup of 0
        "completely different first body about parquet row groups",
        "another unrelated body mentioning adaptive query execution",
        "yet another body on broadcast joins and shuffle partitions",
    ]
    return spark.createDataFrame(
        [(i, b + tail, "s1") for i, b in enumerate(bodies)], DOC_SCHEMA
    )


def test_hot_gram_cap_drops_stop_gram_only_pairs(spark, stop_gram_docs):
    uncapped = pair_set(
        ngram_jaccard_pairs(stop_gram_docs, ["source"], threshold=0.01)
    )
    capped = ngram_jaccard_pairs(
        stop_gram_docs, ["source"], threshold=0.01, max_gram_df=4
    )
    capped_pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"] for r in capped.collect()
    }
    # uncapped: the shared tail connects EVERY pair (the quadratic trap)
    assert len(uncapped) == 10  # all C(5,2) pairs share the tail grams
    # capped: stop-grams (df=5 > 4) drop out; only the genuine near-dup
    # pair — connected by discriminative body grams — remains
    assert set(capped_pairs) == {(0, 1)}
    # and its jaccard is a lower bound of the exact value (full set sizes,
    # intersection over surviving grams only), still above threshold
    assert 0.1 < capped_pairs[(0, 1)] < 0.3


def test_hot_gram_cap_identity_when_no_gram_hot(spark):
    docs = spark.createDataFrame(
        [
            (0, "one unique sentence about catalyst optimizer rules", "s1"),
            (1, "one unique sentence about catalyst optimizer rules ok", "s1"),
            (2, "totally different third document body here", "s1"),
        ],
        DOC_SCHEMA,
    )
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, ["source"], threshold=0.05).collect()
    }
    capped = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            docs, ["source"], threshold=0.05, max_gram_df=2
        ).collect()
    }
    assert exact == capped and exact


# ---------------------------------------------------------------------------
# SRP (ANN) hot-bucket cap
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def clustered_vecs(spark):
    """60 near-identical vectors (one dense SRP bucket) + a few spread."""
    import math

    dim = 8
    rows = []
    for i in range(60):
        # tiny deterministic jitter around a fixed direction
        rows.append(
            (
                i,
                [1.0 + 0.001 * ((i * 7 + d) % 5) for d in range(dim)],
            )
        )
    for j in range(4):
        rows.append(
            (
                100 + j,
                [math.sin(0.5 * (j + 1) * (d + 1)) for d in range(dim)],
            )
        )
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_srp_cap_bounds_candidates_and_keeps_every_probe(spark, clustered_vecs):
    capped = ann_topk_per_vector(
        clustered_vecs, dim=8, k=1, bits=4, max_bucket_size=5
    )
    rows = capped.collect()
    got_ids = {r["vec_id"] for r in rows}
    # every clustered vector still gets a neighbor (probe side untouched)
    assert set(range(60)) <= got_ids
    # build side truncated to the 5 smallest ids per bucket → every
    # reported neighbor of a clustered vector is one of ids 0..4
    for r in rows:
        if r["vec_id"] < 60:
            assert r["neighbor_id"] < 5


def test_blocked_nn_cap_bounds_build_side(spark, clustered_vecs):
    """exact_top1_per_vector_blocked with one degenerate block: every
    vector still gets a neighbor, chosen among the cap smallest ids."""
    from nexus_event_stream_spark.operators.similarity import (
        exact_top1_per_vector_blocked,
    )

    vecs = clustered_vecs.withColumn(
        "label", F.when(F.col("vec_id") < 60, "hot").otherwise("cold")
    )
    out = exact_top1_per_vector_blocked(
        vecs, block_col="label", max_block_size=5
    ).collect()
    got = {r["vec_id"]: r["nn_id"] for r in out}
    assert set(range(60)) <= set(got)  # every hot-block vector ranked
    for v, nn in got.items():
        if v < 60:
            assert nn < 5  # build side = 5 smallest ids of the hot block

    # identity on the small block regardless of the cap
    uncapped = {
        r["vec_id"]: r["nn_id"]
        for r in exact_top1_per_vector_blocked(vecs, block_col="label").collect()
    }
    assert all(got[100 + j] == uncapped[100 + j] for j in range(4))


def test_simhash_pairs_cap_bounds_and_keeps_every_doc_probed(
    spark, pathological
):
    from nexus_event_stream_spark.operators.dedup import simhash_pairs

    uncapped = simhash_pairs(
        pathological, ["source"], max_hamming=0
    ).count()
    capped = simhash_pairs(
        pathological, ["source"], max_hamming=0, max_block_size=5
    ).collect()
    assert uncapped >= N_BOILER * (N_BOILER - 1) // 2  # the quadratic trap
    # bounded: every pair involves one of the 5 smallest ids
    assert len(capped) < 5 * (N_BOILER + len(DISTINCT_TEXTS))
    assert all(r["doc_a"] < 5 or r["doc_b"] < 5 for r in capped)
    # every boilerplate copy still appears in some pair (probed vs hub set)
    seen = {r["doc_a"] for r in capped} | {r["doc_b"] for r in capped}
    assert set(range(N_BOILER)) <= seen


def test_simhash_pairs_cap_identity_when_no_block_hot(spark):
    from nexus_event_stream_spark.operators.dedup import simhash_pairs

    docs = spark.createDataFrame(
        [(i, t, "s1") for i, t in enumerate(DISTINCT_TEXTS)]
        + [(9, DISTINCT_TEXTS[0] + " tail", "s1")],
        DOC_SCHEMA,
    )
    exact = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_pairs(docs, ["source"], max_hamming=6).collect()
    }
    capped = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_pairs(
            docs, ["source"], max_hamming=6, max_block_size=50
        ).collect()
    }
    assert exact == capped and exact


def test_srp_cap_composes_with_multiprobe(spark, clustered_vecs):
    """The two dials are orthogonal: multiprobe widens the probe side,
    the cap truncates the build side — together every vector still gets
    ranked and every neighbor comes from a cap set."""
    rows = ann_topk_per_vector(
        clustered_vecs, dim=8, k=1, bits=4, multiprobe=True, max_bucket_size=5
    ).collect()
    assert set(range(60)) <= {r["vec_id"] for r in rows}
    for r in rows:
        if r["vec_id"] < 60:
            assert r["neighbor_id"] < 5


def test_srp_cap_identity_when_bucket_small(spark, clustered_vecs):
    spread = clustered_vecs.filter(F.col("vec_id") >= 100)
    exact = {
        (r["vec_id"], r["neighbor_id"])
        for r in ann_topk_per_vector(spread, dim=8, k=1, bits=2).collect()
    }
    capped = {
        (r["vec_id"], r["neighbor_id"])
        for r in ann_topk_per_vector(
            spread, dim=8, k=1, bits=2, max_bucket_size=50
        ).collect()
    }
    assert exact == capped and exact
