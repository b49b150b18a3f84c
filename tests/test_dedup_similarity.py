"""Dedup + similarity operator behavior on constructed fixtures."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from nexus_event_stream_spark.operators.dedup import (
    exact_dedup,
    minhash_dedup,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from nexus_event_stream_spark.operators.similarity import (
    ann_topk_per_vector,
    brute_force_topk,
)

DOC_SCHEMA = "doc_id long, text string, source string"


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    near = "the quick brown fox jumps over the lazy dog near the river bank now"
    other = "completely different words about spark catalyst shuffles and parquet"
    return spark.createDataFrame(
        [
            (1, base, "s1"),
            (2, near, "s1"),  # near-dup of 1
            (3, base, "s1"),  # exact dup of 1
            (4, other, "s1"),
            (5, base, "s2"),  # exact dup in another block
        ],
        DOC_SCHEMA,
    )


def test_exact_dedup_groups(docs):
    out = {r["keep_id"]: r["n_copies"] for r in exact_dedup(docs).collect()}
    assert out[1] == 3  # docs 1, 3, 5 identical
    assert out[2] == 1 and out[4] == 1


def test_ngram_jaccard_finds_near_dup_within_block(docs):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, ["source"], threshold=0.3).collect()
    }
    assert pairs[(1, 3)] == 1.0  # exact dup
    assert 0.5 < pairs[(1, 2)] < 1.0  # near dup
    assert (1, 5) not in pairs  # different block, never compared
    assert (1, 4) not in pairs  # below threshold


def test_ngram_jaccard_refuses_unblocked(docs):
    with pytest.raises(ValueError):
        ngram_jaccard_pairs(docs, [])


def test_minhash_identical_docs_identical_sigs(docs):
    sigs = {r["doc_id"]: r["sig"] for r in minhash_signatures(docs).collect()}
    assert sigs[1] == sigs[3] == sigs[5]
    assert sigs[1] != sigs[4]


def test_minhash_arrow_matches_catalyst(spark, docs):
    """The r14 vectorized signature kernel must be BIT-identical to the
    pure-Catalyst formulation (the form the DuckDB oracle mirrors) —
    shingle hash sets AND signatures, across the tokenization edge cases
    (empty text, NULL, consecutive spaces → empty tokens, sub-shingle
    docs, astral-plane code points, CJK) and non-default parameters."""
    edge = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over it", "s1"),
            (2, "", "s1"),
            (3, None, "s1"),
            (4, "a  b  c d e", "s1"),
            (5, "x y", "s1"),
            (6, "x y z", "s1"),
            (7, "astral \U0001D11E clef \U0001F600 emoji here ok", "s1"),
            (8, "中文 words mixed ünicode é́ combining", "s1"),
            (9, " leading and trailing ", "s1"),
            (10, "a b c a b c a b c", "s1"),
        ],
        DOC_SCHEMA,
    )
    for df in (docs, edge):
        for kw in (
            {},
            {"num_perm": 8, "shingle_n": 2},
            {"num_perm": 32, "shingle_n": 5, "seed": 7},
        ):
            a = {
                r["doc_id"]: (list(r["__shingles"]), list(r["sig"]))
                for r in minhash_signatures(df, engine="arrow", **kw).collect()
            }
            c = {
                r["doc_id"]: (list(r["__shingles"]), list(r["sig"]))
                for r in minhash_signatures(
                    df, engine="catalyst", **kw
                ).collect()
            }
            assert a == c, f"engine divergence for {kw}"


def test_minhash_arrow_string_ids_match_catalyst(spark):
    """ADVICE r14: the arrow kernel used to cast id_col to long, nulling
    every non-numeric id. The id column must now pass through untouched
    with its input type, matching the catalyst engine."""
    df = spark.createDataFrame(
        [
            ("docA", "the quick brown fox jumps over it"),
            ("docB", "the quick brown fox jumps over it"),
            ("docC", None),
        ],
        "name string, text string",
    )
    a = {
        r["doc_id"]: list(r["sig"])
        for r in minhash_signatures(df, id_col="name", engine="arrow").collect()
    }
    c = {
        r["doc_id"]: list(r["sig"])
        for r in minhash_signatures(
            df, id_col="name", engine="catalyst"
        ).collect()
    }
    assert set(a) == {"docA", "docB", "docC"}
    assert a == c


def test_minhash_dedup_recovers_dup_pairs(docs):
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_dedup(docs, threshold=0.3).collect()
    }
    # exact dups always collide in every band; near-dup 1-2 collides w.h.p.
    assert got[(1, 3)] == 1.0 and got[(1, 5)] == 1.0 and got[(3, 5)] == 1.0
    assert (1, 2) in got
    assert all(a < b for a, b in got)


def test_simhash_pairs_near_dups_close(docs):
    out = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_pairs(docs, ["source"], max_hamming=4).collect()
    }
    assert out[(1, 3)] == 0  # identical text → identical fingerprint
    assert (1, 2) in out  # near dup within a few bits
    assert (1, 4) not in out  # unrelated text far away


EMB_SCHEMA = "vec_id long, embedding array<float>, label int"


@pytest.fixture(scope="module")
def embs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [0.9, 0.1, 0.0, 0.0], 0),  # closest to 0
        (2, [0.0, 1.0, 0.0, 0.0], 0),
        (3, [-1.0, 0.0, 0.0, 0.0], 1),
        (4, [0.5, 0.5, 0.0, 0.0], 1),
    ]
    return spark.createDataFrame(rows, EMB_SCHEMA)


def test_brute_force_topk_order(embs):
    out = brute_force_topk(embs, query_vec_id=0, k=3).collect()
    assert [r["vec_id"] for r in out] == [1, 4, 2]
    assert out[0]["cosine"] > 0.99


def test_ann_lsh_self_consistent(embs):
    out = ann_topk_per_vector(embs, dim=4, k=1, bits=2).collect()
    by_vec = {r["vec_id"]: r for r in out}
    # every reported neighbor shares the vector's bucket and rank==1
    assert all(r["rank"] == 1 for r in out)
    # determinism: re-running yields identical results (seeded hyperplanes)
    out2 = ann_topk_per_vector(embs, dim=4, k=1, bits=2).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_connected_components_chain_and_clique(spark):
    from nexus_event_stream_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        # chain 1-2-3-4 (diameter 3), clique {10,11,12}, pair {20,21}
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (21, 20)],
        "doc_a long, doc_b long",
    )
    comp = {r["node"]: r["comp"] for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_merge_edges_matches_full_recompute_on_random_streams(spark):
    """Incremental CC: folding delta-edge batches into an existing
    labeling must label-match a full recompute over the union of every
    edge seen — including batches that BRIDGE two existing components
    and batches introducing brand-new nodes."""
    import random

    from nexus_event_stream_spark.operators.dedup import (
        connected_components,
        merge_edges,
    )

    def df_pairs(rows):
        return spark.createDataFrame(rows, "doc_a long, doc_b long")

    rng = random.Random(7)
    for trial in range(3):
        n_nodes = 30
        all_edges = [
            (rng.randrange(n_nodes), rng.randrange(n_nodes)) for _ in range(40)
        ]
        all_edges = [(a, b) for a, b in all_edges if a != b]
        cut = len(all_edges) // 3
        base, deltas = all_edges[:cut], all_edges[cut:]

        labels = connected_components(df_pairs(base)) if base else None
        # fold the remaining edges in two delta batches
        mid = len(deltas) // 2
        for chunk in (deltas[:mid], deltas[mid:]):
            if not chunk:
                continue
            if labels is None:
                labels = connected_components(df_pairs(chunk))
            else:
                labels = merge_edges(labels, df_pairs(chunk))
        got = {r["node"]: r["comp"] for r in labels.collect()}
        want = {
            r["node"]: r["comp"]
            for r in connected_components(df_pairs(all_edges)).collect()
        }
        assert got == want, f"trial {trial} diverged"


def test_merge_edges_bridges_components_and_adds_nodes(spark):
    """The two interesting deltas, pinned explicitly: an edge bridging
    two settled components relabels the LARGER-labeled one wholesale;
    never-seen nodes join with min-id semantics intact."""
    from nexus_event_stream_spark.operators.dedup import (
        connected_components,
        merge_edges,
    )

    base = spark.createDataFrame(
        [(1, 2), (10, 11)], "doc_a long, doc_b long"
    )
    labels = connected_components(base)
    delta = spark.createDataFrame(
        [(2, 10), (50, 51)], "doc_a long, doc_b long"
    )
    got = {r["node"]: r["comp"] for r in merge_edges(labels, delta).collect()}
    assert got == {1: 1, 2: 1, 10: 1, 11: 1, 50: 50, 51: 50}


def test_dedup_groups_from_minhash_pairs(docs):
    from nexus_event_stream_spark.operators.dedup import dedup_groups

    pairs = minhash_dedup(docs, num_perm=16, shingle_n=3, bands=4, threshold=0.3)
    mapping = {r["doc_id"]: r["keep_id"] for r in dedup_groups(docs, pairs).collect()}
    # docs 1,2,3,5 are exact/near dups of each other (same or near text);
    # 4 is unrelated and must map to itself
    assert mapping[4] == 4
    cluster = {mapping[i] for i in (1, 2, 3, 5)}
    assert cluster == {1}
    # dedup'd corpus = one representative per cluster + the singleton
    kept = sorted({v for v in mapping.values()})
    assert kept == [1, 4]


def test_ann_multiprobe_improves_recall(spark):
    from nexus_event_stream_spark.io import load_table
    from nexus_event_stream_spark.operators.similarity import ann_topk_per_vector

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    plain = {
        r["vec_id"]: r["cosine"]
        for r in ann_topk_per_vector(emb, dim=64, k=1, bits=6).collect()
    }
    multi = {
        r["vec_id"]: r["cosine"]
        for r in ann_topk_per_vector(
            emb, dim=64, k=1, bits=6, multiprobe=True
        ).collect()
    }
    # candidate sets are supersets: every vector keeps or improves its
    # best neighbor, and at least as many vectors find one at all
    assert len(multi) >= len(plain)
    assert all(multi[v] >= c - 1e-12 for v, c in plain.items())
    # with 6 bits over 500 vectors, hamming-1 probing should actually help
    assert sum(multi[v] > plain[v] + 1e-12 for v in plain) > 0


def test_first_match_machinery_equals_distinct_spec(spark):
    """r15 shared candidate machinery (banded_pair_source +
    first_match_keep — candidate dedup as a verify-join filter instead
    of a global ``distinct``; live in phash_pairs/video_phash_pairs):
    pin its pair set bit-equal to the bucket_candidates spec on MinHash
    banding over a randomized corpus with near-dup clusters, empties,
    NULLs, and — at cap=3 — forced hot buckets where the star fallback
    and its first-match dedup must agree too. (minhash_dedup itself
    keeps the distinct path: its verify payload is array-sized and the
    measured multiplicity cost outweighs the saved exchange — see the
    operator docstring — but the machinery must stay correct for any
    signature family.)"""
    import random

    from nexus_event_stream_spark.operators.dedup import (
        _attach_masks,
        _sig_band_matches,
        band_key_array,
        banded_pair_source,
        bucket_candidates,
        first_match_keep,
    )

    random.seed(7)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]
    rows, did = [], 0
    for _ in range(30):
        base = " ".join(random.choices(vocab, k=random.randint(0, 12)))
        for m in range(random.randint(1, 8)):
            t = (f"r{m} " + base) if random.random() < 0.7 else base
            rows.append((did, t))
            did += 1
    rows += [(did, ""), (did + 1, None), (did + 2, "a"), (did + 3, "a")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = minhash_signatures(docs).persist()

    def spec(cap):
        keyed = sigs.select(
            "doc_id", F.explode(band_key_array(4, 4)).alias("bucket")
        )
        return sorted(
            map(tuple, bucket_candidates(keyed, cap).collect())
        )

    def first_match(cap):
        keyed = sigs.select(
            "doc_id",
            F.posexplode(band_key_array(4, 4)).alias("__band", "bucket"),
        )
        cands, masks = banded_pair_source(keyed, cap)
        side = _attach_masks(sigs.select("doc_id", "sig"), masks)
        keep = first_match_keep(
            F.col("__band"),
            F.col("__star"),
            _sig_band_matches(F.col("sa.sig"), F.col("sb.sig"), 4, 4),
            F.col("sa.__hot_mask") if masks is not None else None,
            F.col("sa.__hub_mask") if masks is not None else None,
        )
        out = (
            cands.join(side.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
            .join(
                sigs.select("doc_id", "sig").alias("sb"),
                F.col("doc_b") == F.col("sb.doc_id"),
            )
            .filter(keep)
            .select("doc_a", "doc_b")
        )
        return sorted(map(tuple, out.collect()))

    for cap in (None, 3, 200):
        got = first_match(cap)
        assert got == spec(cap), f"pair set diverged at cap={cap}"
        assert len(got) == len(set(got))
    sigs.unpersist()
