"""Arrow/numpy GEMM similarity path vs the expression-based exact path."""

from __future__ import annotations

from nexus_event_stream_spark.io import load_table
from nexus_event_stream_spark.operators.similarity import (
    brute_force_topk,
    topk_vs_queries_numpy,
)


def test_numpy_topk_matches_expression_topk(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = [
        (r["vec_id"], list(r["embedding"]))
        for r in emb.filter("vec_id IN (0, 7)").collect()
    ]
    got = topk_vs_queries_numpy(emb, queries, k=5).collect()
    by_query = {}
    for r in got:
        by_query.setdefault(r["query_id"], []).append(r)
    for qid in (0, 7):
        rows = sorted(by_query[qid], key=lambda r: r["rank"])
        exact = brute_force_topk(emb, query_vec_id=qid, k=5).collect()
        # same neighbor ids in the same order; cosines agree within the
        # expression path's quantization error (scale 1e-4 → ~1e-4 bound)
        assert [r["vec_id"] for r in rows] == [r["vec_id"] for r in exact]
        for a, b in zip(rows, exact):
            assert abs(a["cosine"] - b["cosine"]) < 1e-3


def test_numpy_topk_excludes_self(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = [(0, list(emb.filter("vec_id = 0").first()["embedding"]))]
    got = topk_vs_queries_numpy(emb, q, k=3).collect()
    assert all(r["vec_id"] != 0 for r in got)
    assert len(got) == 3
