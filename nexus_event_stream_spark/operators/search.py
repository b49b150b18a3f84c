"""Distributed BM25 full-text retrieval over the documents table.

An inverted-index build + query-time scoring pass, entirely in Catalyst
(no Python in any per-row path): tokenize → posting list (term, doc, tf)
with document-frequency capping → denormalized per-posting idf/length —
then a query is a BROADCAST join of its handful of terms against the
postings, one integer-summed aggregation per (query, doc), and a per-query
top-k window. Retrieval belongs in a training-data engine: corpus QA
("which documents say X"), similarity-based decontamination, and
hard-negative mining are all BM25 probes over the same postings.

No reference counterpart (the reference serves key lookups only); the
formula is the standard Robertson/Spärck-Jones BM25 (k1 tf saturation,
b length normalization, the +0.5-smoothed idf).

Scale shape (the 100 TB argument):
- The posting build is ONE shuffle on the term key. ``max_df_frac``
  drops stop-terms — simultaneously the ranking no-op (idf ≈ 0) and the
  SKEW surface (a term in half the corpus is a posting list half the
  corpus long); same cap discipline as ``max_gram_df`` in the dedup
  chain. Shuffle bytes after the cap ∝ informative postings only.
- Queries are tiny (tens of terms) → broadcast; the scoring join never
  shuffles the postings side, and the per-(query, doc) aggregation is
  map-side combined with |touched postings| input rows, not |corpus|.
- Scores are summed as FIXED-POINT int64 (floor(x·2^20 + ½) per posting
  before any summation — the repo's combine-order-independence
  convention): ranking is bit-deterministic under any partitioning, AQE
  re-plan, or combine order, and ties break on doc_id.
- Top-k per query is a rank window → WindowGroupLimit map-side pre-drop;
  the driver never sees more than queries×k rows.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "BM25Index",
    "build_bm25_index",
    "bm25_topk",
    "bm25_score_docs",
    "search_tokens",
]

#: fixed-point scale for score quantization (2^20 ≈ 1e-6 resolution —
#: far below any meaningful BM25 score difference, far above double
#: summation noise)
SCORE_SCALE = 1 << 20


def _require_scorable(index: "BM25Index", fn: str) -> None:
    """An index built from empty/token-free docs has ``avgdl == 0`` —
    the BM25 length norm divides by it and every score silently becomes
    NaN/inf. Fail loudly at the API boundary instead."""
    if not index.avgdl or index.avgdl <= 0.0:
        raise ValueError(
            f"{fn}: index.avgdl={index.avgdl!r} — the index holds no "
            "tokens (empty corpus or all-empty docs); scoring against "
            "it is undefined"
        )


def _guard_broadcast_rows(
    small: DataFrame, cap: int | None, what: str, fn: str, knob: str
) -> None:
    """Broadcast-cap discipline (the ``max_bucket_size`` /
    ``max_gram_df`` convention applied to broadcast sides): count the
    SMALL side (one job at CALL time — the one eager step in otherwise
    lazy composition, documented on every caller) and refuse to hand
    Catalyst a broadcast that would OOM every executor at scale. The
    side is persisted first so the count is not a second full compute:
    the caller's broadcast build reuses the cache. The caller documents
    the fallback in the raised message."""
    if cap is None:
        return
    from pyspark import StorageLevel

    small.persist(StorageLevel.MEMORY_AND_DISK)
    n = small.count()
    if n > cap:
        raise ValueError(
            f"{fn}: {what} has {n} rows, above the broadcast cap "
            f"{knob}={cap}; shrink the small side or raise the cap "
            f"only if executors have the memory (pass {knob}=None to "
            "skip the guard and broadcast=False to shuffle-join instead)"
        )


def search_tokens(col: Column | str) -> Column:
    """Search-grade tokenization: lowercase, split on non-alphanumeric
    runs, drop empties. (Deliberately coarser than the quality tier's
    whitespace convention — retrieval wants 'Spark,' == 'spark'.)"""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.split(F.lower(c), "[^a-z0-9]+"), lambda t: F.length(t) > 0
    )


@dataclass
class BM25Index:
    """Queryable BM25 index: denormalized postings + corpus scalars.

    ``postings`` rows: (term, doc_id, tf, dl, idf) — idf and doc length
    ride each posting so query time is join → score → sum, no extra
    joins. Persist or write ``postings`` bucketed by term for repeated
    query workloads (one shuffle amortized forever, like the view table).
    """

    postings: DataFrame
    n_docs: int
    avgdl: float
    id_col: str = "doc_id"


def build_bm25_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df_frac: float = 0.5,
    min_df: int = 1,
) -> BM25Index:
    """Tokenize → per-(term, doc) tf → df-capped postings with idf.

    Two tiny driver scalars (corpus size, average doc length) come from
    one aggregate each; everything row-scaled stays distributed. Terms
    with df > ``max_df_frac``·N (stop-terms: no ranking signal, maximal
    posting skew) or df < ``min_df`` (hapax noise, optional) are dropped
    from the index entirely.

    Cost: TWO tokenizing scans of ``docs`` (the scalar aggregate and the
    posting build — Catalyst cannot CSE across the two jobs). Persist
    ``docs`` for a one-scan build, or grow the index incrementally via
    streaming/search_index.py, which pays per batch and keeps the
    counters in its pointer.
    """
    toks = docs.select(
        F.col(id_col),
        # NULL text tokenizes to the empty array, NOT null — F.size(null)
        # is -1 and would silently drag avgdl down
        F.coalesce(
            search_tokens(text_col), F.array().cast("array<string>")
        ).alias("__toks"),
    ).withColumn("dl", F.size("__toks"))
    n_docs, avgdl = toks.select(
        F.count(F.lit(1)), F.avg("dl")
    ).first()
    avgdl = float(avgdl or 0.0)
    tf = (
        toks.select(id_col, "dl", F.explode("__toks").alias("term"))
        .groupBy("term", id_col, "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    max_df = int(max_df_frac * n_docs)
    df = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter((F.col("df") <= max_df) & (F.col("df") >= min_df))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
    )
    postings = tf.join(df.select("term", "idf"), "term").select(
        "term", id_col, "tf", "dl", "idf"
    )
    return BM25Index(postings, int(n_docs), avgdl, id_col)


def bm25_topk(
    index: BM25Index,
    queries: list[tuple[int, str]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents per query: (query_id, doc_id, score, rank).

    Query terms (with their in-query tf as a weight) broadcast against
    the postings; per-posting contributions quantize to int64 BEFORE the
    per-(query, doc) sum, so scores and ranks are partition-independent;
    rank ties break on doc_id. ``score`` is the fixed-point sum scaled
    back to double at the edge.
    """
    from pyspark.sql import Window

    _require_scorable(index, "bm25_topk")
    spark = index.postings.sparkSession
    qrows = []
    for qid, text in queries:
        counts: dict[str, int] = {}
        for t in _py_search_tokens(text):
            counts[t] = counts.get(t, 0) + 1
        for t, qtf in counts.items():
            qrows.append((int(qid), t, int(qtf)))
    qdf = spark.createDataFrame(
        qrows, "query_id long, term string, qtf long"
    )
    dl_norm = F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(index.avgdl)
    contrib = (
        F.col("qtf").cast("double")
        * F.col("idf")
        * (F.col("tf") * F.lit(k1 + 1.0))
        / (F.col("tf") + F.lit(k1) * dl_norm)
    )
    scored = (
        index.postings.join(F.broadcast(qdf), "term")
        .withColumn(
            "__q",
            F.floor(contrib * F.lit(float(SCORE_SCALE)) + F.lit(0.5)).cast(
                "bigint"
            ),
        )
        .groupBy("query_id", index.id_col)
        .agg(F.sum("__q").alias("__score_q"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__score_q").desc(), F.col(index.id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            index.id_col,
            (F.col("__score_q") / F.lit(float(SCORE_SCALE))).alias("score"),
            "rank",
        )
    )


def bm25_score_docs(
    index: BM25Index,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 1,
    k1: float = 1.2,
    b: float = 0.75,
    broadcast: bool = True,
    max_broadcast_postings: int | None = 20_000_000,
) -> DataFrame:
    """Score every document in ``docs`` as a BM25 QUERY against a small
    broadcastable index: (id_col, match_id, score, rank), top-k indexed
    docs per input doc.

    The inverse of ``bm25_topk``: there the queries are a driver-side
    handful and the index is the corpus; here the index is the small side
    (an eval-benchmark corpus, a blocklist, a seed set) and the "queries"
    are the full distributed corpus. Retrieval-augmented decontamination
    and hard-negative mining are this probe.

    Scale shape: the index postings BROADCAST (the benchmark is
    eval-suite-sized); the corpus side is one tokenize+explode projection
    joined MAP-SIDE against the broadcast, which immediately drops every
    token outside the index vocabulary. The only shuffle is the
    per-(doc, match) partial-sum aggregation — map-side combined, its
    input is |corpus tokens that hit the index| rows, never
    |corpus|×|index|. The BM25 query-side weight is linear in qtf, so
    each token OCCURRENCE contributes its posting weight once and no
    per-(doc, term) qtf pre-aggregation (a full corpus-token shuffle) is
    needed. Per-occurrence contributions quantize to int64 before
    summation (the repo's combine-order convention) so scores and ranks
    are partition-independent; ties break on match_id.

    The broadcast is GUARDED: above ``max_broadcast_postings`` posting
    rows the call raises instead of OOMing every executor (the
    ``max_bucket_size``/``max_gram_df`` cap convention). Pass
    ``broadcast=False`` to shuffle-join an index too big to broadcast —
    both sides then shuffle on the term key, correct at any size.
    """
    from pyspark.sql import Window

    _require_scorable(index, "bm25_score_docs")
    if broadcast:
        _guard_broadcast_rows(
            index.postings,
            max_broadcast_postings,
            "index.postings",
            "bm25_score_docs",
            "max_broadcast_postings",
        )
    if index.id_col == id_col:
        match_col = f"__match_{id_col}"
    else:
        match_col = index.id_col
    postings = index.postings.withColumnRenamed(index.id_col, match_col)
    occurrences = docs.select(
        F.col(id_col), F.explode(search_tokens(text_col)).alias("term")
    )
    dl_norm = F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(index.avgdl)
    contrib = (
        F.col("idf")
        * (F.col("tf") * F.lit(k1 + 1.0))
        / (F.col("tf") + F.lit(k1) * dl_norm)
    )
    joined = (
        occurrences.join(F.broadcast(postings), "term")
        if broadcast
        else occurrences.join(postings.hint("shuffle_hash"), "term")
    )
    scored = (
        joined
        .withColumn(
            "__q",
            F.floor(contrib * F.lit(float(SCORE_SCALE)) + F.lit(0.5)).cast(
                "bigint"
            ),
        )
        .groupBy(id_col, match_col)
        .agg(F.sum("__q").alias("__score_q"))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("__score_q").desc(), F.col(match_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            id_col,
            F.col(match_col).alias("match_id"),
            (F.col("__score_q") / F.lit(float(SCORE_SCALE))).alias("score"),
            "rank",
        )
    )


def mine_hard_negatives(
    index: BM25Index,
    docs: DataFrame,
    positives: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    exclude_self: bool = True,
    k1: float = 1.2,
    b: float = 0.75,
    max_positives_per_doc: int = 1,
    broadcast: bool = True,
    max_broadcast_postings: int | None = 20_000_000,
) -> DataFrame:
    """Top-k BM25 hard negatives per document: (id_col, match_id, score,
    rank) — the highest-scoring indexed docs that are NOT the document
    itself and NOT its known positives. The standard mining step for
    contrastive retrieval/embedding training (negatives that lexically
    resemble the query are the ones a random sample never surfaces).

    ``positives`` is an optional (id_col, match_id) relation of known
    relevant pairs to exclude (size the over-fetch with
    ``max_positives_per_doc`` when a doc can have several). Built on
    ``bm25_score_docs`` (broadcast postings, no corpus×index blowup):
    over-fetch enough candidates to survive the exclusions, anti-join
    them away, re-rank densely 1..k. The re-rank window shuffles only
    the candidate rows (≤ docs·overfetch), never the corpus.
    """
    from pyspark.sql import Window

    overfetch = k + (1 if exclude_self else 0) + (
        max_positives_per_doc if positives is not None else 0
    )
    cand = bm25_score_docs(
        index, docs, id_col=id_col, text_col=text_col, k=overfetch,
        k1=k1, b=b, broadcast=broadcast,
        max_broadcast_postings=max_broadcast_postings,
    )
    if exclude_self:
        cand = cand.filter(F.col(id_col) != F.col("match_id"))
    if positives is not None:
        pos = positives.select(
            F.col(id_col), F.col("match_id").alias("__pos")
        )
        cand = cand.join(
            pos,
            (cand[id_col] == pos[id_col])
            & (F.col("match_id") == F.col("__pos")),
            "left_anti",
        )
    w = Window.partitionBy(id_col).orderBy(
        F.col("rank").asc()  # original BM25 order, ties already broken
    )
    return (
        cand.withColumn("__rr", F.row_number().over(w))
        .filter(F.col("__rr") <= k)
        .select(id_col, "match_id", "score", F.col("__rr").alias("rank"))
    )


def _py_search_tokens(text: str) -> list[str]:
    """Driver-side twin of ``search_tokens`` for query strings (tiny).
    Must tokenize EXACTLY like the Spark expression — pinned in tests."""
    import re

    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
