"""Word-level interpolated Kneser-Ney bigram LM — the CCNet-shaped
perplexity filter with DISTRIBUTED model state.

CCNet (Wenzek et al. 2020) filters crawled text with a KenLM WORD model
(5-gram modified Kneser-Ney). The repo's char-LM (operators/lm.py,
stupid backoff) covers the language-agnostic/no-tokenizer regime with a
driver-bounded model; this module is its word-level sibling for the
regime KenLM actually occupies — a trusted-corpus word model whose
vocabulary may NOT fit a driver dict. The model here is two DataFrames
(bigram counts; per-word context/continuation aggregates) plus four
driver scalars, so training state is corpus-bounded only on the
cluster, never on the driver — the property train_bpe/train_char_lm
buy with caps, bought here structurally instead.

Smoothing is interpolated Kneser-Ney (Kneser & Ney 1995; Chen &
Goodman 1999 eq. 4.25) with the standard count-of-counts discount
``D = n1/(n1+2*n2)``:

    P(w2|w1) = ( max(c(w1,w2) - D, 0)  +  D * N1+(w1,*) * Pcont(w2) )
               / c(w1)
    Pcont(w2) = ( N1+(*,w2) + 1 ) / ( T + V + 1 )

where ``N1+`` are distinct-neighbour counts, ``T`` the number of bigram
types and ``V`` the continuation vocabulary. The +1/+V+1 Laplace floor
extends the continuation distribution over vocab ∪ {unk}, so an
out-of-vocabulary word scores the unk share instead of -inf, and an
unseen CONTEXT backs off to ``Pcont`` alone. With full counts the
conditional sums to EXACTLY 1 over vocab ∪ {unk} for every seen context
— pinned as a property test, not just asserted here. ``min_count``
bigram pruning (a model-size cap) deliberately keeps the FULL-count
context totals, so a pruned model is a strict sub-distribution — it can
only under-estimate, never inflate, a document's probability.

Scale shape (the 100 TB argument):
- Training is ONE corpus-grain shuffle: per-doc bigram pairs are built
  JVM-side (split → sentinel concat → ``transform(sequence)`` — no
  Python, no UDF) and grouped by (w1, w2). Everything downstream
  (context totals, continuation counts, discount stats) aggregates the
  BIGRAM-TYPE table — model-grain, orders of magnitude below corpus
  grain. Driver state is four scalars.
- Scoring joins the exploded corpus bigrams against the model tables.
  With ``broadcast_model=True`` (default — a min_count≥2 web bigram
  table is GBs, KenLM's own deployment assumption) the scan-side never
  shuffles and the only Exchange is the final per-doc aggregation;
  set it False when the model outgrows executors and the three joins
  become sort-merge on the same exploded relation.
- No ``collect()`` beyond the 1-row stats aggregate; no driver loops.

No reference counterpart — north-star LLM-pipeline tier, beside
operators/lm.py (char, stupid backoff) and operators/classifier.py
(supervised): see lm.py's module docstring for the three-gate rationale.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "KNBigramModel",
    "train_kn_bigram",
    "kn_transition_probs",
    "kn_perplexity",
    "kn_gate",
    "BOS",
    "EOS",
]

BOS = "<s>"
EOS = "</s>"


def _words_with_sentinels(text_col: str):
    """Column expr: the doc's word array wrapped in BOS/EOS sentinels —
    whitespace tokenization (the bpe/unigram convention), JVM-side."""
    words = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda w: w != F.lit("")
    )
    return F.concat(F.array(F.lit(BOS)), words, F.array(F.lit(EOS)))


def _pairs_from(ws_col: str):
    """array<struct<w1,w2>> of transitions over an ALREADY-PROJECTED
    sentinel-word column. The tokenization must be materialized in its
    own projection first: HOF lambdas have no common-subexpression
    elimination, so inlining the split/concat here would rebuild the
    word array per element_at — O(n²) per document (the q_doc_profile
    lesson, plans/llm_catalog.py)."""
    ws = F.col(ws_col)
    # NULL guard is load-bearing: size(NULL) is ANSI-dependent (-1 vs
    # NULL), and sequence(0, -3) DESCENDS — an unguarded NULL row would
    # fabricate phantom NULL-word transitions under non-ANSI sessions
    return F.when(
        ws.isNotNull(),
        F.transform(
            F.sequence(F.lit(0), F.size(ws) - 2),
            lambda i: F.struct(
                F.element_at(ws, i + 1).alias("w1"),
                F.element_at(ws, i + 2).alias("w2"),
            ),
        ),
    )


@dataclass
class KNBigramModel:
    """Distributed KN-bigram state: ``bigrams``(w1,w2,c) pruned to
    ``min_count``; ``contexts``(w1,c1,n1plus_fwd) and
    ``continuations``(w2,n1plus_bwd) from FULL counts; scalars
    ``discount`` (the n1/(n1+2*n2) estimate), ``n_bigram_types`` (T),
    ``vocab_size`` (V = distinct continuation words) and
    ``min_count``."""

    bigrams: DataFrame
    contexts: DataFrame
    continuations: DataFrame
    discount: float
    n_bigram_types: int
    vocab_size: int
    min_count: int = 1

    def unpersist(self) -> None:
        for df in (self.bigrams, self.contexts, self.continuations):
            try:
                df.unpersist()
            except Exception:
                pass


def train_kn_bigram(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
    discount: float | None = None,
) -> KNBigramModel:
    """One corpus pass → a KN-bigram model whose state lives on the
    cluster. ``min_count`` prunes the bigram TABLE only (context totals
    and continuation counts keep full mass — sub-distribution, see
    module docstring); ``discount`` overrides the count-of-counts
    estimate (clamped to [0, 1))."""
    pairs = (
        docs.where(F.col(text_col).isNotNull())
        .select(_words_with_sentinels(text_col).alias("__ws"))
        .select(F.explode(_pairs_from("__ws")).alias("p"))
        .select("p.w1", "p.w2")
    )
    # the one corpus-grain shuffle; everything below is model-grain
    bigrams_full = pairs.groupBy("w1", "w2").agg(F.count("*").alias("c"))
    bigrams_full = bigrams_full.persist()
    contexts = (
        bigrams_full.groupBy("w1")
        .agg(
            F.sum("c").alias("c1"),
            F.count("*").alias("n1plus_fwd"),
        )
        .persist()
    )
    continuations = (
        bigrams_full.groupBy("w2")
        .agg(F.count("*").alias("n1plus_bwd"))
        .persist()
    )
    row = bigrams_full.agg(
        F.count("*").alias("t"),
        F.sum((F.col("c") == 1).cast("long")).alias("n1"),
        F.sum((F.col("c") == 2).cast("long")).alias("n2"),
    ).collect()[0]
    t = int(row["t"] or 0)
    n1, n2 = int(row["n1"] or 0), int(row["n2"] or 0)
    if discount is None:
        discount = n1 / (n1 + 2.0 * n2) if n1 else 0.5
    discount = min(max(float(discount), 0.0), 0.999999)
    v = continuations.count()
    if min_count > 1:
        bigrams = bigrams_full.filter(F.col("c") >= min_count).persist()
        bigrams.count()  # materialize before dropping the full table
        bigrams_full.unpersist()
    else:
        bigrams = bigrams_full
    return KNBigramModel(
        bigrams=bigrams,
        contexts=contexts,
        continuations=continuations,
        discount=discount,
        n_bigram_types=t,
        vocab_size=v,
        min_count=min_count,
    )


def _maybe_broadcast(df: DataFrame, flag: bool) -> DataFrame:
    return F.broadcast(df) if flag else df


def kn_transition_probs(
    model: KNBigramModel,
    pairs: DataFrame,
    broadcast_model: bool = True,
) -> DataFrame:
    """``pairs`` (any relation with ``w1``, ``w2`` string columns) →
    same relation + ``p`` (the interpolated-KN conditional) and
    ``logp``. The scoring primitive — exposed so the normalization
    property (Σ_w2 p == 1 per seen context) is testable directly on a
    contexts × candidates grid, and reused verbatim by
    :func:`kn_perplexity`."""
    d = float(model.discount)
    denom = float(model.n_bigram_types + model.vocab_size + 1)
    j = (
        pairs.join(
            _maybe_broadcast(model.bigrams, broadcast_model),
            ["w1", "w2"],
            "left",
        )
        .join(
            _maybe_broadcast(model.contexts, broadcast_model),
            ["w1"],
            "left",
        )
        .join(
            _maybe_broadcast(model.continuations, broadcast_model),
            ["w2"],
            "left",
        )
    )
    pcont = (F.coalesce(F.col("n1plus_bwd"), F.lit(0)) + 1) / F.lit(denom)
    seen_ctx = F.col("c1").isNotNull() & (F.col("c1") > 0)
    p_seen = (
        F.greatest(F.coalesce(F.col("c"), F.lit(0)) - F.lit(d), F.lit(0.0))
        + F.lit(d) * F.col("n1plus_fwd") * pcont
    ) / F.col("c1")
    p = F.when(seen_ctx, p_seen).otherwise(pcont)
    return (
        j.withColumn("p", p)
        .withColumn("logp", F.log("p"))
        .drop("c", "c1", "n1plus_fwd", "n1plus_bwd")
    )


def kn_perplexity(
    docs: DataFrame,
    model: KNBigramModel,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "kn_ppl",
    broadcast_model: bool = True,
) -> DataFrame:
    """(id_col, n_transitions, out_col): per-document word perplexity
    ``exp(-mean logp)`` over the doc's BOS…EOS transition chain. NULL
    text → NULL perplexity (no fabricated score). Scoring is
    explode → three model joins → one per-doc aggregation; with the
    default broadcast model the only shuffle is that aggregation."""
    pairs = (
        docs.where(F.col(text_col).isNotNull())
        .select(id_col, _words_with_sentinels(text_col).alias("__ws"))
        .select(id_col, F.explode(_pairs_from("__ws")).alias("p"))
        .select(id_col, "p.w1", "p.w2")
    )
    scored = kn_transition_probs(model, pairs, broadcast_model)
    agg = scored.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_transitions"),
        F.exp(-F.avg("logp")).alias(out_col),
    )
    # NULL-text docs never enter the explode; restore them by UNION of a
    # filtered re-scan, not a corpus-grain id-spine join (a join here
    # would shuffle the whole corpus by id just to re-attach NULLs)
    nulls = docs.where(F.col(text_col).isNull()).select(
        id_col,
        F.lit(0).cast("long").alias("n_transitions"),
        F.lit(None).cast("double").alias(out_col),
    )
    return agg.unionByName(nulls)


def kn_gate(
    docs: DataFrame,
    model: KNBigramModel,
    max_ppl: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_model: bool = True,
) -> DataFrame:
    """Filter: keep docs whose KN perplexity is ≤ ``max_ppl`` — the
    CCNet head/middle cut. NULL-text docs are dropped (no score, no
    pass), matching lm_gate's treatment of unscorable rows."""
    scored = kn_perplexity(
        docs, model, text_col, id_col, "kn_ppl", broadcast_model
    )
    keep = scored.filter(
        F.col("kn_ppl").isNotNull() & (F.col("kn_ppl") <= max_ppl)
    ).select(id_col)
    return docs.join(keep, id_col, "left_semi")
