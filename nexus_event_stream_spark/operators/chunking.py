"""Overlapping document chunking — the embedding/RAG preparation step.

Long documents don't fit embedding-model windows; every retrieval
pipeline slices them into fixed-size word windows with overlap (overlap
keeps a fact that straddles a boundary retrievable from at least one
chunk). This operator is the distributed version, entirely in Catalyst:
split → windowed ``slice`` over a ``posexplode`` of window starts —
zero Python, zero shuffle, whole-stage codegen end to end.

Relationship to neighbors: ``word_segments`` (operators/quality.py) cuts
NON-overlapping n-word segments for passage dedup (overlap would
double-count there); ``cdc_chunks`` cuts content-defined variable
chunks for shift-robust dedup. This one cuts FIXED windows WITH overlap
for retrieval — three different chunk disciplines for three different
consumers.

Scale shape: a pure per-row projection (rows multiply by
~n_words/stride); the output lands partitioned exactly like the input,
ready for the embedding kernel or the sharded sink. No reference
counterpart — north-star tier.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["chunk_documents"]


def chunk_documents(
    docs: DataFrame,
    size: int = 256,
    overlap: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_col, chunk_idx, chunk_text, n_words, word_start) — ``size``-word
    windows every ``size − overlap`` words.

    Contract (pinned in tests):
    - a doc with ≤ ``size`` words yields exactly ONE chunk (itself);
    - consecutive chunks share exactly ``overlap`` words, except the
      LAST window, which is placed flush with the document end (full
      coverage without emitting a runt tail that a fixed stride would
      duplicate almost entirely);
    - every word index is covered by ≥ 1 chunk;
    - empty/NULL docs yield zero chunks (nothing to embed — the doc
      itself is still in the corpus; chunking is a projection, not a
      filter).
    """
    if not (0 <= overlap < size):
        raise ValueError(
            f"need 0 <= overlap < size, got overlap={overlap} size={size}"
        )
    stride = size - overlap
    toks = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"),
        lambda t: F.length(t) > 0,
    )
    n = F.size(toks)
    # number of windows: 1 + ceil((n - size) / stride) for n > size
    n_chunks = F.when(n <= 0, F.lit(0)).when(n <= size, F.lit(1)).otherwise(
        F.lit(1) + F.ceil((n - F.lit(size)) / F.lit(stride)).cast("int")
    )
    base = docs.select(
        F.col(id_col),
        toks.alias("__toks"),
        n.alias("__n"),
        n_chunks.alias("__k"),
    ).filter(F.col("__k") > 0)
    idx = F.posexplode(F.sequence(F.lit(0), F.col("__k") - 1))
    # flush-to-end placement for the final window
    start = F.least(
        F.col("pos") * F.lit(stride),
        F.greatest(F.col("__n") - F.lit(size), F.lit(0)),
    )
    return (
        base.select(id_col, "__toks", "__n", idx.alias("pos", "_"))
        .select(
            F.col(id_col),
            F.col("pos").alias("chunk_idx"),
            F.array_join(
                F.slice(F.col("__toks"), start + 1, size), " "
            ).alias("chunk_text"),
            F.least(F.lit(size), F.col("__n") - start).alias("n_words"),
            start.alias("word_start"),
        )
    )
