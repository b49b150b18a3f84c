"""Reference-corpus dedup via a Bloom filter — the Dolma pattern.

The published shape (AI2's Dolma dedupe tier, Soldaini et al. 2024; the
same idea guards BigQuery-scale crawls everywhere): when a NEW crawl
snapshot must be deduplicated against an EXISTING frozen training corpus,
joining the two is a non-starter — the history side is 100 TB and
never changes. Instead, build a Bloom filter over the reference corpus's
content keys ONCE (one scan, output bounded by the filter size, never the
corpus size), then every future snapshot dedups against it map-side:
probe = one ``element_at`` + one mask compare per key (the
register-blocked layout from operators/bloom.py), zero joins, zero
shuffle, zero Python.

Two grains, both from the Dolma playbook:

- **document**: the key is the full document text; a probe hit drops the
  document. Catches exact re-crawls of already-trained pages.
- **paragraph**: keys are the trimmed non-empty ``\\n\\n`` units; probe
  hits are removed from the document and the survivors re-joined. Catches
  the much more common partial overlap — a new page quoting paragraphs
  the corpus already contains. Documents with no hit keep their text
  byte-exact (the rewrite only applies when something was removed).

Honesty about false positives: a Bloom hit may be wrong at the filter's
FPR ε, and here a false positive DELETES novel content (the inverse of
the semi-join-pruning use, where it only passes stray rows a later join
discards). That is the published tradeoff — Dolma sizes its filter so ε
is vanishingly small and accepts the loss — so ``reference_corpus_bloom``
defaults to ε = 1e-6 and exposes ``fpr`` for the deployment to choose.
False negatives never happen: content in the reference always hits.

Scale: the filter is ~30 bits/key at 1e-6 — 1 B reference paragraphs ≈
4 GB, served via the broadcast-join probe (``bloom_prune_join``'s word
table) past ``MAX_EXPR_WORDS``; under the cap the words inline into the
plan as one literal and the probe rides whole-stage codegen. Either way
the NEW snapshot is never shuffled and the OLD corpus is never re-read.

Reference parity: no analogue — the reference dedups nothing
(data-plane/internal/projection/signal.go keys by pk only). North-star
training-pipeline surface, same tier as operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nexus_event_stream_spark.operators.bloom import (
    MAX_EXPR_WORDS,
    BloomFilter,
    _word_index,
    _word_mask,
    bloom_build,
    bloom_might_contain,
    bloom_params,
    bloom_words_df,
)

GRAINS = ("document", "paragraph")


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _paragraphs(text: Column) -> Column:
    """Trimmed non-empty ``\\n\\n`` units — the SAME unit convention as
    repetition_signals/boilerplate_lines (one-arg lambda: see the
    transform(F.trim) two-parameter pitfall in operators/quality.py)."""
    return F.filter(
        F.transform(F.split(text, "\n\n"), lambda x: F.trim(x)),
        lambda x: x != "",
    )


def dedup_paragraphs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus-wide first-occurrence paragraph dedup in ONE batch pass —
    the Dolma paragraph tier over the corpus itself (the
    frozen-reference variant is :func:`bloom_dedup_paragraphs`; the
    incremental twin is streaming/bloom_dedup.py's
    ``paragraph_suppress_and_register``, whose output contract this
    matches paragraph-for-paragraph).

    A paragraph occurrence is stripped iff its trimmed text matches an
    earlier occurrence anywhere in the corpus (ordered by doc id, then
    position). Rows are always preserved: zero-hit documents keep
    ``text_col`` BYTE-EXACT (separator quirks included), touched
    documents are rebuilt from the surviving units with ``\n\n``,
    all-duplicate docs come back ``''``, NULL text stays NULL with zero
    counts. Appends ``n_paras`` / ``dup_paras``.

    Cost at scale: one md5-uniform window shuffle for the corpus-wide
    first-occurrence order (``first_occurrence_flag`` — the paragraph
    digest is the partition key, so skew is bounded by the most-copied
    paragraph, not any corpus dimension), one keyed rebuild aggregate,
    one equi-join back to the input on ``id_col``. No driver-side
    state, no broadcast of anything corpus-sized.
    """
    from nexus_event_stream_spark.operators.quality import (
        first_occurrence_flag,
    )

    text = F.col(text_col)
    units = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(_paragraphs(text)).alias("pos", "__para"),
    )
    flagged = first_occurrence_flag(units, "__para")
    per_doc = flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_paras"),
        F.sum("is_dup").cast("bigint").alias("dup_paras"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("is_dup") == 0,
                            F.struct(F.col("pos"), F.col("__para")),
                        )
                    )
                ),
                lambda s: s["__para"],
            ),
            "\n\n",
        ).alias("__rebuilt"),
    )
    out = docs.join(
        per_doc.withColumnRenamed("doc_id", "__pid"),
        F.col(id_col) == F.col("__pid"),
        "left",
    ).drop("__pid")
    out = out.withColumns(
        {
            "n_paras": F.coalesce(F.col("n_paras"), F.lit(0).cast("bigint")),
            "dup_paras": F.coalesce(
                F.col("dup_paras"), F.lit(0).cast("bigint")
            ),
        }
    )
    return out.withColumn(
        text_col,
        F.when(text.isNull() | (F.col("dup_paras") == 0), text).otherwise(
            F.col("__rebuilt")
        ),
    ).drop("__rebuilt")


def reference_corpus_bloom(
    ref: DataFrame,
    text_col: str = "text",
    *,
    grain: str = "document",
    fpr: float = 1e-6,
    n_keys: int | None = None,
) -> BloomFilter:
    """ONE pass over the reference corpus → a frozen, reusable filter.

    ``n_keys`` sizes (m, k); when None it is estimated with
    ``approx_count_distinct`` (an extra cheap job at build time — sizing
    needs an estimate, membership stays exact-on-members regardless).
    The estimate is padded 10% so an undercount cannot push the real FPR
    past the target.
    """
    if grain not in GRAINS:
        raise ValueError(f"grain must be one of {GRAINS}, got {grain!r}")
    text = _col(text_col)
    if grain == "document":
        keys = ref.select(text.alias("__key"))
    else:
        keys = ref.select(
            F.explode(_paragraphs(text)).alias("__key")
        )
    if n_keys is None:
        n_keys = keys.agg(
            F.approx_count_distinct("__key").alias("n")
        ).collect()[0]["n"]
    m, k = bloom_params(max(1, int(n_keys * 1.1)), fpr)
    return bloom_build(keys, "__key", m_bits=m, k=k)


def _hit_flag_join(
    df: DataFrame, key: Column, bf: BloomFilter
) -> DataFrame:
    """Append ``__bf_hit`` via the broadcast word-table probe — the
    dedup-shaped twin of ``bloom_prune_join`` (which filters to hits;
    dedup needs the FLAG so it can keep the complement). One map-side
    broadcast hash join, no shuffle of ``df``; NULL keys flag False."""
    words = bloom_words_df(df.sparkSession, bf).select(
        F.col("w").alias("__bf_tw"), F.col("word").alias("__bf_word")
    )
    out = (
        df.withColumn(
            "__bf_w",
            F.when(
                key.isNotNull(), _word_index(key, bf.n_words).cast("int")
            ),
        )
        .withColumn("__bf_mask", _word_mask(key, bf.k))
        .join(F.broadcast(words), F.col("__bf_w") == F.col("__bf_tw"), "left")
    )
    word = F.coalesce(F.col("__bf_word"), F.lit(0))
    return out.withColumn(
        "__bf_hit",
        key.isNotNull()
        & (word.bitwiseAND(F.col("__bf_mask")) == F.col("__bf_mask")),
    ).drop("__bf_w", "__bf_mask", "__bf_tw", "__bf_word")


def bloom_dedup_documents(
    df: DataFrame, bf: BloomFilter, text_col: str = "text"
) -> DataFrame:
    """Drop documents whose full text hits the reference filter. Pure
    map-side filter directly above the scan — other predicates still push
    past it. NULL-text rows pass through (no evidence of duplication —
    the probe's NULL gate returns False, and negation keeps the row).
    Past ``MAX_EXPR_WORDS`` the probe switches to the broadcast
    word-table join automatically — same semantics, still no shuffle of
    ``df``."""
    if bf.n_words > MAX_EXPR_WORDS:
        return _hit_flag_join(df, _col(text_col), bf).where(
            ~F.col("__bf_hit")
        ).drop("__bf_hit")
    return df.where(~bloom_might_contain(bf, _col(text_col)))


def bloom_dedup_paragraphs(
    df: DataFrame,
    bf: BloomFilter,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Remove reference-corpus paragraphs from every document; append
    ``n_paras`` / ``dup_paras`` accounting. Documents with NO hit keep
    ``text_col`` byte-exact (separator quirks and all); touched documents
    are re-joined from the surviving trimmed units with ``\\n\\n`` —
    the same canonicalization strip_boilerplate_lines applies. Rows are
    always preserved (an all-duplicate document comes back with ``''``,
    NULL text stays NULL with zero counts) — dropping is the DOCUMENT
    grain's job. Zero shuffle, zero Python, zero explode: the probe runs
    inside the per-document array filter.

    Past ``MAX_EXPR_WORDS`` the inline word literal stops being sensible
    and this dispatches to ``bloom_dedup_paragraphs_join`` (result-
    identical, pinned) — posexplode + broadcast word-table probe + one
    keyed re-assembly shuffle, the shape a 1 B-paragraph reference
    filter needs; ``id_col`` is only required on that path."""
    if bf.n_words > MAX_EXPR_WORDS:
        return bloom_dedup_paragraphs_join(df, bf, text_col, id_col)
    text = _col(text_col)
    units = _paragraphs(text)
    kept = F.filter(units, lambda p: ~bloom_might_contain(bf, p))
    n = F.coalesce(F.size(units), F.lit(0)).cast("bigint")
    nk = F.coalesce(F.size(kept), F.lit(0)).cast("bigint")
    dup = F.greatest(n - nk, F.lit(0).cast("bigint"))
    return df.withColumns(
        {
            "n_paras": F.when(text.isNull(), F.lit(0).cast("bigint")).otherwise(n),
            "dup_paras": F.when(text.isNull(), F.lit(0).cast("bigint")).otherwise(dup),
            text_col if isinstance(text_col, str) else "text": F.when(
                text.isNull() | (dup == 0), text
            ).otherwise(F.array_join(kept, "\n\n")),
        }
    )


def bloom_dedup_paragraphs_join(
    df: DataFrame,
    bf: BloomFilter,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The broadcast word-table twin of ``bloom_dedup_paragraphs`` for
    filters too large to inline as a plan literal: posexplode the units,
    flag hits with ONE map-side broadcast hash join (``_hit_flag_join``),
    re-assemble per document with one keyed shuffle, join the accounting
    back onto the ORIGINAL rows (every input column and row preserved,
    zero-hit documents byte-exact — the same contract as the expression
    path; result-identity is pinned in tests). Linear: one row per
    paragraph moves once.

    ``id_col`` must be a UNIQUE, NON-NULL document key on this path:
    duplicate ids would merge paragraph accounting across documents, and
    a NULL id never matches the join-back (null-unsafe equality), so
    NULL-id rows pass through byte-exact with zero counts rather than
    being probed — callers that need NULL-id rows deduped must key them
    first (``monotonically_increasing_id`` or a hash of the row)."""
    text = _col(text_col)
    tname = text_col if isinstance(text_col, str) else "text"
    units = _paragraphs(text)
    exploded = df.select(
        F.col(id_col), F.posexplode_outer(units).alias("__pos", "__para")
    )
    flagged = _hit_flag_join(exploded, F.col("__para"), bf)
    per_doc = flagged.groupBy(id_col).agg(
        F.count("__para").cast("bigint").alias("n_paras"),
        F.count_if(F.col("__bf_hit")).cast("bigint").alias("dup_paras"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            ~F.col("__bf_hit"),
                            F.struct(F.col("__pos"), F.col("__para")),
                        )
                    )
                ),
                lambda s: s["__para"],
            ),
            "\n\n",
        ).alias("__rebuilt"),
    )
    out = df.join(per_doc, id_col, "left")
    # Coalesce BEFORE the rewrite: a row that missed the join-back (NULL
    # id under null-unsafe equality) must keep its text byte-exact, not
    # have a NULL `when` condition silently replace it with NULL.
    out = out.withColumns(
        {
            "n_paras": F.coalesce(F.col("n_paras"), F.lit(0).cast("bigint")),
            "dup_paras": F.coalesce(
                F.col("dup_paras"), F.lit(0).cast("bigint")
            ),
        }
    )
    return out.withColumn(
        tname,
        F.when(text.isNull() | (F.col("dup_paras") == 0), text).otherwise(
            F.col("__rebuilt")
        ),
    ).drop("__rebuilt")
