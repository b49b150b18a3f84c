"""Sequence packing for training-data pipelines.

The last step of a pre-training data pipeline: concatenate the tokenized
corpus in a deterministic document order and split it into fixed-length
training sequences (GPT-style packing — documents straddle sequence
boundaries; nothing is padded or dropped except the final partial
sequence). The output is the doc→sequence placement map a loader needs:
which sequences each document lands in, at which offset, with how many
tokens.

The core is a GLOBAL prefix sum of token counts in document order. The
naive window (``Window.orderBy(order)`` with no partition) collapses the
whole corpus into ONE task — correct at test scale, dead at 100 TB. The
scalable formulation here is the textbook two-level distributed prefix
sum, pure Catalyst:

1. coarse groups ``g = order // group_size`` — cumsum WITHIN each group
   is a normal partitioned window (parallel, shuffles on g);
2. per-group totals (|corpus|/group_size rows — tiny) get an exclusive
   running sum in a single-partition window over that tiny relation;
3. a broadcast join adds each group's offset back to the in-group cumsum.

With ``group_size`` ~1e6, a trillion-document corpus has ~1e6 group
rows in step 2 — the only sequential step stays driver-trivial forever.

Reference anchor: the reference engine (a CQRS event system,
data-plane/internal/projection/signal.go) has no training-data surface;
this is part of the SURVEY.md §2 north-star LLM-pipeline tier.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_prefix_sum(
    df: DataFrame,
    value_col: str,
    order_col: str,
    group_size: int = 1_000_000,
    out_col: str = "prefix_sum",
    group_expr: Column | None = None,
    order_cols: list | None = None,
) -> DataFrame:
    """Exclusive prefix sum of ``value_col`` in ``order_col`` order.

    ``order_col`` must be unique and numeric (document ids). Appends
    ``out_col`` = sum of all values strictly before the row. Two-level
    formulation — no single-partition pass over the corpus (see module
    docstring).

    Advanced callers may override the coarse grouping: ``group_expr``
    replaces the default ``order // group_size`` (it must be
    monotonically consistent with the order — all of group g precedes
    all of group g+1), and ``order_cols`` replaces the within-group sort
    (must be a total order). ``sample_token_budget`` uses both to order
    by a hash shuffle while keeping the group count fixed.
    """
    g = (
        group_expr
        if group_expr is not None
        else (F.col(order_col) / F.lit(group_size)).cast("bigint")
    )
    w_in = (
        Window.partitionBy("__g")
        .orderBy(*(order_cols or [order_col]))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_in = df.withColumn("__g", g).withColumn(
        "__cum_in", F.sum(value_col).over(w_in)
    )
    totals = with_in.groupBy("__g").agg(F.sum(value_col).alias("__g_total"))
    offsets = totals.select(
        "__g",
        F.coalesce(
            F.sum("__g_total").over(
                Window.orderBy("__g").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0).cast("bigint"),
        ).alias("__g_offset"),
    )
    return (
        with_in.join(F.broadcast(offsets), "__g")
        .withColumn(
            out_col, (F.col("__g_offset") + F.col("__cum_in") - F.col(value_col))
        )
        .drop("__g", "__cum_in", "__g_offset")
    )


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    count_col: str = "n_tokens",
    order_col: str = "doc_id",
    group_size: int = 1_000_000,
) -> DataFrame:
    """Doc→training-sequence placement map for GPT-style packing.

    Concatenating documents in ``order_col`` order and cutting every
    ``seq_len`` tokens, each document covers one or more sequences.
    Returns one row per (document, sequence) span:

    - ``seq_id``       — 0-based training-sequence index
    - ``offset_in_seq``— where the span starts inside the sequence
    - ``tokens_in_seq``— how many of the doc's tokens land there
    - ``doc_token_start`` — the span's start inside the document

    Invariants (property-pinned in tests/test_packing.py): every
    sequence except the last holds exactly ``seq_len`` tokens; each
    document's spans sum to its token count; zero-token documents emit
    nothing. Shape: the two-level prefix sum (shuffle on the coarse
    group), then a Generate (explode of the covered-sequence range) —
    no further shuffle; output is ready to ``repartition(seq_id)`` for
    shard-local loaders.
    """
    pref = global_prefix_sum(
        df, count_col, order_col, group_size=group_size, out_col="__start"
    )
    start = F.col("__start")
    end = start + F.col(count_col)
    first_seq = F.floor(start / seq_len).cast("bigint")
    last_seq = F.floor((end - 1) / seq_len).cast("bigint")
    exploded = pref.filter(F.col(count_col) > 0).select(
        "*",
        F.explode(F.sequence(first_seq, last_seq)).alias("seq_id"),
    )
    span_start = F.greatest(start, F.col("seq_id") * seq_len)
    span_end = F.least(end, (F.col("seq_id") + 1) * seq_len)
    return exploded.select(
        order_col,
        "seq_id",
        (span_start - F.col("seq_id") * seq_len)
        .cast("bigint")
        .alias("offset_in_seq"),
        (span_end - span_start).cast("bigint").alias("tokens_in_seq"),
        (span_start - start).cast("bigint").alias("doc_token_start"),
    )


def pack_documents_atomic(
    df: DataFrame,
    seq_len: int,
    count_col: str = "n_tokens",
    order_col: str = "doc_id",
    group_size: int = 10_000,
) -> DataFrame:
    """DOCUMENT-ATOMIC packing: first-fit-decreasing bins of whole
    documents — the placement for training recipes that forbid
    cross-document attention (no document ever straddles a sequence
    boundary, so no attention mask ever spans two docs).

    One row per document: ``<order_col>, seq_id, offset_in_seq,
    tokens_in_seq, doc_token_start`` — the ``pack_sequences`` span
    schema with exactly one span per doc (``doc_token_start`` is always
    0). Documents LONGER than ``seq_len`` get a sequence of their own,
    truncated (``tokens_in_seq = seq_len < n_tokens`` marks them);
    zero/negative-count docs emit nothing (the concat-split invariant).

    Distributed FFD: global first-fit-decreasing is inherently
    sequential, so documents pack within COARSE GROUPS of ``group_size``
    ids (``order // group_size``) — each group runs the exact FFD loop
    over its own docs inside one ``applyInPandas`` task (state = that
    group's bins, bounded by group_size — never corpus-sized), and
    group-local bin ids become global ``seq_id``s through the same
    two-level offset pattern as ``global_prefix_sum`` (per-group bin
    counts are a |corpus|/group_size-row relation: one tiny
    single-partition window, broadcast back). Fragmentation cost of
    grouping is at most one partial bin per group boundary —
    ``packing_efficiency`` measures it; the floor is pinned in tests.

    Unlike concat-split's 1.0, atomic packing necessarily wastes the
    bin tails (no splitting allowed); FFD's guarantee (≤ 11/9 OPT + 1
    bins, Johnson 1973) is what "best-fit-decreasing class" buys over
    naive first-come placement.
    """
    from pyspark.sql import types as T

    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    out_schema = T.StructType(
        [
            df.schema[order_col],
            T.StructField("__g", T.LongType()),
            T.StructField("__local_bin", T.LongType()),
            T.StructField("offset_in_seq", T.LongType()),
            T.StructField("tokens_in_seq", T.LongType()),
        ]
    )

    def pack_group(pdf):
        import pandas as pd

        docs = sorted(
            (
                (int(n), int(d))
                for d, n in zip(pdf[order_col], pdf["__n"])
                if n is not None and int(n) > 0
            ),
            key=lambda x: (-x[0], x[1]),  # decreasing size, id tiebreak
        )
        bins: list[int] = []  # remaining capacity per bin
        rows = []
        g = int(pdf["__g"].iloc[0]) if len(pdf) else 0
        for n, d in docs:
            take = min(n, seq_len)
            placed = None
            for b, room in enumerate(bins):
                if room >= take:  # first fit over decreasing sizes
                    placed = b
                    break
            if placed is None:
                bins.append(seq_len)
                placed = len(bins) - 1
            rows.append(
                (d, g, placed, seq_len - bins[placed], take)
            )
            bins[placed] -= take
        return pd.DataFrame(
            rows,
            columns=[
                order_col, "__g", "__local_bin", "offset_in_seq",
                "tokens_in_seq",
            ],
        )

    grouped = df.select(
        order_col,
        F.col(count_col).alias("__n"),
        (F.col(order_col) / F.lit(group_size)).cast("bigint").alias("__g"),
    )
    placed = grouped.groupBy("__g").applyInPandas(pack_group, out_schema)
    # group-local bins -> global seq ids: tiny per-group bin counts,
    # exclusive cumsum in a single-partition window, broadcast back
    counts = placed.groupBy("__g").agg(
        (F.max("__local_bin") + 1).alias("__bins")
    )
    offsets = counts.select(
        "__g",
        F.coalesce(
            F.sum("__bins").over(
                Window.orderBy("__g").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0).cast("bigint"),
        ).alias("__g_offset"),
    )
    return (
        placed.join(F.broadcast(offsets), "__g")
        .select(
            order_col,
            (F.col("__g_offset") + F.col("__local_bin")).alias("seq_id"),
            "offset_in_seq",
            "tokens_in_seq",
            F.lit(0).cast("bigint").alias("doc_token_start"),
        )
    )


def packing_efficiency(
    placement: DataFrame, seq_len: int
) -> float:
    """Fraction of sequence capacity carrying real tokens:
    ``sum(tokens_in_seq) / (n_sequences · seq_len)``. Concat-split
    (``pack_sequences``) scores 1.0 by construction (only the final
    partial sequence wastes); document-atomic packing pays for its
    boundary guarantee here — the measured number a recipe weighs
    against the no-cross-doc-attention benefit."""
    row = placement.agg(
        F.sum("tokens_in_seq").alias("t"),
        F.countDistinct("seq_id").alias("s"),
    ).first()
    if not row["s"]:
        return 1.0
    return float(row["t"]) / (float(row["s"]) * seq_len)


def sample_token_budget(
    df: DataFrame,
    budget: int,
    count_col: str = "n_tokens",
    key_col: str = "doc_id",
    n_groups: int = 4096,
) -> DataFrame:
    """Deterministic token-budget slice: the corpus prefix (in a
    Knuth-hash shuffled order) whose token total fits ``budget``.

    Data recipes are weighed in TOKENS, not documents — "50 B tokens of
    crawl" — and a doc-count sample misses that by the length
    distribution. Ordering by the multiplicative hash of the key gives a
    uniform, replayable shuffle (same sample every run/engine/retry, and
    a smaller budget's slice is a strict PREFIX of a larger one —
    monotone growth, like hash_sample); the running token total is the
    two-level distributed prefix sum, so selection is one filter:
    ``prefix_sum < budget`` admits every doc that STARTS inside the
    budget (the last admitted doc may overrun by less than one doc —
    document-atomic, nothing is split).

    Shape: the coarse group IS a hash bucket (``n_groups`` of them, so
    the sequential totals window is n_groups rows REGARDLESS of how
    sparse the shuffled order values are — an order-value-derived
    grouping would degenerate to one group per doc), cumsum within
    groups is a partitioned window, offsets broadcast back, selection is
    a map-side filter. Size ``n_groups`` ≈ |corpus| / 1e6 so each
    within-group window partition stays executor-sized.
    """
    from nexus_event_stream_spark.operators.sampling import M32, hash_bucket

    pref = global_prefix_sum(
        df.withColumn(
            "__sub", hash_bucket(F.col(key_col) + 1_000_003, M32)
        ),
        count_col,
        key_col,
        out_col="__pfx",
        group_expr=hash_bucket(key_col, n_groups),
        order_cols=["__sub", key_col],
    )
    return pref.filter(F.col("__pfx") < budget).drop("__sub", "__pfx")


def materialize_packed(
    docs: DataFrame,
    placement: DataFrame,
    order_col: str = "doc_id",
    text_col: str = "text",
    sep: str = " ",
) -> DataFrame:
    """Turn the ``pack_sequences`` placement map into the actual packed
    training sequences: (seq_id, seq_text, n_tokens, n_docs) — each
    sequence the in-order concatenation of its document SPANS (a doc's
    tokens sliced at ``doc_token_start``/``tokens_in_seq``), joined with
    ``sep``.

    The loader-facing materialization: the placement map is the durable
    artifact (tiny, provenance-complete), this turns it into bytes when
    a run wants eager sequences instead of loader-side assembly. Token
    slicing uses the same whitespace convention as ``token_count`` —
    the counts the placement was computed from — so every sequence
    except the last holds exactly the placement's ``seq_len`` tokens
    (pinned; the length lives in the placement map, not here).

    Shape: one broadcast-or-hash join placement⋈docs on ``order_col``
    (placement rows ≈ docs rows), a per-row slice, then ONE shuffle on
    ``seq_id`` with ``collect_list`` of (offset, piece) structs sorted
    in-place — sequences are seq_len-bounded, so a group is at most
    seq_len tokens of text.
    """
    from nexus_event_stream_spark.functions.text import tokens

    pieces = placement.join(
        docs.select(F.col(order_col), tokens(text_col).alias("__toks")),
        order_col,
    ).select(
        "seq_id",
        "offset_in_seq",
        "tokens_in_seq",
        F.array_join(
            F.slice(
                F.col("__toks"),
                F.col("doc_token_start").cast("int") + 1,
                F.col("tokens_in_seq").cast("int"),
            ),
            " ",
        ).alias("__piece"),
    )
    ordered = F.transform(
        F.array_sort(
            F.collect_list(F.struct("offset_in_seq", "__piece"))
        ),
        lambda x: x["__piece"],
    )
    return (
        pieces.groupBy("seq_id")
        .agg(
            F.array_join(ordered, sep).alias("seq_text"),
            F.sum("tokens_in_seq").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )
