"""Deterministic sampling operators for large-scale training pipelines.

Random (``rand()``-based) sampling is non-replayable: a retried task
resamples differently, breaking exactly-once sinks and cross-run
comparisons. Everything here derives membership from a multiplicative
(Knuth) hash of a unique key, so samples are stable across engines,
retries, partitionings, and runs — the property the catalog pins with
q_hash_sample's DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Knuth's multiplicative constant (2^32 / phi), the same one the
#: q_hash_sample oracle uses.
KNUTH = 2654435761
M32 = 4294967296
#: Keys are folded mod 2^31 before the Knuth multiply so the int64
#: product can never overflow: (2^31−1)·KNUTH ≈ 5.7e18 < 2^63−1, whereas
#: a raw key above ~3.5e9 would silently wrap in Spark's non-ANSI
#: arithmetic while an ANSI engine (or the DuckDB oracle's HUGEINT
#: arithmetic) diverges. The fold is the identity for keys < 2^31, so it
#: only redistributes (uniformly) the buckets of astronomically large ids.
M31 = 2147483648


def hash_bucket(key_col: str | Column, buckets: int = 100) -> Column:
    """Deterministic bucket 0..buckets-1 from an integer key — pure int64
    arithmetic (overflow-free for ANY int64 key: the key is folded mod
    2^31 before the multiply), evaluated map-side, identical in ANSI SQL.
    """
    k = F.col(key_col) if isinstance(key_col, str) else key_col
    folded = F.pmod(k, F.lit(M31))
    return F.pmod(F.pmod(folded * F.lit(KNUTH), F.lit(M32)), F.lit(buckets))


def hash_sample(df: DataFrame, key_col: str, percent: int = 10) -> DataFrame:
    """Keep ~percent% of rows, deterministically (replayable TABLESAMPLE).

    The predicate is a map-side filter — at 100 TB this is the primitive
    that lets a pipeline iterate on 10 TB and then rerun on the full
    corpus with the sampled subset guaranteed to be a subset of itself.
    """
    return df.filter(hash_bucket(key_col, 100) < percent)


def stratified_sample_exact(
    df: DataFrame,
    strata_cols: str | Sequence[str],
    n_per_stratum: int,
    key_col: str,
) -> DataFrame:
    """EXACTLY min(n, |stratum|) rows per stratum ("10k docs per
    language"), chosen deterministically: rows rank by the Knuth hash of
    their unique key within each stratum and the n smallest win (hash
    ties broken by the key itself, so the order is total).

    Plan shape: one hash exchange on the strata + a ranking window whose
    rank<=n predicate is pushed below the shuffle (WindowGroupLimit,
    Spark 3.5+) — each map task pre-drops rows that cannot make the
    per-stratum cut, so shuffle bytes are bounded by n·strata·tasks, not
    the corpus. Growing the sample later (n → n') keeps the old sample a
    strict subset — hash-rank order is stable.
    """
    strata = [strata_cols] if isinstance(strata_cols, str) else list(strata_cols)
    w = Window.partitionBy(*strata).orderBy(
        hash_bucket(key_col, M32), F.col(key_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )


def mix_corpus(
    df: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    key_col: str = "doc_id",
    salt: int = 0,
) -> DataFrame:
    """Deterministic corpus mixture — the per-source weighting step of a
    pre-training data recipe ("2 epochs of wiki, 0.3 of crawl").

    Each source's weight w yields floor(w) guaranteed copies of every
    document plus one extra copy for a deterministic ~frac(w) of them
    (Knuth-hash gated on ``key_col``), so w<1 downsamples, w>1
    upsamples with fractional epochs, and the realized token share
    converges to w·|source| with zero randomness: retries, reruns, and
    other engines reproduce the exact same multiset. Sources missing
    from ``weights`` are dropped (a mixture is an explicit recipe).

    Output gains ``copy_id`` (1..copies) so repeated documents remain
    unique downstream (e.g. for ``pack_sequences`` ordering, use
    (key, copy_id)). ``salt`` decorrelates the fractional gate from
    other hash-gated stages (``hash_sample``) in the same pipeline.

    Scale shape: a literal CASE chain for the weights, one map-side
    Generate for the copies — no shuffle, no driver state; weight dicts
    are recipe-sized (tens of sources), never data-sized.
    """
    frac_buckets = 1_000_000
    w_int = None
    w_frac = None
    for src, w in weights.items():
        if w < 0:
            raise ValueError(f"negative weight for {src!r}: {w}")
        base, frac = int(w), round((w - int(w)) * frac_buckets)
        cond = F.col(source_col) == src
        w_int = (w_int.when if w_int is not None else F.when)(cond, base)
        w_frac = (w_frac.when if w_frac is not None else F.when)(cond, frac)
    if w_int is None:
        raise ValueError("weights must name at least one source")
    salted = F.pmod(
        (F.col(key_col) if isinstance(key_col, str) else key_col)
        + F.lit(salt) * F.lit(1_000_003),
        F.lit(M31),
    )
    extra = F.when(
        hash_bucket(salted, frac_buckets) < w_frac.otherwise(None), 1
    ).otherwise(0)
    copies = (w_int.otherwise(None) + extra).alias("__copies")
    return (
        df.withColumn("__copies", copies)
        .filter(F.col("__copies") > 0)
        .withColumn("copy_id", F.explode(F.sequence(F.lit(1), F.col("__copies"))))
        .drop("__copies")
    )


def weighted_sample(
    df: DataFrame, weight_col: str | Column, k: int, key_col: str
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: exactly
    min(k, |rows with w>0|) rows, inclusion probability ∝ weight — the
    curation step "keep the best-scoring 10 M documents, biased by
    quality, but not a hard top-k cutoff".

    Efraimidis–Spirakis (IPL 2006, public literature) with the exponential
    reformulation: each row draws u ∈ (0,1) — here a Knuth hash of its
    unique key, so replayable — and the k smallest −ln(u)/w win. A hard
    top-k-by-weight would take ONLY the heaviest rows; this keeps the
    whole corpus in support, weight-proportionally, which is what mixture
    curricula actually want.

    Plan shape: map-side score projection + ``TakeOrderedAndProject``
    (per-task k-row heap → driver merge), no global sort, no shuffle of
    the corpus. Growing k keeps the smaller sample a strict prefix (the
    score order is a fixed total order), so sample sizes can be tuned
    without resampling churn.
    """
    w = (F.col(weight_col) if isinstance(weight_col, str) else weight_col).cast(
        "double"
    )
    u = (hash_bucket(key_col, M32).cast("double") + F.lit(0.5)) / F.lit(float(M32))
    score = -F.log(u) / w
    return (
        df.filter(w > 0)
        .withColumn("__es", score)
        # a NULL/non-castable key yields a NULL score, and ascending sort
        # puts NULLS FIRST — unkeyed rows would silently occupy the top-k
        .where(F.col("__es").isNotNull())
        .orderBy("__es", key_col)
        .limit(k)
        .drop("__es")
    )


def weighted_sample_per_group(
    df: DataFrame,
    group_cols: str | Sequence[str],
    weight_col: str | Column,
    n_per_group: int,
    key_col: str,
) -> DataFrame:
    """Exactly min(n, |group|) weight-proportional rows PER GROUP
    ("10 k docs per language, biased by quality score") — the grouped
    twin of ``weighted_sample``, same deterministic Efraimidis–Spirakis
    keys, same prefix-monotonicity in n.

    Plan shape: one hash exchange on the group + a rank window;
    ``WindowGroupLimit`` pre-drops rows past n map-side, so shuffle
    bytes are bounded by n·groups·tasks, not the corpus.
    """
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    w = (F.col(weight_col) if isinstance(weight_col, str) else weight_col).cast(
        "double"
    )
    u = (hash_bucket(key_col, M32).cast("double") + F.lit(0.5)) / F.lit(float(M32))
    score = -F.log(u) / w
    win = Window.partitionBy(*groups).orderBy(score.asc(), F.col(key_col))
    return (
        df.filter(w > 0)
        .where(score.isNotNull())  # same NULLS-FIRST hazard as weighted_sample
        .withColumn("__rn", F.row_number().over(win))
        .filter(F.col("__rn") <= n_per_group)
        .drop("__rn")
    )


def temperature_mixture_weights(
    sizes: dict[str, float],
    alpha: float = 0.3,
    target_total: float | None = None,
) -> dict[str, float]:
    """Temperature-smoothed per-source weights for ``mix_corpus`` — the
    published multilingual sampling rule (exponential smoothing, as in
    XLM-R / mBERT: sample source i with probability
    ``q_i = p_i^alpha / sum_j p_j^alpha`` where ``p_i`` is the source's
    share of the corpus). ``alpha < 1`` flattens the distribution
    (upweights small sources, tames head domination); ``alpha = 1`` is
    natural proportions; ``alpha = 0`` is uniform across sources.

    ``sizes`` maps source → its size (docs or tokens — whatever unit the
    mixture should be fair in). The returned weights are the per-doc
    copy factors that realize q: ``w_i = q_i / p_i``, scaled so the
    expected output size equals ``target_total`` (default: the input
    total — a reshuffle, not a grow). Pure driver math on |sources|
    numbers; feed the result straight to ``mix_corpus``.
    """
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    pos = {s: float(n) for s, n in sizes.items() if n and n > 0}
    if not pos:
        raise ValueError("sizes must contain at least one positive entry")
    total = sum(pos.values())
    p = {s: n / total for s, n in pos.items()}
    smoothed = {s: v**alpha for s, v in p.items()}
    z = sum(smoothed.values())
    q = {s: v / z for s, v in smoothed.items()}
    out_total = float(target_total) if target_total is not None else total
    return {s: q[s] * out_total / pos[s] for s in pos}
