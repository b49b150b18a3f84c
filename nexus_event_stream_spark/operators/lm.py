"""Character-n-gram language-model perplexity scoring (CCNet-style).

The published pretraining recipe (CCNet, Wenzek et al. 2020,
arXiv:1911.00359) filters crawled text by the perplexity of a language
model trained on a trusted corpus: boilerplate, encoding garbage, and
wrong-language text all score far from the in-domain distribution. CCNet
uses a KenLM word model; the sandbox has no LM libraries, so this module
trains its own CHARACTER n-gram model with stupid-backoff smoothing
(Brants et al. 2007, "Large Language Models in Machine Translation" —
the count-ratio backoff built for exactly this distributed-counting
setting: no discounting pass, partial counts merge by addition). A char
model needs no tokenizer, is language-agnostic, and its state is a few
hundred thousand counters — broadcastable.

No reference counterpart — north-star LLM-pipeline tier, sitting beside
the heuristic quality signals (operators/quality.py) and the learned
logreg gate (operators/classifier.py): rules catch structure, the
classifier catches labeled badness, perplexity catches "not the trusted
distribution" without labels.

Scale shape (the 100 TB argument):
- Training is ONE shuffle of PARTIAL gram counts: an Arrow kernel
  hashes every order-k window (uint64 rolling hash, vectorized numpy),
  pre-counts them per batch with ``np.unique``, and emits (order, hash,
  partial) rows — shuffle bytes ∝ distinct grams per batch, not corpus
  chars. ``min_count`` pruning and a per-order ``max_grams`` top-K cap
  bound the model (and the driver collect) regardless of corpus size;
  both caps are the df-cap discipline of the dedup/BM25 tiers.
- Scoring is ZERO shuffle: the model broadcasts as sorted uint64
  arrays, and each doc's per-char backoff chain is numpy
  ``searchsorted`` lookups over its sliding windows — no Python loop
  over characters, no per-row UDF.
- Grams are stored as 64-bit hashes, never strings (collision odds at
  1e6 grams ≈ 2.7e-8 — far below any filtering consequence; documented,
  not hidden).

Determinism: training counts are exact integers (partition-independent
by commutativity); scoring is per-row float math against a frozen
model, identical under any partitioning.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F, types as T

__all__ = [
    "train_char_lm",
    "perplexity_score",
    "lm_gate",
    "language_id",
    "importance_weights",
    "dsir_select",
    "BACKOFF_ALPHA",
]

#: stupid-backoff weight (Brants et al. 2007 use 0.4 for every level)
BACKOFF_ALPHA = 0.4
#: rolling-hash base (FNV64 prime); uint64 wraparound IS the modulus
_HASH_BASE = 1099511628211


def _gram_hashes(cp, k):
    """uint64 rolling hashes of every k-window of codepoint array ``cp``
    (vectorized; wraparound multiplication is the hash's modulus)."""
    import numpy as np

    if len(cp) < k:
        return np.empty(0, dtype=np.uint64)
    win = np.lib.stride_tricks.sliding_window_view(cp, k).astype(np.uint64)
    pows = np.power(
        np.uint64(_HASH_BASE), np.arange(k, dtype=np.uint64)
    )  # wraps — fine
    return (win * pows).sum(axis=1, dtype=np.uint64)


def _codepoints(text: str):
    import numpy as np

    return np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)


def train_char_lm(
    docs: DataFrame,
    n: int = 3,
    text_col: str = "text",
    min_count: int = 2,
    max_grams: int = 200_000,
) -> dict:
    """Train the char-n-gram count model: one partial-count shuffle, one
    bounded collect.

    Returns ``{"n": n, "total_chars": int, "orders": {k: (hashes,
    counts)}}`` with ``hashes`` a SORTED uint64 ndarray and ``counts``
    int64 — the broadcast-ready lookup tables ``perplexity_score``
    searches. Orders 1..n are all kept (the backoff chain needs every
    level). Per order, grams below ``min_count`` are pruned and only the
    ``max_grams`` most frequent survive (ties broken by hash for
    determinism) — the model-size cap that keeps the driver collect and
    the broadcast bounded at any corpus size.
    """
    import numpy as np

    out_schema = T.StructType(
        [
            T.StructField("order", T.IntegerType()),
            T.StructField("h", T.LongType()),  # uint64 bits as int64
            T.StructField("c", T.LongType()),
        ]
    )

    def partial_counts(batches):
        import pandas as pd

        for pdf in batches:
            per_order: dict[int, list] = {k: [] for k in range(1, n + 1)}
            for text in pdf[text_col]:
                if not text:
                    continue
                cp = _codepoints(text)
                for k in range(1, n + 1):
                    per_order[k].append(_gram_hashes(cp, k))
            orders, hs, cs = [], [], []
            for k, parts in per_order.items():
                if not parts:
                    continue
                allh = np.concatenate(parts)
                if not len(allh):
                    continue
                uniq, cnt = np.unique(allh, return_counts=True)
                orders.append(np.full(len(uniq), k, dtype=np.int32))
                hs.append(uniq.view(np.int64))
                cs.append(cnt.astype(np.int64))
            if orders:
                yield pd.DataFrame(
                    {
                        "order": np.concatenate(orders),
                        "h": np.concatenate(hs),
                        "c": np.concatenate(cs),
                    }
                )

    counts = (
        docs.select(text_col)
        .mapInPandas(partial_counts, out_schema)
        .groupBy("order", "h")
        .agg(F.sum("c").alias("c"))
        .filter(F.col("c") >= min_count)
    )
    # per-order top-K cap: rank by (count desc, hash asc) — deterministic
    from pyspark.sql import Window

    w = Window.partitionBy("order").orderBy(F.col("c").desc(), F.col("h").asc())
    rows = (
        counts.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= max_grams)
        .select("order", "h", "c")
        .collect()
    )
    orders: dict[int, tuple] = {}
    by_order: dict[int, list] = {}
    for r in rows:
        by_order.setdefault(int(r["order"]), []).append(
            (int(r["h"]), int(r["c"]))
        )
    for k, pairs in by_order.items():
        # sort in UNSIGNED order — the lookup searchsorts uint64 views,
        # and a signed sort misplaces every hash with bit 63 set (13 %
        # of trigrams on non-ASCII text; pinned in tests)
        h = np.array([p[0] for p in pairs], dtype=np.int64).view(np.uint64)
        c = np.array([p[1] for p in pairs], dtype=np.int64)
        order = np.argsort(h, kind="stable")
        orders[k] = (h[order], c[order])
    total = int(docs.select(
        F.sum(F.length(F.coalesce(F.col(text_col), F.lit("")))).alias("t")
    ).first()["t"] or 0)
    return {"n": n, "total_chars": total, "orders": orders}


def _lookup(model, k, hashes):
    """counts aligned to ``hashes`` from the order-k table, 0 where absent."""
    import numpy as np

    tab = model["orders"].get(k)
    if tab is None or not len(tab[0]):
        return np.zeros(len(hashes), dtype=np.int64)
    th, tc = tab
    idx = np.searchsorted(th, hashes)
    idx_c = np.minimum(idx, len(th) - 1)
    hit = th[idx_c] == hashes
    return np.where(hit, tc[idx_c], 0)


#: cap on the per-call concatenation (chars): above it, _score_batch
#: recurses on halves. Bounds the working set — every order holds ~5
#: L-sized temporaries (window matrix, hashes, counts, masks), so 2M
#: chars ≈ 80 MB per order instead of a whole 10k-doc Arrow batch's
#: ~700 MB (measured: the unchunked kernel thrashed allocation on sf0.1
#: and lm_ppl_25x ran 3× slower than the chunked one).
_SCORE_CHUNK_CHARS = 2_000_000


def _score_batch(cps, model):
    """log10 stupid-backoff sums for a LIST of codepoint arrays in one
    set of whole-batch numpy passes: all docs concatenate into one
    array, each order's gram hashes and table lookups run once over the
    concatenation, windows that straddle a doc boundary are masked
    invalid, and per-doc sums come off one ``reduceat``. Bit-identical
    to scoring docs one at a time (``_score_doc`` is the readable spec;
    equivalence is pinned in tests) — this exists because per-doc numpy
    calls are overhead-bound on short documents. Concatenations above
    ``_SCORE_CHUNK_CHARS`` split into doc-aligned halves (per-doc math
    is independent, so chunking cannot change a single bit)."""
    import numpy as np

    if not cps:
        return np.empty(0, dtype=np.float64)
    if len(cps) > 1 and sum(len(c) for c in cps) > _SCORE_CHUNK_CHARS:
        mid = len(cps) // 2
        return np.concatenate(
            [_score_batch(cps[:mid], model), _score_batch(cps[mid:], model)]
        )
    n = model["n"]
    total = max(model["total_chars"], 1)
    lens = np.array([len(c) for c in cps], dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    cat = np.concatenate(cps)
    L = len(cat)
    # start offset of the doc owning each position
    owner_start = np.repeat(starts, lens)
    pos = np.arange(L)
    gram_c = {}
    valid = {}
    for k in range(1, n + 1):
        c = np.zeros(L, dtype=np.int64)
        if L >= k:
            c[k - 1 :] = _lookup(model, k, _gram_hashes(cat, k))
        gram_c[k] = c
        valid[k] = (pos - owner_start) >= (k - 1)
    logp = np.full(L, math.log10(1.0 / (10.0 * total)))
    uni = gram_c[1]
    has_uni = uni > 0
    logp[has_uni] = np.log10(uni[has_uni] / total)
    alpha_pow = np.zeros(L)
    for k in range(2, n + 1):
        ctx = np.zeros(L, dtype=np.int64)
        ctx[1:] = gram_c[k - 1][:-1]
        ok = valid[k] & (gram_c[k] > 0) & (ctx > 0)
        ratios = np.ones(L)
        np.divide(gram_c[k], ctx, out=ratios, where=ok)
        logp[ok] = np.log10(ratios[ok])
        alpha_pow[~ok & valid[k]] += 1.0
        alpha_pow[ok] = 0.0
    logp = logp + alpha_pow * math.log10(BACKOFF_ALPHA)
    # reduceat needs non-empty slices: empty docs were filtered upstream
    return np.add.reduceat(logp, starts)


def _score_doc(cp, model):
    """Sum of log10 stupid-backoff char probabilities for one doc
    (vectorized: one searchsorted per order, then a per-char argmax of
    the deepest available order). The readable single-doc spec —
    ``_score_batch`` is the whole-batch twin the scorer actually runs;
    their bit-equivalence is pinned in tests."""
    import numpy as np

    n = model["n"]
    total = max(model["total_chars"], 1)
    L = len(cp)
    if L == 0:
        return 0.0
    # per position i (char cp[i]): counts of the k-gram ENDING at i and
    # its (k-1)-context, for k = n..1 (table lookups via the shared
    # _lookup — one implementation for spec, batch kernel, and trainer)
    gram_c = {}
    for k in range(1, n + 1):
        c = np.zeros(L, dtype=np.int64)
        if L >= k:
            c[k - 1 :] = _lookup(model, k, _gram_hashes(cp, k))
        gram_c[k] = c
    # stupid backoff, vectorized over positions: start at the deepest
    # order with both gram and context present; multiply alpha per level
    # of backoff. Base: unigram count / total, OOV floor 1/(10*total).
    logp = np.full(L, math.log10(1.0 / (10.0 * total)))
    uni = gram_c[1]
    has_uni = uni > 0
    logp[has_uni] = np.log10(uni[has_uni] / total)
    # climb orders from 2..n: where gram k and its context (the (k-1)-gram
    # ending at i-1) both exist, the ratio replaces the backed-off value
    alpha_pow = np.zeros(L)  # levels backed off from the deepest usable
    for k in range(2, n + 1):
        ctx = np.zeros(L, dtype=np.int64)
        ctx[1:] = gram_c[k - 1][:-1]
        ok = (gram_c[k] > 0) & (ctx > 0)
        logp[ok] = np.log10(gram_c[k][ok] / ctx[ok])
        alpha_pow[~ok & (np.arange(L) >= k - 1)] += 1.0
        alpha_pow[ok] = 0.0
    logp = logp + alpha_pow * math.log10(BACKOFF_ALPHA)
    # sequential (reduceat-order) summation — the batch twin sums each
    # doc's slice with np.add.reduceat, and bit-identity between the two
    # requires the same fold order (np.sum's pairwise tree differs in
    # the last ulp)
    return float(np.add.reduceat(logp, [0])[0])


def perplexity_score(
    docs: DataFrame,
    model: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: bool = False,
) -> DataFrame:
    """Per-document perplexity under the trained model: (id_col,
    n_chars, log10_prob, ppl_char). Zero shuffle — one Arrow kernel with
    the model's sorted-array tables in scope (broadcast with the task
    closure; bounded by ``max_grams``·n entries).

    ``ppl_char = 10^(−log10_prob / n_chars)`` — lower is more in-domain;
    CCNet's head/middle/tail split or a plain ceiling both read off this
    column. Empty/NULL docs score ppl 1.0 (no evidence ≠ bad).

    ``keep_cols=True`` passes every input column through the kernel and
    appends the three score columns — the filtering-stage shape (a gate
    can filter on ppl_char and drop the scores with no join-back
    shuffle)."""
    base = docs if keep_cols else docs.select(id_col, text_col)
    score_fields = [
        T.StructField("n_chars", T.IntegerType()),
        T.StructField("log10_prob", T.DoubleType()),
        T.StructField("ppl_char", T.DoubleType()),
    ]
    out_schema = T.StructType(list(base.schema.fields) + score_fields)

    def batches(it):
        import numpy as np

        for pdf in it:
            cps, idxs = [], []
            ncs = np.zeros(len(pdf), dtype=np.int64)
            for i, text in enumerate(pdf[text_col]):
                cp = _codepoints(text) if text else None
                if cp is not None and len(cp):
                    cps.append(cp)
                    idxs.append(i)
                    ncs[i] = len(cp)
            lps = np.zeros(len(pdf), dtype=np.float64)
            if cps:
                lps[np.array(idxs)] = _score_batch(cps, model)
            ppls = np.ones(len(pdf), dtype=np.float64)
            nz = ncs > 0
            ppls[nz] = 10.0 ** (-lps[nz] / ncs[nz])
            out = pdf.copy()
            out["n_chars"] = ncs.astype("int32")
            out["log10_prob"] = lps
            out["ppl_char"] = ppls
            yield out

    scored = base.mapInPandas(batches, out_schema)
    if keep_cols:
        return scored
    return scored.select(id_col, "n_chars", "log10_prob", "ppl_char")


def lm_gate(
    docs: DataFrame,
    model: dict,
    ppl_max: float = 1_000.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Keep only documents whose per-char perplexity under ``model`` is
    ≤ ``ppl_max`` — the CCNet-style OOD gate as a standalone stage,
    returning the input columns unchanged.

    STATELESS, so it composes onto batch pipelines
    (``CorpusRecipe.lm_model`` routes here) and STREAMING micro-batches
    alike — a readStream hygiene chain can gate gibberish before it
    ever reaches the signature store or corpus sink (pinned in
    tests/test_streaming_dedup.py across a checkpoint restart). The
    model rides each task's serialized closure (Spark broadcasts
    closure constants per stage); ``train_char_lm``'s min_count +
    per-order top-K caps are what keep it broadcast-sized at any
    corpus scale."""
    scored = perplexity_score(
        docs, model, id_col=id_col, text_col=text_col, keep_cols=True
    )
    return scored.filter(F.col("ppl_char") <= F.lit(float(ppl_max))).select(
        *docs.columns
    )


def language_id(
    docs: DataFrame,
    models: dict[str, dict],
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: bool = False,
) -> DataFrame:
    """Char-LM language identification: classify each document as the
    ``models`` key whose trained char-n-gram model (``train_char_lm``,
    one per language on a trusted slice of that language) gives it the
    highest PER-CHAR log-likelihood — the CCNet/fastText-era recipe
    with this module's models standing in for the external classifier.
    Compared to the stopword-density heuristic (``q_text_analysis``),
    the argmax over real likelihoods separates languages that share a
    script and needs no per-language stopword lists.

    Appends ``lang`` (argmax key; ties break to the lexicographically
    smallest key for determinism; NULL for empty/NULL docs — no
    evidence is not a language), ``lang_log10_per_char`` (the winning
    per-char log10 likelihood) and ``lang_margin`` (win minus runner-up
    per-char — the confidence a router can threshold on; equals 0.0
    with a single model). ``keep_cols=True`` passes every input column
    through (the routing-stage shape).

    ZERO shuffle, ONE kernel for all models: each Arrow batch decodes
    codepoints once and scores every model over the same concatenation
    (`_score_batch` per model — the models share the windows only
    conceptually; each holds its own hash tables, but the decode and
    batch plumbing are paid once). Model state rides the task closure,
    bounded by ``train_char_lm``'s min_count/top-K caps per model.
    """
    import numpy as np

    if not models:
        raise ValueError("language_id needs at least one model")
    names = sorted(models)  # ties break to the smallest key
    base = docs if keep_cols else docs.select(id_col, text_col)
    out_schema = T.StructType(
        list(base.schema.fields)
        + [
            T.StructField("lang", T.StringType()),
            T.StructField("lang_log10_per_char", T.DoubleType()),
            T.StructField("lang_margin", T.DoubleType()),
        ]
    )

    def batches(it):
        import pandas as pd

        for pdf in it:
            cps, idxs = [], []
            ncs = np.zeros(len(pdf), dtype=np.int64)
            for i, text in enumerate(pdf[text_col]):
                cp = _codepoints(text) if text else None
                if cp is not None and len(cp):
                    cps.append(cp)
                    idxs.append(i)
                    ncs[i] = len(cp)
            langs = [None] * len(pdf)
            best = np.full(len(pdf), np.nan)
            margin = np.full(len(pdf), np.nan)
            if cps:
                ix = np.array(idxs)
                # (models × docs) per-char scores in one pass per model
                scores = np.stack(
                    [_score_batch(cps, models[m]) for m in names]
                ) / ncs[ix]
                order = np.argsort(-scores, axis=0, kind="stable")
                win = order[0]
                for j, i in enumerate(ix):
                    langs[i] = names[win[j]]
                best[ix] = scores[win, np.arange(len(ix))]
                if len(names) > 1:
                    second = scores[order[1], np.arange(len(ix))]
                    margin[ix] = best[ix] - second
                else:
                    margin[ix] = 0.0
            out = pdf.copy()
            out["lang"] = pd.Series(langs, dtype="object", index=pdf.index)
            out["lang_log10_per_char"] = best
            out["lang_margin"] = margin
            yield out

    return base.mapInPandas(batches, out_schema)


def importance_weights(
    docs: DataFrame,
    target_model: dict,
    raw_model: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
    normalize: str = "per_char",
) -> DataFrame:
    """DSIR-style importance weights (Data Selection via Importance
    Resampling, Xie et al. 2023, arXiv:2302.03169): per document,
    ``log10_ratio = log10 p_target(x) − log10 p_raw(x)`` under two
    trained char-LMs, plus ``weight = 10^ratio`` ready for the
    weighted sampler. The paper's estimator uses hashed-n-gram bag
    models; the char-LM twins here play the same role (both are cheap
    n-gram likelihoods — the ratio is what matters) and reuse this
    module's whole-batch kernel.

    ``normalize='per_char'`` (default) divides the log-ratio by doc
    length before exponentiating — the geometric-mean ratio. Raw
    full-document ratios grow linearly in length, so long documents
    dominate any finite sample AND overflow float64; the per-char form
    is length-fair and bounded. ``normalize='none'`` keeps the paper's
    raw full-sequence ratio (right when the corpus is pre-chunked to
    fixed lengths, as DSIR's inputs are), with the weight clamped to
    float64 range.

    Zero shuffle: one Arrow kernel scores BOTH models per batch — the
    text decodes to codepoints once.
    """
    if normalize not in ("per_char", "none"):
        raise ValueError(f"normalize must be per_char|none, got {normalize!r}")
    # the id rides through untouched — its type comes from the input
    # schema, not a LongType assumption (string/int ids fail at the API
    # boundary, not inside the Arrow kernel)
    out_schema = T.StructType(
        [
            docs.schema[id_col],
            T.StructField("n_chars", T.IntegerType()),
            T.StructField("log10_ratio", T.DoubleType()),
            T.StructField("weight", T.DoubleType()),
        ]
    )

    def batches(it):
        import numpy as np

        for pdf in it:
            cps, idxs = [], []
            ncs = np.zeros(len(pdf), dtype=np.int64)
            for i, text in enumerate(pdf[text_col]):
                cp = _codepoints(text) if text else None
                if cp is not None and len(cp):
                    cps.append(cp)
                    idxs.append(i)
                    ncs[i] = len(cp)
            ratio = np.zeros(len(pdf), dtype=np.float64)
            if cps:
                ix = np.array(idxs)
                ratio[ix] = _score_batch(cps, target_model) - _score_batch(
                    cps, raw_model
                )
            if normalize == "per_char":
                nz = ncs > 0
                ratio[nz] = ratio[nz] / ncs[nz]
            # clamp the exponent so the weight stays a normal float64
            # (an inf weight would pin the sampler key at 0 for every
            # such row, erasing their relative order)
            w = 10.0 ** np.clip(ratio, -300.0, 300.0)
            import pandas as pd

            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_chars": ncs.astype("int32"),
                    "log10_ratio": ratio,
                    "weight": w,
                }
            )

    return docs.select(id_col, text_col).mapInPandas(batches, out_schema)


def dsir_select(
    docs: DataFrame,
    target_model: dict,
    raw_model: dict,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    normalize: str = "per_char",
) -> DataFrame:
    """Select ``k`` documents by importance resampling: importance
    weights (above) fed to the deterministic Efraimidis–Spirakis
    weighted sampler — sampling WITHOUT replacement with inclusion
    probability ∝ p_target/p_raw, the DSIR selection step. Returns the
    selected docs (original columns + log10_ratio + weight).

    Plan: zero-shuffle weighting kernel + the sampler's
    TakeOrderedAndProject (per-task heap, no corpus shuffle) + one
    broadcast-able semi-join back to the doc columns.
    """
    from .sampling import weighted_sample

    weights = importance_weights(
        docs, target_model, raw_model,
        id_col=id_col, text_col=text_col, normalize=normalize,
    )
    picked = weighted_sample(weights, "weight", k, key_col=id_col)
    return docs.join(
        picked.select(id_col, "log10_ratio", "weight"), id_col
    )
