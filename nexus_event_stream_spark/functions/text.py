"""Text-analysis column functions for the documents pipeline.

All pure Catalyst expressions (split/transform/aggregate/regexp) — no
Python UDFs, so they stay inside whole-stage codegen and scale linearly.
Used by the dedup / quality / language-ID operators and the §2.11 text
queries.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny deterministic stopword list for quality scoring / language hints.
STOPWORDS = ("the", "a", "and", "of", "to", "in")


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization → array<string> (single-space convention)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def token_count(col: Column | str) -> Column:
    """Number of whitespace tokens."""
    return F.size(tokens(col))


def punct_count(col: Column | str) -> Column:
    """Count of non-alphanumeric, non-space characters (punctuation-ish)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c) - F.length(F.regexp_replace(c, r"[^a-zA-Z0-9 ]", ""))


def ngrams_from_tokens(toks: Column, n: int = 3) -> Column:
    """Array of word n-grams from a *pre-projected* token-array column.

    ``toks`` MUST be a bound column reference (e.g. projected via
    ``.select(F.split(...).alias("__toks"))``), not an inline ``split(...)``
    expression: higher-order-function lambdas are interpreted without
    common-subexpression elimination, so an inline split would re-tokenize
    the document once per n-gram — O(len²) work per row.
    """
    count = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    idx = F.sequence(F.lit(1), count)
    return F.when(
        count > 0, F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    ).otherwise(F.array().cast("array<string>"))


def word_ngrams(col: Column | str, n: int = 3) -> Column:
    """Array of word n-grams (space-joined) from whitespace tokens.

    Convenience form for one-off use; in hot paths prefer projecting the
    token array first and calling ``ngrams_from_tokens`` (see its warning).
    """
    return ngrams_from_tokens(tokens(col), n)


def char_ngrams(col: Column | str, n: int = 5) -> Column:
    """Array of character n-grams (shingles) of the string."""
    c = F.col(col) if isinstance(col, str) else col
    count = F.greatest(F.length(c) - F.lit(n - 1), F.lit(0))
    idx = F.sequence(F.lit(1), count)
    return F.when(count > 0, F.transform(idx, lambda i: F.substring(c, i, n))).otherwise(
        F.array().cast("array<string>")
    )


#: Mersenne prime modulus for portable hashing (fits comfortably in BIGINT
#: intermediate products: acc < 2^31, ×131 + 0x10FFFF < 2^39).
HASH_MOD = 2**31 - 1
HASH_MULT = 131


def portable_string_hash(col: Column | str, mod: int = HASH_MOD) -> Column:
    """Engine-portable polynomial hash of a string column.

    ``acc = (acc*131 + codepoint(ch)) % (2^31-1)`` folded left-to-right over
    the characters. Unlike xxhash64/murmur this is expressible in ANSI SQL
    (DuckDB ``list_reduce`` over ``string_split(s,'')``), which lets the
    MinHash/SimHash pipelines keep full value-level oracles. Exact integer
    arithmetic → identical on any engine/partitioning.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.aggregate(
        F.split(c, ""),
        F.lit(0).cast("bigint"),
        lambda acc, ch: (acc * F.lit(HASH_MULT) + F.ascii(ch).cast("bigint"))
        % F.lit(mod),
    )


def doc_fingerprint(col: Column | str, mod: int = 2**31 - 1) -> Column:
    """Deterministic rolling document fingerprint (SURVEY.md north-star
    'document fingerprinting').

    Polynomial fold over whitespace tokens using engine-portable token
    features (first-char codepoint and length), mod a Mersenne prime:
    ``acc = (acc*31 + ascii(first_char)*131 + len(token)) % m``. Exact
    BIGINT arithmetic → identical on any engine / partitioning.
    """
    toks = tokens(col)
    m = F.lit(mod)
    return F.aggregate(
        toks,
        F.lit(0).cast("bigint"),
        lambda acc, t: (
            acc * F.lit(31)
            + F.ascii(F.substring(t, 1, 1)).cast("bigint") * F.lit(131)
            + F.length(t).cast("bigint")
        )
        % m,
    )


def char_entropy(col: Column | str) -> Column:
    """Shannon entropy (bits/char) of the character distribution — the
    standard gibberish/boilerplate quality signal (natural language sits
    ~3.5-4.5 bits; constant spam near 0, random bytes near 8).

    Sorted run-length fold (the same O(n log n) trick as the mode-bigram
    count — HOFs evaluate interpreted, so per-distinct filter-counts are
    the slow path): sort the char array, fold (prev, run, Σ run·log2 run)
    over it, finish with H = log2 n − Σ/n. Pure Catalyst, shuffle-free.
    """
    c = F.col(col) if isinstance(col, str) else col
    chars = F.array_sort(F.split(c, ""))
    n = F.size(chars)
    zero = F.lit(0.0)
    init = F.struct(
        F.lit("").alias("prev"),
        F.lit(0.0).alias("run"),
        zero.alias("acc"),
    )

    def step(a: Column, x: Column) -> Column:
        is_same = x == a["prev"]
        run = F.when(is_same, a["run"] + 1).otherwise(F.lit(1.0))
        # closing a run adds run·log2(run); reopening subtracts nothing —
        # fold incrementally: moving run r→r+1 adds (r+1)log(r+1) − r·log r
        closed = F.when(
            is_same,
            a["acc"]
            - a["run"] * F.log2(F.greatest(a["run"], F.lit(1.0)))
            + run * F.log2(run),
        ).otherwise(a["acc"])  # new run of 1 contributes 1·log2(1) = 0
        return F.struct(x.alias("prev"), run.alias("run"), closed.alias("acc"))

    acc = F.aggregate(chars, init, step, lambda a: a["acc"])
    return F.when(n > 0, F.log2(n.cast("double")) - acc / n).otherwise(0.0)
