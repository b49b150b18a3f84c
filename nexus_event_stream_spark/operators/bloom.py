"""Bloom-filter semi-join pruning — cut the fact-table shuffle before a join.

The classic 100 TB join problem: a fact table too big to move joins a dim
whose *filtered* key set is modest but whose rows are too wide (or too many)
to broadcast as an exact hash table. A Bloom filter of the dim keys costs
~10 bits/key at 1 % false positives — 8-64x smaller than broadcasting the
exact 8-byte key hashes — and pruning the fact against it *before* the
shuffle drops the data volume of the exchange by (1 - selectivity).
Spark's own runtime row-level filtering does this for some shapes
(``spark.sql.optimizer.runtime.bloomFilter.enabled``), but the planner's
``bloom_filter_agg`` / ``might_contain`` expressions are not exposed to
SQL/DataFrame users (verified: UNRESOLVED_ROUTINE on Spark 4.1), and the
optimizer only injects them under its own heuristics. This module is the
user-steerable version, pure Catalyst end-to-end:

- **build**: one pass over the (filtered) dim — k positions per key via
  Kirsch-Mitzenmacher double hashing on ``xxhash64``, ``posexplode``-free
  explode to (word_index, bit_mask) pairs, ``bit_or`` aggregation. The
  result is W = ceil(m/64) longs collected to the driver: |filter|-bounded,
  never |dim|-bounded.
- **probe (expression)**: the word array embedded as ONE array literal;
  membership is k ``element_at`` + bit-test expressions AND-ed together.
  Zero joins, zero Python, whole-stage-codegen-able, and the filter sits
  directly above the fact scan so Catalyst can still push *other*
  predicates down past it.
- **probe (broadcast join)**: for filters too large to inline as a literal
  (beyond ~1M words the expression tree and task binary bloat), the words
  become a W-row broadcast table and the probe is k map-side broadcast
  hash joins — still no shuffle of the fact.

No false negatives ever (the filter is exact on the build side); false
positives only cost a few stray rows that the real join discards.

ANSI-safety: Spark 4 runs with ANSI arithmetic (overflow throws). All
position math is ``pmod``-reduced *before* multiplying by the probe index,
so intermediate values stay ≤ k·m and never overflow a long.

Reference parity: the reference engine has no bloom tier — its joins are
Postgres-side (control-plane/nexus/core/views.py) at toy scale. This is
part of the north-star scale surface, same tier as operators/partitioning.py.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Second hash seed for Kirsch-Mitzenmacher double hashing: any constant
# distinct from xxhash64's default seed works; golden-ratio constant is
# conventional.
_SEED2 = 0x9E3779B9

# Above this word count the inline array literal stops being sensible
# (plan size, task-binary bloat) — callers should switch to the
# broadcast-join probe.
MAX_EXPR_WORDS = 1 << 20


def bloom_params(n_keys: int, fpr: float = 0.01) -> tuple[int, int]:
    """Optimal (m_bits, k_hashes) for ``n_keys`` at false-positive rate
    ``fpr``: m = -n·ln p / (ln 2)^2, k = (m/n)·ln 2."""
    if n_keys <= 0:
        raise ValueError("n_keys must be positive")
    if not (0.0 < fpr < 1.0):
        raise ValueError("fpr must be in (0, 1)")
    m = math.ceil(-n_keys * math.log(fpr) / (math.log(2) ** 2))
    m = max(64, ((m + 63) // 64) * 64)  # whole words
    k = max(1, round(m / n_keys * math.log(2)))
    return m, k


@dataclass(frozen=True)
class BloomFilter:
    """A built filter: ``words[i]`` holds bits [64i, 64i+64)."""

    m_bits: int
    k: int
    words: tuple[int, ...]  # length m_bits // 64, signed 64-bit

    @property
    def n_words(self) -> int:
        return self.m_bits // 64

    def fpr_estimate(self, n_keys: int) -> float:
        """Theoretical FPR after inserting ``n_keys``."""
        return (1.0 - math.exp(-self.k * n_keys / self.m_bits)) ** self.k


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """k bit positions in [0, m_bits) via double hashing. pmod-first so
    every intermediate is ≤ k·m_bits (ANSI-overflow-safe)."""
    m = F.lit(m_bits)
    h1 = F.pmod(F.xxhash64(key), m)
    h2 = F.pmod(F.xxhash64(key, F.lit(_SEED2)), m)
    return [F.pmod(h1 + F.lit(i) * h2, m) for i in range(k)]


def bloom_build(
    df: DataFrame, key: Column | str, *, m_bits: int, k: int
) -> BloomFilter:
    """One distributed pass over ``df``: explode each key to its k
    (word_index, mask) pairs, ``bit_or`` per word. Collects W = m/64 rows —
    bounded by the filter size, independent of |df|. NULL keys are skipped
    (a NULL never equi-joins, so pruning it is semantics-preserving)."""
    if m_bits % 64 != 0 or m_bits <= 0:
        raise ValueError("m_bits must be a positive multiple of 64")
    if k <= 0:
        raise ValueError("k must be positive")
    key = F.col(key) if isinstance(key, str) else key
    pos = F.explode(F.array(*_positions(key, m_bits, k))).alias("pos")
    words = (
        df.where(key.isNotNull())
        .select(pos)
        .select(
            F.shiftright(F.col("pos"), 6).alias("w"),
            F.expr("shiftleft(1L, int(pos % 64))").alias("mask"),
        )
        .groupBy("w")
        .agg(F.bit_or("mask").alias("word"))
        .collect()
    )
    arr = [0] * (m_bits // 64)
    for r in words:
        arr[r["w"]] = r["word"]
    return BloomFilter(m_bits=m_bits, k=k, words=tuple(arr))


def bloom_build_for(
    df: DataFrame, key: Column | str, *, n_keys: int, fpr: float = 0.01
) -> BloomFilter:
    """``bloom_build`` with (m, k) sized from an expected key count —
    pair with a KMV estimate (operators/sketches.py) when |keys| is unknown."""
    m, k = bloom_params(n_keys, fpr)
    return bloom_build(df, key, m_bits=m, k=k)


def bloom_might_contain(bf: BloomFilter, key: Column | str) -> Column:
    """Pure-expression membership test: k element_at + bit-tests over one
    array literal. True ⇒ maybe present; False ⇒ definitely absent.
    NULL keys yield NULL (filter drops them, matching equi-join semantics)."""
    if bf.n_words > MAX_EXPR_WORDS:
        raise ValueError(
            f"{bf.n_words} words exceeds MAX_EXPR_WORDS={MAX_EXPR_WORDS}; "
            "use bloom_prune_join for large filters"
        )
    key = F.col(key) if isinstance(key, str) else key
    arr = F.lit(list(bf.words))
    cond: Column | None = None
    for pos in _positions(key, bf.m_bits, bf.k):
        word = F.element_at(arr, (F.shiftright(pos, 6) + F.lit(1)).cast("int"))
        cond_i = _bit_is_set(word, pos)
        cond = cond_i if cond is None else (cond & cond_i)
    return cond


def _bit_is_set(word: Column, pos: Column) -> Column:
    """(word >> (pos % 64)) & 1 == 1, with a column shift amount.

    PySpark's ``F.shiftright`` only takes a literal shift, so the dynamic
    shift goes through ``F.try_divide``-free integer math: shifting right
    by s equals ``floor-div by 2^s`` only for non-negative values, and
    words carry bit 63. Instead test with a mask built by repeated doubling:
    ``pmod(pos, 64)`` selects one of 64 precomputed single-bit masks from a
    literal lookup array — branchless and codegen-friendly."""
    masks = F.lit([1 << i if i < 63 else -(1 << 63) for i in range(64)])
    mask = F.element_at(masks, (F.pmod(pos, F.lit(64)) + F.lit(1)).cast("int"))
    return word.bitwiseAND(mask) != F.lit(0)


def bloom_prune(df: DataFrame, key: Column | str, bf: BloomFilter) -> DataFrame:
    """Filter ``df`` to rows whose key might be in the filter. Apply this
    *below* a join so the exchange moves only surviving rows."""
    return df.where(bloom_might_contain(bf, key))


def bloom_words_df(spark, bf: BloomFilter) -> DataFrame:
    """The filter as a W-row (w, word) table for the broadcast-join probe."""
    rows = [(i, w) for i, w in enumerate(bf.words) if w != 0]
    return spark.createDataFrame(rows or [(0, 0)], "w int, word bigint")


def bloom_prune_join(
    df: DataFrame, key: Column | str, bf: BloomFilter
) -> DataFrame:
    """Broadcast-join probe for filters too big to inline: k map-side
    broadcast hash joins against the W-row word table, then one AND filter.
    Still zero shuffles of ``df`` — every join is broadcast."""
    spark = df.sparkSession
    words = bloom_words_df(spark, bf)
    key = F.col(key) if isinstance(key, str) else key
    out = df
    checks: list[Column] = []
    for i, pos in enumerate(_positions(key, bf.m_bits, bf.k)):
        pcol, wcol = f"__bf_pos{i}", f"__bf_word{i}"
        out = out.withColumn(pcol, pos)
        w_i = words.select(
            F.col("w").alias(f"__bf_w{i}"), F.col("word").alias(wcol)
        )
        out = out.join(
            F.broadcast(w_i),
            F.shiftright(F.col(pcol), 6).cast("int") == F.col(f"__bf_w{i}"),
            "left",
        )
        # absent word row == all-zero word == bit not set
        checks.append(
            _bit_is_set(F.coalesce(F.col(wcol), F.lit(0)), F.col(pcol))
        )
    cond = checks[0]
    for c in checks[1:]:
        cond = cond & c
    drop = [c for i in range(bf.k) for c in (f"__bf_pos{i}", f"__bf_w{i}", f"__bf_word{i}")]
    return out.where(cond).drop(*drop)
