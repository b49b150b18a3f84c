"""Count-Min Sketch — point-frequency estimates for EVERY item, in d×w
integers (Cormode & Muthukrishnan 2005).

The sketch tier's missing quadrant: KMV answers cardinality, Misra-Gries
answers "which items are heavy", Bloom answers membership — none answers
"roughly how often has THIS item been seen" for arbitrary items. CMS
does, with the guarantee that matters for corpus work: estimates NEVER
undercount (est(x) ≥ true(x) always; est(x) ≤ true(x) + ε·N with
probability 1−δ at w = ⌈e/ε⌉, d = ⌈ln(1/δ)⌉).

That one-sidedness makes the headline composition sound by construction:
``rare_gram_frac`` scores each document by the fraction of its n-grams
whose corpus frequency estimate is BELOW a floor — since CMS only
overestimates, "rare" verdicts are conservative (a common gram can never
be called rare; some truly-rare grams are missed at the ε·N rate). The
published use: rarity/novelty weighting for sampling and curation — the
counting complement of Bloom-filter membership dedup.

Spark shape:
- **build**: ONE corpus pass — d (row, cell) pairs per key via
  ``xxhash64(key, row)`` — then a partial-aggregating groupBy whose
  shuffle is bounded by d×w CELLS per map task, never by rows; the
  collected table is d×w ints, |sketch|-bounded like the Bloom build.
- **probe**: ``cms_estimate`` is a pure expression — d ``element_at``
  lookups into the row literals + ``least`` — zero joins, zero Python,
  composable inside HOF lambdas, so ``rare_gram_frac`` scores every
  gram of every document map-side over the pre-projected gram array
  (zero explode, zero shuffle; plan-pinned).
- **merge**: cellwise add under identical (w, d) — mergeable across
  sources/epochs/snapshots without revisiting data; JSON round-trips.

Reference parity: no analogue (the reference counts nothing) —
north-star sketch tier beside operators/sketches.py / heavy_hitters.py.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cms_params(epsilon: float = 0.001, delta: float = 0.01) -> tuple[int, int]:
    """(w, d) for additive error ≤ ε·N with probability ≥ 1−δ."""
    if not (0 < epsilon < 1) or not (0 < delta < 1):
        raise ValueError("epsilon and delta must be in (0, 1)")
    return math.ceil(math.e / epsilon), math.ceil(math.log(1 / delta))


@dataclass(frozen=True)
class CMSketch:
    w: int
    d: int
    rows: tuple[tuple[int, ...], ...]  # d rows of w counters
    n_total: int  # total inserted weight (the N in the ε·N bound)

    def to_dict(self) -> dict:
        return {
            "w": self.w,
            "d": self.d,
            "rows": [list(r) for r in self.rows],
            "n_total": self.n_total,
        }

    @staticmethod
    def from_dict(dd: dict) -> "CMSketch":
        return CMSketch(
            w=dd["w"],
            d=dd["d"],
            rows=tuple(tuple(r) for r in dd["rows"]),
            n_total=dd["n_total"],
        )


def _cell(key: Column, row: int, w: int) -> Column:
    # row index folded into the hash input — d independent hash rows
    # from the same 64-bit function, the standard construction
    return F.pmod(F.xxhash64(key, F.lit(row)), F.lit(w))


def cms_build(
    df: DataFrame,
    key: Column | str,
    *,
    w: int,
    d: int,
    weight: Column | None = None,
) -> CMSketch:
    """One distributed pass: d (row, cell, weight) triples per key,
    partial-aggregated before the shuffle (bytes bounded by d×w cells
    per task), collected as ≤ d×w rows. NULL keys are skipped."""
    if w <= 0 or d <= 0:
        raise ValueError("w and d must be positive")
    key = F.col(key) if isinstance(key, str) else key
    wcol = F.lit(1).cast("bigint") if weight is None else weight.cast("bigint")
    keyed = df.where(key.isNotNull()).select(
        key.alias("__k"), wcol.alias("__w")
    )
    # per-row cell: computed with the ROW index column (not a literal),
    # so one explode covers all d rows in a single expression
    cells = keyed.select(
        F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("__r"),
        "__k",
        "__w",
    ).select(
        "__r",
        F.pmod(F.xxhash64(F.col("__k"), F.col("__r")), F.lit(w)).alias("__c"),
        "__w",
    )
    agg = (
        cells.groupBy("__r", "__c")
        .agg(F.sum("__w").alias("__n"))
        .collect()
    )
    rows = [[0] * w for _ in range(d)]
    for r in agg:
        rows[r["__r"]][r["__c"]] = r["__n"]
    n_total = keyed.agg(F.sum("__w")).collect()[0][0] or 0
    return CMSketch(
        w=w, d=d, rows=tuple(tuple(x) for x in rows), n_total=int(n_total)
    )


def cms_build_for(
    df: DataFrame,
    key: Column | str,
    *,
    epsilon: float = 0.001,
    delta: float = 0.01,
    weight: Column | None = None,
) -> CMSketch:
    w, d = cms_params(epsilon, delta)
    return cms_build(df, key, w=w, d=d, weight=weight)


def cms_merge(a: CMSketch, b: CMSketch) -> CMSketch:
    """Cellwise add — estimates over the merge ≡ estimates over the
    concatenated input (both one-sided bounds carry, with N = Na+Nb)."""
    if (a.w, a.d) != (b.w, b.d):
        raise ValueError(
            f"cannot merge CMS with different (w, d): "
            f"({a.w},{a.d}) vs ({b.w},{b.d})"
        )
    return CMSketch(
        w=a.w,
        d=a.d,
        rows=tuple(
            tuple(x + y for x, y in zip(ra, rb))
            for ra, rb in zip(a.rows, b.rows)
        ),
        n_total=a.n_total + b.n_total,
    )


def cms_estimate(sk: CMSketch, key: Column | str) -> Column:
    """Pure-expression frequency estimate: min over the d row lookups.
    NULL keys estimate NULL. Composable inside HOF lambdas (the
    ``rare_gram_frac`` path scores a whole gram array map-side)."""
    key = F.col(key) if isinstance(key, str) else key
    # one memoized single-py4j-call literal per row (operators/bloom.py
    # int64_array_literal — the bloom_ref_dedup lesson: F.lit(list) costs
    # one driver round trip per ELEMENT per composition, and evaluates as
    # a per-row CreateArray instead of a folded Literal)
    from nexus_event_stream_spark.operators.bloom import int64_array_literal

    ests = [
        F.element_at(
            int64_array_literal(tuple(sk.rows[r])),
            (_cell(key, r, sk.w) + 1).cast("int"),
        )
        for r in range(sk.d)
    ]
    return F.least(*ests) if sk.d > 1 else ests[0]


def rare_gram_frac(
    docs: DataFrame,
    sk: CMSketch,
    *,
    n: int = 3,
    min_count: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Append ``n_grams`` / ``rare_grams`` / ``rare_gram_frac``: the
    fraction of the document's word n-grams whose corpus frequency
    estimate is below ``min_count``. One-sided by CMS construction:
    est ≥ true, so est < min_count ⇒ true < min_count — a gram called
    rare IS rare; some truly-rare grams are missed at the ε·N rate
    (documented, conservative direction for rarity-weighted sampling).
    Zero shuffle, zero Python, zero explode (plan-pinned)."""
    from nexus_event_stream_spark.functions.text import (
        ngrams_from_tokens,
        tokens,
    )

    text = F.col(text_col)
    out = docs.withColumn("__toks", tokens(text))
    out = out.withColumn(
        "__grams", ngrams_from_tokens(F.col("__toks"), n)
    )
    rare = F.size(
        F.filter(
            F.col("__grams"),
            lambda g: cms_estimate(sk, g) < F.lit(min_count),
        )
    ).cast("bigint")
    total = F.size(F.col("__grams")).cast("bigint")
    return (
        out.withColumns(
            {
                "n_grams": total,
                "rare_grams": rare,
                "rare_gram_frac": rare.cast("double")
                / F.greatest(total, F.lit(1)),
            }
        )
        .drop("__toks", "__grams")
    )
