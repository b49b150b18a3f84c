"""Mergeable KMV (k-minimum-values) sketches + sketch set algebra.

The training-pipeline question this answers: *"how much does source A
overlap source B?"* — across sources, crawl snapshots, or a corpus vs an
eval benchmark — WITHOUT a corpus-scale join. Each side is folded once
into a k-value sketch (k·8 bytes, corpus-size independent); union /
intersection / Jaccard estimates then run on the sketches alone
(Beyer et al., "On Synopses for Distinct-Value Estimation Under Multiset
Operations", SIGMOD 2007 — public literature).

Why KMV and not HLL: Spark's ``approx_count_distinct`` (HLL++) answers
single-set cardinality but its binary sketch is engine-internal — it
cannot estimate *intersections* and is not portable across systems. The
KMV sketch is just "the k smallest distinct uniform hashes": trivially
portable, value-inspectable, and CLOSED under union (the union sketch is
recoverable exactly from the operand sketches — pinned by test, no
tolerance needed).

Scale shape: building a sketch is one ``distinct`` (map-side partial
dedupe bounds shuffle bytes by distinct hashes, not rows) + a
``TakeOrderedAndProject`` (per-task k-row heap → driver merge of
tasks·k). Everything after that is driver math on ≤k integers.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Hash domain [0, 2^61): pmod(xxhash64, M) stays uniform, non-negative,
#: and comfortably inside int64 for plan-side arithmetic.
KMV_M = 1 << 61

DEFAULT_K = 256


@dataclass(frozen=True)
class KMVSketch:
    """k smallest distinct hashes of a set, sorted ascending.

    ``len(hashes) < k`` means the underlying set was exhausted — the
    sketch is then the exact hashed set and estimates are exact counts.
    """

    k: int
    hashes: tuple[int, ...]

    @property
    def exact(self) -> bool:
        return len(self.hashes) < self.k

    def to_dict(self) -> dict:
        """JSON-ready form — persist next to a snapshot manifest so later
        runs can estimate overlap against it without the original data."""
        return {"kind": "kmv", "m": KMV_M, "k": self.k, "hashes": list(self.hashes)}

    @classmethod
    def from_dict(cls, d: dict) -> "KMVSketch":
        if d.get("kind") != "kmv":
            raise ValueError(f"not a KMV sketch payload: {d.get('kind')!r}")
        if d.get("m") != KMV_M:
            # a sketch hashed into a different domain is not comparable —
            # refusing beats silently estimating garbage
            raise ValueError(f"hash domain mismatch: {d.get('m')} != {KMV_M}")
        hashes = tuple(d["hashes"])
        if list(hashes) != sorted(set(hashes)):
            raise ValueError("corrupt sketch: hashes must be sorted distinct")
        return cls(int(d["k"]), hashes)


def _hv(col: Column | str) -> Column:
    """Uniform hash in [0, M) — NULL-gated: ``xxhash64(NULL)`` returns the
    SEED (42), not NULL, so hashing before filtering would smuggle every
    NULL in as one phantom distinct value."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isNotNull(), F.pmod(F.xxhash64(c), F.lit(KMV_M)))


def kmv_sketch(df: DataFrame, col: Column | str, k: int = DEFAULT_K) -> KMVSketch:
    """One distributed pass → the k smallest distinct hashes of ``col``.

    NULLs are excluded (a NULL is "no value", matching COUNT(DISTINCT)).
    """
    rows = (
        df.select(_hv(col).alias("__hv"))
        .where(F.col("__hv").isNotNull())
        .distinct()
        .orderBy("__hv")
        .limit(k)
        .collect()
    )
    return KMVSketch(k, tuple(r["__hv"] for r in rows))


def kmv_sketches_by(
    df: DataFrame, group_col: str, col: Column | str, k: int = DEFAULT_K
) -> dict[str, KMVSketch]:
    """Per-group sketches in ONE job: distinct (group, hash) → rank
    window (WindowGroupLimit pre-drops rows past k map-side) → collect
    groups·k rows. Driver state is groups·k hashes — the sketch scale.
    """
    from pyspark.sql import Window

    ranked = (
        df.select(F.col(group_col).alias("__g"), _hv(col).alias("__hv"))
        .where(F.col("__hv").isNotNull())
        .distinct()
        .withColumn(
            "__rk",
            F.row_number().over(Window.partitionBy("__g").orderBy("__hv")),
        )
        .where(F.col("__rk") <= k)
    )
    out: dict[str, list[int]] = {}
    for r in ranked.orderBy("__g", "__hv").collect():
        out.setdefault(r["__g"], []).append(r["__hv"])
    return {g: KMVSketch(k, tuple(hs)) for g, hs in out.items()}


def kmv_estimate(s: KMVSketch) -> float:
    """Distinct-count estimate: exact below k, else (k−1)·M / h_(k)."""
    if s.exact:
        return float(len(s.hashes))
    return (s.k - 1) * KMV_M / s.hashes[-1]


def kmv_merge(a: KMVSketch, b: KMVSketch) -> KMVSketch:
    """The union's sketch, recovered EXACTLY from the operand sketches.

    Every one of the k smallest hashes of A ∪ B is necessarily among the
    k smallest of A or the k smallest of B (it beats ≥ k values on its
    own side), so "k smallest of the combined sketches" IS the union's
    sketch — no information loss, no tolerance. Result k = min(a.k, b.k).
    """
    k = min(a.k, b.k)
    merged = sorted(set(a.hashes) | set(b.hashes))[:k]
    return KMVSketch(k, tuple(merged))


def kmv_jaccard(a: KMVSketch, b: KMVSketch) -> float:
    """Jaccard |A∩B| / |A∪B| estimated on the union sketch's members."""
    u = kmv_merge(a, b)
    if not u.hashes:
        return 0.0
    both = set(a.hashes) & set(b.hashes)
    return sum(1 for h in u.hashes if h in both) / len(u.hashes)


def kmv_intersection(a: KMVSketch, b: KMVSketch) -> float:
    """|A ∩ B| estimate = Jaccard · |A ∪ B| (both from the sketches)."""
    return kmv_jaccard(a, b) * kmv_estimate(kmv_merge(a, b))


def shingle_rows(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 5,
    carry: Sequence[str] = (),
) -> DataFrame:
    """One row per distinct word-n-gram per document — the input grain
    for CONTENT overlap sketches (doc-hash sketches only see exact dups).
    ``carry`` columns (e.g. the source) ride along with each shingle; the
    single shingling definition here keeps ad-hoc `kmv_sketch` calls and
    `source_overlap` comparable.
    """
    from nexus_event_stream_spark.functions.text import ngrams_from_tokens

    keep = [F.col(c) for c in carry]
    return (
        docs.select(*keep, F.split(F.col(text_col), " ").alias("__toks"))
        .select(
            *keep,
            F.explode(
                F.array_distinct(ngrams_from_tokens(F.col("__toks"), n))
            ).alias("shingle"),
        )
    )


def source_overlap(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    n: int = 5,
    k: int = DEFAULT_K,
) -> list[dict]:
    """Pairwise content-overlap estimates between corpus sources.

    One distributed job builds every source's shingle sketch; the
    pairwise Jaccard/intersection matrix is then pure driver math on
    sources²·k integers. Rows: {a, b, jaccard, intersection, union}.
    """
    grams = shingle_rows(docs, text_col, n, carry=[source_col])
    sketches = kmv_sketches_by(grams, source_col, "shingle", k)
    names = sorted(sketches)
    out = []
    for i, sa in enumerate(names):
        for sb in names[i + 1 :]:
            a, b = sketches[sa], sketches[sb]
            out.append(
                {
                    "a": sa,
                    "b": sb,
                    "jaccard": kmv_jaccard(a, b),
                    "intersection": kmv_intersection(a, b),
                    "union": kmv_estimate(kmv_merge(a, b)),
                }
            )
    return out
