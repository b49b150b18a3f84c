"""Mergeable quantile sketch (KLL/MRL-style compactors).

Completes the corpus-profiling sketch family: cardinality has KMV
(operators/sketches.py) and exact bitmaps (operators/bitmaps.py),
frequency has Misra-Gries (operators/heavy_hitters.py) — this tier gives
*quantiles*: "what is the p99 document length, across this epoch ∪ last
month's snapshot" from per-shard state of O(k·log(n/k)) values, merged
without revisiting data.

Why not ``approx_percentile``: Spark's built-in answers one query over one
scan; its sketch is engine-internal — it cannot be persisted next to a
snapshot manifest, merged across runs, or inspected. This sketch is plain
(level, value) pairs: portable, JSON-serializable, and closed under merge.

Design — the compactor scheme of Manku-Rajagopalan-Lindsay (SIGMOD'98) as
modernized by KLL (Karnin-Lang-Liberty, FOCS'16), with the DETERMINISTIC
alternating-offset rule instead of coin flips (the original MRL choice):
level h holds items of weight 2^h; when a level overflows its capacity k
it is sorted and every other item (alternating start offset between
compactions) is promoted to level h+1. Each compaction perturbs any rank
by at most its level weight; alternating offsets cancel consecutive
errors, and reproducibility means a re-run of the same pipeline produces
the SAME sketch — a property worth more than KLL's tighter constants in a
replayed-epoch world (same reasoning as the deterministic samplers in
operators/sampling.py).

Scale shape: one ``mapInPandas`` pass per partition (the Python loop runs
once per COMPACTION, not per row — rows move through numpy), summaries of
O(k log(n/k)) rows per partition, merged on the driver. Error is additive
under merge: rank error ≤ ε·n with ε ≈ 1.5·log₂(n/k)/k for the
deterministic rule — k=256 gives well under 1 % at a billion rows.

Reference parity: no analogue — the reference has no percentile surface
at all. North-star corpus-profiling tier.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_K = 256


class _Compactor:
    """Mutable compactor stack. ``levels[h]`` holds floats of weight 2^h,
    capacity k each; overflow sorts and promotes alternating items."""

    __slots__ = ("k", "levels", "flip")

    def __init__(self, k: int, levels: list[list[float]] | None = None):
        self.k = k
        self.levels: list[list[float]] = levels if levels is not None else [[]]
        self.flip = 0

    def _compact(self, h: int) -> None:
        lvl = sorted(self.levels[h])
        off = self.flip & 1
        self.flip += 1
        withheld: list[float] = []
        if len(lvl) % 2:
            # only an EVEN count compacts weight-exactly: withhold one end
            # (alternating) at this level so total weight is preserved
            withheld = [lvl.pop()] if off else [lvl.pop(0)]
        promoted = lvl[off::2]
        # the un-promoted half is discarded; its mass is represented by the
        # doubled weight of the promoted half
        self.levels[h] = withheld
        if h + 1 == len(self.levels):
            self.levels.append([])
        self.levels[h + 1].extend(promoted)
        if len(self.levels[h + 1]) > self.k:
            self._compact(h + 1)

    def extend(self, values: np.ndarray) -> None:
        """Bulk-add weight-1 values: numpy slices fill level 0 in chunks;
        Python-level work happens once per compaction."""
        vals = np.asarray(values, dtype=np.float64)
        vals = vals[~np.isnan(vals)]
        i, n = 0, len(vals)
        while i < n:
            room = self.k + 1 - len(self.levels[0])
            take = min(room, n - i)
            self.levels[0].extend(vals[i : i + take].tolist())
            i += take
            if len(self.levels[0]) > self.k:
                self._compact(0)

    def merge_level(self, h: int, items: list[float]) -> None:
        while h >= len(self.levels):
            self.levels.append([])
        self.levels[h].extend(items)
        if len(self.levels[h]) > self.k:
            self._compact(h)


@dataclass(frozen=True)
class QuantileSketch:
    """Immutable sketch: levels[h] sorted or not, weight 2^h each; n is
    EXACT (compaction preserves total weight), min/max are exact."""

    k: int
    n: int
    lo: float
    hi: float
    levels: tuple[tuple[float, ...], ...]

    def _weighted(self) -> tuple[np.ndarray, np.ndarray]:
        vals, wts = [], []
        for h, lvl in enumerate(self.levels):
            if lvl:
                vals.append(np.asarray(lvl, dtype=np.float64))
                wts.append(np.full(len(lvl), 1 << h, dtype=np.int64))
        if not vals:
            return np.array([]), np.array([])
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantile(self, q: float) -> float:
        """Smallest sketched value whose cumulative weight reaches q·n;
        q=0 / q=1 return the EXACT min/max."""
        if not (0.0 <= q <= 1.0):
            raise ValueError("q must be in [0, 1]")
        if self.n == 0:
            raise ValueError("empty sketch has no quantiles")
        if q == 0.0:
            return self.lo
        if q == 1.0:
            return self.hi
        v, w = self._weighted()
        target = q * self.n
        idx = int(np.searchsorted(np.cumsum(w), target))
        idx = min(idx, len(v) - 1)
        return float(v[idx])

    def quantiles(self, qs: list[float]) -> list[float]:
        return [self.quantile(q) for q in qs]

    def rank(self, x: float) -> float:
        """Approximate count of values ≤ x."""
        v, w = self._weighted()
        if len(v) == 0:
            return 0.0
        return float(np.sum(w[: int(np.searchsorted(v, x, side="right"))]))

    def to_json(self) -> str:
        return json.dumps(
            {
                "kind": "kll",
                "k": self.k,
                "n": self.n,
                "lo": self.lo,
                "hi": self.hi,
                "levels": [list(lvl) for lvl in self.levels],
            }
        )

    @staticmethod
    def from_json(s: str) -> "QuantileSketch":
        d = json.loads(s)
        if d.get("kind") != "kll":
            raise ValueError(f"not a quantile sketch payload: {d.get('kind')!r}")
        return QuantileSketch(
            k=int(d["k"]),
            n=int(d["n"]),
            lo=float(d["lo"]),
            hi=float(d["hi"]),
            levels=tuple(tuple(lvl) for lvl in d["levels"]),
        )


def _freeze(c: _Compactor, n: int, lo: float, hi: float) -> QuantileSketch:
    return QuantileSketch(
        k=c.k, n=n, lo=lo, hi=hi, levels=tuple(tuple(l) for l in c.levels)
    )


_SUMMARY_SCHEMA = T.StructType(
    [
        T.StructField("level", T.IntegerType()),  # -1 = (n, lo, hi) stats row
        T.StructField("value", T.DoubleType()),
        T.StructField("n", T.LongType()),
        T.StructField("lo", T.DoubleType()),
        T.StructField("hi", T.DoubleType()),
    ]
)


def quantile_sketch(
    df: DataFrame, col: Column | str, k: int = DEFAULT_K
) -> QuantileSketch:
    """Distributed build: one mapInPandas pass emits each partition's
    compactor state (O(k·log(n_p/k)) rows) plus an exact stats row; the
    driver merges the partition sketches. NULL/NaN values are skipped."""
    name = col if isinstance(col, str) else "__q"
    src = df.select(
        (F.col(name) if isinstance(col, str) else col.alias(name)).cast(
            "double"
        ).alias(name)
    )

    def run(batches):
        c = _Compactor(k)
        n = 0
        lo, hi = np.inf, -np.inf
        for pdf in batches:
            vals = pdf[name].to_numpy(dtype=np.float64, na_value=np.nan)
            vals = vals[~np.isnan(vals)]
            if len(vals):
                n += len(vals)
                lo = min(lo, float(vals.min()))
                hi = max(hi, float(vals.max()))
                c.extend(vals)
        rows = [
            (h, v, 0, 0.0, 0.0)
            for h, lvl in enumerate(c.levels)
            for v in lvl
        ]
        rows.append((-1, 0.0, n, lo if n else 0.0, hi if n else 0.0))
        yield pd.DataFrame(rows, columns=["level", "value", "n", "lo", "hi"])

    out = _Compactor(k)
    n_total, lo_t, hi_t = 0, np.inf, -np.inf
    by_level: dict[int, list[float]] = {}
    for r in src.mapInPandas(run, schema=_SUMMARY_SCHEMA).collect():
        if r["level"] < 0:
            if r["n"]:
                n_total += r["n"]
                lo_t = min(lo_t, r["lo"])
                hi_t = max(hi_t, r["hi"])
        else:
            by_level.setdefault(r["level"], []).append(r["value"])
    # merge highest level first so cascades see all mass below them
    for h in sorted(by_level, reverse=True):
        out.merge_level(h, by_level[h])
    if n_total == 0:
        return QuantileSketch(k=k, n=0, lo=0.0, hi=0.0, levels=((),))
    return _freeze(out, n_total, float(lo_t), float(hi_t))


def sketch_values(values: np.ndarray, k: int = DEFAULT_K) -> QuantileSketch:
    """Build a sketch from an in-memory array (NaNs skipped) — the
    executor-local builder the streaming rollup's per-batch partials use;
    semantics identical to ``quantile_sketch`` on the same values."""
    vals = np.asarray(values, dtype=np.float64)
    vals = vals[~np.isnan(vals)]
    if not len(vals):
        return QuantileSketch(k=k, n=0, lo=0.0, hi=0.0, levels=((),))
    c = _Compactor(k)
    c.extend(vals)
    return _freeze(c, len(vals), float(vals.min()), float(vals.max()))


def quantile_merge(a: QuantileSketch, b: QuantileSketch) -> QuantileSketch:
    """Merge two sketches (different shards/epochs) driver-side; error is
    additive, total weight stays exact."""
    k = min(a.k, b.k)
    c = _Compactor(k)
    levels = max(len(a.levels), len(b.levels))
    for h in reversed(range(levels)):
        items: list[float] = []
        if h < len(a.levels):
            items.extend(a.levels[h])
        if h < len(b.levels):
            items.extend(b.levels[h])
        if items:
            c.merge_level(h, items)
    n = a.n + b.n
    if n == 0:
        return QuantileSketch(k=k, n=0, lo=0.0, hi=0.0, levels=((),))
    lo = min(x.lo for x in (a, b) if x.n) if (a.n and b.n) else (a.lo if a.n else b.lo)
    hi = max(x.hi for x in (a, b) if x.n) if (a.n and b.n) else (a.hi if a.n else b.hi)
    return _freeze(c, n, lo, hi)
