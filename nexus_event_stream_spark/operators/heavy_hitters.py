"""Mergeable Misra-Gries heavy hitters: frequent items without the shuffle.

The exact top-k token query (`q_token_topk`) shuffles one row per distinct
token — correct, but at 100 TB the distinct-token relation is itself huge
and the full groupBy pays for every rare hapax. A Misra-Gries summary of
capacity c answers "which items occur more than N/c times, and how often
(±D)" from per-partition state of c counters, with deterministic error
bounds instead of sampling noise:

- **per partition** (one ``mapInPandas`` pass): weighted MG over the batch's
  ``value_counts`` — increments are vectorized per batch, the Python loop
  touches only *unique* values per batch. When the counter table is full a
  new item burns decrement units δ = min(weight, smallest counter), tracked
  exactly. Classic invariant per partition: S_p(x) ≤ true_p(x) ≤
  S_p(x) + d_p, where d_p is the partition's decrement total.
- **merge** (one groupBy over ≤ partitions·(c+1) summary rows — KBs):
  counts add, decrements add, so the global invariant is
  ``S(x) ≤ true(x) ≤ S(x) + D`` with D = Σ d_p — the mergeable-summaries
  result (Agarwal et al., PODS'12).
- **driver**: the collected sketch is O(c) state with KMV-style algebra —
  ``mg_merge`` combines sketches from different sources/epochs without
  revisiting data, and JSON round-trips for cross-run persistence.

Completeness: any item with true(x) > D survives in at least one partition
summary, so it appears in the merged relation; the collected candidate set
is the top ``max_candidates`` by S, so it contains every x whose
``true(x) − D`` exceeds the smallest collected S. Choose c ≥ 1/ε for an
ε·N error target; D ≤ N/(c+1) always.

Reference parity: no analogue — the reference's Redis ZSets track *recency*
top-k, not frequency (data-plane/internal/projection/signal.go:70-81). This
extends the north-star corpus-profiling tier (operators/sketches.py).
"""

from __future__ import annotations

import heapq
import json
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass
class MGSummary:
    """A Misra-Gries sketch: item → S(x) lower-bound counts plus the total
    decrement mass D. For every item: S(x) ≤ true(x) ≤ S(x) + D, and
    items absent from ``counts`` have true(x) ≤ D."""

    capacity: int
    counts: dict[str, int] = field(default_factory=dict)
    decrements: int = 0

    def bounds(self, item: str) -> tuple[int, int]:
        s = self.counts.get(item, 0)
        return s, s + self.decrements

    def top(self, k: int) -> list[tuple[str, int, int]]:
        """Top-k candidates as (item, count_min, count_max), ordered by
        lower bound desc, item asc for determinism."""
        ranked = sorted(self.counts.items(), key=lambda kv: (-kv[1], kv[0]))
        return [(i, s, s + self.decrements) for i, s in ranked[:k]]

    def to_json(self) -> str:
        return json.dumps(
            {
                "capacity": self.capacity,
                "decrements": self.decrements,
                "counts": self.counts,
            },
            sort_keys=True,
        )

    @staticmethod
    def from_json(s: str) -> "MGSummary":
        d = json.loads(s)
        return MGSummary(
            capacity=int(d["capacity"]),
            counts={str(k): int(v) for k, v in d["counts"].items()},
            decrements=int(d["decrements"]),
        )


class _MGState:
    """Weighted MG with O(log c) amortized updates: absolute counters plus a
    rising ``base`` (decrementing all counters by δ = raising base by δ),
    lazy min-heap for eviction of counters that hit the base."""

    __slots__ = ("capacity", "base", "counts", "heap", "dec")

    def __init__(self, capacity: int):
        self.capacity = capacity
        self.base = 0
        self.counts: dict[str, int] = {}
        self.heap: list[tuple[int, str]] = []  # (absolute count at push, item)
        self.dec = 0

    def _evict_zeros(self) -> None:
        h, c = self.heap, self.counts
        while h and h[0][0] <= self.base:
            cnt, item = heapq.heappop(h)
            cur = c.get(item)
            if cur is None or cur != cnt:
                continue  # stale entry; a fresher one exists if item lives
            if cur <= self.base:
                del c[item]

    def _min_effective(self) -> int:
        h, c = self.heap, self.counts
        while h:
            cnt, item = h[0]
            cur = c.get(item)
            if cur is None or cur != cnt:
                heapq.heappop(h)
                continue
            return cnt - self.base
        return 0

    def add(self, item: str, w: int) -> None:
        c = self.counts
        if item in c:
            c[item] += w
            heapq.heappush(self.heap, (c[item], item))
            return
        if len(c) < self.capacity:
            c[item] = self.base + w
            heapq.heappush(self.heap, (c[item], item))
            return
        # full: burn decrement units against the smallest counter(s),
        # inserting the remainder of w (if any) once a slot frees up.
        while w > 0 and len(c) >= self.capacity:
            delta = min(w, self._min_effective())
            if delta <= 0:  # defensive; min_effective ≥ 1 when full
                delta = w
            self.base += delta
            self.dec += delta
            w -= delta
            self._evict_zeros()
        if w > 0:
            c[item] = self.base + w
            heapq.heappush(self.heap, (c[item], item))

    def summary(self) -> dict[str, int]:
        return {i: cnt - self.base for i, cnt in self.counts.items()}


_SUMMARY_SCHEMA = T.StructType(
    [
        T.StructField("item", T.StringType()),  # NULL marks the d_p row
        T.StructField("cnt", T.LongType()),
    ]
)


def mg_partition_summaries(
    df: DataFrame, col: str, capacity: int
) -> DataFrame:
    """One MG pass per partition. Output: ≤ capacity (item, S_p) rows per
    partition plus one NULL-item row carrying d_p. NULL input values are
    skipped (they are not an "item")."""
    if capacity <= 0:
        raise ValueError("capacity must be positive")

    def run(batches):
        state = _MGState(capacity)
        for pdf in batches:
            vc = pdf[col].dropna().value_counts()
            # heaviest first: bulk increments before any decrement pressure
            for item, w in vc.items():
                state.add(str(item), int(w))
        rows = [(i, s) for i, s in state.summary().items()]
        rows.append((None, state.dec))
        yield pd.DataFrame(rows, columns=["item", "cnt"])

    return df.select(F.col(col).cast("string").alias(col)).mapInPandas(
        run, schema=_SUMMARY_SCHEMA
    )


def mg_sketch(
    df: DataFrame,
    col: str,
    capacity: int = 256,
    max_candidates: int | None = None,
) -> MGSummary:
    """Build the merged sketch: per-partition MG → groupBy(item) sum →
    collect the D row and the top ``max_candidates``(+1) items in ONE
    TakeOrdered job (NULL row sorts first). Driver state O(capacity).

    The merged relation can hold up to partitions·capacity items; keeping
    only the top ``max_candidates`` is a re-cap, and a re-cap is only
    invariant-preserving if the cut count — the (max_candidates+1)-th
    largest, an upper bound on every dropped item's S — is subtracted
    from the keep set and added to the decrement mass (same rule as
    ``mg_merge``). Otherwise ``bounds()`` on a dropped item would claim
    true(x) ≤ D while its true count could be far larger."""
    max_candidates = max_candidates or capacity
    merged = (
        mg_partition_summaries(df, col, capacity)
        .groupBy("item")
        .agg(F.sum("cnt").alias("cnt"))
        .orderBy(F.col("item").isNull().desc(), F.col("cnt").desc(), "item")
        .limit(max_candidates + 2)  # D row + keep set + cut sentinel
        .collect()
    )
    counts: dict[str, int] = {}
    dec = 0
    items: list[tuple[str, int]] = []
    for r in merged:
        if r["item"] is None:
            dec = int(r["cnt"])
        elif r["cnt"] > 0:
            items.append((r["item"], int(r["cnt"])))
    cut = 0
    if len(items) > max_candidates:
        cut = items[max_candidates][1]  # ≥ every dropped item's count
        items = items[:max_candidates]
    counts = {i: s - cut for i, s in items if s > cut}
    return MGSummary(capacity=capacity, counts=counts, decrements=dec + cut)


def mg_merge(a: MGSummary, b: MGSummary) -> MGSummary:
    """Driver-side merge of two sketches (different sources, epochs,
    shards): counts add, decrement mass adds, then re-cap to the smaller
    capacity by subtracting the (c+1)-th count from the keep set — that
    subtraction is additional decrement mass, kept in the bound."""
    cap = min(a.capacity, b.capacity)
    combined: dict[str, int] = dict(a.counts)
    for i, s in b.counts.items():
        combined[i] = combined.get(i, 0) + s
    dec = a.decrements + b.decrements
    if len(combined) > cap:
        ranked = sorted(combined.items(), key=lambda kv: (-kv[1], kv[0]))
        cut = ranked[cap][1]  # (cap+1)-th largest
        combined = {i: s - cut for i, s in ranked[:cap] if s > cut}
        dec += cut
    return MGSummary(capacity=cap, counts=combined, decrements=dec)


def heavy_hitters(
    df: DataFrame, col: str, k: int = 20, capacity: int = 256
) -> DataFrame:
    """Top-k frequent items with deterministic bounds, as a DataFrame
    (item, count_min, count_max) — count_min ≤ true ≤ count_max always."""
    sk = mg_sketch(df, col, capacity=capacity)
    rows = sk.top(k)
    schema = "item string, count_min bigint, count_max bigint"
    return df.sparkSession.createDataFrame(rows or [], schema)
