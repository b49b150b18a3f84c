"""Single-pass data-quality expectations — the publish gate for corpora.

Before a snapshot is promoted (`sources/shards.py` publish, a serving
layout rewrite, a training run), a 100 TB pipeline needs "is this data
shaped like I think it is?" answered WITHOUT one job per check. Every
expectation here compiles to an aggregate expression; the whole suite
folds into ONE map-side-combined aggregation pass (zero extra scans,
one tiny shuffle of partial aggregates — the Deequ architecture, built
on plain DataFrame aggregates).

Checks return a report row per expectation: name, metric value, bound,
pass/fail. `check(df, suite)` never throws on data — failing data is a
REPORT; `enforce(df, suite)` raises for pipelines that want a hard gate.

Uniqueness is the one metric that cannot ride the fixed-size pass:
exact `count_distinct` (the default) makes Catalyst plan a second,
distinct-value-sized aggregation exchange. Pass ``approx=True`` to
trade it for HLL++ partials (fixed size, ±~2 %) and restore the
single-fixed-pass shape.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    """One named metric + inclusive bounds it must fall inside."""

    name: str
    metric: Column
    lo: float | None = None
    hi: float | None = None
    meta: dict = field(default_factory=dict)


class ExpectationError(AssertionError):
    """Raised by `enforce` when any expectation fails."""

    def __init__(self, failures: list[dict]):
        self.failures = failures
        lines = ", ".join(
            f"{f['name']}={f['value']!r} outside [{f['lo']}, {f['hi']}]"
            for f in failures
        )
        super().__init__(f"{len(failures)} expectation(s) failed: {lines}")


def _frac(cond: Column) -> Column:
    """Fraction of rows where cond holds (NULL cond counts as False)."""
    n = F.count(F.lit(1))
    return (
        F.sum(F.when(cond, 1).otherwise(0)) / F.greatest(n, F.lit(1))
    ).cast("double")


# ------------------------------------------------------------ constructors


def expect_row_count(lo: int | None = None, hi: int | None = None) -> Expectation:
    return Expectation("row_count", F.count(F.lit(1)).cast("double"), lo, hi)


def expect_complete(col: str, min_fraction: float = 1.0) -> Expectation:
    """≥ min_fraction of rows have a non-null value."""
    return Expectation(
        f"complete({col})", _frac(F.col(col).isNotNull()), min_fraction, None
    )


def expect_unique(col: str, min_ratio: float = 1.0, approx: bool = False) -> Expectation:
    """distinct / TOTAL rows ≥ min_ratio (1.0 = a key: every row has a
    distinct non-null value — NULL-keyed rows lower the ratio, they don't
    hide behind a non-null denominator). ``approx`` swaps exact
    count_distinct partials for HLL++ (±~2 %) — lower the bound
    accordingly. Note the exact form plans a second, distinct-sized
    aggregation exchange; every other expectation shares one fixed-size
    pass."""
    d = (
        F.approx_count_distinct(col, 0.02)
        if approx
        else F.count_distinct(F.col(col))
    )
    ratio = (d / F.greatest(F.count(F.lit(1)), F.lit(1))).cast("double")
    return Expectation(f"unique({col})", ratio, min_ratio, None)


def expect_between(
    col: str, lo: float | None = None, hi: float | None = None,
    min_fraction: float = 1.0,
) -> Expectation:
    """≥ min_fraction of NON-NULL values fall inside [lo, hi]."""
    c = F.col(col)
    cond = F.lit(True)
    if lo is not None:
        cond = cond & (c >= F.lit(lo))
    if hi is not None:
        cond = cond & (c <= F.lit(hi))
    nn = F.sum(F.when(c.isNotNull(), 1).otherwise(0))
    ok = F.sum(F.when(c.isNotNull() & cond, 1).otherwise(0))
    return Expectation(
        f"between({col})",
        (ok / F.greatest(nn, F.lit(1))).cast("double"),
        min_fraction,
        None,
    )


def expect_matches(col: str, pattern: str, min_fraction: float = 1.0) -> Expectation:
    """≥ min_fraction of non-null values FULLY match the regex — the
    pattern is anchored here because ``rlike`` is substring-find, and a
    contains-style gate ("123en456" passing a language-code check) is
    never what a data contract means."""
    c = F.col(col)
    nn = F.sum(F.when(c.isNotNull(), 1).otherwise(0))
    ok = F.sum(F.when(c.rlike(f"^(?:{pattern})$"), 1).otherwise(0))
    return Expectation(
        f"matches({col})",
        (ok / F.greatest(nn, F.lit(1))).cast("double"),
        min_fraction,
        None,
    )


def expect_in(col: str, allowed: list[Any], min_fraction: float = 1.0) -> Expectation:
    """≥ min_fraction of non-null values are in the allowed set (set is
    recipe-sized — it becomes a literal IN list, never a join)."""
    c = F.col(col)
    nn = F.sum(F.when(c.isNotNull(), 1).otherwise(0))
    ok = F.sum(F.when(c.isin(allowed), 1).otherwise(0))
    return Expectation(
        f"in({col})",
        (ok / F.greatest(nn, F.lit(1))).cast("double"),
        min_fraction,
        None,
    )


def expect_mean_between(col: str, lo: float, hi: float) -> Expectation:
    return Expectation(f"mean({col})", F.avg(F.col(col)).cast("double"), lo, hi)


def expect_agg(name: str, metric: Column, lo: float | None, hi: float | None) -> Expectation:
    """Escape hatch: any aggregate expression as an expectation."""
    return Expectation(name, metric, lo, hi)


# ------------------------------------------------------------------ runners


def check(df: DataFrame, suite: list[Expectation]) -> list[dict]:
    """Evaluate the whole suite in ONE aggregation pass; report rows
    {name, value, lo, hi, passed}. Empty input: fractions evaluate over
    0 rows as 0/1 = 0.0 (guarded denominators), so completeness-style
    checks FAIL on an empty frame unless their bound is 0 — an empty
    corpus silently passing its gate is the worst failure mode.
    """
    if not suite:
        return []
    _validate_names(suite)
    row = df.agg(
        *[e.metric.alias(f"__m{i}") for i, e in enumerate(suite)]
    ).first()
    return evaluate_values({f"__m{i}": row[f"__m{i}"] for i in range(len(suite))}, suite)


def _validate_names(suite: list[Expectation]) -> None:
    names = [e.name for e in suite]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate expectation names: {names}")


def evaluate_values(values: dict, suite: list[Expectation]) -> list[dict]:
    """Judge already-computed metric values (keyed ``__m{i}`` in suite
    order) against the suite's bounds — shared by `check` and the
    streaming `observe` path (streaming/metrics.py), so batch gates and
    per-epoch monitors apply identical semantics."""
    out = []
    for i, e in enumerate(suite):
        v = values.get(f"__m{i}")
        passed = v is not None
        if passed and e.lo is not None:
            passed = v >= e.lo
        if passed and e.hi is not None:
            passed = v <= e.hi
        out.append(
            {
                "name": e.name,
                "value": v,
                "lo": e.lo,
                "hi": e.hi,
                "passed": bool(passed),
            }
        )
    return out


def enforce(df: DataFrame, suite: list[Expectation]) -> list[dict]:
    """`check`, but raise ExpectationError if anything failed — the hard
    publish gate. Returns the full report when everything passes."""
    report = check(df, suite)
    failures = [r for r in report if not r["passed"]]
    if failures:
        raise ExpectationError(failures)
    return report
