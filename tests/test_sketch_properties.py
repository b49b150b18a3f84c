"""Property-based tests (hypothesis) for the sketch family's invariants,
checked over generated inputs — pure driver-side (no Spark), so the
search space is cheap to explore:

- Misra-Gries: S(x) ≤ true(x) ≤ S(x)+D for EVERY item (present or not),
  D ≤ N/(c+1), exactness when capacity suffices, merge closure.
- Quantile compactor: total weight is conserved exactly through any
  compaction cascade; quantiles are monotone in q; merge conserves n.
- Blocked bloom: membership never false-negative for any insert set.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from nexus_event_stream_spark.operators.heavy_hitters import (
    MGSummary,
    _MGState,
    mg_merge,
)
from nexus_event_stream_spark.operators.quantiles import _Compactor

items = st.lists(
    st.tuples(st.integers(0, 30), st.integers(1, 5)), min_size=0, max_size=400
)


def _fold(pairs, capacity):
    st_ = _MGState(capacity)
    truth: dict[str, int] = {}
    for i, w in pairs:
        key = f"t{i}"
        st_.add(key, w)
        truth[key] = truth.get(key, 0) + w
    return st_, truth


@given(items, st.integers(2, 16))
@settings(max_examples=200, deadline=None)
def test_mg_invariant_holds_for_all_items(pairs, capacity):
    st_, truth = _fold(pairs, capacity)
    s = st_.summary()
    n = sum(truth.values())
    # tight bound: every decrement unit destroys (c+1) units of mass
    assert st_.dec <= n // (capacity + 1)
    for key, t in truth.items():
        sx = s.get(key, 0)
        assert sx <= t <= sx + st_.dec
    # absent keys' bound: true(x)=0 ≤ D trivially; summary keys all exist
    assert set(s) <= set(truth)
    assert all(v >= 1 for v in s.values())


@given(items, st.integers(50, 200))
@settings(max_examples=100, deadline=None)
def test_mg_exact_when_capacity_suffices(pairs, capacity):
    st_, truth = _fold(pairs, capacity)  # ≤31 distinct keys < 50 capacity
    assert st_.dec == 0 and st_.summary() == truth


@given(items, items, st.integers(2, 12))
@settings(max_examples=100, deadline=None)
def test_mg_merge_closure(pa, pb, capacity):
    sa, ta = _fold(pa, capacity)
    sb, tb = _fold(pb, capacity)
    a = MGSummary(capacity, sa.summary(), sa.dec)
    b = MGSummary(capacity, sb.summary(), sb.dec)
    m = mg_merge(a, b)
    truth = dict(ta)
    for k, v in tb.items():
        truth[k] = truth.get(k, 0) + v
    assert len(m.counts) <= capacity
    for k, t in truth.items():
        lo, hi = m.bounds(k)
        assert lo <= t <= hi


values = st.lists(
    st.floats(
        min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
    ),
    min_size=0,
    max_size=2000,
)


@given(values, st.integers(4, 64))
@settings(max_examples=150, deadline=None)
def test_compactor_conserves_weight(vals, k):
    c = _Compactor(k)
    c.extend(np.asarray(vals, dtype=np.float64))
    total = sum(len(lvl) << h for h, lvl in enumerate(c.levels))
    assert total == len(vals)


@given(values, st.integers(8, 64))
@settings(max_examples=80, deadline=None)
def test_quantiles_monotone_in_q(vals, k):
    if not vals:
        return
    from nexus_event_stream_spark.operators.quantiles import QuantileSketch

    c = _Compactor(k)
    arr = np.asarray(vals, dtype=np.float64)
    c.extend(arr)
    sk = QuantileSketch(
        k, len(arr), float(arr.min()), float(arr.max()),
        tuple(tuple(l) for l in c.levels),
    )
    qs = [sk.quantile(q) for q in (0.0, 0.1, 0.3, 0.5, 0.7, 0.9, 1.0)]
    assert qs == sorted(qs)
    assert qs[0] == arr.min() and qs[-1] == arr.max()


@given(
    st.sets(st.integers(-(2**40), 2**40), min_size=0, max_size=300),
    st.integers(1, 10),
    st.integers(2, 64),
)
@settings(max_examples=60, deadline=None)
def test_bloom_mask_math_never_false_negative(keys, k, words):
    """Driver-side replica of the build/probe bit math (the Spark
    expressions mirror this exactly — pinned separately in test_bloom):
    inserting a key and probing it must always hit."""

    # what matters is build and probe using the SAME (idx, mask) function
    def word_index(key):
        return hash(("h1", key)) % words

    def word_mask(key):
        h2 = hash(("h2", key)) & ((1 << 64) - 1)
        m = 0
        for i in range(k):
            m |= 1 << ((h2 >> (6 * i)) & 63)
        return m

    arr = [0] * words
    for key in keys:
        arr[word_index(key)] |= word_mask(key)
    for key in keys:
        m = word_mask(key)
        assert arr[word_index(key)] & m == m
