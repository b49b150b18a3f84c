"""bench_compare: spread-aware regression judgment + the BENCH_DETAIL
sidecar adoption introduced when the stdout line went compact (r7)."""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "tools")

from bench_compare import compare, load  # noqa: E402


def _write(path, obj):
    path.write_text(json.dumps(obj))
    return str(path)


def test_sidecar_adopted_only_when_medians_match(tmp_path):
    queries = {"q_a": 1.0, "q_b": 2.0}
    spread = {"q_a": {"min": 0.9, "max": 1.1, "runs": [1.0]}}
    _write(tmp_path / "BENCH_DETAIL.json",
           {"queries": queries, "spread": spread})

    # driver wrapper shape, spread-free, same medians → sidecar adopted
    d = load(_write(tmp_path / "BENCH_r07.json",
                    {"parsed": {"queries": queries, "value": 3.0}}))
    assert d["spread"] == spread

    # different medians (sidecar belongs to another run) → NOT adopted
    d2 = load(_write(tmp_path / "BENCH_r06.json",
                     {"parsed": {"queries": {"q_a": 5.0}, "value": 5.0}}))
    assert "spread" not in d2

    # file that carries its own spread keeps it
    own = {"queries": queries, "spread": {"q_b": {"min": 2, "max": 2}}}
    assert load(_write(tmp_path / "own.json", own))["spread"] == own["spread"]


def test_compare_ranges_separate_regression_from_noise():
    old = {
        "queries": {"q_hard": 1.0, "q_noisy": 1.0, "q_fine": 1.0},
        "spread": {
            "q_hard": {"min": 0.9, "max": 1.1},
            "q_noisy": {"min": 0.5, "max": 2.5},
        },
    }
    new = {
        "queries": {"q_hard": 2.0, "q_noisy": 2.0, "q_fine": 1.1},
        "spread": {
            "q_hard": {"min": 1.9, "max": 2.1},  # disjoint from [0.9, 1.1]
            "q_noisy": {"min": 1.8, "max": 2.2},  # overlaps [0.5, 2.5]
        },
    }
    regressions, suspects = compare(old, new, ratio=1.5)
    assert [r[0] for r in regressions] == ["q_hard"]
    assert [s[0] for s in suspects] == ["q_noisy"]  # within spread → rerun
