"""Summarize a pytest --durations=0 log: per-file totals and the top
individual tests, to drive data-based ``slow`` marking (VERDICT r14 #6).

Usage: python tools/r15_test_durations.py /tmp/pytest_full_r15.log [top_n]
"""

from __future__ import annotations

import re
import sys
from collections import defaultdict


def main() -> int:
    path = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    # lines like: "12.34s call     tests/test_gif.py::test_name"
    pat = re.compile(
        r"^\s*(\d+\.\d+)s\s+(call|setup|teardown)\s+(tests/[\w./]+)::(\S+)"
    )
    per_file: dict[str, float] = defaultdict(float)
    per_test: dict[str, float] = defaultdict(float)
    for line in open(path):
        m = pat.match(line)
        if not m:
            continue
        sec, _phase, f, t = float(m.group(1)), m.group(2), m.group(3), m.group(4)
        per_file[f] += sec
        per_test[f"{f}::{t}"] += sec
    total = sum(per_file.values())
    print(f"TOTAL accounted: {total/60:.1f} min over {len(per_test)} tests")
    print("\n== per file ==")
    for f, s in sorted(per_file.items(), key=lambda kv: -kv[1]):
        print(f"{s:8.1f}s  {f}")
    print(f"\n== top {top_n} tests ==")
    for t, s in sorted(per_test.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"{s:8.1f}s  {t}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
