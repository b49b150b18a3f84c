"""Compare two bench JSON files, separating real regressions from noise.

Usage: python tools/bench_compare.py BENCH_r05.json BENCH_r06.json [ratio]

The de-noised bench (bench.py) records per-query median + min/max/runs.
A regression only counts when the evidence survives the recorded spread:

- **regression**: new median ≥ ratio × old median (default 1.5) AND the
  two runs' observed ranges don't overlap (new min > old max) — the gap
  cannot be explained by either session's own jitter.
- **suspect**: median ratio exceeded but the ranges overlap — rerun
  before believing it.
- entries without spread (older BENCH files) fall back to the plain
  median ratio and are marked accordingly.

Exit code 1 if any hard regression is found (CI-able).
"""

from __future__ import annotations

import json
import os
import sys


def load(path: str) -> dict:
    with open(path) as fh:
        d = json.load(fh)
    # the driver's BENCH_r{N}.json wraps bench.py's JSON line in "parsed"
    d = d.get("parsed", d) if isinstance(d.get("parsed"), dict) else d
    # Since r7 the stdout line is spread-free (driver tail-capture limit);
    # the spread lives in the committed BENCH_DETAIL.json sidecar. Adopt it
    # only when its medians are identical to this file's — the sidecar is
    # overwritten every run, so it belongs to exactly one BENCH file.
    if "spread" not in d:
        detail = os.path.join(os.path.dirname(os.path.abspath(path)),
                              "BENCH_DETAIL.json")
        try:
            with open(detail) as fh:
                dd = json.load(fh)
            if dd.get("queries") == d.get("queries"):
                d["spread"] = dd.get("spread", {})
        except (OSError, json.JSONDecodeError):
            pass
    return d


def compare(old: dict, new: dict, ratio: float) -> tuple[list, list]:
    regressions, suspects = [], []
    o_q, n_q = old.get("queries", {}), new.get("queries", {})
    o_s, n_s = old.get("spread", {}), new.get("spread", {})
    for name in sorted(set(o_q) & set(n_q)):
        ov, nv = o_q[name], n_q[name]
        if ov <= 0 or nv < ratio * ov or nv - ov < 0.05:
            continue
        os_, ns_ = o_s.get(name), n_s.get(name)
        row = (name, ov, nv, round(nv / ov, 2))
        if os_ and ns_ and ns_["min"] > os_["max"]:
            regressions.append(row)  # ranges disjoint: not noise
        else:
            suspects.append(row)
    return regressions, suspects


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old, new = load(sys.argv[1]), load(sys.argv[2])
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    regressions, suspects = compare(old, new, ratio)
    print(
        f"total: {old.get('value')} -> {new.get('value')} "
        f"({len(set(old.get('queries', {})) & set(new.get('queries', {})))} shared entries, "
        f"threshold {ratio}x)"
    )
    for name, ov, nv, r in regressions:
        print(f"REGRESSION {name}: {ov}s -> {nv}s ({r}x, ranges disjoint)")
    for name, ov, nv, r in suspects:
        print(f"suspect    {name}: {ov}s -> {nv}s ({r}x, within spread — rerun)")
    if not regressions and not suspects:
        print("no entries exceed the threshold")
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
