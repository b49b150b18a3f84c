"""Run a subset of bench.py's stress entries in isolation (k passes each,
same per-entry isolation protocol) — the fast loop for optimization work.

Usage: python tools/r14_stress_one.py entry1,entry2 [k]
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from nexus_event_stream_spark.session import get_spark  # noqa: E402


def main() -> int:
    wanted = sys.argv[1].split(",") if len(sys.argv) > 1 else None
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="r14-stress-one", master=f"local[{cpus}]")

    bench._STRESS_ONLY = set(wanted) if wanted else None
    t0 = time.time()
    entries, breakdown = bench._stress_bench(spark, sf_dir, k=k)
    out = {}
    for name, (runs, n) in entries.items():
        out[name] = {
            "min": round(min(runs), 3),
            "runs": [round(r, 3) for r in runs],
            "rows_per_s": int(n / min(runs)),
        }
    print(
        json.dumps(
            {
                "entries": out,
                "stage_breakdown": breakdown,
                "wall": round(time.time() - t0, 1),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
