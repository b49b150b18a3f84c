"""Local replica of the driver's oracle gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column names,
and an order-insensitive multiset of stringified rows (stricter than a
hash — it pinpoints the first differing row).

Usage: python tools/selfcheck.py [--vanilla] [sf_dir] [query ...]
       python tools/selfcheck.py --all-sf [summary_json]

``--vanilla`` builds a PLAIN SparkSession (no engine confs — no AQE
tuning, no pinned session timezone), exactly like the driver does; a
query that only passes under ``session.get_spark`` confs is a latent
driver failure.

``--all-sf`` is the per-round sweep (VERDICT r4 #7): sf0.01 engine-conf,
sf0.01 vanilla, and sf0.1 engine-conf — each in a fresh SparkSession
(confs cannot be swapped on a live session) — writing a committed
summary (default ``SELFCHECK.json``) that records per-config pass/fail
so scale-dependent divergence (float fold order, int overflow,
tie-break density) is caught before the driver ever scales up.
bench.py runs this sweep as its pre-step.
"""

from __future__ import annotations

import json
import os
import sys
import time
from collections import Counter

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nexus_event_stream_spark.schemas import TABLE_NAMES  # noqa: E402
from nexus_event_stream_spark.session import get_spark  # noqa: E402


#: DuckDB logical type → the normalized name Spark's dtypes use. Anything
#: not listed (notably HUGEINT, which pandas widens to float64 while Spark
#: stays int64 — the exact drift that broke the driver's value hash on
#: q_zscore_outliers/q_hash_sample in round 1) falls through unchanged and
#: therefore mismatches.
_DUCK_TO_SPARK_TYPE = {
    "tinyint": "tinyint",
    "smallint": "smallint",
    "integer": "int",
    "bigint": "bigint",
    "float": "float",
    "double": "double",
    "varchar": "string",
    "boolean": "boolean",
    "date": "date",
    "timestamp": "timestamp",
    "timestamp with time zone": "timestamp",
}


def norm_duck_type(t: str) -> str:
    t = str(t).strip().lower()
    if t.endswith("[]"):
        return f"array<{norm_duck_type(t[:-2])}>"
    return _DUCK_TO_SPARK_TYPE.get(t, t)


def type_mismatches(scols, sdtypes, dcols, dtypes) -> list[str]:
    """Columns whose DuckDB type doesn't normalize to the Spark dtype."""
    sd = dict(zip(scols, sdtypes))
    dd = {c: norm_duck_type(t) for c, t in zip(dcols, dtypes)}
    return [
        f"{c}: spark={sd[c]} duck={dd[c]}"
        for c in scols
        if c in dd and sd[c] != dd[c]
    ]


def norm_cell(v) -> str:
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision — we claim bit-identical floats
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    return str(v)


def row_multiset(rows, colnames_sorted, colnames) -> Counter:
    idx = [colnames.index(c) for c in colnames_sorted]
    return Counter("|".join(norm_cell(r[i]) for i in idx) for r in rows)


def _make_spark(vanilla: bool):
    if vanilla:
        from pyspark.sql import SparkSession

        return (
            SparkSession.builder.master("local[8]")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    return get_spark(master="local[8]", shuffle_partitions=8)


def run_sweep(sf_dir: str, vanilla: bool = False, only: set[str] | None = None) -> dict:
    """Run every catalog query against its oracle at ``sf_dir``; returns
    ``{n_checked, n_rows_only, failures, spark_sec, duck_sec}``. Prints
    per-query lines as it goes (same output as the CLI always had)."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    spark = _make_spark(vanilla)
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    failures: list[str] = []
    n_checked = n_rows_only = 0
    tot_spark = tot_duck = 0.0
    for name, build in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = build(spark, sf_dir)
        scols = sdf.columns
        sdtypes = [t for _, t in sdf.dtypes]
        srows = sdf.collect()
        dt_spark = time.time() - t0
        tot_spark += dt_spark
        if name not in oracles:
            n_rows_only += 1
            print(f"  {name:<24} rows-only: {len(srows)} rows  [{dt_spark:.1f}s]")
            continue
        t0 = time.time()
        rel = con.sql(oracles[name])
        dcols = rel.columns
        drows = rel.fetchall()
        dt_duck = time.time() - t0
        tot_duck += dt_duck
        n_checked += 1
        status = "OK"
        detail = ""
        bad_types = type_mismatches(scols, sdtypes, dcols, [t for t in rel.types])
        if sorted(scols) != sorted(dcols):
            status, detail = "COLS-MISMATCH", f"spark={scols} duck={dcols}"
        elif bad_types:
            status, detail = "TYPE-MISMATCH", "; ".join(bad_types)
        elif len(srows) != len(drows):
            status, detail = "COUNT-MISMATCH", f"spark={len(srows)} duck={len(drows)}"
        else:
            cs = sorted(scols)
            ms, md = row_multiset(srows, cs, scols), row_multiset(drows, cs, dcols)
            if ms != md:
                status = "VALUE-MISMATCH"
                only_s = list((ms - md).items())[:3]
                only_d = list((md - ms).items())[:3]
                detail = f"spark-only={only_s} duck-only={only_d}"
        print(
            f"  {name:<24} {status}  {len(srows)} rows "
            f"[spark {dt_spark:.1f}s, duck {dt_duck:.1f}s] {detail}"
        )
        if status != "OK":
            failures.append(name)
    return {
        "n_checked": n_checked,
        "n_rows_only": n_rows_only,
        "failures": failures,
        "spark_sec": round(tot_spark, 1),
        "duck_sec": round(tot_duck, 1),
    }


#: the per-round sweep matrix: driver scale (engine + driver-faithful
#: vanilla session) plus the bench scale.
SWEEP_CONFIGS = [
    {"sf_dir": "/root/testdata/sf0.01", "vanilla": False},
    {"sf_dir": "/root/testdata/sf0.01", "vanilla": True},
    {"sf_dir": "/root/testdata/sf0.1", "vanilla": False},
]


def run_all_sf(summary_path: str = "SELFCHECK.json") -> int:
    """Each config runs in its OWN subprocess: a vanilla pass sharing the
    JVM that just ran engine confs would not be driver-faithful (JVM-side
    state can survive a SparkContext stop/start), and that isolation is
    the whole point of the vanilla row."""
    import subprocess
    import tempfile

    git_head = None
    try:
        cwd = os.path.dirname(os.path.abspath(__file__))
        git_head = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10, cwd=cwd,
        ).stdout.strip() or None
        if git_head and subprocess.run(
            ["git", "status", "--porcelain"],
            capture_output=True, text=True, timeout=10, cwd=cwd,
        ).stdout.strip():
            git_head += "-dirty"
    except Exception:
        pass

    results = []
    ok = True
    for cfg in SWEEP_CONFIGS:
        label = f"{cfg['sf_dir']}{' (vanilla)' if cfg['vanilla'] else ''}"
        print(f"== sweep: {label}", flush=True)
        fd, out = tempfile.mkstemp(suffix=".json")
        os.close(fd)
        cmd = [sys.executable, os.path.abspath(__file__)]
        if cfg["vanilla"]:
            cmd.append("--vanilla")
        cmd += ["--json-out", out, cfg["sf_dir"]]
        try:
            proc = subprocess.run(cmd, timeout=900)
            with open(out) as fh:
                res = json.load(fh)
        except Exception as exc:
            res = {"failures": [f"<sweep-config-error: {exc}>"]}
        finally:
            try:
                os.unlink(out)
            except OSError:
                pass
        results.append({**cfg, **res})
        ok = ok and not res.get("failures")
        print()
    summary = {"pass": ok, "git_head": git_head, "configs": results}
    with open(summary_path, "w") as fh:
        json.dump(summary, fh, indent=1)
    print(f"sweep {'PASS' if ok else 'FAIL'} -> {summary_path}")
    return 0 if ok else 1


def main() -> int:
    args = sys.argv[1:]
    json_out = None
    if "--json-out" in args:
        i = args.index("--json-out")
        json_out = args[i + 1]
        del args[i : i + 2]
    if "--all-sf" in args:
        args.remove("--all-sf")
        flags = [a for a in args if a.startswith("--")]
        if flags:
            print(f"unknown flags with --all-sf: {flags}")
            return 2
        return run_all_sf(*args[:1])
    vanilla = "--vanilla" in args
    if vanilla:
        args.remove("--vanilla")
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    res = run_sweep(sf_dir, vanilla, only)
    if json_out:
        with open(json_out, "w") as fh:
            json.dump(res, fh)
    print()
    if res["failures"]:
        print(f"FAILED: {res['failures']}")
        return 1
    print("all queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
