"""CLI parity — the reference's ``nexus-cli {list|get|health}``
(data-plane/cmd/cli/main.go) over the Spark view.

Rendering mirrors the reference's table output: fixed columns, content
truncated at 40 chars with an ellipsis (cli/main.go:165-170), timestamps
as ``yyyy-MM-dd HH:mm`` (cli/main.go:157-163).
"""

from __future__ import annotations

import argparse
import sys

from nexus_event_stream_spark.serving import NotFoundError, SignalService

TRUNC = 40


def _trunc(s: str | None) -> str:
    s = s or ""
    return s if len(s) <= TRUNC else s[: TRUNC - 1] + "…"


def _fmt_ts(ts) -> str:
    return ts.strftime("%Y-%m-%d %H:%M") if ts else ""


def render_list(rows) -> str:
    header = f"{'ID':<38} {'TITLE':<40} {'PRIORITY':<8} {'CREATED':<16}"
    lines = [header]
    for r in rows:
        lines.append(
            f"{_trunc(r['id']):<38} {_trunc(r['title']):<40} "
            f"{r['priority'] or '':<8} {_fmt_ts(r['created_at']):<16}"
        )
    return "\n".join(lines)


def render_get(row) -> str:
    return "\n".join(
        f"{k}: {row[k] if not hasattr(row[k], 'strftime') else _fmt_ts(row[k])}"
        for k in ("id", "title", "content", "priority", "author", "created_at", "updated_at")
    )


def main(service: SignalService, argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="nexus-spark-cli")
    sub = parser.add_subparsers(dest="cmd", required=True)
    lp = sub.add_parser("list")
    lp.add_argument("--priority", default=None)
    gp = sub.add_parser("get")
    gp.add_argument("id")
    sub.add_parser("health")
    args = parser.parse_args(argv)

    if args.cmd == "list":
        print(render_list(service.list(priority=args.priority)))
        return 0
    if args.cmd == "get":
        try:
            print(render_get(service.get(args.id)))
            return 0
        except NotFoundError:
            print("error: signal not found", file=sys.stderr)
            return 1
    if args.cmd == "health":
        h = service.health()
        print(f"status: {h['status']} rows: {h['rows']}")
        return 0 if h["view_exists"] else 1
    return 2
