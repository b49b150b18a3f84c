"""HTTP read API parity — the data plane's endpoints over the Spark view.

Reference contracts (data-plane/internal/handler/signal.go:24-81):

- ``GET /signals``              → JSON list, top-50 newest-first
- ``GET /signals?priority=P``   → filtered; unknown P → empty list (200)
- ``GET /signals/{id}``         → record or 404 ``{"error": "..."}``
- ``GET /health``               → 200/503 with status body
- ``GET /rollups``              → finalized time-bucket aggregates,
  newest-first top-N (?top=, default 50), dim-equality query params
  (?event_type=click); 404 envelope before the first committed epoch,
  400 on unknown dimensions — the signals envelope contract extended to
  the continuous-aggregate view (no reference counterpart endpoint; the
  envelope/ordering discipline is handler/signal.go:24-60's)
- errors use the ``{"error": msg}`` envelope; Content-Type is JSON

Auth parity: the reference gates every endpoint with ``IsAuthenticated``
(control-plane/nexus/core/views.py:10,15,19) and mounts DRF's
``api-auth/`` (control-plane/nexus/urls.py:35). The analogue here is a
thin bearer-token hook: pass ``auth_token`` to require
``Authorization: Bearer <token>`` on every data endpoint — missing/wrong
credentials get the 401 ``{"error": ...}`` envelope. ``/health`` stays
open (liveness probes don't carry credentials). Default is open, matching
the data plane's public read handler (handler/signal.go).

Built on the stdlib server — the API tier is deliberately thin: every
endpoint is one DataFrame query (serving.py); a production deployment
would put the same three calls behind any ASGI framework.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from nexus_event_stream_spark.serving import (
    DirectoryService,
    NotFoundError,
    RollupService,
    SearchService,
    SignalService,
    SimilarService,
)


def _row_to_dict(row) -> dict:
    import datetime as _dt

    d = row.asDict()
    for k, v in d.items():
        if isinstance(v, _dt.datetime):
            d[k] = v.isoformat()
    return d


def make_handler(
    service: SignalService,
    directory: DirectoryService | None = None,
    auth_token: str | None = None,
    rollups: RollupService | None = None,
    search: SearchService | None = None,
    similar: SimilarService | None = None,
):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _authorized(self) -> bool:
            if auth_token is None:
                return True
            import hmac

            got = self.headers.get("Authorization", "")
            # constant-time compare: a timing oracle on the token would
            # defeat the point of requiring one
            return hmac.compare_digest(got, f"Bearer {auth_token}")

        def do_GET(self):  # noqa: N802 (stdlib naming)
            url = urlparse(self.path)
            parts = [p for p in url.path.split("/") if p]
            try:
                if parts == ["health"]:
                    h = service.health()
                    self._send(200 if h["view_exists"] else 503, h)
                elif not self._authorized():
                    self._send(401, {"error": "authentication required"})
                elif parts == ["signals"]:
                    prio = parse_qs(url.query).get("priority", [None])[0]
                    rows = service.list(priority=prio)
                    self._send(200, [_row_to_dict(r) for r in rows])
                elif len(parts) == 2 and parts[0] == "signals":
                    try:
                        self._send(200, _row_to_dict(service.get(parts[1])))
                    except NotFoundError:
                        self._send(404, {"error": "signal not found"})
                elif parts == ["rollups"] and rollups is not None:
                    qs = parse_qs(url.query)
                    try:
                        top = int(qs.pop("top", ["50"])[0])
                        if top < 0:
                            raise ValueError
                    except ValueError:
                        self._send(
                            400,
                            {"error": "top must be a non-negative integer"},
                        )
                        return
                    dims = {k: v[0] for k, v in qs.items()}
                    try:
                        rows = rollups.list(top=top, dims=dims)
                        self._send(200, [_row_to_dict(r) for r in rows])
                    except NotFoundError:
                        self._send(404, {"error": "rollup not found"})
                    except ValueError as exc:
                        self._send(400, {"error": str(exc)})
                elif parts == ["search"] and search is not None:
                    qs = parse_qs(url.query)
                    q = qs.get("q", [None])[0]
                    if q is None:
                        self._send(400, {"error": "missing query parameter q"})
                        return
                    try:
                        k = int(qs.get("k", ["10"])[0])
                        if k < 0:
                            raise ValueError
                    except ValueError:
                        self._send(
                            400, {"error": "k must be a non-negative integer"}
                        )
                        return
                    try:
                        rows = search.search(q, k=k)
                        self._send(200, [_row_to_dict(r) for r in rows])
                    except NotFoundError:
                        self._send(404, {"error": "search index not found"})
                    except ValueError as exc:
                        self._send(400, {"error": str(exc)})
                elif parts == ["similar"] and similar is not None:
                    qs = parse_qs(url.query)
                    try:
                        vid = int(qs.get("id", [""])[0])
                    except ValueError:
                        self._send(
                            400, {"error": "id must be an integer vector id"}
                        )
                        return
                    try:
                        k = int(qs.get("k", ["10"])[0])
                        nprobe = int(qs.get("nprobe", ["4"])[0])
                        if k < 0 or nprobe < 1:
                            raise ValueError
                    except ValueError:
                        self._send(
                            400,
                            {"error": "k must be >= 0 and nprobe >= 1"},
                        )
                        return
                    try:
                        rows = similar.similar(vid, k=k, nprobe=nprobe)
                        self._send(200, [_row_to_dict(r) for r in rows])
                    except NotFoundError as exc:
                        self._send(404, {"error": f"not found: {exc}"})
                elif parts == ["users"] and directory is not None:
                    self._send(200, [_row_to_dict(r) for r in directory.users()])
                elif parts == ["groups"] and directory is not None:
                    self._send(200, [_row_to_dict(r) for r in directory.groups()])
                else:
                    self._send(404, {"error": "not found"})
            except Exception as exc:  # 500 envelope (handler/signal.go:71-81)
                self._send(500, {"error": str(exc)})

        def log_message(self, *args):  # quiet test output
            pass

    return Handler


def serve(
    service: SignalService,
    port: int = 0,
    directory: DirectoryService | None = None,
    auth_token: str | None = None,
    rollups: RollupService | None = None,
    search: SearchService | None = None,
    similar: SimilarService | None = None,
) -> ThreadingHTTPServer:
    """Start the read API on a daemon thread; returns the server (use
    ``server.server_address[1]`` for the bound port, ``shutdown()`` to stop).

    ``directory`` optionally mounts the control-plane users/groups listings
    (views.py:7-15) at ``/users`` and ``/groups``. ``rollups`` mounts the
    continuous-aggregate read tier at ``/rollups`` (?top=N + dim-equality
    query params; 404 envelope before the first committed epoch, 400 on an
    unknown dimension — the signal endpoints' envelope discipline applied
    to the analytics view). ``search`` mounts the BM25 read tier at
    ``/search`` (?q=text&k=N; 400 on missing q / bad k, 404 before the
    first committed epoch, empty 200 when no query term is indexed — the
    unknown-priority quirk). ``similar`` mounts the ANN read tier at
    ``/similar`` (?id=vec_id&k=N&nprobe=M; 400 on a non-integer id, 404
    for an unknown id or an empty index, the doc excluded from its own
    neighbors). ``auth_token`` arms the bearer-token gate (401 envelope
    on every data endpoint; /health open).
    """
    server = ThreadingHTTPServer(
        ("127.0.0.1", port),
        make_handler(service, directory, auth_token, rollups, search, similar),
    )
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server
