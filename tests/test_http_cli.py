"""HTTP API + CLI parity — mirrors handler_test.go / client_test.go /
cli rendering contracts end-to-end against a live server.
"""

from __future__ import annotations

import datetime as dt
import json
import urllib.error
import urllib.request

import pytest

from nexus_event_stream_spark.cli import main as cli_main, render_list
from nexus_event_stream_spark.schemas import STATE_SCHEMA
from nexus_event_stream_spark.serving import SignalService
from nexus_event_stream_spark.serving_http import serve
from nexus_event_stream_spark.streaming.projection import ParquetViewStore

UTC = dt.timezone.utc


def vrow(id_, priority="High", day=23, title=None):
    ts = dt.datetime(2026, 2, day, 18, 0, tzinfo=UTC)
    return ("created", id_, title or f"title-{id_}", "c", priority, "otavio", ts, ts)


@pytest.fixture(scope="module")
def service(spark, tmp_path_factory):
    store = ParquetViewStore(str(tmp_path_factory.mktemp("view")))
    rows = [vrow("s1", "High", 23), vrow("s2", "Low", 22)]
    store.write(spark.createDataFrame(rows, STATE_SCHEMA), epoch=0)
    return SignalService(spark, store)


@pytest.fixture(scope="module")
def base_url(service):
    server = serve(service)
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()


def get_json(url):
    with urllib.request.urlopen(url) as resp:
        return resp.status, resp.headers["Content-Type"], json.load(resp)


def test_list_endpoint_order_and_content_type(base_url):
    status, ctype, body = get_json(f"{base_url}/signals")
    assert status == 200 and ctype == "application/json"
    assert [r["id"] for r in body] == ["s1", "s2"]  # newest first
    assert body[0]["created_at"].startswith("2026-02-23T18:00")


def test_priority_filter_and_unknown_empty(base_url):
    _, _, body = get_json(f"{base_url}/signals?priority=Low")
    assert [r["id"] for r in body] == ["s2"]
    _, _, body = get_json(f"{base_url}/signals?priority=Bogus")
    assert body == []  # unknown priority: empty, not error


def test_get_and_404_error_envelope(base_url):
    status, _, body = get_json(f"{base_url}/signals/s1")
    assert status == 200 and body["title"] == "title-s1"
    with pytest.raises(urllib.error.HTTPError) as err:
        urllib.request.urlopen(f"{base_url}/signals/ghost")
    assert err.value.code == 404
    assert json.load(err.value)["error"] == "signal not found"


def test_health_endpoint(base_url):
    status, _, body = get_json(f"{base_url}/health")
    assert status == 200 and body["status"] == "ok" and body["rows"] == 2


def test_users_groups_endpoints(spark, service):
    from nexus_event_stream_spark.serving import DirectoryService
    from nexus_event_stream_spark.serving_http import serve as serve_http

    users = spark.createDataFrame(
        [("alice", dt.datetime(2026, 1, 2)), ("bob", dt.datetime(2026, 1, 3))],
        "username string, date_joined timestamp",
    )
    groups = spark.createDataFrame([("dev",), ("ops",)], "name string")
    server = serve_http(service, directory=DirectoryService(users, groups))
    url = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        status, _, body = get_json(f"{url}/users")
        assert status == 200
        assert [u["username"] for u in body] == ["bob", "alice"]
        assert body[0]["date_joined"].startswith("2026-01-03")
        _, _, body = get_json(f"{url}/groups")
        assert [g["name"] for g in body] == ["ops", "dev"]
    finally:
        server.shutdown()


def test_bearer_token_gate_401_envelope_and_open_health(service):
    """Auth parity with the reference's IsAuthenticated gate
    (control-plane/nexus/core/views.py:10,15,19): with auth_token armed,
    every data endpoint returns the 401 {"error": ...} envelope unless
    the exact bearer token is presented; /health stays open for probes."""
    server = serve(service, auth_token="sekret")
    base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        def status_of(path, token=None):
            req = urllib.request.Request(base + path)
            if token is not None:
                req.add_header("Authorization", f"Bearer {token}")
            try:
                with urllib.request.urlopen(req) as resp:
                    return resp.status, json.load(resp)
            except urllib.error.HTTPError as e:
                return e.code, json.load(e)

        code, body = status_of("/signals")
        assert code == 401 and body == {"error": "authentication required"}
        code, body = status_of("/signals/s1", token="wrong")
        assert code == 401 and "error" in body
        code, body = status_of("/signals", token="sekret")
        assert code == 200 and [r["id"] for r in body] == ["s1", "s2"]
        code, body = status_of("/signals/s1", token="sekret")
        assert code == 200 and body["id"] == "s1"
        code, _body = status_of("/health")  # no credentials
        assert code == 200
    finally:
        server.shutdown()


def test_cli_list_truncation_and_exit_codes(service, capsys):
    long_title = "x" * 60
    assert cli_main(service, ["list"]) == 0
    out = capsys.readouterr().out
    assert "title-s1" in out and "PRIORITY" in out

    rendered = render_list(
        [
            {
                "id": "a",
                "title": long_title,
                "priority": "High",
                "created_at": dt.datetime(2026, 1, 1, 12, 30),
            }
        ]
    )
    assert "x" * 39 + "…" in rendered  # cli/main.go:165-170 truncation
    assert "2026-01-01 12:30" in rendered  # cli/main.go:157-163 format

    assert cli_main(service, ["get", "s1"]) == 0
    assert cli_main(service, ["get", "ghost"]) == 1  # ErrNotFound → exit 1
    assert cli_main(service, ["health"]) == 0


# ---- GET /rollups: the continuous-aggregate read endpoint -----------------


@pytest.fixture(scope="module")
def rollup_service(spark, tmp_path_factory):
    from nexus_event_stream_spark.io import load_table
    from nexus_event_stream_spark.serving import RollupService
    from nexus_event_stream_spark.streaming.rollup import RollupStore

    store = RollupStore(
        str(tmp_path_factory.mktemp("rollup")), n_buckets=4
    )
    events = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "ts", "event_type", "value"
    )
    store.apply_batch(spark, events, 0)
    return RollupService(spark, store)


def test_rollups_endpoint_order_filter_and_envelopes(service, rollup_service):
    """handler/signal.go:24-60 envelope discipline on the analytics view:
    newest-first top-N, dim-equality filters, 404-on-no-snapshot, 400 on
    an unknown dimension."""
    from nexus_event_stream_spark.serving import RollupService
    from nexus_event_stream_spark.streaming.rollup import RollupStore

    server = serve(service, rollups=rollup_service)
    base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        status, ctype, body = get_json(f"{base}/rollups?top=5")
        assert status == 200 and ctype == "application/json"
        assert len(body) == 5
        # newest-first, dims ascending within a bucket
        keys = [(r["bucket_ts"], r["event_type"]) for r in body]
        assert keys == sorted(keys, key=lambda k: (k[0],), reverse=True) or [
            k[0] for k in keys
        ] == sorted([k[0] for k in keys], reverse=True)
        ts_desc = [r["bucket_ts"] for r in body]
        assert ts_desc == sorted(ts_desc, reverse=True)
        # finalized columns present with float values at the edge
        for r in body:
            assert {"n_events", "sum_value", "min_value", "max_value",
                    "avg_value"} <= set(r)
        # dim filter: only that event_type comes back, and it matches a
        # direct finalized() query
        etype = body[0]["event_type"]
        status, _, filt = get_json(f"{base}/rollups?event_type={etype}&top=1000")
        assert status == 200
        assert {r["event_type"] for r in filt} == {etype}
        want = (
            rollup_service.store.finalized(rollup_service.spark)
            .filter(f"event_type = '{etype}'")
            .count()
        )
        assert len(filt) == want
        # unknown dim VALUE → empty 200 (the unknown-priority quirk)
        status, _, empty = get_json(f"{base}/rollups?event_type=zzz_nope")
        assert status == 200 and empty == []
        # unknown dim NAME → 400 envelope
        try:
            urllib.request.urlopen(f"{base}/rollups?bogus_dim=1")
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "bogus_dim" in json.load(e)["error"]
        # non-integer and negative top → 400 envelope (client error,
        # never a 500 from DataFrame.limit)
        for bad_top in ("abc", "-5"):
            try:
                urllib.request.urlopen(f"{base}/rollups?top={bad_top}")
                raise AssertionError("expected 400")
            except urllib.error.HTTPError as e:
                assert e.code == 400 and "top" in json.load(e)["error"]
    finally:
        server.shutdown()

    # 404 envelope before the first committed epoch (empty store)
    import tempfile

    empty_store = RollupStore(tempfile.mkdtemp(prefix="rollup_empty_"))
    empty_service = RollupService(rollup_service.spark, empty_store)
    server = serve(service, rollups=empty_service)
    base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        urllib.request.urlopen(f"{base}/rollups")
        raise AssertionError("expected 404")
    except urllib.error.HTTPError as e:
        assert e.code == 404 and json.load(e) == {"error": "rollup not found"}
    finally:
        server.shutdown()


def test_rollups_behind_bearer_gate(service, rollup_service):
    server = serve(service, auth_token="sekret", rollups=rollup_service)
    base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        try:
            urllib.request.urlopen(f"{base}/rollups")
            raise AssertionError("expected 401")
        except urllib.error.HTTPError as e:
            assert e.code == 401
        req = urllib.request.Request(f"{base}/rollups?top=2")
        req.add_header("Authorization", "Bearer sekret")
        with urllib.request.urlopen(req) as resp:
            assert resp.status == 200 and len(json.load(resp)) == 2
    finally:
        server.shutdown()


def test_cli_rollups_command(service, rollup_service, capsys):
    from nexus_event_stream_spark.cli import main as cli

    # no store configured → usage error
    assert cli(service, ["rollups"]) == 2
    # happy path: header + top rows, newest-first
    assert cli(service, ["rollups", "--top", "3"], rollups=rollup_service) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0].startswith("BUCKET") and "EVENT_TYPE" in out[0]
    assert len(out) == 4
    # dim filter matches the service
    etype = rollup_service.list(top=1)[0]["event_type"]
    assert (
        cli(
            service,
            ["rollups", "--dim", f"event_type={etype}", "--top", "5"],
            rollups=rollup_service,
        )
        == 0
    )
    body = capsys.readouterr().out
    assert etype in body
    # unknown dim → exit 2 with the error on stderr; malformed --dim too
    assert (
        cli(service, ["rollups", "--dim", "bogus=1"], rollups=rollup_service)
        == 2
    )
    assert "bogus" in capsys.readouterr().err
    assert (
        cli(service, ["rollups", "--dim", "novalue"], rollups=rollup_service)
        == 2
    )
    # empty store → exit 1, the 404 analogue
    import tempfile

    from nexus_event_stream_spark.serving import RollupService
    from nexus_event_stream_spark.streaming.rollup import RollupStore

    empty = RollupService(
        rollup_service.spark, RollupStore(tempfile.mkdtemp(prefix="rcli_"))
    )
    capsys.readouterr()
    assert cli(service, ["rollups"], rollups=empty) == 1
    assert "rollup not found" in capsys.readouterr().err
