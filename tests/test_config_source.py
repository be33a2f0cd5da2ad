"""Configuration sources (env / file / HTTP / SQL / multi) + app sync —
the reference's ConfigurationSource family re-expressed."""

import json
import threading

import pytest

from bulker_spark.app.config_source import (
    EnvConfigurationSource,
    FileConfigurationSource,
    HTTPConfigurationSource,
    MultiConfigurationSource,
    SQLConfigurationSource,
    sync_app,
)


def _spec(i, wh, **kw):
    return {"destination_id": i, "warehouse_path": wh, **kw}


def test_env_source_parses_and_skips_malformed(monkeypatch, tmp_path):
    monkeypatch.setenv(
        "BULKER_DESTINATION_A", json.dumps({"warehouse_path": str(tmp_path)})
    )
    monkeypatch.setenv("BULKER_DESTINATION_BAD", "{not json")
    monkeypatch.setenv(
        "BULKER_DESTINATION_B",
        json.dumps({"id": "custom", "warehouse_path": str(tmp_path)}),
    )
    src = EnvConfigurationSource()
    specs = {s["destination_id"]: s for s in src.load()}
    assert set(specs) == {"a", "custom"}  # id from env suffix or config id
    assert specs["a"]["warehouse_path"] == str(tmp_path)


def test_file_source_json_and_change_detection(tmp_path):
    p = tmp_path / "dests.json"
    p.write_text(json.dumps([_spec("x", str(tmp_path / "wh"))]))
    src = FileConfigurationSource(f"file://{p}")
    assert [s["destination_id"] for s in src.load()] == ["x"]
    assert src.changed() is True  # first observation
    assert src.changed() is False  # steady state
    p.write_text(
        json.dumps(
            {"destinations": [_spec("x", str(tmp_path / "wh"), namespace="n2")]}
        )
    )
    assert src.changed() is True  # wrapper form + content change
    assert src.get("x")["namespace"] == "n2"


def test_sql_source_over_duckdb(tmp_path):
    import duckdb

    db = str(tmp_path / "cfg.db")
    con = duckdb.connect(db)
    con.execute(
        "CREATE TABLE destination_configs (id VARCHAR, config VARCHAR)"
    )
    con.execute(
        "INSERT INTO destination_configs VALUES (?, ?)",
        ["d1", json.dumps({"warehouse_path": str(tmp_path / "wh")})],
    )
    con.close()
    src = SQLConfigurationSource(lambda: duckdb.connect(db, read_only=True))
    specs = src.load()
    assert specs == [
        {"warehouse_path": str(tmp_path / "wh"), "destination_id": "d1"}
    ]


def test_http_source_with_last_modified(tmp_path):
    from http.server import BaseHTTPRequestHandler, HTTPServer

    payload = json.dumps([_spec("h1", str(tmp_path / "wh"))]).encode()
    hits = {"n": 0, "cond": 0}

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            hits["n"] += 1
            if self.headers.get("If-Modified-Since") == "tag-1":
                hits["cond"] += 1
                self.send_response(304)
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Last-Modified", "tag-1")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, *a):  # silence test output
            pass

    server = HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        src = HTTPConfigurationSource(
            f"http://127.0.0.1:{server.server_port}/cfg"
        )
        assert [s["destination_id"] for s in src.load()] == ["h1"]
        # second load sends If-Modified-Since and serves the cache on 304
        assert [s["destination_id"] for s in src.load()] == ["h1"]
        assert hits["cond"] == 1
    finally:
        server.shutdown()


def test_multi_source_later_wins(tmp_path):
    a = tmp_path / "a.json"
    b = tmp_path / "b.json"
    a.write_text(
        json.dumps([_spec("x", "old"), _spec("only_a", str(tmp_path))])
    )
    b.write_text(json.dumps([_spec("x", "new")]))
    src = MultiConfigurationSource(
        [FileConfigurationSource(str(a)), FileConfigurationSource(str(b))]
    )
    specs = {s["destination_id"]: s for s in src.load()}
    assert specs["x"]["warehouse_path"] == "new"
    assert "only_a" in specs


def test_sync_app_put_update_delete(spark, tmp_path):
    from bulker_spark.app.router import BulkerApp

    app = BulkerApp(spark, str(tmp_path / "topics"), destinations={})
    p = tmp_path / "dests.json"
    p.write_text(
        json.dumps(
            [
                _spec("d1", str(tmp_path / "wh1")),
                _spec("d2", str(tmp_path / "wh2")),
            ]
        )
    )
    src = FileConfigurationSource(str(p))
    res = sync_app(app, src)
    assert res == {"put": ["d1", "d2"], "deleted": [], "errors": []}
    assert set(app.destinations) == {"d1", "d2"}

    # steady state: nothing reapplied
    assert sync_app(app, src) == {"put": [], "deleted": [], "errors": []}

    # change one, drop one
    p.write_text(
        json.dumps([_spec("d1", str(tmp_path / "wh1"), namespace="n2")])
    )
    res = sync_app(app, src)
    assert res == {"put": ["d1"], "deleted": ["d2"], "errors": []}
    assert app.destinations["d1"].namespace == "n2"
    assert "d2" not in app.destinations


def test_env_source_skips_non_object_json(monkeypatch, tmp_path):
    """Valid JSON that is not an object (list/string/number) must be
    skipped like malformed input — one bad env var must not brick the
    reconcile loop."""
    monkeypatch.setenv("BULKER_DESTINATION_LIST", '["a"]')
    monkeypatch.setenv("BULKER_DESTINATION_NUM", "42")
    monkeypatch.setenv(
        "BULKER_DESTINATION_OK",
        '{"warehouse_path": "%s"}' % tmp_path,
    )
    src = EnvConfigurationSource()
    assert [s["destination_id"] for s in src.load()] == ["ok"]
    assert src.changed() is True  # hashing still works


def test_sync_app_isolates_bad_specs(spark, tmp_path):
    """One rejected spec (warehouse_path outside the allowed roots) must
    not halt the reconcile tick: good specs still apply, the bad one is
    reported under "errors" and retried next tick."""
    from bulker_spark.app import BulkerApp

    ok_root = tmp_path / "roots"
    app = BulkerApp(
        spark,
        str(tmp_path / "topics"),
        [],
        allowed_warehouse_roots=[str(ok_root)],
    )
    p = tmp_path / "specs.json"
    p.write_text(
        json.dumps(
            [
                {"destination_id": "bad", "warehouse_path": "/etc/evil"},
                {
                    "destination_id": "good",
                    "warehouse_path": str(ok_root / "good"),
                },
            ]
        )
    )
    src = FileConfigurationSource(str(p))
    res = sync_app(app, src)
    assert res["put"] == ["good"]
    assert len(res["errors"]) == 1 and "bad" in res["errors"][0]
    assert "good" in app.destinations and "bad" not in app.destinations
    # the bad spec's hash was not stored: it is re-attempted each tick
    res2 = sync_app(app, src)
    assert res2["put"] == [] and len(res2["errors"]) == 1
