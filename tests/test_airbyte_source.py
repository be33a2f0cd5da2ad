"""Airbyte-protocol source tests (sync-sidecar/read.go semantics)."""

import json

import pytest

from bulker_spark import Engine
from bulker_spark.sources.airbyte import AirbyteSource


def msg(type_, **kw):
    return json.dumps({"type": type_, **kw})


@pytest.fixture()
def sync_lines():
    return [
        msg("LOG", log={"level": "INFO", "message": "starting"}),
        msg("RECORD", record={"stream": "users", "data": {"id": 1, "name": "a"}}),
        msg("RECORD", record={"stream": "users", "data": {"id": 2, "name": "b"}}),
        msg("RECORD", record={"stream": "orders", "data": {"oid": 10, "total": 5.5}}),
        msg("STATE", state={"cursor": {"users": 2, "orders": 10}}),
        msg("RECORD", record={"stream": "users", "data": {"id": 3, "name": "c"}}),
        msg("STATE", state={"cursor": {"users": 3, "orders": 10}}),
    ]


def test_sync_routes_streams_and_state(spark, tmp_warehouse, sync_lines):
    engine = Engine(spark, tmp_warehouse)
    src = AirbyteSource(engine, stream_modes={"users": "batch", "orders": "replace_table"})
    res = src.run(sync_lines, stream_options={"users": {"primary_key": ["id"], "deduplicate": True}})
    assert set(res.streams) == {"users", "orders"}
    assert res.streams["users"].successful_rows == 3
    assert res.streams["orders"].successful_rows == 1
    assert res.log_count == 1
    assert not res.errors
    # last state committed
    assert src.load_state() == {"cursor": {"users": 3, "orders": 10}}
    users = {r["id"]: r["name"] for r in engine.warehouse.read("users").collect()}
    assert users == {1: "a", 2: "b", 3: "c"}
    # incremental second sync: dedup by pk upserts
    res2 = src.run(
        [msg("RECORD", record={"stream": "users", "data": {"id": 3, "name": "c2"}})],
        stream_options={"users": {"primary_key": ["id"], "deduplicate": True}},
    )
    users = {r["id"]: r["name"] for r in engine.warehouse.read("users").collect()}
    assert users[3] == "c2" and len(users) == 3


def test_trace_error_surfaces(spark, tmp_warehouse):
    engine = Engine(spark, tmp_warehouse)
    src = AirbyteSource(engine)
    res = src.run(
        [
            msg("TRACE", trace={"type": "ERROR", "error": {"message": "connector exploded"}}),
            msg("RECORD", record={"stream": "s", "data": {"x": 1}}),
        ]
    )
    assert res.errors == ["connector exploded"]
    assert res.streams["s"].successful_rows == 1


def test_run_control_extracts_spec_catalog_status(spark, tmp_path):
    import json

    from bulker_spark.api import Engine
    from bulker_spark.sources.airbyte import AirbyteSource

    eng = Engine(spark, str(tmp_path / "wh"))
    src = AirbyteSource(eng, table_prefix="ctl_")
    lines = [
        json.dumps({"type": "SPEC", "spec": {"connectionSpecification": {"required": ["host"]}}}),
        json.dumps({"type": "CONNECTION_STATUS", "connectionStatus": {"status": "SUCCEEDED"}}),
        json.dumps({"type": "CATALOG", "catalog": {"streams": [{"name": "users"}]}}),
        json.dumps({"type": "LOG", "log": {"level": "INFO", "message": "hi"}}),
    ]
    out = src.run_control(lines)
    assert out["status"] == "SUCCESS"
    assert out["spec"]["connectionSpecification"]["required"] == ["host"]
    assert out["catalog"]["streams"][0]["name"] == "users"
    assert out["connection_status"]["status"] == "SUCCEEDED"
    # persisted to the control table
    stored = {
        r.kind: json.loads(r.payload)
        for r in eng.warehouse.read("ctl__airbyte_control").collect()
    }
    assert set(stored) == {"spec", "catalog", "connection_status"}


def test_run_control_failed_check(spark, tmp_path):
    import json

    from bulker_spark.api import Engine
    from bulker_spark.sources.airbyte import AirbyteSource

    eng = Engine(spark, str(tmp_path / "wh"))
    src = AirbyteSource(eng)
    out = src.run_control(
        [
            json.dumps(
                {
                    "type": "CONNECTION_STATUS",
                    "connectionStatus": {"status": "FAILED", "message": "bad creds"},
                }
            )
        ]
    )
    assert out["status"] == "FAILED"
    assert out["description"] == "bad creds"
