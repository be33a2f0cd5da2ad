"""ClickHouse dialect, value sanitization, ingest filters, spread jitter."""

import pytest
from pyspark.sql import functions as F

from bulker_spark.ingest_filters import apply_filters, parse_filter
from bulker_spark.sinks.sql_dialect import (
    SqlDialect,
    fill_required_defaults,
    sanitize_values,
)
from bulker_spark.streaming.ingest_stream import spread_offset_seconds
from bulker_spark.types_lattice import DataType


def test_clickhouse_dialect_types_and_insert():
    d = SqlDialect("clickhouse")
    assert d.sql_type(DataType.TIMESTAMP) == "DateTime64(6)"
    assert d.sql_type(DataType.BOOL) == "UInt8"
    stmts = d.merge("events", ["id", "v"], ["id"])
    assert stmts == ['INSERT INTO "events" ("id", "v") VALUES (?, ?)']
    ddl = d.create_table("t", {"id": DataType.INT64}, pk=["id"])
    assert "Int64" in ddl


def test_postgres_zero_byte_strip(spark):
    df = spark.createDataFrame(
        [("a\x00b", 1), ("clean", 2)], ["txt", "n"]
    )
    out = sanitize_values(df, SqlDialect("postgres")).collect()
    assert {r["txt"] for r in out} == {"ab", "clean"}
    # non-postgres dialects untouched
    raw = sanitize_values(df, SqlDialect("mysql")).collect()
    assert {r["txt"] for r in raw} == {"a\x00b", "clean"}


def test_clickhouse_required_defaults(spark):
    df = spark.createDataFrame([(1, None), (2, "x")], ["id", "s"])
    out = fill_required_defaults(
        df, {"s": DataType.STRING, "n": DataType.INT64, "b": DataType.BOOL}
    )
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["s"] == "" and rows[2]["s"] == "x"
    assert rows[1]["n"] == 0 and rows[1]["b"] is False


def test_parse_filter_forms():
    assert parse_filter(None) == ["*"]
    assert parse_filter("a\nb\n") == ["a", "b"]
    assert parse_filter(["x"]) == ["x"]
    assert parse_filter(42) == []


def test_apply_filters_events_and_hosts(spark):
    df = spark.createDataFrame(
        [
            ("page", None, "shop.example.com"),
            ("click", None, "shop.example.com"),
            ("page", None, "evil.com"),
            (None, "page", "example.com"),
        ],
        ["type", "event", "context_page_host"],
    )
    out = apply_filters(
        df, {"events": "page", "hosts": "*.example.com\nexample.com"}
    ).collect()
    hosts = {r["context_page_host"] for r in out}
    assert hosts == {"shop.example.com", "example.com"}  # evil.com + click dropped
    assert len(out) == 2


def test_apply_filters_wildcard_defaults(spark):
    df = spark.createDataFrame([("t1", "h1")], ["type", "context_page_host"])
    assert apply_filters(df, {}).count() == 1  # no filters → everything


def test_apply_filters_stays_jvm(spark):
    from bulker_spark.plans import audit

    df = spark.createDataFrame([("page", "a.example.com")], ["type", "context_page_host"])
    out = apply_filters(df, {"events": "page", "hosts": "*.example.com"})
    assert "BatchEvalPython" not in audit.explain_str(out, "simple")


def test_spread_offset_deterministic_and_bounded():
    offs = {spread_offset_seconds("dst", f"t{i}", 300) for i in range(50)}
    assert all(0 <= o < 300 for o in offs)
    assert len(offs) > 10  # actually spread, not clustered
    assert spread_offset_seconds("dst", "t1", 300) == spread_offset_seconds(
        "dst", "t1", 300
    )
