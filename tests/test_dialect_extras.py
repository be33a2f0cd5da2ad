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


def test_scd2_statements_execute_on_duckdb():
    """The dialect SCD2 pair runs live: close-on-change + open versions."""
    import duckdb

    from bulker_spark.sinks.sql_dialect import SqlDialect

    d = SqlDialect("duckdb")
    con = duckdb.connect()
    con.execute(
        'CREATE TABLE "dim" (id BIGINT, city VARCHAR, '
        '"__valid_from" TIMESTAMP, "__valid_to" TIMESTAMP, '
        '"__is_current" BOOLEAN)'
    )
    con.execute(
        "INSERT INTO \"dim\" VALUES (1, 'nyc', TIMESTAMP '2024-01-01', NULL, TRUE),"
        " (2, 'sf', TIMESTAMP '2024-01-01', NULL, TRUE)"
    )
    con.execute('CREATE TABLE "stg" (id BIGINT, city VARCHAR)')
    con.execute("INSERT INTO \"stg\" VALUES (1, 'boston'), (2, 'sf'), (3, 'la')")

    for stmt in d.scd2_apply_statements(
        "dim", ["id", "city"], ["id"], ["city"],
        "TIMESTAMP '2024-02-01'", "stg",
    ):
        con.execute(stmt)

    rows = con.execute(
        'SELECT id, city, "__is_current", "__valid_to" FROM "dim" '
        'ORDER BY id, "__valid_from"'
    ).fetchall()
    import datetime as dt

    assert rows == [
        (1, "nyc", False, dt.datetime(2024, 2, 1)),   # closed
        (1, "boston", True, None),                     # opened
        (2, "sf", True, None),                         # unchanged
        (3, "la", True, None),                         # new key
    ]

    # replay is a no-op
    for stmt in d.scd2_apply_statements(
        "dim", ["id", "city"], ["id"], ["city"],
        "TIMESTAMP '2024-03-01'", "stg",
    ):
        con.execute(stmt)
    assert con.execute('SELECT count(*) FROM "dim"').fetchone()[0] == 4


def test_scd2_statements_dialect_variants():
    from bulker_spark.sinks.sql_dialect import SqlDialect

    args = ("dim", ["id", "city"], ["id"], ["city"], "ts'2024-02-01'", "stg")
    close_pg, _ = SqlDialect("postgres").scd2_apply_statements(*args)
    assert close_pg.startswith("UPDATE") and "FROM" in close_pg
    assert "IS DISTINCT FROM" in close_pg

    close_my, _ = SqlDialect("mysql").scd2_apply_statements(*args)
    assert "JOIN" in close_my and "<=>" in close_my

    close_sf, ins_sf = SqlDialect("snowflake").scd2_apply_statements(*args)
    assert close_sf.startswith("MERGE INTO")
    assert ins_sf.startswith("INSERT INTO")

    close_ch, ins_ch = SqlDialect("clickhouse").scd2_apply_statements(*args)
    # INSERT-only: no UPDATE mutation anywhere, probes read FINAL,
    # superseding rows bump the version column
    assert close_ch.startswith("INSERT INTO") and ins_ch.startswith("INSERT INTO")
    assert "UPDATE" not in close_ch
    assert "FINAL" in close_ch and "FINAL" in ins_ch
    assert '"__scd_version" + 1' in close_ch


def test_scd2_clickhouse_ddl():
    from bulker_spark.sinks.sql_dialect import DataType, SqlDialect

    ddl = SqlDialect("clickhouse").scd2_create_table(
        "dim", {"id": DataType.INT64, "city": DataType.STRING}, ["id"]
    )
    assert 'ENGINE = ReplacingMergeTree("__scd_version")' in ddl
    assert 'ORDER BY ("id", "__valid_from")' in ddl
    assert 'Nullable(DateTime64(6))' in ddl
    # generic dialects: plain table, no engine clause
    pg = SqlDialect("postgres").scd2_create_table(
        "dim", {"id": DataType.INT64, "city": DataType.STRING}, ["id"]
    )
    assert "ENGINE" not in pg and '"__valid_to"' in pg


def test_scd2_clickhouse_semantics_via_final_emulation():
    """Prove the INSERT-only pair is a correct SCD2 apply by emulating
    ReplacingMergeTree's FINAL collapse (keep max __scd_version per
    sorting key) as a DuckDB view and executing the generated statements
    verbatim against it."""
    import datetime as dt

    import duckdb

    from bulker_spark.sinks.sql_dialect import SqlDialect

    d = SqlDialect("clickhouse")
    con = duckdb.connect()
    con.execute(
        'CREATE TABLE "dim" (id BIGINT, city VARCHAR, '
        '"__valid_from" TIMESTAMP, "__valid_to" TIMESTAMP, '
        '"__is_current" BOOLEAN, "__scd_version" BIGINT)'
    )
    # the FINAL emulation: ReplacingMergeTree keeps the highest version
    # per ORDER BY key (pk, __valid_from)
    con.execute(
        'CREATE VIEW final_dim AS SELECT id, city, "__valid_from", '
        '"__valid_to", "__is_current", "__scd_version" FROM ('
        'SELECT *, row_number() OVER (PARTITION BY id, "__valid_from" '
        'ORDER BY "__scd_version" DESC) AS rn FROM "dim") WHERE rn = 1'
    )
    con.execute(
        "INSERT INTO \"dim\" VALUES "
        "(1, 'nyc', TIMESTAMP '2024-01-01', NULL, TRUE, 1),"
        " (2, 'sf', TIMESTAMP '2024-01-01', NULL, TRUE, 1)"
    )
    con.execute('CREATE TABLE "stg" (id BIGINT, city VARCHAR)')
    con.execute("INSERT INTO \"stg\" VALUES (1, 'boston'), (2, 'sf'), (3, 'la')")

    def run(effective: str) -> None:
        for stmt in d.scd2_apply_statements(
            "dim", ["id", "city"], ["id"], ["city"], effective, "stg"
        ):
            con.execute(stmt.replace('FROM "dim" FINAL', "FROM final_dim"))

    run("TIMESTAMP '2024-02-01'")
    rows = con.execute(
        'SELECT id, city, "__is_current", "__valid_to" FROM final_dim '
        'ORDER BY id, "__valid_from"'
    ).fetchall()
    assert rows == [
        (1, "nyc", False, dt.datetime(2024, 2, 1)),   # superseded close
        (1, "boston", True, None),                     # opened
        (2, "sf", True, None),                         # unchanged
        (3, "la", True, None),                         # new key
    ]
    # replay: staging now equals current state → both statements no-op
    run("TIMESTAMP '2024-03-01'")
    assert con.execute("SELECT count(*) FROM final_dim").fetchone()[0] == 4
    # raw table holds the superseded v1 row too (engine collapses lazily)
    assert con.execute('SELECT count(*) FROM "dim"').fetchone()[0] == 5

    # close + re-open at the SAME effective timestamp (two applies within
    # one literal's granularity): the re-open must supersede the close
    # row at the shared (pk, __valid_from) sorting key — a constant
    # version 1 would collapse the new current row away and leave the key
    # with no current version at all
    con.execute("UPDATE \"stg\" SET city = 'chicago' WHERE id = 1")
    run("TIMESTAMP '2024-02-01'")  # boston opened at this same instant
    cur = con.execute(
        "SELECT city FROM final_dim WHERE id = 1 AND \"__is_current\""
    ).fetchall()
    assert cur == [("chicago",)]
    # the zero-duration boston version collapsed away (ReplacingMergeTree
    # key semantics — the documented divergence from UPDATE dialects)
    hist = con.execute(
        'SELECT city, "__is_current" FROM final_dim WHERE id = 1 '
        'ORDER BY "__valid_from", "__scd_version"'
    ).fetchall()
    assert hist == [("nyc", False), ("chicago", True)]
