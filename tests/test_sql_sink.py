"""SQL-dialect sink tests: generated DDL/DML executed against DuckDB as a
real SQL warehouse (the reference's SQLAdapter lifecycle)."""

import duckdb
import pytest

from bulker_spark.sinks.sql_dialect import SqlDialect
from bulker_spark.sinks.jdbc import SqlWarehouseSink
from bulker_spark.types_lattice import DataType as D


@pytest.fixture()
def sink():
    con = duckdb.connect()
    return SqlWarehouseSink(SqlDialect("duckdb"), lambda: con), con


def test_dialect_statements():
    pg = SqlDialect("postgres")
    ddl = pg.create_table(
        "t", {"id": D.INT64, "name": D.STRING, "ts": D.TIMESTAMP}, pk=["id"]
    )
    assert '"id" bigint' in ddl and "PRIMARY KEY" in ddl
    assert pg.merge("t", ["id", "name"], ["id"]) == [
        'INSERT INTO "t" ("id", "name") VALUES (?, ?) '
        'ON CONFLICT ("id") DO UPDATE SET "name" = excluded."name"'
    ]
    my = SqlDialect("mysql")
    assert "ON DUPLICATE KEY UPDATE" in my.merge("t", ["id", "x"], ["id"])[0]
    assert my.quote == "`"
    rs = SqlDialect("redshift")
    stmts = rs.merge(
        "t", ["id", "x"], ["id"], timestamp_column="ts",
        cutoff_literal="'2024-01-01'",
    )
    assert stmts[0].startswith("DELETE FROM") and '"ts" >=' in stmts[0]
    sf = SqlDialect("snowflake")
    m = sf.merge("t", ["id", "x"], ["id"])[0]
    assert m.startswith("MERGE INTO") and "WHEN NOT MATCHED" in m
    # identifier adaptation: weird chars stripped, case folding for snowflake
    assert sf.ident("weird col!") == '"WEIRD_COL"'


def test_param_chunking():
    pg = SqlDialect("postgres")
    assert pg.rows_per_statement(10) == 6553
    assert pg.rows_per_statement(70000) == 1


def test_duckdb_lifecycle(spark, sink):
    s, con = sink
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id long, name string, val double"
    )
    # create + insert
    assert s.insert(df, "t1", pk=["id"]) == 2
    assert s.count("t1") == 2
    # merge: update one, insert one
    df2 = spark.createDataFrame(
        [(2, "b2", 9.9), (3, "c", 3.5)], "id long, name string, val double"
    )
    s.merge(df2, "t1", pk=["id"])
    rows = s.select("t1", order_by=["id"])
    assert rows == [(1, "a", 1.5), (2, "b2", 9.9), (3, "c", 3.5)]
    # schema evolution: new column arrives -> ALTER ADD COLUMN
    df3 = spark.createDataFrame(
        [(4, "d", 1.0, True)], "id long, name string, val double, flag boolean"
    )
    s.insert(df3, "t1", pk=["id"])
    cols = {d[0] for d in con.execute("SELECT * FROM t1 LIMIT 0").description}
    assert "flag" in cols
    assert s.count("t1") == 4
    # replace_table: staging + rename swap
    s.replace_table(df, "t1")
    assert s.count("t1") == 2


def _sqlite_factory(path):
    import sqlite3

    def connect():
        con = sqlite3.connect(path, timeout=60)
        return con

    return connect


def test_insert_distributed_executor_side(spark, tmp_path):
    """foreachPartition writer: every partition writes over its own
    connection; nothing is collected to the driver."""
    from bulker_spark.sinks.jdbc import SqlWarehouseSink
    from bulker_spark.sinks.sql_dialect import SqlDialect
    from bulker_spark.naming import IdentifierAdapter

    db = str(tmp_path / "wh.db")
    # sqlite quotes like postgres; duckdb dialect's '?' placeholders match
    dialect = SqlDialect("duckdb", adapter=IdentifierAdapter(max_len=63))
    sink = SqlWarehouseSink(dialect, _sqlite_factory(db), executor_side=True)
    df = spark.range(1000).selectExpr(
        "id", "concat('n', id) as name", "cast(id * 1.5 as double) as score"
    ).repartition(4)
    n = sink.insert(df, "dist")
    assert n == 1000
    rows = sink.select("dist", order_by=["id"])
    assert len(rows) == 1000 and rows[0][1] == "n0" and rows[999][2] == 1498.5


def test_insert_distributed_append_counts_delta(spark, tmp_path):
    from bulker_spark.sinks.jdbc import SqlWarehouseSink
    from bulker_spark.sinks.sql_dialect import SqlDialect
    from bulker_spark.naming import IdentifierAdapter

    db = str(tmp_path / "wh2.db")
    dialect = SqlDialect("duckdb", adapter=IdentifierAdapter(max_len=63))
    sink = SqlWarehouseSink(dialect, _sqlite_factory(db), executor_side=True)
    df = spark.range(100).selectExpr("id").repartition(2)
    assert sink.insert(df, "t") == 100
    assert sink.insert(df, "t") == 100  # second append reports ITS rows
    assert sink.count("t") == 200
