"""SQL-warehouse writer: DataFrame → JDBC/DBAPI destination via dialect SQL.

Production path (real cluster): rows flow **executor-side** — each partition
opens one connection, issues chunked multi-row statements (param-limit aware,
``postgres.go:396``), and commits per partition; the tmp-table + swap
discipline mirrors ``abstract_transactional.go:152-206``:

    load:   CREATE staging → INSERT rows (executors) → single txn:
            ensure table / ALTER ADD COLUMN → merge/copy from staging → drop

Test path (this environment): DuckDB via DBAPI on the driver with the same
generated SQL, validating statement semantics against a real SQL engine.
"""

from __future__ import annotations

import datetime as _dt
from typing import Any, Callable

from pyspark.sql import DataFrame

from ..schema import UNMAPPED_DATA_COLUMN
from ..types_lattice import DataType, from_spark_type
from .sql_dialect import SqlDialect


def df_generic_schema(df: DataFrame) -> dict[str, DataType]:
    return {f.name: from_spark_type(f.dataType) for f in df.schema.fields}


class SqlWarehouseSink:
    """Writes DataFrames into a DBAPI-compatible SQL warehouse using
    dialect-generated statements (the reference's per-DB load paths)."""

    def __init__(
        self,
        dialect: SqlDialect,
        connect: Callable[[], Any],
        *,
        executor_side: bool = False,
    ):
        self.dialect = dialect
        self.connect = connect
        self.executor_side = executor_side

    # -- schema management (table_helper.go:128-236 EnsureTable) -----------
    def table_columns(self, con, table: str) -> dict[str, str] | None:
        try:
            cur = con.execute(f"SELECT * FROM {self.dialect.ident(table)} LIMIT 0")
            return {d[0]: str(d[1]) for d in cur.description}
        except Exception:
            return None

    def ensure_table(
        self,
        con,
        table: str,
        schema: dict[str, DataType],
        pk: list[str] | None = None,
    ) -> None:
        existing = self.table_columns(con, table)
        if existing is None:
            con.execute(self.dialect.create_table(table, schema, pk))
            return
        adapter = self.dialect.adapter
        new_cols = {
            c: t for c, t in schema.items() if adapter.adapt(c) not in existing
        }
        for stmt in self.dialect.add_columns(table, new_cols):
            con.execute(stmt)

    # -- loads --------------------------------------------------------------
    def _rows(self, df: DataFrame) -> tuple[list[str], list[tuple]]:
        cols = [c for c in df.columns if c != UNMAPPED_DATA_COLUMN]
        data = [
            tuple(_py(r[c]) for c in cols) for r in df.select(*cols).collect()
        ]
        return cols, data

    def insert(self, df: DataFrame, table: str, pk: list[str] | None = None) -> int:
        """Bulk append with param-limit chunking."""
        if self.executor_side:
            return self.insert_distributed(df, table, pk)
        cols, data = self._rows(df)
        con = self.connect()
        self.ensure_table(con, table, df_generic_schema(df), pk)
        chunk = self.dialect.rows_per_statement(len(cols))
        n = 0
        for i in range(0, len(data), chunk):
            batch = data[i : i + chunk]
            sql = self.dialect.insert(table, cols, n_rows=len(batch))
            flat = [v for row in batch for v in row]
            con.execute(sql, flat)
            n += len(batch)
        _commit(con)
        return n

    def insert_distributed(
        self, df: DataFrame, table: str, pk: list[str] | None = None
    ) -> int:
        """The scale path: ``foreachPartition`` — each executor partition
        opens its own connection via the (picklable) factory and streams
        param-limit-chunked ``executemany`` batches; no row ever touches
        the driver. The DDL (table ensure) stays driver-side — exactly the
        reference's split between the table-helper lock and the load."""
        con = self.connect()
        self.ensure_table(con, table, df_generic_schema(df), pk)
        _commit(con)
        pre = self.count(table)

        cols = [c for c in df.columns if c != UNMAPPED_DATA_COLUMN]
        sql = self.dialect.insert(table, cols, n_rows=1)
        chunk = max(self.dialect.rows_per_statement(len(cols)), 1)
        connect = self.connect  # capture the factory, not self (picklable)

        def write_partition(rows) -> None:
            pcon = connect()
            cur = pcon.cursor() if hasattr(pcon, "cursor") else pcon
            buf: list[tuple] = []
            for r in rows:
                buf.append(tuple(_py(r[c]) for c in cols))
                if len(buf) >= chunk:
                    cur.executemany(sql, buf)
                    buf.clear()
            if buf:
                cur.executemany(sql, buf)
            _commit(pcon)
            try:
                pcon.close()
            except Exception:
                pass

        df.select(*cols).foreachPartition(write_partition)
        # the executors did the writing; rows written = table growth
        return self.count(table) - pre

    def merge(self, df: DataFrame, table: str, pk: list[str]) -> int:
        """Row-batch upsert via the dialect's merge strategy."""
        cols, data = self._rows(df)
        con = self.connect()
        self.ensure_table(con, table, df_generic_schema(df), pk)
        stmts = self.dialect.merge(table, cols, pk)
        n = 0
        for row in data:
            for stmt in stmts:
                con.execute(stmt, list(row))
            n += 1
        _commit(con)
        return n

    def replace_table(self, df: DataFrame, table: str) -> int:
        """Atomic swap: load into staging, rename over the target
        (sql_adapter_base.go:708-740)."""
        con = self.connect()
        staging = f"{table}__staging"
        con.execute(self.dialect.drop_table(staging))
        _commit(con)
        n = self.insert(df, staging)
        con = self.connect()
        con.execute(self.dialect.drop_table(table))
        con.execute(self.dialect.rename_table(staging, table))
        _commit(con)
        return n

    def select(self, table: str, order_by: list[str] | None = None) -> list[tuple]:
        con = self.connect()
        sql = f"SELECT * FROM {self.dialect.ident(table)}"
        if order_by:
            sql += " ORDER BY " + ", ".join(
                self.dialect.ident(c) for c in order_by
            )
        return con.execute(sql).fetchall()

    def count(self, table: str) -> int:
        con = self.connect()
        return con.execute(
            f"SELECT count(*) FROM {self.dialect.ident(table)}"
        ).fetchone()[0]


def _py(v: Any) -> Any:
    if isinstance(v, _dt.datetime) and v.tzinfo is not None:
        return v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
    return v


def _commit(con) -> None:
    try:
        con.commit()
    except Exception:
        pass
