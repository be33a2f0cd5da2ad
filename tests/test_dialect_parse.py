"""Parse gate for generated warehouse SQL: every statement template in
``sql_dialect.py`` × every dialect goes through the structural validator
(``sql_check.py``) — tokenization, quote style, paren balance, comma
shape, identifier caps, and DDL type vocabulary. DuckDB executes live
elsewhere (`test_sql_sink.py`); this is the gate for the six dialects no
test can execute, so a quoting or type-name slip cannot survive."""

import pytest

from bulker_spark.sinks.sql_check import (
    SqlCheckError,
    check_statement,
    check_statements,
    tokenize,
)
from bulker_spark.sinks.sql_dialect import _TYPE_MAPS, SqlDialect
from bulker_spark.types_lattice import DataType

DIALECTS = sorted(_TYPE_MAPS)

# a schema that exercises the sharp edges: every lattice type, a
# reserved word, a space, unicode, and a name past every length cap
COLUMNS = {
    "id": DataType.INT64,
    "select": DataType.STRING,
    "user name": DataType.STRING,
    "café": DataType.STRING,
    "is_ok": DataType.BOOL,
    "score": DataType.FLOAT64,
    "ts": DataType.TIMESTAMP,
    "payload": DataType.JSON,
    "x" * 400: DataType.STRING,
}
PK = ["id", "ts"]


@pytest.fixture(params=DIALECTS)
def d(request):
    return SqlDialect(request.param)


class TestEveryTemplateParses:
    def test_create_schema(self, d):
        check_statement(d.create_schema("name space"), d.name)

    def test_create_table(self, d):
        for ns in (None, "ns"):
            for ine in (True, False):
                check_statement(
                    d.create_table(
                        "t", COLUMNS, pk=PK, namespace=ns, if_not_exists=ine
                    ),
                    d.name,
                    ddl_types=True,
                )
        check_statement(
            d.create_table("t", COLUMNS, pk=None), d.name, ddl_types=True
        )

    def test_add_columns(self, d):
        stmts = d.add_columns("t", COLUMNS, namespace="ns")
        assert len(stmts) == len(COLUMNS)
        for s in stmts:
            check_statement(s, d.name, ddl_types=True)

    def test_drop_truncate_rename(self, d):
        check_statement(d.drop_table("t", "ns"), d.name)
        check_statement(d.truncate("t", "ns"), d.name)
        check_statement(d.rename_table("old", "new", "ns"), d.name)

    def test_insert_multi_row(self, d):
        check_statement(
            d.insert("t", list(COLUMNS), n_rows=3, namespace="ns"), d.name
        )

    def test_merge_all_shapes(self, d):
        check_statements(d.merge("t", list(COLUMNS), PK, namespace="ns"), d.name)
        # merge window (timestamp predicate) variant
        check_statements(
            d.merge(
                "t",
                list(COLUMNS),
                PK,
                timestamp_column="ts",
                cutoff_literal="'2024-01-01 00:00:00'",
            ),
            d.name,
        )
        # all-PK table: no non-pk SET clause may leave a dangling comma
        check_statements(d.merge("t", PK, PK), d.name)

    def test_scd2_statements(self, d):
        check_statement(
            d.scd2_create_table("dim", COLUMNS, PK, namespace="ns"),
            d.name,
            ddl_types=True,
        )
        check_statements(
            d.scd2_apply_statements(
                "dim",
                list(COLUMNS),
                PK,
                tracked=["score", "user name"],
                effective_literal="'2024-01-01 00:00:00'",
                staging="stg",
                namespace="ns",
            ),
            d.name,
        )


class TestValidatorCatchesDefects:
    """The gate must FAIL on the slip classes it exists for — a
    validator that passes everything is theater."""

    def test_unterminated_string(self):
        with pytest.raises(SqlCheckError, match="unterminated string"):
            check_statement("INSERT INTO t VALUES ('abc)", "postgres")

    def test_escaped_quote_is_fine(self):
        check_statement("INSERT INTO t VALUES ('it''s')", "postgres")

    def test_unterminated_identifier(self):
        with pytest.raises(SqlCheckError, match="unterminated quoted"):
            check_statement('DROP TABLE "t', "postgres")

    def test_wrong_quote_style(self):
        # the other family's quote char is not a legal character at all
        # outside string literals, so the tokenizer itself rejects it
        with pytest.raises(SqlCheckError, match="unexpected character"):
            check_statement("DROP TABLE `t`", "postgres")
        with pytest.raises(SqlCheckError, match="unexpected character"):
            check_statement('DROP TABLE "t"', "mysql")
        # …and a quote char smuggled INSIDE a quoted identifier is
        # caught by the statement-level check
        with pytest.raises(SqlCheckError, match="outside a string"):
            check_statement('DROP TABLE "we`ird"', "postgres")

    def test_unbalanced_parens(self):
        with pytest.raises(SqlCheckError, match="unbalanced"):
            check_statement('CREATE TABLE "t" ("a" bigint', "postgres")
        with pytest.raises(SqlCheckError, match="unbalanced"):
            check_statement('CREATE TABLE "t" ("a" bigint))', "postgres")

    def test_dangling_comma(self):
        with pytest.raises(SqlCheckError, match="comma"):
            check_statement('CREATE TABLE "t" ("a" bigint, )', "postgres")
        with pytest.raises(SqlCheckError, match="comma"):
            check_statement("INSERT INTO t (a,, b) VALUES (?)", "postgres")

    def test_empty_parens(self):
        with pytest.raises(SqlCheckError, match="empty parentheses"):
            check_statement("INSERT INTO t () VALUES (?)", "postgres")

    def test_unknown_type(self):
        with pytest.raises(SqlCheckError, match="unknown postgres type"):
            check_statement(
                'CREATE TABLE "t" ("a" jsonbb)', "postgres", ddl_types=True
            )
        with pytest.raises(SqlCheckError, match="unknown bigquery type"):
            check_statement(
                "ALTER TABLE `t` ADD COLUMN `a` VARCHAR",
                "bigquery",
                ddl_types=True,
            )

    def test_type_belongs_to_other_dialect(self):
        # redshift SUPER leaking into a postgres statement must fail
        with pytest.raises(SqlCheckError, match="unknown postgres type"):
            check_statement(
                'CREATE TABLE "t" ("a" super)', "postgres", ddl_types=True
            )

    def test_identifier_over_cap(self):
        long = "y" * 64
        with pytest.raises(SqlCheckError, match="length cap"):
            check_statement(f'DROP TABLE "{long}"', "postgres")

    def test_no_verb(self):
        with pytest.raises(SqlCheckError, match="SQL verb"):
            check_statement("GRANT ALL ON t", "postgres")

    def test_tokenizer_shapes(self):
        toks = tokenize(
            "MERGE INTO \"t\" USING (SELECT ? AS \"a\") s ON (1 = 1)",
            "postgres",
        )
        kinds = [k for k, _ in toks]
        assert "param" in kinds and "ident" in kinds
