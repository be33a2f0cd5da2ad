"""Structural validation for generated warehouse SQL.

DuckDB executes live in tests, but the other six dialects
(postgres / redshift / snowflake / bigquery / mysql / clickhouse) were
string-asserted only — a quoting or type-name slip in
``sql_dialect.py`` could survive until it hit a real warehouse. This
module is the parse gate: a dialect-aware tokenizer plus shape checks
that catch the failure classes statement templating actually produces:

- unterminated string / quoted identifier, wrong quote style for the
  dialect (backticks in postgres, double quotes in mysql/bigquery)
- unbalanced parentheses
- dangling or doubled commas (``(a, )``, ``a,, b`` — the classic
  empty-join/empty-set templating bug)
- empty or over-length quoted identifiers, embedded quote characters
- unknown type names in DDL (validated against the dialect's own type
  map plus the SCD2 tracking types)
- statements that don't start with a known verb

It is deliberately NOT a SQL parser — grammar-level validation without
a per-dialect grammar would be theater. Every check here is exact: a
finding is a real defect in the generated string.
"""

from __future__ import annotations

import re

from .sql_dialect import _MAX_IDENT, _TYPE_MAPS

# dialects quoting identifiers with backticks; everyone else uses "
_BACKTICK = frozenset({"mysql", "bigquery"})

_VERBS = frozenset(
    {
        "CREATE",
        "INSERT",
        "MERGE",
        "DELETE",
        "UPDATE",
        "ALTER",
        "DROP",
        "TRUNCATE",
        "SELECT",
    }
)

# extra type spellings the generators emit outside the lattice map
_EXTRA_TYPES = {
    "clickhouse": {
        "DateTime64(6)",
        "Nullable(DateTime64(6))",
        "UInt8",
        "UInt64",
    },
}


class SqlCheckError(AssertionError):
    pass


def tokenize(sql: str, dialect: str) -> list[tuple[str, str]]:
    """(kind, text) tokens: ``str`` literals, ``ident`` quoted
    identifiers, ``word``, ``num``, ``param`` (?), ``punct``, and
    ``tmpl`` ``{staging}``-style placeholders. Raises
    :class:`SqlCheckError` on an unterminated literal/identifier or a
    character no SQL statement of ours may contain."""
    iq = "`" if dialect in _BACKTICK else '"'
    out: list[tuple[str, str]] = []
    i, n = 0, len(sql)
    while i < n:
        ch = sql[i]
        if ch in " \t\n":
            i += 1
        elif ch == "'":
            j = i + 1
            while True:
                j = sql.find("'", j)
                if j < 0:
                    raise SqlCheckError(f"unterminated string at {i}: {sql[i:i+40]!r}")
                if j + 1 < n and sql[j + 1] == "'":
                    j += 2  # doubled-quote escape
                    continue
                break
            out.append(("str", sql[i : j + 1]))
            i = j + 1
        elif ch == iq:
            j = sql.find(iq, i + 1)
            if j < 0:
                raise SqlCheckError(
                    f"unterminated quoted identifier at {i}: {sql[i:i+40]!r}"
                )
            out.append(("ident", sql[i + 1 : j]))
            i = j + 1
        elif ch == "{":
            j = sql.find("}", i + 1)
            if j < 0:
                raise SqlCheckError(f"unterminated template at {i}")
            out.append(("tmpl", sql[i : j + 1]))
            i = j + 1
        elif ch == "?":
            out.append(("param", "?"))
            i += 1
        elif ch.isdigit():
            m = re.match(r"\d+(\.\d+)?", sql[i:])
            out.append(("num", m.group(0)))
            i += len(m.group(0))
        elif ch.isalpha() or ch == "_":
            m = re.match(r"[A-Za-z_][A-Za-z0-9_]*", sql[i:])
            out.append(("word", m.group(0)))
            i += len(m.group(0))
        elif ch in "(),.=<>+-*/!":
            out.append(("punct", ch))
            i += 1
        else:
            raise SqlCheckError(f"unexpected character {ch!r} at {i} in {sql[i:i+40]!r}")
    return out


def _dialect_types(dialect: str) -> set[str]:
    base = {t.upper() for t in _TYPE_MAPS[dialect].values()}
    base |= {t.upper() for t in _EXTRA_TYPES.get(dialect, ())}
    return base


def _normalize_type(words: list[str]) -> str:
    """Join the word/num/punct run that follows a column identifier in
    DDL back into one type spelling, e.g. ``character varying(65535)``."""
    s = ""
    for kind, text in words:
        if kind == "word" and s and not s.endswith("("):
            s += " "
        s += text
    return s


def check_statement(sql: str, dialect: str, *, ddl_types: bool = False) -> None:
    """Raise :class:`SqlCheckError` on any structural defect. With
    ``ddl_types`` the ``ident TYPE`` pairs inside the top-level column
    list are validated against the dialect's type vocabulary."""
    toks = tokenize(sql, dialect)
    if not toks or toks[0][0] != "word" or toks[0][1].upper() not in _VERBS:
        raise SqlCheckError(f"statement does not start with a SQL verb: {sql[:60]!r}")

    # the wrong-quote-style check: the other dialect family's quote
    # character may only appear inside string literals
    other = '"' if dialect in _BACKTICK else "`"
    for kind, text in toks:
        if kind in ("word", "ident") and other in text:
            raise SqlCheckError(
                f"{other!r} outside a string literal in a {dialect} statement"
            )

    depth = 0
    prev = ("", "")
    for kind, text in toks:
        if (kind, text) == ("punct", "("):
            depth += 1
        elif (kind, text) == ("punct", ")"):
            depth -= 1
            if depth < 0:
                raise SqlCheckError(f"unbalanced ')' in {sql[:60]!r}")
            if prev == ("punct", ","):
                raise SqlCheckError(f"dangling comma before ')' in {sql[:80]!r}")
            if prev == ("punct", "("):
                raise SqlCheckError(f"empty parentheses in {sql[:80]!r}")
        elif (kind, text) == ("punct", ","):
            if prev == ("punct", ",") or prev == ("punct", "("):
                raise SqlCheckError(f"misplaced comma in {sql[:80]!r}")
        if kind == "ident":
            if not text:
                raise SqlCheckError("empty quoted identifier")
            if len(text) > _MAX_IDENT[dialect]:
                raise SqlCheckError(
                    f"identifier over {dialect} length cap: {text[:40]!r}…"
                )
        prev = (kind, text)
    if depth != 0:
        raise SqlCheckError(f"unbalanced '(' in {sql[:60]!r}")
    if prev == ("punct", ","):
        raise SqlCheckError(f"statement ends with a comma: {sql[-60:]!r}")

    if ddl_types:
        _check_ddl_types(toks, dialect, sql)


def _check_ddl_types(toks: list[tuple[str, str]], dialect: str, sql: str) -> None:
    """Validate every ``"col" TYPE`` pair in the depth-1 column list of
    a CREATE TABLE / the type in ADD COLUMN."""
    types = _dialect_types(dialect)
    upper_words = [t.upper() for k, t in toks if k == "word"]
    if upper_words[:2] == ["ALTER", "TABLE"]:
        # ADD COLUMN <ident> <type...> — the type is the tail run after
        # the first identifier that follows the COLUMN keyword
        for i, (kind, text) in enumerate(toks):
            if kind == "word" and text.upper() == "COLUMN":
                rest = toks[i + 1 :]
                if not rest or rest[0][0] != "ident":
                    raise SqlCheckError(f"ADD COLUMN without identifier: {sql!r}")
                spelled = _normalize_type(rest[1:])
                if spelled.upper() not in types:
                    raise SqlCheckError(
                        f"unknown {dialect} type {spelled!r} in {sql[:80]!r}"
                    )
                return
        raise SqlCheckError(f"ALTER without COLUMN clause: {sql[:80]!r}")
    target_depth = 1  # CREATE TABLE column list
    depth = 0
    i = 0
    while i < len(toks):
        kind, text = toks[i]
        if (kind, text) == ("punct", "("):
            depth += 1
        elif (kind, text) == ("punct", ")"):
            depth -= 1
        elif kind == "ident" and depth == target_depth:
            # gather the type run: words/nums/parens until , ) or EOS
            j = i + 1
            run: list[tuple[str, str]] = []
            inner = 0
            while j < len(toks):
                k2, t2 = toks[j]
                if inner == 0 and (k2, t2) in (("punct", ","), ("punct", ")")):
                    break
                if (k2, t2) == ("punct", "("):
                    inner += 1
                elif (k2, t2) == ("punct", ")"):
                    inner -= 1
                run.append((k2, t2))
                j += 1
            if run and run[0][0] == "word" and run[0][1].upper() not in (
                "PRIMARY",
            ):
                spelled = _normalize_type(run)
                if spelled.upper() not in types:
                    raise SqlCheckError(
                        f"unknown {dialect} type {spelled!r} in {sql[:80]!r}"
                    )
            i = j - 1
        i += 1


def check_statements(
    statements: list[str] | str, dialect: str, *, ddl_types: bool = False
) -> None:
    if isinstance(statements, str):
        statements = [statements]
    for s in statements:
        check_statement(s, dialect, ddl_types=ddl_types)
