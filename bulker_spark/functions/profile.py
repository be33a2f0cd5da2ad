"""Table profiling and declarative data-quality checks.

The reference exposes COUNT(*) as its entire introspection surface
(``/root/reference/bulkerlib/implementations/sql/sql_adapter_base.go:287-297``);
a warehouse engine needs the profiling/validation tier that tools like
deequ/dbt put on top: per-column statistics in one pass, and declarative
checks (unique / non-null / accepted values / ranges) whose violations
are counted, not crashed on.

Scale shape: ``profile`` is ONE aggregation over the table — every
column's stats are computed in the same partial-aggregated pass, so the
cost is a single scan + a 1-row shuffle regardless of column count.
``run_checks`` compiles all checks into the same one-pass conditional
aggregation; only the uniqueness checks (which genuinely need a
distinct) add exchanges, and those run map-side-partial first.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    *,
    approx_distinct: bool = False,
) -> DataFrame:
    """Per-column profile: rows, nulls, null fraction, distinct count.

    One job, one scan: all per-column aggregates live in a single agg
    row which is then exploded to one output row per column. With
    ``approx_distinct`` the distinct counters are HLL++ sketches
    (constant memory per column — the 100 TB setting); exact otherwise.
    """
    cols = list(columns or df.columns)
    cnt_d = F.approx_count_distinct if approx_distinct else F.count_distinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nulls_{c}")
        )
        aggs.append(cnt_d(F.col(c)).alias(f"__dist_{c}"))
    row = df.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                F.col(f"__nulls_{c}").alias("n_nulls"),
                F.col(f"__dist_{c}").alias("n_distinct"),
            )
            for c in cols
        ]
    )
    return (
        row.select(F.explode(pairs).alias("p"))
        .select("p.column", "p.n_rows", "p.n_nulls", "p.n_distinct")
        .withColumn(
            "null_frac", F.round(F.col("n_nulls") / F.col("n_rows"), 4)
        )
    )


@dataclass
class Check:
    """One declarative expectation. ``kind`` picks the compiled form:

    - ``non_null``: column has no NULLs
    - ``unique``: column (or column list) has no duplicate values
    - ``accepted_values``: column ∈ ``values``
    - ``expression``: arbitrary boolean SQL over the row; violation when
      false
    """

    name: str
    kind: str
    column: str | Sequence[str] | None = None
    values: list | None = None
    expression: str | None = None
    extra: dict = field(default_factory=dict)


def non_null(column: str, name: str | None = None) -> Check:
    return Check(name or f"{column}_not_null", "non_null", column)


def unique(columns: str | Sequence[str], name: str | None = None) -> Check:
    cols = [columns] if isinstance(columns, str) else list(columns)
    return Check(name or f"{'_'.join(cols)}_unique", "unique", cols)


def accepted_values(column: str, values: list, name: str | None = None) -> Check:
    return Check(
        name or f"{column}_accepted", "accepted_values", column, values=values
    )


def expression(expr: str, name: str) -> Check:
    return Check(name, "expression", expression=expr)


def violation_condition(ck: Check):
    """Row-level violation predicate (True = the row violates the check).
    ``unique`` has no row-level form — it needs the aggregate."""
    if ck.kind == "non_null":
        return F.col(str(ck.column)).isNull()
    if ck.kind == "accepted_values":
        return (
            ~F.col(str(ck.column)).isin(*(ck.values or []))
            | F.col(str(ck.column)).isNull()
        )
    if ck.kind == "expression":
        return ~F.expr(str(ck.expression))
    if ck.kind == "unique":
        raise ValueError("unique has no row-level violation predicate")
    raise ValueError(f"unknown check kind {ck.kind!r}")


def run_checks(df: DataFrame, checks: Sequence[Check]) -> DataFrame:
    """Evaluate all checks; returns (check, violations, passed) rows —
    a lazy plan, nothing executes until the caller acts on it.

    Every check compiles into ONE aggregation over the table: row-level
    checks (non_null / accepted_values / expression) as conditional sums,
    uniqueness as ``count(*) - count_distinct(keys)`` in the same agg row
    (Catalyst expands the distincts; the pre-aggregation stays partial so
    only key cardinality crosses the shuffle). The 1-row result explodes
    to one output row per check."""
    aggs = []
    for ck in checks:
        if ck.kind == "unique":
            cols = [F.col(c) for c in ck.column]  # type: ignore[union-attr]
            aggs.append(
                (F.count(F.lit(1)) - F.count_distinct(*cols)).alias(ck.name)
            )
            continue
        cond = violation_condition(ck)
        aggs.append(F.sum(F.when(cond, 1).otherwise(0)).alias(ck.name))

    row = df.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(ck.name).alias("check"),
                F.col(f"`{ck.name}`").cast("long").alias("violations"),
            )
            for ck in checks
        ]
    )
    return (
        row.select(F.explode(pairs).alias("p"))
        .select("p.check", "p.violations")
        .withColumn("passed", F.col("violations") == 0)
    )
