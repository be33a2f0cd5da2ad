"""Physical-plan audit helpers: assert the plan properties that matter at
100 TB — filter pushdown to the parquet scan, column pruning, broadcast
joins for small dims, bounded shuffle counts, whole-stage codegen coverage.

These make scale regressions test-detectable: an operator that silently
loses its pushdown or turns a broadcast join into a sort-merge join fails
the audit in CI, long before it fails on a cluster.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # same as df.explain()
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters lists from every parquet scan in the plan."""
    txt = explain_str(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", txt)


def read_schemas(df: DataFrame) -> list[str]:
    txt = explain_str(df)
    return re.findall(r"ReadSchema: struct<([^>]*)>", txt)


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    return any(fragment in f for f in pushed_filters(df))


def pruned_to(df: DataFrame, max_columns: int) -> bool:
    """True if every scan reads at most ``max_columns`` columns."""
    schemas = read_schemas(df)
    return bool(schemas) and all(
        len([c for c in s.split(",") if ":" in c]) <= max_columns for s in schemas
    )


def broadcast_join_count(df: DataFrame) -> int:
    return explain_str(df, "simple").count("BroadcastHashJoin")


def sortmerge_join_count(df: DataFrame) -> int:
    return explain_str(df, "simple").count("SortMergeJoin")


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges (excluding broadcast exchanges)."""
    txt = explain_str(df, "simple")
    return len(re.findall(r"Exchange (?:hash|range|Single)", txt))


def codegen_stage_count(df: DataFrame) -> int:
    """Number of whole-stage-codegen subtrees. AQE wraps the unexecuted
    plan and reports 0, so codegen is counted with AQE off for the
    duration of the explain."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        # fresh QueryExecution — the original caches its AQE-wrapped plan
        m = re.search(
            r"Found (\d+) WholeStageCodegen subtrees",
            explain_str(df.select("*"), "codegen"),
        )
        return int(m.group(1)) if m else 0
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def exchange_output_columns(df: DataFrame) -> list[list[str]]:
    """Column-name lists carried by every shuffle exchange in the plan —
    the precise form of the "text never crosses a shuffle" claim. Each
    inner list holds the bare attribute names (``doc_id``, ``wh`` — the
    ``#exprId`` suffix and type tag stripped) of one ``Exchange`` node's
    input, read from the formatted explain. Broadcast exchanges are
    excluded: a broadcast of the slim side is exactly the cheap path the
    rebuild plans choose when it fits."""
    txt = explain_str(df)
    out: list[list[str]] = []
    for m in re.finditer(
        r"\(\d+\) Exchange\b[\s\S]*?Input \[\d+\]: \[([^\]]*)\]", txt
    ):
        cols = [
            c.strip().split("#", 1)[0]
            for c in m.group(1).split(",")
            if c.strip()
        ]
        out.append(cols)
    return out


def has_partial_aggregate(df: DataFrame) -> bool:
    """Map-side combine present (partial_* functions below the exchange)."""
    return "partial_" in explain_str(df, "simple")


def audit_report(df: DataFrame) -> dict:
    """One-shot summary used by tests and by bench diagnostics."""
    return {
        "pushed_filters": pushed_filters(df),
        "read_schemas": read_schemas(df),
        "broadcast_joins": broadcast_join_count(df),
        "sortmerge_joins": sortmerge_join_count(df),
        "exchanges": exchange_count(df),
        "codegen_stages": codegen_stage_count(df),
    }
