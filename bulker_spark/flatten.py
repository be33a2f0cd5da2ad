"""Flattening of nested events into flat columns.

Two implementations with identical semantics:

1. :func:`flatten_event` — pure-Python, for the row-oriented ingestion path
   (ordered dicts in, first-seen key order preserved). Mirrors the
   reference's recursive flattener
   (``/root/reference/bulkerlib/implementations/flattener.go:41-151``):
   ``{a:{b:1}} → a_b:1``; joiner ``_``; empty key → ``_unnamed``; arrays and
   hinted subtrees stringified to JSON; ``omitNils`` drops nulls (default).

2. :func:`flatten_dataframe` — declarative, for DataFrames that already have
   nested StructType columns (e.g. ``spark.read.json`` output): walks
   ``df.schema`` and generates one ``col("a.b").alias("a_b")`` per leaf, so
   Catalyst sees a plain projection (column pruning + pushdown still work;
   no UDF, no shuffle).
"""

from __future__ import annotations

import json as _json
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .naming import NameTransformer

KEY_JOINER = "_"
UNNAMED = "_unnamed"


def _stringify(value: Any) -> str:
    return _json.dumps(value, ensure_ascii=False, separators=(",", ":"), default=str)


def flatten_event(
    event: dict[str, Any],
    *,
    omit_nils: bool = True,
    name_transformer: NameTransformer | None = None,
    keep_json_paths: frozenset[str] | set[str] = frozenset(),
    stringify_objects: bool = True,
) -> dict[str, Any]:
    """Flatten one parsed-JSON event into a flat insertion-ordered dict.

    ``keep_json_paths`` holds flattened paths (joined with ``_``) whose
    subtree must NOT be flattened (``__sql_type_`` hints in the reference,
    processor.go:54-95) — they are kept as JSON (stringified by default).
    """
    out: dict[str, Any] = {}
    nt = name_transformer or NameTransformer()

    def walk(prefix: str, obj: dict[str, Any]) -> None:
        for key, value in obj.items():
            name = nt.transform(key)
            if name == "":
                name = UNNAMED
            path = f"{prefix}{KEY_JOINER}{name}" if prefix else name
            if value is None:
                if not omit_nils:
                    out[path] = None
                continue
            if path in keep_json_paths:
                out[path] = _stringify(value) if stringify_objects else value
            elif isinstance(value, dict):
                if not value:
                    continue  # empty objects vanish, like the reference
                walk(path, value)
            elif isinstance(value, list):
                out[path] = _stringify(value) if stringify_objects else value
            else:
                out[path] = value

    walk("", event)
    return out


def _flat_columns(
    schema: T.StructType,
    prefix_path: list[str],
    prefix_name: str,
    nt: NameTransformer,
) -> list[tuple[str, Column]]:
    cols: list[tuple[str, Column]] = []
    for field in schema.fields:
        name = nt.transform(field.name) or UNNAMED
        flat = f"{prefix_name}{KEY_JOINER}{name}" if prefix_name else name
        path = prefix_path + [field.name]
        if isinstance(field.dataType, T.StructType):
            cols.extend(_flat_columns(field.dataType, path, flat, nt))
        else:
            ref = F.col(".".join(f"`{p}`" for p in path))
            if isinstance(field.dataType, (T.ArrayType, T.MapType)):
                ref = F.to_json(ref)
            cols.append((flat, ref))
    return cols


def flatten_dataframe(
    df: DataFrame,
    *,
    name_transformer: NameTransformer | None = None,
) -> DataFrame:
    """Flatten nested struct columns declaratively (single projection).

    Arrays/maps become JSON strings via ``to_json`` (JVM-side, codegen'd).
    Duplicate flattened names keep the first occurrence (first-seen wins,
    matching ordered-map semantics in the reference).
    """
    nt = name_transformer or NameTransformer()
    cols = _flat_columns(df.schema, [], "", nt)
    seen: dict[str, Column] = {}
    for flat, ref in cols:
        if flat not in seen:
            seen[flat] = ref.alias(flat)
    return df.select(*seen.values())
