"""Distributed ingestion: raw JSON events → normalized typed DataFrame.

The reference consumes events row-at-a-time from Kafka and folds a schema as
it goes (``abstract_transactional.go:439-531``). The Spark-first equivalent
is two passes over the batch:

1. **Header pass** — each partition folds a tiny partial ``BatchHeader``
   (column names + lattice type ids, no data); partials are merged on the
   driver in partition order, preserving first-seen column order. Cost: one
   scan, O(columns) driver state.

2. **Normalize pass** — ``mapInPandas`` (Arrow-batched) flattens + casts each
   event to the unified schema, rescuing uncastable values into
   ``_unmapped_data``. The output is a flat, typed DataFrame that all
   downstream operators (dedup, merge, write) consume declaratively.

For input that is *already structured* (e.g. parquet with nested structs),
:func:`normalize_struct_df` does the same thing fully JVM-side: a single
projection with ``try_cast`` + rescue, no Python in the loop.
"""

from __future__ import annotations

import json as _json
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .flatten import flatten_dataframe
from .naming import NameTransformer
from .schema import (
    UNMAPPED_DATA_COLUMN,
    BatchHeader,
    ColumnSpec,
    SchemaPolicy,
    infer_header,
    normalize_events,
    unify_with_existing,
)
from .types_lattice import DataType, from_spark_type, to_spark_type


# which path the last ingest_json call took: "jvm" (fast header + fast
# normalize), "jvm-header" (fast header, Python normalize), "python".
# Observability for tests — a silent permanent fallback would otherwise
# be invisible (correct results, 3× the cost).
last_ingest_path = "python"


def _parse_lines(lines: Iterator[str]) -> Iterator[dict[str, Any]]:
    for line in lines:
        line = line.strip()
        if line:
            yield _json.loads(line)


def infer_header_distributed(
    json_df: DataFrame,
    *,
    omit_nils: bool = True,
    case: str = "none",
    adapter=None,
) -> BatchHeader:
    """Header pass over a DataFrame with one string column of JSON events.

    Arrow-batched, never row-pickled: each partition folds its batches into
    one tiny ``(partition_id, seq, header)`` row; the driver merges them in
    (partition, batch) order so column order stays first-seen-deterministic
    — the reference's ordered-map schema growth
    (``bulkerlib/implementations/sql/batch_header.go:9-43``)."""
    from pyspark.sql import functions as F

    col = json_df.columns[0]
    with_pid = json_df.select(
        F.spark_partition_id().alias("__pid"), F.col(col).alias("__v")
    )

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # called once per partition; batches iterate in partition order
        nt = NameTransformer(case)
        seq = 0
        for pdf in batches:
            if pdf.empty:
                continue
            header = infer_header(
                _parse_lines(iter(pdf["__v"].tolist())), omit_nils=omit_nils,
                name_transformer=nt, adapter=adapter,
            )
            payload = _json.dumps(
                [
                    [s.name, int(s.data_type), s.hinted]
                    for s in header.columns.values()
                ]
            )
            yield pd.DataFrame(
                {
                    "pid": [int(pdf["__pid"].iloc[0])],
                    "seq": [seq],
                    "payload": [payload],
                }
            )
            seq += 1

    partials = sorted(
        (r["pid"], r["seq"], r["payload"])
        for r in with_pid.mapInPandas(
            fold, schema="pid int, seq int, payload string"
        ).collect()
    )
    merged = BatchHeader()
    for _, _, payload in partials:
        part = BatchHeader(
            {n: ColumnSpec(n, DataType(t), h) for n, t, h in _json.loads(payload)}
        )
        merged = merged.merge(part)
    return merged


def normalize_json_df(
    json_df: DataFrame,
    header: BatchHeader,
    *,
    omit_nils: bool = True,
    case: str = "none",
    adapter=None,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Normalize pass: JSON strings → typed rows per ``header`` schema.

    ``carry_cols`` are extra input columns copied through 1:1 beside the
    normalized rows (e.g. a pre-shuffle arrival-sequence stamp). Requires
    every input line to normalize to exactly one row — callers must have
    filtered blank/malformed lines first. A carry column whose name
    collides with a data column is dropped (the data wins)."""
    col = json_df.columns[0]
    schema = header.to_spark_schema(with_unmapped=True)
    out_cols = [f.name for f in schema.fields]
    carry = [
        c for c in carry_cols if c in json_df.columns and c not in out_cols
    ]
    if carry:
        by_name = {f.name: f for f in json_df.schema.fields}
        schema = T.StructType(
            list(schema.fields) + [by_name[c] for c in carry]
        )
    header_payload = [
        [s.name, int(s.data_type), s.hinted] for s in header.columns.values()
    ]

    def norm(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        nt = NameTransformer(case)
        hdr = BatchHeader(
            {n: ColumnSpec(n, DataType(t), h) for n, t, h in header_payload}
        )
        for pdf in batches:
            rows = list(
                normalize_events(
                    _parse_lines(iter(pdf[col].tolist())),
                    hdr,
                    omit_nils=omit_nils,
                    name_transformer=nt,
                    adapter=adapter,
                )
            )
            if carry and len(rows) != len(pdf):
                raise ValueError(
                    "carry_cols requires 1:1 normalization "
                    f"({len(pdf)} lines -> {len(rows)} rows)"
                )
            out = pd.DataFrame(
                {c: [r.get(c) for r in rows] for c in out_cols},
                columns=out_cols,
            )
            for c in carry:
                out[c] = pdf[c].to_numpy()
            yield out

    return json_df.select(col, *carry).mapInPandas(norm, schema=schema)


def ingest_json(
    spark: SparkSession,
    source: DataFrame | list[str] | list[dict] | str,
    *,
    existing_types: dict[str, DataType] | None = None,
    policy: SchemaPolicy | None = None,
    omit_nils: bool = True,
    case: str = "none",
    adapter=None,
    carry_cols: tuple[str, ...] = (),
) -> tuple[DataFrame, BatchHeader]:
    """End-to-end: events (NDJSON path, list of dicts/strings, or a
    one-string-column DataFrame) → (normalized typed DataFrame, header).

    When ``existing_types`` is given (the destination table's schema), the
    batch is unified against it: existing column types win, new columns
    append in first-seen order subject to ``policy``.
    """
    if isinstance(source, str):
        json_df = spark.read.text(source)
    elif isinstance(source, DataFrame):
        json_df = source
    else:
        lines = [
            s if isinstance(s, str) else _json.dumps(s, ensure_ascii=False)
            for s in source
        ]
        json_df = spark.createDataFrame([(x,) for x in lines], "value string")

    # JVM fast path for flat hint-free batches (ingest_fast.py): header
    # and normalize stay entirely inside Catalyst codegen — the Python
    # passes below are the fallback for nested/hinted/adapted shapes
    global last_ingest_path
    last_ingest_path = "python"
    fast = None
    if (
        case == "none"
        and omit_nils
        and (adapter is None or getattr(adapter, "case", None) == "none")
    ):
        from .ingest_fast import fast_infer_header, fast_normalize

        fast = fast_infer_header(json_df, adapter=adapter)
    if fast is not None:
        unified, _new = unify_with_existing(existing_types, fast.header, policy)
        df = fast_normalize(json_df, fast, unified, carry_cols=carry_cols)
        if df is not None:
            last_ingest_path = "jvm"
            return df, unified
        last_ingest_path = "jvm-header"
        # targets outside the proven conversion table: reuse the
        # JVM-inferred header, normalize in Python
        df = normalize_json_df(
            json_df,
            unified,
            omit_nils=omit_nils,
            case=case,
            adapter=adapter,
            carry_cols=carry_cols,
        )
        return df, unified

    header = infer_header_distributed(
        json_df, omit_nils=omit_nils, case=case, adapter=adapter
    )
    unified, _new = unify_with_existing(existing_types, header, policy)
    df = normalize_json_df(
        json_df,
        unified,
        omit_nils=omit_nils,
        case=case,
        adapter=adapter,
        carry_cols=carry_cols,
    )
    return df, unified


def normalize_struct_df(df: DataFrame, *, case: str = "none") -> DataFrame:
    """JVM-only normalize for already-structured input.

    Flattens nested structs into ``a_b`` columns (pure projection), converts
    arrays/maps to JSON strings, and leaves scalar types as-is (parquet
    already carries types). Use this path at scale — zero Python overhead,
    full codegen, pushdown-friendly.
    """
    return flatten_dataframe(df, name_transformer=NameTransformer(case))


def cast_to_existing(
    df: DataFrame, existing_types: dict[str, DataType]
) -> DataFrame:
    """Cast a flat DataFrame to an existing table's types JVM-side.

    Uses ``try_cast`` so uncastable values become NULL and their originals
    are rescued into ``_unmapped_data`` (JSON), mirroring
    ``abstract.go:469-553`` without leaving codegen.
    """
    cols = []
    rescue_entries = []
    for name in df.columns:
        if name == UNMAPPED_DATA_COLUMN:
            continue
        cur = df.schema[name].dataType
        want = existing_types.get(from_name := name)
        if want is None:
            rescue_entries.append((name, F.col(f"`{name}`")))
            continue
        target = to_spark_type(want)
        if cur == target or from_spark_type(cur) == want:
            cols.append(F.col(f"`{name}`").cast(target).alias(name))
        else:
            casted = F.col(f"`{name}`").try_cast(target)
            cols.append(casted.alias(name))
            rescue_entries.append(
                (
                    name,
                    F.when(
                        casted.isNull() & F.col(f"`{name}`").isNotNull(),
                        F.col(f"`{name}`").cast("string"),
                    ),
                )
            )
    for name in existing_types:
        if name not in df.columns:
            cols.append(F.lit(None).cast(to_spark_type(existing_types[name])).alias(name))
    if rescue_entries:
        rescue = F.to_json(
            F.struct(*[e.alias(n) for n, e in rescue_entries])
        )
        prev = (
            F.col(UNMAPPED_DATA_COLUMN)
            if UNMAPPED_DATA_COLUMN in df.columns
            else F.lit(None).cast("string")
        )
        cols.append(F.coalesce(prev, rescue).alias(UNMAPPED_DATA_COLUMN))
    elif UNMAPPED_DATA_COLUMN in df.columns:
        cols.append(F.col(UNMAPPED_DATA_COLUMN))
    return df.select(*cols)


def json_columns_to_variant(
    df: DataFrame, lattice_types: dict[str, DataType] | None
) -> DataFrame:
    """Store JSON escape-hatch columns as Spark 4 VARIANT instead of JSON
    text (SURVEY §1.2's "or VariantType on Spark 4" mapping, opted in via
    ``StreamOptions.json_as_variant``).

    Variant keeps the reference's stringify-objects *semantics* (opaque
    nested payload per column) while storing a shredded binary encoding:
    path reads (``variant_get``) skip full-text JSON parsing, and parquet
    readers prune within the column — at 100 TB the difference between
    re-parsing terabytes of JSON text per query and touching only the
    paths asked for. ``try_parse_json`` keeps malformed remnants null
    instead of failing the batch, matching the rescue discipline.

    Applies only to columns the lattice typed as JSON (plus the
    ``_unmapped_data`` rescue column) that are currently JSON text."""
    dtypes = dict(df.dtypes)
    targets = {
        name
        for name, t in (lattice_types or {}).items()
        if t == DataType.JSON
    }
    targets.add(UNMAPPED_DATA_COLUMN)
    out = df
    for name in df.columns:
        if name in targets and dtypes.get(name) == "string":
            out = out.withColumn(name, F.try_parse_json(F.col(f"`{name}`")))
    return out
