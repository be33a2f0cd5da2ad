"""Per-batch schema inference, unification, and evolution policies.

Reference semantics (citations into ``/root/reference/``):

- per-event type inference + header: ``bulkerlib/implementations/sql/type_resolver.go:42-87``
- ``__sql_type_`` hint extraction:    ``bulkerlib/implementations/sql/processor.go:54-95``
- schema adjust / unify / rescue:     ``bulkerlib/implementations/sql/abstract.go:417-553``
- schema diff:                        ``bulkerlib/implementations/sql/table.go:200-236``
- freeze / max-columns policies:      ``bulkerlib/implementations/sql/options.go:53-63``

Spark-first design: schemas are ordered ``{column: DataType}`` dicts derived
as a *fold over events in first-seen order* (the reference's ordered-map
semantics — Spark's own ``spark.read.json`` merge would alphabetize).
Inference runs distributed (one partial header per partition, merged on the
driver in partition order — partial headers are tiny: column names + type
ids, NOT data), then a single typed pass materializes the batch.
"""

from __future__ import annotations

import json as _json
from dataclasses import dataclass, field
from typing import Any, Iterable, Iterator

from pyspark.sql import types as T

from .flatten import flatten_event
from .naming import NameTransformer
from .types_lattice import (
    ConvertError,
    DataType,
    common_ancestor,
    convert_value,
    infer_type,
    looks_like_date,
    parse_timestamp,
    to_spark_type,
)

SQL_TYPE_PREFIX = "__sql_type_"  # jitsubase/types/json.go:9
UNMAPPED_DATA_COLUMN = "_unmapped_data"  # abstract.go:23

# Map of SQL type hint strings → generic DataType (what a hint pins the
# column to; reference passes the raw DDL string through, we normalize).
_HINT_TYPES = {
    "bigint": DataType.INT64,
    "int": DataType.INT64,
    "integer": DataType.INT64,
    "double": DataType.FLOAT64,
    "double precision": DataType.FLOAT64,
    "float": DataType.FLOAT64,
    "real": DataType.FLOAT64,
    "text": DataType.STRING,
    "string": DataType.STRING,
    "varchar": DataType.STRING,
    "boolean": DataType.BOOL,
    "bool": DataType.BOOL,
    "timestamp": DataType.TIMESTAMP,
    "timestamp with time zone": DataType.TIMESTAMP,
    "timestamptz": DataType.TIMESTAMP,
    "date": DataType.TIMESTAMP,
    "json": DataType.JSON,
    "jsonb": DataType.JSON,
    # the reference DataType names themselves (datatype.go:54-71), as sent
    # in X-Jitsu-Schema headers and WithSchema options
    "int64": DataType.INT64,
    "long": DataType.INT64,
    "float64": DataType.FLOAT64,
}


def hint_to_type(sql_type: str) -> DataType:
    return _HINT_TYPES.get(sql_type.strip().lower().split("(")[0], DataType.STRING)


def extract_type_hints(event: dict[str, Any]) -> tuple[dict[str, Any], dict[str, str]]:
    """Strip ``__sql_type_<path>`` keys (recursively) and return
    (clean_event, {flattened_path: sql_type}).

    A nested object may carry ``{"__sql_type": "json"}`` meaning *this*
    subtree is pinned (processor.go:54-95). Paths use the ``_`` joiner to
    match flattened column names.
    """
    hints: dict[str, str] = {}

    def walk(obj: dict[str, Any], prefix: str) -> dict[str, Any]:
        clean: dict[str, Any] = {}
        for key, value in obj.items():
            if key == "__sql_type":
                hints[prefix] = str(value)
                continue
            if key.startswith(SQL_TYPE_PREFIX):
                path = key[len(SQL_TYPE_PREFIX):]
                full = f"{prefix}_{path}" if prefix else path
                hints[full] = str(value)
                continue
            path = f"{prefix}_{key}" if prefix else key
            if isinstance(value, dict):
                clean[key] = walk(value, path)
            else:
                clean[key] = value
        return clean

    return walk(event, ""), hints


@dataclass
class ColumnSpec:
    name: str
    data_type: DataType
    hinted: bool = False  # pinned via __sql_type_ or schema option ("Important")

    def merge(self, other: "ColumnSpec") -> "ColumnSpec":
        if self.hinted:
            return self
        if other.hinted:
            return ColumnSpec(self.name, other.data_type, True)
        return ColumnSpec(self.name, common_ancestor(self.data_type, other.data_type))


@dataclass
class BatchHeader:
    """Ordered column → spec mapping for one batch (TypesHeader analogue,
    ``batch_header.go:9-43``)."""

    columns: dict[str, ColumnSpec] = field(default_factory=dict)

    def observe(self, name: str, t: DataType, hinted: bool = False) -> None:
        cur = self.columns.get(name)
        nxt = ColumnSpec(name, t, hinted)
        if cur is None:
            self.columns[name] = nxt
        else:
            self.columns[name] = cur.merge(nxt)

    def merge(self, other: "BatchHeader") -> "BatchHeader":
        out = BatchHeader(dict(self.columns))
        for name, spec in other.columns.items():
            if name in out.columns:
                out.columns[name] = out.columns[name].merge(spec)
            else:
                out.columns[name] = spec
        return out

    def to_spark_schema(self, with_unmapped: bool = True) -> T.StructType:
        fields = [
            T.StructField(name, to_spark_type(spec.data_type), True)
            for name, spec in self.columns.items()
        ]
        if with_unmapped:
            fields.append(T.StructField(UNMAPPED_DATA_COLUMN, T.StringType(), True))
        return T.StructType(fields)


def _adapt_keys(flat: dict[str, Any], adapter) -> dict[str, Any]:
    """Apply identifier adaptation to flattened names (first-wins on
    collision, matching the reference's column-name cache semantics)."""
    if adapter is None:
        return flat
    out: dict[str, Any] = {}
    for k, v in flat.items():
        ak = adapter.adapt(k)
        if ak not in out:
            out[ak] = v
    return out


def infer_header(
    events: Iterable[dict[str, Any]],
    *,
    omit_nils: bool = True,
    name_transformer: NameTransformer | None = None,
    adapter=None,
) -> BatchHeader:
    """Fold a header over flattened events in first-seen order."""
    header = BatchHeader()
    for event in events:
        clean, hints = extract_type_hints(event)
        # infer on UNstringified values: remaining arrays / kept subtrees
        # must type as JSON (the reference stringifies the value but
        # records the JSON type, which drives jsonb/super/JSON DDL —
        # sql_adapter_base.go:117 + the §1.2 type maps); stringification
        # happens in the normalize pass
        flat = flatten_event(
            clean,
            omit_nils=omit_nils,
            name_transformer=name_transformer,
            keep_json_paths=frozenset(hints),
            stringify_objects=False,
        )
        if adapter is not None:
            hints = {adapter.adapt(k): v for k, v in hints.items()}
            flat = _adapt_keys(flat, adapter)
        for name, value in flat.items():
            if name in hints:
                header.observe(name, hint_to_type(hints[name]), hinted=True)
            else:
                header.observe(name, infer_type(value, name))
    return header


def normalize_events(
    events: Iterable[dict[str, Any]],
    header: BatchHeader,
    *,
    omit_nils: bool = True,
    name_transformer: NameTransformer | None = None,
    adapter=None,
) -> Iterator[dict[str, Any]]:
    """Second pass: flatten + cast each event to the header's types.

    Values that cannot be converted to the unified column type are rescued
    into the ``_unmapped_data`` JSON column (abstract.go:469-553) instead of
    failing the batch.
    """
    for event in events:
        clean, hints = extract_type_hints(event)
        flat = flatten_event(
            clean,
            omit_nils=omit_nils,
            name_transformer=name_transformer,
            keep_json_paths=frozenset(hints),
        )
        if adapter is not None:
            flat = _adapt_keys(flat, adapter)
        row: dict[str, Any] = {}
        unmapped: dict[str, Any] = {}
        for name, value in flat.items():
            spec = header.columns.get(name)
            if spec is None:  # frozen/capped schema: column not in table
                unmapped[name] = value
                continue
            try:
                converted = convert_value(value, spec.data_type)
                if spec.data_type == DataType.JSON and not isinstance(converted, str):
                    converted = _json.dumps(
                        converted, ensure_ascii=False, separators=(",", ":")
                    )
                row[name] = converted
            except ConvertError:
                unmapped[name] = value
        if unmapped:
            row[UNMAPPED_DATA_COLUMN] = _json.dumps(
                unmapped, ensure_ascii=False, separators=(",", ":"), default=str
            )
        yield row


# --- schema evolution against an existing table ---------------------------

@dataclass
class SchemaPolicy:
    schema_freeze: bool = False
    max_columns: int = 5000


def unify_with_existing(
    existing: dict[str, DataType] | None,
    incoming: BatchHeader,
    policy: SchemaPolicy | None = None,
) -> tuple[BatchHeader, list[str]]:
    """Merge a batch header into an existing table schema.

    Returns (unified header covering the FULL table in column order,
    new_column_names). Semantics (abstract.go:417-553):

    - existing column + incoming same name: the **existing type wins**
      (values are converted; uncastable → rescue). No ALTER COLUMN.
    - new column: appended in first-seen order, unless ``schema_freeze`` or
      the table is at ``max_columns`` — then the column is dropped from the
      header and its values land in ``_unmapped_data``.
    """
    policy = policy or SchemaPolicy()
    if existing is None:
        existing = {}
    unified = BatchHeader(
        {name: ColumnSpec(name, t, hinted=True) for name, t in existing.items()}
    )
    new_cols: list[str] = []
    ncols = len(existing)
    for name, spec in incoming.columns.items():
        if name in unified.columns:
            continue  # existing type wins; conversion happens row-side
        if policy.schema_freeze or ncols >= policy.max_columns:
            continue  # dropped → values rescued to _unmapped_data
        unified.columns[name] = spec
        new_cols.append(name)
        ncols += 1
    return unified, new_cols


def spark_schema_to_types(schema: T.StructType) -> dict[str, DataType]:
    from .types_lattice import from_spark_type

    return {
        f.name: from_spark_type(f.dataType)
        for f in schema.fields
        if f.name != UNMAPPED_DATA_COLUMN
    }


# --- date-vs-timestamp special case (abstract.go:516-525) ----------------

def adjust_string_to_timestamp(value: str) -> Any:
    """TIMESTAMP column receiving a date-looking string: parse date at
    midnight; full timestamps parse directly."""
    if looks_like_date(value):
        return parse_timestamp(value)
    return parse_timestamp(value)
