"""The 7-value scalar type lattice and conversion rules.

Re-expresses the reference's type system (see SURVEY.md §1.2) as a small
pure-Python module that drives Spark ``Column.cast`` expressions:

- lattice / typecast tree: ``/root/reference/bulkerlib/types/converter.go:12-34``
- LCA walk:                ``converter.go:137-166``
- pairwise convert rules:  ``converter.go:45-69``
- value type inference:    ``datatype.go:114-242``
- timestamp string probe:  ``datatype.go:168-215``

Spark mapping: BOOL→BooleanType, INT64→LongType, FLOAT64→DoubleType,
STRING→StringType, TIMESTAMP→TimestampType, JSON→StringType (stringified
JSON, mirroring the reference's ``stringifyObjects=true`` default).

We implement the lattice explicitly rather than relying on Spark's
``TypeCoercion`` because the reference makes different choices (e.g.
INT64⊔STRING→STRING via the tree, TIMESTAMP⊔FLOAT64→STRING).
"""

from __future__ import annotations

import datetime as _dt
import enum
import json as _json
import re
from typing import Any

from pyspark.sql import types as T


class DataType(enum.IntEnum):
    """Generic scalar types, ordered like the reference's enum."""

    UNKNOWN = 0
    BOOL = 1
    INT64 = 2
    FLOAT64 = 3
    STRING = 4
    TIMESTAMP = 5
    JSON = 6


# The typecast tree (child -> parent). STRING is the root; TIMESTAMP and
# FLOAT64 are its children; INT64 under FLOAT64; BOOL under INT64.
_PARENT: dict[DataType, DataType | None] = {
    DataType.STRING: None,
    DataType.FLOAT64: DataType.STRING,
    DataType.TIMESTAMP: DataType.STRING,
    DataType.INT64: DataType.FLOAT64,
    DataType.BOOL: DataType.INT64,
    DataType.JSON: None,  # JSON only converts to STRING explicitly
    DataType.UNKNOWN: None,
}


def _ancestors(t: DataType) -> list[DataType]:
    chain = [t]
    while _PARENT.get(chain[-1]) is not None:
        chain.append(_PARENT[chain[-1]])  # type: ignore[index]
    return chain


def common_ancestor(a: DataType, b: DataType) -> DataType:
    """Least-common-ancestor of two types over the typecast tree.

    Anything involving UNKNOWN → UNKNOWN; JSON⊔JSON → JSON; JSON⊔x → STRING;
    otherwise walk the tree (so INT64⊔TIMESTAMP → STRING, BOOL⊔FLOAT64 →
    FLOAT64, etc.).
    """
    if a == b:
        return a
    if a == DataType.UNKNOWN or b == DataType.UNKNOWN:
        return DataType.UNKNOWN
    if a == DataType.JSON or b == DataType.JSON:
        return DataType.STRING
    aa, bb = _ancestors(a), _ancestors(b)
    for t in aa:
        if t in bb:
            return t
    return DataType.STRING


def common_ancestor_many(types: list[DataType]) -> DataType:
    out = types[0]
    for t in types[1:]:
        out = common_ancestor(out, t)
    return out


# Timestamp string probing -------------------------------------------------
# Reference: length 19..35, first char '1' or '2', RFC3339Nano or
# "2006-01-02 15:04:05" layouts (datatype.go:168-215). We also accept the
# bare date layout used by the DATE special-case (abstract.go adjust).

_TS_RE = re.compile(
    r"^[12]\d{3}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(\.\d{1,9})?"
    r"(Z|[+-]\d{2}:?\d{2})?$"
)
_DATE_RE = re.compile(r"^[12]\d{3}-\d{2}-\d{2}$")

# Field names that default to TIMESTAMP when string-typed
# (converter.go:36-44).
TIMESTAMP_DEFAULT_FIELDS = frozenset({"_timestamp", "timestamp", "sentAt", "receivedAt"})


def looks_like_timestamp(s: str) -> bool:
    return 19 <= len(s) <= 35 and s[0] in "12" and bool(_TS_RE.match(s))


def looks_like_date(s: str) -> bool:
    return bool(_DATE_RE.match(s))


def parse_timestamp(s: str) -> _dt.datetime | None:
    """Parse the layouts the reference accepts; None if unparseable."""
    txt = s.strip()
    if txt.endswith("Z"):
        txt = txt[:-1] + "+00:00"
    for conv in (
        lambda v: _dt.datetime.fromisoformat(v),
        lambda v: _dt.datetime.strptime(v, "%Y-%m-%d %H:%M:%S"),
        lambda v: _dt.datetime.strptime(v, "%Y-%m-%d"),
    ):
        try:
            return conv(txt)
        except ValueError:
            continue
    return None


def infer_type(value: Any, field_name: str = "") -> DataType:
    """Infer a DataType from a parsed-JSON Python value.

    Mirrors ``datatype.go:218-242``: strings probed as timestamps, ints →
    INT64, floats → FLOAT64, bool → BOOL, dict/list → JSON, None → UNKNOWN.
    """
    if value is None:
        return DataType.UNKNOWN
    if isinstance(value, bool):
        return DataType.BOOL
    if isinstance(value, int):
        return DataType.INT64
    if isinstance(value, float):
        return DataType.FLOAT64
    if isinstance(value, _dt.datetime):
        return DataType.TIMESTAMP
    if isinstance(value, str):
        if field_name in TIMESTAMP_DEFAULT_FIELDS or looks_like_timestamp(value):
            return DataType.TIMESTAMP
        return DataType.STRING
    if isinstance(value, (dict, list)):
        return DataType.JSON
    return DataType.STRING


# Value conversion (row-level, used by the pure-python normalizer) ---------

class ConvertError(ValueError):
    pass


def convert_value(value: Any, to: DataType) -> Any:
    """Convert a Python value to the target generic type.

    Pairwise rules per ``converter.go:45-69,169-365``. Raises ConvertError
    when the value cannot be represented (caller rescues the value into the
    ``_unmapped_data`` JSON column).
    """
    if value is None:
        return None
    if to == DataType.STRING:
        if isinstance(value, bool):
            return "true" if value else "false"
        if isinstance(value, _dt.datetime):
            return to_json_iso(value)
        if isinstance(value, (dict, list)):
            return _json.dumps(value, ensure_ascii=False, separators=(",", ":"))
        if isinstance(value, float) and value.is_integer():
            return str(int(value))
        return str(value)
    if to == DataType.JSON:
        if isinstance(value, (dict, list)):
            return value
        if isinstance(value, str):
            # already-serialized JSON text (the flattener stringifies
            # arrays/kept subtrees before the value reaches conversion)
            return value
        raise ConvertError(f"cannot convert {type(value).__name__} to JSON")
    if to == DataType.BOOL:
        if isinstance(value, bool):
            return value
        if isinstance(value, (int, float)):
            return value != 0
        if isinstance(value, str):
            low = value.strip().lower()
            if low in ("true", "1"):
                return True
            if low in ("false", "0"):
                return False
        raise ConvertError(f"cannot convert {value!r} to BOOL")
    if to == DataType.INT64:
        if isinstance(value, bool):
            return 1 if value else 0
        if isinstance(value, int):
            return value
        if isinstance(value, float):
            if value.is_integer():
                return int(value)
            raise ConvertError(f"non-integral float {value!r} to INT64")
        if isinstance(value, str):
            try:
                return int(value.strip())
            except ValueError:
                try:
                    f = float(value.replace(",", "").strip())
                except ValueError:
                    raise ConvertError(f"cannot convert {value!r} to INT64") from None
                if f.is_integer():
                    return int(f)
                raise ConvertError(f"cannot convert {value!r} to INT64")
        raise ConvertError(f"cannot convert {type(value).__name__} to INT64")
    if to == DataType.FLOAT64:
        if isinstance(value, bool):
            return 1.0 if value else 0.0
        if isinstance(value, (int, float)):
            return float(value)
        if isinstance(value, str):
            try:
                return float(value.replace(",", "").strip())
            except ValueError:
                raise ConvertError(f"cannot convert {value!r} to FLOAT64") from None
        raise ConvertError(f"cannot convert {type(value).__name__} to FLOAT64")
    if to == DataType.TIMESTAMP:
        if isinstance(value, _dt.datetime):
            return value
        if isinstance(value, str):
            ts = parse_timestamp(value)
            if ts is not None:
                return ts
        raise ConvertError(f"cannot convert {value!r} to TIMESTAMP")
    raise ConvertError(f"unsupported target type {to}")


def to_json_iso(ts: _dt.datetime) -> str:
    """RFC3339 millisecond format matching the reference's JsonISO layout
    (``2006-01-02T15:04:05.000Z``, converter.go:222-231)."""
    if ts.tzinfo is not None:
        ts = ts.astimezone(_dt.timezone.utc).replace(tzinfo=None)
    return ts.strftime("%Y-%m-%dT%H:%M:%S.") + f"{ts.microsecond // 1000:03d}Z"


# Spark type mapping -------------------------------------------------------

_TO_SPARK: dict[DataType, T.DataType] = {
    DataType.BOOL: T.BooleanType(),
    DataType.INT64: T.LongType(),
    DataType.FLOAT64: T.DoubleType(),
    DataType.STRING: T.StringType(),
    DataType.TIMESTAMP: T.TimestampType(),
    DataType.JSON: T.StringType(),  # stringified JSON
    DataType.UNKNOWN: T.StringType(),
}


def to_spark_type(t: DataType) -> T.DataType:
    return _TO_SPARK[t]


def from_spark_type(t: T.DataType) -> DataType:
    if isinstance(t, T.BooleanType):
        return DataType.BOOL
    if isinstance(t, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return DataType.INT64
    if isinstance(t, (T.FloatType, T.DoubleType, T.DecimalType)):
        return DataType.FLOAT64
    if isinstance(t, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return DataType.TIMESTAMP
    if isinstance(t, T.StringType):
        return DataType.STRING
    return DataType.JSON


# SQL type names (for DDL-parity surface; generic → per-dialect SQL type,
# mirroring sql_adapter_base.go:131-145 and per-DB maps in SURVEY §1.2).
SQL_TYPE_MAP: dict[str, dict[DataType, str]] = {
    "spark": {
        DataType.BOOL: "BOOLEAN",
        DataType.INT64: "BIGINT",
        DataType.FLOAT64: "DOUBLE",
        DataType.STRING: "STRING",
        DataType.TIMESTAMP: "TIMESTAMP",
        DataType.JSON: "STRING",
        DataType.UNKNOWN: "STRING",
    },
    "postgres": {
        DataType.BOOL: "boolean",
        DataType.INT64: "bigint",
        DataType.FLOAT64: "double precision",
        DataType.STRING: "text",
        DataType.TIMESTAMP: "timestamp with time zone",
        DataType.JSON: "jsonb",
        DataType.UNKNOWN: "text",
    },
}
