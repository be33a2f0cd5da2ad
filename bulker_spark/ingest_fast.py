"""JVM fast path for JSON ingestion of FLAT events — zero Python in the
hot loop.

The general ingest path (:mod:`.ingest`) runs two Arrow/Python passes
(header inference, normalize) because the reference's flatten/lattice
semantics (``abstract_transactional.go:439-531``) are value-dependent and
recursive. For the overwhelmingly common shape — flat JSON objects with
scalar/array values, no ``__sql_type_*`` hints, no identifier adaptation —
every rule is expressible as JVM Catalyst expressions over Spark 4's
variant/JSON primitives, which keeps the whole batch inside whole-stage
codegen. At 100 TB the Python passes are the ingest bottleneck; this path
removes them entirely for the telemetry/CDC shape that dominates there.

Three JVM scans replace (JVM validity + 2 Python passes):

1. **Key discovery** — ``explode(json_object_keys)`` + ``min(arrival)``
   per key: first-seen column order, identical to the Python header's
   (partition, batch)-ordered merge. Also detects ineligible shapes
   (non-object lines, duplicate keys) in the same aggregation.
2. **Typing** — per key, a ``collect_set`` of per-row lattice type ids
   derived from ``schema_of_variant`` (string-vs-number) plus the
   ``from_json(.. map<string,string>)`` literal (int-vs-float: the raw
   text distinguishes ``2`` from ``2.0`` where variant types both as
   DECIMAL(p,0)). The driver folds the tiny sets through the REAL
   :func:`types_lattice.common_ancestor_many` — the merge lattice is
   never re-implemented.
3. **Normalize** — one projection: per-column conversions from the map
   literal (+ variant originals for the rescue blob), `cast_to_existing`
   semantics inline (uncastable → ``_unmapped_data``).

Eligibility is checked per batch; anything outside the proven envelope
falls back to the Python path (same results, slower):

- flat objects only (any nested OBJECT value → fallback),
- ``case="none"``, no adapter, ``omit_nils=True``, no type hints,
- identifier-safe keys (``[A-Za-z_][A-Za-z0-9_]*``), no duplicate keys,
- per-column (target type, observed member types) must be in the
  conversion table below; notably a STRING/JSON target with numeric or
  boolean members falls back (Python's ``str(float)`` and JVM decimal
  rendering disagree on scientific notation).

Known benign divergence (documented, pinned by tests): the
``_unmapped_data`` rescue blob orders keys by column order (JVM struct)
rather than per-event key order, and renders exotic scientific-notation
floats in JVM form (``1.5E300`` vs ``1.5e+300``). JSON object key order
and float spelling are not semantically meaningful; the equivalence
property test compares rescue blobs parsed, not textually.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .schema import (
    UNMAPPED_DATA_COLUMN,
    BatchHeader,
    ColumnSpec,
)
from .types_lattice import (
    TIMESTAMP_DEFAULT_FIELDS,
    DataType,
    common_ancestor_many,
)

# identifier-safe JSON keys: anything else needs NameTransformer/adapter
# treatment or json-path escaping — Python path handles those
_SAFE_KEY = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")

# looks_like_timestamp as a Java regex (types_lattice._TS_RE verbatim)
_TS_RLIKE = (
    r"^[12]\d{3}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(\.\d{1,9})?"
    r"(Z|[+-]\d{2}:?\d{2})?$"
)

# per-row lattice ids (collect_set payload). 0 = absent/null (ignored),
# 7 = nested object (forces fallback), 8 = array that may contain floats
# (floats/decimals anywhere in its schema, or VARIANT/OBJECT elements
# that can hide one: types as JSON but its JVM string rendering respells
# floats — e.g. Jackson writes 1e7 as 1.0E7 where Python keeps
# 10000000.0 — so normalize falls back) — the rest map to DataType
# values.
_ABSENT, _OBJECT, _FLOATY_ARRAY = 0, 7, 8
# 9 = ambiguous numeric literal (DECIMAL(19,0)): could be either a
# >Long.MAX integer id (9300000000000000000 — typing it FLOAT64 would
# silently round low-order digits) or a 19-digit ``x.0`` float — only
# the raw text disambiguates, so the batch takes the Python path
_AMBIG_NUM = 9

# conversion table: target lattice type -> member ids the JVM normalize
# can convert with EXACT convert_value() semantics (incl. rescue)
_CONVERTIBLE: dict[DataType, frozenset[int]] = {
    DataType.BOOL: frozenset({int(DataType.BOOL)}),
    DataType.INT64: frozenset(
        {int(DataType.BOOL), int(DataType.INT64), int(DataType.FLOAT64)}
    ),
    DataType.FLOAT64: frozenset(
        {int(DataType.BOOL), int(DataType.INT64), int(DataType.FLOAT64)}
    ),
    DataType.STRING: frozenset(
        {int(DataType.STRING), int(DataType.TIMESTAMP)}
    ),
    DataType.TIMESTAMP: frozenset(
        {int(DataType.STRING), int(DataType.TIMESTAMP)}
    ),
    DataType.JSON: frozenset({int(DataType.JSON)}),
}


@dataclass
class FastBatch:
    """Key discovery + typing result carried between the fast passes."""

    keys: list[str]  # first-seen order
    members: dict[str, set[int]]  # observed lattice ids per key
    header: BatchHeader


def _is_json_float(sv):
    """Did this variant number come from a FLOAT literal? The variant
    parser types JSON ints as BIGINT (or DECIMAL(p,0) once past the long
    range), and float literals as DOUBLE or DECIMAL — including
    DECIMAL(p,0) for ``x.0`` spellings, whose precision is necessarily
    ≤ 19 (a longer integral part would have parsed the INT spelling as
    DECIMAL too, but 2.0-style floats in real data are small). The one
    ambiguity — a >19-digit float spelled with ``.0`` — classifies as
    INT like Python's ``int(x)`` would overflow anyway; documented.

    DECIMAL(19,0) is NOT classified here: integer literals in
    (2^63, 10^19) — uint64-style ids — also parse as DECIMAL(19,0), and
    only the raw text tells them apart from a 19-digit ``x.0`` float.
    See :func:`_is_ambiguous_num`, which routes them to the Python path
    instead of silently rounding an id through a double."""
    scale = F.regexp_extract(sv, r"^DECIMAL\(\d+,(\d+)\)$", 1)
    prec = F.regexp_extract(sv, r"^DECIMAL\((\d+),", 1)
    return sv.isin("DOUBLE", "FLOAT") | (
        sv.startswith("DECIMAL")
        & ((scale != "0") | (prec.cast("int") <= 18))
    )


def _is_ambiguous_num(sv):
    """DECIMAL(19,0): either a >Long.MAX integer or a ``.0``-spelled
    19-digit float — undecidable from the variant schema alone."""
    return sv == "DECIMAL(19,0)"


def _lattice_id_expr(key_col, sv, sstr):
    """Per-row lattice type id of one value: ``key_col`` the key (for the
    timestamp-default field names), ``sv`` its variant schema string,
    ``sstr`` its string rendering (used only for STRING values, where it
    equals the raw content)."""
    string_id = F.when(
        key_col.isin(*TIMESTAMP_DEFAULT_FIELDS)
        | (F.length(sstr).between(19, 35) & sstr.rlike(_TS_RLIKE)),
        F.lit(int(DataType.TIMESTAMP)),
    ).otherwise(F.lit(int(DataType.STRING)))
    number_id = (
        F.when(_is_ambiguous_num(sv), F.lit(_AMBIG_NUM))
        .when(_is_json_float(sv), F.lit(int(DataType.FLOAT64)))
        .otherwise(F.lit(int(DataType.INT64)))
    )
    return (
        F.when(sv.isNull() | (sv == "VOID"), F.lit(_ABSENT))
        .when(sv == "BOOLEAN", F.lit(int(DataType.BOOL)))
        .when(sv == "STRING", string_id)
        .when(
            sv.startswith("ARRAY"),
            # a float ANYWHERE in the array subtree means the JVM string
            # rendering may respell it; VARIANT (heterogeneous arrays,
            # e.g. [false, 1e7]) and OBJECT elements can hide one, so
            # they force the same fallback
            F.when(
                sv.rlike("DECIMAL|DOUBLE|FLOAT|VARIANT|OBJECT"),
                F.lit(_FLOATY_ARRAY),
            ).otherwise(F.lit(int(DataType.JSON))),
        )
        .when(sv.startswith("OBJECT"), F.lit(_OBJECT))
        .otherwise(number_id)  # BIGINT / DECIMAL / DOUBLE / FLOAT
    )


def fast_infer_header(json_df: DataFrame, adapter=None) -> FastBatch | None:
    """Passes 1+2 fused: key discovery AND typing in ONE scan — explode
    the variant-map entries, group by key, aggregate (first-seen stamp,
    observed-type set, ineligibility flags) together. None = ineligible.

    ``adapter``: an IdentifierAdapter is tolerated as long as it is an
    IDENTITY on every discovered key (the engine enables adaptation by
    default, but telemetry keys are already identifier-safe — checked
    per key after discovery, falling back when any key would change)."""
    col0 = json_df.columns[0]
    base = json_df.select(
        F.col(col0).alias("__v"), F.monotonically_increasing_id().alias("__s")
    )
    # ONE parse per line: the variant map gives per-key variants with
    # JSON types preserved — BIGINT vs DECIMAL/DOUBLE distinguishes int
    # from float literals (see _is_json_float), and string values render
    # back verbatim for the timestamp probe
    mv = F.from_json(F.col("__v"), "map<string,variant>")
    # keys observed per row = doc-ordered keys with NON-NULL values: the
    # Python header only sees keys omit_nils kept, and first-seen ORDER
    # follows that (a key null in its first rows is first seen at its
    # first non-null row)
    nn = F.map_filter(mv, lambda _k, v: ~F.is_variant_null(v))
    rows = base.select(
        F.posexplode_outer(nn).alias("p", "k", "var"),
        F.col("__s"),
        mv.isNull().alias("nonobj"),
        # the variant-map parse KEEPS duplicate keys — dict semantics
        # (json.loads, last wins) differ from what the map lookups would
        # read, so duplicates fall back to the Python path
        (
            F.size(F.map_keys(mv))
            != F.size(F.array_distinct(F.map_keys(mv)))
        ).alias("dup"),
    )
    sstr = F.try_variant_get(F.col("var"), "$", "string")
    agg = (
        rows.groupBy("k")
        .agg(
            # first-seen = (arrival row, position WITHIN the row): two
            # keys first seen in the same document must keep document
            # order, which is how the Python header folds them
            F.min(F.struct(F.col("__s"), F.col("p"))).alias("sp"),
            F.collect_set(
                _lattice_id_expr(
                    F.col("k"), F.schema_of_variant(F.col("var")), sstr
                )
            ).alias("ids"),
            F.max("nonobj").alias("nonobj"),
            F.max("dup").alias("dup"),
        )
        .collect()
    )
    members: dict[str, set[int]] = {}
    ordered = []
    for r in agg:
        if bool(r["dup"]):
            return None
        if r["k"] is None:
            # explode_outer null-entry rows: empty/all-null objects land
            # here harmlessly; non-object lines set the flag
            if bool(r["nonobj"]):
                return None
            continue
        ordered.append((r["sp"]["__s"], r["sp"]["p"], r["k"]))
        members[r["k"]] = {int(x) for x in r["ids"]} - {_ABSENT}
    keys = [k for _s, _p, k in sorted(ordered)]
    if not keys:
        return None  # empty batch / all-empty objects: let Python decide
    for k in keys:
        if k.startswith("__sql_type") or not _SAFE_KEY.match(k):
            return None
        if adapter is not None and adapter.adapt(k) != k:
            return None
    header = BatchHeader()
    for k in keys:
        ids = members[k]
        if _OBJECT in ids:
            return None  # nested object → flatten semantics → Python path
        if _AMBIG_NUM in ids:
            return None  # DECIMAL(19,0): int-vs-float undecidable → Python
        if not ids:
            continue  # all values null: omit_nils drops the column
        header.observe(
            k,
            common_ancestor_many(
                [
                    DataType(int(DataType.JSON) if x == _FLOATY_ARRAY else x)
                    for x in sorted(ids)
                ]
            ),
        )
    if not header.columns:
        return None
    return FastBatch(keys=keys, members=members, header=header)


def _ts_parse(col):
    """parse_timestamp's layout chain (ISO incl. offsets and space
    separator, bare date) as JVM try_to_timestamp calls."""
    s = F.trim(col)
    return F.coalesce(
        F.try_to_timestamp(s),
        F.try_to_timestamp(s, F.lit("yyyy-MM-dd")),
    )


def fast_normalize(
    json_df: DataFrame,
    fb: FastBatch,
    unified: BatchHeader,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame | None:
    """Pass 3: one JVM projection to the unified schema. None = some
    (target, members) pair is outside the proven conversion table —
    caller falls back to the Python normalize with the same header."""
    batch_keys = set(fb.keys)
    observed = {k for k, ids in fb.members.items() if ids}
    # a batch column dropped by schema policy (freeze/max_columns) must be
    # rescued per-row with flatten-order semantics → Python path
    if any(k in observed and k not in unified.columns for k in fb.keys):
        return None
    for name, spec in unified.columns.items():
        ids = fb.members.get(name, set())
        allowed = _CONVERTIBLE.get(spec.data_type)
        if allowed is None or not ids <= allowed:
            if ids:  # column absent from batch is always fine (null fill)
                return None

    col0 = json_df.columns[0]
    out_cols = [f.name for f in unified.to_spark_schema(False).fields]
    carry = [
        c for c in carry_cols if c in json_df.columns and c not in out_cols
    ]
    # one variant parse per line; the raw-literal string map is parsed
    # ONLY when a JSON (array) column needs its exact source rendering
    # (to_json(variant) would respell 2.0 as 2 — Python keeps 2.0)
    needs_literal = any(
        (
            spec.data_type == DataType.JSON
            # FLOAT64 with float-literal members: variant stores small
            # float literals as DECIMAL, which cannot represent -0.0 —
            # the raw literal keeps the sign json.loads would
            or (
                spec.data_type == DataType.FLOAT64
                and int(DataType.FLOAT64) in fb.members.get(name, set())
            )
        )
        and fb.members.get(name)
        for name, spec in unified.columns.items()
    )
    mv = F.from_json(F.col(col0), "map<string,variant>")
    work_cols = [mv.alias("__mv")]
    if needs_literal:
        work_cols.append(
            F.from_json(F.col(col0), "map<string,string>").alias("__m")
        )
    work = json_df.select(*work_cols, *[F.col(c) for c in carry])

    exprs = []
    rescue_entries = []
    for name, spec in unified.columns.items():
        ids = fb.members.get(name, set())
        target = spec.data_type
        spark_t = unified.to_spark_schema(False)[name].dataType
        if not ids:  # not in batch (or all-null): null-fill
            exprs.append(F.lit(None).cast(spark_t).alias(name))
            continue
        var = F.element_at(F.col("__mv"), name)
        sv = F.schema_of_variant(var)
        present = var.isNotNull() & ~F.is_variant_null(var)
        if target == DataType.BOOL:
            # members are BOOL only: direct variant cast
            exprs.append(F.try_variant_get(var, "$", "boolean").alias(name))
        elif target == DataType.STRING:
            # members are strings/timestamp-strings: content verbatim
            exprs.append(F.try_variant_get(var, "$", "string").alias(name))
        elif target == DataType.JSON:
            # members are arrays: the raw map literal preserves the
            # source float spelling to_json(variant) would lose
            exprs.append(F.col("__m").getItem(name).alias(name))
        elif target == DataType.FLOAT64:
            # bool→1.0/0.0, int→float, float→float: all one variant cast.
            # Float-literal members additionally read the raw literal
            # first: variant's DECIMAL representation drops -0.0's sign
            # (decimals have no signed zero); the literal cast preserves
            # it, and null-casts (true/false members) fall through.
            d = F.try_variant_get(var, "$", "double")
            if int(DataType.FLOAT64) in ids:
                d = F.coalesce(
                    F.col("__m").getItem(name).try_cast("double"), d
                )
            exprs.append(d.alias(name))
        elif target == DataType.INT64:
            d = F.try_variant_get(var, "$", "double")
            integral = (
                d.isNotNull()
                & (d == F.floor(d))
                & (F.abs(d) <= F.lit(9.2e18))
            )
            e = F.when(
                # float literal: integral → cast (int(2.0) == 2), else
                # null → rescue (convert_value raises on 2.5)
                _is_json_float(sv),
                F.when(integral, d.cast("long")),
            ).otherwise(
                # bool → 1/0, int → itself, huge DECIMAL(p,0) int →
                # overflow null → rescue
                F.try_variant_get(var, "$", "long")
            )
            exprs.append(e.alias(name))
            # rescue anything the conversion nulled while a value was
            # present: non-integral floats, and long-range overflows
            # (where the Python path would crash at the Arrow boundary
            # rather than rescue — strictly less robust)
            rescue_entries.append((name, present & e.isNull()))
        elif target == DataType.TIMESTAMP:
            parsed = _ts_parse(F.try_variant_get(var, "$", "string"))
            exprs.append(parsed.alias(name))
            # any string might fail the layout chain → rescue
            rescue_entries.append((name, present & parsed.isNull()))
        else:  # UNKNOWN or anything unexpected
            return None

    if rescue_entries:
        fields = [
            F.when(fail, F.element_at(F.col("__mv"), n)).alias(n)
            for n, fail in rescue_entries
        ]
        any_fail = rescue_entries[0][1]
        for _n, f_ in rescue_entries[1:]:
            any_fail = any_fail | f_
        unmapped = F.when(
            any_fail,
            F.to_json(
                F.struct(*fields), {"ignoreNullFields": "true"}
            ),
        )
    else:
        unmapped = F.lit(None).cast("string")
    exprs.append(unmapped.alias(UNMAPPED_DATA_COLUMN))
    return work.select(*exprs, *[F.col(c) for c in carry])
