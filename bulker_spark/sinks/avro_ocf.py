"""Avro Object Container File writer/reader, pure Python, Spark-driven.

The reference's BigQuery loader marshals batches as Avro
(``bulkerlib/types/avro.go:9-14``, ``implementations/sql/bigquery.go:75-90``);
this port needs the same format without the external spark-avro
datasource module (not bundled with pip pyspark) and without any Python
avro package. The OCF format (magic ``Obj\\x01``, metadata map with
``avro.schema``/``avro.codec``, 16-byte sync marker, then
count+size-prefixed blocks) and the binary encoding (zigzag varints,
length-prefixed strings/bytes, union-index prefixes) are small enough to
implement directly — and the bundled JVM ``org.apache.avro`` library
cross-checks every file the tests write.

Spark-first split of labor:

- **Type normalization happens JVM-side** (``to_wire``): timestamps →
  ``unix_micros`` longs, dates → epoch-day ints, recursively through
  arrays/maps/structs. Python never touches a datetime, so there is no
  session-timezone round-trip ambiguity and the hot loop encodes plain
  ints/floats/strings. The Avro schema keeps the ``timestamp-micros`` /
  ``date`` logical types, so any Avro consumer (BigQuery, Java) reads
  real timestamps.
- **The write is distributed**: ``df.mapInArrow`` runs the encoder once
  per partition, each task streaming its Arrow batches straight into its
  own ``part-*.avro`` file — no driver collect, no partition ever
  materialized in memory (blocks flush at ``_BLOCK_ROWS`` rows).
- **The read is distributed**: file list → ``parallelize`` →
  per-file decode → ``createDataFrame`` on the wire schema → JVM-side
  cast back (``timestamp_micros`` / ``date_add``).

Codec: ``null``, ``deflate`` (raw zlib, the Avro spelling of gzip's
algorithm) and ``snappy`` (pure-Python raw-format snappy +
4-byte big-endian CRC32 of the uncompressed block per the Avro spec —
see ``snappy_pp.py``; a C snappy library is used when importable).
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

MAGIC = b"Obj\x01"
_BLOCK_ROWS = 4096  # rows per OCF block before a flush


# ==========================================================================
# Spark schema ⇄ Avro schema
# ==========================================================================

def spark_to_avro_schema(schema, name: str = "row") -> dict:
    """Avro record schema (dict) for a Spark StructType.

    Logical types carry the semantics the wire encoding drops:
    timestamp → long/timestamp-micros, date → int/date, decimal →
    bytes/decimal(p,s). Nullable fields become ``["null", T]`` unions
    with a ``null`` default (Avro's canonical optional-field shape).
    """
    fields = []
    for i, f in enumerate(schema.fields):
        t = _avro_type(f.dataType, f"{name}_{f.name}")
        if f.nullable:
            fields.append(
                {"name": f.name, "type": ["null", t], "default": None}
            )
        else:
            fields.append({"name": f.name, "type": t})
    return {"type": "record", "name": name, "fields": fields}


def _avro_type(dt, name: str):
    tn = dt.typeName()
    if tn in ("byte", "short", "integer"):
        return "int"
    if tn == "long":
        return "long"
    if tn == "float":
        return "float"
    if tn == "double":
        return "double"
    if tn == "string":
        return "string"
    if tn == "boolean":
        return "boolean"
    if tn == "binary":
        return "bytes"
    if tn == "timestamp":
        return {"type": "long", "logicalType": "timestamp-micros"}
    if tn == "timestamp_ntz":
        # avro's zone-free wall-clock type
        return {"type": "long", "logicalType": "local-timestamp-micros"}
    if tn == "date":
        return {"type": "int", "logicalType": "date"}
    if tn == "decimal":
        return {
            "type": "bytes",
            "logicalType": "decimal",
            "precision": dt.precision,
            "scale": dt.scale,
        }
    if tn == "array":
        inner = _avro_type(dt.elementType, name + "_item")
        if dt.containsNull:
            inner = ["null", inner]
        return {"type": "array", "items": inner}
    if tn == "map":
        if dt.keyType.typeName() != "string":
            raise ValueError("avro maps require string keys")
        inner = _avro_type(dt.valueType, name + "_value")
        if dt.valueContainsNull:
            inner = ["null", inner]
        return {"type": "map", "values": inner}
    if tn == "struct":
        return spark_to_avro_schema(dt, name)
    raise ValueError(f"no avro mapping for spark type {tn}")


def avro_to_spark_schema(avro: dict):
    """Inverse mapping for the reader — returns the WIRE StructType
    (timestamps still longs, dates still ints; ``from_wire`` casts back)
    plus the set of column paths needing each logical restore."""
    from pyspark.sql import types as T

    assert avro["type"] == "record", "top level must be a record"
    fields = []
    for f in avro["fields"]:
        t, nullable = _denull(f["type"])
        fields.append(T.StructField(f["name"], _spark_type(t), nullable))
    return T.StructType(fields)


def _denull(t):
    if isinstance(t, list):
        branches = [b for b in t if b != "null"]
        if len(branches) != 1:
            raise ValueError(f"only [null, T] unions supported, got {t}")
        return branches[0], True
    return t, False


def _spark_type(t):
    from pyspark.sql import types as T

    prim = {
        "int": T.IntegerType(),
        "long": T.LongType(),
        "float": T.FloatType(),
        "double": T.DoubleType(),
        "string": T.StringType(),
        "boolean": T.BooleanType(),
        "bytes": T.BinaryType(),
    }
    if isinstance(t, str):
        if t in prim:
            return prim[t]
        raise ValueError(f"unsupported avro type {t!r}")
    kind = t["type"]
    logical = t.get("logicalType")
    if logical == "decimal":
        return T.DecimalType(t["precision"], t["scale"])
    if kind in prim and isinstance(kind, str) and not isinstance(t.get("type"), dict):
        # logical types ride the wire as their base primitive
        return prim[kind]
    if kind == "array":
        inner, n = _denull(t["items"])
        return T.ArrayType(_spark_type(inner), n)
    if kind == "map":
        inner, n = _denull(t["values"])
        return T.MapType(T.StringType(), _spark_type(inner), n)
    if kind == "record":
        return avro_to_spark_schema(t)
    if kind == "enum":
        return T.StringType()
    if kind == "fixed":
        if logical == "decimal":
            return T.DecimalType(t["precision"], t["scale"])
        return T.BinaryType()
    raise ValueError(f"unsupported avro type {t!r}")


# ==========================================================================
# JVM-side wire conversion (no datetimes ever cross to Python)
# ==========================================================================

def _ntz_to_micros(col):
    """NTZ wall clock → micros-since-epoch-wall, via FIELD extraction —
    no zone is ever involved, so the value is session-timezone
    independent and DST-proof. Every cast-through-timestamp scheme
    (including ``timestamp_diff``, which implicit-casts NTZ operands
    through the session zone) corrupts wall clocks inside a
    spring-forward gap, where the offsets on the two sides of the
    round-trip disagree."""
    from pyspark.sql import functions as F

    return (
        F.unix_date(col.cast("date")).cast("long") * 86_400_000_000
        + F.hour(col).cast("long") * 3_600_000_000
        + F.minute(col).cast("long") * 60_000_000
        + F.round(F.date_part(F.lit("SECOND"), col) * 1_000_000).cast(
            "long"
        )
    )


def _micros_to_ntz(col):
    """Inverse of :func:`_ntz_to_micros`: rebuild the NTZ value from its
    date/time FIELDS (``make_timestamp_ntz``) — zone-free, DST-proof.

    The day split is EXACT integer arithmetic: ``pmod`` on longs, then a
    decimal division of the (exact multiple) remainder-free part.
    ``floor(col / 86_400_000_000)`` would divide in DOUBLE, whose 53-bit
    mantissa misrounds end-of-day values past year 2255 — the classic
    9999-12-31 23:59:59.999999 sentinel decoded to hour −1 and killed
    the read under ANSI mode."""
    from pyspark.sql import functions as F

    day_us = F.lit(86_400_000_000)
    rem = F.pmod(col, day_us)  # exact: long % long
    days = (
        (col - rem).cast("decimal(38,0)") / day_us.cast("decimal(38,0)")
    ).cast("long")  # exact: numerator is an exact multiple
    d = F.date_add(F.lit("1970-01-01").cast("date"), days.cast("int"))
    # rem < 8.64e10 — every further op is exact in any representation
    return F.make_timestamp_ntz(
        F.year(d),
        F.month(d),
        F.dayofmonth(d),
        F.floor(rem / 3_600_000_000).cast("int"),
        F.floor(rem % 3_600_000_000 / 60_000_000).cast("int"),
        (rem % 60_000_000).cast("decimal(16,0)") / 1_000_000,
    )


def to_wire(df):
    """Timestamps → epoch-micros longs, dates → epoch-day ints,
    recursively — all in Catalyst expressions, so the Python encoder
    only ever sees ints/floats/strings/bytes/Decimal."""
    from pyspark.sql import functions as F

    out = [_wire_col(F.col(f.name), f.dataType).alias(f.name)
           for f in df.schema.fields]
    return df.select(*out)


def _needs_wire(dt) -> bool:
    tn = dt.typeName()
    if tn in ("timestamp", "timestamp_ntz", "date"):
        return True
    if tn == "array":
        return _needs_wire(dt.elementType)
    if tn == "map":
        return _needs_wire(dt.valueType)
    if tn == "struct":
        return any(_needs_wire(f.dataType) for f in dt.fields)
    return False


def _wire_col(col, dt):
    from pyspark.sql import functions as F

    tn = dt.typeName()
    if tn == "timestamp":
        return F.unix_micros(col)
    if tn == "timestamp_ntz":
        return _ntz_to_micros(col)
    if tn == "date":
        return F.datediff(col, F.lit("1970-01-01"))
    if tn == "array" and _needs_wire(dt.elementType):
        return F.transform(col, lambda x: _wire_col(x, dt.elementType))
    if tn == "map" and _needs_wire(dt.valueType):
        return F.map_from_arrays(
            F.map_keys(col),
            F.transform(F.map_values(col),
                        lambda v: _wire_col(v, dt.valueType)),
        )
    if tn == "struct" and _needs_wire(dt):
        rebuilt = F.struct(
            *[_wire_col(col[f.name], f.dataType).alias(f.name)
              for f in dt.fields]
        )
        # F.struct of a null struct's fields is a non-null all-null
        # struct — preserve the null parent explicitly
        return F.when(col.isNull(), F.lit(None)).otherwise(rebuilt)
    return col


def from_wire(df, original_schema):
    """Inverse of ``to_wire`` given the pre-wire Spark schema."""
    from pyspark.sql import functions as F

    out = [_unwire_col(F.col(f.name), f.dataType).alias(f.name)
           for f in original_schema.fields]
    return df.select(*out)


def _unwire_col(col, dt):
    from pyspark.sql import functions as F

    tn = dt.typeName()
    if tn == "timestamp":
        return F.timestamp_micros(col)
    if tn == "timestamp_ntz":
        return _micros_to_ntz(col)
    if tn == "date":
        return F.date_add(F.lit("1970-01-01").cast("date"), col)
    if tn == "array" and _needs_wire(dt.elementType):
        return F.transform(col, lambda x: _unwire_col(x, dt.elementType))
    if tn == "map" and _needs_wire(dt.valueType):
        return F.map_from_arrays(
            F.map_keys(col),
            F.transform(F.map_values(col),
                        lambda v: _unwire_col(v, dt.valueType)),
        )
    if tn == "struct" and _needs_wire(dt):
        rebuilt = F.struct(
            *[_unwire_col(col[f.name], f.dataType).alias(f.name)
              for f in dt.fields]
        )
        return F.when(col.isNull(), F.lit(None)).otherwise(rebuilt)
    return col


# ==========================================================================
# Binary encoding
# ==========================================================================

def encode_long(n: int, out: bytearray) -> None:
    """Zigzag + base-128 varint, the Avro int/long encoding."""
    n = (n << 1) ^ (n >> 63)
    if n < 0:  # Python ints are unbounded; emulate 64-bit arithmetic
        n &= (1 << 64) - 1
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def decode_long(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    n = (acc >> 1) ^ -(acc & 1)
    return n, pos


def _encode_bytes(v: bytes, out: bytearray) -> None:
    encode_long(len(v), out)
    out += v


def compile_encoder(schema, avro_schema: dict | None = None):
    """Row-dict encoder for a WIRE StructType (post-``to_wire``): a tree
    of per-field closures, built once per task, no per-row type dispatch
    beyond the null check Avro unions require anyway.

    ``avro_schema`` (optional) drives FOREIGN-type encoding: where the
    declared Avro field is an ``enum`` (Spark-side string → symbol
    index) or a non-decimal ``fixed`` (Spark-side binary, length
    enforced), the wire bytes follow the Avro declaration instead of the
    Spark-native string/bytes encoding — round-tripping files whose
    schema Spark cannot natively express."""
    afields = (
        {f["name"]: f["type"] for f in avro_schema["fields"]}
        if avro_schema
        else {}
    )

    def field_nullable(f):
        # wire nullability follows the DECLARED schema when one is
        # given: a non-union Avro field must NOT be prefixed with a
        # union branch byte even if the Spark frame says nullable
        at = afields.get(f.name)
        return _denull(at)[1] if at is not None else f.nullable

    field_encs = [
        (
            f.name,
            _value_encoder(f.dataType, afields.get(f.name)),
            field_nullable(f),
        )
        for f in schema.fields
    ]

    def enc_row(row: dict, out: bytearray) -> None:
        for name, enc, nullable in field_encs:
            v = row.get(name)
            if nullable:
                if v is None:
                    out.append(0x00)  # union branch 0 = null
                    continue
                out.append(0x02)  # union branch 1, zigzag(1)
            elif v is None:
                raise ValueError(
                    f"null value in non-nullable avro field {name!r}"
                )
            enc(v, out)

    return enc_row


def _value_encoder(dt, avro_type=None):
    tn = dt.typeName()
    if avro_type is not None:
        at, _ = _denull(avro_type)
        if isinstance(at, dict):
            kind = at.get("type")
            if kind == "enum":
                # Avro enum = zigzag varint INDEX into the symbol list
                symbols = {s: i for i, s in enumerate(at["symbols"])}
                name = at.get("name", "enum")

                def enc_enum(v, out):
                    try:
                        encode_long(symbols[v], out)
                    except KeyError:
                        raise ValueError(
                            f"{v!r} is not a symbol of avro enum "
                            f"{name} {sorted(symbols)}"
                        ) from None
                return enc_enum
            if kind == "fixed" and at.get("logicalType") != "decimal":
                size = at["size"]
                name = at.get("name", "fixed")

                def enc_fixed(v, out):
                    b = bytes(v)
                    if len(b) != size:
                        raise ValueError(
                            f"avro fixed {name} needs exactly {size} "
                            f"bytes, got {len(b)}"
                        )
                    out += b
                return enc_fixed
            if kind == "record" and tn == "struct":
                sub = compile_encoder(dt, at)

                def enc_rec(v, out):
                    sub(v if isinstance(v, dict) else v.asDict(), out)
                return enc_rec
            if kind == "array" and tn == "array":
                return _array_encoder(dt, at["items"])
            if kind == "map" and tn == "map":
                return _map_encoder(dt, at["values"])
    if tn in ("byte", "short", "integer", "long"):
        return encode_long
    if tn == "double":
        pack = struct.Struct("<d").pack

        def enc_d(v, out):
            out += pack(v)
        return enc_d
    if tn == "float":
        pack = struct.Struct("<f").pack

        def enc_f(v, out):
            out += pack(v)
        return enc_f
    if tn == "string":
        def enc_s(v, out):
            b = v.encode("utf-8")
            encode_long(len(b), out)
            out += b
        return enc_s
    if tn == "boolean":
        def enc_b(v, out):
            out.append(1 if v else 0)
        return enc_b
    if tn == "binary":
        def enc_bin(v, out):
            b = bytes(v)
            encode_long(len(b), out)
            out += b
        return enc_bin
    if tn == "decimal":
        scale = dt.scale

        def enc_dec(v, out):
            unscaled = int(v.scaleb(scale).to_integral_value())
            nbytes = max(1, (unscaled.bit_length() + 8) // 8)
            _encode_bytes(
                unscaled.to_bytes(nbytes, "big", signed=True), out
            )
        return enc_dec
    if tn == "array":
        return _array_encoder(dt)
    if tn == "map":
        return _map_encoder(dt)
    if tn == "struct":
        sub = compile_encoder(dt)

        def enc_struct(v, out):
            sub(v if isinstance(v, dict) else v.asDict(), out)
        return enc_struct
    raise ValueError(f"no avro encoder for spark type {tn}")


def _array_encoder(dt, items_avro=None):
    inner = _value_encoder(dt.elementType, items_avro)
    nullable = (
        _denull(items_avro)[1] if items_avro is not None else dt.containsNull
    )

    def enc_arr(v, out):
        if v:
            encode_long(len(v), out)
            for item in v:
                if nullable:
                    if item is None:
                        out.append(0x00)
                        continue
                    out.append(0x02)
                inner(item, out)
        out.append(0x00)  # block terminator
    return enc_arr


def _map_encoder(dt, values_avro=None):
    inner = _value_encoder(dt.valueType, values_avro)
    nullable = (
        _denull(values_avro)[1]
        if values_avro is not None
        else dt.valueContainsNull
    )

    def enc_map(v, out):
        # Arrow's to_pylist renders MapType as [(k, v), ...]; plain
        # dicts appear when rows come from Python directly
        items = v.items() if isinstance(v, dict) else v
        if v:
            encode_long(len(v), out)
            for k, item in items:
                b = k.encode("utf-8")
                encode_long(len(b), out)
                out += b
                if nullable:
                    if item is None:
                        out.append(0x00)
                        continue
                    out.append(0x02)
                inner(item, out)
        out.append(0x00)
    return enc_map


# ==========================================================================
# Binary decoding
# ==========================================================================

def compile_decoder(avro_type):
    """(buf, pos) -> (value, pos) decoder for an Avro schema node.
    Produces WIRE values (logical types stay as their base primitives
    except decimal, which needs its scale applied here)."""
    if isinstance(avro_type, list):
        branch = [compile_decoder(b) for b in avro_type]

        def dec_union(buf, pos):
            idx, pos = decode_long(buf, pos)
            return branch[idx](buf, pos)
        return dec_union
    if isinstance(avro_type, str):
        return _PRIM_DECODERS[avro_type]
    kind = avro_type["type"]
    logical = avro_type.get("logicalType")
    if logical in ("timestamp-millis", "local-timestamp-millis"):
        # normalize to micros so the wire frame is uniform and
        # from_wire's timestamp_micros cast is always right
        def dec_millis(buf, pos):
            v, pos = decode_long(buf, pos)
            return v * 1000, pos
        return dec_millis
    if logical == "decimal":
        import decimal as _d

        scale = avro_type["scale"]
        size = avro_type.get("size") if kind == "fixed" else None

        def dec_dec(buf, pos):
            if size is not None:
                raw, pos = buf[pos:pos + size], pos + size
            else:
                n, pos = decode_long(buf, pos)
                raw, pos = buf[pos:pos + n], pos + n
            unscaled = int.from_bytes(raw, "big", signed=True)
            return _d.Decimal(unscaled).scaleb(-scale), pos
        return dec_dec
    if isinstance(kind, str) and kind in _PRIM_DECODERS:
        return _PRIM_DECODERS[kind]
    if kind == "record":
        fields = [(f["name"], compile_decoder(f["type"]))
                  for f in avro_type["fields"]]

        def dec_rec(buf, pos):
            out = {}
            for name, dec in fields:
                out[name], pos = dec(buf, pos)
            return out, pos
        return dec_rec
    if kind == "array":
        inner = compile_decoder(avro_type["items"])

        def dec_arr(buf, pos):
            out = []
            while True:
                n, pos = decode_long(buf, pos)
                if n == 0:
                    return out, pos
                if n < 0:  # size-prefixed block form
                    n = -n
                    _, pos = decode_long(buf, pos)
                for _ in range(n):
                    v, pos = inner(buf, pos)
                    out.append(v)
        return dec_arr
    if kind == "map":
        inner = compile_decoder(avro_type["values"])

        def dec_map(buf, pos):
            out = {}
            while True:
                n, pos = decode_long(buf, pos)
                if n == 0:
                    return out, pos
                if n < 0:
                    n = -n
                    _, pos = decode_long(buf, pos)
                for _ in range(n):
                    klen, pos = decode_long(buf, pos)
                    k = buf[pos:pos + klen].decode("utf-8")
                    pos += klen
                    out[k], pos = inner(buf, pos)
        return dec_map
    if kind == "enum":
        symbols = avro_type["symbols"]

        def dec_enum(buf, pos):
            i, pos = decode_long(buf, pos)
            return symbols[i], pos
        return dec_enum
    if kind == "fixed":
        size = avro_type["size"]

        def dec_fixed(buf, pos):
            return bytes(buf[pos:pos + size]), pos + size
        return dec_fixed
    raise ValueError(f"unsupported avro type {avro_type!r}")


def _dec_null(buf, pos):
    return None, pos


def _dec_bool(buf, pos):
    return buf[pos] == 1, pos + 1


def _dec_bytes(buf, pos):
    n, pos = decode_long(buf, pos)
    return bytes(buf[pos:pos + n]), pos + n


def _dec_string(buf, pos):
    n, pos = decode_long(buf, pos)
    return buf[pos:pos + n].decode("utf-8"), pos + n


_DOUBLE = struct.Struct("<d")
_FLOAT = struct.Struct("<f")
_PRIM_DECODERS = {
    "null": _dec_null,
    "boolean": _dec_bool,
    "int": decode_long,
    "long": decode_long,
    "float": lambda buf, pos: (_FLOAT.unpack_from(buf, pos)[0], pos + 4),
    "double": lambda buf, pos: (_DOUBLE.unpack_from(buf, pos)[0], pos + 8),
    "bytes": _dec_bytes,
    "string": _dec_string,
}


# ==========================================================================
# OCF container
# ==========================================================================

class OCFWriter:
    """Streams rows into one Avro Object Container File.

    Rows buffer into blocks of ``_BLOCK_ROWS`` and flush compressed
    (``deflate`` = raw zlib per the spec) — memory is O(block), never
    O(file)."""

    def __init__(self, fh, avro_schema: dict, codec: str = "deflate"):
        if codec not in ("null", "deflate", "snappy"):
            raise NotImplementedError(
                f"avro codec {codec!r} is not supported; "
                "use 'null', 'deflate' or 'snappy'"
            )
        self.fh = fh
        self.codec = codec
        self.sync = os.urandom(16)
        self._buf = bytearray()
        self._count = 0
        header = bytearray(MAGIC)
        meta = {
            "avro.schema": json.dumps(avro_schema).encode(),
            "avro.codec": codec.encode(),
        }
        encode_long(len(meta), header)
        for k, v in meta.items():
            _encode_bytes(k.encode(), header)
            _encode_bytes(v, header)
        header.append(0x00)  # metadata map terminator
        header += self.sync
        fh.write(bytes(header))

    def write_row(self, enc, row: dict) -> None:
        enc(row, self._buf)
        self._count += 1
        if self._count >= _BLOCK_ROWS:
            self.flush_block()

    def flush_block(self) -> None:
        if not self._count:
            return
        payload = bytes(self._buf)
        if self.codec == "deflate":
            c = zlib.compressobj(6, zlib.DEFLATED, -15)
            payload = c.compress(payload) + c.flush()
        elif self.codec == "snappy":
            # Avro spec: snappy blocks carry a 4-byte big-endian CRC32
            # of the UNCOMPRESSED data after the compressed body
            from . import snappy_pp

            payload = snappy_pp.compress(payload) + struct.pack(
                ">I", zlib.crc32(payload) & 0xFFFFFFFF
            )
        head = bytearray()
        encode_long(self._count, head)
        encode_long(len(payload), head)
        self.fh.write(bytes(head))
        self.fh.write(payload)
        self.fh.write(self.sync)
        self._buf = bytearray()
        self._count = 0

    def close(self) -> None:
        self.flush_block()
        self.fh.flush()


def read_ocf_header(fh) -> tuple[dict, str, bytes, int]:
    """→ (avro schema dict, codec, sync marker, header byte length)."""
    head = fh.read(4)
    if head != MAGIC:
        raise ValueError("not an avro object container file")
    # metadata map: parse from a buffer that GROWS on underrun — a
    # many-column schema's JSON can legally exceed any fixed size
    buf = fh.read(1 << 16)
    while True:
        try:
            pos = 0
            meta = {}
            while True:
                n, pos = decode_long(buf, pos)
                if n == 0:
                    break
                if n < 0:
                    n = -n
                    _, pos = decode_long(buf, pos)
                for _ in range(n):
                    klen, pos = decode_long(buf, pos)
                    if pos + klen > len(buf):
                        raise IndexError
                    k = buf[pos:pos + klen].decode()
                    pos += klen
                    vlen, pos = decode_long(buf, pos)
                    if pos + vlen > len(buf):
                        raise IndexError
                    meta[k] = buf[pos:pos + vlen]
                    pos += vlen
            if pos + 16 > len(buf):
                raise IndexError
            break
        except IndexError:
            more = fh.read(len(buf))
            if not more:
                raise ValueError("truncated avro header") from None
            buf += more
    sync = buf[pos:pos + 16]
    pos += 16
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    return schema, codec, bytes(sync), 4 + pos


def read_ocf_rows(path: str):
    """Decode every row of one OCF file → iterator of dicts (wire
    values). Runs inside an executor task in the distributed read."""
    with open(path, "rb") as fh:
        schema, codec, sync, hlen = read_ocf_header(fh)
        fh.seek(hlen)
        dec = compile_decoder(schema)
        data = fh.read()
    pos = 0
    end = len(data)
    while pos < end:
        count, pos = decode_long(data, pos)
        size, pos = decode_long(data, pos)
        block = data[pos:pos + size]
        pos += size
        if data[pos:pos + 16] != sync:
            raise ValueError(f"sync marker mismatch in {path}")
        pos += 16
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec == "snappy":
            from . import snappy_pp

            body, crc = block[:-4], block[-4:]
            block = snappy_pp.decompress(body)
            if struct.pack(">I", zlib.crc32(block) & 0xFFFFFFFF) != crc:
                raise ValueError(f"snappy block CRC mismatch in {path}")
        elif codec != "null":
            raise NotImplementedError(f"avro codec {codec!r}")
        bpos = 0
        for _ in range(count):
            row, bpos = dec(block, bpos)
            yield row


# ==========================================================================
# Spark entry points
# ==========================================================================

def write_avro(
    df,
    path: str,
    *,
    codec: str = "deflate",
    mode: str = "append",
    avro_schema: dict | None = None,
) -> int:
    """Distributed OCF write: one file per partition under ``path``.
    Returns total rows written. ``mode='overwrite'`` clears the
    directory first (prefix-delete, the file-sink replace semantic).

    ``avro_schema`` overrides the schema derived from the frame — pass
    the header schema of a foreign file to round-trip Avro types Spark
    cannot express natively: ``enum`` fields encode from string columns
    (symbol → index) and non-decimal ``fixed`` fields from binary
    columns (size enforced). Field names/order and union nullability
    must match the frame; values outside the declaration raise."""
    import shutil as _sh
    import uuid as _uuid

    if codec not in ("null", "deflate", "snappy"):
        # validate on the DRIVER — inside the task it would surface as
        # an opaque executor PythonException
        raise NotImplementedError(
            f"avro codec {codec!r} is not supported; "
            "use 'null', 'deflate' or 'snappy'"
        )
    if mode == "overwrite" and os.path.exists(path):
        _sh.rmtree(path)
    os.makedirs(path, exist_ok=True)
    declared = avro_schema  # None = derive from the frame
    if declared is not None:
        _validate_declared(declared, df.schema, path="")
    avro_schema = declared or spark_to_avro_schema(df.schema)
    wire = to_wire(df)
    enc_schema = wire.schema
    run_id = _uuid.uuid4().hex[:8]

    def task(batches):
        import pyarrow as pa
        from pyspark import TaskContext

        enc = compile_encoder(enc_schema, declared)
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        attempt = ctx.taskAttemptId() if ctx is not None else 0
        # Final name is deterministic per PARTITION (not per attempt):
        # a retried or speculative task re-publishes the SAME path, so
        # the directory never accumulates two copies of one partition's
        # rows — the exactly-once publish the committer gives the
        # Spark-writer formats. The staging file is attempt-unique so
        # two live attempts never interleave writes into one fd.
        fname = os.path.join(path, f"part-{run_id}-{pid:05d}.avro")
        tmp = f"{fname}.{attempt}.tmp"
        writer = None
        fh = None
        n = 0
        for batch in batches:
            if writer is None:
                fh = open(tmp, "wb")
                writer = OCFWriter(fh, avro_schema, codec)
            for row in batch.to_pylist():
                writer.write_row(enc, row)
                n += 1
        if writer is not None:
            writer.close()
            fh.close()
            os.replace(tmp, fname)  # atomic; a retry overwrites, never adds
        yield pa.RecordBatch.from_pylist([{"rows": n}])

    res = wire.mapInArrow(task, "rows long").collect()
    total = sum(r["rows"] for r in res)
    if not any(f.endswith(".avro") for f in os.listdir(path)):
        # zero rows → no task wrote a file; land a header-only container
        # so the table (and its schema) stays readable, matching the
        # other formats' empty-write behavior
        empty = os.path.join(path, f"part-{run_id}-empty.avro")
        with open(empty, "wb") as fh:
            OCFWriter(fh, avro_schema, codec).close()
    return total


def _validate_declared(avro_record: dict, struct, path: str) -> None:
    """Declared-schema sanity at EVERY nesting level: the encoder walks
    the Spark struct in ITS field order while the header carries the
    declaration — a reordered or renamed nested record would silently
    write bytes that decode as garbage (a string consumed as a varint),
    so names AND order must match all the way down."""
    frame_cols = [f.name for f in struct.fields]
    decl_fields = avro_record.get("fields", [])
    decl_cols = [f["name"] for f in decl_fields]
    where = path or "<root>"
    if frame_cols != decl_cols:
        raise ValueError(
            f"avro_schema fields {decl_cols} at {where} do not match "
            f"the frame's columns {frame_cols} (same names, same order "
            "required)"
        )
    for decl, field in zip(decl_fields, struct.fields):
        dt = field.dataType
        at, _ = _denull(decl["type"])
        child = f"{path}.{field.name}" if path else field.name
        if isinstance(at, dict) and at.get("type") == "record":
            if dt.typeName() != "struct":
                raise ValueError(
                    f"avro_schema declares a record at {child} but the "
                    f"frame column is {dt.typeName()}"
                )
            _validate_declared(at, dt, child)
        elif isinstance(at, dict) and at.get("type") == "array":
            items, _ = _denull(at["items"])
            if (
                isinstance(items, dict)
                and items.get("type") == "record"
                and dt.typeName() == "array"
            ):
                _validate_declared(items, dt.elementType, child + "[]")


def read_avro(spark, path: str):
    """Distributed OCF read of a directory (or single file) → DataFrame.

    The driver reads ONE header for the schema; decoding fans out one
    task per file. Logical types are restored JVM-side."""
    from pyspark.sql import Row

    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".avro")
        )
    else:
        files = [path]
    if not files:
        raise FileNotFoundError(f"no .avro files under {path}")
    with open(files[0], "rb") as fh:
        avro_schema, _, _, _ = read_ocf_header(fh)
    # Every file must carry the canonical schema: the per-file decoders
    # use their own header, so an appended file with an EVOLVED schema
    # would otherwise be silently projected through files[0]'s columns
    # (new columns dropped, missing columns null). Header-only reads —
    # O(files) tiny reads, no block data touched. Codecs MAY differ.
    canonical = json.dumps(avro_schema, sort_keys=True)
    for p in files[1:]:
        with open(p, "rb") as fh:
            other, _, _, _ = read_ocf_header(fh)
        if json.dumps(other, sort_keys=True) != canonical:
            raise ValueError(
                f"avro schema mismatch under {path}: {p} differs from "
                f"{files[0]}; directory reads require every file to be "
                "written with the same schema (append-with-same-schema)"
            )
    wire_schema = avro_to_spark_schema(avro_schema)
    spark_schema = _restore_schema(avro_schema)
    names = [f.name for f in wire_schema.fields]

    def decode_file(p):
        for row in read_ocf_rows(p):
            yield Row(*[row.get(n) for n in names])

    rdd = spark.sparkContext.parallelize(files, len(files)).flatMap(
        decode_file
    )
    wire_df = spark.createDataFrame(rdd, wire_schema)
    return from_wire(wire_df, spark_schema)


def _restore_schema(avro: dict):
    """Spark schema with logical types restored (what ``from_wire``
    should cast the wire frame back to)."""
    from pyspark.sql import types as T

    def restore(t):
        t, nullable = _denull(t)
        if isinstance(t, dict):
            logical = t.get("logicalType")
            if logical in ("timestamp-micros", "timestamp-millis"):
                return T.TimestampType(), nullable
            if logical in ("local-timestamp-micros", "local-timestamp-millis"):
                return T.TimestampNTZType(), nullable
            if logical == "date":
                return T.DateType(), nullable
            if t["type"] == "record":
                return _rec(t), nullable
            if t["type"] == "array":
                inner, n = restore(t["items"])
                return T.ArrayType(inner, n), nullable
            if t["type"] == "map":
                inner, n = restore(t["values"])
                return T.MapType(T.StringType(), inner, n), nullable
        return _spark_type(t), nullable

    def _rec(rec):
        fields = []
        for f in rec["fields"]:
            dt, nullable = restore(f["type"])
            fields.append(T.StructField(f["name"], dt, nullable))
        return T.StructType(fields)

    return _rec(avro)
