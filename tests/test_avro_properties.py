"""Property test: the pure-Python Avro OCF codec roundtrips arbitrary
values bit-exactly (encoder and decoder are independent code paths over
the spec's binary encoding, so agreement over random structured data is
strong evidence both match the spec — the JVM cross-check in
test_avro_ocf.py anchors them to the real implementation)."""

import decimal
import io
import math

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from bulker_spark.sinks.avro_ocf import (
    OCFWriter,
    compile_decoder,
    compile_encoder,
    read_ocf_header,
    spark_to_avro_schema,
)

WIRE_SCHEMA = T.StructType([
    T.StructField("i", T.LongType(), True),
    T.StructField("d", T.DoubleType(), True),
    T.StructField("s", T.StringType(), True),
    T.StructField("b", T.BooleanType(), True),
    T.StructField("raw", T.BinaryType(), True),
    T.StructField("dec", T.DecimalType(20, 4), True),
    T.StructField("arr", T.ArrayType(T.LongType(), True), True),
    T.StructField("mp", T.MapType(T.StringType(), T.LongType(), True), True),
    T.StructField("rec", T.StructType([
        T.StructField("x", T.LongType(), True),
        T.StructField("y", T.StringType(), False),
    ]), True),
])

_longs = st.integers(min_value=-(2**63), max_value=2**63 - 1)
_decimals = st.decimals(
    min_value=decimal.Decimal("-9999999999.9999"),
    max_value=decimal.Decimal("9999999999.9999"),
    allow_nan=False, allow_infinity=False, places=4,
)
row_st = st.fixed_dictionaries({
    "i": st.none() | _longs,
    "d": st.none() | st.floats(allow_nan=True, allow_infinity=True),
    "s": st.none() | st.text(max_size=40),
    "b": st.none() | st.booleans(),
    "raw": st.none() | st.binary(max_size=32),
    "dec": st.none() | _decimals,
    "arr": st.none() | st.lists(st.none() | _longs, max_size=8),
    "mp": st.none() | st.dictionaries(st.text(max_size=8), st.none() | _longs, max_size=6),
    "rec": st.none() | st.fixed_dictionaries(
        {"x": st.none() | _longs, "y": st.text(max_size=10)}
    ),
})


def _eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return (math.isnan(a) and math.isnan(b)) or a == b
    if isinstance(a, dict) and isinstance(b, dict):
        return a.keys() == b.keys() and all(_eq(a[k], b[k]) for k in a)
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(_eq(x, y) for x, y in zip(a, b))
    return a == b


@settings(max_examples=200, deadline=None)
@given(rows=st.lists(row_st, min_size=0, max_size=10),
       codec=st.sampled_from(["null", "deflate"]))
def test_ocf_roundtrip_arbitrary_rows(rows, codec):
    avro_schema = spark_to_avro_schema(WIRE_SCHEMA)
    enc = compile_encoder(WIRE_SCHEMA)
    buf = io.BytesIO()
    w = OCFWriter(buf, avro_schema, codec=codec)
    for r in rows:
        w.write_row(enc, r)
    w.close()
    buf.seek(0)
    schema, got_codec, sync, hlen = read_ocf_header(buf)
    assert got_codec == codec
    dec = compile_decoder(schema)
    # decode all blocks exactly as read_ocf_rows does, from the buffer
    import zlib

    buf.seek(hlen)
    data = buf.read()
    pos, out = 0, []
    from bulker_spark.sinks.avro_ocf import decode_long

    while pos < len(data):
        count, pos = decode_long(data, pos)
        size, pos = decode_long(data, pos)
        block = data[pos:pos + size]
        pos += size + 16
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        bpos = 0
        for _ in range(count):
            row, bpos = dec(block, bpos)
            out.append(row)
    assert len(out) == len(rows)
    for orig, back in zip(rows, out):
        for k, v in orig.items():
            got = back[k]
            if isinstance(v, (bytes, bytearray)) or isinstance(got, (bytes, bytearray)):
                assert (v is None) == (got is None) and (v is None or bytes(v) == got), k
            else:
                assert _eq(got, v), (k, v, got)
