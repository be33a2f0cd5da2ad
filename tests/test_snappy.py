"""Pure-Python snappy (raw block format) + the Avro ``snappy`` codec.

Format: google/snappy format_description.txt (varint preamble, literal
and copy-1/2/4 tagged elements, overlapping copies as run-length).
Avro framing: compressed body + 4-byte big-endian CRC32 of the
uncompressed block.
"""

import glob
import os
import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from bulker_spark.sinks import snappy_pp
from bulker_spark.sinks.avro_ocf import read_avro, read_ocf_rows, write_avro

# exercise OUR implementation even when a C library is importable
def _pure_compress(data):
    fast = snappy_pp._FAST_COMPRESS
    snappy_pp._FAST_COMPRESS = None
    try:
        return snappy_pp.compress(data)
    finally:
        snappy_pp._FAST_COMPRESS = fast


def _pure_decompress(data):
    fast = snappy_pp._FAST_DECOMPRESS
    snappy_pp._FAST_DECOMPRESS = None
    try:
        return snappy_pp.decompress(data)
    finally:
        snappy_pp._FAST_DECOMPRESS = fast


class TestRoundtrip:
    @pytest.mark.parametrize(
        "data",
        [
            b"",
            b"a",
            b"abc" * 1,
            b"hello hello hello hello hello ",          # short-range copies
            b"x" * 100_000,                              # one long run
            bytes(range(256)) * 300,                     # cycling pattern
            os.urandom(70_000),                          # incompressible
            b"ab" * 40_000,                              # overlap offset 2
            (b"The quick brown fox. " * 5000),
        ],
        ids=["empty", "one", "tiny", "words", "run", "cycle", "random",
             "overlap2", "text"],
    )
    def test_pure_roundtrip(self, data):
        comp = _pure_compress(data)
        assert _pure_decompress(comp) == data

    def test_compresses_repetitive_input(self):
        data = b"abcdefgh" * 10_000
        comp = _pure_compress(data)
        assert len(comp) < len(data) // 10

    def test_long_literal_headers(self):
        # literals with 1-, 2- and 3-byte extended lengths: random bytes
        # never match, so the whole input is one literal element
        for size in (61, 300, 70_000, 80_000):
            data = os.urandom(size)
            assert _pure_decompress(_pure_compress(data)) == data


class TestSpecVectors:
    """Hand-built streams exercising elements our compressor never
    emits — a format-complete decoder must handle them."""

    def test_copy1_element(self):
        # literal "abcd", then copy1: offset 4, length 4
        stream = bytes([8]) + bytes([3 << 2]) + b"abcd" + bytes(
            [((4 - 4) << 2) | 0b01, 4]
        )
        assert _pure_decompress(stream) == b"abcdabcd"

    def test_copy4_element(self):
        stream = (
            bytes([8])
            + bytes([3 << 2])
            + b"abcd"
            + bytes([((4 - 1) << 2) | 0b11])
            + (4).to_bytes(4, "little")
        )
        assert _pure_decompress(stream) == b"abcdabcd"

    def test_overlapping_run(self):
        # literal "ab", copy offset 2 length 6 -> "ab" repeated
        stream = bytes([8]) + bytes([1 << 2]) + b"ab" + bytes(
            [((6 - 1) << 2) | 0b10]
        ) + (2).to_bytes(2, "little")
        assert _pure_decompress(stream) == b"abababab"

    def test_bad_offset_rejected(self):
        stream = bytes([8]) + bytes([1 << 2]) + b"ab" + bytes(
            [((4 - 1) << 2) | 0b10]
        ) + (9).to_bytes(2, "little")
        with pytest.raises(ValueError, match="offset"):
            _pure_decompress(stream)

    def test_length_mismatch_rejected(self):
        stream = bytes([99]) + bytes([1 << 2]) + b"ab"
        with pytest.raises(ValueError, match="preamble"):
            _pure_decompress(stream)


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=5000))
def test_property_roundtrip(data):
    assert _pure_decompress(_pure_compress(data)) == data


@settings(max_examples=50, deadline=None)
@given(st.lists(st.sampled_from([b"tok", b"x", b"longer-token", b" "]),
                max_size=400))
def test_property_roundtrip_tokens(parts):
    data = b"".join(parts)
    assert _pure_decompress(_pure_compress(data)) == data


# ==========================================================================
# Avro snappy codec
# ==========================================================================

def test_avro_snappy_roundtrip(spark, tmp_warehouse):
    df = spark.range(5000).selectExpr(
        "id", "CAST(id % 7 AS STRING) AS tag", "id * 1.5 AS v"
    )
    path = os.path.join(tmp_warehouse, "t")
    n = write_avro(df, path, codec="snappy")
    assert n == 5000
    back = read_avro(spark, path)
    assert back.count() == 5000
    assert back.selectExpr("sum(id)").collect()[0][0] == 5000 * 4999 // 2


def test_avro_snappy_crc_is_checked(spark, tmp_warehouse):
    df = spark.range(100).coalesce(1)
    path = os.path.join(tmp_warehouse, "t")
    write_avro(df, path, codec="snappy")
    f = glob.glob(os.path.join(path, "*.avro"))[0]
    raw = bytearray(open(f, "rb").read())
    raw[-20] ^= 0xFF  # flip a bit inside the last block body
    open(f, "wb").write(bytes(raw))
    with pytest.raises(ValueError):
        list(read_ocf_rows(f))


def test_jvm_avro_reads_our_snappy(spark, tmp_warehouse):
    """snappy-java on the Spark classpath is an INDEPENDENT decoder:
    it must accept our pure-Python snappy stream and the Avro CRC
    framing byte-for-byte."""
    jvm = spark._jvm
    try:
        jvm.org.apache.avro.file.CodecFactory.snappyCodec()
    except Exception:
        pytest.skip("JVM avro snappy codec unavailable")
    df = spark.createDataFrame(
        [(i, f"name-{i % 3}") for i in range(1000)], "id long, name string"
    ).coalesce(1)
    path = os.path.join(tmp_warehouse, "t")
    write_avro(df, path, codec="snappy")
    f = glob.glob(os.path.join(path, "*.avro"))[0]
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(f), jvm.org.apache.avro.generic.GenericDatumReader()
    )
    try:
        assert reader.getMetaString("avro.codec") == "snappy"
        total = 0
        last = None
        while reader.hasNext():
            rec = reader.next()
            total += 1
            last = (rec.get("id"), str(rec.get("name")))
        assert total == 1000
        assert last == (999, "name-0")
    finally:
        reader.close()


def test_we_read_jvm_written_snappy(spark, tmp_warehouse):
    """Reverse direction: a snappy OCF produced by Java Avro +
    snappy-java decodes through our pure-Python path."""
    jvm = spark._jvm
    try:
        codec = jvm.org.apache.avro.file.CodecFactory.snappyCodec()
    except Exception:
        pytest.skip("JVM avro snappy codec unavailable")
    schema = jvm.org.apache.avro.Schema.Parser().parse(
        '{"type":"record","name":"r","fields":['
        '{"name":"id","type":"long"},{"name":"s","type":"string"}]}'
    )
    f = os.path.join(tmp_warehouse, "jvm_snappy.avro")
    writer = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    )
    writer.setCodec(codec)
    writer.create(schema, jvm.java.io.File(f))
    for i in range(500):
        rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
        rec.put("id", i)
        rec.put("s", f"value {i} " * 3)
        writer.append(rec)
    writer.close()
    rows = list(read_ocf_rows(f))
    assert len(rows) == 500
    assert rows[0] == {"id": 0, "s": "value 0 " * 3}
    assert rows[499]["id"] == 499
