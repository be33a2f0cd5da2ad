"""Avro OCF writer/reader tests (reference: ``bulkerlib/types/avro.go``,
``avro_test.go`` shape — schema from typed rows, nullable unions, logical
timestamp; the BigQuery loader consumes these files,
``implementations/sql/bigquery.go:75-90``).

The decisive check is `test_jvm_avro_reads_our_files`: the bundled JVM
``org.apache.avro`` library (on every Spark classpath) reads a file this
writer produced — an INDEPENDENT implementation agreeing byte-level on
the container format, codec, and binary encoding."""

import datetime as dt
import decimal
import glob
import os

import pytest

from bulker_spark.sinks.avro_ocf import (
    decode_long,
    encode_long,
    read_avro,
    read_ocf_rows,
    spark_to_avro_schema,
    write_avro,
)
from bulker_spark.sinks.files import FileStorageSink


def test_zigzag_varint_known_vectors():
    # spec examples: 0→00, -1→01, 1→02, -2→03, 2→04; 64→80 01
    for n, expect in [(0, b"\x00"), (-1, b"\x01"), (1, b"\x02"),
                      (-2, b"\x03"), (2, b"\x04"), (64, b"\x80\x01"),
                      (-(2**63), b"\xff" * 9 + b"\x01"),
                      (2**63 - 1, b"\xfe" + b"\xff" * 8 + b"\x01")]:
        out = bytearray()
        encode_long(n, out)
        assert bytes(out) == expect, n
        back, pos = decode_long(bytes(out), 0)
        assert back == n and pos == len(out)


@pytest.fixture()
def typed_df(spark):
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("score", T.DoubleType(), True),
        T.StructField("ok", T.BooleanType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("day", T.DateType(), True),
        T.StructField("amount", T.DecimalType(12, 2), True),
        T.StructField("blob", T.BinaryType(), True),
        T.StructField("tags", T.ArrayType(T.StringType(), True), True),
        T.StructField("attrs", T.MapType(T.StringType(), T.LongType(), True), True),
        T.StructField("geo", T.StructType([
            T.StructField("city", T.StringType(), True),
            T.StructField("seen", T.TimestampType(), True),
        ]), True),
    ])
    rows = [
        (1, "a", 1.5, True,
         dt.datetime(2024, 1, 2, 3, 4, 5, 123456), dt.date(2024, 1, 2),
         decimal.Decimal("12.34"), b"\x00\x01", ["x", None, "y"],
         {"k": 7, "n": None}, ("SF", dt.datetime(2024, 2, 1))),
        (2, None, None, None, None, None, None, None, None, None, None),
        (3, "c", -0.25, False,
         dt.datetime(1969, 12, 31, 23, 59, 59), dt.date(1969, 12, 31),
         decimal.Decimal("-0.01"), b"", [], {}, (None, None)),
    ]
    return spark.createDataFrame(rows, schema)


def test_roundtrip_all_types(spark, typed_df, tmp_warehouse):
    path = os.path.join(tmp_warehouse, "t")
    n = write_avro(typed_df, path, codec="deflate")
    assert n == 3
    back = read_avro(spark, path)
    assert back.schema == typed_df.schema
    a = sorted(typed_df.collect(), key=lambda r: r["id"])
    b = sorted(back.collect(), key=lambda r: r["id"])
    assert a == b


def test_roundtrip_null_codec(spark, typed_df, tmp_warehouse):
    path = os.path.join(tmp_warehouse, "t")
    write_avro(typed_df, path, codec="null")
    assert read_avro(spark, path).count() == 3


def test_unknown_codec_raises(spark, typed_df, tmp_warehouse):
    with pytest.raises(NotImplementedError, match="zstandard"):
        write_avro(typed_df, os.path.join(tmp_warehouse, "t"),
                   codec="zstandard")


def test_block_flush_large_file(spark, tmp_warehouse):
    """More rows than one block (4096) in one partition — multi-block
    container, each block independently deflated and sync-framed."""
    df = spark.range(10000).coalesce(1).selectExpr(
        "id", "repeat('x', 50) AS pad"
    )
    path = os.path.join(tmp_warehouse, "t")
    write_avro(df, path, codec="deflate")
    files = glob.glob(os.path.join(path, "*.avro"))
    assert len(files) == 1
    rows = list(read_ocf_rows(files[0]))
    assert len(rows) == 10000
    assert {r["id"] for r in rows} == set(range(10000))


def test_one_file_per_partition(spark, tmp_warehouse):
    df = spark.range(100).repartition(4)
    path = os.path.join(tmp_warehouse, "t")
    write_avro(df, path)
    assert len(glob.glob(os.path.join(path, "*.avro"))) == 4
    assert read_avro(spark, path).count() == 100


def test_part_names_deterministic_by_partition(spark, tmp_warehouse):
    """The publish name is a function of the partition id (plus the
    per-call run id), NOT the task attempt: a retried/speculative task
    republishes the same path instead of adding a duplicate file."""
    df = spark.range(100).repartition(4)
    path = os.path.join(tmp_warehouse, "t")
    write_avro(df, path)
    names = sorted(os.path.basename(p)
                   for p in glob.glob(os.path.join(path, "*.avro")))
    # one file per partition, suffixed by the zero-padded partition id
    suffixes = sorted(n.rsplit("-", 1)[1] for n in names)
    assert suffixes == ["00000.avro", "00001.avro", "00002.avro",
                        "00003.avro"]
    # no stray staging files survive the publish
    assert not glob.glob(os.path.join(path, "*.tmp"))


def test_read_rejects_mixed_schemas(spark, tmp_warehouse):
    """A directory holding files of two different schemas must fail
    loudly — never silently project the second file through the first
    file's columns."""
    import pytest

    path = os.path.join(tmp_warehouse, "t")
    write_avro(spark.range(5).selectExpr("id", "id * 2 AS a"), path)
    write_avro(
        spark.range(5).selectExpr("id", "CAST(id AS STRING) AS b"),
        path, mode="append",
    )
    with pytest.raises(ValueError, match="schema mismatch"):
        read_avro(spark, path)


def test_sink_roundtrip_and_append(spark, tmp_warehouse):
    sample = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, name string"
    )
    sink = FileStorageSink(tmp_warehouse, fmt="avro", compression="gzip")
    p = sink.replace_table(sample, "t")
    assert glob.glob(os.path.join(p, "*.avro"))
    assert sink.read(spark, "t").count() == 3
    sink.append_batch(sample, "t")
    assert sink.read(spark, "t").count() == 6
    # replace clears prior batches
    sink.replace_table(sample.limit(1), "t")
    assert sink.read(spark, "t").count() == 1


def test_sink_replace_partition(spark, tmp_warehouse):
    sample = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, name string"
    )
    sink = FileStorageSink(tmp_warehouse, fmt="avro", compression=None)
    sink.replace_partition(sample, "t", "p1")
    sink.replace_partition(sample.limit(1), "t", "p2")
    assert sink.read(spark, "t").count() == 4
    sink.replace_partition(sample.limit(2), "t", "p1")
    assert sink.read(spark, "t").count() == 3


def test_jvm_avro_reads_our_files(spark, typed_df, tmp_warehouse):
    """Cross-validate with the INDEPENDENT Java Avro implementation
    bundled on Spark's classpath: DataFileReader + GenericDatumReader
    must parse our container, codec and row encoding and agree on
    values."""
    path = os.path.join(tmp_warehouse, "t")
    write_avro(typed_df.coalesce(1), path, codec="deflate")
    f = glob.glob(os.path.join(path, "*.avro"))[0]
    jvm = spark._jvm
    jfile = jvm.java.io.File(f)
    reader = jvm.org.apache.avro.file.DataFileReader(
        jfile, jvm.org.apache.avro.generic.GenericDatumReader()
    )
    try:
        got = {}
        while reader.hasNext():
            rec = reader.next()
            rid = rec.get("id")
            name = rec.get("name")
            got[rid] = None if name is None else str(name)
        assert got == {1: "a", 2: None, 3: "c"}
        # schema the JVM parsed matches what we wrote
        jschema = reader.getSchema()
        assert jschema.getField("ts") is not None
        ts_branches = jschema.getField("ts").schema().getTypes()
        logical = [b.getLogicalType().getName()
                   for b in ts_branches if str(b.getType()) != "NULL"]
        assert logical == ["timestamp-micros"]
    finally:
        reader.close()


def test_jvm_avro_agrees_on_timestamp_value(spark, tmp_warehouse):
    """The logical timestamp survives an independent decode: JVM reads
    the exact epoch-micros we encoded."""
    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 2, 3, 4, 5, 123456))], "id long, ts timestamp"
    )
    path = os.path.join(tmp_warehouse, "t")
    write_avro(df.coalesce(1), path, codec="null")
    f = glob.glob(os.path.join(path, "*.avro"))[0]
    jvm = spark._jvm
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(f), jvm.org.apache.avro.generic.GenericDatumReader()
    )
    try:
        rec = reader.next()
        expect = int(dt.datetime(2024, 1, 2, 3, 4, 5, 123456, dt.timezone.utc)
                     .timestamp() * 1_000_000)
        assert rec.get("ts") == expect
    finally:
        reader.close()


def test_schema_mapping_shapes(typed_df):
    avro = spark_to_avro_schema(typed_df.schema)
    by_name = {f["name"]: f for f in avro["fields"]}
    assert by_name["id"]["type"] == "long"  # non-nullable: no union
    assert by_name["name"]["type"] == ["null", "string"]
    assert by_name["ts"]["type"][1]["logicalType"] == "timestamp-micros"
    assert by_name["day"]["type"][1]["logicalType"] == "date"
    dec = by_name["amount"]["type"][1]
    assert (dec["logicalType"], dec["precision"], dec["scale"]) == ("decimal", 12, 2)
    assert by_name["tags"]["type"][1]["items"] == ["null", "string"]
    assert by_name["geo"]["type"][1]["type"] == "record"


def test_timestamp_ntz_roundtrip(spark, tmp_warehouse):
    """TimestampNTZ maps to avro local-timestamp-micros: the wall clock
    survives the roundtrip and the schema restores as NTZ, not TZ."""
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("id", T.LongType(), False),
        T.StructField("ts", T.TimestampNTZType(), True),
    ])
    wall = dt.datetime(2024, 6, 1, 12, 30, 0, 250000)
    df = spark.createDataFrame([(1, wall)], schema)
    path = os.path.join(tmp_warehouse, "t")
    write_avro(df, path, codec="null")
    avro = spark_to_avro_schema(df.schema)
    assert avro["fields"][1]["type"][1]["logicalType"] == "local-timestamp-micros"
    back = read_avro(spark, path)
    assert back.schema == schema
    assert back.collect()[0]["ts"] == wall
    # wire value is the wall clock read as UTC — session-tz independent
    f = glob.glob(os.path.join(path, "*.avro"))[0]
    (row,) = read_ocf_rows(f)
    expect = int(wall.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
    assert row["ts"] == expect


def test_timestamp_ntz_non_utc_session(spark, tmp_warehouse):
    """The NTZ wall clock must survive in ANY session timezone — the
    wire shift and its inverse must cancel, not double (a +9 session
    would otherwise write walls 18h off and break external consumers)."""
    from pyspark.sql import types as T

    spark.conf.set("spark.sql.session.timeZone", "Asia/Seoul")
    try:
        schema = T.StructType([
            T.StructField("id", T.LongType(), False),
            T.StructField("ts", T.TimestampNTZType(), True),
        ])
        wall = dt.datetime(2024, 6, 1, 12, 30, 0)
        df = spark.createDataFrame([(1, wall)], schema)
        path = os.path.join(tmp_warehouse, "t")
        write_avro(df, path, codec="null")
        f = glob.glob(os.path.join(path, "*.avro"))[0]
        (row,) = read_ocf_rows(f)
        expect = int(
            wall.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000
        )
        assert row["ts"] == expect  # wire = wall-as-UTC, tz-independent
        assert read_avro(spark, path).collect()[0]["ts"] == wall
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def test_timestamp_ntz_dst_gap(spark, tmp_warehouse):
    """A wall clock inside the session zone's spring-forward gap (a
    nonexistent LOCAL time, but a perfectly valid NTZ value) must
    survive unchanged — the wire conversion is field-based, so no zone
    resolution ever touches it."""
    from pyspark.sql import types as T

    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        schema = T.StructType([
            T.StructField("id", T.LongType(), False),
            T.StructField("ts", T.TimestampNTZType(), True),
        ])
        wall = dt.datetime(2024, 3, 10, 2, 30, 7, 123456)  # in the gap
        df = spark.createDataFrame([(1, wall)], schema)
        path = os.path.join(tmp_warehouse, "t")
        write_avro(df, path, codec="null")
        f = glob.glob(os.path.join(path, "*.avro"))[0]
        (row,) = read_ocf_rows(f)
        expect = int(
            wall.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000
        )
        assert row["ts"] == expect
        assert read_avro(spark, path).collect()[0]["ts"] == wall
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def test_read_foreign_timestamp_millis(spark, tmp_warehouse):
    """Files from other writers may use timestamp-millis; the decoder
    normalizes to micros so restored values are identical."""
    import json

    from bulker_spark.sinks.avro_ocf import OCFWriter

    schema = {
        "type": "record", "name": "row",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "ts",
             "type": {"type": "long", "logicalType": "timestamp-millis"}},
        ],
    }
    path = os.path.join(tmp_warehouse, "t")
    os.makedirs(path)
    f = os.path.join(path, "part-0.avro")
    with open(f, "wb") as fh:
        w = OCFWriter(fh, schema, codec="null")
        out = w._buf
        encode_long(7, out)
        encode_long(1704164645123, out)  # 2024-01-02T03:04:05.123Z
        w._count = 1
        w.close()
    json.dumps(schema)  # sanity: serializable
    back = read_avro(spark, path).collect()
    assert back[0]["id"] == 7
    assert back[0]["ts"] == dt.datetime(2024, 1, 2, 3, 4, 5, 123000)


def test_empty_write_stays_readable(spark, tmp_warehouse):
    """Zero-row write lands a header-only container: the table and its
    schema survive (matching the other formats' empty-write behavior),
    and an emptied partition dir can't fail the whole table read."""
    empty = spark.createDataFrame([], "id long, name string")
    sink = FileStorageSink(tmp_warehouse, fmt="avro", compression=None)
    sink.replace_table(empty, "t")
    back = sink.read(spark, "t")
    assert back.count() == 0
    assert back.columns == ["id", "name"]
    # partitioned: one populated + one empty partition → only the
    # populated one contributes rows, no FileNotFoundError
    data = spark.createDataFrame([(1, "a")], "id long, name string")
    sink.replace_partition(data, "t2", "A")
    sink.replace_partition(empty, "t2", "B")
    assert sink.read(spark, "t2").count() == 1


def test_timestamp_max_sentinel_roundtrip(spark, tmp_warehouse):
    """9999-12-31 23:59:59.999999 — the ubiquitous max-datetime sentinel.
    Day-splitting the wire long in double arithmetic misrounds past year
    2255 (hour -1, DATETIME_FIELD_OUT_OF_BOUNDS under ANSI); the split
    must be exact integer arithmetic."""
    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("ts", T.TimestampNTZType(), True)])
    for wall in (dt.datetime(9999, 12, 31, 23, 59, 59, 999999),
                 dt.datetime(2255, 6, 5, 23, 59, 59, 999999),
                 dt.datetime(1684, 7, 27, 0, 0, 0, 1)):
        df = spark.createDataFrame([(wall,)], schema)
        path = os.path.join(tmp_warehouse, "t")
        write_avro(df, path, codec="null", mode="overwrite")
        assert read_avro(spark, path).collect()[0]["ts"] == wall, wall


def test_foreign_enum_fixed_roundtrip(spark, tmp_warehouse):
    """Foreign Avro enum/fixed: a JVM-written file reads into Spark
    (enum -> string, fixed -> binary), and writing it back with the
    foreign header schema re-encodes REAL enum indexes / fixed bytes —
    verified by the independent Java reader parsing our output."""
    jvm = spark._jvm
    schema_json = (
        '{"type":"record","name":"r","fields":['
        '{"name":"id","type":"long"},'
        '{"name":"color","type":{"type":"enum","name":"Color",'
        '"symbols":["RED","GREEN","BLUE"]}},'
        '{"name":"tag","type":{"type":"fixed","name":"Tag","size":4}}]}'
    )
    schema = jvm.org.apache.avro.Schema.Parser().parse(schema_json)
    src = os.path.join(tmp_warehouse, "jvm_enum.avro")
    writer = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    )
    writer.create(schema, jvm.java.io.File(src))
    colors = ["RED", "GREEN", "BLUE"]
    fixed_schema = schema.getField("tag").schema()
    for i in range(9):
        rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
        rec.put("id", i)
        rec.put("color", jvm.org.apache.avro.generic.GenericData.EnumSymbol(
            schema.getField("color").schema(), colors[i % 3]))
        rec.put("tag", jvm.org.apache.avro.generic.GenericData.Fixed(
            fixed_schema, bytes([i, i, i, i])))
        writer.append(rec)
    writer.close()

    # our reader: enum -> string, fixed -> binary
    from bulker_spark.sinks.avro_ocf import read_ocf_header
    rows = list(read_ocf_rows(src))
    assert rows[4] == {"id": 4, "color": "GREEN", "tag": bytes([4] * 4)}
    with open(src, "rb") as fh:
        foreign_schema, _, _, _ = read_ocf_header(fh)

    # write back under the FOREIGN schema
    df = spark.createDataFrame(
        [(r["id"], r["color"], r["tag"]) for r in rows],
        "id long, color string, tag binary",
    ).coalesce(1)
    out = os.path.join(tmp_warehouse, "ours_enum")
    write_avro(df, out, codec="null", avro_schema=foreign_schema)

    # the independent Java reader sees true enum/fixed values
    f = glob.glob(os.path.join(out, "*.avro"))[0]
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(f), jvm.org.apache.avro.generic.GenericDatumReader()
    )
    try:
        assert str(reader.getSchema().getField("color").schema().getType()) \
            == "ENUM"
        got = {}
        while reader.hasNext():
            rec = reader.next()
            got[rec.get("id")] = str(rec.get("color"))
        assert got == {i: colors[i % 3] for i in range(9)}
    finally:
        reader.close()
    # and our own reader round-trips it too
    back = {r["id"]: (r["color"], r["tag"]) for r in read_ocf_rows(f)}
    assert back[7] == ("GREEN", bytes([7] * 4))


def test_enum_fixed_write_validation(spark, tmp_warehouse):
    import pytest

    foreign = {
        "type": "record", "name": "r", "fields": [
            {"name": "color",
             "type": {"type": "enum", "name": "C", "symbols": ["A", "B"]}},
        ],
    }
    df = spark.createDataFrame([("Z",)], "color string").coalesce(1)
    with pytest.raises(Exception, match="not a symbol"):
        write_avro(df, os.path.join(tmp_warehouse, "bad"),
                   codec="null", avro_schema=foreign)
    # mismatched field list fails on the driver
    df2 = spark.createDataFrame([("A", 1)], "color string, extra long")
    with pytest.raises(ValueError, match="do not match"):
        write_avro(df2, os.path.join(tmp_warehouse, "bad2"),
                    avro_schema=foreign)


def test_nested_record_reorder_rejected(spark, tmp_warehouse):
    """A declared avro_schema whose NESTED record fields are reordered
    must fail at write time — the encoder walks the Spark struct order,
    so a reordered declaration would silently write garbage bytes."""
    import pytest
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("geo", T.StructType([
            T.StructField("a", T.StringType(), False),
            T.StructField("b", T.LongType(), False),
        ]), False),
    ])
    df = spark.createDataFrame([(("x", 1),)], schema)
    declared = {
        "type": "record", "name": "r", "fields": [
            {"name": "geo", "type": {
                "type": "record", "name": "geo", "fields": [
                    {"name": "b", "type": "long"},
                    {"name": "a", "type": "string"},
                ]}},
        ],
    }
    with pytest.raises(ValueError, match="geo"):
        write_avro(df, os.path.join(tmp_warehouse, "bad"),
                   avro_schema=declared)
