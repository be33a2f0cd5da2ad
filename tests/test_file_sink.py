"""File-storage sink tests (reference: file_storage/bulker_test.go shape)."""

import glob
import os

import pytest

from bulker_spark.sinks.files import FileStorageSink


@pytest.fixture()
def sample(spark):
    return spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, name string"
    )


def test_ndjson_gzip_roundtrip(spark, sample, tmp_warehouse):
    sink = FileStorageSink(tmp_warehouse, fmt="ndjson", compression="gzip")
    path = sink.replace_table(sample, "t")
    files = glob.glob(os.path.join(path, "*.json.gz"))
    assert files, "expected gzipped ndjson part files"
    back = sink.read(spark, "t")
    assert back.count() == 3
    assert {r["name"] for r in back.collect()} == {"a", "b", "c"}


def test_csv_roundtrip(spark, sample, tmp_warehouse):
    sink = FileStorageSink(tmp_warehouse, fmt="csv", compression=None)
    sink.replace_table(sample, "t")
    back = sink.read(spark, "t")
    assert back.count() == 3
    assert set(back.columns) == {"id", "name"}


def test_replace_partition_keeps_siblings(spark, sample, tmp_warehouse):
    sink = FileStorageSink(tmp_warehouse, fmt="ndjson", compression=None)
    sink.replace_partition(sample, "t", "p1")
    sink.replace_partition(sample.limit(1), "t", "p2")
    assert sink.read(spark, "t").count() == 4
    # reload p1 with 2 rows: p2 untouched
    sink.replace_partition(sample.limit(2), "t", "p1")
    assert sink.read(spark, "t").count() == 3


def test_append_batch(spark, sample, tmp_warehouse):
    sink = FileStorageSink(tmp_warehouse, fmt="parquet", compression=None)
    sink.append_batch(sample, "t")
    sink.append_batch(sample, "t")
    assert sink.read(spark, "t").count() == 6


def test_json_array_roundtrip(spark, tmp_warehouse):
    import json

    nested = spark.createDataFrame(
        [(1, {"x": "a"}), (2, {"x": "b"}), (3, {"x": "c"})],
        "id long, obj struct<x: string>",
    )
    sink = FileStorageSink(tmp_warehouse, fmt="json_array", compression=None)
    path = sink.replace_table(nested, "t")
    # every part file is itself a valid JSON array
    parts = [p for p in glob.glob(os.path.join(path, "part-*")) if not p.endswith(".crc")]
    assert parts
    total = 0
    for p in parts:
        with open(p) as fh:
            arr = json.load(fh)
        assert isinstance(arr, list)
        total += len(arr)
    assert total == 3
    back = sink.read(spark, "t")
    assert back.count() == 3
    assert {r["obj"]["x"] for r in back.collect()} == {"a", "b", "c"}


def test_json_array_empty_partitions(spark, tmp_warehouse):
    df = spark.createDataFrame([(1,)], "id long").repartition(4)
    sink = FileStorageSink(tmp_warehouse, fmt="json_array", compression=None)
    sink.replace_table(df, "t")
    assert sink.read(spark, "t").count() == 1


def test_ndjson_flat_flattens_structs(spark, tmp_warehouse):
    nested = spark.createDataFrame(
        [(1, {"geo": {"city": "SF"}})],
        "id long, ctx struct<geo: struct<city: string>>",
    )
    sink = FileStorageSink(tmp_warehouse, fmt="ndjson_flat", compression="gzip")
    sink.replace_table(nested, "t")
    back = sink.read(spark, "t")
    assert "ctx_geo_city" in back.columns
    assert back.collect()[0]["ctx_geo_city"] == "SF"


def test_avro_roundtrip(spark, sample, tmp_warehouse):
    """Avro needs no external module: sinks/avro_ocf.py writes/reads the
    container format directly (deep coverage in test_avro_ocf.py)."""
    sink = FileStorageSink(tmp_warehouse, fmt="avro", compression="gzip")
    path = sink.replace_table(sample, "t")
    files = glob.glob(os.path.join(path, "*.avro"))
    assert files, "expected avro container part files"
    back = sink.read(spark, "t")
    assert back.count() == 3
    assert {r["name"] for r in back.collect()} == {"a", "b", "c"}


def test_json_array_multi_arrow_batch(spark, tmp_warehouse):
    """Bracket/comma decoration must survive Arrow batch boundaries inside
    one partition (the lookahead crosses batches)."""
    import json

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        df = spark.range(100).selectExpr("id", "id * 2 AS v").coalesce(2)
        sink = FileStorageSink(tmp_warehouse, fmt="json_array", compression=None)
        path = sink.replace_table(df, "t")
        parts = [
            p
            for p in glob.glob(os.path.join(path, "part-*"))
            if not p.endswith(".crc")
        ]
        assert parts
        total = 0
        for p in parts:
            with open(p) as fh:
                arr = json.load(fh)
            assert isinstance(arr, list)
            total += len(arr)
        assert total == 100
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
