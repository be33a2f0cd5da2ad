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
