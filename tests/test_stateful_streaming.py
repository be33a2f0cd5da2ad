"""Stateful streaming operator tests: cross-batch dedup via
applyInPandasWithState with a file-stream source."""

import json
import os
import shutil
import tempfile

import pytest

from bulker_spark.streaming.stateful import streaming_dedup


@pytest.fixture()
def dirs():
    d = [tempfile.mkdtemp(prefix=f"st_{i}_") for i in range(3)]
    yield d
    for x in d:
        shutil.rmtree(x, ignore_errors=True)


def _write_batch(src, name, rows):
    with open(os.path.join(src, name), "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


def _run_available_now(spark, src, ckpt, out):
    stream = (
        spark.readStream.schema("id LONG, v STRING")
        .json(src)
    )
    deduped = streaming_dedup(stream, ["id"])
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_streaming_dedup_across_batches(spark, dirs):
    src, ckpt, out = dirs
    _write_batch(src, "b1.ndjson", [
        {"id": 1, "v": "a"},
        {"id": 1, "v": "a-dup"},
        {"id": 2, "v": "b"},
    ])
    _run_available_now(spark, src, ckpt, out)
    got = {r["id"]: r["v"] for r in spark.read.parquet(out).collect()}
    assert got == {1: "a", 2: "b"}

    # second run: same checkpoint -> state remembers ids 1 and 2
    _write_batch(src, "b2.ndjson", [
        {"id": 2, "v": "b-dup"},
        {"id": 3, "v": "c"},
    ])
    _run_available_now(spark, src, ckpt, out)
    got = {r["id"]: r["v"] for r in spark.read.parquet(out).collect()}
    assert got == {1: "a", 2: "b", 3: "c"}


def test_streaming_dedup_native_within_watermark(spark, dirs):
    """JVM-native cross-batch dedup: withWatermark +
    dropDuplicatesWithinWatermark keeps the first arrival of each key
    across micro-batches while the key is inside the watermark delay."""
    from bulker_spark.streaming.stateful import streaming_dedup_native

    src, ckpt, out = dirs
    _write_batch(src, "b1.ndjson", [
        {"id": 1, "v": "a", "ts": "2024-01-01T10:00:00Z"},
        {"id": 1, "v": "a-dup", "ts": "2024-01-01T10:00:01Z"},
        {"id": 2, "v": "b", "ts": "2024-01-01T10:00:02Z"},
    ])

    def run():
        stream = (
            spark.readStream.schema("id LONG, v STRING, ts TIMESTAMP")
            .json(src)
        )
        deduped = streaming_dedup_native(stream, ["id"], "ts")
        q = (
            deduped.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run()
    got = {r["id"]: r["v"] for r in spark.read.parquet(out).collect()}
    assert got == {1: "a", 2: "b"}
    # second run, same checkpoint: engine state remembers ids 1 and 2
    _write_batch(src, "b2.ndjson", [
        {"id": 2, "v": "b-dup", "ts": "2024-01-01T10:00:03Z"},
        {"id": 3, "v": "c", "ts": "2024-01-01T10:00:04Z"},
    ])
    run()
    got = {r["id"]: r["v"] for r in spark.read.parquet(out).collect()}
    assert got == {1: "a", 2: "b", 3: "c"}
