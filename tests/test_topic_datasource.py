"""Spark 4 Python Data Source front (`bulker_topic`): batch + streaming
reads of an NDJSON segment directory with Kafka-like offset semantics."""

import gzip
import json
import os
import tempfile

import pytest

from bulker_spark.sources.topic_source import register_topic_source


@pytest.fixture()
def topic_dir():
    d = tempfile.mkdtemp(prefix="topic_")
    yield d
    import shutil

    shutil.rmtree(d, ignore_errors=True)


def _write_segment(d, name, events, gz=False):
    path = os.path.join(d, name)
    data = "".join(json.dumps(e) + "\n" for e in events)
    if gz:
        with gzip.open(path, "wt", encoding="utf-8") as fh:
            fh.write(data)
    else:
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(data)


def test_batch_read_segments(spark, topic_dir):
    register_topic_source(spark)
    _write_segment(topic_dir, "000001.ndjson", [{"id": i} for i in range(5)])
    _write_segment(
        topic_dir, "000002.ndjson.gz", [{"id": i} for i in range(5, 8)], gz=True
    )
    df = spark.read.format("bulker_topic").load(topic_dir)
    rows = df.collect()
    assert len(rows) == 8
    assert set(df.columns) == {"value", "_segment", "_offset"}
    by_seg = {}
    for r in rows:
        by_seg.setdefault(r["_segment"], []).append(
            (r["_offset"], json.loads(r["value"])["id"])
        )
    assert sorted(by_seg["000001.ndjson"]) == [(i, i) for i in range(5)]
    assert sorted(by_seg["000002.ndjson.gz"]) == [
        (i, v) for i, v in enumerate(range(5, 8))
    ]


def test_batch_read_ignores_non_segments(spark, topic_dir):
    register_topic_source(spark)
    _write_segment(topic_dir, "000001.ndjson", [{"id": 1}])
    with open(os.path.join(topic_dir, "_meta"), "w") as fh:
        fh.write("not a segment")
    df = spark.read.format("bulker_topic").load(topic_dir)
    assert df.count() == 1


def test_stream_resumes_from_checkpoint(spark, topic_dir):
    """Offset-after-commit: a restarted query reads ONLY segments/lines
    appended since the last committed micro-batch."""
    register_topic_source(spark)
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    out1 = tempfile.mkdtemp(prefix="out_")
    _write_segment(topic_dir, "000001.ndjson", [{"id": i} for i in range(10)])

    def run(outdir):
        q = (
            spark.readStream.format("bulker_topic")
            .load(topic_dir)
            .writeStream.format("parquet")
            .option("path", outdir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run(out1)
    got1 = spark.read.parquet(out1).count()
    assert got1 == 10

    # append a new segment; restart picks up only it
    _write_segment(topic_dir, "000002.ndjson", [{"id": i} for i in range(3)])
    run(out1)
    df = spark.read.parquet(out1)
    assert df.count() == 13
    segs = {r["_segment"] for r in df.select("_segment").distinct().collect()}
    assert segs == {"000001.ndjson", "000002.ndjson"}


def test_stream_rate_limit_bounds_trigger(spark, topic_dir):
    """maxLinesPerTrigger splits the backlog into multiple micro-batches
    without losing or duplicating lines."""
    register_topic_source(spark)
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    out = tempfile.mkdtemp(prefix="out_")
    _write_segment(topic_dir, "a.ndjson", [{"id": i} for i in range(7)])
    _write_segment(topic_dir, "b.ndjson", [{"id": i} for i in range(7, 12)])

    q = (
        spark.readStream.format("bulker_topic")
        .option("maxLinesPerTrigger", 4)
        .load(topic_dir)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    df = spark.read.parquet(out)
    ids = sorted(json.loads(r["value"])["id"] for r in df.collect())
    assert ids == list(range(12))
    # the run actually split into >1 micro-batch
    offsets = os.listdir(os.path.join(ckpt, "offsets"))
    assert len(offsets) > 1


def test_topic_into_engine_ingest(spark, topic_dir):
    """End-to-end: bulker_topic stream → IngestStream → warehouse, the
    reference's Kafka→consumer→warehouse path on the Python data source."""
    from bulker_spark.api import Engine, StreamOptions
    from bulker_spark.streaming.ingest_stream import IngestStream

    register_topic_source(spark)
    wh = tempfile.mkdtemp(prefix="wh_")
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    _write_segment(
        topic_dir,
        "000001.ndjson",
        [{"messageId": i, "type": "click", "n": i} for i in range(20)]
        + [{"messageId": 5, "type": "click", "n": 99}],  # dup key
    )
    stream_df = (
        spark.readStream.format("bulker_topic").load(topic_dir).select("value")
    )
    engine = Engine(spark, wh)
    q = IngestStream(
        engine,
        "events",
        StreamOptions(mode="batch", primary_key=["messageId"], deduplicate=True),
    ).start(stream_df, ckpt)
    q.awaitTermination()
    df = engine.warehouse.read("events")
    assert df.count() == 20  # deduped
    got = {r["messageId"]: r["n"] for r in df.collect()}
    assert got[5] == 99  # last wins


def test_write_then_read_roundtrip(spark, topic_dir):
    """Produce side: df.write.format('bulker_topic') publishes segments
    atomically; a reader sees all rows, and no temp files remain."""
    from pyspark.sql import functions as F

    register_topic_source(spark)
    df = spark.range(100).select(
        F.to_json(F.struct(F.col("id"))).alias("value")
    )
    df.write.format("bulker_topic").mode("append").save(topic_dir)
    back = spark.read.format("bulker_topic").load(topic_dir)
    assert back.count() == 100
    ids = sorted(json.loads(r["value"])["id"] for r in back.collect())
    assert ids == list(range(100))
    assert not [f for f in os.listdir(topic_dir) if f.endswith(".tmp")]

    # append accumulates; overwrite replaces
    df.limit(5).write.format("bulker_topic").mode("append").save(topic_dir)
    assert spark.read.format("bulker_topic").load(topic_dir).count() == 105
    df.limit(7).write.format("bulker_topic").mode("overwrite").save(topic_dir)
    assert spark.read.format("bulker_topic").load(topic_dir).count() == 7


def test_write_producer_feeds_stream_consumer(spark, topic_dir):
    """Full topology: producer write → stream consumer picks up only the
    newly published segments (offset resume across publishes)."""
    import tempfile

    from pyspark.sql import functions as F

    register_topic_source(spark)
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    out = tempfile.mkdtemp(prefix="out_")

    def produce(lo, hi):
        (
            spark.range(lo, hi)
            .select(F.to_json(F.struct(F.col("id"))).alias("value"))
            .coalesce(1)
            .write.format("bulker_topic")
            .mode("append")
            .save(topic_dir)
        )

    def consume():
        q = (
            spark.readStream.format("bulker_topic")
            .load(topic_dir)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    produce(0, 10)
    consume()
    produce(10, 15)
    consume()
    df = spark.read.parquet(out)
    ids = sorted(json.loads(r["value"])["id"] for r in df.collect())
    assert ids == list(range(15))


def test_stream_write_topic_relay(spark, topic_dir):
    """Streaming produce: a stream relayed INTO a bulker_topic dir lands
    one committed segment set per micro-batch, readable by the batch and
    stream consumers (topic → transform → topic, the reference's
    Kafka-to-Kafka relay shape)."""
    import tempfile

    register_topic_source(spark)
    src_topic = tempfile.mkdtemp(prefix="topic_src_")
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    _write_segment(src_topic, "a.ndjson", [{"id": i} for i in range(8)])

    q = (
        spark.readStream.format("bulker_topic")
        .load(src_topic)
        .select("value")
        .writeStream.format("bulker_topic")
        .option("path", topic_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.read.format("bulker_topic").load(topic_dir)
    ids = sorted(json.loads(r["value"])["id"] for r in out.collect())
    assert ids == list(range(8))
    assert not [f for f in os.listdir(topic_dir) if f.endswith(".tmp")]

    # second publish appends new segments, no duplication of the first
    _write_segment(src_topic, "b.ndjson", [{"id": i} for i in range(8, 11)])
    q = (
        spark.readStream.format("bulker_topic")
        .load(src_topic)
        .select("value")
        .writeStream.format("bulker_topic")
        .option("path", topic_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.read.format("bulker_topic").load(topic_dir)
    ids = sorted(json.loads(r["value"])["id"] for r in out.collect())
    assert ids == list(range(11))
