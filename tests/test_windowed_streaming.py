"""Watermarked windowed aggregation over a real event stream."""

import tempfile

from pyspark.sql import functions as F

from bulker_spark.plans.queries import _events
from bulker_spark.streaming.windows import sliding_value_sum, tumbling_counts

SF = "/root/testdata/sf0.001"


def _stream_events(spark, src_dir):
    ev = _events(None or spark, SF).select("event_id", "ts", "event_type", "value")
    ev.coalesce(2).write.mode("overwrite").parquet(src_dir)
    return spark.readStream.schema(ev.schema).parquet(src_dir), ev


def test_tumbling_counts_match_batch(spark):
    src = tempfile.mkdtemp()
    out, ck = tempfile.mkdtemp(), tempfile.mkdtemp()
    stream, batch = _stream_events(spark, src)
    agg = tumbling_counts(stream, ts_col="ts", width="1 day",
                          late_threshold="1 hour", group_cols=["event_type"])
    q = (agg.writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ck)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    # append mode only finalizes windows older than the watermark; every
    # emitted window must exactly match the batch ground truth
    got = spark.read.parquet(out)
    truth = (
        batch.groupBy(F.window("ts", "1 day").alias("win"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("win.start").alias("window_start"), "event_type", "n")
    )
    j = got.alias("g").join(
        truth.alias("t"),
        on=["window_start", "event_type"],
        how="inner",
    )
    assert got.count() > 0
    mismatches = j.filter(F.col("g.n") != F.col("t.n")).count()
    assert mismatches == 0


def test_sliding_windows_overlap(spark):
    src = tempfile.mkdtemp()
    out, ck = tempfile.mkdtemp(), tempfile.mkdtemp()
    stream, batch = _stream_events(spark, src)
    agg = sliding_value_sum(stream, width="2 days", slide="1 day",
                            late_threshold="1 hour")
    q = (agg.writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ck)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    n_days = batch.select(F.to_date("ts")).distinct().count()
    # each day belongs to 2 overlapping windows → more windows than days
    assert got.count() >= n_days - 1
