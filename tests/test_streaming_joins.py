"""Stream enrichment joins over real testdata."""

import tempfile

from pyspark.sql import functions as F

from bulker_spark.plans.queries import _events
from bulker_spark.streaming.joins import enrich_static, join_streams

SF = "/root/testdata/sf0.001"


def test_enrich_static_broadcast(spark):
    src, out, ck = tempfile.mkdtemp(), tempfile.mkdtemp(), tempfile.mkdtemp()
    ev = _events(spark, SF).select("event_id", "user_id", "ts", "value")
    ev.coalesce(2).write.mode("overwrite").parquet(src)
    dim = spark.read.parquet(f"{SF}/customer.parquet").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    stream = spark.readStream.schema(ev.schema).parquet(src)
    enriched = enrich_static(stream, dim, on=["user_id"])
    q = (enriched.writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == ev.count()  # left join keeps every event
    matched = got.filter(F.col("c_mktsegment").isNotNull()).count()
    assert matched > 0  # user ids overlap the customer keyspace


def test_join_streams_time_bounded(spark):
    src1, src2 = tempfile.mkdtemp(), tempfile.mkdtemp()
    out, ck = tempfile.mkdtemp(), tempfile.mkdtemp()
    ev = _events(spark, SF).filter("user_id < 5")
    a = ev.select("user_id", F.col("ts").alias("a_ts"), "event_id")
    b = ev.select("user_id", F.col("ts").alias("b_ts"),
                  F.col("event_id").alias("b_event_id"))
    a.coalesce(1).write.mode("overwrite").parquet(src1)
    b.coalesce(1).write.mode("overwrite").parquet(src2)
    sa = spark.readStream.schema(a.schema).parquet(src1)
    sb = spark.readStream.schema(b.schema).parquet(src2)
    joined = join_streams(sa, sb, on="user_id", left_ts="a_ts",
                          right_ts="b_ts", tolerance="1 hour")
    q = (joined.writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = spark.read.parquet(out)
    n = got.count()
    assert n > 0
    # every pair honors the time bound
    bad = got.filter(
        F.abs(F.col("a_ts").cast("long") - F.col("b_ts").cast("long")) > 3600
    ).count()
    assert bad == 0
    # batch ground truth: same join as a static query
    truth = (
        a.alias("l").join(
            b.alias("r"),
            (F.col("l.user_id") == F.col("r.user_id"))
            & (F.col("r.b_ts") >= F.col("l.a_ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("r.b_ts") <= F.col("l.a_ts") + F.expr("INTERVAL 1 HOUR")),
        ).count()
    )
    assert n == truth
