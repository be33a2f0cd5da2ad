"""Re-measure the two bench entries flagged as regressed in round 3
(`stream_ingest_100k_rows` 2.60→3.41 s, `trickle_merge_1m_plain`
0.98→1.33 s) with n repetitions each, fresh dirs per rep, same session
config as bench.py. Prints per-rep timings + min/median so noise vs.
real regression is decidable. Usage: python scripts/bench_repro.py [n]
"""

import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F

from bulker_spark.api import Engine, StreamOptions
from bulker_spark.streaming.ingest_stream import IngestStream, json_file_stream


def main(n: int) -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("bench-repro")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.files.minPartitionNum", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    events_1m = spark.range(1_000_000).select(
        F.col("id").alias("pk"),
        F.concat(F.lit("u"), (F.col("id") % 9973).cast("string")).alias("user"),
        (F.col("id") * 1.5).alias("score"),
        F.timestamp_micros(F.col("id") * 1000).alias("ts"),
    )
    trickle = spark.range(16).select(
        (F.col("id") * 61_687).alias("pk"),
        F.lit("upd").alias("user"),
        F.lit(0.0).alias("score"),
        F.timestamp_micros(F.col("id")).alias("ts"),
    )
    events_100k = spark.range(100_000).select(
        F.col("id").alias("pk"),
        F.concat(F.lit("u"), (F.col("id") % 997).cast("string")).alias("user"),
        (F.col("id") * 1.5).alias("score"),
        F.timestamp_micros(F.col("id") * 1000).alias("ts"),
    )

    plain, stream = [], []
    for rep in range(n):
        whb = tempfile.mkdtemp(prefix="repro_wh_")
        try:
            eng = Engine(spark, whb)
            eng.bulk_load(
                "bench_plain", events_1m, mode="batch",
                primary_key=["pk"], deduplicate=True,
            )
            t0 = time.time()
            eng.bulk_load(
                "bench_plain", trickle, mode="batch",
                primary_key=["pk"], deduplicate=True,
            )
            plain.append(round(time.time() - t0, 3))
        finally:
            shutil.rmtree(whb, ignore_errors=True)

        wh2 = tempfile.mkdtemp(prefix="repro_whs_")
        src = tempfile.mkdtemp(prefix="repro_src_")
        ckpt = tempfile.mkdtemp(prefix="repro_ckpt_")
        try:
            events_100k.select(
                F.to_json(F.struct("pk", "user", "score", "ts")).alias("value")
            ).coalesce(8).write.mode("overwrite").format("text").save(src)
            st = IngestStream(
                Engine(spark, wh2),
                "bench_stream",
                StreamOptions(
                    mode="batch", primary_key=["pk"], deduplicate=True,
                    timestamp_column="ts",
                ),
            )
            t0 = time.time()
            q = st.start(json_file_stream(spark, src), ckpt)
            q.awaitTermination()
            stream.append(round(time.time() - t0, 3))
        finally:
            for d in (wh2, src, ckpt):
                shutil.rmtree(d, ignore_errors=True)
        print(f"rep {rep}: trickle_plain={plain[-1]} stream_100k={stream[-1]}",
              flush=True)

    for name, xs in (("trickle_merge_1m_plain", plain),
                     ("stream_ingest_100k_rows", stream)):
        body = xs[1:] if len(xs) > 1 else xs  # drop warmup rep
        print(f"{name}: reps={xs} min={min(body)} "
              f"median={statistics.median(body)}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 6)
