"""Interleaved A/B of the size-aware ingest redistribution (r09): times
the stream-shaped JSON load and the trickle merge with
spark.bulker.ingest.bytesPerTask toggled between 0 (old behavior: always
fan out to defaultParallelism) and the default 4 MiB, in ONE session,
alternating arms per rep so host drift hits both equally.

Usage: python scripts/ab_ingest.py [--reps N]
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from bulker_spark.api import Engine


def main() -> None:
    reps = 4
    args = sys.argv[1:]
    if args and args[0] == "--reps":
        reps = int(args[1])
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ab-ingest")
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

    events = spark.range(100_000).select(
        F.col("id").alias("pk"),
        F.concat(F.lit("u"), (F.col("id") % 997).cast("string")).alias("user"),
        (F.col("id") * 1.5).alias("score"),
        F.timestamp_micros(F.col("id") * 1000).alias("ts"),
    )
    src = tempfile.mkdtemp(prefix="ab_ingest_src_")
    events.select(
        F.to_json(F.struct("pk", "user", "score", "ts")).alias("value")
    ).coalesce(8).write.mode("overwrite").format("text").save(src)

    def load_json_once() -> float:
        wh = tempfile.mkdtemp(prefix="ab_ingest_wh_")
        try:
            eng = Engine(spark, wh)
            st = eng.create_stream(
                "s", mode="batch", primary_key=["pk"], deduplicate=True,
                timestamp_column="ts",
            )
            t0 = time.time()
            st.consume_dataframe_json(spark.read.text(src))
            st.complete()
            return time.time() - t0
        finally:
            shutil.rmtree(wh, ignore_errors=True)

    # warmup
    spark.conf.set("spark.bulker.ingest.bytesPerTask", "0")
    load_json_once()

    out = {"old": [], "new": []}
    for _ in range(reps):
        spark.conf.set("spark.bulker.ingest.bytesPerTask", "0")
        out["old"].append(round(load_json_once(), 3))
        spark.conf.set("spark.bulker.ingest.bytesPerTask", str(4 << 20))
        out["new"].append(round(load_json_once(), 3))
    print(json.dumps({
        "json_load_100k": {
            arm: {"min": min(v), "all": v} for arm, v in out.items()
        }
    }))
    shutil.rmtree(src, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
