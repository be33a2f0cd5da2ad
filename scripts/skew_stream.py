"""Streaming-path skew audit on the Zipf fixture (verdict r7 #7).

The batch catalog's per-user windows are hot-key-proofed
(``operators/hotkey.py``); the STREAMING twins still group by raw key
per micro-batch: ``streaming_sessionize`` keys state on ``user_id``
(the bot-user hazard), ``streaming_dedup``/``streaming_dedup_native``
key on the PK (unique by contract — no skew expected), and the ingest
``foreachBatch`` cycle's in-batch dedup is already the map-side
``max_by`` aggregate. This harness MEASURES all three through real
micro-batches of the Zipf fixture (one bot user owning 50% of 2M
events) instead of assuming, mirroring ``skew_stress.py``'s
REST-taskSummary method: worst-stage max/median task time across the
whole streaming run.

Usage: python scripts/skew_stream.py [fixture_dir]   (default
/tmp/skewdata; run gen_skew.py first). Prints a markdown table for
SCALING.md.
"""

import glob
import json
import shutil
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

QUANTS = "0.0,0.5,1.0"
PORT = 4056


def _get(base: str, path: str):
    with urllib.request.urlopen(f"{base}{path}", timeout=30) as r:
        return json.loads(r.read())


def stage_skew(base: str, app_id: str, after_stage: int) -> dict:
    stages = _get(base, f"/api/v1/applications/{app_id}/stages?status=complete")
    worst = {
        "stage": None,
        "time_ratio": 0.0,
        "max_task_ms": 0,
        "med_task_ms": 0,
        "n_tasks": 0,
    }
    last = after_stage
    for st in stages:
        sid = st["stageId"]
        last = max(last, sid)
        if sid <= after_stage or st["numCompleteTasks"] < 2:
            continue
        try:
            summ = _get(
                base,
                f"/api/v1/applications/{app_id}/stages/{sid}/"
                f"{st['attemptId']}/taskSummary?quantiles={QUANTS}",
            )
        except Exception:
            continue
        run = summ.get("executorRunTime") or [0, 0, 0]
        med_t, max_t = max(run[1], 1.0), run[2]
        # ignore trivial stages: a 3 ms max task at 10x ratio is noise
        if max_t < 50:
            continue
        ratio_t = max_t / med_t
        if ratio_t > worst["time_ratio"]:
            worst.update(
                stage=sid,
                time_ratio=round(ratio_t, 1),
                max_task_ms=int(max_t),
                med_task_ms=int(med_t),
                n_tasks=st["numCompleteTasks"],
            )
    worst["last_stage"] = last
    return worst


def run_sessionize(spark, fixture: str, work: str) -> None:
    from bulker_spark.streaming.stateful import (
        drain_and_stop,
        streaming_sessionize,
    )

    schema = spark.read.parquet(f"{fixture}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "4")
        .parquet(f"{fixture}/events.parquet")
    )
    sessions = streaming_sessionize(stream, "user_id", "ts")
    q = (
        sessions.writeStream.format("noop")
        .option("checkpointLocation", f"{work}/ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    # processing-time timeouts never self-terminate under availableNow
    # (stateful.py module docstring — this harness's round-8 run is what
    # CAUGHT that); drain explicitly
    drain_and_stop(q, timeout_s=560)


def run_sessionize_event_time(spark, fixture: str, work: str) -> None:
    from bulker_spark.streaming.stateful import (
        drain_and_stop,
        streaming_sessionize_event_time,
    )

    schema = spark.read.parquet(f"{fixture}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "4")
        .parquet(f"{fixture}/events.parquet")
    )
    sessions = streaming_sessionize_event_time(stream, "user_id", "ts")
    q = (
        sessions.writeStream.format("noop")
        .option("checkpointLocation", f"{work}/ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    drain_and_stop(q, timeout_s=560)


def run_dedup_native(spark, fixture: str, work: str) -> None:
    from bulker_spark.streaming.stateful import streaming_dedup_native

    schema = spark.read.parquet(f"{fixture}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "4")
        .parquet(f"{fixture}/events.parquet")
    )
    deduped = streaming_dedup_native(stream, ["event_id"], "ts")
    q = (
        deduped.writeStream.format("noop")
        .option("checkpointLocation", f"{work}/ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)


def run_ingest_cycle(spark, fixture: str, work: str) -> None:
    """The foreachBatch ingest path (flatten/infer/dedup/merge) fed the
    Zipf events as NDJSON — PK is the unique event_id, dedup on."""
    from bulker_spark.api import StreamOptions
    from bulker_spark.api import Engine
    from bulker_spark.streaming.ingest_stream import (
        IngestStream,
        json_file_stream,
    )

    src = f"{work}/src"
    (
        spark.read.parquet(f"{fixture}/events.parquet")
        .select(
            F.to_json(
                F.struct("event_id", "user_id", "event_type", "ts")
            ).alias("value")
        )
        .coalesce(8)
        .write.mode("overwrite")
        .format("text")
        .save(src)
    )
    stream = IngestStream(
        Engine(spark, f"{work}/wh"),
        "skew_stream",
        StreamOptions(
            mode="batch",
            primary_key=["event_id"],
            deduplicate=True,
            timestamp_column="ts",
        ),
    )
    q = stream.start(json_file_stream(spark, src), f"{work}/ckpt")
    q.awaitTermination()


def main(fixture: str) -> None:
    spark = (
        SparkSession.builder.master("local[16]")
        .appName("skew-stream")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(PORT))
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = f"http://localhost:{PORT}"
    app_id = spark.sparkContext.applicationId

    n_files = len(glob.glob(f"{fixture}/events.parquet/part-*"))
    print(f"fixture: {fixture} ({n_files} source files, maxFilesPerTrigger=4)")
    print("| streaming path | wall s | worst stage | tasks | max/med task time | max task ms |")
    print("|---|---|---|---|---|---|")
    last_stage = -1
    for name, fn in [
        ("sessionize (applyInPandasWithState, user key)", run_sessionize),
        ("sessionize event-time (EventTimeTimeout, user key)", run_sessionize_event_time),
        ("dedup_native (watermark, PK key)", run_dedup_native),
        ("ingest foreachBatch (flatten/infer/dedup/merge, PK)", run_ingest_cycle),
    ]:
        work = tempfile.mkdtemp(prefix="skstream_")
        t0 = time.time()
        try:
            fn(spark, fixture, work)
            wall = round(time.time() - t0, 2)
            w = stage_skew(base, app_id, last_stage)
            last_stage = w["last_stage"]
            print(
                f"| {name} | {wall} | {w['stage']} | {w['n_tasks']} "
                f"| {w['time_ratio']}x | {w['max_task_ms']} |"
            )
        finally:
            shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/skewdata")
