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
    from bulker_spark.streaming.stateful import drain_and_stop

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
    # availableNow + the 24h processing-time TTL never self-terminates
    # (it spins empty batches so the timeout can fire — see the module
    # docstring); drain_and_stop ends the run once the data is consumed.
    # The old awaitTermination(180) burned the full 180s AND leaked a
    # spinning query into the rest of the suite.
    drain_and_stop(q, timeout_s=180)


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


def test_streaming_sessionize_event_time_across_runs(spark, dirs):
    """Event-time gap sessionization: sessions split on EVENT-time gaps,
    seal when the watermark passes end+gap, survive runs via state, and
    the availableNow drain terminates by itself (EventTimeTimeout —
    no processing-time spin)."""
    from bulker_spark.streaming.stateful import (
        drain_and_stop,
        streaming_sessionize_event_time,
    )

    src, ckpt, out = dirs

    def run():
        stream = (
            spark.readStream.schema("user_id LONG, ts TIMESTAMP")
            .json(src)
        )
        sess = streaming_sessionize_event_time(
            stream, "user_id", "ts", gap_s=1800,
            watermark_delay="10 minutes",
        )
        q = (
            sess.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        # must terminate WITHOUT the idle-stop path
        assert drain_and_stop(q, timeout_s=120) is True

    # run 1: user 1 has two event-time sessions (50-min gap > 30-min
    # gap); the final event pushes the watermark to 11:50, sealing BOTH
    # user-1 sessions (seal points 10:40 and 11:30 < 11:50) but not
    # user 2's (12:30 > 11:50 — it could still be extended)
    _write_batch(src, "b1.ndjson", [
        {"user_id": 1, "ts": "2024-01-01T10:00:00Z"},
        {"user_id": 1, "ts": "2024-01-01T10:10:00Z"},
        {"user_id": 1, "ts": "2024-01-01T11:00:00Z"},
        {"user_id": 2, "ts": "2024-01-01T12:00:00Z"},
    ])
    run()
    rows = spark.read.parquet(out).collect()
    got = {
        (r["user_id"], r["session_start"].isoformat(),
         r["session_end"].isoformat(), r["n_events"])
        for r in rows
    }
    assert got == {
        (1, "2024-01-01T10:00:00", "2024-01-01T10:10:00", 2),
        (1, "2024-01-01T11:00:00", "2024-01-01T11:00:00", 1),
    }, got

    # run 2: a much later event advances the watermark past user 2's
    # seal point; its session emits, and the new event stays open in
    # state for a future run
    _write_batch(src, "b2.ndjson", [
        {"user_id": 2, "ts": "2024-01-01T18:00:00Z"},
    ])
    run()
    rows = spark.read.parquet(out).collect()
    got = {
        (r["user_id"], r["session_start"].isoformat(),
         r["session_end"].isoformat(), r["n_events"])
        for r in rows
    }
    assert got == {
        (1, "2024-01-01T10:00:00", "2024-01-01T10:10:00", 2),
        (1, "2024-01-01T11:00:00", "2024-01-01T11:00:00", 1),
        (2, "2024-01-01T12:00:00", "2024-01-01T12:00:00", 1),
    }, got


def test_streaming_sessionize_event_time_merges_batch_slices(spark, dirs):
    """A session spanning two micro-batches merges via interval state:
    events 10 minutes apart across batch files are one session."""
    from bulker_spark.streaming.stateful import (
        drain_and_stop,
        streaming_sessionize_event_time,
    )

    src, ckpt, out = dirs
    _write_batch(src, "b1.ndjson", [
        {"user_id": 7, "ts": "2024-01-01T10:00:00Z"},
        {"user_id": 7, "ts": "2024-01-01T10:05:00Z"},
    ])
    _write_batch(src, "b2.ndjson", [
        {"user_id": 7, "ts": "2024-01-01T10:15:00Z"},
        # sealer: far-future event advances the watermark
        {"user_id": 8, "ts": "2024-01-02T00:00:00Z"},
    ])

    stream = (
        spark.readStream.schema("user_id LONG, ts TIMESTAMP")
        .option("maxFilesPerTrigger", "1")
        .json(src)
    )
    sess = streaming_sessionize_event_time(
        stream, "user_id", "ts", gap_s=1800, watermark_delay="1 minutes"
    )
    q = (
        sess.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert drain_and_stop(q, timeout_s=120) is True
    rows = spark.read.parquet(out).filter("user_id = 7").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["session_start"].isoformat() == "2024-01-01T10:00:00"
    assert r["session_end"].isoformat() == "2024-01-01T10:15:00"
    assert r["n_events"] == 3


def test_streaming_sessionize_event_time_non_utc_session_tz(spark, dirs):
    """Seal decisions compare true UTC epoch ms against the watermark
    regardless of spark.sql.session.timeZone (review r8: naive local
    ms vs UTC watermark sealed sessions hours early west of UTC)."""
    from bulker_spark.streaming.stateful import (
        drain_and_stop,
        streaming_sessionize_event_time,
    )

    src, ckpt, out = dirs
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try:
        _write_batch(src, "b1.ndjson", [
            {"user_id": 1, "ts": "2024-01-01T10:00:00Z"},
            {"user_id": 1, "ts": "2024-01-01T10:10:00Z"},
            {"user_id": 1, "ts": "2024-01-01T11:00:00Z"},
            {"user_id": 2, "ts": "2024-01-01T12:00:00Z"},
        ])
        stream = (
            spark.readStream.schema("user_id LONG, ts TIMESTAMP")
            .json(src)
        )
        sess = streaming_sessionize_event_time(
            stream, "user_id", "ts", gap_s=1800,
            watermark_delay="10 minutes",
        )
        q = (
            sess.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert drain_and_stop(q, timeout_s=120) is True
        rows = spark.read.parquet(out).collect()
        # IDENTICAL instants and seals as the UTC twin (collect()
        # renders in the driver OS tz, UTC here). The discriminator:
        # pre-fix, LA-naive ms compared against the UTC watermark made
        # every seal point look ~8h past, so user 2's still-extendable
        # session (seal 12:30 > wm 11:50) was wrongly emitted too.
        got = {
            (r["user_id"], r["session_start"].isoformat(),
             r["session_end"].isoformat(), r["n_events"])
            for r in rows
        }
        assert got == {
            (1, "2024-01-01T10:00:00", "2024-01-01T10:10:00", 2),
            (1, "2024-01-01T11:00:00", "2024-01-01T11:00:00", 1),
        }, got
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
