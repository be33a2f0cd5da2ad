"""Streaming front tests: file-stream source → foreachBatch → warehouse,
dead-letter for malformed events, retry flow with backoff
(reference: bulkerapp/app/{batch,stream,retry}_consumer.go semantics)."""

import datetime as dt
import json
import os
import tempfile

import pytest

from bulker_spark import Engine, StreamOptions
from bulker_spark.streaming.ingest_stream import (
    IngestStream,
    dead_table,
    json_file_stream,
    retry_backoff_minutes,
    retry_table,
    split_valid_json,
)


@pytest.fixture()
def tmpdirs():
    dirs = [tempfile.mkdtemp(prefix=f"bstream_{i}_") for i in range(3)]
    yield dirs
    import shutil

    for d in dirs:
        shutil.rmtree(d, ignore_errors=True)


def test_backoff():
    assert retry_backoff_minutes(1) == 2.0
    assert retry_backoff_minutes(3) == 8.0
    assert retry_backoff_minutes(20) == 60.0  # capped


def test_split_valid_json(spark):
    df = spark.createDataFrame(
        [('{"a": 1}',), ("not json",), ("",), ('{"b": 2}',), ("   ",)],
        "value string",
    )
    good, bad = split_valid_json(df)
    assert good.count() == 2
    assert bad.count() == 1  # blanks dropped entirely


def test_stream_e2e_with_dead_letter(spark, tmpdirs):
    src_dir, ckpt, wh = tmpdirs
    with open(os.path.join(src_dir, "batch1.ndjson"), "w") as fh:
        fh.write(json.dumps({"id": 1, "name": "a"}) + "\n")
        fh.write("THIS IS NOT JSON\n")
        fh.write(json.dumps({"id": 2, "name": "b"}) + "\n")

    engine = Engine(spark, wh)
    stream = IngestStream(
        engine,
        "events_t",
        StreamOptions(mode="batch", primary_key=["id"], deduplicate=True),
    )
    q = stream.start(json_file_stream(spark, src_dir), ckpt)
    q.awaitTermination(120)

    assert engine.warehouse.count("events_t") == 2
    dead = engine.warehouse.read(dead_table("events_t")).collect()
    assert len(dead) == 1
    assert dead[0]["value"] == "THIS IS NOT JSON"
    assert dead[0]["error"] == "malformed JSON"
    # inspection endpoint analogue (router.go:370-432)
    failed = stream.failed_events(limit=10).collect()
    assert [r["value"] for r in failed] == ["THIS IS NOT JSON"]
    other = IngestStream(engine, "nothing_failed", StreamOptions(mode="batch"))
    assert other.failed_events().count() == 0

    # second micro-batch: checkpoint resumes, upsert dedups
    with open(os.path.join(src_dir, "batch2.ndjson"), "w") as fh:
        fh.write(json.dumps({"id": 2, "name": "b2"}) + "\n")
        fh.write(json.dumps({"id": 3, "name": "c"}) + "\n")
    q2 = stream.start(json_file_stream(spark, src_dir), ckpt)
    q2.awaitTermination(120)
    rows = {
        r["id"]: r["name"]
        for r in engine.warehouse.read("events_t").collect()
    }
    assert rows == {1: "a", 2: "b2", 3: "c"}


def test_retry_flow(spark, tmp_warehouse):
    engine = Engine(spark, tmp_warehouse)
    now = dt.datetime(2024, 1, 1, 12, 0, 0)
    opts = StreamOptions(mode="batch", frozen_now=now)
    stream = IngestStream(engine, "rt", opts)

    # seed the retry table: one due, one not due, one exhausted
    retry_rows = spark.createDataFrame(
        [
            ('{"id": 1}', "err", 1, now - dt.timedelta(minutes=1)),
            ('{"id": 2}', "err", 1, now + dt.timedelta(minutes=30)),
            ('{"id": 3}', "err", 5, now - dt.timedelta(minutes=1)),
        ],
        "value string, error string, retries int, retry_time timestamp",
    )
    engine.warehouse.append(retry_table("rt"), retry_rows)

    replayed = stream.process_retries(now=now)
    assert replayed == 1  # only the due, non-exhausted row
    assert engine.warehouse.count("rt") == 1
    assert engine.warehouse.read("rt").collect()[0]["id"] == 1
    # exhausted row moved to dead
    dead = engine.warehouse.read(dead_table("rt")).collect()
    assert len(dead) == 1 and '"id": 3' in dead[0]["value"]
    # not-due row remains queued
    remaining = engine.warehouse.read(retry_table("rt")).collect()
    assert len(remaining) == 1 and '"id": 2' in remaining[0]["value"]


def test_retry_batch_size_caps_replay(spark, tmp_warehouse):
    """Only retry_batch_size oldest-due rows replay; overflow stays queued
    (RETRY_CONSUMER_BATCH_SIZE, app_config.go:61-64)."""
    engine = Engine(spark, tmp_warehouse)
    now = dt.datetime(2024, 1, 1, 12, 0, 0)
    opts = StreamOptions(mode="batch", frozen_now=now, retry_batch_size=2)
    stream = IngestStream(engine, "rc", opts)
    retry_rows = spark.createDataFrame(
        [
            (f'{{"id": {i}}}', "err", 1, now - dt.timedelta(minutes=10 - i))
            for i in range(5)
        ],
        "value string, error string, retries int, retry_time timestamp",
    )
    engine.warehouse.append(retry_table("rc"), retry_rows)
    assert stream.process_retries(now=now) == 2  # capped
    assert engine.warehouse.count("rc") == 2  # ids 0,1 (oldest due) landed
    queued = engine.warehouse.read(retry_table("rc")).count()
    assert queued == 3  # overflow remains for the next run


def test_checkpoint_restart_exactly_once(spark, tmp_warehouse, tmp_path):
    """Offset-after-commit parity: a restarted query (same checkpoint)
    must not re-ingest already-committed files — even without dedup."""
    import json as _json

    engine = Engine(spark, tmp_warehouse)
    src = str(tmp_path / "drop")
    ck = str(tmp_path / "ck")
    os.makedirs(src)
    opts = StreamOptions(mode="batch")
    stream = IngestStream(engine, "eo", opts)

    with open(f"{src}/a.ndjson", "w") as fh:
        for i in range(10):
            fh.write(_json.dumps({"id": i}) + "\n")
    q = stream.start(json_file_stream(spark, src), ck, available_now=True)
    q.awaitTermination(120)
    assert engine.warehouse.count("eo") == 10

    # second run, same checkpoint: only the new file lands
    with open(f"{src}/b.ndjson", "w") as fh:
        for i in range(10, 15):
            fh.write(_json.dumps({"id": i}) + "\n")
    q = stream.start(json_file_stream(spark, src), ck, available_now=True)
    q.awaitTermination(120)
    assert engine.warehouse.count("eo") == 15  # 10 would-be dupes skipped
    ids = sorted(r["id"] for r in engine.warehouse.read("eo").collect())
    assert ids == list(range(15))


def test_all_malformed_batch_creates_no_table(spark, tmp_path):
    """A micro-batch of ONLY malformed lines must dead-letter every line
    and never create (or commit to) the destination table."""
    from bulker_spark.api import Engine, StreamOptions
    from bulker_spark.streaming.ingest_stream import IngestStream, dead_table

    eng = Engine(spark, str(tmp_path / "wh"))
    stream = IngestStream(
        eng, "evt",
        StreamOptions(mode="batch", primary_key=["id"], deduplicate=True),
    )
    batch = spark.createDataFrame(
        [("not json",), ("also not json",), ("",)], "value string"
    )
    stream.process_batch(batch, 0)
    assert not eng.warehouse.exists("evt")
    dead = eng.warehouse.read(dead_table("evt"))
    assert dead.count() == 2  # blank line dropped, not dead-lettered
    assert {r["error"] for r in dead.collect()} == {"malformed JSON"}


def test_streaming_scd2_mode(spark, tmpdirs):
    """mode=scd2 rides the same foreachBatch front: each micro-batch is a
    snapshot applied to the dimension, change closes + opens versions."""
    from bulker_spark.operators.scd2 import scd2_current

    src_dir, ckpt, wh = tmpdirs
    with open(os.path.join(src_dir, "snap1.ndjson"), "w") as fh:
        fh.write(json.dumps({"id": 1, "city": "nyc"}) + "\n")
        fh.write(json.dumps({"id": 2, "city": "sf"}) + "\n")

    engine = Engine(spark, wh)
    stream = IngestStream(
        engine,
        "dim_users",
        StreamOptions(
            mode="scd2",
            primary_key=["id"],
            deduplicate=True,
            frozen_now=dt.datetime(2024, 1, 1),
        ),
    )
    q = stream.start(json_file_stream(spark, src_dir), ckpt)
    q.awaitTermination(120)
    assert engine.warehouse.count("dim_users") == 2

    with open(os.path.join(src_dir, "snap2.ndjson"), "w") as fh:
        fh.write(json.dumps({"id": 1, "city": "boston"}) + "\n")
    stream.options.frozen_now = dt.datetime(2024, 2, 1)
    q2 = stream.start(json_file_stream(spark, src_dir), ckpt)
    q2.awaitTermination(120)

    dim = engine.warehouse.read("dim_users")
    assert dim.count() == 3  # closed nyc + open boston + sf
    cur = {r["id"]: r["city"] for r in scd2_current(dim).collect()}
    assert cur == {1: "boston", 2: "sf"}


def test_narrow_source_last_wins_survives_repartition(spark, tmp_path):
    """A single NDJSON file arrives as 1-3 scan splits; the load pipeline
    fans it out across cores before the Python parse passes. The arrival-
    order stamp for last-wins dedup is taken BEFORE that shuffle and
    carried through normalize — so the LAST line per PK still wins even
    though round-robin repartitioning scrambles physical row order."""
    import json as _json
    import os

    from bulker_spark import Engine
    from bulker_spark.streaming.ingest_stream import (
        IngestStream,
        StreamOptions,
        json_file_stream,
    )

    # every pk occurs 40×; only the final occurrence's payload may survive
    lines = [
        _json.dumps({"messageId": i % 50, "v": f"occ{i}"}) for i in range(2000)
    ]
    src = tmp_path / "src"
    src.mkdir()
    (src / "a.ndjson").write_text("\n".join(lines))
    e = Engine(spark, str(tmp_path / "wh"))
    stream = IngestStream(
        e, "dup", StreamOptions(primary_key=["messageId"], deduplicate=True)
    )
    q = stream.start(
        json_file_stream(spark, str(src)), str(tmp_path / "ck")
    )
    q.awaitTermination()
    got = {r["messageId"]: r["v"] for r in e.warehouse.read("dup").collect()}
    assert got == {i % 50: f"occ{i}" for i in range(2000)}
    # the internal sequence column must not leak into the table
    assert "__seq" not in e.warehouse.read("dup").columns


def test_user_seq_column_survives_nondedup_narrow_load(spark, tmp_path):
    """Events whose DATA contains a field named ``__seq`` (the internal
    arrival-stamp name): on a narrow source the load wrapper's carry
    column collides, normalize lets the data win, and the load must then
    treat the column as data — not drop it as a leftover stamp."""
    import json as _json

    from bulker_spark import Engine
    from bulker_spark.streaming.ingest_stream import (
        IngestStream,
        StreamOptions,
        json_file_stream,
    )

    lines = [
        _json.dumps({"messageId": i, "__seq": 1000 + i}) for i in range(20)
    ]
    src = tmp_path / "src"
    src.mkdir()
    (src / "a.ndjson").write_text("\n".join(lines))
    e = Engine(spark, str(tmp_path / "wh"))
    stream = IngestStream(e, "t", StreamOptions())  # no dedup
    q = stream.start(json_file_stream(spark, str(src)), str(tmp_path / "ck"))
    q.awaitTermination()
    df = e.warehouse.read("t")
    assert "__seq" in df.columns
    got = {r["messageId"]: r["__seq"] for r in df.collect()}
    assert got == {i: 1000 + i for i in range(20)}


def test_first_seen_column_order_survives_fanout(spark, tmp_path):
    """Header inference merges partials in (partition, batch) order; the
    narrow-source fan-out is RANGE-partitioned + sorted on the arrival
    stamp, so a column introduced by a LATE line must still appear after
    all earlier-seen columns — round-robin redistribution would make the
    order content-dependent."""
    import json as _json

    from bulker_spark import Engine
    from bulker_spark.streaming.ingest_stream import (
        IngestStream,
        StreamOptions,
        json_file_stream,
    )

    lines = [_json.dumps({"a": i}) for i in range(500)]
    lines += [_json.dumps({"a": 500, "zz_late": "x"})]
    lines += [_json.dumps({"a": i}) for i in range(501, 600)]
    src = tmp_path / "src"
    src.mkdir()
    (src / "a.ndjson").write_text("\n".join(lines))
    e = Engine(spark, str(tmp_path / "wh"))
    stream = IngestStream(e, "t", StreamOptions())
    q = stream.start(json_file_stream(spark, str(src)), str(tmp_path / "ck"))
    q.awaitTermination()
    cols = e.warehouse.read("t").columns
    assert cols.index("a") < cols.index("zz_late")
