"""Reprocessing source: gzipped NDJSON backup replay (reprocessing-worker
parity — date-pruned file listing, per-table routing, distributed read)."""

import datetime as dt
import gzip
import json
import os

import pytest

from bulker_spark.api import Engine
from bulker_spark.sources.reprocess import (
    date_from_path,
    replay_backups,
    table_from_path,
)


def _write_backup(root, table, day, name, events):
    d = os.path.join(root, table, day.strftime("%Y/%m/%d"))
    os.makedirs(d, exist_ok=True)
    p = os.path.join(d, name)
    with gzip.open(p, "wt") as fh:
        for ev in events:
            fh.write(json.dumps(ev) + "\n")
    return p


@pytest.fixture()
def backups(tmp_path):
    root = str(tmp_path / "backups")
    d1, d2 = dt.date(2024, 1, 3), dt.date(2024, 1, 5)
    _write_backup(root, "events", d1, "part-0.ndjson.gz",
                  [{"id": i, "type": "page"} for i in range(10)])
    _write_backup(root, "events", d2, "part-0.ndjson.gz",
                  [{"id": i, "type": "click"} for i in range(10, 15)])
    _write_backup(root, "users", d1, "part-0.ndjson.gz",
                  [{"uid": i, "name": f"u{i}"} for i in range(3)])
    return root


def test_path_routing():
    p = "s3a://bkt/backup/events/2024/01/03/part-0.ndjson.gz"
    assert table_from_path(p) == "events"
    assert date_from_path(p) == dt.date(2024, 1, 3)


def test_replay_all_tables(spark, backups, tmp_warehouse):
    e = Engine(spark, tmp_warehouse)
    res = replay_backups(e, f"{backups}/*/*/*/*/*.ndjson.gz")
    assert set(res) == {"events", "users"}
    assert res["events"].successful_rows == 15
    assert res["users"].successful_rows == 3
    assert e.warehouse.read("events").count() == 15
    assert set(e.warehouse.read("users").columns) >= {"uid", "name"}


def test_replay_date_pruning(spark, backups, tmp_warehouse):
    e = Engine(spark, tmp_warehouse)
    res = replay_backups(
        e,
        f"{backups}/*/*/*/*/*.ndjson.gz",
        date_from=dt.date(2024, 1, 4),
    )
    assert res["events"].successful_rows == 5  # only the Jan-5 file
    assert "users" not in res  # users backup is Jan-3, pruned
    types = {r["type"] for r in e.warehouse.read("events").collect()}
    assert types == {"click"}


def test_replay_to_topics_then_cycle(spark, tmp_path):
    """reprocessing-worker parity: backups re-produce into topics via the
    distributed bulker_topic writer; the app's cycle then loads them
    through the normal path."""
    import gzip
    import json

    from bulker_spark.app import BulkerApp, Destination
    from bulker_spark.sources.reprocess import replay_backups_to_topics

    root = tmp_path / "backups"
    d1 = root / "events" / "2024" / "01" / "03"
    d2 = root / "orders" / "2024" / "01" / "04"
    d1.mkdir(parents=True)
    d2.mkdir(parents=True)
    with gzip.open(d1 / "part-0.ndjson.gz", "wt") as fh:
        for i in range(5):
            fh.write(json.dumps({"id": i, "kind": "ev"}) + "\n")
    with gzip.open(d2 / "part-0.ndjson.gz", "wt") as fh:
        fh.write(json.dumps({"id": 100, "total": 9.5}) + "\n")

    topics = str(tmp_path / "topics")
    wh = str(tmp_path / "wh")
    app = BulkerApp(spark, topics, [Destination("rp1", wh)])
    out = replay_backups_to_topics(
        spark, f"{root}/*/*/*/*/*.ndjson.gz", topics, "rp1"
    )
    assert out == {
        "events": "in.id.rp1.m.batch.t.events",
        "orders": "in.id.rp1.m.batch.t.orders",
    }
    app.run_batch_cycle("rp1")
    eng = app.engine_for("rp1")
    assert eng.warehouse.read("events").count() == 5
    assert [r["total"] for r in eng.warehouse.read("orders").collect()] == [9.5]
    # replay is additive through the normal path: re-running the cycle
    # is a no-op (offsets), and the date filter prunes whole files
    app.run_batch_cycle("rp1")
    assert eng.warehouse.read("events").count() == 5


def test_list_backup_files_directory_and_glob(spark, backups):
    """A bare directory path must list like the old read-based listing
    did (recurse), and a day-level glob whose last segment matches
    DIRECTORIES must descend into them."""
    from bulker_spark.sources.reprocess import list_backup_files

    by_dir = list_backup_files(spark, backups)
    assert len(by_dir) == 3 and all(f.endswith(".ndjson.gz") for f in by_dir)
    by_day_glob = list_backup_files(spark, f"{backups}/*/*/*/*")
    assert sorted(by_day_glob) == sorted(by_dir)
    by_file_glob = list_backup_files(spark, f"{backups}/*/*/*/*/*.ndjson.gz")
    assert sorted(by_file_glob) == sorted(by_dir)


def test_replay_handles_glob_metachar_filenames(spark, backups, tmp_warehouse):
    """Listed paths are literal names; re-reading them must escape glob
    metacharacters or a file named part-[0].ndjson.gz resolves to the
    wrong file (or none)."""
    import datetime as dt

    from bulker_spark.api import Engine

    _write_backup(backups, "weird", dt.date(2024, 1, 4),
                  "part-[0].ndjson.gz", [{"id": 1}, {"id": 2}])
    e = Engine(spark, tmp_warehouse)
    res = replay_backups(e, f"{backups}/weird/*/*/*/*.ndjson.gz")
    assert res["weird"].successful_rows == 2
    assert e.warehouse.read("weird").count() == 2


def test_reprocess_job_failing_destination_flows_to_retry(spark, tmp_path):
    """A replayed backup that hits a failing destination must flow into
    the existing retry machinery — not fail the job opaquely. Parity:
    the reference's reprocessing worker produces to the same in-topics
    and so inherits the full Kafka retry path by construction
    (reprocessing-worker/main.go:336-430). Pinned end-to-end: job
    COMPLETED with retried counts in its detail, events parked in the
    retry queue with backoff metadata, then a healed destination drains
    them through the normal retry consumer."""
    import datetime as dt2

    from bulker_spark.api import StreamOptions
    from bulker_spark.app import BulkerApp, Destination
    from bulker_spark.streaming.ingest_stream import (
        IngestStream,
        retry_table,
    )

    root = tmp_path / "backups"
    day = root / "events" / "2024" / "01" / "03"
    day.mkdir(parents=True)
    with gzip.open(day / "part-0.ndjson.gz", "wt") as fh:
        for i in range(4):
            fh.write(json.dumps({"id": i, "kind": "ev"}) + "\n")

    app = BulkerApp(
        spark, str(tmp_path / "topics"), [Destination("rp2", str(tmp_path / "wh"))]
    )
    eng = app.engine_for("rp2")
    real_load = eng._load

    def down(*a, **k):
        raise RuntimeError("destination down")

    eng._load = down
    job = app.start_reprocessing(
        {"destination_id": "rp2", "path": f"{root}/*/*/*/*/*.ndjson.gz"},
        wait=True,
    )
    # the job is NOT opaquely failed — the drain parked the batch
    assert job["status"] == "COMPLETED"
    assert job["retried_batches"] == 1
    assert job["retry_tables"] == {"events": 1}
    assert job["drained"]["retried_batches"] == 1
    # nothing landed, everything is queued with backoff metadata
    assert not eng.warehouse.exists("events")
    parked = eng.warehouse.read(retry_table("events")).collect()
    assert len(parked) == 4
    assert all(
        r["retries"] == 1 and "destination down" in r["error"]
        for r in parked
    )
    # heal the destination: due retries replay through the normal path
    eng._load = real_load
    later = dt2.datetime.utcnow() + dt2.timedelta(hours=2)
    n = IngestStream(
        eng, "events", StreamOptions(mode="batch", frozen_now=later)
    ).process_retries()
    assert n == 4
    assert eng.warehouse.read("events").count() == 4
    assert eng.warehouse.read(retry_table("events")).count() == 0
