"""Failover logging + automatic recovery replay + destination health.

Reference behaviors: ``kafkabase/failover_logger.go`` (rotating local
NDJSON log of failed produces, gzip on rotate, bounded retention),
``admin/failover_reprocessor.go`` (replay the backlog through the normal
pipeline once the store recovers).
"""

import gzip
import json
import os
import tempfile

import pytest

from bulker_spark.app import BulkerApp, Destination
from bulker_spark.app.failover import (
    DestinationHealth,
    FailoverLogger,
    MessageTooLargeError,
)


# ==========================================================================
# FailoverLogger unit behavior
# ==========================================================================

class TestFailoverLogger:
    def test_append_and_rotate_gzip(self, tmp_path):
        log = FailoverLogger(str(tmp_path), compress=True)
        log.log_payload(b'{"a": 1}')
        log.log_payload('{"a": 2}')
        assert log.pending_files() == []  # live file is .tmp, not pending
        published = log.rotate()
        assert published.endswith(".ndjson.gz")
        with gzip.open(published, "rt") as fh:
            assert [json.loads(x) for x in fh] == [{"a": 1}, {"a": 2}]
        assert log.pending_files() == [published]
        log.close()

    def test_rotate_empty_is_noop(self, tmp_path):
        log = FailoverLogger(str(tmp_path))
        assert log.rotate() is None
        assert log.pending_files() == []
        log.close()

    def test_size_based_rotation(self, tmp_path):
        log = FailoverLogger(str(tmp_path), max_size=64, compress=False)
        for i in range(10):
            log.log_payload(b"x" * 40)  # 41 bytes/line -> rotate every 2
        assert len(log.pending_files()) >= 4
        log.close()

    def test_retention_drops_oldest(self, tmp_path):
        log = FailoverLogger(
            str(tmp_path), max_size=8, max_old_files=3, compress=False
        )
        for i in range(10):
            log.log_payload(f"payload-{i:02d}".encode())
        log.close()
        files = log.pending_files()
        assert len(files) <= 3
        # the survivors are the NEWEST payloads
        kept = []
        for f in files:
            kept.extend(open(f).read().split())
        assert "payload-09" in kept

    def test_should_log_policy(self, tmp_path):
        log = FailoverLogger(str(tmp_path))
        assert log.should_log(OSError("disk gone")) is True
        assert log.should_log(None) is False
        # the one excluded class (failover_logger.go:249-267)
        assert log.should_log(MessageTooLargeError()) is False
        log_all = FailoverLogger(str(tmp_path / "all"), log_all=True)
        assert log_all.should_log(None) is True
        log.close()
        log_all.close()

    def test_same_second_rotations_never_collide(self, tmp_path):
        log = FailoverLogger(str(tmp_path), compress=False)
        names = set()
        for i in range(3):
            log.log_payload(f"{i}".encode())
            names.add(os.path.basename(log.rotate()))
        assert len(names) == 3  # seq suffix disambiguates within 1s
        log.close()


def test_destination_health_transitions():
    h = DestinationHealth(threshold=2)
    assert h.status("d")["status"] == "UP"
    assert h.record_failure("d", "boom") == "UP"  # 1 < threshold
    assert h.record_failure("d", "boom") == "DOWN"
    st = h.status("d")
    assert st["consecutive_failures"] == 2
    assert st["down_since"] is not None
    assert st["last_error"] == "boom"
    # the DOWN->UP edge reports recovery exactly once
    assert h.record_success("d") is True
    assert h.record_success("d") is False
    assert h.status("d")["recoveries"] == 1
    # sub-threshold flapping never flips DOWN
    assert h.record_failure("d", "x") == "UP"
    assert h.record_success("d") is False


# ==========================================================================
# App integration: outage -> failover log -> recovery -> auto-replay
# ==========================================================================

@pytest.fixture()
def failover_app(spark):
    wh = tempfile.mkdtemp(prefix="fo_wh_")
    topics = tempfile.mkdtemp(prefix="fo_topics_")
    app = BulkerApp(
        spark,
        topics,
        [Destination("d1", wh, options={"primary_key": ["id"],
                                        "deduplicate": True})],
        failover={"enabled": True},
    )
    yield app
    import shutil

    shutil.rmtree(wh, ignore_errors=True)
    shutil.rmtree(topics, ignore_errors=True)


def test_outage_preserves_events_and_cycle_replays(failover_app):
    app = failover_app
    # healthy produce first
    app.post_event("d1", "ev", json.dumps({"id": 1, "v": "live"}))

    # simulate a topic-store outage: every produce raises
    real_produce = app.producer.produce

    def broken(topic, line):
        raise OSError("topic store unavailable")

    app.producer.produce = broken
    for i in range(2, 5):
        # accepted-means-durable: post_event still succeeds
        app.post_event("d1", "ev", json.dumps({"id": i, "v": "failover"}))
    assert app.metrics["failover_logged"] == 3
    app.producer.produce = real_produce

    # recovery: the next batch cycle replays the backlog FIRST, then
    # drains it together with live traffic
    out = app.run_batch_cycle("d1")
    assert out["failover_replayed"] == 3
    df = app.engine_for("d1").warehouse.read("ev")
    assert df.count() == 4
    assert df.filter("v = 'failover'").count() == 3
    # the replay shows up as a managed job (failover_reprocessor parity)
    jobs = app.list_reprocessing()
    auto = [j for j in jobs if j["config"].get("trigger") == "auto-failover"]
    assert len(auto) == 1 and auto[0]["success_count"] == 3
    # backlog consumed: a second cycle replays nothing
    assert "failover_replayed" not in app.run_batch_cycle("d1")
    assert app.engine_for("d1").warehouse.read("ev").count() == 4


def test_replay_stops_when_still_down(failover_app):
    app = failover_app
    real_produce = app.producer.produce
    app.producer.produce = lambda t, l: (_ for _ in ()).throw(OSError("x"))
    app.post_event("d1", "ev", json.dumps({"id": 1}))
    # manual replay while STILL down: nothing consumed, backlog intact
    assert app.replay_failover() == 0
    assert len(app.failover_logger.pending_files()) == 1
    app.producer.produce = real_produce
    assert app.replay_failover() == 1
    assert app.failover_logger.pending_files() == []


def test_no_failover_config_fails_fast(spark):
    wh = tempfile.mkdtemp(prefix="fo_wh_")
    topics = tempfile.mkdtemp(prefix="fo_topics_")
    app = BulkerApp(spark, topics, [Destination("d1", wh)])
    app.producer.produce = lambda t, l: (_ for _ in ()).throw(OSError("x"))
    with pytest.raises(OSError):
        app.post_event("d1", "ev", "{}")


def test_health_tracks_cycle_failures(failover_app, monkeypatch):
    app = failover_app
    monkeypatch.setattr(
        app,
        "_run_batch_cycle_locked",
        lambda d: (_ for _ in ()).throw(RuntimeError("warehouse gone")),
    )
    for _ in range(3):
        with pytest.raises(RuntimeError):
            app.run_batch_cycle("d1")
    assert app.health.status("d1")["status"] == "DOWN"
    monkeypatch.undo()
    out = app.run_batch_cycle("d1")
    assert out["recovered"] is True
    assert app.health.status("d1")["status"] == "UP"


def test_no_double_delivery_from_producer_buffer(spark):
    """A produce whose flush fails must NOT leave the line in the
    producer's in-memory buffer — otherwise recovery delivers it twice
    (once from the buffer flush, once from the failover replay)."""
    import tempfile as _tf

    wh = _tf.mkdtemp(prefix="fo_wh_")
    topics = _tf.mkdtemp(prefix="fo_topics_")
    app = BulkerApp(
        spark, topics, [Destination("d1", wh)], failover={"enabled": True}
    )
    real_flush = app.producer._flush_locked

    def broken_flush(topic):
        raise OSError("store down")

    app.producer._flush_locked = broken_flush
    app.post_event("d1", "ev", json.dumps({"id": 1}))
    app.producer._flush_locked = real_flush
    assert app.metrics["failover_logged"] == 1
    # the buffer must not hold a second copy
    assert sum(len(b) for b in app.producer._buffers.values()) == 0
    app.run_batch_cycle("d1")
    assert app.engine_for("d1").warehouse.read("ev").count() == 1


def test_concurrent_replays_consume_backlog_once(spark):
    """Two threads replaying concurrently (two destinations' cycles
    share one failover log) must not duplicate the backlog."""
    import tempfile as _tf
    import threading as _th

    wh = _tf.mkdtemp(prefix="fo_wh_")
    topics = _tf.mkdtemp(prefix="fo_topics_")
    app = BulkerApp(
        spark, topics, [Destination("d1", wh)], failover={"enabled": True}
    )
    real = app.producer.produce
    app.producer.produce = lambda t, l: (_ for _ in ()).throw(OSError("x"))
    for i in range(20):
        app.post_event("d1", "ev", json.dumps({"id": i}))
    app.producer.produce = real

    results = []
    threads = [
        _th.Thread(target=lambda: results.append(app.replay_failover()))
        for _ in range(4)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert sum(results) == 20
    app.run_batch_cycle("d1")
    assert app.engine_for("d1").warehouse.read("ev").count() == 20
