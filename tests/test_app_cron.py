"""BatchRunner — the cron.go:25-56 scheduler over the HTTP app: due-time
cycles, per-destination error isolation, retry cadence, daemon loop."""

import json
import shutil
import tempfile

import pytest

from bulker_spark.app import BatchRunner, BulkerApp, Destination


@pytest.fixture()
def app(spark):
    wh = tempfile.mkdtemp(prefix="cron_wh_")
    topics = tempfile.mkdtemp(prefix="cron_topics_")
    a = BulkerApp(
        spark,
        topics,
        [
            Destination("d1", wh, options={"frequency": 100}),
            Destination("d2", wh + "_2", options={"frequency": 200}),
        ],
    )
    yield a
    shutil.rmtree(wh, ignore_errors=True)
    shutil.rmtree(wh + "_2", ignore_errors=True)
    shutil.rmtree(topics, ignore_errors=True)


def test_tick_runs_due_and_respects_period(app, spark):
    runner = BatchRunner(app, spread=False, clock=lambda: 0.0)
    app.post_event("d1", "t1", json.dumps({"id": 1}))
    assert sorted(runner.tick(now=0.0)) == ["d1", "d2"]
    assert app.engine_for("d1").warehouse.read("t1").count() == 1
    # nothing due until the period elapses (d1: 100s, d2: 200s)
    assert runner.tick(now=50.0) == []
    app.post_event("d1", "t1", json.dumps({"id": 2}))
    assert runner.tick(now=101.0) == ["d1"]
    assert app.engine_for("d1").warehouse.read("t1").count() == 2
    assert runner.tick(now=250.0) == ["d1", "d2"]
    assert runner.status()["d1"]["runs"] == 3
    assert runner.status()["d2"]["runs"] == 2


def test_cycle_error_is_isolated(app, spark, monkeypatch):
    runner = BatchRunner(app, spread=False, clock=lambda: 0.0)
    real = app.run_batch_cycle

    def flaky(dest_id):
        if dest_id == "d1":
            raise RuntimeError("boom")
        return real(dest_id)

    monkeypatch.setattr(app, "run_batch_cycle", flaky)
    app.post_event("d2", "t2", json.dumps({"id": 7}))
    assert runner.tick(now=0.0) == ["d2"]  # d1 failed, d2 still ran
    st = runner.status()
    assert st["d1"]["errors"] == 1
    assert "boom" in st["d1"]["last_error"]
    assert app.engine_for("d2").warehouse.read("t2").count() == 1
    # failure reschedules: d1 retried next period
    monkeypatch.setattr(app, "run_batch_cycle", real)
    assert "d1" in runner.tick(now=101.0)
    assert st["d1"]["errors"] == 1


def test_retry_cadence_fires(app, spark):
    runner = BatchRunner(app, spread=False, clock=lambda: 0.0)
    app.post_event("d1", "t3", json.dumps({"id": 1}))
    runner.tick(now=0.0)
    assert runner.status()["d1"]["retry_runs"] == 0
    runner.tick(now=101.0)  # retry period defaults to frequency (100s)
    assert runner.status()["d1"]["retry_runs"] == 1
    # table remembered for future retry sweeps even with no new topics
    assert "t3" in runner.schedules["d1"].tables_retried


def test_spread_offsets_differ_by_destination(app):
    runner = BatchRunner(app, spread=True, clock=lambda: 0.0)
    offs = {d: s.next_due for d, s in runner.schedules.items()}
    assert all(0 <= v < 200 for v in offs.values())


def test_daemon_loop_runs_and_stops(app, spark):
    import time

    app.post_event("d1", "t_loop", json.dumps({"id": 1}))
    runner = BatchRunner(app, period_s=0.1, spread=False)
    for s in runner.schedules.values():
        s.period_s = min(s.period_s, 0.5)
        s.retry_period_s = 9999
    runner.start(poll_s=0.05)
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if runner.status()["d1"]["runs"] >= 1:
                break
            time.sleep(0.2)
        assert runner.status()["d1"]["runs"] >= 1
    finally:
        runner.stop()
    assert app.engine_for("d1").warehouse.read("t_loop").count() == 1
    runs_after_stop = runner.status()["d1"]["runs"]
    import time as _t

    _t.sleep(0.5)
    assert runner.status()["d1"]["runs"] == runs_after_stop


def test_config_hot_reload_reconciles_schedules(app, spark):
    import tempfile as _tf

    runner = BatchRunner(app, spread=False, clock=lambda: 0.0)
    assert sorted(runner.schedules) == ["d1", "d2"]
    wh3 = _tf.mkdtemp(prefix="cron_wh3_")
    app.put_destination(
        {"destination_id": "d3", "warehouse_path": wh3, "options": {"frequency": 50}}
    )
    app.post_event("d3", "t_new", json.dumps({"id": 1}))
    assert "d3" in runner.tick(now=0.0)  # picked up without restart
    assert app.engine_for("d3").warehouse.read("t_new").count() == 1
    assert runner.schedules["d3"].period_s == 50
    app.delete_destination("d2")
    runner.tick(now=1000.0)
    assert "d2" not in runner.schedules
