"""Config hot-reload reconciliation (topic_manager.go:424-490 parity)."""

import json
import os

from bulker_spark.api import Engine
from bulker_spark.streaming.repository import DestinationSpec, Repository


class FakeQuery:
    def __init__(self):
        self.stopped = False

    def stop(self):
        self.stopped = True


def _spec(dst, table, tmp, **opts):
    return DestinationSpec.make(
        dst, table, f"{tmp}/in_{dst}_{table}", f"{tmp}/ck_{dst}_{table}", **opts
    )


def test_reconcile_create_retire_recreate(tmp_path):
    repo = Repository()
    started = []

    def fake_start(engine, spec):
        started.append(spec.key)
        return FakeQuery()

    t = str(tmp_path)
    repo.put(_spec("pg", "events", t, mode="batch"))
    repo.put(_spec("pg", "users", t, mode="batch"))
    acts = repo.reconcile(None, start_fn=fake_start)
    assert sorted(acts) == [("created", "pg.events"), ("created", "pg.users")]
    assert repo.running_keys() == {"pg.events", "pg.users"}

    # unchanged config → no-op
    assert repo.reconcile(None, start_fn=fake_start) == []

    # changed options → recreate; removed destination → retire
    repo.put(_spec("pg", "events", t, mode="batch", deduplicate=True))
    repo.remove("pg", "users")
    acts = repo.reconcile(None, start_fn=fake_start)
    assert ("recreated", "pg.events") in acts and ("retired", "pg.users") in acts
    assert repo.running_keys() == {"pg.events"}
    assert started.count("pg.events") == 2  # initial + recreate


def test_reconcile_real_streaming_query(spark, tmp_warehouse, tmp_path):
    """End-to-end: reconcile starts a real file-stream query that ingests a
    dropped NDJSON file; retiring stops it."""
    e = Engine(spark, tmp_warehouse)
    repo = Repository()
    spec = _spec("wh", "hot", str(tmp_path), mode="batch")
    os.makedirs(spec.source_dir, exist_ok=True)
    repo.put(spec)
    repo.reconcile(e)
    try:
        with open(f"{spec.source_dir}/drop1.ndjson", "w") as fh:
            for i in range(5):
                fh.write(json.dumps({"id": i}) + "\n")
        import time

        deadline = time.time() + 60
        while time.time() < deadline:
            if e.warehouse.exists("hot") and e.warehouse.count("hot") == 5:
                break
            time.sleep(2)
        assert e.warehouse.count("hot") == 5
    finally:
        repo.remove("wh", "hot")
        acts = repo.reconcile(e)
        assert acts == [("retired", "wh.hot")]
