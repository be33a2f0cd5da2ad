"""Partition-pruned merge: only in-window partitions are rewritten."""

import datetime as dt
import glob
import os

from bulker_spark.api import Engine

NOW = dt.datetime(2024, 1, 10, 12, 0, 0)


def _ev(i, day, name):
    return {
        "id": i,
        "ts": f"2024-01-{day:02d} 10:00:00",
        "name": name,
    }


def _partition_files(warehouse_dir, table):
    out = {}
    for p in glob.glob(f"{warehouse_dir}/default/{table}/v_*/__ts_partition=*"):
        key = os.path.basename(p)
        out[key] = sorted(
            (f, os.path.getmtime(os.path.join(p, f)))
            for f in os.listdir(p)
            if f.endswith(".parquet")
        )
    return out


def _load(e, events, **kw):
    return e.bulk_load(
        "tp", events, mode="batch", primary_key=["id"], deduplicate=True,
        timestamp_column="ts", timestamp_partition="DAY",
        deduplicate_window=3, frozen_now=NOW, **kw,
    )


def test_frozen_partitions_untouched(spark, tmp_warehouse):
    e = Engine(spark, tmp_warehouse)
    # seed: days 1..9 (window = 3 days back from Jan 10 → cutoff Jan 7)
    _load(e, [_ev(i, day=i, name=f"old{i}") for i in range(1, 10)])
    before = _partition_files(tmp_warehouse, "tp")
    assert len(before) == 9

    # merge a batch touching day 8 (id=8 update) + a new day-9 row (id=99)
    _load(e, [_ev(8, day=8, name="NEW8"), _ev(99, day=9, name="new99")])

    after = _partition_files(tmp_warehouse, "tp")
    # frozen partitions (days 1-6, before the cutoff) byte-identical
    for day in range(1, 7):
        key = f"__ts_partition=2024-01-{day:02d}"
        assert after[key] == before[key], f"{key} was rewritten"
    # day 8 rewritten (update applied), day 9 rewritten (insert landed)
    assert after["__ts_partition=2024-01-08"] != before["__ts_partition=2024-01-08"]

    rows = {r["id"]: r for r in e.warehouse.read("tp").collect()}
    assert len(rows) == 10
    assert rows[8]["name"] == "NEW8" and rows[99]["name"] == "new99"
    assert rows[3]["name"] == "old3"  # frozen row intact


def test_emptied_partition_does_not_resurrect(spark, tmp_warehouse):
    e = Engine(spark, tmp_warehouse)
    _load(e, [_ev(1, day=8, name="a"), _ev(2, day=9, name="b")])
    # id=1 moves from day 8 to day 9 → day-8 partition becomes empty
    _load(e, [_ev(1, day=9, name="a2")])
    rows = sorted(e.warehouse.read("tp").collect(), key=lambda r: r["id"])
    assert len(rows) == 2  # id=1 must NOT appear twice (day-8 copy gone)
    assert rows[0]["name"] == "a2"
    parts = _partition_files(tmp_warehouse, "tp")
    assert "__ts_partition=2024-01-08" not in parts  # emptied dir removed


def test_frozen_duplicate_outside_window_survives(spark, tmp_warehouse):
    """Merge-window semantics: a PK older than the window is not deduped
    (the reference's bounded DELETE reaches only window rows)."""
    e = Engine(spark, tmp_warehouse)
    _load(e, [_ev(7, day=2, name="ancient")])  # day 2 < cutoff (Jan 7)
    _load(e, [_ev(7, day=9, name="recent")])
    rows = e.warehouse.read("tp").filter("id = 7").collect()
    assert len(rows) == 2  # both copies live: window bounds the dedup


def test_live_slice_read_partition_pruned(spark, tmp_warehouse):
    """The merge's target read must carry a PartitionFilters entry on the
    partition column — the physical proof the frozen history isn't read."""
    from bulker_spark.plans import audit

    e = Engine(spark, tmp_warehouse)
    _load(e, [_ev(i, day=i, name=f"r{i}") for i in range(1, 10)])
    from pyspark.sql import functions as F

    target = e.warehouse.read("tp")
    live = target.filter(F.col("__ts_partition") >= "2024-01-07")
    txt = audit.explain_str(live, "formatted")
    assert "PartitionFilters" in txt and "__ts_partition" in txt
    # and the scan reports pruning (fewer partition dirs than exist)
    assert live.count() == 3  # days 7,8,9 only
