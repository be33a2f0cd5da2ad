"""Bucket-index merge: hash-bucketed table layout (Hudi bucket-index
style) so a PK merge reads and rewrites ONLY the buckets containing
source keys. Equivalence vs the plain merge path + physical pruning
assertions on the partition directories."""

import glob
import os

import pytest

from bulker_spark.api import Engine
from bulker_spark.sinks.warehouse import BUCKET_COLUMN, Warehouse


def _bucket_files(warehouse_dir, table):
    """{bucket dir name: [(file, mtime)]} of the live version."""
    out = {}
    for p in glob.glob(f"{warehouse_dir}/default/{table}/v_*/__bucket=*"):
        out[os.path.basename(p)] = sorted(
            (f, os.path.getmtime(os.path.join(p, f)))
            for f in os.listdir(p)
            if f.endswith(".parquet")
        )
    return out


def _rows(e, table):
    df = e.warehouse.read(table)
    return sorted(
        (r["id"], r["name"]) for r in df.select("id", "name").collect()
    )


def _load(e, table, events, n_buckets=8):
    return e.bulk_load(
        table,
        events,
        mode="batch",
        primary_key=["id"],
        deduplicate=True,
        bucket_by=n_buckets,
    )


def test_bucketed_merge_equivalence(spark, tmp_warehouse):
    """Bucketed and unbucketed merges produce identical table contents."""
    eb = Engine(spark, os.path.join(tmp_warehouse, "b"))
    ep = Engine(spark, os.path.join(tmp_warehouse, "p"))
    seed = [{"id": i, "name": f"v{i}"} for i in range(200)]
    batch = [{"id": i, "name": f"NEW{i}"} for i in range(0, 200, 17)] + [
        {"id": 1000 + i, "name": f"ins{i}"} for i in range(5)
    ]
    _load(eb, "t", seed)
    _load(eb, "t", batch)
    ep.bulk_load("t", seed, mode="batch", primary_key=["id"], deduplicate=True)
    ep.bulk_load("t", batch, mode="batch", primary_key=["id"], deduplicate=True)
    assert _rows(eb, "t") == _rows(ep, "t")


def test_bucketed_layout_and_meta(spark, tmp_warehouse):
    e = Engine(spark, tmp_warehouse)
    _load(e, "t", [{"id": i, "name": str(i)} for i in range(100)])
    meta = e.warehouse.get_meta("t")
    assert meta.n_buckets == 8
    assert meta.bucket_cols == ["id"]
    assert meta.partition_by == [BUCKET_COLUMN]
    files = _bucket_files(tmp_warehouse, "t")
    assert 1 < len(files) <= 8
    # __bucket is readable and consistent with the hash
    df = e.warehouse.read("t")
    from pyspark.sql import functions as F

    bad = df.filter(
        F.col(BUCKET_COLUMN)
        != F.pmod(F.xxhash64(F.col("id")), F.lit(8)).cast("long")
    ).count()
    assert bad == 0


def test_merge_touches_only_source_buckets(spark, tmp_warehouse):
    """The physical claim: a batch whose keys hash to a subset of buckets
    leaves every other bucket's files untouched (same inode, same mtime)."""
    e = Engine(spark, tmp_warehouse)
    _load(e, "t", [{"id": i, "name": f"v{i}"} for i in range(400)])
    before = _bucket_files(tmp_warehouse, "t")
    assert len(before) == 8

    # single-key update → exactly one touched bucket
    _load(e, "t", [{"id": 7, "name": "UPDATED"}])
    after = _bucket_files(tmp_warehouse, "t")
    changed = [b for b in before if after.get(b) != before[b]]
    assert len(changed) == 1
    # and the update actually landed
    rows = dict(_rows(e, "t"))
    assert rows[7] == "UPDATED"
    assert len(rows) == 400


def test_bucketed_merge_schema_evolution(spark, tmp_warehouse):
    e = Engine(spark, tmp_warehouse)
    _load(e, "t", [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}])
    _load(e, "t", [{"id": 2, "name": "b2", "extra": 42}])
    df = e.warehouse.read("t")
    assert "extra" in df.columns
    got = {r["id"]: (r["name"], r["extra"]) for r in df.collect()}
    assert got[2] == ("b2", 42)
    assert got[1] == ("a", None)


def test_append_to_bucketed_table_derives_bucket(spark, tmp_warehouse):
    e = Engine(spark, tmp_warehouse)
    _load(e, "t", [{"id": 1, "name": "a"}])
    # plain (non-dedup) load into the same bucketed table
    e.bulk_load("t", [{"id": 2, "name": "b"}], mode="batch")
    df = e.warehouse.read("t")
    assert df.filter(df[BUCKET_COLUMN].isNull()).count() == 0
    assert df.count() == 2


def test_bucketed_with_time_partition_moved_row(spark, tmp_warehouse):
    """Update that moves a key to a newer time partition must not leave the
    stale row behind in the old (part, bucket) combo."""
    import datetime as dt

    e = Engine(spark, tmp_warehouse)
    now = dt.datetime(2024, 1, 10, 12, 0, 0)

    def load(events):
        return e.bulk_load(
            "t",
            events,
            mode="batch",
            primary_key=["id"],
            deduplicate=True,
            timestamp_column="ts",
            timestamp_partition="DAY",
            bucket_by=4,
            frozen_now=now,
        )

    # old row must sit INSIDE the merge window (window shrinks to batch
    # age: batch min ts Jan 10 → 1 day → cutoff Jan 9 12:00) or the window
    # semantics rightly freeze it
    load([{"id": 1, "ts": "2024-01-09 13:00:00", "name": "old"}])
    load([{"id": 1, "ts": "2024-01-10 11:00:00", "name": "new"}])
    df = e.warehouse.read("t")
    rows = [(r["name"],) for r in df.collect()]
    assert rows == [("new",)]
    # the emptied (2024-01-09, bucket) combo's stale dir is gone
    import glob as _glob

    stale = _glob.glob(
        f"{tmp_warehouse}/default/t/v_*/__ts_partition=2024-01-09/**/*.parquet",
        recursive=True,
    )
    assert stale == []


def test_bucketed_merge_pk_mismatch_falls_back(spark, tmp_warehouse):
    """bucket_cols ⊄ pk → generic merge path, still correct + bucketed
    layout preserved (no null-bucket rows)."""
    wh = Warehouse(spark, tmp_warehouse)
    df = spark.createDataFrame(
        [(1, "x", "a"), (2, "y", "b")], ["id", "k2", "name"]
    )
    wh.create_or_replace("t", df, pk=["id"], bucket_by=(["id"], 4))
    src = spark.createDataFrame([(2, "y", "B2")], ["id", "k2", "name"])
    wh.merge("t", src, pk=["k2"])  # bucket col "id" not part of merge pk
    out = wh.read("t")
    assert out.filter(out[BUCKET_COLUMN].isNull()).count() == 0
    got = {r["k2"]: r["name"] for r in out.collect()}
    assert got == {"x": "a", "y": "B2"}


def test_bucketed_merge_occ_conflict(spark, tmp_warehouse):
    from bulker_spark.sinks.warehouse import ConcurrentWriteError

    wh1 = Warehouse(spark, tmp_warehouse)
    df = spark.createDataFrame([(1, "a")], ["id", "name"])
    wh1.create_or_replace("t", df, pk=["id"], bucket_by=(["id"], 4))
    wh2 = Warehouse(spark, tmp_warehouse)
    # wh2 snapshots (capturing its OCC token), THEN wh1 commits underneath
    meta2, base2, _ = wh2._snapshot("t", None)
    wh1.merge("t", spark.createDataFrame([(2, "b")], ["id", "name"]), pk=["id"])
    src = spark.createDataFrame([(3, "c")], ["id", "name"])
    with pytest.raises(ConcurrentWriteError):
        wh2._merge_bucketed(
            "t", wh2._with_bucket(meta2, src), ["id"], meta2,
            None, None, None, None, base2,
        )


def test_lookup_prunes_to_key_buckets(spark, tmp_warehouse):
    """Point lookup on a bucketed table: the scan carries a __bucket
    partition filter (dir-level pruning), and results are exact."""
    e = Engine(spark, tmp_warehouse)
    _load(e, "t", [{"id": i, "name": f"v{i}"} for i in range(200)])
    df = e.warehouse.lookup("t", [3, 77])
    got = sorted((r["id"], r["name"]) for r in df.collect())
    assert got == [(3, "v3"), (77, "v77")]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "__bucket" in plan.split("PartitionFilters", 1)[-1][:200], plan
    # the key IN-filter reaches the parquet footer
    assert "PushedFilters: [In(id" in plan, plan


def test_lookup_on_mor_bucketed(spark, tmp_warehouse):
    """Lookup composes with merge-on-read: bucket pruning happens BELOW
    the reconcile window, and the reconciled row wins."""
    e = Engine(spark, tmp_warehouse)
    e.bulk_load(
        "t", [{"id": i, "name": f"v{i}"} for i in range(100)],
        mode="batch", primary_key=["id"], deduplicate=True,
        bucket_by=8, merge_on_read=True,
    )
    e.bulk_load(
        "t", [{"id": 9, "name": "UPD"}],
        mode="batch", primary_key=["id"], deduplicate=True,
    )
    df = e.warehouse.lookup("t", [9, 10])
    got = sorted((r["id"], r["name"]) for r in df.collect())
    assert got == [(9, "UPD"), (10, "v10")]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "__bucket" in plan.split("PartitionFilters", 1)[-1][:200], plan


def test_lookup_unbucketed_and_composite(spark, tmp_warehouse):
    wh = Warehouse(spark, tmp_warehouse)
    df = spark.createDataFrame(
        [(1, "a", "x"), (1, "b", "y"), (2, "a", "z")], ["k1", "k2", "v"]
    )
    wh.create_or_replace("t", df, pk=["k1", "k2"])
    got = sorted(
        (r["k1"], r["k2"], r["v"])
        for r in wh.lookup("t", [(1, "b"), (2, "a")]).collect()
    )
    assert got == [(1, "b", "y"), (2, "a", "z")]


def test_bucket_stats_and_rebucket(spark, tmp_warehouse):
    e = Engine(spark, tmp_warehouse)
    _load(e, "t", [{"id": i, "name": f"v{i}"} for i in range(400)])
    stats = e.warehouse.bucket_stats("t")
    assert stats["n_buckets"] == 8 and stats["populated"] == 8
    assert stats["skew_ratio"] >= 1.0
    before = _rows(e, "t")

    e.warehouse.rebucket("t", 16)
    e.warehouse.refresh("t")
    meta = e.warehouse.get_meta("t")
    assert meta.n_buckets == 16
    assert _rows(e, "t") == before
    # merges keep working at the new bucket count
    _load(e, "t", [{"id": 3, "name": "UPD"}])
    assert dict(_rows(e, "t"))[3] == "UPD"
    assert e.warehouse.bucket_stats("t")["n_buckets"] == 16


def test_rebucket_mor_folds(spark, tmp_warehouse):
    e = Engine(spark, tmp_warehouse)
    e.bulk_load(
        "t", [{"id": i, "name": f"v{i}"} for i in range(50)],
        mode="batch", primary_key=["id"], deduplicate=True,
        bucket_by=4, merge_on_read=True,
    )
    e.bulk_load(
        "t", [{"id": 1, "name": "UPD"}],
        mode="batch", primary_key=["id"], deduplicate=True,
    )
    e.warehouse.rebucket("t", 8)
    e.warehouse.refresh("t")
    meta = e.warehouse.get_meta("t")
    assert meta.n_buckets == 8 and meta.mor_deltas == 0
    rows = dict(_rows(e, "t"))
    assert rows[1] == "UPD" and len(rows) == 50
