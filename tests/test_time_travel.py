"""Time travel / history / restore on the versioned warehouse.

Commits are the snapshot unit (appends add files to the same version dir,
so each log entry carries a file manifest). ``read(version=)`` accepts a
commit id or a version string; ``restore`` hard-links a snapshot's
manifest into a fresh version dir — Delta/Iceberg's time-travel surface on
the dependency-free warehouse.
"""

import pytest

from bulker_spark.sinks.warehouse import Warehouse


@pytest.fixture()
def wh(spark, tmp_warehouse):
    return Warehouse(spark, tmp_warehouse, retain_versions=3)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, name string")


def test_history_records_each_commit(spark, wh):
    wh.create_or_replace("t", _df(spark, [(1, "a")]), pk=["id"])
    wh.append("t", _df(spark, [(2, "b")]))
    h = wh.history("t")
    assert [e["op"] for e in h] == ["append", "replace_table"]
    assert [e["commit"] for e in h] == [2, 1]
    assert all(e["available"] for e in h)
    # the append snapshot has strictly more files than the initial one
    assert h[0]["n_files"] > h[1]["n_files"]


def test_read_old_snapshot_by_commit_id(spark, wh):
    wh.create_or_replace("t", _df(spark, [(1, "a")]), pk=["id"])
    wh.append("t", _df(spark, [(2, "b")]))
    assert wh.read("t").count() == 2
    old = wh.read("t", version=1)  # commit id
    assert [(r["id"], r["name"]) for r in old.collect()] == [(1, "a")]


def test_read_old_version_pre_evolution_schema(spark, wh):
    """A snapshot written before a column existed reads back with its OWN
    schema, not the live one."""
    wh.create_or_replace("t", _df(spark, [(1, "a")]), pk=["id"])
    evolved = spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    )
    wh.append("t", evolved)
    assert "score" in wh.read("t").columns
    assert "score" not in wh.read("t", version=1).columns


def test_restore_rolls_back_and_is_a_commit(spark, wh):
    wh.create_or_replace("t", _df(spark, [(1, "a")]), pk=["id"])
    wh.append("t", _df(spark, [(2, "b")]))
    wh.restore("t", 1)
    assert wh.read("t").count() == 1
    h = wh.history("t")
    assert h[0]["op"] == "restore"
    # the restore is undoable: the pre-restore (append) snapshot is intact
    assert h[1]["op"] == "append" and h[1]["available"]
    wh.restore("t", 2)
    assert wh.read("t").count() == 2


def test_restore_by_version_string(spark, wh):
    m1 = wh.create_or_replace("t", _df(spark, [(1, "a")]), pk=["id"])
    wh.create_or_replace("t", _df(spark, [(2, "b"), (3, "c")]), pk=["id"])
    wh.restore("t", m1.version)
    assert wh.read("t").count() == 1


def test_gc_respects_retention(spark, wh):
    metas = [
        wh.create_or_replace("t", _df(spark, [(i, "x")]), pk=["id"])
        for i in range(5)
    ]
    h = wh.history("t")
    assert len(h) == 5
    # newest 3 retained, oldest 2 gone
    assert [e["available"] for e in h] == [True, True, True, False, False]
    with pytest.raises(FileNotFoundError):
        wh.read("t", version=metas[0].version)
    # default retention (1) still GCs immediately
    wh1 = Warehouse(spark, wh.root + "_single")
    a = wh1.create_or_replace("s", _df(spark, [(1, "a")]))
    wh1.create_or_replace("s", _df(spark, [(2, "b")]))
    assert [e["available"] for e in wh1.history("s")] == [True, False]
    with pytest.raises(FileNotFoundError):
        wh1.read("s", version=a.version)


def test_partitioned_snapshot_keeps_partition_columns(spark, wh):
    df = spark.createDataFrame(
        [(1, "a", "p1"), (2, "b", "p2")], "id long, name string, part string"
    )
    wh.create_or_replace("t", df, partition_by=["part"])
    df2 = spark.createDataFrame([(3, "c", "p3")], "id long, name string, part string")
    wh.append("t", df2)
    old = wh.read("t", version=1)
    assert old.count() == 2
    assert {r["part"] for r in old.collect()} == {"p1", "p2"}


def test_unknown_version_raises(spark, wh):
    wh.create_or_replace("t", _df(spark, [(1, "a")]))
    with pytest.raises(FileNotFoundError):
        wh.read("t", version="v_deadbeef")
    with pytest.raises(FileNotFoundError):
        wh.restore("t", "v_deadbeef")


def test_read_appended_incremental(spark, wh):
    wh.create_or_replace("t", _df(spark, [(1, "a")]), pk=["id"])
    wh.append("t", _df(spark, [(2, "b"), (3, "c")]))
    wh.append("t", _df(spark, [(4, "d")]))
    inc = wh.read_appended("t", since_commit=1)
    assert sorted(r["id"] for r in inc.collect()) == [2, 3, 4]
    inc2 = wh.read_appended("t", since_commit=2)
    assert sorted(r["id"] for r in inc2.collect()) == [4]
    assert wh.read_appended("t", since_commit=3).count() == 0


def test_read_appended_rejects_rewrites(spark, wh):
    wh.create_or_replace("t", _df(spark, [(1, "a")]), pk=["id"])
    wh.create_or_replace("t", _df(spark, [(2, "b")]), pk=["id"])
    with pytest.raises(ValueError, match="rewritten"):
        wh.read_appended("t", since_commit=1)
    with pytest.raises(FileNotFoundError):
        wh.read_appended("t", since_commit=99)


def test_replace_partition_keeps_old_snapshot_readable(spark, wh):
    """Partition replace writes a NEW hard-linked version: a retained old
    snapshot still reads the pre-replace partition files (the in-place
    dynamic overwrite it replaced used to clobber them)."""
    df = spark.createDataFrame(
        [(1, "a", "p1"), (2, "b", "p2")], "id long, name string, part string"
    )
    wh.create_or_replace("t", df, pk=["id"], partition_by=["part"])
    wh.replace_partition(
        "t",
        spark.createDataFrame([(9, "NEW", "p1")], "id long, name string, part string"),
        partition_column="part",
    )
    live = {(r["id"], r["name"]) for r in wh.read("t").collect()}
    assert live == {(9, "NEW"), (2, "b")}
    old = {(r["id"], r["name"]) for r in wh.read("t", version=1).collect()}
    assert old == {(1, "a"), (2, "b")}
    h = wh.history("t")
    assert all(e["available"] for e in h)


def test_partitioned_merge_keeps_old_snapshot_readable(spark, wh):
    """Window-bounded partitioned merge rewrites only live partitions —
    into a new version; the frozen partitions are hard links and the old
    snapshot (including pre-merge live rows) stays readable."""
    import datetime as dt

    rows = [
        (1, "old", dt.datetime(2024, 1, 1)),
        (2, "recent", dt.datetime(2024, 3, 1)),
    ]
    df = spark.createDataFrame(rows, "id long, name string, ts timestamp")
    from bulker_spark.api import Engine

    e = Engine(spark, wh.root)
    e.warehouse.retain_versions = 3
    e.bulk_load(
        "t", df, mode="batch", primary_key=["id"], deduplicate=True,
        timestamp_column="ts", timestamp_partition="DAY",
    )
    e.bulk_load(
        "t",
        spark.createDataFrame(
            [(2, "updated", dt.datetime(2024, 3, 1))],
            "id long, name string, ts timestamp",
        ),
        mode="batch", primary_key=["id"], deduplicate=True,
        timestamp_column="ts", timestamp_partition="DAY",
        deduplicate_window=30, frozen_now=dt.datetime(2024, 3, 10),
    )
    live = {r["id"]: r["name"] for r in e.warehouse.read("t").collect()}
    assert live == {1: "old", 2: "updated"}
    old = {
        r["id"]: r["name"] for r in e.warehouse.read("t", version=1).collect()
    }
    assert old == {1: "old", 2: "recent"}


def test_bucketed_merge_keeps_old_snapshot_readable(spark, wh):
    wh.create_or_replace(
        "t",
        spark.createDataFrame([(i, f"v{i}") for i in range(20)], "id long, name string"),
        pk=["id"],
        bucket_by=(["id"], 4),
    )
    wh.merge(
        "t",
        spark.createDataFrame([(3, "UPDATED")], "id long, name string"),
        pk=["id"],
    )
    assert {
        r["name"] for r in wh.read("t").filter("id = 3").collect()
    } == {"UPDATED"}
    old = wh.read("t", version=1)
    assert {r["name"] for r in old.filter("id = 3").collect()} == {"v3"}
    assert old.count() == 20


def test_clone_is_zero_copy_and_independent(spark, wh):
    """SHALLOW-CLONE semantics, durable: the clone hard-links the source
    manifest (no data copy), reads identically, and the two tables evolve
    independently — including surviving the source being vacuumed or
    rewritten."""
    import os

    wh.create_or_replace("src", _df(spark, [(1, "a"), (2, "b")]), pk=["id"])
    wh.append("src", _df(spark, [(3, "c")]))
    meta = wh.clone("src", "pinned")
    assert {r["id"] for r in wh.read("pinned").collect()} == {1, 2, 3}
    # zero-copy: every clone file shares an inode with a source file
    src_meta = wh.get_meta("src")
    src_vdir = os.path.join(wh._table_dir("src"), src_meta.version)
    tgt_vdir = os.path.join(wh._table_dir("pinned"), meta.version)
    src_inodes = {
        os.stat(os.path.join(dp, f)).st_ino
        for dp, _dn, fn in os.walk(src_vdir)
        for f in fn
        if f.endswith(".parquet")
    }
    tgt_inodes = {
        os.stat(os.path.join(dp, f)).st_ino
        for dp, _dn, fn in os.walk(tgt_vdir)
        for f in fn
        if f.endswith(".parquet")
    }
    assert tgt_inodes and tgt_inodes <= src_inodes
    # independence both ways
    wh.append("pinned", _df(spark, [(9, "z")]))
    wh.create_or_replace("src", _df(spark, [(100, "new")]), pk=["id"])
    assert {r["id"] for r in wh.read("pinned").collect()} == {1, 2, 3, 9}
    assert {r["id"] for r in wh.read("src").collect()} == {100}
    # clone of a historical snapshot by commit id
    wh.clone("pinned", "pinned_v1", snapshot=1)
    assert {r["id"] for r in wh.read("pinned_v1").collect()} == {1, 2, 3}


def test_clone_refuses_existing_target(spark, wh):
    wh.create_or_replace("a", _df(spark, [(1, "x")]), pk=["id"])
    wh.create_or_replace("b", _df(spark, [(2, "y")]), pk=["id"])
    with pytest.raises(ValueError):
        wh.clone("a", "b")
