"""Merge-on-read tables (Hudi MoR style): merges append sequence-stamped
delta files, reads reconcile per-PK last-wins, compact() folds."""

import glob
import os

import pytest

from bulker_spark.api import Engine
from bulker_spark.sinks.warehouse import (
    COMMIT_SEQ_COLUMN,
    ConcurrentWriteError,
    Warehouse,
)


def _rows(e, table):
    df = e.warehouse.read(table)
    return sorted(
        (r["id"], r["name"]) for r in df.select("id", "name").collect()
    )


def _load(e, table, events, **kw):
    return e.bulk_load(
        table, events, mode="batch", primary_key=["id"], deduplicate=True,
        merge_on_read=True, **kw,
    )


def test_mor_equivalence_with_cow(spark, tmp_warehouse):
    em = Engine(spark, os.path.join(tmp_warehouse, "m"))
    ec = Engine(spark, os.path.join(tmp_warehouse, "c"))
    batches = [
        [{"id": i, "name": f"v{i}"} for i in range(100)],
        [{"id": i, "name": f"b2_{i}"} for i in range(0, 100, 7)],
        [{"id": 200 + i, "name": f"ins{i}"} for i in range(5)]
        + [{"id": 3, "name": "b3_3"}],
    ]
    for b in batches:
        _load(em, "t", b)
        ec.bulk_load("t", b, mode="batch", primary_key=["id"], deduplicate=True)
    assert _rows(em, "t") == _rows(ec, "t")


def test_mor_merge_is_append_only(spark, tmp_warehouse):
    """The physical claim: a merge into an MoR table never rewrites or
    deletes existing files — it only adds delta files."""
    e = Engine(spark, tmp_warehouse)
    _load(e, "t", [{"id": i, "name": f"v{i}"} for i in range(100)])

    def files():
        return {
            p: os.path.getmtime(p)
            for p in glob.glob(
                f"{tmp_warehouse}/default/t/v_*/**/*.parquet", recursive=True
            )
        }

    before = files()
    _load(e, "t", [{"id": 5, "name": "UPD"}])
    after = files()
    assert set(before) <= set(after)  # nothing deleted
    assert all(after[p] == before[p] for p in before)  # nothing rewritten
    assert len(after) > len(before)  # deltas appended
    rows = dict(_rows(e, "t"))
    assert rows[5] == "UPD" and len(rows) == 100


def test_mor_compact_folds(spark, tmp_warehouse):
    e = Engine(spark, tmp_warehouse)
    _load(e, "t", [{"id": i, "name": f"v{i}"} for i in range(50)])
    for k in range(4):
        _load(e, "t", [{"id": k, "name": f"upd{k}"}])
    meta = e.warehouse.get_meta("t")
    assert meta.write_mode == "mor"
    assert meta.mor_deltas == 4
    before_rows = _rows(e, "t")
    n_before = e.warehouse.table_stats("t")["n_files"]
    res = e.warehouse.compact("t", target_file_bytes=1 << 30)
    assert res["after"]["n_files"] < n_before
    e.warehouse.refresh("t")
    assert e.warehouse.get_meta("t").mor_deltas == 0
    assert _rows(e, "t") == before_rows
    # further merges still work after the fold
    _load(e, "t", [{"id": 0, "name": "postfold"}])
    assert dict(_rows(e, "t"))[0] == "postfold"


def test_mor_auto_compaction(spark, tmp_warehouse):
    e = Engine(spark, tmp_warehouse)
    for k in range(4):
        _load(
            e, "t", [{"id": k, "name": f"b{k}"}], mor_compact_every=3
        )
    meta = e.warehouse.get_meta("t")
    # 3 deltas after creation → folded on the 3rd, 4th starts a new run
    assert meta.mor_deltas <= 1
    assert len(_rows(e, "t")) == 4


def test_mor_bucketed_layout(spark, tmp_warehouse):
    """MoR composes with the bucket-index layout: deltas land inside the
    bucket dirs, reads prune + reconcile."""
    e = Engine(spark, tmp_warehouse)
    _load(e, "t", [{"id": i, "name": f"v{i}"} for i in range(100)], bucket_by=8)
    _load(e, "t", [{"id": 5, "name": "UPD"}], bucket_by=8)
    null_dirs = glob.glob(
        f"{tmp_warehouse}/default/t/v_*/__bucket=__HIVE_DEFAULT_PARTITION__"
    )
    assert null_dirs == []
    rows = dict(_rows(e, "t"))
    assert rows[5] == "UPD" and len(rows) == 100


def test_mor_schema_evolution(spark, tmp_warehouse):
    e = Engine(spark, tmp_warehouse)
    _load(e, "t", [{"id": 1, "name": "a"}])
    _load(e, "t", [{"id": 1, "name": "a2", "extra": 7}])
    df = e.warehouse.read("t")
    assert COMMIT_SEQ_COLUMN not in df.columns  # physical stamp hidden
    got = {r["id"]: (r["name"], r["extra"]) for r in df.collect()}
    assert got == {1: ("a2", 7)}


def test_mor_time_travel(spark, tmp_warehouse):
    wh = Warehouse(spark, tmp_warehouse, retain_versions=5)
    df1 = spark.createDataFrame([(1, "a")], ["id", "name"])
    wh.create_or_replace("t", df1, pk=["id"], merge_on_read=True)
    log0 = wh.history("t")[-1]["commit"]
    wh.merge("t", spark.createDataFrame([(1, "a2")], ["id", "name"]), pk=["id"])
    assert [
        (r["id"], r["name"]) for r in wh.read("t").collect()
    ] == [(1, "a2")]
    old = wh.read("t", version=log0)
    assert [(r["id"], r["name"]) for r in old.collect()] == [(1, "a")]


def test_mor_plain_append_upserts(spark, tmp_warehouse):
    """A non-dedup load into an MoR table still claims a sequence —
    duplicate keys collapse on read (every write is an upsert)."""
    e = Engine(spark, tmp_warehouse)
    _load(e, "t", [{"id": 1, "name": "a"}])
    e.bulk_load("t", [{"id": 1, "name": "a2"}], mode="batch")
    assert _rows(e, "t") == [(1, "a2")]


def test_mor_occ_serializes_sequence(spark, tmp_warehouse):
    """Two racing MoR merges can't claim the same commit sequence: the
    loser's stale token raises before its delta is committed."""
    wh1 = Warehouse(spark, tmp_warehouse)
    wh1.create_or_replace(
        "t",
        spark.createDataFrame([(1, "a")], ["id", "name"]),
        pk=["id"],
        merge_on_read=True,
    )
    wh2 = Warehouse(spark, tmp_warehouse)
    meta2, base2, _ = wh2._snapshot("t", None)
    wh1.merge("t", spark.createDataFrame([(2, "b")], ["id", "name"]), pk=["id"])
    with pytest.raises(ConcurrentWriteError):
        wh2._merge_mor(
            "t",
            spark.createDataFrame([(3, "c")], ["id", "name"]),
            ["id"],
            meta2,
            None,
            None,
            base2,
        )


def test_mor_delete_and_truncate(spark, tmp_warehouse):
    from bulker_spark.operators.filters import WhenCondition, WhenConditions

    e = Engine(spark, tmp_warehouse)
    _load(e, "t", [{"id": i, "name": f"v{i}"} for i in range(10)])
    _load(e, "t", [{"id": 3, "name": "UPD"}])
    n = e.warehouse.delete(
        "t", WhenConditions([WhenCondition("id", "=", 3)])
    )
    assert n == 1
    assert len(_rows(e, "t")) == 9
    # post-delete merges still reconcile correctly
    _load(e, "t", [{"id": 0, "name": "after"}])
    assert dict(_rows(e, "t"))[0] == "after"
    e.warehouse.truncate("t")
    assert e.warehouse.read("t").count() == 0
    meta = e.warehouse.get_meta("t")
    assert meta.write_mode == "mor"


def test_mor_streaming_cdc(spark, tmp_warehouse):
    """The CDC topology the MoR type exists for: a checkpointed stream of
    small upsert batches lands as O(batch) delta appends; auto-compaction
    folds after the threshold; the reconciled table is exact."""
    import json
    import tempfile

    from bulker_spark.api import StreamOptions
    from bulker_spark.streaming.ingest_stream import (
        IngestStream,
        json_file_stream,
    )

    src = tempfile.mkdtemp(prefix="mor_src_")
    ckpt = tempfile.mkdtemp(prefix="mor_ckpt_")
    e = Engine(spark, tmp_warehouse)
    opts = StreamOptions(
        mode="batch", primary_key=["id"], deduplicate=True,
        merge_on_read=True, mor_compact_every=3,
    )

    with open(os.path.join(src, "seed.ndjson"), "w") as fh:
        for i in range(50):
            fh.write(json.dumps({"id": i, "name": f"v{i}"}) + "\n")
    q = IngestStream(e, "t", opts).start(json_file_stream(spark, src), ckpt)
    q.awaitTermination(120)

    for b in range(4):  # four trickle micro-batches
        with open(os.path.join(src, f"cdc{b}.ndjson"), "w") as fh:
            fh.write(json.dumps({"id": b, "name": f"upd{b}"}) + "\n")
        q = IngestStream(e, "t", opts).start(
            json_file_stream(spark, src), ckpt
        )
        q.awaitTermination(120)

    e.warehouse.refresh("t")
    meta = e.warehouse.get_meta("t")
    assert meta.write_mode == "mor"
    assert meta.mor_deltas < 4  # auto-compaction folded at least once
    rows = dict(_rows(e, "t"))
    assert len(rows) == 50
    for b in range(4):
        assert rows[b] == f"upd{b}"


def test_mor_change_feed(spark, tmp_warehouse):
    """read_appended on an MoR table: default op set refuses (additive
    consumers would double-count); opting in to merge_mor yields the
    upsert change feed — exactly the delta rows of the new commits."""
    e = Engine(spark, tmp_warehouse)
    _load(e, "t", [{"id": i, "name": f"v{i}"} for i in range(10)])
    base = max(h["commit"] for h in e.warehouse.history("t"))
    _load(e, "t", [{"id": 3, "name": "UPD3"}])
    _load(e, "t", [{"id": 42, "name": "new42"}])

    with pytest.raises(ValueError):
        e.warehouse.read_appended("t", base)

    feed = e.warehouse.read_appended("t", base, ops=("append", "merge_mor"))
    rows = sorted((r["id"], r["name"]) for r in feed.select("id", "name").collect())
    assert rows == [(3, "UPD3"), (42, "new42")]


def test_incremental_rollup_on_mor_rebuilds(spark, tmp_warehouse):
    """An additive rollup over an MoR source must fall back to a full
    rebuild (delta files supersede, they don't add) — and stay correct."""
    from bulker_spark.operators.incremental import incremental_rollup

    e = Engine(spark, tmp_warehouse)
    _load(e, "t", [{"id": i, "grp": i % 3, "name": "x"} for i in range(30)])
    ru = incremental_rollup(e.warehouse, "t", "t_rollup", ["grp"])
    assert ru.refresh()["mode"] == "initial"
    _load(e, "t", [{"id": 1, "grp": 1, "name": "upd"}])  # supersedes, no add
    res = ru.refresh()
    assert res["mode"] == "rebuild"
    got = {
        r["grp"]: r["n"]
        for r in e.warehouse.read("t_rollup").collect()
    }
    assert got == {0: 10, 1: 10, 2: 10}  # counts unchanged: upsert, not insert


def test_mor_delete_keys_tombstone(spark, tmp_warehouse):
    """MoR delete = O(keys) tombstone append: reads drop the key, the
    change feed carries the delete record, compaction folds it away,
    and a later upsert resurrects the key."""
    e = Engine(spark, tmp_warehouse)
    _load(e, "t", [{"id": i, "name": f"v{i}"} for i in range(10)])
    base = max(h["commit"] for h in e.warehouse.history("t"))

    def files():
        return set(
            glob.glob(f"{tmp_warehouse}/default/t/v_*/**/*.parquet",
                      recursive=True)
        )

    before = files()
    e.warehouse.delete_keys("t", [3, 7])
    assert before <= files()  # append-only delete
    rows = dict(_rows(e, "t"))
    assert len(rows) == 8 and 3 not in rows and 7 not in rows

    # the change feed shows the tombstones
    feed = e.warehouse.read_appended("t", base, ops=("append", "merge_mor"))
    dels = sorted(
        r["id"] for r in feed.filter(feed["__deleted"] == True).collect()  # noqa: E712
    )
    assert dels == [3, 7]

    # compaction folds tombstones away physically
    e.warehouse.compact("t", target_file_bytes=1 << 30)
    e.warehouse.refresh("t")
    assert len(dict(_rows(e, "t"))) == 8

    # a later upsert resurrects the key
    _load(e, "t", [{"id": 3, "name": "back"}])
    assert dict(_rows(e, "t"))[3] == "back"


def test_cow_delete_keys(spark, tmp_warehouse):
    e = Engine(spark, tmp_warehouse)
    e.bulk_load(
        "t", [{"id": i, "name": f"v{i}"} for i in range(10)],
        mode="batch", primary_key=["id"], deduplicate=True, bucket_by=4,
    )
    e.warehouse.delete_keys("t", [2])
    rows = dict(_rows(e, "t"))
    assert len(rows) == 9 and 2 not in rows
    from bulker_spark.sinks.warehouse import BUCKET_COLUMN
    df = e.warehouse.read("t")
    assert df.filter(df[BUCKET_COLUMN].isNull()).count() == 0


def test_mor_read_fast_path_after_fold(spark, tmp_warehouse):
    """A folded MoR table (mor_deltas == 0) reads WITHOUT the reconcile
    window — same plan class as CoW; with pending deltas the window is
    present."""
    e = Engine(spark, tmp_warehouse)
    _load(e, "t", [{"id": i, "name": f"v{i}"} for i in range(20)])
    _load(e, "t", [{"id": 1, "name": "upd"}])

    def has_window(df):
        return "Window" in df._jdf.queryExecution().executedPlan().toString()

    assert has_window(e.warehouse.read("t"))
    e.warehouse.compact("t", target_file_bytes=1 << 30)
    e.warehouse.refresh("t")
    df = e.warehouse.read("t")
    assert not has_window(df)
    assert dict(_rows(e, "t"))[1] == "upd"


def test_engine_sql_over_mor(spark, tmp_warehouse):
    """Engine.sql snapshot views see the RECONCILED MoR state."""
    e = Engine(spark, tmp_warehouse)
    _load(e, "t", [{"id": i, "name": f"v{i}"} for i in range(5)])
    _load(e, "t", [{"id": 2, "name": "UPD"}])
    got = {
        r["id"]: r["name"]
        for r in e.sql("SELECT id, name FROM t").collect()
    }
    assert got[2] == "UPD" and len(got) == 5


def test_replace_partition_rejected_on_mor(spark, tmp_warehouse):
    """Partition overwrite would drop stamped history unevenly —
    explicitly undefined on MoR tables."""
    wh = Warehouse(spark, tmp_warehouse)
    df = spark.createDataFrame([(1, "p1", "a")], ["id", "part", "v"])
    wh.create_or_replace(
        "t", df, pk=["id"], partition_by=["part"], merge_on_read=True
    )
    with pytest.raises(ValueError, match="merge-on-read"):
        wh.replace_partition(
            "t",
            spark.createDataFrame([(2, "p1", "b")], ["id", "part", "v"]),
            partition_column="part",
        )
