"""Warehouse→warehouse incremental replication on the streaming change
feed (TableReplica): snapshot bootstrap pinned to a commit, follow via
foreachBatch merge+delete, exactly-once across restarts.

The load-bearing invariant: after every drain, destination rows ==
source rows — across merges, appends, deletes, and schema evolution.
"""

import tempfile

import pytest
from pyspark.sql import functions as F

from bulker_spark.api import Engine
from bulker_spark.streaming.replicate import TableReplica


@pytest.fixture()
def rig(spark, tmp_path):
    src = Engine(spark, str(tmp_path / "src"), retain_versions=10)
    dst = Engine(spark, str(tmp_path / "dst"), retain_versions=5)
    return src, dst, str(tmp_path / "ckpt")


def _df(spark, rows):
    return spark.createDataFrame(rows, "pk long, val string, score double")


def _rows(eng, table):
    return sorted(
        map(tuple, eng.warehouse.read(table).select("pk", "val", "score").collect())
    )


def _drain(replica, ckpt):
    q = replica.start(ckpt)
    q.awaitTermination()


def test_bootstrap_copies_snapshot_and_layout(spark, rig):
    src, dst, ckpt = rig
    src.warehouse.create_or_replace(
        "t", _df(spark, [(i, f"v{i}", float(i)) for i in range(50)]),
        pk=["pk"], bucket_by=(["pk"], 8),
    )
    _drain(TableReplica(src, "t", dst), ckpt)
    assert _rows(dst, "t") == _rows(src, "t")
    meta = dst.warehouse.get_meta("t")
    assert list(meta.pk) == ["pk"]
    assert meta.n_buckets == 8 and list(meta.bucket_cols) == ["pk"]


def test_follow_applies_merge_append_delete(spark, rig):
    src, dst, ckpt = rig
    src.warehouse.create_or_replace(
        "t", _df(spark, [(i, f"v{i}", float(i)) for i in range(20)]), pk=["pk"]
    )
    rep = TableReplica(src, "t", dst)
    _drain(rep, ckpt)
    src.warehouse.merge("t", _df(spark, [(3, "X", 3.5), (21, "new", 21.0)]), ["pk"])
    src.warehouse.append("t", _df(spark, [(40, "app", 40.0)]))
    src.warehouse.delete_keys("t", [5, 21])
    _drain(rep, ckpt)
    assert _rows(dst, "t") == _rows(src, "t")
    got = {r["pk"]: r["val"] for r in dst.warehouse.read("t").collect()}
    assert got[3] == "X" and 5 not in got and 21 not in got and got[40] == "app"


def test_no_gap_between_snapshot_and_feed(spark, rig):
    """Commits landing AFTER bootstrap's pinned snapshot but BEFORE the
    first drain must flow through the feed exactly once."""
    src, dst, ckpt = rig
    src.warehouse.create_or_replace(
        "t", _df(spark, [(1, "a", 1.0)]), pk=["pk"]
    )
    rep = TableReplica(src, "t", dst)
    start = rep._bootstrap(ckpt)  # snapshot copied, commit pinned
    src.warehouse.append("t", _df(spark, [(2, "b", 2.0)]))  # post-snapshot
    q = src.stream_changes("t", starting_commit=start)
    # run the follow exactly as start() wires it, minus the re-bootstrap
    qq = (
        q.writeStream.foreachBatch(rep._apply)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    qq.awaitTermination()
    assert _rows(dst, "t") == _rows(src, "t")


def test_restart_is_exactly_once(spark, rig):
    src, dst, ckpt = rig
    src.warehouse.create_or_replace(
        "t", _df(spark, [(i, f"v{i}", float(i)) for i in range(10)]), pk=["pk"]
    )
    rep = TableReplica(src, "t", dst)
    _drain(rep, ckpt)
    src.warehouse.merge("t", _df(spark, [(1, "one", 1.0)]), ["pk"])
    _drain(rep, ckpt)
    before = dst.warehouse.history("t")[0]["commit"]
    _drain(rep, ckpt)  # nothing new: no destination commits
    assert dst.warehouse.history("t")[0]["commit"] == before
    assert _rows(dst, "t") == _rows(src, "t")


def test_multi_commit_batch_is_last_wins(spark, rig):
    """Several source commits drain in ONE micro-batch; the destination
    must see only the final value per key (and deletes must win over
    earlier updates, inserts over earlier deletes)."""
    src, dst, ckpt = rig
    src.warehouse.create_or_replace(
        "t", _df(spark, [(1, "a", 1.0), (2, "b", 2.0)]), pk=["pk"]
    )
    rep = TableReplica(src, "t", dst)
    _drain(rep, ckpt)
    src.warehouse.merge("t", _df(spark, [(1, "a2", 1.0)]), ["pk"])
    src.warehouse.merge("t", _df(spark, [(1, "a3", 1.0)]), ["pk"])
    src.warehouse.delete_keys("t", [2])
    src.warehouse.merge("t", _df(spark, [(2, "b-back", 2.0)]), ["pk"])
    _drain(rep, ckpt)
    assert _rows(dst, "t") == _rows(src, "t")
    got = {r["pk"]: r["val"] for r in dst.warehouse.read("t").collect()}
    assert got == {1: "a3", 2: "b-back"}


def test_schema_evolution_replicates(spark, rig):
    src, dst, ckpt = rig
    src.warehouse.create_or_replace(
        "t", _df(spark, [(1, "a", 1.0)]), pk=["pk"]
    )
    rep = TableReplica(src, "t", dst)
    _drain(rep, ckpt)
    wider = spark.createDataFrame(
        [(2, "b", 2.0, "extra")],
        "pk long, val string, score double, note string",
    )
    src.warehouse.merge("t", wider, ["pk"])
    _drain(rep, ckpt)
    got = {r["pk"]: r for r in dst.warehouse.read("t").collect()}
    assert got[2]["note"] == "extra"
    assert got[1]["note"] is None


def test_transform_projects_upserts(spark, rig):
    src, dst, ckpt = rig
    src.warehouse.create_or_replace(
        "t", _df(spark, [(1, "a", 1.0)]), pk=["pk"]
    )
    tf = lambda df: df.withColumn("val", F.upper(F.col("val")))  # noqa: E731
    rep = TableReplica(src, "t", dst, dst_table="t_up", transform=tf)
    _drain(rep, ckpt)
    src.warehouse.merge("t", _df(spark, [(2, "b", 2.0)]), ["pk"])
    src.warehouse.delete_keys("t", [1])
    _drain(rep, ckpt)
    got = {r["pk"]: r["val"] for r in dst.warehouse.read("t_up").collect()}
    assert got == {2: "B"}


def test_pkless_source_replicates_append_only(spark, rig):
    src, dst, ckpt = rig
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    src.warehouse.create_or_replace("logs", df)
    rep = TableReplica(src, "logs", dst)
    _drain(rep, ckpt)
    src.warehouse.append(
        "logs", spark.createDataFrame([(3, "c")], "id long, v string")
    )
    _drain(rep, ckpt)
    assert sorted(
        map(tuple, dst.warehouse.read("logs").select("id", "v").collect())
    ) == [(1, "a"), (2, "b"), (3, "c")]


def test_mor_source_replicates(spark, rig):
    """MoR deltas arrive as upsert/delete change types and must apply."""
    src, dst, ckpt = rig
    src.warehouse.create_or_replace(
        "t", _df(spark, [(1, "a", 1.0)]), pk=["pk"], merge_on_read=True
    )
    rep = TableReplica(src, "t", dst)
    _drain(rep, ckpt)
    src.warehouse.merge("t", _df(spark, [(1, "A", 1.0), (2, "b", 2.0)]), ["pk"])
    src.warehouse.delete_keys("t", [2])
    _drain(rep, ckpt)
    assert _rows(dst, "t") == _rows(src, "t") == [(1, "A", 1.0)]


def test_delete_keys_dataframe_form(spark, rig):
    src, _dst, _ckpt = rig
    src.warehouse.create_or_replace(
        "t", _df(spark, [(i, f"v{i}", float(i)) for i in range(10)]), pk=["pk"]
    )
    keys = spark.createDataFrame([(2,), (4,), (99,)], "pk long")
    src.warehouse.delete_keys("t", keys)
    assert sorted(r["pk"] for r in src.warehouse.read("t").collect()) == [
        0, 1, 3, 5, 6, 7, 8, 9
    ]


def test_crash_before_first_offset_commit_does_not_skip(spark, rig):
    """If the process dies after the snapshot landed but before the
    stream's first offset commit, a restart must resume from the PINNED
    bootstrap commit (sidecar), not from 'latest'."""
    src, dst, ckpt = rig
    src.warehouse.create_or_replace(
        "t", _df(spark, [(1, "a", 1.0)]), pk=["pk"]
    )
    rep = TableReplica(src, "t", dst)
    rep._bootstrap(ckpt)  # snapshot copied; stream never started (crash)
    src.warehouse.append("t", _df(spark, [(2, "b", 2.0)]))
    _drain(rep, ckpt)  # restart
    assert _rows(dst, "t") == _rows(src, "t")


def test_existing_dst_with_foreign_checkpoint_refuses(spark, rig):
    """A destination table without this checkpoint's bootstrap record is
    ambiguous — replication must refuse loudly, never silently skip."""
    import tempfile as _tf

    src, dst, ckpt = rig
    src.warehouse.create_or_replace(
        "t", _df(spark, [(1, "a", 1.0)]), pk=["pk"]
    )
    rep = TableReplica(src, "t", dst)
    _drain(rep, ckpt)
    with pytest.raises(ValueError, match="bootstrap record"):
        TableReplica(src, "t", dst).start(_tf.mkdtemp())
