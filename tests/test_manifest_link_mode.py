"""Object-store-safe commit path: ``link_mode="manifest"``.

POSIX hard links don't exist on S3/GCS, so partial rewrites (partition/
bucket merges, replace_partition, restore) must not link untouched files
into the new version dir. In manifest mode the new commit's file list
REFERENCES them in their old version dirs (``../v_old/...`` entries —
Iceberg's manifest model; reference ``bulkerlib/implementations/sql/
abstract_transactional.go`` keeps its analogous atomicity via tmp-table
swap). These tests run the same lifecycle flows with zero hard links for
kept files and assert reads, time travel, GC, and vacuum semantics hold.
"""

import os

import pytest

from bulker_spark.api import Engine
from bulker_spark.sinks.warehouse import Warehouse


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(
        spark, str(tmp_path / "wh"), retain_versions=3, link_mode="manifest"
    )


def _df(spark, rows, schema="pk long, p string, v string"):
    return spark.createDataFrame(rows, schema)


def _physical_parquets(table_dir: str, version: str) -> list[str]:
    vdir = os.path.join(table_dir, version)
    out = []
    for root, _dirs, files in os.walk(vdir):
        out += [f for f in files if f.endswith(".parquet")]
    return out


def test_replace_partition_references_untouched_files(spark, wh):
    rows = [(1, "a", "x"), (2, "b", "y"), (3, "c", "z")]
    wh.create_or_replace(
        "t", _df(spark, rows), pk=["pk"], partition_by=["p"]
    )
    v0 = wh.get_meta("t").version
    wh.replace_partition("t", _df(spark, [(9, "b", "NEW")]), partition_column="p")
    meta = wh.get_meta("t")
    assert meta.version != v0
    # the new version dir physically holds ONLY the rewritten partition
    table_dir = wh._table_dir("t")
    assert _physical_parquets(table_dir, meta.version)  # p=b rewrite
    _snap_meta, _base, manifest = wh._snapshot("t")
    refs = [f for f in manifest if f.startswith("../")]
    plains = [f for f in manifest if not f.startswith("../")]
    assert refs, "untouched partitions must be references"
    assert all(f"../{v0}/" in r or r.startswith(f"../{v0}") for r in refs)
    assert all("p=b" in f for f in plains)
    got = {
        (r["pk"], r["p"], r["v"]) for r in wh.read("t").collect()
    }
    assert got == {(1, "a", "x"), (3, "c", "z"), (9, "b", "NEW")}


def test_partitioned_merge_and_time_travel(spark, wh):
    rows = [(1, "a", "x"), (2, "b", "y")]
    wh.create_or_replace(
        "t", _df(spark, rows), pk=["pk"], partition_by=["p"]
    )
    first = wh._last_commit_id("t")
    wh.merge("t", _df(spark, [(2, "b", "y2"), (4, "d", "w")]), ["pk"])
    got = {(r["pk"], r["v"]) for r in wh.read("t").collect()}
    assert got == {(1, "x"), (2, "y2"), (4, "w")}
    # the pre-merge snapshot stays readable through its reference-free log
    old = {(r["pk"], r["v"]) for r in wh.read("t", version=first and wh._read_log("t")[0]["meta"]["version"]).collect()}
    assert old == {(1, "x"), (2, "y")}


def test_gc_keeps_referenced_version_dirs(spark, tmp_path):
    wh = Warehouse(
        spark, str(tmp_path / "whgc"), retain_versions=1,
        link_mode="manifest",
    )
    rows = [(1, "a", "x"), (2, "b", "y")]
    wh.create_or_replace(
        "t", _df(spark, rows), pk=["pk"], partition_by=["p"]
    )
    v0 = wh.get_meta("t").version
    # two successive partial rewrites; v0's p=a file is still referenced
    # by the live manifest, so v0 must survive retain_versions=1 GC
    wh.replace_partition(
        "t", _df(spark, [(2, "b", "y2")]), partition_column="p"
    )
    wh.replace_partition(
        "t", _df(spark, [(2, "b", "y3")]), partition_column="p"
    )
    assert os.path.isdir(os.path.join(wh._table_dir("t"), v0))
    got = {(r["pk"], r["v"]) for r in wh.read("t").collect()}
    assert got == {(1, "x"), (2, "y3")}
    # a full rewrite drops the reference; v0 is then reclaimed
    wh.create_or_replace("t", _df(spark, rows), pk=["pk"], partition_by=["p"])
    assert not os.path.isdir(os.path.join(wh._table_dir("t"), v0))


def test_vacuum_spares_referenced_dirs(spark, wh):
    rows = [(1, "a", "x"), (2, "b", "y")]
    wh.create_or_replace("t", _df(spark, rows), pk=["pk"], partition_by=["p"])
    v0 = wh.get_meta("t").version
    wh.replace_partition(
        "t", _df(spark, [(2, "b", "y2")]), partition_column="p"
    )
    removed = wh.vacuum("t", min_age_seconds=0)
    assert v0 not in removed
    assert os.path.isdir(os.path.join(wh._table_dir("t"), v0))


def test_bucketed_merge_references(spark, wh):
    df = _df(spark, [(i, "p", f"v{i}") for i in range(100)])
    wh.create_or_replace("t", df, pk=["pk"], bucket_by=(["pk"], 8))
    wh.merge("t", _df(spark, [(7, "p", "UP")]), ["pk"])
    _m, _b, manifest = wh._snapshot("t")
    assert any(f.startswith("../") for f in manifest)
    got = {r["v"] for r in wh.read("t").filter("pk = 7").collect()}
    assert got == {"UP"}
    assert wh.read("t").count() == 100


def test_restore_rebuilds_by_reference(spark, wh):
    rows = [(1, "a", "x"), (2, "b", "y")]
    wh.create_or_replace("t", _df(spark, rows), pk=["pk"], partition_by=["p"])
    c0 = wh._last_commit_id("t")
    wh.merge("t", _df(spark, [(2, "b", "gone")]), ["pk"])
    wh.restore("t", c0)
    got = {(r["pk"], r["v"]) for r in wh.read("t").collect()}
    assert got == {(1, "x"), (2, "y")}
    # restore's own version dir holds no physical copies
    meta = wh.get_meta("t")
    assert _physical_parquets(wh._table_dir("t"), meta.version) == []


def test_clone_copies_in_manifest_mode(spark, wh):
    rows = [(1, "a", "x"), (2, "b", "y")]
    wh.create_or_replace("t", _df(spark, rows), pk=["pk"], partition_by=["p"])
    wh.merge("t", _df(spark, [(2, "b", "y2")]), ["pk"])  # manifest has refs
    wh.clone("t", "t2")
    got = {(r["pk"], r["v"]) for r in wh.read("t2").collect()}
    assert got == {(1, "x"), (2, "y2")}
    # clone is self-contained: no refs in its manifest, survives source GC
    _m, _b, manifest = wh._snapshot("t2")
    assert manifest and not any(f.startswith("../") for f in manifest)


def test_table_stats_counts_referenced_files(spark, wh):
    rows = [(1, "a", "x"), (2, "b", "y")]
    wh.create_or_replace("t", _df(spark, rows), pk=["pk"], partition_by=["p"])
    before = wh.table_stats("t")
    wh.merge("t", _df(spark, [(2, "b", "y2")]), ["pk"])
    after = wh.table_stats("t")
    assert after["n_files"] >= before["n_files"]
    assert after["bytes"] > 0


def test_engine_end_to_end_manifest_mode(spark, tmp_path):
    eng = Engine(
        spark, str(tmp_path / "whmeng"), retain_versions=2,
        link_mode="manifest",
    )
    events = [
        '{"id": 1, "part": "a", "v": "x"}',
        '{"id": 2, "part": "b", "v": "y"}',
    ]
    eng.bulk_load(
        "ev", events, mode="batch", primary_key=["id"], deduplicate=True
    )
    eng.bulk_load(
        "ev", ['{"id": 2, "part": "b", "v": "y2"}'], mode="batch",
        primary_key=["id"], deduplicate=True,
    )
    rows = {(r["id"], r["v"]) for r in eng.warehouse.read("ev").collect()}
    assert rows == {(1, "x"), (2, "y2")}


def test_hardlink_mode_materializes_manifest_refs(spark, tmp_path):
    """Mode switch: a table written under manifest mode keeps working when
    reopened with the default hardlink mode — the next rewrite dereferences
    and re-materializes physical files."""
    root = str(tmp_path / "whswitch")
    m = Warehouse(spark, root, link_mode="manifest")
    rows = [(1, "a", "x"), (2, "b", "y")]
    m.create_or_replace("t", _df(spark, rows), pk=["pk"], partition_by=["p"])
    m.merge("t", _df(spark, [(2, "b", "y2")]), ["pk"])
    h = Warehouse(spark, root, link_mode="hardlink")
    h.merge("t", _df(spark, [(1, "a", "x2")]), ["pk"])
    _m, _b, manifest = h._snapshot("t")
    assert not any(f.startswith("../") for f in manifest)
    got = {(r["pk"], r["v"]) for r in h.read("t").collect()}
    assert got == {(1, "x2"), (2, "y2")}
