"""Change data feed (Warehouse.read_changes) — Delta-CDF surface computed
Iceberg-changelog style from retained snapshots.

The load-bearing invariant (test_feed_replay_reproduces_snapshot):
applying the feed to the since_commit snapshot reproduces the head
snapshot. Everything else pins per-op classification and the
scale-relevant structural properties (append feed is join-free, merge
feed spans only the rewritten slice).
"""

import os

import pytest
from pyspark.sql import functions as F

from bulker_spark.sinks.warehouse import (
    CHANGE_COMMIT_COLUMN,
    CHANGE_TYPE_COLUMN,
    Warehouse,
)


def _wh(spark, tmp_warehouse, **kw):
    kw.setdefault("retain_versions", 10)
    return Warehouse(spark, tmp_warehouse, "default", **kw)


def _df(spark, rows):
    return spark.createDataFrame(rows, "pk long, val string, score double")


def _head(wh, name):
    return wh.history(name)[0]["commit"]  # history is newest-first


def _changes(wh, name, since, **kw):
    df = wh.read_changes(name, since, **kw)
    return sorted(
        (r["pk"], r[CHANGE_TYPE_COLUMN], r["val"], r[CHANGE_COMMIT_COLUMN])
        for r in df.collect()
    )


def test_append_feed_is_inserts(spark, tmp_warehouse):
    wh = _wh(spark, tmp_warehouse)
    wh.create_or_replace("t", _df(spark, [(1, "a", 1.0)]), pk=["pk"])
    c0 = _head(wh, "t")
    wh.append("t", _df(spark, [(2, "b", 2.0), (3, "c", 3.0)]))
    assert _changes(wh, "t", c0) == [
        (2, "insert", "b", c0 + 1),
        (3, "insert", "c", c0 + 1),
    ]


def test_append_feed_has_no_join(spark, tmp_warehouse):
    """Insert changes come from the commit manifest alone — the plan must
    be a pure scan (no Join node): at scale the feed for append-mostly
    tables costs one read of the new files, nothing else."""
    wh = _wh(spark, tmp_warehouse)
    wh.create_or_replace("t", _df(spark, [(1, "a", 1.0)]), pk=["pk"])
    c0 = _head(wh, "t")
    wh.append("t", _df(spark, [(2, "b", 2.0)]))
    plan = wh.read_changes("t", c0)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_merge_feed_classifies_update_insert_and_skips_copies(
    spark, tmp_warehouse
):
    wh = _wh(spark, tmp_warehouse)
    wh.create_or_replace(
        "t", _df(spark, [(1, "a", 1.0), (2, "b", 2.0)]), pk=["pk"]
    )
    c0 = _head(wh, "t")
    wh.merge("t", _df(spark, [(2, "B", 2.0), (9, "z", 9.0)]), ["pk"])
    got = _changes(wh, "t", c0)
    # row 1 was copied verbatim by the rewrite — must NOT appear
    assert got == [
        (2, "update_postimage", "B", c0 + 1),
        (2, "update_preimage", "b", c0 + 1),
        (9, "insert", "z", c0 + 1),
    ]


def test_merge_feed_identical_source_row_is_silent(spark, tmp_warehouse):
    wh = _wh(spark, tmp_warehouse)
    wh.create_or_replace("t", _df(spark, [(1, "a", 1.0)]), pk=["pk"])
    c0 = _head(wh, "t")
    wh.merge("t", _df(spark, [(1, "a", 1.0)]), ["pk"])
    assert _changes(wh, "t", c0) == []


def test_delete_keys_cow_feed(spark, tmp_warehouse):
    wh = _wh(spark, tmp_warehouse)
    wh.create_or_replace(
        "t", _df(spark, [(1, "a", 1.0), (2, "b", 2.0)]), pk=["pk"]
    )
    c0 = _head(wh, "t")
    wh.delete_keys("t", [1])
    assert _changes(wh, "t", c0) == [(1, "delete", "a", c0 + 1)]


def test_replace_partition_feed_is_delete_plus_insert(spark, tmp_warehouse):
    wh = _wh(spark, tmp_warehouse)
    df = spark.createDataFrame(
        [(1, "p1", "a"), (2, "p2", "b")], "pk long, part string, val string"
    )
    wh.create_or_replace("t", df, partition_by=["part"])
    c0 = _head(wh, "t")
    wh.replace_partition(
        "t",
        spark.createDataFrame([(9, "p1", "A")], "pk long, part string, val string"),
        partition_column="part",
    )
    got = _changes(wh, "t", c0)
    assert got == [(1, "delete", "a", c0 + 1), (9, "insert", "A", c0 + 1)]


def test_mor_feed_upsert_and_tombstone(spark, tmp_warehouse):
    wh = _wh(spark, tmp_warehouse)
    wh.create_or_replace(
        "t", _df(spark, [(1, "a", 1.0)]), pk=["pk"], merge_on_read=True
    )
    c0 = _head(wh, "t")
    wh.merge("t", _df(spark, [(1, "A", 1.0), (2, "b", 2.0)]), ["pk"])
    wh.delete_keys("t", [2])
    got = _changes(wh, "t", c0)
    assert (1, "upsert", "A", c0 + 1) in got
    assert (2, "upsert", "b", c0 + 1) in got
    assert any(t == "delete" and pk == 2 for pk, t, _v, _c in got)


def test_compact_is_silent_and_feed_crosses_it(spark, tmp_warehouse):
    wh = _wh(spark, tmp_warehouse)
    wh.create_or_replace("t", _df(spark, [(1, "a", 1.0)]), pk=["pk"])
    c0 = _head(wh, "t")
    wh.append("t", _df(spark, [(2, "b", 2.0)]))
    wh.compact("t")
    wh.append("t", _df(spark, [(3, "c", 3.0)]))
    got = _changes(wh, "t", c0)
    assert got == [
        (2, "insert", "b", c0 + 1),
        (3, "insert", "c", c0 + 3),
    ]


def test_replace_table_resets_feed(spark, tmp_warehouse):
    wh = _wh(spark, tmp_warehouse)
    wh.create_or_replace("t", _df(spark, [(1, "a", 1.0)]), pk=["pk"])
    c0 = _head(wh, "t")
    wh.create_or_replace("t", _df(spark, [(9, "z", 9.0)]), pk=["pk"])
    with pytest.raises(ValueError, match="reset"):
        wh.read_changes("t", c0).collect()


def test_unknown_commit_raises(spark, tmp_warehouse):
    wh = _wh(spark, tmp_warehouse)
    wh.create_or_replace("t", _df(spark, [(1, "a", 1.0)]), pk=["pk"])
    with pytest.raises(FileNotFoundError):
        wh.read_changes("t", 99)


def test_gc_bounds_feed_horizon(spark, tmp_warehouse):
    wh = _wh(spark, tmp_warehouse, retain_versions=1)
    wh.create_or_replace("t", _df(spark, [(1, "a", 1.0)]), pk=["pk"])
    c0 = _head(wh, "t")
    wh.merge("t", _df(spark, [(1, "A", 1.0)]), ["pk"])
    wh.merge("t", _df(spark, [(1, "AA", 1.0)]), ["pk"])
    with pytest.raises(FileNotFoundError, match="retention"):
        wh.read_changes("t", c0).collect()


def test_to_commit_bounds_feed(spark, tmp_warehouse):
    wh = _wh(spark, tmp_warehouse)
    wh.create_or_replace("t", _df(spark, [(1, "a", 1.0)]), pk=["pk"])
    c0 = _head(wh, "t")
    wh.append("t", _df(spark, [(2, "b", 2.0)]))
    wh.append("t", _df(spark, [(3, "c", 3.0)]))
    assert _changes(wh, "t", c0, to_commit=c0 + 1) == [
        (2, "insert", "b", c0 + 1)
    ]


def test_empty_range_returns_typed_empty(spark, tmp_warehouse):
    wh = _wh(spark, tmp_warehouse)
    wh.create_or_replace("t", _df(spark, [(1, "a", 1.0)]), pk=["pk"])
    c0 = _head(wh, "t")
    df = wh.read_changes("t", c0)
    assert df.count() == 0
    assert CHANGE_TYPE_COLUMN in df.columns
    assert CHANGE_COMMIT_COLUMN in df.columns
    assert "pk" in df.columns


def test_bucketed_merge_feed_spans_only_touched_buckets(spark, tmp_warehouse):
    """The CoW diff join reads only the rewritten slice: for a bucketed
    table that is the touched buckets, not the table. Pinned physically:
    the feed's input files exclude untouched buckets' files."""
    wh = _wh(spark, tmp_warehouse)
    rows = [(i, f"v{i}", float(i)) for i in range(100)]
    wh.create_or_replace(
        "t", _df(spark, rows), pk=["pk"], bucket_by=(["pk"], 8)
    )
    c0 = _head(wh, "t")
    wh.merge("t", _df(spark, [(7, "CHANGED", 7.0)]), ["pk"])
    feed = wh.read_changes("t", c0)

    def rel(p):  # version-local relpath: partition dir + part name
        return "/".join(p.split("/")[-2:])

    files = {rel(p) for p in feed.inputFiles()}
    log = wh._read_log("t")
    prev = next(e for e in log if e["commit"] == c0)
    cur = next(e for e in log if e["commit"] == c0 + 1)
    prev_ids = {Warehouse._deref(f) for f in prev["files"]}
    cur_ids = {Warehouse._deref(f) for f in cur["files"]}
    diff_ids = (prev_ids - cur_ids) | (cur_ids - prev_ids)
    assert files <= diff_ids  # feed scans ONLY the diffed files
    assert len(diff_ids) < len(prev_ids)  # and the diff is a strict slice
    got = _changes(wh, "t", c0)
    assert got == [
        (7, "update_postimage", "CHANGED", c0 + 1),
        (7, "update_preimage", "v7", c0 + 1),
    ]


def test_schema_evolution_in_feed(spark, tmp_warehouse):
    wh = _wh(spark, tmp_warehouse)
    wh.create_or_replace("t", _df(spark, [(1, "a", 1.0)]), pk=["pk"])
    c0 = _head(wh, "t")
    wider = spark.createDataFrame(
        [(2, "b", 2.0, "new")], "pk long, val string, score double, extra string"
    )
    wh.merge("t", wider, ["pk"])
    rows = {r["pk"]: r for r in wh.read_changes("t", c0).collect()}
    assert rows[2]["extra"] == "new"
    assert rows[2][CHANGE_TYPE_COLUMN] == "insert"


def test_comparable_projection_handles_map_and_variant(spark):
    """Maps and variants don't support eqNullSafe — the comparable
    projection renders them as JSON so the change-detection predicate
    stays valid (variant columns exist in warehouse tables via the
    json_as_variant storage mode)."""
    df = spark.createDataFrame([(1, {"a": 1})], "pk long, m map<string,int>")
    c = Warehouse._comparable(F.col("m"), df.schema["m"].dataType)
    assert df.select(c.eqNullSafe(c).alias("eq")).collect()[0]["eq"] is True
    v = df.select(F.parse_json(F.lit('{"a":1}')).alias("v"))
    c2 = Warehouse._comparable(F.col("v"), v.schema["v"].dataType)
    assert v.select(c2.eqNullSafe(c2).alias("eq")).collect()[0]["eq"] is True
    # atomic types pass through untouched (stay JVM-comparable, no JSON
    # rendering cost in the common case)
    c3 = Warehouse._comparable(F.col("pk"), df.schema["pk"].dataType)
    assert df.select(c3.eqNullSafe(c3).alias("eq")).collect()[0]["eq"] is True


def test_feed_replay_reproduces_snapshot(spark, tmp_warehouse):
    """THE invariant: old snapshot + feed == new snapshot, across a mixed
    history of merges, appends and deletes."""
    wh = _wh(spark, tmp_warehouse)
    wh.create_or_replace(
        "t", _df(spark, [(i, f"v{i}", float(i)) for i in range(20)]),
        pk=["pk"],
    )
    c0 = _head(wh, "t")
    wh.merge(
        "t", _df(spark, [(3, "X", 3.5), (21, "new", 21.0)]), ["pk"]
    )
    wh.append("t", _df(spark, [(40, "app", 40.0)]))
    wh.delete_keys("t", [5, 21])
    head = _head(wh, "t")

    base = wh.read("t", version=next(
        e["version"] for e in wh.history("t") if e["commit"] == c0
    ))
    feed = wh.read_changes("t", c0, to_commit=head)
    # replay: last change per pk wins (feed is commit-ordered); deletes drop
    w_last = feed.filter(
        F.col(CHANGE_TYPE_COLUMN) != "update_preimage"
    ).withColumn(
        "__rn",
        F.row_number().over(
            __import__("pyspark").sql.Window.partitionBy("pk").orderBy(
                F.col(CHANGE_COMMIT_COLUMN).desc()
            )
        ),
    ).filter("__rn = 1").drop("__rn")
    upserts = w_last.filter(
        F.col(CHANGE_TYPE_COLUMN) != "delete"
    ).select("pk", "val", "score")
    dels = w_last.filter(F.col(CHANGE_TYPE_COLUMN) == "delete").select("pk")
    touched = w_last.select("pk")
    replayed = (
        base.join(touched, "pk", "left_anti")
        .select("pk", "val", "score")
        .unionByName(upserts)
    )
    expect = sorted(map(tuple, wh.read("t").select("pk", "val", "score").collect()))
    got = sorted(map(tuple, replayed.collect()))
    assert got == expect


def test_engine_surface(spark, tmp_warehouse):
    from bulker_spark.api import Engine

    eng = Engine(spark, tmp_warehouse, retain_versions=10)
    eng.bulk_load(
        "t",
        spark.createDataFrame([(1, "a")], "pk long, val string"),
        mode="batch",
        primary_key=["pk"],
        deduplicate=True,
    )
    c0 = eng.warehouse.history("t")[0]["commit"]
    eng.bulk_load(
        "t",
        spark.createDataFrame([(1, "A"), (2, "b")], "pk long, val string"),
        mode="batch",
        primary_key=["pk"],
        deduplicate=True,
    )
    got = sorted(
        (r["pk"], r[CHANGE_TYPE_COLUMN])
        for r in eng.read_changes("t", c0).collect()
    )
    assert (1, "update_preimage") in got
    assert (1, "update_postimage") in got
    assert (2, "insert") in got
