"""Streaming change data feed (`bulker_changes` Python Data Source +
Engine.stream_changes) — Delta CDF's streaming ``readChangeFeed`` surface.

The batch feed's classification semantics are pinned in
test_change_feed.py; here we pin the STREAMING contract: offsets are
table commits checkpointed by the query (exactly-once resume),
maxCommitsPerTrigger rate-limits micro-batches, planning stays
metadata-only for appends, and feed-resetting commits fail the stream
with a restart instruction.
"""

import os
import tempfile

import pytest

from bulker_spark.api import Engine
from bulker_spark.sinks.warehouse import (
    CHANGE_COMMIT_COLUMN,
    CHANGE_TYPE_COLUMN,
    Warehouse,
)
from bulker_spark.sources.changes_source import register_changes_source


@pytest.fixture()
def wh_root():
    d = tempfile.mkdtemp(prefix="whstream_")
    yield d
    import shutil

    shutil.rmtree(d, ignore_errors=True)


def _wh(spark, root, **kw):
    kw.setdefault("retain_versions", 10)
    return Warehouse(spark, root, "default", **kw)


def _df(spark, rows):
    return spark.createDataFrame(rows, "pk long, val string, score double")


def _run_feed(spark, root, table, ckpt, out, **opts):
    register_changes_source(spark)
    reader = (
        spark.readStream.format("bulker_changes")
        .option("path", root)
        .option("table", table)
        .option("namespace", "default")
    )
    for k, v in opts.items():
        reader = reader.option(k, str(v))
    q = (
        reader.load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _collect(spark, out):
    df = spark.read.parquet(out)
    return sorted(
        (r["pk"], r[CHANGE_TYPE_COLUMN], r["val"], r[CHANGE_COMMIT_COLUMN])
        for r in df.collect()
    )


def test_stream_appends_are_inserts(spark, wh_root):
    wh = _wh(spark, wh_root)
    wh.create_or_replace("t", _df(spark, [(1, "a", 1.0)]), pk=["pk"])
    c0 = wh.history("t")[0]["commit"]
    wh.append("t", _df(spark, [(2, "b", 2.0), (3, "c", 3.0)]))
    ckpt, out = tempfile.mkdtemp(), tempfile.mkdtemp()
    _run_feed(spark, wh_root, "t", ckpt, out, startingCommit=c0)
    assert _collect(spark, out) == [
        (2, "insert", "b", c0 + 1),
        (3, "insert", "c", c0 + 1),
    ]


def test_stream_resumes_from_checkpoint_exactly_once(spark, wh_root):
    """Offset-after-commit: a restarted query emits ONLY commits landed
    since the last committed micro-batch — no replay, no gaps."""
    wh = _wh(spark, wh_root)
    wh.create_or_replace("t", _df(spark, [(1, "a", 1.0)]), pk=["pk"])
    c0 = wh.history("t")[0]["commit"]
    wh.append("t", _df(spark, [(2, "b", 2.0)]))
    ckpt, out = tempfile.mkdtemp(), tempfile.mkdtemp()
    _run_feed(spark, wh_root, "t", ckpt, out, startingCommit=c0)
    assert _collect(spark, out) == [(2, "insert", "b", c0 + 1)]

    wh.append("t", _df(spark, [(3, "c", 3.0)]))
    wh.merge("t", _df(spark, [(3, "C", 3.0)]), ["pk"])
    _run_feed(spark, wh_root, "t", ckpt, out, startingCommit=c0)
    assert _collect(spark, out) == [
        (2, "insert", "b", c0 + 1),
        (3, "insert", "c", c0 + 2),
        (3, "update_postimage", "C", c0 + 3),
        (3, "update_preimage", "c", c0 + 3),
    ]


def test_stream_starting_latest_skips_backlog(spark, wh_root):
    wh = _wh(spark, wh_root)
    wh.create_or_replace("t", _df(spark, [(1, "a", 1.0)]), pk=["pk"])
    wh.append("t", _df(spark, [(2, "old", 2.0)]))
    ckpt, out = tempfile.mkdtemp(), tempfile.mkdtemp()
    # first run records latest as the base; no data yet
    _run_feed(spark, wh_root, "t", ckpt, out)  # startingCommit default latest
    assert not [
        f for f in os.listdir(out) if f.endswith(".parquet")
    ] or _collect(spark, out) == []
    head = wh.history("t")[0]["commit"]
    wh.append("t", _df(spark, [(3, "new", 3.0)]))
    _run_feed(spark, wh_root, "t", ckpt, out)
    assert _collect(spark, out) == [(3, "insert", "new", head + 1)]


def test_stream_rate_limit_splits_microbatches(spark, wh_root):
    """maxCommitsPerTrigger bounds a micro-batch; availableNow drains the
    backlog across several batches without loss or duplication."""
    wh = _wh(spark, wh_root)
    wh.create_or_replace("t", _df(spark, [(0, "v0", 0.0)]), pk=["pk"])
    c0 = wh.history("t")[0]["commit"]
    for i in range(1, 6):
        wh.append("t", _df(spark, [(i, f"v{i}", float(i))]))
    ckpt, out = tempfile.mkdtemp(), tempfile.mkdtemp()
    _run_feed(
        spark, wh_root, "t", ckpt, out,
        startingCommit=c0, maxCommitsPerTrigger=2,
    )
    got = _collect(spark, out)
    assert got == [
        (i, "insert", f"v{i}", c0 + i) for i in range(1, 6)
    ]
    offsets = os.listdir(os.path.join(ckpt, "offsets"))
    assert len(offsets) > 1  # backlog actually split


def test_stream_mor_and_replace_partition_classification(spark, wh_root):
    wh = _wh(spark, wh_root)
    wh.create_or_replace(
        "t", _df(spark, [(1, "a", 1.0)]), pk=["pk"], merge_on_read=True
    )
    c0 = wh.history("t")[0]["commit"]
    wh.merge("t", _df(spark, [(1, "A", 1.0), (2, "b", 2.0)]), ["pk"])
    wh.delete_keys("t", [2])
    ckpt, out = tempfile.mkdtemp(), tempfile.mkdtemp()
    _run_feed(spark, wh_root, "t", ckpt, out, startingCommit=c0)
    got = _collect(spark, out)
    assert (1, "upsert", "A", c0 + 1) in got
    assert (2, "upsert", "b", c0 + 1) in got
    assert any(t == "delete" and pk == 2 for pk, t, _v, _c in got)


def test_stream_cow_diff_skips_copied_rows(spark, wh_root):
    wh = _wh(spark, wh_root)
    wh.create_or_replace(
        "t", _df(spark, [(1, "a", 1.0), (2, "b", 2.0)]), pk=["pk"]
    )
    c0 = wh.history("t")[0]["commit"]
    wh.merge("t", _df(spark, [(2, "B", 2.0), (9, "z", 9.0)]), ["pk"])
    ckpt, out = tempfile.mkdtemp(), tempfile.mkdtemp()
    _run_feed(spark, wh_root, "t", ckpt, out, startingCommit=c0)
    assert _collect(spark, out) == [
        (2, "update_postimage", "B", c0 + 1),
        (2, "update_preimage", "b", c0 + 1),
        (9, "insert", "z", c0 + 1),
    ]


def test_stream_compact_is_silent(spark, wh_root):
    wh = _wh(spark, wh_root)
    wh.create_or_replace("t", _df(spark, [(1, "a", 1.0)]), pk=["pk"])
    c0 = wh.history("t")[0]["commit"]
    wh.append("t", _df(spark, [(2, "b", 2.0)]))
    wh.compact("t")
    ckpt, out = tempfile.mkdtemp(), tempfile.mkdtemp()
    _run_feed(spark, wh_root, "t", ckpt, out, startingCommit=c0)
    assert _collect(spark, out) == [(2, "insert", "b", c0 + 1)]


def test_stream_reset_commit_fails_with_restart_instruction(spark, wh_root):
    wh = _wh(spark, wh_root)
    wh.create_or_replace("t", _df(spark, [(1, "a", 1.0)]), pk=["pk"])
    c0 = wh.history("t")[0]["commit"]
    wh.create_or_replace("t", _df(spark, [(9, "z", 9.0)]), pk=["pk"])
    ckpt, out = tempfile.mkdtemp(), tempfile.mkdtemp()
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(Exception) as exc:
        _run_feed(spark, wh_root, "t", ckpt, out, startingCommit=c0)
    assert "reset" in str(exc.value)


def test_stream_bucketed_merge_plans_per_bucket_diffs(spark, wh_root):
    """Scale property: a bucketed CoW merge's feed diffs per touched
    bucket directory (parallel DiffParts), never one giant partition —
    and it covers only the rewritten slice."""
    from bulker_spark.sources.changes_source import (
        DiffPart,
        _log_entry,
        _plan_commit,
    )

    wh = _wh(spark, wh_root)
    rows = [(i, f"v{i}", float(i)) for i in range(100)]
    wh.create_or_replace(
        "t", _df(spark, rows), pk=["pk"], bucket_by=(["pk"], 8)
    )
    c0 = wh.history("t")[0]["commit"]
    wh.merge(
        "t", _df(spark, [(7, "X", 7.0), (11, "Y", 11.0), (23, "Z", 23.0)]),
        ["pk"],
    )
    tdir = os.path.join(wh_root, "default", "t")
    prev = _log_entry(tdir, c0)
    cur = _log_entry(tdir, c0 + 1)
    parts = _plan_commit(prev, cur, tdir, "t", files_per_part=4)
    assert all(isinstance(p, DiffPart) for p in parts)
    assert len(parts) >= 2  # touched buckets diff independently
    touched = {f for p in parts for _path, rel in (*p.old, *p.new) for f in [rel]}
    assert len(touched) < len(prev["files"])  # strict slice of the table

    # and the streamed result matches the batch feed's classification
    ckpt, out = tempfile.mkdtemp(), tempfile.mkdtemp()
    _run_feed(spark, wh_root, "t", ckpt, out, startingCommit=c0)
    got = _collect(spark, out)
    assert (7, "update_preimage", "v7", c0 + 1) in got
    assert (7, "update_postimage", "X", c0 + 1) in got
    assert len(got) == 6  # 3 pks × pre+post, nothing else


def test_stream_schema_evolution_null_fills_old_files(spark, wh_root):
    wh = _wh(spark, wh_root)
    wh.create_or_replace("t", _df(spark, [(1, "a", 1.0)]), pk=["pk"])
    c0 = wh.history("t")[0]["commit"]
    wh.append("t", _df(spark, [(2, "b", 2.0)]))
    wider = spark.createDataFrame(
        [(3, "c", 3.0, "new")],
        "pk long, val string, score double, extra string",
    )
    wh.merge("t", wider, ["pk"])
    ckpt, out = tempfile.mkdtemp(), tempfile.mkdtemp()
    _run_feed(spark, wh_root, "t", ckpt, out, startingCommit=c0)
    df = spark.read.parquet(out)
    assert "extra" in df.columns
    rows = {r["pk"]: r for r in df.collect()}
    assert rows[2]["extra"] is None  # pre-evolution commit null-filled
    assert rows[3]["extra"] == "new"


def test_engine_stream_changes_surface(spark, wh_root):
    eng = Engine(spark, wh_root, retain_versions=10)
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
    ckpt, out = tempfile.mkdtemp(), tempfile.mkdtemp()
    q = (
        eng.stream_changes("t", starting_commit=c0)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r["pk"], r[CHANGE_TYPE_COLUMN])
        for r in spark.read.parquet(out).collect()
    )
    assert (1, "update_preimage") in got
    assert (1, "update_postimage") in got
    assert (2, "insert") in got


def test_pk_diff_arrow_semantics_match_python_fallback():
    """The vectorized diff and the Python fallback must classify
    identically — including eqNullSafe corners: null==null, NaN==NaN,
    -0.0==0.0 are all 'unchanged'."""
    import pyarrow as pa

    from bulker_spark.sources.changes_source import _pk_diff_arrow

    old = pa.table(
        {
            "pk": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "v": pa.array(["a", "b", None, "d", "e", "f"], pa.string()),
            "x": pa.array(
                [1.0, float("nan"), 3.0, -0.0, 5.0, 6.0], pa.float64()
            ),
        }
    )
    new = pa.table(
        {
            # pk 1 unchanged; 2 NaN==NaN unchanged; 3 null==null unchanged;
            # 4 -0.0 vs 0.0 unchanged; 5 CHANGED (null vs value);
            # 6 deleted; 7 inserted
            "pk": pa.array([1, 2, 3, 4, 5, 7], pa.int64()),
            "v": pa.array(["a", "b", None, "d", None, "g"], pa.string()),
            "x": pa.array(
                [1.0, float("nan"), 3.0, 0.0, 5.0, 7.0], pa.float64()
            ),
        }
    )
    ins, dels, upd_o, upd_n = _pk_diff_arrow(old, new, ["pk"], ["v", "x"])
    assert new.column("pk").take(ins).to_pylist() == [7]
    assert old.column("pk").take(dels).to_pylist() == [6]
    assert old.column("pk").take(upd_o).to_pylist() == [5]
    assert new.column("pk").take(upd_n).to_pylist() == [5]


def test_clustered_merge_slices_diff_by_pk_range(spark, wh_root):
    """cluster_cols persists across merges (the rewrite re-applies
    repartitionByRange), so the feed's un-groupable whole-table diff
    splits into DISJOINT pk-range DiffParts from the committed file
    stats — parallel tasks instead of one — and the streamed
    classification still matches the batch feed exactly."""
    from bulker_spark.sources.changes_source import (
        DiffPart,
        _log_entry,
        _plan_commit,
    )

    wh = _wh(spark, wh_root)
    df = (
        spark.range(20_000)
        .selectExpr("id as pk", "cast(id as string) as val",
                    "cast(id as double) as score")
        .repartitionByRange(8, "pk")
        .sortWithinPartitions("pk")
    )
    wh.create_or_replace("t", df, pk=["pk"], cluster_by=["pk"])
    c0 = wh.history("t")[0]["commit"]
    upd = spark.createDataFrame(
        [(7, "X", 7.0), (15_000, "Y", 1.0), (25_000, "new", 2.0)],
        "pk long, val string, score double",
    )
    wh.merge("t", upd, ["pk"])
    tdir = os.path.join(wh_root, "default", "t")
    parts = _plan_commit(
        _log_entry(tdir, c0), _log_entry(tdir, c0 + 1), tdir, "t", 4
    )
    assert all(isinstance(p, DiffPart) for p in parts)
    assert len(parts) > 1, "clustered rewrite must slice"
    ranges = [p.pk_range for p in parts]
    assert all(r is not None for r in ranges)
    # ranges are disjoint and ordered
    his = [r[2] for r in ranges[:-1]]
    los = [r[1] for r in ranges[1:]]
    assert his == los

    ckpt, out = tempfile.mkdtemp(), tempfile.mkdtemp()
    _run_feed(spark, wh_root, "t", ckpt, out, startingCommit=c0)
    got = _collect(spark, out)
    assert (7, "update_preimage", "7", c0 + 1) in got
    assert (7, "update_postimage", "X", c0 + 1) in got
    assert (15_000, "update_postimage", "Y", c0 + 1) in got
    assert (25_000, "insert", "new", c0 + 1) in got
    assert len(got) == 5  # 2 updates x pre+post, 1 insert — nothing else


def test_interleaved_rewrite_falls_back_to_single_part(spark, wh_root):
    """Hash-ordered files overlap every pk range: slicing would re-read
    them — the planner must fall back to one DiffPart, never amplify."""
    from bulker_spark.sources.changes_source import (
        DiffPart,
        _log_entry,
        _plan_commit,
    )

    wh = _wh(spark, wh_root)
    df = (
        spark.range(20_000)
        .selectExpr("id as pk", "cast(id as string) as val")
        .repartition(8)  # hash layout: every file spans the pk domain
    )
    wh.create_or_replace("t", df, pk=["pk"])
    c0 = wh.history("t")[0]["commit"]
    wh.merge(
        "t", spark.createDataFrame([(7, "X")], "pk long, val string"), ["pk"]
    )
    tdir = os.path.join(wh_root, "default", "t")
    parts = _plan_commit(
        _log_entry(tdir, c0), _log_entry(tdir, c0 + 1), tdir, "t", 4
    )
    assert len(parts) == 1 and isinstance(parts[0], DiffPart)
    assert parts[0].pk_range is None


def test_cluster_cols_persist_across_merges(spark, wh_root):
    """After a merge, the rewritten files must still be range-clustered
    (per-file pk ranges mostly disjoint) — the persisted cluster_cols
    re-applied, not lost on the first rewrite."""
    wh = _wh(spark, wh_root)
    df = (
        spark.range(20_000)
        .selectExpr("id as pk", "cast(id as string) as val")
        .repartitionByRange(8, "pk")
    )
    wh.create_or_replace("t", df, pk=["pk"], cluster_by=["pk"])
    wh.merge(
        "t", spark.createDataFrame([(7, "X")], "pk long, val string"), ["pk"]
    )
    assert wh.get_meta("t").cluster_cols == ["pk"]
    entry = wh._read_log("t")[-1]
    spans = [
        tuple(s["cols"]["pk"])
        for s in entry["file_stats"].values()
        if "pk" in s.get("cols", {})
    ]
    assert len(spans) > 1
    spans.sort()
    overlaps = sum(
        1 for (a, b), (c, d) in zip(spans, spans[1:]) if c <= b
    )
    assert overlaps <= 1  # range-partitioned: at most boundary touching


def test_string_pk_clustered_merge_also_slices(spark, wh_root):
    """STRING keys slice too (the gate admits INT64 and STRING — a
    regression here silently serializes every string-keyed diff)."""
    from bulker_spark.sources.changes_source import (
        DiffPart,
        _log_entry,
        _plan_commit,
    )

    wh = _wh(spark, wh_root)
    df = (
        spark.range(20_000)
        .selectExpr("format_string('k%08d', id) as pk", "id as v",
                    "cast(id as double) as score")
        .repartitionByRange(8, "pk")
        .sortWithinPartitions("pk")
    )
    wh.create_or_replace("t", df, pk=["pk"], cluster_by=["pk"])
    c0 = wh.history("t")[0]["commit"]
    wh._SCOPE_MIN_SKIPPED_ROWS = 0
    wh.merge(
        "t",
        spark.createDataFrame(
            [("k00000007", 999, 0.0), ("k00015000", 1, 1.0)],
            "pk string, v long, score double",
        ),
        ["pk"],
    )
    tdir = os.path.join(wh_root, "default", "t")
    parts = _plan_commit(
        _log_entry(tdir, c0), _log_entry(tdir, c0 + 1), tdir, "t", 1,
        head_types={"pk": 4, "v": 2, "score": 3},
    )
    diff_parts = [p for p in parts if isinstance(p, DiffPart)]
    assert diff_parts and all(p.pk_range is not None for p in diff_parts)
    ckpt, out = tempfile.mkdtemp(), tempfile.mkdtemp()
    _run_feed(spark, wh_root, "t", ckpt, out, startingCommit=c0)
    df2 = spark.read.parquet(out)
    got = sorted(
        (r["pk"], r[CHANGE_TYPE_COLUMN]) for r in df2.collect()
    )
    assert got == [
        ("k00000007", "update_postimage"), ("k00000007", "update_preimage"),
        ("k00015000", "update_postimage"), ("k00015000", "update_preimage"),
    ]
