"""Optimistic concurrency on the warehouse commit log.

The reference serializes writers with per-table locks inside one process
(``table_helper.go:285-303``); a Spark deployment can run many drivers
against one warehouse, so the commit protocol itself must serialize them.
These tests race two independent Warehouse handles (distinct meta caches,
same root — the two-drivers topology) and assert the Delta-style
semantics: blind appends commute, read-modify-write conflicts surface as
ConcurrentWriteError, and the loser's retry converges.
"""

import pytest

from bulker_spark import ConcurrentWriteError
from bulker_spark.sinks.warehouse import Warehouse


@pytest.fixture()
def roots(tmp_path):
    return str(tmp_path / "wh")


def _df(spark, rows):
    return spark.createDataFrame(rows, "pk long, v string")


def test_appends_from_two_handles_commute(spark, roots):
    a = Warehouse(spark, roots)
    b = Warehouse(spark, roots)
    a.create_or_replace("t", _df(spark, [(1, "a")]), pk=["pk"])
    b.append("t", _df(spark, [(2, "b")]))
    a.append("t", _df(spark, [(3, "c")]))  # a's cache is stale; still fine
    assert a.read("t").count() == 3
    log = a._read_log("t")
    assert [e["commit"] for e in log] == [1, 2, 3]


def test_concurrent_merge_raises_instead_of_losing_update(spark, roots):
    a = Warehouse(spark, roots)
    b = Warehouse(spark, roots)
    a.create_or_replace("t", _df(spark, [(1, "a"), (2, "b")]), pk=["pk"])

    # interleave: force b's snapshot read before a's commit by claiming
    # a's commit while b is "computing" — simulate with explicit tokens
    base = b._last_commit_id("t")
    a.merge("t", _df(spark, [(2, "a-wins"), (3, "a-new")]), pk=["pk"])

    meta = b.get_meta("t")
    merged = b.read("t")  # b now reads a's result, but its token is stale
    meta.version = b._write_version("t", merged, meta.partition_by, None)
    with pytest.raises(ConcurrentWriteError):
        b._commit_meta(meta, op="merge", expected_commit=base)

    # live state is exactly a's commit — the race lost cleanly
    rows = {r["pk"]: r["v"] for r in a.read("t").collect()}
    assert rows == {1: "a", 2: "a-wins", 3: "a-new"}


def test_loser_retry_converges(spark, roots):
    a = Warehouse(spark, roots)
    b = Warehouse(spark, roots)
    a.create_or_replace("t", _df(spark, [(1, "a")]), pk=["pk"])
    a.merge("t", _df(spark, [(1, "a2")]), pk=["pk"])

    # b lost a race (stale token) → refresh + re-apply succeeds
    b.refresh("t")
    b.merge("t", _df(spark, [(1, "b2"), (2, "b-new")]), pk=["pk"])
    rows = {r["pk"]: r["v"] for r in b.read("t").collect()}
    assert rows == {1: "b2", 2: "b-new"}
    ops = [e["op"] for e in b._read_log("t")]
    assert ops == ["replace_table", "merge", "merge"]


def test_history_and_time_travel_survive_protocol(spark, roots):
    wh = Warehouse(spark, roots, retain_versions=5)
    wh.create_or_replace("t", _df(spark, [(1, "a")]), pk=["pk"])
    wh.append("t", _df(spark, [(2, "b")]))
    wh.merge("t", _df(spark, [(1, "a2")]), pk=["pk"])
    hist = wh.history("t")
    assert [e["commit"] for e in hist] == [3, 2, 1]
    assert wh.read("t", version=1).count() == 1
    wh.restore("t", 1)
    assert {r["pk"] for r in wh.read("t").collect()} == {1}


def test_gc_spares_inflight_writer_version(spark, roots):
    """A v_* dir not yet in the commit log (a concurrent writer mid-flight)
    must survive other writers' GC; vacuum reclaims it only past the age
    guard."""
    import os

    wh = Warehouse(spark, roots)
    wh.create_or_replace("t", _df(spark, [(1, "a")]), pk=["pk"])
    tdir = wh._table_dir("t")
    orphan = os.path.join(tdir, "v_orphan_inflight")
    os.makedirs(orphan)
    # commits (and their GC) must not touch the unreferenced dir
    wh.merge("t", _df(spark, [(1, "a2")]), pk=["pk"])
    wh.merge("t", _df(spark, [(2, "b")]), pk=["pk"])
    assert os.path.isdir(orphan)
    # age-guarded vacuum: recent orphan survives the default guard
    assert wh.vacuum("t") == []
    assert os.path.isdir(orphan)
    # explicit no-writers-active vacuum reclaims it
    assert wh.vacuum("t", min_age_seconds=0) == ["v_orphan_inflight"]
    assert not os.path.isdir(orphan)
    assert wh.read("t").count() == 2


def test_threaded_merges_serialize_without_lost_update(spark, roots):
    """Two racing merge threads through the Engine retry loop: both commits
    land (serialized by the claim protocol) and neither update is lost."""
    import threading

    from bulker_spark import Engine

    # retain_versions >= 2: a concurrent writer computes against the
    # previous snapshot, which must survive the winner's commit-time GC
    # (the same reason Delta retains superseded versions for a window)
    eng = Engine(spark, roots, retain_versions=2)
    eng.bulk_load(
        "t", _df(spark, [(1, "base")]), mode="batch",
        primary_key=["pk"], deduplicate=True,
    )
    errors = []

    def do_merge(tag):
        try:
            e = Engine(spark, roots, retain_versions=2)  # own handle/cache
            e.bulk_load(
                "t", _df(spark, [(10 + tag, f"w{tag}")]), mode="batch",
                primary_key=["pk"], deduplicate=True,
            )
        except Exception as ex:  # pragma: no cover
            errors.append(ex)

    ts = [threading.Thread(target=do_merge, args=(i,)) for i in (1, 2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errors
    # cross-handle visibility: this handle cached the pre-race pointer
    eng.warehouse.refresh("t")
    rows = {r["pk"]: r["v"] for r in eng.warehouse.read("t").collect()}
    assert rows == {1: "base", 11: "w1", 12: "w2"}
    ops = [e["op"] for e in eng.warehouse._read_log("t")]
    assert len(ops) == 3  # every commit claimed a distinct id


def test_crashed_commit_claim_does_not_wedge_the_table(spark, roots):
    """A writer that claims a commit file and dies before the pointer swap
    must not block later writers: the next commit claims the following id
    and the live state never includes the orphaned claim."""
    import json
    import os

    from bulker_spark.sinks.warehouse import LOG_DIR

    wh = Warehouse(spark, roots)
    wh.create_or_replace("t", _df(spark, [(1, "a")]), pk=["pk"])
    # simulate the crash: claim commit 2 by hand, never touch the pointer
    log_dir = os.path.join(wh._table_dir("t"), LOG_DIR)
    entry = dict(wh._read_log("t")[-1])
    entry["commit"] = 2
    entry["op"] = "merge"
    with open(os.path.join(log_dir, f"{2:012d}.json"), "w") as fh:
        json.dump(entry, fh)
    # a later writer proceeds: claims commit 3, table stays consistent
    wh.append("t", _df(spark, [(2, "b")]))
    assert wh._last_commit_id("t") == 3
    assert wh.read("t").count() == 2
    ops = [e["op"] for e in wh._read_log("t")]
    assert ops == ["replace_table", "merge", "append"]


def test_stale_cache_merge_sees_other_writers_commit(spark, roots):
    """The OCC meta+token come from the log tail, never the driver cache:
    a long-lived handle merging after ANOTHER handle's commit must build
    on that commit (no silent lost update, no error)."""
    a = Warehouse(spark, roots, retain_versions=2)
    b = Warehouse(spark, roots, retain_versions=2)
    a.create_or_replace("t", _df(spark, [(1, "a")]), pk=["pk"])
    a.merge("t", _df(spark, [(2, "a2")]), pk=["pk"])  # a's cache warm
    b.merge("t", _df(spark, [(3, "b1")]), pk=["pk"])  # a's cache now stale
    a.merge("t", _df(spark, [(4, "a3")]), pk=["pk"])  # must include b's row
    rows = {r["pk"]: r["v"] for r in a.read("t").collect()}
    assert rows == {1: "a", 2: "a2", 3: "b1", 4: "a3"}


def test_retention_counts_distinct_versions_not_commits(spark, roots):
    """Appends reuse the version dir; retention must still keep the
    promised number of DISTINCT snapshots restorable."""
    wh = Warehouse(spark, roots, retain_versions=3)
    wh.create_or_replace("t", _df(spark, [(1, "a")]), pk=["pk"])  # v1, c1
    wh.merge("t", _df(spark, [(2, "b")]), pk=["pk"])  # v2, c2
    wh.append("t", _df(spark, [(3, "c")]))  # v2, c3
    wh.append("t", _df(spark, [(4, "d")]))  # v2, c4
    wh.merge("t", _df(spark, [(5, "e")]), pk=["pk"])  # v3, c5
    # three distinct versions ever existed; all three must be readable
    assert wh.read("t", version=1).count() == 1
    assert wh.read("t", version=4).count() == 4
    assert wh.read("t").count() == 5


def test_threaded_mor_merges_unique_sequences(spark, roots):
    """Two racing MoR merge threads: the OCC token serializes the commit-
    sequence claim, so both deltas land with DISTINCT __commit_seq stamps
    and neither upsert is lost."""
    import threading

    from bulker_spark import Engine
    from bulker_spark.sinks.warehouse import COMMIT_SEQ_COLUMN

    eng = Engine(spark, roots, retain_versions=2)
    eng.bulk_load(
        "t", _df(spark, [(1, "base")]), mode="batch",
        primary_key=["pk"], deduplicate=True, merge_on_read=True,
    )
    errors = []

    def do_merge(tag):
        try:
            e = Engine(spark, roots, retain_versions=2)
            e.bulk_load(
                "t", _df(spark, [(10 + tag, f"w{tag}")]), mode="batch",
                primary_key=["pk"], deduplicate=True,
            )
        except Exception as ex:  # pragma: no cover
            errors.append(ex)

    ts = [threading.Thread(target=do_merge, args=(i,)) for i in (1, 2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errors
    eng.warehouse.refresh("t")
    rows = {r["pk"]: r["v"] for r in eng.warehouse.read("t").collect()}
    assert rows == {1: "base", 11: "w1", 12: "w2"}
    raw = eng.warehouse.read("t", _raw=True)
    seqs = sorted(
        r[0] for r in raw.select(COMMIT_SEQ_COLUMN).distinct().collect()
    )
    assert seqs == [0, 1, 2]  # no sequence collision


def test_lost_race_mor_delta_rolls_back_files(spark, roots):
    """A MoR merge whose OCC claim loses must unlink its already-moved
    delta files — otherwise the phantom delta stays physically readable
    (reads are directory-scoped)."""
    from bulker_spark import Engine
    from bulker_spark.sinks.warehouse import ConcurrentWriteError

    eng = Engine(spark, roots)
    eng.bulk_load(
        "t", _df(spark, [(1, "base")]), mode="batch",
        primary_key=["pk"], deduplicate=True, merge_on_read=True,
    )
    wh = eng.warehouse
    meta, base, _ = wh._snapshot("t")
    # another writer lands a commit AFTER our snapshot
    eng.bulk_load(
        "t", _df(spark, [(2, "winner")]), mode="batch",
        primary_key=["pk"], deduplicate=True,
    )
    src = _df(spark, [(3, "loser")])
    import pytest as _pytest

    with _pytest.raises(ConcurrentWriteError):
        wh._merge_mor("t", src, ["pk"], meta, None, None, base)
    wh.refresh("t")
    rows = {r["pk"]: r["v"] for r in wh.read("t").collect()}
    assert rows == {1: "base", 2: "winner"}  # no phantom pk=3


def test_vacuum_reclaims_crashed_stage_dirs(spark, roots):
    """A crashed writer's .stage_* append staging dir is reclaimed by the
    age-guarded vacuum (and only past the guard)."""
    import os

    from bulker_spark.sinks.warehouse import Warehouse

    wh = Warehouse(spark, roots)
    wh.create_or_replace("t", _df(spark, [(1, "a")]), pk=["pk"])
    stage = os.path.join(wh._table_dir("t"), ".stage_deadbeef")
    os.makedirs(stage)
    assert wh.vacuum("t") == []  # age guard protects a fresh stage
    assert os.path.isdir(stage)
    assert wh.vacuum("t", min_age_seconds=0) == [".stage_deadbeef"]
    assert not os.path.isdir(stage)


def test_reader_blind_to_uncommitted_append_files(spark, roots):
    """Manifest-driven reads: files MOVED into the live version dir by an
    in-flight appender are invisible until its commit lands — the read
    resolves the log tail's file list, never the directory."""
    import os

    a = Warehouse(spark, roots)
    b = Warehouse(spark, roots)
    a.create_or_replace("t", _df(spark, [(1, "a")]), pk=["pk"])

    # simulate b crashing between the file move and the commit claim
    meta = b.get_meta("t")
    vdir = os.path.join(b._table_dir("t"), meta.version)
    moved = b._append_files(_df(spark, [(2, "ghost")]), vdir)
    assert moved and all(os.path.exists(p) for p in moved)

    # physical dir has the ghost rows; committed state does not
    assert a.read("t").count() == 1
    assert {r["v"] for r in a.read("t").collect()} == {"a"}

    # once the commit lands, the same files become visible
    b._commit_meta(
        meta,
        op="append",
        files_delta=[os.path.relpath(p, vdir) for p in moved],
    )
    assert a.read("t").count() == 2


def test_append_fails_cleanly_when_version_replaced_midflight(spark, roots):
    """A replace/compact landing between an appender's file move and its
    commit must fail the append (its files went into an obsolete version
    dir) — committing would regress the live pointer."""
    import os

    a = Warehouse(spark, roots)
    b = Warehouse(spark, roots)
    a.create_or_replace("t", _df(spark, [(1, "a")]), pk=["pk"])

    meta = b.get_meta("t")  # b snapshots the old version
    vdir = os.path.join(b._table_dir("t"), meta.version)
    moved = b._append_files(_df(spark, [(2, "late")]), vdir)

    a.create_or_replace("t", _df(spark, [(10, "new")]), pk=["pk"])

    with pytest.raises(ConcurrentWriteError):
        b._commit_meta(
            meta,
            op="append",
            files_delta=[os.path.relpath(p, vdir) for p in moved],
        )
    b._rollback_files(moved)
    assert {r["pk"] for r in a.read("t").collect()} == {10}


def test_concurrent_schema_evolution_appends_keep_both_columns(spark, roots):
    """Two appenders racing with DIFFERENT new columns: the manifest union
    keeps both writers' files, so the winning meta must keep both writers'
    schema-evolution columns too — reads build their explicit schema from
    the tail meta, and a stale-snapshot commit would make the other
    writer's column silently unreadable."""
    a = Warehouse(spark, roots)
    b = Warehouse(spark, roots)
    a.create_or_replace("t", _df(spark, [(1, "a")]), pk=["pk"])
    b.get_meta("t")  # b snapshots the pre-evolution schema

    a.append("t", spark.createDataFrame([(2, "x", 7)], "pk long, v string, xa long"))
    # b's cached meta predates a's commit (same version, so the append
    # proceeds); its commit must union a's columns, not bury them
    b.append("t", spark.createDataFrame([(3, "y", 9)], "pk long, v string, xb long"))

    df = Warehouse(spark, roots).read("t")
    assert {"pk", "v", "xa", "xb"} <= set(df.columns)
    rows = {r["pk"]: (r["xa"], r["xb"]) for r in df.collect()}
    assert rows[2] == (7, None)
    assert rows[3] == (None, 9)


def test_append_to_logless_table_keeps_existing_files(spark, roots):
    """A table with data but no commit log (externally created / log
    lost): the first logged append must union the version dir's existing
    files into its manifest — a delta-only manifest would hide the
    original rows from manifest-driven reads."""
    import os
    import shutil

    w = Warehouse(spark, roots)
    w.create_or_replace("t", _df(spark, [(1, "a"), (2, "b")]), pk=["pk"])
    shutil.rmtree(os.path.join(w._table_dir("t"), "_bulker_log"))

    w2 = Warehouse(spark, roots)
    w2.append("t", _df(spark, [(3, "c")]))
    assert {r["pk"] for r in w2.read("t").collect()} == {1, 2, 3}


def test_threaded_appends_race_compaction_no_lost_rows(spark, roots):
    """Appenders racing a compaction: a compact swaps the version dir, so
    any append whose files went into the OLD dir must fail its commit
    (ConcurrentWriteError) and retry against the new version — the
    invariant is zero lost and zero duplicated rows across every
    successfully-committed append, under any interleaving."""
    import threading

    w0 = Warehouse(spark, roots)
    w0.create_or_replace("t", _df(spark, [(0, "base")]), pk=["pk"])
    errors: list[Exception] = []
    done = threading.Event()

    def appender(tag):
        try:
            w = Warehouse(spark, roots)
            for i in range(3):
                pk = 100 * tag + i
                for _attempt in range(6):
                    try:
                        w.refresh("t")
                        w.append("t", _df(spark, [(pk, f"w{tag}")]))
                        break
                    except ConcurrentWriteError:
                        continue
                else:  # pragma: no cover
                    errors.append(RuntimeError(f"append {pk} starved"))
        except Exception as ex:  # pragma: no cover
            errors.append(ex)

    def compactor():
        try:
            w = Warehouse(spark, roots)
            while not done.is_set():
                try:
                    w.refresh("t")
                    w.compact("t")
                except ConcurrentWriteError:
                    continue
        except Exception as ex:  # pragma: no cover — must not die silently
            errors.append(ex)

    threads = [threading.Thread(target=appender, args=(i,)) for i in (1, 2, 3)]
    c = threading.Thread(target=compactor)
    c.start()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    done.set()
    c.join()
    assert not errors
    rows = [r["pk"] for r in Warehouse(spark, roots).read("t").collect()]
    assert sorted(rows) == sorted(set(rows)), "duplicated rows"
    assert set(rows) == {0} | {100 * t + i for t in (1, 2, 3) for i in range(3)}


def test_engine_append_mode_survives_concurrent_compaction(spark, roots):
    """Engine batch-append loads must self-heal when another process
    compacts the table between loads: the stale cached meta fails the
    first commit (version replaced) and the OCC retry refreshes and
    reapplies — no user-visible error, no lost rows."""
    from bulker_spark import Engine

    e = Engine(spark, roots)
    e.bulk_load("t", _df(spark, [(1, "a")]), mode="batch")
    w2 = Warehouse(spark, roots)
    w2.compact("t")  # new version dir; e's cache is now stale
    e.bulk_load("t", _df(spark, [(2, "b")]), mode="batch")
    assert {r["pk"] for r in Warehouse(spark, roots).read("t").collect()} == {1, 2}


def test_vacuum_ages_stage_dirs_by_tree_newest_mtime(spark, roots):
    """An in-flight write keeps its staging dir alive: Spark writes into
    nested _temporary subdirs without touching the top-level dir's mtime,
    so the age must come from the NEWEST entry in the tree."""
    import os
    import time

    wh = Warehouse(spark, roots)
    wh.create_or_replace("t", _df(spark, [(1, "a")]), pk=["pk"])
    stage = os.path.join(wh._table_dir("t"), ".stage_inflight")
    nested = os.path.join(stage, "_temporary", "0")
    os.makedirs(nested)
    # backdate the top-level dir (created long ago)...
    old = time.time() - 86400
    os.utime(stage, (old, old))
    os.utime(os.path.join(stage, "_temporary"), (old, old))
    # ...but a freshly-written part file proves the writer is alive
    with open(os.path.join(nested, "part-0000.parquet"), "w") as fh:
        fh.write("x")
    assert wh.vacuum("t", min_age_seconds=3600) == []
    assert os.path.isdir(stage)
    # once the whole tree is old, it is reclaimed
    for root, dirs, files in os.walk(stage):
        for e in dirs + files:
            os.utime(os.path.join(root, e), (old, old))
    os.utime(stage, (old, old))
    assert wh.vacuum("t", min_age_seconds=3600) == [".stage_inflight"]


def test_append_rebases_meta_on_tail_commit(spark, roots):
    """A token-less plain append whose snapshot predates a concurrent
    same-version commit must not revert the tail's meta fields — the
    whole meta rebases on the tail, overlaying only novel columns."""
    a = Warehouse(spark, roots)
    b = Warehouse(spark, roots)
    a.create_or_replace("t", _df(spark, [(1, "a")]), pk=["pk"])
    b.get_meta("t")  # prime b's cache with the pre-change snapshot
    # a changes a non-column meta field at the same version through a
    # token-holding commit (the only path allowed to change such fields)
    base = a._last_commit_id("t")
    meta_a = a.get_meta("t")
    meta_a.timestamp_column = "v"
    a._commit_meta(meta_a, op="merge_mor", expected_commit=base, files_delta=[])
    # b appends from its stale snapshot (new column rides along)
    df_new = spark.createDataFrame([(2, "b", 9)], "pk long, v string, extra long")
    b.append("t", df_new)
    a.refresh("t")
    final = a.get_meta("t")
    assert final.timestamp_column == "v"  # a's change survived b's append
    assert "extra" in final.columns  # b's schema evolution survived too
    assert a.read("t").count() == 2


def test_vacuum_ages_inflight_version_dirs_by_tree_mtime(spark, roots):
    """An uncommitted v_* dir an active writer is still filling must
    survive vacuum even when the top-level dir mtime is old — same
    frozen-mtime mechanism as the staging-dir case."""
    import os
    import time

    wh = Warehouse(spark, roots)
    wh.create_or_replace("t", _df(spark, [(1, "a")]), pk=["pk"])
    vdir = os.path.join(wh._table_dir("t"), "v_inflight00000000000000000000")
    nested = os.path.join(vdir, "_temporary", "0")
    os.makedirs(nested)
    old = time.time() - 86400
    os.utime(vdir, (old, old))
    os.utime(os.path.join(vdir, "_temporary"), (old, old))
    with open(os.path.join(nested, "part-0000.parquet"), "w") as fh:
        fh.write("x")  # fresh: the writer is alive
    assert wh.vacuum("t", min_age_seconds=3600) == []
    assert os.path.isdir(vdir)


def test_compact_is_noop_when_already_compacted(spark, roots):
    """An already-compacted table (files <= target, no MoR deltas, no
    explicit re-layout) must return WITHOUT committing a version — a
    maintenance loop spinning no-op commits contends with writers for
    nothing."""
    w = Warehouse(spark, roots)
    w.create_or_replace("nc", _df(spark, [(1, "a"), (2, "b")]))
    first = w.compact("nc")  # may rewrite once to the target layout
    assert "before" in first
    head = w.history("nc")[0]["commit"]
    again = w.compact("nc")
    assert again.get("skipped") is True
    assert w.history("nc")[0]["commit"] == head  # no new commit
    # an append re-fragments -> next compact works again
    w.refresh("nc")
    w.append("nc", _df(spark, [(3, "c")]))
    w.refresh("nc")
    out = w.compact("nc")
    assert out.get("skipped") is not True or (
        w.table_stats("nc")["n_files"] == 1
    )
    assert sorted(r["pk"] for r in w.read("nc").collect()) == [1, 2, 3]


def test_compact_is_noop_on_untouched_clustered_table(spark, roots):
    """A clustered table whose current commit IS its last compaction has
    had no writes since the re-sort — the maintenance pass must skip it
    (it used to rewrite untouched clustered tables every cycle), while
    any write after the compaction re-arms the rewrite."""
    w = Warehouse(spark, roots)
    w.create_or_replace("ncc", _df(spark, [(2, "b"), (1, "a"), (3, "c")]))
    first = w.compact("ncc", cluster_by=["pk"])  # persists the layout
    assert first.get("skipped") is not True
    assert w.get_meta("ncc").cluster_cols == ["pk"]
    head = w.history("ncc")[0]["commit"]
    again = w.compact("ncc")
    assert again.get("skipped") is True
    assert w.history("ncc")[0]["commit"] == head  # no commit churn
    # a write after the compaction means the layout may be stale again
    w.refresh("ncc")
    w.append("ncc", _df(spark, [(0, "z")]))
    w.refresh("ncc")
    out = w.compact("ncc")
    assert out.get("skipped") is not True
    # and the rewrite re-applies the persisted clustering + re-arms skip
    assert w.compact("ncc").get("skipped") is True
    assert sorted(r["pk"] for r in w.read("ncc").collect()) == [0, 1, 2, 3]


def test_clone_does_not_inherit_compaction_skip(spark, roots):
    """A clone's commit log restarts at 1; an inherited
    last_compact_commit could coincide with the new counter and falsely
    skip the re-sort of a cloned clustered table after writes landed."""
    w = Warehouse(spark, roots)
    w.create_or_replace("src_c", _df(spark, [(2, "b"), (1, "a")]))
    w.compact("src_c", cluster_by=["pk"])
    w.clone("src_c", "dst_c")
    assert w.get_meta("dst_c").last_compact_commit == 0
    w.append("dst_c", _df(spark, [(3, "c")]))
    w.refresh("dst_c")
    out = w.compact("dst_c")  # clustered + writes since: must rewrite
    assert out.get("skipped") is not True
