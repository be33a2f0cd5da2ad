"""Stats-scoped merge: on a range-clustered (unbucketed) table, a merge
reads and rewrites ONLY the files whose committed pk min/max admit a
batch key — untouched files carry over as links/references, byte
identical. The file-skipping twin of the bucketed merge, driven by the
same per-file stats the read side prunes with."""

import pytest
from pyspark.sql import functions as F

from bulker_spark.sinks.warehouse import Warehouse


@pytest.fixture()
def wh(spark, tmp_path):
    w = Warehouse(spark, str(tmp_path / "wh"), retain_versions=5)
    # test tables are tiny; the adaptive guard (scope only when >= ~2M
    # rows are skipped) would otherwise route every merge to the full
    # rewrite — the guard itself is pinned in its own test below
    w._SCOPE_MIN_SKIPPED_ROWS = 0
    return w


def _clustered(spark, wh, n=20_000, name="t"):
    df = (
        spark.range(n)
        .selectExpr("id as pk", "cast(id as string) as val",
                    "cast(id as double) as score")
        .repartitionByRange(8, "pk")
        .sortWithinPartitions("pk")
    )
    wh.create_or_replace(name, df, pk=["pk"], cluster_by=["pk"])
    return df


def _ids(entry):
    return {Warehouse._deref(f) for f in entry["files"]}


def test_trickle_merge_rewrites_only_touched_files(spark, wh):
    _clustered(spark, wh)
    c0 = wh.history("t")[0]["commit"]
    upd = spark.createDataFrame(
        [(7, "X", 7.0), (15_000, "Y", 1.0)], "pk long, val string, score double"
    )
    wh.merge("t", upd, ["pk"])
    log = wh._read_log("t")
    prev = next(e for e in log if e["commit"] == c0)
    cur = next(e for e in log if e["commit"] == c0 + 1)
    shared = _ids(prev) & _ids(cur)
    assert shared, "untouched files must carry over by identity"
    rewritten = _ids(prev) - _ids(cur)
    # 2 scattered keys touch at most 2 of the range-disjoint files
    assert 0 < len(rewritten) <= 2 < len(_ids(prev))
    got = {r["pk"]: r["val"] for r in wh.read("t").collect()}
    assert got[7] == "X" and got[15_000] == "Y" and got[3] == "3"
    assert wh.read("t").count() == 20_000


def test_scoped_merge_equals_plain_merge(spark, wh):
    """Same batch into a scoped (clustered) and an unscoped copy of the
    same table → identical final rows."""
    df = _clustered(spark, wh, name="a")
    wh.create_or_replace("b", df, pk=["pk"])  # unclustered: full rewrite
    batch = spark.createDataFrame(
        [(5, "U5", 0.5), (19_999, "U9", 0.9), (50_000, "NEW", 5.0)],
        "pk long, val string, score double",
    )
    wh.merge("a", batch, ["pk"])
    wh.merge("b", batch, ["pk"])
    a = sorted(map(tuple, wh.read("a").select("pk", "val", "score").collect()))
    b = sorted(map(tuple, wh.read("b").select("pk", "val", "score").collect()))
    assert a == b and len(a) == 20_001


def test_new_keys_insert_via_scoped_path(spark, wh):
    _clustered(spark, wh)
    ins = spark.createDataFrame(
        [(100_000 + i, f"n{i}", float(i)) for i in range(5)],
        "pk long, val string, score double",
    )
    wh.merge("t", ins, ["pk"])
    assert wh.read("t").count() == 20_005
    assert wh.read("t").filter("pk >= 100000").count() == 5


def test_wide_batch_falls_back_to_full_merge(spark, wh):
    """Keys spread across every file: scoping would rewrite everything —
    the plain path runs instead, and the result is still exact."""
    _clustered(spark, wh)
    wide = (
        spark.range(0, 20_000, 25)  # every file's range hit
        .selectExpr("id as pk", "'W' as val", "0.0 as score")
    )
    wh.merge("t", wide, ["pk"])
    got = wh.read("t")
    assert got.count() == 20_000
    assert got.filter("val = 'W'").count() == 800


def test_scoped_merge_schema_evolution(spark, wh):
    _clustered(spark, wh)
    wider = spark.createDataFrame(
        [(7, "X", 7.0, "extra")],
        "pk long, val string, score double, note string",
    )
    wh.merge("t", wider, ["pk"])
    rows = {r["pk"]: r for r in wh.read("t").filter("pk in (7, 8)").collect()}
    assert rows[7]["note"] == "extra"
    assert rows[8]["note"] is None  # untouched (linked) file null-fills


def test_scoped_merge_change_feed_spans_only_slice(spark, wh):
    """The CDC invariant carries over: the feed of a scoped merge diffs
    only the rewritten files and classifies exactly."""
    _clustered(spark, wh)
    c0 = wh.history("t")[0]["commit"]
    wh.merge(
        "t",
        spark.createDataFrame([(7, "X", 7.0)], "pk long, val string, score double"),
        ["pk"],
    )
    feed = wh.read_changes("t", c0)
    got = sorted(
        (r["pk"], r["__change_type"], r["val"]) for r in feed.collect()
    )
    assert got == [(7, "update_postimage", "X"), (7, "update_preimage", "7")]


def test_scoped_merge_with_string_pk(spark, wh):
    df = (
        spark.range(5_000)
        .selectExpr("format_string('k%08d', id) as pk", "id as v")
        .repartitionByRange(8, "pk")
        .sortWithinPartitions("pk")
    )
    wh.create_or_replace("s", df, pk=["pk"], cluster_by=["pk"])
    c0 = wh.history("s")[0]["commit"]
    wh.merge(
        "s",
        spark.createDataFrame([("k00000007", 999)], "pk string, v long"),
        ["pk"],
    )
    log = wh._read_log("s")
    prev = next(e for e in log if e["commit"] == c0)
    cur = next(e for e in log if e["commit"] == c0 + 1)
    assert _ids(prev) & _ids(cur), "string-keyed scope must also link"
    got = {
        r["pk"]: r["v"]
        for r in wh.read("s").filter("pk = 'k00000007'").collect()
    }
    assert got == {"k00000007": 999}
    assert wh.read("s").count() == 5_000


def test_scoped_merge_respects_merge_window(spark, wh):
    """window_days still bounds which matched rows update INSIDE the
    scoped slice (out-of-window rows survive untouched)."""
    import datetime as dt

    now = dt.datetime(2024, 6, 1)
    df = (
        spark.createDataFrame(
            [(i, f"v{i}", now - dt.timedelta(days=400 if i < 100 else 1))
             for i in range(200)],
            "pk long, val string, ts timestamp",
        )
        .repartitionByRange(4, "pk")
        .sortWithinPartitions("pk")
    )
    wh.create_or_replace("w", df, pk=["pk"], cluster_by=["pk"],
                         timestamp_column="ts")
    batch = spark.createDataFrame(
        [(5, "OLDKEY", now), (150, "NEWKEY", now)],
        "pk long, val string, ts timestamp",
    )
    wh.merge("w", batch, ["pk"], timestamp_column="ts", window_days=30,
             now=now)
    rows = wh.read("w")
    got = {r["pk"]: r["val"] for r in rows.filter("pk = 150").collect()}
    assert got[150] == "NEWKEY"  # in-window: updates in place
    # pk 5's match lies OUTSIDE the 30-day window: the frozen row is not
    # replaced and the source row lands beside it — exactly the plain
    # path's (and the reference's dedupe-window) semantics; scoping must
    # not change it
    pk5 = sorted(r["val"] for r in rows.filter("pk = 5").collect())
    assert pk5 == ["OLDKEY", "v5"]
    assert rows.count() == 201


def test_small_table_skips_scoping_by_default(spark, tmp_path):
    """The adaptive guard: when the stats prove too few rows would be
    skipped, the fixed coordination cost of a scoped rewrite exceeds the
    full rewrite — the default path must be the plain merge."""
    wh2 = Warehouse(spark, str(tmp_path / "wh2"), retain_versions=5)
    df = (
        spark.range(10_000)
        .selectExpr("id as pk", "cast(id as string) as val")
        .repartitionByRange(8, "pk")
    )
    wh2.create_or_replace("t", df, pk=["pk"], cluster_by=["pk"])
    c0 = wh2.history("t")[0]["commit"]
    wh2.merge(
        "t", spark.createDataFrame([(7, "X")], "pk long, val string"), ["pk"]
    )
    log = wh2._read_log("t")
    prev = next(e for e in log if e["commit"] == c0)
    cur = next(e for e in log if e["commit"] == c0 + 1)
    assert not (_ids(prev) & _ids(cur))  # full rewrite: nothing carried
    got = {r["pk"]: r["val"] for r in wh2.read("t").filter("pk = 7").collect()}
    assert got == {7: "X"}


def test_insert_only_batch_links_whole_manifest(spark, wh):
    """Monotonic-key CDC trickle (every key beyond every file's max):
    the scoped path must link the ENTIRE manifest and land only the new
    rows — O(batch), never a full rewrite."""
    _clustered(spark, wh)
    c0 = wh.history("t")[0]["commit"]
    ins = spark.createDataFrame(
        [(1_000_000 + i, f"n{i}", float(i)) for i in range(3)],
        "pk long, val string, score double",
    )
    wh.merge("t", ins, ["pk"])
    log = wh._read_log("t")
    prev = next(e for e in log if e["commit"] == c0)
    cur = next(e for e in log if e["commit"] == c0 + 1)
    assert _ids(prev) <= _ids(cur), "every old file must carry over"
    assert wh.read("t").count() == 20_003


def test_scoped_merge_true_hull_beyond_key_cap(spark, wh):
    """More distinct keys than the driver collects: the scope must use
    the TRUE aggregated hull (a sampled hull could skip files holding
    real matches — duplicate-PK corruption)."""
    wh._SCOPE_MAX_KEYS = 50  # force the hull path with a small batch
    _clustered(spark, wh)
    batch = (
        spark.range(0, 20_000, 97)  # 207 distinct keys > cap
        .selectExpr("id as pk", "'H' as val", "0.0 as score")
    )
    wh.merge("t", batch, ["pk"])
    got = wh.read("t")
    assert got.count() == 20_000  # every key updated in place, no dupes
    assert got.filter("val = 'H'").count() == batch.count()


def test_lookup_prunes_manifest_on_clustered_table(spark, wh):
    """Point lookups on a clustered CoW table open O(1) files: the key
    hull prunes the committed manifest before any scan is planned."""
    _clustered(spark, wh)
    hit = wh.lookup("t", [42, 43])
    full = wh.read("t")
    assert len(hit.inputFiles()) < len(full.inputFiles())
    assert sorted(r["pk"] for r in hit.collect()) == [42, 43]


def test_cluster_stats_reports_layout_quality(spark, wh):
    """overlap_ratio ≈ 1 on a fresh clustered table, stays low after a
    scoped trickle, and reads high on a hash layout — the signal that
    drives compact(cluster_by=...) decisions."""
    _clustered(spark, wh)
    s0 = wh.cluster_stats("t")
    assert s0["column"] == "pk" and s0["cluster_cols"] == ["pk"]
    assert s0["statted"] == s0["files"] > 0
    assert s0["overlap_ratio"] <= 1.5
    wh.merge(
        "t",
        spark.createDataFrame([(7, "X", 7.0)], "pk long, val string, score double"),
        ["pk"],
    )
    assert wh.cluster_stats("t")["overlap_ratio"] <= 2.0

    hashy = (
        spark.range(20_000)
        .selectExpr("id as pk", "cast(id as string) as val")
        .repartition(8)
    )
    wh.create_or_replace("h", hashy, pk=["pk"])
    assert wh.cluster_stats("h")["overlap_ratio"] > 2.0


def test_scoped_merge_under_manifest_link_mode(spark, tmp_path):
    """The object-store binding: untouched files carry over as manifest
    REFERENCES (../v_old/... entries), and a second trickle re-resolves
    them correctly — the scope test keys on version-local identity."""
    wh2 = Warehouse(
        spark, str(tmp_path / "whm"), retain_versions=5,
        link_mode="manifest",
    )
    wh2._SCOPE_MIN_SKIPPED_ROWS = 0
    df = (
        spark.range(20_000)
        .selectExpr("id as pk", "cast(id as string) as val")
        .repartitionByRange(8, "pk")
        .sortWithinPartitions("pk")
    )
    wh2.create_or_replace("t", df, pk=["pk"], cluster_by=["pk"])
    c0 = wh2.history("t")[0]["commit"]
    wh2.merge(
        "t", spark.createDataFrame([(7, "X")], "pk long, val string"), ["pk"]
    )
    cur = wh2._read_log("t")[-1]
    refs = [f for f in cur["files"] if f.startswith("../")]
    assert refs, "untouched files must be cross-version references"
    # second trickle through the referenced manifest
    wh2.merge(
        "t", spark.createDataFrame([(9, "Y")], "pk long, val string"), ["pk"]
    )
    got = {r["pk"]: r["val"] for r in wh2.read("t").filter("pk in (7,9,11)").collect()}
    assert got == {7: "X", 9: "Y", 11: "11"}
    assert wh2.read("t").count() == 20_000


def test_lookup_hull_prune_guards_timestamp_and_nan_keys(spark, wh):
    """Hull pruning is restricted to uniformly int/str keys: datetime
    keys would compare naive isoformats against aware-UTC stats strings
    and NaN poisons min/max silently — both must take the unpruned path
    and still return exact rows."""
    import datetime as dt
    import math

    ts0 = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    df = spark.createDataFrame(
        [(ts0 + dt.timedelta(hours=i), f"v{i}") for i in range(50)],
        "pk timestamp, val string",
    ).repartitionByRange(4, "pk")
    wh.create_or_replace("ts", df, pk=["pk"])
    naive_key = dt.datetime(2024, 1, 1, 5)  # naive spelling of hour 5
    got = wh.lookup("ts", [naive_key]).collect()
    assert [r["val"] for r in got] == ["v5"]

    dff = spark.createDataFrame(
        [(1.0, "a"), (float("nan"), "n"), (1000.0, "z")],
        "pk double, val string",
    )
    wh.create_or_replace("fl", dff, pk=["pk"])
    got = wh.lookup("fl", [1.0, float("nan")]).collect()
    assert sorted(r["val"] for r in got) == ["a", "n"]


class _PoisonSource:
    """Fails the test on ANY attribute access — proves the guard declined
    from committed stats alone, without spending a Spark job on the
    source (the decline-cost regression: ~0.3 s of source jobs per
    trickle merge at the 1M tier, learned nothing)."""

    def __getattr__(self, name):
        raise AssertionError(
            f"source.{name} touched — guard must decline stats-only"
        )


def test_guard_declines_free_below_row_threshold(spark, tmp_path):
    """A table smaller than _SCOPE_MIN_SKIPPED_ROWS can never pass the
    final skipped-rows check, so the guard must return None before ANY
    source job runs."""
    w = Warehouse(spark, str(tmp_path / "whg"), retain_versions=5)
    df = spark.range(1_000).selectExpr("id as pk", "cast(id as string) as val")
    w.create_or_replace("t", df, pk=["pk"], cluster_by=["pk"])
    base = w._last_commit_id("t")
    entry = next(e for e in w._read_log("t") if e["commit"] == base)
    out = w._merge_stats_scoped(
        "t", _PoisonSource(), ["pk"], w.get_meta("t"),
        None, None, None, None, base, entry["files"],
    )
    assert out is None


def test_guard_skips_keys_collect_on_unclustered_table(spark, tmp_path):
    """On an unclustered table every file's [min, max] spans the whole
    key range — any file containing the batch's kmin is touched no matter
    which other keys exist, so after the single hull agg the guard must
    decline WITHOUT the second (distinct-keys) source job."""
    w = Warehouse(spark, str(tmp_path / "whu"), retain_versions=5)
    w._SCOPE_MIN_SKIPPED_ROWS = 0  # reach past the row-count pre-check
    # hash-shuffled layout: each of the 8 files spans ~the full pk range
    df = (
        spark.range(20_000)
        .selectExpr("id as pk", "cast(id as string) as val")
        .repartition(8, "pk")
    )
    w.create_or_replace("t", df, pk=["pk"])
    base = w._last_commit_id("t")
    entry = next(e for e in w._read_log("t") if e["commit"] == base)

    calls = []
    real = spark.createDataFrame([(7,), (15_000,)], "pk long")

    class CountingSource:
        def agg(self, *a, **k):
            calls.append("agg")
            return real.agg(*a, **k)

        def select(self, *a, **k):
            calls.append("select")
            return real.select(*a, **k)

    out = w._merge_stats_scoped(
        "t", CountingSource(), ["pk"], w.get_meta("t"),
        None, None, None, None, base, entry["files"],
    )
    assert out is None
    assert calls == ["agg"], calls  # hull agg only, no keys collect
