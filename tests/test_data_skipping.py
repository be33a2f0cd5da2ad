"""Manifest-level data skipping: per-file column min/max recorded in
every commit entry (``file_stats``), consumed by ``read(prune=...)`` —
files whose stats prove no match are never opened or scheduled. The
Iceberg planning-time pruning layer on the dependency-free warehouse;
reference scope: none (jitsucom/bulker has no table format)."""

import pytest
from pyspark.sql import functions as F

from bulker_spark.sinks.warehouse import Warehouse, _stats_admit


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path / "wh"), retain_versions=3)


def _clustered(spark, wh, n=10_000, files=8):
    """A table whose files cover disjoint pk ranges (range-clustered),
    so stats pruning has something to bite on."""
    df = (
        spark.range(n)
        .select(
            F.col("id").alias("pk"),
            (F.col("id") % 7).alias("grp"),
            F.col("id").cast("double").alias("val"),
        )
        .repartitionByRange(files, "pk")
        .sortWithinPartitions("pk")
    )
    wh.create_or_replace("t", df, pk=["pk"])
    return df


def test_commit_records_file_stats(spark, wh):
    _clustered(spark, wh)
    entry = wh._read_log("t")[-1]
    stats = entry["file_stats"]
    assert stats, "commit must carry file_stats"
    assert set(entry["files"]) == {k for k in stats} | (
        set(entry["files"]) - set(stats)
    )
    some = next(iter(stats.values()))
    assert some["rows"] > 0
    assert "pk" in some["cols"]
    assert some["cols"]["pk"][0] <= some["cols"]["pk"][1]


def test_prune_reads_fewer_files_same_rows(spark, wh):
    _clustered(spark, wh)
    full = wh.read("t")
    pruned = wh.read("t", prune={"pk": (100, 200)})
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    got = sorted(
        r["pk"]
        for r in pruned.filter(
            (F.col("pk") >= 100) & (F.col("pk") <= 200)
        ).collect()
    )
    assert got == list(range(100, 201))


def test_prune_is_advisory_never_loses_matches(spark, wh):
    _clustered(spark, wh)
    # a one-sided bound (None = unbounded)
    pruned = wh.read("t", prune={"pk": (9_900, None)})
    got = {r["pk"] for r in pruned.filter(F.col("pk") >= 9_900).collect()}
    assert got == set(range(9_900, 10_000))


def test_stats_survive_append_and_partial_rewrite(spark, wh):
    df = (
        spark.range(1000)
        .select(
            F.col("id").alias("pk"),
            (F.col("id") % 2).cast("string").alias("p"),
            F.col("id").cast("double").alias("val"),
        )
    )
    wh.create_or_replace("t", df, pk=["pk"], partition_by=["p"])
    wh.append(
        "t",
        spark.range(1000, 2000).select(
            F.col("id").alias("pk"),
            F.lit("0").alias("p"),
            F.col("id").cast("double").alias("val"),
        ),
    )
    wh.replace_partition(
        "t",
        spark.range(5000, 5100).select(
            F.col("id").alias("pk"),
            F.lit("1").alias("p"),
            F.col("id").cast("double").alias("val"),
        ),
        partition_column="p",
    )
    entry = wh._read_log("t")[-1]
    stats = entry["file_stats"]
    import os

    # identity = version-local relpath (partition dir + part name):
    # basenames collide across partition dirs of one write job
    ids = {Warehouse._deref(f) for f in entry["files"]}
    assert ids & set(stats) == ids
    # pruning still correct after the rewrite
    pruned = wh.read("t", prune={"pk": (5000, 6000)})
    got = {r["pk"] for r in pruned.filter(F.col("pk") >= 5000).collect()}
    assert got == set(range(5000, 5100))
    assert len(pruned.inputFiles()) < len(wh.read("t").inputFiles())


def test_stats_in_manifest_link_mode(spark, tmp_path):
    wh = Warehouse(
        spark, str(tmp_path / "whm"), retain_versions=3,
        link_mode="manifest",
    )
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)], "pk long, p string, val double"
    )
    wh.create_or_replace("t", df, pk=["pk"], partition_by=["p"])
    wh.replace_partition(
        "t",
        spark.createDataFrame([(9, "b", 9.0)], "pk long, p string, val double"),
        partition_column="p",
    )
    # kept file is a ../v_x/ reference; its stats rode along under the
    # deref'd version-local relpath
    entry = wh._read_log("t")[-1]
    refs = [f for f in entry["files"] if f.startswith("../")]
    assert refs
    assert all(Warehouse._deref(r) in entry["file_stats"] for r in refs)
    pruned = wh.read("t", prune={"pk": (9, 9)})
    assert {r["pk"] for r in pruned.collect()} == {9}


def test_prune_rejected_on_mor(spark, wh):
    df = spark.createDataFrame([(1, "x")], "pk long, v string")
    wh.create_or_replace("t", df, pk=["pk"], merge_on_read=True)
    with pytest.raises(ValueError, match="merge-on-read"):
        wh.read("t", prune={"pk": (0, 1)})


def test_time_travel_prunes_from_its_own_entry(spark, wh):
    _clustered(spark, wh)
    c1 = wh._last_commit_id("t")
    wh.append(
        "t",
        spark.range(50_000, 50_010).select(
            F.col("pk") if False else F.col("id").alias("pk"),
            (F.col("id") % 7).alias("grp"),
            F.col("id").cast("double").alias("val"),
        ),
    )
    old = wh.read("t", version=c1, prune={"pk": (0, 10)})
    assert len(old.inputFiles()) < 8
    assert old.filter(F.col("pk") <= 10).count() == 11


def test_when_conditions_prune_bounds():
    from bulker_spark.operators.filters import WhenConditions

    wc = WhenConditions().add("a", ">=", 10).add("a", "<", 20).add("b", "=", 5)
    assert wc.prune_bounds() == {"a": (10, 20), "b": (5, 5)}
    # non-range clauses contribute nothing but don't block neighbours
    wc = WhenConditions().add("a", ">", 1).add("a", "is not null").add("b", "like", "x%")
    assert wc.prune_bounds() == {"a": (1, None)}
    # OR disjunction: a file must be skippable under EVERY disjunct — punt
    assert WhenConditions(join_with="or").add("a", "=", 1).add("b", "=", 2).prune_bounds() == {}
    # mixed-type clauses on one column poison it permanently
    wc = WhenConditions().add("a", ">=", 10).add("a", "<=", "zz").add("a", ">", 3)
    assert wc.prune_bounds() == {}
    # non-scalar values contribute nothing
    assert WhenConditions().add("a", "=", [1, 2]).prune_bounds() == {}


def test_select_with_conditions_prunes_files(spark, wh):
    from bulker_spark.operators.filters import WhenConditions

    _clustered(spark, wh)
    wc = WhenConditions().add("pk", ">=", 100).add("pk", "<=", 200)
    df = wh.select("t", where=wc)
    assert len(df.inputFiles()) < len(wh.read("t").inputFiles())
    assert sorted(r["pk"] for r in df.collect()) == list(range(100, 201))
    assert wh.count("t", where=wc) == 101
    # OR predicate: no pruning, still correct
    wc_or = WhenConditions(join_with="or").add("pk", "=", 5).add("pk", "=", 9999)
    df_or = wh.select("t", where=wc_or)
    assert len(df_or.inputFiles()) == len(wh.read("t").inputFiles())
    assert {r["pk"] for r in df_or.collect()} == {5, 9999}


def test_count_conditions_on_mor_does_not_raise(spark, wh):
    from bulker_spark.operators.filters import WhenConditions

    df = spark.createDataFrame([(1, 10), (2, 20)], "pk long, v long")
    wh.create_or_replace("t", df, pk=["pk"], merge_on_read=True)
    wc = WhenConditions().add("pk", ">=", 2)
    assert wh.count("t", where=wc) == 1  # silently unpruned


def test_log_range_passes_prune(spark, tmp_path, monkeypatch):
    from bulker_spark.app import BulkerApp, Destination

    app = BulkerApp(
        spark, str(tmp_path / "topics"),
        [Destination("d1", str(tmp_path / "wh"), options={})],
    )
    eng = app.engine_for("d1")
    eng.warehouse.create_or_replace(
        "ev",
        spark.range(100).select(
            F.col("id").alias("eid"), F.col("id").cast("double").alias("v")
        ).repartitionByRange(4, "eid"),
        pk=["eid"],
    )
    seen = {}
    orig = eng.warehouse.read

    def spy(name, *a, **kw):
        seen["prune"] = kw.get("prune")
        return orig(name, *a, **kw)

    monkeypatch.setattr(eng.warehouse, "read", spy)
    rows = app.log_range("d1", "ev", id_col="eid", before_id=10, limit=5)
    assert seen["prune"] == {"eid": (None, 10)}
    assert [r["eid"] for r in rows] == [9, 8, 7, 6, 5]


def test_zorder_compact_then_prune_both_columns(spark, wh):
    """compact(zorder_by=[x, y]) + manifest stats = multi-column file
    skipping: a tight box on EITHER clustered column drops files."""
    df = spark.range(40_000).selectExpr(
        "id AS pk",
        "CAST(pmod(hash(id), 10000) AS DOUBLE) AS x",
        "CAST(pmod(hash(id + 77), 10000) AS DOUBLE) AS y",
    )
    wh.create_or_replace("t", df, pk=["pk"])
    wh.compact("t", target_file_bytes=32 * 1024, zorder_by=["x", "y"])
    entry = wh._read_log("t")[-1]
    assert entry["file_stats"], "compact commit must carry file_stats"
    nfull = len(wh.read("t").inputFiles())
    assert nfull > 4
    for col in ("x", "y"):
        pruned = wh.read("t", prune={col: (0.0, 500.0)})
        assert len(pruned.inputFiles()) < nfull, col
        got = pruned.filter(F.col(col) <= 500.0).count()
        want = wh.read("t").filter(F.col(col) <= 500.0).count()
        assert got == want


def test_metadata_only_count(spark, wh, monkeypatch):
    _clustered(spark, wh, n=1234)
    wh.append(
        "t",
        spark.range(5000, 5050).select(
            F.col("id").alias("pk"),
            (F.col("id") % 7).alias("grp"),
            F.col("id").cast("double").alias("val"),
        ),
    )
    # the count comes from the commit log alone — no scan may happen
    def boom(*a, **kw):
        raise AssertionError("metadata count must not read files")

    monkeypatch.setattr(wh, "read", boom)
    assert wh.count("t") == 1284
    monkeypatch.undo()
    assert wh.read("t").count() == 1284
    # MoR tables fall back to a real reconciling scan
    df = spark.createDataFrame([(1, 10), (1, 11)], "pk long, v long")
    wh.create_or_replace("m", df.limit(1), pk=["pk"], merge_on_read=True)
    wh.merge("m", spark.createDataFrame([(1, 12)], "pk long, v long"), pk=["pk"])
    assert wh.count("m") == 1


def test_stats_admit_semantics():
    stats = {"f1": {"rows": 5, "cols": {"pk": [100, 200]}}}
    assert _stats_admit(stats, "f1", {"pk": (150, 160)})
    assert not _stats_admit(stats, "f1", {"pk": (201, 300)})
    assert not _stats_admit(stats, "f1", {"pk": (0, 99)})
    assert _stats_admit(stats, "f1", {"pk": (None, 100)})
    assert _stats_admit(stats, "f1", {"pk": (200, None)})
    assert _stats_admit(stats, "unknown_file", {"pk": (0, 1)})
    assert _stats_admit(stats, "f1", {"unstatted_col": (0, 1)})
    assert _stats_admit(None, "f1", {"pk": (0, 1)})


def test_stats_identity_distinguishes_colliding_basenames(spark, wh):
    """One write task writing several partition dirs reuses its part
    number: ``p=0/part-00000-<uuid>`` … ``p=3/part-00000-<uuid>`` all share
    a basename. Under basename-keyed stats those four files collapsed to
    ONE stats entry (last computed wins), and pruning could drop a file
    that matched — here p=0's file would be pruned by p=3's min/max,
    silently losing every matching row. Relpath identity keeps them
    distinct."""
    import os

    df = (
        spark.range(1000)
        .repartition(1)  # one task → guaranteed basename reuse across dirs
        .select(
            F.col("id").alias("pk"),
            (F.col("id") / 250).cast("int").cast("string").alias("p"),
            F.col("id").cast("double").alias("val"),
        )
    )
    wh.create_or_replace("t", df, partition_by=["p"])
    entry = wh._read_log("t")[-1]
    bns = [os.path.basename(f) for f in entry["files"]]
    assert len(set(bns)) < len(bns)  # the collision scenario is real
    ids = {Warehouse._deref(f) for f in entry["files"]}
    assert ids <= set(entry["file_stats"])  # every file individually statted
    pruned = wh.read("t", prune={"pk": (0, 100)})
    assert len(pruned.inputFiles()) == 1  # only p=0's file admitted
    assert {r["pk"] for r in pruned.filter("pk <= 100").collect()} == set(
        range(101)
    )


def test_stats_admit_timestamp_bounds_compare_as_instants():
    """Timestamp stats are aware-UTC ISO strings; bounds arrive in every
    spelling a caller produces. Lexicographic comparison is wrong in two
    ways — 'T' > ' ' and the '+00:00' suffix — both of which made
    IN-RANGE files compare as out-of-range and get silently pruned."""
    import datetime as dt

    stats = {
        "f1": {
            "rows": 5,
            "cols": {
                "ts": [
                    "2024-01-02T12:00:00+00:00",
                    "2024-01-02T18:00:00+00:00",
                ]
            },
        }
    }
    # space-separated end-of-day bound: the file IS in range (old code
    # pruned it because '2024-01-02T12..' > '2024-01-02 23:59:59')
    assert _stats_admit(stats, "f1", {"ts": (None, "2024-01-02 23:59:59+00:00")})
    # aware datetime bounds — in-range and out-of-range
    utc = dt.timezone.utc
    assert _stats_admit(
        stats, "f1", {"ts": (dt.datetime(2024, 1, 2, 13, tzinfo=utc), None)}
    )
    assert not _stats_admit(
        stats, "f1", {"ts": (None, dt.datetime(2024, 1, 2, 10, tzinfo=utc))}
    )
    assert not _stats_admit(
        stats, "f1", {"ts": (dt.datetime(2024, 1, 2, 19, tzinfo=utc), None)}
    )
    # non-UTC offset resolves to the same instant, not its spelling:
    # 13:00+01:00 == 12:00Z == fmin → must admit
    assert _stats_admit(stats, "f1", {"ts": (None, "2024-01-02 13:00:00+01:00")})
    assert _stats_admit(
        stats,
        "f1",
        {
            "ts": (
                None,
                dt.datetime(
                    2024, 1, 2, 13, tzinfo=dt.timezone(dt.timedelta(hours=1))
                ),
            )
        },
    )
    # naive bounds (datetime or string) are session-tz-dependent: never
    # prune on them — admit regardless of apparent range
    assert _stats_admit(stats, "f1", {"ts": (None, "2024-01-02 10:00:00")})
    assert _stats_admit(stats, "f1", {"ts": (dt.datetime(2024, 1, 2, 19), None)})
    # 'Z' suffix parses
    assert not _stats_admit(stats, "f1", {"ts": (None, "2024-01-02T10:00:00Z")})
    # garbage bound: unbounded side, admit
    assert _stats_admit(stats, "f1", {"ts": (None, "not a timestamp")})


def test_stats_admit_date_bounds():
    import datetime as dt

    stats = {"f": {"rows": 1, "cols": {"d": ["2024-01-02", "2024-01-05"]}}}
    assert _stats_admit(stats, "f", {"d": (dt.date(2024, 1, 3), None)})
    assert not _stats_admit(stats, "f", {"d": (dt.date(2024, 1, 6), None)})
    assert not _stats_admit(stats, "f", {"d": (None, "2024-01-01")})
    assert _stats_admit(stats, "f", {"d": (None, "2024-01-02")})
    # a datetime's calendar date depends on its timezone — admit
    assert _stats_admit(stats, "f", {"d": (dt.datetime(2024, 1, 6), None)})


def test_prune_bounds_timestamp_normalization():
    """Naive datetimes must not reach the manifest prune (their instant
    is session-tz-dependent); aware ones are normalized to UTC."""
    import datetime as dt

    from bulker_spark.operators.filters import WhenConditions

    naive = dt.datetime(2024, 1, 2, 23, 59, 59)
    assert WhenConditions().add("ts", "<=", naive).prune_bounds() == {}
    # a naive clause alongside a numeric clause drops only itself
    wc = WhenConditions().add("ts", "<=", naive).add("pk", ">=", 10)
    assert wc.prune_bounds() == {"pk": (10, None)}
    cet = dt.timezone(dt.timedelta(hours=1))
    aware = dt.datetime(2024, 1, 2, 13, 0, 0, tzinfo=cet)
    got = WhenConditions().add("ts", "<=", aware).prune_bounds()
    (lo, hi) = got["ts"]
    assert lo is None and hi.utcoffset() == dt.timedelta(0)
    assert hi.hour == 12  # 13:00+01:00 → 12:00Z


def test_log_range_timestamp_strings_do_not_misprune(spark, tmp_path):
    """End-to-end ADVICE-high regression: a raw query-string bound like
    '2024-01-02 23:59:59' must not prune the day's files away."""
    from bulker_spark.app import BulkerApp, Destination

    app = BulkerApp(
        spark, str(tmp_path / "topics"),
        [Destination("d1", str(tmp_path / "wh"), options={})],
    )
    eng = app.engine_for("d1")
    df = spark.range(48).selectExpr(
        "id AS eid",
        "timestamp'2024-01-02 00:00:00' + make_interval(0,0,0,0,CAST(id AS INT),0,0) AS ts",
    ).repartitionByRange(4, "eid")
    eng.warehouse.create_or_replace("ev", df, pk=["eid"])
    rows = app.log_range(
        "d1", "ev", ts_col="ts",
        start="2024-01-02 06:00:00", end="2024-01-02 23:59:59", limit=100,
    )
    assert len(rows) == 18  # hours 06..23 of day one
    assert max(r["eid"] for r in rows) == 23
    # unparseable bound: prune skipped, filter semantics unchanged
    rows2 = app.log_range("d1", "ev", ts_col="ts", start="2024-01-02 06:00:00",
                          limit=100)
    assert len(rows2) == 42
