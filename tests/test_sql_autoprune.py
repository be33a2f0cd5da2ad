"""Automatic manifest-stats pruning for Engine.sql (two-phase Catalyst
planning): phase-1 scan's typed pushed-down filters → per-table column
bounds → re-plan over pruned file manifests. Rows must be identical;
the pruned plan must schedule strictly fewer files when stats bite."""

import pytest
from pyspark.sql import functions as F

from bulker_spark.api import Engine


@pytest.fixture()
def eng(spark, tmp_path):
    return Engine(spark, str(tmp_path / "wh"), retain_versions=3)


def _clustered(spark, eng, name="t", n=10_000, files=8):
    """Files cover disjoint pk ranges (range-clustered) so min/max stats
    have something to bite on; ts tracks pk for timestamp pruning."""
    df = (
        spark.range(n)
        .select(
            F.col("id").alias("pk"),
            (F.col("id") % 7).alias("grp"),
            F.col("id").cast("double").alias("val"),
            F.concat(F.lit("u"), F.format_string("%06d", "id")).alias("name"),
            (
                F.lit("2021-01-01 00:00:00").cast("timestamp")
                + F.make_interval(secs=F.col("id"))
            ).alias("ts"),
        )
        .repartitionByRange(files, "pk")
        .sortWithinPartitions("pk")
    )
    eng.warehouse.create_or_replace(name, df, pk=["pk"])
    return df


def _files(df):
    return set(df.inputFiles())


def test_sql_range_prunes_files_same_rows(spark, eng):
    _clustered(spark, eng)
    full = eng.sql("select * from t where pk between 100 and 200", auto_prune=False)
    pruned = eng.sql("select * from t where pk between 100 and 200")
    assert len(_files(pruned)) < len(_files(full))
    assert sorted(r["pk"] for r in pruned.collect()) == list(range(100, 201))


def test_sql_prune_through_aggregate(spark, eng):
    _clustered(spark, eng)
    q = "select grp, count(*) c, sum(val) s from t where pk < 500 group by grp"
    full = eng.sql(q, auto_prune=False)
    pruned = eng.sql(q)
    assert len(_files(pruned)) < len(_files(full))
    assert sorted(map(tuple, pruned.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_sql_prune_join_both_sides(spark, eng):
    _clustered(spark, eng, "a")
    _clustered(spark, eng, "b")
    q = (
        "select a.pk, a.val, b.val from a join b on a.pk = b.pk "
        "where a.pk between 50 and 80 and b.pk between 50 and 80"
    )
    full = eng.sql(q, auto_prune=False)
    pruned = eng.sql(q)
    assert len(_files(pruned)) < len(_files(full))
    assert sorted(map(tuple, pruned.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_sql_timestamp_range_prunes(spark, eng):
    _clustered(spark, eng)
    q = (
        "select * from t where ts >= timestamp'2021-01-01 00:10:00' "
        "and ts < timestamp'2021-01-01 00:11:00'"
    )
    full = eng.sql(q, auto_prune=False)
    pruned = eng.sql(q)
    assert len(_files(pruned)) < len(_files(full))
    got = sorted(r["pk"] for r in pruned.collect())
    assert got == list(range(600, 660))


def test_sql_in_list_and_string_prefix(spark, eng):
    _clustered(spark, eng)
    q = "select * from t where pk in (42, 43, 44)"
    pruned = eng.sql(q)
    assert len(_files(pruned)) < 8
    assert sorted(r["pk"] for r in pruned.collect()) == [42, 43, 44]

    q2 = "select * from t where name like 'u00001%'"  # u000010..u000019
    full2 = eng.sql(q2, auto_prune=False)
    pruned2 = eng.sql(q2)
    assert len(_files(pruned2)) < len(_files(full2))
    assert sorted(r["pk"] for r in pruned2.collect()) == list(range(10, 20))


def test_sql_point_lookup_single_file(spark, eng):
    _clustered(spark, eng)
    pruned = eng.sql("select * from t where pk = 7777")
    assert len(_files(pruned)) == 1
    assert [r["pk"] for r in pruned.collect()] == [7777]


def test_sql_multi_scan_same_table_uses_hull(spark, eng):
    """A self-union's two scans carry different bounds; the hull admits
    the union of both ranges — never prunes a file either branch needs."""
    _clustered(spark, eng)
    q = (
        "select pk from t where pk between 10 and 20 "
        "union all select pk from t where pk between 9000 and 9010"
    )
    pruned = eng.sql(q)
    got = sorted(r["pk"] for r in pruned.collect())
    assert got == list(range(10, 21)) + list(range(9000, 9011))


def test_sql_unfiltered_scan_blocks_prune(spark, eng):
    """If one scan of a table has no filters, the table must not be
    pruned at all (that scan needs every file)."""
    _clustered(spark, eng)
    q = (
        "select pk from t where pk < 50 "
        "union all select pk from t"
    )
    full = eng.sql(q, auto_prune=False)
    pruned = eng.sql(q)
    assert pruned.count() == full.count() == 10_000 + 50


def test_sql_or_predicate_is_not_pruned_wrong(spark, eng):
    """OR disjunctions don't reach pushedDownFilters as bounds — the
    query must still return every matching row."""
    _clustered(spark, eng)
    q = "select pk from t where pk < 10 or pk > 9990"
    got = sorted(r["pk"] for r in eng.sql(q).collect())
    assert got == list(range(10)) + list(range(9991, 10000))


def test_sql_mor_table_falls_back_unpruned(spark, eng):
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(100)], "pk long, val string"
    )
    eng.warehouse.create_or_replace("m", df, pk=["pk"], merge_on_read=True)
    eng.warehouse.merge(
        "m",
        spark.createDataFrame([(5, "NEW")], "pk long, val string"),
        ["pk"],
    )
    got = {r["pk"]: r["val"] for r in eng.sql(
        "select * from m where pk between 0 and 10"
    ).collect()}
    assert got[5] == "NEW" and len(got) == 11


def test_sql_restores_full_views_after_pruned_query(spark, eng):
    _clustered(spark, eng)
    eng.sql("select * from t where pk = 1").collect()
    # a later direct spark.sql against the registered view sees ALL rows
    assert spark.sql("select count(*) c from t").collect()[0]["c"] == 10_000


def test_sql_prune_survives_update_and_time_travel_consistency(spark, eng):
    """Pruning must follow the CURRENT commit's stats: after a merge
    rewrites a slice, a pruned point-lookup sees the new value."""
    _clustered(spark, eng)
    eng.warehouse.merge(
        "t",
        spark.createDataFrame(
            [(150, 0, 1.5, "XX", None)],
            "pk long, grp long, val double, name string, ts timestamp",
        ),
        ["pk"],
    )
    got = eng.sql("select name from t where pk = 150").collect()
    assert [r["name"] for r in got] == ["XX"]


def test_timestamp_stats_recorded_micros(spark, eng):
    """Warehouse writes INT64 micros timestamps so ts columns carry
    usable footer stats (INT96 has none)."""
    _clustered(spark, eng)
    entry = eng.warehouse._read_log("t")[-1]
    some = next(iter(entry["file_stats"].values()))
    assert "ts" in some["cols"], "timestamp column must have min/max stats"
    lo, hi = some["cols"]["ts"]
    assert lo <= hi and "T" in lo


def test_bucketed_point_lookup_prunes_to_one_bucket(spark, eng):
    """Hash-bucketed files span the full key range (stats can't skip
    them), but a point bound on the bucket columns determines the one
    bucket dir — SQL point lookups on CDC-shaped tables read O(bucket)."""
    df = spark.createDataFrame(
        [(i, f"v{i}", float(i)) for i in range(2000)],
        "pk long, val string, score double",
    )
    eng.warehouse.create_or_replace(
        "bt", df, pk=["pk"], bucket_by=(["pk"], 16)
    )
    full = eng.sql("select * from bt", auto_prune=False)
    pruned = eng.sql("select * from bt where pk = 777")
    assert len(_files(pruned)) < len(_files(full))
    assert all("__bucket=" in f for f in _files(pruned))
    segs = {s for f in _files(pruned) for s in f.split("/") if "__bucket=" in s}
    assert len(segs) == 1  # exactly one bucket dir scanned
    assert [(r["pk"], r["val"]) for r in pruned.collect()] == [(777, "v777")]


def test_bucketed_range_is_not_bucket_pruned(spark, eng):
    """Hash order is unrelated to value order: a RANGE bound must not
    bucket-prune (it would drop matching rows in other buckets)."""
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(2000)], "pk long, score double"
    )
    eng.warehouse.create_or_replace(
        "br", df, pk=["pk"], bucket_by=(["pk"], 16)
    )
    got = sorted(
        r["pk"]
        for r in eng.sql("select pk from br where pk between 100 and 120").collect()
    )
    assert got == list(range(100, 121))


def test_bucket_prune_direct_read_api(spark, eng):
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(1000)], "pk long, val string"
    )
    eng.warehouse.create_or_replace(
        "bd", df, pk=["pk"], bucket_by=(["pk"], 8)
    )
    pruned = eng.warehouse.read("bd", prune={"pk": (42, 42)})
    assert len(pruned.inputFiles()) < len(eng.warehouse.read("bd").inputFiles())
    assert [r["val"] for r in pruned.filter("pk = 42").collect()] == ["v42"]


def test_concurrent_sql_never_sees_pruned_views(spark, eng):
    """The phase-2 pruned views live in an isolated session: concurrent
    queries on the shared session must ALWAYS see full tables, even
    while pruned re-planning is in flight."""
    import threading

    _clustered(spark, eng)
    # register the shared-session view before racing (the main-session
    # registration itself is phase 1's documented side effect)
    eng.sql("select 1 from t limit 1").collect()
    errors = []

    def pruned_loop():
        try:
            for _ in range(8):
                got = eng.sql("select count(*) c from t where pk = 7777")
                assert got.collect()[0]["c"] == 1
        except Exception as ex:  # noqa: BLE001
            errors.append(ex)

    def full_loop():
        try:
            for _ in range(8):
                n = spark.sql("select count(*) c from t").collect()[0]["c"]
                assert n == 10_000, f"saw pruned view: {n}"
        except Exception as ex:  # noqa: BLE001
            errors.append(ex)

    threads = [threading.Thread(target=pruned_loop) for _ in range(2)] + [
        threading.Thread(target=full_loop) for _ in range(2)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors


def test_sql_phase2_pinned_to_phase1_snapshot(spark, eng, monkeypatch):
    """A write landing between phase-1 registration and phase-2 rebind
    must NOT leak into the returned plan: both phases read one snapshot
    (ADVICE r03). The race is simulated by appending from inside
    prune_specs — exactly the window the old code rebound live in."""
    import bulker_spark.api as api_mod
    from bulker_spark.plans.sql_prune import prune_specs as real_specs

    _clustered(spark, eng)
    bomb = spark.createDataFrame([(150, 0, 0.0, "intruder", None)],
                                 eng.warehouse.read("t").schema[:5])

    fired = {}

    def racing_specs(df, dirs):
        specs = real_specs(df, dirs)
        if not fired:
            fired["yes"] = True
            eng.warehouse.append("t", bomb)
        return specs

    monkeypatch.setattr(api_mod, "prune_specs", None, raising=False)
    import bulker_spark.plans.sql_prune as sp_mod

    monkeypatch.setattr(sp_mod, "prune_specs", racing_specs)
    out = eng.sql("select * from t where pk between 100 and 200")
    got = sorted(r["pk"] for r in out.collect())
    assert got == list(range(100, 201)), "intruder row leaked into phase 2"
    assert fired, "race did not fire — test is vacuous"
    # and the NEXT query (fresh registration) does see the append
    out2 = eng.sql("select * from t where pk between 100 and 200")
    assert sorted(r["pk"] for r in out2.collect()).count(150) == 2
