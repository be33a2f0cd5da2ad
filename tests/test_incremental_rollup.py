"""Incrementally-maintained rollups: delta refresh == full recompute."""

from pyspark.sql import functions as F

from bulker_spark.operators.incremental import incremental_rollup
from bulker_spark.sinks.warehouse import Warehouse


def _events(spark, start, n):
    return spark.range(start, start + n).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 3).cast("string").alias("etype"),
        (F.col("id") * 1.5).alias("value"),
    )


def _expected(wh):
    return {
        (r["etype"]): (r["n"], r["total"])
        for r in wh.read("ev")
        .groupBy("etype")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }


def _got(wh):
    return {
        (r["etype"]): (r["n"], r["total"])
        for r in wh.read("ev_rollup").collect()
    }


def test_initial_then_incremental(spark, tmp_warehouse):
    wh = Warehouse(spark, tmp_warehouse, retain_versions=5)
    wh.create_or_replace("ev", _events(spark, 0, 90))
    ru = incremental_rollup(
        wh, "ev", "ev_rollup", ["etype"], sums={"total": "value"}
    )
    assert ru.refresh()["mode"] == "initial"
    assert _got(wh) == _expected(wh)

    # two appended commits, one refresh
    wh.append("ev", _events(spark, 90, 30))
    wh.append("ev", _events(spark, 120, 31))
    assert ru.refresh()["mode"] == "incremental"
    assert _got(wh) == _expected(wh)

    # nothing new
    assert ru.refresh()["mode"] == "noop"


def test_state_survives_restart(spark, tmp_warehouse):
    wh = Warehouse(spark, tmp_warehouse, retain_versions=5)
    wh.create_or_replace("ev", _events(spark, 0, 50))
    incremental_rollup(
        wh, "ev", "ev_rollup", ["etype"], sums={"total": "value"}
    ).refresh()
    wh.append("ev", _events(spark, 50, 20))

    # fresh instance (a new process) resumes from persisted state
    ru2 = incremental_rollup(
        wh, "ev", "ev_rollup", ["etype"], sums={"total": "value"}
    )
    assert ru2.last_commit() is not None
    assert ru2.refresh()["mode"] == "incremental"
    assert _got(wh) == _expected(wh)


def test_rewrite_falls_back_to_rebuild(spark, tmp_warehouse):
    wh = Warehouse(spark, tmp_warehouse, retain_versions=5)
    wh.create_or_replace("ev", _events(spark, 0, 60))
    ru = incremental_rollup(
        wh, "ev", "ev_rollup", ["etype"], sums={"total": "value"}
    )
    ru.refresh()

    # replace rewrites every file: incremental read is undefined
    wh.create_or_replace("ev", _events(spark, 1000, 40))
    assert ru.refresh()["mode"] == "rebuild"
    assert _got(wh) == _expected(wh)


def test_new_group_appears_in_delta(spark, tmp_warehouse):
    wh = Warehouse(spark, tmp_warehouse, retain_versions=5)
    wh.create_or_replace("ev", _events(spark, 0, 30))
    ru = incremental_rollup(wh, "ev", "ev_rollup", ["etype"])
    ru.refresh()

    # a brand-new group key arrives only in the delta
    new = spark.createDataFrame(
        [(9999, "brand_new", 1.0)], "event_id long, etype string, value double"
    )
    wh.append("ev", new)
    assert ru.refresh()["mode"] == "incremental"
    got = {r["etype"]: r["n"] for r in wh.read("ev_rollup").collect()}
    assert got["brand_new"] == 1
    assert sum(got.values()) == 31


def _pk_events(spark, start, n):
    return spark.range(start, start + n).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 3).cast("string").alias("etype"),
        (F.col("id") * 1.5).alias("value"),
    )


def test_merge_rewrite_maintains_via_change_feed(spark, tmp_warehouse):
    """A merge (update + insert) no longer forces a rebuild: the change
    feed's signed deltas maintain the rollup exactly — update contributes
    post − pre, and the refresh equals a full recompute."""
    wh = Warehouse(spark, tmp_warehouse, retain_versions=5)
    wh.create_or_replace("ev", _pk_events(spark, 0, 60), pk=["event_id"])
    ru = incremental_rollup(
        wh, "ev", "ev_rollup", ["etype"], sums={"total": "value"}
    )
    ru.refresh()
    upd = spark.createDataFrame(
        [(3, "0", 999.0), (7777, "1", 5.5)],
        "event_id long, etype string, value double",
    )
    wh.merge("ev", upd, ["event_id"])  # one update, one insert
    wh.append("ev", _pk_events(spark, 8000, 10))  # and an append commit
    assert ru.refresh()["mode"] == "incremental_cdf"
    assert _got(wh) == _expected(wh)


def test_delete_empties_group_via_change_feed(spark, tmp_warehouse):
    """Deleting a group's last rows must remove its rollup row, exactly
    as a full recompute would."""
    wh = Warehouse(spark, tmp_warehouse, retain_versions=5)
    rows = spark.createDataFrame(
        [(1, "solo", 10.0), (2, "big", 1.0), (3, "big", 2.0)],
        "event_id long, etype string, value double",
    )
    wh.create_or_replace("ev", rows, pk=["event_id"])
    ru = incremental_rollup(
        wh, "ev", "ev_rollup", ["etype"], sums={"total": "value"}
    )
    ru.refresh()
    wh.delete_keys("ev", [1])
    assert ru.refresh()["mode"] == "incremental_cdf"
    assert _got(wh) == _expected(wh)
    assert "solo" not in _got(wh)


def test_mor_rewrite_still_rebuilds(spark, tmp_warehouse):
    """MoR upserts carry no preimage — signed maintenance is undefined,
    the refresh must take the rebuild path and stay correct."""
    wh = Warehouse(spark, tmp_warehouse, retain_versions=5)
    wh.create_or_replace(
        "ev", _pk_events(spark, 0, 30), pk=["event_id"], merge_on_read=True
    )
    ru = incremental_rollup(
        wh, "ev", "ev_rollup", ["etype"], sums={"total": "value"}
    )
    ru.refresh()
    upd = spark.createDataFrame(
        [(3, "0", 999.0)], "event_id long, etype string, value double"
    )
    wh.merge("ev", upd, ["event_id"])
    assert ru.refresh()["mode"] == "rebuild"
    assert _got(wh) == _expected(wh)
