"""SCD Type-2 dimension maintenance: close-on-change, carry, insert,
as-of snapshots, idempotent replay."""

import datetime as dt

from pyspark.sql import functions as F

from bulker_spark.operators.scd2 import (
    IS_CURRENT,
    VALID_FROM,
    VALID_TO,
    scd2_apply,
    scd2_as_of,
    scd2_current,
    scd2_init,
)

T0 = dt.datetime(2024, 1, 1)
T1 = dt.datetime(2024, 2, 1)
T2 = dt.datetime(2024, 3, 1)


def _snap(spark, rows):
    return spark.createDataFrame(rows, "id long, city string, tier string")


def test_init_all_current(spark):
    dim = scd2_init(_snap(spark, [(1, "nyc", "gold"), (2, "sf", "silver")]), ["id"], T0)
    rows = {r["id"]: r for r in dim.collect()}
    assert len(rows) == 2
    assert all(r[IS_CURRENT] and r[VALID_TO] is None for r in rows.values())
    assert rows[1][VALID_FROM] == T0


def test_change_closes_and_opens(spark):
    dim = scd2_init(_snap(spark, [(1, "nyc", "gold"), (2, "sf", "silver")]), ["id"], T0)
    dim2 = scd2_apply(
        dim,
        _snap(spark, [(1, "boston", "gold"), (2, "sf", "silver"), (3, "la", "bronze")]),
        ["id"], ["city", "tier"], T1,
    )
    rows = sorted(dim2.collect(), key=lambda r: (r["id"], r[VALID_FROM]))
    by_id = {}
    for r in rows:
        by_id.setdefault(r["id"], []).append(r)
    # id=1 changed: closed old + open new
    assert [(r["city"], r[IS_CURRENT], r[VALID_TO]) for r in by_id[1]] == [
        ("nyc", False, T1),
        ("boston", True, None),
    ]
    # id=2 unchanged: single untouched version
    assert [(r["city"], r[IS_CURRENT], r[VALID_FROM]) for r in by_id[2]] == [
        ("sf", True, T0)
    ]
    # id=3 new key
    assert [(r["city"], r[VALID_FROM]) for r in by_id[3]] == [("la", T1)]


def test_absent_key_is_carried_not_deleted(spark):
    dim = scd2_init(_snap(spark, [(1, "nyc", "gold"), (2, "sf", "silver")]), ["id"], T0)
    dim2 = scd2_apply(dim, _snap(spark, [(1, "nyc", "gold")]), ["id"], ["city", "tier"], T1)
    assert scd2_current(dim2).count() == 2


def test_idempotent_replay(spark):
    dim = scd2_init(_snap(spark, [(1, "nyc", "gold")]), ["id"], T0)
    batch = _snap(spark, [(1, "boston", "gold")])
    once = scd2_apply(dim, batch, ["id"], ["city", "tier"], T1)
    twice = scd2_apply(once, batch, ["id"], ["city", "tier"], T1)
    a = sorted(map(tuple, once.collect()))
    b = sorted(map(tuple, twice.collect()))
    assert a == b


def test_as_of_snapshots(spark):
    dim = scd2_init(_snap(spark, [(1, "nyc", "gold")]), ["id"], T0)
    dim = scd2_apply(dim, _snap(spark, [(1, "boston", "gold")]), ["id"], ["city", "tier"], T1)
    dim = scd2_apply(dim, _snap(spark, [(1, "austin", "gold")]), ["id"], ["city", "tier"], T2)
    assert dim.count() == 3

    def city_at(ts):
        return scd2_as_of(dim, ts).collect()[0]["city"]

    assert city_at(dt.datetime(2024, 1, 15)) == "nyc"
    assert city_at(dt.datetime(2024, 2, 15)) == "boston"
    assert city_at(dt.datetime(2024, 3, 15)) == "austin"
    # before the first version: empty
    assert scd2_as_of(dim, dt.datetime(2023, 12, 1)).count() == 0
    assert scd2_current(dim).collect()[0]["city"] == "austin"


def test_null_safe_change_detection(spark):
    dim = scd2_init(
        spark.createDataFrame([(1, None, "gold")], "id long, city string, tier string"),
        ["id"], T0,
    )
    # null -> null is NOT a change
    same = scd2_apply(
        dim,
        spark.createDataFrame([(1, None, "gold")], "id long, city string, tier string"),
        ["id"], ["city", "tier"], T1,
    )
    assert same.count() == 1
    # null -> value IS a change
    diff = scd2_apply(
        dim,
        spark.createDataFrame([(1, "nyc", "gold")], "id long, city string, tier string"),
        ["id"], ["city", "tier"], T1,
    )
    assert diff.count() == 2


def test_per_row_effective_column(spark):
    batch = spark.createDataFrame(
        [(1, "nyc", "gold", dt.datetime(2024, 5, 2))],
        "id long, city string, tier string, updated_at timestamp",
    )
    dim = scd2_init(batch.select("id", "city", "tier", "updated_at"), ["id"], "updated_at")
    r = dim.collect()[0]
    assert r[VALID_FROM] == dt.datetime(2024, 5, 2)


def test_catalog_query_runs(spark):
    from bulker_spark.plans.analytics2 import customer_priority_scd2

    out = customer_priority_scd2(spark, "/root/testdata/sf0.001")
    rows = out.filter(F.col("custkey") == out.select("custkey").first()[0])
    versions = sorted(
        rows.collect(), key=lambda r: r["version"]
    )
    # intervals chain: valid_to of version i == valid_from of version i+1
    for a, b in zip(versions, versions[1:]):
        assert a["valid_to"] == b["valid_from"]
    assert versions[-1]["valid_to"] is None


# -------------------------- engine-mode wiring ---------------------------

def _load(engine, rows, eff, **kw):
    import json

    events = [json.dumps(r) for r in rows]
    return engine.bulk_load(
        "dim_users", events, mode="scd2", primary_key=["id"],
        frozen_now=eff, **kw,
    )


def test_engine_scd2_mode_end_to_end(spark, tmp_warehouse):
    from bulker_spark import Engine
    from bulker_spark.operators.scd2 import scd2_as_of, scd2_current

    e = Engine(spark, tmp_warehouse)
    r1 = _load(e, [{"id": 1, "city": "nyc"}, {"id": 2, "city": "sf"}], T0)
    assert r1.successful_rows == 2
    assert "scd2_ms" in r1.warehouse_state

    _load(e, [{"id": 1, "city": "boston"}, {"id": 3, "city": "la"}], T1)
    dim = e.warehouse.read("dim_users")
    assert dim.count() == 4  # closed nyc + boston + sf + la
    cur = {r["id"]: r["city"] for r in scd2_current(dim).collect()}
    assert cur == {1: "boston", 2: "sf", 3: "la"}
    asof = {r["id"]: r["city"] for r in scd2_as_of(dim, dt.datetime(2024, 1, 15)).collect()}
    assert asof == {1: "nyc", 2: "sf"}
    # partitioned by the current flag so live reads prune
    assert "__is_current" in (e.warehouse.get_meta("dim_users").partition_by or [])


def test_engine_scd2_replay_is_noop(spark, tmp_warehouse):
    from bulker_spark import Engine

    e = Engine(spark, tmp_warehouse)
    batch = [{"id": 1, "city": "nyc"}]
    _load(e, batch, T0)
    _load(e, batch, T1)  # unchanged attributes: no new version
    assert e.warehouse.read("dim_users").count() == 1


def test_engine_scd2_schema_evolution(spark, tmp_warehouse):
    from bulker_spark import Engine
    from bulker_spark.operators.scd2 import scd2_current

    e = Engine(spark, tmp_warehouse)
    _load(e, [{"id": 1, "city": "nyc"}], T0)
    # new attribute appears: column appended, change detection sees it
    _load(e, [{"id": 1, "city": "nyc", "tier": "gold"}], T1)
    dim = e.warehouse.read("dim_users")
    assert "tier" in dim.columns
    assert dim.count() == 2  # tier None -> gold is a tracked change
    cur = scd2_current(dim).collect()[0]
    assert cur["tier"] == "gold" and cur["city"] == "nyc"


def test_engine_scd2_effective_from_timestamp_column(spark, tmp_warehouse):
    from bulker_spark import Engine
    from bulker_spark.operators.scd2 import VALID_FROM

    e = Engine(spark, tmp_warehouse)
    e.bulk_load(
        "dim_users",
        ['{"id": 1, "city": "nyc", "updated_at": "2024-05-02T00:00:00"}'],
        mode="scd2", primary_key=["id"], timestamp_column="updated_at",
    )
    r = e.warehouse.read("dim_users").collect()[0]
    assert r[VALID_FROM] == dt.datetime(2024, 5, 2)
