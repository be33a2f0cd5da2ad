"""WhenConditions, warehouse DELETE, and time-partitioned tables."""

import datetime as dt

from bulker_spark import Engine
from bulker_spark.operators.filters import (
    WhenCondition,
    WhenConditions,
    partition_id_condition,
    truncate_granularity,
)


def test_when_conditions_column(spark):
    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", 5), (3, "a", 7)], "id long, g string, x long"
    )
    wc = WhenConditions().add("g", "=", "a").add("x", "is not null")
    assert [r["id"] for r in df.filter(wc.to_column()).collect()] == [3]
    wc_or = WhenConditions(join_with="or").add("id", "=", 1).add("x", ">", 6)
    assert {r["id"] for r in df.filter(wc_or.to_column()).collect()} == {1, 3}


def test_when_conditions_sql():
    wc = WhenConditions().add("a", "=", 1).add("b", "is null")
    sql, params = wc.to_sql()
    assert sql == '"a" = ? AND "b" IS NULL'
    assert params == [1]
    pid = partition_id_condition("p1")
    assert pid.to_sql()[0] == '"__partition_id" = ?'


def test_warehouse_delete(spark, tmp_warehouse):
    e = Engine(spark, tmp_warehouse)
    e.bulk_load("t", [{"id": i, "g": "x" if i % 2 else "y"} for i in range(10)],
                mode="batch")
    n = e.warehouse.delete("t", WhenConditions().add("g", "=", "x"))
    assert n == 5
    assert e.warehouse.count("t") == 5
    assert {r["g"] for r in e.warehouse.read("t").collect()} == {"y"}


def test_time_partitioned_table(spark, tmp_warehouse):
    e = Engine(spark, tmp_warehouse)
    events = [
        {"id": 1, "_timestamp": "2024-01-05T10:00:00Z"},
        {"id": 2, "_timestamp": "2024-02-10T10:00:00Z"},
        {"id": 3, "_timestamp": "2024-02-20T10:00:00Z"},
    ]
    e.bulk_load(
        "tp",
        events,
        mode="batch",
        timestamp_column="_timestamp",
        timestamp_partition="MONTH",
    )
    meta = e.warehouse.get_meta("tp")
    assert meta.partition_by == ["__ts_partition"]
    df = e.warehouse.read("tp")
    parts = {str(r["__ts_partition"]) for r in df.collect()}
    assert parts == {"2024-01", "2024-02"}
    # merge into the partitioned table keeps partitioning
    e.bulk_load(
        "tp",
        [{"id": 3, "_timestamp": "2024-02-20T10:00:00Z", "v": 9}],
        mode="batch",
        primary_key=["id"],
        deduplicate=True,
        timestamp_column="_timestamp",
        timestamp_partition="MONTH",
        frozen_now=dt.datetime(2024, 2, 21),
    )
    assert e.warehouse.count("tp") == 3
    assert e.warehouse.get_meta("tp").partition_by == ["__ts_partition"]


def test_truncate_granularity(spark):
    df = spark.createDataFrame(
        [(dt.datetime(2024, 5, 17, 13, 45),)], "ts timestamp"
    )
    out = df.select(
        truncate_granularity("ts", "MONTH").alias("m"),
        truncate_granularity("ts", "YEAR").alias("y"),
        truncate_granularity("ts", "HOUR").alias("h"),
    ).first()
    assert out["m"] == dt.datetime(2024, 5, 1)
    assert out["y"] == dt.datetime(2024, 1, 1)
    assert out["h"] == dt.datetime(2024, 5, 17, 13)


def test_salted_join_matches_plain_join(spark):
    """Salting must not change join results — every (key,salt) bucket of
    the big side finds its replicated small row."""
    from bulker_spark.operators.skew import salted_join

    # skewed big side: 90% of rows share key 7
    big = spark.range(2000).selectExpr(
        "case when id % 10 < 9 then 7 else id % 100 end as k", "id as v"
    )
    small = spark.range(100).selectExpr("id as k", "concat('dim', id) as name")
    plain = big.join(small, on=["k"]).groupBy("k").count()
    salted = salted_join(big, small, on=["k"], n_salts=8).groupBy("k").count()
    assert sorted(plain.collect()) == sorted(salted.collect())


def test_salted_left_join_keeps_unmatched(spark):
    from bulker_spark.operators.skew import salted_join

    big = spark.createDataFrame([(1, "a"), (99, "b")], ["k", "v"])
    small = spark.createDataFrame([(1, "dim")], ["k", "name"])
    rows = {r["k"]: r["name"] for r in salted_join(big, small, ["k"], how="left").collect()}
    assert rows == {1: "dim", 99: None}


def test_partition_matcher_handles_hive_spellings():
    """The rewrite-exclusion matcher must speak Spark's partition-dir
    dialect: NULL → __HIVE_DEFAULT_PARTITION__, booleans lowercase,
    specials percent-escaped — a miss here links stale files into the
    replaced partition."""
    from bulker_spark.sinks.warehouse import Warehouse

    m = Warehouse._partition_matcher("p", {None, True, "a b", "p1"})
    assert m("p=__HIVE_DEFAULT_PARTITION__/part-0.parquet")
    assert m("p=true/part-0.parquet")
    assert m("p=a b/part-0.parquet")
    assert m("p=a%20b/part-0.parquet")
    assert m("day=2024/p=p1/part-0.parquet")  # nested level
    assert not m("p=false/part-0.parquet")
    assert not m("q=p1/part-0.parquet")  # other column
    assert not m("p=p10/part-0.parquet")  # exact value, not prefix
