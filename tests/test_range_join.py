"""Banded interval join: equivalence vs the naive range predicate, edge
exclusivity, long intervals, left-join complement, and the plan guarantee
(equi-join, no nested loop)."""

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from bulker_spark.operators.rangejoin import interval_join

T0 = dt.datetime(2024, 1, 1)


def _ts(h):
    return T0 + dt.timedelta(hours=float(h))


@pytest.fixture(scope="module")
def sides(spark):
    rng = random.Random(11)
    pts = [(i, rng.randrange(6), _ts(rng.uniform(0, 500))) for i in range(300)]
    ivs = []
    for j in range(40):
        s = rng.uniform(0, 480)
        ivs.append((j, rng.randrange(6), _ts(s), _ts(s + rng.uniform(1, 20))))
    left = spark.createDataFrame(pts, "pid long, k long, ts timestamp")
    right = spark.createDataFrame(
        ivs, "iid long, k long, s timestamp, e timestamp"
    )
    return left, right


def _naive(left, right, keyed):
    cond = (F.col("l.ts") >= F.col("r.s")) & (F.col("l.ts") < F.col("r.e"))
    if keyed:
        cond = cond & (F.col("l.k") == F.col("r.k"))
    return (
        left.alias("l")
        .join(right.alias("r"), cond)
        .select(F.col("l.pid"), F.col("r.iid"))
    )


@pytest.mark.parametrize("keyed", [True, False])
def test_matches_naive(spark, sides, keyed):
    left, right = sides
    got = interval_join(
        left,
        right,
        point="ts",
        start="s",
        end="e",
        left_keys=["k"] if keyed else None,
        right_keys=["k"] if keyed else None,
        bin_seconds=20 * 3600,  # ≥ max interval length
    ).select("pid", "iid")
    want = _naive(left, right, keyed)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_interval_longer_than_bin_still_exact(spark, sides):
    """fan-out grows past 2 bins but results stay exact."""
    left, right = sides
    got = interval_join(
        left, right, point="ts", start="s", end="e", bin_seconds=3600
    ).select("pid", "iid")
    want = _naive(left, right, keyed=False)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_end_exclusive_and_start_inclusive(spark):
    left = spark.createDataFrame(
        [(1, _ts(0)), (2, _ts(10))], "pid long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, _ts(0), _ts(10))], "iid long, s timestamp, e timestamp"
    )
    got = interval_join(
        left, right, point="ts", start="s", end="e", bin_seconds=36000
    ).select("pid").collect()
    assert [r["pid"] for r in got] == [1]  # start in, end out


def test_interval_ending_on_bin_edge_not_duplicated(spark):
    """end == bin boundary: exclusive end must not emit into that bin."""
    W = 3600
    left = spark.createDataFrame([(1, _ts(0.5))], "pid long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(0), _ts(1))], "iid long, s timestamp, e timestamp"
    )
    got = interval_join(
        left, right, point="ts", start="s", end="e", bin_seconds=W
    ).count()
    assert got == 1


def test_left_join_keeps_unmatched(spark):
    left = spark.createDataFrame(
        [(1, _ts(5)), (2, _ts(100)), (3, None)],
        "pid long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(7, _ts(0), _ts(10))], "iid long, s timestamp, e timestamp"
    )
    out = interval_join(
        left, right, point="ts", start="s", end="e",
        bin_seconds=36000, how="left",
    ).collect()
    by_pid = {r["pid"]: r for r in out}
    assert len(out) == 3
    assert by_pid[1]["iid"] == 7
    assert by_pid[2]["iid"] is None
    assert by_pid[3]["iid"] is None  # null point survives the left join


def test_plan_is_equi_join(spark, sides):
    left, right = sides
    plan = (
        interval_join(
            left, right, point="ts", start="s", end="e", bin_seconds=20 * 3600
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan
