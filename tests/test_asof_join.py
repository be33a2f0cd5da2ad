"""As-of join: result-equivalence against a naive range-join + argmax,
plus direction, tolerance, ties, and unmatched-row behavior."""

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from bulker_spark.operators.asof import asof_join

T0 = dt.datetime(2024, 1, 1)


def _ts(h):
    return T0 + dt.timedelta(hours=h)


@pytest.fixture(scope="module")
def rand_sides(spark):
    """Random facts/dims over few keys so every shape occurs: matches,
    no-match, equal timestamps, multiple dims per key."""
    rng = random.Random(7)
    facts = [
        (i, rng.randrange(6), _ts(rng.randrange(100)))
        for i in range(200)
    ]
    dims = [
        (j, rng.randrange(6), _ts(rng.randrange(100)), float(j))
        for j in range(60)
    ]
    left = spark.createDataFrame(facts, "fid long, k long, ts timestamp")
    right = spark.createDataFrame(
        dims, "did long, k long, rts timestamp, val double"
    )
    return left, right


def _naive(left, right, direction):
    """Range join + row_number argmax — the O(n·m)-per-key plan we avoid,
    used here only as the semantic oracle."""
    from pyspark.sql import Window as W

    cmp = (
        F.col("r.rts") <= F.col("l.ts")
        if direction == "backward"
        else F.col("r.rts") >= F.col("l.ts")
    )
    ordcol = (
        F.col("rts").desc() if direction == "backward" else F.col("rts").asc()
    )
    joined = left.alias("l").join(
        right.alias("r"), (F.col("l.k") == F.col("r.k")) & cmp, "left"
    )
    w = W.partitionBy("fid").orderBy(ordcol, F.col("did").desc_nulls_last())
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("fid", F.col("l.k").alias("k"), "ts", "rts", "did", "val")
    )


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_matches_naive_range_join(spark, rand_sides, direction):
    left, right = rand_sides
    got = asof_join(
        left,
        right,
        left_on="k",
        right_on="k",
        left_ts="ts",
        right_ts="rts",
        direction=direction,
        tiebreak="did",
    ).select("fid", "k", "ts", "rts", "did", "val")
    want = _naive(left, right, direction)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_unmatched_rows_kept_with_nulls(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(5)), (2, 99, _ts(5))], "fid long, k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(10, _ts(1), 1.0)], "k long, rts timestamp, val double"
    )
    out = asof_join(
        left, right, left_on="k", right_on="k", left_ts="ts", right_ts="rts"
    ).collect()
    by_fid = {r["fid"]: r for r in out}
    assert by_fid[1]["val"] == 1.0
    assert by_fid[2]["val"] is None and by_fid[2]["rts"] is None


def test_inclusive_and_tie_on_equal_ts(spark):
    left = spark.createDataFrame([(1, 0, _ts(5))], "fid long, k long, ts timestamp")
    right = spark.createDataFrame(
        [(7, 0, _ts(5), 7.0), (9, 0, _ts(5), 9.0), (3, 0, _ts(4), 3.0)],
        "did long, k long, rts timestamp, val double",
    )
    row = asof_join(
        left,
        right,
        left_on="k",
        right_on="k",
        left_ts="ts",
        right_ts="rts",
        tiebreak="did",
    ).collect()[0]
    # equal-timestamp rows ARE eligible (inclusive); greatest tiebreak wins
    assert row["did"] == 9


def test_tolerance_nulls_stale_matches(spark):
    left = spark.createDataFrame(
        [(1, 0, _ts(50)), (2, 0, _ts(5))], "fid long, k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(0, _ts(1), 1.0)], "k long, rts timestamp, val double"
    )
    out = asof_join(
        left,
        right,
        left_on="k",
        right_on="k",
        left_ts="ts",
        right_ts="rts",
        tolerance=F.expr("INTERVAL 10 HOURS"),
    ).collect()
    by_fid = {r["fid"]: r for r in out}
    assert by_fid[1]["val"] is None  # 49h gap > 10h tolerance
    assert by_fid[2]["val"] == 1.0  # 4h gap within tolerance


def test_suffix_renames_payload(spark):
    left = spark.createDataFrame([(1, 0, _ts(5))], "fid long, k long, ts timestamp")
    right = spark.createDataFrame(
        [(0, _ts(1), 1.0)], "k long, rts timestamp, val double"
    )
    out = asof_join(
        left,
        right,
        left_on="k",
        right_on="k",
        left_ts="ts",
        right_ts="rts",
        suffix="_dim",
    )
    assert "val_dim" in out.columns and "rts_dim" in out.columns


def test_no_pair_blowup_plan(spark, rand_sides):
    """The point of the union-and-carry shape: the range predicate must
    never execute as a pair-emitting join — no nested-loop/cartesian
    node anywhere. Since the round-7 hot-key-proofing the carry is the
    bucketed two-phase pass, so the plan legitimately contains ONE slim
    EQUI-join (per-bucket summaries back onto the stream, a few rows
    per key-day) and a bounded number of hash exchanges — but the
    pair-explosion shapes stay banned, and no exchange may carry a
    theta/range condition."""
    left, right = rand_sides
    plan = (
        asof_join(
            left,
            right,
            left_on="k",
            right_on="k",
            left_ts="ts",
            right_ts="rts",
            tiebreak="did",
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # union stream window + summary window + join-back: a handful of
    # hash exchanges, still no O(n*m) intermediate
    assert plan.count("Exchange hashpartitioning") <= 5
