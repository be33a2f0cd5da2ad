"""Profiling, declarative checks, and count-min sketch tiers."""

from pyspark.sql import functions as F

from bulker_spark.functions.profile import (
    accepted_values,
    expression,
    non_null,
    profile,
    run_checks,
    unique,
)
from bulker_spark.functions.sketches import count_min_lookup, count_min_sketch
from bulker_spark.plans import audit

SF = "/root/testdata/sf0.001"


def _df(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", None), (2, None, 30.0), (4, "b", 40.0)],
        "id long, cat string, amt double",
    )


def test_profile_values(spark):
    rows = {r["column"]: r for r in profile(_df(spark)).collect()}
    assert rows["id"]["n_rows"] == 4
    assert rows["id"]["n_nulls"] == 0
    assert rows["id"]["n_distinct"] == 3
    assert rows["cat"]["n_nulls"] == 1
    assert rows["cat"]["n_distinct"] == 2
    assert rows["amt"]["null_frac"] == 0.25


def test_profile_single_scan(spark):
    df = profile(_df(spark))
    # all columns profiled in ONE pass: one source scan in the plan
    assert audit.explain_str(df, "simple").count("LocalTableScan") <= 1
    ev = profile(
        _df(spark).sparkSession.read.parquet(f"{SF}/events.parquet")
    )
    assert len(audit.read_schemas(ev)) == 1, audit.read_schemas(ev)


def test_profile_approx_mode(spark):
    rows = {
        r["column"]: r
        for r in profile(_df(spark), approx_distinct=True).collect()
    }
    # HLL++ is exact at these cardinalities
    assert rows["id"]["n_distinct"] == 3


def test_checks_detect_violations(spark):
    out = run_checks(
        _df(spark),
        [
            unique("id"),
            non_null("cat"),
            accepted_values("cat", ["a"]),
            expression("amt IS NULL OR amt < 35", "amt_below_35"),
        ],
    ).collect()
    got = {r["check"]: (r["violations"], r["passed"]) for r in out}
    assert got["id_unique"] == (1, False)  # id=2 twice
    assert got["cat_not_null"] == (1, False)
    assert got["cat_accepted"] == (2, False)  # 'b' + NULL
    assert got["amt_below_35"] == (1, False)  # 40.0


def test_checks_all_pass_lazy(spark):
    df = run_checks(_df(spark), [unique("id", name="u"), non_null("id")])
    # lazy: still a plan, single scan
    assert audit.explain_str(df, "simple").count("LocalTableScan") <= 1


def test_cms_upper_bound_and_accuracy(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    n = ev.count()
    cms = count_min_sketch(ev, "user_id", width=512, depth=2)
    # sketch is bounded by depth x width cells
    assert cms.count() <= 2 * 512
    probes = ev.filter(F.col("user_id") < 20).select("user_id").distinct()
    est = {
        r["user_id"]: r["est_count"]
        for r in count_min_lookup(cms, probes, "user_id", width=512, depth=2).collect()
    }
    true = {
        r["user_id"]: r["cnt"]
        for r in ev.filter(F.col("user_id") < 20)
        .groupBy("user_id")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert set(est) == set(true)
    for k, t in true.items():
        # count-min never undercounts; overcount stays near eps*N
        assert est[k] >= t, (k, est[k], t)
        assert est[k] - t <= max(10, 8 * n // 512), (k, est[k], t, n)


# ------------------- engine quality gate (expectations) -------------------

def _batch():
    return [
        '{"id": 1, "status": "ok", "amt": 5.0}',
        '{"id": 2, "status": "bad_value", "amt": 7.0}',
        '{"id": 3, "status": "ok", "amt": -1.0}',
    ]


def test_expectations_fail_policy(spark, tmp_warehouse):
    import pytest

    from bulker_spark import Engine

    e = Engine(spark, tmp_warehouse)
    with pytest.raises(ValueError, match="quality expectations failed"):
        e.bulk_load(
            "t", _batch(), mode="batch",
            expectations=[accepted_values("status", ["ok"])],
        )
    # nothing committed
    assert not e.warehouse.exists("t")


def test_expectations_drop_policy(spark, tmp_warehouse):
    from bulker_spark import Engine

    e = Engine(spark, tmp_warehouse)
    res = e.bulk_load(
        "t", _batch(), mode="batch",
        expectations=[
            accepted_values("status", ["ok"]),
            expression("amt > 0", "amt_positive"),
        ],
        expectations_policy="drop",
    )
    assert res.rejected_rows == 2
    assert res.successful_rows == 1
    assert res.processed_rows == 3
    assert e.warehouse.count("t") == 1


def test_expectations_warn_policy(spark, tmp_warehouse):
    from bulker_spark import Engine

    e = Engine(spark, tmp_warehouse)
    res = e.bulk_load(
        "t", _batch(), mode="batch",
        expectations=[accepted_values("status", ["ok"])],
        expectations_policy="warn",
    )
    assert res.successful_rows == 3  # loaded anyway
    assert res.warehouse_state["check_status_accepted_violations"] == 1.0


def test_expectations_pass_clean_batch(spark, tmp_warehouse):
    from bulker_spark import Engine

    e = Engine(spark, tmp_warehouse)
    res = e.bulk_load(
        "t", ['{"id": 1, "status": "ok"}'], mode="batch",
        expectations=[unique("id"), non_null("status")],
    )
    assert res.successful_rows == 1


def test_expectations_through_streaming_front(spark, tmp_warehouse):
    """drop policy rides the foreachBatch front: violating rows are
    filtered per micro-batch, clean rows commit."""
    import json as _json
    import os
    import shutil
    import tempfile

    from bulker_spark import Engine, StreamOptions
    from bulker_spark.streaming.ingest_stream import (
        IngestStream,
        json_file_stream,
    )

    src = tempfile.mkdtemp(prefix="exp_src_")
    ckpt = tempfile.mkdtemp(prefix="exp_ckpt_")
    try:
        with open(os.path.join(src, "b.ndjson"), "w") as fh:
            fh.write(_json.dumps({"id": 1, "status": "ok"}) + "\n")
            fh.write(_json.dumps({"id": 2, "status": "junk"}) + "\n")
        e = Engine(spark, tmp_warehouse)
        stream = IngestStream(
            e,
            "gated",
            StreamOptions(
                mode="batch",
                expectations=[accepted_values("status", ["ok"])],
                expectations_policy="drop",
            ),
        )
        q = stream.start(json_file_stream(spark, src), ckpt)
        q.awaitTermination(120)
        rows = [r["status"] for r in e.warehouse.read("gated").collect()]
        assert rows == ["ok"]
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
