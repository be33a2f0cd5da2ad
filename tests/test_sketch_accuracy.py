"""Sketch-tier queries have no SQL oracle (estimates are engine-specific),
so their correctness gate lives here: error vs the exact query, bounded."""

import pytest

from bulker_spark.plans.analytics import (
    doc_length_quantiles_sketch,
    events_daily_uniques,
    events_daily_uniques_hll,
)
from bulker_spark.plans.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_hll_uniques_within_rsd(spark):
    exact = {r["day"]: r["uniques"] for r in events_daily_uniques(spark, SF_DIR).collect()}
    est = {r["day"]: r["uniques_est"] for r in events_daily_uniques_hll(spark, SF_DIR).collect()}
    assert set(exact) == set(est)
    for day, n in exact.items():
        assert abs(est[day] - n) <= max(3, 0.1 * n), (day, n, est[day])


def test_quantile_sketch_rank_error(spark):
    """percentile_approx(accuracy=1e4) ⇒ rank error ≤ 1/1e4; on small data
    the estimate must be an actual data value near the true quantile."""
    from bulker_spark.functions.text import token_count
    from pyspark.sql import functions as F

    docs = QUERIES["doc_token_stats"]  # ensures the table loads the same way
    est = {r["lang"]: r for r in doc_length_quantiles_sketch(spark, SF_DIR).collect()}
    from bulker_spark.plans.analytics import _t

    toks = (
        _t(spark, SF_DIR, "documents")
        .select("lang", token_count("text").alias("toks"))
        .collect()
    )
    by_lang = {}
    for r in toks:
        by_lang.setdefault(r["lang"], []).append(r["toks"])
    for lang, vals in by_lang.items():
        vals.sort()
        n = len(vals)
        for q, col in [(0.5, "p50_est"), (0.9, "p90_est"), (0.99, "p99_est")]:
            # allow ±1 rank of slack on top of the sketch's own bound
            lo = vals[max(0, int(q * n) - 2)]
            hi = vals[min(n - 1, int(q * n) + 2)]
            assert lo <= est[lang][col] <= hi, (lang, q, est[lang][col], lo, hi)


def test_sketch_plans_are_single_shuffle(spark):
    for fn in (events_daily_uniques_hll,):
        plan = (
            fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("Exchange hashpartitioning") <= 1
        assert "partial_approx_count_distinct" in plan  # map-side partial
