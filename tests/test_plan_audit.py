"""Plan audits: the scale properties each headline query must keep.

A failure here means a 100 TB regression (lost pushdown, broadcast turned
into a shuffle join, an extra exchange), even if results are still correct.
"""

import pytest

from bulker_spark.plans import audit
from bulker_spark.plans.queries import (
    QUERIES,
    dedup_last_wins,
    doc_exact_dedup,
    doc_token_stats,
    flatten_json_events,
    tpch_q1,
    tpch_q3,
    tpch_q5,
    tpch_q6,
)

SF = "/root/testdata/sf0.001"


def test_q1_pushdown_and_pruning(spark):
    df = tpch_q1(spark, SF)
    # shipdate filter reaches the parquet scan
    assert audit.has_pushed_filter(df, "l_shipdate"), audit.pushed_filters(df)
    # only the 7 needed columns of 11 are read
    assert audit.pruned_to(df, 7), audit.read_schemas(df)


def test_q6_pushdown(spark):
    df = tpch_q6(spark, SF)
    filters = " ".join(audit.pushed_filters(df))
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in filters, filters
    assert audit.pruned_to(df, 4), audit.read_schemas(df)


def test_q3_broadcasts_customer(spark):
    df = tpch_q3(spark, SF)
    assert audit.broadcast_join_count(df) >= 1, audit.explain_str(df, "simple")
    assert audit.has_pushed_filter(df, "c_mktsegment")


def test_q5_join_strategy(spark):
    df = tpch_q5(spark, SF)
    rep = audit.audit_report(df)
    assert rep["broadcast_joins"] >= 2  # nation + region at minimum
    assert audit.has_pushed_filter(df, "r_name")


def test_dedup_single_shuffle(spark):
    df = dedup_last_wins(spark, SF)
    # window dedup must cost exactly one exchange (the PK hash partition)
    assert audit.exchange_count(df) == 1, audit.explain_str(df, "simple")


def test_flatten_no_shuffle(spark):
    df = flatten_json_events(spark, SF)
    assert audit.exchange_count(df) == 0


def test_exact_dedup_partial_agg(spark):
    df = doc_exact_dedup(spark, SF)
    # hash aggregate with map-side combine: one exchange, codegen'd
    assert audit.exchange_count(df) == 1
    assert audit.has_partial_aggregate(df)
    assert audit.codegen_stage_count(df) >= 1


def test_token_stats_stays_jvm(spark):
    df = doc_token_stats(spark, SF)
    txt = audit.explain_str(df, "simple")
    assert "BatchEvalPython" not in txt and "ArrowEvalPython" not in txt


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_python_row_udfs_anywhere(spark, name):
    """No query may fall back to row-at-a-time Python evaluation."""
    df = QUERIES[name][0](spark, SF)
    assert "BatchEvalPython" not in audit.explain_str(df, "simple")
