"""Scale correctness (bigdata_test.go:18-111 parity).

The always-run tier pushes 100k rows through the DataFrame-native path
(the 100 TB path — no driver buffering). The 1M tiers mirror the
reference's opt-in env gates:

    BULKER_SPARK_TEST_MILLION_ROWS=1         one 1M-row batch
    BULKER_SPARK_TEST_MILLION_ROWS_BATCHED=1 10 x 100k sub-batches + dedup
"""

import os

import pytest
from pyspark.sql import functions as F

from bulker_spark.api import Engine


def _gen(spark, n, offset=0):
    return (
        spark.range(offset, offset + n)
        .select(
            F.col("id").alias("pk"),
            (F.col("id") % 1000).alias("bucket"),
            F.concat(F.lit("name_"), F.col("id").cast("string")).alias("name"),
            (F.col("id") * 1.5).alias("score"),
        )
    )


def test_100k_dataframe_ingest_with_dedup(spark, tmp_warehouse):
    e = Engine(spark, tmp_warehouse)
    df = _gen(spark, 100_000).unionAll(_gen(spark, 10_000))  # 10k dup PKs
    res = e.bulk_load(
        "big", df, mode="batch", primary_key=["pk"], deduplicate=True
    )
    assert res.successful_rows == 100_000
    assert e.warehouse.count("big") == 100_000
    # merge upsert at scale: second batch overlaps half the keyspace
    e.bulk_load(
        "big", _gen(spark, 100_000, offset=50_000), mode="batch",
        primary_key=["pk"], deduplicate=True,
    )
    assert e.warehouse.count("big") == 150_000


@pytest.mark.skipif(
    not os.environ.get("BULKER_SPARK_TEST_MILLION_ROWS"),
    reason="opt-in scale test (BULKER_SPARK_TEST_MILLION_ROWS=1)",
)
def test_million_rows_single_batch(spark, tmp_warehouse):
    e = Engine(spark, tmp_warehouse)
    res = e.bulk_load(
        "mil", _gen(spark, 1_000_000), mode="batch",
        primary_key=["pk"], deduplicate=True,
    )
    assert res.successful_rows == 1_000_000
    assert e.warehouse.count("mil") == 1_000_000


@pytest.mark.skipif(
    not os.environ.get("BULKER_SPARK_TEST_MILLION_ROWS_BATCHED"),
    reason="opt-in scale test (BULKER_SPARK_TEST_MILLION_ROWS_BATCHED=1)",
)
def test_million_rows_batched_dedup(spark, tmp_warehouse):
    e = Engine(spark, tmp_warehouse)
    for i in range(10):
        e.bulk_load(
            "milb", _gen(spark, 100_000, offset=i * 90_000), mode="batch",
            primary_key=["pk"], deduplicate=True,
        )  # 10k-row overlap between consecutive batches exercises the merge
    assert e.warehouse.count("milb") == 9 * 90_000 + 100_000
