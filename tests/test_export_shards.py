"""Training-shard export: stable membership, complete coverage, bounded
file sizes, pruned single-shard reads."""

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from bulker_spark.functions.export import (
    SHARD_COLUMN,
    read_shard,
    with_shard,
    write_training_shards,
)

SF = "/root/testdata/sf0.001"


def test_shard_assignment_deterministic_and_balanced(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    a = {r["doc_id"]: r[SHARD_COLUMN] for r in with_shard(d, "doc_id", 8).collect()}
    b = {r["doc_id"]: r[SHARD_COLUMN] for r in with_shard(d, "doc_id", 8).collect()}
    assert a == b  # stable across runs
    # independent of partition layout
    c = {
        r["doc_id"]: r[SHARD_COLUMN]
        for r in with_shard(d.repartition(13), "doc_id", 8).collect()
    }
    assert a == c
    sizes = {}
    for s in a.values():
        sizes[s] = sizes.get(s, 0) + 1
    assert set(sizes) == set(range(8))
    assert max(sizes.values()) < 3 * min(sizes.values())  # roughly balanced
    # a different salt re-deals the assignment
    d2 = {
        r["doc_id"]: r[SHARD_COLUMN]
        for r in with_shard(d, "doc_id", 8, salt="v2").collect()
    }
    assert d2 != a


def test_write_read_roundtrip_and_pruning(spark):
    out = tempfile.mkdtemp(prefix="shards_")
    try:
        d = spark.read.parquet(f"{SF}/documents.parquet")
        write_training_shards(
            d, out, "doc_id", 4, max_records_per_file=50
        )
        back = spark.read.parquet(out)
        assert back.count() == d.count()
        assert set(
            r[SHARD_COLUMN] for r in back.select(SHARD_COLUMN).distinct().collect()
        ) == {0, 1, 2, 3}
        # shard dirs exist; files bounded by maxRecordsPerFile
        shard0 = os.path.join(out, f"{SHARD_COLUMN}=0")
        files = [f for f in os.listdir(shard0) if f.endswith(".parquet")]
        assert files
        n0 = read_shard(spark, out, 0).count()
        assert len(files) >= max(1, n0 // 50)
        # single-shard read prunes partitions at the scan
        df0 = read_shard(spark, out, 0)
        plan = df0._sc._jvm.PythonSQLUtils.explainString(
            df0._jdf.queryExecution(), "formatted"
        )
        assert "PartitionFilters" in plan and SHARD_COLUMN in plan
        # membership matches the in-row assignment
        expected0 = {
            r["doc_id"]
            for r in with_shard(d, "doc_id", 4).filter(F.col(SHARD_COLUMN) == 0).collect()
        }
        assert {r["doc_id"] for r in df0.collect()} == expected0
        # re-export reproduces identical membership
        out2 = tempfile.mkdtemp(prefix="shards2_")
        try:
            write_training_shards(d, out2, "doc_id", 4)
            assert {
                r["doc_id"] for r in read_shard(spark, out2, 0).collect()
            } == expected0
        finally:
            shutil.rmtree(out2, ignore_errors=True)
    finally:
        shutil.rmtree(out, ignore_errors=True)
