"""``session.pin`` mode routing: the placement pins (sessionize
boundary merge, curriculum offsets, dedup-index signatures, CC rounds)
must switch from executor-local blocks to reliable checkpoints via one
conf, with no caller changes — localCheckpoint is not fault-tolerant on
a real cluster (VERDICT r6 #5)."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from bulker_spark.session import pin


@pytest.fixture()
def reset_mode(spark):
    yield
    spark.conf.set("spark.bulker.checkpoint.mode", "local")
    spark.conf.unset("spark.bulker.checkpoint.dir")


def test_default_mode_is_local(spark):
    df = pin(spark.range(10).withColumn("x", F.col("id") * 2))
    assert df.count() == 10
    # local checkpoint actually happened: the RDD lineage shows the
    # checkpointed scan instead of the range+project chain
    assert df.rdd.toDebugString().count(b"Checkpoint") >= 1


def test_reliable_mode_without_dir_raises(spark, reset_mode):
    spark.conf.set("spark.bulker.checkpoint.mode", "reliable")
    # the session fixture never sets a checkpoint dir; if an earlier
    # test set one via the conf, pin() would use it — clear the conf
    spark.conf.unset("spark.bulker.checkpoint.dir")
    already = not spark.sparkContext._jsc.sc().checkpointDir().isEmpty()
    if already:
        pytest.skip("a prior test set an SC-level checkpoint dir")
    with pytest.raises(ValueError, match="checkpoint"):
        pin(spark.range(3))


def test_reliable_mode_writes_checkpoint_dir(spark, reset_mode):
    d = tempfile.mkdtemp(prefix="bulker_ckpt_")
    spark.conf.set("spark.bulker.checkpoint.mode", "reliable")
    spark.conf.set("spark.bulker.checkpoint.dir", d)
    df = pin(spark.range(25).withColumn("x", F.col("id") % 3))
    assert df.count() == 25
    # reliable checkpoint materializes files under the configured dir
    found = [
        os.path.join(r, f)
        for r, _, fs in os.walk(d)
        for f in fs
    ]
    assert found, f"no checkpoint files under {d}"
    # and the result is still correct after re-reads
    assert df.groupBy("x").count().count() == 3


def test_invalid_mode_raises(spark, reset_mode):
    spark.conf.set("spark.bulker.checkpoint.mode", "weird")
    with pytest.raises(ValueError, match="local|reliable"):
        pin(spark.range(3))


def test_pinned_query_identical_across_modes(spark, reset_mode):
    """The sessionize boundary merge — a real pin call site — must give
    byte-identical results in both modes."""
    from bulker_spark.plans.queries import QUERIES

    fn = QUERIES["events_sessionize"][0]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
    base = sorted(map(tuple, fn(spark, sf).collect()))
    d = tempfile.mkdtemp(prefix="bulker_ckpt_q_")
    spark.conf.set("spark.bulker.checkpoint.mode", "reliable")
    spark.conf.set("spark.bulker.checkpoint.dir", d)
    rel = sorted(map(tuple, fn(spark, sf).collect()))
    assert base == rel
