"""DSIR importance weights (plans/analytics10.py): estimator semantics
+ plan shape. The value-exactness gate is the DuckDB oracle
(`DOC_DSIR_SQL`, run by scripts/check_oracle.py and the driver)."""

import pytest

from bulker_spark.plans.analytics10 import doc_dsir_weights

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def weights(spark):
    return doc_dsir_weights(spark, SF).cache()


def test_covers_every_document(spark, weights):
    import os

    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    assert weights.count() == docs.count()
    assert weights.filter("dsir_weight IS NULL").count() == 0


def test_target_documents_score_higher(spark, weights):
    """The whole point of the estimator: documents FROM the target
    distribution (lang='en') must average a higher importance weight
    than the rest of the corpus."""
    import os

    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    joined = weights.join(docs.select("doc_id", "lang"), "doc_id")
    avg = dict(
        joined.groupBy(F.col("lang") == "en")
        .agg(F.avg("dsir_weight"))
        .collect()
    )
    assert avg[True] > avg[False]
    # and the gap is material, not float noise (the synthetic corpus
    # shares most vocabulary across langs, so the separation is modest)
    assert avg[True] - avg[False] > 0.02


def test_weights_are_log_ratios_centered_near_zero(weights):
    """Raw-corpus expectation of the ratio is ~1 ⇒ log weights straddle
    zero; a one-sided distribution means the smoothing or totals are
    wrong."""
    rows = weights.select("dsir_weight").collect()
    vals = [r[0] for r in rows]
    assert min(vals) < 0 < max(vals)


def test_plan_shape(spark, weights):
    """The scalar totals must BROADCAST (never shuffle a 1-row frame
    against the per-doc counts) and bigrams are generated in-row (no
    join or extra exchange building features)."""
    plan = weights._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
