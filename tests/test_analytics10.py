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


class TestIvfProbeAutotune:
    @pytest.fixture(scope="class")
    def curve(self, spark):
        from bulker_spark.plans.analytics10 import emb_ivf_probe_autotune

        rows = emb_ivf_probe_autotune(spark, SF).orderBy("nprobe").collect()
        return [r.asDict() for r in rows]

    def test_recall_and_cost_monotone(self, curve):
        """More probes can only ADD candidate cells: recall and scan
        fraction are non-decreasing in nprobe."""
        recalls = [r["recall_bp"] for r in curve]
        costs = [r["cand_bp"] for r in curve]
        assert recalls == sorted(recalls)
        assert costs == sorted(costs)
        assert all(0 <= r <= 10000 for r in recalls)
        assert all(0 <= c <= 10000 for c in costs)

    def test_exactly_one_chosen(self, curve):
        chosen = [r for r in curve if r["chosen"]]
        assert len(chosen) == 1
        target_met = [r for r in curve if r["recall_bp"] >= 9500]
        if target_met:
            assert chosen[0]["nprobe"] == target_met[0]["nprobe"]
        else:
            assert chosen[0]["nprobe"] == max(r["nprobe"] for r in curve)

    def test_full_probe_count_is_full_recall(self, spark):
        """Probing EVERY cell must recover the exhaustive answer —
        recall 10000 bp by construction (sanity of the recall math)."""
        import bulker_spark.plans.analytics10 as a10
        from bulker_spark.plans.analytics7 import _PQ_K

        old = a10._IVF_SWEEP
        a10._IVF_SWEEP = (_PQ_K,)
        try:
            row = a10.emb_ivf_probe_autotune(spark, SF).collect()[0]
            assert row["recall_bp"] == 10000
            assert row["cand_bp"] == 10000
        finally:
            a10._IVF_SWEEP = old
