"""Round-3 catalog extensions: behavior + invariant tests for the graph
retrieval / label-propagation tier (SALSA, majority label propagation)."""

import pytest

from bulker_spark.plans.analytics6 import (
    _SALSA_SCALE,
    EXTRA_QUERIES6,
    parts_label_prop,
    parts_salsa,
)

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(EXTRA_QUERIES6))
def test_runs_and_returns_rows(spark, name):
    fn, _sql = EXTRA_QUERIES6[name]
    df = fn(spark, SF)
    assert df.count() >= 0  # stable schema + executable plan


def test_salsa_mass_conserved_and_deterministic(spark):
    # integer random walk: every hop only truncates mass (div by degree),
    # so the authority total never exceeds the injected SCALE and the
    # result is bit-identical across runs/partitionings
    rows = parts_salsa(spark, SF).collect()
    assert rows
    total = sum(r.salsa for r in rows)
    assert 0 < total <= _SALSA_SCALE
    assert total >= int(0.9 * _SALSA_SCALE)  # truncation loss is tiny
    again = sum(r.salsa for r in parts_salsa(spark, SF).collect())
    assert again == total


def test_label_prop_seeds_sticky_and_rounds_monotone(spark):
    part = {
        r.p_partkey: r.p_brand
        for r in spark.read.parquet(f"{SF}/part.parquet").collect()
    }
    rows = parts_label_prop(spark, SF).collect()
    assert rows
    for r in rows:
        if r.part_id % 3 == 0:
            # seeds keep their own brand, assigned at round 0
            assert r.round == 0 and r.label == part[r.part_id]
        else:
            assert r.round in (-1, 1, 2)
            if r.round == -1:
                assert r.label == "unassigned"
            else:
                # propagated labels are real brands, not invented values
                assert r.label in set(part.values())
