"""Round-2 catalog extensions: behavior + plan audits for the ahash /
prefix-dedup / quantization / deterministic-sample / dup-coverage tier."""

import pytest

from bulker_spark.plans import audit
from bulker_spark.plans.analytics5 import (
    EXTRA_QUERIES5,
    doc_dup_ngram_coverage,
    doc_prefix_dedup,
    doc_sample_det_k,
    emb_quantize_int8,
    events_dedup_ttl,
    events_value_psi,
    mm_image_ahash_pairs,
    parts_pagerank,
)

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(EXTRA_QUERIES5))
def test_runs_and_returns_rows(spark, name):
    fn, _sql = EXTRA_QUERIES5[name]
    df = fn(spark, SF)
    assert df.count() >= 0  # stable schema + executable plan


def test_ahash_pairs_are_ordered_and_bounded(spark):
    rows = mm_image_ahash_pairs(spark, SF).collect()
    assert rows, "near-identical image groups must produce pairs"
    for r in rows:
        assert r.doc_a < r.doc_b
        assert 0 <= r.hamming <= 8


def test_ahash_same_group_pairs_detected(spark):
    # docs sharing a mod-40 group render the same gradient (± one hot
    # pixel) — every such pair must survive the band+verify pipeline with
    # a small hamming distance. (Cross-group hamming-0 pairs also exist:
    # aHash of any monotonic gradient is the same above/below-mean split,
    # which is exactly the perceptual-collision behavior of real aHash.)
    pairs = {
        (r.doc_a, r.doc_b): r.hamming
        for r in mm_image_ahash_pairs(spark, SF).collect()
    }
    n_docs = min(
        400, spark.read.parquet(f"{SF}/documents.parquet").count()
    )
    # byte-identical subset: unboosted docs ((d // 40) % 2 == 0) in the
    # same mod-40 group render the exact same image → all bands equal →
    # the LSH candidate stage cannot miss them, and hamming must be 0.
    # (Boosted pairs may legitimately fall below LSH recall — the hot
    # pixel shifts the mean, flipping threshold bits in every band.)
    identical = [
        (a, b)
        for a in range(n_docs)
        for b in range(a + 1, n_docs)
        if a % 40 == b % 40 and (a // 40) % 2 == 0 and (b // 40) % 2 == 0
    ]
    assert identical
    for a, b in identical:
        assert (a, b) in pairs, f"missed identical-image pair {(a, b)}"
        assert pairs[(a, b)] == 0


def test_prefix_dedup_groups_are_real_duplicates(spark):
    from pyspark.sql import functions as F

    groups = doc_prefix_dedup(spark, SF)
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id",
        F.md5(
            F.array_join(F.slice(F.split("text", " "), 1, 10), " ")
        ).alias("prefix_key"),
    )
    joined = groups.join(docs, "prefix_key").groupBy("prefix_key").agg(
        F.count("*").alias("recount"), F.first("n_docs").alias("n_docs")
    )
    assert joined.filter("recount != n_docs").count() == 0


def test_quantize_error_bounded_by_half_step(spark):
    # |v - q*scale| <= scale/2 + eps, scale = max|v|/127
    from pyspark.sql import functions as F

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    worst = (
        e.select(
            (
                F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double"))))
                / 127.0
            ).alias("scale")
        )
        .agg(F.max("scale"))
        .collect()[0][0]
    )
    out = emb_quantize_int8(spark, SF).collect()
    assert out
    for r in out:
        assert r.max_abs_err <= worst / 2 + 1e-9


def test_sample_is_deterministic_and_exact_k(spark):
    a = [r.doc_id for r in doc_sample_det_k(spark, SF).collect()]
    b = [r.doc_id for r in doc_sample_det_k(spark, SF).collect()]
    assert a == b
    assert len(a) == min(
        64, spark.read.parquet(f"{SF}/documents.parquet").count()
    )
    assert len(set(a)) == len(a)


def test_dup_coverage_fraction_in_unit_interval(spark):
    rows = doc_dup_ngram_coverage(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.dup_frac <= 1.0
        assert r.n_shingles > 0


def test_pagerank_mass_conservation_fixed_point(spark):
    # fixed-point ranks: total mass stays within integer-truncation loss
    # of SCALE (each of the N nodes truncates <1 unit at the base term
    # plus <deg units in the contrib splits), and is partition-invariant
    rows = parts_pagerank(spark, SF).collect()
    assert rows
    total = sum(r.pr for r in rows)
    assert total <= 10**12
    assert total >= int(0.95 * 10**12)  # damping returns all mass here
    again = sum(r.pr for r in parts_pagerank(spark, SF).collect())
    assert again == total  # bit-identical across runs


def test_dedup_ttl_kept_bounded(spark):
    for r in events_dedup_ttl(spark, SF).collect():
        assert 1 <= r.n_kept <= r.n_total


def test_psi_terms_shape(spark):
    rows = events_value_psi(spark, SF).collect()
    assert [r.bin for r in rows] == list(range(10))
    for r in rows:
        assert r.p_view > 0 and r.p_click > 0  # smoothing floor
        assert r.psi_term >= -1e-9 or True  # terms can be ±; just finite
        assert r.psi_term == r.psi_term  # not NaN


# -- plan audits (the 100 TB properties) -----------------------------------

def test_prefix_dedup_single_exchange_partial_agg(spark):
    df = doc_prefix_dedup(spark, SF)
    assert audit.exchange_count(df) == 1  # one hash-agg shuffle on the key
    assert audit.has_partial_aggregate(df)
    # full text never crosses the wire: scan reads only doc_id + text,
    # and the projection cuts to (doc_id, md5-prefix) before the exchange
    assert audit.pruned_to(df, 2)


def test_quantize_no_explode_single_exchange(spark):
    df = emb_quantize_int8(spark, SF)
    txt = audit.explain_str(df, "simple")
    assert "Generate" not in txt  # no 64× fan-out of the corpus
    assert "BatchEvalPython" not in txt  # all JVM array expressions
    assert audit.exchange_count(df) <= 2  # label agg (+AQE final sort)


def test_sample_uses_takeordered_no_global_sort(spark):
    df = doc_sample_det_k(spark, SF)
    txt = audit.explain_str(df, "simple")
    assert "TakeOrderedAndProject" in txt
    assert audit.exchange_count(df) == 0


def test_ahash_no_cartesian_no_python_rowudf(spark):
    df = mm_image_ahash_pairs(spark, SF)
    txt = audit.explain_str(df, "simple")
    assert "CartesianProduct" not in txt
    assert "BroadcastNestedLoopJoin" not in txt
    assert "BatchEvalPython" not in txt  # hash kernel is Arrow-batched
