"""Invariants for the round-4 embedding ops (analytics9): exact
covariance sufficient statistics vs a direct numpy computation, and the
basis-independent PCA reconstruction error."""

import numpy as np
import pytest

from bulker_spark.plans.analytics9 import (
    _DIM,
    _PCA_K,
    emb_covariance,
    emb_pca_recon_error,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus():
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/embeddings.parquet")
    return np.stack(
        [np.asarray(e, dtype=np.float64) for e in t["embedding"].to_pylist()]
    )


def test_covariance_matches_direct_numpy(spark, corpus):
    """The distributed DECIMAL(38,0) statistics must equal the same
    quantized computation done whole on one machine — partitioning and
    summation order must be invisible."""
    rows = emb_covariance(spark, SF).collect()
    q = np.floor(corpus * 1_000_000 + 0.5).astype(np.int64).astype(object)  # exact ints, same half rule
    n = q.shape[0]
    got = {(r["i"], r["j"]): int(r["cov_num"]) for r in rows}
    assert all(r["n"] == n for r in rows)
    assert len(got) == _DIM * (_DIM + 1) // 2
    si_got = {(r["i"], r["j"]): int(r["si"]) for r in rows}
    for i, j in [(0, 0), (0, 1), (7, 33), (63, 63), (12, 12)]:
        p = int(sum(q[:, i] * q[:, j]))
        si, sj = int(q[:, i].sum()), int(q[:, j].sum())
        assert got[(i, j)] == n * p - si * sj, (i, j)
        assert si_got[(i, j)] == si, (i, j)


def test_covariance_diagonal_nonnegative(spark):
    rows = emb_covariance(spark, SF).collect()
    for r in rows:
        if r["i"] == r["j"]:
            # n·Σq² − (Σq)² ≥ 0 by Cauchy-Schwarz; zero only for a
            # constant dimension
            assert int(r["cov_num"]) >= 0


def test_covariance_partitioning_invariance(spark):
    """Repartitioned input → bit-identical statistics (the partial
    Gram-matrix aggregation must be associative-exact)."""
    a = {(r["i"], r["j"]): int(r["cov_num"])
         for r in emb_covariance(spark, SF).collect()}
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").repartition(7)
    import bulker_spark.plans.analytics9 as m

    orig = m._t
    try:
        m._t = lambda s, d, n: emb if n == "embeddings" else orig(s, d, n)
        b = {(r["i"], r["j"]): int(r["cov_num"])
             for r in emb_covariance(spark, SF).collect()}
    finally:
        m._t = orig
    assert a == b


def test_recon_error_bounds_and_subspace_quality(spark, corpus):
    rows = emb_pca_recon_error(spark, SF).collect()
    assert len(rows) == corpus.shape[0]
    bps = np.array([r["recon_err_bp"] for r in rows])
    assert ((bps >= 0) & (bps <= 10_000)).all()
    # the estimated top component must beat the expected error of a
    # RANDOM direction (1 - 1/D of the energy) on average — i.e. the
    # power iteration actually found an energy-concentrating direction
    assert bps.mean() < 10_000 * (1 - 1 / _DIM)


def test_recon_error_tracks_true_top_eigvector(spark, corpus):
    """The quantized fixed-count (_PI_ITERS=60) power-iteration metric
    must track the float eigh reference: the integer eigenvector estimate nearly
    parallel to numpy's true top component, and per-vector bp within
    quantization distance of the float top-1 reconstruction error.
    (Bit-exactness across ENGINES is pinned by the strict DuckDB oracle
    twin, not here.)"""
    rows = {r["vec_id"]: r["recon_err_bp"]
            for r in emb_pca_recon_error(spark, SF).collect()}
    q = np.floor(corpus * 1_000_000 + 0.5)
    n = q.shape[0]
    p = q.T @ q
    s = q.sum(axis=0)
    cov = (n * p - np.outer(s, s)) / (n * (n - 1)) / 1e12
    evals, evecs = np.linalg.eigh(cov)
    top = evecs[:, -1]
    # the integer iteration vector ~ parallel to the true top component
    from bulker_spark.plans.analytics9 import _power_iteration

    stats = emb_covariance(spark, SF).collect()
    _, v, vv = _power_iteration(stats, n)
    v = np.asarray(v, dtype=np.float64)
    cosine = abs(v @ top) / np.sqrt((v * v).sum())
    assert cosine > 0.999, cosine
    # per-vector bp within quantization distance of the float reference
    mean = s / n / 1e6
    xc = corpus - mean
    energy = (xc * xc).sum(axis=1)
    kept = (xc @ top) ** 2
    ref = np.where(
        energy > 0, 10_000 * np.maximum(energy - kept, 0) / energy, 0
    )
    got = np.array([rows[vid] for vid in range(n)], dtype=np.float64)
    # 2¹⁰ quantization of a ~0.999-cosine direction moves individual
    # projections by up to ~1.5% of energy — 150 bp covers it while
    # still catching a wrong direction (whose error would be 10³-10⁴)
    assert np.abs(got - ref).max() <= 150, np.abs(got - ref).max()


def test_recon_error_exact_integer_contract(spark, corpus):
    """The distributed kernel must reproduce the driver-side exact
    integer pipeline bit-for-bit (same quantization, same
    truncate-toward-zero divisions) — partitioning must not leak in."""
    from bulker_spark.plans.analytics9 import _power_iteration, _tz_div

    rows = {r["vec_id"]: r["recon_err_bp"]
            for r in emb_pca_recon_error(spark, SF).collect()}
    stats = emb_covariance(spark, SF).collect()
    n = stats[0]["n"]
    mean, v, vv = _power_iteration(stats, n)
    q = np.floor(corpus * 1_000_000 + 0.5).astype(np.int64)
    for vid in range(0, q.shape[0], 37):
        xc = [int(x) - m for x, m in zip(q[vid], mean)]
        energy = sum(x * x for x in xc)
        proj = sum(x * w for x, w in zip(xc, v))
        want = (
            0
            if energy == 0
            else (10_000 * (energy * vv - proj * proj)) // (energy * vv)
        )
        assert rows[vid] == want, vid
