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
    # the top-K subspace must beat the expected error of a RANDOM
    # K-subspace (1 - K/D of the energy) on average — i.e. PCA actually
    # concentrated energy
    assert bps.mean() < 10_000 * (1 - _PCA_K / _DIM)


def test_recon_error_matches_driver_numpy(spark, corpus):
    """End-to-end against a single-machine reference implementation of
    the same quantized-covariance → eigh → project pipeline."""
    rows = {r["vec_id"]: r["recon_err_bp"]
            for r in emb_pca_recon_error(spark, SF).collect()}
    q = np.floor(corpus * 1_000_000 + 0.5)
    n = q.shape[0]
    p = q.T @ q
    s = q.sum(axis=0)
    cov = (n * p - np.outer(s, s)) / (n * (n - 1)) / 1e12
    _, evecs = np.linalg.eigh(cov)
    basis = evecs[:, -_PCA_K:]
    mean = q.sum(axis=0) / n / 1e6
    xc = corpus - mean
    energy = (xc * xc).sum(axis=1)
    kept = ((xc @ basis) ** 2).sum(axis=1)
    bp = np.floor(10_000 * np.maximum(energy - kept, 0) / energy)
    for vid in range(0, n, 97):
        assert rows[vid] == int(bp[vid]), vid
