"""Round-4 catalog extensions: distributed exact covariance sufficient
statistics over the embedding corpus, and PCA-subspace reconstruction
error (the whitening/SemDeDup preprocessing stage).

Reference scope (jitsucom/bulker): none of this exists in the reference
(`SURVEY.md §2` has no vector analytics); it extends the training-data
embedding tier. Covariance/PCA is the standard preprocessing in front of
embedding dedup and retrieval (whitening decorrelates the space so
cosine/L2 stop over-weighting dominant directions; SemDeDup-style
pipelines run it before clustering).

Determinism discipline: covariance is computed from integer-quantized
values (ROUND(x·10⁶) — float32 parquet values widen to the identical
double in both engines) with DECIMAL(38,0) cross-products, so the
sufficient statistics are EXACT integers, independent of partitioning,
summation order, or engine: ``n·Σqᵢqⱼ − Σqᵢ·Σqⱼ`` in micro² units. The
single float division (and the eigendecomposition) happens downstream on
the driver over the tiny D×D matrix, where no distributed-order
nondeterminism exists.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_DIM = 64  # embedding dimensionality of the testdata corpus
_PCA_K = 8  # principal components kept by the projection stage


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# ==========================================================================
# Exact covariance sufficient statistics
# ==========================================================================

def emb_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangle covariance sufficient statistics of the embedding
    corpus: for every dim pair i ≤ j, the EXACT integer
    ``cov_num = n·Σqᵢqⱼ − Σqᵢ·Σqⱼ`` (micro² units, q = ROUND(x·10⁶)) and
    ``n`` — covariance = cov_num / (n·(n−1)) / 10¹², left to the caller
    so no engine-specific float/rounding enters the result.

    Scale shape: the cross-product accumulation runs as an Arrow
    ``mapInPandas`` partial aggregate — each task computes an int64
    Gram matrix Qᵀ·Q (D² = 4096 cells) and per-dim sums PER ARROW BATCH,
    emitting one D²-row frame per batch; the only shuffle is the final
    D²-key sum. Rows never leave their scan task and wide state is O(D²)
    regardless of corpus size — the textbook partial-aggregation layout
    for distributed second moments. The int64 bound is per BATCH, not
    per task, deliberately: |q| ≤ ~2·10⁶ ⇒ qᵢqⱼ ≤ ~4·10¹², so a ~10⁴-row
    Arrow batch peaks near 4·10¹⁶ — 200× inside int64 — while
    accumulating across a whole multi-million-row task would silently
    wrap. The cross-batch/cross-task sums and the n·P − S·S combination
    run in DECIMAL(38,0), exact at any corpus size."""
    emb = _t(spark, sf_dir, "embeddings").select("embedding")

    def partials(batches):
        import numpy as np
        import pandas as pd

        i, j = np.triu_indices(_DIM)
        # own chunk bound — Arrow batch size is a user-tunable config
        # (maxRecordsPerBatch, 0 = unlimited) this code cannot trust;
        # 65536 rows × 4e12 peak cell product = 2.6e17, 35× inside int64
        _CHUNK = 65_536
        for pdf in batches:
            for lo in range(0, len(pdf), _CHUNK):
                chunk = pdf.iloc[lo:lo + _CHUNK]
                if not len(chunk):
                    continue
                # floor(x·10⁶ + 0.5): one half-rounding rule every
                # engine reproduces exactly (numpy rint is half-to-even,
                # DuckDB ROUND half-away, Spark ROUND HALF_UP — they
                # disagree on exact .5 micro values, which float32
                # embeddings DO hit)
                q = np.floor(
                    np.stack(chunk["embedding"].to_numpy()).astype(
                        np.float64
                    )
                    * 1_000_000
                    + 0.5
                ).astype(np.int64)
                gram = q.T @ q  # per-chunk: bounded far inside int64
                sums = q.sum(axis=0)
                yield pd.DataFrame({
                    "i": i.astype("int32"),
                    "j": j.astype("int32"),
                    "p": gram[i, j],
                    "si": sums[i],
                    "sj": sums[j],
                    "n": np.int64(q.shape[0]),
                })

    part = emb.mapInPandas(
        partials, "i int, j int, p long, si long, sj long, n long"
    )
    dec = "decimal(38,0)"
    agg = part.groupBy("i", "j").agg(
        F.sum(F.col("p").cast(dec)).alias("p"),
        F.sum(F.col("si").cast(dec)).alias("si"),
        F.sum(F.col("sj").cast(dec)).alias("sj"),
        F.sum("n").alias("n"),
    )
    return agg.select(
        "i",
        "j",
        (
            F.col("n").cast(dec) * F.col("p")
            - F.col("si") * F.col("sj")
        ).cast(dec).alias("cov_num"),
        # the first moments ride along (exact micro-unit sums): the mean
        # vector downstream stages need comes from the SAME quantization
        # as the cross-products, with no second corpus pass
        F.col("si").cast(dec).alias("si"),
        F.col("sj").cast(dec).alias("sj"),
        F.col("n").cast("long").alias("n"),
    )


EMB_COVARIANCE_SQL = f"""
WITH q AS (
  SELECT vec_id,
         generate_subscripts(embedding, 1) - 1 AS d,
         -- floor(x + 0.5): same half rule as the Spark side (plain
         -- ROUND is half-away here, half-to-even in numpy — they split
         -- on exact .5 micro values)
         CAST(FLOOR(unnest(embedding)::DOUBLE * 1000000 + 0.5) AS BIGINT)
           AS v
  FROM embeddings
),
moments AS (
  SELECT a.d AS i, b.d AS j,
         SUM(CAST(a.v AS HUGEINT) * b.v) AS p,
         SUM(CAST(a.v AS HUGEINT)) AS si,
         SUM(CAST(b.v AS HUGEINT)) AS sj,
         COUNT(*) AS n
  FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.d <= b.d
  GROUP BY 1, 2
)
SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
       CAST(CAST(n AS HUGEINT) * p - si * sj AS DECIMAL(38,0)) AS cov_num,
       CAST(si AS DECIMAL(38,0)) AS si,
       CAST(sj AS DECIMAL(38,0)) AS sj,
       CAST(n AS BIGINT) AS n
FROM moments
ORDER BY i, j
"""


# ==========================================================================
# PCA-subspace reconstruction error (whitening stage)
# ==========================================================================

def emb_pca_recon_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector reconstruction error from the top-``_PCA_K`` principal
    subspace, in floor basis points of the vector's centered energy —
    the whitening-stage health metric (high error = the vector lives
    outside the dominant subspace; SemDeDup-style pipelines use exactly
    this split to pick k).

    Output is BASIS-INDEPENDENT (depends on the subspace, not on
    eigenvector signs or ordering), so it is stable across eigensolver
    conventions. Not SQL-expressible (eigendecomposition) → rows-only
    correctness check, by design.

    Scale shape: the D×D covariance comes from ``emb_covariance``'s
    exact distributed statistics (collected — 2080 tiny rows); the
    eigendecomposition is a driver-side O(D³) numpy call on the 64×64
    matrix; the projection is a map-only Arrow pass with the K×D basis
    broadcast via closure — no shuffle at any corpus size."""
    import numpy as np

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    stats = emb_covariance(spark, sf_dir).collect()
    if not stats or stats[0]["n"] < 2:
        # empty corpus (no statistics) or a single vector (covariance
        # undefined, n−1 = 0): an empty typed result, not a traceback
        return emb.select(
            "vec_id", F.lit(0).cast("long").alias("recon_err_bp")
        ).limit(0)
    n = stats[0]["n"]
    cov = np.zeros((_DIM, _DIM), dtype=np.float64)
    mean = np.zeros(_DIM)
    for r in stats:
        v = float(r["cov_num"]) / (n * (n - 1)) / 1e12
        cov[r["i"], r["j"]] = v
        cov[r["j"], r["i"]] = v
        if r["i"] == r["j"]:
            # the diagonal rows already carry Σqᵢ (si) from the SAME
            # quantization as the cross-products — no second corpus
            # pass, no second (possibly different) rounding rule
            mean[r["i"]] = int(r["si"]) / n / 1e6
    evals, evecs = np.linalg.eigh(cov)
    basis = evecs[:, -_PCA_K:]  # top-K subspace, ascending eigh order

    def project(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            xc = x - mean
            energy = (xc * xc).sum(axis=1)
            proj = xc @ basis
            kept = (proj * proj).sum(axis=1)
            resid = np.maximum(energy - kept, 0.0)
            bp = np.where(
                energy > 0, np.floor(10_000 * resid / energy), 0
            ).astype(np.int64)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "recon_err_bp": bp}
            )

    return emb.mapInPandas(project, "vec_id long, recon_err_bp long")


EXTRA_QUERIES9: dict[str, tuple] = {
    "emb_covariance": (emb_covariance, EMB_COVARIANCE_SQL),
    "emb_pca_recon_error": (emb_pca_recon_error, None),
}
