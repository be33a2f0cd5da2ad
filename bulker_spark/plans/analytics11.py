"""Round-6 catalog extension: DETERMINISTIC ANN search queries.

Reference scope (jitsucom/bulker): none — this extends the LLM
training-data tier's similarity-search surface (SURVEY §2 additions).

``emb_ann_ivf`` and ``emb_ann_lsh`` were rows-only checks while they
rode Spark ML (``BucketedRandomProjectionLSH`` / ``KMeans`` — internal
RNG no other engine can replicate). Both are re-expressed here with the
autotune discipline that made k-means strict: fixed configs, portable
deterministic "randomness", integer-exact comparisons — so the
(query_id, candidate_id, rank) sets are bit-identical across engines
and a DuckDB CTE replicates them. The Spark-ML general-purpose APIs
(``functions/similarity.py``) remain for ad-hoc use and keep their
accuracy tests; the CATALOG rows are the portable forms below.

Shared conventions (``plans/analytics7.py``): the query set is
``vec_id % 29 == 0 AND vec_id < 2000`` (``_pq_is_query``), candidates
are the complement, distances are squared-L2 in integer milli-units
(``_pq_dist_milli`` — the single float→int rounding), ties break on the
lowest id. Both queries return one row per (query, kept neighbor):
``query_id, neighbor_id, topk_rank, dmilli``.

Scale shapes (the 100 TB story):

- IVF: the 16 cell centroids are the vectors with the lowest ids —
  collected to the driver (k-row scalar, the kmeans centroid
  discipline) and re-embedded as literals, so cell assignment AND probe
  ranking are IN-ROW expressions over the corpus scan: the corpus never
  shuffles for indexing. Candidate generation joins the assigned corpus
  to the broadcast (query × probe-cell) frame; exact distances compute
  in-row on the matched rows; only slim int triples
  (query_id, neighbor_id, dmilli) cross the final top-k exchange.
- LSH: sign-random-projection (SimHash for cosine) with hyperplane
  coefficients derived from a SHARED integer recurrence
  (``_lsh_coef``) both engines evaluate exactly; vectors quantize to
  integer micro-units in-row, so every sign bit is an INTEGER dot —
  no float boundary can flip between engines. Bucket codes explode to
  slim (vec_id, table, code) ints; candidates join those against the
  broadcast query codes; the candidate pair set is bounded by the
  fixed query budget, so it broadcasts back onto the corpus scan for
  the exact-distance pass (corpus streams, never shuffles).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bulker_spark.plans.analytics7 import (
    _PQ_DIM,
    _PQ_K,
    _PQ_M,
    _cell_rank_array,
    _pq_dist_milli_fixed,
    _pq_is_query,
    _pq_parallelize,
    _pq_q_sql,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


_ANN_TOPK = 10
# emb_ivf_probe_autotune's CHOSEN config at both tested scales: with the
# deterministic lowest-id "centroids" no swept nprobe reaches the 95%
# cell-recall target, so the sweep falls back to its largest value
_ANN_NPROBE = 8
# one source of truth for the embedding dimension (analytics7's PQ grid)
_ANN_DIM = _PQ_M * _PQ_DIM

_LSH_TABLES = 8
_LSH_PLANES = 8  # sign bits per table → 256 buckets/table


def _lsh_coef(table: int, plane: int, dim: int) -> int:
    """Hyperplane coefficient in [-1000, 1000] from a 31-bit LCG over
    the flat index — the portable-randomness move: both engines
    evaluate the same integer recurrence exactly, so there is no RNG
    to replicate (the SQL twin is the ``coeffs`` CTE)."""
    idx = (table * _LSH_PLANES + plane) * _ANN_DIM + dim
    return ((1103515245 * idx + 12345) % 2**31) % 2001 - 1000


def _vecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )


def _topk_per_query(scored: DataFrame) -> DataFrame:
    """Final ANN tail shared by both queries: per-query top-k over the
    slim (query_id, neighbor_id, dmilli) triples — the ONLY shuffle
    that scales with the candidate count, and it carries three ints."""
    w = Window.partitionBy("query_id").orderBy("dmilli", "neighbor_id")
    return (
        scored.withColumn("topk_rank", F.row_number().over(w))
        .filter(F.col("topk_rank") <= _ANN_TOPK)
        .select("query_id", "neighbor_id", "topk_rank", "dmilli")
    )


def emb_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN, deterministic form: cells are the ``_PQ_K`` lowest-id
    vectors (the autotune's centroid convention), every database vector
    belongs to its integer-milli-nearest cell, each query probes its
    ``_ANN_NPROBE`` nearest cells and brute-forces only those — the
    FAISS IVF search loop with the RNG removed. Returns the exact
    top-``_ANN_TOPK`` within the probed set per query.

    Cell assignment and probe ranking are in-row argmins over the
    collected centroid literals: the corpus is scanned, never shuffled,
    for indexing (see module docstring for the full scale shape)."""
    e = _vecs(spark, sf_dir)
    cents = sorted(
        (r["vec_id"], r["v"])
        for r in e.filter(F.col("vec_id") < _PQ_K).collect()
    )
    # in-row distance-to-every-cell: array of (dmilli, cell) structs,
    # ordered ascending = probe ranking; element 0 = assignment.
    # _cell_rank_array keeps the interpreted zip_with/aggregate fold
    # with STATIC slicing + literal arrays only — the full flat unroll
    # was tried in r08 and measured 10x WORSE (janino method-size limits
    # break whole-stage codegen); see _pq_dist_milli_fixed's docstring.
    # r09: the shared single-F.expr builder replaces the identical
    # inline DSL construction (same struct fields, same tie-break) —
    # the lambda-built form cost ~2 s of py4j chatter per query build.
    cell_d = _cell_rank_array("v", cents)
    assigned = e.select("vec_id", "v", cell_d.alias("cd"))
    # corpus side: cell-rank folds + the per-candidate exact fold in the
    # probe join's match loop run on the scan's partitioning — a tiny
    # input scans as ONE partition, serializing them (r09, guide §2.2);
    # _pq_parallelize spreads it and is a no-op past the size threshold
    db = _pq_parallelize(spark, sf_dir, assigned.filter(~_pq_is_query())).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("nv"),
        F.col("cd")[0]["cell"].alias("cell"),
    )
    probes = (
        assigned.filter(_pq_is_query())
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.explode(
                F.slice(F.col("cd"), 1, _ANN_NPROBE)
            ).alias("probe"),
        )
        .select("query_id", "qv", F.col("probe.cell").alias("cell"))
    )
    scored = db.join(F.broadcast(probes), "cell").select(
        "query_id",
        "neighbor_id",
        _pq_dist_milli_fixed("qv", "nv", _ANN_DIM).alias("dmilli"),
    )
    return _topk_per_query(scored)


def _ann_ivf_sql() -> str:
    return f"""
WITH fx AS (
  SELECT vec_id, unnest(list_transform(embedding, x -> x::DOUBLE)) AS x,
         unnest(generate_series(1, {_ANN_DIM})) AS i
  FROM embeddings
),
ccx AS (SELECT vec_id AS cell, x AS cx, i FROM fx WHERE vec_id < {_PQ_K}),
cd AS (
  SELECT f.vec_id, c.cell,
         CAST(ROUND(1000 * SUM((f.x - c.cx) * (f.x - c.cx))) AS BIGINT)
           AS dmilli
  FROM fx f JOIN ccx c ON f.i = c.i
  GROUP BY 1, 2
),
ranked AS (
  SELECT vec_id, cell,
         row_number() OVER (
             PARTITION BY vec_id ORDER BY dmilli, cell
         ) AS rn
  FROM cd
),
db AS (
  SELECT vec_id AS neighbor_id, cell FROM ranked
  WHERE rn = 1 AND NOT {_pq_q_sql()}
),
probes AS (
  SELECT vec_id AS query_id, cell FROM ranked
  WHERE rn <= {_ANN_NPROBE} AND {_pq_q_sql()}
),
cand AS (
  SELECT p.query_id, d.neighbor_id
  FROM probes p JOIN db d USING (cell)
),
scored AS (
  SELECT c.query_id, c.neighbor_id,
         CAST(ROUND(1000 * SUM((q.x - n.x) * (q.x - n.x))) AS BIGINT)
           AS dmilli
  FROM cand c
  JOIN fx q ON q.vec_id = c.query_id
  JOIN fx n ON n.vec_id = c.neighbor_id AND n.i = q.i
  GROUP BY 1, 2
)
SELECT query_id, neighbor_id, topk_rank, dmilli FROM (
  SELECT query_id, neighbor_id, dmilli,
         row_number() OVER (
             PARTITION BY query_id ORDER BY dmilli, neighbor_id
         ) AS topk_rank
  FROM scored
) WHERE topk_rank <= {_ANN_TOPK}
"""


def _lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (query_id, neighbor_id) LSH candidate pairs — the
    banding stage of :func:`emb_ann_lsh`, exposed separately so the
    selectivity property (candidates ≪ all pairs) is testable on its
    own."""
    e = _vecs(spark, sf_dir)
    # micro-unit quantization JVM-side, projected ONCE; floor(x*1e6+0.5)
    # instead of round() — identical in both engines for every sign of x
    q = e.select(
        "vec_id",
        F.transform(
            "v", lambda x: F.floor(x * 1000000.0 + 0.5).cast("long")
        ).alias("xi"),
    )

    def code_batches(batches):
        # the 64 sign dots per row are ONE int64 matmul here — a
        # vectorized Arrow kernel instead of 4096 interpreted
        # higher-order-function lambda evaluations per row (measured
        # 9.8 s → ~1 s for the whole query at sf0.1). Integer matmul is
        # exact, so the codes stay bit-identical to the SQL twin.
        import numpy as np
        import pyarrow as pa

        proj = np.array(
            [
                [_lsh_coef(t, p, i) for i in range(_ANN_DIM)]
                for t in range(_LSH_TABLES)
                for p in range(_LSH_PLANES)
            ],
            dtype=np.int64,
        )
        weights = 1 << np.arange(_LSH_PLANES, dtype=np.int64)
        tables = np.arange(_LSH_TABLES, dtype=np.int32)
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            vid = batch.column("vec_id").to_numpy()
            xi = np.asarray(
                batch.column("xi").to_pylist(), dtype=np.int64
            )
            bits = (xi @ proj.T >= 0).astype(np.int64)
            codes = (
                bits.reshape(n, _LSH_TABLES, _LSH_PLANES) * weights
            ).sum(axis=2)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.repeat(vid, _LSH_TABLES)),
                    pa.array(np.tile(tables, n)),
                    pa.array(codes.reshape(-1)),
                ],
                names=["vec_id", "tbl", "code"],
            )

    # slim int triples only — the vectors do NOT ride the explosion
    coded = q.mapInArrow(
        code_batches, schema="vec_id long, tbl int, code long"
    )
    qcodes = coded.filter(_pq_is_query()).select(
        F.col("vec_id").alias("query_id"), "tbl", "code"
    )
    dbcodes = coded.filter(~_pq_is_query()).select(
        F.col("vec_id").alias("neighbor_id"), "tbl", "code"
    )
    return (
        dbcodes.join(F.broadcast(qcodes), ["tbl", "code"])
        .select("query_id", "neighbor_id")
        .distinct()
    )


def emb_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-random-projection LSH ANN (SimHash-for-cosine), deterministic
    form: 8 tables × 8 sign bits per table (256 buckets/table) over
    integer-quantized vectors with LCG-derived hyperplanes. A database
    vector is a candidate for a query iff they share ANY table's full
    bucket code; candidates are re-ranked exactly and the top
    ``_ANN_TOPK`` kept. Every sign bit is an integer dot product, so
    candidate sets are bit-identical across engines."""
    e = _vecs(spark, sf_dir)
    # candidate pairs are bounded by the fixed query budget, so they
    # broadcast back onto the corpus for the exact pass
    cand = _lsh_candidates(spark, sf_dir)
    qv = e.filter(_pq_is_query()).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    ep = _pq_parallelize(spark, sf_dir, e)  # exact pass: see emb_ann_ivf
    scored = (
        ep.join(
            F.broadcast(cand), ep["vec_id"] == cand["neighbor_id"]
        )
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            _pq_dist_milli_fixed("qv", "v", _ANN_DIM).alias("dmilli"),
        )
    )
    return _topk_per_query(scored)


def _ann_lsh_sql() -> str:
    n_flat = _LSH_TABLES * _LSH_PLANES * _ANN_DIM
    return f"""
WITH fx AS (
  SELECT vec_id, unnest(list_transform(embedding, x -> x::DOUBLE)) AS x,
         unnest(generate_series(1, {_ANN_DIM})) AS i
  FROM embeddings
),
qx AS (
  SELECT vec_id, i, CAST(floor(x * 1000000 + 0.5) AS BIGINT) AS xi
  FROM fx
),
coeffs AS (
  SELECT idx // {_LSH_PLANES * _ANN_DIM} AS tbl,
         (idx % {_LSH_PLANES * _ANN_DIM}) // {_ANN_DIM} AS p,
         (idx % {_ANN_DIM}) + 1 AS i,
         ((1103515245 * idx + 12345) % 2147483648) % 2001 - 1000 AS c
  FROM (SELECT unnest(range(0, {n_flat})) AS idx)
),
dots AS (
  SELECT q.vec_id, cf.tbl, cf.p, SUM(q.xi * cf.c) AS dot
  FROM qx q JOIN coeffs cf USING (i)
  GROUP BY 1, 2, 3
),
codes AS (
  SELECT vec_id, tbl,
         SUM(CASE WHEN dot >= 0 THEN 1 << p ELSE 0 END) AS code
  FROM dots GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, d.vec_id AS neighbor_id
  FROM codes q JOIN codes d USING (tbl, code)
  WHERE {_pq_q_sql('q')} AND NOT {_pq_q_sql('d')}
),
scored AS (
  SELECT c.query_id, c.neighbor_id,
         CAST(ROUND(1000 * SUM((q.x - n.x) * (q.x - n.x))) AS BIGINT)
           AS dmilli
  FROM cand c
  JOIN fx q ON q.vec_id = c.query_id
  JOIN fx n ON n.vec_id = c.neighbor_id AND n.i = q.i
  GROUP BY 1, 2
)
SELECT query_id, neighbor_id, topk_rank, dmilli FROM (
  SELECT query_id, neighbor_id, dmilli,
         row_number() OVER (
             PARTITION BY query_id ORDER BY dmilli, neighbor_id
         ) AS topk_rank
  FROM scored
) WHERE topk_rank <= {_ANN_TOPK}
"""


EXTRA_QUERIES11: dict[str, tuple] = {
    "emb_ann_ivf": (emb_ann_ivf, _ann_ivf_sql()),
    "emb_ann_lsh": (emb_ann_lsh, _ann_lsh_sql()),
}
