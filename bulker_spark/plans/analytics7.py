"""Round-3 catalog extensions — the vector-index build pipeline (product
quantization: codebook assignment + asymmetric-distance search), training
hygiene (benchmark-contamination scan), corpus profiling (exact length
deciles), and fixed-point HITS.

Reference scope (jitsucom/bulker): none of this exists in the reference
(`SURVEY.md §2` — warehouse ingest only); these extend the training-data
curation tier the port adds on top: PQ is the standard memory-bounded ANN
index layout (Jégou et al. 2011), contamination scans are a required
pre-training step, and exact quantiles are the profiling primitive.

Determinism contract (the driver hash-compares against DuckDB): distances
are single-rounded to integer milli-units (``CAST(ROUND(1000*d) AS
BIGINT)``) so every downstream sum/rank is integer-exact and partition-
order-free; ranks always tie-break on ids; iterative mass is integer
fixed-point (same construction as ``parts_pagerank``).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# ==========================================================================
# Product quantization: codebooks + asymmetric-distance (ADC) top-k
# ==========================================================================

_PQ_M = 4  # subspaces
_PQ_DIM = 16  # dims per subspace (64-dim embeddings)
_PQ_K = 16  # centroids per subspace: the vectors with the 16 lowest ids
_PQ_QMOD = 29  # vec_id % 29 == 0 → query set for the ADC search
# Fixed query budget: the query batch stops growing once the corpus
# passes _PQ_QCAP (the SIFT-style ANN benchmark shape — a fixed query
# workload scans a growing corpus, so scored pairs scale O(corpus), not
# O(corpus²)). Chosen ≥ the sf0.1 corpus (2000 vectors) so every result
# at the driver's correctness scales is bit-identical to the uncapped
# definition; at sf1 (20k vectors) it caps queries at 69 and turned the
# three ADC benchmarks from ~100× pair growth (13-18× wall) into linear.
_PQ_QCAP = 2_000


def _pq_is_query() -> Column:
    """Query-set membership; candidates are exactly the complement."""
    return (F.col("vec_id") % _PQ_QMOD == 0) & (
        F.col("vec_id") < _PQ_QCAP
    )


def _pq_q_sql(alias: str = "") -> str:
    a = f"{alias}." if alias else ""
    return (f"({a}vec_id % {_PQ_QMOD} = 0"
            f" AND {a}vec_id < {_PQ_QCAP})")


def _pq_subvectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, m, sv): each embedding split into M contiguous
    subvectors — JVM slice expressions, no explode of the dims."""
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    return e.select(
        "vec_id",
        F.explode(F.array(*[F.lit(m) for m in range(_PQ_M)])).alias("m"),
        "v",
    ).select(
        "vec_id",
        "m",
        F.expr(f"slice(v, m * {_PQ_DIM} + 1, {_PQ_DIM})").alias("sv"),
    )


def _pq_dist_milli(a, b):
    """Squared L2 distance in integer milli-units: the ONLY float→int
    rounding in the PQ pipeline, so downstream sums and ranks are
    integer-exact across engines and partitionings."""
    d2 = F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return F.round(d2 * 1000).cast("long")


def _dlits(xs) -> str:
    """SQL double literals for a collected vector window. ``repr`` of a
    Python float is the shortest decimal that round-trips to the same
    IEEE double, and Spark's parser does correctly-rounded decimal →
    binary, so the embedded values are bit-identical to ``F.lit``'s."""
    return ", ".join(f"{float(x)!r}D" for x in xs)


def _dist_sql(a: str, b, dim: int, a_off: int = 0, b_off: int = 0) -> str:
    """The :func:`_pq_dist_milli` fold over a static window of column
    ``a`` against literal window ``b``, as ONE SQL fragment — see the
    r09 build-path note on :func:`_pq_dist_milli_fixed`."""
    return (
        f"cast(round(1000 * aggregate(zip_with("
        f"slice({a}, {a_off + 1}, {dim}), "
        f"array({_dlits(b[b_off : b_off + dim])}), "
        f"(x, y) -> (x - y) * (x - y)), "
        f"0.0D, (acc, v) -> acc + v)) as bigint)"
    )


def _pq_dist_milli_fixed(a, b, dim: int, a_off: int = 0, b_off: int = 0):
    """``_pq_dist_milli`` over a statically-known window of ``a``/``b``:
    slices ``dim`` elements starting at ``a_off``/``b_off`` (0-based) and
    applies the SAME left-associated fold, so values are bit-identical to
    slicing first and calling ``_pq_dist_milli``. ``b`` may be a Python
    list of floats, in which case the window is embedded as an array
    literal (bit-exact: the collected values are engine-cast doubles).

    r08 measurement note (guide §1/§4): a fully-unrolled flat
    ``0.0 + t₀ + …`` expression tree was tried here to escape the
    interpreted ``zip_with``/``aggregate`` lambdas — at 1024 terms it
    exceeds janino's method limits, whole-stage codegen FAILS to compile
    (per-stage compile attempts + interpreted fallback made the PQ family
    ~10× slower: 15.6 s vs 1.0 s for ``emb_pq_ivf_residual``), so the
    fold form is deliberately kept.

    r09 measurement note: the deferred "middle ground" — unrolling ONLY
    the short ``dim <= 16`` per-subspace folds (16 flat
    ``element_at − lit`` terms each, same left association) while keeping
    the 64-dim cell-rank folds as ``zip_with``/``aggregate`` — was
    implemented and measured 5-8× SLOWER interleaved at sf0.1
    (emb_pq_adc_topk 1.34 → 10.2 s min, emb_pq_ivf_adc 1.76 → 9.4 s,
    emb_pq_codebooks 0.82 → 5.3 s): the janino blow-up is driven by the
    TOTAL generated-code size of the projection (M×K = 64 unrolled
    16-term fields is still ~1024 terms in one stage), not by the width
    of any single fold. Do not retry per-subspace unrolls; any future
    attempt must cut the per-stage term count, not re-slice it.

    r09 build-path note (guide §7.3 — planning/driver time IS wall
    time for the oracle and correctness gates): when ``a`` is a column
    NAME and ``b`` a literal codebook window, the whole fold is emitted
    as ONE ``F.expr`` SQL string (:func:`_dist_sql`) instead of ~8 py4j
    lambda round-trips — constructing the 64-fold PQ encode dropped
    from ~9.4 s to milliseconds of driver time, with an identical
    resolved expression (the SQL parser builds the same ZipWith/
    ArrayAggregate/Round nodes; the array literal constant-folds to the
    same Literal — r08's hex-check argument)."""
    if isinstance(b, (list, tuple)) and isinstance(a, str):
        return F.expr(_dist_sql(a, b, dim, a_off, b_off))
    a = F.col(a) if isinstance(a, str) else a
    a = F.slice(a, a_off + 1, dim)
    if isinstance(b, (list, tuple)):
        # ONE ArrayType Literal node, not CreateArray(dim × Literal)
        # (r08, guide §1/§7.2: per-element lits made every PQ/ANN plan
        # carry thousands of literal nodes — Catalyst re-walks them per
        # optimizer rule and the driver pays one py4j round-trip per
        # element at build time; a list literal is bit-identical — same
        # IEEE doubles, hex-checked — and collapses both costs)
        b = F.lit([float(x) for x in b[b_off : b_off + dim]])
    else:
        b = F.col(b) if isinstance(b, str) else b
        if b_off:
            b = F.slice(b, b_off + 1, dim)
    return _pq_dist_milli(a, b)


def _pq_parallelize(spark: SparkSession, sf_dir: str, df: DataFrame) -> DataFrame:
    """Spread a heavy in-row PQ/ANN projection (or the stream side of a
    broadcast join that evaluates one per matched row) across cores when
    the backing scan cannot split (r09, guide §2.2/§2.5): a
    sub-row-group parquet file yields ONE non-empty scan partition no
    matter how many byte-range splits Spark makes, so every interpreted
    distance fold of the corpus runs SERIALLY in one task (measured:
    the sf0.1 encode is 1.28 s serial vs 0.74 s over 32 tasks). Small
    inputs pay one trivial round-robin exchange of slim vector rows;
    big inputs — where the scan has many natural splits and a corpus
    exchange is exactly what the family's scale shapes avoid — skip it.
    Routed by the same size conf as the PQ scan fuse
    (spark.bulker.pqfuse.*): above the threshold the plan is untouched.

    Results are unaffected: downstream aggregations are keyed, sums are
    integer milli-units (order-free), and every rank tie-breaks on ids."""
    from bulker_spark.plans._common import pq_fused_route

    if pq_fused_route(spark, os.path.join(sf_dir, "embeddings.parquet")):
        return df
    return df.repartition(spark.sparkContext.defaultParallelism)


def _collect_centroids(spark: SparkSession, sf_dir: str) -> list:
    """The ``_PQ_K`` lowest-id vectors pulled to the driver — the k-row
    scalar-pull discipline shared with ``emb_ann_ivf`` / the k-means
    centroid loop. Returns ``[(cell_id, [float64, ...])]`` sorted by id;
    the float→double cast happens engine-side so the collected values are
    bit-exact, and ``F.lit`` re-embeds the same IEEE doubles."""
    rows = (
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < _PQ_K)
        .select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        )
        .collect()
    )
    return sorted((r["vec_id"], list(r["v"])) for r in rows)


def _cell_rank_array(v_col, cents, with_cv: bool = False):
    """In-row coarse-cell ranking (r08, guide §2.4): a sorted array of
    ``struct(dmilli, cell[, cv])`` over the collected centroid literals —
    element 0 is the assignment, a slice is the probe set. Replaces the
    broadcast-join + ``Window.partitionBy(vec_id)`` argmin the IVF family
    used before: the same (dmilli, cell) tie-break, but a pure map over
    the scan, so every re-reference costs a scan instead of an exchange
    + sort. ``with_cv=True`` carries each centroid's vector through the
    struct (for residual computation); (dmilli, cell) is unique per row,
    so the sort never compares the cv field.

    Non-empty guarantee: the result is a LITERAL fixed-width array (one
    struct per collected centroid, ``len(cents) == _PQ_K > 0``), never
    empty or null — callers rely on this to use ``explode_outer`` /
    slice without introducing null rows (the r08 12x-regression fix
    depends on the outer variant skipping ``InferFiltersFromGenerate``).

    ``v_col`` is a column NAME: the whole ranking is emitted as ONE
    ``F.expr`` (r09 build-path note on :func:`_pq_dist_milli_fixed`)."""
    assert len(cents) > 0, "empty centroid set"
    assert isinstance(v_col, str), "v_col must be a column name"
    entries = []
    for cell, cv in cents:
        fields = [
            f"'dmilli', {_dist_sql(v_col, cv, len(cv))}",
            f"'cell', {int(cell)}L",
        ]
        if with_cv:
            fields.append(f"'cv', array({_dlits(cv)})")
        entries.append("named_struct(" + ", ".join(fields) + ")")
    return F.expr("sort_array(array(" + ", ".join(entries) + "))")


def _pq_codes_col(v_col, book, dim: int = _PQ_DIM, n_sub: int = _PQ_M):
    """In-row per-subspace PQ encoding of ``v_col`` against a collected
    codebook ``[(cid, vec), ...]``: an array of ``n_sub`` structs
    ``(m, best=(dmilli, cid))`` where ``best`` is the ``array_min``
    lexicographic argmin — exactly ``ORDER BY dmilli, cid`` rank 1. The
    codebook may be full-width vectors (sliced per subspace here) or,
    for residual PQ, residual vectors of the same width.

    Non-empty guarantee: the result is a LITERAL ``n_sub``-element array
    (``n_sub == _PQ_M > 0``, ``len(book) == _PQ_K > 0``), never empty or
    null — callers rely on this to ``explode_outer`` it without
    introducing null rows (the outer variant is what keeps
    ``InferFiltersFromGenerate`` from re-inlining the encode into scan
    DataFilters; see the r08 repair notes).

    ``v_col`` is a column NAME: the whole encode is emitted as ONE
    ``F.expr`` (r09 build-path note on :func:`_pq_dist_milli_fixed` —
    the M×K lambda-built fold tree cost ~9.4 s of py4j chatter per
    query build, which the oracle/correctness gates pay as wall time)."""
    assert len(book) > 0 and n_sub > 0, "empty PQ codebook"
    assert isinstance(v_col, str), "v_col must be a column name"
    subs = []
    for m in range(n_sub):
        entries = ", ".join(
            f"named_struct("
            f"'dmilli', {_dist_sql(v_col, cv, dim, m * dim, m * dim)}, "
            f"'cid', {int(cid)}L)"
            for cid, cv in book
        )
        subs.append(
            f"named_struct('m', {m}, 'best', array_min(array({entries})))"
        )
    return F.expr("array(" + ", ".join(subs) + ")")


def _pq_codes(
    spark: SparkSession, sf_dir: str, cents: list | None = None
) -> DataFrame:
    """PQ encoding: (vec_id, m, code, dmilli) — per subspace, the nearest
    of the K centroids (ties → lowest centroid id).

    Scale shape (r08 rewrite, guide §2.4): the K×M codebook is collected
    once (k-row scalar pull — raw parquet values, no driver float math)
    and the per-(vec, m) argmin computes IN-ROW via ``array_min`` over
    ``struct(dmilli, cid)`` literals, replacing the previous
    broadcast-join + per-(vec, m) rank-1 window: the corpus is scanned,
    never shuffled, for encoding — zero exchanges where there was an
    exchange + sort. ``array_min`` on structs is lexicographic
    (dmilli, cid), exactly the old ``ORDER BY dmilli, cid`` rank-1 row."""
    if cents is None:
        cents = _collect_centroids(spark, sf_dir)
    e = _pq_parallelize(
        spark,
        sf_dir,
        _t(spark, sf_dir, "embeddings").select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        ),
    )
    per_m = _pq_codes_col("v", cents)
    return e.select("vec_id", F.explode(per_m).alias("mc")).select(
        "vec_id",
        F.col("mc.m").alias("m"),
        F.col("mc.best.cid").alias("code"),
        F.col("mc.best.dmilli").alias("dmilli"),
    )


def emb_pq_codebooks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Codebook utilization audit: per (subspace, code) the number of
    assigned vectors and the total quantization error — the health check
    before shipping a PQ index (dead codes / fat codes mean the codebook
    fits the data badly)."""
    codes = _pq_codes(spark, sf_dir)
    return (
        codes.groupBy("m", "code")
        .agg(
            F.count("*").alias("n_assigned"),
            F.sum("dmilli").cast("long").alias("total_err_milli"),
        )
        .select(
            F.col("m").cast("int").alias("subspace"),
            F.col("code").cast("long").alias("code"),
            F.col("n_assigned").cast("long").alias("n_assigned"),
            "total_err_milli",
        )
        .orderBy("subspace", "code")
    )


_PQ_SUBS_DUCK = f"""
  SELECT vec_id, g.m,
         list_transform(
             embedding[g.m * {_PQ_DIM} + 1 : (g.m + 1) * {_PQ_DIM}],
             x -> x::DOUBLE
         ) AS sv
  FROM embeddings,
       (SELECT unnest(range({_PQ_M})) AS m) g
"""

# element-wise squared-L2 in milli-units via an index join (DuckDB's list
# lambdas can't zip two columns); the SUM's order nondeterminism is erased
# by the single ROUND into integer milli-units
_PQ_CODES_DUCK = f"""
subs AS ({_PQ_SUBS_DUCK}),
subx AS (
  SELECT vec_id, m, unnest(sv) AS x,
         unnest(generate_series(1, {_PQ_DIM})) AS i
  FROM subs
),
cbx AS (
  SELECT vec_id AS cid, m, x AS cx, i
  FROM subx WHERE vec_id < {_PQ_K}
),
dists AS (
  SELECT s.vec_id, s.m, c.cid,
         CAST(ROUND(1000 * SUM((s.x - c.cx) * (s.x - c.cx))) AS BIGINT)
           AS dmilli
  FROM subx s JOIN cbx c ON s.m = c.m AND s.i = c.i
  GROUP BY 1, 2, 3
),
codes AS (
  SELECT vec_id, m, cid AS code, dmilli
  FROM (
    SELECT vec_id, m, cid, dmilli,
           row_number() OVER (
               PARTITION BY vec_id, m ORDER BY dmilli, cid
           ) AS rn
    FROM dists
  ) WHERE rn = 1
)
"""

EMB_PQ_CODEBOOKS_SQL = f"""
WITH {_PQ_CODES_DUCK}
SELECT CAST(m AS INT) AS subspace, CAST(code AS BIGINT) AS code,
       COUNT(*) AS n_assigned,
       CAST(SUM(dmilli) AS BIGINT) AS total_err_milli
FROM codes
GROUP BY 1, 2
ORDER BY subspace, code
"""


def _pq_dtable(
    spark: SparkSession, sf_dir: str, cents: list | None = None
) -> DataFrame:
    """ADC distance table (query_id, m, code, qd_milli) — one row per
    (query, subspace, codebook entry). r08 rewrite (guide §2.4): the
    query set is a PRUNED scan (the ``vec_id`` predicates push down to
    parquet) and the K×M distances compute in-row against collected
    codebook literals, replacing the previous subvector-explode +
    broadcast join. Values are bit-identical: same slices, same fold
    order, same single ROUND. ``cents`` lets a caller that already
    collected the codebook share it (one scalar-pull job per query
    instead of three — r09); the table itself is ONE ``F.expr``
    (build-path note on :func:`_pq_dist_milli_fixed`)."""
    if cents is None:
        cents = _collect_centroids(spark, sf_dir)
    q = (
        _t(spark, sf_dir, "embeddings")
        .filter(_pq_is_query())
        .select(
            F.col("vec_id").alias("query_id"),
            F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        )
    )
    entries = ", ".join(
        f"named_struct('m', {m}, 'code', {int(cid)}L, "
        f"'qd_milli', "
        f"{_dist_sql('v', cv, _PQ_DIM, m * _PQ_DIM, m * _PQ_DIM)})"
        for m in range(_PQ_M)
        for cid, cv in cents
    )
    return q.select(
        "query_id", F.explode(F.expr(f"array({entries})")).alias("t")
    ).select("query_id", "t.m", "t.code", "t.qd_milli")


def emb_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric-distance search (the PQ query path): each query vector
    precomputes its K×M distance table to the codebook; a database
    vector's approximate distance is the sum of M table lookups on its
    codes — no full-vector math per candidate, which is the entire point
    of PQ at 100 TB (the index is M bytes/vector, the scan is a
    lookup-join). Top-3 per query, integer milli distances, id
    tiebreaks.

    Scale shape: the distance table (queries × K × M) broadcasts; the
    candidate side streams through a map-side lookup join + one shuffle
    for the per-query top-k. This is exhaustive ADC (every query scores
    every candidate — the rerank stage); past ~10⁵ queries × 10⁸
    candidates the production layout puts an IVF coarse quantizer in
    front (bucket candidates by nearest coarse centroid, probe a few
    buckets per query) so the pair enumeration drops by the probe
    fraction — the same equi-join shape as the LSH banding queries."""
    cents = _collect_centroids(spark, sf_dir)  # one scalar pull, shared
    dtable = _pq_dtable(spark, sf_dir, cents)
    codes = _pq_codes(spark, sf_dir, cents).filter(
        ~_pq_is_query()
    )
    adc = (
        codes.join(F.broadcast(dtable), ["m", "code"])
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("qd_milli").cast("long").alias("adc_milli"))
    )
    w = Window.partitionBy("query_id").orderBy("adc_milli", "neighbor_id")
    return (
        adc.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("query_id", "neighbor_id", "adc_milli", "rank")
    )


EMB_PQ_ADC_SQL = f"""
WITH {_PQ_CODES_DUCK},
qx AS (
  SELECT vec_id AS query_id, m, x AS qx, i
  FROM subx WHERE {_pq_q_sql()}
),
dtable AS (
  SELECT q.query_id, q.m, c.cid AS code,
         CAST(ROUND(1000 * SUM((q.qx - c.cx) * (q.qx - c.cx))) AS BIGINT)
           AS qd_milli
  FROM qx q JOIN cbx c ON q.m = c.m AND q.i = c.i
  GROUP BY 1, 2, 3
),
adc AS (
  SELECT d.query_id, k.vec_id AS neighbor_id,
         CAST(SUM(d.qd_milli) AS BIGINT) AS adc_milli
  FROM codes k
  JOIN dtable d ON k.m = d.m AND k.code = d.code
  WHERE NOT {_pq_q_sql('k')}
  GROUP BY 1, 2
)
SELECT query_id, neighbor_id, adc_milli,
       CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY adc_milli, neighbor_id
       ) AS BIGINT) AS rank
FROM adc
QUALIFY rank <= 3
"""


_IVF_PROBE = 4  # cells probed per query (of _PQ_K coarse cells)


def emb_pq_ivf_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-pruned ADC — the FAISS IVF+PQ layout, and the scale answer to
    ``emb_pq_adc_topk``'s exhaustive pair enumeration: database vectors
    are bucketed by their nearest coarse centroid (full-vector L2, same
    deterministic 16-vector codebook), each query probes only its
    ``_IVF_PROBE`` nearest cells, and ADC runs over the probed candidates
    alone — pair count drops by the probe fraction (4/16 here; tunable
    independently of corpus size). Non-residual PQ codes (IVFADC's
    residual-encoding refinement changes the codes, not the plan shape).

    Scale shape: coarse centroids and the query probe table broadcast;
    cell assignment is a map-side argmin over the scan; the candidate
    join keys on the cell id, so the corpus never shuffles — only probed
    (query, candidate) rows flow into the top-k."""
    # r08 rewrite (guide §2.4): cell assignment and probe ranking are
    # IN-ROW argmins over the collected centroid literals (the
    # emb_ann_ivf shape) — the previous broadcast-join + rank-1 window
    # cost an exchange + sort per reference; now cells and probes are
    # pure maps over (pruned) scans. Same (dmilli, cell) tie-break.
    # r08 second pass: cell assignment and PQ codes are computed in the
    # SAME projection of ONE corpus scan (both are in-row argmins over
    # the same collected codebook), so the former
    # ``codes ⋈ cand ON vec_id`` self-join — which shuffled the corpus
    # by vec_id twice once the candidate set outgrew broadcast — is
    # gone: candidates attach by the broadcast cell-keyed probe join and
    # carry their codes with them. One corpus scan instead of two, zero
    # corpus-scale joins on vec_id; code values bit-identical
    # (_pq_codes_col is the same expression _pq_codes explodes).
    # r09: the fuse is SIZE-ROUTED (spark.bulker.pqfuse.mode, guide §1:
    # the fused shape measured ~3x slower at bench scale, where the
    # candidate set broadcasts and the vec_id join is free — the fuse's
    # win only materializes once candidates outgrow broadcast). Small
    # inputs keep the two-scan + broadcast-join shape; big inputs get
    # the fused zero-corpus-join shape. Both routes strict-oracled.
    from bulker_spark.plans._common import pq_fused_route

    cents = _collect_centroids(spark, sf_dir)
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    cd_arr = _cell_rank_array("v", cents)
    probes = (
        e.filter(_pq_is_query())
        .select(
            F.col("vec_id").alias("query_id"),
            F.explode(F.slice(cd_arr, 1, _IVF_PROBE)).alias("p"),
        )
        .select("query_id", F.col("p.cell").alias("cell"))
    )

    dtable = _pq_dtable(spark, sf_dir, cents)
    if pq_fused_route(spark, os.path.join(sf_dir, "embeddings.parquet")):
        db = e.filter(~_pq_is_query()).select(
            "vec_id",
            cd_arr[0]["cell"].alias("cell"),
            _pq_codes_col("v", cents).alias("mc"),
        )
        # explode the codes BEFORE the probe join (r08 fix, guide
        # §1/§7.2): whole-stage codegen defers non-key projection
        # expressions on the stream side of a BroadcastHashJoin into the
        # match loop, so the in-row encode argmin was re-evaluated once
        # per MATCHING probe (~nq·probe/K times per corpus row —
        # measured 12x wall on the residual twin). Generate evaluates
        # its input exactly once per input row, so exploding first pins
        # the encode to one evaluation per corpus row; the join then
        # streams (corpus × M) cheap scalar rows through the broadcast
        # hash lookup. Same candidate pairs, same codes, bit-identical
        # sums.
        dbx = db.select(
            "vec_id", "cell", F.explode_outer("mc").alias("mc")
        ).select(
            "vec_id",
            "cell",
            F.col("mc.m").alias("m"),
            F.col("mc.best.cid").alias("code"),
        )
        cand = dbx.join(F.broadcast(probes), "cell")
    else:
        # bench-scale shape (pre-fuse): cell assignment and PQ encoding
        # in separate scans, candidates attached by a broadcast-sized
        # join on vec_id — one fewer explode stage, and the encode scan
        # streams straight into the dtable lookup. _pq_parallelize
        # spreads the corpus cell-rank folds across cores (tiny inputs
        # scan as ONE partition).
        cells = _pq_parallelize(
            spark, sf_dir, e.filter(~_pq_is_query())
        ).select("vec_id", cd_arr[0]["cell"].alias("cell"))
        pairs = cells.join(F.broadcast(probes), "cell").select(
            "query_id", "vec_id"
        )
        codes = _pq_codes(spark, sf_dir, cents)
        cand = codes.join(pairs, "vec_id")
    adc = (
        cand.join(F.broadcast(dtable), ["query_id", "m", "code"])
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("qd_milli").cast("long").alias("adc_milli"))
    )
    w = Window.partitionBy("query_id").orderBy("adc_milli", "neighbor_id")
    return (
        adc.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("query_id", "neighbor_id", "adc_milli", "rank")
    )


EMB_PQ_IVF_ADC_SQL = f"""
WITH {_PQ_CODES_DUCK},
fx AS (
  SELECT vec_id, unnest(list_transform(embedding, x -> x::DOUBLE)) AS x,
         unnest(generate_series(1, {_PQ_M * _PQ_DIM})) AS i
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
  SELECT vec_id, cell, dmilli,
         row_number() OVER (
             PARTITION BY vec_id ORDER BY dmilli, cell
         ) AS rn
  FROM cd
),
cells AS (
  SELECT vec_id, cell FROM ranked
  WHERE rn = 1 AND NOT {_pq_q_sql()}
),
probes AS (
  SELECT vec_id AS query_id, cell FROM ranked
  WHERE rn <= {_IVF_PROBE} AND {_pq_q_sql()}
),
qx AS (
  SELECT vec_id AS query_id, m, x AS qx, i
  FROM subx WHERE {_pq_q_sql()}
),
dtable AS (
  SELECT q.query_id, q.m, c.cid AS code,
         CAST(ROUND(1000 * SUM((q.qx - c.cx) * (q.qx - c.cx))) AS BIGINT)
           AS qd_milli
  FROM qx q JOIN cbx c ON q.m = c.m AND q.i = c.i
  GROUP BY 1, 2, 3
),
cand AS (
  SELECT p.query_id, c.vec_id
  FROM cells c JOIN probes p ON c.cell = p.cell
),
adc AS (
  SELECT d.query_id, k.vec_id AS neighbor_id,
         CAST(SUM(d.qd_milli) AS BIGINT) AS adc_milli
  FROM codes k
  JOIN cand ON k.vec_id = cand.vec_id
  JOIN dtable d ON d.query_id = cand.query_id
       AND k.m = d.m AND k.code = d.code
  GROUP BY 1, 2
)
SELECT query_id, neighbor_id, adc_milli,
       CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY adc_milli, neighbor_id
       ) AS BIGINT) AS rank
FROM adc
QUALIFY rank <= 3
"""


_RES_CB_LO, _RES_CB_HI = _PQ_K, 2 * _PQ_K  # residual-codebook seed ids


def emb_pq_ivf_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Residual-encoding IVFADC — the full FAISS IVFADC construction
    (Jégou et al. 2011 §IV): PQ codes are computed on the RESIDUAL
    ``v − centroid(cell(v))`` rather than the raw vector, which is what
    makes a 16-cell coarse quantizer + 16-code-per-subspace PQ usable —
    residual energy is a fraction of vector energy, so the same code
    budget quantizes far finer. The query side pays for it: the distance
    table is per (query, PROBED CELL) — the query's residual differs in
    every probed cell — so the table is nprobe× larger than
    ``emb_pq_ivf_adc``'s, still O(queries × nprobe × K × M), independent
    of corpus size.

    Scale shape: identical to ``emb_pq_ivf_adc`` — coarse centroids,
    probe table, residual codebook, and distance tables all broadcast;
    residual computation is a map-side ``zip_with`` over the scan; the
    corpus never shuffles (cell-keyed candidate join), and only probed
    (query, candidate) rows reach the top-k. Residual seeds are the
    vectors with ids [16, 32) — ids < 16 are the coarse centroids, whose
    residuals are identically zero."""
    # r08 rewrite (guide §2.4): assignment, probes, and BOTH residual
    # computations are in-row over the collected centroid literals — the
    # probe structs carry each probed cell's centroid vector
    # (with_cv=True), so the query residual per probed cell needs no
    # join at all.
    # r08 second pass (same fuse as emb_pq_ivf_adc): the 16 residual
    # codebook seeds are computed ENGINE-SIDE on a pruned scan and
    # collected (k-row scalar pull of engine-subtracted doubles — no
    # driver float math), so per-vector residual codes are an IN-ROW
    # argmin in the SAME projection as the cell assignment. The former
    # corpus-scale ``scored`` broadcast join + (vec_id, cell, m)
    # aggregate and the ``codes ⋈ cand ON vec_id`` self-join — two
    # corpus-scale exchanges once candidates outgrow broadcast — are
    # gone; candidates attach by the broadcast cell-keyed probe join
    # carrying their codes. One corpus scan, zero corpus-scale joins.
    # r09: size-routed like emb_pq_ivf_adc (spark.bulker.pqfuse.mode) —
    # at bench scale the fuse measured slower than the two-scan +
    # broadcast-join shape, so small inputs keep the join shape.
    from bulker_spark.plans._common import pq_fused_route

    fused = pq_fused_route(
        spark, os.path.join(sf_dir, "embeddings.parquet")
    )
    cents = _collect_centroids(spark, sf_dir)
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    cd_arr = _cell_rank_array("v", cents, with_cv=True)
    base = e.select("vec_id", "v", cd_arr.alias("cd"))
    rv_col = F.zip_with("v", F.col("cd")[0]["cv"], lambda x, y: x - y)

    def sub_explode(df, keep):
        return df.select(
            *keep,
            F.explode(
                F.array(*[F.lit(m) for m in range(_PQ_M)])
            ).alias("m"),
            "rv",
        ).select(
            *keep,
            "m",
            F.expr(f"slice(rv, m * {_PQ_DIM} + 1, {_PQ_DIM})").alias("sv"),
        )

    if fused:
        # residual codebook: seeds' engine-computed residuals,
        # re-embedded as literals for the in-row argmin AND kept as a
        # frame for the query-side distance tables (identical doubles
        # both ways)
        seed_rows = (
            base.filter(
                (F.col("vec_id") >= _RES_CB_LO)
                & (F.col("vec_id") < _RES_CB_HI)
            )
            .select("vec_id", rv_col.alias("rv"))
            .collect()
        )
        rbook = sorted((r["vec_id"], list(r["rv"])) for r in seed_rows)
        rcb = spark.createDataFrame(
            [
                (int(cid), m, rv[m * _PQ_DIM : (m + 1) * _PQ_DIM])
                for cid, rv in rbook
                for m in range(_PQ_M)
            ],
            "cid bigint, m int, cv2 array<double>",
        )

        # rv must be a REAL column before the encode: passing the rv
        # EXPRESSION into _pq_codes_col inlines the whole cell-rank sort
        # into each of the M×K fold subtrees at construction time (the
        # cell ranking re-evaluated 64× per row — measured ~10× wall);
        # as a multiply-referenced non-cheap column, CollapseProject
        # keeps the projection boundary and it is evaluated once per
        # row.
        dbr = base.filter(~_pq_is_query()).select(
            "vec_id",
            F.col("cd")[0]["cell"].alias("cell"),
            rv_col.alias("rv"),
        )
        db = dbr.select(
            "vec_id",
            "cell",
            _pq_codes_col("rv", rbook).alias("mc"),
        )
    else:
        # bench-scale shape (pre-fuse): residual subvectors of every
        # vector in one frame; the seed residuals stay an engine frame
        # (no collect) and the per-(vec, m) argmin is a min-struct
        # aggregate over the broadcast codebook join. The corpus-side
        # cell-rank + residual folds run over a _pq_parallelize'd scan
        # (tiny inputs scan as ONE partition — the folds were serial).
        base_par = _pq_parallelize(spark, sf_dir, e).select(
            "vec_id", "v", cd_arr.alias("cd")
        )
        rsubs = sub_explode(
            base_par.select(
                "vec_id",
                F.col("cd")[0]["cell"].alias("cell"),
                rv_col.alias("rv"),
            ),
            ["vec_id", "cell"],
        )
        rcb = rsubs.filter(
            (F.col("vec_id") >= _RES_CB_LO) & (F.col("vec_id") < _RES_CB_HI)
        ).select(F.col("vec_id").alias("cid"), "m", F.col("sv").alias("cv2"))
        scored = (
            rsubs.filter(~_pq_is_query())
            .join(F.broadcast(rcb), "m")
            .select(
                "vec_id",
                "cell",
                "m",
                "cid",
                _pq_dist_milli_fixed("sv", "cv2", _PQ_DIM).alias("dmilli"),
            )
        )
        codes = (
            scored.groupBy("vec_id", "cell", "m")
            .agg(F.min(F.struct("dmilli", "cid")).alias("best"))
            .select("vec_id", "cell", "m", F.col("best.cid").alias("code"))
        )

    # query residual PER PROBED CELL → per-cell distance tables; the
    # probed cell's centroid rides the probe struct, so this is a pure
    # map over the pruned query scan
    qprobe = base.filter(_pq_is_query()).select(
        F.col("vec_id").alias("query_id"),
        "v",
        F.explode(F.slice("cd", 1, _IVF_PROBE)).alias("p"),
    )
    qsubs = sub_explode(
        qprobe.select(
            "query_id",
            F.col("p.cell").alias("cell"),
            F.zip_with("v", F.col("p.cv"), lambda x, y: x - y).alias("rv"),
        ),
        ["query_id", "cell"],
    )
    dtable = qsubs.join(F.broadcast(rcb), "m").select(
        "query_id",
        "cell",
        "m",
        F.col("cid").alias("code"),
        _pq_dist_milli_fixed("sv", "cv2", _PQ_DIM).alias("qd_milli"),
    )
    probes = qprobe.select("query_id", F.col("p.cell").alias("cell"))
    if fused:
        # explode codes BEFORE the probe join — same fix as
        # emb_pq_ivf_adc: the deferred stream-side projection re-ran the
        # (cell-rank + residual + encode) expression chain once per
        # matching probe inside the broadcast join's match loop
        # (measured 2.5 s -> 30.6 s at sf0.1); Generate forces exactly
        # one evaluation per corpus row.
        dbx = db.select(
            "vec_id", "cell", F.explode_outer("mc").alias("mc")
        ).select(
            "vec_id",
            "cell",
            F.col("mc.m").alias("m"),
            F.col("mc.best.cid").alias("code"),
        )
        matched = dbx.join(F.broadcast(probes), "cell")
    else:
        cand = (
            base_par.filter(~_pq_is_query())
            .select("vec_id", F.col("cd")[0]["cell"].alias("cell"))
            .join(F.broadcast(probes), "cell")
            .select("query_id", "vec_id")
        )
        matched = codes.join(cand, "vec_id")
    adc = (
        matched.join(F.broadcast(dtable), ["query_id", "cell", "m", "code"])
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("qd_milli").cast("long").alias("adc_milli"))
    )
    w = Window.partitionBy("query_id").orderBy("adc_milli", "neighbor_id")
    return (
        adc.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("query_id", "neighbor_id", "adc_milli", "rank")
    )


EMB_PQ_IVF_RESIDUAL_SQL = f"""
WITH fx AS (
  SELECT vec_id, unnest(list_transform(embedding, x -> x::DOUBLE)) AS x,
         unnest(generate_series(1, {_PQ_M * _PQ_DIM})) AS i
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
  SELECT vec_id, cell, dmilli,
         row_number() OVER (
             PARTITION BY vec_id ORDER BY dmilli, cell
         ) AS rn
  FROM cd
),
assign AS (SELECT vec_id, cell FROM ranked WHERE rn = 1),
probes AS (
  SELECT vec_id AS query_id, cell FROM ranked
  WHERE rn <= {_IVF_PROBE} AND {_pq_q_sql()}
),
rx AS (
  SELECT f.vec_id, a.cell, f.i, f.x - c.cx AS r
  FROM fx f
  JOIN assign a ON f.vec_id = a.vec_id
  JOIN ccx c ON c.cell = a.cell AND c.i = f.i
),
rcbx AS (
  SELECT vec_id AS cid, i, r AS c2
  FROM rx WHERE vec_id >= {_RES_CB_LO} AND vec_id < {_RES_CB_HI}
),
scored AS (
  SELECT r.vec_id, r.cell, (r.i - 1) // {_PQ_DIM} AS m, c.cid,
         CAST(ROUND(1000 * SUM((r.r - c.c2) * (r.r - c.c2))) AS BIGINT)
           AS dmilli
  FROM rx r JOIN rcbx c ON r.i = c.i
  WHERE NOT {_pq_q_sql('r')}
  GROUP BY 1, 2, 3, 4
),
codes AS (
  SELECT vec_id, cell, m, cid AS code
  FROM (
    SELECT vec_id, cell, m, cid, dmilli,
           row_number() OVER (
               PARTITION BY vec_id, m ORDER BY dmilli, cid
           ) AS rn
    FROM scored
  ) WHERE rn = 1
),
qrx AS (
  SELECT p.query_id, p.cell, f.i, f.x - c.cx AS r
  FROM fx f
  JOIN probes p ON f.vec_id = p.query_id
  JOIN ccx c ON c.cell = p.cell AND c.i = f.i
),
dtable AS (
  SELECT q.query_id, q.cell, (q.i - 1) // {_PQ_DIM} AS m, c.cid AS code,
         CAST(ROUND(1000 * SUM((q.r - c.c2) * (q.r - c.c2))) AS BIGINT)
           AS qd_milli
  FROM qrx q JOIN rcbx c ON q.i = c.i
  GROUP BY 1, 2, 3, 4
),
cand AS (
  SELECT p.query_id, a.vec_id
  FROM assign a JOIN probes p ON a.cell = p.cell
  WHERE NOT {_pq_q_sql('a')}
),
adc AS (
  SELECT d.query_id, k.vec_id AS neighbor_id,
         CAST(SUM(d.qd_milli) AS BIGINT) AS adc_milli
  FROM codes k
  JOIN cand ON k.vec_id = cand.vec_id
  JOIN dtable d ON d.query_id = cand.query_id AND d.cell = k.cell
       AND k.m = d.m AND k.code = d.code
  GROUP BY 1, 2
)
SELECT query_id, neighbor_id, adc_milli,
       CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY adc_milli, neighbor_id
       ) AS BIGINT) AS rank
FROM adc
QUALIFY rank <= 3
"""


# ==========================================================================
# Benchmark-contamination scan (eval-vs-train 8-gram overlap)
# ==========================================================================

_CONTAM_EVAL_MOD = 50  # doc_id % 50 == 0 → the held-out "benchmark" split


def doc_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per eval document, the fraction of its distinct character 8-grams
    that appear anywhere in the training split — the decontamination
    scan run before training on scraped corpora (an eval doc with high
    overlap leaked into the training set). Same shingling as the dedup
    tier (``doc_dup_ngram_coverage``).

    Scale shape: shingles are generated AND hashed in-row (transform
    over sequence → xxhash64, zero shuffle, the full text never leaves
    its scan task), so everything downstream — the train-side distinct,
    the eval⋈train membership join — shuffles fixed 8-byte ints instead
    of raw 8-char strings, the same shape as ``doc_ngram_novelty``
    (previously this was the slowest analytic precisely because it
    shuffled raw shingle strings through distinct() and the join). The
    train side reduces to a distinct hash set (one shuffle, map-side
    combine); the eval side is a fixed small fraction of the corpus, so
    the per-doc rollup shuffles only eval keys. Membership is preserved
    under the hash (64-bit collisions are negligible at any realistic
    corpus, and the oracle hashes identically on its side)."""
    d = _t(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(length(text) - 7, 1)),"
                " i -> xxhash64(substring(text, i, 8)))"
            )
        ).alias("h"),
    ).distinct()
    # r08 audit note (guide §7.2): the apparent hazard here — the full
    # (doc_id, h) distinct feeding BOTH splits, with the train side then
    # re-deduping on bare h — does not survive optimization: Catalyst
    # pushes each split's doc_id predicate through the aggregate into its
    # own pruned scan and removes the now-redundant inner distinct
    # (verified: a filter-before-distinct source rewrite produced a
    # byte-identical physical plan, plans/r08/doc_contamination_*.txt).
    # Each split pays exactly one exchange; the train side's carries
    # bare 8-byte hashes with map-side partial aggregation.
    eval_sh = sh.filter(F.col("doc_id") % _CONTAM_EVAL_MOD == 0)
    train_sh = (
        sh.filter(F.col("doc_id") % _CONTAM_EVAL_MOD != 0)
        .select("h")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    return (
        eval_sh.join(train_sh, "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.coalesce("__hit", F.lit(0)))
            .cast("long")
            .alias("n_contaminated"),
        )
        .select(
            "doc_id",
            F.col("n_shingles").cast("long").alias("n_shingles"),
            "n_contaminated",
            F.round(
                F.col("n_contaminated") / F.col("n_shingles"), 4
            ).alias("contamination_rate"),
        )
        .orderBy("doc_id")
    )


DOC_CONTAMINATION_SQL = f"""
WITH sh AS (
  -- hash(shingle) membership, mirroring the Spark side's xxhash64: the
  -- hash values themselves never reach the output, only membership
  -- counts, so the engines' different 64-bit hash functions agree
  SELECT DISTINCT doc_id, hash(sh) AS h
  FROM (
    SELECT d.doc_id, substr(d.text, g.i::INT, 8) AS sh
    FROM documents d,
         LATERAL (SELECT unnest(generate_series(
             1, greatest(length(d.text) - 7, 1))) AS i) g
  )
),
train AS (
  SELECT DISTINCT h FROM sh WHERE doc_id % {_CONTAM_EVAL_MOD} <> 0
)
SELECT e.doc_id,
       COUNT(*) AS n_shingles,
       CAST(SUM(CASE WHEN t.h IS NULL THEN 0 ELSE 1 END) AS BIGINT)
         AS n_contaminated,
       ROUND(SUM(CASE WHEN t.h IS NULL THEN 0 ELSE 1 END)::DOUBLE
             / COUNT(*), 4) AS contamination_rate
FROM sh e LEFT JOIN train t ON e.h = t.h
WHERE e.doc_id % {_CONTAM_EVAL_MOD} = 0
GROUP BY 1
ORDER BY doc_id
"""


# ==========================================================================
# Exact per-language length deciles (corpus profiling)
# ==========================================================================


def doc_length_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p90/p99 of document length per language — the corpus
    profile that drives truncation/packing decisions. EXACT quantiles by
    rank (value at ``ceil(q·n)`` in (n_chars, doc_id) order), not
    ``percentile_approx``: approx sketches are engine-specific, ranks are
    reproducible everywhere.

    Scale shape (r08 rewrite, guide §2.5): the previous form ran
    row_number + count windows PARTITIONED BY lang over the raw corpus —
    with single-digit |langs| that is 1/|langs| of the corpus sorted in
    ONE task, the low-cardinality twin of the per-user hot-key walls
    (and the docstring used to defer it to "a two-pass split at
    100 TB"). Past the ``spark.bulker.lowcard`` size threshold the
    corpus collapses map-side into a (lang, n_chars) histogram — the
    ``doc_length_quantiles`` layout — and the rank readout runs over
    |langs| × |distinct lengths| rows: value at rank ``ceil(q·n)`` is
    the unique histogram bucket whose cumulative count straddles the
    rank (``cum − c < rank ≤ cum``), bit-identical to the row_number
    form because equal lengths are rank-adjacent (the doc_id tiebreak
    never changes the VALUE at a rank; same ``ceil(q · n)`` rank
    arithmetic on the same types). Below the threshold the naive keyed
    sort stays — it is ~0.15 s cheaper at bench scale (measured
    interleaved min 0.25 vs 0.39 s at sf0.1), the same
    insurance-when-needed routing as ``spark.bulker.hotkey.mode``."""
    from bulker_spark.plans._common import lowcard_histogram_route

    import os as _os

    if not lowcard_histogram_route(
        spark, _os.path.join(sf_dir, "documents.parquet")
    ):
        d = _t(spark, sf_dir, "documents").select(
            "lang", "n_chars", "doc_id"
        )
        w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
        r = d.select(
            "lang",
            "n_chars",
            F.row_number().over(w).alias("rn"),
            F.count("*").over(Window.partitionBy("lang")).alias("n"),
        )

        def at_rn(q: float):
            return F.max(
                F.when(
                    F.col("rn") == F.ceil(F.lit(q) * F.col("n")),
                    F.col("n_chars"),
                )
            ).cast("long")

        return (
            r.groupBy("lang")
            .agg(
                F.max("n").cast("long").alias("n_docs"),
                at_rn(0.5).alias("p50_chars"),
                at_rn(0.9).alias("p90_chars"),
                at_rn(0.99).alias("p99_chars"),
            )
            .orderBy("lang")
        )

    d = _t(spark, sf_dir, "documents").select("lang", "n_chars")
    hist = d.groupBy("lang", "n_chars").agg(F.count("*").alias("c"))
    wp = Window.partitionBy("lang")
    cum = hist.withColumn("n", F.sum("c").over(wp)).withColumn(
        "cum", F.sum("c").over(wp.orderBy("n_chars"))
    )

    def at(q: float):
        rank = F.ceil(F.lit(q) * F.col("n"))
        # exactly one bucket straddles the rank — max() reads it off
        # (exact even for a NULL length group, which sorts first and
        # would be read back as NULL, matching the row_number form)
        return F.max(
            F.when(
                (F.col("cum") >= rank) & (F.col("cum") - F.col("c") < rank),
                F.col("n_chars"),
            )
        ).cast("long")

    return (
        cum.groupBy("lang")
        .agg(
            F.max("n").cast("long").alias("n_docs"),
            at(0.5).alias("p50_chars"),
            at(0.9).alias("p90_chars"),
            at(0.99).alias("p99_chars"),
        )
        .orderBy("lang")
    )


DOC_LENGTH_DECILES_SQL = """
WITH r AS (
  SELECT lang, n_chars,
         row_number() OVER (
             PARTITION BY lang ORDER BY n_chars, doc_id
         ) AS rn,
         COUNT(*) OVER (PARTITION BY lang) AS n
  FROM documents
)
SELECT lang,
       CAST(MAX(n) AS BIGINT) AS n_docs,
       CAST(MAX(CASE WHEN rn = CEIL(0.5 * n) THEN n_chars END) AS BIGINT)
         AS p50_chars,
       CAST(MAX(CASE WHEN rn = CEIL(0.9 * n) THEN n_chars END) AS BIGINT)
         AS p90_chars,
       CAST(MAX(CASE WHEN rn = CEIL(0.99 * n) THEN n_chars END) AS BIGINT)
         AS p99_chars
FROM r
GROUP BY lang
ORDER BY lang
"""


# ==========================================================================
# Fixed-point HITS on the customer↔part bipartite purchase graph
# ==========================================================================

_HITS_SCALE = 10**7
_HITS_MAX_PART = 300


def parts_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hub/authority scores (Kleinberg 1999) on the customer→part
    purchase graph: two alternating update rounds, each followed by
    sum-normalization — in integer fixed-point (mass scaled by 10⁷,
    normalization is ``mass * SCALE div total``), so the result is
    bit-exact on any engine or partitioning; the L2 normalization that
    makes textbook HITS float-bound is replaced by the L1 variant, which
    has the same fixpoint direction and stays in integers. Completes the
    graph-retrieval family next to ``parts_salsa`` (degree-normalized)
    and ``parts_pagerank`` (damped).

    Scale shape: identical to parts_salsa — cached edge list, one
    shuffle-join + map-side-combined integer sum per half-round, plus an
    O(1) scalar total per normalization."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_partkey") < _HITS_MAX_PART)
        .select("l_orderkey", "l_partkey")
    )
    edges = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
        .persist()
    )
    n_cust = edges.select("c").distinct().count()
    hub = edges.select("c").distinct().select(
        "c", F.lit(_HITS_SCALE // n_cust).cast("long").alias("h")
    )
    auth = None
    for i in range(2):
        # persist each half-round: the normalization scalar and the next
        # hop both consume it — without pinning, every agg(total) re-runs
        # the whole upstream join chain (O(iters²) jobs instead of
        # O(iters)). Tiny aggregates (≤ nodes rows), session-scoped like
        # every catalog persist.
        auth = (
            edges.join(hub, "c")
            .groupBy("p")
            .agg(F.sum("h").alias("a"))
            .persist()
        )
        ta = auth.agg(F.sum("a")).collect()[0][0]
        auth = auth.select(
            "p", F.expr(f"(a * {_HITS_SCALE}) div {ta}").alias("a")
        )
        if i == 1:
            break  # the readout is auth: a final hub update is dead work
        hub = (
            edges.join(auth, "p")
            .groupBy("c")
            .agg(F.sum("a").alias("h"))
            .persist()
        )
        th = hub.agg(F.sum("h")).collect()[0][0]
        hub = hub.select(
            "c", F.expr(f"(h * {_HITS_SCALE}) div {th}").alias("h")
        )
    return auth.select(
        F.col("p").alias("part_id"), F.col("a").cast("long").alias("auth")
    ).orderBy("part_id")


PARTS_HITS_SQL = f"""
WITH l AS (
  SELECT l_orderkey, l_partkey FROM lineitem
  WHERE l_partkey < {_HITS_MAX_PART}
),
edges AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
  FROM l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
nc AS (SELECT COUNT(DISTINCT c) AS nc FROM edges),
h0 AS (
  SELECT DISTINCT c, {_HITS_SCALE} // nc.nc AS h FROM edges, nc
),
a1r AS (
  SELECT e.p, SUM(h0.h) AS a FROM edges e JOIN h0 ON e.c = h0.c GROUP BY 1
),
a1 AS (
  SELECT p, (a * {_HITS_SCALE}) // (SELECT SUM(a) FROM a1r) AS a FROM a1r
),
h1r AS (
  SELECT e.c, SUM(a1.a) AS h FROM edges e JOIN a1 ON e.p = a1.p GROUP BY 1
),
h1 AS (
  SELECT c, (h * {_HITS_SCALE}) // (SELECT SUM(h) FROM h1r) AS h FROM h1r
),
a2r AS (
  SELECT e.p, SUM(h1.h) AS a FROM edges e JOIN h1 ON e.c = h1.c GROUP BY 1
),
a2 AS (
  SELECT p, (a * {_HITS_SCALE}) // (SELECT SUM(a) FROM a2r) AS a FROM a2r
)
SELECT p AS part_id, CAST(a AS BIGINT) AS auth
FROM a2
ORDER BY part_id
"""


# ==========================================================================
# Near-dup cluster formation: connected components over LSH pairs
# ==========================================================================

def doc_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The final step of fuzzy dedup: group LSH candidate pairs into
    CLUSTERS (connected components) and elect one canonical doc per
    cluster — pairs alone under-delete (a~b, b~c leaves a,c both kept).
    Convergence-checked min-doc-id label propagation with pointer
    doubling (``functions.graph.connected_components``): iterates until
    a round changes NO label, capped at log₂(N)+3 rounds (which the
    doubling provably needs at most) with a loud RuntimeWarning if ever
    hit. A fixed unroll was the one place a correct-at-sf0.1 answer
    could go quietly wrong at 100× — a chain-shaped boilerplate family
    (A~B~…~Z via sliding shingle overlap) with diameter beyond the
    unroll silently got SPLIT labels, i.e. under-deletion in exactly the
    scenario dedup exists for (reference dedup is exact by construction,
    ``abstract_transactional.go:439-496``). Integer min: deterministic
    on any engine or partitioning.

    Scale shape: the pair list is tiny next to the corpus (only banded
    collisions), so the label frame is broadcast
    (``broadcast_labels=True``) — each round is map-side joins + one
    min-combine shuffle; at a scale where the collision set itself
    outgrows broadcast, drop the flag and the same plan runs as the
    classic shuffle-join CC (Kiveris et al., "Connected Components in
    MapReduce")."""
    from bulker_spark.functions.graph import connected_components
    from bulker_spark.plans.queries import (  # noqa: PLC0415 — registry
        doc_minhash_lsh_pairs,  # imports this module at its bottom
    )

    pairs = doc_minhash_lsh_pairs(spark, sf_dir)
    lbl = connected_components(
        pairs, src="doc_a", dst="doc_b", broadcast_labels=True
    ).select(F.col("node").alias("id"), F.col("component").alias("c"))
    sizes = lbl.groupBy("c").agg(F.count("*").alias("cluster_size"))
    return (
        lbl.join(F.broadcast(sizes), "c")
        .select(
            F.col("id").alias("doc_id"),
            F.col("c").alias("cluster_id"),
            F.col("cluster_size").cast("long").alias("cluster_size"),
            (F.col("id") == F.col("c")).alias("is_canonical"),
        )
        .orderBy("doc_id")
    )


def _doc_dedup_clusters_sql() -> str:
    # exact transitive closure (recursive CTE), NOT a fixed round count:
    # the Spark side iterates to convergence, so the oracle must be
    # diameter-independent too or a deep component would "fail" the
    # oracle precisely when Spark gets it right
    from bulker_spark.plans._common import DOC_LSH_PAIRS_DUCK

    return f"""
WITH RECURSIVE pairs AS ({DOC_LSH_PAIRS_DUCK}),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION
  SELECT doc_b AS u, doc_a AS v FROM pairs
),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
),
comp AS (
  SELECT u AS id, LEAST(u, MIN(v)) AS c FROM reach GROUP BY u
)
SELECT comp.id AS doc_id, comp.c AS cluster_id,
       CAST(s.n AS BIGINT) AS cluster_size,
       (comp.id = comp.c) AS is_canonical
FROM comp
JOIN (SELECT c, COUNT(*) AS n FROM comp GROUP BY 1) s ON comp.c = s.c
ORDER BY doc_id
"""


DOC_DEDUP_CLUSTERS_SQL = _doc_dedup_clusters_sql()


EXTRA_QUERIES7: dict[str, tuple] = {
    "emb_pq_codebooks": (emb_pq_codebooks, EMB_PQ_CODEBOOKS_SQL),
    "emb_pq_adc_topk": (emb_pq_adc_topk, EMB_PQ_ADC_SQL),
    "doc_contamination": (doc_contamination, DOC_CONTAMINATION_SQL),
    "doc_length_deciles": (doc_length_deciles, DOC_LENGTH_DECILES_SQL),
    "parts_hits": (parts_hits, PARTS_HITS_SQL),
    "doc_dedup_clusters": (doc_dedup_clusters, DOC_DEDUP_CLUSTERS_SQL),
    "emb_pq_ivf_adc": (emb_pq_ivf_adc, EMB_PQ_IVF_ADC_SQL),
    "emb_pq_ivf_residual": (emb_pq_ivf_residual, EMB_PQ_IVF_RESIDUAL_SQL),
}
