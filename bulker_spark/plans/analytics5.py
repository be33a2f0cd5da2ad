"""Round-2 catalog extensions: multimodal perceptual-hash dedup, prefix
fingerprint dedup, int8 embedding quantization, deterministic sampling,
and duplicated-n-gram coverage — each a Catalyst-first plan with a DuckDB
oracle twin.

Reference scope (jitsucom/bulker): none of this exists in the reference
(`SURVEY.md §2` — no similarity ops, no media columns); these extend the
training-data pipeline tier the north star asks for: image near-dup via
LSH-banded aHash, RefinedWeb-style prefix/n-gram duplication signals, and
the quantization/sampling primitives of a 100 TB curation run.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bulker_spark.plans._common import _SHINGLE_DUCK


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# ==========================================================================
# Multimodal near-dup: LSH-banded perceptual hash over image binaries
# ==========================================================================

_AHASH_MAX_DOC = 400
_AHASH_HAMMING = 8


def _docs_with_arith_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attach a deterministic FAKE image whose pixels are an *arithmetic*
    function of doc_id, so the whole decode→hash→pair pipeline is
    oracle-checkable in SQL.

    Image for doc d (8×8 grayscale): with g = d % 40,
      pixel[i] = ((g*37) % 256 + i * (1 + g % 7)
                  + (96 * ((d // 40) % 2) if i == d % 64 else 0)) % 256
    Docs sharing a group g render near-identical images (same gradient),
    differing only in one boosted "hot" pixel — the realistic shape of
    re-encoded / lightly-edited duplicate images."""
    import numpy as np
    from pyspark.sql import types as T

    from bulker_spark.functions.multimodal import make_fake_image_pixels

    docs = (
        _t(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") < _AHASH_MAX_DOC)
    )
    out_schema = T.StructType(
        [*docs.schema.fields, T.StructField("content", T.BinaryType())]
    )

    def encode(batches):
        i = np.arange(64, dtype=np.int64)
        for pdf in batches:
            pdf = pdf.copy()
            content = []
            for d in pdf["doc_id"]:
                d = int(d)
                g = d % 40
                px = ((g * 37) % 256 + i * (1 + g % 7)) % 256
                px[d % 64] = (px[d % 64] + 96 * ((d // 40) % 2)) % 256
                content.append(make_fake_image_pixels(8, 8, px))
            pdf["content"] = content
            yield pdf

    return docs.mapInPandas(encode, schema=out_schema)


def mm_image_ahash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate pairs: perceptual average-hash (aHash) via an
    Arrow-batched decode kernel → 4×16-bit LSH bands → band-equality
    candidate join → JVM xor+bit_count hamming verify (≤ 8 bits).

    Scale shape: pixels never shuffle — the hash kernel reduces each
    image to 4 small ints in the scan stage; the self-join shuffles only
    (doc_id, band, val) tuples; the verify stage is whole-stage-codegen
    integer ops on candidate pairs only (LSH guarantees every hamming≤k
    pair shares a band w.h.p., and the oracle pins the *same* candidate
    semantics: pairs sharing ≥1 band). At 10⁹ images this is the standard
    pHash dedup layout (bands as the shuffle key, verify on pairs)."""
    from bulker_spark.functions.multimodal import image_ahash

    # persist the hash table (5 small ints per image): the plan consumes
    # it four times (bands twice for the self-join, verify twice), and
    # without materialization each consumer would re-run the decode
    # kernel over the full image corpus — at 10⁹ images, 4× the decode
    # cost for no reason. The cached form is ~40 bytes/image.
    hashed = (
        image_ahash(_docs_with_arith_images(spark, sf_dir))
        .select("doc_id", "b0", "b1", "b2", "b3")
        .persist()
    )
    bands = hashed.select(
        "doc_id",
        F.posexplode(F.array("b0", "b1", "b2", "b3")).alias(
            "band_idx", "val"
        ),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    ha, hb = hashed.alias("ha"), hashed.alias("hb")
    ham = sum(
        F.bit_count(
            F.col(f"ha.b{k}").bitwiseXOR(F.col(f"hb.b{k}"))
        ).cast("long")
        for k in range(4)
    )
    return (
        cand.join(ha, F.col("doc_a") == F.col("ha.doc_id"))
        .join(hb, F.col("doc_b") == F.col("hb.doc_id"))
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= _AHASH_HAMMING)
        .select("doc_a", "doc_b", "hamming")
    )


MM_AHASH_PAIRS_SQL = f"""
WITH px AS (
  SELECT doc_id, i,
         (((doc_id % 40) * 37) % 256
          + i * (1 + (doc_id % 40) % 7)
          + CASE WHEN i = doc_id % 64
                 THEN 96 * ((doc_id // 40) % 2) ELSE 0 END) % 256 AS p
  FROM documents, generate_series(0, 63) AS t(i)
  WHERE doc_id < {_AHASH_MAX_DOC}
),
tot AS (SELECT doc_id, SUM(p) AS s FROM px GROUP BY 1),
bits AS (
  SELECT px.doc_id, px.i,
         CASE WHEN px.p * 64 >= tot.s THEN 1 ELSE 0 END AS b
  FROM px JOIN tot USING (doc_id)
),
bands AS (
  SELECT doc_id, CAST(i // 16 AS INT) AS band_idx,
         CAST(SUM(b * (1::BIGINT << CAST(i % 16 AS INT))) AS BIGINT) AS val
  FROM bits GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.val = b.val AND a.doc_id < b.doc_id
),
ham AS (
  SELECT c.doc_a, c.doc_b,
         SUM(bit_count(xor(ba.val, bb.val))) AS hamming
  FROM cand c
  JOIN bands ba ON ba.doc_id = c.doc_a
  JOIN bands bb ON bb.doc_id = c.doc_b AND bb.band_idx = ba.band_idx
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, CAST(hamming AS BIGINT) AS hamming
FROM ham WHERE hamming <= {_AHASH_HAMMING}
"""


# ==========================================================================
# Prefix-fingerprint dedup (RefinedWeb/CCNet-style head-of-document dup)
# ==========================================================================

def doc_prefix_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate groups by first-10-token prefix fingerprint — the cheap
    head-of-document near-dup signal (crawl boilerplate, mirrored intros).

    Scale shape: one hash-agg shuffle on the md5 prefix key (constant
    width regardless of document size — the prefix is cut in the scan
    projection, so full text never crosses the wire); survivors pick the
    min doc_id, the canonical-keeper convention of the dedup family."""
    d = _t(spark, sf_dir, "documents")
    pref = d.select(
        "doc_id",
        F.md5(
            F.array_join(F.slice(F.split(F.col("text"), " "), 1, 10), " ")
        ).alias("prefix_key"),
    )
    return (
        pref.groupBy("prefix_key")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("canonical_doc"),
        )
        .filter(F.col("n_docs") > 1)
    )


DOC_PREFIX_DEDUP_SQL = """
SELECT md5(array_to_string(list_slice(string_split(text, ' '), 1, 10), ' '))
         AS prefix_key,
       COUNT(*) AS n_docs,
       MIN(doc_id) AS canonical_doc
FROM documents
GROUP BY 1 HAVING COUNT(*) > 1
"""


# ==========================================================================
# Embedding int8 quantization (storage/serving compression audit)
# ==========================================================================

def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column (scale =
    max|v| / 127) with a per-label quantized checksum and worst-case
    reconstruction error — the compression-audit pass before shipping
    vectors to an ANN index.

    Scale shape: everything per-row is JVM array expressions (transform /
    aggregate / zip_with — no Python, no explode: a 64-dim corpus never
    fans out 64×); the only shuffle carries |labels| partial aggregates.
    Determinism: the checksum is integer-exact, and the error metric is a
    MAX (order-free), so the oracle hash cannot drift with partitioning."""
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    s = e.withColumn(
        "scale",
        F.array_max(F.transform("v", lambda x: F.abs(x))) / F.lit(127.0),
    ).filter(F.col("scale") > 0)
    r = s.select(
        "label",
        F.aggregate(
            F.transform(
                "v", lambda x: F.round(x / F.col("scale")).cast("long")
            ),
            F.lit(0).cast("long"),
            lambda acc, q: acc + q,
        ).alias("checksum"),
        F.array_max(
            F.transform(
                "v",
                lambda x: F.abs(
                    x - F.round(x / F.col("scale")) * F.col("scale")
                ),
            )
        ).alias("maxerr"),
    )
    return (
        r.groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.sum("checksum").cast("long").alias("q_checksum"),
            F.round(F.max("maxerr"), 6).alias("max_abs_err"),
        )
        .orderBy("label")
    )


EMB_QUANTIZE_SQL = """
WITH s AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> x::DOUBLE) AS vv,
         list_max(list_transform(embedding, x -> abs(x::DOUBLE))) / 127.0
           AS scale
  FROM embeddings
),
r AS (
  SELECT label,
         list_sum(list_transform(vv, x -> CAST(round(x / scale) AS BIGINT)))
           AS checksum,
         list_max(list_transform(vv,
             x -> abs(x - round(x / scale) * scale))) AS maxerr
  FROM s WHERE scale > 0
)
SELECT label, COUNT(*) AS n_vecs,
       CAST(SUM(checksum) AS BIGINT) AS q_checksum,
       ROUND(MAX(maxerr), 6) AS max_abs_err
FROM r GROUP BY label ORDER BY label
"""


# ==========================================================================
# Deterministic k-sample (hash order statistics, no full sort)
# ==========================================================================

_SAMPLE_K = 64


def doc_sample_det_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic exact-k corpus sample: the k smallest md5(doc_id)
    values — reproducible across runs, partitionings, and cluster sizes
    (the property `TABLESAMPLE` and `rand()` both lack).

    Scale shape: orderBy+limit compiles to TakeOrdered — each partition
    keeps its local top-k and only k rows per partition reach the driver;
    no global sort, no single-reducer shuffle. The final rank window runs
    on k rows."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.md5(F.col("doc_id").cast("string")).alias("h")
    )
    top = d.orderBy("h", "doc_id").limit(_SAMPLE_K)
    w = Window.orderBy("h", "doc_id")
    return top.select(
        "doc_id", F.row_number().over(w).cast("long").alias("sample_rank")
    )


DOC_SAMPLE_SQL = f"""
SELECT doc_id,
       CAST(row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
            AS BIGINT) AS sample_rank
FROM documents
ORDER BY sample_rank LIMIT {_SAMPLE_K}
"""


# ==========================================================================
# Duplicated-n-gram coverage (RefinedWeb dup-text fraction)
# ==========================================================================

_COVER_MAX_DOC = 150


def doc_dup_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-content fraction: share of the doc's
    distinct 8-gram shingles that also occur in at least one other doc —
    RefinedWeb's "fraction of duplicated n-grams" quality signal.

    Scale shape: one shuffle keyed on the shingle (hashed, constant
    width), one map-side-combined count, one join back; the 0/1 coverage
    average sums exactly in doubles, so the result is partition-order
    free."""
    d = _t(spark, sf_dir, "documents").filter(
        F.col("doc_id") < _COVER_MAX_DOC
    )
    pos = d.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.lit(1), F.greatest(F.length("text") - F.lit(7), F.lit(1))
            )
        ).alias("i"),
        "text",
    )
    sh = pos.select(
        "doc_id", F.expr("substring(text, i, 8)").alias("sh")
    ).distinct()
    counts = sh.groupBy("sh").agg(F.count("*").alias("n_docs"))
    return (
        sh.join(counts, "sh")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.round(
                F.avg(
                    F.when(F.col("n_docs") > 1, F.lit(1.0)).otherwise(
                        F.lit(0.0)
                    )
                ),
                4,
            ).alias("dup_frac"),
        )
    )


DOC_DUP_COVERAGE_SQL = f"""
WITH sh AS (
  SELECT DISTINCT doc_id, sh
  FROM ({_SHINGLE_DUCK.format(max_doc=_COVER_MAX_DOC)})
),
c AS (SELECT sh, COUNT(*) AS n_docs FROM sh GROUP BY 1)
SELECT sh.doc_id, COUNT(*) AS n_shingles,
       ROUND(AVG(CASE WHEN c.n_docs > 1 THEN 1.0 ELSE 0.0 END), 4)
         AS dup_frac
FROM sh JOIN c USING (sh)
GROUP BY 1
"""


# ==========================================================================
# Fixed-point PageRank over the co-purchase graph (deterministic iterative)
# ==========================================================================

_PR_SCALE = 10**12
_PR_MAX_PART = 300
_PR_ITERS = 2


def parts_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the parts co-purchase graph (edge u→v iff u and v
    appear in the same order), run a fixed number of iterations in
    **integer fixed-point arithmetic** (ranks scaled by 10¹², integer
    division for the deg split and the 0.85 damping) — so the result is
    bit-identical regardless of partitioning, join order, or engine: the
    float-summation nondeterminism that makes naive distributed PageRank
    unreproducible is gone by construction.

    Scale shape: the per-iteration cost is one join (edges × ranks,
    shuffles on the graph key both sides — the same hash partitioning
    reused every iteration) and one map-side-combined integer sum; the
    driver runs O(iters) jobs over a cached edge list. The standard
    Pregel-on-DataFrames layout."""
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_partkey") < _PR_MAX_PART
    )
    sides = l.select("l_orderkey", F.col("l_partkey").alias("u"))
    # persist the topology: deg, nodes, the per-iteration joins and the
    # final readout all fan out from the edge list — without
    # materialization each consumer re-runs the lineitem scan +
    # self-join (O(iters) fact-table scans instead of O(1))
    edges = (
        sides.alias("a")
        .join(
            sides.withColumnRenamed("u", "v").alias("b"),
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.u") != F.col("b.v")),
        )
        .select("u", "v")
        .distinct()
        .persist()
    )
    deg = edges.groupBy("u").agg(F.count("*").alias("deg"))
    nodes = edges.select(F.col("u").alias("part_id")).distinct()
    n = nodes.count()
    base = 15 * (_PR_SCALE // n) // 100
    pr = nodes.withColumn("pr", F.lit(_PR_SCALE // n).cast("long"))
    ed = edges.join(deg, "u")  # (u, v, deg), read from the cached edges
    for _ in range(_PR_ITERS):
        contrib = (
            ed.join(pr, ed.u == pr.part_id)
            .select("v", F.expr("pr div deg").alias("c"))
            .groupBy("v")
            .agg(F.sum("c").alias("contrib"))
        )
        pr = nodes.join(
            contrib, nodes.part_id == contrib.v, "left"
        ).select(
            "part_id",
            (
                F.lit(base)
                + F.expr(
                    f"(85 * coalesce(contrib, 0)) div 100"
                )
            ).cast("long").alias("pr"),
        )
    return pr.join(deg, pr.part_id == deg.u).select(
        "part_id", "pr", F.col("deg").cast("long").alias("out_degree")
    )


PARTS_PAGERANK_SQL = f"""
WITH l AS (
  SELECT l_orderkey, l_partkey FROM lineitem WHERE l_partkey < {_PR_MAX_PART}
),
edges AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM l a JOIN l b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey <> b.l_partkey
),
deg AS (SELECT u, COUNT(*) AS deg FROM edges GROUP BY 1),
nodes AS (SELECT DISTINCT u AS part_id FROM edges),
n AS (SELECT COUNT(*) AS n FROM nodes),
pr0 AS (SELECT part_id, {_PR_SCALE} // n.n AS pr FROM nodes, n),
c1 AS (
  SELECT e.v, SUM(pr0.pr // deg.deg) AS contrib
  FROM edges e JOIN deg ON e.u = deg.u JOIN pr0 ON e.u = pr0.part_id
  GROUP BY 1
),
pr1 AS (
  SELECT nodes.part_id,
         (15 * ({_PR_SCALE} // n.n) // 100)
           + (85 * COALESCE(c1.contrib, 0)) // 100 AS pr
  FROM nodes LEFT JOIN c1 ON nodes.part_id = c1.v, n
),
c2 AS (
  SELECT e.v, SUM(pr1.pr // deg.deg) AS contrib
  FROM edges e JOIN deg ON e.u = deg.u JOIN pr1 ON e.u = pr1.part_id
  GROUP BY 1
),
pr2 AS (
  SELECT nodes.part_id,
         (15 * ({_PR_SCALE} // n.n) // 100)
           + (85 * COALESCE(c2.contrib, 0)) // 100 AS pr
  FROM nodes LEFT JOIN c2 ON nodes.part_id = c2.v, n
)
SELECT pr2.part_id, CAST(pr2.pr AS BIGINT) AS pr,
       CAST(deg.deg AS BIGINT) AS out_degree
FROM pr2 JOIN deg ON pr2.part_id = deg.u
"""


# ==========================================================================
# TTL dedup (batch twin of the streaming state-TTL dedup)
# ==========================================================================

def events_dedup_ttl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-live dedup: an event is kept iff no earlier event with the
    same (user, type) landed within the last hour — the batch twin of
    ``streaming/stateful.py:streaming_dedup``'s TTL state semantics
    (dedupe retries/re-fires without suppressing genuine recurrences).

    Scale shape: the lag rides the bucketed two-phase window
    (``operators/hotkey.lag_over_buckets``, composite key) — a bot
    user's (user, type) stream would otherwise land in ONE task since
    the type only fans a hot user out |types| ways; bucketing spreads
    it per-day. The per-type rollup is constant-size and
    partial-aggregates map-side."""
    from bulker_spark.operators.hotkey import lag_over_buckets
    from bulker_spark.plans.queries import _events

    ev = _events(spark, sf_dir)
    kept = lag_over_buckets(
        ev,
        keys=["user_id", "event_type"],
        order=["ts", "event_id"],
        lag_cols={"__prev": "ts"},
    ).withColumn(
        "__kept",
        F.col("__prev").isNull()
        | (
            F.expr(
                "timestampdiff(SECOND, date_trunc('second', __prev),"
                " date_trunc('second', ts))"
            )
            > 3600
        ),
    )
    return kept.groupBy("event_type").agg(
        F.count("*").alias("n_total"),
        F.sum(F.col("__kept").cast("long")).alias("n_kept"),
    )


EVENTS_DEDUP_TTL_SQL = """
WITH w AS (
  SELECT event_type, ts,
         lag(ts) OVER (PARTITION BY user_id, event_type
                       ORDER BY ts, event_id) AS prev
  FROM events
)
SELECT event_type, COUNT(*) AS n_total,
       SUM(CASE WHEN prev IS NULL
                  OR date_diff('second', prev, ts) > 3600
                THEN 1 ELSE 0 END) AS n_kept
FROM w GROUP BY 1
"""


# ==========================================================================
# Distribution drift: population stability index between event segments
# ==========================================================================

_PSI_BIN_W = 50.0
_PSI_BINS = 10


def events_value_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index terms between the `view` and `click`
    value distributions over fixed-width bins — the drift monitor a
    training pipeline runs between data snapshots before retraining.

    Scale shape: one pass, one shuffle of (segment, bin) partial counts —
    ≤ 2×10 cells regardless of row count; the PSI terms are computed on
    the driver-sized result. Laplace smoothing keeps empty bins finite.
    Determinism: counts are integer-exact; each term is rounded from
    exact-rational inputs, so engines agree."""
    from bulker_spark.plans.queries import _events

    ev = _events(spark, sf_dir).filter(
        F.col("event_type").isin("view", "click")
    )
    binned = ev.select(
        "event_type",
        F.least(
            F.floor(F.col("value") / _PSI_BIN_W), F.lit(_PSI_BINS - 1)
        )
        .cast("int")
        .alias("bin"),
    )
    cells = binned.groupBy("event_type", "bin").agg(
        F.count("*").alias("c")
    )
    tot = cells.groupBy("event_type").agg(F.sum("c").alias("t"))
    # full bin × segment grid so empty bins get the smoothed floor
    # 1/(t+k), never a log-of-zero
    grid = (
        spark.range(_PSI_BINS)
        .select(F.col("id").cast("int").alias("bin"))
        .crossJoin(
            spark.createDataFrame(
                [("view",), ("click",)], ["event_type"]
            )
        )
    )
    p = (
        grid.join(cells, ["event_type", "bin"], "left")
        .na.fill({"c": 0})
        .join(tot, "event_type")
        .select(
            "bin",
            "event_type",
            (
                (F.col("c") + 1) / (F.col("t") + _PSI_BINS)
            ).alias("share"),
        )
    )
    wide = (
        p.groupBy("bin")
        .pivot("event_type", ["view", "click"])
        .agg(F.first("share"))
    )
    return wide.select(
        "bin",
        F.round("view", 6).alias("p_view"),
        F.round("click", 6).alias("p_click"),
        F.round(
            (F.col("view") - F.col("click"))
            * F.log(F.col("view") / F.col("click")),
            6,
        ).alias("psi_term"),
    ).orderBy("bin")


EVENTS_PSI_SQL = f"""
WITH binned AS (
  SELECT event_type,
         CAST(least(floor(value / {_PSI_BIN_W}), {_PSI_BINS - 1}) AS INT)
           AS bin
  FROM events WHERE event_type IN ('view', 'click')
),
cells AS (
  SELECT event_type, bin, COUNT(*) AS c FROM binned GROUP BY 1, 2
),
tot AS (SELECT event_type, SUM(c) AS t FROM cells GROUP BY 1),
grid AS (
  SELECT CAST(g.bin AS INT) AS bin, s.event_type
  FROM generate_series(0, {_PSI_BINS - 1}) g(bin),
       (VALUES ('view'), ('click')) s(event_type)
),
p AS (
  SELECT grid.bin, grid.event_type,
         (COALESCE(cells.c, 0) + 1) / (t + {_PSI_BINS}.0) AS share
  FROM grid
  LEFT JOIN cells ON grid.bin = cells.bin
                 AND grid.event_type = cells.event_type
  JOIN tot ON grid.event_type = tot.event_type
),
wide AS (
  SELECT bin,
         MAX(CASE WHEN event_type = 'view' THEN share END) AS p_view,
         MAX(CASE WHEN event_type = 'click' THEN share END) AS p_click
  FROM p GROUP BY 1
)
SELECT bin, ROUND(p_view, 6) AS p_view, ROUND(p_click, 6) AS p_click,
       ROUND((p_view - p_click) * ln(p_view / p_click), 6) AS psi_term
FROM wide ORDER BY bin
"""


# ==========================================================================
# Fixed-point PCA power iteration (deterministic distributed linear algebra)
# ==========================================================================

_PCA_S = 1_000_000
_PCA_DIMS = 64
_PCA_ITERS = 2


def emb_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant principal direction of the embedding corpus via power
    iteration (vₜ₊₁ ∝ Σᵣ (xᵣ·vₜ) xᵣ), run a fixed number of iterations in
    **integer fixed-point arithmetic**: per-row dot products and per-dim
    contributions are floored to 10⁻⁶ units before any cross-row sum, so
    every aggregate is an integer sum — order-free, bit-identical across
    partitionings and engines. Naive float power iteration is
    unreproducible on a cluster (summation order varies run to run);
    this is the same determinism discipline as the fixed-point PageRank.

    Scale shape: each iteration is ONE whole-stage-codegen aggregation —
    the dot product folds JVM-side over the array column against the
    broadcast vector literal (zero fan-out, no explode), and the 64
    per-dimension partial sums combine map-side. Driver state is 64
    ints; O(iters) jobs total — the Pregel/kmeans layout with an exact
    oracle, which float arithmetic could never give."""
    e = _t(spark, sf_dir, "embeddings").select(
        F.transform("embedding", lambda x: x.cast("double")).alias("x")
    )
    v = [_PCA_S] * _PCA_DIMS  # v₀ = all-ones at scale S
    for _ in range(_PCA_ITERS):
        # one ArrayType(Long) Literal per iteration (python ints infer
        # LongType), not 64 CreateArray children — same exact values
        vlit = F.lit([int(c) for c in v])
        d_int = F.aggregate(
            F.zip_with(
                "x", vlit, lambda a, b: F.floor(a * b).cast("long")
            ),
            F.lit(0).cast("long"),
            lambda acc, q: acc + q,
        )
        with_d = e.select("x", (d_int / _PCA_S).alias("d"))
        sums = with_d.agg(
            *[
                F.sum(
                    F.floor(
                        F.element_at("x", j + 1) * F.col("d") * _PCA_S
                    ).cast("long")
                ).alias(f"s{j}")
                for j in range(_PCA_DIMS)
            ]
        ).collect()[0]
        big = [int(sums[f"s{j}"]) for j in range(_PCA_DIMS)]
        idx = max(range(_PCA_DIMS), key=lambda j: (abs(big[j]), -j))
        sign = 1 if big[idx] >= 0 else -1
        m = abs(big[idx])
        v = [(c * sign * _PCA_S) // m for c in big]  # floor div, exact
    return spark.createDataFrame(
        [(j, int(v[j])) for j in range(_PCA_DIMS)], "pos int, v_fp long"
    )


EMB_PCA_SQL = f"""
WITH px AS (
  SELECT vec_id, CAST(u.i AS INT) - 1 AS pos,
         embedding[u.i]::DOUBLE AS xv
  FROM embeddings,
       LATERAL (SELECT unnest(generate_series(1, {_PCA_DIMS})) AS i) u
),
d1 AS (
  SELECT vec_id,
         SUM(CAST(floor(xv * {_PCA_S}) AS BIGINT)) AS d_int
  FROM px GROUP BY 1
),
c1 AS (
  SELECT px.pos,
         SUM(CAST(floor(px.xv * (d1.d_int / {_PCA_S}.0) * {_PCA_S})
             AS BIGINT)) AS V
  FROM px JOIN d1 USING (vec_id) GROUP BY 1
),
n1 AS (
  SELECT MAX(abs(V)) AS m,
         (SELECT CASE WHEN V >= 0 THEN 1 ELSE -1 END
          FROM c1 ORDER BY abs(V) DESC, pos LIMIT 1) AS s
  FROM c1
),
v1 AS (SELECT pos, (V * s * {_PCA_S}) // m AS v FROM c1, n1),
d2 AS (
  SELECT px.vec_id,
         SUM(CAST(floor(px.xv * v1.v) AS BIGINT)) AS d_int
  FROM px JOIN v1 USING (pos) GROUP BY 1
),
c2 AS (
  SELECT px.pos,
         SUM(CAST(floor(px.xv * (d2.d_int / {_PCA_S}.0) * {_PCA_S})
             AS BIGINT)) AS V
  FROM px JOIN d2 USING (vec_id) GROUP BY 1
),
n2 AS (
  SELECT MAX(abs(V)) AS m,
         (SELECT CASE WHEN V >= 0 THEN 1 ELSE -1 END
          FROM c2 ORDER BY abs(V) DESC, pos LIMIT 1) AS s
  FROM c2
),
v2 AS (SELECT pos, (V * s * {_PCA_S}) // m AS v FROM c2, n2)
SELECT pos, CAST(v AS BIGINT) AS v_fp FROM v2 ORDER BY pos
"""


# ==========================================================================
# MMR diverse top-k selection (greedy, fixed-point — exact oracle)
# ==========================================================================

_MMR_K = 5
_MMR_MAX_VEC = 200
_MMR_Q = 10**9  # dot-product quantization (1e-9 units)


def emb_mmr_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance selection: greedily pick k vectors
    maximizing ``0.7·rel − 0.3·max_sim_to_selected`` — the diversity
    sampler that keeps a training batch from collapsing onto near-
    duplicates of the query (vec 0 is the query; vec 1..199 candidates).

    Determinism: every dot product is Σⱼ floor(xⱼ·yⱼ·10⁹) — element
    products are IEEE-commutative and the floor happens before any sum,
    so relevance, penalties, and therefore the full greedy trajectory are
    integer-exact on any engine (the 10×-scaled score ``7·rel − 3·pen``
    avoids division entirely). Scale shape: the candidate scan keeps a
    running penalty column; each of the k steps is one TakeOrdered(1)
    over candidates (argmax, no sort) plus a JVM ``zip_with`` fold
    against the newly-selected vector literal — O(k) jobs, penalties
    never materialize as a pair matrix."""
    e = (
        _t(spark, sf_dir, "embeddings")
        .filter(
            (F.col("vec_id") > 0) & (F.col("vec_id") < _MMR_MAX_VEC)
        )
        .select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias(
                "x"
            ),
        )
    )
    qvec = (
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == 0)
        .select("embedding")
        .collect()[0][0]
    )

    def dot_int(col, vec):
        # one ArrayType(Double) Literal node — same IEEE doubles
        lit = F.lit([float(v) for v in vec])
        return F.aggregate(
            F.zip_with(
                col, lit, lambda a, b: F.floor(a * b * _MMR_Q).cast("long")
            ),
            F.lit(0).cast("long"),
            lambda acc, t: acc + t,
        )

    df = e.select(
        "vec_id", "x", dot_int(F.col("x"), qvec).alias("rel")
    ).withColumn("pen", F.lit(0).cast("long")).persist()
    picks = []
    for rank in range(1, _MMR_K + 1):
        chosen = [p[0] for p in picks]
        row = (
            df.filter(~F.col("vec_id").isin(chosen) if chosen else F.lit(True))
            .orderBy(
                (7 * F.col("rel") - 3 * F.col("pen")).desc(), "vec_id"
            )
            .limit(1)
            .collect()[0]
        )
        picks.append((int(row.vec_id), rank))
        df = df.withColumn(
            "pen", F.greatest("pen", dot_int(F.col("x"), list(row.x)))
        )
    return spark.createDataFrame(
        [(r, v) for v, r in picks], "rank int, vec_id long"
    )


def _mmr_sql() -> str:
    pre = f"""
WITH c AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id < {_MMR_MAX_VEC}
),
px AS (
  SELECT vec_id, CAST(u.i AS INT) AS pos, embedding[u.i]::DOUBLE AS val
  FROM c, LATERAL (SELECT unnest(generate_series(1, 64)) AS i) u
),
dots AS (
  SELECT a.vec_id AS ca, b.vec_id AS cb,
         SUM(CAST(floor(a.val * b.val * {_MMR_Q}) AS BIGINT)) AS d
  FROM px a JOIN px b USING (pos) GROUP BY 1, 2
),
p0 AS (
  SELECT ca AS vec_id, d AS rel, CAST(0 AS BIGINT) AS pen
  FROM dots WHERE cb = 0 AND ca > 0
)"""
    steps = []
    prev = "p0"
    sels = []
    for i in range(1, _MMR_K + 1):
        notin = (
            ""
            if not sels
            else "WHERE vec_id NOT IN ("
            + " UNION ALL ".join(f"SELECT vec_id FROM {s}" for s in sels)
            + ")"
        )
        steps.append(
            f""",
s{i} AS (
  SELECT vec_id FROM {prev} {notin}
  ORDER BY 7 * rel - 3 * pen DESC, vec_id LIMIT 1
),
p{i} AS (
  SELECT p.vec_id, p.rel, GREATEST(p.pen, d.d) AS pen
  FROM {prev} p JOIN dots d
    ON d.ca = p.vec_id AND d.cb = (SELECT vec_id FROM s{i})
)"""
        )
        sels.append(f"s{i}")
        prev = f"p{i}"
    finals = " UNION ALL ".join(
        f"SELECT {i} AS rank, vec_id FROM s{i}" for i in range(1, _MMR_K + 1)
    )
    return pre + "".join(steps) + f"\nSELECT CAST(rank AS INT) AS rank, vec_id FROM ({finals}) ORDER BY rank"


EMB_MMR_SQL = _mmr_sql()


EXTRA_QUERIES5: dict[str, tuple] = {
    "mm_image_ahash_pairs": (mm_image_ahash_pairs, MM_AHASH_PAIRS_SQL),
    "doc_prefix_dedup": (doc_prefix_dedup, DOC_PREFIX_DEDUP_SQL),
    "emb_quantize_int8": (emb_quantize_int8, EMB_QUANTIZE_SQL),
    "doc_sample_det_k": (doc_sample_det_k, DOC_SAMPLE_SQL),
    "doc_dup_ngram_coverage": (
        doc_dup_ngram_coverage,
        DOC_DUP_COVERAGE_SQL,
    ),
    "parts_pagerank": (parts_pagerank, PARTS_PAGERANK_SQL),
    "events_dedup_ttl": (events_dedup_ttl, EVENTS_DEDUP_TTL_SQL),
    "events_value_psi": (events_value_psi, EVENTS_PSI_SQL),
    "emb_pca_power": (emb_pca_power, EMB_PCA_SQL),
    "emb_mmr_select": (emb_mmr_select, EMB_MMR_SQL),
}
