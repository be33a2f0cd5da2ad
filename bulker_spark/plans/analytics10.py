"""Round-5 catalog extension: DSIR-style importance weights for
training-data selection, plus corpus-rewriting block dedup
(doc_block_dedup_rebuild — the removal form of doc_block_dedup).

Reference scope (jitsucom/bulker): none — this extends the LLM
training-data tier. The estimator is Data Selection via Importance
Resampling (Xie et al., 2023): fit bag-of-n-gram unigram models over a
TARGET corpus (the distribution you want more of) and the RAW corpus,
and weight every raw document by its log importance ratio
``Σ_f k_f · ln(p̂_target(f) / q̂_raw(f))`` — documents that look like the
target float up, boilerplate sinks. The paper hashes n-grams into a
fixed bucket count purely to bound model memory; this plan keeps an
EXACT vocabulary on the oracle side while the Spark side keys the
shuffles by xxhash64(feature) — 8-byte ints cross every exchange (the
doc_contamination discipline). The two agree unless two distinct
features collide in 64 bits (~V²/2⁶⁵ — accepted, same tradeoff as
every hash-keyed dedup stage in this repo); the strict oracle runs at
three scale factors make the bet observable rather than assumed.

Target here: ``lang = 'en'`` documents (the testdata's stand-in for a
curated high-quality slice); raw: the whole corpus. Add-one smoothing
over the raw vocabulary keeps unseen-in-target features finite.

Scale shape: features are generated IN-ROW (split + slide, no join to
build bigrams), per-(doc, feature) counts shuffle once, the feature
model aggregates with map-side partials in the same pass for both
corpora (conditional count, not a second scan), and the three scalars
(totals + vocabulary size) broadcast. The score join carries one row
per (doc, feature-type) — never one row per token instance, so Zipf-head
tokens ("the") are not hot keys. This is the same layout as the unigram
surprisal query, proven at sf1.
"""

from __future__ import annotations

import hashlib
import os
import re
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# ==========================================================================
# Corpus-rebuild join routing: broadcast the slim int-list side while it
# fits, bucket the corpus by doc_id past that — text never crosses an
# exchange at EITHER scale
# ==========================================================================

# "auto" sizes the slim side against spark.sql.autoBroadcastJoinThreshold;
# "broadcast" / "bucketed" force one shape (tests pin both)
_REBUILD_JOIN_CONF = "spark.bulker.rebuild.join"
# bucket count for the materialized corpus; defaults to the session's
# shuffle partitions so the slim side's groupBy(doc_id) output partitioning
# (HashPartitioning(doc_id, n)) matches the bucketed scan exactly and the
# sort-merge join needs NO exchange on either input
_REBUILD_BUCKETS_CONF = "spark.bulker.rebuild.buckets"
# conservative slim-side estimate: positions are one ~4-byte int per token
# (span form) or per block (block form) vs the compressed text bytes they
# index — overestimating routes to the bucketed shape, the safe direction
# (a too-big broadcast OOMs executors; a needless bucket write only costs
# one materialization)
_SLIM_PER_CORPUS_BYTE = 0.5


def _parse_size_bytes(v) -> int:
    """``spark.sql.autoBroadcastJoinThreshold`` accepts '10485760',
    '10485760b', '10MB', '-1' — normalize to bytes (negative = disabled)."""
    s = str(v).strip().lower()
    mult = 1
    for suf, m in (
        ("kb", 1024), ("mb", 1024**2), ("gb", 1024**3), ("tb", 1024**4),
        ("b", 1), ("k", 1024), ("m", 1024**2), ("g", 1024**3),
        ("t", 1024**4),
    ):
        if s.endswith(suf):
            s = s[: -len(suf)]
            mult = m
            break
    try:
        return int(float(s) * mult)
    except ValueError:
        return 10 * 1024 * 1024  # Spark's default


def _path_bytes(spark: SparkSession, path: str) -> int:
    """On-storage size of a file/directory through the Hadoop FS layer
    (works for hdfs://, s3a://, local), with a pure-local fallback."""
    try:
        jvm = spark.sparkContext._jvm
        p = jvm.org.apache.hadoop.fs.Path(path)
        fs = p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
        return int(fs.getContentSummary(p).getLength())
    except Exception:
        if os.path.isfile(path):
            return os.path.getsize(path)
        total = 0
        for root, _dirs, files in os.walk(path):
            total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
        return total


def _shuffle_partitions(spark: SparkSession) -> int:
    """Session shuffle partitions, tolerating non-numeric values ("auto"
    on platforms with adaptive coalescing) by falling back to the
    cluster's default parallelism."""
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    except ValueError:
        return spark.sparkContext.defaultParallelism


def _rebuild_join_mode(spark: SparkSession, sf_dir: str) -> str:
    forced = spark.conf.get(_REBUILD_JOIN_CONF, "auto").lower()
    if forced in ("broadcast", "bucketed"):
        return forced
    thr = _parse_size_bytes(
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b")
    )
    if thr <= 0:
        # the session disabled broadcast joins outright — honor that
        # rather than overriding with an explicit hint
        return "bucketed"
    est = int(
        _path_bytes(spark, os.path.join(sf_dir, "documents.parquet"))
        * _SLIM_PER_CORPUS_BYTE
    )
    return "broadcast" if est <= thr else "bucketed"


def _bucketed_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``documents`` materialized ONCE per (session, path) as a catalog
    table hash-bucketed by doc_id. At corpus scale this is the layout a
    production pipeline stores the corpus in anyway (bucketing is an
    ingest-time cost paid once, amortized over every downstream
    doc_id-keyed join); here it is created on demand so the rebuild
    queries stay self-contained."""
    src = os.path.join(sf_dir, "documents.parquet")
    # tag = (path, mtime, size): regenerating the source parquet at the
    # same path changes the tag, so a long session never serves a stale
    # bucketed copy. BOTH the catalog name and the LOCATION carry the
    # application id — with a shared persistent metastore two concurrent
    # sessions could each pass tableExists and race one saveAsTable if
    # only the location were disambiguated (ADVICE r6)
    st = os.stat(os.path.realpath(src))
    tag = hashlib.md5(
        f"{os.path.realpath(src)}|{st.st_mtime_ns}|{st.st_size}".encode()
    ).hexdigest()[:12]
    app = re.sub(r"[^0-9a-zA-Z]", "_", spark.sparkContext.applicationId)
    name = f"bulker_corpus_bkt_{tag}_{app}"
    # same-process lock: two threads of one app share name AND location,
    # so concurrent overwrite writes would clobber each other mid-flight
    # and a tableExists re-check could bless a half-written table
    # (review r7) — the lock makes creation single-flight; the loser of
    # the wait re-checks and reads the winner's table
    with _BUCKETED_CREATE_LOCK:
        if not spark.catalog.tableExists(name):
            _sweep_stale_corpus_tables(spark, keep=name)
            loc = os.path.join(
                tempfile.gettempdir(),
                f"bulker_spark_corpus_bkt_{tag}_"
                f"{spark.sparkContext.applicationId}",
            )
            (
                spark.read.parquet(src)
                .select("doc_id", "text")
                .write.mode("overwrite")
                .option("path", loc)
                .bucketBy(_shuffle_partitions(spark), "doc_id")
                .sortBy("doc_id")
                .saveAsTable(name)
            )
            # the temp directory outlives the (in-memory) catalog entry —
            # without cleanup every session leaks a corpus-sized copy.
            # The DROP matters with a PERSISTENT metastore (advice r7):
            # without it app-scoped entries accumulate unboundedly and
            # survive pointing at deleted locations.
            _cleanup_at_exit(loc, spark=spark, table=name)
    return spark.table(name)


import threading as _threading

_BUCKETED_CREATE_LOCK = _threading.Lock()

_CLEANUP_REGISTERED: set = set()


def _cleanup_at_exit(loc: str, spark=None, table: str | None = None) -> None:
    if loc in _CLEANUP_REGISTERED:
        return
    _CLEANUP_REGISTERED.add(loc)
    import atexit
    import shutil

    def _clean() -> None:
        # drop the catalog entry BEFORE deleting its data so a
        # persistent metastore never holds a dangling-location table;
        # best-effort — the session may already be stopped at exit
        if spark is not None and table is not None:
            try:
                spark.sql(f"DROP TABLE IF EXISTS {table}")
            except Exception:
                pass
        shutil.rmtree(loc, ignore_errors=True)

    atexit.register(_clean)


def _sweep_stale_corpus_tables(spark: SparkSession, keep: str) -> None:
    """Drop leftover ``bulker_corpus_bkt_*`` catalog entries whose data
    directory no longer exists — the residue a crashed session leaves in
    a persistent shared metastore (the atexit hook never ran). Runs once
    per table creation, under the create lock; never touches a live
    table (an existing location means another app may be reading it)."""
    try:
        tables = spark.catalog.listTables()
    except Exception:
        return
    for t in tables:
        if not t.name.startswith("bulker_corpus_bkt_") or t.name == keep:
            continue
        try:
            rows = spark.sql(f"DESCRIBE FORMATTED {t.name}").collect()
            loc = next(
                (
                    r.data_type
                    for r in rows
                    if (r.col_name or "").strip() == "Location"
                ),
                None,
            )
            path = _sweepable_location(loc)
            if path is not None and not os.path.exists(path):
                spark.sql(f"DROP TABLE IF EXISTS {t.name}")
        except Exception:
            pass


def _sweepable_location(loc: "str | None") -> "str | None":
    """The local path a stale-corpus sweep may verify-and-drop, or None
    when the location is not safely verifiable from this host. ONLY
    local ``file:`` locations qualify — an object-store URI
    (``s3a://...``) or another filesystem scheme can be fully alive
    while ``os.path.exists`` says no, and dropping it would break the
    app reading it (review r8). A second guard restricts drops to the
    engine's own ``bulker_spark_corpus_bkt_*`` directory naming."""
    if loc is None:
        return None
    if re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*:", loc) and not loc.startswith(
        "file:"
    ):
        return None
    path = re.sub(r"^file:/*", "/", loc)
    if not os.path.basename(path).startswith("bulker_spark_corpus_bkt_"):
        return None
    return path


def _rebuild_corpus(spark: SparkSession, sf_dir: str):
    """The (doc_id, token-array) frame the rebuild queries read, plus the
    routing decision for their final join. Broadcast shape reads the
    plain parquet; bucketed shape reads the materialized bucketed table
    (both window generation and the rebuild join then share the bucketed
    scan — there is exactly one corpus representation per shape)."""
    mode = _rebuild_join_mode(spark, sf_dir)
    base = (
        _bucketed_corpus(spark, sf_dir)
        if mode == "bucketed"
        else _t(spark, sf_dir, "documents")
    )
    # project the token array ONCE: expressions referenced inside a
    # higher-order-function lambda are not subexpression-eliminated, so
    # an unprojected split(text) re-splits per lambda evaluation
    dt = base.select("doc_id", F.split(F.col("text"), " ").alias("t"))
    return dt, mode


def _rebuild_join(dt: DataFrame, slim: DataFrame, mode: str) -> DataFrame:
    """Final rebuild join: text frame ⋈ slim int-list frame on doc_id.
    Broadcast shape: BroadcastHashJoin, slim ships to the text. Bucketed
    shape: sort-merge join where the text side is a bucketed scan
    already hash-clustered on doc_id — only the slim (all-int) side may
    exchange, and when its aggregate partitioning matches the bucket
    count even that exchange elides. In BOTH shapes no exchange output
    ever carries a text/token column (pinned:
    tests/test_analytics10.py::TestRebuildScaleShapes)."""
    if mode == "broadcast":
        return dt.join(F.broadcast(slim), "doc_id", "left")
    return dt.join(slim, "doc_id", "left")


def doc_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document DSIR importance weight, length-normalized:
    ``dsir_weight = (1/n) Σ_f k_f · [ln(t_f+1) − ln(T+V) − ln(r_f+1) +
    ln(R+V)]`` where t/r are target/raw feature counts, T/R the corpus
    feature totals and V the raw vocabulary size. The log terms take
    INTEGER arguments (identical doubles in every engine); the rounded
    4-decimal output absorbs summation-order jitter.

    Round-5 hot-path fixes (measured 4.2 → 2.2 s steady-state at
    sf0.1): the token array is PROJECTED once and the bigram lambda
    slides over the projected column — the original expression re-split
    ``text`` inside the lambda, O(tokens²) string work per document —
    and features are xxhash64'd in the same row they're generated, so
    both wide stages and the model join shuffle 8-byte ints, never
    feature strings (the doc_contamination discipline)."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.split(F.col("text"), " ").alias("t")
    )
    bigrams = F.when(
        F.size(F.col("t")) >= 2,
        F.expr(
            "transform(sequence(1, size(t) - 1),"
            " i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = d.select(
        "doc_id",
        "lang",
        F.explode(F.concat(F.col("t"), bigrams)).alias("fs"),
    ).select("doc_id", "lang", F.xxhash64("fs").alias("f"))
    doc_feat = feats.groupBy("doc_id", "f").agg(F.count("*").alias("k"))
    # one pass builds BOTH models: raw count + target (lang='en') count.
    # Deliberately aggregated from the EXPLODE, not from doc_feat: the
    # conditional count reduces map-side to vocabulary-sized partials
    # (tiny shuffle), whereas deriving the models from doc_feat would
    # re-write the corpus-scale (doc, feature) exchange a second time
    # (no cross-branch exchange reuse without caching — measured 2.3×
    # total shuffle bytes). The extra columnar scan is the cheap side
    # of that trade at any corpus size.
    stats = feats.groupBy("f").agg(
        F.count("*").alias("rcnt"),
        F.count(F.when(F.col("lang") == "en", 1)).alias("tcnt"),
    )
    tot = stats.agg(
        F.sum("rcnt").alias("rtot"),
        F.sum("tcnt").alias("ttot"),
        F.count("*").alias("v"),
    )
    scored = (
        doc_feat.join(stats, "f")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "k",
            (
                F.col("k")
                * (
                    F.log(F.col("tcnt") + 1)
                    - F.log(F.col("ttot") + F.col("v"))
                    - F.log(F.col("rcnt") + 1)
                    + F.log(F.col("rtot") + F.col("v"))
                )
            ).alias("w"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.sum("k").alias("n_feats"),
        # + 0.0 canonicalizes IEEE negative zero (a weight rounding to
        # -0.0 prints differently across engines; -0.0 + 0.0 = +0.0)
        (F.round(F.sum("w") / F.sum("k"), 4) + F.lit(0.0)).alias(
            "dsir_weight"
        ),
    )


DOC_DSIR_SQL = """
WITH toks AS (
  SELECT doc_id, lang, string_split(text, ' ') AS l FROM documents
),
feats AS (
  SELECT doc_id, lang, unnest(l) AS f FROM toks
  UNION ALL
  SELECT doc_id, lang,
         unnest(list_transform(range(1, len(l)),
                               i -> l[i] || ' ' || l[i + 1])) AS f
  FROM toks
),
doc_feat AS (
  SELECT doc_id, f, CAST(count(*) AS BIGINT) AS k FROM feats GROUP BY 1, 2
),
stats AS (
  SELECT f,
         count(*) AS rcnt,
         count(*) FILTER (WHERE lang = 'en') AS tcnt
  FROM feats GROUP BY 1
),
tot AS (
  SELECT SUM(rcnt) AS rtot, SUM(tcnt) AS ttot, COUNT(*) AS v FROM stats
)
SELECT doc_id,
       CAST(SUM(k) AS BIGINT) AS n_feats,
       ROUND(SUM(k * (ln(tcnt + 1) - ln(ttot + v)
                      - ln(rcnt + 1) + ln(rtot + v))) / SUM(k),
             4) + 0.0 AS dsir_weight
FROM doc_feat JOIN stats USING (f), tot
GROUP BY 1
"""


# ==========================================================================
# IVF probe autotune: the recall/cost curve that picks nprobe
# ==========================================================================

_IVF_SWEEP = (1, 2, 4, 8)
_IVF_TARGET_BP = 9500  # smallest nprobe with ≥95% cell recall wins


def emb_ivf_probe_autotune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tuning loop behind ``emb_pq_ivf_adc``'s fixed ``nprobe=4``:
    for each candidate probe count, measure CELL recall@3 — the fraction
    of each query's exact full-vector top-3 neighbors whose IVF cell is
    among the query's ``nprobe`` nearest cells — and the candidate-scan
    fraction it costs. ``chosen`` marks the smallest probe count meeting
    the 95% target (the standard FAISS nprobe sweep), falling back to
    the largest swept value when none reach it. Cell recall is exactly
    the loss IVF pruning introduces (ADC re-ranking happens inside the
    probed set), so this isolates the knob being tuned.

    Scale shape: the sweep does NOT rerun the search per probe count —
    each truth neighbor joins to the probe RANK at which its cell enters
    (one number), and every nprobe reads off ``rank ≤ n``. Ground truth
    is exhaustive only over the FIXED query budget (the SIFT-benchmark
    shape: O(corpus) scored pairs, queries capped); centroids, the query
    set, the 4-row sweep and the scalar totals broadcast. All ranking is
    over integer milli-distances and all ratios integer-divided, so the
    curve is bit-identical across engines and partitionings."""
    from pyspark.sql import Window

    from bulker_spark.plans.analytics7 import (
        _PQ_DIM,
        _PQ_M,
        _cell_rank_array,
        _collect_centroids,
        _pq_dist_milli_fixed,
        _pq_is_query,
        _pq_parallelize,
    )
    from bulker_spark.session import pin

    # r08 rewrite (guide §2.4): cell assignment and probe ranks are
    # in-row over the collected centroid literals (the emb_ann_ivf
    # shape) — the previous broadcast-join + rank window re-executed
    # its exchange + sort per reference (cells feeds vis AND sizes;
    # qrank feeds vis AND cand); now each re-reference is a pure map
    # over the scan. Same (dmilli, cell) tie-break, bit-identical.
    cents = _collect_centroids(spark, sf_dir)
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    assigned = e.select("vec_id", _cell_rank_array("v", cents).alias("cd"))
    # corpus-side cell-rank folds over a _pq_parallelize'd scan: a tiny
    # input scans as ONE partition, serializing them (r09, guide §2.2);
    # no-op past the size threshold
    cells = _pq_parallelize(
        spark, sf_dir, assigned.filter(~_pq_is_query())
    ).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("cd")[0]["cell"].alias("cell"),
    )
    qrank = (
        assigned.filter(_pq_is_query())
        .select(
            F.col("vec_id").alias("query_id"),
            # posexplode_OUTER: the infer-filter rule fires on bare-
            # column generators and its size(cd)>0 predicate re-inlines
            # the full cell-rank expression into a pushed Filter (the
            # emb_pq_ivf_* disease, OPTIMIZATION_r08.md); cd always has
            # K elements so outer explode is result-identical
            F.posexplode_outer("cd").alias("pos", "p"),
        )
        .select(
            "query_id",
            F.col("p.cell").alias("cell"),
            (F.col("pos") + 1).cast("int").alias("rn"),
        )
    )

    q = e.filter(_pq_is_query()).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    # the exhaustive ground-truth scoring evaluates one 64-dim fold per
    # (query × candidate) pair in the broadcast join's match loop on the
    # stream side's partitioning — parallelize it (see `cells` above)
    db = _pq_parallelize(spark, sf_dir, e.filter(~_pq_is_query())).select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("nv")
    )
    pairs = db.join(F.broadcast(q)).select(
        "query_id",
        "neighbor_id",
        _pq_dist_milli_fixed("qv", "nv", _PQ_M * _PQ_DIM).alias("dmilli"),
    )
    w_q = Window.partitionBy("query_id").orderBy("dmilli", "neighbor_id")
    # pin: truth feeds both the visibility join and the n_truth total —
    # without it the exhaustive O(queries × corpus) ground-truth scoring
    # runs twice (placement-pin discipline, session.pin)
    truth = pin(
        pairs.withColumn("trn", F.row_number().over(w_q))
        .filter(F.col("trn") <= 3)
        .select("query_id", "neighbor_id")
    )
    # the probe rank at which each truth neighbor becomes visible
    vis = truth.join(cells, "neighbor_id").join(
        qrank, ["query_id", "cell"]
    )

    sweep = spark.createDataFrame(
        [(n,) for n in _IVF_SWEEP], "nprobe bigint"
    )
    rec = (
        vis.crossJoin(F.broadcast(sweep))
        .groupBy("nprobe")
        .agg(
            F.sum(
                F.when(F.col("rn") <= F.col("nprobe"), 1).otherwise(0)
            ).alias("hits")
        )
    )
    sizes = cells.groupBy("cell").agg(F.count("*").alias("sz"))
    cand = (
        qrank.join(sizes, "cell")
        .crossJoin(F.broadcast(sweep))
        .filter(F.col("rn") <= F.col("nprobe"))
        .groupBy("nprobe")
        .agg(F.sum("sz").alias("cand"))
    )
    # one scan for both corpus counts (previously two separate full
    # aggregations of e); count(when(cond, 1)) counts exactly the rows
    # the old filtered count(*) did
    counts = e.agg(
        F.count(F.when(_pq_is_query(), 1)).alias("nq"),
        F.count(F.when(~_pq_is_query(), 1)).alias("ndb"),
    )
    totals = truth.agg(F.count("*").alias("n_truth")).crossJoin(counts)
    out = (
        sweep.join(rec, "nprobe", "left")
        .join(cand, "nprobe", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "nprobe",
            F.expr(
                "10000 * coalesce(hits, 0) div n_truth"
            ).alias("recall_bp"),
            F.expr(
                "10000 * coalesce(cand, 0) div (nq * ndb)"
            ).alias("cand_bp"),
        )
    )
    w_all = Window.partitionBy(F.lit(1))
    return (
        out.withColumn(
            "__min_ok",
            F.min(
                F.when(
                    F.col("recall_bp") >= _IVF_TARGET_BP, F.col("nprobe")
                )
            ).over(w_all),
        )
        .withColumn(
            "chosen",
            F.when(
                F.col("__min_ok").isNotNull(),
                F.col("nprobe") == F.col("__min_ok"),
            ).otherwise(F.col("nprobe") == F.lit(max(_IVF_SWEEP))),
        )
        .drop("__min_ok")
    )


def _ivf_autotune_sql() -> str:
    from bulker_spark.plans.analytics7 import (
        _PQ_DIM,
        _PQ_K,
        _PQ_M,
        _pq_q_sql,
    )

    sweep_rows = ", ".join(f"({n})" for n in _IVF_SWEEP)
    return f"""
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
cells AS (
  SELECT vec_id AS neighbor_id, cell FROM ranked
  WHERE rn = 1 AND NOT {_pq_q_sql()}
),
qrank AS (
  SELECT vec_id AS query_id, cell, rn FROM ranked WHERE {_pq_q_sql()}
),
qx AS (SELECT vec_id AS query_id, x AS qx, i FROM fx WHERE {_pq_q_sql()}),
dbx AS (
  SELECT vec_id AS neighbor_id, x AS nx, i FROM fx
  WHERE NOT {_pq_q_sql()}
),
pairs AS (
  SELECT q.query_id, d.neighbor_id,
         CAST(ROUND(1000 * SUM((q.qx - d.nx) * (q.qx - d.nx))) AS BIGINT)
           AS dmilli
  FROM qx q JOIN dbx d ON q.i = d.i
  GROUP BY 1, 2
),
truth AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (
               PARTITION BY query_id ORDER BY dmilli, neighbor_id
           ) AS trn
    FROM pairs
  ) WHERE trn <= 3
),
vis AS (
  SELECT t.query_id, t.neighbor_id, r.rn
  FROM truth t
  JOIN cells c ON t.neighbor_id = c.neighbor_id
  JOIN qrank r ON r.query_id = t.query_id AND r.cell = c.cell
),
sweep AS (SELECT CAST(col0 AS BIGINT) AS nprobe
          FROM (VALUES {sweep_rows}) AS s(col0)),
rec AS (
  SELECT s.nprobe,
         SUM(CASE WHEN v.rn <= s.nprobe THEN 1 ELSE 0 END) AS hits
  FROM vis v CROSS JOIN sweep s
  GROUP BY 1
),
sizes AS (SELECT cell, COUNT(*) AS sz FROM cells GROUP BY 1),
cand AS (
  SELECT s.nprobe, SUM(z.sz) AS cand
  FROM qrank r JOIN sizes z ON r.cell = z.cell
  CROSS JOIN sweep s
  WHERE r.rn <= s.nprobe
  GROUP BY 1
),
tot AS (
  SELECT (SELECT COUNT(*) FROM truth) AS n_truth,
         (SELECT COUNT(DISTINCT query_id) FROM qrank) AS nq,
         (SELECT COUNT(*) FROM cells) AS ndb
),
curve AS (
  SELECT s.nprobe,
         (10000 * COALESCE(r.hits, 0)) // t.n_truth AS recall_bp,
         (10000 * COALESCE(c.cand, 0)) // (t.nq * t.ndb) AS cand_bp
  FROM sweep s
  LEFT JOIN rec r USING (nprobe)
  LEFT JOIN cand c USING (nprobe)
  CROSS JOIN tot t
)
SELECT nprobe, recall_bp, cand_bp,
       CASE WHEN MIN(CASE WHEN recall_bp >= {_IVF_TARGET_BP}
                          THEN nprobe END) OVER () IS NOT NULL
            THEN nprobe = MIN(CASE WHEN recall_bp >= {_IVF_TARGET_BP}
                                   THEN nprobe END) OVER ()
            ELSE nprobe = {max(_IVF_SWEEP)}
       END AS chosen
FROM curve
"""


# ==========================================================================
# Corpus-rewriting block dedup (Gopher/MassiveText line-level dedup,
# removal form)
# ==========================================================================

_RB_BLK = 3  # tokens per block — matches doc_block_dedup's signal


def doc_block_dedup_rebuild(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REMOVE globally-duplicated blocks and reassemble the cleaned
    corpus — the removal form of ``doc_block_dedup``'s measurement
    (Rae et al., Gopher appendix: strip repeated lines/paragraphs across
    documents, keeping one canonical copy). Every block keeps its
    globally FIRST occurrence (min (doc_id, pos)); later occurrences,
    including intra-document repeats, are dropped, and each document is
    rebuilt from its surviving blocks in order.

    Scale shape — the text column never crosses a shuffle: blocks are
    reduced to ``(doc_id, pos, xxhash64(block))`` in-row, the
    first-occurrence winner per hash is one partial-aggregated groupBy
    over ints (min struct — no window, no sort), winners re-aggregate to
    one int-array row per surviving document, and the rebuild joins that
    slim frame back to ``documents`` on doc_id, re-slicing block text
    from the ORIGINAL column as a pure map. The final join routes by
    slim-side size (``_rebuild_join_mode``): while the int-list frame
    fits the broadcast threshold (it is ~100× smaller than the text) it
    is a BroadcastHashJoin; past that the corpus materializes once as a
    doc_id-bucketed table and the join is a sort-merge against the
    bucketed scan, where only the int side may exchange. In BOTH shapes
    text never crosses a shuffle (pinned:
    tests/test_analytics10.py::TestRebuildScaleShapes). 64-bit hash
    keying is the standard large-corpus tradeoff (a collision merges two
    distinct blocks — ~N²/2⁶⁵ expected at corpus size N)."""
    dt, mode = _rebuild_corpus(spark, sf_dir)
    t = F.col("t")
    nblk = F.ceil(F.size(t) / F.lit(_RB_BLK)).cast("int")
    blocks = dt.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), nblk - 1),
                lambda i: F.xxhash64(
                    F.array_join(F.slice(t, i * _RB_BLK + 1, _RB_BLK), " ")
                ),
            )
        ).alias("pos", "bh"),
    )
    winners = blocks.groupBy("bh").agg(
        F.min(F.struct("doc_id", "pos")).alias("w")
    )
    keep_lists = winners.groupBy(F.col("w.doc_id").alias("doc_id")).agg(
        F.sort_array(F.collect_list("w.pos")).alias("keep")
    )
    keep = F.coalesce(F.col("keep"), F.array().cast("array<int>"))
    return _rebuild_join(dt, keep_lists, mode).select(
        "doc_id",
        F.array_join(
            F.transform(
                keep,
                lambda i: F.array_join(
                    F.slice(t, i * _RB_BLK + 1, _RB_BLK), " "
                ),
            ),
            " ",
        ).alias("clean_text"),
        nblk.cast("long").alias("n_blocks"),
        (nblk - F.size(keep)).cast("long").alias("n_removed"),
    )


DOC_BLOCK_REBUILD_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
positions AS (
  SELECT doc_id, t,
         unnest(range(0, CAST(ceil(len(t) / {_RB_BLK}.0) AS BIGINT))) AS pos
  FROM toks
),
blocks AS (
  SELECT doc_id, pos,
         array_to_string(list_slice(t, pos * {_RB_BLK} + 1,
                                       pos * {_RB_BLK} + {_RB_BLK}),
                         ' ') AS btext
  FROM positions
),
kept AS (
  SELECT doc_id, pos, btext FROM (
    SELECT doc_id, pos, btext,
           row_number() OVER (PARTITION BY btext
                              ORDER BY doc_id, pos) AS rn
    FROM blocks
  ) WHERE rn = 1
),
rebuilt AS (
  SELECT doc_id,
         string_agg(btext, ' ' ORDER BY pos) AS clean_text,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT t.doc_id,
       coalesce(r.clean_text, '') AS clean_text,
       CAST(ceil(len(t.t) / {_RB_BLK}.0) AS BIGINT) AS n_blocks,
       CAST(ceil(len(t.t) / {_RB_BLK}.0) AS BIGINT)
         - coalesce(r.n_kept, 0) AS n_removed
FROM toks t LEFT JOIN rebuilt r USING (doc_id)
"""


# ==========================================================================
# Curriculum ordering: a global contiguous training order WITHOUT a
# single-partition global sort
# ==========================================================================


def doc_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign every document a contiguous training-order index 0..N-1,
    best-first (curriculum/data-ordering for training runs). The
    ordering key is an integer quality proxy — ``(2 if mid-length else
    1) · punctuation-stripped length`` — with doc_id as the total-order
    tie-break, so the result is engine-exact.

    The naive Spark spelling — ``row_number() OVER (ORDER BY ...)`` —
    plans an ``Exchange SinglePartition``: one task sorts the entire
    corpus, the classic 100 TB wall. This uses the scalable idiom
    instead: (1) ``repartitionByRange`` on the full composite key (range
    partition i holds strictly better keys than i+1, ties impossible —
    doc_id is unique), (2) ``row_number`` windowed BY PARTITION ID (many
    concurrent sorted tasks, each partition-sized), (3) per-partition
    row counts (a k-row aggregate, k = partition count) collected and
    prefix-summed ON THE DRIVER into a literal offset map:
    ``train_order = offset[pid] + rn - 1``. Every distributed stage is
    bounded by a partition, not the corpus — the only global object is
    the k-entry offset map (the emb_kmeans centroid discipline);
    boundary placement from range sampling does not affect the OUTPUT
    (the composite order is total). tests/test_analytics10.py pins the
    plan: no SinglePartition exchange anywhere."""
    from pyspark.sql import Window

    d = _t(spark, sf_dir, "documents")
    stripped = F.length(
        F.regexp_replace(F.regexp_replace("text", "\\.", ""), ",", "")
    )
    q = (
        F.when(F.length("text").between(100, 2000), F.lit(2))
        .otherwise(F.lit(1))
        * stripped
    ).cast("long")
    keyed = d.select("doc_id", q.alias("q_score"))
    n_parts = _shuffle_partitions(spark)
    # localCheckpoint PINS the range placement: the boundary sampling
    # inside a range exchange is re-seeded per execution, so the counts
    # job and the final job would otherwise see DIFFERENT partitionings
    # and the offsets would misalign (measured: 4402/5000 wrong at
    # sf0.1). Materializing the slim (doc_id, q_score, pid) frame once
    # makes both reads share identical physical partitions;
    # session.pin routes to a fault-tolerant .checkpoint() on a
    # cluster via spark.bulker.checkpoint.mode.
    from bulker_spark.session import pin

    with_pid = pin(
        keyed.repartitionByRange(
            n_parts, F.col("q_score").desc(), F.col("doc_id").asc()
        ).withColumn("pid", F.spark_partition_id())
    )
    counts = sorted(
        (r["pid"], r["n"])
        for r in with_pid.groupBy("pid")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    offsets: dict[int, int] = {}
    acc = 0
    for pid, n in counts:
        offsets[pid] = acc
        acc += n
    off_col = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )[F.col("pid")]
    w_in = Window.partitionBy("pid").orderBy(
        F.col("q_score").desc(), F.col("doc_id").asc()
    )
    return with_pid.withColumn("rn", F.row_number().over(w_in)).select(
        "doc_id",
        "q_score",
        (off_col + F.col("rn") - 1).alias("train_order"),
    )


DOC_CURRICULUM_SQL = """
SELECT doc_id, q_score,
       row_number() OVER (ORDER BY q_score DESC, doc_id) - 1 AS train_order
FROM (
  SELECT doc_id,
         CAST((CASE WHEN length(text) BETWEEN 100 AND 2000
                    THEN 2 ELSE 1 END)
              * length(replace(replace(text, '.', ''), ',', ''))
              AS BIGINT) AS q_score
  FROM documents
)
"""


# ==========================================================================
# LSH band-config autotune: the (bands × rows) sweep that tunes MinHash
# candidate generation, text-side sibling of emb_ivf_probe_autotune
# ==========================================================================

_LSH_SWEEP = (1, 2, 4, 8)  # rows per band over an 8-hash signature
_LSH_COEFFS8 = [
    (1, 0),
    (1103515245, 12345),
    (69069, 362437),
    (214013, 2531011),
    (1664525, 1013904223),
    (22695477, 1),
    (134775813, 7),
    (48271, 0),
]
_LSH_TARGET_BP = 9000  # cheapest config with ≥90% recall wins
_LSH_MAXDOC = 50


def doc_lsh_band_autotune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured sweep over MinHash banding configs — for an 8-hash
    signature, each split into b bands of r rows (r ∈ 1,2,4,8) trades
    recall against candidate volume along the LSH S-curve. For every
    config this measures true recall (candidates ∩ exact-Jaccard≥0.1
    pairs) and candidate count on a fixed document budget, and marks the
    cheapest config meeting the 90% recall target (tie → fewer bands);
    if none qualifies, the max-recall r=1 row wins. The emb-side twin
    (emb_ivf_probe_autotune) tunes nprobe the same way: measure on a
    budget, apply the choice at corpus scale.

    Engine-exactness: candidate pairs come from FULL band-tuple equality
    (never an engine-specific band hash), the Jaccard threshold is the
    integer form ``10·inter ≥ |A∪B|``, and recalls are integer basis
    points — so the whole curve is oracle-strict. Scale shape: banding
    at corpus scale is the equi-join on band keys this sweep is choosing
    FOR; the sweep itself runs on the capped budget (the SIFT-benchmark
    discipline), so its own O(budget²) truth join never touches the
    corpus."""
    from bulker_spark.plans._common import MINHASH_PRIME, _SPARK_H
    from bulker_spark.plans.queries import _shingles

    sh = _shingles(spark, sf_dir, _LSH_MAXDOC).distinct()
    hashed = sh.select(
        "doc_id", F.expr(_SPARK_H.format(col="sh")).alias("h")
    )
    sig = hashed.groupBy("doc_id").agg(
        *[
            F.min(
                (F.lit(a) * F.col("h") + F.lit(b)) % F.lit(MINHASH_PRIME)
            ).alias(f"mh{i}")
            for i, (a, b) in enumerate(_LSH_COEFFS8)
        ]
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, F.col("a.sh") == F.col("b.sh"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count("*").alias("inter"))
    )
    truth = (
        inter.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sza")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("szb")),
            "doc_b",
        )
        .filter(
            F.col("inter") * 10
            >= F.col("sza") + F.col("szb") - F.col("inter")
        )
        .select("doc_a", "doc_b")
    )

    # r08 rewrite (guide §2.4): the old form built a UNION of 15 band
    # branches (8+4+2+1 across the 4 configs), each branch re-running
    # the shingle→hash→minhash aggregation from the scan, and then
    # self-joined PER CONFIG — a 519-operator physical plan with ~150
    # parquet scans. Melt instead: ONE signature pass, one explode into
    # (doc_id, r, bi, bk) band rows for every config at once (band keys
    # as arrays — still full band-TUPLE equality, never a band hash),
    # one self-join on (r, bi, bk), one distinct, one truth-marking
    # aggregation grouped by config. Identical candidate sets per
    # config, one self-join instead of four, plan ~10× smaller.
    band_structs = []
    for r in _LSH_SWEEP:
        nb = len(_LSH_COEFFS8) // r
        for bi in range(nb):
            band_structs.append(
                F.struct(
                    F.lit(r).alias("r"),
                    F.lit(bi).alias("bi"),
                    F.array(
                        *[F.col(f"mh{bi * r + j}") for j in range(r)]
                    ).alias("bk"),
                )
            )
    bands = sig.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("b")
    ).select(
        "doc_id", F.col("b.r").alias("r"), F.col("b.bi").alias("bi"),
        F.col("b.bk").alias("bk"),
    )
    x, y = bands.alias("x"), bands.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.r") == F.col("y.r"))
            & (F.col("x.bi") == F.col("y.bi"))
            & (F.col("x.bk") == F.col("y.bk"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.r").alias("r"),
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    # one pass over the candidate set: count everything and count truth
    # matches in the SAME aggregate (a left join marks hits)
    stats = (
        cand.join(
            truth.withColumn("__t", F.lit(1)), ["doc_a", "doc_b"], "left"
        )
        .groupBy("r")
        .agg(
            F.count("*").alias("n_candidates"),
            F.count("__t").alias("hits"),
        )
    )
    # every swept config must produce a row even with zero candidates
    # (the old per-config global aggregate did); left-join the sweep
    configs = spark.createDataFrame(
        [(r, len(_LSH_COEFFS8) // r) for r in _LSH_SWEEP],
        "rows_per_band int, n_bands int",
    )
    curve = (
        configs.join(
            stats, F.col("rows_per_band") == F.col("r"), "left"
        )
        .crossJoin(
            F.broadcast(truth.agg(F.count("*").alias("n_truth")))
        )
        .select(
            "rows_per_band",
            "n_bands",
            F.coalesce("n_candidates", F.lit(0)).alias("n_candidates"),
            F.expr(
                "10000 * coalesce(hits, 0) div greatest(n_truth, 1)"
            ).alias("recall_bp"),
        )
    )
    from pyspark.sql import Window

    w_all = Window.partitionBy(F.lit(1))
    best = F.min(
        F.when(
            F.col("recall_bp") >= _LSH_TARGET_BP,
            F.struct("n_candidates", "n_bands"),
        )
    ).over(w_all)
    return (
        curve.withColumn("__best", best)
        .withColumn(
            "chosen",
            F.when(
                F.col("__best").isNotNull(),
                (F.col("n_candidates") == F.col("__best.n_candidates"))
                & (F.col("n_bands") == F.col("__best.n_bands")),
            ).otherwise(F.col("rows_per_band") == 1),
        )
        .drop("__best")
    )


def _lsh_autotune_sql() -> str:
    from bulker_spark.plans._common import (
        MINHASH_PRIME,
        _DUCK_H,
        _SHINGLE_DUCK,
    )

    mh_cols = ", ".join(
        f"CAST(min(({a} * h + {b}) % {MINHASH_PRIME}) AS BIGINT) AS mh{i}"
        for i, (a, b) in enumerate(_LSH_COEFFS8)
    )
    configs = []
    for r in _LSH_SWEEP:
        nb = len(_LSH_COEFFS8) // r
        band_or = " OR ".join(
            "("
            + " AND ".join(
                f"a.mh{bi * r + j} = b.mh{bi * r + j}" for j in range(r)
            )
            + ")"
            for bi in range(nb)
        )
        configs.append(
            f"""SELECT {r} AS rows_per_band, {nb} AS n_bands,
       (SELECT count(*) FROM (
          SELECT a.doc_id FROM sig a JOIN sig b
          ON a.doc_id < b.doc_id AND ({band_or}))) AS n_candidates,
       (SELECT count(*) FROM (
          SELECT a.doc_id FROM sig a JOIN sig b
          ON a.doc_id < b.doc_id AND ({band_or})
          JOIN truth t ON t.doc_a = a.doc_id AND t.doc_b = b.doc_id))
         AS hits"""
        )
    union = "\nUNION ALL\n".join(configs)
    return f"""
WITH sh AS (SELECT DISTINCT doc_id, sh
            FROM ({_SHINGLE_DUCK.format(max_doc=_LSH_MAXDOC)})),
hashed AS (SELECT doc_id, {_DUCK_H.format(col="sh")} AS h FROM sh),
sig AS (SELECT doc_id, {mh_cols} FROM hashed GROUP BY doc_id),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
truth AS (
  SELECT doc_a, doc_b FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE inter * 10 >= sa.sz + sb.sz - inter
),
curve AS (
  SELECT rows_per_band, n_bands, n_candidates,
         10000 * hits // greatest(
           (SELECT count(*) FROM truth), 1) AS recall_bp
  FROM ({union})
)
SELECT rows_per_band, n_bands, n_candidates, recall_bp,
       CASE WHEN MIN(CASE WHEN recall_bp >= {_LSH_TARGET_BP}
                          THEN n_candidates * 100 + n_bands END)
                 OVER () IS NOT NULL
            THEN n_candidates * 100 + n_bands
                 = MIN(CASE WHEN recall_bp >= {_LSH_TARGET_BP}
                            THEN n_candidates * 100 + n_bands END) OVER ()
            ELSE rows_per_band = 1
       END AS chosen
FROM curve
"""


# ==========================================================================
# Duplicated-SPAN removal: stride-1 sliding windows, the exact-substring
# dedup form (vs doc_block_dedup_rebuild's block-aligned form)
# ==========================================================================

_SPAN_K = 5  # tokens per sliding window


def doc_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remove duplicated token SPANS at arbitrary offsets (Lee et al.
    2022, "Deduplicating Training Data Makes Language Models Better" —
    the exact-substring method, here at token granularity): every
    5-token window that re-occurs anywhere in the corpus keeps only its
    globally first occurrence (min (doc_id, pos)); tokens covered by a
    non-first duplicated window are dropped and each document is rebuilt
    from its surviving tokens. Unlike ``doc_block_dedup_rebuild``'s
    block-aligned form, stride-1 windows catch duplicated passages that
    straddle block boundaries and at any alignment.

    Scale shape (the rebuild discipline): windows reduce in-row to
    ``(doc_id, pos, xxhash64(5-gram))`` — only ints cross the winner
    aggregation (one partial-aggregated min-struct groupBy) and the
    loser join (hash-keyed); loser window STARTS aggregate to one
    int-array row per affected doc, covered positions expand in-row
    (flatten + array_distinct), and the rebuild re-reads tokens from
    the original text column as a pure map. The final join routes by
    slim-side size (``_rebuild_join_mode``): BroadcastHashJoin while
    the int-list side fits the threshold, else a sort-merge join
    against the corpus materialized once as a doc_id-bucketed table —
    in BOTH shapes text never crosses a shuffle, and every other stage
    is int-only at any size (pinned:
    tests/test_analytics10.py::TestRebuildScaleShapes)."""
    k = _SPAN_K
    # token array projected once (HOF lambdas are not CSE'd — an
    # unprojected split(text) re-splits per lambda evaluation; measured
    # 17 s vs 1.9 s for the whole query at sf0.1)
    dt, mode = _rebuild_corpus(spark, sf_dir)
    t = F.col("t")
    nwin = F.size(t) - F.lit(k - 1)
    # sequence(1, 0) counts DOWN ([1, 0]), it is not empty — docs with
    # fewer than k tokens must produce zero windows explicitly
    starts = F.when(nwin >= 1, F.sequence(F.lit(1), nwin)).otherwise(
        F.array().cast("array<int>")
    )
    wins = dt.select(
        "doc_id",
        F.posexplode(
            F.transform(
                starts,
                # hash the k token ELEMENTS directly (xxhash64 is
                # variadic) — no per-window string concatenation;
                # tokens are space-free so this keys identically to
                # hashing the joined gram (measured ~2× over
                # array_join+slice)
                lambda i: F.xxhash64(
                    *[F.element_at(t, i + j) for j in range(k)]
                ),
            )
        ).alias("pos", "wh"),
    )  # pos is 0-based window start
    winners = wins.groupBy("wh").agg(
        F.min(F.struct("doc_id", "pos")).alias("w")
    )
    losers = wins.join(winners, "wh").filter(
        (F.col("doc_id") != F.col("w.doc_id"))
        | (F.col("pos") != F.col("w.pos"))
    )
    loser_starts = losers.groupBy("doc_id").agg(
        F.collect_list("pos").alias("starts")
    )
    covered = F.array_distinct(
        F.flatten(
            F.transform(
                F.coalesce(F.col("starts"), F.array().cast("array<int>")),
                lambda p: F.sequence(p, p + F.lit(k - 1)),
            )
        )
    )
    # array_except is hash-based (O(tokens + covered)) and preserves
    # first-array order — the per-element array_contains filter it
    # replaces was O(tokens × covered) per document
    kept_idx = F.array_except(F.sequence(F.lit(0), F.size(t) - 1), covered)
    return _rebuild_join(dt, loser_starts, mode).select(
        "doc_id",
        F.array_join(
            F.transform(kept_idx, lambda i: F.element_at(t, i + 1)), " "
        ).alias("clean_text"),
        F.size(t).cast("long").alias("n_tokens"),
        (F.size(t) - F.size(kept_idx)).cast("long").alias(
            "n_removed_tokens"
        ),
    )


DOC_SPAN_DEDUP_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
starts AS (
  SELECT doc_id, t,
         unnest(range(0, greatest(len(t) - {_SPAN_K - 1}, 0))) AS pos
  FROM toks
),
wins AS (
  SELECT doc_id, pos,
         array_to_string(list_slice(t, pos + 1, pos + {_SPAN_K}), ' ')
           AS gram
  FROM starts
),
losers AS (
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos,
           row_number() OVER (PARTITION BY gram
                              ORDER BY doc_id, pos) AS rn
    FROM wins
  ) WHERE rn > 1
),
covered AS (
  SELECT DISTINCT doc_id,
         unnest(range(pos, pos + {_SPAN_K})) AS cpos
  FROM losers
),
kept AS (
  SELECT s.doc_id, s.idx, s.tok
  FROM (
    SELECT doc_id, unnest(range(0, len(t))) AS idx,
           unnest(t) AS tok
    FROM toks
  ) s
  LEFT JOIN covered c ON c.doc_id = s.doc_id AND c.cpos = s.idx
  WHERE c.doc_id IS NULL
),
rebuilt AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY idx) AS clean_text
  FROM kept GROUP BY doc_id
)
SELECT t.doc_id,
       coalesce(r.clean_text, '') AS clean_text,
       CAST(len(t.t) AS BIGINT) AS n_tokens,
       CAST(len(t.t) AS BIGINT)
         - CAST(coalesce((SELECT count(*) FROM kept k
                          WHERE k.doc_id = t.doc_id), 0) AS BIGINT)
         AS n_removed_tokens
FROM toks t LEFT JOIN rebuilt r USING (doc_id)
"""


# ==========================================================================
# Budget-exact mixture selection: fill a fixed token budget across
# sources, deterministically
# ==========================================================================

_MIX_BUDGET_TOKENS = 10_000


def doc_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize a training mix against a FIXED token budget: each
    source gets an integer-exact proportional slice of the budget
    (``B · source_tokens // total_tokens``) and fills it by taking
    documents in a deterministic pseudo-random order (the portable
    md5-derived hash every MinHash query uses — reproducible across
    engines AND cluster sizes, unlike a sample() seed) until the next
    document would overflow the slice. Where ``doc_mixture_temperature``
    designs sampling WEIGHTS, this op executes a selection: the output
    is what you actually feed the tokenizer when the contract is "give
    me exactly ≤B tokens, same docs every rerun".

    Scale shape: one groupBy(source) for totals (map-side partials over
    an in-row token count), the |sources|-row budget frame broadcasts,
    and the per-source cumulative sum routes through
    ``running_sum_over_buckets`` (r08, guide §2.5): ``source`` has
    single-digit cardinality, so a plain PARTITION BY source window puts
    1/|sources| of the corpus in ONE task — the definitional hot-key
    wall, hit on EVERY large corpus, not just skewed ones. The bucket is
    a 256-way contiguous range of the selection hash (``h >> 23`` —
    monotone in the window's (h, doc_id) order), so each source's sort
    splits across 256 tasks and the carry join adds |sources|·256 tiny
    rows. The sums are BIGINT — reassociation is exact — and the auto
    probe routes two-phase whenever one source exceeds 1/parallelism of
    sampled rows (always, for single-digit source counts). Integer
    arithmetic end-to-end → strict oracle."""
    from pyspark.sql import Window

    from bulker_spark.plans._common import _SPARK_H

    d = _t(spark, sf_dir, "documents")
    n_tokens = (
        F.length("text") - F.length(F.regexp_replace("text", " ", "")) + 1
    ).cast("long")
    per_doc = d.select(
        "doc_id",
        "source",
        n_tokens.alias("n_tokens"),
        F.expr(_SPARK_H.format(col="cast(doc_id as string)")).alias("h"),
    )
    totals = per_doc.groupBy("source").agg(
        F.sum("n_tokens").alias("src_tokens")
    )
    w_all = Window.partitionBy()  # |sources| rows — constant-size
    # exact integer `div`, not floor(double /): at 100 TB a corpus can
    # exceed 2⁵³-precision territory where a correctly-rounded double
    # quotient lands on the wrong side of the floor
    budgets = totals.withColumn(
        "total_tokens", F.sum("src_tokens").over(w_all)
    ).selectExpr(
        "source",
        "src_tokens",
        f"{_MIX_BUDGET_TOKENS}L * src_tokens div total_tokens"
        " AS budget_tokens",
    )
    from bulker_spark.operators.hotkey import running_sum_over_buckets

    run = running_sum_over_buckets(
        per_doc,
        keys=["source"],
        order=["h", "doc_id"],
        sums={"cum": F.col("n_tokens")},
        # h ∈ [0, 2³¹): >>23 gives 256 contiguous h-ranges, monotone in
        # the (h, doc_id) window order as the helper requires
        bucket=F.shiftright(F.col("h"), 23),
    )
    picked = run.join(F.broadcast(budgets), "source").filter(
        F.col("cum") <= F.col("budget_tokens")
    )
    return (
        picked.groupBy("source")
        .agg(
            F.count("*").alias("n_docs_selected"),
            F.max("cum").alias("tokens_selected"),
        )
        .join(F.broadcast(budgets.select("source", "budget_tokens")), "source", "right")
        .select(
            "source",
            "budget_tokens",
            F.coalesce("n_docs_selected", F.lit(0)).alias("n_docs_selected"),
            F.coalesce("tokens_selected", F.lit(0)).alias("tokens_selected"),
            F.expr(
                "10000 * coalesce(tokens_selected, 0)"
                " div greatest(budget_tokens, 1)"
            ).alias("utilization_bp"),
        )
    )


def _budget_mix_sql() -> str:
    from bulker_spark.plans._common import _DUCK_H

    h = _DUCK_H.format(col="cast(doc_id as varchar)")
    return f"""
WITH per_doc AS (
  SELECT doc_id, source,
         CAST(length(text) - length(replace(text, ' ', '')) + 1
              AS BIGINT) AS n_tokens,
         {h} AS h
  FROM documents
),
budgets AS (
  SELECT source, sum(n_tokens) AS src_tokens,
         {_MIX_BUDGET_TOKENS} * sum(n_tokens)
           // (SELECT sum(n_tokens) FROM per_doc) AS budget_tokens
  FROM per_doc GROUP BY source
),
ranked AS (
  SELECT p.source, p.n_tokens, b.budget_tokens,
         sum(p.n_tokens) OVER (PARTITION BY p.source
                               ORDER BY p.h, p.doc_id) AS cum
  FROM per_doc p JOIN budgets b USING (source)
),
picked AS (
  SELECT source, count(*) AS n_docs_selected,
         max(cum) AS tokens_selected
  FROM ranked WHERE cum <= budget_tokens
  GROUP BY source
)
SELECT b.source,
       b.budget_tokens,
       CAST(coalesce(p.n_docs_selected, 0) AS BIGINT) AS n_docs_selected,
       CAST(coalesce(p.tokens_selected, 0) AS BIGINT) AS tokens_selected,
       10000 * coalesce(p.tokens_selected, 0)
         // greatest(b.budget_tokens, 1) AS utilization_bp
FROM budgets b LEFT JOIN picked p USING (source)
"""


EXTRA_QUERIES10: dict[str, tuple] = {
    "doc_dsir_weights": (doc_dsir_weights, DOC_DSIR_SQL),
    "emb_ivf_probe_autotune": (emb_ivf_probe_autotune, _ivf_autotune_sql()),
    "doc_block_dedup_rebuild": (doc_block_dedup_rebuild, DOC_BLOCK_REBUILD_SQL),
    "doc_curriculum_order": (doc_curriculum_order, DOC_CURRICULUM_SQL),
    "doc_lsh_band_autotune": (doc_lsh_band_autotune, _lsh_autotune_sql()),
    "doc_span_dedup": (doc_span_dedup, DOC_SPAN_DEDUP_SQL),
    "doc_token_budget_mix": (doc_token_budget_mix, _budget_mix_sql()),
}
