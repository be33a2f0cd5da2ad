"""Round-3 catalog extensions: corpus-hygiene, retail-analytics, and
dimension-history operators, each with a DuckDB oracle twin.

Like `analytics.py`, every query here is (a) a pure Catalyst plan unless
the semantics genuinely need Python, (b) written for 100 TB scale — partial
aggregation ahead of every shuffle, broadcast for config-sized sides,
deterministic total orders before any LIMIT — and (c) registered in
`EXTRA_QUERIES2` for the driver's correctness gate.

Reference scope notes (jitsucom/bulker): the reference has no analytics
surface at all (`bulkerlib/implementations/sql/sql_adapter_base.go:287-297`
is the whole aggregation story — COUNT(*)); these operators are the
"beyond the reference" training-data-pipeline tier called for by the
north star, built on the same tables the rest of the catalog uses.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# ==========================================================================
# Block-level (line-level) exact dedup fraction — Dolma/CCNet-style
# ==========================================================================

_BLK = 3  # tokens per block; small vocab corpus needs short blocks to collide


def doc_block_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-block fraction: split each doc into
    consecutive 3-token blocks, count blocks whose text occurs in >= 2
    distinct documents (the "line-level dedup" signal used to strip
    boilerplate from web corpora).

    Scale shape: block generation is a zero-shuffle map (`transform` over
    a `sequence`, no Python); the only wide stages are the block-frequency
    aggregation and the join back — both keyed on `xxhash64(block)` so
    64-bit ints cross the shuffle, not strings. Partial aggregation
    (distinct-doc count per block) runs map-side before either exchange."""
    # project the token array once — expressions referenced inside a
    # transform() lambda are not subexpression-eliminated, so an
    # unprojected split(text) would re-split per block
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.col("text"), " ").alias("t")
    )
    t = F.col("t")
    nblk = F.ceil(F.size(t) / F.lit(_BLK)).cast("int")
    blocks = d.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), nblk - 1),
                lambda i: F.array_join(
                    F.slice(t, i * _BLK + 1, _BLK), " "
                ),
            )
        ).alias("btext"),
    ).select("doc_id", F.xxhash64("btext").alias("bh"))
    counts = blocks.groupBy("bh").agg(
        F.count_distinct("doc_id").alias("ndocs")
    )
    return (
        blocks.join(counts, "bh")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_blocks"),
            F.sum(F.when(F.col("ndocs") >= 2, 1).otherwise(0)).alias(
                "dup_blocks"
            ),
        )
        .select(
            "doc_id",
            "n_blocks",
            "dup_blocks",
            F.round(F.col("dup_blocks") / F.col("n_blocks"), 4).alias(
                "dup_frac"
            ),
        )
    )


DOC_BLOCK_DEDUP_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
         unnest(generate_series(1, len(string_split(text, ' ')))) AS i
  FROM documents
),
blocks AS (
  SELECT doc_id, CAST(floor((i - 1) / {_BLK}) AS BIGINT) AS blk,
         string_agg(tok, ' ' ORDER BY i) AS btext
  FROM toks GROUP BY 1, 2
),
cnt AS (SELECT btext, count(DISTINCT doc_id) AS ndocs FROM blocks GROUP BY 1)
SELECT b.doc_id,
       CAST(count(*) AS BIGINT) AS n_blocks,
       CAST(SUM(CASE WHEN c.ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS dup_blocks,
       ROUND(SUM(CASE WHEN c.ndocs >= 2 THEN 1 ELSE 0 END) * 1.0
             / count(*), 4) AS dup_frac
FROM blocks b JOIN cnt c USING (btext)
GROUP BY 1
"""


# ==========================================================================
# Unigram language-model surprisal — CCNet-perplexity stand-in
# ==========================================================================

def doc_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean unigram surprisal (nats): fit a unigram LM on the
    corpus itself (token -> -ln p(token)) and score every document — the
    shape of CCNet's KenLM-perplexity quality filter with the LM training
    expressed in-plan.

    Scale shape: token instances are never joined directly (the Zipf head
    would make `the` a hot key); instead per-doc token *counts* shuffle
    once, the vocabulary aggregates with map-side partial counts, and the
    count<->vocab join carries one row per (doc, type). The corpus total is
    a 1-row broadcast."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    doc_tok = toks.groupBy("doc_id", "tok").agg(
        F.count("*").alias("k")
    )
    vocab = doc_tok.groupBy("tok").agg(F.sum("k").alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("n"))
    scored = (
        doc_tok.join(vocab, "tok")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "k",
            (F.col("k") * (F.log("n") - F.log("cnt"))).alias("w"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("k").alias("n_tokens"),
            F.round(F.sum("w") / F.sum("k"), 3).alias("avg_surprisal"),
        )
    )


DOC_UNIGRAM_SQL = """
WITH doc_tok AS (
  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS k
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents)
  GROUP BY 1, 2
),
vocab AS (SELECT tok, SUM(k) AS cnt FROM doc_tok GROUP BY 1),
tot AS (SELECT SUM(cnt) AS n FROM vocab)
SELECT doc_id,
       CAST(SUM(k) AS BIGINT) AS n_tokens,
       ROUND(SUM(k * (ln(n) - ln(cnt))) / SUM(k), 3) AS avg_surprisal
FROM doc_tok JOIN vocab USING (tok), tot
GROUP BY 1
"""


# ==========================================================================
# Market-basket brand co-occurrence — association-rule support counts
# ==========================================================================

def parts_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 co-purchased brand pairs by order support. Dimension lookup
    (part -> brand) broadcasts; baskets collapse to one array row per
    order (`collect_set`, bounded by brand cardinality so no hot-row
    risk), and the pair expansion happens *inside* the row with
    `transform`/`slice` — no self-join, no second scan, two exchanges
    total (basket build + pair count). The final top-k is a TakeOrdered,
    not a global sort; ranking (support desc, then brand pair) is a total
    order so the LIMIT is stable across engines."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pt = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    baskets = (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("p_brand")).alias("brands"))
    )
    brands = F.col("brands")
    pairs = baskets.select(
        F.explode(
            F.flatten(
                F.transform(
                    brands,
                    lambda x, i: F.transform(
                        F.slice(brands, i + 2, F.size(brands)),
                        lambda y: F.struct(
                            x.alias("brand_a"), y.alias("brand_b")
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.brand_a", "p.brand_b")
    return (
        pairs.groupBy("brand_a", "brand_b")
        .agg(F.count("*").alias("support"))
        .orderBy(F.col("support").desc(), "brand_a", "brand_b")
        .limit(50)
    )


PARTS_COPURCHASE_SQL = """
WITH baskets AS (
  SELECT DISTINCT l.l_orderkey, p.p_brand AS brand
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
)
SELECT a.brand AS brand_a, b.brand AS brand_b,
       CAST(count(*) AS BIGINT) AS support
FROM baskets a JOIN baskets b
  ON a.l_orderkey = b.l_orderkey AND a.brand < b.brand
GROUP BY 1, 2
ORDER BY support DESC, brand_a, brand_b
LIMIT 50
"""


# ==========================================================================
# k-NN join — batched similarity search (queries x candidates)
# ==========================================================================

def emb_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN join: for each query vector (vec_id < 20) the top-3 cosine
    neighbors among the candidate pool (vec_id >= 20). The query block is
    config-sized so it broadcasts and the candidate scan stays
    shuffle-free until the final per-query top-k (a 20-key window over
    rows already filtered to rank <= k by nothing larger than the
    partial sort). Ranking on the rounded similarity with a vec_id
    tiebreak is deterministic across engines."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    c = e.filter(F.col("vec_id") >= 20).select("vec_id", "embedding")
    j = c.crossJoin(F.broadcast(q))
    dot = F.aggregate(
        F.zip_with(
            "embedding", "qe", lambda x, y: x.cast("double") * y.cast("double")
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    n2 = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    q2 = F.aggregate(
        F.transform("qe", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = j.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(dot / (F.sqrt(n2) * F.sqrt(q2)), 3).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), "neighbor_id"
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


EMB_KNN_JOIN_SQL = """
WITH ex AS (
  SELECT vec_id, unnest(embedding)::DOUBLE AS v,
         unnest(generate_series(1, len(embedding))) AS i
  FROM embeddings
),
n AS (SELECT vec_id, SUM(v * v) AS n2 FROM ex GROUP BY 1),
dots AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         SUM(q.v * c.v) AS dot
  FROM ex q JOIN ex c ON q.i = c.i
  WHERE q.vec_id < 20 AND c.vec_id >= 20
  GROUP BY 1, 2
),
scored AS (
  SELECT query_id, neighbor_id,
         ROUND(dot / (sqrt(nq.n2) * sqrt(nc.n2)), 3) AS cos_sim
  FROM dots
  JOIN n nq ON query_id = nq.vec_id
  JOIN n nc ON neighbor_id = nc.vec_id
)
SELECT query_id, neighbor_id, cos_sim,
       CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id
       ) AS BIGINT) AS rank
FROM scored
QUALIFY rank <= 3
"""


# ==========================================================================
# Inter-arrival gap statistics — behavioral-telemetry profile
# ==========================================================================

def events_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type inter-arrival statistics: the gap (seconds) from
    each event to the same user's previous event, aggregated by the type
    of the later event. The lag rides the bucketed two-phase window
    (``operators/hotkey.lag_over_buckets`` — the naive per-user window
    measured 23.3x max/median task time on the Zipf fixture, the worst
    skew in the catalog), then one partial-aggregated exchange for the
    per-type rollup. `timestampdiff` over second-truncated operands is
    TIMESTAMP_NTZ-safe and matches SQL date_diff('second', ...)
    boundary-crossing semantics."""
    from bulker_spark.operators.hotkey import lag_over_buckets

    ev = _t(spark, sf_dir, "events")
    gapped = lag_over_buckets(
        ev.select("user_id", "ts", "event_id", "event_type"),
        keys=["user_id"],
        order=["ts", "event_id"],
        lag_cols={"__prev_ts": "ts"},
    ).filter(F.col("__prev_ts").isNotNull())
    gap = F.expr(
        "timestampdiff(SECOND, date_trunc('second', __prev_ts),"
        " date_trunc('second', ts))"
    )
    return (
        gapped.select("event_type", gap.alias("gap_s"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_gaps"),
            F.round(F.avg("gap_s"), 2).alias("avg_gap_s"),
            F.min("gap_s").alias("min_gap_s"),
            F.max("gap_s").alias("max_gap_s"),
        )
    )


EVENTS_INTERARRIVAL_SQL = """
WITH gapped AS (
  SELECT event_type,
         date_diff('second',
                   date_trunc('second',
                              lag(ts) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id)),
                   date_trunc('second', ts)) AS gap_s
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_gaps,
       ROUND(AVG(gap_s), 2) AS avg_gap_s,
       MIN(gap_s) AS min_gap_s,
       MAX(gap_s) AS max_gap_s
FROM gapped
WHERE gap_s IS NOT NULL
GROUP BY 1
"""


# ==========================================================================
# SCD Type-2 history reconstruction — gaps-and-islands over a dimension
# ==========================================================================

def customer_priority_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reconstruct a slowly-changing-dimension (type 2) history from an
    event log: each customer's order-priority over their order sequence,
    with consecutive same-priority runs collapsed into versioned validity
    intervals (`valid_to` NULL = current). Gaps-and-islands via
    lag -> change flag -> running sum, then one grouped pass — all three
    windows share the `o_custkey` partitioning, so the whole history
    rebuild is a single shuffle. The batch twin of the `scd2_apply`
    operator in `operators/scd2.py`."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    flagged = o.withColumn(
        "__chg",
        F.when(
            F.lag("o_orderpriority").over(w).isNull()
            | (F.lag("o_orderpriority").over(w) != F.col("o_orderpriority")),
            1,
        ).otherwise(0),
    ).withColumn(
        "version",
        F.sum("__chg")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long"),
    )
    runs = flagged.groupBy("o_custkey", "version").agg(
        F.first("o_orderpriority").alias("priority"),
        F.min("o_orderdate").alias("valid_from"),
    )
    w2 = Window.partitionBy("o_custkey").orderBy("version")
    return runs.select(
        F.col("o_custkey").alias("custkey"),
        "version",
        "priority",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
    )


CUSTOMER_SCD2_SQL = """
WITH flagged AS (
  SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
         CASE WHEN lag(o_orderpriority) OVER w IS NULL
                OR lag(o_orderpriority) OVER w <> o_orderpriority
              THEN 1 ELSE 0 END AS chg
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
),
versioned AS (
  SELECT *, CAST(SUM(chg) OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
              AS version
  FROM flagged
),
runs AS (
  SELECT o_custkey, version,
         min(o_orderpriority) AS priority,
         min(o_orderdate) AS valid_from
  FROM versioned GROUP BY 1, 2
)
SELECT o_custkey AS custkey, version, priority, valid_from,
       lead(valid_from) OVER (PARTITION BY o_custkey ORDER BY version)
         AS valid_to
FROM runs
"""


# ==========================================================================
# Table profiling — per-column stats in one aggregation pass
# ==========================================================================

def events_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of the events table (rows / nulls / distincts /
    null fraction) via `functions.profile.profile`: every column's
    statistics are computed inside ONE partial-aggregated pass — a single
    scan and a 1-row shuffle no matter how many columns the table has."""
    from ..functions.profile import profile

    ev = _t(spark, sf_dir, "events")
    return profile(ev).withColumnRenamed("column", "col_name")


EVENTS_PROFILE_SQL = """
WITH n AS (SELECT count(*) AS n_rows FROM events)
SELECT p.col_name, n.n_rows, p.n_nulls, p.n_distinct,
       ROUND(p.n_nulls * 1.0 / n.n_rows, 4) AS null_frac
FROM (
  SELECT 'event_id' AS col_name,
         CAST(SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct FROM events
  UNION ALL
  SELECT 'ts', CAST(SUM(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         CAST(count(DISTINCT ts) AS BIGINT) FROM events
  UNION ALL
  SELECT 'user_id', CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         CAST(count(DISTINCT user_id) AS BIGINT) FROM events
  UNION ALL
  SELECT 'event_type', CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         CAST(count(DISTINCT event_type) AS BIGINT) FROM events
  UNION ALL
  SELECT 'value', CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         CAST(count(DISTINCT value) AS BIGINT) FROM events
  UNION ALL
  SELECT 'props', CAST(SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         CAST(count(DISTINCT props) AS BIGINT) FROM events
) p, n
"""


# ==========================================================================
# Declarative data-quality checks — deequ/dbt-style expectations
# ==========================================================================

def orders_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint validation over orders: PK uniqueness, FK non-null,
    accepted status values, and a positive-amount expression — all four
    compiled into one aggregation pass by `functions.profile.run_checks`
    (violations are counted, the plan never crashes on bad rows)."""
    from ..functions.profile import (
        accepted_values,
        expression,
        non_null,
        run_checks,
        unique,
    )

    o = _t(spark, sf_dir, "orders")
    out = run_checks(
        o,
        [
            unique("o_orderkey"),
            non_null("o_custkey"),
            accepted_values("o_orderstatus", ["O", "F", "P"]),
            expression("o_totalprice > 0", "o_totalprice_positive"),
        ],
    )
    return out.withColumnRenamed("check", "check_name")


ORDERS_CHECKS_SQL = """
SELECT 'o_orderkey_unique' AS check_name,
       CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS violations,
       count(*) - count(DISTINCT o_orderkey) = 0 AS passed
FROM orders
UNION ALL
SELECT 'o_custkey_not_null',
       CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) = 0
FROM orders
UNION ALL
SELECT 'o_orderstatus_accepted',
       CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P')
                       OR o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P')
                  OR o_orderstatus IS NULL THEN 1 ELSE 0 END) = 0
FROM orders
UNION ALL
SELECT 'o_totalprice_positive',
       CAST(SUM(CASE WHEN NOT (o_totalprice > 0) THEN 1 ELSE 0 END) AS BIGINT),
       SUM(CASE WHEN NOT (o_totalprice > 0) THEN 1 ELSE 0 END) = 0
FROM orders
"""


# ==========================================================================
# Count-min sketch heavy-hitter estimates
# ==========================================================================

_CMS_W, _CMS_D = 512, 2


def events_cms_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch frequency estimates vs exact counts for a probe
    key set (user_id < 20). The sketch shuffles depth x width = 1024
    mergeable cells instead of the full user key set — the O(sketch)
    reduce that survives arbitrary key cardinality at 100 TB. Estimates
    are deterministic (md5-derived hashes) so the DuckDB oracle rebuilds
    the identical sketch; `test_sketch_accuracy.py` pins the
    overcount bound."""
    from ..functions.sketches import count_min_lookup, count_min_sketch

    ev = _t(spark, sf_dir, "events")
    cms = count_min_sketch(ev, "user_id", width=_CMS_W, depth=_CMS_D)
    # r08 (guide §2.2): the probe key set IS the exact-count branch's key
    # set (distinct users < 20), so derive it from `true` instead of a
    # third events scan + distinct — the two consumers now share one
    # identical aggregation subtree (AQE stage reuse), and events is
    # scanned twice (sketch + exact counts) instead of three times
    true = (
        ev.filter(F.col("user_id") < 20)
        .groupBy("user_id")
        .agg(F.count("*").alias("true_count"))
    )
    # the always-true filter references true_count so Catalyst cannot
    # prune it out of this branch's aggregate — both consumers then share
    # one identical exchange subtree (the doc_tfidf_top_terms trick)
    est = count_min_lookup(
        cms,
        true.filter(F.col("true_count") >= 1).select("user_id"),
        "user_id",
        width=_CMS_W,
        depth=_CMS_D,
    )
    return est.join(true, "user_id").select(
        "user_id", "est_count", "true_count"
    )


EVENTS_CMS_SQL = f"""
WITH cells AS (
  SELECT 0 AS d,
         CAST(('0x' || substr(md5('0:' || CAST(user_id AS VARCHAR)), 1, 15))
              ::UBIGINT % {_CMS_W} AS BIGINT) AS cell
  FROM events
  UNION ALL
  SELECT 1,
         CAST(('0x' || substr(md5('1:' || CAST(user_id AS VARCHAR)), 1, 15))
              ::UBIGINT % {_CMS_W} AS BIGINT)
  FROM events
),
cms AS (SELECT d, cell, CAST(count(*) AS BIGINT) AS cnt
        FROM cells GROUP BY 1, 2),
probes AS (SELECT DISTINCT user_id FROM events WHERE user_id < 20),
qcells AS (
  SELECT user_id, 0 AS d,
         CAST(('0x' || substr(md5('0:' || CAST(user_id AS VARCHAR)), 1, 15))
              ::UBIGINT % {_CMS_W} AS BIGINT) AS cell
  FROM probes
  UNION ALL
  SELECT user_id, 1,
         CAST(('0x' || substr(md5('1:' || CAST(user_id AS VARCHAR)), 1, 15))
              ::UBIGINT % {_CMS_W} AS BIGINT)
  FROM probes
),
est AS (
  SELECT user_id, MIN(cnt) AS est_count
  FROM qcells JOIN cms USING (d, cell) GROUP BY 1
),
tru AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS true_count
  FROM events WHERE user_id < 20 GROUP BY 1
)
SELECT user_id, est_count, true_count FROM est JOIN tru USING (user_id)
"""


# ==========================================================================
# Time-series: gap-filled resampling and trailing range-frame windows
# ==========================================================================

def events_resample_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly resample per user (users 0-2): a dense hour grid
    from each user's first to last event (`sequence` + explode — in-row
    generation, no shuffle), left-joined to the per-bucket aggregates and
    zero-filled. The grid and the aggregate share the user_id hash
    partitioning, and the grid side is bounded by time-span/granularity —
    never by event count — so the fill scales with the calendar, not the
    data."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 3)
    hour = F.date_trunc("hour", F.col("ts"))
    bounds = ev.groupBy("user_id").agg(
        F.min(hour).alias("t0"), F.max(hour).alias("t1")
    )
    grid = bounds.select(
        "user_id",
        F.explode(
            F.sequence("t0", "t1", F.expr("interval 1 hour"))
        ).alias("bucket"),
    )
    counts = ev.groupBy("user_id", hour.alias("bucket")).agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("v")
    )
    return grid.join(counts, ["user_id", "bucket"], "left").select(
        "user_id",
        "bucket",
        F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
        F.coalesce(F.col("v"), F.lit(0.0)).alias("total_value"),
    )


EVENTS_RESAMPLE_SQL = """
WITH ev AS (SELECT * FROM events WHERE user_id < 3),
bounds AS (
  SELECT user_id, min(date_trunc('hour', ts)) AS t0,
         max(date_trunc('hour', ts)) AS t1
  FROM ev GROUP BY 1
),
grid AS (
  SELECT user_id, unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS bucket
  FROM bounds
),
counts AS (
  SELECT user_id, date_trunc('hour', ts) AS bucket,
         CAST(count(*) AS BIGINT) AS n, ROUND(SUM(value), 2) AS v
  FROM ev GROUP BY 1, 2
)
SELECT g.user_id, g.bucket,
       COALESCE(c.n, 0) AS n_events,
       COALESCE(c.v, 0.0) AS total_value
FROM grid g LEFT JOIN counts c USING (user_id, bucket)
"""


def events_trailing_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour window per event (users < 10): count and value-sum
    of the same user's events in [t-1h, t] — a RANGE frame over epoch
    seconds, not a rows frame, so simultaneous bursts are fully included
    regardless of row order. Count and sum are invertible, so the frame
    rides ``operators/hotkey.trailing_range_sums`` — prefix sums +
    boundary probes, O(rows): hot-key-splittable AND frame-size-proof
    (Spark's native sliding range frame re-adds the whole frame per
    row — O(rows x frame), quadratic in a bot user's event rate:
    measured 61.6 s naive / 26 s-max-task halo'd on the Zipf fixture vs
    ~1 s this shape). The SUM is decimal-cast on BOTH engines — the
    prefix difference reassociates the addition, and decimal is exact
    and associative where double would drift."""
    from bulker_spark.operators.hotkey import trailing_range_sums

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    secs = F.expr(
        "timestampdiff(SECOND, TIMESTAMP_NTZ'2024-01-01 00:00:00',"
        " date_trunc('second', ts))"
    )
    out = trailing_range_sums(
        ev.withColumn("__secs", secs),
        keys=["user_id"],
        secs_col="__secs",
        lookback=3600,
        sums={
            "__n": F.lit(1).cast("long"),
            "__v": F.col("value").cast("decimal(18,6)"),
        },
        row_id="event_id",
    )
    return out.select(
        "user_id",
        "event_id",
        "ts",
        F.col("__n").cast("long").alias("n_1h"),
        F.round(F.col("__v"), 2).cast("double").alias("value_1h"),
    )


EVENTS_TRAILING_SQL = """
SELECT user_id, event_id, ts,
       CAST(count(*) OVER w AS BIGINT) AS n_1h,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))) OVER w, 2) AS DOUBLE)
           AS value_1h
FROM (
  SELECT *, date_diff('second', TIMESTAMP '2024-01-01 00:00:00',
                      date_trunc('second', ts)) AS secs
  FROM events WHERE user_id < 10
)
WINDOW w AS (PARTITION BY user_id ORDER BY secs
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
"""


# ==========================================================================
# ML feature extraction — per-user behavioral features in one plan
# ==========================================================================

def events_user_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user feature vector for downstream ML (users < 30): RFM-style
    recency/frequency/monetary plus session count. The session-boundary
    lag rides the bucketed two-phase window
    (``operators/hotkey.lag_over_buckets``) so a bot user's stream
    spreads over per-day partitions instead of one task; the final
    per-user rollup is a groupBy, which partial-aggregates the hot key
    map-side. Session boundaries use the same 30-min gap rule as the
    sessionize operators (timestampdiff over second-truncated operands,
    TIMESTAMP_NTZ-safe)."""
    from bulker_spark.operators.hotkey import lag_over_buckets

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    gap = F.expr(
        "timestampdiff(SECOND, date_trunc('second', __prev_ts),"
        " date_trunc('second', ts))"
    )
    flagged = lag_over_buckets(
        ev,
        keys=["user_id"],
        order=["ts", "event_id"],
        lag_cols={"__prev_ts": "ts"},
    ).withColumn(
        "__new_session",
        F.when(F.col("__prev_ts").isNull() | (gap > 1800), 1).otherwise(0),
    )
    return flagged.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.count_distinct(F.date_trunc("day", F.col("ts"))).alias(
            "n_active_days"
        ),
        F.min("ts").alias("first_seen"),
        F.max("ts").alias("last_seen"),
        F.round(F.avg("value"), 3).alias("avg_value"),
        F.sum("__new_session").cast("long").alias("n_sessions"),
    )


EVENTS_USER_FEATURES_SQL = """
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR date_diff('second',
                             date_trunc('second', lag(ts) OVER w),
                             date_trunc('second', ts)) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events WHERE user_id < 30
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT date_trunc('day', ts)) AS BIGINT) AS n_active_days,
       min(ts) AS first_seen,
       max(ts) AS last_seen,
       ROUND(AVG(value), 3) AS avg_value,
       CAST(SUM(new_session) AS BIGINT) AS n_sessions
FROM flagged
GROUP BY 1
"""


EXTRA_QUERIES2: dict[str, tuple] = {
    "doc_block_dedup": (doc_block_dedup, DOC_BLOCK_DEDUP_SQL),
    "doc_unigram_logprob": (doc_unigram_logprob, DOC_UNIGRAM_SQL),
    "parts_copurchase": (parts_copurchase, PARTS_COPURCHASE_SQL),
    "emb_knn_join": (emb_knn_join, EMB_KNN_JOIN_SQL),
    "events_interarrival_stats": (
        events_interarrival_stats,
        EVENTS_INTERARRIVAL_SQL,
    ),
    "customer_priority_scd2": (customer_priority_scd2, CUSTOMER_SCD2_SQL),
    "events_profile": (events_profile, EVENTS_PROFILE_SQL),
    "orders_quality_checks": (orders_quality_checks, ORDERS_CHECKS_SQL),
    "events_cms_user_counts": (events_cms_user_counts, EVENTS_CMS_SQL),
    "events_resample_hourly": (events_resample_hourly, EVENTS_RESAMPLE_SQL),
    "events_trailing_1h": (events_trailing_1h, EVENTS_TRAILING_SQL),
    "events_user_features": (events_user_features, EVENTS_USER_FEATURES_SQL),
}
