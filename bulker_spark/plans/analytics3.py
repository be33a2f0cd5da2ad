"""Round-4 catalog extensions: behavioral sequence mining, attribution,
corpus novelty, and operational-latency operators — each a pure Catalyst
plan with a DuckDB oracle twin.

Reference scope (jitsucom/bulker): none of this exists in the reference
(its aggregation surface is COUNT(*), ``bulkerlib/implementations/sql/
sql_adapter_base.go:287-297``); these extend the training-data /
product-analytics tier the north star calls for, over the same tables.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# ==========================================================================
# Event-type Markov transition matrix
# ==========================================================================

def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    count (prev_type → type) steps, plus the row-normalized probability.

    Scale shape: the lag rides the bucketed two-phase window
    (``operators/hotkey.lag_over_buckets`` — every partition bounded by
    one user-day; the naive ``partitionBy(user_id)`` measured 23x
    max/median task time on the Zipf fixture, SCALING.md skew tier);
    the transition aggregation is 25 keys (|types|²) so its exchange
    moves a few hundred partial rows, and the row-normalizing sum rides
    a 25-row window — nothing downstream of the first shuffle scales
    with data size."""
    from bulker_spark.operators.hotkey import lag_over_buckets

    ev = _t(spark, sf_dir, "events")
    steps = lag_over_buckets(
        ev.select("user_id", "ts", "event_id", "event_type"),
        keys=["user_id"],
        order=["ts", "event_id"],
        lag_cols={"prev_type": "event_type"},
    ).filter(F.col("prev_type").isNotNull())
    counts = steps.groupBy("prev_type", "event_type").agg(
        F.count("*").alias("n")
    )
    row_total = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "event_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(row_total), 4).alias("p"),
    )


EVENTS_MARKOV_SQL = """
WITH steps AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type,
         event_type
  FROM events
), c AS (
  SELECT prev_type, event_type, CAST(count(*) AS BIGINT) AS n
  FROM steps WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT prev_type, event_type, n,
       ROUND(n / SUM(n) OVER (PARTITION BY prev_type), 4) AS p
FROM c
"""


# ==========================================================================
# Last-touch attribution
# ==========================================================================

def events_attribution_last_touch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Marketing attribution: each purchase is credited to the user's most
    recent click/view strictly before it and at most 1 day old; purchases
    with no such touch are 'none'. Output: credited channel → purchases.

    Spark-first shape: NO purchase×touch join (which explodes on active
    users) — purchases and touches ride ONE carry-forward pass, the
    bucketed two-phase ``operators/hotkey.carry_over_buckets`` (the
    naive per-user ``last(..., ignorenulls)`` window single-tasks a bot
    user's whole stream; the (type, ts) pair rides ONE struct so both
    values come from the same touch row). The same as-of trick as
    ``operators/asof.py``, hot-key-splittable."""
    from bulker_spark.operators.hotkey import carry_over_buckets

    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click", "view")
    )
    tagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            F.col("event_type") != "purchase",
            F.struct(
                F.col("event_type").alias("t"), F.col("ts").alias("at")
            ),
        ).alias("touch"),
    )
    credited = (
        carry_over_buckets(
            tagged,
            keys=["user_id"],
            order=["ts", "event_id"],
            carry_cols={"last_touch": "touch"},
        )
        .withColumn("last_type", F.col("last_touch.t"))
        .withColumn("last_ts", F.col("last_touch.at"))
        .filter(F.col("event_type") == "purchase")
        .select(
            F.coalesce(
                F.when(
                    F.expr(
                        "timestampdiff(SECOND, date_trunc('second', last_ts),"
                        " date_trunc('second', ts))"
                    )
                    <= 86400,
                    F.col("last_type"),
                ),
                F.lit("none"),
            ).alias("channel")
        )
    )
    return credited.groupBy("channel").agg(F.count("*").alias("purchases"))


EVENTS_ATTRIBUTION_SQL = """
WITH tagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN event_type <> 'purchase' THEN event_type END AS touch_type,
         CASE WHEN event_type <> 'purchase' THEN ts END AS touch_ts
  FROM events
  WHERE event_type IN ('purchase', 'click', 'view')
), carried AS (
  SELECT *,
         last_value(touch_type IGNORE NULLS) OVER
           (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_type,
         last_value(touch_ts IGNORE NULLS) OVER
           (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_ts
  FROM tagged
)
SELECT COALESCE(CASE WHEN date_diff('second', last_ts, ts) <= 86400
                     THEN last_type END, 'none') AS channel,
       CAST(count(*) AS BIGINT) AS purchases
FROM carried
WHERE event_type = 'purchase'
GROUP BY 1
"""


# ==========================================================================
# Corpus n-gram novelty
# ==========================================================================

_NOV_N = 4  # tokens per shingle


def doc_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty: the fraction of a doc's distinct 4-token
    shingles whose FIRST corpus occurrence (lowest doc_id) is this doc —
    the dedup-adjacent signal that separates original content from
    remixes when curating training data.

    Scale shape: shingles are generated in-row (transform over sequence,
    zero Python, zero shuffle) and leave the scan as 64-bit xxhash64
    ints. The per-(h, doc) distinct partial-aggregates map-side, then a
    min-over-h window marks first occurrences — chosen over the
    equivalent self-join because Catalyst does NOT reuse the shingle
    exchange across the two join branches, so the join shape pays the
    explode scan (the dominant linear cost) twice; the window shape
    scans once (measured 1.7 s vs 2.1 s at sf0.1). The window partition
    for one hash is bounded by that shingle's document frequency —
    distinct docs, not occurrences — so even a Zipf-head shingle stays a
    spillable single task, and everything upstream is partial-agged."""
    # project the token array once — lambda bodies are not
    # subexpression-eliminated, so an unprojected split(text) would
    # re-split per shingle
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.col("text"), " ").alias("t")
    )
    t = F.col("t")
    n_sh = F.size(t) - F.lit(_NOV_N - 1)
    # sequence(1, 0) counts DOWN ([1, 0]) rather than being empty: a
    # doc with fewer than _NOV_N tokens must emit ZERO shingles (and
    # drop out of the output, exactly like the oracle's range(1, 1))
    starts = F.when(n_sh >= 1, F.sequence(F.lit(1), n_sh)).otherwise(
        F.array().cast("array<int>")
    )
    shingles = (
        d.select(
            "doc_id",
            F.explode(
                F.transform(
                    starts,
                    # variadic xxhash64 over the token elements — no
                    # per-shingle string concatenation
                    lambda i: F.xxhash64(
                        *[F.element_at(t, i + j) for j in range(_NOV_N)]
                    ),
                )
            ).alias("h"),
        )
        # r08 (guide §2.4): partition by h ALONE before the (h, doc_id)
        # distinct — HashPartitioning(h) satisfies both the aggregate's
        # ClusteredDistribution(h, doc_id) and the window's
        # ClusteredDistribution(h), so the dedup and the min-over-h ride
        # ONE corpus-scale exchange instead of two (3 → 2 Exchanges,
        # verified in the executed plan). The trade: the exchange now
        # carries raw shingle rows instead of map-side-deduped pairs —
        # within-doc 4-gram repeats are the only duplicates a map-side
        # partial could remove (a doc's shingles never split across scan
        # partitions), so bytes grow by the in-doc repeat rate (~10% on
        # typical text) while a full second exchange+pipeline pass of
        # the whole pair set disappears. REPARTITION_BY_COL stays
        # AQE-coalescible, so the partition count remains scale-adaptive.
        .repartition(F.col("h"))
        .groupBy("h", "doc_id")
        .agg(F.lit(1).alias("_one"))
    )
    w = Window.partitionBy("h")
    return (
        shingles.withColumn("first_doc", F.min("doc_id").over(w))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_shingles"),
            F.round(
                F.avg((F.col("first_doc") == F.col("doc_id")).cast("double")),
                4,
            ).alias("novelty"),
        )
    )


DOC_NOVELTY_SQL = f"""
WITH sh AS (
  SELECT DISTINCT doc_id,
         hash(array_to_string(tokens[i:i+{_NOV_N - 1}], ' ')) AS h
  FROM (SELECT doc_id, string_split(text, ' ') AS tokens FROM documents),
       unnest(range(1, greatest(len(tokens) - {_NOV_N - 1}, 0) + 1)) AS t(i)
), first_seen AS (
  SELECT h, min(doc_id) AS first_doc FROM sh GROUP BY 1
)
SELECT sh.doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       ROUND(AVG(CASE WHEN first_doc = sh.doc_id THEN 1.0 ELSE 0.0 END), 4)
         AS novelty
FROM sh JOIN first_seen USING (h)
GROUP BY 1
"""


# ==========================================================================
# Order→ship latency by priority
# ==========================================================================

def orders_shipping_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operational latency: days between order date and each line item's
    ship date, aggregated per order priority (count, mean, exact median).

    The join shuffles on orderkey once. The median is computed EXACTLY
    from a (priority, delay) histogram rather than Spark's sort-based
    ``percentile``: exact percentile funnels every row of a group into
    one reducer (5 groups × all rows — unbounded state at 100 TB),
    while the histogram partial-aggregates map-side and bounds all wide
    state at |priorities| × |distinct day-delays| regardless of row
    count. Continuous-median interpolation (avg of the two straddling
    order statistics via cumulative counts) reproduces
    ``quantile_cont(0.5)`` bit-for-bit on integer day delays."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    delay = F.expr(
        "timestampdiff(DAY, date_trunc('DAY', o_orderdate),"
        " date_trunc('DAY', l_shipdate))"
    ).cast("double")
    hist = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select("o_orderpriority", delay.alias("delay_days"))
        .groupBy("o_orderpriority", "delay_days")
        .agg(F.count("*").alias("c"))
    )
    wp = Window.partitionBy("o_orderpriority")
    wo = wp.orderBy("delay_days")
    h = (F.col("n") + 1) / 2  # 1-based continuous-median rank
    k1, k2 = F.floor(h), F.ceil(h)
    cum = hist.withColumn("n", F.sum("c").over(wp)).withColumn(
        "cum", F.sum("c").over(wo)
    )
    return (
        cum.groupBy("o_orderpriority")
        .agg(
            F.first("n").alias("n0"),  # constant within the group
            F.round(
                F.sum(F.col("delay_days") * F.col("c")) / F.first("n"), 3
            ).alias("avg_delay"),
            (
                (
                    F.min(F.when(F.col("cum") >= k1, F.col("delay_days")))
                    + F.min(F.when(F.col("cum") >= k2, F.col("delay_days")))
                )
                / 2
            ).alias("p50_delay"),
        )
        .select(
            "o_orderpriority",
            F.col("n0").cast("long").alias("n"),
            "avg_delay",
            "p50_delay",
        )
        .orderBy("o_orderpriority")
    )


ORDERS_DELAY_SQL = """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n,
       ROUND(AVG(date_diff('day', date_trunc('day', o_orderdate),
                           date_trunc('day', l_shipdate))), 3) AS avg_delay,
       quantile_cont(CAST(date_diff('day', date_trunc('day', o_orderdate),
                          date_trunc('day', l_shipdate)) AS DOUBLE), 0.5)
         AS p50_delay
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1 ORDER BY 1
"""


# ==========================================================================
# Fixed-width value histogram
# ==========================================================================

_HIST_W = 5.0


def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of the event value column (bin width 5) —
    the profiling primitive behind distribution drift checks. Bin
    assignment is a codegen'd floor division; the aggregate's exchange
    carries |bins| partial rows."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(
            F.floor(F.col("value") / F.lit(_HIST_W)).cast("long").alias("bin")
        )
        .groupBy("bin")
        .agg(F.count("*").alias("n"))
        .withColumn("lo", (F.col("bin") * _HIST_W).cast("double"))
        .select("bin", "lo", "n")
    )


EVENTS_HISTOGRAM_SQL = f"""
SELECT CAST(floor(value / {_HIST_W}) AS BIGINT) AS bin,
       CAST(floor(value / {_HIST_W}) * {_HIST_W} AS DOUBLE) AS lo,
       CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY 1, 2
"""


EXTRA_QUERIES3: dict[str, tuple] = {
    "events_markov_transitions": (
        events_markov_transitions,
        EVENTS_MARKOV_SQL,
    ),
    "events_attribution_last_touch": (
        events_attribution_last_touch,
        EVENTS_ATTRIBUTION_SQL,
    ),
    "doc_ngram_novelty": (doc_ngram_novelty, DOC_NOVELTY_SQL),
    "orders_shipping_delay": (orders_shipping_delay, ORDERS_DELAY_SQL),
    "events_value_histogram": (events_value_histogram, EVENTS_HISTOGRAM_SQL),
}


# ==========================================================================
# ABC / Pareto revenue classification
# ==========================================================================

def customers_abc_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto (ABC) analysis: customers ranked by revenue, classified by
    their position in the cumulative revenue share — A up to 50%, B up to
    80%, C the tail. Output: class → customers, revenue share.

    Scale shape: per-customer revenue is ONE partial-aggregated shuffle on
    custkey; the cumulative window runs over the aggregated (customer-
    cardinality) rows, not order rows, and the final rollup is 3 groups.
    The global orderBy the cumsum needs is a range partition over
    already-aggregated data."""
    o = _t(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("rev"))
    w = (
        Window.orderBy(F.col("rev").desc(), F.col("o_custkey"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    total = rev.agg(F.sum("rev")).collect()[0][0]
    classed = rev.withColumn(
        "cum_share", F.sum("rev").over(w) / F.lit(total)
    ).withColumn(
        "abc",
        F.when(F.col("cum_share") <= 0.5, "A")
        .when(F.col("cum_share") <= 0.8, "B")
        .otherwise("C"),
    )
    return (
        classed.groupBy("abc")
        .agg(
            F.count("*").alias("customers"),
            F.round(F.sum("rev") / F.lit(total), 4).alias("rev_share"),
        )
        .orderBy("abc")
    )


CUSTOMERS_ABC_SQL = """
WITH rev AS (
  SELECT o_custkey, SUM(o_totalprice) AS rev FROM orders GROUP BY 1
), c AS (
  SELECT o_custkey, rev,
         SUM(rev) OVER (ORDER BY rev DESC, o_custkey
                        ROWS UNBOUNDED PRECEDING)
           / SUM(rev) OVER () AS cum_share
  FROM rev
)
SELECT CASE WHEN cum_share <= 0.5 THEN 'A'
            WHEN cum_share <= 0.8 THEN 'B' ELSE 'C' END AS abc,
       CAST(count(*) AS BIGINT) AS customers,
       ROUND(SUM(rev) / (SELECT SUM(rev) FROM rev), 4) AS rev_share
FROM c GROUP BY 1 ORDER BY 1
"""


# ==========================================================================
# Robust (MAD) length outliers
# ==========================================================================

def doc_length_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection on document length: flag docs whose
    |len - median| exceeds 1.5 × MAD (median absolute deviation) — the
    z-score's robust cousin, standard in corpus quality triage where a
    few megadocs wreck mean/stddev.

    ONE histogram aggregation (partial-agged map-side, wide state =
    |distinct lengths|) feeds exact driver-side quantile interpolation
    for both the median and the MAD — versus Spark's exact
    ``percentile``, which would buffer the whole column in a single
    reducer twice. Both scalars then broadcast back as literals — the
    corpus is scanned, never shuffled on a key."""
    import math

    d = _t(spark, sf_dir, "documents")
    pairs = sorted(
        (r["n_chars"], r["c"])
        for r in d.groupBy("n_chars").agg(F.count("*").alias("c")).collect()
    )

    def _qcont(hist, p):  # quantile_cont over a sorted (value, count) list
        n = sum(c for _, c in hist)
        h = 1 + (n - 1) * p
        k1, k2 = math.floor(h), math.ceil(h)
        lo = hi = None
        cum = 0
        for v, c in hist:
            cum += c
            if lo is None and cum >= k1:
                lo = v
            if cum >= k2:
                hi = v
                break
        return lo + (h - k1) * (hi - lo)

    med = _qcont(pairs, 0.5)
    dev: dict[float, int] = {}
    for v, c in pairs:
        k = abs(v - med)
        dev[k] = dev.get(k, 0) + c
    mad = _qcont(sorted(dev.items()), 0.5)
    return (
        d.filter(F.abs(F.col("n_chars") - F.lit(med)) > 1.5 * F.lit(mad))
        .select(
            "doc_id",
            "n_chars",
            F.round(
                F.abs(F.col("n_chars") - F.lit(med)) / F.lit(mad), 3
            ).alias("mad_score"),
        )
        .orderBy("doc_id")
    )


DOC_MAD_SQL = """
WITH m AS (
  SELECT quantile_cont(CAST(n_chars AS DOUBLE), 0.5) AS med FROM documents
), s AS (
  SELECT quantile_cont(abs(n_chars - med), 0.5) AS mad FROM documents, m
)
SELECT doc_id, n_chars,
       ROUND(abs(n_chars - med) / mad, 3) AS mad_score
FROM documents, m, s
WHERE abs(n_chars - med) > 1.5 * mad
ORDER BY doc_id
"""


# ==========================================================================
# DAU / WAU stickiness
# ==========================================================================

def events_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product stickiness: daily active users, the trailing-7-day active
    users ending that day, and their ratio. WAU is computed from per-day
    distinct-user SETS carried through a 7-day range window... no — sets
    don't merge cheaply; instead each (user, day) pair fans out to the ≤7
    window days it contributes to (bounded fan-out, then one exact
    distinct per day). At 100 TB the fan-out is 7× the per-day DISTINCT
    pairs (already aggregated), not 7× events."""
    ev = _t(spark, sf_dir, "events")
    # the explicit filters are semantic no-ops (a null day survives
    # neither the inner join nor the sequence() explode; a null user
    # counted toward neither of the original countDistincts) but they
    # match the constraints Catalyst infers on the DAU side only, making
    # the two distinct subtrees identical so AQE stage reuse collapses
    # them to one events scan
    user_days = (
        ev.select("user_id", F.to_date("ts").alias("day"))
        .where(F.col("day").isNotNull() & F.col("user_id").isNotNull())
        .distinct()
    )
    # r08 (guide §2.2): user_days is already DISTINCT (user, day), so DAU
    # is a plain count per day — countDistinct here re-planned the whole
    # branch as a fused count-distinct over the raw scan, which (a) costs
    # an extra expand/exchange and (b) makes the dau/fan subtrees
    # non-identical, defeating ReuseExchange: the measured plan scanned
    # events THREE times. With count(*) both branches share the identical
    # distinct subtree (one scan + ReusedExchange). The WAU side's
    # left-semi against dau days was redundant — the final inner join
    # already restricts to active days — removing it drops the third
    # scan branch and a broadcast join. Results are provably identical.
    dau = user_days.groupBy("day").agg(F.count("*").alias("dau"))
    fan = user_days.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("day"),
    )
    wau = fan.groupBy("day").agg(F.countDistinct("user_id").alias("wau"))
    return (
        dau.join(wau, "day")
        .select(
            "day",
            "dau",
            "wau",
            F.round(F.col("dau") / F.col("wau"), 4).alias("stickiness"),
        )
    )


EVENTS_DAU_WAU_SQL = """
WITH user_days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), dau AS (
  SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
  FROM user_days GROUP BY 1
), fan AS (
  SELECT user_id, day + (n * INTERVAL 1 DAY) AS day
  FROM user_days, unnest(range(0, 7)) AS t(n)
), wau AS (
  SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
  FROM fan WHERE day IN (SELECT day FROM dau)
  GROUP BY 1
)
SELECT dau.day, dau, wau, ROUND(CAST(dau AS DOUBLE) / wau, 4) AS stickiness
FROM dau JOIN wau USING (day)
"""


EXTRA_QUERIES3.update(
    {
        "customers_abc_pareto": (customers_abc_pareto, CUSTOMERS_ABC_SQL),
        "doc_length_outliers_mad": (doc_length_outliers_mad, DOC_MAD_SQL),
        "events_dau_wau": (events_dau_wau, EVENTS_DAU_WAU_SQL),
    }
)


# ==========================================================================
# Top event paths (3-step sequence mining)
# ==========================================================================

def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most common 3-step behavior paths: every window of three
    consecutive events per user, counted corpus-wide, top 20. The
    n-step generalization of the Markov matrix — funnel discovery
    without pre-declaring the funnel.

    Both lags ride ONE fused two-phase window (``lag_over_buckets``
    with offsets 1 and 2 — one summary join carrying both tails,
    verdict r7 #3: the chained two-call form paid two summary joins
    and was slower in wall than naive at fixture scale), so a bot
    user's stream spreads over per-day partitions instead of one
    task; the path aggregate's key space is |types|³ ≤ 125, so
    everything after the first exchange is constant-size. Top-20 via
    TakeOrdered (orderBy+limit), no global sort materialization."""
    from bulker_spark.operators.hotkey import lag_over_buckets

    ev = _t(spark, sf_dir, "events")
    steps = lag_over_buckets(
        ev.select("user_id", "ts", "event_id", "event_type"),
        keys=["user_id"],
        order=["ts", "event_id"],
        lag_cols={"t1": ("event_type", 2), "t2": ("event_type", 1)},
    ).filter(F.col("t1").isNotNull())
    return (
        steps.select(
            F.concat_ws(">", "t1", "t2", "event_type").alias("path")
        )
        .groupBy("path")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(20)
    )


EVENTS_TOP_PATHS_SQL = """
WITH s AS (
  SELECT lag(event_type, 2) OVER w AS t1,
         lag(event_type, 1) OVER w AS t2,
         event_type AS t3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT t1 || '>' || t2 || '>' || t3 AS path, CAST(count(*) AS BIGINT) AS n
FROM s WHERE t1 IS NOT NULL
GROUP BY 1 ORDER BY n DESC, path LIMIT 20
"""


EXTRA_QUERIES3["events_top_paths"] = (events_top_paths, EVENTS_TOP_PATHS_SQL)
