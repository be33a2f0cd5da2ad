"""Query/operator catalog: every SQL-expressible operator exposed to the
driver's DuckDB-oracle correctness gate.

Each entry is ``name → (spark_fn, oracle_sql | None)`` where ``spark_fn(spark,
sf_dir)`` returns a DataFrame and ``oracle_sql`` is the ANSI-SQL equivalent
DuckDB runs on the same parquet tables. Column names/aliases match exactly;
computed floats are rounded identically on both sides so value hashes agree.

Operator coverage map (SURVEY.md §2 → query):

- flatten (2.3)                → flatten_json_events
- dedup last-wins (2.7)        → dedup_last_wins
- dedup discriminator (2.7)    → dedup_discriminator
- merge-window predicate (2.4) → merge_window_recent
- WhenConditions/COUNT (2.4/6) → count_where
- ORDER BY + limit (2.8)       → select_order_limit
- partition-id derivation(2.10)→ partition_stats
- typecast lattice (2.9/1.2)   → typecast_lattice
- joins/aggs at scale (bench)  → tpch_q1/q3/q5/q6, top_customers_revenue
- LLM-pipeline extensions      → doc_* / emb_* families

Deterministic-hash parity notes: Spark ``md5`` == DuckDB ``md5``;
15 hex chars → BIGINT via Spark ``conv(...,16,10)`` vs DuckDB
``('0x'||h)::UBIGINT``; all modular arithmetic stays < 2^62.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bulker_spark.plans._common import (  # noqa: E402
    MINHASH_COEFFS,
    MINHASH_PRIME,
)

SIMHASH_BITS = 16


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return _events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet carries TIMESTAMP(NANOS), which Spark's vectorized
    parquet reader rejects. Read nanos as long and truncate to micros —
    exactly what DuckDB's µs-precision TIMESTAMP does, so oracle values
    agree."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(ev.dtypes).get("ts") == "bigint":
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return ev


# --- hash helpers (identical arithmetic both engines; shared via _common) --

from bulker_spark.plans._common import _DUCK_H, _SPARK_H  # noqa: E402


# ==========================================================================
# Bulker-core operators
# ==========================================================================

def flatten_json_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON flatten: nested ``props`` column → typed flat column
    (flattener.go semantics on a stringified-JSON column)."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("long").alias("props_k"),
    )


FLATTEN_SQL = """
SELECT event_id, user_id, event_type,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS props_k
FROM events
"""


def dedup_last_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-wins PK dedup (abstract_transactional.go:439-496): keep the
    newest row per user_id, arrival order = event_id."""
    from ..operators.dedup import dedup_last_wins as op

    ev = _t(spark, sf_dir, "events")
    out = op(ev, ["user_id"], order_col="event_id")
    return out.select("user_id", "event_id", "event_type", "value")


DEDUP_LAST_SQL = """
SELECT user_id, event_id, event_type, value FROM (
  SELECT user_id, event_id, event_type, value,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


def dedup_discriminator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discriminator dedup (abstract_transactional.go:462-489): keep the row
    with the highest ``value`` per user_id, ties broken by event_id."""
    from ..operators.dedup import dedup_discriminator as op

    ev = _t(spark, sf_dir, "events")
    out = op(ev.withColumn("__seq", F.col("event_id")), ["user_id"], ["value"])
    return out.select("user_id", "event_id", "event_type", "value")


DEDUP_DISCR_SQL = """
SELECT user_id, event_id, event_type, value FROM (
  SELECT user_id, event_id, event_type, value,
         row_number() OVER (
           PARTITION BY user_id ORDER BY value DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


def merge_window_recent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-window predicate (transactional_stream.go:91-100): only rows
    within N days of the batch's max timestamp participate in the merge."""
    ev = _t(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("__mx"))
    return (
        ev.crossJoin(F.broadcast(mx))
        .filter(F.col("ts") >= F.col("__mx") - F.expr("INTERVAL 7 DAYS"))
        .select("event_id", "user_id", "ts", "event_type")
    )


MERGE_WINDOW_SQL = """
SELECT event_id, user_id, ts, event_type
FROM events
WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 7 DAY
"""


def count_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT with WhenConditions (sql_adapter_base.go:287-297,783-810)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.filter(F.col("value") > 100)
        .groupBy("event_type")
        .agg(F.count("*").alias("n_events"))
    )


COUNT_WHERE_SQL = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events
FROM events WHERE value > 100 GROUP BY event_type
"""


def select_order_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Select + ORDER BY + LIMIT (sql_adapter_base.go:228-235)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select("event_id", "user_id", "value")
        .orderBy(F.col("value").desc(), F.col("event_id"))
        .limit(100)
    )


SELECT_ORDER_SQL = """
SELECT event_id, user_id, value FROM events
ORDER BY value DESC, event_id LIMIT 100
"""


def partition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-id derivation for replace_partition / time partitioning
    (delete_condition.go:63-187 granularity truncation)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.to_date(F.date_trunc("day", "ts")).alias("day"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


PARTITION_STATS_SQL = """
SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
       CAST(count(*) AS BIGINT) AS n,
       ROUND(SUM(value), 2) AS total_value
FROM events GROUP BY 1
"""


def typecast_lattice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lattice conversions (converter.go:45-69): string→int via try_cast
    (uncastable → NULL, the rescue path), float→int (integral only via
    floor), bool derivation, number→string."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").try_cast("long").alias("k_int"),
        F.floor("value").cast("long").alias("floor_val"),
        (F.col("value") > 100).alias("is_big"),
        F.col("event_id").cast("string").alias("id_str"),
    )


TYPECAST_SQL = """
SELECT event_id,
       TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
       CAST(FLOOR(value) AS BIGINT) AS floor_val,
       value > 100 AS is_big,
       CAST(event_id AS VARCHAR) AS id_str
FROM events
"""


# ==========================================================================
# Analytical queries (bench headliners; joins/aggregations at scale)
# ==========================================================================

def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.expr("timestamp'1998-09-02 00:00:00'"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


TPCH_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       ROUND(AVG(l_quantity), 4) AS avg_qty,
       ROUND(AVG(l_extendedprice), 4) AS avg_price,
       ROUND(AVG(l_discount), 4) AS avg_disc,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.expr("timestamp'1998-03-15 00:00:00'")
    )
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.expr("timestamp'1998-03-15 00:00:00'")
    )
    # broadcast the selective customer dim onto orders FIRST: the map-side
    # semi-reduction shrinks the orders side ~5x before the only wide
    # (orderkey) shuffle join — the join order that survives a 100x fact
    # scale-up, instead of shuffling unfiltered orders
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            F.to_date("o_orderdate").alias("o_orderdate"),
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


TPCH_Q3_SQL = """
SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey LIMIT 10
"""


def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.expr("timestamp'1996-01-01 00:00:00'"))
        & (F.col("o_orderdate") < F.expr("timestamp'1997-01-01 00:00:00'"))
    )
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(c, (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


TPCH_Q5_SQL = """
SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
"""


def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.expr("timestamp'1996-01-01 00:00:00'"))
            & (F.col("l_shipdate") < F.expr("timestamp'1997-01-01 00:00:00'"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2
            ).alias("revenue")
        )
    )


TPCH_Q6_SQL = """
SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority checking — EXISTS subquery, the join class the
    reference's merge-delete implies (redshift.go:42).

    Scale note: a naive ``orders LEFT SEMI lineitem`` puts the *fact* table
    on the build side — broadcast-impossible at scale, so it degrades to
    shuffling all of lineitem into a sort-merge join. Instead we broadcast
    the small filtered orders slice into a lineitem probe and dedupe the
    matched keys: the only shuffle carries matched orderkeys, pre-combined
    map-side."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.expr("timestamp'1996-07-01 00:00:00'"))
        & (F.col("o_orderdate") < F.expr("timestamp'1996-10-01 00:00:00'"))
    )
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey")
    matched = l.join(
        F.broadcast(o.select("o_orderkey", "o_orderpriority")),
        l.l_orderkey == o.o_orderkey,
    )
    exists = matched.groupBy("o_orderkey").agg(
        F.first("o_orderpriority").alias("o_orderpriority")
    )
    return (
        exists.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


TPCH_Q4_SQL = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def orders_without_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS → **left-anti join** (count of childless orders)."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey")
    anti = o.join(l, o.o_orderkey == l.l_orderkey, "left_anti")
    return anti.agg(F.count("*").alias("n_orphans"))


ORDERS_ANTI_SQL = """
SELECT CAST(count(*) AS BIGINT) AS n_orphans
FROM orders
WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
"""


def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-mode priority — join + **conditional aggregation**."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.expr("timestamp'1996-01-01 00:00:00'"))
        & (F.col("l_shipdate") < F.expr("timestamp'1997-01-01 00:00:00'"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


TPCH_Q12_SQL = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem, orders
WHERE l_orderkey = o_orderkey
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_linestatus ORDER BY l_linestatus
"""


def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion effect — broadcast join + conditional ratio aggregate."""
    p = _t(spark, sf_dir, "part")
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.expr("timestamp'1996-09-01 00:00:00'"))
        & (F.col("l_shipdate") < F.expr("timestamp'1996-10-01 00:00:00'"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(0.0)
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(rev), 4).alias(
                "promo_revenue_pct"
            )
        )
    )


TPCH_Q14_SQL = """
SELECT ROUND(100.0 * SUM(CASE WHEN p_type LIKE 'PROMO%'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
             / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct
FROM lineitem, part
WHERE l_partkey = p_partkey
  AND l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
"""


def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume customers — aggregate + HAVING + top-n."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "l_orderkey",
            F.to_date("o_orderdate").alias("o_orderdate"),
            "total_qty",
        )
        .orderBy(F.col("total_qty").desc(), F.col("l_orderkey"))
        .limit(20)
    )


TPCH_Q18_SQL = """
SELECT c_custkey, c_name, l_orderkey,
       CAST(o_orderdate AS DATE) AS o_orderdate, total_qty
FROM (
  SELECT l_orderkey, ROUND(SUM(l_quantity), 2) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING ROUND(SUM(l_quantity), 2) > 250
) big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_qty DESC, l_orderkey LIMIT 20
"""


def top_customers_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-shaped: returned-item revenue per customer, top 20."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


TOP_CUSTOMERS_SQL = """
SELECT c_custkey, c_name, n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem, orders, customer, nation
WHERE l_returnflag = 'R' AND l_orderkey = o_orderkey
  AND o_custkey = c_custkey AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey LIMIT 20
"""


# ==========================================================================
# Training-data pipeline: text analysis + dedup families
# ==========================================================================

def doc_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via content fingerprint (hash-groupBy; map-side combine)."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy(F.md5("text").alias("fp")).agg(
        F.count("*").alias("n_copies"),
        F.min("doc_id").alias("keep_id"),
    )


DOC_EXACT_DEDUP_SQL = """
SELECT md5(text) AS fp, CAST(count(*) AS BIGINT) AS n_copies,
       CAST(min(doc_id) AS BIGINT) AS keep_id
FROM documents GROUP BY 1
"""


def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting via space arithmetic (identical on both engines)."""
    d = _t(spark, sf_dir, "documents")
    n_tokens = (
        F.length("text") - F.length(F.regexp_replace("text", " ", "")) + 1
    )
    n_alpha = F.length(F.regexp_replace("text", " ", ""))
    return d.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(n_alpha.cast("double") / n_tokens, 4).alias("avg_token_len"),
    )


DOC_TOKEN_STATS_SQL = """
SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
       CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
       ROUND(CAST(length(replace(text, ' ', '')) AS DOUBLE)
             / (length(text) - length(replace(text, ' ', '')) + 1), 4) AS avg_token_len
FROM documents
"""


def doc_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length bucket × stopword presence × punct ratio."""
    d = _t(spark, sf_dir, "documents")
    n_stop = (
        F.length("text") - F.length(F.regexp_replace("text", " the ", ""))
    ) / F.lit(5)
    n_punct = F.length("text") - F.length(
        F.regexp_replace(F.regexp_replace("text", "\\.", ""), ",", "")
    )
    length_ok = F.when(
        F.length("text").between(100, 2000), F.lit(1.0)
    ).otherwise(F.lit(0.5))
    score = length_ok * (
        1.0 - n_punct.cast("double") / F.length("text")
    )
    return d.select(
        "doc_id",
        n_stop.cast("long").alias("n_stopwords"),
        n_punct.cast("long").alias("n_punct"),
        F.round(score, 4).alias("quality"),
    )


DOC_QUALITY_SQL = """
SELECT doc_id,
       CAST((length(text) - length(replace(text, ' the ', ''))) / 5 AS BIGINT)
         AS n_stopwords,
       CAST(length(text) - length(replace(replace(text, '.', ''), ',', ''))
         AS BIGINT) AS n_punct,
       ROUND((CASE WHEN length(text) BETWEEN 100 AND 2000
                   THEN 1.0 ELSE 0.5 END)
             * (1.0 - CAST(length(text) -
                  length(replace(replace(text, '.', ''), ',', '')) AS DOUBLE)
                / length(text)), 4) AS quality
FROM documents
"""


def doc_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language length distribution QA (p50/p90/p99 + count) — the
    standard pre-training corpus health check. Exact quantiles computed
    from a (lang, n_chars) HISTOGRAM instead of Spark's sort-based
    ``percentile``: exact percentile buffers every group row in one
    reducer (unbounded state at 100 TB), while the histogram
    partial-aggregates map-side and bounds all wide state at
    |langs| × |distinct lengths|. Continuous-rank interpolation over
    cumulative counts reproduces DuckDB's ``quantile_cont`` digits
    bit-for-bit; `doc_length_quantiles_sketch` is the same readout on GK
    sketches when |distinct| itself is unbounded (float metrics)."""
    d = _t(spark, sf_dir, "documents")
    hist = d.groupBy("lang", "n_chars").agg(F.count("*").alias("c"))
    wp = Window.partitionBy("lang")
    wo = wp.orderBy("n_chars")
    cum = hist.withColumn("n", F.sum("c").over(wp)).withColumn(
        "cum", F.sum("c").over(wo)
    )

    def _rank(p: float):
        return 1 + (F.col("n") - 1) * F.lit(p)

    aggs = [F.count("*").alias("_bins"), F.first("n").alias("n0")]
    for tag, p in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
        h = _rank(p)
        aggs.append(
            F.min(
                F.when(F.col("cum") >= F.floor(h), F.col("n_chars"))
            ).alias(f"_{tag}_lo")
        )
        aggs.append(
            F.min(
                F.when(F.col("cum") >= F.ceil(h), F.col("n_chars"))
            ).alias(f"_{tag}_hi")
        )
    out = cum.groupBy("lang").agg(*aggs)

    def _interp(tag: str, p: float):
        h = 1 + (F.col("n0") - 1) * F.lit(p)
        lo, hi = F.col(f"_{tag}_lo"), F.col(f"_{tag}_hi")
        return F.round(lo + (h - F.floor(h)) * (hi - lo), 2).alias(tag)

    return out.select(
        "lang",
        F.col("n0").cast("long").alias("n_docs"),
        _interp("p50", 0.5),
        _interp("p90", 0.9),
        _interp("p99", 0.99),
    ).orderBy("lang")


DOC_LENGTH_QUANTILES_SQL = """
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       ROUND(quantile_cont(n_chars, 0.5), 2) AS p50,
       ROUND(quantile_cont(n_chars, 0.9), 2) AS p90,
       ROUND(quantile_cont(n_chars, 0.99), 2) AS p99
FROM documents GROUP BY lang ORDER BY lang
"""


def doc_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (idf = ln((N+1)/(df+1))).

    Shuffle structure: token counts partial-aggregate map-side before the
    (doc_id, tok) shuffle; document frequency re-aggregates from those
    counts (never re-reading text); the vocabulary join runs on ``tok``,
    where stopwords are hot keys — AQE's skew-join split handles that, and
    at vocabulary sizes that fit an executor a broadcast is the better
    choice (Catalyst picks it from stats here). The final top-3 window
    partitions by doc_id — bounded per key, no skew. IEEE ln/× on int
    inputs gives bit-identical ordering across engines, so the row_number
    tie-break (tfidf desc, tok asc) is deterministic."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.col("tok") != "")
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    # r08 (guide §2.2): the conditional count is identical to count(*)
    # (tf >= 1 by construction) but REFERENCES tf, so Catalyst cannot
    # prune the count out of this branch's (doc_id, tok) aggregate —
    # both consumers then share one identical subtree and AQE stage
    # reuse collapses them: one documents scan + one corpus-scale
    # exchange instead of two of each (measured: 3 scans -> 2, the
    # second a ReusedQueryStage; the pruned form re-tokenized the whole
    # corpus to save an 8-byte column in the shuffle)
    df_ = tf.groupBy("tok").agg(
        F.count(F.when(F.col("tf") >= 1, 1)).alias("df")
    )
    n_docs = d.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df_, "tok")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.col("tf")
            * F.log((F.col("n_docs") + 1) / (F.col("df") + 1)),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("tok")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "doc_id",
            "tok",
            F.col("rk").cast("int").alias("rk"),
            F.round("tfidf", 4).alias("tfidf"),
        )
        # no trailing global sort: the output is corpus-sized (3 rows/doc)
        # and the gate compares order-insensitively — a presentation
        # range-shuffle here would be the plan's largest exchange at scale
    )


DOC_TFIDF_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), tf AS (
  SELECT doc_id, tok, count(*) AS tf FROM toks WHERE tok <> '' GROUP BY 1, 2
), df AS (
  SELECT tok, count(*) AS df FROM tf GROUP BY 1
), n AS (
  SELECT count(*) AS n_docs FROM documents
), scored AS (
  SELECT tf.doc_id, tf.tok,
         tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)) AS tfidf
  FROM tf JOIN df USING (tok) CROSS JOIN n
), ranked AS (
  SELECT doc_id, tok, tfidf,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, tok) AS rk
  FROM scored
)
SELECT doc_id, tok, CAST(rk AS INTEGER) AS rk, ROUND(tfidf, 4) AS tfidf
FROM ranked WHERE rk <= 3 ORDER BY doc_id, rk
"""


def doc_lang_guess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram-heuristic language ID (stopword probe) vs the labeled lang."""
    d = _t(spark, sf_dir, "documents")
    guess = (
        F.when(F.instr("text", " the ") > 0, F.lit("en"))
        .when(F.instr("text", " le ") > 0, F.lit("fr"))
        .when(F.instr("text", " el ") > 0, F.lit("es"))
        .otherwise(F.lit("unk"))
    )
    return (
        d.select("lang", guess.alias("guess"))
        .groupBy("lang", "guess")
        .agg(F.count("*").alias("n"))
    )


DOC_LANG_SQL = """
SELECT lang,
       CASE WHEN position(' the ' IN text) > 0 THEN 'en'
            WHEN position(' le ' IN text) > 0 THEN 'fr'
            WHEN position(' el ' IN text) > 0 THEN 'es'
            ELSE 'unk' END AS guess,
       CAST(count(*) AS BIGINT) AS n
FROM documents GROUP BY 1, 2
"""


def _shingles(spark: SparkSession, sf_dir: str, max_doc: int) -> DataFrame:
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < max_doc)
    pos = d.select(
        "doc_id",
        "text",
        F.explode(
            F.sequence(
                F.lit(1), F.greatest(F.length("text") - F.lit(7), F.lit(1))
            )
        ).alias("i"),
    )
    return pos.select("doc_id", F.expr("substring(text, i, 8)").alias("sh"))


from bulker_spark.plans._common import _SHINGLE_DUCK  # noqa: E402


def doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character 8-gram shingling (the substrate for MinHash/Jaccard)."""
    return (
        _shingles(spark, sf_dir, 50)
        .groupBy("doc_id")
        .agg(F.countDistinct("sh").alias("n_shingles"))
    )


DOC_SHINGLES_SQL = f"""
SELECT doc_id, CAST(count(DISTINCT sh) AS BIGINT) AS n_shingles
FROM ({_SHINGLE_DUCK.format(max_doc=50)}) GROUP BY doc_id
"""


def doc_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (4 hash functions over 8-gram shingles) —
    shingle → md5 → 60-bit int → (a·h+b) mod p, min per doc."""
    sh = _shingles(spark, sf_dir, 50)
    h = sh.withColumn("h", F.expr(_SPARK_H.format(col="sh")))
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(MINHASH_PRIME)).alias(
            f"mh{i}"
        )
        for i, (a, b) in enumerate(MINHASH_COEFFS)
    ]
    return h.groupBy("doc_id").agg(*aggs)


from bulker_spark.plans._common import (  # noqa: E402
    DOC_MINHASH_DUCK as DOC_MINHASH_SQL,
)


def doc_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash over whitespace tokens (token-hash bit voting)."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    tok = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.col("tok") != "")
    h = tok.withColumn("h", F.expr(_SPARK_H.format(col="tok")))
    bit_aggs = [
        F.sum(
            F.when(F.expr(f"(h >> {j}) & 1") == 1, 1).otherwise(-1)
        ).alias(f"b{j}")
        for j in range(SIMHASH_BITS)
    ]
    votes = h.groupBy("doc_id").agg(*bit_aggs)
    sim = None
    for j in range(SIMHASH_BITS):
        term = F.when(F.col(f"b{j}") >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return votes.select("doc_id", sim.cast("long").alias("simhash"))


_bit_cols = ", ".join(
    f"SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS b{j}"
    for j in range(SIMHASH_BITS)
)
_sim_expr = " + ".join(
    f"(CASE WHEN b{j} >= 0 THEN {1 << j} ELSE 0 END)" for j in range(SIMHASH_BITS)
)
DOC_SIMHASH_SQL = f"""
SELECT doc_id, CAST({_sim_expr} AS BIGINT) AS simhash
FROM (
  SELECT doc_id, {_bit_cols}
  FROM (SELECT doc_id, {_DUCK_H.format(col="tok")} AS h
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
              FROM documents WHERE doc_id < 100)
        WHERE tok <> '')
  GROUP BY doc_id
) GROUP BY doc_id, {", ".join(f"b{j}" for j in range(SIMHASH_BITS))}
"""


def doc_near_dup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram Jaccard near-dup pairs: distinct-shingle self-join →
    |A∩B| / |A∪B| ≥ 0.1 (doc_id < 100 window)."""
    sh = _shingles(spark, sf_dir, 100).distinct()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, F.col("a.sh") == F.col("b.sh"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    out = (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter").cast("double")
                / (F.col("sa.sz") + F.col("sb.sz") - F.col("inter")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= 0.1)
        .select("doc_a", "doc_b", "jaccard")
    )
    return out


DOC_JACCARD_SQL = f"""
WITH sh AS (SELECT DISTINCT doc_id, sh FROM ({_SHINGLE_DUCK.format(max_doc=100)})),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       ROUND(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 4) AS jaccard
FROM inter
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.1
"""


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): the event-time
    windowing the reference lacks but a training-data pipeline needs.

    TWO-PHASE plan, hot-key-proof: a single ``partitionBy(user_id)``
    window puts a bot user's entire stream in ONE task (measured 12.7×
    max/median task time on the Zipf fixture, scripts/skew_stress.py —
    the classic unsplittable-window wall). Instead: (1) the heavy pass
    windows by ``(user_id, day-bucket)`` — splittable, every partition
    bounded by one user-day — and aggregates LOCAL sessions; (2) a
    light pass merges sessions across bucket boundaries on per-bucket
    summaries (≤ a few rows per user-day, independent of event count):
    bucket b's first local session joins bucket b-1's last when the
    boundary gap ≤ 30 min, and global ordinals are a prefix-sum over
    ``n_local - merged`` per bucket. Day buckets ≫ the 30-min gap, so
    ONLY boundary sessions can merge and chains telescope through the
    prefix sum. Output is bit-identical to the naive global window
    (the strict oracle is unchanged).

    Routed like the hotkey helpers (round 8,
    ``spark.bulker.hotkey.mode``): on uniform keys the single-window
    naive shape is cheaper and equally safe, so ``auto`` takes it below
    the skew threshold; a bot-user fixture (or ``always``) keeps the
    two-phase insurance."""
    from pyspark.sql import Window

    from bulker_spark.operators.hotkey import _use_two_phase

    ev = _t(spark, sf_dir, "events")
    if not _use_two_phase(ev.select("user_id", "ts", "event_id"), ["user_id"]):
        wn = Window.partitionBy("user_id").orderBy("ts", "event_id")
        flagged = (
            ev.withColumn("__prev_ts", F.lag("ts").over(wn))
            .withColumn(
                "__new_session",
                F.when(
                    F.col("__prev_ts").isNull()
                    | (
                        F.expr(
                            "timestampdiff(SECOND,"
                            " date_trunc('second', __prev_ts),"
                            " date_trunc('second', ts))"
                        )
                        > 1800
                    ),
                    1,
                )
                .otherwise(0)
                .cast("long"),
            )
        )
        return (
            flagged.withColumn(
                "session_id",
                F.sum("__new_session").over(
                    wn.rowsBetween(Window.unboundedPreceding, 0)
                ),
            )
            .groupBy("user_id", "session_id")
            .agg(
                F.count("*").alias("n_events"),
                F.min("ts").alias("session_start"),
                F.max("ts").alias("session_end"),
            )
        )
    bkt = F.floor(F.unix_timestamp(F.date_trunc("second", "ts")) / 86400)
    # timestampdiff is TIMESTAMP_NTZ-safe (a cast to BIGINT is not in
    # Spark 4.x) and avoids any session-timezone dependence. Operands are
    # truncated to whole seconds so the gap counts second-boundary
    # crossings — the same semantics as SQL date_diff('second', ...) —
    # instead of flooring the sub-second-precise difference.
    w = Window.partitionBy("user_id", "__bkt").orderBy("ts", "event_id")
    gapped = (
        ev.withColumn("__bkt", bkt)
        .withColumn("__prev_ts", F.lag("ts").over(w))
        .withColumn(
            "__new_session",
            F.when(
                F.col("__prev_ts").isNull()
                | (
                    F.expr(
                        "timestampdiff(SECOND, date_trunc('second', __prev_ts),"
                        " date_trunc('second', ts))"
                    )
                    > 1800
                ),
                1,
            )
            .otherwise(0)
            .cast("long"),
        )
        .drop("__prev_ts")
    )
    local = gapped.withColumn(
        "__lsid",
        F.sum("__new_session").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).groupBy("user_id", "__bkt", "__lsid").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )
    return _merge_bucketed_sessions(local)


def _merge_bucketed_sessions(local: DataFrame) -> DataFrame:
    """Phase 2 of hot-key-proof sessionization, shared by the lag-based
    and the native ``session_window`` variants: merge per-(user, bucket)
    LOCAL sessions across bucket boundaries and assign global per-user
    ordinals. ``local`` columns: ``user_id, __bkt, __lsid`` (1-based
    chronological within the bucket), ``n_events, session_start,
    session_end``. Only boundary sessions can merge (bucket ≫ gap);
    chains telescope through the prefix sum over ``n_local − merged``.
    Every per-user structure here is per-BUCKET summary rows — a few
    ints/timestamps per user-day, independent of event count."""
    from pyspark.sql import Window

    # local feeds BOTH the output and the boundary summary; exchange
    # reuse dedupes only the shuffle, not the heavy pass above it, and a
    # lazy checkpoint does not dedupe within one job — so the slim
    # session-level frame materializes once at construction (measured
    # 1.07 s → 0.65 s end-to-end at sf0.1; the same
    # construction-time-job convention as doc_curriculum_order's offset
    # collect; session.pin routes it to a reliable .checkpoint() on a
    # cluster via spark.bulker.checkpoint.mode)
    from bulker_spark.session import pin

    local = pin(local)
    # per-bucket summary: session count + boundary timestamps — a few
    # ints per (user, day), the ONLY frame a per-user window ever sees
    summary = local.groupBy("user_id", "__bkt").agg(
        F.max("__lsid").alias("n_local"),
        F.min("session_start").alias("first_start"),
        F.max("session_end").alias("last_end"),
    )
    wu = Window.partitionBy("user_id").orderBy("__bkt")
    merged = (
        summary.withColumn("__prev_end", F.lag("last_end").over(wu))
        .withColumn(
            "__merge",
            F.when(
                F.col("__prev_end").isNotNull()
                & (
                    F.expr(
                        "timestampdiff(SECOND,"
                        " date_trunc('second', __prev_end),"
                        " date_trunc('second', first_start))"
                    )
                    <= 1800
                ),
                1,
            )
            .otherwise(0)
            .cast("long"),
        )
        .withColumn(
            "__offset",
            F.coalesce(
                F.sum(F.col("n_local") - F.col("__merge")).over(
                    wu.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("user_id", "__bkt", "__merge", "__offset")
    )
    # NULL-SAFE user_id equality: window partitionBy (and the SQL
    # oracle's GROUP BY) treat NULL as one group, so the merge join must
    # not drop anonymous events the way a null-rejecting equi-join would
    m = merged.select(
        F.col("user_id").alias("__m_uid"),
        F.col("__bkt").alias("__m_bkt"),
        "__merge",
        "__offset",
    )
    return (
        local.join(
            m,
            F.col("user_id").eqNullSafe(F.col("__m_uid"))
            & F.col("__bkt").eqNullSafe(F.col("__m_bkt")),
        )
        .withColumn(
            "session_id",
            F.col("__offset") + F.col("__lsid") - F.col("__merge"),
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.min("session_start").alias("session_start"),
            F.max("session_end").alias("session_end"),
        )
    )


SESSIONIZE_SQL = """
WITH o AS (
  SELECT user_id, event_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
),
s AS (
  SELECT user_id, event_id, ts,
         SUM(CASE WHEN prev IS NULL
                    OR date_diff('second', prev, ts) > 1800
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS session_id
  FROM o
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       CAST(count(*) AS BIGINT) AS n_events,
       min(ts) AS session_start, max(ts) AS session_end
FROM s GROUP BY 1, 2
"""


def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion funnel: users with a signup followed by a purchase —
    conditional aggregation, one shuffle."""
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
            "first_signup"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_purchase"
        ),
    )
    return per_user.agg(
        F.count("*").alias("n_users"),
        F.sum(
            F.when(F.col("first_signup").isNotNull(), 1).otherwise(0)
        ).alias("n_signup"),
        F.sum(
            F.when(
                F.col("first_signup").isNotNull()
                & (F.col("first_purchase") > F.col("first_signup")),
                1,
            ).otherwise(0)
        ).alias("n_converted"),
    )


FUNNEL_SQL = """
WITH f AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN ts END) AS first_signup,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
  FROM events GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT) AS n_users,
       CAST(SUM(CASE WHEN first_signup IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_signup,
       CAST(SUM(CASE WHEN first_signup IS NOT NULL
                      AND first_purchase > first_signup
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
FROM f
"""


def doc_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dup groups keep the best representative (longest, then lowest
    doc_id) — the canonical-selection step after fingerprint dedup."""
    from pyspark.sql import Window

    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5("text")).orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.md5("text").alias("fp"), "n_chars")
    )


DOC_KEEP_BEST_SQL = """
SELECT doc_id, md5(text) AS fp, n_chars FROM (
  SELECT doc_id, text, n_chars,
         row_number() OVER (PARTITION BY md5(text)
                            ORDER BY n_chars DESC, doc_id) AS rn
  FROM documents
) WHERE rn = 1
"""


def doc_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH banding: signatures split into 2 bands of 2; docs
    sharing a full band are candidate near-dups. Only (doc_id, band_key)
    projections shuffle — never text."""
    sig = doc_minhash(spark, sf_dir)
    bands = None
    for i in range(4):
        b = sig.select(
            "doc_id",
            F.lit(i).alias("band"),
            F.col(f"mh{i}").alias("x"),
        )
        bands = b if bands is None else bands.unionByName(b)
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.x") == F.col("b.x"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


from bulker_spark.plans._common import (  # noqa: E402
    DOC_LSH_PAIRS_DUCK as DOC_LSH_PAIRS_SQL,
)


def doc_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: hamming distance ≤ 4 on 16-bit fingerprints.

    Uses pigeonhole banding (5 disjoint bit-bands; a ≤4-distance pair must
    agree exactly on ≥1 band) so candidates come from an equi-join instead
    of the O(n²) `doc_a < doc_b` cross join — same exact result set, and
    the formulation that survives 100 TB. The oracle keeps the brute-force
    SQL, which doubles as the equivalence check."""
    from ..functions.text import simhash_near_pairs

    s = doc_simhash(spark, sf_dir)
    return simhash_near_pairs(
        s, id_col="doc_id", sim_col="simhash", n_bits=16, max_hamming=4
    )


DOC_SIMHASH_PAIRS_SQL = f"""
WITH s AS ({DOC_SIMHASH_SQL})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 4
"""


def emb_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (vec_id < 100 window, cos ≥ 0.3) —
    the exact baseline the LSH join approximates."""
    from ..functions.similarity import cosine_pairs_exact

    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    return cosine_pairs_exact(e, threshold=0.3)


EMB_NEAR_DUP_SQL = """
WITH ex AS (
  SELECT vec_id, unnest(embedding)::DOUBLE AS v,
         unnest(generate_series(1, len(embedding))) AS i
  FROM embeddings WHERE vec_id < 100
),
n AS (SELECT vec_id, sqrt(SUM(v * v)) AS nrm FROM ex GROUP BY 1),
dots AS (
  SELECT a.vec_id AS ia, b.vec_id AS ib, SUM(a.v * b.v) AS dot
  FROM ex a JOIN ex b ON a.i = b.i AND a.vec_id < b.vec_id
  GROUP BY 1, 2
)
SELECT ia AS id_a, ib AS id_b,
       ROUND(dot / (na.nrm * nb.nrm), 4) AS cos_sim
FROM dots JOIN n na ON ia = na.vec_id JOIN n nb ON ib = nb.vec_id
WHERE ROUND(dot / (na.nrm * nb.nrm), 4) >= 0.3
"""


# ==========================================================================
# Similarity search over embeddings
# ==========================================================================

def emb_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k against a query vector (vec_id=0), computed
    JVM-side with zip_with/aggregate (no UDF). Ranking on the rounded
    similarity keeps cross-engine ordering deterministic."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    j = e.crossJoin(F.broadcast(q))
    dot = F.aggregate(
        F.zip_with("embedding", "qe", lambda x, y: x.cast("double") * y.cast("double")),
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
    return (
        j.select(
            "vec_id",
            F.round(dot / (F.sqrt(n2) * F.sqrt(q2)), 3).alias("cos_sim"),
        )
        .filter(F.col("vec_id") != 0)
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(10)
    )


EMB_COSINE_SQL = """
WITH q AS (
  SELECT unnest(embedding)::DOUBLE AS qv,
         unnest(generate_series(1, len(embedding))) AS i
  FROM embeddings WHERE vec_id = 0
),
ex AS (
  SELECT vec_id, unnest(embedding)::DOUBLE AS v,
         unnest(generate_series(1, len(embedding))) AS i
  FROM embeddings
),
dots AS (
  SELECT ex.vec_id, SUM(ex.v * q.qv) AS dot, SUM(ex.v * ex.v) AS n2
  FROM ex JOIN q USING (i) GROUP BY 1
),
qn AS (SELECT SUM(qv * qv) AS q2 FROM q)
SELECT vec_id, ROUND(dot / (sqrt(n2) * sqrt(q2)), 3) AS cos_sim
FROM dots, qn
WHERE vec_id <> 0
ORDER BY cos_sim DESC, vec_id LIMIT 10
"""


def emb_label_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label vector statistics (norm distribution) — the reduction shape
    behind IVF centroid builds."""
    e = _t(spark, sf_dir, "embeddings")
    n2 = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        e.select("label", F.sqrt(n2).alias("norm"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.round(F.avg("norm"), 3).alias("avg_norm"),
            F.round(F.min("norm"), 3).alias("min_norm"),
            F.round(F.max("norm"), 3).alias("max_norm"),
        )
    )


EMB_LABEL_STATS_SQL = """
WITH norms AS (
  SELECT label, sqrt(SUM(v * v)) AS norm
  FROM (SELECT label, vec_id, unnest(embedding)::DOUBLE AS v FROM embeddings)
  GROUP BY label, vec_id
)
SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
       ROUND(AVG(norm), 3) AS avg_norm,
       ROUND(MIN(norm), 3) AS min_norm,
       ROUND(MAX(norm), 3) AS max_norm
FROM norms GROUP BY label
"""


# ==========================================================================
# Registry
# ==========================================================================

QUERIES: dict[str, tuple] = {
    # bulker-core operators
    "flatten_json_events": (flatten_json_events, FLATTEN_SQL),
    "dedup_last_wins": (dedup_last_wins, DEDUP_LAST_SQL),
    "dedup_discriminator": (dedup_discriminator, DEDUP_DISCR_SQL),
    "merge_window_recent": (merge_window_recent, MERGE_WINDOW_SQL),
    "count_where": (count_where, COUNT_WHERE_SQL),
    "select_order_limit": (select_order_limit, SELECT_ORDER_SQL),
    "partition_stats": (partition_stats, PARTITION_STATS_SQL),
    "typecast_lattice": (typecast_lattice, TYPECAST_SQL),
    # analytical/bench
    "tpch_q1": (tpch_q1, TPCH_Q1_SQL),
    "tpch_q3": (tpch_q3, TPCH_Q3_SQL),
    "tpch_q5": (tpch_q5, TPCH_Q5_SQL),
    "tpch_q6": (tpch_q6, TPCH_Q6_SQL),
    "tpch_q4": (tpch_q4, TPCH_Q4_SQL),
    "tpch_q12": (tpch_q12, TPCH_Q12_SQL),
    "tpch_q14": (tpch_q14, TPCH_Q14_SQL),
    "tpch_q18_large_orders": (tpch_q18_large_orders, TPCH_Q18_SQL),
    "orders_without_lineitems": (orders_without_lineitems, ORDERS_ANTI_SQL),
    "top_customers_revenue": (top_customers_revenue, TOP_CUSTOMERS_SQL),
    # training-data pipeline
    "doc_exact_dedup": (doc_exact_dedup, DOC_EXACT_DEDUP_SQL),
    "doc_token_stats": (doc_token_stats, DOC_TOKEN_STATS_SQL),
    "doc_quality_score": (doc_quality_score, DOC_QUALITY_SQL),
    "doc_lang_guess": (doc_lang_guess, DOC_LANG_SQL),
    "doc_length_quantiles": (doc_length_quantiles, DOC_LENGTH_QUANTILES_SQL),
    "doc_tfidf_top_terms": (doc_tfidf_top_terms, DOC_TFIDF_SQL),
    "doc_shingles": (doc_shingles, DOC_SHINGLES_SQL),
    "doc_minhash": (doc_minhash, DOC_MINHASH_SQL),
    "doc_simhash": (doc_simhash, DOC_SIMHASH_SQL),
    "doc_near_dup_jaccard": (doc_near_dup_jaccard, DOC_JACCARD_SQL),
    "doc_dedup_keep_best": (doc_dedup_keep_best, DOC_KEEP_BEST_SQL),
    "doc_minhash_lsh_pairs": (doc_minhash_lsh_pairs, DOC_LSH_PAIRS_SQL),
    "doc_simhash_pairs": (doc_simhash_pairs, DOC_SIMHASH_PAIRS_SQL),
    "emb_cosine_topk": (emb_cosine_topk, EMB_COSINE_SQL),
    "emb_label_stats": (emb_label_stats, EMB_LABEL_STATS_SQL),
    "emb_near_dup_pairs": (emb_near_dup_pairs, EMB_NEAR_DUP_SQL),
    # event-time analytics
    "events_sessionize": (events_sessionize, SESSIONIZE_SQL),
    "event_funnel": (event_funnel, FUNNEL_SQL),
}

from bulker_spark.plans.analytics import EXTRA_QUERIES  # noqa: E402
from bulker_spark.plans.analytics2 import EXTRA_QUERIES2  # noqa: E402
from bulker_spark.plans.analytics3 import EXTRA_QUERIES3  # noqa: E402
from bulker_spark.plans.analytics4 import EXTRA_QUERIES4  # noqa: E402
from bulker_spark.plans.analytics5 import EXTRA_QUERIES5  # noqa: E402
from bulker_spark.plans.analytics6 import EXTRA_QUERIES6  # noqa: E402
from bulker_spark.plans.analytics7 import EXTRA_QUERIES7  # noqa: E402
from bulker_spark.plans.analytics8 import EXTRA_QUERIES8  # noqa: E402
from bulker_spark.plans.analytics9 import EXTRA_QUERIES9  # noqa: E402
from bulker_spark.plans.analytics10 import EXTRA_QUERIES10  # noqa: E402
from bulker_spark.plans.analytics11 import EXTRA_QUERIES11  # noqa: E402

QUERIES.update(EXTRA_QUERIES)
QUERIES.update(EXTRA_QUERIES2)
QUERIES.update(EXTRA_QUERIES3)
QUERIES.update(EXTRA_QUERIES4)
QUERIES.update(EXTRA_QUERIES5)
QUERIES.update(EXTRA_QUERIES6)
QUERIES.update(EXTRA_QUERIES7)
QUERIES.update(EXTRA_QUERIES8)
QUERIES.update(EXTRA_QUERIES9)
QUERIES.update(EXTRA_QUERIES10)
QUERIES.update(EXTRA_QUERIES11)
