"""Generate the Zipf/hot-key skew fixture the catalog benches lack.

The per-round bench runs on uniform TPC-H-ish data; the realistic 100 TB
failure mode is skew — one source owning most of a corpus, one
boilerplate block duplicated across a huge share of documents, one bot
user emitting half the event stream. This writes a fixture that encodes
exactly those, sized so a local run finishes in minutes while each hot
key still dominates its shuffle partition:

documents.parquet (N_DOCS):
  - 80% of documents come from one ``source`` ("hot_src")
  - HOT_BLOCK_SHARE of documents embed the SAME 30-token boilerplate
    block at a varying offset (the duplicated-span hot key: its window
    hashes all collide on one groupBy/join key)
  - remaining tokens are unique per document; ``lang`` is 'en' for 30%
    (the DSIR target slice)

events.parquet (N_EVENTS):
  - one user owns HOT_USER_SHARE of all events (the sessionize /
    window-partition hot key)
  - timestamps spread over 30 days with second granularity

Usage: python scripts/gen_skew.py [out_dir]   (default /tmp/skewdata)
"""

import os
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

N_DOCS = 40_000
HOT_BLOCK_SHARE = 0.6
HOT_SRC_SHARE = 0.8
DOC_TOKENS = 80
BLOCK_TOKENS = 30

N_EVENTS = 2_000_000
HOT_USER_SHARE = 0.5
N_USERS = 20_000


def main(out: str) -> None:
    spark = (
        SparkSession.builder.master("local[16]")
        .appName("gen-skew")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    hot_block = " ".join(f"boiler{i}" for i in range(BLOCK_TOKENS))
    n_unique = DOC_TOKENS - BLOCK_TOKENS
    d = spark.range(N_DOCS).select(F.col("id").alias("doc_id"))
    uniq = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_unique - 1)),
            lambda i: F.concat_ws(
                "", F.lit("d"), F.col("doc_id"), F.lit("t"), i
            ),
        ),
        " ",
    )
    has_block = (F.col("doc_id") % 100) < int(HOT_BLOCK_SHARE * 100)
    # varying offset: split the unique run around the block so the
    # duplicated span is NOT block-aligned for most documents; cut in
    # [1, n_unique-2] keeps head and tail non-empty (concat_ws does not
    # skip empty strings, which would mint phantom "" tokens)
    cut = (1 + F.col("doc_id") % F.lit(n_unique - 2)).cast("int")
    head = F.array_join(
        F.slice(F.split(uniq, " "), 1, cut), " "
    )
    tail = F.array_join(
        F.slice(F.split(uniq, " "), cut + 1, F.lit(n_unique)), " "
    )
    text = F.when(
        has_block,
        F.concat_ws(" ", head, F.lit(hot_block), tail),
    ).otherwise(uniq)
    docs = d.select(
        "doc_id",
        text.alias("text"),
        F.when(F.col("doc_id") % 10 < 3, F.lit("en"))
        .otherwise(F.lit("xx"))
        .alias("lang"),
        F.when(
            F.col("doc_id") % 100 < int(HOT_SRC_SHARE * 100),
            F.lit("hot_src"),
        )
        .otherwise(F.concat(F.lit("src"), F.col("doc_id") % 9))
        .alias("source"),
    ).withColumn("n_chars", F.length("text").cast("long"))
    docs.repartition(16).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )

    hot_cut = int(N_EVENTS * HOT_USER_SHARE)
    ev = spark.range(N_EVENTS).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(
            F.lit(1704067200) + (F.col("id") * 7919) % (30 * 86400)
        ).alias("ts"),
        F.when(F.col("id") < hot_cut, F.lit(0))
        .otherwise(1 + F.col("id") % N_USERS)
        .alias("user_id"),
        F.element_at(
            F.array(F.lit("page"), F.lit("click"), F.lit("purchase")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("event_type"),
        (F.col("id") % 1000 / 10.0).alias("value"),
        F.lit('{"k": 1}').alias("props"),
    )
    ev.repartition(16).write.mode("overwrite").parquet(
        os.path.join(out, "events.parquet")
    )

    # orders for the as-of enrichment: the bot user owns half the order
    # history too, so asof_join's per-user carry sees the same hot key
    # as the window queries
    n_orders = 200_000
    hot_orders = n_orders // 2
    orders = spark.range(n_orders).select(
        F.col("id").alias("o_orderkey"),
        F.when(F.col("id") < hot_orders, F.lit(0))
        .otherwise(1 + F.col("id") % N_USERS)
        .alias("o_custkey"),
        F.timestamp_seconds(
            F.lit(1704067200) + (F.col("id") * 104729) % (30 * 86400)
        ).alias("o_orderdate"),
        (F.col("id") % 10000 / 100.0).alias("o_totalprice"),
    )
    orders.repartition(16).write.mode("overwrite").parquet(
        os.path.join(out, "orders.parquet")
    )
    print(
        f"wrote {out}: documents={N_DOCS} events={N_EVENTS}"
        f" orders={n_orders}"
    )
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/skewdata")
