"""Measured skew-join comparison: naive shuffle join vs AQE skew-split
vs explicit salting, on a synthetic hot-key workload.

One key owns 80% of a 20M-row fact side, joined to a 10k-row dim.
Broadcast is disabled (autoBroadcastJoinThreshold=-1) to force the
shuffle path — with a dim this small, broadcast IS the right fix and
makes skew moot; this bench isolates what happens when both sides are
too big to broadcast and one shuffle partition holds 80% of the rows.

Usage: python scripts/skew_bench.py   (prints a markdown table row set)
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

N_BIG = 20_000_000
N_DIM = 10_000
HOT_FRACTION = 0.8


def build(spark):
    hot_cut = int(N_BIG * HOT_FRACTION)
    big = spark.range(N_BIG).select(
        F.when(F.col("id") < hot_cut, F.lit(0))
        .otherwise(F.col("id") % N_DIM)
        .alias("k"),
        (F.col("id") * 2).alias("payload"),
    )
    dim = spark.range(N_DIM).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name")
    )
    return big, dim


def timed(df) -> float:
    t0 = time.time()
    df.write.mode("overwrite").format("noop").save()
    return round(time.time() - t0, 2)


def session(aqe: bool):
    b = (
        SparkSession.builder.master("local[8]")
        .appName("skew-bench")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.adaptive.enabled", str(aqe).lower())
        .config("spark.sql.adaptive.skewJoin.enabled", str(aqe).lower())
        # small-scale data: lower the skew thresholds so AQE's splitter
        # engages at MBs the way it would at GBs in production
        .config(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "8m",
        )
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
    )
    s = b.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    return s


def main():
    results = []

    # (a) naive shuffle join, no AQE: the hot partition serializes
    spark = session(aqe=False)
    big, dim = build(spark)
    timed(big.join(dim, "k"))  # warmup
    results.append(("naive shuffle join (AQE off)", timed(big.join(dim, "k"))))

    # (c) explicit salting, AQE still off: hot key spreads over 32 tasks
    from bulker_spark.operators.skew import salted_join

    results.append(
        (
            "salted_join n_salts=32 (AQE off)",
            timed(salted_join(big, dim, ["k"], n_salts=32)),
        )
    )
    spark.stop()

    # (b) AQE skew-join split
    spark = session(aqe=True)
    big, dim = build(spark)
    results.append(("AQE skew-join split", timed(big.join(dim, "k"))))
    spark.stop()

    print("| strategy | wall s |")
    print("|---|---|")
    for name, t in results:
        print(f"| {name} | {t} |")


if __name__ == "__main__":
    main()
