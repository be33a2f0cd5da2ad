"""Synthesize a larger scale factor by FK-consistent replication of the
driver's sf0.1 parquet: every fact/dim key is offset per replica, so each
replica is a disjoint, internally-consistent copy of the economy (joins
fan out exactly K×; dimension tables nation/region stay shared).

Usage: python scripts/gen_sf1.py [K] [src_sf_dir] [out_dir]
Defaults: K=10, /root/testdata/sf0.1, /tmp/sf1 — i.e. an sf1-equivalent.

This exists for scale-stress evidence (bench.py against the output), not
correctness: there is no oracle at this size, and the replicated text
corpus means near-dup queries see K identical copies of each document —
bounded-window pair queries stay bounded because doc_id caps select only
replica 0.
"""

import os
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

# per-table key columns to offset, with the per-replica stride taken from
# the source table's max key (+1) so replica key ranges never collide
OFFSETS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
SHARED = ["nation", "region"]  # dimensions: one copy


def main(k: int, src: str, out: str) -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out, exist_ok=True)
    for t in SHARED:
        spark.read.parquet(f"{src}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out}/{t}.parquet")
        print(f"{t}: shared copy")
    # strides must be consistent across tables referencing the same key
    # family, so compute one stride per key "root" (custkey, orderkey, ...)
    stride: dict[str, int] = {}
    for t, cols in OFFSETS.items():
        df = spark.read.parquet(f"{src}/{t}.parquet")
        for c in cols:
            root = c.split("_", 1)[1] if "_" in c else c
            m = df.agg(F.max(c)).collect()[0][0] or 0
            stride[root] = max(stride.get(root, 0), int(m) + 1)
    for t, cols in OFFSETS.items():
        df = spark.read.parquet(f"{src}/{t}.parquet")
        reps = []
        for r in range(k):
            rep = df
            for c in cols:
                root = c.split("_", 1)[1] if "_" in c else c
                rep = rep.withColumn(
                    c, (F.col(c) + F.lit(r * stride[root])).cast("long")
                )
            reps.append(rep)
        big = reps[0]
        for rep in reps[1:]:
            big = big.unionByName(rep)
        big.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
        n = spark.read.parquet(f"{out}/{t}.parquet").count()
        print(f"{t}: {n} rows ({k}x)")
    spark.stop()


if __name__ == "__main__":
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sf1"
    main(k, src, out)
