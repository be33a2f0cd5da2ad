"""Targeted repeat-timing harness for optimization work (guide §1).

The round-8 host shows episodic CPU-steal bursts (same-code queries vary
10-20x between two bench.py runs in both directions), so single best-of-2
timings cannot attribute a delta to a code change. This harness times a
small set of queries with N repetitions in one session and reports
min/median per query; the min over enough reps is robust to bursts.
Before/after comparisons interleave two invocations of this script per
variant (A B A B) and compare the per-variant mins.

Usage: python scripts/ab_bench.py [--reps N] [--sf DIR] query [query...]
Prints one JSON line: {"sf":..., "reps":N, "queries":{name:{"min":..,
"med":..,"all":[...]}}}
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from bulker_spark.plans.queries import QUERIES


def main() -> None:
    args = sys.argv[1:]
    reps = 7
    sf_dir = "/root/testdata/sf0.1"
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--reps":
            reps = int(args[i + 1])
            i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ab-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.files.minPartitionNum", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # optional session confs, e.g. to time a routed plan shape:
    # BULKER_AB_CONF="spark.bulker.pqfuse.mode=fused,k=v"
    extra = os.environ.get("BULKER_AB_CONF", "")
    for kv in filter(None, extra.split(",")):
        k, _, v = kv.partition("=")
        spark.conf.set(k, v)

    # same warmups as bench.py so rep 0 is not a JIT outlier
    try:
        QUERIES["tpch_q6"][0](spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        spark.range(64).repartition(int(cpus)).mapInPandas(
            lambda it: (pdf for pdf in it), schema="id long"
        ).write.mode("overwrite").format("noop").save()
    except Exception:
        pass

    out = {}
    for name in names:
        fn = QUERIES[name][0]
        times = []
        for r in range(reps):
            df = fn(spark, sf_dir)
            spark.sparkContext.setJobDescription(f"{name} rep{r}")
            t0 = time.time()
            df.write.mode("overwrite").format("noop").save()
            times.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {
            "min": min(times),
            "med": round(statistics.median(times), 3),
            "all": times,
        }
    print(json.dumps({"sf": sf_dir, "reps": reps, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
