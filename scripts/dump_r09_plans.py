"""Dump .explain('formatted') for named queries to plans/r09/<q>_<tag>.txt.

Usage: python scripts/dump_r09_plans.py <tag> query [query...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from bulker_spark.plans.queries import QUERIES

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r09"
)


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("plan-dump-r09")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # optional session confs, e.g. to dump a routed plan shape:
    # BULKER_AB_CONF="spark.bulker.pqfuse.mode=fused"
    for kv in filter(None, os.environ.get("BULKER_AB_CONF", "").split(",")):
        k, _, v = kv.partition("=")
        spark.conf.set(k, v)
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in names:
        df = QUERIES[name][0](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange mentions)")
    spark.stop()


if __name__ == "__main__":
    main()
