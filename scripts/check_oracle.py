"""Local replica of the driver's correctness gate: run each Spark query and
its DuckDB oracle side-by-side, compare row count, sorted column names, and
order-insensitive values. Usage: python scripts/check_oracle.py [--strict] [sf_dir] [only...]; --strict compares floats repr-exactly (the driver hash discipline) instead of 6 significant digits."""

import os
import sys
import time

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")
from bulker_spark.plans.queries import QUERIES  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


STRICT = False  # --strict: repr-exact floats, the driver's hash discipline


def norm_val(v):
    import datetime as dt
    import math

    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v) if STRICT else f"{v:.6g}"
    if isinstance(v, dt.datetime):
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_val(r[i]) for i in order) for r in rows)


def main(sf_dir: str, only: list[str]):
    import os as _os

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        # sf1 runs collect full result sets for the strict compare —
        # the 1g default driver heap dies around the big TPC-H answers
        .config(
            "spark.driver.memory",
            _os.environ.get("SPARK_ORACLE_DRIVER_MEM", "6g"),
        )
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # optional session confs, e.g. to strict-verify a routed plan shape:
    # SPARK_ORACLE_CONF="spark.bulker.lowcard.mode=histogram,k=v"
    extra = _os.environ.get("SPARK_ORACLE_CONF", "")
    for kv in filter(None, (p.strip() for p in extra.split(","))):
        k, _, v = kv.partition("=")
        spark.conf.set(k, v)
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata is one file per table; gen_sf1.py output is a
        # Spark-written DIRECTORY of part files — glob it for DuckDB
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    failed = []
    attempted = 0
    for name, (fn, sql) in QUERIES.items():
        if only and name not in only:
            continue
        attempted += 1
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sorted(sdf.columns)
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL {name}: spark error: {str(ex)[:200]}")
            failed.append(name)
            continue
        if sql is None:
            print(f"ok   {name}: rows={len(s_rows)} (no oracle)")
            continue
        try:
            res = con.execute(sql)
            d_cols = sorted(c[0] for c in res.description)
            d_rows = res.fetchall()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {str(ex)[:200]}")
            failed.append(name)
            continue
        dt_s = time.time() - t0
        if s_cols != d_cols:
            print(f"FAIL {name}: cols spark={s_cols} duck={d_cols}")
            failed.append(name)
            continue
        if len(s_rows) != len(d_rows):
            print(f"FAIL {name}: rowcount spark={len(s_rows)} duck={len(d_rows)}")
            failed.append(name)
            continue
        cs = canon(s_rows, sdf.columns)
        cd = canon(d_rows, [c[0] for c in res.description])
        if cs != cd:
            ndiff = sum(1 for a, b in zip(cs, cd) if a != b)
            print(f"FAIL {name}: {ndiff}/{len(cs)} rows differ")
            for a, b in list(zip(cs, cd))[:200]:
                if a != b:
                    print(f"   spark: {a}\n   duck : {b}")
                    break
            failed.append(name)
        else:
            print(f"ok   {name}: rows={len(s_rows)} cols={len(s_cols)} {dt_s:.1f}s")
    # count ATTEMPTED queries, not the whole catalog: a filtered run must
    # not report skipped queries as passed
    print(f"\n{attempted - len(failed)}/{attempted} passed"
          + (f" ({len(QUERIES) - attempted} skipped)" if attempted != len(QUERIES) else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--strict"]
    STRICT = "--strict" in sys.argv[1:]
    sf = args[0] if args else "/root/testdata/sf0.01"
    sys.exit(main(sf, args[1:]))
