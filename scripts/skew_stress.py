"""Skewed-corpus stress tier: run the skew-sensitive catalog queries on
the Zipf fixture (``gen_skew.py``) and measure PER-TASK shuffle skew —
max/median task time and max/median shuffle-read bytes for the worst
stage of each query — plus whether AQE's skew-join splitter engaged.

The uniform TPC-H-ish bench can't show the realistic 100 TB failure
mode: a first-occurrence ``groupBy(window_hash)`` where one boilerplate
block contributes 10⁸ rows to a single key, or a session window where
one bot user owns half the stream. This harness makes that a measured,
per-round number instead of a hope. Flag rule (VERDICT r5 #2): a query
whose worst-stage max-task TIME exceeds ~4× the median gets a
salting/partial-agg fix or a documented why-not.

Task metrics come from the Spark UI REST API
(``/api/v1/applications/{app}/stages/{sid}/{attempt}/taskSummary``) —
the same numbers the UI's stage page shows, no listener plumbing.

Usage: python scripts/skew_stress.py [fixture_dir]
(default /tmp/skewdata; run gen_skew.py first). Prints a markdown table
for SCALING.md.
"""

import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

QUERIES_UNDER_TEST = [
    "doc_span_dedup",
    "doc_block_dedup_rebuild",
    "doc_contamination",
    "doc_dsir_weights",
    "events_sessionize",
    "events_sessionize_native",
    # round 7: every remaining per-user(/key) window in the catalog —
    # the same hot-user hazard sessionize walled on (VERDICT r6 #1)
    "events_running_total",
    "events_interarrival_stats",
    "events_trailing_1h",
    "events_user_features",
    "events_markov_transitions",
    "events_attribution_last_touch",
    "events_top_paths",
    "events_dedup_ttl",
    "events_asof_last_order",
]

QUANTS = "0.0,0.5,1.0"  # min, median, max


def _get(base: str, path: str):
    with urllib.request.urlopen(f"{base}{path}", timeout=30) as r:
        return json.loads(r.read())


def stage_skew(base: str, app_id: str, after_stage: int) -> dict:
    """Worst-stage skew ratios across all stages with id > after_stage."""
    stages = _get(base, f"/api/v1/applications/{app_id}/stages?status=complete")
    worst = {
        "stage": None,
        "time_ratio": 0.0,
        "read_ratio": 0.0,
        "max_task_ms": 0,
        "med_task_ms": 0,
        "n_tasks": 0,
    }
    for st in stages:
        sid = st["stageId"]
        if sid <= after_stage or st["numCompleteTasks"] < 2:
            continue
        try:
            summ = _get(
                base,
                f"/api/v1/applications/{app_id}/stages/{sid}/"
                f"{st['attemptId']}/taskSummary?quantiles={QUANTS}",
            )
        except Exception:
            continue
        run = summ.get("executorRunTime") or [0, 0, 0]
        med_t, max_t = max(run[1], 1.0), run[2]
        ratio_t = max_t / med_t
        read = (summ.get("shuffleReadMetrics") or {}).get(
            "readBytes"
        ) or [0, 0, 0]
        ratio_r = read[2] / max(read[1], 1.0) if read[2] else 0.0
        if ratio_t > worst["time_ratio"]:
            worst.update(
                stage=sid,
                time_ratio=round(ratio_t, 1),
                read_ratio=round(ratio_r, 1),
                max_task_ms=int(max_t),
                med_task_ms=int(med_t),
                n_tasks=st["numCompleteTasks"],
            )
    return worst


def main(fixture: str) -> None:
    spark = (
        SparkSession.builder.master("local[16]")
        .appName("skew-stress")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # local-scale thresholds so the skew splitter engages at the MBs
        # this fixture produces the way it would at GBs in production
        .config(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "8m",
        )
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "true")  # REST API source
        .config("spark.ui.port", "4055")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from bulker_spark.plans.queries import QUERIES

    base = "http://localhost:4055"
    app_id = spark.sparkContext.applicationId

    print(f"fixture: {fixture}")
    print(
        "| query | wall s | worst stage | tasks | max/med task time "
        "| max/med shuffle read | max task ms | skew-split |"
    )
    print("|---|---|---|---|---|---|---|---|")
    last_stage = -1
    for name in QUERIES_UNDER_TEST:
        fn = QUERIES[name][0]
        fn(spark, fixture).write.mode("overwrite").format("noop").save()  # warm
        try:
            stages = _get(
                base, f"/api/v1/applications/{app_id}/stages"
            )
            last_stage = max([s["stageId"] for s in stages] + [last_stage])
        except Exception:
            pass
        df = fn(spark, fixture)
        t0 = time.time()
        df.write.mode("overwrite").format("noop").save()
        wall = round(time.time() - t0, 2)
        # the skew flag needs the FINAL adaptive plan, which only this
        # DataFrame's own QueryExecution carries after an action on it —
        # the noop write above ran a separate QueryExecution, so execute
        # this one too (untimed; driver transfer would distort the wall)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        skewed = "yes" if "skew=true" in plan else "no"
        w = stage_skew(base, app_id, last_stage)
        print(
            f"| {name} | {wall} | {w['stage']} | {w['n_tasks']} "
            f"| {w['time_ratio']}x | {w['read_ratio']}x "
            f"| {w['max_task_ms']} | {skewed} |"
        )
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/skewdata")
