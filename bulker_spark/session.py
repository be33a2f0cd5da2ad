"""Session factory with the engine's scale posture baked in.

Every knob here is the local expression of a 100 TB default. On a real
cluster the same settings hold — only master/memory sizing changes:

- **AQE on** (coalesce + skew-join): runtime re-planning replaces guessed
  shuffle-partition counts; skewed merge/join keys split automatically
  (measured against salting in ``scripts/skew_bench.py``).
- **shuffle.partitions ≈ 2-3× total cores** as the pre-AQE upper bound —
  AQE coalesces down, it never splits up, so the static number is a cap.
- **maxPartitionBytes 128 MB** keeps a scan task's working set inside
  executor memory at any table size; ``files.minPartitionNum`` floors
  tiny-table scans so small-SF tests still parallelize.
- **Arrow enabled** for the Pandas-UDF kernels (multimodal, SemDeDup) —
  row-at-a-time Python is banned by the plan-audit suite anyway.
- **runtime bloom-filter join pruning on**: a selective dim-side filter
  builds a bloom filter broadcast into the fact scan — at 100 TB this is
  free early pruning on merge-shaped joins.
- **UTC session timezone**: the engine's timestamp semantics (merge
  windows, time partitions) are wall-clock-free.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def make_session(
    app_name: str = "bulker-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str = "8g",
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = os.cpu_count() or 8
    master = master or f"local[{cpus}]"
    shuffle = shuffle_partitions or (
        int(master[6:-1]) * 2
        if master.startswith("local[") and master[6:-1].isdigit()
        else cpus * 2
    )
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.files.minPartitionNum", str(cpus))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "true"
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", driver_memory)
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
