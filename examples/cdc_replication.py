"""CDC round-trip on the bulker_spark engine, in miniature.

Events land in a PRIMARY warehouse (the reference's ingest job); every
committed row change then flows OUT — the half the reference leaves to
its destinations — through the commit-log change feed:

  ingest (batch, dedup, bucketed)            Engine.bulk_load
    → row-level change feed                  Engine.read_changes
    → the same feed as a stream              Engine.stream_changes
    → replicated into a SECOND warehouse     Engine.replicate_to
    → rollup maintained from signed deltas   IncrementalRollup
    → point lookups auto-pruned              Engine.sql (bucket + stats)

Run:  python examples/cdc_replication.py
"""

import json
import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import SparkSession


def main() -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from bulker_spark import Engine
    from bulker_spark.operators.incremental import incremental_rollup

    primary = Engine(spark, tempfile.mkdtemp(), retain_versions=10)
    analytics = Engine(spark, tempfile.mkdtemp())

    # 1. ingest: 1000 JSON events, PK-deduped, hash-bucketed (the layout
    #    that keeps trickle merges AND point reads O(bucket))
    events = [
        json.dumps({"id": i, "kind": "click" if i % 3 else "view",
                    "amount": i * 0.5})
        for i in range(1000)
    ]
    res = primary.bulk_load(
        "events", events, mode="batch", primary_key=["id"],
        deduplicate=True, bucket_by=16,
    )
    print(f"ingested {res.successful_rows} rows")
    c0 = primary.warehouse.history("events")[0]["commit"]

    # 2. a rollup maintained incrementally — and a second warehouse
    #    following the table through the streaming change feed
    rollup = incremental_rollup(
        primary.warehouse, "events", "events_by_kind", ["kind"],
        sums={"total": "amount"},
    )
    print("rollup:", rollup.refresh())
    ckpt = tempfile.mkdtemp()
    primary.replicate_to(analytics, "events", ckpt).awaitTermination()

    # 3. life happens on the primary: an update batch and some deletes
    primary.bulk_load(
        "events",
        [json.dumps({"id": 7, "kind": "click", "amount": 999.0}),
         json.dumps({"id": 2000, "kind": "view", "amount": 1.0})],
        mode="batch", primary_key=["id"], deduplicate=True, bucket_by=16,
    )
    primary.warehouse.delete_keys("events", [1, 2, 3])

    # 4. the batch feed shows exactly what changed (Delta-CDF shapes)
    feed = primary.read_changes("events", c0)
    feed.groupBy("__change_type").count().show()

    # 5. downstream convergence: replica follows, rollup folds the
    #    SIGNED deltas (update = post - pre) without a rebuild
    primary.replicate_to(analytics, "events", ckpt).awaitTermination()
    print("rollup:", rollup.refresh())
    a = primary.warehouse.read("events").count()
    b = analytics.warehouse.read("events").count()
    assert a == b, (a, b)
    print(f"replica converged: {b} rows in both warehouses")

    # 6. reads: a point lookup auto-prunes to ONE bucket dir's files,
    #    and the rollup answers without touching the fact table
    hit = primary.sql("select kind, amount from events where id = 7")
    print("lookup scans", len(hit.inputFiles()), "file(s):", hit.collect())
    primary.sql(
        "select kind, n, round(total, 2) total from events_by_kind "
        "order by kind"
    ).show()

    spark.stop()


if __name__ == "__main__":
    main()
