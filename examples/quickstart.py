"""Quickstart: the bulker_spark surface in one runnable script.

Mirrors a jitsucom/bulker user's workflow — JSON events in, governed
tables out — plus the warehouse features the reference doesn't have
(time travel, SQL over tables, incremental reads).

Run:  python examples/quickstart.py
"""

import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import SparkSession

from bulker_spark import Engine


def main() -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    eng = Engine(spark, tempfile.mkdtemp(), retain_versions=5)

    # 1. batch ingest with dedup (the reference's `batch` mode + primaryKey
    #    + deduplicate options): JSON strings in, typed table out
    res = eng.bulk_load(
        "events",
        [
            '{"id": 1, "type": "signup", "ts": "2024-01-01T10:00:00Z", "props": {"plan": "pro"}}',
            '{"id": 2, "type": "click", "ts": "2024-01-01T10:01:00Z"}',
            '{"id": 2, "type": "click", "ts": "2024-01-01T10:02:00Z"}',  # dup pk
            "not json at all",  # malformed: counted, never fails the batch
        ],
        mode="batch",
        primary_key=["id"],
        deduplicate=True,
        timestamp_column="ts",
    )
    print(f"loaded: {res.successful_rows} rows, {res.malformed_rows} malformed")
    eng.warehouse.read("events").show()  # nested props flattened to props_plan

    # 2. schema evolution: a new field appears -> column added, old rows NULL
    eng.bulk_load(
        "events",
        ['{"id": 3, "type": "purchase", "ts": "2024-01-02T09:00:00Z", "amount": 9.99}'],
        mode="batch",
        primary_key=["id"],
        deduplicate=True,
        timestamp_column="ts",
    )

    # 3. SQL over the warehouse (Select/Count generalized)
    eng.sql(
        "SELECT type, count(*) AS n FROM events GROUP BY type ORDER BY type"
    ).show()

    # 4. time travel + history (beyond the reference: Delta-style log)
    for h in eng.warehouse.history("events"):
        print(f"commit {h['commit']}: {h['op']} ({h['n_files']} files)")
    print("rows at commit 1:", eng.warehouse.read("events", version=1).count())

    # 5. incremental consumption on an append-only table: downstream
    #    consumers re-read ONLY files added since their checkpoint
    eng.bulk_load("log", ['{"seq": 1}'], mode="batch")
    eng.bulk_load("log", ['{"seq": 2}', '{"seq": 3}'], mode="batch")
    print("appended since commit 1:")
    eng.warehouse.read_appended("log", since_commit=1).show()
    # after a merge/replace/compact, increments are undefined — the reader
    # is told to fall back to a full snapshot re-read:
    try:
        eng.warehouse.read_appended("events", since_commit=1)
    except ValueError as ex:
        print("events table:", ex)

    # 6. SCD Type-2 dimensions (mode="scd2"): change closes the current
    #    version and opens a new one; history is queryable as-of any time
    import datetime as dt

    from bulker_spark.operators.scd2 import scd2_as_of, scd2_current

    eng.bulk_load(
        "dim_users", ['{"id": 1, "city": "nyc"}'], mode="scd2",
        primary_key=["id"], frozen_now=dt.datetime(2024, 1, 1),
    )
    eng.bulk_load(
        "dim_users", ['{"id": 1, "city": "boston"}'], mode="scd2",
        primary_key=["id"], frozen_now=dt.datetime(2024, 2, 1),
    )
    dim = eng.warehouse.read("dim_users")
    print("current city:", scd2_current(dim).collect()[0]["city"])
    print(
        "city on Jan 15:",
        scd2_as_of(dim, dt.datetime(2024, 1, 15)).collect()[0]["city"],
    )

    # 7. data-quality gates: profile + declarative checks, one pass each
    from bulker_spark.functions.profile import non_null, profile, run_checks, unique

    profile(eng.warehouse.read("events")).show()
    run_checks(
        eng.warehouse.read("events"), [unique("id"), non_null("type")]
    ).show()

    # 8. incrementally-maintained rollup: refresh aggregates from append
    #    deltas only (falls back to full rebuild if the source was rewritten)
    from bulker_spark.operators.incremental import incremental_rollup

    ru = incremental_rollup(eng.warehouse, "log", "log_rollup", ["seq"])
    print(ru.refresh())  # initial
    eng.bulk_load("log", ['{"seq": 3}'], mode="batch")
    print(ru.refresh())  # incremental: only the new file is aggregated

    # 9. merge-cost layouts for big tables: bucket_by prunes a merge to
    #    the buckets containing batch keys; merge_on_read makes the merge
    #    an O(batch) delta append (reads reconcile; compaction folds)
    eng.bulk_load(
        "users_bucketed", ['{"id": %d, "v": "x"}' % i for i in range(100)],
        mode="batch", primary_key=["id"], deduplicate=True, bucket_by=16,
    )
    eng.bulk_load(  # touches ONE of 16 buckets
        "users_bucketed", ['{"id": 7, "v": "updated"}'],
        mode="batch", primary_key=["id"], deduplicate=True,
    )
    print("point lookup:", eng.warehouse.lookup("users_bucketed", [7]).collect())
    eng.bulk_load(
        "events_mor", ['{"id": %d, "v": 1}' % i for i in range(100)],
        mode="batch", primary_key=["id"], deduplicate=True,
        merge_on_read=True, mor_compact_every=10,
    )
    eng.bulk_load(  # appends a tiny delta file, no rewrite
        "events_mor", ['{"id": 3, "v": 2}'],
        mode="batch", primary_key=["id"], deduplicate=True,
    )
    print("mor rows:", eng.warehouse.count("events_mor"))

    # 10. the bulker_topic Python data source: NDJSON segment dirs as a
    #     batch+stream format with Kafka-like offsets (see
    #     sources/topic_source.py for the streaming consumer shape)
    from pyspark.sql import functions as F

    from bulker_spark.sources.topic_source import register_topic_source

    register_topic_source(spark)
    topic = tempfile.mkdtemp(prefix="topic_")
    spark.range(5).select(
        F.to_json(F.struct("id")).alias("value")
    ).write.format("bulker_topic").mode("append").save(topic)
    print("topic rows:", spark.read.format("bulker_topic").load(topic).count())

    # 11. the HTTP front (router.go parity): async /post → topic →
    #     batch cycle → warehouse; sync /bulk; /failed dead-letter peek
    import json as _json
    import urllib.request

    from bulker_spark.app import BulkerApp, Destination, serve

    app = BulkerApp(
        spark,
        tempfile.mkdtemp(prefix="topics_"),
        [Destination("dest1", tempfile.mkdtemp(prefix="wh_http_"),
                     options={"primary_key": ["id"], "deduplicate": True})],
    )
    server = serve(app)
    base = "http://%s:%d" % server.server_address
    for i in range(3):
        urllib.request.urlopen(urllib.request.Request(
            f"{base}/post/dest1?tableName=clicks",
            data=_json.dumps({"id": i, "page": {"path": "/home"}}).encode(),
        ))
    urllib.request.urlopen(urllib.request.Request(
        f"{base}/cycle/dest1", data=b"", method="POST"
    ))
    print("http-ingested rows:",
          app.engine_for("dest1").warehouse.count("clicks"))
    server.shutdown()

    spark.stop()


if __name__ == "__main__":
    main()
