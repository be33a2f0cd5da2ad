"""Command-line front: the reference's HTTP bulk surface as a CLI.

The reference exposes ``POST /bulk/:destinationId?tableName=&pk=&mode=``
(``/root/reference/bulkerapp/app/router.go:220-321``) plus inspection
endpoints; library users get the same verbs here without standing up a
server:

    python -m bulker_spark load  -w WH -t tbl [-m MODE] [--pk col ...] file.ndjson
    python -m bulker_spark sql   -w WH "SELECT ... FROM tbl"
    python -m bulker_spark tables   -w WH
    python -m bulker_spark history  -w WH -t tbl
    python -m bulker_spark count    -w WH -t tbl

``-`` as the load file reads NDJSON from stdin (the /bulk request body).
"""

from __future__ import annotations

import argparse
import json
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="bulker_spark")
    p.add_argument("--warehouse", "-w", required=True, help="warehouse root dir")
    p.add_argument("--namespace", default="default")
    p.add_argument("--master", default="local[*]")
    p.add_argument(
        "--retain-versions", type=int, default=1,
        help="committed versions kept per table (>1 enables time travel "
        "and the `changes` feed across rewrites)",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    load = sub.add_parser("load", help="NDJSON bulk load (POST /bulk)")
    load.add_argument("file", help="NDJSON path, or - for stdin")
    load.add_argument("--table", "-t", required=True)
    load.add_argument(
        "--mode", "-m", default="replace_table",
        choices=["stream", "batch", "replace_table", "replace_partition", "scd2"],
        help="replace_table is the reference's /bulk default",
    )
    load.add_argument("--pk", action="append", default=[], help="primary key column (repeatable)")
    load.add_argument("--deduplicate", action="store_true")
    load.add_argument("--timestamp-column")
    load.add_argument("--partition-id")

    q = sub.add_parser("sql", help="Spark SQL over warehouse tables")
    q.add_argument("query")
    q.add_argument("--limit", type=int, default=100)

    sub.add_parser("tables", help="list tables")

    h = sub.add_parser("history", help="commit log of a table")
    h.add_argument("--table", "-t", required=True)

    c = sub.add_parser("count", help="row count (the reference's Count op)")
    c.add_argument("--table", "-t", required=True)

    cp = sub.add_parser("compact", help="fold small files / MoR deltas")
    cp.add_argument("--table", "-t", required=True)
    cp.add_argument("--target-file-mb", type=int, default=128)
    cp.add_argument("--cluster-by", action="append", default=[])
    cp.add_argument("--zorder-by", action="append", default=[])

    rb = sub.add_parser("rebucket", help="rescale a bucketed table")
    rb.add_argument("--table", "-t", required=True)
    rb.add_argument("--n-buckets", type=int, required=True)

    stt = sub.add_parser("stats", help="file + bucket layout stats")
    stt.add_argument("--table", "-t", required=True)

    cl = sub.add_parser("clone", help="zero-copy table clone (hard links)")
    cl.add_argument("--table", "-t", required=True)
    cl.add_argument("--target", required=True)
    cl.add_argument(
        "--snapshot", default=None,
        help="commit id or version string (default: current)",
    )

    ch = sub.add_parser(
        "changes", help="row-level change feed since a commit (CDC egress)"
    )
    ch.add_argument("--table", "-t", required=True)
    ch.add_argument("--since", type=int, required=True, help="checkpointed commit id")
    ch.add_argument("--to", type=int, default=None)
    ch.add_argument("--limit", type=int, default=100)

    vac = sub.add_parser("vacuum", help="reclaim orphaned version dirs")
    vac.add_argument("--table", "-t", required=True)
    vac.add_argument("--min-age-hours", type=float, default=24.0)

    dk = sub.add_parser("delete-keys", help="delete rows by primary key")
    dk.add_argument("--table", "-t", required=True)
    dk.add_argument("keys", nargs="+", help="PK values (JSON scalars)")
    ex = sub.add_parser(
        "export", help="write a table as deterministic training shards"
    )
    ex.add_argument("--table", "-t", required=True)
    ex.add_argument("--key", required=True, help="shard-by column")
    ex.add_argument("--shards", type=int, default=64)
    ex.add_argument("--max-records-per-file", type=int, default=None)
    ex.add_argument("--salt", default="")
    ex.add_argument("path", help="output directory")
    srv = sub.add_parser(
        "serve", help="start the HTTP app (router.go surface)"
    )
    srv.add_argument("--topics", required=True, help="topic segments root")
    srv.add_argument("--host", default="127.0.0.1")
    srv.add_argument("--port", type=int, default=3042)
    srv.add_argument(
        "--destination",
        default="default",
        help="destination id served against --warehouse",
    )
    srv.add_argument(
        "--options",
        default="{}",
        help='StreamOptions JSON, e.g. \'{"primary_key": ["id"]}\'',
    )
    srv.add_argument(
        "--period",
        type=float,
        default=300.0,
        help="batch-cycle period seconds (0 disables the cron)",
    )
    return p


def main(argv: list[str] | None = None, spark=None) -> int:
    args = _build_parser().parse_args(argv)

    owns_spark = spark is None
    if owns_spark:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master(args.master)
            .appName("bulker-spark-cli")
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")

    from bulker_spark import Engine

    engine = Engine(
        spark,
        args.warehouse,
        namespace=args.namespace,
        retain_versions=args.retain_versions,
    )
    try:
        if args.cmd == "load":
            lines = (
                [ln for ln in sys.stdin.read().splitlines() if ln.strip()]
                if args.file == "-"
                else args.file
            )
            opts: dict = {
                "mode": args.mode,
                "primary_key": args.pk,
                "deduplicate": args.deduplicate,
            }
            if args.timestamp_column:
                opts["timestamp_column"] = args.timestamp_column
            if args.partition_id:
                opts["partition_id"] = args.partition_id
            res = engine.bulk_load(args.table, lines, **opts)
            print(
                json.dumps(
                    {
                        "table": args.table,
                        "successful_rows": res.successful_rows,
                        "malformed_rows": res.malformed_rows,
                        "state": res.warehouse_state,
                    }
                )
            )
        elif args.cmd == "sql":
            engine.sql(args.query).show(args.limit, truncate=False)
        elif args.cmd == "tables":
            for name in engine.warehouse.list_tables():
                print(name)
        elif args.cmd == "history":
            for e in engine.warehouse.history(args.table):
                print(
                    f"commit {e['commit']}: {e['op']} "
                    f"({e['n_files']} files, version {e['version']})"
                )
        elif args.cmd == "count":
            print(engine.warehouse.count(args.table))
        elif args.cmd == "compact":
            res = engine.warehouse.compact(
                args.table,
                target_file_bytes=args.target_file_mb * 1024 * 1024,
                cluster_by=args.cluster_by or None,
                zorder_by=args.zorder_by or None,
            )
            print(json.dumps(res))
        elif args.cmd == "rebucket":
            meta = engine.warehouse.rebucket(args.table, args.n_buckets)
            print(json.dumps({"table": args.table, "n_buckets": meta.n_buckets}))
        elif args.cmd == "stats":
            out = {"files": engine.warehouse.table_stats(args.table)}
            meta = engine.warehouse.get_meta(args.table)
            if meta and meta.n_buckets:
                bs = engine.warehouse.bucket_stats(args.table)
                out["buckets"] = {
                    "n_buckets": bs["n_buckets"],
                    "populated": bs["populated"],
                    "skew_ratio": bs["skew_ratio"],
                }
            elif meta and (meta.cluster_cols or meta.pk):
                out["clustering"] = engine.warehouse.cluster_stats(args.table)
            if meta and meta.write_mode == "mor":
                out["mor"] = {
                    "pending_deltas": meta.mor_deltas,
                    "commit_seq": meta.mor_seq,
                }
            print(json.dumps(out))
        elif args.cmd == "clone":
            snap = args.snapshot
            if snap is not None and snap.isdigit():
                snap = int(snap)
            meta = engine.warehouse.clone(
                args.table, args.target, snapshot=snap
            )
            print(
                json.dumps({"cloned": args.target, "version": meta.version})
            )
        elif args.cmd == "changes":
            feed = engine.read_changes(args.table, args.since, to_commit=args.to)
            for r in feed.limit(args.limit).collect():
                print(json.dumps(r.asDict(recursive=True), default=str))
        elif args.cmd == "vacuum":
            removed = engine.warehouse.vacuum(
                args.table, min_age_seconds=args.min_age_hours * 3600
            )
            print(json.dumps({"removed": removed}))
        elif args.cmd == "delete-keys":
            keys = [json.loads(k) for k in args.keys]
            engine.warehouse.delete_keys(args.table, keys)
            print(json.dumps({"deleted_keys": keys}))
        elif args.cmd == "export":
            from bulker_spark.functions.export import write_training_shards

            df = engine.warehouse.read(args.table)
            write_training_shards(
                df,
                args.path,
                args.key,
                args.shards,
                salt=args.salt,
                max_records_per_file=args.max_records_per_file,
            )
            print(
                json.dumps(
                    {
                        "table": args.table,
                        "path": args.path,
                        "shards": args.shards,
                        "rows": df.count(),
                    }
                )
            )
        elif args.cmd == "serve":
            from bulker_spark.app import (
                BatchRunner,
                BulkerApp,
                Destination,
                serve,
            )

            app = BulkerApp(
                spark,
                args.topics,
                [
                    Destination(
                        args.destination,
                        args.warehouse,
                        namespace=args.namespace,
                        options=json.loads(args.options),
                    )
                ],
            )
            server = serve(app, host=args.host, port=args.port)
            runner = None
            if args.period > 0:
                runner = BatchRunner(app, period_s=args.period)
                runner.start()
            host, port = server.server_address
            print(
                json.dumps(
                    {"listening": f"http://{host}:{port}", "cron_s": args.period}
                ),
                flush=True,
            )
            try:
                import threading

                threading.Event().wait()  # serve until interrupted
            except KeyboardInterrupt:
                pass
            finally:
                if runner:
                    runner.stop()
                server.shutdown()
                # durability: publish any producer-buffered events as
                # segments so they survive the process (next cycle of a
                # future process drains them)
                app.producer.flush_all()
        return 0
    finally:
        if owns_spark:
            spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
