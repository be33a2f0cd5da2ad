"""Reprocessing source: replay gzipped NDJSON backups into the engine.

Reference: ``reprocessing-worker/main.go:336-430`` — lists backup objects
under ``{bucket}/{prefix}/{table}/...`` date-named folders, streams each
gzipped NDJSON file line-by-line, and re-produces every event. Spark-first
re-expression: ``spark.read.text`` over the object-store glob (gzip is
decompressed natively per-file, files parallelize across executors), route
lines to per-table ingest streams via ``consume_dataframe_json`` — the
whole replay is distributed; the driver only sees the file→table listing.

At 100 TB: one ``.gz`` file is one task (gzip isn't splittable), so replay
parallelism = file count — backups are written as many medium files (the
reference's per-batch objects give exactly this shape). No shuffle happens
until the ingest pipeline's own dedup/merge stage.
"""

from __future__ import annotations

import datetime as _dt
import posixpath
import re
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# backup object layout: .../{table}/{yyyy}/{mm}/{dd}/{file}.ndjson.gz
_DATE_IN_PATH = re.compile(r"/(\d{4})/(\d{2})/(\d{2})/")


def table_from_path(path: str) -> str:
    """Default router: the table is the path segment above the date dirs
    (``.../events/2024/01/03/part-0.ndjson.gz`` → ``events``)."""
    m = _DATE_IN_PATH.search(path)
    if m:
        return posixpath.basename(path[: m.start()])
    return posixpath.basename(posixpath.dirname(path))


def date_from_path(path: str) -> _dt.date | None:
    m = _DATE_IN_PATH.search(path)
    if not m:
        return None
    y, mo, d = (int(g) for g in m.groups())
    return _dt.date(y, mo, d)


def read_backup_lines(spark: SparkSession, path_glob) -> DataFrame:
    """All backup lines with their source file — one ``value`` string column
    plus ``_file`` (gzip handled natively by the text source). Accepts a
    glob string or an explicit file list (the listing-pruned form: Spark
    then never even stats the excluded files)."""
    if isinstance(path_glob, str):
        src = path_glob
    else:
        # listed paths are LITERAL names, but spark.read.text re-parses
        # every path as a glob — escape the metacharacters or a file
        # named part-[0].ndjson.gz reads the wrong file (or none)
        src = [_escape_glob(p) for p in path_glob]
    return (
        spark.read.text(src)
        .withColumn("_file", F.input_file_name())
        .filter(F.length(F.trim("value")) > 0)
    )


def _escape_glob(path: str) -> str:
    return re.sub(r"([*?\[\]{}\\])", r"\\\1", path)


def list_backup_files(spark: SparkSession, path_glob: str) -> list[str]:
    """File listing for a backup glob — METADATA ONLY, via Hadoop
    ``globStatus``: at object-store scale the listing must not read (or
    even open) a single data byte; the previous shape (distinct
    ``input_file_name()`` over ``spark.read.text``) decompressed the
    entire corpus just to learn the file names. Falls back to the
    read-based listing where the JVM filesystem isn't reachable
    (Spark Connect)."""
    try:
        jvm = spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(path_glob)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        statuses = fs.globStatus(jpath)
        if statuses is None:
            return []
        out = []
        for s in statuses:
            if s.isFile():
                out.append(str(s.getPath().toString()))
            elif s.isDirectory():
                # a directory path (or a glob whose last segment matches
                # directories) must list like the read-based listing did:
                # recurse to the files beneath it
                it = fs.listFiles(s.getPath(), True)
                while it.hasNext():
                    out.append(str(it.next().getPath().toString()))
        return sorted(out)
    except Exception:
        lines = read_backup_lines(spark, path_glob)
        return sorted(
            r["_file"]
            for r in lines.select("_file").distinct().collect()
        )


def replay_backups(
    engine,
    path_glob: str,
    mode: str = "batch",
    date_from: _dt.date | None = None,
    date_to: _dt.date | None = None,
    router: Callable[[str], str] = table_from_path,
    **stream_options,
):
    """Replay every backup file under ``path_glob`` into the engine,
    one ingest stream per destination table.

    Returns ``{table: StreamResult}``. Date bounds prune whole files by
    their path date before any data is read (partition-pruning analogue,
    applied to the metadata-only ``globStatus`` listing).
    """
    files = list_backup_files(engine.spark, path_glob)

    def in_range(f: str) -> bool:
        d = date_from_path(f)
        if d is None:
            return True
        if date_from and d < date_from:
            return False
        if date_to and d > date_to:
            return False
        return True

    by_table: dict[str, list[str]] = {}
    for f in files:
        if in_range(f):
            by_table.setdefault(router(f), []).append(f)

    results = {}
    for table, table_files in sorted(by_table.items()):
        stream = engine.create_stream(table, mode=mode, **stream_options)
        # read THIS table's file list directly — Spark's listing then
        # contains only these files, instead of scanning the whole glob
        # and filtering rows by input_file_name (which prunes nothing)
        stream.consume_dataframe_json(
            read_backup_lines(engine.spark, table_files).select("value")
        )
        results[table] = stream.complete()
    return results


def replay_backups_to_topics(
    spark: SparkSession,
    path_glob: str,
    topics_root: str,
    destination_id: str,
    mode: str = "batch",
    date_from: _dt.date | None = None,
    date_to: _dt.date | None = None,
    router: Callable[[str], str] = table_from_path,
    on_table: Callable[[str, list[str], str], None] | None = None,
    should_continue: Callable[[], bool] | None = None,
) -> dict[str, str]:
    """The reference's reprocessing-worker shape: replay backups INTO
    TOPICS, not straight into tables (``reprocessing-worker/main.go:
    336-430`` re-produces each gzipped NDJSON line to Kafka; consumers
    then load it through the normal path, retries/dead-letter included).

    Distributed produce: each table's lines are written through the
    ``bulker_topic`` batch writer (executor-side segment files, driver
    rename = all-or-nothing publish) — the replay never funnels through
    the driver. Returns {table: topic_id}; drain with the app's batch
    cycle.

    ``on_table`` fires after each table's produce (progress reporting for
    the reprocessing-job endpoint); ``should_continue`` is polled before
    each table — returning False stops cleanly at a table boundary (the
    reference's job cancel granularity is likewise per-file, not
    mid-write, ``admin/failover_reprocessor.go``)."""
    import os

    from ..sources.topic_source import ensure_active_session
    from ..streaming.topics import make_topic_id

    # may run on a background job thread whose JVM twin has no active
    # session — without this the bulker_topic write path can't resolve
    ensure_active_session(spark)
    files = list_backup_files(spark, path_glob)

    def in_range(f: str) -> bool:
        d = date_from_path(f)
        if d is None:
            return True
        if date_from and d < date_from:
            return False
        if date_to and d > date_to:
            return False
        return True

    by_table: dict[str, list[str]] = {}
    for f in files:
        if in_range(f):
            by_table.setdefault(router(f), []).append(f)

    out: dict[str, str] = {}
    for table, table_files in sorted(by_table.items()):
        if should_continue is not None and not should_continue():
            break
        topic = make_topic_id(destination_id, mode, table)
        (
            # per-table file-list read: the scan's listing contains only
            # this table's files — T tables cost one corpus pass total,
            # not T full-glob scans filtered per row
            read_backup_lines(spark, table_files)
            .select("value")
            .write.format("bulker_topic")
            .mode("append")
            .save(os.path.join(topics_root, topic))
        )
        out[table] = topic
        if on_table is not None:
            on_table(table, table_files, topic)
    return out
