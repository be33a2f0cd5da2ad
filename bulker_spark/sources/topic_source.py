"""``bulker_topic`` — a Spark 4 Python Data Source (batch + streaming)
exposing an NDJSON "topic" directory with Kafka-like offset semantics.

The reference's event transport is one Kafka topic per (destination,
mode, table) consumed by batch consumers that track offsets and commit
them only after the warehouse commit (``/root/reference/bulkerapp/app/
batch_consumer.go:56-267``, watermark bounding
``abstract_batch_consumer.go:286-307``). This source reproduces that
shape on a directory of immutable segment files (the Kafka log
discipline: appends create new segments, existing segments never
change):

- **record** = one NDJSON line; schema ``value string, _segment string,
  _offset bigint`` — the (value, partition, offset) triple of a Kafka
  record.
- **offset** = ``{segment_name: lines_consumed}`` — a JSON dict, exactly
  a Kafka consumer-group position. ``latestOffset`` plays the
  high-watermark query that bounds each micro-batch run.
- **exactly-once** comes from Structured Streaming's checkpoint: the
  offset dict is persisted per micro-batch, and a restarted query
  resumes from the last committed position — the same
  offset-after-commit contract the reference implements by hand.
- **parallelism**: one input partition per (segment, line-range), so a
  1000-segment backlog reads on 1000 tasks; ``maxLinesPerTrigger``
  bounds a micro-batch like Kafka's ``maxOffsetsPerTrigger``.

Segments may be plain ``*.ndjson``/``*.jsonl``/``*.txt`` or gzipped
(``*.gz`` — the reference's reprocessing source replays gzipped NDJSON
backups, ``reprocessing-worker/main.go:336-430``).

Usage::

    register_topic_source(spark)
    df = spark.read.format("bulker_topic").load("/path/to/topic")
    stream = spark.readStream.format("bulker_topic") \
        .option("maxLinesPerTrigger", 10000).load("/path/to/topic")
"""

from __future__ import annotations

import gzip
import os
from dataclasses import dataclass
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

SCHEMA = "value string, _segment string, _offset bigint"

_EXTENSIONS = (".ndjson", ".jsonl", ".json", ".txt", ".gz")


def _segments(path: str) -> list[str]:
    """Segment file names, sorted (Kafka log order = name order)."""
    if not os.path.isdir(path):
        raise FileNotFoundError(f"topic directory not found: {path}")
    return sorted(
        f
        for f in os.listdir(path)
        if f.endswith(_EXTENSIONS) and not f.startswith(("_", "."))
    )


def _open(path: str):
    if path.endswith(".gz"):
        return gzip.open(path, "rt", encoding="utf-8")
    return open(path, encoding="utf-8")


def _count_lines(path: str) -> int:
    with _open(path) as fh:
        return sum(1 for _ in fh)


@dataclass
class SegmentSlice(InputPartition):
    """A (segment, line-range) slice — must be picklable (ships to
    executors)."""

    path: str
    segment: str
    start: int
    end: int


def _read_slice(p: SegmentSlice) -> Iterator[tuple]:
    with _open(os.path.join(p.path, p.segment)) as fh:
        for i, line in enumerate(fh):
            if i >= p.end:
                break
            if i >= p.start:
                yield (line.rstrip("\n"), p.segment, i)


class TopicBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("bulker_topic requires a path: .load(dir)")

    def partitions(self) -> Sequence[InputPartition]:
        return [
            SegmentSlice(self.path, s, 0, 2**62)
            for s in _segments(self.path)
        ]

    def read(self, partition: SegmentSlice) -> Iterator[tuple]:
        return _read_slice(partition)


class TopicStreamReader(DataSourceStreamReader):
    """Offset = {segment: lines_consumed}. Segments are immutable, so a
    fully-consumed segment's count never changes; only new segments (or
    a partially-consumed tail bounded by maxLinesPerTrigger) advance."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("bulker_topic requires a path: .load(dir)")
        self.max_lines = int(options.get("maxLinesPerTrigger", 0) or 0)
        # driver-side cache: segment → total line count (files are
        # immutable, count once)
        self._sizes: dict[str, int] = {}
        # last offset planned by latestOffset (rate-limit anchor)
        self._last: dict | None = None

    def _size(self, seg: str) -> int:
        if seg not in self._sizes:
            self._sizes[seg] = _count_lines(os.path.join(self.path, seg))
        return self._sizes[seg]

    def initialOffset(self) -> dict:
        return {}

    def latestOffset(self) -> dict:
        """High-watermark for the next micro-batch. Rate limiting happens
        HERE (as Kafka's maxOffsetsPerTrigger does): whatever this
        returns is recorded as consumed, so bounding later — in
        partitions() — would silently drop the truncated lines. The cap
        is applied against the last offset this reader planned; after a
        restart the first trigger is unbounded (the backlog since the
        checkpoint), matching availableNow catch-up semantics."""
        latest = {s: self._size(s) for s in _segments(self.path)}
        if self.max_lines > 0 and self._last is not None:
            budget = self.max_lines
            capped = dict(self._last)
            for seg in sorted(latest):
                lo = int(self._last.get(seg, 0))
                hi = int(latest[seg])
                take = min(max(hi - lo, 0), max(budget, 0))
                capped[seg] = lo + take
                budget -= take
            latest = capped
        self._last = dict(latest)
        return latest

    def partitions(
        self, start: dict, end: dict
    ) -> Sequence[InputPartition]:
        return [
            SegmentSlice(self.path, seg, int(start.get(seg, 0)), int(end[seg]))
            for seg in sorted(end)
            if int(end[seg]) > int(start.get(seg, 0))
        ]

    def read(self, partition: SegmentSlice) -> Iterator[tuple]:
        return _read_slice(partition)

    def commit(self, end: dict) -> None:  # offsets live in the checkpoint
        pass

    def stop(self) -> None:
        pass


@dataclass
class SegmentCommit(WriterCommitMessage):
    """Temp file written by one task, pending the driver's commit rename."""

    tmp_name: str
    final_name: str


class TopicWriter(DataSourceWriter):
    """Produce side: each task writes its rows' ``value`` column into a
    hidden temp file; the DRIVER renames all temp files to visible
    segments only when every task succeeded — an all-or-nothing publish
    (readers skip ``.``/``_``-prefixed files, so a crashed job leaves no
    partial segment visible). This is the reference's transactional
    produce (Kafka transactions around the batch,
    ``batch_consumer.go:269-401``) in file form."""

    def __init__(self, options: dict, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("bulker_topic requires a path: .save(dir)")
        self.overwrite = overwrite

    def write(self, iterator) -> SegmentCommit:
        import uuid as _uuid

        from pyspark import TaskContext

        part = TaskContext.get().partitionId()
        token = _uuid.uuid4().hex
        final = f"seg-{token}-{part:05d}.ndjson"
        tmp = f".{final}.tmp"
        os.makedirs(self.path, exist_ok=True)
        n = 0
        with open(os.path.join(self.path, tmp), "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write((row["value"] or "") + "\n")
                n += 1
        if n == 0:  # no empty segments
            os.remove(os.path.join(self.path, tmp))
            return SegmentCommit("", "")
        return SegmentCommit(tmp, final)

    def commit(self, messages) -> None:
        if self.overwrite:
            for seg in _segments(self.path):
                os.remove(os.path.join(self.path, seg))
        for m in messages:
            if m and m.tmp_name:
                os.rename(
                    os.path.join(self.path, m.tmp_name),
                    os.path.join(self.path, m.final_name),
                )

    def abort(self, messages) -> None:
        for m in messages:
            if m and m.tmp_name:
                try:
                    os.remove(os.path.join(self.path, m.tmp_name))
                except OSError:
                    pass


class TopicStreamWriter(DataSourceStreamWriter):
    """Streaming produce: each micro-batch publishes its segments with
    the same tmp-write + driver-rename discipline as the batch writer,
    with the epoch id in the segment name — re-publishing an epoch after
    a restart overwrites the same names instead of duplicating (the
    at-least-once retry becomes idempotent at the file level)."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("bulker_topic requires a path: .save(dir)")

    def write(self, iterator) -> "SegmentCommit":
        from pyspark import TaskContext

        ctx = TaskContext.get()
        part = ctx.partitionId()
        # streaming epochs carry the batch id via a job-local property;
        # fall back to a unique token if the runtime doesn't expose it
        # (losing only the file-name idempotency, not correctness)
        epoch = ctx.getLocalProperty("streaming.sql.batchId")
        if epoch is not None:
            final = f"seg-e{int(epoch):010d}-{part:05d}.ndjson"
        else:
            import uuid as _uuid

            final = f"seg-{_uuid.uuid4().hex}-{part:05d}.ndjson"
        tmp = f".{final}.tmp"
        os.makedirs(self.path, exist_ok=True)
        n = 0
        with open(os.path.join(self.path, tmp), "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write((row["value"] or "") + "\n")
                n += 1
        if n == 0:
            os.remove(os.path.join(self.path, tmp))
            return SegmentCommit("", "")
        return SegmentCommit(tmp, final)

    def commit(self, messages, batchId: int) -> None:
        for m in messages:
            if m and m.tmp_name:
                os.replace(
                    os.path.join(self.path, m.tmp_name),
                    os.path.join(self.path, m.final_name),
                )

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m and m.tmp_name:
                try:
                    os.remove(os.path.join(self.path, m.tmp_name))
                except OSError:
                    pass


class NdjsonTopicDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "bulker_topic"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> TopicBatchReader:
        return TopicBatchReader(self.options)

    def streamReader(self, schema) -> TopicStreamReader:
        return TopicStreamReader(self.options)

    def writer(self, schema, overwrite: bool) -> TopicWriter:
        if "value" not in [f.name for f in schema.fields]:
            raise ValueError(
                "bulker_topic writes require a 'value' string column"
            )
        return TopicWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> TopicStreamWriter:
        if "value" not in [f.name for f in schema.fields]:
            raise ValueError(
                "bulker_topic writes require a 'value' string column"
            )
        return TopicStreamWriter(self.options)


def register_topic_source(spark) -> None:
    """Register the ``bulker_topic`` format on this session (idempotent)."""
    spark.dataSource.register(NdjsonTopicDataSource)


def ensure_active_session(spark) -> None:
    """Pin ``spark`` as the JVM-side active session for the CURRENT
    thread. The JVM's active session is thread-local; a fresh Python
    thread (HTTP handler, background job) maps to a JVM thread with no
    active session, and the batch ``DataFrameWriter.save`` path resolves
    registered *Python* data sources through the active session — so a
    ``.write.format("bulker_topic")`` from such a thread fails with
    DATA_SOURCE_NOT_FOUND even though the session object is the right
    one. No-op when pinning isn't available (Spark Connect)."""
    try:
        spark._jvm.org.apache.spark.sql.classic.SparkSession.setActiveSession(
            spark._jsparkSession
        )
    except Exception:
        try:  # pre-4.x class location
            spark._jvm.org.apache.spark.sql.SparkSession.setActiveSession(
                spark._jsparkSession
            )
        except Exception:
            pass  # Connect: no JVM handle; resolution is server-side
