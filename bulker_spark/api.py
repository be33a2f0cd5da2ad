"""Public API: Engine + streams, the BulkerStream-equivalent surface.

Reference API (``/root/reference/bulkerlib/bulker.go:24-101``):
``CreateBulker(Config) → CreateStream(id, table, mode, options...) →
Consume/ConsumeJSON/ConsumeMap → Complete/Abort``; four modes
(``stream, batch, replace_table, replace_partition``) and the option surface
of ``bulkerlib/options.go:185-209`` + ``implementations/sql/options.go:12-83``.

Spark mapping: a stream accumulates events (or accepts a whole DataFrame),
``complete()`` runs the normalize → dedup → load pipeline once per batch —
exactly the reference's transactional batch lifecycle, with the warehouse
version-swap as the commit.
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass, field
from typing import Any, Iterable

from pyspark.sql import DataFrame, SparkSession

from .ingest import cast_to_existing, ingest_json
from .naming import IdentifierAdapter
from .operators.dedup import (
    ORDER_COLUMN,
    dedup_discriminator_agg,
    dedup_last_wins_agg,
    with_sequence,
)
from .operators.merge import MergeWindow, batch_min_timestamp
from .schema import SchemaPolicy
from .sinks.warehouse import Warehouse
from .table import TableMeta

PARTITION_ID_COLUMN = "__partition_id"  # delete_condition.go:10
TS_PARTITION_COLUMN = "__ts_partition"  # derived time-partition column

MODES = ("stream", "batch", "replace_table", "replace_partition", "scd2")


@dataclass
class StreamOptions:
    """The public knob surface (SURVEY §2.14)."""

    mode: str = "batch"
    primary_key: list[str] = field(default_factory=list)
    deduplicate: bool = False
    discriminator_field: list[str] = field(default_factory=list)
    timestamp_column: str | None = None
    partition_id: str | None = None
    namespace: str | None = None
    to_same_case: str = "none"  # none|lower|upper
    omit_nils: bool = True
    schema_freeze: bool = False
    max_columns_count: int = 5000
    deduplicate_window: int = 365  # days
    batch_size: int = 10_000
    # remaining knob surface (bulkerlib/options.go:185-209,
    # implementations/sql/options.go:12-83):
    batch_size_bytes: int = 0  # maxBytesPerTrigger on the streaming front
    frequency: float = 300.0  # seconds between micro-batches (period)
    retry_batch_size: int = 0  # 0 → batch_size // 10, app_config.go:61-64
    retry_frequency: float | None = None  # defaults to frequency
    # flush driver-buffered events in sub-batches of this size (the
    # reference's temporary-batch flush bounds memory the same way,
    # abstract_transactional.go:78-93); 0 = single batch. The DataFrame
    # consume path never buffers on the driver, so this only applies to
    # consume()/consume_json() event lists.
    temporary_batch_size: int = 0
    # parsed and passed through to connectors, never interpreted here —
    # exactly the reference's behavior (bulkerlib/options.go:168-183)
    functions_env: dict[str, str] = field(default_factory=dict)
    # deterministic per-table schedule jitter (options.go:122-127); the
    # streaming front applies spread_offset_seconds when True
    spread_tables_schedule: bool = False
    # no-op on Spark: every load already lands in a new immutable version
    # (there is no tmp table to disable), kept for option parity
    disable_temporary_tables: bool = False
    frozen_now: _dt.datetime | None = None  # test clock
    # fixed-schema pinning (WithSchema option, bulkerlib/options.go:149-166):
    # {column: sql_type_hint or DataType}; pinned columns are created up
    # front and their types are not overridable by inference ("Important").
    schema: dict[str, Any] = field(default_factory=dict)
    # per-column SQL-type overrides (columnTypes option,
    # implementations/sql/options.go:13-39) — merged with ``schema`` pins;
    # ``schema`` wins on conflict (Important beats override)
    column_types: dict[str, Any] = field(default_factory=dict)
    # identifier adaptation for destination-safe column names
    # (table_helper.go:367-458); parquet/Spark forbid " ,;{}()=" etc.
    adapt_identifiers: bool = True
    max_identifier_length: int = 255
    # time-partitioned tables (BigQuery TimePartitioning / CH PARTITION BY
    # toYYYYMM, SURVEY §2.10): HOUR|DAY|MONTH|QUARTER|YEAR over
    # timestamp_column; enables partition pruning for the merge window.
    timestamp_partition: str | None = None
    # store JSON escape-hatch columns (arrays / unflattened objects /
    # _unmapped_data) as Spark 4 VARIANT instead of JSON text — the
    # SURVEY §1.2 "VariantType on Spark 4" mapping. Path reads then use
    # variant_get without re-parsing text. The table's storage choice is
    # recorded in its metadata and later batches are coerced to it.
    # Native-warehouse tables only; JDBC destinations keep JSON text
    # (their type maps expect jsonb/super/JSON strings).
    json_as_variant: bool = False
    # scd2 mode: attributes whose change closes the current version and
    # opens a new one; empty → every non-PK, non-internal batch column
    scd2_tracked: list[str] = field(default_factory=list)
    # hash-bucketed table layout (Hudi bucket-index style, native
    # warehouse only): rows land under __bucket = pmod(xxhash64(*pk), n)
    # partitions, so deduplicating merges read and rewrite ONLY the
    # buckets containing batch keys — per-merge cost scales with touched
    # buckets, not table size. 0 = unbucketed. Requires primary_key.
    bucket_by: int = 0
    # range-clustered layout on the primary key (persisted cluster_cols,
    # native warehouse only): rewrites re-apply repartitionByRange, so
    # footer min/max stats stay prunable, merges scope to the files whose
    # key range a batch touches (stats-scoped partial rewrite — the
    # unbucketed analogue of bucket_by), and the change feed slices its
    # diffs. Mutually exclusive with bucket_by. Requires primary_key.
    cluster: bool = False
    # merge-on-read table type (Hudi MoR style, native warehouse only):
    # merges APPEND sequence-stamped delta files in O(batch) instead of
    # rewriting; reads reconcile per-PK last-wins; compact() folds. For
    # write-heavy trickle upserts. Note: every write to an MoR table is an
    # upsert and the merge-window shrink does not apply — use CoW when
    # window-bounded dedup semantics matter. Requires primary_key.
    merge_on_read: bool = False
    # fold MoR deltas automatically after this many delta commits
    # (0 = manual compact() only)
    mor_compact_every: int = 0
    # data-quality gate on every batch (functions/profile.py Check list):
    # "fail" aborts the load on any violation (streaming front then
    # retries/dead-letters the batch), "drop" filters violating rows out
    # (row-level checks only) and counts them in StreamResult.rejected_rows,
    # "warn" records violation counts in warehouse_state without blocking
    expectations: list = field(default_factory=list)
    expectations_policy: str = "fail"  # fail | drop | warn

    def policy(self) -> SchemaPolicy:
        return SchemaPolicy(self.schema_freeze, self.max_columns_count)

    def pinned_types(self):
        from .schema import hint_to_type
        from .types_lattice import DataType

        out = {}
        for name, t in {**self.column_types, **self.schema}.items():
            out[name] = t if isinstance(t, DataType) else hint_to_type(str(t))
        return out


@dataclass
class StreamResult:
    """BulkerStream state counters (bulker.go:152-265)."""

    processed_rows: int = 0
    successful_rows: int = 0
    # malformed JSON events dropped (JVM-side validation) — the batch
    # keeps loading, mirroring the reference's per-event consume errors
    # (bulker.go:152-265 failed vs successful counters)
    malformed_rows: int = 0
    # rows dropped by an expectations_policy="drop" quality gate
    rejected_rows: int = 0
    table: TableMeta | None = None
    error: str | None = None
    # per-step wall-clock ms, the WarehouseState analogue
    # (bulker.go:169-176, abstract_transactional.go:236-244):
    # consume_convert = ingest/normalize/dedup compute (forced at persist),
    # then one of load / merge / replace_table / replace_partition.
    warehouse_state: dict[str, float] = field(default_factory=dict)


class BulkerStream:
    def __init__(self, engine: "Engine", table: str, options: StreamOptions):
        self.engine = engine
        self.table = table
        self.options = options
        self._events: list[Any] = []
        self._df: DataFrame | None = None
        self._json_df: DataFrame | None = None
        self._aborted = False
        if options.mode not in MODES:
            raise ValueError(f"unknown mode {options.mode!r}")

    # Consume surface -------------------------------------------------------
    def consume(self, event: dict[str, Any]) -> None:
        self._events.append(event)
        self._maybe_flush()

    def consume_json(self, line: str | bytes) -> None:
        self._events.append(line.decode() if isinstance(line, bytes) else line)
        self._maybe_flush()

    def consume_map(self, event: dict[str, Any]) -> None:
        self._events.append(event)
        self._maybe_flush()

    def _maybe_flush(self) -> None:
        tbs = self.options.temporary_batch_size
        if tbs and len(self._events) >= tbs:
            self._flush_events()

    def _flush_events(self) -> None:
        """Move the driver-buffered event list into a JVM DataFrame — the
        temporary-batch flush (abstract_transactional.go:78-93): the Python
        buffer stays bounded at ``temporary_batch_size``; the final load
        still commits all flushed chunks in one transaction."""
        if not self._events:
            return
        import json as _json

        lines = [
            e if isinstance(e, str) else _json.dumps(e, ensure_ascii=False, default=str)
            for e in self._events
        ]
        df = self.engine.spark.createDataFrame([(x,) for x in lines], "value string")
        self.consume_dataframe_json(df)
        self._events = []

    def consume_dataframe(self, df: DataFrame) -> None:
        """Spark-native consume: hand a whole DataFrame to the stream
        (the 100 TB path — no driver-side buffering)."""
        self._df = df if self._df is None else self._df.unionByName(
            df, allowMissingColumns=True
        )

    def consume_dataframe_json(self, json_df: DataFrame) -> None:
        """Distributed raw-JSON consume: a one-string-column DataFrame of
        JSON events goes through the full flatten/infer/unify path without
        touching the driver."""
        self._json_df = (
            json_df
            if self._json_df is None
            else self._json_df.unionByName(json_df)
        )

    def abort(self) -> StreamResult:
        self._aborted = True
        return StreamResult()

    def complete(self) -> StreamResult:
        if self._aborted:
            return StreamResult()
        if self._json_df is not None and self._events:
            self._flush_events()  # don't strand the tail of the buffer
        return self.engine._load(
            self.table, self._events, self._df, self._json_df, self.options
        )


class Engine:
    """Top-level entry: ``Engine(spark, warehouse_path)``."""

    def __init__(
        self,
        spark: SparkSession,
        warehouse_path: str,
        namespace: str = "default",
        retain_versions: int = 1,
        link_mode: str = "hardlink",
    ):
        self.spark = spark
        self.warehouse = Warehouse(
            spark,
            warehouse_path,
            namespace,
            retain_versions=retain_versions,
            link_mode=link_mode,
        )
        # (session-tag, ns, table, commit) → full-read DataFrame. A
        # DataFrame is an immutable plan over an explicit file manifest,
        # so reuse across sql() calls is sound; the commit id in the key
        # invalidates on every table write. Building the plan costs
        # O(files) driver work (the file index), which repeated queries
        # shouldn't re-pay.
        self._view_cache: dict[tuple, DataFrame] = {}
        # isolated session for phase-2 pruned re-planning (see sql()):
        # pruned temp views registered there are invisible to every other
        # consumer of the main session — no exposure window, no restore
        import threading

        self._prune_session = None
        self._prune_lock = threading.Lock()

    def _cached_read(
        self, tag: str, table: str, ns: str, wh, at: int | None = None
    ) -> DataFrame:
        """``at`` pins the read to a specific commit (time-travel path)
        instead of the live snapshot — raises FileNotFoundError if that
        snapshot was vacuumed; callers treat that as "fall back"."""
        at = at or None  # commit 0 = "no commits yet": nothing to pin
        cur = at if at is not None else self.warehouse._last_commit_id(table, ns)
        key = (tag, ns, table, cur)
        df = self._view_cache.get(key)
        if df is None:
            df = wh.read(table, ns, version=at)
            self._view_cache = {
                k: v
                for k, v in self._view_cache.items()
                if k[:3] != (tag, ns, table)
            }
            self._view_cache[key] = df
        return df

    def _snapshot_df(self, table: str, ns: str) -> DataFrame:
        return self._cached_read("main", table, ns, self.warehouse)

    def _prune_sess(self):
        """The phase-2 session, lazily created; a new session starts from
        DEFAULT SQL conf, so every explicitly-set conf of the main
        session (timezone, shuffle partitions, AQE, ...) is copied on
        each use — conf drift between the two plans would change
        semantics, not just speed."""
        if self._prune_session is None:
            self._prune_session = self.spark.newSession()
        for row in self.spark.sql("SET").collect():
            try:
                self._prune_session.conf.set(row["key"], row["value"])
            except Exception:
                continue  # static/unsettable conf
        return self._prune_session

    def create_stream(self, table: str, **options: Any) -> BulkerStream:
        return BulkerStream(self, table, StreamOptions(**options))

    def _retry_occ(self, table: str, ns: str | None, fn, attempts: int = 5):
        """OCC retry discipline shared by every warehouse write mode: a
        concurrent writer's commit fails OURS (never silently drops
        theirs); the batch df is persisted and deterministic, so
        refresh-and-reapply is safe and idempotent. 5 attempts: two
        writers need one refresh each in the worst interleave, but a
        loaded host can stack several stale reads before a claim lands
        (observed under a saturated local[32])."""
        from .sinks.warehouse import ConcurrentWriteError

        for attempt in range(attempts):
            try:
                return fn()
            except ConcurrentWriteError:
                if attempt == attempts - 1:
                    raise
                self.warehouse.refresh(table, ns)

    # the full load pipeline ------------------------------------------------
    def _load(
        self,
        table: str,
        events: list[Any],
        df: DataFrame | None,
        json_df: DataFrame | None,
        opt: StreamOptions,
    ) -> StreamResult:
        """Pin the raw JSON source in the block cache for the load's
        duration: the pipeline scans it three times (validity counters,
        header inference, normalize-at-persist), and when the frame comes
        from a streaming micro-batch each uncached scan re-reads and
        re-parses the source files — measured 2.3× the whole load."""
        if df is None and json_df is None and events:
            # one path for every JSON source: list → JVM DataFrame so
            # validation and normalize are uniform (and cacheable — a
            # parallelized driver collection re-ships per uncached scan)
            import json as _json

            lines = [
                e if isinstance(e, str)
                else _json.dumps(e, ensure_ascii=False, default=str)
                for e in events
            ]
            json_df = self.spark.createDataFrame(
                [(x,) for x in lines], "value string"
            )
            events = []
        persisted_src = None
        if json_df is not None:
            # A small-file source (one NDJSON file → 1-3 scan splits) would
            # run the two Python parse passes (header inference, normalize)
            # nearly serial; spread the lines across the executor cores
            # first. Well-partitioned big batches skip the shuffle. Line
            # order is load-bearing twice over — last-wins dedup AND
            # first-seen column order in header inference — so the arrival
            # stamp is taken BEFORE the shuffle and the redistribution is
            # RANGE-partitioned + sorted on it: partition p holds a
            # contiguous, internally-ordered slice of the original line
            # sequence, which keeps the header's (partition, batch)-order
            # merge exactly first-seen and is deterministic regardless of
            # shuffle fetch order. The stamp also rides through normalize
            # as a carry column for the dedup step.
            from pyspark.sql import functions as F

            # Size the redistribution to the BATCH, not the machine (r09,
            # guide §2.2/§6 and the r08 scaling block: the 100k-row tiers
            # ANTI-scaled — 32-way fan-out of a ~10 MB batch is pure
            # task-launch overhead, measured 0.26 c8/c32 ratio). Target =
            # ceil(batch bytes / spark.bulker.ingest.bytesPerTask), capped
            # at defaultParallelism — big batches keep full parallelism,
            # tiny ones stop paying 32 tasks per downstream stage. Falls
            # back to full parallelism when the size is unknowable.
            target = self.spark.sparkContext.defaultParallelism
            try:
                bpt = int(
                    self.spark.conf.get(
                        "spark.bulker.ingest.bytesPerTask", str(4 << 20)
                    )
                    or (4 << 20)
                )
            except ValueError:
                bpt = 4 << 20
            est = None
            try:
                files = json_df.inputFiles()
                if files:
                    import os
                    import urllib.parse as _up
                    import urllib.request as _ur

                    est = 0
                    for f in files:
                        p = _up.urlparse(f)
                        if p.scheme in ("", "file"):
                            est += os.path.getsize(_ur.url2pathname(p.path))
                        else:  # non-local source: size unknowable cheaply
                            est = None
                            break
            except Exception:
                est = None
            if est is not None and bpt > 0:
                target = max(1, min(target, -(-est // bpt)))
            if (
                len(json_df.columns) == 1
                and json_df.rdd.getNumPartitions() < target
            ):
                json_df = (
                    json_df.withColumn(
                        ORDER_COLUMN, F.monotonically_increasing_id()
                    )
                    .repartitionByRange(target, F.col(ORDER_COLUMN))
                    .sortWithinPartitions(ORDER_COLUMN)
                )
            json_df = json_df.persist()
            persisted_src = json_df
        try:
            return self._load_impl(table, events, df, json_df, opt)
        finally:
            if persisted_src is not None:
                persisted_src.unpersist()

    def _load_impl(
        self,
        table: str,
        events: list[Any],
        df: DataFrame | None,
        json_df: DataFrame | None,
        opt: StreamOptions,
    ) -> StreamResult:
        ns = opt.namespace
        meta = self.warehouse.get_meta(table, ns)
        existing: dict | None = None
        if meta is not None and opt.mode in ("batch", "stream", "scd2"):
            existing = dict(meta.columns)
            if opt.mode == "scd2":
                from .operators import scd2 as _scd2

                for c in (_scd2.VALID_FROM, _scd2.VALID_TO, _scd2.IS_CURRENT):
                    existing.pop(c, None)
        pinned = opt.pinned_types()
        if pinned:
            existing = existing or {}
            for name, t in pinned.items():
                existing.setdefault(name, t)

        adapter = (
            IdentifierAdapter(max_len=opt.max_identifier_length, case=opt.to_same_case)
            if opt.adapt_identifiers
            else None
        )

        malformed = 0
        carry: tuple[str, ...] = ()
        if df is None:
            if json_df is not None:
                # JVM-side validation: drop unparseable lines, count them,
                # keep loading (the reference's per-event consume errors)
                from pyspark.sql import functions as F

                col0 = json_df.columns[0]
                valid = F.get_json_object(F.col(col0), "$").isNotNull()
                # one scan for both counters (not one per count: at batch
                # sizes where the input doesn't fit in page cache, each
                # .count() is a full re-read)
                stats = json_df.agg(
                    F.count("*").alias("t"),
                    F.count(F.when(valid, 1)).alias("v"),
                ).collect()[0]
                malformed = int(stats["t"]) - int(stats["v"])
                if int(stats["v"]) == 0:
                    # every line malformed: nothing to load — do NOT run
                    # inference on the empty frame (it would create/commit
                    # a degenerate table); the caller dead-letters via
                    # malformed_rows
                    return StreamResult(
                        processed_rows=malformed,
                        malformed_rows=malformed,
                        table=meta,
                    )
                json_df = json_df.filter(valid)
            source: Any = json_df if json_df is not None else events
            if json_df is None and not events:
                return StreamResult(table=meta)
            if (
                json_df is not None
                and ORDER_COLUMN in json_df.columns
            ):
                carry = (ORDER_COLUMN,)
            df, header = ingest_json(
                self.spark,
                source,
                existing_types=existing,
                policy=opt.policy(),
                omit_nils=opt.omit_nils,
                case=opt.to_same_case,
                adapter=adapter,
                carry_cols=carry,
            )
            batch_types = {n: s.data_type for n, s in header.columns.items()}
        elif existing:
            df = cast_to_existing(df, existing)
            batch_types = dict(existing)
        else:
            batch_types = {}

        if opt.json_as_variant:
            from .ingest import json_columns_to_variant

            df = json_columns_to_variant(df, batch_types)

        # data-quality gate (deequ-style circuit breaker) ahead of dedup:
        # violations are decided on normalized rows, one aggregation pass
        rejected = 0
        check_state: dict[str, float] = {}
        if opt.expectations:
            from pyspark.sql import functions as F

            from .functions.profile import run_checks, violation_condition

            policy = opt.expectations_policy
            if policy == "drop":
                conds = [violation_condition(c) for c in opt.expectations]
                bad = conds[0]
                for c in conds[1:]:
                    bad = bad | c
                before = df.count()
                df = df.filter(~F.coalesce(bad, F.lit(False)))
                rejected = before - df.count()
            else:
                results = run_checks(df, opt.expectations).collect()
                for r in results:
                    check_state[f"check_{r['check']}_violations"] = float(
                        r["violations"]
                    )
                failed = [r["check"] for r in results if not r["passed"]]
                if failed and policy == "fail":
                    raise ValueError(
                        f"quality expectations failed: {', '.join(failed)}"
                    )
                if policy not in ("fail", "warn"):
                    raise ValueError(
                        f"unknown expectations_policy {policy!r}"
                    )

        # arrival order must be pinned BEFORE any shuffle — when the load
        # wrapper repartitioned a narrow source, the stamp was taken on the
        # pre-shuffle line order and carried through normalize. If the data
        # itself has a __seq column it lands in batch_types and normalize
        # drops the carry (data wins) — then the column holds USER values
        # and must be treated as data, not as the stamp.
        carried_seq = (
            bool(carry)
            and ORDER_COLUMN in df.columns
            and ORDER_COLUMN not in batch_types
        )
        if opt.deduplicate and opt.primary_key:
            if not carried_seq:
                df = with_sequence(df)
            if opt.discriminator_field:
                df = dedup_discriminator_agg(
                    df, opt.primary_key, opt.discriminator_field
                )
            else:
                df = dedup_last_wins_agg(df, opt.primary_key)
            df = df.drop(ORDER_COLUMN)
        elif carried_seq:
            df = df.drop(ORDER_COLUMN)

        # time-partitioned table: derive the partition column before write
        ts_part: list[str] | None = None
        if opt.timestamp_partition and opt.timestamp_column:
            from pyspark.sql import functions as F

            from .operators.filters import truncate_granularity

            fmt = {
                "HOUR": "yyyy-MM-dd-HH",
                "DAY": "yyyy-MM-dd",
                "MONTH": "yyyy-MM",
                "QUARTER": "yyyy-MM",
                "YEAR": "yyyy",
            }[opt.timestamp_partition.upper()]
            df = df.withColumn(
                TS_PARTITION_COLUMN,
                F.date_format(
                    truncate_granularity(
                        F.col(opt.timestamp_column), opt.timestamp_partition
                    ),
                    fmt,
                ),
            )
            ts_part = [TS_PARTITION_COLUMN]

        # materialize the batch once: the merge path consumes it twice
        # (anti-join + union) and normalize runs Python — don't pay it 2×
        import time as _time

        _t0 = _time.time()
        df = df.persist()
        persisted_batch = df  # replace_partition rebinds df below; the
        # unpersist at the end must target the frame actually cached
        processed = df.count()
        state = {"consume_convert_ms": round((_time.time() - _t0) * 1000, 1)}
        _t0 = _time.time()

        if opt.mode == "replace_partition":
            if not opt.partition_id:
                raise ValueError("replace_partition requires partition_id")
            from pyspark.sql import functions as F

            rp_df = df.withColumn(PARTITION_ID_COLUMN, F.lit(opt.partition_id))
            # replace_partition commits under OCC (snapshot-isolated
            # rewrite); a racing append/merge fails OUR commit cleanly
            meta = self._retry_occ(
                table,
                ns,
                lambda: self.warehouse.replace_partition(
                    table,
                    rp_df,
                    partition_column=PARTITION_ID_COLUMN,
                    namespace=ns,
                    pk=opt.primary_key,
                    timestamp_column=opt.timestamp_column,
                ),
            )
        elif opt.mode == "replace_table":
            meta = self.warehouse.create_or_replace(
                table,
                df,
                pk=opt.primary_key,
                timestamp_column=opt.timestamp_column,
                partition_by=ts_part,
                namespace=ns,
                bucket_by=(
                    (opt.primary_key, opt.bucket_by)
                    if opt.bucket_by and opt.primary_key
                    else None
                ),
                cluster_by=(
                    list(opt.primary_key)
                    if opt.cluster and opt.primary_key and not opt.bucket_by
                    else None
                ),
            )
        elif opt.mode == "scd2":
            # history-preserving upsert: close-on-change + versioned open
            # (operators/scd2.py). The current slice joins the broadcast
            # batch; closed history is carried untouched. __is_current
            # partitions the table so `scd2_current` reads prune to the
            # live slice.
            if not opt.primary_key:
                raise ValueError("scd2 mode requires primary_key")
            from .operators.scd2 import (
                IS_CURRENT,
                scd2_apply,
                scd2_init,
            )

            eff: Any = (
                opt.timestamp_column
                if opt.timestamp_column and opt.timestamp_column in df.columns
                else (opt.frozen_now or _dt.datetime.utcnow())
            )
            tracked = opt.scd2_tracked or [
                c
                for c in df.columns
                if c not in opt.primary_key
                and not c.startswith("__")
                and c != opt.timestamp_column
            ]
            if meta is None:
                dim = scd2_init(df, opt.primary_key, eff)
            else:
                dim = scd2_apply(
                    self.warehouse.read(table, namespace=ns),
                    df,
                    opt.primary_key,
                    tracked,
                    eff,
                )
            meta = self.warehouse.create_or_replace(
                table,
                dim,
                pk=opt.primary_key,
                timestamp_column=opt.timestamp_column,
                partition_by=[IS_CURRENT],
                namespace=ns,
            )
        elif opt.primary_key and opt.deduplicate:
            now = opt.frozen_now or _dt.datetime.utcnow()
            window_days = None
            if opt.timestamp_column:
                min_ts = batch_min_timestamp(df, opt.timestamp_column)
                window_days = MergeWindow(opt.deduplicate_window).effective_days(
                    min_ts, now
                )
            meta = self._retry_occ(
                table,
                ns,
                lambda: self.warehouse.merge(
                    table,
                    df,
                    opt.primary_key,
                    timestamp_column=opt.timestamp_column,
                    window_days=window_days,
                    now=now,
                    namespace=ns,
                    partition_by=ts_part,
                    bucket_by=(
                        (opt.primary_key, opt.bucket_by)
                        if opt.bucket_by
                        else None
                    ),
                    merge_on_read=opt.merge_on_read,
                    cluster_by=(
                        list(opt.primary_key)
                        if opt.cluster and not opt.bucket_by
                        else None
                    ),
                ),
            )
            if (
                opt.mor_compact_every
                and meta is not None
                and meta.write_mode == "mor"
                and meta.mor_deltas >= opt.mor_compact_every
            ):
                self.warehouse.compact(table, namespace=ns)
        else:
            # appends are commutative but can still lose an OCC race when
            # a replace/compact swaps the version dir mid-append
            meta = self._retry_occ(
                table,
                ns,
                lambda: self.warehouse.append(
                    table,
                    df,
                    pk=opt.primary_key,
                    timestamp_column=opt.timestamp_column,
                    partition_by=ts_part,
                    namespace=ns,
                    bucket_by=(
                        (opt.primary_key, opt.bucket_by)
                        if opt.bucket_by and opt.primary_key
                        else None
                    ),
                ),
            )

        step = {
            "replace_partition": "replace_partition_ms",
            "replace_table": "replace_table_ms",
            "scd2": "scd2_ms",
        }.get(opt.mode, "merge_ms" if opt.primary_key and opt.deduplicate else "load_ms")
        state[step] = round((_time.time() - _t0) * 1000, 1)

        persisted_batch.unpersist()
        state.update(check_state)
        return StreamResult(
            processed_rows=processed + malformed + rejected,
            successful_rows=processed,
            malformed_rows=malformed,
            rejected_rows=rejected,
            table=meta,
            warehouse_state=state,
        )

    # convenience bulk API (router.go:220-321 /bulk) ------------------------
    def bulk_load(
        self,
        table: str,
        source: DataFrame | Iterable[Any] | str,
        **options: Any,
    ) -> StreamResult:
        options.setdefault("mode", "replace_table")
        stream = self.create_stream(table, **options)
        if isinstance(source, DataFrame):
            stream.consume_dataframe(source)
        elif isinstance(source, str):
            # path/glob → distributed text read (gzip handled natively);
            # lines never pass through the driver
            lines_df = (
                self.spark.read.text(source)
                .filter("length(trim(value)) > 0")
            )
            stream.consume_dataframe_json(lines_df)
        else:
            for ev in source:
                if isinstance(ev, (str, bytes)):
                    stream.consume_json(ev)
                else:
                    stream.consume(ev)
        return stream.complete()

    def read_changes(
        self,
        table: str,
        since_commit: int,
        namespace: str | None = None,
        to_commit: int | None = None,
    ) -> DataFrame:
        """Row-level change data feed after ``since_commit`` — see
        :meth:`Warehouse.read_changes`. The CDC consumption loop:
        checkpoint the head commit from ``warehouse.history()``, call this
        per cycle, feed the result to a downstream merge/trainer."""
        return self.warehouse.read_changes(
            table, since_commit, namespace=namespace, to_commit=to_commit
        )

    def stream_changes(
        self,
        table: str,
        namespace: str | None = None,
        starting_commit: int | str = "latest",
        max_commits_per_trigger: int = 50,
    ) -> DataFrame:
        """The change feed as a Structured Streaming source (Delta CDF's
        streaming ``readChangeFeed``): a readStream DataFrame of live
        columns + ``__change_type`` + ``__change_commit``, offsets (=
        table commits) checkpointed by the query for exactly-once
        incremental consumption. See
        :mod:`bulker_spark.sources.changes_source` for semantics and the
        per-op partitioning strategy."""
        from .sources.changes_source import register_changes_source

        register_changes_source(self.spark)
        return (
            self.spark.readStream.format("bulker_changes")
            .option("path", self.warehouse.root)
            .option("table", table)
            .option("namespace", namespace or self.warehouse.namespace)
            .option("startingCommit", str(starting_commit))
            .option("maxCommitsPerTrigger", str(max_commits_per_trigger))
            .load()
        )

    def replicate_to(
        self,
        dst: "Engine",
        table: str,
        checkpoint: str,
        dst_table: str | None = None,
        transform=None,
        **start_kw,
    ):
        """Keep ``dst``'s copy of ``table`` converged via the streaming
        change feed: consistent snapshot bootstrap, then merge+delete per
        micro-batch, exactly-once across restarts (same ``checkpoint``).
        See :class:`bulker_spark.streaming.replicate.TableReplica`."""
        from .streaming.replicate import TableReplica

        return TableReplica(
            self, table, dst, dst_table=dst_table, transform=transform
        ).start(checkpoint, **start_kw)

    # query surface (Select/Count generalized; router.go:484-571's reads and
    # sql_adapter_base.go:228-297's Select/Count become full Spark SQL) -----
    def sql(
        self,
        query: str,
        namespace: str | None = None,
        auto_prune: bool = True,
    ) -> DataFrame:
        """Run Spark SQL over the warehouse's tables.

        Every table in the namespace is registered as a temp view (resolved
        through the commit pointer, so the query sees one consistent
        snapshot per view at registration time), then the query planned by
        Catalyst — predicate pushdown, broadcast selection, and AQE all
        apply to the warehouse files exactly as to any parquet scan.

        ``auto_prune`` adds manifest-level data skipping on top: the
        phase-1 plan's per-scan pushed-down filters (typed, post-optimizer
        — Catalyst already split BETWEENs, folded INs, pushed through
        joins) become per-table column bounds, and the query is re-planned
        over ``read(prune=...)`` manifests that drop files whose committed
        footer stats prove no match. Same rows, O(matching files) planning
        — see :mod:`bulker_spark.plans.sql_prune`. Falls back to the
        unpruned plan for tables where pruning is undefined (merge-on-read
        before compaction) or on any harvesting failure."""
        import re

        ns = namespace or self.warehouse.namespace
        tables = self.warehouse.list_tables(ns)
        # register only the tables the query names (word-boundary match) —
        # a 50-table namespace must not pay 50 meta reads per query; if
        # nothing matches (quoted/derived names) fall back to all
        wanted = [
            t
            for t in tables
            if re.search(rf"\b{re.escape(t)}\b", query, re.IGNORECASE)
        ]
        registered = wanted or tables
        # remember the commit each phase-1 view binds, so phase 2 can
        # re-read the SAME snapshot: rebinding at the live commit would
        # let a write landing between the phases silently swap the data
        # under the returned plan (docstring promise: one consistent
        # snapshot per view at registration time)
        commits: dict[str, int] = {}
        for t in registered:
            # bind phase 1 AT the recorded commit — a separate live read
            # here could bind c+1 after commits[t] recorded c (a writer
            # landing between the two calls), and phase 2 would then pin
            # an OLDER snapshot than the plan it must mirror. If the
            # pinned snapshot vanishes mid-registration (concurrent
            # replace + vacuum), re-resolve once at the new live commit
            # rather than failing the query the live path always served.
            # A pre-first-commit table (commit 0) has nothing to pin and
            # binds live, the pre-existing behavior.
            for _attempt in (0, 1):
                commits[t] = self.warehouse._last_commit_id(t, ns)
                try:
                    self._cached_read(
                        "main", t, ns, self.warehouse, at=commits[t]
                    ).createOrReplaceTempView(t)
                    break
                except FileNotFoundError:
                    if _attempt:
                        raise
        df = self.spark.sql(query)
        if not auto_prune:
            return df
        from .plans.sql_prune import prune_specs

        try:
            specs = prune_specs(
                df, {t: self.warehouse._table_dir(t, ns) for t in registered}
            )
        except Exception:
            specs = {}
        if not specs:
            return df
        # phase 2 runs in the ISOLATED prune session: a pruned view is a
        # predicate-specific artifact — registering it under the shared
        # name, even briefly, would let any concurrent reader of the main
        # session silently bind a filtered manifest. The lock covers only
        # registration + analysis (execution happens on the returned
        # DataFrame, outside); any phase-2 failure falls back to the
        # correct unpruned phase-1 plan.
        import copy

        try:
            with self._prune_lock:
                sess = self._prune_sess()
                wh = copy.copy(self.warehouse)
                wh.spark = sess
                pruned_any = False
                for t in registered:
                    # pin to the phase-1 commit; a vacuumed snapshot
                    # raises FileNotFoundError → outer except returns
                    # the (correct, unpruned) phase-1 plan
                    at = commits.get(t) or None
                    pv = None
                    if t in specs:
                        try:
                            pv = wh.read(t, ns, version=at, prune=specs[t])
                            pruned_any = True
                        except ValueError:  # MoR: pruning undefined
                            pv = None
                    if pv is None:
                        pv = self._cached_read("pruned", t, ns, wh, at=at)
                    pv.createOrReplaceTempView(t)
                if not pruned_any:
                    return df
                return sess.sql(query)  # analysis is eager: binds NOW
        except Exception:
            return df
