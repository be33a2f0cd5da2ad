"""Parquet-backed warehouse with versioned, atomically-swapped tables.

This is the engine's primary sink, standing in for the reference's SQL
warehouses (``/root/reference/bulkerlib/implementations/sql/sql_adapter.go:23-68``
— CreateTable / LoadTable / CopyTables / ReplaceTable / TruncateTable /
Delete / Select / Count / DropTable). Transactionality mirrors the
reference's tmp-table + single-commit discipline
(``abstract_transactional.go:152-206``):

- every write lands in a fresh ``v_<uuid>`` directory (the "tmp table")
- the table's ``_bulker_meta.json`` pointer is atomically renamed onto the
  new version only after the write succeeds ("commit")
- readers always resolve the pointer first, so they never observe a
  half-written version.

On a production cluster the same interface binds to Delta/Iceberg, whose
transaction log provides this natively (and MERGE/replaceWhere directly);
the versioned-directory scheme is the dependency-free equivalent with the
same atomicity and O(1) commit.

Partitioned tables (``partition_by``) write with **dynamic partition
overwrite** so replace_partition touches only the affected partition's files
— at 100 TB that is the difference between rewriting a table and rewriting a
day.
"""

from __future__ import annotations

import json as _json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema import UNMAPPED_DATA_COLUMN
from ..table import TableMeta
from ..types_lattice import DataType, from_spark_type

META_FILE = "_bulker_meta.json"


class Warehouse:
    def __init__(self, spark: SparkSession, root: str, namespace: str = "default"):
        self.spark = spark
        self.root = root
        self.namespace = namespace
        os.makedirs(root, exist_ok=True)
        # driver-side schema cache (table_helper.go:30-62)
        self._meta_cache: dict[str, TableMeta] = {}

    # -- paths -------------------------------------------------------------
    def _table_dir(self, name: str, namespace: str | None = None) -> str:
        return os.path.join(self.root, namespace or self.namespace, name)

    def _meta_path(self, name: str, namespace: str | None = None) -> str:
        return os.path.join(self._table_dir(name, namespace), META_FILE)

    # -- metadata ----------------------------------------------------------
    def get_meta(self, name: str, namespace: str | None = None) -> TableMeta | None:
        key = f"{namespace or self.namespace}.{name}"
        cached = self._meta_cache.get(key)
        if cached is not None:
            return cached
        path = self._meta_path(name, namespace)
        if not os.path.exists(path):
            return None
        with open(path) as fh:
            meta = TableMeta.from_json(_json.load(fh))
        self._meta_cache[key] = meta
        return meta

    def _commit_meta(self, meta: TableMeta) -> None:
        d = self._table_dir(meta.name, meta.namespace)
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".{META_FILE}.{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            _json.dump(meta.to_json(), fh)
        os.replace(tmp, os.path.join(d, META_FILE))  # atomic commit
        self._meta_cache[f"{meta.namespace}.{meta.name}"] = meta

    def exists(self, name: str, namespace: str | None = None) -> bool:
        return self.get_meta(name, namespace) is not None

    def list_tables(self, namespace: str | None = None) -> list[str]:
        d = os.path.join(self.root, namespace or self.namespace)
        if not os.path.isdir(d):
            return []
        return sorted(
            t for t in os.listdir(d) if os.path.exists(self._meta_path(t, namespace))
        )

    # -- IO ----------------------------------------------------------------
    def _schema_of(self, df: DataFrame) -> dict[str, DataType]:
        return {
            f.name: from_spark_type(f.dataType)
            for f in df.schema.fields
            if f.name != UNMAPPED_DATA_COLUMN
        }

    def read(self, name: str, namespace: str | None = None) -> DataFrame:
        meta = self.get_meta(name, namespace)
        if meta is None:
            raise FileNotFoundError(f"table {namespace or self.namespace}.{name}")
        vdir = os.path.join(self._table_dir(name, namespace), meta.version)
        # Explicit meta-driven schema: enforces first-seen column order and
        # null-fills columns absent from older files (schema evolution)
        # without a mergeSchema footer scan over every file.
        from pyspark.sql import types as T

        from ..types_lattice import to_spark_type

        variant = meta.json_storage == "variant"
        json_spark_t = T.VariantType() if variant else T.StringType()

        def field_type(t: DataType) -> T.DataType:
            return json_spark_t if t == DataType.JSON else to_spark_type(t)

        fields = [
            T.StructField(n, field_type(t), True) for n, t in meta.columns.items()
        ]
        fields.append(T.StructField(UNMAPPED_DATA_COLUMN, json_spark_t, True))
        return self.spark.read.schema(T.StructType(fields)).parquet(vdir)

    @staticmethod
    def _json_storage_of(df: DataFrame) -> str:
        from pyspark.sql import types as T

        has_variant = any(
            isinstance(f.dataType, T.VariantType) for f in df.schema.fields
        )
        return "variant" if has_variant else "text"

    def _align_json_storage(self, meta: TableMeta, df: DataFrame) -> DataFrame:
        """Coerce a batch's JSON columns to the table's committed storage
        (text vs variant) so appends/merges never mix physical types in one
        table. Cheap: touches only JSON-typed columns, stays JVM-side."""
        from pyspark.sql import types as T

        want_variant = meta.json_storage == "variant"
        out = df
        for f in df.schema.fields:
            json_col = (
                meta.columns.get(f.name) == DataType.JSON
                or f.name == UNMAPPED_DATA_COLUMN
            )
            if want_variant and json_col and isinstance(f.dataType, T.StringType):
                out = out.withColumn(
                    f.name, F.try_parse_json(F.col(f"`{f.name}`"))
                )
            elif not want_variant and isinstance(f.dataType, T.VariantType):
                out = out.withColumn(f.name, F.col(f"`{f.name}`").cast("string"))
        return out

    def _write_version(
        self, name: str, df: DataFrame, partition_by: list[str], namespace: str | None
    ) -> str:
        version = f"v_{uuid.uuid4().hex}"
        vdir = os.path.join(self._table_dir(name, namespace), version)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(vdir)
        return version

    def _gc_old_versions(self, name: str, keep: str, namespace: str | None) -> None:
        d = self._table_dir(name, namespace)
        for entry in os.listdir(d):
            if entry.startswith("v_") and entry != keep:
                shutil.rmtree(os.path.join(d, entry), ignore_errors=True)

    # -- table lifecycle (SURVEY §2.10) -------------------------------------
    def create_or_replace(
        self,
        name: str,
        df: DataFrame,
        *,
        pk: list[str] | None = None,
        timestamp_column: str | None = None,
        partition_by: list[str] | None = None,
        namespace: str | None = None,
    ) -> TableMeta:
        """ReplaceTable semantics: write new version, swap pointer, GC old
        (sql_adapter_base.go:708-740 rename-swap-drop dance)."""
        ns = namespace or self.namespace
        partition_by = partition_by or []
        version = self._write_version(name, df, partition_by, namespace)
        meta = TableMeta(
            namespace=ns,
            name=name,
            columns=self._schema_of(df),
            pk=list(pk or []),
            timestamp_column=timestamp_column,
            partition_by=partition_by,
            version=version,
            json_storage=self._json_storage_of(df),
        )
        self._commit_meta(meta)
        self._gc_old_versions(name, version, namespace)
        return meta

    def append(
        self,
        name: str,
        df: DataFrame,
        *,
        pk: list[str] | None = None,
        timestamp_column: str | None = None,
        partition_by: list[str] | None = None,
        namespace: str | None = None,
    ) -> TableMeta:
        """Batch load: append files INTO the current version directory.

        New columns (schema evolution) are allowed — parquet is read back
        with ``mergeSchema`` when metadata says schemas diverged. Commit =
        meta rewrite after the files land.
        """
        meta = self.get_meta(name, namespace)
        if meta is None:
            return self.create_or_replace(
                name,
                df,
                pk=pk,
                timestamp_column=timestamp_column,
                partition_by=partition_by,
                namespace=namespace,
            )
        vdir = os.path.join(self._table_dir(name, namespace), meta.version)
        df = self._align_json_storage(meta, df)
        writer = df.write.mode("append")
        if meta.partition_by:
            writer = writer.partitionBy(*meta.partition_by)
        writer.parquet(vdir)
        for col, t in self._schema_of(df).items():
            if col not in meta.columns:
                meta.columns[col] = t  # ALTER TABLE ADD COLUMN
        self._commit_meta(meta)
        return meta

    def replace_partition(
        self,
        name: str,
        df: DataFrame,
        *,
        partition_column: str,
        namespace: str | None = None,
        pk: list[str] | None = None,
        timestamp_column: str | None = None,
    ) -> TableMeta:
        """replace_partition mode: dynamic partition overwrite — only the
        partitions present in ``df`` are rewritten
        (replacepartition_stream.go:85-161 delete-by-partition-id+insert)."""
        meta = self.get_meta(name, namespace)
        if meta is None:
            return self.create_or_replace(
                name,
                df,
                pk=pk,
                timestamp_column=timestamp_column,
                partition_by=[partition_column],
                namespace=namespace,
            )
        if partition_column not in meta.partition_by:
            raise ValueError(
                f"table {name} is not partitioned by {partition_column}"
            )
        vdir = os.path.join(self._table_dir(name, namespace), meta.version)
        df = self._align_json_storage(meta, df)
        (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*meta.partition_by)
            .parquet(vdir)
        )
        for col, t in self._schema_of(df).items():
            if col not in meta.columns:
                meta.columns[col] = t
        self._commit_meta(meta)
        return meta

    def merge(
        self,
        name: str,
        source: DataFrame,
        pk: list[str],
        *,
        timestamp_column: str | None = None,
        window_days: int | None = None,
        now=None,
        namespace: str | None = None,
        partition_by: list[str] | None = None,
    ) -> TableMeta:
        """Upsert: new version = merge_upsert(current, source); swap."""
        from ..operators.merge import merge_upsert

        meta = self.get_meta(name, namespace)
        if meta is None:
            return self.create_or_replace(
                name,
                source,
                pk=pk,
                timestamp_column=timestamp_column,
                partition_by=partition_by,
                namespace=namespace,
            )
        source = self._align_json_storage(meta, source)
        ts_col = timestamp_column or meta.timestamp_column
        part_col = next(
            (c for c in meta.partition_by or [] if c in source.columns), None
        )
        if part_col and ts_col and window_days is not None:
            # partition-pruned merge: rewrite ONLY in-window partitions via
            # dynamic overwrite — frozen partitions are never read/written
            return self._merge_partitioned(
                name, source, pk, meta, part_col, ts_col, window_days, now,
                namespace,
            )
        target = self.read(name, namespace)
        merged = merge_upsert(
            target,
            source,
            pk,
            timestamp_column=ts_col,
            window_days=window_days,
            now=now,
        )
        version = self._write_version(name, merged, meta.partition_by, namespace)
        for col, t in self._schema_of(source).items():
            if col not in meta.columns:
                meta.columns[col] = t
        meta.version = version
        meta.pk = list(pk)
        if timestamp_column:
            meta.timestamp_column = timestamp_column
        self._commit_meta(meta)
        self._gc_old_versions(name, version, namespace)
        return meta

    def _merge_partitioned(
        self,
        name: str,
        source: DataFrame,
        pk: list[str],
        meta: TableMeta,
        part_col: str,
        ts_col: str,
        window_days: int,
        now,
        namespace: str | None,
    ) -> TableMeta:
        """Merge by rewriting only in-window partitions (dynamic overwrite
        into the current version). At 100 TB the frozen history costs
        nothing; the reference's window-bounded DELETE has the same shape
        (redshift.go:284-287)."""
        import datetime as _dt

        from ..operators.merge import merge_upsert_live_slice, partition_cutoff_id

        now = now or _dt.datetime.utcnow()
        cutoff = now - _dt.timedelta(days=window_days)
        sample = source.select(part_col).first()
        if sample is None:  # empty batch — nothing to merge
            return meta
        cutoff_id = partition_cutoff_id(str(sample[0]), cutoff)

        target = self.read(name, namespace)
        live_slice = merge_upsert_live_slice(
            target, source, pk, part_col, cutoff_id
        )
        vdir = os.path.join(self._table_dir(name, namespace), meta.version)
        before = {
            r[0]
            for r in target.filter(F.col(part_col) >= F.lit(cutoff_id))
            .select(part_col)
            .distinct()
            .collect()
        }
        live_slice = live_slice.persist()
        after = {
            r[0] for r in live_slice.select(part_col).distinct().collect()
        }
        (
            live_slice.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*meta.partition_by)
            .parquet(vdir)
        )
        live_slice.unpersist()
        # a partition whose every row was consumed by the merge vanishes
        # from the slice; dynamic overwrite can't write "empty" — drop it
        for gone in before - after:
            shutil.rmtree(
                os.path.join(vdir, f"{part_col}={gone}"), ignore_errors=True
            )
        for col, t in self._schema_of(source).items():
            if col not in meta.columns:
                meta.columns[col] = t
        meta.pk = list(pk)
        if ts_col:
            meta.timestamp_column = ts_col
        self._commit_meta(meta)
        return meta

    def table_stats(self, name: str, namespace: str | None = None) -> dict:
        """File-level stats for maintenance decisions: {n_files, bytes,
        avg_file_bytes} over the current version."""
        meta = self.get_meta(name, namespace)
        if meta is None:
            raise FileNotFoundError(name)
        vdir = os.path.join(self._table_dir(name, namespace), meta.version)
        n, total = 0, 0
        for root, _dirs, files in os.walk(vdir):
            for f in files:
                if f.endswith(".parquet"):
                    n += 1
                    total += os.path.getsize(os.path.join(root, f))
        return {
            "n_files": n,
            "bytes": total,
            "avg_file_bytes": total // n if n else 0,
        }

    def compact(
        self,
        name: str,
        target_file_bytes: int = 128 * 1024 * 1024,
        namespace: str | None = None,
        cluster_by: list[str] | None = None,
    ) -> dict:
        """Small-file compaction: rewrite the current version with file
        count sized to ``bytes / target_file_bytes`` (streaming appends
        fragment tables; scan cost at 100 TB tracks file count as much as
        bytes). Atomic: lands as a new version + pointer swap, concurrent
        readers never see a half-compacted table.

        ``cluster_by`` range-clusters the rewrite (repartitionByRange +
        sortWithinPartitions): each output file covers a narrow, mostly
        disjoint slice of the key space, so parquet footer min/max stats
        prune files and row groups on point/range predicates — the
        data-skipping layer that makes a 100 TB table queryable without
        full scans (the analogue of the reference's sortkey / CLUSTER BY /
        PARTITION BY toYYYYMM(ts) per-warehouse tuning, SURVEY §2.10).
        Sorted runs also compress better. Skewed key ranges are split by
        AQE; clustering composes with hive-style ``partition_by``
        (clusters within each partition directory)."""
        meta = self.get_meta(name, namespace)
        if meta is None:
            raise FileNotFoundError(name)
        stats = self.table_stats(name, namespace)
        n_out = max(1, round(stats["bytes"] / target_file_bytes))
        df = self.read(name, namespace)
        if cluster_by:
            keys = [c for c in (meta.partition_by or [])] + list(cluster_by)
            df = df.repartitionByRange(n_out, *keys).sortWithinPartitions(*keys)
        elif meta.partition_by:
            df = df.repartition(n_out, *meta.partition_by)
        else:
            df = df.repartition(n_out)
        version = self._write_version(name, df, meta.partition_by, namespace)
        meta.version = version
        self._commit_meta(meta)
        self._gc_old_versions(name, version, namespace)
        after = self.table_stats(name, namespace)
        return {"before": stats, "after": after}

    def delete(self, name: str, conditions, namespace: str | None = None) -> int:
        """DELETE rows matching WhenConditions (sql_adapter_base.go:354-411):
        rewrite the live version without the matching rows, swap, GC.
        Returns rows deleted."""
        meta = self.get_meta(name, namespace)
        if meta is None:
            return 0
        col = (
            conditions.to_column()
            if hasattr(conditions, "to_column")
            else conditions
        )
        cur = self.read(name, namespace)
        kept = cur.filter(~col | col.isNull())
        before = cur.count()
        version = self._write_version(name, kept, meta.partition_by, namespace)
        meta.version = version
        self._commit_meta(meta)
        self._gc_old_versions(name, version, namespace)
        return before - self.count(name, namespace=namespace)

    def truncate(self, name: str, namespace: str | None = None) -> None:
        meta = self.get_meta(name, namespace)
        if meta is None:
            return
        empty = self.spark.createDataFrame(
            [], self.read(name, namespace).schema
        )
        self.create_or_replace(
            name,
            empty,
            pk=meta.pk,
            timestamp_column=meta.timestamp_column,
            partition_by=meta.partition_by,
            namespace=namespace,
        )

    def drop(self, name: str, namespace: str | None = None) -> None:
        self._meta_cache.pop(f"{namespace or self.namespace}.{name}", None)
        shutil.rmtree(self._table_dir(name, namespace), ignore_errors=True)

    def count(self, name: str, where: str | None = None, namespace: str | None = None) -> int:
        df = self.read(name, namespace)
        if where:
            df = df.filter(where)
        return df.count()

    def select(
        self,
        name: str,
        where: str | None = None,
        order_by: list[str] | None = None,
        limit: int | None = None,
        namespace: str | None = None,
    ) -> DataFrame:
        df = self.read(name, namespace)
        if where:
            df = df.filter(where)
        if order_by:
            df = df.orderBy(*order_by)
        if limit is not None:
            df = df.limit(limit)
        return df
