"""File-storage sink: the S3/GCS bulker re-expressed on Spark writers.

Reference (``/root/reference/bulkerlib/implementations/file_storage/
abstract.go:169-295,424-446``, ``s3_bulker.go:25-49``): batch files in
NDJSON/CSV (optionally gzipped) under ``folder/table/<timestamp>`` names;
``replace_table`` deletes the whole table prefix first, ``replace_partition``
deletes only objects of that partition id.

Spark-first: ``df.write.json/csv/parquet`` IS the bulk file writer —
parallel, partitioned, compressed. Prefix-delete semantics map to
``mode("overwrite")`` on the prefix directory (object stores: same
delete-prefix + write pattern, executed by the committer).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame

FORMATS = ("ndjson", "csv", "parquet")


class FileStorageSink:
    def __init__(
        self,
        root: str,
        *,
        fmt: str = "ndjson",
        compression: str | None = "gzip",
    ):
        if fmt not in FORMATS:
            raise ValueError(f"unknown format {fmt!r}")
        self.root = root
        self.fmt = fmt
        self.compression = compression

    def _prefix(self, table: str, partition_id: str | None = None) -> str:
        return (
            os.path.join(self.root, table, f"partition={partition_id}")
            if partition_id
            else os.path.join(self.root, table)
        )

    def _writer(self, df: DataFrame, mode: str):
        w = df.write.mode(mode)
        if self.compression:
            w = w.option("compression", self.compression)
        return w

    def _write(self, df: DataFrame, path: str, mode: str) -> None:
        w = self._writer(df, mode)
        if self.fmt == "ndjson":
            w.json(path)
        elif self.fmt == "csv":
            w.option("header", True).csv(path)
        else:
            w.parquet(path)

    # modes (abstract.go:169-295) ------------------------------------------
    def append_batch(
        self, df: DataFrame, table: str, partition_id: str | None = None
    ) -> str:
        path = self._prefix(table, partition_id)
        self._write(df, path, "append")
        return path

    def replace_table(self, df: DataFrame, table: str) -> str:
        """Delete the table prefix, then write (atomic per Spark committer)."""
        path = self._prefix(table)
        self._write(df, path, "overwrite")
        return path

    def replace_partition(
        self, df: DataFrame, table: str, partition_id: str
    ) -> str:
        """Delete only the partition's prefix, keep sibling partitions."""
        path = self._prefix(table, partition_id)
        if os.path.exists(path):
            shutil.rmtree(path)
        self._write(df, path, "overwrite")
        return path

    def read(self, spark, table: str) -> DataFrame:
        path = self._prefix(table)
        if self.fmt == "ndjson":
            return spark.read.json(f"{path}{'/partition=*' if self._partitioned(table) else ''}")
        if self.fmt == "csv":
            return spark.read.option("header", True).option("inferSchema", True).csv(path)
        return spark.read.parquet(path)

    def _partitioned(self, table: str) -> bool:
        base = self._prefix(table)
        return os.path.isdir(base) and any(
            e.startswith("partition=") for e in os.listdir(base)
        )
