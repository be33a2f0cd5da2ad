"""File-storage sink: the S3/GCS bulker re-expressed on Spark writers.

Reference (``/root/reference/bulkerlib/implementations/file_storage/
abstract.go:169-295,424-446``, ``s3_bulker.go:25-49``): batch files in
NDJSON/CSV (optionally gzipped) under ``folder/table/<timestamp>`` names;
``replace_table`` deletes the whole table prefix first, ``replace_partition``
deletes only objects of that partition id.

Format surface mirrors the marshaller registry
(``bulkerlib/types/marshaller.go:37-50``): NDJSON, flattened NDJSON
(``FileFormatNDJSONFLAT``), CSV+header, JSON array
(``JSONArrayMarshaller``), Avro (BigQuery path), each optionally gzipped
— plus parquet, the Spark-native default the reference lacks.

Spark-first: ``df.write.json/csv/parquet`` IS the bulk file writer —
parallel, partitioned, compressed. Prefix-delete semantics map to
``mode("overwrite")`` on the prefix directory (object stores: same
delete-prefix + write pattern, executed by the committer). The JSON-array
writer stays streaming-shaped: one array per output file, one element per
line via the text writer — no partition is ever materialized as a single
string.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, functions as F

FORMATS = ("ndjson", "ndjson_flat", "csv", "parquet", "json_array", "avro")


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
        if self.fmt == "ndjson_flat":
            from bulker_spark.flatten import flatten_dataframe

            df = flatten_dataframe(df)
        if self.fmt == "json_array":
            self._write_json_array(df, path, mode)
            return
        w = self._writer(df, mode)
        if self.fmt in ("ndjson", "ndjson_flat"):
            w.json(path)
        elif self.fmt == "csv":
            w.option("header", True).csv(path)
        elif self.fmt == "avro":
            # the built-in OCF writer (sinks/avro_ocf.py): distributed
            # mapInArrow encode, one container file per partition — no
            # external spark-avro module needed. avro's codec vocabulary
            # differs from Spark's: gzip is spelled deflate.
            from bulker_spark.sinks.avro_ocf import write_avro

            codec = (
                "deflate" if self.compression == "gzip"
                else (self.compression or "null")
            )
            write_avro(df, path, codec=codec, mode=mode)
        else:
            w.parquet(path)

    def _write_json_array(self, df: DataFrame, path: str, mode: str) -> None:
        """One JSON *array* per output file (``JSONArrayMarshaller``,
        ``marshaller.go:160-210``), element-per-line so files stream.

        Serialization stays JVM-side (``to_json``); Python only adds the
        bracket/comma punctuation per partition, held to O(1) memory by a
        one-element lookahead.
        """
        json_rows = df.select(
            F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias("j")
        )

        def decorate(batches):
            import pandas as pd

            first = True
            prev = None  # one-element lookahead across batch boundaries
            for pdf in batches:
                vals = pdf["j"].tolist()
                if not vals:
                    continue
                out = []
                if first:
                    out.append("[")
                    first = False
                if prev is not None:
                    vals = [prev, *vals]
                out.extend(v + "," for v in vals[:-1])
                prev = vals[-1]
                if out:
                    yield pd.DataFrame({"value": out})
            if first:
                yield pd.DataFrame({"value": ["[]"]})
            else:
                yield pd.DataFrame({"value": [prev, "]"]})

        lines = json_rows.mapInPandas(decorate, schema="value string")
        w = lines.write.mode(mode)
        if self.compression:
            w = w.option("compression", self.compression)
        w.text(path)

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
        glob = f"{path}{'/partition=*' if self._partitioned(table) else ''}"
        if self.fmt in ("ndjson", "ndjson_flat"):
            return spark.read.json(glob)
        if self.fmt == "json_array":
            # each file is one valid JSON array → multiLine mode
            return spark.read.option("multiLine", True).json(glob)
        if self.fmt == "csv":
            return spark.read.option("header", True).option("inferSchema", True).csv(path)
        if self.fmt == "avro":
            from bulker_spark.sinks.avro_ocf import read_avro

            if self._partitioned(table):
                # decode each partition dir and union (schema is shared);
                # a partition dir with no container files (emptied or
                # mid-write) must not fail the whole table
                parts = []
                for e in sorted(os.listdir(path)):
                    p = os.path.join(path, e)
                    if e.startswith("partition=") and any(
                        f.endswith(".avro") for f in os.listdir(p)
                    ):
                        parts.append(p)
                if not parts:
                    raise FileNotFoundError(f"no .avro files under {path}")
                dfs = [read_avro(spark, p) for p in parts]
                out = dfs[0]
                for d in dfs[1:]:
                    out = out.unionByName(d)
                return out
            return read_avro(spark, path)
        return spark.read.parquet(path)

    def _partitioned(self, table: str) -> bool:
        base = self._prefix(table)
        return os.path.isdir(base) and any(
            e.startswith("partition=") for e in os.listdir(base)
        )
