"""Airbyte-protocol connector source: parse connector output, route records
to per-stream engine loads, checkpoint state after each commit.

Reference: the sync-sidecar (``/root/reference/sync-sidecar/read.go:57-265``)
reads connector stdout line-by-line: ``RECORD`` messages route to the
stream's BulkerStream, ``STATE`` is saved only after a successful warehouse
commit (``read.go:281-327``), ``LOG``/``TRACE`` pass through, per-stream
mode selection is full-refresh → ``replace_table``, incremental → ``batch``
(``read.go:439-531``).

Spark-first shape: the connector output (a file/directory of NDJSON message
lines, or any one-string-column DataFrame) is parsed **declaratively** with
``get_json_object`` to split message types, then each stream's records are
ingested as one batch through the normal engine path — the sidecar's
row-at-a-time loop becomes three filtered projections.
"""

from __future__ import annotations

import json as _json
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..api import Engine, StreamResult


@dataclass
class AirbyteSyncResult:
    streams: dict[str, StreamResult] = field(default_factory=dict)
    states: list[dict] = field(default_factory=list)
    errors: list[str] = field(default_factory=list)
    log_count: int = 0


class AirbyteSource:
    """One sync: connector message lines → warehouse tables (one per
    stream) + committed state."""

    def __init__(
        self,
        engine: Engine,
        *,
        stream_modes: dict[str, str] | None = None,
        default_mode: str = "batch",
        table_prefix: str = "",
    ):
        self.engine = engine
        self.stream_modes = stream_modes or {}
        self.default_mode = default_mode
        self.table_prefix = table_prefix

    def _messages(self, spark: SparkSession, source) -> DataFrame:
        if isinstance(source, DataFrame):
            df = source
        elif isinstance(source, str):
            df = spark.read.text(source)
        else:
            df = spark.createDataFrame([(x,) for x in source], "value string")
        col = df.columns[0]
        return df.select(
            F.col(col).alias("raw"),
            F.get_json_object(col, "$.type").alias("msg_type"),
            F.get_json_object(col, "$.record.stream").alias("stream"),
            F.get_json_object(col, "$.record.data").alias("data"),
        )

    def run(
        self,
        source,
        *,
        stream_options: dict[str, dict[str, Any]] | None = None,
    ) -> AirbyteSyncResult:
        spark = self.engine.spark
        msgs = self._messages(spark, source).persist()
        result = AirbyteSyncResult()
        try:
            result.log_count = msgs.filter(
                F.col("msg_type").isin("LOG", "TRACE")
            ).count()
            # TRACE ERROR messages surface as sync errors (read.go:228-247)
            err_rows = msgs.filter(
                (F.col("msg_type") == "TRACE")
                & (
                    F.get_json_object("raw", "$.trace.type") == "ERROR"
                )
            ).collect()
            result.errors = [
                _json.loads(r["raw"])["trace"]["error"].get("message", "")
                for r in err_rows
            ]

            streams = [
                r["stream"]
                for r in msgs.filter(F.col("msg_type") == "RECORD")
                .select("stream")
                .distinct()
                .collect()
            ]
            for stream_name in sorted(s for s in streams if s):
                records = msgs.filter(
                    (F.col("msg_type") == "RECORD")
                    & (F.col("stream") == stream_name)
                ).select(F.col("data").alias("value"))
                mode = self.stream_modes.get(stream_name, self.default_mode)
                opts = dict((stream_options or {}).get(stream_name, {}))
                opts["mode"] = mode
                bs = self.engine.create_stream(
                    f"{self.table_prefix}{stream_name}", **opts
                )
                bs.consume_dataframe_json(records)
                result.streams[stream_name] = bs.complete()

            # STATE is committed only after all streams landed
            # (read.go:281-327 state-after-commit discipline)
            state_rows = (
                msgs.filter(F.col("msg_type") == "STATE")
                .select("raw")
                .collect()
            )
            result.states = [
                _json.loads(r["raw"]).get("state", {}) for r in state_rows
            ]
            if result.states:
                self._save_state(result.states[-1])
        finally:
            msgs.unpersist()
        return result

    def run_control(self, source) -> dict[str, Any]:
        """The spec/check/discover command path (the reference's
        ``SpecCatalogSideCar``, ``sync-sidecar/spec_catalog.go:20-141``):
        extract ``SPEC`` / ``CATALOG`` / ``CONNECTION_STATUS`` messages
        from connector output, persist them to the per-connector control
        table (the sidecar's Postgres spec/catalog rows), and report the
        command status — FAILED if the connector emitted a TRACE ERROR or
        a failed connection check."""
        spark = self.engine.spark
        msgs = self._messages(spark, source)
        rows = (
            msgs.filter(
                F.col("msg_type").isin(
                    "SPEC", "CATALOG", "CONNECTION_STATUS", "TRACE"
                )
            )
            .select("raw", "msg_type")
            .collect()
        )
        out: dict[str, Any] = {
            "spec": None,
            "catalog": None,
            "connection_status": None,
            "status": "SUCCESS",
            "description": "",
        }
        for r in rows:
            obj = _json.loads(r["raw"])
            t = r["msg_type"]
            if t == "SPEC":
                out["spec"] = obj.get("spec")
            elif t == "CATALOG":
                out["catalog"] = obj.get("catalog")
            elif t == "CONNECTION_STATUS":
                out["connection_status"] = obj.get("connectionStatus")
                if (out["connection_status"] or {}).get(
                    "status", ""
                ).lower() == "failed":
                    out["status"] = "FAILED"
                    out["description"] = (
                        out["connection_status"] or {}
                    ).get("message", "")
            elif obj.get("trace", {}).get("type") == "ERROR":
                out["status"] = "FAILED"
                out["description"] = (
                    obj["trace"].get("error", {}).get("message", "")
                )
        df = spark.createDataFrame(
            [
                (k, _json.dumps(v))
                for k, v in out.items()
                if k in ("spec", "catalog", "connection_status")
                and v is not None
            ]
            or [("none", "{}")],
            "kind string, payload string",
        )
        self.engine.warehouse.create_or_replace(
            f"{self.table_prefix}_airbyte_control", df
        )
        return out

    def _save_state(self, state: dict) -> None:
        """Persist the last committed state (the sidecar writes it to its
        control DB; we keep a single-row state table)."""
        df = self.engine.spark.createDataFrame(
            [(_json.dumps(state),)], "state string"
        )
        self.engine.warehouse.create_or_replace(
            f"{self.table_prefix}_airbyte_state", df
        )

    def load_state(self) -> dict | None:
        name = f"{self.table_prefix}_airbyte_state"
        if not self.engine.warehouse.exists(name):
            return None
        row = self.engine.warehouse.read(name).first()
        return _json.loads(row["state"]) if row else None
