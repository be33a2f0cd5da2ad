"""Destination-config repository with hot-reload reconciliation.

Reference: ``bulkerapp/app/topic_manager.go:424-490`` — a config watcher
diffs the destination repository on change and creates consumers for new
(destination, table) pairs, retires consumers whose destination vanished,
and recreates ones whose config hash changed.

Spark mapping: one `IngestStream` query per (destination, table); the
repository holds declarative specs, `reconcile()` diffs specs against the
running queries and starts/stops them. The driver stays the control plane
(exactly the reference's role split) while all data movement remains on
executors.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field
from typing import Any, Callable


@dataclass(frozen=True)
class DestinationSpec:
    """One (destination, table) stream declaration."""

    destination_id: str
    table: str
    source_dir: str  # drop-directory (the topic analogue)
    checkpoint: str
    options: tuple = ()  # sorted (key, value-json) pairs — hashable

    @staticmethod
    def make(
        destination_id: str,
        table: str,
        source_dir: str,
        checkpoint: str,
        **options: Any,
    ) -> "DestinationSpec":
        opts = tuple(
            sorted((k, json.dumps(v, sort_keys=True, default=str)) for k, v in options.items())
        )
        return DestinationSpec(destination_id, table, source_dir, checkpoint, opts)

    @property
    def key(self) -> str:
        return f"{self.destination_id}.{self.table}"

    @property
    def config_hash(self) -> str:
        blob = json.dumps(
            [self.source_dir, self.checkpoint, list(self.options)], sort_keys=True
        )
        return hashlib.md5(blob.encode()).hexdigest()

    def options_dict(self) -> dict[str, Any]:
        return {k: json.loads(v) for k, v in self.options}


@dataclass
class _Running:
    spec: DestinationSpec
    query: Any  # StreamingQuery


class Repository:
    """Holds specs; ``reconcile(engine)`` converges running queries to them.

    ``start_fn(engine, spec)`` must return a started StreamingQuery —
    injectable so tests can substitute a lightweight runner.
    """

    def __init__(self, start_fn: Callable | None = None):
        self._specs: dict[str, DestinationSpec] = {}
        self._running: dict[str, _Running] = {}
        self.events: list[tuple[str, str]] = []  # (action, key) audit log

    # -- config surface (the watched store) ---------------------------------
    def put(self, spec: DestinationSpec) -> None:
        self._specs[spec.key] = spec

    def remove(self, destination_id: str, table: str) -> None:
        self._specs.pop(f"{destination_id}.{table}", None)

    def specs(self) -> list[DestinationSpec]:
        return list(self._specs.values())

    # -- reconciliation (topic_manager.go:424-490 semantics) ----------------
    def reconcile(self, engine, start_fn: Callable | None = None) -> list[tuple[str, str]]:
        """Diff specs vs running: start new, stop retired, restart changed.
        Returns this pass's (action, key) list."""
        start = start_fn or self._default_start
        actions: list[tuple[str, str]] = []

        for key, run in list(self._running.items()):
            spec = self._specs.get(key)
            if spec is None:
                run.query.stop()
                del self._running[key]
                actions.append(("retired", key))
            elif spec.config_hash != run.spec.config_hash:
                run.query.stop()
                self._running[key] = _Running(spec, start(engine, spec))
                actions.append(("recreated", key))

        for key, spec in self._specs.items():
            if key not in self._running:
                self._running[key] = _Running(spec, start(engine, spec))
                actions.append(("created", key))

        self.events.extend(actions)
        return actions

    def running_keys(self) -> set[str]:
        return set(self._running)

    def stop_all(self) -> None:
        for run in self._running.values():
            run.query.stop()
        self._running.clear()

    @staticmethod
    def _default_start(engine, spec: DestinationSpec):
        from ..api import StreamOptions
        from .ingest_stream import IngestStream, json_file_stream

        opts = StreamOptions(**spec.options_dict())
        stream = IngestStream(engine, spec.table, opts)
        source = json_file_stream(engine.spark, spec.source_dir)
        return stream.start(source, spec.checkpoint, available_now=False,
                            processing_time="1 second")
