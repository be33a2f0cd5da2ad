"""Pluggable destination-configuration sources — the reference's
``ConfigurationSource`` family (`bulkerapp/app/configuration_source.go`:
env / yaml-file, `http_configuration_source.go`, `postgres_configuration_
source.go`, `multi_configuration_source.go`), re-expressed for the Spark
app: each source yields destination spec dicts (the shape
``BulkerApp.put_destination`` accepts), detects changes by content hash
(the channel-of-change-signals analogue, poll-friendly), and
``sync_app`` applies the diff — new/changed specs are put (the app drops
the cached Engine, exactly the hot-reload path), vanished ids are
deleted.

Sources:
- ``EnvConfigurationSource``  — ``BULKER_DESTINATION_<ID>=<json>`` env
  vars (`configuration_source.go:191-248`; HJSON relaxed to JSON here).
- ``FileConfigurationSource`` — a JSON (or YAML, when pyyaml is
  importable) file holding a list of specs (`NewYamlConfigurationSource`).
- ``HTTPConfigurationSource`` — GET a JSON array of specs; honors
  Last-Modified / If-Modified-Since the way the reference's HTTP
  repository does (`http_configuration_source.go`).
- ``SQLConfigurationSource``  — ``SELECT id, config FROM <table>`` over
  any DB-API connection factory (the postgres source's shape; live-tested
  against DuckDB).
- ``MultiConfigurationSource`` — concatenation, later sources win on id
  collision (`multi_configuration_source.go:43-49` concatenates; the
  dict-merge here makes the precedence explicit instead of duplicated).
"""

from __future__ import annotations

import hashlib
import json
import os
import urllib.error
import urllib.request
from typing import Any, Callable


def _spec_id(spec: dict[str, Any]) -> str:
    return str(spec.get("destination_id") or spec.get("id") or "")


def _canon_hash(specs: list[dict[str, Any]]) -> str:
    return hashlib.sha256(
        json.dumps(specs, sort_keys=True, default=str).encode()
    ).hexdigest()


class ConfigurationSource:
    """Base: ``load()`` returns the current spec list; ``changed()`` is
    edge-triggered — True once per observed content change."""

    def __init__(self) -> None:
        self._last_hash: str | None = None

    def load(self) -> list[dict[str, Any]]:  # pragma: no cover - abstract
        raise NotImplementedError

    def changed(self) -> bool:
        h = _canon_hash(self.load())
        if h != self._last_hash:
            self._last_hash = h
            return True
        return False

    def get(self, destination_id: str) -> dict[str, Any] | None:
        for spec in self.load():
            if _spec_id(spec) == destination_id:
                return spec
        return None


class EnvConfigurationSource(ConfigurationSource):
    def __init__(self, prefix: str = "BULKER_DESTINATION_") -> None:
        super().__init__()
        self.prefix = prefix

    def load(self) -> list[dict[str, Any]]:
        out = []
        for key, value in sorted(os.environ.items()):
            if not key.startswith(self.prefix):
                continue
            env_id = key[len(self.prefix):].lower()
            try:
                spec = json.loads(value)
            except json.JSONDecodeError:
                continue  # the reference logs-and-skips malformed configs
            if not isinstance(spec, dict):
                continue  # valid JSON but not a config object — skip too
            spec.setdefault("destination_id", spec.get("id", env_id))
            out.append(spec)
        return out


class FileConfigurationSource(ConfigurationSource):
    def __init__(self, path: str) -> None:
        super().__init__()
        self.path = path.removeprefix("file://")

    def load(self) -> list[dict[str, Any]]:
        with open(self.path) as fh:
            text = fh.read()
        if self.path.endswith((".yaml", ".yml")):
            try:
                import yaml  # optional, like the reference's yaml path
            except ImportError as ex:  # pragma: no cover - env-dependent
                raise RuntimeError(
                    "yaml config requires pyyaml; use JSON instead"
                ) from ex
            data = yaml.safe_load(text)
        else:
            data = json.loads(text)
        if isinstance(data, dict):  # {"destinations": [...]} wrapper
            data = data.get("destinations", [])
        return [dict(s) for s in data]


class HTTPConfigurationSource(ConfigurationSource):
    def __init__(self, url: str, token: str | None = None) -> None:
        super().__init__()
        self.url = url
        self.token = token
        self._last_modified: str | None = None
        self._cached: list[dict[str, Any]] = []

    def load(self) -> list[dict[str, Any]]:
        req = urllib.request.Request(self.url)
        if self.token:
            req.add_header("Authorization", f"Bearer {self.token}")
        if self._last_modified:
            req.add_header("If-Modified-Since", self._last_modified)
        try:
            with urllib.request.urlopen(req, timeout=10) as resp:
                self._last_modified = resp.headers.get("Last-Modified")
                data = json.loads(resp.read().decode())
        except urllib.error.HTTPError as ex:
            if ex.code == 304:  # unchanged — serve the cache
                return self._cached
            raise
        if isinstance(data, dict):
            data = data.get("destinations", [])
        self._cached = [dict(s) for s in data]
        return self._cached


class SQLConfigurationSource(ConfigurationSource):
    """``SELECT <id_col>, <config_col> FROM <table>`` over a DB-API
    connection factory; config cells hold JSON spec objects."""

    def __init__(
        self,
        connect: Callable[[], Any],
        table: str = "destination_configs",
        id_col: str = "id",
        config_col: str = "config",
    ) -> None:
        super().__init__()
        self.connect = connect
        self.table = table
        self.id_col = id_col
        self.config_col = config_col

    def load(self) -> list[dict[str, Any]]:
        con = self.connect()
        try:
            rows = con.execute(
                f"SELECT {self.id_col}, {self.config_col} "
                f"FROM {self.table} ORDER BY {self.id_col}"
            ).fetchall()
        finally:
            close = getattr(con, "close", None)
            if close:
                close()
        out = []
        for rid, cfg in rows:
            spec = json.loads(cfg) if isinstance(cfg, (str, bytes)) else dict(cfg)
            spec.setdefault("destination_id", str(rid))
            out.append(spec)
        return out


class MultiConfigurationSource(ConfigurationSource):
    def __init__(self, sources: list[ConfigurationSource]) -> None:
        super().__init__()
        self.sources = sources

    def load(self) -> list[dict[str, Any]]:
        merged: dict[str, dict[str, Any]] = {}
        for src in self.sources:  # later sources win on id collision
            for spec in src.load():
                merged[_spec_id(spec)] = spec
        return list(merged.values())


def sync_app(app, source: ConfigurationSource) -> dict[str, list[str]]:
    """One reconcile tick: apply the source's current spec set to the app.
    Returns ``{"put": [...], "deleted": [...], "errors": [...]}`` — ids
    whose configs were (re)applied, retired, or rejected. Unchanged specs
    are skipped via per-spec hashing, so a poll loop is cheap to run every
    few seconds (the reference's changes-channel → topic-manager
    reconcile). Per-spec failure isolation: one invalid destination (bad
    options, warehouse_path outside the allowed roots) must not halt
    reconciliation for every other destination — its error is reported and
    its hash left unstored, so it is retried (and re-reported) next tick."""
    specs = {s_id: s for s in source.load() if (s_id := _spec_id(s))}
    put: list[str] = []
    deleted: list[str] = []
    errors: list[str] = []
    if not hasattr(app, "_config_hashes"):
        app._config_hashes = {}
    for s_id, spec in specs.items():
        h = _canon_hash([spec])
        if app._config_hashes.get(s_id) != h:
            try:
                app.put_destination(spec)
            except Exception as ex:
                errors.append(f"{s_id}: {type(ex).__name__}: {ex}")
                continue
            app._config_hashes[s_id] = h
            put.append(s_id)
    for s_id in list(app._config_hashes):
        if s_id not in specs:
            try:
                app.delete_destination(s_id)
            except Exception as ex:
                errors.append(f"{s_id}: {type(ex).__name__}: {ex}")
                continue
            app._config_hashes.pop(s_id, None)
            deleted.append(s_id)
    return {
        "put": sorted(put),
        "deleted": sorted(deleted),
        "errors": sorted(errors),
    }
