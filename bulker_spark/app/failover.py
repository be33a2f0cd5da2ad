"""Failover logging + automatic recovery reprocessing.

Reference behaviors, re-expressed:

- ``kafkabase/failover_logger.go:165-460`` — when the produce side of
  the pipeline fails, payloads are appended to a local rotating NDJSON
  log (size- and period-based rotation, gzip on rotate, bounded
  retention of old files) instead of being dropped. Those files are the
  input to failover reprocessing.
- ``admin/failover_reprocessor.go`` + ``admin/REPROCESSING_K8S.md`` —
  an admin service notices a destination has recovered and replays the
  failover backlog through the normal pipeline as a managed job. The
  reference's detection is k8s-driven (pod health); here it is
  in-process: consecutive batch-cycle failures mark a destination DOWN,
  the first successful cycle after that marks it RECOVERED and
  (optionally) auto-starts a reprocessing job over the failover
  directory.

Scale note: the logger is a per-producer local sink — O(append) per
event, no Spark involvement. Replay IS Spark: the reprocessing job
reads the rotated files distributed (one task per file) through the
same topics → dedup/merge → warehouse path as live traffic, so a 100 GB
failover backlog drains at cluster speed, not driver speed.
"""

from __future__ import annotations

import datetime as _dt
import glob
import gzip
import os
import shutil
import threading
from typing import Any


class MessageTooLargeError(Exception):
    """The one produce error class the reference deliberately does NOT
    failover-log (failover_logger.go:249-267: ErrMsgSizeTooLarge is
    excluded — an oversized message would fail replay identically)."""


class FailoverLogger:
    """Rotating local NDJSON failover log (failover_logger.go:176-460).

    ``log_payload`` appends one line to the current file; rotation
    triggers on ``max_size`` bytes or ``rotation_period`` seconds and
    publishes the finished file into ``base_path`` (gzipped when
    ``compress=True``), keeping at most ``max_old_files`` rotated files
    (oldest removed first). File naming matches the reference's
    ``kafka_failover_%Y_%m_%dT%H_%M_%S`` stamp so reprocessing's
    filename-date filtering works on these files unchanged.
    """

    def __init__(
        self,
        base_path: str,
        *,
        rotation_period: float | None = None,
        max_size: int = 64 * 1024 * 1024,
        max_old_files: int = 10,
        compress: bool = True,
        log_all: bool = False,
    ):
        self.base_path = base_path
        self.rotation_period = rotation_period
        self.max_size = max_size
        self.max_old_files = max_old_files
        self.compress = compress
        self.log_all = log_all
        self._lock = threading.Lock()
        self._fh = None
        self._path: str | None = None
        self._size = 0
        self._last_rotation = _dt.datetime.now(_dt.timezone.utc)
        self.logged = 0
        os.makedirs(base_path, exist_ok=True)
        self._open_new()

    # failover_logger.go:249-273
    def should_log(self, error: Exception | None) -> bool:
        if self.log_all:
            return True
        if error is None:
            return False
        return not isinstance(error, MessageTooLargeError)

    def log_payload(self, payload: bytes | str) -> None:
        """failover_logger.go:276-303 — append + newline, rotate when
        the thresholds say so."""
        line = payload if isinstance(payload, bytes) else payload.encode()
        with self._lock:
            if self._fh is None:
                self._open_new_locked()
            self._fh.write(line)
            self._fh.write(b"\n")
            self._size += len(line) + 1
            self.logged += 1
            if self._should_rotate_locked():
                self._rotate_locked()

    def rotate(self) -> str | None:
        """Force-publish the current file (used on recovery so the
        replay sees everything logged so far). Returns the published
        path, or None when the current file is empty."""
        with self._lock:
            return self._rotate_locked()

    def pending_files(self) -> list[str]:
        """Rotated (replay-ready) files, oldest first."""
        files = glob.glob(os.path.join(self.base_path, "*.ndjson")) + glob.glob(
            os.path.join(self.base_path, "*.ndjson.gz")
        )
        return sorted(files, key=lambda p: os.path.getmtime(p))

    def close(self) -> None:
        with self._lock:
            self._rotate_locked()
            if self._fh is not None:
                self._fh.close()
                self._fh = None

    # -- internals -----------------------------------------------------

    def _should_rotate_locked(self) -> bool:
        # failover_logger.go:305-315
        if self.max_size > 0 and self._size >= self.max_size:
            return True
        if self.rotation_period is not None:
            age = (
                _dt.datetime.now(_dt.timezone.utc) - self._last_rotation
            ).total_seconds()
            if age >= self.rotation_period:
                return True
        return False

    def _open_new(self) -> None:
        with self._lock:
            self._open_new_locked()

    def _open_new_locked(self) -> None:
        # failover_logger.go:420-435 — .tmp while live, stamp in the name
        stamp = _dt.datetime.now(_dt.timezone.utc).strftime(
            "%Y_%m_%dT%H_%M_%S"
        )
        name = f"kafka_failover_{stamp}.ndjson.tmp"
        self._path = os.path.join(self.base_path, name)
        # the stamp has second resolution: a rotate+reopen inside one
        # second must not reopen (append to) the just-published name
        seq = 0
        while os.path.exists(self._path) or os.path.exists(
            self._path.removesuffix(".tmp")
        ) or os.path.exists(self._path.removesuffix(".tmp") + ".gz"):
            seq += 1
            self._path = os.path.join(
                self.base_path, f"kafka_failover_{stamp}_{seq}.ndjson.tmp"
            )
        self._fh = open(self._path, "ab")
        self._size = 0
        self._last_rotation = _dt.datetime.now(_dt.timezone.utc)

    def _rotate_locked(self) -> str | None:
        # failover_logger.go:317-418 — close, publish (.tmp stripped,
        # gzip optional), trim retention, open fresh
        if self._fh is None or self._size == 0:
            return None
        self._fh.close()
        final = self._path.removesuffix(".tmp")
        if self.compress:
            gz = final + ".gz"
            with open(self._path, "rb") as src, gzip.open(gz, "wb") as dst:
                shutil.copyfileobj(src, dst)
            os.remove(self._path)
            published = gz
        else:
            os.replace(self._path, final)
            published = final
        self._cleanup_old_locked()
        self._open_new_locked()
        return published

    def _cleanup_old_locked(self) -> None:
        # LocalFileDestination.cleanupOldFiles (failover_logger.go:67-115)
        if self.max_old_files <= 0:
            return
        files = glob.glob(
            os.path.join(self.base_path, "*.ndjson")
        ) + glob.glob(os.path.join(self.base_path, "*.ndjson.gz"))
        if len(files) <= self.max_old_files:
            return
        files.sort(key=lambda p: os.path.getmtime(p))
        for path in files[: len(files) - self.max_old_files]:
            try:
                os.remove(path)
            except OSError:
                pass


class DestinationHealth:
    """Per-destination consecutive-failure tracking with DOWN/RECOVERED
    transitions — the in-process stand-in for the reference's k8s-level
    failover detection. Threshold failures in a row → DOWN; the next
    success → UP again, reported as a recovery exactly once (that edge
    is what triggers the automatic replay)."""

    UP = "UP"
    DOWN = "DOWN"

    def __init__(self, threshold: int = 3):
        self.threshold = max(1, int(threshold))
        self._lock = threading.Lock()
        self._state: dict[str, dict[str, Any]] = {}

    def _entry(self, dst: str) -> dict[str, Any]:
        return self._state.setdefault(
            dst,
            {
                "status": self.UP,
                "consecutive_failures": 0,
                "last_error": None,
                "down_since": None,
                "recoveries": 0,
            },
        )

    def record_failure(self, dst: str, error: str) -> str:
        """→ new status."""
        with self._lock:
            e = self._entry(dst)
            e["consecutive_failures"] += 1
            e["last_error"] = error
            if (
                e["status"] == self.UP
                and e["consecutive_failures"] >= self.threshold
            ):
                e["status"] = self.DOWN
                e["down_since"] = _dt.datetime.now(
                    _dt.timezone.utc
                ).isoformat()
            return e["status"]

    def record_success(self, dst: str) -> bool:
        """→ True exactly when this success is a DOWN→UP recovery."""
        with self._lock:
            e = self._entry(dst)
            recovered = e["status"] == self.DOWN
            e["status"] = self.UP
            e["consecutive_failures"] = 0
            e["down_since"] = None
            if recovered:
                e["recoveries"] += 1
            return recovered

    def status(self, dst: str) -> dict[str, Any]:
        with self._lock:
            return dict(self._entry(dst))
