"""Batch-runner cron — the scheduler that fires ``run_batch_cycle``.

Reference: ``bulkerapp/app/cron.go:25-56`` — a cron registry schedules one
batch-consumer job per (destination, table) topic at the destination's
``frequency`` (default 300 s, ``app_config.go:56``), with per-stream
spread offsets so N tables on one period don't fire together
(``bulkerlib/options.go:122-127``).

Spark mapping: the driver stays the control plane — a single scheduler
thread walks due destinations and runs their checkpointed ``availableNow``
drains (each drain is itself all-executor work). Retry replays ride the
same tick at ``retry_frequency`` (``app_config.go:61-64``).
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field

from ..api import StreamOptions
from ..streaming.ingest_stream import (
    IngestStream,
    spread_offset_seconds,
)
from ..streaming.topics import parse_topic_id
from .router import BulkerApp


@dataclass
class _Schedule:
    period_s: float
    next_due: float
    retry_period_s: float
    retry_next_due: float
    errors: int = 0
    runs: int = 0
    retry_runs: int = 0
    last_error: str | None = None
    tables_retried: set = field(default_factory=set)


class BatchRunner:
    """Periodic cycle scheduler over a :class:`BulkerApp`.

    ``tick()`` is the testable unit (runs everything due at ``now``);
    ``start()`` spins the daemon thread that calls it. A cycle failure is
    recorded and retried next period — one broken destination must not
    stall the others (the reference isolates consumers the same way,
    ``batch_consumer.go:269-401``)."""

    def __init__(
        self,
        app: BulkerApp,
        period_s: float = 300.0,
        retry_period_s: float | None = None,
        spread: bool = True,
        clock=time.monotonic,
    ):
        self.app = app
        self.clock = clock
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self.period_s = period_s
        self.retry_period_s = retry_period_s
        self.spread = spread
        self.schedules: dict[str, _Schedule] = {}
        self._reconcile(clock())

    def _reconcile(self, now: float) -> None:
        """Converge schedules to the app's live destination set — the
        config-watch diff (``topic_manager.go:424-490``): new
        destinations get a schedule (spread-jittered), removed ones are
        retired. Runs every tick, so ``PUT/DELETE /config`` takes effect
        at the next scheduler step without a restart."""
        for dest_id, dest in self.app.destinations.items():
            if dest_id in self.schedules:
                continue
            p = float(dest.options.get("frequency", self.period_s))
            rp = float(
                dest.options.get(
                    "retry_frequency", self.retry_period_s or p
                )
            )
            off = (
                spread_offset_seconds(dest_id, "", int(p)) % p
                if self.spread
                else 0
            )
            self.schedules[dest_id] = _Schedule(
                period_s=p,
                next_due=now + off,
                retry_period_s=rp,
                retry_next_due=now + off + rp,
            )
        for dest_id in list(self.schedules):
            if dest_id not in self.app.destinations:
                del self.schedules[dest_id]

    # -- one scheduler step (deterministic, test-friendly) ------------------
    def tick(self, now: float | None = None) -> list[str]:
        now = self.clock() if now is None else now
        self._reconcile(now)
        ran: list[str] = []
        for dest_id, sched in self.schedules.items():
            if now >= sched.next_due:
                try:
                    self.app.run_batch_cycle(dest_id)
                    sched.runs += 1
                    ran.append(dest_id)
                except Exception as ex:  # isolate per destination
                    sched.errors += 1
                    sched.last_error = f"{type(ex).__name__}: {ex}"
                sched.next_due = now + sched.period_s
            if now >= sched.retry_next_due:
                try:
                    self._process_retries(dest_id)
                    sched.retry_runs += 1
                except Exception as ex:
                    sched.errors += 1
                    sched.last_error = f"{type(ex).__name__}: {ex}"
                sched.retry_next_due = now + sched.retry_period_s
        return ran

    def _process_retries(self, dest_id: str) -> None:
        """Replay due retry rows for every table this destination has
        topics for (``retry_consumer.go:86-233``)."""
        eng = self.app.engine_for(dest_id)
        opts = self.app._options_for(dest_id, {})
        opts.pop("mode", None)
        tables = {
            parse_topic_id(t)[2] for t in self.app.topics_for(dest_id)
        } | self.schedules[dest_id].tables_retried
        for table in sorted(tables):
            self.schedules[dest_id].tables_retried.add(table)
            IngestStream(
                eng, table, StreamOptions(**opts)
            ).process_retries()

    # -- daemon loop --------------------------------------------------------
    def start(self, poll_s: float = 1.0) -> None:
        if self._thread is not None:
            return

        def loop() -> None:
            while not self._stop.is_set():
                self.tick()
                self._stop.wait(poll_s)

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=10)
            self._thread = None

    def status(self) -> dict[str, dict]:
        return {
            d: {
                "runs": s.runs,
                "retry_runs": s.retry_runs,
                "errors": s.errors,
                "last_error": s.last_error,
                "period_s": s.period_s,
            }
            for d, s in self.schedules.items()
        }
