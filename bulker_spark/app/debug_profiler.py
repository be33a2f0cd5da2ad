"""Python analogues of the reference's pprof debug surface.

The reference router mounts Go's ``net/http/pprof`` handlers on
``/debug/pprof/*`` (``bulkerapp/app/router.go:76-85``: profile, heap,
goroutine, block, threadcreate, cmdline, symbol, trace, mutex + index).
Go's runtime profiles don't exist in CPython, so each route maps to the
closest stdlib-only equivalent:

============== ============================================================
route          analogue
============== ============================================================
goroutine      per-thread Python stack dump (``sys._current_frames``)
heap           ``tracemalloc`` snapshot, top allocation sites (starts the
               tracer on first hit — the first response is the baseline)
profile        sampling CPU profiler: all thread frames every ~10 ms for
               ``?seconds=N``, emitted as FOLDED stacks (flamegraph.pl /
               speedscope input)
trace          the same sampler, time-ordered (ts_us thread top-frame)
block / mutex  the goroutine dump filtered to threads blocked in
               wait/acquire/IO frames (CPython has no block/mutex
               profiler; the *currently blocked* set is the actionable
               slice of it)
threadcreate   thread inventory (name, ident, daemon, alive)
cmdline        ``\\x00``-joined argv — byte-compatible with Go's handler
symbol         ``num_symbols: 0`` — Python frames are already symbolic
============== ============================================================

Everything here is driver-side: profiling executors goes through the
Spark UI / ``spark.python.profile``, not this surface.
"""

from __future__ import annotations

import functools
import sys
import threading
import time
import traceback

# frame names that mean "this thread is parked, not running" — the slice
# of a goroutine dump Go's block/mutex profiles would attribute time to.
# A name alone is too loose (any application function called "read" or
# "get" would be misreported as parked), so the match is qualified by
# the frame's MODULE: only stdlib blocking primitives count.
_WAIT_FUNCS = frozenset(
    {
        "wait",
        "acquire",
        "select",
        "poll",
        "epoll",
        "accept",
        "recv",
        "recv_into",
        "read",
        "readinto",
        "get",
        "join",
        "sleep",
        "settimeout",
        "flowControlledRead",
    }
)

# modules whose blocking calls park a thread, resolved to their ACTUAL
# file paths at import time — a _WAIT_FUNCS name in any other file is
# application code that merely shares the name. Basename matching was
# too loose here (advice r7): an application module named queue.py or
# connection.py with a wait() would be misreported as parked — the
# exact false-positive class this filter exists to remove.
def _wait_paths() -> frozenset:
    import os
    import queue
    import selectors
    import socket
    import socketserver
    import ssl
    import subprocess
    from multiprocessing import connection

    mods = [
        threading,
        socket,
        selectors,
        queue,
        ssl,
        subprocess,
        connection,
        socketserver,
    ]
    # py4j gateway I/O threads (site-packages, gated: absent in
    # gateway-less deployments)
    try:
        from py4j import clientserver, java_gateway

        mods += [clientserver, java_gateway]
    except ImportError:
        pass
    return frozenset(
        os.path.realpath(m.__file__) for m in mods if getattr(m, "__file__", None)
    )


_WAIT_PATHS = _wait_paths()


@functools.lru_cache(maxsize=4096)
def _is_wait_file(co_filename: str) -> bool:
    import os

    return os.path.realpath(co_filename) in _WAIT_PATHS


def _is_wait_frame(frame) -> bool:
    code = frame.f_code
    return code.co_name in _WAIT_FUNCS and _is_wait_file(code.co_filename)

_MAX_SECONDS = 30.0  # self-DoS guard on the sampling routes
_HZ = 100


def _frames() -> dict[int, object]:
    return sys._current_frames()


def _thread_names() -> dict[int, str]:
    return {t.ident: t.name for t in threading.enumerate() if t.ident}


def goroutine_dump() -> str:
    """All live thread stacks, most recent call last (the analogue of
    ``pprof.Handler("goroutine")``'s debug=1 text form)."""
    names = _thread_names()
    out = []
    for ident, frame in sorted(_frames().items()):
        name = names.get(ident, "?")
        out.append(f"thread {ident} ({name}):")
        out.extend(
            ln.rstrip("\n") for ln in traceback.format_stack(frame)
        )
        out.append("")
    return "\n".join(out) + "\n"


def blocked_dump(kind: str = "block") -> str:
    """Threads whose top frame is a wait/acquire/IO call — the currently
    parked subset of the goroutine dump (see module docstring on why
    this stands in for Go's block/mutex profiles)."""
    names = _thread_names()
    out = [
        f"# {kind}: threads currently parked in a stdlib blocking call",
        "# (heuristic: top frame name AND module both match — an"
        " application function named 'read'/'get' does not count)",
    ]
    n = 0
    for ident, frame in sorted(_frames().items()):
        if not _is_wait_frame(frame):
            continue
        func = frame.f_code.co_name
        n += 1
        out.append(f"thread {ident} ({names.get(ident, '?')}) in {func}:")
        out.extend(
            ln.rstrip("\n") for ln in traceback.format_stack(frame)
        )
        out.append("")
    out.insert(1, f"# blocked threads: {n}")
    return "\n".join(out) + "\n"


def threadcreate_dump() -> str:
    lines = ["# live threads"]
    for t in sorted(threading.enumerate(), key=lambda t: t.ident or 0):
        lines.append(
            f"{t.ident or 0} name={t.name} daemon={t.daemon} "
            f"alive={t.is_alive()}"
        )
    return "\n".join(lines) + "\n"


def cmdline() -> str:
    """argv joined by NUL — byte-compatible with Go's /cmdline."""
    return "\x00".join(sys.argv)


def symbol() -> str:
    # Go's /symbol maps raw PCs to names; Python stacks are symbolic
    # already, so there is never anything to resolve
    return "num_symbols: 0\n"


def heap_snapshot(limit: int = 40, stop: bool = False) -> str:
    """Top allocation sites by live bytes from ``tracemalloc``. The
    tracer starts on the FIRST call (a baseline response that says so) —
    tracing always-on would tax the hot path the way Go's heap profile
    does not. While tracing, every allocation pays the tracemalloc
    bookkeeping tax; ``?stop=1`` turns the tracer off again so one
    authorized heap peek does not tax the driver for the rest of the
    process lifetime."""
    import tracemalloc

    if stop:
        was = tracemalloc.is_tracing()
        if was:
            tracemalloc.stop()
        return (
            "# tracemalloc stopped — allocation tracking overhead"
            " removed\n"
            if was
            else "# tracemalloc was not running\n"
        )
    if not tracemalloc.is_tracing():
        tracemalloc.start(10)
        return (
            "# tracemalloc started (10-frame tracebacks); allocations are "
            "recorded from this point — call again for a snapshot, and "
            "?stop=1 when done (tracking taxes every allocation while "
            "on)\n"
        )
    snap = tracemalloc.take_snapshot()
    traced, peak = tracemalloc.get_traced_memory()
    lines = [
        f"# traced: {traced} bytes (peak {peak})"
        " — tracer stays ON until ?stop=1"
    ]
    for stat in snap.statistics("lineno")[: max(1, limit)]:
        lines.append(str(stat))
    return "\n".join(lines) + "\n"


def _clip_int(raw, default: int) -> int:
    """Defensive query-param parsing — garbage falls back, never 500s."""
    try:
        return max(1, int(raw))
    except (TypeError, ValueError):
        return default


def _clip_seconds(raw, default: float) -> float:
    try:
        s = float(raw)
    except (TypeError, ValueError):
        s = default
    return min(max(s, 0.01), _MAX_SECONDS)


def sample_profile(seconds=1.0, hz: int = _HZ) -> str:
    """Statistical CPU profile: sample every thread's stack ``hz`` times
    a second for ``seconds``, emit folded stacks (``a;b;c count`` —
    flamegraph.pl / speedscope / pprof's own folded importer input).
    Sampling rides the GIL like any Python profiler — a ~1% tax while
    active, zero when idle."""
    seconds = _clip_seconds(seconds, 1.0)
    me = threading.get_ident()
    period = 1.0 / max(1, hz)
    counts: dict[str, int] = {}
    names = _thread_names()
    deadline = time.monotonic() + seconds
    while time.monotonic() < deadline:
        for ident, frame in _frames().items():
            if ident == me:
                continue  # the sampler observing itself is pure noise
            parts = []
            f = frame
            while f is not None:
                code = f.f_code
                parts.append(f"{code.co_filename.rsplit('/', 1)[-1]}:{code.co_name}")
                f = f.f_back
            key = (
                f"{names.get(ident, ident)};" + ";".join(reversed(parts))
            )
            counts[key] = counts.get(key, 0) + 1
        time.sleep(period)
    lines = [f"# folded stacks, {hz} Hz x {seconds:g}s"]
    for key in sorted(counts):
        lines.append(f"{key} {counts[key]}")
    return "\n".join(lines) + "\n"


def trace_samples(seconds=1.0, hz: int = _HZ) -> str:
    """Time-ordered sample log (``ts_us thread top-frame``) — the
    closest honest stand-in for Go's execution trace: it shows WHEN each
    thread was where, where the profile shows only aggregates."""
    seconds = _clip_seconds(seconds, 1.0)
    me = threading.get_ident()
    period = 1.0 / max(1, hz)
    names = _thread_names()
    t0 = time.monotonic()
    lines = [f"# ts_us thread frame, {hz} Hz x {seconds:g}s"]
    while time.monotonic() - t0 < seconds:
        ts = int((time.monotonic() - t0) * 1e6)
        for ident, frame in sorted(_frames().items()):
            if ident == me:
                continue
            code = frame.f_code
            lines.append(
                f"{ts} {names.get(ident, ident)} "
                f"{code.co_filename.rsplit('/', 1)[-1]}:{code.co_name}"
            )
        time.sleep(period)
    return "\n".join(lines) + "\n"


#: route suffix → (callable(query-dict) -> text body)
ROUTES = {
    "": lambda q: index(),
    "goroutine": lambda q: goroutine_dump(),
    "heap": lambda q: heap_snapshot(
        _clip_int(q.get("limit"), 40),
        stop=str(q.get("stop", "")).lower() in ("1", "true", "yes"),
    ),
    "block": lambda q: blocked_dump("block"),
    "mutex": lambda q: blocked_dump("mutex"),
    "threadcreate": lambda q: threadcreate_dump(),
    "cmdline": lambda q: cmdline(),
    "symbol": lambda q: symbol(),
    "profile": lambda q: sample_profile(q.get("seconds", 1.0)),
    "trace": lambda q: trace_samples(q.get("seconds", 1.0)),
}


def index() -> str:
    lines = ["# /debug/pprof — available profiles (Python analogues)"]
    for name in sorted(k for k in ROUTES if k):
        lines.append(f"/debug/pprof/{name}")
    lines.append(f"# live threads: {threading.active_count()}")
    return "\n".join(lines) + "\n"
