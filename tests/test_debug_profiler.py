"""Unit tests for the pprof-analogue profilers (app/debug_profiler.py) —
no Spark session needed; the HTTP routing is covered by
test_http_router.py::test_debug_pprof_surface."""

import sys
import threading
import time

from bulker_spark.app import debug_profiler as dp


def test_goroutine_dump_contains_this_thread():
    out = dp.goroutine_dump()
    assert f"thread {threading.get_ident()}" in out
    assert "test_goroutine_dump_contains_this_thread" in out


def test_blocked_dump_sees_a_waiting_thread():
    release = threading.Event()

    def waiter():
        release.wait(timeout=10)

    t = threading.Thread(target=waiter, name="blocked-probe", daemon=True)
    t.start()
    time.sleep(0.05)
    try:
        out = dp.blocked_dump("block")
        assert "blocked-probe" in out
        assert "# blocked threads:" in out
    finally:
        release.set()
        t.join()


def test_threadcreate_and_cmdline_and_symbol():
    inv = dp.threadcreate_dump()
    assert "MainThread" in inv
    assert "\x00".join(sys.argv) == dp.cmdline()
    assert dp.symbol() == "num_symbols: 0\n"


def test_profile_folded_stacks_capture_a_busy_thread():
    stop = threading.Event()

    def spin():
        while not stop.is_set():
            sum(range(1000))

    t = threading.Thread(target=spin, name="spin-probe", daemon=True)
    t.start()
    try:
        out = dp.sample_profile(seconds=0.2, hz=200)
        assert out.startswith("# folded stacks")
        # the folded format: thread;frame;frame count
        assert any(
            ln.startswith("spin-probe;") and ln.rsplit(" ", 1)[1].isdigit()
            for ln in out.splitlines()[1:]
        )
    finally:
        stop.set()
        t.join()


def test_trace_is_time_ordered():
    # the sampler excludes its own (calling) thread, so give it a peer
    # to observe — a bare process would legitimately trace nothing
    stop = threading.Event()
    t = threading.Thread(
        target=lambda: stop.wait(10), name="trace-probe", daemon=True
    )
    t.start()
    try:
        out = dp.trace_samples(seconds=0.05, hz=100)
    finally:
        stop.set()
        t.join()
    ts = [
        int(ln.split()[0])
        for ln in out.splitlines()[1:]
        if ln and ln[0].isdigit()
    ]
    assert ts == sorted(ts) and ts


def test_seconds_and_limit_clipping():
    assert dp._clip_seconds("0.01", 1.0) == 0.01
    assert dp._clip_seconds("9999", 1.0) == dp._MAX_SECONDS
    assert dp._clip_seconds("bogus", 1.0) == 1.0
    assert dp._clip_int("abc", 40) == 40
    assert dp._clip_int("-3", 40) == 1
    assert dp._clip_int(None, 40) == 40


def test_heap_snapshot_starts_then_reports():
    import tracemalloc

    try:
        first = dp.heap_snapshot()
        if "tracemalloc started" in first:
            second = dp.heap_snapshot(limit=5)
            assert "# traced:" in second
        else:  # tracing already active from another test order
            assert "# traced:" in first
    finally:
        tracemalloc.stop()


def test_index_lists_every_route():
    idx = dp.index()
    for r in sorted(k for k in dp.ROUTES if k):
        assert f"/debug/pprof/{r}" in idx


def test_heap_snapshot_stop_removes_tracer():
    import tracemalloc

    try:
        dp.heap_snapshot()  # ensure started
        out = dp.heap_snapshot(stop=True)
        assert "stopped" in out
        assert not tracemalloc.is_tracing()
        again = dp.heap_snapshot(stop=True)
        assert "was not running" in again
    finally:
        if tracemalloc.is_tracing():
            tracemalloc.stop()


def test_blocked_dump_ignores_app_module_named_like_stdlib(tmp_path):
    """An APPLICATION module named connection.py with a function named
    'wait' must not be reported as parked — the filter matches the
    resolved stdlib/py4j file paths, not basenames (advice r7)."""
    import importlib.util
    import time as _time

    mod_file = tmp_path / "connection.py"
    mod_file.write_text(
        "import threading\n"
        "def wait(stop):\n"
        "    while not stop.is_set():\n"
        "        pass\n"
    )
    spec = importlib.util.spec_from_file_location("app_connection", mod_file)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    stop = threading.Event()
    t = threading.Thread(
        target=mod.wait, args=(stop,), name="fake-conn-probe", daemon=True
    )
    t.start()
    _time.sleep(0.05)
    try:
        out = dp.blocked_dump("block")
        assert "fake-conn-probe" not in out
    finally:
        stop.set()
        t.join()


def test_blocked_dump_ignores_app_functions_named_like_waits():
    """An application function called 'read' must not be reported as
    parked — the wait heuristic is qualified by stdlib module, not name
    alone (ADVICE r6)."""
    import time as _time

    stop = threading.Event()

    def read():  # app-level name collision with the wait list
        while not stop.is_set():
            _time.sleep(0)  # C-level sleep: 'read' stays the top frame

    t = threading.Thread(target=read, name="fake-read-probe", daemon=True)
    t.start()
    _time.sleep(0.05)
    try:
        out = dp.blocked_dump("block")
        assert "fake-read-probe" not in out
    finally:
        stop.set()
        t.join()
