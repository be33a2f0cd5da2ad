"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference dedups only within a batch plus a bounded merge window against
the warehouse (``abstract_transactional.go:439-496``). Structured Streaming
lets us hold the "seen PKs" set as **operator state** instead, giving exact
cross-batch dedup without re-reading the target:

- :func:`streaming_dedup` — first-wins dedup across micro-batches; state is
  one row per PK with a processing-time TTL (the merge-window analogue:
  state size is bounded by PK cardinality within the window, and the TTL
  evicts cold keys exactly like the reference's window bounds the DELETE).
- :func:`streaming_sessionize` — gap-based sessions; sessions are emitted
  when the inactivity gap elapses (processing-time timeout), the streaming
  twin of the batch ``events_sessionize`` query.

State is partitioned by key → scales horizontally with executors; each
key's state is O(1). Spark checkpoints the state store, so a restarted
query resumes with its dedup memory intact.

**availableNow + processing-time timeouts DO NOT TERMINATE** (measured,
round 8): a drain trigger keeps scheduling empty micro-batches so
registered processing-time timeouts can fire — with a 30-minute session
gap or a 24-hour dedup TTL the "drain" spins empty batches for that
long (the round-8 streaming skew audit caught ``streaming_sessionize``
still active after 600 s with all 2M rows processed in the first 30 s).
Use :func:`drain_and_stop` to drain such queries, or prefer the
event-time twins (:func:`streaming_dedup_native`,
:func:`streaming_sessionize_event_time`) whose timeouts ride the
watermark and terminate naturally.
"""

from __future__ import annotations

import time as _time
from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def drain_and_stop(
    query,
    idle_batches: int = 2,
    poll_s: float = 0.5,
    timeout_s: float = 600.0,
) -> bool:
    """Wait for an ``availableNow`` streaming query to drain, then stop
    it — required for stateful queries with PROCESSING-TIME timeouts,
    which never self-terminate under availableNow (module docstring).

    Returns once the query terminated on its own, or after
    ``idle_batches`` consecutive completed micro-batches processed zero
    input rows (all source data consumed — the empty batches are the
    timeout-polling spin), at which point the query is stopped. Open
    state (unexpired sessions, live dedup keys) stays in the checkpoint
    for the next run, exactly as if the query had kept running. Returns
    True if the query terminated by itself, False if it was stopped.
    A query that DIED raises its StreamingQueryException instead of
    reporting success (review r8 — awaitTermination's contract)."""
    deadline = _time.monotonic() + timeout_s
    idle = 0
    last_batch = -1
    while query.isActive and _time.monotonic() < deadline:
        p = query.lastProgress
        if p is not None and p.get("batchId", -1) != last_batch:
            last_batch = p.get("batchId", -1)
            if (p.get("numInputRows") or 0) == 0:
                idle += 1
                if idle >= idle_batches:
                    query.stop()
                    query.awaitTermination(30)
                    return False
            else:
                idle = 0
        _time.sleep(poll_s)
    if query.isActive:
        query.stop()
        query.awaitTermination(30)
        return False
    # inactive without our stop: either clean self-termination or a
    # crash — awaitTermination re-raises the query's exception if any
    query.awaitTermination(30)
    return True


def streaming_dedup(
    stream_df: DataFrame,
    pk_cols: list[str],
    ttl_ms: int = 24 * 3600 * 1000,
) -> DataFrame:
    """Exact first-wins dedup across micro-batches.

    Emits each PK's first-seen row; subsequent arrivals are dropped while
    the key's state lives (``ttl_ms`` processing-time TTL)."""
    out_schema = stream_df.schema
    state_schema = T.StructType([T.StructField("seen", T.BooleanType())])

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        already = state.exists
        if not already:
            for pdf in pdfs:
                if len(pdf):
                    state.update((True,))
                    state.setTimeoutDuration(ttl_ms)
                    yield pdf.head(1)
                    return
        else:
            state.setTimeoutDuration(ttl_ms)
            for _ in pdfs:
                pass

    return (
        stream_df.groupBy(*[F.col(c) for c in pk_cols])
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def streaming_dedup_native(
    stream_df: DataFrame,
    pk_cols: list[str],
    ts_col: str,
    delay: str = "24 hours",
) -> DataFrame:
    """Cross-batch dedup on the JVM-NATIVE state path:
    ``withWatermark(ts) + dropDuplicatesWithinWatermark(pk)``.

    The event-time twin of :func:`streaming_dedup` (which keys state on
    a processing-time TTL via ``applyInPandasWithState``): duplicates of
    a key are dropped for as long as its first row is within the
    watermark ``delay``; state for keys older than the watermark is
    evicted by the engine. The state store, eviction, and comparisons
    all stay inside the JVM (no Arrow transfer, no Python in the
    per-event path), and unlike plain ``dropDuplicates`` on a stream the
    state is BOUNDED — the watermark trims it, so a long-running query
    cannot accumulate unbounded key state.

    SEMANTIC TRADEOFF vs the TTL twin: the watermark also gates
    ADMISSION — an event arriving more than ``delay`` behind the
    observed max event time is DROPPED by the stateful operator, never
    emitted. :func:`streaming_dedup` has no event-time notion and would
    deliver such a row. Choose this form when late data beyond the
    delay is acceptable to discard (the usual contract wherever a
    watermark appears); choose the TTL form when every event must come
    out exactly once regardless of its event-time skew."""
    return stream_df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        pk_cols
    )


SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def streaming_sessionize(
    stream_df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_ms: int = 30 * 60 * 1000,
) -> DataFrame:
    """Gap-based sessionization: a session closes when no event arrives for
    ``gap_ms``; closed sessions are emitted (append mode)."""
    state_schema = T.StructType(
        [
            T.StructField("start", T.TimestampType()),
            T.StructField("end", T.TimestampType()),
            T.StructField("n", T.LongType()),
        ]
    )

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            start, end, n = state.get
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        "user_id": key[0],
                        "session_start": start,
                        "session_end": end,
                        "n_events": n,
                    }
                ]
            )
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        if not len(rows):
            return
        ts = pd.to_datetime(rows[ts_col])
        lo, hi, cnt = ts.min(), ts.max(), len(rows)
        if state.exists:
            start, end, n = state.get
            lo = min(lo, pd.Timestamp(start))
            hi = max(hi, pd.Timestamp(end))
            cnt += n
        state.update((lo.to_pydatetime(), hi.to_pydatetime(), cnt))
        state.setTimeoutDuration(gap_ms)

    return stream_df.groupBy(F.col(user_col)).applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def streaming_sessionize_event_time(
    stream_df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_s: int = 30 * 60,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """EVENT-TIME gap sessionization — the exact streaming twin of the
    batch ``events_sessionize`` query (30-min inactivity measured in
    event time, not arrival time), and the availableNow-safe variant:
    timeouts ride the watermark (``EventTimeTimeout``), so a drain run
    terminates once the data is consumed instead of spinning empty
    batches until a processing-time timer fires (module docstring).

    Semantics: a user's events split into sessions wherever consecutive
    event times are > ``gap_s`` apart. A session is EMITTED once the
    watermark passes ``session_end + gap_s`` (no event admissible by
    the watermark can extend or split it any more — late data within
    ``watermark_delay`` is handled exactly); open sessions persist in
    the checkpointed state for the next run. State per key is the list
    of still-open sessions — bounded by ``watermark_delay / gap_s + 1``
    entries, independent of event count.

    Hot keys: the per-key Pandas work is a sort + linear gap-merge of
    the key's rows in THIS micro-batch — O(k log k) on the batch slice,
    never on history (sessions are interval summaries). The round-8
    streaming skew audit measured ≤2x max/median task time on the Zipf
    bot-user fixture for the state stages."""
    gap_ms = gap_s * 1000
    # the Arrow transfer delivers timestamps as SESSION-TIMEZONE-naive
    # pandas datetimes, while getCurrentWatermarkMs() is true UTC epoch
    # ms — comparing them raw would skew seal/timeout decisions by the
    # tz offset (review r8: sessions sealed hours early west of UTC).
    # Capture the effective session tz at construction and localize.
    session_tz = stream_df.sparkSession.conf.get(
        "spark.sql.session.timeZone"
    )
    state_schema = T.StructType(
        [
            T.StructField("starts", T.ArrayType(T.LongType())),
            T.StructField("ends", T.ArrayType(T.LongType())),
            T.StructField("ns", T.ArrayType(T.LongType())),
        ]
    )

    def _from_ms(ms: int):
        # back to session-tz-naive so the emitted timestamp round-trips
        return (
            pd.Timestamp(ms, unit="ms", tz="UTC")
            .tz_convert(session_tz)
            .tz_localize(None)
            .to_pydatetime()
        )

    def _emit(key, closed):
        return pd.DataFrame(
            [
                {
                    "user_id": key[0],
                    "session_start": _from_ms(s),
                    "session_end": _from_ms(e),
                    "n_events": n,
                }
                for s, e, n in closed
            ]
        )

    def _split_emit(key, sessions, state: GroupState):
        """Emit sessions sealed by the watermark; keep the rest."""
        wm = state.getCurrentWatermarkMs()
        # STRICT <: an admissible event at exactly ts == wm == end+gap
        # would still merge (gap is inclusive), so only seal sessions
        # the watermark has passed beyond
        closed = [x for x in sessions if x[1] + gap_ms < wm]
        open_ = [x for x in sessions if x[1] + gap_ms >= wm]
        if open_:
            state.update(
                (
                    [x[0] for x in open_],
                    [x[1] for x in open_],
                    [x[2] for x in open_],
                )
            )
            # fire when the watermark passes the earliest open seal point
            state.setTimeoutTimestamp(
                max(min(x[1] + gap_ms for x in open_), wm + 1)
            )
        else:
            state.remove()
        if closed:
            yield _emit(key, closed)

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        prior = (
            list(zip(*state.get)) if state.exists else []
        )  # [(start_ms, end_ms, n)]
        if state.hasTimedOut:
            yield from _split_emit(key, prior, state)
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        if not len(rows):
            yield from _split_emit(key, prior, state)
            return
        # localize the session-tz-naive timestamps to true UTC epoch ms
        # so every comparison against the watermark is tz-correct; DST
        # ambiguity raises rather than silently mis-sealing
        ts = (
            pd.to_datetime(rows[ts_col])
            .dt.tz_localize(session_tz)
            .astype("int64")
            // 1_000_000
        ).sort_values()
        # gap-split the batch slice, then interval-merge with the open
        # sessions (both lists sorted by start; a session absorbs the
        # next interval when the gap between end and next start <= gap)
        batch_sessions = []
        start = end = None
        cnt = 0
        for t in ts:
            if start is None:
                start, end, cnt = t, t, 1
            elif t - end <= gap_ms:
                end, cnt = t, cnt + 1
            else:
                batch_sessions.append((start, end, cnt))
                start, end, cnt = t, t, 1
        if start is not None:
            batch_sessions.append((start, end, cnt))
        merged = []
        for s in sorted(prior + batch_sessions):
            if merged and s[0] - merged[-1][1] <= gap_ms:
                last = merged[-1]
                merged[-1] = (
                    last[0],
                    max(last[1], s[1]),
                    last[2] + s[2],
                )
            else:
                merged.append(s)
        yield from _split_emit(key, merged, state)

    return (
        stream_df.withWatermark(ts_col, watermark_delay)
        .groupBy(F.col(user_col))
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
