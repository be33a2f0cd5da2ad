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
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


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
