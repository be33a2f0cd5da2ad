"""Streaming joins: enrichment at ingest time.

Not in the reference (its enrichment lives outside the engine, in
"rotor"); Structured Streaming gives both forms natively, so the engine
exposes them as first-class transforms:

- :func:`enrich_static` — stream ⋈ dimension table. The dim side is
  broadcast per micro-batch; at 100 TB of stream the dim stays a
  broadcast as long as it fits an executor (~8 GB hard Spark cap) —
  beyond that, pre-bucket both sides on the key.
- :func:`join_streams` — stream ⋈ stream with watermarks + a time-range
  condition; state for both sides is bounded by the watermark delay, so
  memory is O(rate × window), not O(history).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_static(
    stream_df: DataFrame,
    dim_df: DataFrame,
    on: list[str],
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static enrichment join (dim re-read each micro-batch, so
    dimension updates are picked up without restarting the query)."""
    dim = F.broadcast(dim_df) if broadcast_dim else dim_df
    return stream_df.join(dim, on=on, how=how)


from bulker_spark.streaming.windows import _ltz  # one coercion rule, not two


def join_streams(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    max_delay: str = "30 minutes",
    tolerance: str = "1 hour",
) -> DataFrame:
    """Stream-stream inner join: equality on ``on`` plus a bounded
    event-time gap (|left_ts − right_ts| ≤ tolerance). Both sides are
    watermarked by ``max_delay`` — that bound is what lets Spark evict
    join state instead of buffering both streams forever."""
    lw = _ltz(left, left_ts).withWatermark(left_ts, max_delay)
    rw = _ltz(right, right_ts).withWatermark(right_ts, max_delay)
    lcol, rcol = F.col(f"l.{left_ts}"), F.col(f"r.{right_ts}")
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (rcol >= lcol - F.expr(f"INTERVAL {tolerance}"))
        & (rcol <= lcol + F.expr(f"INTERVAL {tolerance}"))
    )
    return lw.alias("l").join(rw.alias("r"), cond, "inner").drop(
        F.col(f"r.{on}")  # keep one copy of the join key
    )
