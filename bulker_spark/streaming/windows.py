"""Event-time windowed aggregation with watermark-bounded late data.

The reference has no event-time windowing (SURVEY §2.12 — its only
late-data bound is the merge window on upserts); Structured Streaming
gives tumbling/sliding/session windows for free, so the engine exposes
them as first-class stream transforms:

- :func:`tumbling_counts` — per-window event counts with a watermark: rows
  later than ``late_threshold`` behind the max seen event time are dropped
  and their windows finalized (state is evicted — bounded memory at any
  scale; without the watermark, state grows with time unboundedly).
- :func:`sliding_value_sum` — overlapping windows (slide < width).

Both return streaming DataFrames ready for ``writeStream`` in append mode
(watermark required for append) or update mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _ltz(df: DataFrame, ts_col: str) -> DataFrame:
    """Watermarks require TIMESTAMP (LTZ); parquet written by pandas/arrow
    is TIMESTAMP_NTZ. Coerce only when needed — a no-op for LTZ input."""
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def tumbling_counts(
    stream_df: DataFrame,
    ts_col: str = "ts",
    width: str = "10 minutes",
    late_threshold: str = "30 minutes",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Tumbling-window counts per ``group_cols`` with late-data eviction."""
    keys = [F.window(F.col(ts_col), width).alias("win")] + [
        F.col(c) for c in (group_cols or [])
    ]
    return (
        _ltz(stream_df, ts_col)
        .withWatermark(ts_col, late_threshold)
        .groupBy(*keys)
        .agg(F.count("*").alias("n"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *(group_cols or []),
            "n",
        )
    )


def sliding_value_sum(
    stream_df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    width: str = "10 minutes",
    slide: str = "5 minutes",
    late_threshold: str = "30 minutes",
) -> DataFrame:
    """Sliding-window sum (each event lands in width/slide windows)."""
    return (
        _ltz(stream_df, ts_col)
        .withWatermark(ts_col, late_threshold)
        .groupBy(F.window(F.col(ts_col), width, slide).alias("win"))
        .agg(F.round(F.sum(value_col), 2).alias("total"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "total",
        )
    )
