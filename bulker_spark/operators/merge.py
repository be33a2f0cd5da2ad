"""MERGE (upsert) builder with merge-window pruning.

Reference semantics:

- merge = PK equi-join upsert (``MERGE INTO``/``ON CONFLICT``/delete+insert
  per dialect): ``/root/reference/bulkerlib/implementations/sql/sql_adapter_base.go:512-560``,
  ``redshift.go:260-331``, ``bigquery.go:230-264``, ``snowflake.go:502-507``
- merge-window bounding: only target rows with
  ``timestampColumn >= now() - deduplicateWindow`` participate; the window
  shrinks to ceil(batch age in days), clamped [1, 365]
  (``transactional_stream.go:91-100``, option ``options.go:41-45``).

Spark-first (no Delta in this environment): upsert = anti-join the *live*
slice of the target against the deduped source, union with the source, and
atomically swap (see sinks/warehouse.py). The timestamp predicate makes the
target scan **partition-prunable** when the table is partitioned by a date
derivative of the timestamp column — at 100 TB that predicate is the
difference between scanning a year and scanning a day. The source side of
the anti-join is a just-deduped micro-batch → almost always broadcastable;
we hint broadcast when the source is a batch.
"""

from __future__ import annotations

import datetime as _dt
import math
from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class MergeWindow:
    """deduplicateWindow days, shrunk to the batch's actual age."""

    days: int = 365

    def effective_days(self, batch_min_ts: _dt.datetime | None, now: _dt.datetime) -> int:
        if batch_min_ts is None:
            return self.days
        if batch_min_ts.tzinfo is not None:
            batch_min_ts = batch_min_ts.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        if now.tzinfo is not None:
            now = now.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        age_days = max((now - batch_min_ts).total_seconds() / 86400.0, 0.0)
        return max(1, min(self.days, math.ceil(age_days)))


def batch_min_timestamp(df: DataFrame, ts_col: str) -> _dt.datetime | None:
    """Running min of the timestamp column (abstract_transactional.go:451-456)."""
    if ts_col not in df.columns:
        return None
    row = df.agg(F.min(F.col(ts_col)).alias("m")).collect()[0]
    return row["m"]


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    pk: Sequence[str],
    *,
    timestamp_column: str | None = None,
    window_days: int | None = None,
    now: _dt.datetime | None = None,
    broadcast_source: bool = True,
) -> DataFrame:
    """Return the post-merge contents of the target table.

    rows = (target rows NOT matched by source PK within the merge window)
         ∪ (target rows outside the window — untouched, never scanned for
            match when the predicate prunes partitions)
         ∪ source rows.

    The source must already be deduped per PK. Columns are aligned by name
    (missing columns null-filled) to support schema evolution.
    """
    all_cols = list(dict.fromkeys([*target.columns, *source.columns]))

    def align(df: DataFrame) -> DataFrame:
        cols = [
            F.col(f"`{c}`").alias(c) if c in df.columns else F.lit(None).alias(c)
            for c in all_cols
        ]
        return df.select(*cols)

    target_a, source_a = align(target), align(source)

    if timestamp_column and window_days is not None and timestamp_column in all_cols:
        now = now or _dt.datetime.utcnow()
        cutoff = now - _dt.timedelta(days=window_days)
        in_window = F.col(timestamp_column) >= F.lit(cutoff)
        live = target_a.filter(in_window)
        frozen = target_a.filter(~in_window | F.col(timestamp_column).isNull())
    else:
        live = target_a
        frozen = None

    join_source = source_a.select(*pk).dropDuplicates(list(pk))
    if broadcast_source:
        join_source = F.broadcast(join_source)
    kept = live.join(join_source, on=list(pk), how="left_anti")

    out = kept.unionByName(source_a)
    if frozen is not None:
        out = out.unionByName(frozen)
    return out


# partition-id format by value width: "2024" / "2024-01" / "2024-01-03" /
# "2024-01-03-14" (see api.py timestamp_partition formats); all are
# fixed-width and lexicographically ordered, so string >= is time >=
_PARTITION_FORMATS = {4: "%Y", 7: "%Y-%m", 10: "%Y-%m-%d", 13: "%Y-%m-%d-%H"}


def partition_cutoff_id(sample_partition_value: str, cutoff: _dt.datetime) -> str:
    """The partition id of the bucket containing ``cutoff``: partitions
    lexically >= it may hold in-window rows; everything below is frozen."""
    fmt = _PARTITION_FORMATS.get(len(sample_partition_value))
    if fmt is None:
        raise ValueError(
            f"unrecognized partition id format: {sample_partition_value!r}"
        )
    return cutoff.strftime(fmt)


def merge_upsert_live_slice(
    target: DataFrame,
    source: DataFrame,
    pk: Sequence[str],
    partition_col: str,
    cutoff_id: str,
    broadcast_source: bool = True,
) -> DataFrame:
    """The rewritten slice of a partition-pruned merge: (in-window target
    rows not matched by source PK) ∪ source. Frozen partitions
    (``partition_col < cutoff_id``) are neither read nor returned — the
    caller rewrites only the returned partitions (dynamic overwrite)."""
    all_cols = list(dict.fromkeys([*target.columns, *source.columns]))

    def align(df: DataFrame) -> DataFrame:
        cols = [
            F.col(f"`{c}`").alias(c) if c in df.columns else F.lit(None).alias(c)
            for c in all_cols
        ]
        return df.select(*cols)

    live = align(target).filter(F.col(partition_col) >= F.lit(cutoff_id))
    join_source = align(source).select(*pk).dropDuplicates(list(pk))
    if broadcast_source:
        join_source = F.broadcast(join_source)
    kept = live.join(join_source, on=list(pk), how="left_anti")
    return kept.unionByName(align(source))


def merge_delete_insert_sql(
    table: str,
    staging: str,
    pk: Sequence[str],
    timestamp_column: str | None = None,
    cutoff_literal: str | None = None,
) -> list[str]:
    """Dialect-parity surface: the DELETE-then-INSERT statement pair the
    reference issues on Redshift (``redshift.go:260-331``). Used by the JDBC
    sink passthrough; the native path uses :func:`merge_upsert`."""
    on = " AND ".join(f'"{table}"."{c}" = "{staging}"."{c}"' for c in pk)
    where = f" AND \"{table}\".\"{timestamp_column}\" >= {cutoff_literal}" if (
        timestamp_column and cutoff_literal
    ) else ""
    return [
        f'DELETE FROM "{table}" USING "{staging}" WHERE {on}{where}',
        f'INSERT INTO "{table}" SELECT * FROM "{staging}"',
    ]
