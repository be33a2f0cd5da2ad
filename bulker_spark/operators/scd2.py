"""Slowly-changing-dimension (type 2) maintenance.

The reference's merge surface is overwrite-in-place upsert only — matched
rows are replaced and their previous values are lost
(``/root/reference/bulkerlib/implementations/sql/sql_adapter_base.go:512-560``,
``snowflake.go:502-507``). SCD2 is the history-preserving sibling a
warehouse user reaches for next: every change to a tracked attribute
closes the current version row (``__valid_to`` stamped) and opens a new
one, so the dimension can be joined *as of* any point in time.

Spark-first shape: one full-outer join between the **current slice** of
the dimension and the (already deduped) snapshot batch decides
close/open/carry/insert per key in a single pass; closed history is
untouched and unioned back unchanged. Because batches are micro-batch
sized, the join side is broadcastable — the current slice streams through
a map-side join, no shuffle of the dimension. At 100 TB, storing the
current slice apart from closed history (``__is_current`` as a partition
column) means the closed majority is neither read nor rewritten.
"""

from __future__ import annotations

import datetime as _dt
from functools import reduce
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VALID_FROM = "__valid_from"
VALID_TO = "__valid_to"
IS_CURRENT = "__is_current"


def _stamp(batch: DataFrame, effective: _dt.datetime | str) -> DataFrame:
    eff = (
        F.col(str(effective)).cast("timestamp")
        if isinstance(effective, str) and effective in batch.columns
        else F.lit(effective).cast("timestamp")
    )
    return batch.withColumn("__eff", eff)


def scd2_init(
    batch: DataFrame,
    pk: Sequence[str],
    effective: _dt.datetime | str,
) -> DataFrame:
    """Bootstrap an SCD2 dimension from the first snapshot: every row is
    version-open. ``effective`` is a literal timestamp or the name of a
    batch column holding per-row effective times."""
    stamped = _stamp(batch.dropDuplicates(list(pk)), effective)
    return stamped.select(
        *[c for c in batch.columns],
        F.col("__eff").alias(VALID_FROM),
        F.lit(None).cast("timestamp").alias(VALID_TO),
        F.lit(True).alias(IS_CURRENT),
    )


def scd2_apply(
    target: DataFrame,
    batch: DataFrame,
    pk: Sequence[str],
    tracked: Sequence[str],
    effective: _dt.datetime | str,
    *,
    broadcast_batch: bool = True,
) -> DataFrame:
    """Apply a snapshot batch to an SCD2 dimension; returns the new full
    contents.

    Per key: tracked-attribute change (null-safe) → close the current row
    at ``effective`` and open a new version; unchanged → carry the current
    row; absent from the batch → carry (SCD2 never deletes); new key →
    open a first version. Re-applying the same batch is a no-op
    (idempotent), which is what lets the warehouse's
    offset-after-commit retry semantics replay a batch safely."""
    pk = list(pk)
    tracked = list(tracked)

    # schema evolution both ways: target-only columns null-fill on the
    # batch side, batch-first-seen columns are appended to the dimension
    target_biz = [
        c for c in target.columns if c not in (VALID_FROM, VALID_TO, IS_CURRENT)
    ]
    biz_cols = list(dict.fromkeys([*target_biz, *batch.columns]))
    for c in biz_cols:
        if c not in target.columns:
            target = target.withColumn(c, F.lit(None))
    history = target.filter(~F.col(IS_CURRENT))
    current = target.filter(F.col(IS_CURRENT))

    stamped = _stamp(batch.dropDuplicates(pk), effective)
    for c in biz_cols:
        if c not in batch.columns:
            stamped = stamped.withColumn(c, F.lit(None))
    b = stamped.select(
        *[F.col(f"`{c}`").alias(f"__b_{c}") for c in biz_cols], "__eff"
    )
    if broadcast_batch:
        b = F.broadcast(b)

    cond = reduce(
        lambda x, y: x & y,
        [current[c].eqNullSafe(F.col(f"__b_{c}")) for c in pk],
    )
    j = current.join(b, cond, "full_outer")

    in_target = reduce(
        lambda x, y: x | y, [current[c].isNotNull() for c in pk]
    )
    in_batch = F.col(f"__b_{pk[0]}").isNotNull()
    changed = ~reduce(
        lambda x, y: x & y,
        [current[c].eqNullSafe(F.col(f"__b_{c}")) for c in tracked],
    )

    # carried current rows: unmatched-by-batch, or matched-and-unchanged
    carried = j.filter(
        in_target & (~in_batch | ~changed)
    ).select(*[current[c].alias(c) for c in biz_cols], VALID_FROM, VALID_TO, IS_CURRENT)

    # closed versions of changed rows
    closed = j.filter(in_target & in_batch & changed).select(
        *[current[c].alias(c) for c in biz_cols],
        current[VALID_FROM].alias(VALID_FROM),
        F.col("__eff").alias(VALID_TO),
        F.lit(False).alias(IS_CURRENT),
    )

    # opened versions: changed keys + brand-new keys
    opened = j.filter(in_batch & (~in_target | changed)).select(
        *[F.col(f"__b_{c}").alias(c) for c in biz_cols],
        F.col("__eff").alias(VALID_FROM),
        F.lit(None).cast("timestamp").alias(VALID_TO),
        F.lit(True).alias(IS_CURRENT),
    )

    return history.unionByName(carried).unionByName(closed).unionByName(opened)


def scd2_current(dim: DataFrame) -> DataFrame:
    """The live snapshot (one row per key)."""
    return dim.filter(F.col(IS_CURRENT)).drop(VALID_FROM, VALID_TO, IS_CURRENT)


def scd2_as_of(dim: DataFrame, ts: _dt.datetime) -> DataFrame:
    """Point-in-time snapshot: the version valid at ``ts``. With
    ``__is_current`` (or a date bucket of ``__valid_from``) as a partition
    column, this prunes to the slice covering ``ts`` instead of scanning
    all history."""
    t = F.lit(ts).cast("timestamp")
    return dim.filter(
        (F.col(VALID_FROM) <= t)
        & (F.col(VALID_TO).isNull() | (F.col(VALID_TO) > t))
    ).drop(VALID_FROM, VALID_TO, IS_CURRENT)
