"""In-batch deduplication: last-wins and discriminator ("highest wins").

Reference semantics:

- last-wins by PK while writing the batch file
  (``/root/reference/bulkerlib/implementations/sql/abstract_transactional.go:439-496``)
- discriminator field: keep the row with the **highest** discriminator value
  per PK instead of arrival order (``abstract_transactional.go:462-489``,
  option ``bulkerlib/options.go:129-147``).

Spark-first, two formulations with identical results:

- window ``row_number`` per PK (``dedup_last_wins``/``dedup_discriminator``)
  — the direct expression; a hot PK serializes into one task.
- hash-agg ``max_by`` (``*_agg`` variants, the engine's default path) —
  map-side partial aggregation pre-reduces every input partition to one
  candidate per PK before the shuffle, so skewed keys ship O(partitions)
  rows, not O(duplicates). Same single shuffle, skew-safe at 100 TB.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

ORDER_COLUMN = "__seq"


def with_sequence(df: DataFrame) -> DataFrame:
    """Attach an arrival-order sequence for last-wins semantics.

    ``monotonically_increasing_id`` encodes (partition id, in-partition
    offset), which reproduces Kafka consumption order per partition — the
    same guarantee the reference has (order within a topic partition).
    """
    return df.withColumn(ORDER_COLUMN, F.monotonically_increasing_id())


def dedup_last_wins(
    df: DataFrame,
    pk: Sequence[str],
    order_col: str | Column | None = None,
) -> DataFrame:
    """Keep the last row per PK (by ``order_col``, default arrival order)."""
    if not pk:
        return df
    added = False
    if order_col is None:
        if ORDER_COLUMN not in df.columns:
            df = with_sequence(df)
            added = True
        order = F.col(ORDER_COLUMN)
    elif isinstance(order_col, str):
        order = F.col(order_col)
    else:
        order = order_col
    w = Window.partitionBy(*[F.col(c) for c in pk]).orderBy(order.desc_nulls_last())
    out = df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1)
    drop = ["__rn"] + ([ORDER_COLUMN] if added else [])
    return out.drop(*drop)


def dedup_discriminator(
    df: DataFrame,
    pk: Sequence[str],
    discriminator: Sequence[str],
) -> DataFrame:
    """Keep the row with the highest discriminator value(s) per PK.

    Ties broken by arrival order (later wins), matching ``CompareAny`` +
    insertion order in the reference.
    """
    if ORDER_COLUMN not in df.columns:
        df = with_sequence(df)
        added = True
    else:
        added = False
    order_cols = [F.col(d).desc_nulls_last() for d in discriminator]
    order_cols.append(F.col(ORDER_COLUMN).desc())
    w = Window.partitionBy(*[F.col(c) for c in pk]).orderBy(*order_cols)
    out = df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1)
    drop = ["__rn"] + ([ORDER_COLUMN] if added else [])
    return out.drop(*drop)


def exact_distinct(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Exact duplicate-row elimination (hash aggregate; map-side combine)."""
    return df.dropDuplicates(list(cols)) if cols else df.dropDuplicates()


# -- skew-resistant variants (the engine's default path) ---------------------
#
# The window row_number forces every row of a PK into one task: a hot key
# (bot traffic, null-ish ids) serializes. max_by over a hash aggregate has
# map-side partial aggregation — each input partition pre-reduces to one
# candidate per PK before the shuffle, so a hot key ships one row per map
# task instead of all of them. Same single shuffle, same result.

def dedup_last_wins_agg(
    df: DataFrame,
    pk: Sequence[str],
    order_col: str | None = None,
) -> DataFrame:
    """Last-wins dedup as a hash aggregate (partial-agg, skew-resistant)."""
    if not pk:
        return df
    added = False
    if order_col is None:
        if ORDER_COLUMN not in df.columns:
            df = with_sequence(df)
            added = True
        order_col = ORDER_COLUMN
    row = F.struct(*[F.col(f"`{c}`") for c in df.columns])
    out = (
        df.groupBy(*[F.col(c) for c in pk])
        .agg(F.max_by(row, F.col(order_col)).alias("__r"))
        .select("__r.*")
    )
    return out.drop(ORDER_COLUMN) if added else out


def dedup_discriminator_agg(
    df: DataFrame,
    pk: Sequence[str],
    discriminator: Sequence[str],
) -> DataFrame:
    """Discriminator dedup as a hash aggregate: the max_by key is
    ``struct(discr..., __seq)`` — lexicographic, so highest discriminator
    wins and arrival order breaks ties; struct comparison ranks NULL lowest,
    matching the window's ``desc_nulls_last``."""
    if ORDER_COLUMN not in df.columns:
        df = with_sequence(df)
        added = True
    else:
        added = False
    row = F.struct(*[F.col(f"`{c}`") for c in df.columns])
    key = F.struct(
        *[F.col(f"`{d}`") for d in discriminator], F.col(ORDER_COLUMN)
    )
    out = (
        df.groupBy(*[F.col(c) for c in pk])
        .agg(F.max_by(row, key).alias("__r"))
        .select("__r.*")
    )
    return out.drop(ORDER_COLUMN) if added else out
