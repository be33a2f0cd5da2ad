"""As-of (nearest-timestamp) join — union-and-window, one shuffle.

Beyond the reference's operator surface (bulker has no joins past the
PK merge, ``SURVEY.md §2.5``), but essential for event enrichment at
scale: attach to each fact row the most recent dimension row at or
before its timestamp (``backward``), or the earliest at or after it
(``forward``).

Spark-first plan: the naive formulations — a correlated subquery per
row, or a range join ``l.key = r.key AND r.ts <= l.ts`` followed by a
per-row argmax — both explode: Catalyst executes the range predicate as
a join that emits every (fact, earlier-dim) pair, O(n·m) per key,
before the window prunes it. Instead we UNION the two sides into one
ordered stream per key and carry the right payload forward with
``last(col, ignorenulls=True)`` over ``(key) ORDER BY (ts, side,
tiebreak) ROWS UNBOUNDED PRECEDING``:

- ONE hash shuffle on the key (the same shuffle the equi-join would
  pay), then a linear single-pass window per partition — no
  intermediate pair blow-up, no second shuffle.
- right rows sort before left rows at equal timestamps (``side`` 0 < 1)
  so the match is inclusive; among same-timestamp right rows the
  ascending ``tiebreak`` makes ``last`` deterministic (greatest wins).
- ``forward`` flips the sort to descending; same single pass.
- at 100 TB the window state is one row of carried payload per key —
  no growth with history length; hot keys degrade to a sequential scan
  of that key's rows (the same cost any ordered merge pays), never to
  a cross product.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_on: str | list[str],
    right_on: str | list[str],
    left_ts: str,
    right_ts: str,
    payload: list[str] | None = None,
    direction: str = "backward",
    tolerance: Column | None = None,
    tiebreak: str | None = None,
    suffix: str = "",
) -> DataFrame:
    """For each ``left`` row, attach the nearest ``right`` row per key.

    ``backward``: latest right row with ``right_ts <= left_ts``;
    ``forward``: earliest with ``right_ts >= left_ts``. Ties on
    ``right_ts`` resolve to the greatest ``tiebreak`` value (required
    for a deterministic result when a key can have equal timestamps).
    ``tolerance`` (a Column interval, e.g. ``F.expr("INTERVAL 30
    DAYS")``) nulls out matches farther than the bound.

    Returns all ``left`` columns plus ``payload`` columns (default: all
    non-key, non-ts right columns), each renamed with ``suffix``, plus
    ``<right_ts><suffix>`` — null where no match.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    lkeys = [left_on] if isinstance(left_on, str) else list(left_on)
    rkeys = [right_on] if isinstance(right_on, str) else list(right_on)
    if len(lkeys) != len(rkeys):
        raise ValueError("left_on and right_on must have the same arity")
    if payload is None:
        payload = [c for c in right.columns if c not in (*rkeys, right_ts)]
    carried = [right_ts, *payload]  # right_ts rides along for tolerance/output
    out_names = {c: f"{c}{suffix}" for c in carried}

    lcols = [c for c in left.columns]
    l_side = left.select(
        *[F.col(k).alias(f"__k{i}") for i, k in enumerate(lkeys)],
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(right.schema[tiebreak].dataType).alias("__tb")
        if tiebreak
        else F.lit(0).alias("__tb"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in carried],
    )
    r_side = right.select(
        *[F.col(k).alias(f"__k{i}") for i, k in enumerate(rkeys)],
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        (F.col(tiebreak) if tiebreak else F.lit(0)).alias("__tb"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"__r_{c}") for c in carried],
    )

    keys = [f"__k{i}" for i in range(len(lkeys))]
    # last() takes the final row in window order, so ascending tiebreak
    # means the greatest value wins ties in either direction
    t_ord = F.col("__t").asc() if direction == "backward" else F.col("__t").desc()
    order = [t_ord, F.col("__side").asc(), F.col("__tb").asc_nulls_first()]
    w = (
        W.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )

    merged = l_side.unionByName(r_side)
    matched = merged.select(
        *keys,
        "__side",
        *lcols,
        *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__r_{c}") for c in carried],
    ).where(F.col("__side") == 1)

    if tolerance is not None:
        gap_ok = (
            F.col(f"__r_{right_ts}") >= F.col(left_ts) - tolerance
            if direction == "backward"
            else F.col(f"__r_{right_ts}") <= F.col(left_ts) + tolerance
        )
        matched = matched.select(
            *keys,
            *lcols,
            *[
                F.when(gap_ok, F.col(f"__r_{c}")).alias(f"__r_{c}")
                for c in carried
            ],
        )

    return matched.select(
        *lcols, *[F.col(f"__r_{c}").alias(out_names[c]) for c in carried]
    )
