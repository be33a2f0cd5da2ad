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

- the carry rides the bucketed two-phase pass
  (``operators/hotkey.carry_over_buckets``): the heavy window runs per
  (key, time-bucket) and a per-bucket summary carries state across
  boundaries — a bot user's million-row stream spreads over per-day
  partitions instead of the single task a plain
  ``partitionBy(key)`` window would pin it to (the measured 11-28x
  hot-key walls of SCALING.md's round-7 sweep). Still ONE logical
  shuffle family on the key, no pair blow-up.
- right rows sort before left rows at equal timestamps (``side`` 0 < 1)
  so the match is inclusive; among same-timestamp right rows the
  ascending ``tiebreak`` makes the carry deterministic (greatest wins).
- ``forward`` negates the epoch-micros order column; same single pass
  (the bucketed helper needs ascending order columns, so direction is
  encoded in the value, not the sort).
- carried columns keep the original per-column ``last(...,
  ignorenulls)`` semantics (each column independently carried).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .hotkey import carry_over_buckets


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
    # the bucketed carry orders ASCENDING, so direction lives in the
    # order VALUE: epoch micros for backward, negated for forward
    # (NTZ/date cast to timestamp under the engine's fixed UTC session
    # zone — a constant offset, order-preserving). The strictly-before
    # frame of carry_over_buckets equals the original inclusive frame
    # at every LEFT row: the left row itself carries only nulls, and a
    # same-timestamp right row sorts before it via __side 0 < 1.
    sign = 1 if direction == "backward" else -1
    merged = l_side.unionByName(r_side).withColumn(
        "__o",
        F.lit(sign) * F.unix_micros(F.col("__t").cast("timestamp")),
    )
    matched = carry_over_buckets(
        merged,
        keys=keys,
        order=["__o", "__side", "__tb"],
        carry_cols={f"__r_{c}": f"__r_{c}" for c in carried},
        bucket=F.floor(F.col("__o") / F.lit(86_400_000_000)),
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
