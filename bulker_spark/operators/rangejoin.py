"""Banded interval join — point-in-range matching without the cross-product.

Beyond the reference's operator surface (``SURVEY.md §2.5``): join fact
rows carrying a timestamp to dimension rows carrying ``[start, end)``
intervals. The naive plan — ``ON point >= start AND point < end`` — has
no equi-key, so Catalyst falls back to BroadcastNestedLoopJoin /
CartesianProduct: O(n·m) comparisons, unrunnable at 100 TB.

The banding trick makes it an equi-join: pick a bin width ``W`` at least
as large as the longest interval, band time into ``floor(t / W)``:

- each *point* lands in exactly one bin;
- each *interval* overlaps at most ``len/W + 1`` consecutive bins (≤ 2
  when ``W`` ≥ max interval length) and is emitted once per bin via an
  in-line ``sequence`` + ``explode`` — bounded fan-out, no skew blow-up;
- equi-join on ``(keys…, bin)`` then re-check the exact predicate.

Because a point has exactly one bin, no pair can match twice — no
post-join dedup. The shuffle is a plain hash exchange on ``(keys, bin)``
— AQE can split oversized bins; fan-out stays ≤ 2 rows per interval.
Used by ``events_in_error_window`` (keyed) and ``events_in_promo_window``
(keyless — the case where banding is the only scalable plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    point: str,
    start: str,
    end: str,
    left_keys: list[str] | None = None,
    right_keys: list[str] | None = None,
    bin_seconds: int = 7 * 24 * 3600,
    how: str = "inner",
) -> DataFrame:
    """Join ``left`` rows whose ``point`` falls in ``[start, end)`` of
    ``right`` rows (optionally also matching ``left_keys == right_keys``).

    ``bin_seconds`` must be ≥ the longest interval for the ≤2-bins bound
    to hold; longer intervals still work (fan-out grows with
    ``len/bin_seconds``). ``how`` is ``inner`` or ``left`` (unmatched
    left rows kept with null right columns).

    Returns all left columns plus all right columns.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    lkeys = left_keys or []
    rkeys = right_keys or []
    if len(lkeys) != len(rkeys):
        raise ValueError("left_keys and right_keys must have the same arity")

    w_us = F.lit(int(bin_seconds) * 1_000_000)

    def _us(c: str):
        # unix_micros rejects TIMESTAMP_NTZ; normalize (session tz applies
        # the same constant shift to points and intervals, so binning stays
        # consistent — run UTC sessions regardless)
        return F.unix_micros(F.col(c).cast("timestamp"))

    if how == "left":
        # row identity for the complement anti-join: value equality would
        # drop/duplicate rows containing nulls. Deterministic for a fixed
        # scan (partition index + offset).
        left = left.withColumn("__rid", F.monotonically_increasing_id())
    l_binned = left.withColumn(
        "__bin", F.floor(_us(point) / w_us)
    )
    # one copy of each interval per overlapped bin; end is exclusive so
    # an interval ending exactly on a bin edge does not enter that bin
    r_binned = right.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(_us(start) / w_us),
                F.floor((_us(end) - 1) / w_us),
            )
        ),
    )

    cond = [l_binned["__bin"] == r_binned["__bin"]] + [
        l_binned[lk] == r_binned[rk] for lk, rk in zip(lkeys, rkeys)
    ]
    exact = (l_binned[point] >= r_binned[start]) & (
        l_binned[point] < r_binned[end]
    )
    matched = (
        l_binned.join(r_binned, cond, "inner")
        .where(exact)
        .select(
            *[l_binned[c] for c in left.columns],
            *[r_binned[c] for c in right.columns],
        )
    )
    if how == "inner":
        return matched

    # left join: complement = left rows with no banded match at all
    probe = matched.select("__rid").distinct()
    unmatched = left.join(probe, on="__rid", how="left_anti")
    null_right = unmatched.select(
        "*",
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(c)
            for c in right.columns
        ],
    )
    out_cols = [c for c in left.columns if c != "__rid"] + list(right.columns)
    return matched.unionByName(null_right).select(*out_cols)
