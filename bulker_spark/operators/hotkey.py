"""Hot-key-proof per-key sequential windows: split an unsplittable
``Window.partitionBy(key)`` into a bucketed two-phase plan.

The hazard (measured, not hypothetical): a ``partitionBy(user_id)``
window puts one user's ENTIRE stream into a single task. On the Zipf
fixture (``scripts/gen_skew.py`` — one bot user owning 50% of 2M
events) the naive shape measured 11-13x max/median task time on the
sessionize queries (SCALING.md skew tier); AQE cannot split a window
partition, so the wall survives any shuffle-partition count and only
grows with data. At 100 TB a bot user is the NORMAL case in web-event
corpora.

The fix, shared by every helper here (the same two-phase scheme as
``plans/queries._merge_bucketed_sessions``):

1. **Heavy pass** — the window runs per ``(key, time-bucket)``. Every
   partition is bounded by one key-day (or key-``bucket_width``), so
   the hot key spreads over #buckets splittable tasks.
2. **Light pass** — a per-``(key, bucket)`` SUMMARY (a few scalars per
   bucket, independent of event count) rides the only per-key window,
   carrying state across bucket boundaries: the previous bucket's last
   row for lag, the running prefix for cumulative sums, the last
   non-null for carry-forward.
3. **Join-back** — summaries join to the event rows on
   ``(key, bucket)`` — splittable, and hash-partitioned the same way
   as the heavy pass so the exchange is reusable.

Outputs are BIT-IDENTICAL to the naive global window (the strict
DuckDB oracles of every rewritten catalog query are unchanged);
``tests/test_hotkey.py`` pins identity against the naive shape on
multi-bucket data with boundary-exact gaps and NULL keys.

Cross-bucket correctness argument, shared by all helpers: within one
key, ordering by ``(bucket, *order)`` equals ordering by ``*order``
whenever the bucket is monotone non-decreasing in the order columns
(it is: a floor of the leading timestamp). ``lag(...)`` over the
per-key SUMMARY stream therefore yields the last row of the key's
previous NON-EMPTY bucket — exactly the global predecessor of a
bucket's first row.

Float caution: ``running_sum_over_buckets`` reassociates the sum
(bucket totals + within-bucket prefix). Pass a DECIMAL-cast column —
decimal addition is exact and associative, double addition is not,
and a reassociated double running sum can flip a downstream ROUND.

Related: ``operators/skew.py`` (salted equi-joins) covers the JOIN
side of the same hazard; this module covers sequential windows, which
salting cannot fix (a window needs its whole partition in order).

**Adaptive routing** (``spark.bulker.hotkey.mode``, verdict r7 #2): the
two-phase shape is insurance — measured ~+3.6 s across the sf0.1 bench
on UNIFORM data where the naive single-window plan is fine. Every
helper therefore routes, the same way ``plans/analytics10`` routes
broadcast vs bucketed rebuilds:

- ``always`` — two-phase unconditionally (round-7 behavior).
- ``never`` — the naive global window (pre-round-7 behavior).
- ``auto`` (default) — sample the key histogram once per (input plan,
  keys) and take the naive shape below the skew threshold. The probe
  is one column-pruned sampled aggregation (~a few % of the key
  column), cached by ``DataFrame.semanticHash`` so repeated queries on
  the same input pay it once per session; a production deployment with
  table statistics can pin ``always``/``never`` per pipeline instead.
  Threshold: the top key owning more than one average shuffle
  partition's share of rows (``1 / spark.sql.shuffle.partitions``,
  override via ``spark.bulker.hotkey.threshold``) — below that, no
  single task can be dominated by one key, which is the only failure
  mode the two-phase shape exists to prevent.

Both shapes are bit-identical (pinned in ``tests/test_hotkey.py``), so
routing can never change results — only plans.
"""

from __future__ import annotations

from functools import reduce
from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "day_bucket",
    "lag_over_buckets",
    "carry_over_buckets",
    "running_sum_over_buckets",
    "trailing_range_sums",
    "with_trailing_halo",
]

_BKT = "__hk_bkt"

_MODE_CONF = "spark.bulker.hotkey.mode"
_THRESH_CONF = "spark.bulker.hotkey.threshold"
_SAMPLE_CONF = "spark.bulker.hotkey.sample"

# (semanticHash, keys) -> bucketed? — one probe per input plan per session
_AUTO_CACHE: dict = {}
_AUTO_CACHE_MAX = 1024


def _use_two_phase(df: DataFrame, keys: Sequence[str]) -> bool:
    """Routing decision for one helper call (module docstring: modes)."""
    spark = df.sparkSession
    mode = (spark.conf.get(_MODE_CONF, "auto") or "auto").lower()
    if mode == "always":
        return True
    if mode == "never":
        return False
    if mode != "auto":
        raise ValueError(
            f"{_MODE_CONF} must be auto|always|never, got {mode!r}"
        )
    # cache by the BACKING FILES when the frame is file-based: every
    # query projecting the same table shares one probe regardless of
    # projection (semanticHash would re-probe per plan shape). The
    # coarseness is deliberate — a filtered subset shares its base
    # table's verdict, which is the right default for skew (a bot user
    # dominates filtered slices of its stream too).
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    try:
        if files:
            # hash ALL file names (review r8: truncating to a prefix let
            # appended part files alias to a stale verdict — new data
            # with a bot user would keep a cached 'naive' routing)
            import hashlib

            digest = hashlib.md5(
                "\n".join(sorted(files)).encode()
            ).hexdigest()
            cache_key = ("files", digest, tuple(keys))
        else:
            cache_key = ("plan", df.semanticHash(), tuple(keys))
    except Exception:
        return True  # un-hashable plan: keep the insurance
    if cache_key in _AUTO_CACHE:
        return _AUTO_CACHE[cache_key]
    fraction = float(spark.conf.get(_SAMPLE_CONF, "0.05"))
    default_thr = 1.0 / int(
        spark.conf.get("spark.sql.shuffle.partitions", "200")
    )
    threshold = float(spark.conf.get(_THRESH_CONF, str(default_thr)))
    try:
        row = (
            df.select(*keys)
            .sample(fraction=min(fraction, 1.0), seed=7)
            .groupBy(*keys)
            .count()
            .agg(
                F.max("count").alias("mx"),
                F.sum("count").alias("tot"),
            )
            .first()
        )
        # empty/tiny sample: too little evidence either way — the naive
        # shape is also harmless on data this small, but keep insurance
        # (a 5% sample of a 100-row frame says nothing about skew)
        bucketed = (
            True
            if row is None or not row["tot"] or row["tot"] < 100
            else (row["mx"] / row["tot"]) >= threshold
        )
    except Exception:
        bucketed = True
    if len(_AUTO_CACHE) >= _AUTO_CACHE_MAX:
        _AUTO_CACHE.clear()
    _AUTO_CACHE[cache_key] = bucketed
    return bucketed


def day_bucket(ts_col: str = "ts", width_s: int = 86400) -> Column:
    """The standard bucket expression: UTC-epoch day of a timestamp
    column. ``width_s`` must exceed any gap/lookback the query compares
    across rows (86400 >> the catalog's 1800-s session gap and 3600-s
    TTL/trailing windows) so only boundary rows ever need phase 2."""
    return F.floor(
        F.unix_timestamp(F.date_trunc("second", ts_col)) / width_s
    )


def _null_safe_eq(keys: Sequence[str], prefix: str) -> Column:
    """NULL-SAFE join condition on keys + bucket: window partitionBy
    (and SQL GROUP BY) treat NULL as one group, so the join-back must
    not drop anonymous-user rows the way a null-rejecting equi-join
    would."""
    return reduce(
        Column.__and__,
        [F.col(c).eqNullSafe(F.col(f"{prefix}{c}")) for c in (*keys, _BKT)],
    )


def _norm_lag_entries(
    lag_cols: Mapping[str, "str | tuple"],
) -> list:
    """Normalize ``lag_cols`` values: ``src`` means offset 1,
    ``(src, offset)`` gives an explicit offset in {1, 2}."""
    entries = []
    for out, spec in lag_cols.items():
        src, off = (spec, 1) if isinstance(spec, str) else spec
        if off not in (1, 2):
            raise ValueError(
                f"lag offset must be 1 or 2, got {off} for {out!r} "
                "(chain calls for deeper offsets)"
            )
        entries.append((out, src, off))
    return entries


def lag_over_buckets(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[str],
    lag_cols: Mapping[str, "str | tuple"],
    bucket: Column | None = None,
) -> DataFrame:
    """``lag(src, k) OVER (PARTITION BY keys ORDER BY order)`` without a
    per-key partition: bit-identical output, hot-key-splittable plan.

    ``lag_cols`` maps output column name -> source column name (offset
    1) or ``(source, offset)`` with offset 1 or 2. Offsets 1 and 2
    share ONE summary join (verdict r7 #3: the chained two-call form
    paid two summary joins); deeper offsets chain calls —
    ``lag(lag(x))`` over the same total order is ``lag(x, 2)``.
    ``order`` must be a per-key unique total order (the catalog
    convention: ``(ts, event_id)``).

    Phase 2 state per (key, bucket): the source values of the bucket's
    last ``max_offset`` rows (offset 1: one ``max_by`` struct — no
    extra sort; offset 2: tail rows picked by a descending
    ``row_number`` over the same partition, pivoted by
    position-from-end). Bucket b's first ``k`` rows take lag values
    from the previous non-empty buckets' tails; every other row keeps
    the within-bucket lag. Routed per the module docstring
    (``spark.bulker.hotkey.mode``).
    """
    entries = _norm_lag_entries(lag_cols)
    # lags land in TEMP names first: an output name that shadows a
    # source column (lag_cols={"ts": "ts", "x": "ts"}) would otherwise
    # make later entries lag the already-lagged column (review r7)
    if not _use_two_phase(df, keys):
        wn = Window.partitionBy(*keys).orderBy(*order)
        out_df = df
        for idx, (out, src, off) in enumerate(entries):
            out_df = out_df.withColumn(
                f"__hk_lag_{idx}", F.lag(src, off).over(wn)
            )
        for idx, (out, _src, _off) in enumerate(entries):
            out_df = out_df.withColumn(out, F.col(f"__hk_lag_{idx}"))
        return out_df.drop(*[f"__hk_lag_{i}" for i in range(len(entries))])

    bucket = day_bucket(order[0]) if bucket is None else bucket
    srcs = list(dict.fromkeys(src for _o, src, _k in entries))
    maxk = max(off for _o, _s, off in entries)
    b = df.withColumn(_BKT, bucket)
    w = Window.partitionBy(*keys, _BKT).orderBy(*order)
    proj = b
    for idx, (out, src, off) in enumerate(entries):
        proj = proj.withColumn(f"__hk_lag_{idx}", F.lag(src, off).over(w))
    proj = proj.withColumn("__hk_rn", F.row_number().over(w))
    # summaries reference the RAW bucketed frame, not `proj`: referencing
    # only pre-window columns lets Catalyst drop the ascending Window
    # node from this branch entirely (column pruning)
    tail_struct = F.struct(*[F.col(s).alias(s) for s in srcs])
    if maxk == 1:
        # offset-1 summary stays agg-only (max_by): no sort in this
        # branch at all — don't regress the existing single-lag plans
        summary = b.groupBy(*keys, _BKT).agg(
            F.max_by(
                tail_struct,
                F.struct(*[F.col(c) for c in order]),
            ).alias("__hk_tail_1")
        )
    else:
        wd = Window.partitionBy(*keys, _BKT).orderBy(
            *[F.col(c).desc() for c in order]
        )
        summary = (
            b.withColumn("__hk_rnd", F.row_number().over(wd))
            .filter(F.col("__hk_rnd") <= maxk)
            .groupBy(*keys, _BKT)
            .agg(
                *[
                    F.max(
                        F.when(F.col("__hk_rnd") == j, tail_struct)
                    ).alias(f"__hk_tail_{j}")
                    for j in range(1, maxk + 1)
                ]
            )
        )
    wb = Window.partitionBy(*keys).orderBy(_BKT)
    prev_cols = [F.lag("__hk_tail_1").over(wb).alias("__hk_prev_1")]
    if maxk == 2:
        # 2nd-last row before bucket b: the previous non-empty bucket's
        # 2nd-last row when it has one (tail_2 non-null), else the last
        # row of the bucket before that
        prev_cols.append(
            F.coalesce(
                F.lag("__hk_tail_2").over(wb),
                F.lag("__hk_tail_1", 2).over(wb),
            ).alias("__hk_prev_2")
        )
    prev = summary.select(
        *[F.col(k).alias(f"__hk_p_{k}") for k in keys],
        F.col(_BKT).alias(f"__hk_p_{_BKT}"),
        *prev_cols,
    )
    joined = proj.join(prev, _null_safe_eq(keys, "__hk_p_"), "inner")
    for idx, (out, src, off) in enumerate(entries):
        if off == 1:
            cross = F.col(f"__hk_prev_1.{src}")
        else:
            cross = F.when(
                F.col("__hk_rn") == 2, F.col(f"__hk_prev_1.{src}")
            ).otherwise(F.col(f"__hk_prev_2.{src}"))
        joined = joined.withColumn(
            out,
            F.when(F.col("__hk_rn") <= off, cross).otherwise(
                F.col(f"__hk_lag_{idx}")
            ),
        )
    return joined.drop(
        _BKT,
        "__hk_rn",
        "__hk_prev_1",
        "__hk_prev_2",
        f"__hk_p_{_BKT}",
        *[f"__hk_p_{k}" for k in keys],
        *[f"__hk_lag_{i}" for i in range(len(entries))],
    )


def carry_over_buckets(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[str],
    carry_cols: Mapping[str, str],
    bucket: Column | None = None,
) -> DataFrame:
    """``last(src, ignorenulls) OVER (PARTITION BY keys ORDER BY order
    ROWS UNBOUNDED PRECEDING TO 1 PRECEDING)`` — the strictly-before
    carry-forward (as-of / last-touch shape) — without a per-key
    partition.

    Atomicity: each carry column is carried INDEPENDENTLY; when several
    values must come from the same source row (e.g. a touch's type and
    timestamp), pass ONE struct column that is null-or-present as a
    whole.

    Phase 2 state per (key, bucket): the bucket's last NON-NULL source
    value (``max_by`` with a null order key skips null-src rows); the
    per-key carry across buckets is ``last(..., ignorenulls)`` over the
    strictly-previous summary rows. A row's final value prefers the
    within-bucket carry (later in the total order by construction) and
    falls back to the cross-bucket carry. Routed per the module
    docstring (``spark.bulker.hotkey.mode``).
    """
    if not _use_two_phase(df, keys):
        wn = (
            Window.partitionBy(*keys)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        out_df = df
        for idx, (out, src) in enumerate(carry_cols.items()):
            out_df = out_df.withColumn(
                f"__hk_carry_{idx}", F.last(src, ignorenulls=True).over(wn)
            )
        for idx, out in enumerate(carry_cols):
            out_df = out_df.withColumn(out, F.col(f"__hk_carry_{idx}"))
        return out_df.drop(
            *[f"__hk_carry_{i}" for i in range(len(carry_cols))]
        )

    bucket = day_bucket(order[0]) if bucket is None else bucket
    srcs = list(dict.fromkeys(carry_cols.values()))
    b = df.withColumn(_BKT, bucket)
    w = (
        Window.partitionBy(*keys, _BKT)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # carries land in TEMP names first, mirroring lag_over_buckets: an
    # output name that shadows a source column consumed by a LATER entry
    # (carry_cols={"s": "s", "a": "s"}) would otherwise make that entry
    # carry the already-carried column (advice r7)
    proj = b
    for idx, (out, src) in enumerate(carry_cols.items()):
        proj = proj.withColumn(
            f"__hk_carry_{idx}", F.last(src, ignorenulls=True).over(w)
        )
    summary = b.groupBy(*keys, _BKT).agg(
        *[
            F.max_by(
                F.col(s),
                F.when(
                    F.col(s).isNotNull(),
                    F.struct(*[F.col(c) for c in order]),
                ),
            ).alias(f"__hk_last_{s}")
            for s in srcs
        ]
    )
    wb = (
        Window.partitionBy(*keys)
        .orderBy(_BKT)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = summary.select(
        *[F.col(k).alias(f"__hk_p_{k}") for k in keys],
        F.col(_BKT).alias(f"__hk_p_{_BKT}"),
        *[
            F.last(f"__hk_last_{s}", ignorenulls=True)
            .over(wb)
            .alias(f"__hk_prev_{s}")
            for s in srcs
        ],
    )
    joined = proj.join(prev, _null_safe_eq(keys, "__hk_p_"), "inner")
    for idx, (out, src) in enumerate(carry_cols.items()):
        joined = joined.withColumn(
            out,
            F.coalesce(
                F.col(f"__hk_carry_{idx}"), F.col(f"__hk_prev_{src}")
            ),
        )
    return joined.drop(
        _BKT,
        f"__hk_p_{_BKT}",
        *[f"__hk_p_{k}" for k in keys],
        *[f"__hk_prev_{s}" for s in srcs],
        *[f"__hk_carry_{i}" for i in range(len(carry_cols))],
    )


def running_sum_over_buckets(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[str],
    sums: Mapping[str, Column],
    bucket: Column | None = None,
    _route: "bool | None" = None,
) -> DataFrame:
    """``SUM(col) OVER (PARTITION BY keys ORDER BY order ROWS UNBOUNDED
    PRECEDING TO CURRENT ROW)`` — the per-key running total, one output
    column per ``sums`` entry — without a per-key partition:
    within-bucket prefix sums + the key's exclusive prefix of bucket
    totals, all sums sharing one window pass and one summary join.

    This REASSOCIATES the addition: pass DECIMAL-cast (or integer)
    columns — exact, associative. A double column would drift in the
    last ulp vs the sequential oracle and can flip a downstream ROUND.
    Routed per the module docstring (``spark.bulker.hotkey.mode``);
    ``_route`` is internal (``trailing_range_sums`` pins its inner sum
    to its own routing decision so the probe runs once, not twice).
    """
    names = list(sums)
    two_phase = _use_two_phase(df, keys) if _route is None else _route
    if not two_phase:
        # FULL temp discipline (review r8): sum expressions land in temp
        # value columns before any window, and the window RESULTS land
        # in temp names before any output assignment — an output name
        # shadowing a key/order column would otherwise corrupt LATER
        # outputs' window resolution and break routing bit-identity
        out_df = df
        for i, n in enumerate(names):
            out_df = out_df.withColumn(f"__hk_rsv_{i}", sums[n])
        wn = (
            Window.partitionBy(*keys)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        for i, n in enumerate(names):
            out_df = out_df.withColumn(
                f"__hk_rso_{i}", F.sum(f"__hk_rsv_{i}").over(wn)
            )
        for i, n in enumerate(names):
            out_df = out_df.withColumn(n, F.col(f"__hk_rso_{i}"))
        return out_df.drop(
            *[
                c
                for i in range(len(names))
                for c in (f"__hk_rsv_{i}", f"__hk_rso_{i}")
            ]
        )

    bucket = day_bucket(order[0]) if bucket is None else bucket
    b = df.withColumn(_BKT, bucket)
    for n in names:
        b = b.withColumn(f"__hk_v_{n}", sums[n])
    w = (
        Window.partitionBy(*keys, _BKT)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    proj = b
    for n in names:
        proj = proj.withColumn(
            f"__hk_in_{n}", F.sum(f"__hk_v_{n}").over(w)
        )
    totals = b.groupBy(*keys, _BKT).agg(
        *[F.sum(f"__hk_v_{n}").alias(f"__hk_tot_{n}") for n in names]
    )
    wb = (
        Window.partitionBy(*keys)
        .orderBy(_BKT)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = totals.select(
        *[F.col(k).alias(f"__hk_p_{k}") for k in keys],
        F.col(_BKT).alias(f"__hk_p_{_BKT}"),
        *[
            F.sum(f"__hk_tot_{n}").over(wb).alias(f"__hk_off_{n}")
            for n in names
        ],
    )
    joined = proj.join(prev, _null_safe_eq(keys, "__hk_p_"), "inner")
    for n in names:
        # NULL semantics of the naive running SUM: NULL only when the
        # WHOLE prefix is null-valued. Within-bucket prefix and offset
        # can each be null independently (all-null bucket prefix /
        # first bucket), so: sum when both present, the non-null one
        # when only one is, NULL when neither (review r7 — plain
        # `in + coalesce(off, 0)` returned NULL the moment the current
        # bucket's prefix was all-null even with earlier real values)
        joined = joined.withColumn(
            n,
            F.coalesce(
                F.col(f"__hk_in_{n}") + F.col(f"__hk_off_{n}"),
                F.col(f"__hk_in_{n}"),
                F.col(f"__hk_off_{n}"),
            ),
        )
    return joined.drop(
        _BKT,
        f"__hk_p_{_BKT}",
        *[f"__hk_p_{k}" for k in keys],
        *[
            c
            for n in names
            for c in (f"__hk_v_{n}", f"__hk_in_{n}", f"__hk_off_{n}")
        ],
    )


def with_trailing_halo(
    df: DataFrame,
    keys: Sequence[str],
    secs_col: str,
    lookback: int,
    bucket_width: int = 86400,
) -> tuple[DataFrame, "Window"]:
    """Trailing RANGE frame (``rangeBetween(-lookback, 0)`` over epoch
    seconds) without a per-key partition, via the halo pattern: rows
    within ``lookback`` of a bucket's END are DUPLICATED into the next
    bucket as context rows, so every row's full frame is present inside
    its own (key, bucket) partition. Requires ``bucket_width >=
    lookback`` (a frame then reaches at most one bucket back).

    Use this for NON-INVERTIBLE frame aggregates (min/max/collect):
    Spark's sliding range frame re-adds the whole frame per output row,
    so cost is O(rows x frame size) — quadratic in a hot key's event
    RATE even after bucketing (measured: the Zipf bot user's 1M-event
    stream cost a 26 s max task under the halo split alone). For
    count/sum (invertible), use ``trailing_range_sums`` instead:
    prefix sums + boundary probes, O(rows), rate-independent.

    Returns ``(halo_df, window_spec)``; the caller applies its
    ``agg(...).over(window_spec)`` columns, then MUST filter
    ``F.col("__hk_ctx") == 0`` and drop BOTH internals ``__hk_ctx``
    and ``__hk_bkt`` (or select explicit output columns) — context
    rows are frame-fill only, never output, and a leaked bucket column
    would fail a strict-schema compare downstream. Aggregates must be
    duplication-safe in the sense that a context row is counted only by
    frames that genuinely span it (the range frame guarantees this; the
    row's original lives in the previous bucket's partition, so nothing
    double-counts). Reassociation caution as above: pass decimal
    columns to SUM.
    """
    if bucket_width < lookback:
        raise ValueError(
            f"bucket_width {bucket_width} must be >= lookback {lookback}"
        )
    if not _use_two_phase(df, keys):
        u = df.withColumn(_BKT, F.lit(0).cast("long")).withColumn(
            "__hk_ctx", F.lit(0)
        )
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col(secs_col))
            .rangeBetween(-lookback, 0)
        )
        return u, w
    b = df.withColumn(
        _BKT, F.floor(F.col(secs_col) / F.lit(bucket_width))
    )
    own = b.withColumn("__hk_ctx", F.lit(0))
    halo = (
        b.filter(
            F.col(secs_col)
            >= (F.col(_BKT) + 1) * bucket_width - lookback
        )
        .withColumn(_BKT, F.col(_BKT) + 1)
        .withColumn("__hk_ctx", F.lit(1))
    )
    u = own.unionByName(halo)
    w = (
        Window.partitionBy(*keys, _BKT)
        .orderBy(F.col(secs_col))
        .rangeBetween(-lookback, 0)
    )
    return u, w


def trailing_range_sums(
    df: DataFrame,
    keys: Sequence[str],
    secs_col: str,
    lookback: int,
    sums: Mapping[str, Column],
    row_id: str,
    bucket_width: int = 86400,
) -> DataFrame:
    """Trailing RANGE-frame COUNT/SUMs (``rangeBetween(-lookback, 0)``
    over epoch seconds) in O(rows), hot-key-proof and frame-size-proof:
    prefix sums + boundary probes instead of a sliding frame.

    Two hazards with Spark's native sliding range frame: (a) the per-key
    window single-tasks a hot key, and (b) the sliding frame is
    recomputed by RE-ADDING every in-frame row per output row, so cost
    is O(rows x frame) — quadratic in a bot user's event rate (measured
    26 s for one 33k-row task on the Zipf fixture even after halo
    bucketing). Since count/sum are invertible, the frame aggregate is a
    DIFFERENCE OF PREFIX SUMS instead:

    1. Each row spawns two zero-weight PROBES: an upper probe at ``t``
       (ordered after all real rows at ``t``) and a lower probe at
       ``t - lookback - 1`` (ordered after real rows there, so "<= t -
       lookback - 1" is inclusive — the complement of the frame's
       inclusive lower bound).
    2. One bucketed running sum per aggregate
       (``running_sum_over_buckets`` — splittable, exact) over the
       union, ordered by (secs, probe-after-real, row_id, probe-kind):
       a probe's running value is the prefix sum of all real rows at or
       before its point; RANGE tie semantics (every row at ``t`` sees
       all rows at ``t``) fall out of probes sorting after reals.
    3. Frame value = upper - lower, joined back per ``row_id`` — two
       slim equi-joins on a unique key, no hot key possible.

    ``sums`` values must be DECIMAL or integer expressions (exact,
    associative — same contract as ``running_sum_over_buckets``; a
    trailing count is ``F.lit(1).cast("long")``). ``row_id`` must be
    unique at least PER KEY (the join-back matches on keys + row_id, so
    a per-key-unique id is safe; the catalog convention ``event_id`` is
    globally unique). Returns ``df`` plus one column per ``sums`` entry.
    Routed per the module docstring (``spark.bulker.hotkey.mode``);
    the naive shape is the native sliding range frame — fine on uniform
    keys where frames stay small, quadratic on a bot user's rate.
    """
    names = list(sums)
    if not _use_two_phase(df, keys):
        # full temp discipline — see the running-sum naive branch
        out_df = df.withColumn("__hk_secs", F.col(secs_col).cast("long"))
        for i, n in enumerate(names):
            out_df = out_df.withColumn(f"__hk_trv_{i}", sums[n])
        wn = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__hk_secs"))
            .rangeBetween(-lookback, 0)
        )
        for i, n in enumerate(names):
            out_df = out_df.withColumn(
                f"__hk_tro_{i}", F.sum(f"__hk_trv_{i}").over(wn)
            )
        for i, n in enumerate(names):
            out_df = out_df.withColumn(n, F.col(f"__hk_tro_{i}"))
        return out_df.drop(
            "__hk_secs",
            *[
                c
                for i in range(len(names))
                for c in (f"__hk_trv_{i}", f"__hk_tro_{i}")
            ],
        )
    base = df.withColumn("__hk_secs", F.col(secs_col).cast("long"))
    # SQL NULL semantics of a frame SUM: NULL when the frame holds no
    # non-null value (review r7) — so probes carry typed NULL weights
    # (never 0: a probe must not make an all-null prefix look summed),
    # and each sum rides with a non-null-INDICATOR running count that
    # decides frame-has-a-value at the end
    real = base.select(
        *[F.col(k) for k in keys],
        "__hk_secs",
        F.lit(0).alias("__hk_probe"),
        F.col(row_id).alias("__hk_rid"),
        F.lit(0).alias("__hk_kind"),
        *[sums[n].alias(f"__hk_w_{n}") for n in names],
        *[
            F.when(sums[n].isNotNull(), F.lit(1))
            .cast("long")
            .alias(f"__hk_i_{n}")
            for n in names
        ],
    )
    nulls = [
        F.lit(None).cast(dict(real.dtypes)[f"__hk_w_{n}"]).alias(f"__hk_w_{n}")
        for n in names
    ] + [F.lit(None).cast("long").alias(f"__hk_i_{n}") for n in names]
    lower = base.select(
        *[F.col(k) for k in keys],
        (F.col("__hk_secs") - F.lit(lookback + 1)).alias("__hk_secs"),
        F.lit(1).alias("__hk_probe"),
        F.col(row_id).alias("__hk_rid"),
        F.lit(1).alias("__hk_kind"),
        *nulls,
    )
    upper = base.select(
        *[F.col(k) for k in keys],
        "__hk_secs",
        F.lit(1).alias("__hk_probe"),
        F.col(row_id).alias("__hk_rid"),
        F.lit(2).alias("__hk_kind"),
        *nulls,
    )
    u = real.unionByName(lower).unionByName(upper)
    cum_sums = {f"__hk_c_{n}": F.col(f"__hk_w_{n}") for n in names}
    cum_sums.update(
        {f"__hk_ci_{n}": F.col(f"__hk_i_{n}") for n in names}
    )
    cum = running_sum_over_buckets(
        u,
        keys=keys,
        order=["__hk_secs", "__hk_probe", "__hk_rid", "__hk_kind"],
        sums=cum_sums,
        bucket=F.floor(F.col("__hk_secs") / F.lit(bucket_width)),
        _route=True,  # this call IS the two-phase branch: don't re-probe
    )
    # join-back keys include the KEY columns, not row_id alone: row_id
    # uniqueness is a docstring contract, and a per-key-unique id would
    # otherwise cross-match rows between keys with silently wrong sums
    # (advice r7). The probe frames already carry the keys, so the
    # extra equality is near-free.
    lo = cum.filter(F.col("__hk_kind") == 1).select(
        *[F.col(k).alias(f"__hk_lo_k_{k}") for k in keys],
        F.col("__hk_rid").alias("__hk_rid_lo"),
        *[F.col(f"__hk_c_{n}").alias(f"__hk_lo_{n}") for n in names],
        *[F.col(f"__hk_ci_{n}").alias(f"__hk_loi_{n}") for n in names],
    )
    up = cum.filter(F.col("__hk_kind") == 2).select(
        *[F.col(k).alias(f"__hk_up_k_{k}") for k in keys],
        F.col("__hk_rid").alias("__hk_rid_up"),
        *[F.col(f"__hk_c_{n}").alias(f"__hk_up_{n}") for n in names],
        *[F.col(f"__hk_ci_{n}").alias(f"__hk_upi_{n}") for n in names],
    )

    def _probe_cond(rid_col: str, kprefix: str) -> Column:
        return reduce(
            Column.__and__,
            [F.col(row_id) == F.col(rid_col)]
            + [
                F.col(k).eqNullSafe(F.col(f"{kprefix}{k}"))
                for k in keys
            ],
        )

    out = df.join(
        up, _probe_cond("__hk_rid_up", "__hk_up_k_"), "inner"
    ).join(lo, _probe_cond("__hk_rid_lo", "__hk_lo_k_"), "inner")
    for n in names:
        frame_cnt = F.coalesce(F.col(f"__hk_upi_{n}"), F.lit(0)) - F.coalesce(
            F.col(f"__hk_loi_{n}"), F.lit(0)
        )
        # a null lower prefix with a non-null upper means every non-null
        # value sits inside the frame: the difference degrades to the
        # upper prefix alone (coalesce chain, no typed zero needed)
        diff = F.coalesce(
            F.col(f"__hk_up_{n}") - F.col(f"__hk_lo_{n}"),
            F.col(f"__hk_up_{n}"),
        )
        out = out.withColumn(
            n, F.when(frame_cnt > 0, diff).otherwise(F.lit(None))
        )
    return out.drop(
        "__hk_rid_lo",
        "__hk_rid_up",
        *[f"__hk_lo_k_{k}" for k in keys],
        *[f"__hk_up_k_{k}" for k in keys],
        *[
            c
            for n in names
            for c in (
                f"__hk_lo_{n}",
                f"__hk_up_{n}",
                f"__hk_loi_{n}",
                f"__hk_upi_{n}",
            )
        ],
    )
