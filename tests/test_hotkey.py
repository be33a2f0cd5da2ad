"""Bit-identity pins for ``operators/hotkey.py``: every bucketed
two-phase helper must equal the naive per-key global window on data
that exercises the cross-bucket paths — multi-day streams, NULL keys,
boundary-exact gaps, empty-bucket adjacency, and a hot key owning most
rows (the Zipf shape the helpers exist for)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from bulker_spark.operators.hotkey import (
    carry_over_buckets,
    day_bucket,
    lag_over_buckets,
    running_sum_over_buckets,
    with_trailing_halo,
)

DAY = 86400


@pytest.fixture(scope="module")
def stream(spark):
    """Synthetic multi-day per-user stream. user 0 is hot (owns ~70% of
    rows); user NULL present; timestamps engineered so several user-days
    are empty (cross-bucket lag must reach the previous NON-EMPTY
    bucket) and some rows land exactly on bucket/lookback boundaries."""
    rows = []
    eid = 0
    # hot user 0: 700 events over 10 days, bursty (gaps of 1..7000 s);
    # every 7th value is NULL — the naive windows' SQL null semantics
    # (sum skips nulls, NULL only for an all-null prefix/frame; lag
    # carries a real NULL) are part of the bit-identity contract
    # (review r7: the fixture previously had no nulls, hiding three
    # null-path divergences)
    t = 0
    for i in range(700):
        t += (i * 37) % 7000 + 1
        val = None if i % 7 == 3 else float((i * 13) % 100) / 4.0
        rows.append((eid, t, 0, val))
        eid += 1
    # users 1..5: 20 events each, days 0,2,5 only (day 1,3,4 empty)
    for u in range(1, 6):
        for i in range(20):
            day = [0, 2, 5][i % 3]
            t = day * DAY + (i * 731 + u * 97) % DAY
            rows.append((eid, t, u, float(i)))
            eid += 1
    # NULL user: 10 events across 3 days
    for i in range(10):
        rows.append((eid, i * 30000, None, 1.5))
        eid += 1
    # boundary-exact rows: exactly at a day edge and exactly lookback
    # seconds before the edge (range-frame inclusivity)
    rows.append((eid, 3 * DAY, 7, 2.0)); eid += 1
    rows.append((eid, 3 * DAY - 3600, 7, 3.0)); eid += 1
    rows.append((eid, 3 * DAY - 3601, 7, 4.0)); eid += 1
    # user 8: a WHOLE day-bucket of null values sandwiched between real
    # ones — the running sum must carry the earlier prefix through the
    # all-null bucket, and an all-null trailing frame must stay NULL
    rows.append((eid, 0 * DAY + 100, 8, 1.0)); eid += 1
    rows.append((eid, 0 * DAY + 200, 8, 2.0)); eid += 1
    for i in range(5):
        rows.append((eid, 2 * DAY + i * 5000, 8, None)); eid += 1
    rows.append((eid, 4 * DAY + 100, 8, 7.0)); eid += 1
    # user 9: never a non-null value — every prefix and frame is NULL
    for i in range(4):
        rows.append((eid, i * 40000, 9, None)); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, secs long, user_id long, value double"
    ).withColumn("ts", F.timestamp_seconds(F.col("secs")))
    return df.localCheckpoint(eager=True)


def _sorted(df, cols):
    return df.orderBy(*cols).collect()


def test_lag_identity(stream):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    naive = stream.select(
        "event_id",
        F.lag("ts").over(w).alias("prev_ts"),
        F.lag("value").over(w).alias("prev_value"),
    )
    two = lag_over_buckets(
        stream,
        keys=["user_id"],
        order=["ts", "event_id"],
        lag_cols={"prev_ts": "ts", "prev_value": "value"},
    ).select("event_id", "prev_ts", "prev_value")
    assert _sorted(naive, ["event_id"]) == _sorted(two, ["event_id"])


def test_lag_chained_is_lag2(stream):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    naive = stream.select(
        "event_id", F.lag("value", 2).over(w).alias("v2")
    )
    one = lag_over_buckets(
        stream,
        keys=["user_id"],
        order=["ts", "event_id"],
        lag_cols={"v1": "value"},
    )
    two = lag_over_buckets(
        one,
        keys=["user_id"],
        order=["ts", "event_id"],
        lag_cols={"v2": "v1"},
    ).select("event_id", "v2")
    assert _sorted(naive, ["event_id"]) == _sorted(two, ["event_id"])


def test_lag_composite_keys(stream):
    tagged = stream.withColumn(
        "etype", (F.col("event_id") % 3).cast("string")
    )
    w = Window.partitionBy("user_id", "etype").orderBy("ts", "event_id")
    naive = tagged.select(
        "event_id", F.lag("ts").over(w).alias("prev_ts")
    )
    two = lag_over_buckets(
        tagged,
        keys=["user_id", "etype"],
        order=["ts", "event_id"],
        lag_cols={"prev_ts": "ts"},
    ).select("event_id", "prev_ts")
    assert _sorted(naive, ["event_id"]) == _sorted(two, ["event_id"])


def test_carry_identity(stream):
    # carry a struct that is null on ~2/3 of rows (the last-touch shape)
    src = stream.withColumn(
        "touch",
        F.when(
            F.col("event_id") % 3 == 0,
            F.struct(F.col("value").alias("v"), F.col("ts").alias("t")),
        ),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    naive = src.select(
        "event_id",
        F.last("touch", ignorenulls=True).over(w).alias("carried"),
    )
    two = carry_over_buckets(
        src,
        keys=["user_id"],
        order=["ts", "event_id"],
        carry_cols={"carried": "touch"},
    ).select("event_id", "carried")
    assert _sorted(naive, ["event_id"]) == _sorted(two, ["event_id"])


def test_running_sum_identity_decimal(stream):
    dec = F.col("value").cast("decimal(18,6)")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    naive = stream.select(
        "event_id", F.sum(dec).over(w).alias("run")
    )
    two = running_sum_over_buckets(
        stream,
        keys=["user_id"],
        order=["ts", "event_id"],
        sums={"run": dec},
    ).select("event_id", "run")
    assert _sorted(naive, ["event_id"]) == _sorted(two, ["event_id"])


def test_trailing_halo_identity(stream):
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("secs"))
        .rangeBetween(-3600, 0)
    )
    naive = stream.select(
        "event_id",
        F.count("*").over(w).alias("n_1h"),
        F.sum(F.col("value").cast("decimal(18,6)")).over(w).alias("v_1h"),
    )
    halo, hw = with_trailing_halo(
        stream, keys=["user_id"], secs_col="secs", lookback=3600
    )
    two = (
        halo.withColumn("n_1h", F.count("*").over(hw))
        .withColumn(
            "v_1h",
            F.sum(F.col("value").cast("decimal(18,6)")).over(hw),
        )
        .filter(F.col("__hk_ctx") == 0)
        .select("event_id", "n_1h", "v_1h")
    )
    assert _sorted(naive, ["event_id"]) == _sorted(two, ["event_id"])


def test_trailing_range_sums_identity(stream):
    from bulker_spark.operators.hotkey import trailing_range_sums

    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("secs"))
        .rangeBetween(-3600, 0)
    )
    naive = stream.select(
        "event_id",
        F.count("*").over(w).cast("long").alias("n_1h"),
        F.sum(F.col("value").cast("decimal(18,6)")).over(w).alias("v_1h"),
    )
    two = trailing_range_sums(
        stream,
        keys=["user_id"],
        secs_col="secs",
        lookback=3600,
        sums={
            "__n": F.lit(1).cast("long"),
            "__v": F.col("value").cast("decimal(18,6)"),
        },
        row_id="event_id",
    ).select(
        "event_id",
        F.col("__n").cast("long").alias("n_1h"),
        F.col("__v").cast("decimal(28,6)").alias("v_1h"),
    )
    n = {r["event_id"]: (r["n_1h"], r["v_1h"]) for r in naive.collect()}
    t = {r["event_id"]: (r["n_1h"], r["v_1h"]) for r in two.collect()}
    assert n == t


def test_trailing_halo_rejects_small_bucket(stream):
    with pytest.raises(ValueError):
        with_trailing_halo(
            stream,
            keys=["user_id"],
            secs_col="secs",
            lookback=DAY + 1,
            bucket_width=DAY,
        )


def test_lag_output_name_shadowing_source(stream):
    """An output name that shadows a source column another entry still
    needs must not turn later lags into lag-of-lag (review r7)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    naive = stream.select(
        "event_id",
        F.lag("value").over(w).alias("value_l"),
        F.lag("secs").over(w).alias("secs_l"),
    )
    two = lag_over_buckets(
        stream,
        keys=["user_id"],
        order=["ts", "event_id"],
        # first entry REPLACES the value column; second still lags the
        # original secs — and a third lags the original value again
        lag_cols={"value": "value", "secs_l": "secs", "value2": "value"},
    ).select(
        "event_id",
        F.col("value").alias("value_l"),
        "secs_l",
    )
    assert _sorted(naive, ["event_id"]) == _sorted(two, ["event_id"])


def test_carry_output_name_shadowing_source(stream):
    """carry_over_buckets twin of the lag shadowing pin (advice r7):
    an output name that replaces a source column consumed by a LATER
    entry must not turn that entry into carry-of-carry."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    naive = stream.select(
        "event_id",
        F.last("value", ignorenulls=True).over(w).alias("value_c"),
        F.last("value", ignorenulls=True).over(w).alias("again_c"),
    )
    two = carry_over_buckets(
        stream,
        keys=["user_id"],
        order=["ts", "event_id"],
        # first entry REPLACES the value column; the second must still
        # carry the ORIGINAL value, not the carried one
        carry_cols={"value": "value", "again": "value"},
    ).select(
        "event_id",
        F.col("value").alias("value_c"),
        F.col("again").alias("again_c"),
    )
    assert _sorted(naive, ["event_id"]) == _sorted(two, ["event_id"])


def test_trailing_range_sums_per_key_row_id(stream):
    """The join-back matches on keys + row_id (advice r7), so an id
    that is only unique PER KEY — colliding across keys — must still
    produce per-key-correct sums, not cross-key matches."""
    from bulker_spark.operators.hotkey import trailing_range_sums

    # rank within user = per-key-unique, heavily colliding across users
    wk = Window.partitionBy("user_id").orderBy("secs", "event_id")
    keyed = stream.withColumn("seq", F.row_number().over(wk))
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("secs"))
        .rangeBetween(-3600, 0)
    )
    naive = keyed.select(
        "user_id",
        "seq",
        F.count("*").over(w).cast("long").alias("n_1h"),
    )
    two = trailing_range_sums(
        keyed,
        keys=["user_id"],
        secs_col="secs",
        lookback=3600,
        sums={"__n": F.lit(1).cast("long")},
        row_id="seq",
    ).select("user_id", "seq", F.col("__n").cast("long").alias("n_1h"))
    n = {(r["user_id"], r["seq"]): r["n_1h"] for r in naive.collect()}
    t = {(r["user_id"], r["seq"]): r["n_1h"] for r in two.collect()}
    assert n == t


def test_helpers_preserve_input_columns(stream):
    out = lag_over_buckets(
        stream,
        keys=["user_id"],
        order=["ts", "event_id"],
        lag_cols={"prev_ts": "ts"},
    )
    assert set(stream.columns) | {"prev_ts"} == set(out.columns)
    assert out.count() == stream.count()


def test_lag2_fused_identity(stream):
    """Offsets 1 and 2 in ONE call (one summary join, verdict r7 #3)
    must equal the naive lag-1/lag-2 window — including keys whose
    buckets hold a single row (the lag(tail_1, 2) cross-bucket path:
    users 1-5 here have whole empty days between single-digit-row
    days, and user 9 hits all-null values)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    naive = stream.select(
        "event_id",
        F.lag("value", 2).over(w).alias("v2"),
        F.lag("value", 1).over(w).alias("v1"),
        F.lag("secs", 2).over(w).alias("s2"),
    )
    fused = lag_over_buckets(
        stream,
        keys=["user_id"],
        order=["ts", "event_id"],
        lag_cols={
            "v2": ("value", 2),
            "v1": ("value", 1),
            "s2": ("secs", 2),
        },
    ).select("event_id", "v2", "v1", "s2")
    assert _sorted(naive, ["event_id"]) == _sorted(fused, ["event_id"])


def test_lag2_single_row_buckets(spark):
    """Dedicated single-row-per-bucket stress: every bucket holds one
    row, so EVERY lag-2 crosses two buckets (pure lag(tail_1, 2))."""
    rows = [(i, i * DAY + 50, 1, float(i)) for i in range(6)]
    df = spark.createDataFrame(
        rows, "event_id long, secs long, user_id long, value double"
    ).withColumn("ts", F.timestamp_seconds(F.col("secs")))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    naive = df.select("event_id", F.lag("value", 2).over(w).alias("v2"))
    fused = lag_over_buckets(
        df,
        keys=["user_id"],
        order=["ts", "event_id"],
        lag_cols={"v2": ("value", 2)},
    ).select("event_id", "v2")
    assert _sorted(naive, ["event_id"]) == _sorted(fused, ["event_id"])


def test_lag_rejects_bad_offset(stream):
    with pytest.raises(ValueError):
        lag_over_buckets(
            stream,
            keys=["user_id"],
            order=["ts", "event_id"],
            lag_cols={"v3": ("value", 3)},
        )


class TestModeRouting:
    """spark.bulker.hotkey.mode routing (verdict r7 #2): auto samples
    the key histogram and picks naive below the skew threshold; both
    shapes are bit-identical so routing only changes plans."""

    @pytest.fixture()
    def mode(self, spark):
        prev = spark.conf.get("spark.bulker.hotkey.mode", None)
        yield spark
        if prev is None:
            spark.conf.unset("spark.bulker.hotkey.mode")
        else:
            spark.conf.set("spark.bulker.hotkey.mode", prev)

    @staticmethod
    def _uniform(spark, n=20_000, keys=500):
        return spark.range(n).select(
            F.col("id").alias("event_id"),
            (F.col("id") * 97).alias("secs"),
            (F.col("id") % keys).alias("user_id"),
            (F.col("id") % 7).cast("double").alias("value"),
        ).withColumn("ts", F.timestamp_seconds(F.col("secs")))

    @staticmethod
    def _zipf(spark, n=20_000):
        return spark.range(n).select(
            F.col("id").alias("event_id"),
            (F.col("id") * 97).alias("secs"),
            F.when(F.col("id") % 2 == 0, F.lit(0))
            .otherwise(F.col("id") % 500)
            .alias("user_id"),
            (F.col("id") % 7).cast("double").alias("value"),
        ).withColumn("ts", F.timestamp_seconds(F.col("secs")))

    def test_auto_routes_uniform_naive_and_zipf_bucketed(self, mode):
        from bulker_spark.operators import hotkey as hk

        mode.conf.set("spark.bulker.hotkey.mode", "auto")
        hk._AUTO_CACHE.clear()
        assert hk._use_two_phase(self._uniform(mode), ["user_id"]) is False
        assert hk._use_two_phase(self._zipf(mode), ["user_id"]) is True

    def test_auto_decision_is_cached(self, mode):
        from bulker_spark.operators import hotkey as hk

        mode.conf.set("spark.bulker.hotkey.mode", "auto")
        hk._AUTO_CACHE.clear()
        df = self._uniform(mode)
        hk._use_two_phase(df, ["user_id"])
        n = len(hk._AUTO_CACHE)
        hk._use_two_phase(df, ["user_id"])
        assert len(hk._AUTO_CACHE) == n

    def test_overrides(self, mode):
        from bulker_spark.operators import hotkey as hk

        mode.conf.set("spark.bulker.hotkey.mode", "never")
        assert hk._use_two_phase(self._zipf(mode), ["user_id"]) is False
        mode.conf.set("spark.bulker.hotkey.mode", "always")
        assert hk._use_two_phase(self._uniform(mode), ["user_id"]) is True
        mode.conf.set("spark.bulker.hotkey.mode", "bogus")
        with pytest.raises(ValueError):
            hk._use_two_phase(self._uniform(mode), ["user_id"])

    def test_naive_plan_has_no_join(self, mode):
        mode.conf.set("spark.bulker.hotkey.mode", "never")
        df = self._zipf(mode)
        out = lag_over_buckets(
            df,
            keys=["user_id"],
            order=["ts", "event_id"],
            lag_cols={"prev": "value", "prev2": ("value", 2)},
        )
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert "Join" not in plan
        mode.conf.set("spark.bulker.hotkey.mode", "always")
        out2 = lag_over_buckets(
            df,
            keys=["user_id"],
            order=["ts", "event_id"],
            lag_cols={"prev": "value"},
        )
        assert "Join" in out2._jdf.queryExecution().optimizedPlan().toString()

    def test_never_mode_identity_all_helpers(self, mode, stream):
        """All five helpers under mode=never equal mode=always on the
        skewed fixture — routing can never change values."""
        from bulker_spark.operators.hotkey import trailing_range_sums

        dec = F.col("value").cast("decimal(18,6)")

        def shapes():
            lag = lag_over_buckets(
                stream,
                keys=["user_id"],
                order=["ts", "event_id"],
                lag_cols={"p1": "value", "p2": ("value", 2)},
            ).select("event_id", "p1", "p2")
            carry = carry_over_buckets(
                stream,
                keys=["user_id"],
                order=["ts", "event_id"],
                carry_cols={"c": "value"},
            ).select("event_id", "c")
            run = running_sum_over_buckets(
                stream,
                keys=["user_id"],
                order=["ts", "event_id"],
                sums={"r": dec},
            ).select("event_id", "r")
            tr = trailing_range_sums(
                stream,
                keys=["user_id"],
                secs_col="secs",
                lookback=3600,
                sums={"n": F.lit(1).cast("long"), "v": dec},
                row_id="event_id",
            ).select("event_id", "n", "v")
            halo, hw = with_trailing_halo(
                stream, keys=["user_id"], secs_col="secs", lookback=3600
            )
            hl = (
                halo.withColumn("hn", F.count("*").over(hw))
                .filter(F.col("__hk_ctx") == 0)
                .select("event_id", "hn")
            )
            return [lag, carry, run, tr, hl]

        mode.conf.set("spark.bulker.hotkey.mode", "always")
        always = [_sorted(d, ["event_id"]) for d in shapes()]
        mode.conf.set("spark.bulker.hotkey.mode", "never")
        never = [_sorted(d, ["event_id"]) for d in shapes()]
        assert always == never


def test_running_sum_output_shadows_order_column(stream):
    """An output name that shadows an ORDER column must not corrupt
    later outputs' window resolution in EITHER shape (review r8: the
    naive branch assigned outputs between window evaluations)."""
    dec = F.col("value").cast("decimal(18,6)")
    dec2 = (F.col("value") * 2).cast("decimal(18,6)")
    spark = stream.sparkSession
    prev = spark.conf.get("spark.bulker.hotkey.mode", None)
    try:
        results = {}
        for mode in ("always", "never"):
            spark.conf.set("spark.bulker.hotkey.mode", mode)
            out = running_sum_over_buckets(
                stream,
                keys=["user_id"],
                order=["ts", "event_id"],
                # first output REPLACES an order-adjacent value column;
                # second still orders by the original ts/event_id
                sums={"value": dec, "x": dec2},
            ).select("event_id", F.col("value").alias("v"), "x")
            results[mode] = _sorted(out, ["event_id"])
        assert results["always"] == results["never"]
    finally:
        if prev is None:
            spark.conf.unset("spark.bulker.hotkey.mode")
        else:
            spark.conf.set("spark.bulker.hotkey.mode", prev)
