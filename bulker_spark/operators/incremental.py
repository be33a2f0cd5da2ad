"""Incrementally-maintained rollups (materialized aggregates).

At 100 TB, re-aggregating the full fact table per refresh is the
anti-pattern; the scalable shape is delta maintenance: aggregate only
the rows appended since the last refresh and MERGE the partial into the
rollup. For additive aggregates (count / sum — and avg as sum+count)
partials combine exactly, so the refreshed rollup equals a full
recompute — which is what the tests assert.

Built on the warehouse commit log, cheapest sufficient mechanism first:

1. **appends only** → `read_appended(since_commit)` hands back exactly
   the newly-added files (manifest set difference — zero re-read of
   consumed data); the delta aggregates with sign +1.
2. **rewritten (merge / delete / replace_partition)** → the change feed
   (`read_changes`) as SIGNED deltas: insert / update_postimage +1,
   delete / update_preimage −1 — classic incremental view maintenance;
   for additive aggregates the signed partial is exact (an update
   contributes post − pre), and the feed costs O(rewritten slice), not
   O(table). Groups whose row count reaches 0 drop out, matching a full
   recompute. Requires a COUNT metric (group liveness) and a
   copy-on-write source (MoR upserts carry no preimage to subtract).
3. **otherwise** (feed reset / GC'd horizon / MoR / no count) → full
   rebuild from the new snapshot — correctness first, incrementality
   when the log proves it safe.

The reference has nothing like this (its aggregation surface is
COUNT(*), ``sql_adapter_base.go:287-297``); this is the
materialized-view tier a warehouse engine owes its users.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sinks.warehouse import Warehouse


@dataclass
class RollupSpec:
    """count / sum aggregates over group keys; avg = derive sum/count
    downstream."""

    source: str
    target: str
    group_by: list[str]
    counts: list[str]  # output column names for COUNT(*) (usually one)
    sums: dict[str, str]  # output column -> source column to SUM


class IncrementalRollup:
    """Maintain ``target`` = SELECT group_by, COUNT(*), SUM(...) FROM
    source GROUP BY group_by, refreshed incrementally from append
    commits."""

    def __init__(self, warehouse: Warehouse, spec: RollupSpec):
        self.wh = warehouse
        self.spec = spec

    # --- refresh state (last consumed source commit) ----------------------
    def _state_path(self) -> str:
        return os.path.join(
            self.wh.root,
            self.wh.namespace,
            f"{self.spec.target}.rollup_state.json",
        )

    def last_commit(self) -> int | None:
        try:
            with open(self._state_path()) as fh:
                return int(json.load(fh)["since_commit"])
        except (OSError, ValueError, KeyError):
            return None

    def _save_commit(self, commit: int) -> None:
        path = self._state_path()
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"since_commit": commit}, fh)
        os.replace(tmp, path)

    # --- aggregation ------------------------------------------------------
    def _aggregate(self, df: DataFrame) -> DataFrame:
        aggs = [F.count(F.lit(1)).alias(c) for c in self.spec.counts]
        aggs += [
            F.sum(F.col(src)).alias(out)
            for out, src in self.spec.sums.items()
        ]
        return df.groupBy(*self.spec.group_by).agg(*aggs)

    def _aggregate_signed(self, df: DataFrame) -> DataFrame:
        """Signed partial over a change-feed batch (``__sign`` ±1):
        counts become Σsign, sums Σ(value·sign) — the IVM delta."""
        sign = F.col("__sign")
        aggs = [F.sum(sign).alias(c) for c in self.spec.counts]
        aggs += [
            F.sum(F.col(src) * sign).alias(out)
            for out, src in self.spec.sums.items()
        ]
        return df.groupBy(*self.spec.group_by).agg(*aggs)

    def _signed_changes(
        self, since: int, to_commit: int | None = None
    ) -> DataFrame | None:
        """The change feed as signed delta rows, or None when signed
        maintenance is undefined for this source/spec (MoR upserts carry
        no preimage; without a COUNT metric emptied groups can't be
        detected)."""
        from ..sinks.warehouse import CHANGE_TYPE_COLUMN

        meta = self.wh.get_meta(self.spec.source)
        if meta is None or meta.write_mode == "mor" or not self.spec.counts:
            return None
        feed = self.wh.read_changes(
            self.spec.source, since, to_commit=to_commit
        )
        ctype = F.col(CHANGE_TYPE_COLUMN)
        sign = (
            F.when(ctype.isin("insert", "update_postimage"), F.lit(1))
            .when(ctype.isin("delete", "update_preimage"), F.lit(-1))
        )
        return feed.withColumn("__sign", sign).filter(
            F.col("__sign").isNotNull()
        )

    def _combine(self, current: DataFrame, delta: DataFrame) -> DataFrame:
        """Additive merge: full outer on the group keys, coalesced sums.
        The delta side is one partial row per touched group — micro-batch
        sized, so it broadcasts; untouched groups stream through."""
        keys = self.spec.group_by
        metrics = self.spec.counts + list(self.spec.sums)
        d = F.broadcast(
            delta.select(
                *[F.col(k).alias(f"__d_{k}") for k in keys],
                *[F.col(m).alias(f"__d_{m}") for m in metrics],
            )
        )
        from functools import reduce

        cond = reduce(
            lambda a, b: a & b,
            [current[k].eqNullSafe(F.col(f"__d_{k}")) for k in keys],
        )
        j = current.join(d, cond, "full_outer")
        out_cols = [
            F.coalesce(current[k], F.col(f"__d_{k}")).alias(k) for k in keys
        ]
        out_cols += [
            (
                F.coalesce(current[m], F.lit(0))
                + F.coalesce(F.col(f"__d_{m}"), F.lit(0))
            ).alias(m)
            for m in metrics
        ]
        return j.select(*out_cols)

    # --- the refresh ------------------------------------------------------
    def refresh(self) -> dict:
        """Bring the rollup up to date. Returns {"mode": "initial" |
        "incremental" | "rebuild", "rows": delta-row-count}."""
        spec = self.spec
        history = self.wh.history(spec.source)  # newest first
        latest = max(e["commit"] for e in history)
        since = self.last_commit()

        def _snapshot_at_latest() -> DataFrame:
            # pin the full read to `latest` (the commit this refresh
            # checkpoints); the live pointer may already be past it. If
            # minimal retention GC'd that snapshot mid-race, re-anchor
            # latest to the new head and read that instead.
            nonlocal latest
            try:
                return self.wh.read(spec.source, version=int(latest))
            except FileNotFoundError:
                latest = max(
                    e["commit"] for e in self.wh.history(spec.source)
                )
                return self.wh.read(spec.source, version=int(latest))

        if since is None or not self.wh.exists(spec.target):
            mode = "initial"
            full = self._aggregate(_snapshot_at_latest())
            self.wh.create_or_replace(spec.target, full, pk=spec.group_by)
        elif since == latest:
            return {"mode": "noop", "rows": 0}
        else:
            delta = mode = None
            try:
                # bounded at `latest` (the commit this refresh will
                # checkpoint): a commit racing in after the history()
                # read must not be consumed now AND re-consumed next
                # refresh (double-count)
                delta = self._aggregate(
                    self.wh.read_appended(
                        spec.source, since, to_commit=latest
                    )
                )
                mode = "incremental"
            except ValueError:
                # source rewritten: exact signed maintenance off the
                # change feed — O(rewritten slice), not O(table)
                try:
                    signed = self._signed_changes(since, latest)
                    if signed is not None:
                        delta = self._aggregate_signed(signed)
                        mode = "incremental_cdf"
                except (ValueError, FileNotFoundError):
                    pass  # feed reset / GC'd horizon → rebuild
            if delta is not None:
                merged = self._combine(self.wh.read(spec.target), delta)
                if mode == "incremental_cdf":
                    # a group whose rows all left must vanish, as it
                    # would from a full recompute
                    merged = merged.filter(F.col(spec.counts[0]) != 0)
                self.wh.create_or_replace(spec.target, merged, pk=spec.group_by)
            else:
                full = self._aggregate(_snapshot_at_latest())
                self.wh.create_or_replace(spec.target, full, pk=spec.group_by)
                mode = "rebuild"

        self._save_commit(latest)
        rows = self.wh.count(spec.target)
        return {"mode": mode, "rows": rows}


def incremental_rollup(
    warehouse: Warehouse,
    source: str,
    target: str,
    group_by: Sequence[str],
    *,
    counts: Sequence[str] = ("n",),
    sums: dict[str, str] | None = None,
) -> IncrementalRollup:
    return IncrementalRollup(
        warehouse,
        RollupSpec(
            source=source,
            target=target,
            group_by=list(group_by),
            counts=list(counts),
            sums=dict(sums or {}),
        ),
    )
