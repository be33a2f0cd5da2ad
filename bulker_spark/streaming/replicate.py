"""Incremental warehouse→warehouse table replication on the change feed.

``TableReplica`` keeps a destination table converged to a source table by
consuming the source's streaming change data feed
(:mod:`..sources.changes_source`) and applying each micro-batch as
merge + delete on the destination — the cross-destination sync loop the
reference runs between Kafka and one warehouse
(``bulkerapp/app/batch_consumer.go:56-267``: consume → BulkerStream →
commit offsets after the warehouse commit), here between two warehouses
with the offsets living in the stream checkpoint.

Lifecycle:

- **bootstrap**: if the destination table doesn't exist, copy ONE
  consistent source snapshot (the commit-pinned file manifest, not "the
  table now") and remember its commit; the stream then starts exactly
  after that commit — no row lost or doubled between snapshot and feed.
  The replica inherits the source's PK and bucket layout, so trickle
  upserts stay O(touched buckets) on the destination too.
- **follow**: each micro-batch may span several source commits; rows
  reduce to last-wins per key (by ``__change_commit``; within one commit
  an insert/postimage beats the delete of a replaced row), then apply as
  one ``merge`` (upserts) + one ``delete_keys`` (deletes, DataFrame form
  — keys never collect to the driver). Preimages are dropped.
- **exactly-once**: offsets advance only after the batch function
  returns (foreachBatch + checkpoint). A replayed batch re-merges the
  same rows and re-deletes the same keys — both idempotent — so failure
  between destination commit and checkpoint write converges.

A feed reset on the source (``replace_table`` / ``restore`` / ``clone``)
fails the stream with the reset error: drop the destination table (or
pass a fresh checkpoint) and bootstrap again — the same re-sync contract
as Delta CDF streaming reads.

PK-less sources replicate append-only (the feed can only emit inserts
for them); a delete in the feed of a PK-less table aborts the batch.

``transform`` maps each upsert batch before it lands (rename/derive/drop
columns, row filters). It must be deterministic and key-preserving —
deletes ship only PK columns, so a transform that rewrites keys would
desynchronize deletes.
"""

from __future__ import annotations

import json
import os
from typing import Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..api import Engine
from ..sinks.warehouse import CHANGE_COMMIT_COLUMN, CHANGE_TYPE_COLUMN


class TableReplica:
    def __init__(
        self,
        src: Engine,
        table: str,
        dst: Engine,
        dst_table: str | None = None,
        transform: Callable[[DataFrame], DataFrame] | None = None,
        src_namespace: str | None = None,
        dst_namespace: str | None = None,
    ):
        self.src = src
        self.table = table
        self.dst = dst
        self.dst_table = dst_table or table
        self.transform = transform
        self.src_ns = src_namespace or src.warehouse.namespace
        self.dst_ns = dst_namespace or dst.warehouse.namespace

    # -- bootstrap -----------------------------------------------------------
    def _bootstrap(self, checkpoint: str) -> int | str:
        """Ensure the destination table exists; return the feed's starting
        commit. The pinned commit is persisted as a sidecar in the
        checkpoint dir BEFORE the snapshot copy: the stream's own offset
        log only exists after its first batch commits, so a crash between
        the snapshot landing and that first commit would otherwise make a
        restart see "destination exists" and silently start from
        'latest', skipping every commit since the snapshot. With the
        sidecar, restarts re-pin the same starting commit until the
        checkpoint takes over (checkpointed offsets override
        startingCommit entirely)."""
        meta = self.src.warehouse.get_meta(self.table, self.src_ns)
        if meta is None:
            raise FileNotFoundError(f"source table {self.table}")
        marker = os.path.join(checkpoint, "bulker_replica_bootstrap.json")
        dst_exists = (
            self.dst.warehouse.get_meta(self.dst_table, self.dst_ns)
            is not None
        )
        if dst_exists:
            try:
                with open(marker) as fh:
                    return int(json.load(fh)["commit"])
            except (OSError, ValueError, KeyError):
                raise ValueError(
                    f"destination table {self.dst_table} exists but this "
                    "checkpoint has no bootstrap record — replication "
                    "cannot tell where its feed should start. Reuse the "
                    "original checkpoint, or drop the destination table "
                    "to re-bootstrap."
                ) from None
        head = self.src.warehouse.history(self.table, self.src_ns)[0]
        os.makedirs(checkpoint, exist_ok=True)
        tmp = marker + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"commit": int(head["commit"])}, fh)
        os.replace(tmp, marker)
        snap = self.src.warehouse.read(
            self.table, self.src_ns, version=head["version"]
        )
        if self.transform is not None:
            snap = self.transform(snap)
        bucket_by = (
            (list(meta.bucket_cols), int(meta.n_buckets))
            if meta.n_buckets
            else None
        )
        self.dst.warehouse.create_or_replace(
            self.dst_table,
            snap,
            pk=list(meta.pk) if meta.pk else None,
            namespace=self.dst_ns,
            bucket_by=bucket_by,
        )
        return int(head["commit"])

    # -- per-batch apply -------------------------------------------------
    def _apply(self, batch: DataFrame, _batch_id: int) -> None:
        pk = list(
            self.src.warehouse.get_meta(self.table, self.src_ns).pk or ()
        )
        feed_cols = [CHANGE_TYPE_COLUMN, CHANGE_COMMIT_COLUMN]
        ctype = F.col(CHANGE_TYPE_COLUMN)
        live = batch.filter(ctype != "update_preimage")
        if not pk:
            bad = live.filter(ctype != "insert")
            if bad.limit(1).count():
                raise ValueError(
                    f"change feed of PK-less table {self.table} carries "
                    "non-insert changes; replication needs a primary key"
                )
            ups = live.drop(*feed_cols)
            if self.transform is not None:
                ups = self.transform(ups)
            if not ups.isEmpty():
                self.dst.warehouse.append(
                    self.dst_table, ups, namespace=self.dst_ns
                )
            return
        # last-wins per key across the batch's commits; within one commit
        # an insert/postimage outranks the delete of the row it replaced
        # (replace_partition emits both for a surviving key)
        w = Window.partitionBy(*pk).orderBy(
            F.col(CHANGE_COMMIT_COLUMN).desc(),
            F.when(ctype == "delete", 0).otherwise(1).desc(),
        )
        last = (
            live.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        last = last.persist()
        try:
            dels = last.filter(ctype == "delete").select(*pk)
            ups = last.filter(ctype != "delete").drop(*feed_cols)
            if self.transform is not None:
                ups = self.transform(ups)
            if not dels.isEmpty():
                self.dst.warehouse.delete_keys(
                    self.dst_table, dels, namespace=self.dst_ns
                )
            if not ups.isEmpty():
                self.dst.warehouse.merge(
                    self.dst_table, ups, pk, namespace=self.dst_ns
                )
        finally:
            last.unpersist()

    # -- the stream --------------------------------------------------------
    def start(
        self,
        checkpoint: str,
        available_now: bool = True,
        processing_time: str | None = None,
        max_commits_per_trigger: int = 50,
    ):
        """Bootstrap if needed, then start the follow stream. Returns the
        StreamingQuery; ``availableNow`` drains the backlog and stops
        (the cron-cycle shape), ``processing_time`` keeps following."""
        starting = self._bootstrap(checkpoint)
        feed = self.src.stream_changes(
            self.table,
            namespace=self.src_ns,
            starting_commit=starting,
            max_commits_per_trigger=max_commits_per_trigger,
        )
        writer = feed.writeStream.foreachBatch(self._apply).option(
            "checkpointLocation", checkpoint
        )
        if processing_time is not None:
            writer = writer.trigger(processingTime=processing_time)
        elif available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
