"""Table metadata: the engine-side analogue of the reference's ``Table``
struct (``/root/reference/bulkerlib/implementations/sql/table.go:41-56``):
namespace, name, ordered columns, PK fields, timestamp column, partitioning.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .types_lattice import DataType


@dataclass
class TableMeta:
    namespace: str
    name: str
    # ordered column name → generic type (first-seen order preserved)
    columns: dict[str, DataType] = field(default_factory=dict)
    pk: list[str] = field(default_factory=list)
    timestamp_column: str | None = None
    partition_by: list[str] = field(default_factory=list)
    version: str = ""  # current committed version directory
    # physical storage of JSON-typed columns: "text" (stringified, the
    # reference's stringifyObjects default) or "variant" (Spark 4
    # VariantType — shredded binary, path-readable without re-parsing)
    json_storage: str = "text"
    # hash-bucketed layout (Hudi bucket-index style): rows are stored
    # under ``__bucket = pmod(xxhash64(*bucket_cols), n_buckets)`` partition
    # dirs, so a PK merge reads and rewrites ONLY the buckets containing
    # source keys. n_buckets == 0 → unbucketed.
    bucket_cols: list[str] = field(default_factory=list)
    n_buckets: int = 0
    # "cow" (copy-on-write, default): a merge rewrites affected files.
    # "mor" (merge-on-read, Hudi MoR style): a merge APPENDS delta files
    # stamped with a monotonic ``__commit_seq``; reads reconcile per-PK
    # last-wins by that sequence; compact() folds deltas into a clean base.
    write_mode: str = "cow"
    mor_seq: int = 0  # last stamped commit sequence
    mor_deltas: int = 0  # delta commits since last fold (compaction signal)
    # persisted range-clustering choice (Delta liquid-clustering shape):
    # set by create/compact(cluster_by=...); every full rewrite (merge /
    # delete on an unbucketed table) re-applies repartitionByRange on
    # these columns so footer min/max stats keep pruning and the change
    # feed keeps slicing AFTER rewrites, not only until the first merge.
    cluster_cols: list[str] = field(default_factory=list)
    # commit id of the last compact() rewrite. A clustered table whose
    # CURRENT commit is that compaction has had no writes since the last
    # re-sort, so a maintenance pass can skip it (the no-op guard would
    # otherwise rewrite untouched clustered tables every cycle).
    last_compact_commit: int = 0

    def to_json(self) -> dict:
        return {
            "namespace": self.namespace,
            "name": self.name,
            "columns": [[n, int(t)] for n, t in self.columns.items()],
            "pk": self.pk,
            "timestamp_column": self.timestamp_column,
            "partition_by": self.partition_by,
            "version": self.version,
            "json_storage": self.json_storage,
            "bucket_cols": self.bucket_cols,
            "n_buckets": self.n_buckets,
            "write_mode": self.write_mode,
            "mor_seq": self.mor_seq,
            "mor_deltas": self.mor_deltas,
            "cluster_cols": self.cluster_cols,
            "last_compact_commit": self.last_compact_commit,
        }

    @classmethod
    def from_json(cls, d: dict) -> "TableMeta":
        return cls(
            namespace=d["namespace"],
            name=d["name"],
            columns={n: DataType(t) for n, t in d["columns"]},
            pk=list(d.get("pk") or []),
            timestamp_column=d.get("timestamp_column"),
            partition_by=list(d.get("partition_by") or []),
            version=d.get("version", ""),
            json_storage=d.get("json_storage", "text"),
            bucket_cols=list(d.get("bucket_cols") or []),
            n_buckets=int(d.get("n_buckets") or 0),
            write_mode=d.get("write_mode", "cow"),
            mor_seq=int(d.get("mor_seq") or 0),
            mor_deltas=int(d.get("mor_deltas") or 0),
            cluster_cols=list(d.get("cluster_cols") or []),
            last_compact_commit=int(d.get("last_compact_commit") or 0),
        )

    def diff_new_columns(self, incoming: dict[str, DataType]) -> list[str]:
        """Columns present in the incoming schema but not the table
        (table.go:200-236); order = incoming first-seen order."""
        return [c for c in incoming if c not in self.columns]
