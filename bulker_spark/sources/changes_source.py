"""``bulker_changes`` — a Spark 4 Python Data Source streaming the
warehouse's row-level change data feed (Delta CDF's streaming
``readChangeFeed`` surface for this engine's tables).

The batch half lives in :meth:`Warehouse.read_changes`; this source turns
the same commit-log diff into a Structured Streaming source so downstream
incremental consumers (micro-batch MERGE into another table, feature
refresh, training-data deltas) get exactly-once delivery with offsets in
the stream checkpoint:

- **offset** = ``{"commit": N}`` — the last table commit included. The
  commit log is the WAL; ``latestOffset`` reads only its JSON tail
  (metadata, no data files touched), ``maxCommitsPerTrigger`` bounds a
  micro-batch.
- **planning is metadata-only**: the driver resolves each commit's
  added/removed file lists from the log entry manifests (set-difference
  by version-local relpath, exactly the batch feed's identity rule) and
  ships file lists to executors — it never opens a parquet file.
- **appends scale file-parallel**: an ``append`` / ``merge_mor`` /
  ``replace_partition`` commit becomes one input partition per added
  (/removed) file group; executors read the parquet directly (Arrow
  batches straight into Spark, no Python row loop).
- **copy-on-write merges diff executor-side**: the rewritten slice's
  old/new files pair up per partition directory when the layout proves
  rows cannot move between directories (``__bucket`` dirs with bucket
  cols ⊆ PK — the bucket of a row is a pure function of its immutable
  PK — or partition dirs on PK columns). Without usable dirs the diff
  SLICES by disjoint pk[0] ranges derived from the committed per-file
  min/max (sound: both sides filter to the range, a key lives in
  exactly one slice; requires v2 stats proving the key null-free, and
  falls back to one partition when files interleave past 2× overlap —
  persisted ``cluster_cols`` keep rewrites sliceable). Either way the
  diff spans only the REWRITTEN slice, so bucketed/clustered layouts
  bound feed cost exactly as they bound the merge.
- **schema** comes from the head commit's table meta (live columns +
  ``__change_type`` + ``__change_commit``); older files are null-filled /
  widened per column, the batch feed's schema-evolution behavior.

Change types match the batch feed: ``insert`` / ``delete`` /
``update_preimage`` / ``update_postimage`` (CoW), ``upsert`` / ``delete``
(MoR deltas), ``insert`` (appends), ``delete``+``insert``
(replace_partition). ``compact`` / ``rebucket`` commits are skipped
(physical reorganization, no logical change). A feed-resetting commit
(``replace_table`` / ``restore`` / ``clone``) fails the stream with a
clear error — re-read the snapshot and restart the feed from its commit,
as with the batch feed.

The feed horizon is version retention: a GC'd commit raises
``FileNotFoundError`` at planning time.

Usage::

    register_changes_source(spark)
    df = (spark.readStream.format("bulker_changes")
          .option("path", warehouse_root).option("table", "events")
          .option("startingCommit", "earliest").load())

or ``Engine.stream_changes("events")``.

Reference parity: the reference emits no change feed at all — this is
the downstream half of its CDC story (events in via Kafka topics; here,
committed row changes OUT to incremental consumers with the same
offset-after-commit discipline its batch consumer implements by hand,
``/root/reference/bulkerapp/app/batch_consumer.go:200-262``).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Iterator, Sequence
from urllib.parse import unquote

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

# mirrored from sinks.warehouse (importing the sink module on executors
# would drag the whole Spark-side engine into every reader task)
_LOG_DIR = "_bulker_log"
_CHANGE_TYPE = "__change_type"
_CHANGE_COMMIT = "__change_commit"
_BUCKET = "__bucket"
_TOMBSTONE = "__deleted"
_INTERNAL = (_BUCKET, "__commit_seq", _TOMBSTONE)
_UNMAPPED = "_unmapped_data"
_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"

# DataType enum value → Spark DDL type (types_lattice.to_spark_type for
# the storable types; JSON stores as string under json_storage="text")
_SPARK_DDL = {0: "string", 1: "boolean", 2: "bigint", 3: "double",
              4: "string", 5: "timestamp", 6: "string"}

_RESET_MSG = (
    "table {table} was reset ({op}) at commit {commit}; the change feed "
    "is undefined across it — re-read the current snapshot and restart "
    "the feed from its commit"
)


def _log_commits(table_dir: str) -> list[int]:
    """Retained commit ids, ascending — from FILENAMES only (the log
    names entries ``{commit:012d}.json``). This is what keeps
    ``latestOffset`` O(1)-ish per trigger: learning the head id must not
    re-parse every retained entry's manifest and file stats."""
    log_dir = os.path.join(table_dir, _LOG_DIR)
    if not os.path.isdir(log_dir):
        raise FileNotFoundError(f"no commit log under {table_dir}")
    out = sorted(
        int(f[:-5])
        for f in os.listdir(log_dir)
        if f.endswith(".json") and f[:-5].isdigit()
    )
    if not out:
        raise FileNotFoundError(f"empty commit log under {table_dir}")
    return out


def _log_entry(table_dir: str, commit: int) -> dict:
    with open(
        os.path.join(table_dir, _LOG_DIR, f"{commit:012d}.json")
    ) as fh:
        return json.load(fh)


def _deref(rel: str) -> str:
    """Version-local identity of a manifest entry: strip a ``../v_x/``
    cross-version reference prefix (manifest link mode)."""
    rel = rel.replace(os.sep, "/")
    if rel.startswith("../"):
        return rel.split("/", 2)[2]
    return rel


def _entry_files(entry: dict, table_dir: str) -> dict[str, str]:
    """{version-local relpath: absolute path} for one commit entry."""
    vdir = os.path.join(table_dir, entry["meta"]["version"])
    return {
        _deref(f): os.path.normpath(os.path.join(vdir, f))
        for f in entry.get("files") or []
    }


def _live_columns(meta: dict) -> list[tuple[str, int]]:
    """(name, DataType value) of the feed's live columns, in table order,
    plus the rescue column — the batch feed's ``live_cols``."""
    cols = [(n, int(t)) for n, t in meta["columns"] if n not in _INTERNAL]
    cols.append((_UNMAPPED, 4))
    return cols


@dataclass
class ScanPart(InputPartition):
    """Whole-file scan: every row becomes one change row of ``ctype``
    (or, for MoR deltas with ``ctype=None``, delete/upsert by the
    tombstone column)."""

    files: list[tuple[str, str]]  # (absolute path, version-local relpath)
    ctype: str | None
    commit: int


@dataclass
class DiffPart(InputPartition):
    """PK diff of a rewritten slice: full-outer join old×new on PK →
    insert / delete / update_preimage+postimage. ``pk=[]`` → multiset
    diff (PK-less conditional delete). ``pk_range=(col, lo, hi)``
    restricts the diff to ``lo <= col < hi`` (None = unbounded side) —
    the stats-sliced plan for un-groupable rewrites; both sides filter
    identically, so a key lives in exactly one slice."""

    old: list[tuple[str, str]] = field(default_factory=list)
    new: list[tuple[str, str]] = field(default_factory=list)
    pk: list[str] = field(default_factory=list)
    commit: int = 0
    pk_range: tuple | None = None


def _plan_commit(
    prev: dict, entry: dict, table_dir: str, table: str,
    files_per_part: int,
    head_types: dict[str, int] | None = None,
) -> list[InputPartition]:
    """Partition plan for ONE commit's changes (driver-side; reads only
    the two manifests). Mirrors ``Warehouse._commit_changes`` op-by-op."""
    op = entry["op"]
    commit = int(entry["commit"])
    if op in ("compact", "rebucket"):
        return []
    if op not in ("append", "merge", "merge_mor", "delete",
                  "replace_partition"):
        raise ValueError(_RESET_MSG.format(table=table, op=op, commit=commit))
    prev_files = _entry_files(prev, table_dir)
    cur_files = _entry_files(entry, table_dir)
    added = sorted(
        (rel, p) for rel, p in cur_files.items() if rel not in prev_files
    )
    removed = sorted(
        (rel, p) for rel, p in prev_files.items() if rel not in cur_files
    )
    gone = [p for _rel, p in (*added, *removed) if not os.path.exists(p)]
    if gone:
        raise FileNotFoundError(
            f"commit {commit} of {table} was garbage-collected; the "
            "change feed horizon is bounded by version retention"
        )

    def scans(pairs, ctype) -> list[InputPartition]:
        out = []
        for i in range(0, len(pairs), files_per_part):
            chunk = [(p, rel) for rel, p in pairs[i:i + files_per_part]]
            out.append(ScanPart(files=chunk, ctype=ctype, commit=commit))
        return out

    if op == "append":
        return scans(added, "insert")
    if op == "merge_mor":
        return scans(added, None)  # tombstone column decides per row
    if op == "replace_partition":
        return scans(removed, "delete") + scans(added, "insert")

    # copy-on-write merge/delete: diff the rewritten slice
    meta = entry["meta"]
    live = {n for n, _t in _live_columns(meta)}
    pk = [c for c in (meta.get("pk") or []) if c in live]
    groupable = False
    if pk:
        dir_cols = {
            seg.split("=", 1)[0]
            for rel, _p in (*added, *removed)
            for seg in rel.split("/")[:-1]
            if "=" in seg
        }
        bucket_ok = set(meta.get("bucket_cols") or []) <= set(pk)
        groupable = all(
            (c == _BUCKET and bucket_ok) or c in pk for c in dir_cols
        )
    groups: dict[str, dict[str, list]] = {}
    for rel, p in removed:
        key = rel.rsplit("/", 1)[0] if ("/" in rel and groupable) else ""
        groups.setdefault(key, {"old": [], "new": []})["old"].append((p, rel))
    for rel, p in added:
        key = rel.rsplit("/", 1)[0] if ("/" in rel and groupable) else ""
        groups.setdefault(key, {"old": [], "new": []})["new"].append((p, rel))
    if pk and list(groups) == [""]:
        # no usable dir structure (un-groupable, or table simply has no
        # bucket/PK dirs): ONE diff part would serialize the whole
        # rewritten slice through a single task — try splitting it into
        # disjoint PK ranges from the committed per-file min/max instead
        g0 = groups[""]
        sliced = _plan_sliced_diff(
            prev, entry, g0["old"], g0["new"], pk, commit, files_per_part,
            head_types=head_types,
        )
        if sliced is not None:
            return sliced
    return [
        DiffPart(old=g["old"], new=g["new"], pk=pk, commit=commit)
        for _k, g in sorted(groups.items())
    ]


def _plan_sliced_diff(
    prev: dict, entry: dict, old: list, new: list, pk: list[str],
    commit: int, files_per_part: int,
    head_types: dict[str, int] | None = None,
) -> list[DiffPart] | None:
    """Split one whole-table diff into DiffParts over disjoint half-open
    ranges of ``pk[0]``, derived from the committed file stats. Sound
    because each row's key lives in exactly ONE range and every file
    whose [min, max] overlaps that range is assigned to it — both sides
    filter to the range, so the per-slice diff equals the global diff
    restricted to the slice. Returns None (single-part fallback) when a
    file lacks v2 stats, the key column may hold nulls/floats, or the
    files interleave so much that slicing would re-read them (> 2×
    overlap — hash-ordered rewrites look like this; range-clustered and
    naturally time-ordered ones don't)."""
    col = pk[0]
    # only INT64(2)/STRING(4) key columns slice: their stats values
    # compare exactly as the Arrow column does (timestamp stats are ISO
    # strings while the column is a timestamp; floats have NaN). The
    # gate must hold for the COMMIT-TIME type (the stats' domain) AND
    # the head type (what _read_diff normalizes the column to — a key
    # widened after this commit would compare int edges to strings)
    commit_t = int(dict(entry["meta"]["columns"]).get(col, 0))
    head = head_types.get(col) if head_types is not None else commit_t
    if commit_t not in (2, 4) or head != commit_t:
        return None
    sides = [("old", prev, old), ("new", entry, new)]
    bounds: list[tuple[str, tuple[str, str], object, object]] = []
    for side, e, files in sides:
        stats = e.get("file_stats") or {}
        for path, rel in files:
            s = stats.get(rel)
            if not s or s.get("v", 1) < 2:
                return None
            if (s.get("nulls") or {}).get(col, 0) != 0:
                return None  # nulls (or unknown): a null row fits no range
            b = s.get("cols", {}).get(col)
            if (
                not b
                or isinstance(b[0], (bool, float))
                or type(b[0]) is not type(b[1])
            ):
                return None
            bounds.append((side, (path, rel), b[0], b[1]))
    if len({type(b[2]) for b in bounds}) != 1:
        return None  # schema-evolved key type across files
    n_parts = (len(bounds) + files_per_part - 1) // files_per_part
    if n_parts <= 1:
        return None
    mins = sorted(b[2] for b in bounds)
    edges = sorted({mins[i * len(mins) // n_parts] for i in range(1, n_parts)})
    ranges: list[tuple] = []
    prev_edge = None
    for e_ in [*edges, None]:
        ranges.append((prev_edge, e_))
        prev_edge = e_
    parts = [DiffPart(pk=pk, commit=commit, pk_range=(col, lo, hi))
             for lo, hi in ranges]
    assigned = 0
    for side, f, fmin, fmax in bounds:
        for part in parts:
            _c, lo, hi = part.pk_range
            if (hi is None or fmin < hi) and (lo is None or fmax >= lo):
                (part.old if side == "old" else part.new).append(f)
                assigned += 1
    if assigned > 2 * len(bounds):
        return None  # interleaved layout: slicing would amplify reads
    return [p for p in parts if p.old or p.new]


# ---------------------------------------------------------------------------
# executor side: parquet → normalized Arrow → change rows


def _arrow_target(cols: list[tuple[str, int]]):
    """Arrow schema matching what Spark expects for the live columns
    (timestamps are UTC instants — the engine writes UTC-adjusted values,
    and tz-aware Arrow arrays reach Spark as instants regardless of
    session timezone)."""
    import pyarrow as pa

    amap = {0: pa.string(), 1: pa.bool_(), 2: pa.int64(),
            3: pa.float64(), 4: pa.string(), 5: pa.timestamp("us", "UTC"),
            6: pa.string()}
    return pa.schema([pa.field(n, amap[t]) for n, t in cols])


def _dir_values(rel: str) -> dict[str, str | None]:
    """Hive-style partition values encoded in a file's directory path."""
    out: dict[str, str | None] = {}
    for seg in rel.replace(os.sep, "/").split("/")[:-1]:
        if "=" in seg:
            k, v = seg.split("=", 1)
            out[k] = None if v == _HIVE_NULL else unquote(v)
    return out


def _read_raw(files: list[tuple[str, str]]) -> list[tuple]:
    """Each file read ONCE: [(arrow table, version-local relpath)]."""
    import pyarrow.parquet as pq

    return [(pq.read_table(path), rel) for path, rel in files]


def _normalize(raw: list[tuple], cols: list[tuple[str, int]]):
    """Combine pre-read tables into ONE Arrow table with exactly the
    live columns in order: dir-encoded values materialized, missing
    columns null-filled (schema evolution), physical types widened by
    cast."""
    import pyarrow as pa

    target = _arrow_target(cols)
    tables = []
    for t, rel in raw:
        dirvals = _dir_values(rel)
        n = t.num_rows
        arrays = []
        for fld in target:
            if fld.name in t.column_names:
                arrays.append(t.column(fld.name).cast(fld.type))
            elif fld.name in dirvals:
                v = dirvals[fld.name]
                scalar = pa.scalar(v, pa.string()).cast(fld.type)
                arrays.append(pa.nulls(n, fld.type) if v is None
                              else pa.repeat(scalar, n))
            else:
                arrays.append(pa.nulls(n, fld.type))
        tables.append(pa.Table.from_arrays(arrays, schema=target))
    if not tables:
        return target.empty_table()
    return pa.concat_tables(tables)


def _read_scan(part: ScanPart, cols: list[tuple[str, int]]) -> Iterator:
    import pyarrow as pa
    import pyarrow.compute as pc

    raw = _read_raw(part.files)
    data = _normalize(raw, cols)
    n = data.num_rows
    if part.ctype is not None:
        ctypes = pa.repeat(pa.scalar(part.ctype, pa.string()), n)
    else:  # MoR delta: tombstones delete, the rest upsert — the flag
        # comes from the SAME tables the normalize pass read (one file
        # I/O per delta file, not two)
        flags: list[bool | None] = []
        for t, _rel in raw:
            if _TOMBSTONE in t.column_names:
                flags.extend(t.column(_TOMBSTONE).cast(pa.bool_()).to_pylist())
            else:
                flags.extend([None] * t.num_rows)
        tomb = pa.array(flags, pa.bool_())
        ctypes = pc.if_else(
            pc.fill_null(tomb, False),
            pa.scalar("delete", pa.string()),
            pa.scalar("upsert", pa.string()),
        )
    out = data.append_column(_CHANGE_TYPE, ctypes).append_column(
        _CHANGE_COMMIT,
        pa.repeat(pa.scalar(part.commit, pa.int64()), n),
    )
    yield from out.to_batches(max_chunksize=1 << 16)


def _canonical_keys(table, names: list[str]) -> list[tuple]:
    """Per-row null-safe comparison keys over ``names`` (floats compare
    NaN==NaN and 0.0==-0.0 like Spark's ``eqNullSafe``; timestamps by
    instant)."""
    import math

    cols = [table.column(n).to_pylist() for n in names]
    keys = []
    for row in zip(*cols) if names else [() for _ in range(table.num_rows)]:
        k = []
        for v in row:
            if v is None:
                k.append(("\0null",))
            elif isinstance(v, float):
                k.append(("f", "nan") if math.isnan(v) else ("f", v + 0.0))
            else:
                k.append(("v", v))
        keys.append(tuple(k))
    return keys


def _read_diff(part: DiffPart, cols: list[tuple[str, int]]) -> Iterator:
    import pyarrow as pa

    names = [n for n, _t in cols]
    old = _normalize(_read_raw(part.old), cols)
    new = _normalize(_read_raw(part.new), cols)
    if part.pk_range is not None:
        # sliced plan: keep only this slice's keys on BOTH sides (the
        # planner proved the column null-free, so the filters partition
        # rows exactly across slices)
        import pyarrow.compute as pc

        col, lo, hi = part.pk_range

        def _slice(t):
            c = t.column(col)
            mask = None
            if lo is not None:
                mask = pc.greater_equal(c, lo)
            if hi is not None:
                m2 = pc.less(c, hi)
                mask = m2 if mask is None else pc.and_(mask, m2)
            return t.filter(mask) if mask is not None else t

        old, new = _slice(old), _slice(new)
    data_cols = [n for n in names if n not in part.pk]

    def emit(table, mask_idx, ctype):
        if not isinstance(mask_idx, (pa.Array, pa.ChunkedArray)):
            mask_idx = pa.array(mask_idx, pa.int64())
        t = table.take(mask_idx)
        n = t.num_rows
        t = t.append_column(
            _CHANGE_TYPE, pa.repeat(pa.scalar(ctype, pa.string()), n)
        ).append_column(
            _CHANGE_COMMIT, pa.repeat(pa.scalar(part.commit, pa.int64()), n)
        )
        return t.to_batches(max_chunksize=1 << 16)

    if not part.pk:  # multiset diff (PK-less conditional delete)
        okeys = _canonical_keys(old, names)
        nkeys = _canonical_keys(new, names)
        from collections import Counter

        oc, nc = Counter(okeys), Counter(nkeys)
        del_idx, seen = [], Counter()
        for i, k in enumerate(okeys):
            seen[k] += 1
            if seen[k] > nc.get(k, 0):
                del_idx.append(i)
        ins_idx, seen = [], Counter()
        for i, k in enumerate(nkeys):
            seen[k] += 1
            if seen[k] > oc.get(k, 0):
                ins_idx.append(i)
        yield from emit(old, del_idx, "delete")
        yield from emit(new, ins_idx, "insert")
        return

    # vectorized path (Acero hash join on PK + columnar compare) for the
    # overwhelmingly common keys; null or floating PKs get SQL-unfriendly
    # equality semantics from the join, so they take the Python fallback
    vectorizable = all(
        not pa.types.is_floating(old.schema.field(k).type)
        and old.column(k).null_count == 0
        and new.column(k).null_count == 0
        for k in part.pk
    )
    if vectorizable:
        ins_idx, del_idx, upd_old, upd_new = _pk_diff_arrow(
            old, new, list(part.pk), data_cols
        )
    else:
        old_by_pk = {
            k: i for i, k in enumerate(_canonical_keys(old, part.pk))
        }
        new_by_pk = {
            k: i for i, k in enumerate(_canonical_keys(new, part.pk))
        }
        old_data = _canonical_keys(old, data_cols)
        new_data = _canonical_keys(new, data_cols)
        ins_idx = sorted(
            i for k, i in new_by_pk.items() if k not in old_by_pk
        )
        del_idx = sorted(
            i for k, i in old_by_pk.items() if k not in new_by_pk
        )
        upd_old, upd_new = [], []
        for k, i in old_by_pk.items():
            j = new_by_pk.get(k)
            if j is not None and old_data[i] != new_data[j]:
                upd_old.append(i)
                upd_new.append(j)
    yield from emit(new, ins_idx, "insert")
    yield from emit(old, del_idx, "delete")
    yield from emit(old, upd_old, "update_preimage")
    yield from emit(new, upd_new, "update_postimage")


def _pk_diff_arrow(old, new, pk: list[str], data_cols: list[str]):
    """(insert, delete, update-pre, update-post) row indices via Arrow
    compute — no per-row Python objects. Full-outer hash join of the two
    sides' PK projections carries each side's row index; matched rows
    compare data columns columnar with eqNullSafe semantics (null==null,
    NaN==NaN, -0.0==0.0 — exactly the batch feed's ``_comparable``)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def keyed(t, tag):
        return t.select(pk).append_column(
            tag, pa.array(range(t.num_rows), pa.int64())
        )

    j = keyed(old, "__oi").join(
        keyed(new, "__ni"), keys=pk, join_type="full outer"
    )
    oi, ni = j.column("__oi"), j.column("__ni")
    ins_idx = ni.filter(pc.is_null(oi)).combine_chunks()
    del_idx = oi.filter(pc.is_null(ni)).combine_chunks()
    matched = pc.and_(pc.is_valid(oi), pc.is_valid(ni))
    oi_m, ni_m = oi.filter(matched), ni.filter(matched)
    changed = pa.array([False] * len(oi_m), pa.bool_())
    for c in data_cols:
        a, b = old.column(c).take(oi_m), new.column(c).take(ni_m)
        eq = pc.fill_null(pc.equal(a, b), False)
        eq = pc.or_(eq, pc.and_(pc.is_null(a), pc.is_null(b)))
        if pa.types.is_floating(old.schema.field(c).type):
            nan = pc.and_(
                pc.fill_null(pc.is_nan(a), False),
                pc.fill_null(pc.is_nan(b), False),
            )
            eq = pc.or_(eq, nan)
        changed = pc.or_(changed, pc.invert(eq))
    return (
        ins_idx,
        del_idx,
        oi_m.filter(changed),
        ni_m.filter(changed),
    )


# ---------------------------------------------------------------------------


class ChangesStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        # Spark normalizes reader option keys case-insensitively (they
        # arrive lowercased); accept either spelling
        options = {k.lower(): v for k, v in options.items()}
        root = options.get("path")
        table = options.get("table")
        if not root or not table:
            raise ValueError(
                "bulker_changes requires .option('path', warehouse_root) "
                "and .option('table', name)"
            )
        ns = options.get("namespace", "default")
        self.table = table
        self.table_dir = os.path.join(root, ns, table)
        self.starting = str(options.get("startingcommit", "latest"))
        self.max_commits = int(options.get("maxcommitspertrigger", 50) or 0)
        self.files_per_part = max(
            1, int(options.get("filesperpartition", 4) or 4)
        )
        meta = _log_entry(self.table_dir, _log_commits(self.table_dir)[-1])[
            "meta"
        ]
        if meta.get("json_storage") == "variant":
            raise NotImplementedError(
                "bulker_changes does not stream variant-storage tables; "
                "use Engine.read_changes batch reads"
            )
        self._cols = _live_columns(meta)
        # last offset planned by latestOffset (rate-limit anchor; the
        # first trigger after a restart is unbounded catch-up, matching
        # the topic source / Kafka maxOffsetsPerTrigger discipline)
        self._last: int | None = None

    # -- offsets ------------------------------------------------------------
    def initialOffset(self) -> dict:
        commits = _log_commits(self.table_dir)
        if self.starting == "latest":
            return {"commit": commits[-1]}
        if self.starting == "earliest":
            return {"commit": commits[0]}
        start = int(self.starting)
        if start not in commits:
            raise FileNotFoundError(
                f"startingCommit {start} is not in the retained log of "
                f"{self.table} (retention bounds the feed horizon)"
            )
        return {"commit": start}

    def latestOffset(self) -> dict:
        """Head of the commit log (a metadata-only JSON-tail read).
        ``maxCommitsPerTrigger`` caps how many commits past the last
        planned offset one micro-batch may cover — rate limiting happens
        HERE because whatever this returns is recorded as consumed."""
        commits = _log_commits(self.table_dir)
        head = commits[-1]
        if self.max_commits > 0 and self._last is not None:
            newer = [c for c in commits if c > self._last]
            if len(newer) > self.max_commits:
                head = newer[self.max_commits - 1]
        self._last = head
        return {"commit": head}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        lo, hi = int(start["commit"]), int(end["commit"])
        in_range = [c for c in _log_commits(self.table_dir) if lo <= c <= hi]
        if not in_range or in_range[0] != lo:
            raise FileNotFoundError(
                f"commit {lo} of {self.table} is no longer retained; the "
                "change feed horizon is bounded by version retention"
            )
        entries = [_log_entry(self.table_dir, c) for c in in_range]
        parts: list[InputPartition] = []
        prev = entries[0]
        head_types = dict(self._cols)  # what _read_diff normalizes to
        for e in entries[1:]:
            parts.extend(
                _plan_commit(
                    prev, e, self.table_dir, self.table,
                    self.files_per_part, head_types=head_types,
                )
            )
            prev = e
        if not parts:
            # Spark requires ≥1 partition per planned batch; an empty
            # range (or all-compaction commits) reads zero rows
            parts = [ScanPart(files=[], ctype="insert", commit=hi)]
        return parts

    def read(self, partition) -> Iterator:
        if isinstance(partition, ScanPart):
            return _read_scan(partition, self._cols)
        return _read_diff(partition, self._cols)

    def commit(self, end: dict) -> None:
        pass

    def stop(self) -> None:
        pass


class BulkerChangesDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "bulker_changes"

    def schema(self) -> str:
        root = self.options.get("path")
        table = self.options.get("table")
        if not root or not table:
            raise ValueError(
                "bulker_changes requires .option('path', warehouse_root) "
                "and .option('table', name)"
            )
        ns = self.options.get("namespace", "default")
        tdir = os.path.join(root, ns, table)
        cols = _live_columns(
            _log_entry(tdir, _log_commits(tdir)[-1])["meta"]
        )
        ddl = ", ".join(f"`{n}` {_SPARK_DDL[t]}" for n, t in cols)
        return (
            f"{ddl}, `{_CHANGE_TYPE}` string, `{_CHANGE_COMMIT}` bigint"
        )

    def streamReader(self, schema) -> ChangesStreamReader:
        return ChangesStreamReader(dict(self.options))


def register_changes_source(spark) -> None:
    """Register the ``bulker_changes`` format on this session."""
    spark.dataSource.register(BulkerChangesDataSource)
