"""Parquet-backed warehouse with versioned, atomically-swapped tables.

This is the engine's primary sink, standing in for the reference's SQL
warehouses (``/root/reference/bulkerlib/implementations/sql/sql_adapter.go:23-68``
— CreateTable / LoadTable / CopyTables / ReplaceTable / TruncateTable /
Delete / Select / Count / DropTable). Transactionality mirrors the
reference's tmp-table + single-commit discipline
(``abstract_transactional.go:152-206``):

- every write lands in a fresh ``v_<uuid>`` directory (the "tmp table")
- a commit is the atomic claim of the next numbered entry in the table's
  ``_bulker_log/`` directory (Delta's ``_delta_log/N.json`` protocol) —
  concurrent writers serialize on the claim, and read-modify-write ops
  carry an optimistic-concurrency token so a racing commit raises
  :class:`ConcurrentWriteError` instead of losing an update
- the ``_bulker_meta.json`` pointer is then atomically renamed as the
  readers' cache of the live snapshot; readers resolve it first, so they
  never observe a half-written version.

On a production cluster the same interface binds to Delta/Iceberg, whose
transaction log provides this natively (and MERGE/replaceWhere directly);
the versioned-directory scheme is the dependency-free equivalent with the
same atomicity and O(1) commit.

Partitioned tables (``partition_by``) write with **dynamic partition
overwrite** so replace_partition touches only the affected partition's files
— at 100 TB that is the difference between rewriting a table and rewriting a
day.
"""

from __future__ import annotations

import dataclasses
import datetime as _dt
import json as _json
import os
import re as _re
import shutil
import uuid
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema import UNMAPPED_DATA_COLUMN
from ..table import TableMeta
from ..types_lattice import DataType, from_spark_type

META_FILE = "_bulker_meta.json"
LOG_DIR = "_bulker_log"
# hash-bucket partition column for bucketed tables (Hudi bucket-index
# layout): pmod(xxhash64(*bucket_cols), n_buckets)
BUCKET_COLUMN = "__bucket"
# merge-on-read commit sequence column: reads reconcile per-PK last-wins
# by this monotonic stamp
COMMIT_SEQ_COLUMN = "__commit_seq"
# merge-on-read tombstone marker: a delete appends a row with this flag;
# reconcile drops any PK whose LATEST record carries it
TOMBSTONE_COLUMN = "__deleted"
# change-data-feed output columns (read_changes): Delta CDF's
# _change_type / _commit_version surface
CHANGE_TYPE_COLUMN = "__change_type"
CHANGE_COMMIT_COLUMN = "__change_commit"
# physical bookkeeping columns never exposed through the change feed
_INTERNAL_COLUMNS = (BUCKET_COLUMN, COMMIT_SEQ_COLUMN, TOMBSTONE_COLUMN)


def bucket_expr(cols: list[str], n: int):
    """Deterministic bucket id: xxhash64 is a JVM-codegen'd expression, so
    assignment costs no shuffle and no Python; pmod keeps ids in [0, n)."""
    return F.pmod(F.xxhash64(*[F.col(f"`{c}`") for c in cols]), F.lit(n)).cast(
        "long"
    )


def _collect_file_stats(
    keyed_paths: dict[str, str], max_cols: int = 16
) -> dict[str, dict]:
    """Per-file ``{"rows": n, "cols": {col: [min, max]}}`` from parquet
    footers. ``keyed_paths`` maps the file's stable identity — its
    version-LOCAL relative path (partition dirs + part name) — to the
    absolute path to read. Identity must include the partition dirs, not
    just the basename: one write job reuses part numbers ACROSS partition
    dirs (``__bucket=4/part-00004-<uuid>`` and ``__bucket=5/part-00004-
    <uuid>`` coexist), so basenames collide within a single commit. The
    version-local relpath survives hard-link carries and the plain↔
    reference manifest-entry respelling of partial rewrites (both keep
    partition dir + part name). Values are JSON-serializable (timestamps
    → ISO strings); columns without usable stats are simply absent —
    readers treat a missing stat as "may match". ``rows`` feeds
    metadata-only counts (``Warehouse.count`` with no predicate).

    Driver-side footer reads: O(new files) per commit, never O(rows). In
    a cluster deployment this aggregation would ride the executor-side
    writers (Iceberg collects stats in its write tasks); the commit-log
    format is the same either way."""
    try:
        import pyarrow.parquet as pq
    except ImportError:  # pragma: no cover — pyarrow ships with pyspark
        return {}
    out: dict[str, dict] = {}
    for key, p in keyed_paths.items():
        try:
            md = pq.ParquetFile(p).metadata
        except Exception:
            continue
        cols: dict[str, list] = {}
        nulls: dict[str, int] = {}
        schema = md.schema
        for ci in range(min(md.num_columns, max_cols)):
            name = schema.column(ci).name
            if "." in schema.column(ci).path:  # nested leaf — top level only
                continue
            lo = hi = None
            nn = 0
            ok = True
            for ri in range(md.num_row_groups):
                st = md.row_group(ri).column(ci).statistics
                if st is None or not st.has_min_max:
                    ok = False
                    break
                # -1 = unknown, and it is STICKY: one row group without a
                # null count poisons the whole file (a later group's count
                # must never launder it back to "proven null-free")
                if nn >= 0 and st.has_null_count:
                    nn += int(st.null_count or 0)
                else:
                    nn = -1
                mn, mx = st.min, st.max
                lo = mn if lo is None or mn < lo else lo
                hi = mx if hi is None or mx > hi else hi
            if not ok or lo is None:
                continue
            if isinstance(lo, bytes):
                continue
            if hasattr(lo, "isoformat"):
                lo, hi = lo.isoformat(), hi.isoformat()
            if not isinstance(lo, (int, float, str, bool)):
                continue
            cols[name] = [lo, hi]
            if nn != 0:
                nulls[name] = nn
        # v2: "nulls" records per-column null counts for statted columns
        # (absent = 0, -1 = writer didn't say); consumers that partition
        # work by a column's value range (the change feed's sliced diff)
        # require a PROVEN-null-free column and check v >= 2
        entry: dict = {"rows": md.num_rows, "cols": cols, "v": 2}
        if nulls:
            entry["nulls"] = nulls
        out[key] = entry
    return out


# stats' timestamp rendering: aware-UTC isoformat — always carries an
# explicit offset ('+00:00') or 'Z'; dates render bare 'YYYY-MM-DD'
_ISO_TS_RE = _re.compile(
    r"^\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}(:\d{2})?(\.\d+)?"
    r"(Z|[+-]\d{2}:?\d{2})$"
)
_ISO_DATE_RE = _re.compile(r"^\d{4}-\d{2}-\d{2}$")


def _parse_utc(v) -> "_dt.datetime | None":
    """Aware-UTC datetime from a datetime or ISO-ish string; ``None``
    when the value is naive or unparseable — a naive value's instant
    depends on the session timezone, which this layer cannot see, so it
    must never participate in a prune comparison."""
    if isinstance(v, _dt.datetime):
        return v.astimezone(_dt.timezone.utc) if v.tzinfo else None
    if isinstance(v, str):
        s = v.strip()
        if " " in s:
            s = s.replace(" ", "T", 1)
        if s.endswith("Z"):
            s = s[:-1] + "+00:00"
        try:
            d = _dt.datetime.fromisoformat(s)
        except ValueError:
            return None
        return d.astimezone(_dt.timezone.utc) if d.tzinfo else None
    return None


def _stats_admit(
    stats: dict[str, dict] | None, key: str, prune: dict
) -> bool:
    """May the file contain rows matching every ``{col: (lo, hi)}`` bound?
    ``key`` is the file's version-local relpath (see _collect_file_stats).
    Missing stats (old commits, unstatted columns) always admit — pruning
    is an optimization, never a correctness filter.

    Timestamp-statted columns (aware-UTC ISO strings per
    ``_collect_file_stats``) compare in aware-UTC *datetime* space, never
    lexicographically: a caller bound spelled ``'2024-01-02 23:59:59'``
    would otherwise mis-compare against ``'2024-01-02T12:00:00+00:00'``
    ('T' > ' ', and the offset suffix skews boundary compares). A bound
    that is naive or unparseable leaves that side unbounded — its instant
    is session-timezone-dependent and pruning on it could silently drop
    matching files (the real filter still applies it)."""
    if not stats:
        return True
    cols = stats.get(key, {}).get("cols")
    if not cols:
        return True
    for col, (lo, hi) in prune.items():
        s = cols.get(col)
        if s is None:
            continue
        fmin, fmax = s
        if isinstance(fmin, str) and _ISO_TS_RE.match(fmin):
            fmin_d, fmax_d = _parse_utc(fmin), _parse_utc(fmax)
            if fmin_d is None or fmax_d is None:  # stat itself naive?!
                continue
            lo_d = _parse_utc(lo) if lo is not None else None
            hi_d = _parse_utc(hi) if hi is not None else None
            if (hi_d is not None and fmin_d > hi_d) or (
                lo_d is not None and fmax_d < lo_d
            ):
                return False
            continue
        if isinstance(fmin, str) and _ISO_DATE_RE.match(fmin):
            # date-statted column: pure dates (and date-spelled strings)
            # compare exactly as ISO strings; datetime bounds would need
            # a timezone to resolve to a date — admit instead
            lo_s = _coerce_date_bound(lo)
            hi_s = _coerce_date_bound(hi)
            if (hi is not None and hi_s is not None and fmin > hi_s) or (
                lo is not None and lo_s is not None and fmax < lo_s
            ):
                return False
            continue
        if hasattr(lo, "isoformat") or hasattr(hi, "isoformat"):
            # datetime/date bound against non-temporal stats — admit
            continue
        try:
            if (hi is not None and fmin > hi) or (
                lo is not None and fmax < lo
            ):
                return False
        except TypeError:  # cross-type comparison — admit
            continue
    return True


def _coerce_date_bound(v) -> "str | None":
    """ISO date string for comparing against date-typed file stats;
    ``None`` for anything whose date depends on a timezone."""
    if isinstance(v, _dt.datetime):  # datetime IS a date subclass — first
        return None
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, str) and _ISO_DATE_RE.match(v.strip()):
        return v.strip()
    return None


def _tree_newest_mtime(path: str) -> float:
    """Newest mtime of any entry under ``path`` (inclusive). Used to age
    uncommitted dirs for vacuum: the dir's own mtime freezes at creation
    while Spark keeps writing into nested _temporary subdirs. A path that
    vanishes mid-call (its writer just cleaned up) reads as brand-new, so
    the caller skips it."""
    import time as _time

    try:
        newest = os.path.getmtime(path)
    except OSError:
        return _time.time()
    for root, dirs, files in os.walk(path):
        for entry in dirs + files:
            try:
                m = os.path.getmtime(os.path.join(root, entry))
            except OSError:  # entry vanished mid-walk
                continue
            newest = max(newest, m)
    return newest


class ConcurrentWriteError(RuntimeError):
    """Another writer committed to this table between this operation's
    snapshot read and its commit. The operation wrote no live state; the
    caller should re-read the table (fresh :class:`Warehouse` state or
    :meth:`Warehouse.refresh`) and re-apply — the optimistic-concurrency
    retry loop Delta/Iceberg clients run.

    Deployments with concurrent writers must use ``retain_versions >= 2``
    so the snapshot a racing writer is computing against survives the
    winner's commit-time GC — the same reason Delta retains superseded
    versions for a retention window."""


class Warehouse:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        namespace: str = "default",
        retain_versions: int = 1,
        link_mode: str = "hardlink",
    ):
        """``retain_versions`` > 1 keeps that many committed version
        directories per table, enabling :meth:`history`, ``read(version=)``
        time travel, and :meth:`restore` — the Delta/Iceberg time-travel
        surface on the dependency-free warehouse. The default of 1 GCs
        superseded versions immediately (storage-minimal).

        ``link_mode`` picks the partial-rewrite primitive:

        - ``"hardlink"`` (default): a rewrite builds a NEW version dir of
          hard links to the untouched files — POSIX-only, inode refcounts
          pin retained snapshots against GC.
        - ``"manifest"``: object-store-safe (S3/GCS have no hard links).
          A rewrite's manifest REFERENCES untouched files in their old
          version dirs (``../v_old/part.parquet`` entries — Iceberg's
          manifest model); nothing is linked or copied, GC keeps any
          version dir still referenced by a retained commit. The only
          remaining store requirements are Iceberg's own: atomic PUT
          (commit claim = conditional PUT / If-None-Match, emulated
          locally by tmp-write + ``os.link``) and LIST.

        The modes are observationally equivalent for every read surface
        within the retention window (pinned by
        ``tests/test_link_mode_equivalence.py``'s random-op property).
        BEYOND the window, snapshot availability is best-effort and may
        differ: manifest references keep an old version dir alive as
        long as any retained commit points into it, while hardlink mode
        keeps the bytes (inodes) but not the old dir name."""
        self.spark = spark
        self.root = root
        self.namespace = namespace
        self.retain_versions = max(1, int(retain_versions))
        if link_mode not in ("hardlink", "manifest"):
            raise ValueError(f"unknown link_mode {link_mode!r}")
        self.link_mode = link_mode
        # per-file column min/max recorded in every commit entry
        # (file_stats) → manifest-level data skipping via read(prune=...);
        # see _collect_file_stats. Off = commits skip footer reads.
        self.collect_stats = True
        # Spark's default parquet timestamp encoding (INT96, kept for
        # legacy Impala/Hive compat) carries NO usable footer min/max —
        # timestamp columns would be invisible to data skipping. Write
        # the modern INT64 micros encoding instead (what Delta/Iceberg
        # writers emit), which stats-prunes like any other column.
        try:
            spark.conf.set(
                "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
            )
        except Exception:  # pragma: no cover — conf may be read-only
            pass
        os.makedirs(root, exist_ok=True)
        # driver-side schema cache (table_helper.go:30-62)
        self._meta_cache: dict[str, TableMeta] = {}

    # -- paths -------------------------------------------------------------
    def _table_dir(self, name: str, namespace: str | None = None) -> str:
        return os.path.join(self.root, namespace or self.namespace, name)

    def _meta_path(self, name: str, namespace: str | None = None) -> str:
        return os.path.join(self._table_dir(name, namespace), META_FILE)

    # -- metadata ----------------------------------------------------------
    def get_meta(self, name: str, namespace: str | None = None) -> TableMeta | None:
        key = f"{namespace or self.namespace}.{name}"
        cached = self._meta_cache.get(key)
        if cached is not None:
            return cached
        path = self._meta_path(name, namespace)
        if not os.path.exists(path):
            return None
        with open(path) as fh:
            meta = TableMeta.from_json(_json.load(fh))
        self._meta_cache[key] = meta
        return meta

    @staticmethod
    def _ref_version(rel: str) -> str | None:
        """Version dir a cross-version manifest reference points into, or
        None for a plain (own-version-dir) entry. References are spelled
        ``../v_<hex>/<path>`` — version dirs are siblings, so the same
        string resolves identically from ANY version dir."""
        if not rel.startswith(".." + os.sep) and not rel.startswith("../"):
            return None
        parts = rel.replace(os.sep, "/").split("/")
        return parts[1] if len(parts) > 2 else None

    @classmethod
    def _deref(cls, rel: str) -> str:
        """Strip a ``../v_x/`` reference prefix, leaving the version-local
        path (the shape partition matchers and set-difference logic see)."""
        if cls._ref_version(rel) is None:
            return rel
        return rel.replace(os.sep, "/").split("/", 2)[2]

    def _referenced_versions(self, entries: list[dict]) -> set[str]:
        """All version dirs named by the given log entries — their own
        version pointer AND any cross-version file references."""
        out: set[str] = set()
        for e in entries:
            v = e.get("meta", {}).get("version", "")
            if v:
                out.add(v)
            for f in e.get("files", []):
                rv = self._ref_version(f)
                if rv:
                    out.add(rv)
        return out

    def _current_manifest(
        self, meta: TableMeta, namespace: str | None = None
    ) -> list[str]:
        """The live committed file list: log-tail manifest when a log
        exists (the only correct source under ``link_mode="manifest"`` —
        referenced files do not live in the current version dir), else the
        version-dir walk (log-less / externally created tables)."""
        _m, base, files = self._snapshot(meta.name, namespace)
        if base and files is not None:
            return files
        return self._manifest(meta)

    def _manifest(self, meta: TableMeta) -> list[str]:
        """Data files of the current version dir, relative paths (partition
        subdirs included). This is the commit's snapshot manifest — appends
        land in the same version dir, so the file LIST, not the dir, is
        what identifies a point-in-time state."""
        vdir = os.path.join(
            self._table_dir(meta.name, meta.namespace), meta.version
        )
        out = []
        for base, _dirs, files in os.walk(vdir):
            rel = os.path.relpath(base, vdir)
            for f in files:
                if f.endswith(".parquet") and not f.startswith(("_", ".")):
                    out.append(f if rel == "." else os.path.join(rel, f))
        return sorted(out)

    def _commit_meta(
        self,
        meta: TableMeta,
        op: str = "commit",
        files: list[str] | None = None,
        expected_commit: int | None = None,
        files_delta: list[str] | None = None,
    ) -> None:
        """Commit = atomically claiming the NEXT numbered file in the
        table's ``_bulker_log/`` directory (the Delta ``_delta_log/N.json``
        protocol): the entry is written to a temp file and ``os.link``ed to
        ``{id:012d}.json`` — link fails with EEXIST iff another writer
        claimed that id, which serializes concurrent committers without
        any lock. The meta pointer is then refreshed as a read cache.

        ``expected_commit`` is the optimistic-concurrency token for
        read-modify-write ops (merge/compact/delete/restore): the commit id
        the operation's snapshot read saw. If any other commit landed since,
        claiming ``expected+1`` fails and :class:`ConcurrentWriteError`
        propagates — the lost-update window is closed, not raced. Blind
        commutative ops (append, replace_table) pass ``None`` and self-retry
        with a fresh id.

        ``files_delta`` is how file-ADDING ops (append, MoR merge) declare
        their manifest: committed manifest = tail commit's file list ∪
        delta, re-resolved per claim attempt. A directory walk here would
        capture a CONCURRENT appender's moved-but-uncommitted files into
        this commit's manifest — publishing data its writer hasn't
        committed (and may yet roll back). If the tail's version no longer
        matches (a replace/compact landed mid-append), the delta was
        written into an obsolete version dir and the commit must fail
        rather than regress the pointer."""
        import time as _time

        d = self._table_dir(meta.name, meta.namespace)
        log_dir = os.path.join(d, LOG_DIR)
        os.makedirs(log_dir, exist_ok=True)
        manifest = (
            self._manifest(meta)
            if files is None and files_delta is None
            else files
        )
        attempts = 1 if expected_commit is not None else 5
        committed = False
        stats_cache: dict[str, dict] = {}  # footer reads once across retries
        for i in range(attempts):
            cur = (
                expected_commit
                if expected_commit is not None
                else self._last_commit_id(meta.name, meta.namespace)
            )
            next_id = cur + 1
            if files_delta is not None:
                if cur == 0:
                    # log-less table (externally created / log lost): the
                    # version dir's existing files are the base state — a
                    # delta-only manifest would hide them from reads
                    manifest = sorted(set(self._manifest(meta)) | set(files_delta))
                else:
                    tail_path = os.path.join(log_dir, f"{cur:012d}.json")
                    with open(tail_path) as fh:
                        tail = _json.load(fh)
                    if tail["meta"].get("version") != meta.version:
                        raise ConcurrentWriteError(
                            f"version of {meta.namespace}.{meta.name} was "
                            f"replaced while appending (expected "
                            f"{meta.version}, log tail has "
                            f"{tail['meta'].get('version')})"
                        )
                    manifest = sorted(
                        set(tail.get("files", [])) | set(files_delta)
                    )
                    # the manifest union keeps a concurrent appender's
                    # FILES; its meta must survive too — this writer's
                    # snapshot may predate the tail commit, and reads
                    # build their explicit schema from the winning meta
                    tail_meta = TableMeta.from_json(tail["meta"])
                    novel = {
                        c: t
                        for c, t in meta.columns.items()
                        if c not in tail_meta.columns
                    }
                    if expected_commit is None:
                        # token-less plain append: the ONLY field it
                        # legitimately changes is columns, so rebase the
                        # whole meta on the tail commit — a concurrent
                        # same-version committer may have changed any
                        # other field (mor_seq, pk, ...) after this
                        # writer's snapshot, and a stale overlay would
                        # silently revert it. Token-holding ops (MoR
                        # merge) reconcile against their own snapshot,
                        # where the writer's field changes must win.
                        for fld in dataclasses.fields(meta):
                            setattr(
                                meta, fld.name, getattr(tail_meta, fld.name)
                            )
                    meta.columns = {**tail_meta.columns, **novel}
            # per-file min/max stats for the committed manifest: carried
            # forward from the tail by the file's version-LOCAL relpath
            # (appends/partial rewrites read footers only for their NEW
            # files), computed fresh for anything unseen. Keys absent from
            # the manifest are dropped. Identity is the deref'd relpath,
            # NOT the basename: one write job reuses part numbers across
            # partition dirs, so basenames collide within a commit.
            file_stats: dict[str, dict] = {}
            if self.collect_stats and manifest is not None:
                if files_delta is not None and cur > 0:
                    file_stats = dict(tail.get("file_stats", {}))
                vdir_cur = os.path.join(d, meta.version)
                want = {self._deref(f): f for f in manifest}
                missing = {
                    k: os.path.normpath(os.path.join(vdir_cur, rel))
                    for k, rel in want.items()
                    if k not in file_stats and k not in stats_cache
                }
                if missing:
                    stats_cache.update(_collect_file_stats(missing))
                file_stats.update(
                    {k: stats_cache[k] for k in want if k in stats_cache}
                )
                file_stats = {
                    k: s for k, s in file_stats.items() if k in want
                }
            tmp = os.path.join(log_dir, f".tmp.{uuid.uuid4().hex}")
            with open(tmp, "w") as fh:
                _json.dump(
                    {
                        "commit": next_id,
                        "ts": round(_time.time(), 3),
                        "op": op,
                        "meta": meta.to_json(),
                        "files": manifest,
                        "file_stats": file_stats,
                    },
                    fh,
                )
            try:
                os.link(tmp, os.path.join(log_dir, f"{next_id:012d}.json"))
                committed = True
                break
            except FileExistsError:
                continue
            finally:
                os.unlink(tmp)
        if not committed:
            raise ConcurrentWriteError(
                f"commit {expected_commit or cur} of "
                f"{meta.namespace}.{meta.name} was superseded by a "
                f"concurrent writer"
            )
        # pointer = read cache over the log tail, refreshed post-commit;
        # skipped if a faster committer already claimed a newer id (a
        # stalled writer's late os.replace must not regress the shared
        # pointer below the log tail)
        ptr = os.path.join(d, f".{META_FILE}.{uuid.uuid4().hex}")
        with open(ptr, "w") as fh:
            _json.dump(meta.to_json(), fh)
        if self._last_commit_id(meta.name, meta.namespace) == next_id:
            os.replace(ptr, os.path.join(d, META_FILE))
        else:
            os.unlink(ptr)
        self._meta_cache[f"{meta.namespace}.{meta.name}"] = meta

    def _last_commit_id(self, name: str, namespace: str | None = None) -> int:
        """Highest claimed commit file. A directory listing per commit —
        the same cost profile as Delta's log; tables with very long
        histories bound it via retention checkpoints (``retain_versions``)."""
        log_dir = os.path.join(self._table_dir(name, namespace), LOG_DIR)
        if not os.path.isdir(log_dir):
            return 0
        ids = [
            int(f[:-5])
            for f in os.listdir(log_dir)
            if f.endswith(".json") and f[:-5].isdigit()
        ]
        return max(ids, default=0)

    def refresh(self, name: str, namespace: str | None = None) -> None:
        """Drop the cached meta so the next read resolves the pointer from
        disk — the re-read step of a ConcurrentWriteError retry."""
        self._meta_cache.pop(f"{namespace or self.namespace}.{name}", None)

    def _snapshot(
        self, name: str, namespace: str | None = None
    ) -> tuple[TableMeta | None, int, list[str] | None]:
        """(meta, occ_token, manifest) bound to the SAME snapshot: all come
        from the commit log's tail claim file, never the driver-side meta
        cache or the pointer (either can lag a racing or crashed writer — a
        token read fresh against a stale cached meta would let this
        operation's commit silently bury the commit the cache missed).
        Refreshes the cache as a side effect so subsequent ``read()``
        resolves the same snapshot. ``manifest`` is the committed file list
        (vdir-relative), or ``None`` for a table with no commit log."""
        base = self._last_commit_id(name, namespace)
        if base == 0:
            return self.get_meta(name, namespace), 0, None
        path = os.path.join(
            self._table_dir(name, namespace), LOG_DIR, f"{base:012d}.json"
        )
        with open(path) as fh:
            entry = _json.load(fh)
        meta = TableMeta.from_json(entry["meta"])
        self._meta_cache[f"{namespace or self.namespace}.{name}"] = meta
        return meta, base, entry.get("files")

    def _read_log(self, name: str, namespace: str | None = None) -> list[dict]:
        log_dir = os.path.join(self._table_dir(name, namespace), LOG_DIR)
        if not os.path.isdir(log_dir):
            return []
        out = []
        for f in sorted(os.listdir(log_dir)):
            if f.endswith(".json") and f[:-5].isdigit():
                with open(os.path.join(log_dir, f)) as fh:
                    out.append(_json.load(fh))
        return out

    def _log_entry(
        self, name: str, snapshot: int | str, namespace: str | None = None
    ) -> dict:
        """Resolve a snapshot reference: an int commit id, or a version
        string (→ that version's latest commit).

        Int ids resolve O(1) by opening ``{id:012d}.json`` directly (the
        filename IS the commit id) — a pinned read must not pay a full
        log parse per registration on long-lived streaming tables."""
        if isinstance(snapshot, int):
            p = os.path.join(
                self._table_dir(name, namespace),
                LOG_DIR,
                f"{snapshot:012d}.json",
            )
            try:
                with open(p) as fh:
                    return _json.load(fh)
            except OSError:
                raise FileNotFoundError(
                    f"unknown snapshot {snapshot!r} of {name}"
                ) from None
        log = self._read_log(name, namespace)
        matches = [
            e for e in log if e["meta"].get("version") == snapshot
        ]
        if not matches:
            raise FileNotFoundError(
                f"unknown snapshot {snapshot!r} of {name}"
            )
        return matches[-1]

    def exists(self, name: str, namespace: str | None = None) -> bool:
        return self.get_meta(name, namespace) is not None

    def list_tables(self, namespace: str | None = None) -> list[str]:
        d = os.path.join(self.root, namespace or self.namespace)
        if not os.path.isdir(d):
            return []
        return sorted(
            t for t in os.listdir(d) if os.path.exists(self._meta_path(t, namespace))
        )

    # -- IO ----------------------------------------------------------------
    def _schema_of(self, df: DataFrame) -> dict[str, DataType]:
        return {
            f.name: from_spark_type(f.dataType)
            for f in df.schema.fields
            if f.name != UNMAPPED_DATA_COLUMN
        }

    def read(
        self,
        name: str,
        namespace: str | None = None,
        version: int | str | None = None,
        _raw: bool = False,
        prune: dict | None = None,
    ) -> DataFrame:
        """``prune={col: (lo, hi)}`` drops manifest files whose committed
        footer stats prove no row can match — Iceberg-style data skipping
        at PLANNING time: pruned files are never listed, opened, or
        scheduled (at 100 TB on an object store that is the difference
        between O(matching files) and O(all files) GETs before Spark's
        own row-group pruning even starts). Advisory only: files without
        stats are kept, and the caller still applies the real filter —
        pass ``None`` for an unbounded side."""
        snapshot_files: list[str] | None = None
        prune_stats: dict | None = None
        if version is None:
            # manifest-driven read: the committed file LIST (log tail), not
            # the directory, is the table state — a concurrent appender's
            # moved-but-uncommitted delta files in the same version dir
            # stay invisible until its commit lands
            meta, _base, manifest = self._snapshot(name, namespace)
            if meta is None:
                raise FileNotFoundError(
                    f"table {namespace or self.namespace}.{name}"
                )
            if manifest is not None:
                vdir_cur = os.path.join(
                    self._table_dir(name, namespace), meta.version
                )
                snapshot_files = [
                    os.path.normpath(os.path.join(vdir_cur, f))
                    for f in manifest
                ]
                if prune is not None:
                    base = self._last_commit_id(name, namespace)
                    if base:
                        tail_path = os.path.join(
                            self._table_dir(name, namespace),
                            LOG_DIR,
                            f"{base:012d}.json",
                        )
                        with open(tail_path) as fh:
                            prune_stats = _json.load(fh).get("file_stats")
        else:
            # time travel: schema AND file manifest come from the commit-log
            # snapshot (columns may have evolved and appends may have added
            # files to the same version dir since)
            entry = self._log_entry(name, version, namespace)
            meta = TableMeta.from_json(entry["meta"])
            vdir_old = os.path.join(
                self._table_dir(name, namespace), meta.version
            )
            snapshot_files = [
                os.path.normpath(os.path.join(vdir_old, f))
                for f in entry["files"]
            ]
            missing = [f for f in snapshot_files if not os.path.exists(f)]
            if missing:
                raise FileNotFoundError(
                    f"snapshot {version!r} of {name} was garbage-collected "
                    f"(retain_versions={self.retain_versions})"
                )
            if prune is not None:
                prune_stats = entry.get("file_stats")
        if prune is not None and meta.write_mode == "mor":
            # last-wins reconcile must see EVERY delta holding a PK;
            # skipping a file could resurrect a superseded row
            raise ValueError(
                f"prune is undefined on merge-on-read table {name}; "
                f"compact() first or read unpruned"
            )
        if prune is not None and snapshot_files is not None and prune_stats:
            # stats key = version-local relpath: strip table dir + the
            # owning version dir from the resolved absolute path
            table_dir = self._table_dir(name, namespace)

            def _key(p: str) -> str:
                rel = os.path.relpath(p, table_dir)
                return rel.split(os.sep, 1)[1] if os.sep in rel else rel

            snapshot_files = [
                p
                for p in snapshot_files
                if _stats_admit(prune_stats, _key(p), prune)
            ]
        if prune is not None and snapshot_files is not None:
            # bucket pruning: a hash-bucketed file's stats span the whole
            # key range, so min/max can't skip it — but a POINT bound
            # (lo == hi) on every bucket column determines the one bucket
            # dir that can hold the row. This is what makes SQL point
            # lookups on the CDC-shaped bucketed tables O(bucket), the
            # read-side twin of the bucket-scoped merge.
            points = self._bucket_point(meta, prune)
            if points is not None:
                try:
                    seg = f"{BUCKET_COLUMN}={self._bucket_of(meta, points)}"
                except Exception:
                    seg = None  # untypeable point — skip, never misprune
                if seg is not None:
                    snapshot_files = [
                        p
                        for p in snapshot_files
                        # a file outside any bucket dir is kept
                        if BUCKET_COLUMN + "=" not in p
                        or seg in p.replace(os.sep, "/").split("/")
                    ]
        vdir = os.path.join(self._table_dir(name, namespace), meta.version)
        # Explicit meta-driven schema: enforces first-seen column order and
        # null-fills columns absent from older files (schema evolution)
        # without a mergeSchema footer scan over every file.
        from pyspark.sql import types as T

        from ..types_lattice import to_spark_type

        variant = meta.json_storage == "variant"
        json_spark_t = T.VariantType() if variant else T.StringType()

        def field_type(t: DataType) -> T.DataType:
            return json_spark_t if t == DataType.JSON else to_spark_type(t)

        fields = [
            T.StructField(n, field_type(t), True) for n, t in meta.columns.items()
        ]
        fields.append(T.StructField(UNMAPPED_DATA_COLUMN, json_spark_t, True))
        schema = T.StructType(fields)
        if snapshot_files is not None:
            out = self._read_file_set(
                self._table_dir(name, namespace), snapshot_files, schema
            )
        else:
            out = self.spark.read.schema(schema).parquet(vdir)
        if meta.write_mode == "mor" and not _raw:
            out = self._mor_reconcile(meta, out)
        return out

    def _read_file_set(self, table_dir: str, paths: list[str], schema) -> DataFrame:
        """Explicit-manifest scan of an arbitrary file set; basePath keeps
        partition-dir columns. Under link_mode="manifest" entries reference
        files across version dirs — group per dir so each group's basePath
        still roots its partition-column extraction (all groups share the
        explicit schema, so the union is a pure scan-set union)."""
        if not paths:
            return self.spark.createDataFrame([], schema)
        groups: dict[str, list[str]] = {}
        for p in paths:
            v = os.path.relpath(p, table_dir).split(os.sep)[0]
            groups.setdefault(v, []).append(p)
        parts = [
            self.spark.read.schema(schema)
            .option("basePath", os.path.join(table_dir, v))
            .parquet(*ps)
            for v, ps in sorted(groups.items())
        ]
        out = parts[0]
        for extra in parts[1:]:
            out = out.unionByName(extra)
        return out

    @staticmethod
    def _json_storage_of(df: DataFrame) -> str:
        from pyspark.sql import types as T

        has_variant = any(
            isinstance(f.dataType, T.VariantType) for f in df.schema.fields
        )
        return "variant" if has_variant else "text"

    def _align_json_storage(self, meta: TableMeta, df: DataFrame) -> DataFrame:
        """Coerce a batch's JSON columns to the table's committed storage
        (text vs variant) so appends/merges never mix physical types in one
        table. Cheap: touches only JSON-typed columns, stays JVM-side."""
        from pyspark.sql import types as T

        want_variant = meta.json_storage == "variant"
        out = df
        for f in df.schema.fields:
            json_col = (
                meta.columns.get(f.name) == DataType.JSON
                or f.name == UNMAPPED_DATA_COLUMN
            )
            if want_variant and json_col and isinstance(f.dataType, T.StringType):
                out = out.withColumn(
                    f.name, F.try_parse_json(F.col(f"`{f.name}`"))
                )
            elif not want_variant and isinstance(f.dataType, T.VariantType):
                out = out.withColumn(f.name, F.col(f"`{f.name}`").cast("string"))
        return out

    def _write_version(
        self, name: str, df: DataFrame, partition_by: list[str], namespace: str | None
    ) -> str:
        version = f"v_{uuid.uuid4().hex}"
        vdir = os.path.join(self._table_dir(name, namespace), version)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(vdir)
        return version

    def _append_files(
        self,
        df: DataFrame,
        vdir: str,
        partition_by: list[str] | None = None,
    ) -> list[str]:
        """Append ``df``'s parquet files into the live version dir WITHOUT
        sharing Hadoop's ``_temporary`` committer scratch with concurrent
        writers: two jobs appending ``mode("append")`` into one directory
        share ``<dir>/_temporary/0/``, and whichever job finishes first
        deletes it out from under the other's running tasks (observed as
        ``chmod: cannot access ... _temporary/... No such file`` under
        racing MoR merges). Instead the write lands in a private sibling
        staging dir and the finished data files are moved in — part names
        carry the write job's UUID, so moves are collision-free.

        Returns the moved paths so a failed OCC commit can unlink them
        (without rollback, a delta whose commit lost the race would stay
        physically visible to readers)."""
        table_dir = os.path.dirname(vdir.rstrip("/"))
        stage = os.path.join(table_dir, f".stage_{uuid.uuid4().hex}")
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(stage)
        moved: list[str] = []
        try:
            for base_dir, _dirs, files in os.walk(stage):
                rel = os.path.relpath(base_dir, stage)
                for f in files:
                    if not f.endswith(".parquet") or f.startswith(("_", ".")):
                        continue
                    dst_dir = vdir if rel == "." else os.path.join(vdir, rel)
                    os.makedirs(dst_dir, exist_ok=True)
                    dst = os.path.join(dst_dir, f)
                    os.replace(os.path.join(base_dir, f), dst)
                    moved.append(dst)
        finally:
            shutil.rmtree(stage, ignore_errors=True)
        return moved

    def _rollback_files(self, moved: list[str]) -> None:
        for p in moved:
            try:
                os.unlink(p)
            except OSError:  # already gone — nothing to roll back
                pass

    @staticmethod
    def _partition_matcher(col: str, values) -> "Callable[[str], bool]":
        """rel-path predicate: does any ``col=value`` component name one
        of ``values``? Values are spelled the way Spark writes partition
        dirs (NULL → ``__HIVE_DEFAULT_PARTITION__``, booleans lowercase,
        specials percent-escaped); both raw and escaped spellings are
        precomputed once, so matching is O(path components)."""
        from urllib.parse import quote, unquote

        def dir_value(v) -> str:
            if v is None:
                return "__HIVE_DEFAULT_PARTITION__"
            if isinstance(v, bool):
                return "true" if v else "false"
            return str(v)

        spelled = {dir_value(v) for v in values}
        spelled |= {quote(v, safe="") for v in list(spelled)}
        prefix = col + "="

        def match(rel: str) -> bool:
            for seg in rel.split(os.sep):
                if not seg.startswith(prefix):
                    continue
                raw = seg[len(prefix):]
                if raw in spelled or unquote(raw) in spelled:
                    return True
            return False

        return match

    def _link_subset_version(
        self,
        meta: TableMeta,
        manifest: list[str],
        excluded,
        namespace: str | None,
        missing_exc: Callable[[], Exception] | None = None,
    ) -> tuple[str, str, list[str]]:
        """Partial-rewrite primitive: a NEW version directory holding hard
        links to every current-manifest file EXCEPT those ``excluded``
        (a ``rel_path -> bool`` predicate). The caller then lands the
        rewritten slice into the new dir and commits — so partition- and
        bucket-scoped rewrites get full snapshot isolation: concurrent
        readers and retained time-travel snapshots keep the old version's
        files (hard links, no data copy; an object-store binding would
        rewrite the manifest instead), and a lost OCC race rolls back by
        deleting the new dir. Returns (version, new_vdir, kept_rel)."""
        d = self._table_dir(meta.name, namespace)
        old_vdir = os.path.join(d, meta.version)
        version = f"v_{uuid.uuid4().hex}"
        new_vdir = os.path.join(d, version)
        kept: list[str] = []
        if self.link_mode == "manifest":
            # object-store path: keep entries as REFERENCES into the old
            # version dirs — no links, no copies, O(manifest) metadata.
            # ../v_x/... entries resolve identically from any sibling
            # version dir, so prior references pass through unchanged.
            os.makedirs(new_vdir, exist_ok=True)
            for rel in manifest:
                if excluded(self._deref(rel)):
                    continue
                ref = (
                    rel
                    if self._ref_version(rel)
                    else os.path.join("..", meta.version, rel)
                )
                # same GC-race semantics as the hardlink path's
                # FileNotFoundError, minus the inode pinning: a racing
                # commit's retention GC may have removed the snapshot
                if not os.path.exists(
                    os.path.normpath(os.path.join(new_vdir, ref))
                ):
                    shutil.rmtree(new_vdir, ignore_errors=True)
                    if missing_exc is not None:
                        raise missing_exc()
                    self.refresh(meta.name, namespace)
                    raise ConcurrentWriteError(
                        f"snapshot {meta.version} of {meta.name} was "
                        f"garbage-collected during rewrite (superseded by "
                        f"a concurrent commit)"
                    )
                kept.append(ref)
            return version, new_vdir, kept
        for rel in manifest:
            # deref: a table previously written under link_mode="manifest"
            # may carry ../v_x/ reference entries — materialize them as
            # links under their version-local path (dst must stay INSIDE
            # new_vdir), converting the table back to physical layout
            plain = self._deref(rel)
            if excluded(plain):
                continue
            src = os.path.normpath(os.path.join(old_vdir, rel))
            dst = os.path.join(new_vdir, plain)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            try:
                os.link(src, dst)
            except FileNotFoundError:
                # a racing commit's retention GC removed our snapshot's
                # version dir mid-link — surface as the OCC conflict it is
                # (or the caller's own exception, e.g. restore's
                # garbage-collected-snapshot FileNotFoundError)
                shutil.rmtree(new_vdir, ignore_errors=True)
                if missing_exc is not None:
                    raise missing_exc()
                # the cached snapshot meta names a GC'd version — drop it
                self.refresh(meta.name, namespace)
                raise ConcurrentWriteError(
                    f"snapshot {meta.version} of {meta.name} was "
                    f"garbage-collected during rewrite (superseded by a "
                    f"concurrent commit)"
                )
            except OSError:
                shutil.copy2(src, dst)
            kept.append(plain)
        os.makedirs(new_vdir, exist_ok=True)
        return version, new_vdir, kept

    def _land_partial_rewrite(
        self,
        name: str,
        namespace: str | None,
        meta: TableMeta,
        version: str,
        new_vdir: str,
        kept: list[str],
        slice_df: DataFrame,
        base: int | None,
        op: str,
    ) -> TableMeta:
        """Second half of every partial rewrite: land the rewritten slice
        into the hard-linked version dir, commit its exact manifest under
        the OCC token, and GC by retention. Rollback happens ONLY on the
        pre-claim conflict — a failure after the log entry is claimed
        must leave the (now-committed) version dir alone (vacuum reclaims
        genuine orphans) — and the in-place-mutated snapshot meta is
        dropped from the cache so later ops re-resolve the log tail."""
        try:
            moved = self._append_files(slice_df, new_vdir, meta.partition_by)
            meta.version = version
            self._commit_meta(
                meta,
                op=op,
                files=sorted(
                    set(kept)
                    | {os.path.relpath(p, new_vdir) for p in moved}
                ),
                expected_commit=base,
            )
        except ConcurrentWriteError:
            self.refresh(name, namespace)
            shutil.rmtree(new_vdir, ignore_errors=True)
            raise
        self._gc_old_versions(name, version, namespace)
        return meta

    def _gc_old_versions(self, name: str, keep: str, namespace: str | None) -> None:
        """Drop version dirs referenced by none of the newest
        ``retain_versions`` commits. Hard-linked restore dirs survive a
        source dir's GC (inode refcounts), so this never breaks a retained
        snapshot.

        Only versions the commit log KNOWS about are eligible: a ``v_*``
        dir in no log entry may belong to a concurrent writer that has
        written its data but not yet claimed its commit — deleting it here
        would corrupt that writer's commit. Unreferenced leftovers (crashed
        writers) are reclaimed by the explicit, age-guarded
        :meth:`vacuum`."""
        d = self._table_dir(name, namespace)
        log = self._read_log(name, namespace)
        referenced = [e["meta"].get("version", "") for e in log]
        # retain the last N DISTINCT versions, not the last N commits —
        # appends reuse a version dir, so counting commits would silently
        # shorten the promised retention window
        distinct: list[str] = []
        for v in reversed(referenced):
            if v and v not in distinct:
                distinct.append(v)
            if len(distinct) >= self.retain_versions:
                break
        retained = {keep} | set(distinct)
        # manifest mode: a retained commit's manifest may REFERENCE files
        # in older version dirs — those dirs hold live data and must
        # survive, even though no retained commit points at them. Refs
        # never chain (they always name the physical dir), so one hop
        # closes the set.
        retained |= self._referenced_versions(
            [e for e in log if e["meta"].get("version") in retained]
        )
        for v in set(referenced):
            if v and v not in retained:
                shutil.rmtree(os.path.join(d, v), ignore_errors=True)

    def vacuum(
        self,
        name: str,
        namespace: str | None = None,
        min_age_seconds: float = 3600.0,
    ) -> list[str]:
        """Reclaim orphans: version dirs referenced by no commit (crashed
        or aborted writers) and stale commit-log temp files — Delta's
        VACUUM for the uncommitted side. The mtime age guard keeps an
        in-flight writer's freshly-written version safe; pass
        ``min_age_seconds=0`` only when no other writer can be active.
        Returns the removed version dir names."""
        import time as _time

        d = self._table_dir(name, namespace)
        if not os.path.isdir(d):
            return []
        log = self._read_log(name, namespace)
        # a version dir is live if ANY commit points at it — as its
        # version, or (manifest link_mode) via a file reference
        known = self._referenced_versions(log)
        meta = self.get_meta(name, namespace)
        if meta is not None:
            known.add(meta.version)
        now = _time.time()
        removed: list[str] = []
        for entry in os.listdir(d):
            p = os.path.join(d, entry)
            # age by the NEWEST mtime in the tree for BOTH branches: an
            # in-flight writer keeps producing files under the dir while
            # the top-level mtime stays frozen at creation — top-level age
            # alone would reclaim a long-running uncommitted write
            if (
                entry.startswith("v_")
                and entry not in known
                and os.path.isdir(p)
                and now - _tree_newest_mtime(p) >= min_age_seconds
            ):
                shutil.rmtree(p, ignore_errors=True)
                removed.append(entry)
            # crashed writers can leave append staging dirs behind
            # (_append_files cleans up on every non-crash path); age by the
            # NEWEST mtime anywhere in the tree — Spark writes into nested
            # _temporary subdirs without touching the top-level dir's mtime,
            # so the top-level age alone would reclaim an in-flight write
            elif (
                entry.startswith(".stage_")
                and os.path.isdir(p)
                and now - _tree_newest_mtime(p) >= min_age_seconds
            ):
                shutil.rmtree(p, ignore_errors=True)
                removed.append(entry)
        log_dir = os.path.join(d, LOG_DIR)
        if os.path.isdir(log_dir):
            for f in os.listdir(log_dir):
                p = os.path.join(log_dir, f)
                if (
                    f.startswith(".tmp.")
                    and now - os.path.getmtime(p) >= min_age_seconds
                ):
                    os.unlink(p)
        return removed

    def clone(
        self,
        name: str,
        target: str,
        *,
        snapshot: int | str | None = None,
        namespace: str | None = None,
        target_namespace: str | None = None,
    ) -> TableMeta:
        """Zero-copy table clone (Delta SHALLOW CLONE, made durable: hard
        links pin the inodes, so the clone survives even if the source's
        snapshot is later vacuumed). The source's current — or
        ``snapshot``'s — file manifest is linked into the target table's
        first version and committed as a fresh, independent commit log;
        from then on the two tables evolve separately. The training-
        workflow use: pin an exact dataset state as its own table while
        the source keeps ingesting."""
        src_ns = namespace or self.namespace
        tgt_ns = target_namespace or src_ns
        if self.exists(target, tgt_ns):
            raise ValueError(f"table {tgt_ns}.{target} already exists")
        if snapshot is not None:
            entry = self._log_entry(name, snapshot, namespace)
            meta = TableMeta.from_json(entry["meta"])
            files = entry["files"]
        else:
            meta, _base, files = self._snapshot(name, namespace)
            if meta is None:
                raise FileNotFoundError(f"table {src_ns}.{name}")
            if files is None:
                files = self._manifest(meta)
        src_vdir = os.path.join(self._table_dir(name, src_ns), meta.version)
        new_meta = TableMeta.from_json(meta.to_json())
        new_meta.name = target
        new_meta.namespace = tgt_ns
        new_meta.version = f"v_{uuid.uuid4().hex}"
        # the clone's commit log restarts at 1 — an inherited
        # last_compact_commit could collide with the new counter and
        # falsely arm the clustered no-op compaction skip
        new_meta.last_compact_commit = 0
        tgt_vdir = os.path.join(
            self._table_dir(target, tgt_ns), new_meta.version
        )
        try:
            plain_files: list[str] = []
            for rel in files:
                # deref: manifest-mode refs resolve against the source's
                # version dir; the clone stores everything version-local
                plain = self._deref(rel)
                src = os.path.normpath(os.path.join(src_vdir, rel))
                dst = os.path.join(tgt_vdir, plain)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                try:
                    if self.link_mode == "manifest":
                        # object stores have no cross-key hard links; the
                        # durable clone is a copy (server-side COPY on
                        # S3/GCS — no data moves through the driver there)
                        shutil.copy2(src, dst)
                    else:
                        os.link(src, dst)
                except FileNotFoundError:
                    raise FileNotFoundError(
                        f"snapshot {snapshot!r} of {name} was "
                        f"garbage-collected"
                    )
                except OSError:
                    shutil.copy2(src, dst)
                plain_files.append(plain)
            os.makedirs(tgt_vdir, exist_ok=True)  # empty source clones too
            self._commit_meta(new_meta, op="clone", files=plain_files)
        except Exception:
            shutil.rmtree(
                self._table_dir(target, tgt_ns), ignore_errors=True
            )
            raise
        return new_meta

    def history(self, name: str, namespace: str | None = None) -> list[dict]:
        """Commit history, newest first: ``{commit, ts, op, version,
        n_files, available}`` per commit. ``available`` marks snapshots
        whose manifest files are all still on disk (readable via
        ``read(version=<commit|version>)`` / restorable)."""
        d = self._table_dir(name, namespace)
        out = []
        for e in reversed(self._read_log(name, namespace)):
            v = e["meta"].get("version", "")
            vdir = os.path.join(d, v)
            out.append(
                {
                    "commit": e.get("commit"),
                    "ts": e["ts"],
                    "op": e["op"],
                    "version": v,
                    "n_files": len(e.get("files", [])),
                    "available": all(
                        os.path.exists(
                            os.path.normpath(os.path.join(vdir, f))
                        )
                        for f in e.get("files", [])
                    ),
                }
            )
        return out

    def restore(
        self, name: str, snapshot: int | str, namespace: str | None = None
    ) -> TableMeta:
        """Roll the table back to a retained snapshot (Delta RESTORE),
        addressed by commit id or version string. The snapshot's files are
        hard-linked into a fresh version directory (no data copy on a
        POSIX fs; an object-store binding would rewrite the manifest
        instead) and committed as the live pointer — so the live version
        dir always equals the live snapshot, and the restore is itself an
        undoable commit in the history."""
        entry = self._log_entry(name, snapshot, namespace)
        base = self._last_commit_id(name, namespace)
        meta = TableMeta.from_json(entry["meta"])
        new_version, _new_dir, kept = self._link_subset_version(
            meta,
            entry["files"],
            lambda _rel: False,  # full snapshot: link everything
            namespace,
            missing_exc=lambda: FileNotFoundError(
                f"snapshot {snapshot!r} of {name} was garbage-collected"
            ),
        )
        meta.version = new_version
        # explicit manifest: under link_mode="manifest" the new version
        # dir is physically empty (kept = references), so the default
        # dir-walk manifest would commit an empty table
        self._commit_meta(
            meta, op="restore", files=sorted(kept), expected_commit=base
        )
        self._gc_old_versions(name, new_version, namespace)
        return meta

    def read_appended(
        self,
        name: str,
        since_commit: int,
        namespace: str | None = None,
        ops: tuple = ("append",),
        to_commit: int | None = None,
    ) -> DataFrame:
        """Incremental consumption: rows in files ADDED after commit
        ``since_commit`` (manifest set difference — no data diffing, no
        re-read of already-consumed files). Valid only while every intervening
        commit's op is in ``ops``; a merge/replace/compact rewrites files, so
        row-level increments are undefined and this raises ``ValueError``
        (the consumer should fall back to a full re-read from the new
        snapshot). The downstream pattern: checkpoint the latest commit id
        from :meth:`history`, call this per cycle.

        On a merge-on-read table, pass ``ops=("append", "merge_mor")`` to
        consume its delta commits as an UPSERT CHANGE FEED: each returned
        row is "this PK now has these values" (rows are NOT deduped against
        history — that is the consumer's contract, e.g. a downstream MERGE
        or a trainer that wants latest-state records). Additive consumers
        (incremental rollups) must NOT opt in: a superseding row would
        double-count, which is why the default rejects ``merge_mor`` and
        the rollup falls back to a full rebuild."""
        log = self._read_log(name, namespace)
        base = [e for e in log if e.get("commit") == since_commit]
        if not base:
            raise FileNotFoundError(
                f"unknown commit {since_commit} of {name}"
            )
        newer = [
            e
            for e in log
            if e.get("commit", 0) > since_commit
            and (to_commit is None or e.get("commit", 0) <= to_commit)
        ]
        non_append = [e["op"] for e in newer if e["op"] not in ops]
        if non_append:
            raise ValueError(
                f"table {name} was rewritten ({non_append[0]}) after commit "
                f"{since_commit}; incremental read undefined — re-read the "
                "current snapshot"
            )
        # version dir of the BOUNDED tail entry, not the live pointer — a
        # commit landing after to_commit must not redirect this read
        tail_entry = newer[-1] if newer else base[-1]
        vdir = os.path.join(
            self._table_dir(name, namespace), tail_entry["meta"]["version"]
        )
        base_files = set(base[-1]["files"])
        latest_files = (
            set(newer[-1]["files"]) if newer else base_files
        )
        added = sorted(latest_files - base_files)
        # raw schema: a MoR change feed must expose the physical
        # __commit_seq / __deleted records — they ARE the change events
        live_schema = self.read(name, namespace, _raw=True).schema
        if not added:
            return self.spark.createDataFrame([], live_schema)
        return (
            self.spark.read.schema(live_schema)
            .option("basePath", vdir)
            .parquet(
                *[
                    os.path.normpath(os.path.join(vdir, f))
                    for f in added
                ]
            )
        )

    # -- change data feed ---------------------------------------------------
    @classmethod
    def _entry_file_paths(cls, entry: dict, table_dir: str) -> dict[str, str]:
        """Resolve a commit entry's manifest to {identity: absolute path}.
        Identity = the file's version-LOCAL relpath (partition dirs + part
        name, ``_deref``'d): partial rewrites hard-link (or manifest-
        reference) untouched files into the new version under the SAME
        relpath, so a set-difference between two commits yields exactly
        the physically added/removed files — never the carried-forward
        ones. Basenames alone would collide: one write job reuses part
        numbers across partition dirs."""
        vdir = os.path.join(table_dir, entry["meta"]["version"])
        return {
            cls._deref(f): os.path.normpath(os.path.join(vdir, f))
            for f in entry.get("files") or []
        }

    @staticmethod
    def _comparable(col, dtype):
        """Equality-safe projection of a column for change detection:
        maps and variants don't support eqNullSafe, so any type containing
        one compares by its canonical JSON rendering."""
        from pyspark.sql import types as T

        def has_uncomparable(t) -> bool:
            if isinstance(t, (T.MapType, T.VariantType)):
                return True
            if isinstance(t, T.StructType):
                return any(has_uncomparable(f.dataType) for f in t.fields)
            if isinstance(t, T.ArrayType):
                return has_uncomparable(t.elementType)
            return False

        return F.to_json(col) if has_uncomparable(dtype) else col

    def read_changes(
        self,
        name: str,
        since_commit: int,
        namespace: str | None = None,
        to_commit: int | None = None,
    ) -> DataFrame:
        """Row-level change data feed (Delta CDF's ``table_changes``
        surface, computed Iceberg-changelog style from retained snapshots —
        no write-path amplification, works retroactively on every table):
        all logical row changes AFTER ``since_commit`` (exclusive, the
        consumer's checkpoint) up to ``to_commit`` (inclusive, default
        head). Output = live columns + ``__change_type`` + ``__change_commit``.

        Change types per commit op:

        - ``append`` → ``insert`` rows, derived purely from the commit's
          added files — manifest set-difference, zero joins (at 100 TB
          appends dominate and the feed costs one scan of the new files).
        - ``merge``/``delete`` (copy-on-write) → the removed and added
          files are diffed by PK in ONE full-outer join →
          ``insert`` / ``delete`` / ``update_preimage`` + ``update_postimage``;
          rows merely copied by the rewrite (same values) are filtered out.
          The join spans only the REWRITTEN slice, so bucketed/partitioned
          layouts bound the feed cost exactly as they bound the merge
          itself. A PK-less conditional delete falls back to a multiset
          ``exceptAll`` diff.
        - ``replace_partition`` → ``delete`` of every removed-file row +
          ``insert`` of every added-file row (the operation's exact
          semantics; join-free).
        - ``merge_mor`` → the appended delta files ARE the feed:
          tombstones → ``delete``, everything else → ``upsert``
          (postimage-only; distinguishing insert vs update would need the
          full-history reconcile MoR exists to avoid).
        - ``compact``/``rebucket`` → no logical change, skipped.
        - ``replace_table``/``restore``/``clone`` → feed reset: raises
          ``ValueError`` — re-read the snapshot and restart the feed.

        The feed horizon is bounded by version retention
        (``retain_versions``): a GC'd commit raises ``FileNotFoundError``.
        Invariant (pinned by tests): applying the feed to the
        ``since_commit`` snapshot reproduces the ``to_commit`` snapshot.

        Reference parity: the reference emits no change feed — this is the
        downstream half of its CDC story (events in via Kafka; here,
        changes OUT to incremental consumers)."""
        log = self._read_log(name, namespace)
        entries = [
            e
            for e in log
            if e.get("commit", 0) >= since_commit
            and (to_commit is None or e.get("commit", 0) <= to_commit)
        ]
        if not entries or entries[0].get("commit") != since_commit:
            raise FileNotFoundError(f"unknown commit {since_commit} of {name}")
        table_dir = self._table_dir(name, namespace)
        raw_schema = self.read(name, namespace, _raw=True).schema
        live_cols = [
            f.name
            for f in raw_schema.fields
            if f.name not in _INTERNAL_COLUMNS
        ]
        pieces: list[DataFrame] = []
        prev = entries[0]
        for e in entries[1:]:
            piece = self._commit_changes(
                name, table_dir, prev, e, raw_schema, live_cols
            )
            if piece is not None:
                pieces.append(piece)
            prev = e
        if not pieces:
            from pyspark.sql import types as T

            fields = [
                f for f in raw_schema.fields if f.name in set(live_cols)
            ] + [
                T.StructField(CHANGE_TYPE_COLUMN, T.StringType(), False),
                T.StructField(CHANGE_COMMIT_COLUMN, T.LongType(), False),
            ]
            return self.spark.createDataFrame([], T.StructType(fields))
        out = pieces[0]
        for p in pieces[1:]:
            out = out.unionByName(p)
        return out

    def _commit_changes(
        self,
        name: str,
        table_dir: str,
        prev: dict,
        entry: dict,
        raw_schema,
        live_cols: list[str],
    ) -> DataFrame | None:
        """Change rows contributed by ONE commit (see read_changes)."""
        op = entry["op"]
        commit = int(entry["commit"])
        if op in ("compact", "rebucket"):
            return None  # physical reorganization; logical state unchanged
        if op not in ("append", "merge", "merge_mor", "delete",
                      "replace_partition"):
            raise ValueError(
                f"table {name} was reset ({op}) at commit {commit}; the "
                "change feed is undefined across it — re-read the current "
                "snapshot and restart the feed from its commit"
            )
        prev_files = self._entry_file_paths(prev, table_dir)
        cur_files = self._entry_file_paths(entry, table_dir)
        added = sorted(
            p for bn, p in cur_files.items() if bn not in prev_files
        )
        removed = sorted(
            p for bn, p in prev_files.items() if bn not in cur_files
        )
        gone = [p for p in (*added, *removed) if not os.path.exists(p)]
        if gone:
            raise FileNotFoundError(
                f"commit {commit} of {name} was garbage-collected "
                f"(retain_versions={self.retain_versions}); the change feed "
                "horizon is bounded by retention"
            )

        def tag(df: DataFrame, ctype) -> DataFrame:
            ctype = F.lit(ctype) if isinstance(ctype, str) else ctype
            return df.select(
                *live_cols,
                ctype.alias(CHANGE_TYPE_COLUMN),
                F.lit(commit).cast("long").alias(CHANGE_COMMIT_COLUMN),
            )

        if op == "append":
            return tag(
                self._read_file_set(table_dir, added, raw_schema), "insert"
            )
        if op == "merge_mor":
            delta = self._read_file_set(table_dir, added, raw_schema)
            if TOMBSTONE_COLUMN in delta.columns:
                ctype = F.when(
                    F.col(TOMBSTONE_COLUMN), F.lit("delete")
                ).otherwise(F.lit("upsert"))
            else:
                ctype = F.lit("upsert")
            return tag(delta, ctype)
        old = self._read_file_set(table_dir, removed, raw_schema)
        new = self._read_file_set(table_dir, added, raw_schema)
        if op == "replace_partition":
            return tag(old, "delete").unionByName(tag(new, "insert"))
        pk = [c for c in (entry["meta"].get("pk") or []) if c in live_cols]
        if not pk:
            dele = old.select(*live_cols).exceptAll(new.select(*live_cols))
            ins = new.select(*live_cols).exceptAll(old.select(*live_cols))
            return tag(dele, "delete").unionByName(tag(ins, "insert"))
        data_cols = [c for c in live_cols if c not in pk]
        dtypes = {f.name: f.dataType for f in raw_schema.fields}
        o = old.select(
            *pk,
            *[F.col(c).alias(f"__o_{c}") for c in data_cols],
            F.lit(True).alias("__in_old"),
        )
        n = new.select(*pk, *data_cols, F.lit(True).alias("__in_new"))
        j = o.join(n, on=pk, how="full_outer")
        changed = F.lit(False)
        for c in data_cols:
            changed = changed | ~self._comparable(
                F.col(f"__o_{c}"), dtypes[c]
            ).eqNullSafe(self._comparable(F.col(c), dtypes[c]))
        is_ins = F.col("__in_old").isNull()
        is_del = F.col("__in_new").isNull()
        is_upd = (~is_ins) & (~is_del) & changed
        if data_cols:
            old_struct = F.struct(
                *[F.col(f"__o_{c}").alias(c) for c in data_cols]
            )
            new_struct = F.struct(*[F.col(c).alias(c) for c in data_cols])
        else:  # pk-only table: wrap a placeholder so the structs type-check
            old_struct = F.struct(F.lit(None).alias("__none"))
            new_struct = old_struct
        pre = F.when(
            is_upd,
            F.struct(
                F.lit("update_preimage").alias("t"), old_struct.alias("v")
            ),
        )
        post = F.when(
            is_ins,
            F.struct(F.lit("insert").alias("t"), new_struct.alias("v")),
        ).when(
            is_upd,
            F.struct(
                F.lit("update_postimage").alias("t"), new_struct.alias("v")
            ),
        )
        dele = F.when(
            is_del,
            F.struct(F.lit("delete").alias("t"), old_struct.alias("v")),
        )
        # single pass: each joined key expands to 0-2 change rows (copied
        # rows → 0), so the classification never re-executes the join
        ch = F.explode(F.array_compact(F.array(pre, post, dele)))
        out = j.select(*pk, ch.alias("__ch"))
        return out.select(
            *[
                F.col(c)
                if c in pk
                else F.col("__ch").getField("v").getField(c).alias(c)
                for c in live_cols
            ],
            F.col("__ch").getField("t").alias(CHANGE_TYPE_COLUMN),
            F.lit(commit).cast("long").alias(CHANGE_COMMIT_COLUMN),
        )

    # -- table lifecycle (SURVEY §2.10) -------------------------------------
    def create_or_replace(
        self,
        name: str,
        df: DataFrame,
        *,
        pk: list[str] | None = None,
        timestamp_column: str | None = None,
        partition_by: list[str] | None = None,
        namespace: str | None = None,
        bucket_by: tuple[list[str], int] | None = None,
        merge_on_read: bool = False,
        cluster_by: list[str] | None = None,
    ) -> TableMeta:
        """ReplaceTable semantics: write new version, swap pointer, GC old
        (sql_adapter_base.go:708-740 rename-swap-drop dance).

        ``bucket_by=(cols, n)`` lays the table out hash-bucketed: a derived
        ``__bucket`` partition column = pmod(xxhash64(*cols), n). Later PK
        merges then read and rewrite ONLY the buckets containing source
        keys (see :meth:`merge`) — the Hudi bucket-index upsert shape.

        ``merge_on_read=True`` (requires ``pk``) makes later merges APPEND
        sequence-stamped delta files instead of rewriting; reads reconcile
        per-PK last-wins and :meth:`compact` folds — Hudi's MoR table type,
        for write-heavy trickle upserts where the copy-on-write rewrite
        dominates."""
        ns = namespace or self.namespace
        partition_by = list(partition_by or [])
        if merge_on_read:
            if not pk:
                raise ValueError("merge_on_read requires pk")
            df = df.withColumn(COMMIT_SEQ_COLUMN, F.lit(0).cast("long"))
        bucket_cols: list[str] = []
        n_buckets = 0
        if bucket_by is not None:
            bucket_cols, n_buckets = list(bucket_by[0]), int(bucket_by[1])
            if n_buckets < 1:
                raise ValueError("bucket_by needs n_buckets >= 1")
            missing = [c for c in bucket_cols if c not in df.columns]
            if missing:
                raise ValueError(f"bucket columns not in batch: {missing}")
            if BUCKET_COLUMN not in df.columns:
                df = df.withColumn(
                    BUCKET_COLUMN, bucket_expr(bucket_cols, n_buckets)
                )
            if BUCKET_COLUMN not in partition_by:
                partition_by = [*partition_by, BUCKET_COLUMN]
            # one file group per bucket (Hudi's layout): without this every
            # shuffle partition writes a sliver into every bucket dir —
            # n_buckets × shuffle.partitions small files, and every later
            # bucket-pruned read pays the task-per-file overhead
            df = df.repartition(n_buckets, F.col(BUCKET_COLUMN))
        if cluster_by and bucket_by is None:
            keys = [*partition_by, *cluster_by]
            n = max(self.spark.sparkContext.defaultParallelism, 1)
            df = df.repartitionByRange(n, *keys).sortWithinPartitions(*keys)
        version = self._write_version(name, df, partition_by, namespace)
        meta = TableMeta(
            namespace=ns,
            name=name,
            columns=self._schema_of(df),
            pk=list(pk or []),
            timestamp_column=timestamp_column,
            partition_by=partition_by,
            version=version,
            json_storage=self._json_storage_of(df),
            bucket_cols=bucket_cols,
            n_buckets=n_buckets,
            write_mode="mor" if merge_on_read else "cow",
            cluster_cols=list(cluster_by or []) if bucket_by is None else [],
        )
        self._commit_meta(meta, op="replace_table")
        self._gc_old_versions(name, version, namespace)
        return meta

    def _bucket_point(self, meta: TableMeta, prune: dict) -> list | None:
        """The exact bucket-column values a prune spec pins, or None when
        any bucket column is unbounded/ranged (hash order is unrelated to
        value order, so only a point determines a bucket)."""
        if not meta.n_buckets or not meta.bucket_cols:
            return None
        points = []
        for c in meta.bucket_cols:
            b = prune.get(c)
            if not b or b[0] is None or b[0] != b[1]:
                return None
            points.append(b[0])
        return points

    def _bucket_of(self, meta: TableMeta, values: list) -> int:
        """Bucket id of one key, computed by the SAME JVM expression that
        assigned it at write (``bucket_expr``: pmod(xxhash64, n)) on a
        one-row local relation — Catalyst constant-folds it driver-side,
        no tasks. Values are cast to the committed column types first:
        xxhash64 hashes the physical representation, so a long and a
        double of equal value bucket differently."""
        from pyspark.sql import types as T

        from ..types_lattice import to_spark_type

        schema = T.StructType(
            [
                T.StructField(c, to_spark_type(meta.columns[c]), True)
                for c in meta.bucket_cols
            ]
        )
        row = self.spark.createDataFrame([tuple(values)], schema)
        return row.select(
            bucket_expr(meta.bucket_cols, meta.n_buckets).alias("b")
        ).collect()[0]["b"]

    def _with_cluster(
        self, meta: TableMeta, df: DataFrame, n: int | None = None
    ) -> DataFrame:
        """Re-apply the table's persisted range clustering on a full
        rewrite (unbucketed tables only — bucket dirs already bound both
        merges and reads). Keeps footer min/max stats prunable and the
        change feed's sliced diff effective AFTER merges, at the cost of
        one range shuffle the rewrite was paying in lost pruning
        anyway."""
        cols = [c for c in meta.cluster_cols if c in df.columns]
        if not cols or meta.n_buckets:
            return df
        if n is None:
            n = self.spark.sparkContext.defaultParallelism
        n = max(int(n), 1)
        keys = [*(meta.partition_by or []), *cols]
        return df.repartitionByRange(n, *keys).sortWithinPartitions(*keys)

    def _with_bucket(self, meta: TableMeta, df: DataFrame) -> DataFrame:
        """(Re)derive the table's ``__bucket`` column on a batch. Always
        recomputed, never trusted from the batch: schema alignment
        null-fills unknown columns upstream, and a stale or user-supplied
        bucket id would silently misplace rows."""
        if meta.n_buckets and set(meta.bucket_cols) <= set(df.columns):
            df = df.withColumn(
                BUCKET_COLUMN, bucket_expr(meta.bucket_cols, meta.n_buckets)
            )
        return df

    def append(
        self,
        name: str,
        df: DataFrame,
        *,
        pk: list[str] | None = None,
        timestamp_column: str | None = None,
        partition_by: list[str] | None = None,
        namespace: str | None = None,
        bucket_by: tuple[list[str], int] | None = None,
    ) -> TableMeta:
        """Batch load: append files INTO the current version directory.

        New columns (schema evolution) are allowed — parquet is read back
        with ``mergeSchema`` when metadata says schemas diverged. Commit =
        meta rewrite after the files land. ``bucket_by`` applies only on
        table creation; appends to a bucketed table derive ``__bucket``
        from the table's metadata.
        """
        meta = self.get_meta(name, namespace)
        if meta is None:
            return self.create_or_replace(
                name,
                df,
                pk=pk,
                timestamp_column=timestamp_column,
                partition_by=partition_by,
                namespace=namespace,
                bucket_by=bucket_by,
            )
        if meta.write_mode == "mor":
            # every write to an MoR table is an upsert: a plain append must
            # still claim a commit sequence (the seq bump is read-modify-
            # write, so it rides the merge path's OCC token)
            return self.merge(
                name,
                df,
                meta.pk,
                timestamp_column=timestamp_column,
                namespace=namespace,
            )
        vdir = os.path.join(self._table_dir(name, namespace), meta.version)
        df = self._with_bucket(meta, self._align_json_storage(meta, df))
        if meta.n_buckets and BUCKET_COLUMN in df.columns:
            df = df.repartition(meta.n_buckets, F.col(BUCKET_COLUMN))
        moved = self._append_files(df, vdir, meta.partition_by)
        for col, t in self._schema_of(df).items():
            if col not in meta.columns:
                meta.columns[col] = t  # ALTER TABLE ADD COLUMN
        try:
            self._commit_meta(
                meta,
                op="append",
                files_delta=[os.path.relpath(p, vdir) for p in moved],
            )
        except ConcurrentWriteError:
            # the version was replaced under us: roll back the delta AND
            # drop the stale cached meta — without the refresh every
            # retry from this handle re-reads the poisoned cache, writes
            # into the obsolete version dir, and fails identically
            self._rollback_files(moved)
            self.refresh(name, namespace)
            raise
        return meta

    def replace_partition(
        self,
        name: str,
        df: DataFrame,
        *,
        partition_column: str,
        namespace: str | None = None,
        pk: list[str] | None = None,
        timestamp_column: str | None = None,
    ) -> TableMeta:
        """replace_partition mode: only the partitions present in ``df``
        are rewritten (replacepartition_stream.go:85-161
        delete-by-partition-id+insert) — as a NEW hard-linked version, so
        concurrent readers and retained snapshots keep the old files and
        a racing commit fails cleanly instead of clobbering the live dir."""
        meta, base, manifest = self._snapshot(name, namespace)
        if meta is None:
            return self.create_or_replace(
                name,
                df,
                pk=pk,
                timestamp_column=timestamp_column,
                partition_by=[partition_column],
                namespace=namespace,
            )
        if partition_column not in meta.partition_by:
            raise ValueError(
                f"table {name} is not partitioned by {partition_column}"
            )
        if meta.write_mode == "mor":
            # a partition overwrite would drop stamped history for some
            # keys but not others — reconcile semantics become undefined
            raise ValueError(
                f"replace_partition is undefined on merge-on-read table "
                f"{name}; use a CoW table for partition-replace loads"
            )
        if manifest is None:
            manifest = self._current_manifest(meta, namespace)
        df = self._align_json_storage(meta, df)
        replaced = {
            r[0] for r in df.select(partition_column).distinct().collect()
        }
        version, new_vdir, kept = self._link_subset_version(
            meta,
            manifest,
            self._partition_matcher(partition_column, replaced),
            namespace,
        )
        for col, t in self._schema_of(df).items():
            if col not in meta.columns:
                meta.columns[col] = t
        return self._land_partial_rewrite(
            name, namespace, meta, version, new_vdir, kept, df, base,
            "replace_partition",
        )

    def merge(
        self,
        name: str,
        source: DataFrame,
        pk: list[str],
        *,
        timestamp_column: str | None = None,
        window_days: int | None = None,
        now=None,
        namespace: str | None = None,
        partition_by: list[str] | None = None,
        bucket_by: tuple[list[str], int] | None = None,
        merge_on_read: bool = False,
        cluster_by: list[str] | None = None,
    ) -> TableMeta:
        """Upsert: new version = merge_upsert(current, source); swap.
        ``bucket_by`` / ``merge_on_read`` / ``cluster_by`` apply only when
        this merge creates the table; an existing table's layout and
        write mode come from its metadata."""
        from ..operators.merge import merge_upsert

        # OCC: meta and token from the same log-tail snapshot — a commit
        # landing between here and our own commit fails ours instead of
        # silently dropping its rows (lost update)
        meta, base, manifest = self._snapshot(name, namespace)
        if meta is None:
            return self.create_or_replace(
                name,
                source,
                pk=pk,
                timestamp_column=timestamp_column,
                partition_by=partition_by,
                namespace=namespace,
                bucket_by=bucket_by,
                merge_on_read=merge_on_read,
                cluster_by=cluster_by,
            )
        source = self._with_bucket(meta, self._align_json_storage(meta, source))
        ts_col = timestamp_column or meta.timestamp_column
        if meta.write_mode == "mor":
            return self._merge_mor(name, source, pk, meta, ts_col, namespace, base)
        if manifest is None:  # log-less table — dir walk is the manifest
            manifest = self._manifest(meta)
        if meta.n_buckets and set(meta.bucket_cols) <= set(pk):
            # bucket-index merge: matching target rows can only live in the
            # buckets the source keys hash to — read and rewrite only those
            return self._merge_bucketed(
                name, source, pk, meta, ts_col, window_days, now, namespace,
                base, manifest,
            )
        part_col = next(
            (c for c in meta.partition_by or [] if c in source.columns), None
        )
        if part_col and ts_col and window_days is not None:
            # partition-pruned merge: rewrite ONLY in-window partitions as
            # a hard-linked new version — frozen partitions never read
            return self._merge_partitioned(
                name, source, pk, meta, part_col, ts_col, window_days, now,
                namespace, base, manifest,
            )
        scoped = self._merge_stats_scoped(
            name, source, pk, meta, ts_col, window_days, now, namespace,
            base, manifest,
        )
        if scoped is not None:
            return scoped
        target = self.read(name, namespace)
        merged = merge_upsert(
            target,
            source,
            pk,
            timestamp_column=ts_col,
            window_days=window_days,
            now=now,
        )
        merged = self._with_cluster(meta, merged)
        version = self._write_version(name, merged, meta.partition_by, namespace)
        for col, t in self._schema_of(source).items():
            if col not in meta.columns:
                meta.columns[col] = t
        meta.version = version
        meta.pk = list(pk)
        if timestamp_column:
            meta.timestamp_column = timestamp_column
        self._commit_meta(meta, op="merge", expected_commit=base)
        self._gc_old_versions(name, version, namespace)
        return meta

    def _merge_partitioned(
        self,
        name: str,
        source: DataFrame,
        pk: list[str],
        meta: TableMeta,
        part_col: str,
        ts_col: str,
        window_days: int,
        now,
        namespace: str | None,
        base: int | None = None,
        manifest: list[str] | None = None,
    ) -> TableMeta:
        """Merge by rewriting only in-window partitions into a NEW
        hard-linked version (frozen partitions are linked, never read or
        copied). At 100 TB the frozen history costs nothing; the
        reference's window-bounded DELETE has the same shape
        (redshift.go:284-287). Snapshot isolation holds: concurrent
        readers keep the old version's files, and a lost OCC race rolls
        back by deleting the new dir — vanished partitions (every row
        consumed by the merge) disappear naturally because only the
        surviving slice is written."""
        import datetime as _dt

        from ..operators.merge import merge_upsert_live_slice, partition_cutoff_id

        now = now or _dt.datetime.utcnow()
        cutoff = now - _dt.timedelta(days=window_days)
        sample = source.select(part_col).first()
        if sample is None:  # empty batch — nothing to merge
            return meta
        # fast-fail a stale snapshot before the link+rewrite work; the
        # commit-time OCC claim still closes the remaining race window
        if base and self._last_commit_id(name, namespace) != base:
            raise ConcurrentWriteError(
                f"commit {base} of {name} superseded before partitioned "
                f"merge began"
            )

        cutoff_id = partition_cutoff_id(str(sample[0]), cutoff)
        target = self.read(name, namespace)
        live_slice = merge_upsert_live_slice(
            target, source, pk, part_col, cutoff_id
        )
        live = {
            r[0]
            for r in target.filter(F.col(part_col) >= F.lit(cutoff_id))
            .select(part_col)
            .distinct()
            .collect()
        }
        if manifest is None:  # direct call without merge()'s snapshot
            manifest = self._current_manifest(meta, namespace)
        version, new_vdir, kept = self._link_subset_version(
            meta,
            manifest,
            self._partition_matcher(part_col, live),
            namespace,
        )
        for col, t in self._schema_of(source).items():
            if col not in meta.columns:
                meta.columns[col] = t
        meta.pk = list(pk)
        if ts_col:
            meta.timestamp_column = ts_col
        return self._land_partial_rewrite(
            name, namespace, meta, version, new_vdir, kept, live_slice,
            base, "merge",
        )

    # keys collected to the driver for per-file scoping; beyond this the
    # scope test degrades to the key hull (still conservative)
    _SCOPE_MAX_KEYS = 10_000
    # a scoped rewrite carries fixed coordination cost (slice read, key
    # collect, persist, per-file links, footer stats) worth roughly a
    # 1-2M-row full rewrite on this hardware — scope only when the stats
    # prove at least this many rows are SKIPPED. At production table
    # sizes any trickle batch clears it by orders of magnitude.
    _SCOPE_MIN_SKIPPED_ROWS = 2_000_000

    def _tail_file_stats(
        self, name: str, base: int | None, namespace: str | None
    ) -> dict:
        """file_stats of the log-tail entry (``{}`` when absent)."""
        if not base:
            return {}
        log_path = os.path.join(
            self._table_dir(name, namespace), LOG_DIR, f"{base:012d}.json"
        )
        try:
            with open(log_path) as fh:
                return _json.load(fh).get("file_stats") or {}
        except OSError:
            return {}

    def _merge_stats_scoped(
        self,
        name: str,
        source: DataFrame,
        pk: list[str],
        meta: TableMeta,
        ts_col: str | None,
        window_days: int | None,
        now,
        namespace: str | None,
        base: int | None,
        manifest: list[str] | None,
    ) -> TableMeta | None:
        """Stats-scoped merge (the Iceberg/Hudi merge file-skipping shape,
        for unbucketed tables): a target row can match a source key only
        if its file's committed ``[min, max]`` of ``pk[0]`` admits one of
        the batch's key values — so read and rewrite ONLY those files,
        hard-link the rest (``_link_subset_version``), exactly as the
        bucketed path rewrites only touched buckets. On a range-clustered
        table (persisted ``cluster_cols``) a trickle batch touches O(|keys|)
        files regardless of table size. Returns None — caller falls back
        to the whole-table merge — when there are no usable stats, the
        scope covers most files anyway (> 70%: two plans for one rewrite
        isn't worth it), or the batch is too wide to scope.

        Null source keys never equi-match a target row, so they don't
        widen the scope; they insert into the rewritten slice like any
        new key. Files without stats on pk[0] are conservatively
        rewritten."""
        import bisect

        from ..operators.merge import merge_upsert

        if not base or manifest is None or not pk:
            return None
        col = pk[0]
        stats = self._tail_file_stats(name, base, namespace)
        if not stats:
            return None
        # free decline BEFORE any Spark job: skipped_rows is bounded by
        # the table's total rows, so a table smaller than the engage
        # threshold can never pass the final check — measuring first
        # would spend two source jobs (~0.3 s) to learn nothing, which
        # showed up as a 30% trickle-merge regression at the 1M tier
        total_rows = sum(
            int(s.get("rows") or 0) for s in stats.values()
        )
        if total_rows < self._SCOPE_MIN_SKIPPED_ROWS:
            return None
        # ONE aggregation gives the TRUE key hull and cardinality —
        # a limit()ed distinct sample would be an arbitrary subset whose
        # hull can miss real keys, silently skipping files that hold
        # matching target rows (duplicate-PK corruption)
        agg = source.agg(
            F.count_distinct(F.col(col)).alias("n"),
            F.min(col).alias("lo"),
            F.max(col).alias("hi"),
        ).collect()[0]
        if not agg["n"] or agg["lo"] is None:
            return None  # no non-null keys to scope by
        if isinstance(agg["lo"], float):
            return None  # float keys: NaN ordering — don't scope
        kmin, kmax = agg["lo"], agg["hi"]
        # second free decline, before the keys collect: a file whose
        # range CONTAINS kmin (or kmax) is touched no matter which other
        # keys exist — on an unclustered table every file spans the whole
        # key range, so this alone proves hit > threshold and saves the
        # second source job
        def _contains(rel: str, k) -> bool:
            s = stats.get(self._deref(rel), {}).get("cols", {}).get(col)
            if not s:
                return True
            try:
                return s[0] <= k <= s[1]
            except TypeError:
                return True

        definite = sum(
            1 for rel in manifest
            if _contains(rel, kmin) or _contains(rel, kmax)
        )
        if definite > 0.7 * len(manifest):
            return None
        hull_only = int(agg["n"]) > self._SCOPE_MAX_KEYS
        keys: list = []
        if not hull_only:
            keys = sorted(
                r[0]
                for r in source.select(col).distinct().collect()
                if r[0] is not None
            )

        def touched(rel: str) -> bool:
            s = stats.get(self._deref(rel), {}).get("cols", {}).get(col)
            if not s:
                return True  # unknown — must rewrite
            fmin, fmax = s
            try:
                if fmax < kmin or fmin > kmax:
                    return False
                if hull_only:
                    return True
                i = bisect.bisect_left(keys, fmin)
                return i < len(keys) and keys[i] <= fmax
            except TypeError:  # cross-type stats — conservative
                return True

        # hit == [] is the CHEAPEST case, not a bailout: an insert-only
        # batch (all keys beyond every file's range — the monotonic-key
        # CDC trickle) links the whole manifest and lands just the new
        # rows, O(batch) instead of a full rewrite
        hit = [rel for rel in manifest if touched(rel)]
        if len(hit) > 0.7 * len(manifest):
            return None
        hit_ids = {self._deref(r) for r in hit}
        skipped_rows = sum(
            int(stats.get(self._deref(rel), {}).get("rows") or 0)
            for rel in manifest
            if rel not in hit_ids
        )
        if skipped_rows < self._SCOPE_MIN_SKIPPED_ROWS:
            return None  # full rewrite is cheaper than the coordination
        if base and self._last_commit_id(name, namespace) != base:
            raise ConcurrentWriteError(
                f"commit {base} of {name} superseded before scoped merge "
                f"began"
            )
        table_dir = self._table_dir(name, namespace)
        vdir = os.path.join(table_dir, meta.version)
        slice_df = self._read_file_set(
            table_dir,
            [os.path.normpath(os.path.join(vdir, f)) for f in hit],
            self.read(name, namespace).schema,
        )
        if meta.write_mode == "mor":
            return None  # MoR merges route earlier; belt and braces
        merged = merge_upsert(
            slice_df,
            source,
            pk,
            timestamp_column=ts_col,
            window_days=window_days,
            now=now,
        )
        # keep the rewritten slice clustered so the NEXT merge scopes
        # too; output file count bounded by the touched-file count.
        # (repartitionByRange's sampling pass recomputes the slice join
        # once — measured CHEAPER than persisting it: the cache write of
        # the materialized slice costs more than the recompute.)
        merged = self._with_cluster(meta, merged, n=max(len(hit), 1))
        version, new_vdir, kept = self._link_subset_version(
            meta, manifest, lambda rel: rel in hit_ids, namespace
        )
        for c, t in self._schema_of(source).items():
            if c not in meta.columns:
                meta.columns[c] = t
        meta.pk = list(pk)
        if ts_col:
            meta.timestamp_column = ts_col
        return self._land_partial_rewrite(
            name, namespace, meta, version, new_vdir, kept, merged,
            base, "merge",
        )

    def _merge_bucketed(
        self,
        name: str,
        source: DataFrame,
        pk: list[str],
        meta: TableMeta,
        ts_col: str | None,
        window_days: int | None,
        now,
        namespace: str | None,
        base: int | None,
        manifest: list[str] | None = None,
    ) -> TableMeta:
        """Bucket-index merge (Hudi-style): with the table laid out as
        ``__bucket = pmod(xxhash64(*bucket_cols), n)`` partitions and
        ``bucket_cols ⊆ pk``, every target row matching a source key lives
        in a bucket the SOURCE keys hash to. So the merge:

        1. derives source bucket ids (codegen expression, no shuffle),
        2. collects the distinct ids (≤ n_buckets small ints),
        3. reads the target pruned to those bucket partitions,
        4. anti-joins against the broadcast source and rewrites ONLY those
           buckets into a new hard-linked version (untouched buckets are
           links — snapshot-isolated, see :meth:`_link_subset_version`).

        At 100 TB the untouched buckets are never read, shuffled, or
        rewritten — the per-merge cost scales with the number of touched
        buckets (bounded by min(n_buckets, |batch keys|)), not table size.
        Combines with the merge window: the window predicate still splits
        live/frozen rows INSIDE touched buckets (merge_upsert), so a
        key-local batch into a 4096-bucket table rewrites a few buckets'
        worth of files, not the table."""
        from ..operators.merge import merge_upsert

        # source already carries __bucket: merge() derives it pre-dispatch
        buckets = [
            r[0]
            for r in source.select(BUCKET_COLUMN).distinct().collect()
        ]
        if not buckets:  # empty batch
            return meta
        if base and self._last_commit_id(name, namespace) != base:
            raise ConcurrentWriteError(
                f"commit {base} of {name} superseded before bucketed merge "
                f"began"
            )
        target = self.read(name, namespace)
        if len(buckets) < meta.n_buckets:
            target = target.filter(F.col(BUCKET_COLUMN).isin(buckets))
        merged = merge_upsert(
            target,
            source,
            pk,
            timestamp_column=ts_col,
            window_days=window_days,
            now=now,
        )
        # preserve the one-file-group-per-bucket layout on rewrite
        merged = merged.repartition(
            max(len(buckets), 1), F.col(BUCKET_COLUMN)
        )
        # New hard-linked version: untouched buckets are linked, touched
        # buckets are rewritten whole from `merged` (which holds every
        # surviving row of those buckets across all co-partition levels,
        # so moved-row and vanished-combo cleanup is structural, not a
        # before/after diff). Snapshot isolation + OCC rollback as in
        # _merge_partitioned.
        if manifest is None:  # direct call without merge()'s snapshot
            manifest = self._current_manifest(meta, namespace)
        version, new_vdir, kept = self._link_subset_version(
            meta,
            manifest,
            self._partition_matcher(BUCKET_COLUMN, buckets),
            namespace,
        )
        for col, t in self._schema_of(source).items():
            if col not in meta.columns:
                meta.columns[col] = t
        meta.pk = list(pk)
        if ts_col:
            meta.timestamp_column = ts_col
        return self._land_partial_rewrite(
            name, namespace, meta, version, new_vdir, kept, merged, base,
            "merge",
        )

    def _merge_mor(
        self,
        name: str,
        source: DataFrame,
        pk: list[str],
        meta: TableMeta,
        ts_col: str | None,
        namespace: str | None,
        base: int | None,
    ) -> TableMeta:
        """Merge-on-read upsert: APPEND the (pre-deduped) source as delta
        files stamped with the next monotonic ``__commit_seq`` — the write
        is O(batch) regardless of table size; the reconcile moves to read
        time (:meth:`read` keeps, per PK, the row with the highest stamp).

        This is the Hudi MoR trade: a CDC trickle writes megabytes into a
        100 TB table instead of rewriting buckets, at the price of a
        window pass on read until :meth:`compact` folds the deltas. The
        monotonicity of the stamp is guaranteed by the commit protocol:
        ``expected_commit`` serializes read-modify-write, so two racing
        merges can't claim the same sequence.

        Note: reads of an MoR table reconcile per PK unconditionally —
        every write is an upsert (plain appends with a duplicate key
        collapse too), and the merge-window shrink does not apply; use a
        CoW table when window-bounded dedup semantics matter."""
        seq = meta.mor_seq + 1
        src = source.withColumn(COMMIT_SEQ_COLUMN, F.lit(seq).cast("long"))
        if base is not None and self._last_commit_id(name, namespace) != base:
            raise ConcurrentWriteError(
                f"commit {base} of {name} superseded before MoR merge began"
            )
        vdir = os.path.join(self._table_dir(name, namespace), meta.version)
        if meta.n_buckets:
            src = src.repartition(meta.n_buckets, F.col(BUCKET_COLUMN))
        moved = self._append_files(src, vdir, meta.partition_by)
        for col, t in self._schema_of(src).items():
            if col not in meta.columns:
                meta.columns[col] = t
        meta.pk = list(pk)
        if ts_col:
            meta.timestamp_column = ts_col
        meta.mor_seq = seq
        meta.mor_deltas += 1
        try:
            self._commit_meta(
                meta,
                op="merge_mor",
                expected_commit=base,
                files_delta=[os.path.relpath(p, vdir) for p in moved],
            )
        except ConcurrentWriteError:
            # the lost race's delta must not stay physically readable —
            # unlink it before the caller refreshes and re-merges
            self._rollback_files(moved)
            raise
        return meta

    def _mor_reconcile(self, meta: TableMeta, df: DataFrame) -> DataFrame:
        """Per-PK last-wins by ``__commit_seq`` (highest stamp survives);
        a PK whose latest record is a tombstone (``__deleted``) is dropped
        entirely. The stamp and tombstone columns are physical bookkeeping
        and are dropped from the reconciled view.

        Fast path: ``mor_deltas == 0`` (just created, folded, or rebuilt)
        means the base files already hold exactly one live record per PK —
        the window is skipped and an MoR read costs the same as CoW. Every
        fold point (compact / delete / rebucket / truncate) resets the
        counter, so reads between folds pay the window and reads after a
        fold don't."""
        from pyspark.sql import Window

        if (
            COMMIT_SEQ_COLUMN not in df.columns
            or not meta.pk
            or meta.mor_deltas == 0
        ):
            return df.drop(COMMIT_SEQ_COLUMN, TOMBSTONE_COLUMN)
        # same-PK rows always share a bucket (bucket_cols ⊆ pk), so the
        # bucket column can join the window partition keys — which lets
        # Catalyst push bucket-partition filters BELOW the window (the
        # pruned point-lookup path)
        keys = list(meta.pk)
        if (
            meta.n_buckets
            and set(meta.bucket_cols) <= set(meta.pk)
            and BUCKET_COLUMN in df.columns
        ):
            keys = [BUCKET_COLUMN, *keys]
        w = Window.partitionBy(*keys).orderBy(
            F.col(COMMIT_SEQ_COLUMN).desc()
        )
        out = (
            df.withColumn("__mor_rn", F.row_number().over(w))
            .filter(F.col("__mor_rn") == 1)
        )
        if TOMBSTONE_COLUMN in df.columns:
            out = out.filter(
                ~F.coalesce(F.col(TOMBSTONE_COLUMN), F.lit(False))
            )
        return out.drop("__mor_rn", COMMIT_SEQ_COLUMN, TOMBSTONE_COLUMN)

    def delete_keys(
        self,
        name: str,
        keys: list,
        namespace: str | None = None,
    ) -> TableMeta:
        """Row deletes by primary key. On a merge-on-read table this is an
        O(keys) TOMBSTONE append (the CDC delete shape: the change feed
        shows the tombstone, reads drop the key, compaction folds it
        away). On a copy-on-write table it rewrites without the keys
        (anti-join) as a new version.

        ``keys``: scalars for a single-column PK, tuples in ``meta.pk``
        order for composite — or a DataFrame containing the PK columns
        (the CDC-consumer shape: a change-feed batch's delete keys apply
        distributed, never collected to the driver)."""
        meta, base, _files = self._snapshot(name, namespace)
        if meta is None:
            raise FileNotFoundError(name)
        if not meta.pk:
            raise ValueError(f"table {name} has no primary key")
        if isinstance(keys, DataFrame):
            key_df = keys.select(*meta.pk).dropDuplicates(list(meta.pk))
        else:
            rows = [k if isinstance(k, tuple) else (k,) for k in keys]
            if not rows:
                return meta
            key_df = self.spark.createDataFrame(
                rows, self.read(name, namespace).select(*meta.pk).schema
            )
        if meta.write_mode == "mor":
            if TOMBSTONE_COLUMN not in meta.columns:
                meta.columns[TOMBSTONE_COLUMN] = DataType.BOOL
            tomb = key_df.withColumn(TOMBSTONE_COLUMN, F.lit(True))
            return self._merge_mor(
                name, self._with_bucket(meta, tomb), meta.pk, meta,
                None, namespace, base,
            )
        # literal key lists are small by construction — force broadcast;
        # a DataFrame key set may be arbitrarily large, let AQE choose
        anti = key_df if isinstance(keys, DataFrame) else F.broadcast(key_df)
        kept = self.read(name, namespace).join(
            anti, on=list(meta.pk), how="left_anti"
        )
        kept = self._with_cluster(meta, self._with_bucket(meta, kept))
        version = self._write_version(name, kept, meta.partition_by, namespace)
        meta.version = version
        self._commit_meta(meta, op="delete", expected_commit=base)
        self._gc_old_versions(name, version, namespace)
        return meta

    def _restamp_mor(self, meta: TableMeta, df: DataFrame) -> DataFrame:
        """Re-add the stamp after an op that consumed the reconciled view
        (compact/delete rewrite): the fold is the new baseline, all rows
        carry the current sequence."""
        if meta.write_mode == "mor":
            df = df.withColumn(
                COMMIT_SEQ_COLUMN, F.lit(meta.mor_seq).cast("long")
            )
        return df

    def lookup(
        self,
        name: str,
        keys: list,
        namespace: str | None = None,
    ) -> DataFrame:
        """Point lookup by primary key. On a bucketed table the scan is
        pruned to the buckets the keys hash to BEFORE touching data files
        — at 100 TB with 4096 buckets, a 10-key lookup reads ≤10 buckets
        (≤0.25% of the table), plus parquet footer min/max pruning inside
        them. On an unbucketed table this is an ordinary filtered scan.

        ``keys``: scalar values for a single-column PK, or tuples in
        ``meta.pk`` order for a composite PK. Bucket ids are derived with
        the same JVM xxhash64 expression used at write time (one
        row-count-of-keys local job, no table scan), so driver and data
        can never disagree on placement."""
        meta = self.get_meta(name, namespace)
        if meta is None:
            raise FileNotFoundError(name)
        if not meta.pk:
            raise ValueError(f"table {name} has no primary key")
        rows = [k if isinstance(k, tuple) else (k,) for k in keys]
        if not rows:
            return self.read(name, namespace).limit(0)
        key_df = self.spark.createDataFrame(
            rows,
            self.read(name, namespace).select(*meta.pk).schema,
        )
        # bucket-prune BEFORE the MoR reconcile window: the window is
        # keyed on pk, so a post-window partition filter would not push
        # down to the scan. CoW tables additionally prune the MANIFEST by
        # the key hull (files whose committed pk[0] min/max exclude every
        # key are never opened or scheduled — on a clustered table a
        # point lookup reads O(1) files before any row-group pruning).
        prune = None
        k0 = [r[0] for r in rows]
        # hull-prune only uniformly int- or str-keyed lookups: datetime
        # keys would string-compare a (possibly naive) isoformat against
        # the stats' aware-UTC ISO strings, a NaN ANYWHERE poisons
        # min/max without raising, and bool is an int subclass
        if meta.write_mode != "mor" and (
            all(type(k) is int for k in k0)
            or all(type(k) is str for k in k0)
        ):
            prune = {meta.pk[0]: (min(k0), max(k0))}
        df = self.read(name, namespace, _raw=True, prune=prune)
        if meta.n_buckets and set(meta.bucket_cols) <= set(meta.pk):
            buckets = sorted(
                {
                    r[0]
                    for r in key_df.select(
                        bucket_expr(meta.bucket_cols, meta.n_buckets)
                    ).collect()
                }
            )
            df = df.filter(F.col(BUCKET_COLUMN).isin(buckets))
        if len(rows) <= 10_000:
            # literal IN-filter on the leading PK column: reaches the
            # parquet scan as a PushedFilter, so footer min/max (and
            # dictionary) pruning skips row groups the semi-join alone
            # would still read. The semi join below keeps exactness for
            # composite keys.
            df = df.filter(
                F.col(f"`{meta.pk[0]}`").isin([r[0] for r in rows])
            )
        if meta.write_mode == "mor":
            df = self._mor_reconcile(meta, df)
        return df.join(F.broadcast(key_df), on=list(meta.pk), how="left_semi")

    def bucket_stats(self, name: str, namespace: str | None = None) -> dict:
        """Bucket-layout balance report: per-bucket bytes/files plus a
        skew ratio (max bucket bytes / mean). A ratio creeping past ~2
        means the bucket key hashes unevenly (or one key dominates) and
        the table is a :meth:`rebucket` candidate — at 100 TB a hot
        bucket serializes every merge that touches it."""
        meta = self.get_meta(name, namespace)
        if meta is None:
            raise FileNotFoundError(name)
        if not meta.n_buckets:
            raise ValueError(f"table {name} is not bucketed")
        vdir = os.path.join(self._table_dir(name, namespace), meta.version)
        per: dict[int, dict] = {}
        for base, _dirs, files in os.walk(vdir):
            marker = f"{BUCKET_COLUMN}="
            seg = next(
                (p for p in base.split(os.sep) if p.startswith(marker)), None
            )
            if seg is None:
                continue
            b = int(seg[len(marker):])
            slot = per.setdefault(b, {"bytes": 0, "files": 0})
            for f in files:
                if f.endswith(".parquet"):
                    slot["files"] += 1
                    slot["bytes"] += os.path.getsize(os.path.join(base, f))
        sizes = [v["bytes"] for v in per.values()] or [0]
        mean = sum(sizes) / len(sizes) if sizes else 0
        return {
            "n_buckets": meta.n_buckets,
            "populated": len(per),
            "buckets": per,
            "skew_ratio": round(max(sizes) / mean, 3) if mean else 0.0,
        }

    def rebucket(
        self,
        name: str,
        n_buckets: int,
        namespace: str | None = None,
    ) -> TableMeta:
        """Rescale the bucket count (table growth outpaced the original
        choice): rewrite the table hashed into ``n_buckets`` buckets as a
        new version + atomic swap. On an MoR table this is also a fold
        (the reconciled view is rewritten and restamped). Concurrent-safe
        via the usual OCC token."""
        if n_buckets < 1:
            raise ValueError("n_buckets >= 1")
        meta, base, _files = self._snapshot(name, namespace)
        if meta is None:
            raise FileNotFoundError(name)
        if not meta.bucket_cols:
            raise ValueError(
                f"table {name} is not bucketed; create with bucket_by"
            )
        df = self.read(name, namespace)  # MoR: reconciled view
        df = self._restamp_mor(meta, df)
        df = df.withColumn(
            BUCKET_COLUMN, bucket_expr(meta.bucket_cols, n_buckets)
        ).repartition(n_buckets, F.col(BUCKET_COLUMN))
        version = self._write_version(name, df, meta.partition_by, namespace)
        meta.version = version
        meta.n_buckets = n_buckets
        meta.mor_deltas = 0
        self._commit_meta(meta, op="rebucket", expected_commit=base)
        self._gc_old_versions(name, version, namespace)
        return meta

    def cluster_stats(
        self, name: str, column: str | None = None,
        namespace: str | None = None,
    ) -> dict:
        """Layout-quality report for range pruning/scoping on ``column``
        (default: the persisted cluster column, else ``pk[0]``), from the
        committed per-file stats — zero data reads.

        - ``overlap_ratio``: mean number of files whose [min, max] spans
          a random point of the key domain (1.0 = perfectly disjoint;
          the change feed's sliced diff gives up past ~2, and scoped
          merges degrade proportionally).
        - ``statted`` / ``null_free``: how many files carry usable v2
          stats on the column (files without them are always read).

        An overlap creeping up after many merges/deletes means the table
        is a ``compact(cluster_by=[...])`` candidate — the write-side
        twin of ``bucket_stats``'s skew ratio."""
        meta, base, manifest = self._snapshot(name, namespace)
        if meta is None:
            raise FileNotFoundError(name)
        col = column or (
            meta.cluster_cols[0] if meta.cluster_cols
            else (meta.pk[0] if meta.pk else None)
        )
        out: dict = {
            "column": col,
            "files": len(manifest or []),
            "statted": 0,
            "null_free": 0,
            "overlap_ratio": None,
            "cluster_cols": list(meta.cluster_cols),
        }
        if col is None or not base or not manifest:
            return out
        stats = self._tail_file_stats(name, base, namespace)
        spans = []
        for rel in manifest:
            s = stats.get(self._deref(rel))
            if not s:
                continue
            b = s.get("cols", {}).get(col)
            if not b:
                continue
            out["statted"] += 1
            if s.get("v", 1) >= 2 and (s.get("nulls") or {}).get(col, 0) == 0:
                out["null_free"] += 1
            spans.append((b[0], b[1]))
        if len(spans) < 2:
            out["overlap_ratio"] = 1.0 if spans else None
            return out
        try:
            # sweep: at each span start, count spans already open — the
            # average open-count over starts approximates how many files
            # a point/range probe must read
            events = sorted(
                [(lo, 0, hi) for lo, hi in spans],
                key=lambda x: (x[0], x[2]),
            )
            import bisect

            ends: list = []
            total = 0
            for lo, _z, hi in events:
                i = bisect.bisect_left(ends, lo)
                del ends[:i]
                total += len(ends) + 1
                bisect.insort(ends, hi)
            out["overlap_ratio"] = round(total / len(spans), 2)
        except TypeError:  # mixed-type stats
            out["overlap_ratio"] = None
        return out

    def table_stats(self, name: str, namespace: str | None = None) -> dict:
        """File-level stats for maintenance decisions: {n_files, bytes,
        avg_file_bytes} over the current version."""
        meta, base, manifest = self._snapshot(name, namespace)
        if meta is None:
            raise FileNotFoundError(name)
        vdir = os.path.join(self._table_dir(name, namespace), meta.version)
        n, total = 0, 0
        if base and manifest is not None:
            # committed manifest, not a dir walk: under link_mode=
            # "manifest" the live files may sit in OTHER version dirs,
            # and a dir walk would also count uncommitted in-flight files
            for f in manifest:
                p = os.path.normpath(os.path.join(vdir, f))
                try:
                    total += os.path.getsize(p)
                    n += 1
                except OSError:
                    continue
        else:
            for root, _dirs, files in os.walk(vdir):
                for f in files:
                    if f.endswith(".parquet"):
                        n += 1
                        total += os.path.getsize(os.path.join(root, f))
        return {
            "n_files": n,
            "bytes": total,
            "avg_file_bytes": total // n if n else 0,
        }

    @staticmethod
    def _zorder_expr(df: DataFrame, cols: list[str], bits: int = 6):
        """Z-order key: per-column quantile bucket ids (2^bits buckets,
        boundaries from a sample-based approxQuantile — how Delta OSS
        derives range ids), bit-interleaved so files cluster on ALL the
        columns at once instead of lexicographically on the first.
        Bucketing runs JVM-side (ml.Bucketizer); the interleave is a few
        shift/or expressions. Numeric or timestamp columns only."""
        from pyspark.ml.feature import Bucketizer

        n_buckets = 1 << bits
        probs = [i / n_buckets for i in range(1, n_buckets)]
        work = df
        dcols = []
        for c in cols:
            dcol = f"__zd_{c}"
            work = work.withColumn(dcol, F.col(c).cast("double"))
            dcols.append(dcol)
        # ONE quantile job for all clustered columns — per-column calls
        # would scan the full table once per column just for boundaries
        all_qs = work.approxQuantile(dcols, probs, 0.001)
        bucket_cols = []
        for c, dcol, qs in zip(cols, dcols, all_qs):
            splits = [float("-inf")]
            for q in qs:
                if q > splits[-1]:
                    splits.append(q)
            splits.append(float("inf"))
            bcol = f"__zb_{c}"
            work = Bucketizer(
                splits=splits, inputCol=dcol, outputCol=bcol,
                handleInvalid="keep",
            ).transform(work)
            work = work.withColumn(bcol, F.col(bcol).cast("int")).drop(dcol)
            bucket_cols.append(bcol)
        k = len(cols)
        z = F.lit(0)
        for j in range(bits):
            for i, bcol in enumerate(bucket_cols):
                bit = F.shiftright(F.col(bcol), j).bitwiseAND(F.lit(1))
                z = z.bitwiseOR(F.shiftleft(bit, j * k + i))
        return work.withColumn("__z", z).drop(*bucket_cols)

    def compact(
        self,
        name: str,
        target_file_bytes: int = 128 * 1024 * 1024,
        namespace: str | None = None,
        cluster_by: list[str] | None = None,
        zorder_by: list[str] | None = None,
    ) -> dict:
        """Small-file compaction: rewrite the current version with file
        count sized to ``bytes / target_file_bytes`` (streaming appends
        fragment tables; scan cost at 100 TB tracks file count as much as
        bytes). Atomic: lands as a new version + pointer swap, concurrent
        readers never see a half-compacted table.

        ``cluster_by`` range-clusters the rewrite (repartitionByRange +
        sortWithinPartitions): each output file covers a narrow, mostly
        disjoint slice of the key space, so parquet footer min/max stats
        prune files and row groups on point/range predicates — the
        data-skipping layer that makes a 100 TB table queryable without
        full scans (the analogue of the reference's sortkey / CLUSTER BY /
        PARTITION BY toYYYYMM(ts) per-warehouse tuning, SURVEY §2.10).
        Sorted runs also compress better. Skewed key ranges are split by
        AQE; clustering composes with hive-style ``partition_by``
        (clusters within each partition directory).

        ``zorder_by`` instead interleaves quantile-bucket bits of ALL the
        given columns (OPTIMIZE ... ZORDER BY analogue) so footer stats
        prune on any of them, not just the leading key — see
        :meth:`_zorder_expr`. Mutually exclusive with ``cluster_by``
        (``zorder_by`` wins)."""
        meta, base, _files = self._snapshot(name, namespace)
        if meta is None:
            raise FileNotFoundError(name)
        stats = self.table_stats(name, namespace)
        n_out = max(1, round(stats["bytes"] / target_file_bytes))
        # idempotent no-op: an already-compacted table (file count at or
        # under target, no MoR deltas to fold, no explicit re-layout
        # requested) returns WITHOUT committing — Delta's OPTIMIZE skips
        # the same way. Beyond wasted rewrites, a maintenance loop
        # spinning no-op commits would contend with concurrent writers'
        # optimistic retries for nothing (it starved an appender in
        # test_concurrent_writes once in eight full-suite runs).
        if (
            zorder_by is None
            and cluster_by is None
            # persisted layout: appends since the last compact may be
            # unsorted even at the target file count — a clustered
            # table's maintenance pass must re-sort UNLESS the table's
            # current commit IS the last compaction (no writes landed
            # since the re-sort, so a rewrite would reproduce the
            # existing layout byte-for-byte-equivalently)
            and (
                not meta.cluster_cols
                or meta.last_compact_commit == base
            )
            and meta.mor_deltas == 0
            and stats["n_files"] <= n_out
        ):
            return {"before": stats, "after": stats, "skipped": True}
        df = self.read(name, namespace)
        if zorder_by:
            # multi-dimensional clustering: files cover small cells of the
            # (col1 × col2 × ...) space, so footer min/max stats prune on a
            # predicate over ANY clustered column — range clustering only
            # prunes on the leading key (OPTIMIZE ... ZORDER BY analogue)
            df = (
                self._zorder_expr(df, list(zorder_by))
                .repartitionByRange(n_out, "__z")
                .sortWithinPartitions("__z")
                .drop("__z")
            )
            # z-order supersedes range clustering: a later merge's
            # _with_cluster repartitionByRange would silently destroy
            # the interleaved layout this compaction just built
            meta.cluster_cols = []
        elif cluster_by or meta.cluster_cols:
            if cluster_by is not None and not list(cluster_by):
                meta.cluster_cols = []  # explicit [] clears persistence
                df = df.repartition(n_out, *meta.partition_by) if meta.partition_by else df.repartition(n_out)
            else:
                chosen = list(cluster_by or meta.cluster_cols)
                keys = [c for c in (meta.partition_by or [])] + chosen
                df = df.repartitionByRange(n_out, *keys).sortWithinPartitions(*keys)
                if cluster_by:  # explicit choice persists for rewrites
                    meta.cluster_cols = chosen
        elif meta.partition_by:
            df = df.repartition(n_out, *meta.partition_by)
        else:
            df = df.repartition(n_out)
        # MoR fold: the reconciled view just read IS the fold; restamp it
        # as the new baseline and clear the delta counter
        df = self._restamp_mor(meta, df)
        version = self._write_version(name, df, meta.partition_by, namespace)
        meta.version = version
        meta.mor_deltas = 0
        # claiming expected+1 is what _commit_meta does for an OCC commit,
        # so the id this compaction lands at is known before the claim
        meta.last_compact_commit = base + 1
        self._commit_meta(meta, op="compact", expected_commit=base)
        self._gc_old_versions(name, version, namespace)
        after = self.table_stats(name, namespace)
        return {"before": stats, "after": after}

    def delete(self, name: str, conditions, namespace: str | None = None) -> int:
        """DELETE rows matching WhenConditions (sql_adapter_base.go:354-411):
        rewrite the live version without the matching rows, swap, GC.
        Returns rows deleted."""
        meta, base, _files = self._snapshot(name, namespace)
        if meta is None:
            return 0
        col = (
            conditions.to_column()
            if hasattr(conditions, "to_column")
            else conditions
        )
        cur = self.read(name, namespace)
        kept = self._with_cluster(
            meta, self._restamp_mor(meta, cur.filter(~col | col.isNull()))
        )
        before = cur.count()
        version = self._write_version(name, kept, meta.partition_by, namespace)
        meta.version = version
        meta.mor_deltas = 0
        self._commit_meta(meta, op="delete", expected_commit=base)
        self._gc_old_versions(name, version, namespace)
        return before - self.count(name, namespace=namespace)

    def truncate(self, name: str, namespace: str | None = None) -> None:
        meta = self.get_meta(name, namespace)
        if meta is None:
            return
        empty = self.spark.createDataFrame(
            [], self.read(name, namespace).schema
        )
        self.create_or_replace(
            name,
            empty,
            pk=meta.pk,
            timestamp_column=meta.timestamp_column,
            partition_by=[
                p for p in meta.partition_by if p != BUCKET_COLUMN
            ],
            namespace=namespace,
            bucket_by=(
                (meta.bucket_cols, meta.n_buckets) if meta.n_buckets else None
            ),
            merge_on_read=meta.write_mode == "mor",
        )

    def drop(self, name: str, namespace: str | None = None) -> None:
        self._meta_cache.pop(f"{namespace or self.namespace}.{name}", None)
        shutil.rmtree(self._table_dir(name, namespace), ignore_errors=True)

    def _filtered_read(self, name, where, namespace) -> DataFrame:
        """Shared count/select scan. A ``WhenConditions`` predicate (the
        reference's delete/select surface) additionally prunes manifest
        files by its implied column bounds — planning-time data skipping
        with zero caller opt-in. String predicates just filter. MoR
        tables never prune (read(prune=) is undefined there)."""
        from ..operators.filters import WhenConditions

        prune = None
        if isinstance(where, WhenConditions):
            bounds = where.prune_bounds()
            meta = self.get_meta(name, namespace)
            if bounds and meta is not None and meta.write_mode != "mor":
                prune = bounds
        df = self.read(name, namespace, prune=prune)
        if isinstance(where, WhenConditions):
            if not where.is_empty():
                df = df.filter(where.to_column())
        elif where:
            df = df.filter(where)
        return df

    def _metadata_count(
        self, name: str, namespace: str | None = None
    ) -> int | None:
        """O(1) cardinality from the commit log: every manifest file's
        footer row count rides in its commit entry (``file_stats.rows``),
        so when the tail entry covers the whole manifest, COUNT(*) is one
        JSON read — no Spark job, no file opens, no tasks (Iceberg's
        metadata-only count; at 100 TB this replaces a cluster-wide scan).
        None = not answerable (MoR deltas hold superseding/tombstone rows;
        pre-stats commits lack coverage) — caller falls back to a scan."""
        meta = self.get_meta(name, namespace)
        if meta is None or meta.write_mode == "mor":
            return None
        base = self._last_commit_id(name, namespace)
        if not base:
            return None
        tail_path = os.path.join(
            self._table_dir(name, namespace), LOG_DIR, f"{base:012d}.json"
        )
        try:
            with open(tail_path) as fh:
                entry = _json.load(fh)
        except OSError:
            return None
        manifest = entry.get("files")
        stats = entry.get("file_stats") or {}
        if manifest is None:
            return None
        total = 0
        for f in manifest:
            s = stats.get(self._deref(f))
            if s is None or "rows" not in s:
                return None
            total += s["rows"]
        return total

    def count(self, name: str, where=None, namespace: str | None = None) -> int:
        """``where``: SQL string or ``WhenConditions`` (prunes files).
        An unfiltered count is answered from commit-log metadata alone
        when possible (see ``_metadata_count``)."""
        from ..operators.filters import WhenConditions

        unfiltered = where is None or where == "" or (
            isinstance(where, WhenConditions) and where.is_empty()
        )
        if unfiltered:
            n = self._metadata_count(name, namespace)
            if n is not None:
                return n
        return self._filtered_read(name, where, namespace).count()

    def select(
        self,
        name: str,
        where=None,
        order_by: list[str] | None = None,
        limit: int | None = None,
        namespace: str | None = None,
    ) -> DataFrame:
        """``where``: SQL string or ``WhenConditions`` (prunes files)."""
        df = self._filtered_read(name, where, namespace)
        if order_by:
            df = df.orderBy(*order_by)
        if limit is not None:
            df = df.limit(limit)
        return df
