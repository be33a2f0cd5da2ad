"""WhenConditions: the reference's predicate surface
(``/root/reference/bulkerlib/implementations/sql/delete_condition.go:14-61``):
a conjunction/disjunction of ``{field, clause, value}`` triples, rendered to
a Spark Column (native path) or a parameterized WHERE fragment (SQL sinks),
plus the ``__partition_id`` predicate and time-granularity truncation
(``delete_condition.go:63-187``).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from functools import reduce
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

PARTITION_ID_COLUMN = "__partition_id"

_CLAUSES = {"=", "!=", "<", "<=", ">", ">=", "is null", "is not null", "like"}


@dataclass
class WhenCondition:
    field: str
    clause: str
    value: Any = None

    def __post_init__(self):
        if self.clause.lower() not in _CLAUSES:
            raise ValueError(f"unsupported clause {self.clause!r}")
        self.clause = self.clause.lower()

    def to_column(self) -> Column:
        c = F.col(f"`{self.field}`")
        return {
            "=": lambda: c == F.lit(self.value),
            "!=": lambda: c != F.lit(self.value),
            "<": lambda: c < F.lit(self.value),
            "<=": lambda: c <= F.lit(self.value),
            ">": lambda: c > F.lit(self.value),
            ">=": lambda: c >= F.lit(self.value),
            "is null": lambda: c.isNull(),
            "is not null": lambda: c.isNotNull(),
            "like": lambda: c.like(str(self.value)),
        }[self.clause]()

    def to_sql(self, quote: str = '"') -> tuple[str, list]:
        ident = f"{quote}{self.field}{quote}"
        if self.clause in ("is null", "is not null"):
            return f"{ident} {self.clause.upper()}", []
        op = "LIKE" if self.clause == "like" else self.clause
        return f"{ident} {op} ?", [self.value]


@dataclass
class WhenConditions:
    conditions: list[WhenCondition] = dc_field(default_factory=list)
    join_with: str = "and"  # and | or

    def add(self, field: str, clause: str, value: Any = None) -> "WhenConditions":
        self.conditions.append(WhenCondition(field, clause, value))
        return self

    def is_empty(self) -> bool:
        return not self.conditions

    def to_column(self) -> Column:
        if not self.conditions:
            return F.lit(True)
        cols = [c.to_column() for c in self.conditions]
        op = (lambda a, b: a & b) if self.join_with == "and" else (lambda a, b: a | b)
        return reduce(op, cols)

    def to_sql(self, quote: str = '"') -> tuple[str, list]:
        if not self.conditions:
            return "", []
        parts, params = [], []
        for c in self.conditions:
            sql, p = c.to_sql(quote)
            parts.append(sql)
            params.extend(p)
        joiner = " AND " if self.join_with == "and" else " OR "
        return joiner.join(parts), params

    def prune_bounds(self) -> dict[str, tuple]:
        """Column bounds ``{col: (lo, hi)}`` implied by this predicate,
        for manifest-level data skipping (``Warehouse.read(prune=...)``).

        Sound because a file may be skipped when ANY single AND-joined
        conjunct alone proves no row can match — so each range/equality
        clause contributes its bound regardless of its neighbours (which
        still run as real filters). NULL rows never satisfy a range
        clause, so null-blind parquet min/max stats stay sufficient.
        OR-joined predicates and non-range clauses (!=, LIKE, IS NULL)
        contribute nothing; ``<``/``>`` are widened to inclusive bounds.
        Pruning is advisory — an empty dict just means "scan everything".
        """
        if self.join_with != "and":
            return {}
        import datetime as _dt

        def cat(v):
            if isinstance(v, (int, float)):  # bool is an int subclass
                return "num"
            return "str" if isinstance(v, str) else "time"

        bounds: dict[str, list] = {}
        cats: dict[str, str] = {}
        poisoned: set[str] = set()
        for c in self.conditions:
            if c.clause not in ("=", "<", "<=", ">", ">="):
                continue
            v = c.value
            if isinstance(v, _dt.datetime):
                # the committed stats are aware-UTC ISO strings; a naive
                # datetime's instant depends on the session timezone, so
                # emitting it could misprune whole offsets of data — the
                # real Spark filter still applies the clause
                if v.tzinfo is None:
                    continue
                v = v.astimezone(_dt.timezone.utc)
            if c.field in poisoned or not (
                isinstance(v, (int, float, str, bool))
                or hasattr(v, "isoformat")
            ):
                continue
            if cats.setdefault(c.field, cat(v)) != cat(v):
                # mixed-type clauses on one column — give up on it
                bounds.pop(c.field, None)
                poisoned.add(c.field)
                continue
            lo = v if c.clause in ("=", ">", ">=") else None
            hi = v if c.clause in ("=", "<", "<=") else None
            cur = bounds.setdefault(c.field, [None, None])
            if lo is not None and (cur[0] is None or lo > cur[0]):
                cur[0] = lo
            if hi is not None and (cur[1] is None or hi < cur[1]):
                cur[1] = hi
        return {
            col: (lo, hi)
            for col, (lo, hi) in bounds.items()
            if lo is not None or hi is not None
        }


def partition_id_condition(partition_id: str) -> WhenConditions:
    """The replace_partition delete predicate (delete_condition.go:50-61)."""
    return WhenConditions([WhenCondition(PARTITION_ID_COLUMN, "=", partition_id)])


GRANULARITIES = ("HOUR", "DAY", "MONTH", "QUARTER", "YEAR")


def truncate_granularity(col: str | Column, granularity: str) -> Column:
    """Partition-id derivation for time-partitioned tables
    (delete_condition.go:63-187 lower-bound truncation → date_trunc)."""
    g = granularity.upper()
    if g not in GRANULARITIES:
        raise ValueError(f"unsupported granularity {granularity!r}")
    c = col if isinstance(col, Column) else F.col(col)
    return F.date_trunc(g, c)
