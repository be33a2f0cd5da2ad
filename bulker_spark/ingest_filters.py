"""Ingest-service event filters: pre-Kafka enrichment-stage filtering.

Reference: ``ingest/filters.go:9-67`` — destination options may carry
``events`` (event-type allowlist) and ``hosts`` (domain allowlist with
``*.domain.com`` wildcards); an event is produced only if BOTH match.
Filters parse from a newline-separated string or a list; absent → ``*``.

Spark-first: the whole predicate compiles to one JVM Column expression
(`lower/trim/endswith` chains OR-folded), so the filter rides the scan —
at 100 TB it's a pushed/codegen'd predicate, not a Python callback.
"""

from __future__ import annotations

from functools import reduce
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def parse_filter(value: Any) -> list[str]:
    """filters.go:26-37 — string → newline-split, list → as-is, None → *."""
    if value is None:
        return ["*"]
    if isinstance(value, str):
        return [v for v in (s.strip() for s in value.split("\n")) if v]
    if isinstance(value, (list, tuple)):
        return [str(v) for v in value]
    return []


def satisfy_filter(filt: str, subject: Column) -> Column:
    """Case-insensitive trimmed equality; ``*`` matches all
    (filters.go:9-11)."""
    if filt == "*":
        return F.lit(True)
    return F.lower(F.trim(subject)) == filt.strip().lower()


def satisfy_domain_filter(filt: str, subject: Column, eager: bool = False) -> Column:
    """``*.domain.com`` suffix wildcard; eager also matches the bare apex
    (filters.go:15-24)."""
    if filt == "*":
        return F.lit(True)
    if filt.startswith("*."):
        cond = subject.endswith(filt[1:])
        if eager:
            cond = cond | (subject == filt[2:])
        return cond
    return subject == filt


def _any(conds: list[Column]) -> Column:
    return reduce(lambda a, b: a | b, conds) if conds else F.lit(False)


def apply_filters(
    df: DataFrame,
    options: dict[str, Any] | None = None,
    type_col: str = "type",
    event_col: str = "event",
    host_col: str = "context_page_host",
) -> DataFrame:
    """filters.go:39-50 — keep rows whose host matches any ``hosts`` entry
    AND whose ``type`` or ``event`` matches any ``events`` entry."""
    options = options or {}
    events = parse_filter(options.get("events"))
    hosts = parse_filter(options.get("hosts"))

    host_subject = (
        F.col(host_col) if host_col in df.columns else F.lit(None).cast("string")
    )
    hosts_ok = _any([satisfy_domain_filter(f, host_subject) for f in hosts])

    def type_subject(col: str) -> Column:
        return F.col(col) if col in df.columns else F.lit(None).cast("string")

    events_ok = _any(
        [satisfy_filter(f, type_subject(type_col)) for f in events]
        + [satisfy_filter(f, type_subject(event_col)) for f in events]
    )
    return df.filter(hosts_ok & events_ok)
