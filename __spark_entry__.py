"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` exposes
every implemented operator from SURVEY.md §2 (plus the training-data
pipeline operators); ``oracle_sql()`` gives the DuckDB-equivalent SQL for
the correctness gate. See ``bulker_spark/plans/queries.py`` for the
catalog; engine internals (ingestion, schema evolution, merge modes) are
exercised by ``tests/``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bulker_spark.plans.queries import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    ``training_mix_pipeline`` composes the engine's core curation stages —
    quality filter → exact dedup → stratified sample → token budgeting —
    into one Catalyst plan (two shuffles), which is the engine's reason to
    exist; see its oracle-checked entry in ``queries()``."""
    from bulker_spark.plans.analytics import training_mix_pipeline

    return training_mix_pipeline(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None
    }
