"""Count-min sketch: mergeable frequency estimation for heavy hitters.

Complements the engine's other sketch tiers (HLL++ uniques,
Greenwald-Khanna quantiles — see COVERAGE.md "Sketch tier"): at 100 TB a
per-key exact count shuffles the full key set; a count-min sketch
shuffles ``depth x width`` cells no matter how many keys exist, and the
cells merge associatively across partitions (a partial-aggregated
groupBy), so the reduce side is O(sketch), not O(keys). Estimates are
upper bounds: ``true <= est <= true + eps * N`` with
``eps ~ e / width`` at the usual depth/failure tradeoffs.

Hashes are md5-derived (60-bit prefix, mod width) so a SQL oracle can
reproduce the sketch bit-for-bit — same trick as the MinHash tier
(`plans/_common.py`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cell(key_col: str, d: int, width: int):
    """Deterministic row-d hash cell for a key column (codegen, no UDF)."""
    return F.expr(
        f"cast(conv(substr(md5(concat('{d}:', cast({key_col} as string))),"
        f" 1, 15), 16, 10) as bigint) % {width}"
    )


def count_min_sketch(
    df: DataFrame, key_col: str, *, width: int = 512, depth: int = 2
) -> DataFrame:
    """Build the sketch: one (d, cell, cnt) row per non-empty cell,
    ``depth x width`` rows max regardless of key cardinality."""
    cells = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"), _cell(key_col, d, width).alias("cell")
            )
            for d in range(depth)
        ]
    )
    return (
        df.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.d").alias("d"), F.col("c.cell").alias("cell"))
        .agg(F.count("*").alias("cnt"))
    )


def count_min_lookup(
    cms: DataFrame,
    keys: DataFrame,
    key_col: str,
    *,
    width: int = 512,
    depth: int = 2,
) -> DataFrame:
    """Point-estimate each key in ``keys``: min over depth rows of the
    key's cell counts. The key set is config-sized → broadcast against
    the (already tiny) sketch."""
    qcells = keys.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _cell(key_col, d, width).alias("cell"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("c"),
    ).select(key_col, F.col("c.d").alias("d"), F.col("c.cell").alias("cell"))
    return (
        cms.join(F.broadcast(qcells), ["d", "cell"])
        .groupBy(key_col)
        .agg(F.min("cnt").alias("est_count"))
    )
