"""Skew mitigation: salted equi-join for hot keys.

AQE's skew-join handles most cases (enabled everywhere in this engine);
salting is the explicit fallback when a key is so hot that even split
shuffle blocks serialize, or when AQE is unavailable (streaming joins).

Shape: replicate each *small*-side row ``n_salts`` times (one per salt
value), salt the *big* side uniformly by a deterministic hash of a
high-cardinality column (or a per-row id), join on (key, salt). Each hot
key now spreads over ``n_salts`` tasks. Cost: small side inflates by
``n_salts`` — keep it for dimension-sized right sides only.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COLUMN = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
    salt_source: str | None = None,
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on`` with hot-key salting.

    ``salt_source``: a big-side column whose hash spreads rows of one key
    across salts (default: a synthetic per-row id — deterministic within a
    task, uniform). Supports ``inner`` and ``left`` joins (the small side
    is replicated, so right/full would duplicate unmatched small rows).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins only")
    src = (
        F.col(salt_source)
        if salt_source
        else F.monotonically_increasing_id()
    )
    big_s = big.withColumn(
        SALT_COLUMN, F.pmod(F.hash(src), F.lit(n_salts))
    )
    small_s = small.withColumn(
        SALT_COLUMN, F.explode(F.array([F.lit(i) for i in range(n_salts)]))
    )
    out = big_s.join(small_s, on=[*on, SALT_COLUMN], how=how)
    return out.drop(SALT_COLUMN)
