"""Round-2 (cont.) catalog extensions: entity-resolution string-similarity
join and deterministic experiment assignment — pure Catalyst plans with
DuckDB oracle twins.

Reference scope (jitsucom/bulker): none of this exists in the reference
(no joins beyond PK merge, ``SURVEY.md §2.5``); these extend the
training-data / product-analytics tier over the same tables.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# ==========================================================================
# Entity resolution: blocked string-similarity join
# ==========================================================================

def part_name_similar_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record-linkage primitive: near-identical name pairs via
    block-then-verify — the standard ER shape (Fellegi-Sunter blocking)
    that replaces the O(n²) cross product with per-block candidate sets.

    Blocking key = last token of the name (the head noun); within a
    block, verify candidates with edit distance ≤ 3. Scale shape: the
    self-join shuffles only DISTINCT names (map-side deduped first), and
    only within blocks — a 10⁹-row catalog with 10⁵ distinct names and
    ~10² blocks does a candidate join of ~10⁵·avg_block rows, never n².
    Levenshtein runs JVM-side (whole-stage codegen), no UDF."""
    p = _t(spark, sf_dir, "part")
    names = (
        p.select("p_name")
        .distinct()
        .withColumn("block", F.element_at(F.split("p_name", " "), -1))
    )
    a, b = names.alias("a"), names.alias("b")
    return (
        a.join(b, "block")
        .filter(F.col("a.p_name") < F.col("b.p_name"))
        .withColumn(
            "edit_dist", F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
        )
        .filter(F.col("edit_dist") <= 3)
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            F.col("edit_dist").cast("long").alias("edit_dist"),
        )
    )


PART_NAME_SIMILAR_SQL = """
WITH names AS (
  SELECT DISTINCT p_name,
         list_extract(string_split(p_name, ' '), -1) AS block
  FROM part
)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist
FROM names a JOIN names b
  ON a.block = b.block AND a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= 3
"""


# ==========================================================================
# Deterministic A/B experiment assignment + per-arm outcome rollup
# ==========================================================================

# identical md5-derived integer on both engines (no xxhash64 in DuckDB):
# the same construction the catalog's minhash path uses (_common.py)
_SPARK_ARM = (
    "cast(conv(substr(md5(concat('exp1:', cast(user_id as string))),1,15),"
    "16,10) as bigint) % 2"
)
_DUCK_ARM = (
    "(('0x' || substr(md5('exp1:' || CAST(user_id AS VARCHAR)),1,15))"
    "::UBIGINT::BIGINT) % 2"
)


def events_ab_arms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment analysis: users are assigned to arms by a salted hash
    of user_id — deterministic, stable across re-runs, and computed
    in-row (ZERO extra shuffle: assignment is a projection, the only
    exchange is the per-arm rollup whose key space is 2).

    Per arm: users, clicks, purchasers, and purchaser-per-user rate —
    the conversion readout. The salt prefix gives independent
    assignments per experiment (new salt ⇒ fresh randomization)."""
    ev = _t(spark, sf_dir, "events")
    assigned = ev.withColumn("arm", F.expr(_SPARK_ARM))
    return (
        assigned.groupBy("arm")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.count(F.when(F.col("event_type") == "click", 1)).alias(
                "clicks"
            ),
            F.countDistinct(
                F.when(F.col("event_type") == "purchase", F.col("user_id"))
            ).alias("purchasers"),
        )
        .select(
            "arm",
            "users",
            "clicks",
            "purchasers",
            F.round(F.col("purchasers") / F.col("users"), 4).alias(
                "conversion"
            ),
        )
    )


EVENTS_AB_ARMS_SQL = f"""
SELECT {_DUCK_ARM} AS arm,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users,
       CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT)
         AS clicks,
       CAST(COUNT(DISTINCT CASE WHEN event_type = 'purchase'
                                THEN user_id END) AS BIGINT) AS purchasers,
       ROUND(COUNT(DISTINCT CASE WHEN event_type = 'purchase'
                                 THEN user_id END)
             / COUNT(DISTINCT user_id), 4) AS conversion
FROM events
GROUP BY 1
"""


EXTRA_QUERIES4: dict[str, tuple] = {
    "part_name_similar_pairs": (
        part_name_similar_pairs,
        PART_NAME_SIMILAR_SQL,
    ),
    "events_ab_arms": (events_ab_arms, EVENTS_AB_ARMS_SQL),
}
