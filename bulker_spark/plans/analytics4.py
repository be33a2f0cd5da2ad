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


# ==========================================================================
# Temperature-scaled corpus mixture weights
# ==========================================================================

def doc_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture design: per-language sampling weights under
    temperature τ=0.7 — ``p_g ∝ tokens_g^τ`` (the standard multilingual
    re-balancing: τ<1 up-samples low-resource groups), plus the
    effective epoch count each group would see when drawing the corpus'
    total token budget under those weights.

    Scale shape: ONE aggregation keyed on lang (map-side partials over
    an in-row token count); the normalization window runs over |langs|
    rows — everything after the first exchange is constant-size."""
    from pyspark.sql import Window

    d = _t(spark, sf_dir, "documents")
    toks = F.size(F.split("text", " "))
    g = d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(toks).cast("long").alias("tokens"),
    )
    w = Window.partitionBy()
    tau = 0.7
    pw = F.pow(F.col("tokens").cast("double"), F.lit(tau))
    return g.select(
        "lang",
        "n_docs",
        "tokens",
        F.round(F.col("tokens") / F.sum("tokens").over(w), 4).alias(
            "raw_share"
        ),
        F.round(pw / F.sum(pw).over(w), 4).alias("temp_share"),
        # epochs over this group when the sampler draws total_tokens
        # according to temp_share
        F.round(
            (pw / F.sum(pw).over(w))
            * F.sum("tokens").over(w)
            / F.col("tokens"),
            4,
        ).alias("epochs"),
    ).orderBy("lang")


DOC_MIXTURE_SQL = """
WITH g AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
  FROM documents GROUP BY 1
)
SELECT lang, n_docs, tokens,
       ROUND(tokens / SUM(tokens) OVER (), 4) AS raw_share,
       ROUND(POW(tokens, 0.7) / SUM(POW(tokens, 0.7)) OVER (), 4)
         AS temp_share,
       ROUND(POW(tokens, 0.7) / SUM(POW(tokens, 0.7)) OVER ()
             * SUM(tokens) OVER () / tokens, 4) AS epochs
FROM g ORDER BY lang
"""


# ==========================================================================
# Per-label embedding centroids
# ==========================================================================

def emb_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Element-wise mean vector per label (first 8 dims) — the centroid
    primitive under IVF indexing, k-means, and SemDeDup.

    Scale shape: ``posexplode`` fans each vector into (label, pos, val)
    rows IN the scan stage, and the single aggregation partial-sums
    map-side — the shuffle carries |labels| × dims partial cells, not
    vectors. Truncating to the first 8 dims happens before the explode,
    so the fan-out is 8× rows, independent of true dimensionality."""
    e = _t(spark, sf_dir, "embeddings")
    return (
        e.select(
            "label",
            F.posexplode(F.slice("embedding", 1, 8)).alias("pos", "val"),
        )
        .groupBy("label", "pos")
        .agg(F.round(F.avg("val"), 4).alias("centroid_val"))
        .orderBy("label", "pos")
    )


EMB_CENTROIDS_SQL = """
SELECT label, CAST(i - 1 AS INT) AS pos, ROUND(AVG(e), 4) AS centroid_val
FROM (SELECT label, unnest(embedding) AS e,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings)
WHERE i <= 8
GROUP BY 1, 2 ORDER BY 1, 2
"""


EXTRA_QUERIES4: dict[str, tuple] = {
    "part_name_similar_pairs": (
        part_name_similar_pairs,
        PART_NAME_SIMILAR_SQL,
    ),
    "events_ab_arms": (events_ab_arms, EVENTS_AB_ARMS_SQL),
    "doc_mixture_temperature": (
        doc_mixture_temperature,
        DOC_MIXTURE_SQL,
    ),
    "emb_label_centroids": (emb_label_centroids, EMB_CENTROIDS_SQL),
}
