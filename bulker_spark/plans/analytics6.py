"""Round-3 catalog extensions: graph retrieval / semi-supervised labeling
over the purchase graphs — SALSA (the random-walk HITS variant used for
user-item retrieval in recommender pipelines) and majority-vote label
propagation. Both run a fixed number of unrolled iterations in integer
fixed-point arithmetic, so results are bit-identical across partitioning,
join order, and engine (the same construction as ``parts_pagerank``).

Reference scope (jitsucom/bulker): none of this exists in the reference
(`SURVEY.md §2` — no graph ops); these extend the training-data curation
tier: bipartite-graph retrieval scores and label densification are stock
steps when mining supervision signal out of interaction logs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# ==========================================================================
# SALSA over the customer-part bipartite graph
# ==========================================================================

_SALSA_SCALE = 10**12
_SALSA_MAX_PART = 300


def parts_salsa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SALSA authority scores on the customer→part purchase graph: two
    rounds of the alternating random walk (part → customer → part), each
    hop dividing a node's mass by its degree — HITS's walk-normalized
    cousin (Lempel & Moran 2000), the retrieval scorer behind
    user-item-graph candidate generation.

    Integer fixed-point throughout: mass starts at ``SCALE // n_parts``
    and every hop is an integer ``div`` by the degree, so the total mass
    only shrinks (no overflow) and the result is bit-exact on any engine
    or partitioning — no L2 normalization step, which is what makes
    classic HITS float-bound.

    Scale shape: the bipartite edge list is built once and persisted
    (deg lookups and both walk directions fan out from it); each hop is
    one shuffle-join on the hop key + a map-side-combined integer sum —
    O(iters) jobs over a cached edge list, the Pregel-on-DataFrames
    layout. Degree skew is bounded by the part-key cap."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_partkey") < _SALSA_MAX_PART
    ).select("l_orderkey", "l_partkey")
    edges = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
        .persist()
    )
    indeg = edges.groupBy("p").agg(F.count("*").alias("indeg"))
    outdeg = edges.groupBy("c").agg(F.count("*").alias("outdeg"))
    n_parts = indeg.count()
    auth = indeg.select(
        "p", F.lit(_SALSA_SCALE // n_parts).cast("long").alias("a")
    )
    for _ in range(2):
        hub = (
            edges.join(indeg, "p")
            .join(auth, "p")
            .select("c", F.expr("a div indeg").alias("h"))
            .groupBy("c")
            .agg(F.sum("h").alias("h"))
        )
        auth = (
            edges.join(outdeg, "c")
            .join(hub, "c")
            .select("p", F.expr("h div outdeg").alias("a"))
            .groupBy("p")
            .agg(F.sum("a").alias("a"))
        )
    return (
        auth.join(indeg, "p")
        .select(
            F.col("p").alias("part_id"),
            F.col("a").cast("long").alias("salsa"),
            F.col("indeg").cast("long").alias("n_buyers"),
        )
        .orderBy("part_id")
    )


PARTS_SALSA_SQL = f"""
WITH l AS (
  SELECT l_orderkey, l_partkey FROM lineitem WHERE l_partkey < {_SALSA_MAX_PART}
),
edges AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
  FROM l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
indeg AS (SELECT p, COUNT(*) AS indeg FROM edges GROUP BY 1),
outdeg AS (SELECT c, COUNT(*) AS outdeg FROM edges GROUP BY 1),
np AS (SELECT COUNT(*) AS np FROM indeg),
a0 AS (SELECT p, {_SALSA_SCALE} // np.np AS a FROM indeg, np),
h1 AS (
  SELECT e.c, SUM(a0.a // indeg.indeg) AS h
  FROM edges e JOIN indeg ON e.p = indeg.p JOIN a0 ON e.p = a0.p
  GROUP BY 1
),
a1 AS (
  SELECT e.p, SUM(h1.h // outdeg.outdeg) AS a
  FROM edges e JOIN outdeg ON e.c = outdeg.c JOIN h1 ON e.c = h1.c
  GROUP BY 1
),
h2 AS (
  SELECT e.c, SUM(a1.a // indeg.indeg) AS h
  FROM edges e JOIN indeg ON e.p = indeg.p JOIN a1 ON e.p = a1.p
  GROUP BY 1
),
a2 AS (
  SELECT e.p, SUM(h2.h // outdeg.outdeg) AS a
  FROM edges e JOIN outdeg ON e.c = outdeg.c JOIN h2 ON e.c = h2.c
  GROUP BY 1
)
SELECT a2.p AS part_id, CAST(a2.a AS BIGINT) AS salsa,
       CAST(indeg.indeg AS BIGINT) AS n_buyers
FROM a2 JOIN indeg ON a2.p = indeg.p
ORDER BY part_id
"""


# ==========================================================================
# Majority-vote label propagation over the co-purchase graph
# ==========================================================================

_LP_MAX_PART = 300


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_partkey") < _LP_MAX_PART
    ).select("l_orderkey", F.col("l_partkey").alias("u"))
    return (
        l.alias("a")
        .join(
            l.withColumnRenamed("u", "v").alias("b"),
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.u") != F.col("b.v")),
        )
        .select("u", "v")
        .distinct()
    )


def parts_label_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-supervised label propagation: every third part is seeded with
    its brand; two unrolled rounds assign each still-unlabeled node the
    majority label among its labeled co-purchase neighbors (ties broken
    by the lexicographically smallest label — a total order, so the
    result is deterministic with no float arithmetic at all). Labels are
    sticky: once assigned, a node votes but never flips — the classic
    seeded-densification variant used to spread sparse supervision over
    an interaction graph.

    Scale shape: the edge list is built once and persisted; each round is
    one shuffle on the vote key (node, label) + a per-node row_number —
    the same key both rounds, so AQE reuses the partitioning. The final
    readout is a broadcast-joined left join back to the node set."""
    edges = _copurchase_edges(spark, sf_dir).persist()
    nodes = edges.select(F.col("u").alias("id")).distinct()
    part = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("id"), F.col("p_brand").alias("label")
    )
    labeled = (
        nodes.join(part, "id")
        .filter(F.col("id") % 3 == 0)
        .withColumn("round", F.lit(0))
    )
    for r in (1, 2):
        votes = (
            edges.join(labeled, edges.u == labeled.id)
            .select(F.col("v").alias("cand"), "label")
            .join(
                labeled.select(F.col("id").alias("cand")),
                "cand",
                "left_anti",
            )
            .groupBy("cand", "label")
            .agg(F.count("*").alias("n"))
        )
        w = Window.partitionBy("cand").orderBy(
            F.col("n").desc(), F.col("label")
        )
        picked = (
            votes.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(
                F.col("cand").alias("id"), "label", F.lit(r).alias("round")
            )
        )
        labeled = labeled.unionByName(picked)
    return (
        nodes.join(labeled, "id", "left")
        .select(
            F.col("id").alias("part_id"),
            F.coalesce("label", F.lit("unassigned")).alias("label"),
            F.coalesce("round", F.lit(-1)).cast("int").alias("round"),
        )
        .orderBy("part_id")
    )


PARTS_LABEL_PROP_SQL = f"""
WITH l AS (
  SELECT l_orderkey, l_partkey FROM lineitem WHERE l_partkey < {_LP_MAX_PART}
),
edges AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM l a JOIN l b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey <> b.l_partkey
),
nodes AS (SELECT DISTINCT u AS id FROM edges),
lab0 AS (
  SELECT n.id, p.p_brand AS label, 0 AS round
  FROM nodes n JOIN part p ON n.id = p.p_partkey
  WHERE n.id % 3 = 0
),
v1 AS (
  SELECT e.v AS cand, lab0.label, COUNT(*) AS n
  FROM edges e JOIN lab0 ON e.u = lab0.id
  WHERE e.v NOT IN (SELECT id FROM lab0)
  GROUP BY 1, 2
),
p1 AS (
  SELECT cand AS id, label, 1 AS round
  FROM (
    SELECT cand, label,
           row_number() OVER (PARTITION BY cand ORDER BY n DESC, label) AS rn
    FROM v1
  ) WHERE rn = 1
),
lab1 AS (SELECT * FROM lab0 UNION ALL SELECT * FROM p1),
v2 AS (
  SELECT e.v AS cand, lab1.label, COUNT(*) AS n
  FROM edges e JOIN lab1 ON e.u = lab1.id
  WHERE e.v NOT IN (SELECT id FROM lab1)
  GROUP BY 1, 2
),
p2 AS (
  SELECT cand AS id, label, 2 AS round
  FROM (
    SELECT cand, label,
           row_number() OVER (PARTITION BY cand ORDER BY n DESC, label) AS rn
    FROM v2
  ) WHERE rn = 1
),
lab2 AS (SELECT * FROM lab1 UNION ALL SELECT * FROM p2)
SELECT n.id AS part_id,
       COALESCE(lab2.label, 'unassigned') AS label,
       CAST(COALESCE(lab2.round, -1) AS INT) AS round
FROM nodes n LEFT JOIN lab2 ON n.id = lab2.id
ORDER BY part_id
"""


EXTRA_QUERIES6: dict[str, tuple] = {
    "parts_salsa": (parts_salsa, PARTS_SALSA_SQL),
    "parts_label_prop": (parts_label_prop, PARTS_LABEL_PROP_SQL),
}
