"""Distributed connected-components at representative scale (≥1M edges).

Every bench/oracle run takes the driver union-find fast path
(driver_threshold=250k), so until this test the pointer-doubling loop
was only exercised at toy sizes via driver_threshold=0. Here we build a
>1M-edge graph whose shape stresses exactly what the distributed path
claims to handle:

- a 32k-node CHAIN (diameter 32,768) — any propagation without the
  doubling shortcut would need 32k rounds; the log2(N)+3 cap (~24)
  passes only if the shortcut really doubles label reach per round;
- ~1M random intra-group edges over 131k groups of 8 — breadth: many
  small components resolved concurrently, the LSH-collision shape.

Pinned: (a) label-exactness vs an independent Python union-find over
the same edges, (b) convergence within the derived cap with rounds
reported via graph.last_run_stats, (c) no RuntimeWarning (no silent
split components). Wall time + rounds are printed for SCALING.md.

Deliberately NOT gated behind BULKER_SPARK_TEST_MILLION_ROWS (unlike
test_bigdata's opt-in tiers): the distributed CC path has no other
default-suite exercise at a size where its convergence math matters,
and a gated-off proof is no proof. ~1 min inside a ~28 min suite.
"""

import time
import warnings

from pyspark.sql import functions as F

from bulker_spark.functions import graph
from bulker_spark.functions.graph import connected_components

CHAIN = 32_768  # nodes 0..32767, edges (i, i+1)
GROUPS = 131_072  # groups of 8 nodes, ~1.03M random intra-group edges
GROUP_EDGES = 1_200_000  # ~1/8 are self-loops (u==v) and get filtered
CLUSTER_BASE = CHAIN + 10  # keep the two node-id ranges disjoint


def _edges_df(spark):
    chain = spark.range(CHAIN - 1).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    # deterministic pseudo-random endpoints inside each group of 8:
    # xxhash64 is seed-stable in Spark, so the edge set is reproducible
    # across the two reads (union-find input vs CC input)
    g = F.col("id") % GROUPS
    u = CLUSTER_BASE + g * 8 + F.pmod(F.xxhash64("id"), F.lit(8))
    v = CLUSTER_BASE + g * 8 + F.pmod(F.xxhash64(F.col("id") + 7_777), F.lit(8))
    clusters = (
        spark.range(GROUP_EDGES)
        .select(u.alias("id_a"), v.alias("id_b"))
        .filter(F.col("id_a") != F.col("id_b"))
    )
    return chain.unionByName(clusters)


def _uf(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in list(parent)}


def test_distributed_cc_million_edges(spark):
    edges = _edges_df(spark)
    pdf = edges.toPandas()
    raw_edges = len(pdf)
    assert raw_edges >= 1_000_000, raw_edges
    expected = _uf(list(zip(pdf["id_a"].tolist(), pdf["id_b"].tolist())))
    del pdf

    t0 = time.monotonic()
    with warnings.catch_warnings():
        # a convergence failure must FAIL, not warn
        warnings.simplefilter("error", RuntimeWarning)
        got_df = connected_components(edges, driver_threshold=0)
        got = {r["node"]: r["component"] for r in got_df.collect()}
    wall = time.monotonic() - t0

    stats = dict(graph.last_run_stats)
    assert stats["strategy"] == "distributed"
    assert stats["edges"] == raw_edges
    assert stats["converged"] is True
    assert stats["rounds"] <= stats["cap"], stats
    # chain correctness in one line before the full-dict compare: every
    # chain node collapses to label 0 across diameter 32k
    assert got[CHAIN - 1] == 0
    assert got == expected
    print(
        f"\ndistributed CC: {raw_edges} raw edges, {len(got)} nodes, "
        f"{stats['rounds']}/{stats['cap']} rounds, {wall:.1f}s"
    )
