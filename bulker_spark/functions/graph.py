"""Connected components over candidate-pair edges: duplicate clustering.

The last stage of a near-dup pipeline: LSH/Jaccard emits *pairs*; keeping
one document per duplicate *group* requires the transitive closure —
(a,b),(b,c) is one cluster {a,b,c} even though (a,c) never scored.

Two execution strategies, dispatched on the EDGE count (the same
size-aware logic as a broadcast-join threshold):

- **small graphs** (≤ ``driver_threshold`` edges): collect the edge list
  (via Arrow, two int64 columns — ~16 bytes/edge on the wire) and run
  union-find with path compression on the driver — exact,
  convergence-free, and O(m α(m)). The edge list of a near-dup pipeline
  is banded collisions only, typically orders of magnitude smaller than
  the corpus. NOTE the driver-side cost is the MATERIALIZED Python
  state, not the wire size: the parent dict plus per-edge tuples run
  ~150-300 bytes/edge, so the 250k default keeps the resident footprint
  in the tens of MB. The distributed loop's per-round scheduling
  overhead (broadcast builds + checkpoint + convergence count) dwarfs
  the actual work at this size.

- **large graphs**: iterative min-label propagation on DataFrames with
  pointer doubling — each round every node adopts the smallest label
  among itself and its neighbors (one hop), then shortcuts through its
  label's label (doubling the distance already-propagated labels cover).
  Propagation alone needs diameter rounds — a chain-shaped component
  (doc A~B~…~Z via sliding boilerplate overlap) of diameter D would
  silently get split labels under any fixed unroll < D; the shortcut
  step makes convergence O(log D), so the log₂(N)-based cap is honestly
  sufficient rather than a hope. Converged when a round changes NO
  label (a cheap count on the just-checkpointed frame); if the cap is
  ever hit anyway the function warns LOUDLY instead of returning split
  clusters as if they were whole. This is the standard large-graph CC
  formulation (Kiveris et al., "Connected Components in MapReduce and
  Beyond" — the min-label + shortcut shape) without needing
  GraphX/GraphFrames.
"""

from __future__ import annotations

import math
import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: observability for the most recent connected_components call —
#: {"strategy": "driver"|"distributed", "edges": raw pair count,
#:  "rounds": propagation rounds used (distributed only),
#:  "cap": the derived/explicit round cap, "converged": bool}.
#: Written for scale tests and SCALING.md measurements; NOT part of the
#: stable API (single-driver state, last call wins).
last_run_stats: dict = {}


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int | None = None,
    broadcast_labels: bool = False,
    driver_threshold: int = 250_000,
) -> DataFrame:
    """→ DataFrame[node, component] where component = min node id reachable.

    Nodes are everything appearing in either edge endpoint; isolated nodes
    (no edges) are the caller's concern — union them in with
    ``component = node`` if needed.

    ``driver_threshold``: RAW edge count (as given, before symmetrize/
    dedup) at or below which the driver-side union-find runs instead of
    the distributed loop (0 forces the distributed path — used by its
    tests). Both strategies return the identical exact answer; only the
    execution shape differs.

    ``max_iterations=None`` (default) derives the distributed cap from
    the node count: ``log2(N) + 3`` rounds, which pointer doubling
    provably needs at most (label reach doubles per round). Hitting the
    cap without convergence emits a ``RuntimeWarning`` — the result may
    have split components and the caller should rerun with a higher cap.

    ``broadcast_labels=True`` hints the label frame into broadcast
    joins — right when the edge list is a small collision set next to a
    huge corpus (LSH near-dup pairs); leave off when components span a
    large fraction of nodes and the label frame rivals the edges.
    """
    # persist the RAW pairs before anything fans out: the symmetrize
    # union reads this frame twice, and without the pin each branch
    # re-executes the caller's (often expensive — LSH banding) lineage;
    # the count also decides the execution strategy
    pairs = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).persist()
    m = pairs.count()
    if m <= driver_threshold:
        # union-find is direction- and duplicate-agnostic: collect the
        # raw pairs directly, no symmetrize/distinct shuffle at all
        out = _driver_union_find(edges.sparkSession, pairs)
        pairs.unpersist()
        # stats only AFTER the run actually succeeded — a toPandas OOM
        # at the threshold boundary must not leave a phantom success
        last_run_stats.clear()
        last_run_stats.update(
            {"strategy": "driver", "edges": m, "converged": True}
        )
        return out
    half = pairs
    e = (
        half.unionByName(
            half.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        .distinct()
        .persist()
    )
    e.count()  # materialize before releasing the raw-pair pin
    pairs.unpersist()
    return _distributed_cc(e, max_iterations, broadcast_labels, raw_edges=m)


def _driver_union_find(spark, e: DataFrame) -> DataFrame:
    """Union-find with path compression over a collected edge list;
    component label = min node id in the set (identical to what the
    distributed min-label loop converges to)."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    # Arrow transfer: two int64 numpy columns, not a list of Row
    # objects — an order of magnitude less driver allocation than
    # .collect() at the threshold boundary
    pdf = e.toPandas()
    pairs = list(zip(pdf["u"].tolist(), pdf["v"].tolist()))
    del pdf
    for u, v in pairs:
        ru, rv = find(u), find(v)
        if ru != rv:
            # union by min: the smaller id becomes the root, so the root
            # IS the component label — no second pass to relabel
            lo, hi = (ru, rv) if ru < rv else (rv, ru)
            parent[hi] = lo
    nodes = {u for u, _ in pairs} | {v for _, v in pairs}
    rows = [(n, find(n)) for n in sorted(nodes)]
    from pyspark.sql import types as T

    node_t = e.schema["u"].dataType
    schema = T.StructType(
        [
            T.StructField("node", node_t, True),
            T.StructField("component", node_t, True),
        ]
    )
    return spark.createDataFrame(rows, schema)


def _distributed_cc(
    e: DataFrame,
    max_iterations: int | None,
    broadcast_labels: bool,
    raw_edges: int | None = None,
) -> DataFrame:
    labels = (
        e.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .persist()
    )
    if max_iterations is None:
        n = labels.count()  # small frame (edge endpoints), persisted
        max_iterations = max(3, math.ceil(math.log2(max(n, 2))) + 3)
    hint = F.broadcast if broadcast_labels else (lambda df: df)
    converged = False
    rounds = 0
    for _ in range(max_iterations):
        rounds += 1
        # 1) propagate: min over neighbors' labels and own; carry the
        # previous label through so convergence needs no extra join
        neighbor_min = (
            e.join(hint(labels), e.v == labels.node)
            .groupBy(F.col("u").alias("node"))
            .agg(F.min("component").alias("n_comp"))
        )
        hop = labels.join(hint(neighbor_min), on="node", how="left").select(
            "node",
            F.col("component").alias("_old"),
            F.least(
                F.col("component"), F.coalesce("n_comp", "component")
            ).alias("component"),
        )
        # 2) shortcut (pointer doubling): adopt the label OF the label —
        # labels are node ids, so they resolve against the same frame;
        # this is what turns diameter-D chains from D rounds into log D
        lab_of = hop.select(
            F.col("node").alias("c_node"), F.col("component").alias("c_comp")
        )
        new_c = F.least(F.col("component"), F.coalesce("c_comp", "component"))
        updated = hop.join(
            hint(lab_of), hop.component == F.col("c_node"), "left"
        ).select(
            "node",
            new_c.alias("component"),
            (new_c < F.col("_old")).alias("_changed"),
        )
        # the pin truncates the lineage — without it each round's plan
        # nests the previous round's and the tree grows exponentially
        # (driver OOM before the data is ever large). session.pin
        # routes to fault-tolerant .checkpoint() on a cluster via
        # spark.bulker.checkpoint.mode; the algorithm is unchanged.
        from bulker_spark.session import pin

        updated = pin(updated)
        changed = updated.filter(F.col("_changed")).count()
        labels.unpersist()
        labels = updated.drop("_changed")
        if changed == 0:
            converged = True
            break
    last_run_stats.clear()
    last_run_stats.update(
        {
            "strategy": "distributed",
            "edges": raw_edges,
            "rounds": rounds,
            "cap": max_iterations,
            "converged": converged,
        }
    )
    if not converged:
        warnings.warn(
            f"connected_components did not converge within {max_iterations} "
            "rounds — components may be SPLIT; rerun with a higher "
            "max_iterations",
            RuntimeWarning,
            stacklevel=3,
        )
    e.unpersist()
    return labels
