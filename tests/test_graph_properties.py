"""Property test: DataFrame connected components == brute-force closure.

The min-label propagation in functions/graph.py underpins every fuzzy
dedup pipeline (doc_dup_clusters, doc_fuzzy_dedup_*); a subtle
convergence bug would silently mis-cluster duplicates, so we pin it
against an independent pure-Python union-find over random graphs."""

from hypothesis import given, settings
from hypothesis import strategies as st

from bulker_spark.functions.graph import connected_components


def _uf_components(edges):
    """node -> min reachable node, via union-find that always roots the
    smaller id (so the final root IS the component's canonical label)."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in list(parent)}


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 25), st.integers(0, 25)).filter(
            lambda p: p[0] != p[1]
        ),
        min_size=1,
        max_size=40,
    )
)
def test_components_match_union_find(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }
    assert got == _uf_components(edges)
