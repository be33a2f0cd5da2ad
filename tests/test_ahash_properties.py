"""Property tests: the image_ahash kernel against a pure-Python model
(including non-8×8 inputs, which exercise the nearest-neighbor resize the
catalog query's 8×8 images never hit), and fixed-point PageRank against a
sequential reference implementation."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from bulker_spark.functions.multimodal import (
    image_ahash,
    make_fake_image,
    make_fake_image_pixels,
)


def _model_ahash(w: int, h: int, px: np.ndarray) -> list[int]:
    """Sequential reference: resize to 8×8 (nearest), integer above-mean
    bits, 4×16-bit bands."""
    grid = px.reshape(h, w)
    ys = (np.arange(8) * h // 8).clip(0, h - 1)
    xs = (np.arange(8) * w // 8).clip(0, w - 1)
    small = grid[np.ix_(ys, xs)].astype(np.int64).ravel()
    bits = (small * 64 >= small.sum()).astype(np.int64)
    return [
        int(sum(bits[16 * k + j] << j for j in range(16))) for k in range(4)
    ]


@settings(max_examples=12, deadline=None)
@given(
    dims=st.tuples(
        st.integers(min_value=1, max_value=24),
        st.integers(min_value=1, max_value=24),
    ),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_ahash_kernel_matches_model_any_size(spark, dims, seed):
    w, h = dims
    rng = np.random.RandomState(seed)
    px = rng.randint(0, 256, size=w * h, dtype=np.uint8)
    content = make_fake_image_pixels(w, h, px)
    df = spark.createDataFrame([(1, bytearray(content))], "id long, content binary")
    row = image_ahash(df).collect()[0]
    assert row.ahash_valid
    assert [row.b0, row.b1, row.b2, row.b3] == _model_ahash(
        w, h, px.astype(np.int64)
    )


def test_ahash_invalid_binary_yields_nulls(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"not an image")), (2, None)],
        "id long, content binary",
    )
    rows = {r.id: r for r in image_ahash(df).collect()}
    for r in rows.values():
        assert not r.ahash_valid
        assert r.b0 is None and r.b3 is None


def test_ahash_brightness_invariance_8x8(spark):
    # uniform brightness shift preserves the above-mean pattern exactly
    base = np.arange(64, dtype=np.int64) % 97
    shifted = base + 50
    df = spark.createDataFrame(
        [
            (1, bytearray(make_fake_image_pixels(8, 8, base))),
            (2, bytearray(make_fake_image_pixels(8, 8, shifted))),
        ],
        "id long, content binary",
    )
    rows = {r.id: (r.b0, r.b1, r.b2, r.b3) for r in image_ahash(df).collect()}
    assert rows[1] == rows[2]


# -- fixed-point PageRank vs sequential model ------------------------------

def _model_pagerank(edges, iters=2, scale=10**12):
    nodes = sorted({u for u, _ in edges})
    deg = {u: sum(1 for a, _ in edges if a == u) for u in nodes}
    n = len(nodes)
    base = 15 * (scale // n) // 100
    pr = {u: scale // n for u in nodes}
    for _ in range(iters):
        contrib = {u: 0 for u in nodes}
        for u, v in edges:
            contrib[v] += pr[u] // deg[u]
        pr = {u: base + (85 * contrib[u]) // 100 for u in nodes}
    return pr


def test_pagerank_matches_sequential_model(spark, tmp_path):
    # build a tiny lineitem-shaped parquet and run the catalog query on it
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bulker_spark.plans.analytics5 import parts_pagerank

    orders = [(1, [1, 2, 3]), (2, [2, 3]), (3, [3, 4]), (4, [1, 4, 5])]
    rows = [(ok, pk) for ok, parts in orders for pk in parts]
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    got = {
        r.part_id: r.pr
        for r in parts_pagerank(spark, str(tmp_path)).collect()
    }
    edges = sorted(
        {
            (u, v)
            for _, parts in orders
            for u in parts
            for v in parts
            if u != v
        }
    )
    assert got == _model_pagerank(edges)


def test_pca_power_tracks_float_power_iteration(spark):
    # the fixed-point result must align (cos ≈ 1) with the same two float
    # power-iteration steps over the same data — quantization at 1e-6
    # must not change the direction materially
    import numpy as np
    import pyarrow.parquet as pq

    from bulker_spark.plans.analytics5 import emb_pca_power

    sf = "/root/testdata/sf0.001"
    got = {
        r.pos: r.v_fp for r in emb_pca_power(spark, sf).collect()
    }
    v_fp = np.array([got[j] for j in range(64)], dtype=np.float64)

    X = np.array(
        pq.read_table(f"{sf}/embeddings.parquet")
        .column("embedding")
        .to_pylist(),
        dtype=np.float64,
    )
    v = np.ones(64)
    for _ in range(2):
        d = X @ v
        v = X.T @ d
        i = np.argmax(np.abs(v))
        v = v * np.sign(v[i]) / np.abs(v[i])
    cos = v_fp @ v / (np.linalg.norm(v_fp) * np.linalg.norm(v))
    assert cos > 0.999
    # scale convention: max-abs component is +S
    assert max(abs(x) for x in v_fp) == 1_000_000


def test_mmr_selects_more_diverse_set_than_pure_topk(spark):
    # MMR's selected set must be no less diverse (lower max pairwise
    # cosine) than the pure-relevance top-k, and must include the single
    # most relevant candidate as its first pick
    import numpy as np
    import pyarrow.parquet as pq

    from bulker_spark.plans.analytics5 import emb_mmr_select

    sf = "/root/testdata/sf0.001"
    picks = {
        r.rank: r.vec_id for r in emb_mmr_select(spark, sf).collect()
    }
    assert sorted(picks) == [1, 2, 3, 4, 5]
    ids = [picks[r] for r in sorted(picks)]
    assert len(set(ids)) == 5

    tbl = pq.read_table(f"{sf}/embeddings.parquet")
    X = {
        v: np.array(e, dtype=np.float64)
        for v, e in zip(
            tbl.column("vec_id").to_pylist(),
            tbl.column("embedding").to_pylist(),
        )
    }
    q = X[0]
    cands = {v: x for v, x in X.items() if 0 < v < 200}
    rel = {v: float(x @ q) for v, x in cands.items()}
    assert picks[1] == max(rel, key=lambda v: (rel[v], -v))

    def max_pair_cos(vs):
        out = 0.0
        for i, a in enumerate(vs):
            for b in vs[i + 1 :]:
                xa, xb = X[a], X[b]
                out = max(
                    out,
                    float(xa @ xb)
                    / (np.linalg.norm(xa) * np.linalg.norm(xb)),
                )
        return out

    topk = sorted(rel, key=lambda v: -rel[v])[:5]
    assert max_pair_cos(ids) <= max_pair_cos(topk) + 1e-9
