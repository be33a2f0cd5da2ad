"""Tests for training-data pipeline functions: text analysis, similarity
search (brute/LSH/IVF), multimodal plumbing."""

import pytest
from pyspark.sql import functions as F

from bulker_spark.functions import multimodal as mm
from bulker_spark.functions import similarity as sim
from bulker_spark.functions import text as tx

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


# --- text ----------------------------------------------------------------

def test_token_and_quality(spark, docs):
    out = tx.quality_features(docs.limit(20))
    rows = out.collect()
    for r in rows:
        assert r["q_n_chars"] == len(r["text"])
        assert r["q_n_tokens"] == len(r["text"].split(" "))
        assert 0 <= r["q_score"] <= 1.0


def test_lang_guess(spark, docs):
    out = docs.select(tx.lang_guess().alias("g")).distinct().collect()
    assert {r["g"] for r in out} <= {"en", "fr", "es", "de", "unk"}


def test_fingerprint_dedup(spark, docs):
    import hashlib

    row = docs.select("doc_id", "text", tx.fingerprint().alias("fp")).first()
    assert row["fp"] == hashlib.md5(row["text"].encode()).hexdigest()


def test_minhash_similar_docs_agree(spark):
    # near-identical texts must share most minhash components
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "the quick brown fox jumps over the lazy dog again and agaim"),
            (3, "completely different content with nothing shared whatsoever"),
        ],
        "doc_id long, text string",
    )
    sh = tx.shingles(df)
    sigs = {r["doc_id"]: [r[f"mh{i}"] for i in range(16)]
            for r in tx.minhash_signatures(sh).collect()}
    agree_12 = sum(a == b for a, b in zip(sigs[1], sigs[2]))
    agree_13 = sum(a == b for a, b in zip(sigs[1], sigs[3]))
    assert agree_12 >= 10  # ~98% shingle overlap
    assert agree_13 <= 2


def test_minhash_lsh_candidates(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "the quick brown fox jumps over the lazy dog again and agaim"),
            (3, "completely different content with nothing shared whatsoever"),
        ],
        "doc_id long, text string",
    )
    sigs = tx.minhash_signatures(tx.shingles(df))
    cands = {(r["id_a"], r["id_b"]) for r in tx.minhash_lsh_candidates(sigs).collect()}
    assert (1, 2) in cands
    assert (1, 3) not in cands


def test_simhash_hamming(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "entirely unrelated words appear in this sentence"),
        ],
        "doc_id long, text string",
    )
    s = tx.simhash(tx.tokens(df), n_bits=48)
    a = s.alias("a").filter(F.col("doc_id") == 1).select(F.col("simhash").alias("ha"))
    for other, max_d, min_d in [(2, 12, 0), (3, 48, 10)]:
        b = s.filter(F.col("doc_id") == other).select(F.col("simhash").alias("hb"))
        d = a.crossJoin(b).select(
            tx.hamming_distance(F.col("ha"), F.col("hb")).alias("d")
        ).first()["d"]
        assert min_d <= d <= max_d, (other, d)


def test_simhash_near_pairs_matches_brute_force(spark, docs):
    """Pigeonhole banding must return the exact brute-force result set."""
    sig = tx.simhash(tx.tokens(docs), n_bits=48)
    banded = tx.simhash_near_pairs(sig, n_bits=48, max_hamming=6)
    a, b = sig.alias("a"), sig.alias("b")
    brute = (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            tx.hamming_distance(
                F.col("a.simhash"), F.col("b.simhash")
            ).cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= 6)
    )
    assert sorted(map(tuple, banded.collect())) == sorted(
        map(tuple, brute.collect())
    )


def test_simhash_near_pairs_rejects_bad_params(spark, docs):
    sig = tx.simhash(tx.tokens(docs), n_bits=16)
    with pytest.raises(ValueError):
        tx.simhash_near_pairs(sig, n_bits=16, max_hamming=16)


# --- similarity -----------------------------------------------------------

def test_cosine_topk_self_is_best(spark, embs):
    q = embs.filter(F.col("vec_id") == 7).first()["embedding"]
    top = sim.cosine_topk(embs, list(q), k=5).collect()
    assert top[0]["vec_id"] == 7
    assert abs(top[0]["cos_sim"] - 1.0) < 1e-9


def test_ann_lsh_recall(spark, embs):
    q = embs.filter(F.col("vec_id") == 7).first()["embedding"]
    exact = {r["vec_id"] for r in sim.cosine_topk(embs, list(q), k=10).collect()}
    approx_df, _model = sim.ann_lsh(embs, list(q), k=10)
    approx = {r["vec_id"] for r in approx_df.collect()}
    recall = len(exact & approx) / 10
    assert recall >= 0.5, f"LSH recall too low: {recall}"


def test_ivf_search(spark, embs):
    q = embs.filter(F.col("vec_id") == 7).first()["embedding"]
    idx = sim.IvfIndex(n_cells=8)
    idx.build(embs)
    exact = {r["vec_id"] for r in sim.cosine_topk(embs, list(q), k=10).collect()}
    probed = {r["vec_id"] for r in idx.search(list(q), k=10, n_probe=4).collect()}
    assert len(exact & probed) / 10 >= 0.5
    # full probe == exact
    full = {r["vec_id"] for r in idx.search(list(q), k=10, n_probe=8).collect()}
    assert full == exact


def test_cosine_pairs_exact_finds_duplicate(spark, embs):
    # duplicate a vector under a new id → must appear as a ~1.0 pair
    dup = embs.filter(F.col("vec_id") == 3).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label"
    )
    pairs = sim.cosine_pairs_exact(embs.unionByName(dup), threshold=0.999)
    hits = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (3, 100003) in hits


# --- multimodal -----------------------------------------------------------

@pytest.fixture(scope="module")
def images(spark):
    rows = [
        (1, mm.make_fake_image(16, 8, seed=1)),
        (2, mm.make_fake_image(32, 32, seed=2)),
        (3, b"not an image"),
        (4, None),
    ]
    return spark.createDataFrame(rows, "img_id long, content binary")


def test_image_metadata(spark, images):
    out = {r["img_id"]: r["image_meta"] for r in mm.image_metadata(images).collect()}
    assert out[1]["width"] == 16 and out[1]["height"] == 8 and out[1]["valid"]
    assert out[2]["n_bytes"] == 12 + 32 * 32
    assert not out[3]["valid"]
    assert not out[4]["valid"]


def test_image_features_normalized(spark, images):
    out = {r["img_id"]: r["features"] for r in mm.image_features(images).collect()}
    assert out[3] is None
    hist = out[2]
    assert len(hist) == 16
    assert abs(sum(hist) - 1.0) < 1e-9


def test_image_resize(spark, images):
    out = mm.image_resize(images, 8, 8)
    resized = {r["img_id"]: r["resized"] for r in out.collect()}
    meta = mm._decode_fake_image(resized[2])
    assert meta is not None and meta[0] == 8 and meta[1] == 8
    assert resized[3] is None


def test_audio_frame_sample(spark):
    rows = [(1, mm.make_fake_audio(1000, 500, seed=1))]
    df = spark.createDataFrame(rows, "audio_id long, content binary")
    frames = mm.audio_frame_sample(df, frame_ms=100).collect()
    assert len(frames) == 5  # 500 samples / 100-sample hop
    assert all(f["rms"] > 0 for f in frames)
    assert frames[0]["audio_id"] == 1


def test_video_frame_sample(spark):
    rows = [
        (1, mm.make_fake_video(4, 4, fps=10, n_frames=7, seed=5)),
        (2, b"garbage"),  # undecodable rows drop, not fail
    ]
    df = spark.createDataFrame(rows, "video_id long, content binary")
    frames = mm.video_frame_sample(df, every_nth=2).collect()
    assert [f["frame_idx"] for f in frames] == [0, 2, 4, 6]
    assert [f["t_ms"] for f in frames] == [0, 200, 400, 600]
    # constant-luma fake frames: frame i is exactly (seed + 7*i) % 256
    assert [f["mean_luma"] for f in frames] == [5.0, 19.0, 33.0, 47.0]
    assert all(f["video_id"] == 1 for f in frames)
    with pytest.raises(ValueError):
        mm.video_frame_sample(df, every_nth=0)


def test_real_codec_gated(spark, images):
    with pytest.raises(Exception):
        mm.image_metadata(images, codec="real").collect()


def test_ivf_save_load_partition_pruned(spark, tmp_path):
    """Persisted IVF: probe reads only the probed cells' partitions."""
    from bulker_spark.functions.similarity import IvfIndex
    from bulker_spark.plans import audit

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    idx = IvfIndex(n_cells=8)
    idx.build(emb)
    path = str(tmp_path / "ivf")
    idx.save(path)

    loaded = IvfIndex.load(spark, path)
    assert len(loaded.centroids) == 8
    q = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    res = loaded.search(q, k=5, n_probe=2)
    rows = res.collect()
    assert rows[0]["vec_id"] == 0  # exact match still ranks first
    # the probe plan must prune partitions: scan carries a cell IN filter
    txt = audit.explain_str(loaded.indexed.filter("cell IN (0, 1)"), "formatted")
    assert "PartitionFilters" in txt and "cell" in txt


def test_bpe_token_count_cases(spark):
    from bulker_spark.functions.text import bpe_token_count

    df = spark.createDataFrame(
        [("hello world",), ("don't stop!",), ("a1b2",), ("...",)], ["text"]
    )
    got = [r[0] for r in df.select(bpe_token_count("text")).collect()]
    # hello|world=2; don|'|t|stop|!=5; a|1|b|2=4; .|.|.=3
    assert got == [2, 5, 4, 3]


def test_pii_counts_and_redact(spark):
    df = spark.createDataFrame(
        [
            ("contact bob.smith+x@example.co.uk or 10.0.255.3 now",),
            ("call +1 555-123-4567 today",),
            ("nothing sensitive here",),
        ],
        ["text"],
    )
    counts = [
        r[0].asDict() for r in df.select(tx.pii_counts("text")).collect()
    ]
    assert counts[0] == {"email": 1, "ipv4": 1, "phone": 0}
    assert counts[1] == {"email": 0, "ipv4": 0, "phone": 1}
    assert counts[2] == {"email": 0, "ipv4": 0, "phone": 0}

    red = [r[0] for r in df.select(tx.pii_redact("text")).collect()]
    assert red[0] == "contact [PII] or [PII] now"
    assert red[1] == "call [PII] today"
    assert red[2] == "nothing sensitive here"


def test_repetition_signals_hand_checked(spark):
    from bulker_spark.plans.analytics import doc_repetition_signals

    import tempfile, os
    d = tempfile.mkdtemp()
    spark.createDataFrame(
        [(1, "a b a b c"), (2, "x x x x")], ["doc_id", "text"]
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = {
        r["doc_id"]: r.asDict()
        for r in doc_repetition_signals(spark, d).collect()
    }
    # doc 1: 5 words, 3 distinct, top word 'a'or'b' x2; bigrams
    # [a b, b a, a b, b c] -> 4 total, 3 distinct
    assert out[1]["n_words"] == 5 and out[1]["n_distinct_words"] == 3
    assert out[1]["top_word_frac"] == pytest.approx(2 / 5)
    assert out[1]["dup_bigram_frac"] == pytest.approx(1 - 3 / 4)
    # doc 2: pathological repetition
    assert out[2]["top_word_frac"] == 1.0
    assert out[2]["dup_bigram_frac"] == pytest.approx(1 - 1 / 3)


def test_connected_components_basic(spark):
    from bulker_spark.functions.graph import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (9, 9)], ["id_a", "id_b"]
    )
    cc = {r["node"]: r["component"]
          for r in connected_components(edges).collect()}
    assert cc == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 9: 9}


def test_connected_components_chain_converges(spark):
    """A long chain needs multiple propagation rounds (diameter > 1)."""
    from bulker_spark.functions.graph import connected_components

    n = 12
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], ["id_a", "id_b"]
    )
    cc = connected_components(edges)
    comps = {r["component"] for r in cc.collect()}
    assert comps == {0}  # one component, labeled by its min node
    assert cc.count() == n + 1


def test_connected_components_log_rounds_pointer_doubling(spark):
    """A diameter-30 chain must converge inside the auto cap
    (log2(31)+3 = 8 rounds) — only pointer doubling makes that true;
    plain one-hop propagation would need 30 rounds and previously either
    silently split the component or blew past any log-shaped budget."""
    import warnings as w

    from bulker_spark.functions.graph import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], ["id_a", "id_b"]
    )
    with w.catch_warnings():
        w.simplefilter("error", RuntimeWarning)  # any warning = fail
        # driver_threshold=0 forces the DISTRIBUTED loop — the small-graph
        # union-find path would trivially pass without exercising doubling
        cc = connected_components(edges, driver_threshold=0)
        comps = {r["component"] for r in cc.collect()}
    assert comps == {0}


def test_connected_components_warns_loudly_when_capped(spark):
    """Hitting the iteration cap without convergence must WARN, never
    return split components as if they were whole."""
    import pytest as _pytest

    from bulker_spark.functions.graph import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], ["id_a", "id_b"]
    )
    with _pytest.warns(RuntimeWarning, match="did not converge"):
        connected_components(
            edges, max_iterations=1, driver_threshold=0
        ).collect()


def test_connected_components_driver_vs_distributed_identical(spark):
    """The size-aware dispatch must be invisible: driver union-find and
    the distributed doubling loop return the same exact labeling."""
    import random

    from bulker_spark.functions.graph import connected_components

    rng = random.Random(7)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(60)]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    small = {(r["node"], r["component"])
             for r in connected_components(df).collect()}
    big = {(r["node"], r["component"])
           for r in connected_components(df, driver_threshold=0).collect()}
    assert small == big
