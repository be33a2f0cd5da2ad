"""Incremental MinHash-LSH dedup index: corpus-probe correctness,
equivalence with the in-memory LSH pass, and index lifecycle."""

import pytest

from bulker_spark.functions.text import (
    minhash_lsh_candidates,
    minhash_signatures,
    shingles,
)
from bulker_spark.operators.dedup_index import MinHashDedupIndex
from bulker_spark.sinks.warehouse import Warehouse


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BASE = "the quick brown fox jumps over the lazy dog again and again " * 4
ALT = "completely different content about spark catalyst optimizers " * 4


@pytest.fixture()
def corpus(spark):
    # 0/1: near-identical pair family; 2: distinct; 3: another family
    return _docs(
        spark,
        [
            (0, BASE),
            (1, BASE + " tail"),
            (2, ALT),
            (3, "numbers one two three four five six seven eight nine " * 4),
        ],
    )


def test_index_probe_matches_full_lsh(spark, tmp_path, corpus):
    """Index probe ≡ in-memory LSH: cross pairs (batch × corpus) from the
    persisted index must equal the cross pairs of one LSH run over the
    union — same shingling, signatures, and banding."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    idx = MinHashDedupIndex(wh)
    idx.rebuild(corpus)

    batch = _docs(
        spark,
        [
            (100, BASE + " slightly edited tail"),
            (101, "totally novel text about warehouses and manifests " * 4),
            (102, ALT),
        ],
    )
    got = {
        (r.batch_id, r.corpus_id)
        for r in idx.match_batch(batch, min_agreement=0.0).collect()
    }

    union = corpus.unionByName(batch)
    sigs = minhash_signatures(
        shingles(union, width=idx.shingle_width), id_col="doc_id"
    )
    full = minhash_lsh_candidates(sigs, id_col="doc_id")
    want = {
        (b, a)
        for r in full.collect()
        for a, b in [(r.id_a, r.id_b)]
        if a < 100 <= b  # cross pairs only, batch side first
    }
    assert got == want
    assert (100, 0) in got and (102, 2) in got  # near-dup + exact dup
    assert all(b != 101 for b, _ in got)  # novel doc pairs with nothing


def test_dedup_batch_splits_and_extends(spark, tmp_path, corpus):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    idx = MinHashDedupIndex(wh)
    idx.rebuild(corpus)

    batch = _docs(
        spark,
        [
            (100, BASE),  # exact dup of corpus doc 0
            (101, "fresh unseen prose about incremental indexes " * 5),
        ],
    )
    novel, dups = idx.dedup_batch(batch, min_agreement=0.9)
    assert {r.doc_id for r in dups.collect()} == {100}
    assert {r.doc_id for r in novel.collect()} == {101}

    # the survivor was indexed: a re-send of the same novel text is now a dup
    again = _docs(spark, [(200, "fresh unseen prose about incremental indexes " * 5)])
    novel2, dups2 = idx.dedup_batch(again, min_agreement=0.9)
    assert {r.doc_id for r in dups2.collect()} == {200}
    assert novel2.count() == 0

    # lazy-evaluation pin: the earlier frames still read correctly AFTER
    # the index grew (an unpinned recompute would self-match doc 101)
    assert {r.doc_id for r in novel.collect()} == {101}
    assert {r.doc_id for r in dups.collect()} == {100}


def test_agreement_threshold_filters_weak_matches(spark, tmp_path, corpus):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    idx = MinHashDedupIndex(wh)
    idx.rebuild(corpus)
    # a short appended tail: high enough Jaccard that banding always
    # fires (agreement ≈ 0.87 against docs 0/1, deterministic — minhash
    # has no randomness at fixed text), but below a strict threshold
    batch = _docs(spark, [(100, BASE + " extra tail")])
    loose = idx.match_batch(batch, min_agreement=0.0).collect()
    strict = idx.match_batch(batch, min_agreement=0.99).collect()
    assert {r.corpus_id for r in loose} >= {0, 1}
    assert all(0.0 <= r.agreement <= 1.0 for r in loose)
    assert len(strict) < len(loose)


def test_probe_reads_no_corpus_text(spark, tmp_path, corpus):
    """The probe must touch only the index tables — corpus text is gone
    (dropped) and matching still works."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    idx = MinHashDedupIndex(wh)
    idx.rebuild(corpus)
    del corpus  # nothing retains the corpus frame
    batch = _docs(spark, [(100, BASE)])
    got = idx.match_batch(batch, min_agreement=0.9).collect()
    assert {r.corpus_id for r in got} >= {0}


def test_null_text_docs_excluded_not_poisoning(spark, tmp_path):
    """NULL-text docs must be excluded from the index and from probes —
    an all-NULL signature would collapse every null doc into one shared
    LSH bucket (quadratic candidates) while NULL agreement arithmetic
    silently drops the pairs."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    idx = MinHashDedupIndex(wh)
    corpus = _docs(spark, [(0, BASE), (1, None), (2, None)])
    idx.rebuild(corpus)
    assert {
        r.id for r in wh.read(idx.sigs_table).select("id").collect()
    } == {0}
    batch = _docs(spark, [(100, None), (101, BASE)])
    got = idx.match_batch(batch, min_agreement=0.9).collect()
    assert {(r.batch_id, r.corpus_id) for r in got} == {(101, 0)}
    novel, dups = idx.dedup_batch(batch, min_agreement=0.9)
    # the null-text doc is not matchable, so it passes through as novel
    assert {r.doc_id for r in novel.collect()} == {100}
    assert {r.doc_id for r in dups.collect()} == {101}


def test_add_retry_is_idempotent(spark, tmp_path, corpus):
    """Retrying add() with the same docs (the crash-recovery path) must
    not multiply match results: band duplicates collapse in the candidate
    distinct and the signature read dedupes by id."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    idx = MinHashDedupIndex(wh)
    idx.rebuild(corpus)
    extra = _docs(spark, [(50, "some new corpus material " * 6)])
    idx.add(extra)
    idx.add(extra)  # retry after a presumed lost commit
    batch = _docs(spark, [(100, "some new corpus material " * 6)])
    got = idx.match_batch(batch, min_agreement=0.9).collect()
    assert [(r.batch_id, r.corpus_id) for r in got] == [(100, 50)]


def test_constructor_validates_hash_budget(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    with pytest.raises(ValueError):
        MinHashDedupIndex(wh, n_hashes=32)
    with pytest.raises(ValueError):
        MinHashDedupIndex(wh, n_hashes=15, band_size=4)


def test_probe_before_bootstrap_treats_all_as_novel(spark, tmp_path):
    """A never-bootstrapped index: probes return no matches (instead of
    FileNotFoundError) and dedup_batch passes the whole batch through as
    novel while creating the index tables for the next cycle."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    idx = MinHashDedupIndex(wh)
    batch = _docs(spark, [(1, BASE), (2, ALT)])
    assert idx.match_batch(batch, min_agreement=0.0).count() == 0
    novel, dups = idx.dedup_batch(batch, min_agreement=0.9)
    assert {r.doc_id for r in novel.collect()} == {1, 2}
    assert dups.count() == 0
    # the survivors were indexed: a re-send is now recognized
    again = _docs(spark, [(10, BASE)])
    got = idx.match_batch(again, min_agreement=0.9).collect()
    assert {(r.batch_id, r.corpus_id) for r in got} == {(10, 1)}


class TestSpanDedupIndex:
    """Incremental span/block dedup vs the full-corpus rerun: batches
    applied in arrival order must reproduce the catalog queries'
    global-first-occurrence output exactly."""

    B1 = [
        (0, "a b c d e f g h i j"),
        (1, "k l m n o p q r s t"),
        (2, "a b c d e f z z2 z3 z4"),  # repeats batch-internal span
    ]
    B2 = [
        (10, "x y a b c d e f w v"),   # span duplicated vs batch 1
        (11, "k l m n o p q r s t"),   # verbatim copy of doc 1
        (12, "u uu uuu uuuu u5 u6 u7 u8 u9 u10"),  # novel
        (13, "x y a b c d e f w v"),   # copy of doc 10 (intra-batch-2)
    ]

    def _full(self, spark, tmp_path, mode):
        """Full-corpus rerun via the catalog query on batch1 ∪ batch2."""
        import pandas as pd

        from bulker_spark.plans.analytics10 import (
            doc_block_dedup_rebuild,
            doc_span_dedup,
        )

        rows = self.B1 + self.B2
        pdf = pd.DataFrame(
            {
                "doc_id": [r[0] for r in rows],
                "text": [r[1] for r in rows],
                "lang": ["en"] * len(rows),
                "source": ["t"] * len(rows),
                "n_chars": [len(r[1]) for r in rows],
            }
        )
        d = str(tmp_path / f"full_{mode}")
        spark.createDataFrame(pdf).write.parquet(f"{d}/documents.parquet")
        fn = doc_span_dedup if mode == "span" else doc_block_dedup_rebuild
        return {r["doc_id"]: tuple(r) for r in fn(spark, d).collect()}

    @pytest.mark.parametrize("mode,k", [("span", 5), ("block", 3)])
    def test_incremental_equals_full_rerun(self, spark, tmp_path, mode, k):
        from bulker_spark.operators.dedup_index import SpanDedupIndex

        wh = Warehouse(spark, str(tmp_path / "wh"))
        idx = SpanDedupIndex(wh, k=k, mode=mode)
        out1 = {
            r["doc_id"]: tuple(r)
            for r in idx.dedup_batch(_docs(spark, self.B1)).collect()
        }
        out2 = {
            r["doc_id"]: tuple(r)
            for r in idx.dedup_batch(_docs(spark, self.B2)).collect()
        }
        full = self._full(spark, tmp_path, mode)
        assert {**out1, **out2} == full
        # the interesting rows actually lost something
        removed_col = 3
        assert out2[11][removed_col] > 0  # verbatim copy emptied
        assert out2[13][removed_col] > 0  # intra-batch-2 copy emptied
        assert out2[12][removed_col] == 0  # novel doc untouched

    def test_batch2_only_probes_index_not_text(self, spark, tmp_path):
        """The probe is an int-only semi-join against the hash table —
        no exchange in the batch-2 plan may carry a text/token column
        from anywhere (the corpus is not even an input)."""
        from bulker_spark.operators.dedup_index import SpanDedupIndex
        from bulker_spark.plans.audit import exchange_output_columns

        wh = Warehouse(spark, str(tmp_path / "wh"))
        idx = SpanDedupIndex(wh, k=5, mode="span")
        idx.rebuild(_docs(spark, self.B1))
        out = idx.dedup_batch(_docs(spark, self.B2), extend_index=False)
        out.collect()
        for cols in exchange_output_columns(out):
            assert not ({"t", "text", "clean_text"} & set(cols)), cols

    def test_rebuild_then_same_batch_is_all_duplicate(self, spark, tmp_path):
        """Re-probing an already-indexed batch removes everything —
        retry idempotence of the arrival-order contract. A COMPLETED
        batch's retry is a probe (extend_index=False): re-EXTENDING is
        indistinguishable from out-of-order extension and raises (next
        test); a crash-retry still extends fine because the max-doc_id
        meta is written only after the hash append lands."""
        from bulker_spark.operators.dedup_index import SpanDedupIndex

        wh = Warehouse(spark, str(tmp_path / "wh"))
        idx = SpanDedupIndex(wh, k=5, mode="span")
        idx.dedup_batch(_docs(spark, self.B1))
        again = idx.dedup_batch(_docs(spark, self.B1), extend_index=False)
        for r in again.collect():
            # every window is indexed now, so every coverable token goes;
            # only tokens not covered by ANY window (none here: docs have
            # ≥ k tokens) would survive
            assert r["clean_text"] == ""

    def test_out_of_order_extension_raises(self, spark, tmp_path):
        """The incremental-equals-full-rerun guarantee only holds for
        ascending doc_id arrival, so extending with a batch at or below
        the indexed max must fail loudly instead of silently flipping
        first-occurrence winners (VERDICT r6 #6)."""
        from bulker_spark.operators.dedup_index import SpanDedupIndex

        wh = Warehouse(spark, str(tmp_path / "wh"))
        idx = SpanDedupIndex(wh, k=5, mode="span")
        idx.dedup_batch(_docs(spark, self.B2))  # ids 10..13 first
        with pytest.raises(ValueError, match="arrival order"):
            idx.dedup_batch(_docs(spark, self.B1))  # ids 0..2: shuffled
        # same-batch re-extension is equally out-of-order
        with pytest.raises(ValueError, match="arrival order"):
            idx.dedup_batch(_docs(spark, self.B2))
        # probe-only retry of the shuffled batch is allowed: index-beats-
        # batch precedence holds for any doc_id
        out = idx.dedup_batch(_docs(spark, self.B1), extend_index=False)
        assert out.count() == len(self.B1)

    def test_mode_validation(self, spark, tmp_path):
        from bulker_spark.operators.dedup_index import SpanDedupIndex

        with pytest.raises(ValueError, match="span|block"):
            SpanDedupIndex(Warehouse(spark, str(tmp_path / "wh")), mode="x")
