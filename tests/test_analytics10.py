"""DSIR importance weights (plans/analytics10.py): estimator semantics
+ plan shape. The value-exactness gate is the DuckDB oracle
(`DOC_DSIR_SQL`, run by scripts/check_oracle.py and the driver)."""

import pytest

from bulker_spark.plans.analytics10 import doc_dsir_weights

SF = "/root/testdata/sf0.001"


def _docs_dir(spark, tmp_path, texts):
    """Write a synthetic documents.parquet corpus; returns its sf_dir."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["t"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    d = str(tmp_path / "sf")
    spark.createDataFrame(pdf).write.parquet(f"{d}/documents.parquet")
    return d


@pytest.fixture(scope="module")
def weights(spark):
    return doc_dsir_weights(spark, SF).cache()


def test_covers_every_document(spark, weights):
    import os

    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    assert weights.count() == docs.count()
    assert weights.filter("dsir_weight IS NULL").count() == 0


def test_target_documents_score_higher(spark, weights):
    """The whole point of the estimator: documents FROM the target
    distribution (lang='en') must average a higher importance weight
    than the rest of the corpus."""
    import os

    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    joined = weights.join(docs.select("doc_id", "lang"), "doc_id")
    avg = dict(
        joined.groupBy(F.col("lang") == "en")
        .agg(F.avg("dsir_weight"))
        .collect()
    )
    assert avg[True] > avg[False]
    # and the gap is material, not float noise (the synthetic corpus
    # shares most vocabulary across langs, so the separation is modest)
    assert avg[True] - avg[False] > 0.02


def test_weights_are_log_ratios_centered_near_zero(weights):
    """Raw-corpus expectation of the ratio is ~1 ⇒ log weights straddle
    zero; a one-sided distribution means the smoothing or totals are
    wrong."""
    rows = weights.select("dsir_weight").collect()
    vals = [r[0] for r in rows]
    assert min(vals) < 0 < max(vals)


def test_plan_shape(spark, weights):
    """The scalar totals must BROADCAST (never shuffle a 1-row frame
    against the per-doc counts) and bigrams are generated in-row (no
    join or extra exchange building features)."""
    plan = weights._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


class TestIvfProbeAutotune:
    @pytest.fixture(scope="class")
    def curve(self, spark):
        from bulker_spark.plans.analytics10 import emb_ivf_probe_autotune

        rows = emb_ivf_probe_autotune(spark, SF).orderBy("nprobe").collect()
        return [r.asDict() for r in rows]

    def test_recall_and_cost_monotone(self, curve):
        """More probes can only ADD candidate cells: recall and scan
        fraction are non-decreasing in nprobe."""
        recalls = [r["recall_bp"] for r in curve]
        costs = [r["cand_bp"] for r in curve]
        assert recalls == sorted(recalls)
        assert costs == sorted(costs)
        assert all(0 <= r <= 10000 for r in recalls)
        assert all(0 <= c <= 10000 for c in costs)

    def test_exactly_one_chosen(self, curve):
        chosen = [r for r in curve if r["chosen"]]
        assert len(chosen) == 1
        target_met = [r for r in curve if r["recall_bp"] >= 9500]
        if target_met:
            assert chosen[0]["nprobe"] == target_met[0]["nprobe"]
        else:
            assert chosen[0]["nprobe"] == max(r["nprobe"] for r in curve)

    def test_full_probe_count_is_full_recall(self, spark):
        """Probing EVERY cell must recover the exhaustive answer —
        recall 10000 bp by construction (sanity of the recall math)."""
        import bulker_spark.plans.analytics10 as a10
        from bulker_spark.plans.analytics7 import _PQ_K

        old = a10._IVF_SWEEP
        a10._IVF_SWEEP = (_PQ_K,)
        try:
            row = a10.emb_ivf_probe_autotune(spark, SF).collect()[0]
            assert row["recall_bp"] == 10000
            assert row["cand_bp"] == 10000
        finally:
            a10._IVF_SWEEP = old


class TestBlockDedupRebuild:
    """Pure-Python replication of the whole operator at sf0.001: an
    independent second oracle next to the DuckDB SQL pairing."""

    @pytest.fixture(scope="class")
    def rebuilt(self, spark):
        from bulker_spark.plans.analytics10 import doc_block_dedup_rebuild

        got = {
            r["doc_id"]: r
            for r in doc_block_dedup_rebuild(spark, SF).collect()
        }
        docs = {
            r["doc_id"]: r["text"]
            for r in spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text")
            .collect()
        }
        return got, docs

    @staticmethod
    def _blocks(text):
        toks = text.split(" ")
        n = -(-len(toks) // 3)
        return [" ".join(toks[i * 3 : i * 3 + 3]) for i in range(n)]

    def test_matches_python_replication(self, rebuilt):
        got, docs = rebuilt
        seen = {}
        for doc_id in sorted(docs):
            for pos, b in enumerate(self._blocks(docs[doc_id])):
                seen.setdefault(b, (doc_id, pos))
        for doc_id in sorted(docs):
            blocks = self._blocks(docs[doc_id])
            kept = [
                b
                for pos, b in enumerate(blocks)
                if seen[b] == (doc_id, pos)
            ]
            r = got[doc_id]
            assert r["clean_text"] == " ".join(kept), doc_id
            assert r["n_blocks"] == len(blocks)
            assert r["n_removed"] == len(blocks) - len(kept)

    def test_removal_happens_and_first_doc_keeps_intra_doc_uniques(
        self, rebuilt
    ):
        got, docs = rebuilt
        assert sum(r["n_removed"] for r in got.values()) > 0
        # the minimal doc_id can only lose INTRA-document repeats — no
        # earlier document exists to claim its blocks
        first = min(docs)
        blocks = self._blocks(docs[first])
        intra_repeats = len(blocks) - len(dict.fromkeys(blocks))
        assert got[first]["n_removed"] == intra_repeats


class TestCurriculumOrder:
    @pytest.fixture(scope="class")
    def order(self, spark):
        from bulker_spark.plans.analytics10 import doc_curriculum_order

        return doc_curriculum_order(spark, SF).cache()

    def test_contiguous_permutation(self, spark, order):
        rows = order.collect()
        n = spark.read.parquet(f"{SF}/documents.parquet").count()
        idx = sorted(r["train_order"] for r in rows)
        assert idx == list(range(n))

    def test_best_first(self, order):
        rows = sorted(order.collect(), key=lambda r: r["train_order"])
        scores = [r["q_score"] for r in rows]
        assert scores == sorted(scores, reverse=True)
        # tie-break: within equal scores, ascending doc_id
        for a, b in zip(rows, rows[1:]):
            if a["q_score"] == b["q_score"]:
                assert a["doc_id"] < b["doc_id"]

    def test_no_single_partition_sort(self, order):
        """The scalability claim: the plan must not funnel the corpus
        through an Exchange SinglePartition (what the naive global
        row_number would do)."""
        plan = order._jdf.queryExecution().executedPlan().toString()
        assert "SinglePartition" not in plan, plan


class TestRebuildEdgeCases:
    """doc_block_dedup_rebuild on crafted corpora — empty text, single
    token, fully-duplicated documents, and intra-doc repetition."""

    def _run(self, spark, tmp_path, texts):
        from bulker_spark.plans.analytics10 import doc_block_dedup_rebuild

        d = _docs_dir(spark, tmp_path, texts)
        return {
            r["doc_id"]: r
            for r in doc_block_dedup_rebuild(spark, d).collect()
        }

    def test_fully_duplicated_doc_empties(self, spark, tmp_path):
        texts = ["a b c d e f", "a b c d e f", "x y z a b c"]
        got = self._run(spark, tmp_path, texts)
        # doc 0 keeps everything; doc 1 is a verbatim copy -> empty
        assert got[0]["clean_text"] == "a b c d e f"
        assert got[0]["n_removed"] == 0
        assert got[1]["clean_text"] == ""
        assert got[1]["n_removed"] == 2
        # doc 2: "x y z" is novel, "a b c" already claimed by doc 0
        assert got[2]["clean_text"] == "x y z"
        assert got[2]["n_removed"] == 1

    def test_intra_doc_repeat_and_short_docs(self, spark, tmp_path):
        texts = ["p q r p q r", "tok", ""]
        got = self._run(spark, tmp_path, texts)
        assert got[0]["clean_text"] == "p q r"
        assert got[0]["n_removed"] == 1
        # single token = one partial block, kept
        assert got[1]["clean_text"] == "tok"
        assert got[1]["n_blocks"] == 1 and got[1]["n_removed"] == 0
        # empty text splits to [''] -> one empty block, its own winner
        assert got[2]["n_blocks"] == 1 and got[2]["n_removed"] == 0

    def test_partial_tail_block_not_merged_with_full(self, spark, tmp_path):
        # "g h" as a TAIL partial block must not collide with the "g h"
        # inside a full 3-token block elsewhere
        texts = ["a b c g h", "g h i a b c"]
        got = self._run(spark, tmp_path, texts)
        assert got[0]["clean_text"] == "a b c g h"
        assert got[1]["clean_text"] == "g h i"
        assert got[1]["n_removed"] == 1


class TestLshBandAutotune:
    @pytest.fixture(scope="class")
    def curve(self, spark):
        from bulker_spark.plans.analytics10 import doc_lsh_band_autotune

        return sorted(
            doc_lsh_band_autotune(spark, SF).collect(),
            key=lambda r: r["rows_per_band"],
        )

    def test_monotone_tradeoff(self, curve):
        # fewer rows per band -> more collisions: candidates and recall
        # both non-increasing as rows_per_band grows
        cands = [r["n_candidates"] for r in curve]
        recalls = [r["recall_bp"] for r in curve]
        assert cands == sorted(cands, reverse=True)
        assert recalls == sorted(recalls, reverse=True)
        # the most permissive config dominates or ties every other
        assert recalls[0] == max(recalls)
        assert cands[0] == max(cands)

    def test_exactly_one_chosen(self, curve):
        assert sum(1 for r in curve if r["chosen"]) == 1

    def test_chosen_is_cheapest_qualifier(self, curve):
        qual = [r for r in curve if r["recall_bp"] >= 9000]
        pick = [r for r in curve if r["chosen"]][0]
        if qual:
            assert pick["n_candidates"] == min(
                r["n_candidates"] for r in qual
            )
        else:
            assert pick["rows_per_band"] == 1


class TestCurriculumEdgeCases:
    def _run(self, spark, tmp_path, texts):
        from bulker_spark.plans.analytics10 import doc_curriculum_order

        d = _docs_dir(spark, tmp_path, texts)
        return sorted(
            doc_curriculum_order(spark, d).collect(),
            key=lambda r: r["train_order"],
        )

    def test_fewer_docs_than_partitions(self, spark, tmp_path):
        # shuffle.partitions=4 in tests but 3 docs: empty range
        # partitions must not corrupt the offset map
        rows = self._run(spark, tmp_path, ["aaa bbb", "c", "dd ee ff gg"])
        assert [r["train_order"] for r in rows] == [0, 1, 2]
        scores = [r["q_score"] for r in rows]
        assert scores == sorted(scores, reverse=True)

    def test_all_tied_scores_order_by_doc_id(self, spark, tmp_path):
        rows = self._run(spark, tmp_path, ["xy", "ab", "cd", "ef"])
        assert [r["doc_id"] for r in rows] == [0, 1, 2, 3]

    def test_single_doc(self, spark, tmp_path):
        rows = self._run(spark, tmp_path, ["only doc"])
        assert len(rows) == 1 and rows[0]["train_order"] == 0


class TestSpanDedup:
    """Python replication + crafted cases for stride-1 span removal."""

    @staticmethod
    def _replicate(docs, k=5):
        seen = {}
        for doc_id in sorted(docs):
            toks = docs[doc_id].split(" ")
            for pos in range(max(len(toks) - k + 1, 0)):
                seen.setdefault(" ".join(toks[pos : pos + k]), (doc_id, pos))
        out = {}
        for doc_id in sorted(docs):
            toks = docs[doc_id].split(" ")
            covered = set()
            for pos in range(max(len(toks) - k + 1, 0)):
                if seen[" ".join(toks[pos : pos + k])] != (doc_id, pos):
                    covered.update(range(pos, pos + k))
            kept = [t for i, t in enumerate(toks) if i not in covered]
            out[doc_id] = (" ".join(kept), len(toks), len(covered))
        return out

    def test_matches_python_replication_on_corpus(self, spark):
        from bulker_spark.plans.analytics10 import doc_span_dedup

        docs = {
            r["doc_id"]: r["text"]
            for r in spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text")
            .collect()
        }
        expected = self._replicate(docs)
        got = {
            r["doc_id"]: (
                r["clean_text"],
                r["n_tokens"],
                r["n_removed_tokens"],
            )
            for r in doc_span_dedup(spark, SF).collect()
        }
        assert got == expected
        assert sum(v[2] for v in got.values()) > 0  # removal happened

    def _run(self, spark, tmp_path, texts):
        from bulker_spark.plans.analytics10 import doc_span_dedup

        d = _docs_dir(spark, tmp_path, texts)
        return {
            r["doc_id"]: r for r in doc_span_dedup(spark, d).collect()
        }

    def test_unaligned_duplicate_span_caught(self, spark, tmp_path):
        # the duplicated passage starts at offset 2 in doc 1 — a
        # block-aligned dedup at width 3 would miss this alignment
        span = "q w e r t y u"
        got = self._run(
            spark, tmp_path, [f"{span} end", f"x z {span} tail"]
        )
        assert got[0]["n_removed_tokens"] == 0
        # windows covering the span in doc 1 are all losers; 'x z' and
        # 'tail' survive only where no duplicated window covers them
        assert got[1]["n_removed_tokens"] >= len(span.split())
        assert "q w e" not in got[1]["clean_text"]

    def test_short_docs_have_no_windows(self, spark, tmp_path):
        got = self._run(spark, tmp_path, ["a b c d", "a b c d"])
        # 4 tokens < k=5: no windows exist, nothing can be removed even
        # though the docs are identical (document-level dedup's job)
        assert got[0]["n_removed_tokens"] == 0
        assert got[1]["n_removed_tokens"] == 0


class TestTokenBudgetMix:
    @pytest.fixture(scope="class")
    def mix(self, spark):
        from bulker_spark.plans.analytics10 import doc_token_budget_mix

        return [r.asDict() for r in doc_token_budget_mix(spark, SF).collect()]

    def test_budgets_partition_the_total(self, mix):
        from bulker_spark.plans.analytics10 import _MIX_BUDGET_TOKENS

        total_budget = sum(r["budget_tokens"] for r in mix)
        # integer div leaves at most |sources|-1 tokens unallocated
        assert (
            _MIX_BUDGET_TOKENS - len(mix) < total_budget <= _MIX_BUDGET_TOKENS
        )

    def test_selection_respects_budgets(self, mix):
        for r in mix:
            assert r["tokens_selected"] <= r["budget_tokens"]
            assert 0 <= r["utilization_bp"] <= 10000
            if r["n_docs_selected"] == 0:
                assert r["tokens_selected"] == 0

    def test_greedy_fill_is_maximal_prefix(self, spark, mix):
        """The selection takes the LONGEST hash-ordered prefix fitting
        the budget: the next document in order must overflow it."""
        from pyspark.sql import functions as F

        from bulker_spark.plans._common import _SPARK_H

        d = spark.read.parquet(f"{SF}/documents.parquet").select(
            "doc_id",
            "source",
            (
                F.length("text")
                - F.length(F.regexp_replace("text", " ", ""))
                + 1
            ).cast("long").alias("n"),
            F.expr(_SPARK_H.format(col="cast(doc_id as string)")).alias("h"),
        )
        rows = sorted(
            d.collect(), key=lambda r: (r["source"], r["h"], r["doc_id"])
        )
        by_src = {}
        for r in rows:
            by_src.setdefault(r["source"], []).append(r["n"])
        for m in mix:
            seq = by_src[m["source"]]
            k, cum = 0, 0
            while k < len(seq) and cum + seq[k] <= m["budget_tokens"]:
                cum += seq[k]
                k += 1
            assert m["n_docs_selected"] == k
            assert m["tokens_selected"] == cum

    def test_two_phase_routing_identity(self, spark):
        """r08: the per-source cumulative sum routes through
        running_sum_over_buckets (h>>23 range buckets). Both routings
        must be value-identical — the sums are BIGINT, so the two-phase
        reassociation is exact."""
        from bulker_spark.plans.analytics10 import doc_token_budget_mix

        prev = spark.conf.get("spark.bulker.hotkey.mode", None)
        out = {}
        try:
            for mode in ("never", "always"):
                spark.conf.set("spark.bulker.hotkey.mode", mode)
                out[mode] = sorted(
                    tuple(r) for r in doc_token_budget_mix(spark, SF).collect()
                )
        finally:
            if prev is None:
                spark.conf.unset("spark.bulker.hotkey.mode")
            else:
                spark.conf.set("spark.bulker.hotkey.mode", prev)
        assert out["never"] == out["always"]


class TestRebuildScaleShapes:
    """Both routing shapes of the corpus-rebuild join (span + block
    forms): the broadcast shape while the slim int-list side fits the
    threshold, the doc_id-bucketed sort-merge shape past it. The scale
    invariant — NO shuffle exchange output ever carries a text/token
    column — is asserted structurally on the executed plan, and the two
    shapes must be value-identical."""

    _TEXTY = {"t", "text", "clean_text"}

    @staticmethod
    def _shaped(spark, mode, fn):
        from bulker_spark.plans.analytics10 import _REBUILD_JOIN_CONF

        prev = {
            k: spark.conf.get(k, None)
            for k in (
                _REBUILD_JOIN_CONF,
                "spark.sql.autoBroadcastJoinThreshold",
                "spark.sql.adaptive.autoBroadcastJoinThreshold",
            )
        }
        try:
            spark.conf.set(_REBUILD_JOIN_CONF, mode)
            if mode == "bucketed":
                # keep AQE from converting the SMJ back to broadcast —
                # at real scale the slim side would not fit anyway
                spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
                spark.conf.set(
                    "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"
                )
            df = fn(spark, SF)
            rows = sorted(map(tuple, df.collect()))
            return df, rows
        finally:
            for k, v in prev.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)

    @pytest.fixture(scope="class", params=["span", "block"])
    def shapes(self, request, spark):
        from bulker_spark.plans.analytics10 import (
            doc_block_dedup_rebuild,
            doc_span_dedup,
        )

        fn = (
            doc_span_dedup
            if request.param == "span"
            else doc_block_dedup_rebuild
        )
        small = self._shaped(spark, "broadcast", fn)
        large = self._shaped(spark, "bucketed", fn)
        return small, large

    def test_small_shape_is_broadcast(self, shapes):
        from bulker_spark.plans.audit import explain_str

        (df, _), _ = shapes
        plan = explain_str(df, "simple")
        assert "BroadcastHashJoin" in plan, plan
        assert "SortMergeJoin" not in plan, plan

    def test_large_shape_is_bucketed_sort_merge(self, shapes):
        from bulker_spark.plans.audit import explain_str

        _, (df, _) = shapes
        plan = explain_str(df, "simple")
        assert "SortMergeJoin" in plan, plan
        assert "BroadcastHashJoin" not in plan, plan
        # the text side must be the bucketed catalog scan, not the
        # plain parquet path (Bucketed: true appears in formatted scans)
        assert "bulker_corpus_bkt_" in explain_str(df, "formatted")

    def test_text_never_crosses_an_exchange(self, shapes):
        from bulker_spark.plans.audit import exchange_output_columns

        for df, _rows in shapes:
            for cols in exchange_output_columns(df):
                assert not (set(cols) & self._TEXTY), cols

    def test_shapes_value_identical(self, shapes):
        (_, small_rows), (_, large_rows) = shapes
        assert small_rows == large_rows and small_rows

    def test_auto_routing_thresholds(self, spark):
        """auto picks broadcast under the default threshold at test
        scale, bucketed when broadcast joins are disabled outright."""
        from bulker_spark.plans.analytics10 import _rebuild_join_mode

        assert _rebuild_join_mode(spark, SF) == "broadcast"
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            assert _rebuild_join_mode(spark, SF) == "bucketed"
            # a 1-byte threshold routes the estimated slim side out too
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1b")
            assert _rebuild_join_mode(spark, SF) == "bucketed"
        finally:
            if prev is None:
                spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
            else:
                spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    def test_size_parser(self):
        from bulker_spark.plans.analytics10 import _parse_size_bytes

        assert _parse_size_bytes("10485760b") == 10 * 1024 * 1024
        assert _parse_size_bytes("10MB") == 10 * 1024 * 1024
        assert _parse_size_bytes("1g") == 1024**3
        assert _parse_size_bytes("-1") == -1
        assert _parse_size_bytes("512k") == 512 * 1024
        assert _parse_size_bytes("bogus") == 10 * 1024 * 1024


class TestStaleCorpusSweep:
    """Persistent-metastore hygiene (advice r7): stale bulker_corpus_bkt_*
    catalog entries pointing at deleted locations are dropped at the next
    creation; entries whose data still exists are left alone."""

    def test_sweep_drops_dangling_keeps_live(self, spark, tmp_path):
        from bulker_spark.plans.analytics10 import _sweep_stale_corpus_tables

        # locations must carry the engine's own naming pattern — the
        # sweep refuses to drop anything else (review r8)
        live_loc = tmp_path / "bulker_spark_corpus_bkt_live"
        gone_loc = tmp_path / "bulker_spark_corpus_bkt_gone"
        df = spark.range(3).withColumnRenamed("id", "doc_id")
        for nm, loc in [
            ("bulker_corpus_bkt_testlive_app", live_loc),
            ("bulker_corpus_bkt_testgone_app", gone_loc),
        ]:
            (
                df.write.mode("overwrite")
                .option("path", str(loc))
                .saveAsTable(nm)
            )
        import shutil

        shutil.rmtree(gone_loc)
        try:
            _sweep_stale_corpus_tables(spark, keep="bulker_corpus_bkt_other")
            assert not spark.catalog.tableExists("bulker_corpus_bkt_testgone_app")
            assert spark.catalog.tableExists("bulker_corpus_bkt_testlive_app")
        finally:
            for nm in (
                "bulker_corpus_bkt_testlive_app",
                "bulker_corpus_bkt_testgone_app",
            ):
                spark.sql(f"DROP TABLE IF EXISTS {nm}")

    def test_cleanup_at_exit_registers_table_drop(self, spark, tmp_path):
        from bulker_spark.plans import analytics10 as a10

        loc = tmp_path / "corpus"
        nm = "bulker_corpus_bkt_testexit_app"
        (
            spark.range(3)
            .withColumnRenamed("id", "doc_id")
            .write.mode("overwrite")
            .option("path", str(loc))
            .saveAsTable(nm)
        )
        import atexit

        registered = []
        orig = atexit.register
        try:
            atexit.register = lambda fn, *a, **k: registered.append((fn, a, k))
            a10._cleanup_at_exit(str(loc), spark=spark, table=nm)
        finally:
            atexit.register = orig
            a10._CLEANUP_REGISTERED.discard(str(loc))
        assert len(registered) == 1
        fn, args, kwargs = registered[0]
        fn(*args, **kwargs)  # run the exit hook now
        assert not spark.catalog.tableExists(nm)
        assert not loc.exists()
