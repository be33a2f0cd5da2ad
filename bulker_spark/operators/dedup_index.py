"""Incremental near-dup index: dedup NEW batches against an already-
ingested corpus without rescanning corpus text.

The 100 TB curation loop this serves: a crawl lands in daily batches; each
batch must drop documents that near-duplicate anything already accepted.
Recomputing pairwise LSH over (corpus + batch) per day re-shingles the
whole corpus — O(corpus) text scans daily. This operator persists the
corpus's MinHash *signatures* (``<name>_sigs``) and their LSH band keys
(``<name>_bands``) as warehouse tables; a new batch is shingled once,
its band keys are equi-joined against the band table (shuffle carries
(band_key, id) projections only — never text), and only bucket-matched
candidate pairs are verified by signature agreement. Per-batch cost is
O(batch + matched candidates), independent of corpus text size.

Consistency model: the two index tables are appended without a cross-
table transaction, ordered so every failure mode is benign — bands land
FIRST, so a crash between the appends leaves band rows whose ids have no
signature yet (candidates they generate drop at the verify join) and a
RETRY of the same batch self-heals: re-appended band rows collapse in
the candidate ``distinct``, and the signature read deduplicates by id,
so a double-landed signature can't multiply matches. (Sigs-first would
be the dangerous order: committed signatures with no band rows are
permanently invisible to LSH.)

Reference scope (jitsucom/bulker): the reference has no similarity ops at
all (`SURVEY.md §2`); its only dedup is PK equality
(``bulkerlib/implementations/sql/abstract_transactional.go:439-496``).
This extends the engine's training-data tier with the standard
MinHash-LSH incremental-index shape, sharing ``functions/text.py``'s
``band_keys`` construction with the in-memory ``minhash_lsh_candidates``
(equivalence-tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..session import pin
from ..functions.text import (
    MINHASH_COEFFS_16,
    band_keys,
    minhash_signatures,
    shingles,
)
from ..sinks.warehouse import Warehouse


class MinHashDedupIndex:
    """Persistent MinHash-LSH dedup index over a warehouse.

    ``rebuild`` bootstraps from the current corpus; ``match_batch`` finds
    (batch doc, corpus doc) near-dup pairs; ``dedup_batch`` splits a
    batch into novel survivors vs corpus-duplicates; ``add`` extends the
    index with accepted documents (append-only: O(batch) writes via the
    warehouse's append path, no index rewrite).

    NULL-text documents are excluded from signatures entirely (a NULL
    text shingles to NULL, which would both defeat agreement arithmetic
    and accumulate a quadratic shared LSH bucket); they are never
    matched and never indexed. Empty strings are legitimate exact
    duplicates of each other and stay in."""

    def __init__(
        self,
        warehouse: Warehouse,
        name: str = "minhash_index",
        *,
        n_hashes: int = 16,
        band_size: int = 4,
        shingle_width: int = 8,
        namespace: str | None = None,
    ):
        if not 1 <= n_hashes <= len(MINHASH_COEFFS_16):
            raise ValueError(
                f"n_hashes must be in [1, {len(MINHASH_COEFFS_16)}]"
            )
        if n_hashes % band_size:
            raise ValueError("band_size must divide n_hashes")
        self.wh = warehouse
        self.name = name
        self.n_hashes = n_hashes
        self.band_size = band_size
        self.shingle_width = shingle_width
        self.namespace = namespace

    @property
    def sigs_table(self) -> str:
        return f"{self.name}_sigs"

    @property
    def bands_table(self) -> str:
        return f"{self.name}_bands"

    # -- signature computation (one text scan per batch) -------------------
    def signatures(
        self, docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
    ) -> DataFrame:
        sh = shingles(
            docs.filter(F.col(text_col).isNotNull()).select(
                F.col(id_col).alias("id"), F.col(text_col).alias("text")
            ),
            text_col="text",
            id_col="id",
            width=self.shingle_width,
        )
        return minhash_signatures(sh, id_col="id", n_hashes=self.n_hashes)

    def _bands_of(self, sigs: DataFrame) -> DataFrame:
        return band_keys(
            sigs, id_col="id", n_hashes=self.n_hashes, band_size=self.band_size
        )

    def _indexed_sigs(self) -> DataFrame:
        # dedupe by id: a retried add() may have double-landed a
        # signature; the values are deterministic so any copy is right
        return self.wh.read(self.sigs_table, self.namespace).dropDuplicates(
            ["id"]
        )

    # -- lifecycle ----------------------------------------------------------
    def rebuild(
        self, docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
    ) -> None:
        """Bootstrap (or re-bootstrap) the index from the full corpus —
        the only O(corpus) scan in the lifecycle."""
        sigs = self.signatures(docs, id_col, text_col)
        self.wh.create_or_replace(
            self.sigs_table, sigs, pk=["id"], namespace=self.namespace
        )
        # bands re-derive from the STORED sigs — no second text scan
        stored = self.wh.read(self.sigs_table, self.namespace)
        self.wh.create_or_replace(
            self.bands_table, self._bands_of(stored), namespace=self.namespace
        )

    def add(
        self, docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
    ) -> None:
        """Extend the index with accepted documents — O(batch) appends.
        Retry-idempotent per the module's consistency model (bands land
        first; duplicates are collapsed on read)."""
        sigs = pin(self.signatures(docs, id_col, text_col))
        self._append_index(sigs)

    def _append_index(self, sigs: DataFrame) -> None:
        self.wh.append(
            self.bands_table, self._bands_of(sigs), namespace=self.namespace
        )
        self.wh.append(self.sigs_table, sigs, namespace=self.namespace)

    # -- probing ------------------------------------------------------------
    def match_batch(
        self,
        batch: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
        min_agreement: float = 0.5,
    ) -> DataFrame:
        """(batch_id, corpus_id, agreement) for every batch document whose
        signature agrees with an indexed document on ≥ ``min_agreement``
        of the hash components (the MinHash estimate of Jaccard
        similarity), LSH-restricted to pairs sharing at least one full
        band. Corpus text is never read — only the band/sig tables. The
        result is materialized (``session.pin``), so it stays valid and
        recompute-free after the index changes."""
        bsigs = pin(self.signatures(batch, id_col, text_col))
        return pin(self._match_from_sigs(bsigs, min_agreement))

    def _match_from_sigs(
        self, bsigs: DataFrame, min_agreement: float
    ) -> DataFrame:
        if not self.wh.exists(self.bands_table, self.namespace):
            # never-bootstrapped index: everything is novel (add() on the
            # survivors auto-creates the tables) — probes must not crash
            # where writes would succeed
            return bsigs.select(
                F.col("id").alias("batch_id"),
                F.col("id").alias("corpus_id"),
                F.lit(0.0).alias("agreement"),
            ).limit(0)
        ibands = self.wh.read(self.bands_table, self.namespace)
        cand = (
            self._bands_of(bsigs)
            .alias("b")
            .join(ibands.alias("i"), "band_key")
            .select(
                F.col("b.id").alias("batch_id"),
                F.col("i.id").alias("corpus_id"),
            )
            .distinct()
        )
        agree = sum(
            (F.col(f"b.mh{i}") == F.col(f"i.mh{i}")).cast("int")
            for i in range(self.n_hashes)
        ) / F.lit(float(self.n_hashes))
        return (
            cand.join(bsigs.alias("b"), cand.batch_id == F.col("b.id"))
            .join(
                self._indexed_sigs().alias("i"),
                cand.corpus_id == F.col("i.id"),
            )
            .select("batch_id", "corpus_id", agree.alias("agreement"))
            .filter(F.col("agreement") >= min_agreement)
        )

    def dedup_batch(
        self,
        batch: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
        min_agreement: float = 0.5,
        extend_index: bool = True,
    ) -> tuple[DataFrame, DataFrame]:
        """Split ``batch`` into (novel, duplicated-against-corpus) and, by
        default, extend the index with the novel survivors. Use
        ``match_batch`` directly when the corpus_id evidence is needed.
        Batch-internal near-dups are NOT collapsed here (compose with the
        in-batch LSH pass when the batch itself can self-duplicate).

        The batch is shingled ONCE: its signatures are checkpointed and
        reused for the probe and the index extension. The matched-id set
        is checkpointed BEFORE the index is extended — the returned lazy
        frames derive from the materialized blocks (freed with the
        DataFrames by the context cleaner, no permanent cache pin), so
        re-evaluating them later can't re-probe the batch against its
        own freshly-indexed survivors."""
        bsigs = pin(self.signatures(batch, id_col, text_col))
        dup_ids = pin(
            self._match_from_sigs(bsigs, min_agreement)
            .select(F.col("batch_id").alias(id_col))
            .distinct()
        )
        novel = batch.join(dup_ids, id_col, "left_anti")
        dups = batch.join(dup_ids, id_col, "left_semi")
        if extend_index:
            novel_sigs = pin(
                bsigs.join(
                    dup_ids.withColumnRenamed(id_col, "id"),
                    "id",
                    "left_anti",
                )
            )
            self._append_index(novel_sigs)
        return novel, dups


class SpanDedupIndex:
    """Incremental EXACT-substring dedup (Lee et al. 2022) against a
    persisted window-hash index — the delta form of the full-corpus
    ``doc_span_dedup`` / ``doc_block_dedup_rebuild`` rebuilds
    (``plans/analytics10.py``): a production pipeline re-runs span
    removal on daily batches, and re-rebuilding the whole corpus per
    batch is an O(corpus) text scan this index avoids.

    ``mode="span"`` removes every token covered by a duplicated
    stride-1 ``k``-token window; ``mode="block"`` removes duplicated
    aligned ``k``-token blocks. Precedence is ARRIVAL ORDER: a window
    already in the index beats any occurrence in a later batch, and
    within a batch the smallest (doc_id, pos) wins — identical to the
    full-corpus global-first-occurrence rule whenever batches arrive in
    ascending doc_id order, so the incremental pipeline's output equals
    the full rerun (pinned: tests/test_dedup_index.py).

    The ascending-doc_id precondition is ENFORCED, not assumed (the
    incremental-equals-full claim is vacuous otherwise): the index
    persists the maximum doc_id it has absorbed (``<table>_meta``, one
    row) and an EXTENDING ``dedup_batch`` whose minimum doc_id does not
    exceed it raises ``ValueError`` — out-of-order extension would
    silently flip first-occurrence winners vs the full rerun.
    Probe-only calls (``extend_index=False``) are exempt: they claim
    arrival-order precedence (index beats batch), which holds for any
    doc_id. Pre-contract indexes without a meta table are grandfathered
    (checked from first extension onward).

    Per-batch cost: one batch text scan (windows hash in-row), one
    int-only equi-join of batch window hashes against the index table
    (8-byte keys — corpus text is never read), and an O(new hashes)
    append. The index table stores DISTINCT window hashes only; the
    warehouse append path keeps it atomic and retry-idempotent (a
    double-landed hash is collapsed by the probe's semi-join, which is
    set-semantics by construction)."""

    def __init__(
        self,
        warehouse: Warehouse,
        name: str = "span_index",
        *,
        k: int = 5,
        mode: str = "span",
        namespace: str | None = None,
    ):
        if mode not in ("span", "block"):
            raise ValueError(f"mode must be span|block, got {mode!r}")
        self.wh = warehouse
        self.name = name
        self.k = k
        self.mode = mode
        self.namespace = namespace

    @property
    def table(self) -> str:
        return f"{self.name}_{self.mode}{self.k}_hashes"

    @property
    def meta_table(self) -> str:
        return f"{self.name}_{self.mode}{self.k}_meta"

    def _indexed_max(self):
        """Max doc_id the index has absorbed (one-row meta table), or
        None when unknown (no meta yet / empty corpus)."""
        if not self.wh.exists(self.meta_table, self.namespace):
            return None
        rows = self.wh.read(self.meta_table, self.namespace).collect()
        return rows[0]["max_doc_id"] if rows else None

    def _write_max(self, spark, value) -> None:
        if value is None:
            return
        self.wh.create_or_replace(
            self.meta_table,
            spark.createDataFrame([(value,)], ["max_doc_id"]),
            namespace=self.namespace,
        )

    # -- window hashing (shared with the batch rebuild) ---------------------
    def _tokens(
        self, docs: DataFrame, id_col: str, text_col: str
    ) -> DataFrame:
        # token array projected ONCE — HOF lambdas are not CSE'd, an
        # unprojected split re-splits per generated element
        return docs.filter(F.col(text_col).isNotNull()).select(
            F.col(id_col).alias("doc_id"),
            F.split(F.col(text_col), " ").alias("t"),
        )

    def _windows(self, dt: DataFrame) -> DataFrame:
        """(doc_id, pos, wh): stride-1 k-gram hashes (span mode, pos =
        0-based window start) or aligned-block hashes (block mode, pos =
        block index). Hashing matches plans/analytics10.py exactly —
        variadic xxhash64 over token elements for spans, xxhash64 of the
        joined block for blocks (partial tail blocks hash differently
        from any full block by construction)."""
        k, t = self.k, F.col("t")
        if self.mode == "span":
            nwin = F.size(t) - F.lit(k - 1)
            # sequence(1, 0) counts DOWN — short docs need an explicit
            # empty window list
            starts = F.when(nwin >= 1, F.sequence(F.lit(1), nwin)).otherwise(
                F.array().cast("array<int>")
            )
            gen = F.transform(
                starts,
                lambda i: F.xxhash64(
                    *[F.element_at(t, i + j) for j in range(k)]
                ),
            )
        else:
            nblk = F.ceil(F.size(t) / F.lit(k)).cast("int")
            gen = F.transform(
                F.sequence(F.lit(0), nblk - 1),
                lambda i: F.xxhash64(
                    F.array_join(F.slice(t, i * k + 1, k), " ")
                ),
            )
        return dt.select("doc_id", F.posexplode(gen).alias("pos", "wh"))

    # -- lifecycle -----------------------------------------------------------
    def rebuild(
        self, docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
    ) -> None:
        """Bootstrap from the accepted corpus — the only O(corpus) scan."""
        hashes = (
            self._windows(self._tokens(docs, id_col, text_col))
            .select("wh")
            .distinct()
        )
        self.wh.create_or_replace(self.table, hashes, namespace=self.namespace)
        mx = docs.agg(F.max(id_col).alias("max_doc_id")).first()[0]
        self._write_max(docs.sparkSession, mx)

    def _indexed(self) -> DataFrame | None:
        if not self.wh.exists(self.table, self.namespace):
            return None
        return self.wh.read(self.table, self.namespace)

    # -- the incremental rebuild ---------------------------------------------
    def dedup_batch(
        self,
        batch: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
        extend_index: bool = True,
    ) -> DataFrame:
        """Rebuild the BATCH documents only: every window that already
        exists in the index — or occurs earlier within the batch — loses,
        and each document is reassembled from its surviving tokens
        (span) / blocks (block). Returns the same schema as the
        full-corpus catalog query (``doc_id, clean_text, n_tokens,
        n_removed_tokens`` / ``n_blocks, n_removed``); by default the
        batch's window hashes then extend the index (novel ones only —
        an O(new) anti-join append).

        Extending out of arrival order raises ``ValueError`` (class
        docstring: the incremental-equals-full-rerun guarantee needs
        ascending doc_ids); probe-only calls are exempt."""
        dt = pin(self._tokens(batch, id_col, text_col))
        lo = hi = None
        if extend_index:
            # min/max come from the PINNED token frame, not the raw
            # batch — the guard must not re-execute the caller's whole
            # upstream plan a second time (review r7); tokens-only
            # scope is by design: null-text docs are never indexed, so
            # their ids cannot flip an indexed first occurrence
            lo, hi = dt.agg(F.min("doc_id"), F.max("doc_id")).first()
            mx = self._indexed_max()
            if mx is not None and lo is not None and lo <= mx:
                raise ValueError(
                    f"SpanDedupIndex({self.table}): batch min {id_col}"
                    f" {lo!r} <= indexed max {mx!r} — extending out of"
                    " arrival order would silently flip first-occurrence"
                    " winners vs the full-corpus rerun. Sort/split the"
                    " batch above the indexed max, or probe with"
                    " extend_index=False."
                )
        wins = pin(self._windows(dt))
        idx = self._indexed()
        # intra-batch first occurrence per hash
        first = wins.groupBy("wh").agg(
            F.min(F.struct("doc_id", "pos")).alias("w")
        )
        intra_losers = wins.join(first, "wh").filter(
            (F.col("doc_id") != F.col("w.doc_id"))
            | (F.col("pos") != F.col("w.pos"))
        ).select("doc_id", "pos")
        if idx is not None:
            # ANY batch occurrence of an indexed hash loses (the index
            # always precedes the batch in arrival order)
            vs_index = (
                wins.join(idx, "wh", "left_semi").select("doc_id", "pos")
            )
            losers = intra_losers.union(vs_index).distinct()
        else:
            losers = intra_losers.distinct()
        out = self._rebuild_docs(dt, losers)
        if extend_index:
            new_hashes = wins.select("wh").distinct()
            if idx is not None:
                new_hashes = new_hashes.join(idx, "wh", "left_anti")
            if self.wh.exists(self.table, self.namespace):
                self.wh.append(
                    self.table, new_hashes, namespace=self.namespace
                )
            else:
                self.wh.create_or_replace(
                    self.table, new_hashes, namespace=self.namespace
                )
            self._write_max(batch.sparkSession, hi)
        return out

    def _rebuild_docs(self, dt: DataFrame, losers: DataFrame) -> DataFrame:
        k, t = self.k, F.col("t")
        loser_lists = losers.groupBy("doc_id").agg(
            F.collect_list("pos").alias("lpos")
        )
        # the loser lists are bounded by the BATCH (one slim int-array
        # row per affected batch doc), so they broadcast: the batch's
        # token arrays never cross an exchange (pinned in
        # test_dedup_index.py). A full-corpus rebuild goes through the
        # catalog queries' routed join instead (plans/analytics10.py).
        joined = dt.join(F.broadcast(loser_lists), "doc_id", "left")
        lpos = F.coalesce(F.col("lpos"), F.array().cast("array<int>"))
        if self.mode == "span":
            covered = F.array_distinct(
                F.flatten(
                    F.transform(
                        lpos, lambda p: F.sequence(p, p + F.lit(k - 1))
                    )
                )
            )
            kept_idx = F.array_except(
                F.sequence(F.lit(0), F.size(t) - 1), covered
            )
            return joined.select(
                "doc_id",
                F.array_join(
                    F.transform(kept_idx, lambda i: F.element_at(t, i + 1)),
                    " ",
                ).alias("clean_text"),
                F.size(t).cast("long").alias("n_tokens"),
                (F.size(t) - F.size(kept_idx)).cast("long").alias(
                    "n_removed_tokens"
                ),
            )
        nblk = F.ceil(F.size(t) / F.lit(k)).cast("int")
        kept_blocks = F.array_except(F.sequence(F.lit(0), nblk - 1), lpos)
        return joined.select(
            "doc_id",
            F.array_join(
                F.transform(
                    kept_blocks,
                    lambda i: F.array_join(F.slice(t, i * k + 1, k), " "),
                ),
                " ",
            ).alias("clean_text"),
            nblk.cast("long").alias("n_blocks"),
            F.size(lpos).cast("long").alias("n_removed"),
        )
