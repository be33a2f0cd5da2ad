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
        sigs = self.signatures(docs, id_col, text_col).localCheckpoint()
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
        result is materialized (localCheckpoint), so it stays valid and
        recompute-free after the index changes."""
        bsigs = self.signatures(batch, id_col, text_col).localCheckpoint()
        return self._match_from_sigs(bsigs, min_agreement).localCheckpoint()

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
        bsigs = self.signatures(batch, id_col, text_col).localCheckpoint()
        dup_ids = (
            self._match_from_sigs(bsigs, min_agreement)
            .select(F.col("batch_id").alias(id_col))
            .distinct()
            .localCheckpoint()
        )
        novel = batch.join(dup_ids, id_col, "left_anti")
        dups = batch.join(dup_ids, id_col, "left_semi")
        if extend_index:
            novel_sigs = bsigs.join(
                dup_ids.withColumnRenamed(id_col, "id"), "id", "left_anti"
            ).localCheckpoint()
            self._append_index(novel_sigs)
        return novel, dups
