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

Reference scope (jitsucom/bulker): the reference has no similarity ops at
all (`SURVEY.md §2`); its only dedup is PK equality
(``bulkerlib/implementations/sql/abstract_transactional.go:439-496``).
This extends the engine's training-data tier with the standard
MinHash-LSH incremental-index shape (same banding math as
``functions/text.py:minhash_lsh_candidates``, which this stays
equivalence-tested against).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import minhash_signatures, shingles
from ..sinks.warehouse import Warehouse


def _band_keys(
    signatures: DataFrame, n_hashes: int, band_size: int, id_col: str = "id"
) -> DataFrame:
    """Long-form (id, band_key) rows — one per band, identical key
    construction to ``minhash_lsh_candidates`` so index joins reproduce
    the in-memory LSH exactly."""
    n_bands = n_hashes // band_size
    out = None
    for b in range(n_bands):
        key = F.concat_ws(
            "_",
            F.lit(b),
            *[
                F.col(f"mh{b * band_size + j}").cast("string")
                for j in range(band_size)
            ],
        )
        part = signatures.select(
            F.col(id_col).alias("id"), key.alias("band_key")
        )
        out = part if out is None else out.unionByName(part)
    return out


class MinHashDedupIndex:
    """Persistent MinHash-LSH dedup index over a warehouse.

    ``rebuild`` bootstraps from the current corpus; ``match_batch`` finds
    (batch doc, corpus doc) near-dup pairs; ``dedup_batch`` splits a
    batch into novel survivors vs corpus-duplicates; ``add`` extends the
    index with accepted documents (append-only: O(batch) writes via the
    warehouse's append path, no index rewrite)."""

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
            docs.select(
                F.col(id_col).alias("id"), F.col(text_col).alias("text")
            ),
            text_col="text",
            id_col="id",
            width=self.shingle_width,
        )
        return minhash_signatures(sh, id_col="id", n_hashes=self.n_hashes)

    # -- lifecycle ----------------------------------------------------------
    def rebuild(
        self, docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
    ) -> None:
        """Bootstrap (or re-bootstrap) the index from the full corpus —
        the only O(corpus) scan in the lifecycle."""
        sigs = self.signatures(docs, id_col, text_col)
        # the band table re-derives from sigs WITHOUT a second text scan,
        # but persist sigs first so both tables come from one computation
        self.wh.create_or_replace(
            self.sigs_table, sigs, pk=["id"], namespace=self.namespace
        )
        stored = self.wh.read(self.sigs_table, self.namespace)
        self.wh.create_or_replace(
            self.bands_table,
            _band_keys(stored, self.n_hashes, self.band_size),
            namespace=self.namespace,
        )

    def add(
        self, docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
    ) -> None:
        """Extend the index with accepted documents — O(batch) appends."""
        sigs = self.signatures(docs, id_col, text_col).persist()
        try:
            self.wh.append(self.sigs_table, sigs, namespace=self.namespace)
            self.wh.append(
                self.bands_table,
                _band_keys(sigs, self.n_hashes, self.band_size),
                namespace=self.namespace,
            )
        finally:
            sigs.unpersist()

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
        band. Corpus text is never read — only the band/sig tables."""
        bsigs = self.signatures(batch, id_col, text_col).persist()
        try:
            bbands = _band_keys(bsigs, self.n_hashes, self.band_size)
            ibands = self.wh.read(self.bands_table, self.namespace)
            cand = (
                bbands.alias("b")
                .join(ibands.alias("i"), "band_key")
                .select(
                    F.col("b.id").alias("batch_id"),
                    F.col("i.id").alias("corpus_id"),
                )
                .distinct()
            )
            isigs = self.wh.read(self.sigs_table, self.namespace)
            agree = sum(
                (F.col(f"b.mh{i}") == F.col(f"i.mh{i}")).cast("int")
                for i in range(self.n_hashes)
            ) / F.lit(float(self.n_hashes))
            return (
                cand.join(
                    bsigs.alias("b"), cand.batch_id == F.col("b.id")
                )
                .join(isigs.alias("i"), cand.corpus_id == F.col("i.id"))
                .select(
                    "batch_id",
                    "corpus_id",
                    agree.alias("agreement"),
                )
                .filter(F.col("agreement") >= min_agreement)
            )
        finally:
            bsigs.unpersist()

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

        The matched-id set is pinned in the block cache BEFORE the index
        is extended: both returned frames derive from it lazily, and an
        unpinned recompute after ``add`` would probe the batch against
        its own freshly-indexed survivors and misclassify every novel
        document as a duplicate."""
        dup_ids = (
            self.match_batch(batch, id_col, text_col, min_agreement)
            .select(F.col("batch_id").alias(id_col))
            .distinct()
            .persist()
        )
        dup_ids.count()  # force while the index still excludes this batch
        novel = batch.join(dup_ids, id_col, "left_anti")
        dups = batch.join(dup_ids, id_col, "left_semi")
        if extend_index:
            novel = novel.persist()
            novel.count()
            self.add(novel, id_col, text_col)
        return novel, dups
