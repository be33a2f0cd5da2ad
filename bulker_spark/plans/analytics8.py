"""Round-3 catalog extensions: asymmetric containment pairs (subset-dup /
quote detection), out-of-vocabulary rate against the corpus vocabulary,
and supplier concentration (HHI) — each a Catalyst-first plan with a
DuckDB oracle twin.

Reference scope (jitsucom/bulker): none of this exists in the reference
(`SURVEY.md §2` — no similarity or corpus analytics); these extend the
training-data curation tier: containment catches docs swallowed INSIDE
bigger docs (symmetric Jaccard under-scores subset duplication — the
standard contamination/quote shape), OOV rate is the tokenizer-health /
domain-shift signal, and HHI is the canonical concentration index over a
grouped share distribution.

Determinism discipline (see check_oracle --strict): every ratio leaves
floats after a SINGLE division and lands as FLOOR(10000·x) basis points
in BIGINT — floor (unlike round) has no half-way tie for the engines to
break differently, and everything upstream of the division is exact
integer arithmetic.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bulker_spark.plans._common import _SHINGLE_DUCK


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# ==========================================================================
# Asymmetric containment pairs: |sh(A) ∩ sh(B)| / |sh(A)|
# ==========================================================================

_CONT_MAX_DOC = 120
_CONT_MIN_BP = 2000  # report pairs where ≥20% of A's shingles occur in B


def doc_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional near-dup: how much of document A's content appears in
    document B (|shingles(A) ∩ shingles(B)| / |shingles(A)|). Symmetric
    Jaccard under-scores a small doc quoted verbatim inside a large one
    (big union); containment is the standard metric for subset
    duplication and benchmark contamination.

    Scale shape: identical to the Jaccard pair plan — the self-join runs
    on DISTINCT shingles (constant-width keys) within the bounded doc
    window, intersection counts partial-aggregate map-side, and sizes
    broadcast back. Containment lands as FLOOR basis points (exact
    integer pipeline up to a single division)."""
    d = _t(spark, sf_dir, "documents").filter(
        F.col("doc_id") < _CONT_MAX_DOC
    )
    pos = d.select(
        "doc_id",
        "text",
        F.explode(
            F.sequence(
                F.lit(1), F.greatest(F.length("text") - F.lit(7), F.lit(1))
            )
        ).alias("i"),
    )
    sh = pos.select(
        "doc_id", F.expr("substring(text, i, 8)").alias("sh")
    ).distinct()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, F.col("a.sh") == F.col("b.sh"))
        .filter(F.col("a.doc_id") != F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(
            sizes.withColumnRenamed("doc_id", "doc_a").alias("sa"), "doc_a"
        )
        .withColumn(
            "containment_bp",
            F.floor(
                F.lit(10000.0) * F.col("inter") / F.col("sz")
            ).cast("long"),
        )
        .filter(F.col("containment_bp") >= _CONT_MIN_BP)
        .select("doc_a", "doc_b", "inter", "containment_bp")
    )


DOC_CONTAINMENT_SQL = f"""
WITH sh AS (
  SELECT DISTINCT doc_id, sh
  FROM ({_SHINGLE_DUCK.format(max_doc=_CONT_MAX_DOC)})
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id <> b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, inter,
       CAST(FLOOR(10000.0 * inter / sz) AS BIGINT) AS containment_bp
FROM inter JOIN sizes ON sizes.doc_id = inter.doc_a
WHERE FLOOR(10000.0 * inter / sz) >= {_CONT_MIN_BP}
"""


# ==========================================================================
# Out-of-vocabulary rate vs the corpus top-K vocabulary
# ==========================================================================

_VOCAB_K = 500


def doc_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document out-of-vocabulary fraction against the corpus's own
    top-K token vocabulary (count desc, token asc tie-break — fully
    deterministic). High OOV flags tokenizer-hostile or domain-shifted
    documents; the aggregate distribution is the standard
    tokenizer-health readout before a training run.

    Scale shape: one token-keyed count (map-side combined) builds the
    vocabulary, which BROADCASTS (K rows) back onto the token stream —
    per-doc aggregation is the only other shuffle; document text crosses
    the wire once as tokens."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("tok"),
    ).filter(F.col("tok") != "")
    vocab = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("tok"))
        .limit(_VOCAB_K)
        .select("tok")
    )
    return (
        toks.join(F.broadcast(vocab.withColumn("__in", F.lit(1))), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.count(F.when(F.col("__in").isNull(), 1)).alias("oov_tokens"),
        )
        .withColumn(
            "oov_bp",
            F.floor(
                F.lit(10000.0) * F.col("oov_tokens") / F.col("n_tokens")
            ).cast("long"),
        )
        .select("doc_id", "n_tokens", "oov_tokens", "oov_bp")
    )


DOC_OOV_SQL = f"""
WITH toks AS (
  SELECT doc_id, t.tok
  FROM documents,
       LATERAL (SELECT unnest(string_split(lower(text), ' ')) AS tok) t
  WHERE t.tok <> ''
),
vocab AS (
  SELECT tok FROM toks GROUP BY tok
  ORDER BY COUNT(*) DESC, tok
  LIMIT {_VOCAB_K}
)
SELECT doc_id, COUNT(*) AS n_tokens,
       COUNT(CASE WHEN vocab.tok IS NULL THEN 1 END) AS oov_tokens,
       CAST(FLOOR(10000.0 * COUNT(CASE WHEN vocab.tok IS NULL THEN 1 END)
                  / COUNT(*)) AS BIGINT) AS oov_bp
FROM toks LEFT JOIN vocab USING (tok)
GROUP BY doc_id
"""


# ==========================================================================
# Supplier concentration per part brand (HHI)
# ==========================================================================


def parts_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman concentration of lineitem volume across
    suppliers, per part container class — the canonical share-
    concentration index (10000 = single supplier, →0 = atomized). The
    supply-risk audit every procurement warehouse runs.

    Scale shape: two map-side-combined aggregations (supplier volume per
    group, then Σ share² per group); the share squaring stays in exact
    BIGINT (Σ cnt², total²) with one final division into FLOOR basis
    points."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_brand").alias("brand")
    )
    vol = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("brand", "l_suppkey")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        vol.groupBy("brand")
        .agg(
            F.count("*").alias("n_suppliers"),
            F.sum("cnt").alias("total"),
            F.sum(F.col("cnt") * F.col("cnt")).alias("sumsq"),
        )
        .withColumn(
            "hhi_bp",
            F.floor(
                F.lit(10000.0)
                * F.col("sumsq")
                / (F.col("total") * F.col("total"))
            ).cast("long"),
        )
        .select("brand", "n_suppliers", "total", "hhi_bp")
    )


PARTS_HHI_SQL = """
WITH vol AS (
  SELECT p.p_brand AS brand, l.l_suppkey,
         COUNT(*) AS cnt
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2
)
SELECT brand, COUNT(*) AS n_suppliers, SUM(cnt) AS total,
       CAST(FLOOR(10000.0 * SUM(cnt * cnt)
                  / (SUM(cnt) * SUM(cnt))) AS BIGINT) AS hhi_bp
FROM vol
GROUP BY brand
"""


EXTRA_QUERIES8: dict[str, tuple] = {
    "doc_containment_pairs": (doc_containment_pairs, DOC_CONTAINMENT_SQL),
    "doc_oov_rate": (doc_oov_rate, DOC_OOV_SQL),
    "parts_supplier_hhi": (parts_supplier_hhi, PARTS_HHI_SQL),
}
