"""Round-5 catalog extension: DSIR-style importance weights for
training-data selection.

Reference scope (jitsucom/bulker): none — this extends the LLM
training-data tier. The estimator is Data Selection via Importance
Resampling (Xie et al., 2023): fit bag-of-n-gram unigram models over a
TARGET corpus (the distribution you want more of) and the RAW corpus,
and weight every raw document by its log importance ratio
``Σ_f k_f · ln(p̂_target(f) / q̂_raw(f))`` — documents that look like the
target float up, boilerplate sinks. The paper hashes n-grams into a
fixed bucket count purely to bound model memory; with an exact
vocabulary the estimator is identical and the result is engine-exact
(hash-bucket collisions would differ between engines' hash functions),
so this plan uses exact unigram+bigram features.

Target here: ``lang = 'en'`` documents (the testdata's stand-in for a
curated high-quality slice); raw: the whole corpus. Add-one smoothing
over the raw vocabulary keeps unseen-in-target features finite.

Scale shape: features are generated IN-ROW (split + slide, no join to
build bigrams), per-(doc, feature) counts shuffle once, the feature
model aggregates with map-side partials in the same pass for both
corpora (conditional count, not a second scan), and the three scalars
(totals + vocabulary size) broadcast. The score join carries one row
per (doc, feature-type) — never one row per token instance, so Zipf-head
tokens ("the") are not hot keys. This is the same layout as the unigram
surprisal query, proven at sf1.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def doc_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document DSIR importance weight, length-normalized:
    ``dsir_weight = (1/n) Σ_f k_f · [ln(t_f+1) − ln(T+V) − ln(r_f+1) +
    ln(R+V)]`` where t/r are target/raw feature counts, T/R the corpus
    feature totals and V the raw vocabulary size. The log terms take
    INTEGER arguments (identical doubles in every engine); the rounded
    4-decimal output absorbs summation-order jitter."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    toks = F.split(F.col("text"), " ")
    bigrams = F.when(
        F.size(toks) >= 2,
        F.expr(
            "transform(sequence(1, size(split(text, ' ')) - 1),"
            " i -> concat(element_at(split(text, ' '), i), ' ',"
            "             element_at(split(text, ' '), i + 1)))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = d.select(
        "doc_id",
        "lang",
        F.explode(F.concat(toks, bigrams)).alias("f"),
    )
    doc_feat = feats.groupBy("doc_id", "f").agg(F.count("*").alias("k"))
    # one pass builds BOTH models: raw count + target (lang='en') count.
    # Deliberately aggregated from the EXPLODE, not from doc_feat: the
    # conditional count reduces map-side to vocabulary-sized partials
    # (tiny shuffle), whereas deriving the models from doc_feat would
    # re-write the corpus-scale (doc, feature) exchange a second time
    # (no cross-branch exchange reuse without caching — measured 2.3×
    # total shuffle bytes). The extra columnar scan is the cheap side
    # of that trade at any corpus size.
    stats = feats.groupBy("f").agg(
        F.count("*").alias("rcnt"),
        F.count(F.when(F.col("lang") == "en", 1)).alias("tcnt"),
    )
    tot = stats.agg(
        F.sum("rcnt").alias("rtot"),
        F.sum("tcnt").alias("ttot"),
        F.count("*").alias("v"),
    )
    scored = (
        doc_feat.join(stats, "f")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "k",
            (
                F.col("k")
                * (
                    F.log(F.col("tcnt") + 1)
                    - F.log(F.col("ttot") + F.col("v"))
                    - F.log(F.col("rcnt") + 1)
                    + F.log(F.col("rtot") + F.col("v"))
                )
            ).alias("w"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.sum("k").alias("n_feats"),
        # + 0.0 canonicalizes IEEE negative zero (a weight rounding to
        # -0.0 prints differently across engines; -0.0 + 0.0 = +0.0)
        (F.round(F.sum("w") / F.sum("k"), 4) + F.lit(0.0)).alias(
            "dsir_weight"
        ),
    )


DOC_DSIR_SQL = """
WITH toks AS (
  SELECT doc_id, lang, string_split(text, ' ') AS l FROM documents
),
feats AS (
  SELECT doc_id, lang, unnest(l) AS f FROM toks
  UNION ALL
  SELECT doc_id, lang,
         unnest(list_transform(range(1, len(l)),
                               i -> l[i] || ' ' || l[i + 1])) AS f
  FROM toks
),
doc_feat AS (
  SELECT doc_id, f, CAST(count(*) AS BIGINT) AS k FROM feats GROUP BY 1, 2
),
stats AS (
  SELECT f,
         count(*) AS rcnt,
         count(*) FILTER (WHERE lang = 'en') AS tcnt
  FROM feats GROUP BY 1
),
tot AS (
  SELECT SUM(rcnt) AS rtot, SUM(tcnt) AS ttot, COUNT(*) AS v FROM stats
)
SELECT doc_id,
       CAST(SUM(k) AS BIGINT) AS n_feats,
       ROUND(SUM(k * (ln(tcnt + 1) - ln(ttot + v)
                      - ln(rcnt + 1) + ln(rtot + v))) / SUM(k),
             4) + 0.0 AS dsir_weight
FROM doc_feat JOIN stats USING (f), tot
GROUP BY 1
"""


EXTRA_QUERIES10: dict[str, tuple] = {
    "doc_dsir_weights": (doc_dsir_weights, DOC_DSIR_SQL),
}
