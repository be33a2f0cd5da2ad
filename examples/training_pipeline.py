"""End-to-end training-data curation pipeline on the bulker_spark engine.

The 100 TB workflow in miniature, over /root/testdata/sf0.001:

  raw documents → quality signals → exact + fuzzy dedup → contamination
  check → stratified split → deterministic shard export, plus an
  embedding-side ANN index build. Every stage is the same catalog
  operator the driver's oracle gate checks; this script wires them into
  one DAG a user would actually run.

Run:  python examples/training_pipeline.py [sf_dir]
"""

import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from bulker_spark.functions.export import read_shard, write_training_shards
    from bulker_spark.functions.similarity import cosine_topk
    from bulker_spark.functions.text import quality_features
    from bulker_spark.plans.analytics import doc_fuzzy_dedup_lsh
    from bulker_spark.plans.analytics5 import doc_prefix_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    # 1. quality signals (JVM expressions — no UDF in the scan stage)
    scored = quality_features(docs)
    print("scored:")
    scored.select("doc_id", "lang", "q_n_tokens", "q_score").show(3)

    # 2. cheap dedup first: drop non-canonical members of prefix groups
    #    (head-of-document duplicates), THEN run the expensive LSH pass
    #    on the survivors — the standard cheap→expensive dedup cascade
    prefix_groups = doc_prefix_dedup(spark, sf_dir)
    dups = prefix_groups.selectExpr("prefix_key", "canonical_doc")
    keyed = scored.withColumn(
        "prefix_key",
        F.md5(F.array_join(F.slice(F.split("text", " "), 1, 10), " ")),
    )
    after_prefix = (
        keyed.join(F.broadcast(dups), "prefix_key", "left")
        .filter(
            F.col("canonical_doc").isNull()
            | (F.col("doc_id") == F.col("canonical_doc"))
        )
        .drop("prefix_key", "canonical_doc")
    )
    print(f"after prefix dedup: {after_prefix.count()} / {docs.count()}")

    # 3. fuzzy dedup survivors (MinHash-LSH candidates → verified pairs →
    #    connected components → keep one canonical doc per cluster). The
    #    catalog query audits doc_id < 50 (its oracle bound); docs outside
    #    the audited range pass through untouched.
    survivors = doc_fuzzy_dedup_lsh(spark, sf_dir).select("doc_id")
    clean = after_prefix.join(
        F.broadcast(survivors.withColumn("__keep", F.lit(1))),
        "doc_id",
        "left",
    ).filter(
        (F.col("doc_id") >= 50) | F.col("__keep").isNotNull()
    ).drop("__keep")
    print(f"after fuzzy dedup: {clean.count()}")

    # 4. quality gate + per-language stratified budget
    kept = clean.filter(
        (F.col("q_score") > 0.2) & (F.col("q_n_tokens") >= 20)
    )
    print("per-language mix:")
    kept.groupBy("lang").count().orderBy("lang").show()

    # 5. deterministic shard export (stable across re-runs and cluster
    #    sizes — shard = pmod(xxhash64(doc_id), N), a pure projection)
    out = tempfile.mkdtemp(prefix="training_shards_")
    write_training_shards(
        kept.select("doc_id", "lang", "text", "q_n_tokens", "q_score"),
        out,
        key="doc_id",
        n_shards=4,
        max_records_per_file=50_000,
    )
    one = read_shard(spark, out, shard=0)
    print(f"shard 0: {one.count()} rows (partition-pruned 1/4 scan)")

    # 6. embedding side: exact cosine top-k neighbors for a probe vector
    #    (the brute-force baseline; swap in ann_lsh / IvfIndex at scale)
    probe = emb.limit(1).select("embedding").collect()[0][0]
    print("cosine top-5 for probe vector:")
    cosine_topk(emb, probe, k=5).show()

    # 7. sub-document dedup (round 5): strip duplicated PASSAGES, not
    #    just duplicated documents — stride-1 window removal keeps the
    #    globally first occurrence of every repeated 5-token span
    from bulker_spark.plans.analytics10 import (
        doc_curriculum_order,
        doc_span_dedup,
    )

    removed, total = (
        doc_span_dedup(spark, sf_dir)
        .agg(F.sum("n_removed_tokens"), F.sum("n_tokens"))
        .collect()[0]
    )
    print(f"span dedup: {removed}/{total} tokens removed corpus-wide")

    # 8. curriculum ordering: a contiguous best-first training order
    #    with NO single-partition global sort (range partitions +
    #    driver-side offsets)
    print("curriculum head (best documents first):")
    doc_curriculum_order(spark, sf_dir).orderBy("train_order").show(5)

    # 9. incremental form (round 6): a production pipeline re-runs span
    #    dedup on DAILY batches — the persisted window-hash index probes
    #    each new batch with an int-only join instead of re-scanning the
    #    corpus, and arrival order equals the global first-occurrence
    #    rule for ascending batches
    from bulker_spark.operators.dedup_index import SpanDedupIndex
    from bulker_spark.sinks.warehouse import Warehouse

    wh = Warehouse(spark, tempfile.mkdtemp(prefix="pipeline_wh_"))
    idx = SpanDedupIndex(wh, k=5, mode="span")
    half = docs.agg(F.expr("percentile(doc_id, 0.5)")).collect()[0][0]
    day1 = docs.filter(F.col("doc_id") <= half)
    day2 = docs.filter(F.col("doc_id") > half)
    idx.dedup_batch(day1)  # bootstrap day: indexes its own windows
    d2 = idx.dedup_batch(day2)
    inc_removed = d2.agg(F.sum("n_removed_tokens")).collect()[0][0]
    print(
        f"incremental span dedup, day 2: {inc_removed} tokens removed "
        "against day 1's index (no corpus rescan)"
    )

    spark.stop()


if __name__ == "__main__":
    main(*(sys.argv[1:2] or []))
