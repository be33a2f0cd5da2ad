"""Training-shard export: deterministic sharded parquet output.

The write-side counterpart of the curation catalog: after filter/dedup/
pack, training jobs want the corpus as N stable shards whose membership
does not move between runs (so resumable trainers and cross-run caching
see the same shard contents), with bounded file sizes.

No reference equivalent (bulker's file sink writes one logical stream,
``bulkerlib/implementations/file_storage/abstract.go:169-295``); this is
north-star territory. Spark-first design:

- shard id = ``pmod(xxhash64(key), n_shards)`` — an IN-ROW projection
  (no sampling pass, no global sort), deterministic across runs and
  engines, independent of partition layout and ``spark.sql.shuffle.partitions``.
- one exchange: ``repartition(n_shards, shard)`` co-locates each shard,
  then ``partitionBy(shard)`` writes one directory per shard with
  ``maxRecordsPerFile`` bounding file size (the 100 TB file-count lever:
  shard count fixes directory fan-out, maxRecordsPerFile fixes file
  granularity inside a shard, independent of executor count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SHARD_COLUMN = "__shard"


def with_shard(
    df: DataFrame, key: str, n_shards: int, salt: str = ""
) -> DataFrame:
    """Assign the deterministic shard id (pure projection, zero shuffle).

    ``salt`` derives an independent sharding (new salt ⇒ fresh
    assignment), same construction as the A/B arm hash."""
    col = (
        F.concat(F.lit(salt + ":"), F.col(key).cast("string"))
        if salt
        else F.col(key).cast("string")
    )
    return df.withColumn(
        SHARD_COLUMN, F.pmod(F.xxhash64(col), F.lit(n_shards))
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    key: str,
    n_shards: int,
    *,
    salt: str = "",
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
    format: str = "parquet",
) -> None:
    """Write ``df`` as ``path/__shard=K/`` directories, K stable in the
    key: re-running on the same rows reproduces identical shard
    membership regardless of cluster size or input partitioning."""
    sharded = with_shard(df, key, n_shards, salt)
    writer = (
        sharded.repartition(n_shards, SHARD_COLUMN)
        .write.mode(mode)
        .partitionBy(SHARD_COLUMN)
    )
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", int(max_records_per_file))
    writer.format(format).save(path)


def read_shard(spark, path: str, shard: int) -> DataFrame:
    """Read ONE shard — partition pruning makes this a 1/n_shards scan
    (the trainer-worker access pattern: worker k reads shard k)."""
    return spark.read.parquet(path).filter(F.col(SHARD_COLUMN) == shard)
