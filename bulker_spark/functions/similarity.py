"""Similarity search over embedding columns (``array<float>``).

Three tiers, chosen by scale:

1. :func:`cosine_topk` — exact brute force, pure JVM expressions
   (``zip_with``/``aggregate``), no UDF. The correctness baseline; O(N·d)
   per query. Right answer up to ~10^7 vectors per executor-scan.
2. :func:`ann_lsh` — Spark ML ``BucketedRandomProjectionLSH`` over
   L2-normalized vectors (Euclidean LSH ≈ cosine after normalization).
   Sub-linear candidate retrieval; the 100 TB path for ad-hoc queries.
3. :class:`IvfIndex` — inverted-file index: k-means centroids (Spark ML),
   vectors partitioned by nearest centroid; queries probe ``n_probe``
   cells. Amortizes across many queries; centroid assignment is a
   broadcast-join + argmin, so the big side never shuffles.

Near-dup joins: :func:`cosine_pairs_exact` (threshold self-join) and
:func:`near_dup_lsh_join` (``approxSimilarityJoin``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: str | Column, b: str | Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm2(a: str | Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def with_normalized(df: DataFrame, vec_col: str, out_col: str = "vec_norm") -> DataFrame:
    """L2-normalize an array column JVM-side."""
    n = _norm2(vec_col)
    return df.withColumn(
        out_col,
        F.transform(vec_col, lambda x: x.cast("double") / n),
    )


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact brute-force cosine top-k against a literal query vector."""
    # one ArrayType Literal node (not CreateArray of per-element lits):
    # bit-identical doubles, ~|vec|× smaller expression tree
    q = F.lit([float(x) for x in query_vec])
    sim = _dot(F.col(vec_col), q) / (_norm2(vec_col) * _norm2(q))
    return (
        df.select(id_col, sim.alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def cosine_pairs_exact(
    df: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact near-dup pairs: normalized self-join, cosine ≥ threshold.
    O(N²) — the oracle/baseline; use LSH beyond ~10^5 vectors."""
    n = with_normalized(df.select(id_col, vec_col), vec_col)
    a = n.select(
        F.col(id_col).alias("id_a"), F.col("vec_norm").alias("va")
    )
    b = n.select(
        F.col(id_col).alias("id_b"), F.col("vec_norm").alias("vb")
    )
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    sim = _dot("va", "vb")
    return (
        pairs.select("id_a", "id_b", F.round(sim, 4).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


# -- Spark ML LSH tier ----------------------------------------------------

def _to_ml_vec(df: DataFrame, vec_col: str, out: str) -> DataFrame:
    from pyspark.ml.functions import array_to_vector

    return df.withColumn(
        out, array_to_vector(F.col(vec_col).cast("array<double>"))
    )


def ann_lsh(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bucket_length: float = 0.5,
    num_hash_tables: int = 8,
):
    """Approximate NN via random-projection LSH on normalized vectors.
    Returns (results_df[id, approx_dist], fitted_model)."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.linalg import Vectors

    normed = with_normalized(df.select(id_col, vec_col), vec_col)
    feat = _to_ml_vec(normed, "vec_norm", "features")
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=42,
    )
    model = lsh.fit(feat)
    import numpy as np

    qv = np.asarray(query_vec, dtype="float64")
    qv = qv / (np.linalg.norm(qv) or 1.0)
    res = model.approxNearestNeighbors(feat, Vectors.dense(qv), k)
    return res.select(id_col, F.col("distCol").alias("l2_dist")), model


def near_dup_lsh_join(
    df: DataFrame,
    l2_threshold: float = 0.5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bucket_length: float = 0.5,
    num_hash_tables: int = 8,
) -> DataFrame:
    """Embedding near-dup candidate pairs via LSH approxSimilarityJoin on
    normalized vectors (L2 dist d ↔ cosine = 1 - d²/2)."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH

    normed = with_normalized(df.select(id_col, vec_col), vec_col)
    feat = _to_ml_vec(normed, "vec_norm", "features")
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=42,
    )
    model = lsh.fit(feat)
    joined = model.approxSimilarityJoin(feat, feat, l2_threshold, distCol="l2")
    return (
        joined.select(
            F.col(f"datasetA.{id_col}").alias("id_a"),
            F.col(f"datasetB.{id_col}").alias("id_b"),
            F.round(1 - F.col("l2") * F.col("l2") / 2, 4).alias("cos_sim"),
        )
        .filter(F.col("id_a") < F.col("id_b"))
    )


# -- IVF tier --------------------------------------------------------------

class IvfIndex:
    """Inverted-file ANN index: k-means cells + probe-limited search.

    Build: fit k-means on (a sample of) the corpus, assign every vector to
    its nearest centroid (broadcast argmin — no shuffle of the corpus
    beyond the final partition-by-cell write). Search: rank centroids for
    the query, brute-force only the top ``n_probe`` cells (partition-pruned
    scan when the index is persisted partitioned by ``cell``).
    """

    def __init__(
        self,
        n_cells: int = 16,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        seed: int = 42,
    ):
        self.n_cells = n_cells
        self.vec_col = vec_col
        self.id_col = id_col
        self.seed = seed
        self.centroids: list[list[float]] | None = None
        self.indexed: DataFrame | None = None

    def build(self, df: DataFrame, sample_fraction: float = 1.0) -> DataFrame:
        from pyspark.ml.clustering import KMeans

        feat = _to_ml_vec(df, self.vec_col, "features")
        train = feat.sample(sample_fraction, seed=self.seed) if sample_fraction < 1 else feat
        km = KMeans(k=self.n_cells, seed=self.seed, featuresCol="features")
        model = km.fit(train)
        self.centroids = [c.tolist() for c in model.clusterCenters()]
        assigned = model.transform(feat).withColumnRenamed("prediction", "cell")
        self.indexed = assigned.drop("features")
        return self.indexed

    def _rank_cells(self, query_vec: list[float]) -> list[int]:
        import numpy as np

        q = np.asarray(query_vec, dtype="float64")
        cents = np.asarray(self.centroids, dtype="float64")
        d = ((cents - q) ** 2).sum(axis=1)
        return [int(i) for i in np.argsort(d)]

    def search(
        self, query_vec: list[float], k: int = 10, n_probe: int = 4
    ) -> DataFrame:
        if self.indexed is None:
            raise ValueError("build() first")
        cells = self._rank_cells(query_vec)[:n_probe]
        probed = self.indexed.filter(F.col("cell").isin(cells))
        return cosine_topk(
            probed, query_vec, k, vec_col=self.vec_col, id_col=self.id_col
        )

    # -- persistence: the at-rest form of the index -------------------------
    def save(self, path: str) -> None:
        """Write the index partitioned by ``cell``: a probe then reads only
        ``n_probe / n_cells`` of the data via partition pruning — the
        on-disk layout IS the index."""
        if self.indexed is None or self.centroids is None:
            raise ValueError("build() first")
        self.indexed.write.mode("overwrite").partitionBy("cell").parquet(path)
        spark = self.indexed.sparkSession
        cent = spark.createDataFrame(
            [(i, c) for i, c in enumerate(self.centroids)],
            "cell int, centroid array<double>",
        )
        cent.coalesce(1).write.mode("overwrite").json(f"{path}__centroids")

    @classmethod
    def load(
        cls,
        spark,
        path: str,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
    ) -> "IvfIndex":
        rows = spark.read.json(f"{path}__centroids").collect()
        idx = cls(n_cells=len(rows), vec_col=vec_col, id_col=id_col)
        idx.centroids = [
            r["centroid"] for r in sorted(rows, key=lambda r: r["cell"])
        ]
        idx.indexed = spark.read.parquet(path)
        return idx
