"""MLlib-backed LSH variants (SURVEY.md §2.8): the library path next to
the portable md5-based implementations in operators/dedup.py.

spark.ml's MinHashLSH / BucketedRandomProjectionLSH use engine-internal
hash families, so their outputs aren't oracle-comparable across engines
— they're declared rows-only and cross-checked in pytest against the
portable implementations (candidate sets should largely agree for truly
similar pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from heatmap_spark.operators.dedup import shingles_expr
from heatmap_spark.sources.tables import load_table


def ml_minhash_candidates(
    spark: SparkSession, sf_dir: str, threshold: float = 0.8, num_tables: int = 8
) -> DataFrame:
    """Near-dup candidate pairs via spark.ml MinHashLSH over hashed
    shingle vocabulary vectors (approxSimilarityJoin on Jaccard
    distance <= 1 - threshold)."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", shingles_expr().alias("shingles")
    ).where(F.size("shingles") > 0)
    tf = HashingTF(inputCol="shingles", outputCol="features", numFeatures=1 << 18, binary=True)
    feats = tf.transform(docs)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=num_tables, seed=42)
    model = lsh.fit(feats)
    joined = model.approxSimilarityJoin(feats, feats, 1.0 - threshold, distCol="jaccard_dist")
    return (
        joined.where(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.round(F.lit(1.0) - F.col("jaccard_dist"), 6).alias("jaccard"),
        )
    )


def ml_brp_neighbors(
    spark: SparkSession, sf_dir: str, n_queries: int = 5, k: int = 3
) -> DataFrame:
    """Approximate nearest neighbors on embeddings via
    BucketedRandomProjectionLSH (Euclidean)."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=2.0, numHashTables=4, seed=42
    )
    model = lsh.fit(emb)
    out = []
    for qid in range(n_queries):
        qvec = emb.where(F.col("vec_id") == qid).first()["features"]
        nn = model.approxNearestNeighbors(
            emb.where(F.col("vec_id") != qid), qvec, k, distCol="dist"
        )
        out.append(
            nn.select(
                F.lit(qid).alias("query_id"),
                F.col("vec_id").alias("neighbor_id"),
                F.round("dist", 6).alias("euclidean_dist"),
            )
        )
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res
