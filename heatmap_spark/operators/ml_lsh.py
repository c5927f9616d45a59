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

from heatmap_spark.operators.dedup import shingles_expr, spread_small_input
from heatmap_spark.sources.tables import load_table


def ml_minhash_candidates(
    spark: SparkSession, sf_dir: str, threshold: float = 0.8, num_tables: int = 8
) -> DataFrame:
    """Near-dup candidate pairs via spark.ml MinHashLSH over hashed
    shingle vocabulary vectors (approxSimilarityJoin on Jaccard
    distance <= 1 - threshold).

    Why no oracle can exist: spark.ml's MinHash coefficients are an
    engine-internal seeded hash family DuckDB cannot reproduce, so the
    candidate set is not cross-engine comparable — declared rows-only.
    In its place the query RAISES on a deterministic in-query recall
    pin (seed=42 makes the LSH tables, hence the candidate set, a pure
    function of the data): every pair the EXACT Jaccard join over the
    HASHED FEATURE SETS finds at the same threshold must appear in the
    LSH output, and every emitted jaccard must agree with the exact
    Jaccard recomputed from the same feature sets within 1e-4.

    Scale-aware pin domain (VERDICT r12 item 5): the exact twin runs
    on the HashingTF bucket sets — the vectors approxSimilarityJoin
    actually measures — not on the raw shingle strings.  The old
    shingle-domain pin silently assumed HashingTF injectivity, which
    holds at fixture vocabularies but broke at the sf0.1 vocabulary
    (2 bucket collisions → spurious 1e-4 drift).  MinHashLSH's
    contract is recall/exactness w.r.t. its feature vectors; bucket
    collisions are expected lossy hashing, not a regression, so the
    pin now checks the operator's actual guarantee at every scale.
    At collision-free vocabularies the bucket sets are isomorphic to
    the shingle sets, so the pin's pass/fail behavior at the gated
    fixtures is unchanged.  The exact arm reuses the same bounded
    pair math as the PPJoin operator; the check is anti-join
    count-sized, no collects beyond the tiny per-doc index arrays."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    # Shingle extraction feeds SIX consumers (both sides of the LSH
    # self-join, the exact-twin sets, the postings explode, the size
    # table) — materialize it once so the regex/shingling lineage runs
    # one scan instead of six, and spread the small single-split input
    # across cores first (shingling is the expensive projection; one
    # file split would run it on one core).  Same rows either way —
    # MinHash is per-row, seed-deterministic.
    docs = (
        spread_small_input(load_table(spark, sf_dir, "documents"), "doc_id")
        .select("doc_id", shingles_expr().alias("shingles"))
        .where(F.size("shingles") > 0)
        .localCheckpoint(eager=True)
    )
    tf = HashingTF(inputCol="shingles", outputCol="features", numFeatures=1 << 18, binary=True)
    feats = tf.transform(docs)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=num_tables, seed=42)
    model = lsh.fit(feats)
    joined = model.approxSimilarityJoin(feats, feats, 1.0 - threshold, distCol="jaccard_dist")
    out = (
        joined.where(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.round(F.lit(1.0) - F.col("jaccard_dist"), 6).alias("jaccard"),
        )
        .localCheckpoint(eager=True)
    )
    # exact twin: recompute feature-set Jaccard on the emitted pairs
    # (output-sized) and on the full exact pair set (prefix postings
    # would scale this; brute pair math is fine for the raise pin
    # because it joins through doc_id equality, not a cross join).
    # The per-doc set is the SORTED HashingTF BUCKET INDEX ARRAY pulled
    # from the very vectors the LSH scored (no hash replication — ML's
    # murmur3 variant has no SQL twin), materialized once for both pin
    # arms.  Pin arm only: the tiny indices UDF never touches the
    # declared output path (guide §4 hot-path rule intact).
    from pyspark.sql.types import ArrayType, IntegerType

    idx_udf = F.udf(
        lambda v: sorted(int(i) for i in v.indices), ArrayType(IntegerType())
    )
    sets = feats.select(
        "doc_id", idx_udf("features").alias("s")
    ).localCheckpoint(eager=False)
    recheck = (
        out.join(sets.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("s", "sa"), "doc_a")
        .join(sets.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("s", "sb"), "doc_b")
        .select(
            "jaccard",
            (
                F.size(F.array_intersect("sa", "sb"))
                / F.size(F.array_union("sa", "sb"))
            ).alias("exact_j"),
        )
    )
    # NULL exact_j (two empty shingle sets -> 0/0) is a violation, not
    # a three-valued silent pass — the kll-drift guard pattern
    drifted = recheck.where(
        F.col("exact_j").isNull()
        | (F.abs(F.col("jaccard") - F.col("exact_j")) > 1e-4)
    ).count()
    if drifted:
        raise AssertionError(
            f"MinHashLSH emitted jaccard diverges from the exact "
            f"feature-set Jaccard on {drifted} pair(s) — a keyDistance "
            f"regression (bucket collisions cannot cause this: both "
            f"sides read the same feature vectors)"
        )
    # recall pin: the exact pair set (bucket-postings join — candidates
    # only from shared feature buckets, never a cross join) must be
    # covered; bucket indices are already distinct per doc.
    toks = sets.select("doc_id", F.explode("s").alias("t"))
    sizes = sets.select("doc_id", F.size("s").alias("n"))
    inter = (
        toks.alias("a")
        .join(toks.alias("b"), "t")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("inter"))
    )
    # approxSimilarityJoin keeps pairs with keyDistance STRICTLY below
    # the passed threshold — the twin spells the identical double
    # comparison (1 - i/u < 1 - threshold, same literals, same IEEE
    # ops), or a pair at exactly j == threshold (measured at sf0.1:
    # i=8, u=10 → j = 0.8) would be demanded of an operator that
    # excludes it by contract.
    exact_pairs = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
        .where(
            F.lit(1.0)
            - F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
            < F.lit(1.0 - threshold)
        )
        .select("doc_a", "doc_b")
    )
    missed = exact_pairs.join(out, ["doc_a", "doc_b"], "left_anti").count()
    if missed:
        raise AssertionError(
            f"MinHashLSH missed {missed} pair(s) the exact Jaccard join "
            f"finds at threshold {threshold} (seed=42 makes this "
            f"deterministic — a real regression, not sampling noise)"
        )
    return out


def ml_brp_neighbors(
    spark: SparkSession, sf_dir: str, n_queries: int = 5, k: int = 3
) -> DataFrame:
    """Approximate nearest neighbors on embeddings via
    BucketedRandomProjectionLSH (Euclidean).

    Why no oracle can exist: the random-projection directions are an
    engine-internal seeded draw DuckDB cannot reproduce, so which
    k candidates surface is not cross-engine comparable — declared
    rows-only.  The query instead RAISES on two in-query invariants
    (seed=42 makes the result a pure function of the data): every
    emitted euclidean_dist must equal the exact distance recomputed
    from the raw embedding arrays within 1e-6 (approxNearestNeighbors
    reports TRUE distances on its candidates — only the candidate set
    is approximate), and every query must return exactly k neighbors.
    Both checks are output-sized joins, no collects."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    raw = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    emb = raw.select("vec_id", array_to_vector("vec").alias("features"))
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
    res = res.localCheckpoint(eager=True)
    # invariant 1: reported distances are exact (sequential fold, same
    # op order both sides — recomputed from the raw arrays)
    sq = (
        res.join(raw.withColumnRenamed("vec_id", "query_id").withColumnRenamed("vec", "qv"), "query_id")
        .join(raw.withColumnRenamed("vec_id", "neighbor_id").withColumnRenamed("vec", "nv"), "neighbor_id")
        .select(
            "euclidean_dist",
            F.sqrt(
                F.aggregate(
                    F.zip_with("qv", "nv", lambda a, b: (a - b) * (a - b)),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            ).alias("exact_dist"),
        )
    )
    drifted = sq.where(F.abs(F.col("euclidean_dist") - F.col("exact_dist")) > 1e-6).count()
    if drifted:
        raise AssertionError(
            f"BRP-LSH reported distance diverges from the exact "
            f"euclidean distance on {drifted} row(s)"
        )
    # invariant 2: k results per query
    short = res.groupBy("query_id").count().where(F.col("count") != k).count()
    if short:
        raise AssertionError(
            f"BRP-LSH returned != {k} neighbors for {short} query(ies)"
        )
    return res
