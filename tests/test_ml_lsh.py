"""MLlib LSH variants: run + sanity against the portable implementations."""

from pyspark.sql import functions as F

from heatmap_spark.operators.dedup import jaccard_pairs
from heatmap_spark.operators.ml_lsh import ml_brp_neighbors, ml_minhash_candidates
from heatmap_spark.operators.similarity import knn_cosine


def test_ml_minhash_agrees_with_exact_jaccard(spark, sf_smoke):
    # every ML-LSH candidate above threshold must have genuinely high
    # exact jaccard (the distance column is exact on the candidate set)
    cands = ml_minhash_candidates(spark, sf_smoke, threshold=0.2).collect()
    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in jaccard_pairs(spark, sf_smoke, threshold=0.2).collect()
    }
    for r in cands:
        assert (r.doc_a, r.doc_b) in exact, (r.doc_a, r.doc_b)
        assert abs(exact[(r.doc_a, r.doc_b)] - r.jaccard) < 1e-5


def test_ml_brp_neighbors_shape(spark, sf_smoke):
    res = ml_brp_neighbors(spark, sf_smoke, n_queries=3, k=2).collect()
    per_q = {}
    for r in res:
        assert r.neighbor_id != r.query_id
        assert r.euclidean_dist >= 0
        per_q.setdefault(r.query_id, 0)
        per_q[r.query_id] += 1
    assert set(per_q.keys()) == {0, 1, 2}
    # LSH may return fewer than k if buckets are sparse, never more
    assert all(1 <= n <= 2 for n in per_q.values())


def test_minhash_km_family_properties(spark):
    """Kirsch-Mitzenmacher signature properties: identical texts get
    identical signatures (and thus always become candidates), disjoint
    vocabularies never collide on a full band, and signatures are
    deterministic across invocations."""
    from heatmap_spark.operators.dedup import (
        minhash_lsh_candidates_df,
        minhash_signatures_wide,
    )

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta eta theta"),
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "one two three four five six seven eight nine ten"),
        ],
        "doc_id long, text string",
    )
    sigs = {r.doc_id: tuple(r)[1:] for r in minhash_signatures_wide(docs).collect()}
    sigs2 = {r.doc_id: tuple(r)[1:] for r in minhash_signatures_wide(docs).collect()}
    assert sigs == sigs2
    assert sigs[0] == sigs[1]
    assert sigs[0] != sigs[2]
    pairs = {(r.doc_a, r.doc_b) for r in minhash_lsh_candidates_df(docs).collect()}
    assert (0, 1) in pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_prefix_filter_is_exact_and_prunes(spark, sf_smoke):
    """Prefix filtering must reproduce the brute-force shingle-Jaccard
    join EXACTLY (no recall loss — the PPJoin guarantee), while its
    candidate-generation postings are a strict subset of the full
    postings volume."""
    from pyspark.sql import functions as F

    from heatmap_spark.operators.dedup import (
        _doc_shingles,
        jaccard_prefix_filter,
        shingles_expr,
    )
    from heatmap_spark.sources.tables import load_table

    t = 0.5
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in jaccard_prefix_filter(spark, sf_smoke, threshold=t).collect()
    }
    docs = load_table(spark, sf_smoke, "documents")
    sets = {
        r.doc_id: set(r.sh)
        for r in docs.select("doc_id", shingles_expr().alias("sh")).collect()
    }
    expected = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            if inter:
                j = inter / (len(sets[a]) + len(sets[b]) - inter)
                if j >= t:
                    expected[(a, b)] = round(j, 6)
    assert got == expected
    full_volume = _doc_shingles(docs).count()
    n = F.size(F.col("sh"))
    prefix_volume = docs.select(
        shingles_expr().alias("sh")
    ).select(
        (n - F.ceil(F.lit(t) * n) + 1).cast("int").alias("p")
    ).agg(F.sum("p")).collect()[0][0]
    assert prefix_volume < full_volume
