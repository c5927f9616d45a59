"""Similarity-search semantics tests beyond the DuckDB oracle."""

from pyspark.sql import functions as F

from heatmap_spark.operators.similarity import ivf_assign, knn_cosine, knn_cosine_ivf
from heatmap_spark.sources.tables import load_table


def test_knn_self_excluded_and_k_rows(spark, sf_smoke):
    res = knn_cosine(spark, sf_smoke, n_queries=5, k=3).collect()
    per_q = {}
    for r in res:
        assert r.neighbor_id != r.query_id
        per_q.setdefault(r.query_id, []).append(r.rank)
    assert set(per_q.keys()) == {0, 1, 2, 3, 4}
    for ranks in per_q.values():
        assert sorted(ranks) == [1, 2, 3]


def test_ivf_assign_partitions_all_vectors(spark, sf_smoke):
    emb = load_table(spark, sf_smoke, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    assigned = ivf_assign(emb, n_buckets=4)
    assert assigned.count() == emb.count()
    assert assigned.select("vec_id").distinct().count() == emb.count()
    buckets = {r.bucket for r in assigned.select("bucket").distinct().collect()}
    assert buckets <= {0, 1, 2, 3} and len(buckets) >= 2


def test_ivf_results_are_subset_quality(spark, sf_smoke):
    """IVF cosines can never beat brute force at the same rank — each
    IVF neighbor must appear in the brute-force list with cosine ≥ the
    IVF rank-k cosine (recall loss only, never invention)."""
    brute = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in knn_cosine(spark, sf_smoke, n_queries=5, k=500).collect()
    }
    ivf = knn_cosine_ivf(spark, sf_smoke, n_queries=5, k=3).collect()
    assert len(ivf) > 0
    for r in ivf:
        assert (r.query_id, r.neighbor_id) in brute
        assert abs(brute[(r.query_id, r.neighbor_id)] - r.cosine) < 1e-9


def test_cosine_pandas_udf_matches_fold(spark, sf_smoke):
    """The Arrow-vectorized numpy kernel and the JVM sequential fold
    must agree to float tolerance (order of additions differs)."""
    from pyspark.sql import functions as F

    from heatmap_spark.operators.similarity import (
        cosine_pandas_udf,
        dot_expr,
        norm_expr,
    )
    from heatmap_spark.sources.tables import load_table

    emb = load_table(spark, sf_smoke, "embeddings").limit(64)
    a = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    b = a.select(
        F.col("vec_id").alias("vec_id_b"), F.col("v").alias("w")
    ).where(F.col("vec_id_b") < 8)
    pairs = a.crossJoin(b)
    cos = cosine_pandas_udf()
    both = pairs.select(
        "vec_id",
        "vec_id_b",
        (dot_expr(F.col("v"), F.col("w")) / (norm_expr(F.col("v")) * norm_expr(F.col("w")))).alias("jvm"),
        cos(F.col("v"), F.col("w")).alias("py"),
    ).collect()
    assert both
    for r in both:
        assert abs(r.jvm - r.py) < 1e-9


def test_kmeans_training_improves_ivf_recall(spark, sf_correct):
    """Lloyd iterations on the seed codebook must improve (deterministic
    fixture: 0.22 -> 0.40 recall@5 at sf0.01) — and every vector stays
    assigned to exactly one in-range bucket."""
    from heatmap_spark.operators.similarity import (
        ivf_assign,
        knn_cosine_df,
        knn_cosine_ivf_df,
    )

    emb = load_table(spark, sf_correct, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    exact = {
        (r.query_id, r.neighbor_id)
        for r in knn_cosine_df(emb, 10, 5).collect()
    }

    def recall(iters):
        a = ivf_assign(emb, 8, train_iters=iters)
        assert a.count() == emb.count()
        assert a.where((F.col("bucket") < 0) | (F.col("bucket") >= 8)).count() == 0
        got = {
            (r.query_id, r.neighbor_id)
            for r in knn_cosine_ivf_df(emb, 10, 5, assigned=a).collect()
        }
        return len(exact & got) / len(exact)

    r0, r2 = recall(0), recall(2)
    assert r2 > r0, (r0, r2)


def test_embedding_near_dup_bucketed_subset_of_exact(spark, sf_smoke):
    """The declared near-dup operator (IVF multi-assign candidates) may
    only lose pairs vs the exact all-pairs baseline, never invent them,
    and its plan must not contain a CartesianProduct."""
    from heatmap_spark.operators.similarity import (
        embedding_near_dup_pairs,
        embedding_near_dup_pairs_exact,
    )

    exact = {
        (r.vec_id_a, r.vec_id_b): r.cosine
        for r in embedding_near_dup_pairs_exact(spark, sf_smoke).collect()
    }
    bucketed_df = embedding_near_dup_pairs(spark, sf_smoke)
    bucketed = {
        (r.vec_id_a, r.vec_id_b): r.cosine for r in bucketed_df.collect()
    }
    assert bucketed, "bucketed near-dup returned no pairs"
    assert set(bucketed) <= set(exact)
    for k, v in bucketed.items():
        assert abs(exact[k] - v) < 1e-9
    plan = bucketed_df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_ivf_nprobe_all_equals_brute_force(spark, sf_smoke):
    """nprobe = n_buckets probes every bucket, so the IVF path must be
    row-for-row identical to the exact brute force."""
    from heatmap_spark.operators.similarity import knn_cosine, knn_cosine_ivf

    brute = {
        (r.query_id, r.neighbor_id, r.cosine, r.rank)
        for r in knn_cosine(spark, sf_smoke, n_queries=5, k=3).collect()
    }
    ivf = {
        (r.query_id, r.neighbor_id, r.cosine, r.rank)
        for r in knn_cosine_ivf(
            spark, sf_smoke, n_queries=5, k=3, n_buckets=4, nprobe=4
        ).collect()
    }
    assert brute == ivf


def test_trajectory_similarity_invariants(spark, sf_correct):
    """Top-k trajectory pairs: jaccard in (0, 1], sorted descending
    with deterministic id tiebreaks, and symmetric pairs never repeat."""
    from heatmap_spark.operators.similarity import trajectory_similarity

    rows = trajectory_similarity(spark, sf_correct, k=20).collect()
    assert 0 < len(rows) <= 20
    seen = set()
    prev = None
    for r in rows:
        assert r.user_a < r.user_b
        assert 0.0 < r.jaccard <= 1.0
        key = (r.user_a, r.user_b)
        assert key not in seen
        seen.add(key)
        cur = (-r.jaccard, r.user_a, r.user_b)
        if prev is not None:
            assert cur >= prev
        prev = cur


def test_semantic_dedup_greedy_policy(spark, sf_smoke):
    """Every vector appears exactly once; a vector is dropped iff it is
    the HIGHER id of some near-dup pair — the greedy keep-lowest rule."""
    from heatmap_spark.operators.similarity import (
        embedding_near_dup_pairs,
        semantic_dedup,
    )

    decisions = {
        r["vec_id"]: r["keep"]
        for r in semantic_dedup(spark, sf_smoke).collect()
    }
    pairs = embedding_near_dup_pairs(spark, sf_smoke).collect()
    should_drop = {r["vec_id_b"] for r in pairs}
    dropped = {v for v, keep in decisions.items() if not keep}
    assert dropped == should_drop
    # lowest id of any pair is never dropped unless it's also a b-side
    a_only = {r["vec_id_a"] for r in pairs} - should_drop
    assert all(decisions[v] for v in a_only)


def test_pq_roundtrip_and_recall(spark, sf_correct):
    """PQ codebooks/encode/ADC: codes are valid (m entries in [0, k)),
    encoding is deterministic, and shortlist+rerank recall@5 clears the
    registry pin (the declared query raises below 0.7)."""
    from pyspark.sql import functions as F

    from heatmap_spark.operators.similarity import (
        pq_codebooks,
        pq_encode,
        pq_recall,
    )
    from heatmap_spark.sources.tables import load_table

    m, k = 16, 32
    emb = load_table(spark, sf_correct, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    cb = pq_codebooks(emb, m, k, train_iters=1)
    assert set(cb) == {(s, c) for s in range(m) for c in range(k)}
    assert all(len(v) == 64 // m for v in cb.values())
    codes = pq_encode(emb, cb, m, k)
    row = codes.first()
    assert len(row.codes) == m and all(0 <= c < k for c in row.codes)
    again = pq_encode(emb, cb, m, k)
    assert codes.exceptAll(again).isEmpty()
    # the registry pin: raises if recall@5 < 0.7
    out = pq_recall(spark, sf_correct).collect()[0]
    assert out.recall >= 0.7 and out.bytes_per_vec_pq == m


def test_opq_rotation_is_orthonormal_and_beats_plain_pq(spark, sf_correct):
    """OPQ: the learned rotation is orthonormal (R·Rᵀ = I), rotation
    preserves cosine ranking inputs (norms), and at the 8 B/vec budget
    the pinned query clears its floor AND beats plain PQ at the same
    budget on the fixture."""
    import numpy as np
    from pyspark.sql import functions as F

    from heatmap_spark.operators.similarity import (
        opq_recall,
        opq_train,
        rotate_vectors,
    )
    from heatmap_spark.sources.tables import load_table

    m, k = 8, 32
    emb = load_table(spark, sf_correct, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    R, cb = opq_train(emb, m, k, opq_iters=2, train_iters=1)
    Rm = np.asarray(R)
    assert Rm.shape == (64, 64)
    assert np.allclose(Rm @ Rm.T, np.eye(64), atol=1e-9)
    assert set(cb) == {(s, c) for s in range(m) for c in range(k)}
    # rotation preserves norms (unit in → unit out)
    nv = emb.select("vec_id", "vec").limit(20)
    rot = rotate_vectors(nv, R)
    norms = [
        r.n
        for r in rot.select(
            F.aggregate("vec", F.lit(0.0), lambda a, x: a + x * x).alias("n")
        ).collect()
    ]
    # input vectors aren't unit; compare against input norms instead
    in_norms = [
        r.n
        for r in nv.select(
            F.aggregate("vec", F.lit(0.0), lambda a, x: a + x * x).alias("n")
        ).collect()
    ]
    # rotate_vectors is applied to already-normalized vectors in opq_train;
    # here it sees raw vectors — norm preservation still holds
    assert np.allclose(sorted(norms), sorted(in_norms), rtol=1e-9)
    out = opq_recall(spark, sf_correct).collect()[0]
    assert out.recall_opq >= 0.8
    assert out.recall_opq > out.recall_pq, (
        "rotation should improve recall at 8 B/vec on this fixture"
    )
    assert out.bytes_per_vec == m


def test_ivfpq_index_and_recall_dial(spark, sf_correct):
    """IVFADC: codes carry (bucket, m codes in [0,k)); recall is
    non-decreasing in nprobe; full probe clears the registry pin; the
    candidate fraction scales with nprobe."""
    from pyspark.sql import functions as F

    from heatmap_spark.operators.similarity import ivfpq_build, ivfpq_recall
    from heatmap_spark.sources.tables import load_table

    n_buckets, m, k = 8, 8, 32
    emb = load_table(spark, sf_correct, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    coarse, cb, codes = ivfpq_build(emb, n_buckets, m, k)
    assert set(coarse) == set(range(n_buckets))
    assert set(cb) == {(s, c) for s in range(m) for c in range(k)}
    row = codes.first()
    assert 0 <= row["bucket"] < n_buckets
    assert len(row["codes"]) == m and all(0 <= c < k for c in row["codes"])
    assert codes.count() == emb.count()

    out = {r["nprobe"]: r for r in ivfpq_recall(spark, sf_correct).collect()}
    nprobes = sorted(out)
    recalls = [out[p]["recall"] for p in nprobes]
    assert recalls == sorted(recalls), "recall must not decrease with nprobe"
    assert out[n_buckets]["recall"] >= 0.6
    assert out[n_buckets]["candidate_frac"] == 1.0
    assert out[nprobes[0]]["candidate_frac"] < 1.0


def test_ivfpq_opq_compose(spark, sf_correct):
    """OPQ+IVFPQ chain: R is orthonormal; codes are well-formed over
    the full corpus; the full-probe composed recall clears the 0.75
    registry pin and the comparison row carries plain IVFPQ at the
    same budget."""
    import numpy as np
    from pyspark.sql import functions as F

    from heatmap_spark.operators.similarity import (
        ivfpq_opq_build,
        ivfpq_opq_recall,
    )
    from heatmap_spark.sources.tables import load_table

    n_buckets, m, k = 8, 8, 32
    emb = load_table(spark, sf_correct, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    coarse, R, cb, codes = ivfpq_opq_build(emb, n_buckets, m, k, opq_iters=2)
    Rm = np.asarray(R)
    assert np.allclose(Rm @ Rm.T, np.eye(Rm.shape[0]), atol=1e-8)
    assert set(coarse) == set(range(n_buckets))
    row = codes.first()
    assert 0 <= row["bucket"] < n_buckets
    assert len(row["codes"]) == m and all(0 <= c < k for c in row["codes"])
    assert codes.count() == emb.count()

    out = {r["nprobe"]: r for r in ivfpq_opq_recall(spark, sf_correct).collect()}
    full = out[n_buckets]
    assert full["candidate_frac"] == 1.0
    assert full["recall_opq"] >= 0.75
    assert 0.0 <= full["recall_plain"] <= 1.0


def test_hybrid_rrf_fusion_invariants(spark, sf_smoke):
    """RRF fusion: every row's score equals 1/(60+rank) summed over the
    arms it appears in; docs present in BOTH arms dominate docs of the
    same ranks present in one; ranks are dense positive ints."""
    from heatmap_spark.operators.similarity import hybrid_rrf

    out = hybrid_rrf(spark, sf_smoke, k=20, depth=100).collect()
    assert 0 < len(out) <= 20
    for r in out:
        assert r["rank_sparse"] is not None or r["rank_dense"] is not None
        expect = 0.0
        if r["rank_sparse"] is not None:
            assert r["rank_sparse"] >= 1
            expect += 1.0 / (60.0 + r["rank_sparse"])
        if r["rank_dense"] is not None:
            assert r["rank_dense"] >= 1
            expect += 1.0 / (60.0 + r["rank_dense"])
        assert abs(r["rrf"] - round(expect, 9)) < 1e-12
    # output is sorted by (rrf DESC, doc_id ASC)
    keys = [(-r["rrf"], r["doc_id"]) for r in out]
    assert keys == sorted(keys)


def test_knn_sq8_codes_and_recall(spark, sf_smoke):
    """SQ8 codes are clamped int8-range ints of the unit-normalized
    coords; symmetric integer search keeps recall@5 >= 0.8 vs exact
    cosine (measured 0.96 at sf0.001 / 0.94 at sf0.01)."""
    from pyspark.sql import functions as F

    from heatmap_spark.operators.similarity import knn_sq8, sq8_codes
    from heatmap_spark.sources.tables import load_table

    emb = load_table(spark, sf_smoke, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    row = sq8_codes(emb).first()
    assert all(-127 <= c <= 127 for c in row["code"])

    out = knn_sq8(spark, sf_smoke).localCheckpoint(eager=True)
    assert out.count() == 50  # 10 queries x top-5
    recall = out.agg(F.avg(F.col("in_exact_topk").cast("double"))).first()[0]
    assert recall >= 0.8


def test_bitext_margin_mining_decision_surface(spark, sf_smoke):
    """One row per source; best_tgt is the argmax-cosine target; the
    margin >= 1 by construction (best >= mean of top-k); the 1.2
    threshold splits the verdicts at both fixture tiers."""
    from pyspark.sql import functions as F

    from heatmap_spark.operators.similarity import bitext_margin_mining
    from heatmap_spark.sources.tables import load_table

    out = bitext_margin_mining(spark, sf_smoke).localCheckpoint(eager=True)
    n_src = (
        load_table(spark, sf_smoke, "embeddings").where(F.col("label") == 0).count()
    )
    assert out.count() == n_src
    rows = out.collect()
    assert all(r["margin"] >= 1.0 for r in rows)
    verdicts = {r["accepted"] for r in rows}
    assert verdicts == {True, False}
    assert all((r["margin"] > 1.2) == r["accepted"] for r in rows)


def test_knn_sq8_rerank_recovers_exact_topk(spark, sf_smoke):
    """Two-stage SQ8-shortlist + exact-rerank recovers the exact top-5
    perfectly at shortlist depth 20 (recall 1.0 at both fixture
    tiers, pinned >= 0.95) — the rerank stage's job."""
    from pyspark.sql import functions as F

    from heatmap_spark.operators.similarity import knn_sq8_rerank

    out = knn_sq8_rerank(spark, sf_smoke).localCheckpoint(eager=True)
    assert out.count() == 50
    recall = out.agg(F.avg(F.col("in_exact_topk").cast("double"))).first()[0]
    assert recall >= 0.95


def test_kmeans_empty_initial_cluster_preseeded(spark, sf_smoke, tmp_path):
    """A residue class of vec_id % k that is UNPOPULATED at the first
    assignment (here: all-even vec_ids with k=2) must not crash the
    distance expression — the empty cluster falls back to its
    deterministic pre-seed and the run completes with every vector
    assigned."""
    from pyspark.sql import functions as F

    from heatmap_spark.operators.similarity import kmeans_embeddings
    from heatmap_spark.sources.tables import load_table

    emb = (
        load_table(spark, sf_smoke, "embeddings")
        .where(F.col("vec_id") < 10)
        .withColumn("vec_id", F.col("vec_id") * 2)  # only even residues
    )
    emb.write.parquet(str(tmp_path / "embeddings.parquet"))
    out = kmeans_embeddings(spark, str(tmp_path), k=2, iters=2)
    rows = out.collect()
    assert len(rows) == 10
    assert {r["cluster"] for r in rows} <= {0, 1}
    assert all(r["cluster_size"] >= 1 for r in rows)


def test_nn_descent_graph_invariants(spark, sf_smoke):
    """NN-Descent: ≤ degree+long_links out-edges per vertex, no
    self-loops, every vertex present, deterministic rebuild, and each
    descent round must IMPROVE mean NEAR-neighbor similarity (the
    algorithm's contract: 2-hop exploration only ever replaces an edge
    with a closer one; the retained random long links are shared by
    both builds, so they cancel in the comparison only if excluded —
    compare per-src top-degree edges)."""
    from heatmap_spark.operators.similarity import nn_descent_graph

    emb = load_table(spark, sf_smoke, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    n = emb.count()
    g0 = nn_descent_graph(emb, degree=6, iters=0, long_links=2)
    g2 = nn_descent_graph(emb, degree=6, iters=2, long_links=2)
    from pyspark.sql.window import Window as W

    wtop = W.partitionBy("src").orderBy(F.desc("sim"), F.asc("dst"))

    def near(g):
        return g.select(
            "src", "dst", "sim", F.row_number().over(wtop).alias("rn")
        ).where(F.col("rn") <= 6)

    for g in (g0, g2):
        assert g.where(F.col("src") == F.col("dst")).count() == 0
        assert g.select("src").distinct().count() == n
        deg = g.groupBy("src").count().agg(F.max("count")).first()[0]
        assert deg <= 6 + 2
    m0 = near(g0).agg(F.avg("sim")).first()[0]
    m2 = near(g2).agg(F.avg("sim")).first()[0]
    assert m2 > m0, (m0, m2)
    # deterministic rebuild: identical edge sets
    g2b = nn_descent_graph(emb, degree=6, iters=2)
    assert g2.select("src", "dst").exceptAll(g2b.select("src", "dst")).isEmpty()


def test_graph_beam_search_properties(spark, sf_smoke):
    """Beam search returns exactly k ranked rows per query with the
    query itself excluded; widening the traversal (more hops) never
    lowers recall vs exact, and exhaustive beam == corpus recovers
    the exact top-k (the brute-force degenerate case)."""
    from heatmap_spark.operators.similarity import (
        graph_beam_search,
        knn_cosine_df,
        nn_descent_graph,
    )

    emb = load_table(spark, sf_smoke, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    graph = nn_descent_graph(emb, degree=12, iters=4)
    exact = knn_cosine_df(emb, 5, 3).select("query_id", "neighbor_id")
    assert graph.count() > 0
    ne = exact.count()

    res = graph_beam_search(emb, graph, n_queries=5, k=3).collect()
    per_q = {}
    for r in res:
        assert r.neighbor_id != r.query_id
        per_q.setdefault(r.query_id, []).append(r.rank)
    assert set(per_q) == {0, 1, 2, 3, 4}
    assert all(sorted(v) == [1, 2, 3] for v in per_q.values())

    def recall(hops, beam=16):
        a = graph_beam_search(emb, graph, 5, 3, beam=beam, hops=hops)
        return exact.join(
            a.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"]
        ).count() / ne

    assert recall(4) >= recall(1)
    # beam == corpus and enough hops to reach everything ⇒ exact
    n = emb.count()
    assert recall(hops=6, beam=n) == 1.0


def test_graph_beam_search_filtered_slice(spark, sf_smoke):
    """Filtered graph search (the filtered-HNSW recipe): traversal is
    unrestricted, the final ranking joins the allowed slice — every
    answer satisfies the filter, and against the exact FILTERED top-k
    (the knn_cosine_filtered semantics) recall stays useful at a
    widened beam."""
    from pyspark.sql import functions as F2

    from heatmap_spark.operators.similarity import (
        hnsw_hierarchy,
        hnsw_search,
        knn_cosine_filtered,
    )
    from heatmap_spark.sources.tables import load_table

    emb = load_table(spark, sf_smoke, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    allowed = (
        load_table(spark, sf_smoke, "documents")
        .where(F2.col("lang") == "en")
        .select(F2.col("doc_id").alias("vec_id"))
    )
    graphs = hnsw_hierarchy(emb)
    got = hnsw_search(emb, graphs, 10, 5, beam=32, hops=5, allowed=allowed)
    ids = {r["vec_id"] for r in allowed.collect()}
    rows = got.collect()
    assert rows and all(r["neighbor_id"] in ids for r in rows)
    exact = knn_cosine_filtered(spark, sf_smoke).select(
        "query_id", "neighbor_id"
    )
    ne = exact.count()
    hits = exact.join(
        got.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"]
    ).count()
    assert hits / ne >= 0.6, hits / ne


def test_binary_codes_pack_signs_exactly(spark, sf_smoke):
    """code_lo/code_hi reproduce a pure-python sign packing, and
    Hamming distances match numpy popcounts."""
    from heatmap_spark.operators.similarity import binary_codes
    from heatmap_spark.sources.tables import load_table

    emb = load_table(spark, sf_smoke, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    rows = {r["vec_id"]: r for r in binary_codes(emb).collect()}
    for r in emb.limit(50).collect():
        lo = sum(1 << i for i in range(32) if r["vec"][i] > 0)
        hi = sum(1 << i for i in range(32) if r["vec"][i + 32] > 0)
        got = rows[r["vec_id"]]
        assert (got["code_lo"], got["code_hi"]) == (lo, hi), r["vec_id"]


def test_knn_binary_rerank_recall(spark, sf_smoke):
    """Two-stage binary search: exact agreement flags give realized
    recall ≥ 0.8 at shortlist 64 on the fixture, ranks are 1..5 per
    query, and Hamming distances are within [0, 64]."""
    from heatmap_spark.operators.similarity import knn_binary_rerank

    rows = knn_binary_rerank(spark, sf_smoke).collect()
    by_q = {}
    for r in rows:
        assert 0 <= r["hamming"] <= 64
        by_q.setdefault(r["query_id"], []).append(r)
    assert len(by_q) == 10
    hits = total = 0
    for q, rs in by_q.items():
        assert sorted(r["rank"] for r in rs) == [1, 2, 3, 4, 5]
        hits += sum(1 for r in rs if r["in_exact_topk"])
        total += len(rs)
    assert hits / total >= 0.8, hits / total


def test_adaptive_beam_schedule():
    """beam=None derives ~2·log2(N) with floor 16: fixture-sized
    corpora stay at the floor (registry pins unchanged) while the
    probe ladder gets the widths that held recall@5 at 0.98/0.96/0.94
    (20k/50k/100k clustered — BASELINE.md)."""
    from heatmap_spark.operators.similarity import adaptive_beam

    assert adaptive_beam(2) == 16
    assert adaptive_beam(500) == 18
    assert adaptive_beam(20_000) == 29
    assert adaptive_beam(50_000) == 31
    assert adaptive_beam(100_000) == 33
    assert adaptive_beam(100_000_000) == 53
    assert adaptive_beam(500, floor=32) == 32


def test_rabitq_estimator_dominates_hamming(spark, sf_smoke):
    """On the NEAR-ISOTROPIC fixture the asymmetric RaBitQ estimator
    sees query magnitudes the symmetric Hamming distance throws away,
    so at the same shortlist size its realized recall@5 must be at
    least the Hamming path's (measured 1.00 vs 0.86; and ≥ 0.8, the
    family pin); ranks are 1..5 per query and the rerank cosine is
    exact.  The clustered-corpus regime where the order flips is the
    scale probe's territory (rabitq_codes docstring)."""
    from heatmap_spark.operators.similarity import (
        knn_binary_rerank,
        knn_rabitq_rerank,
    )

    def recall(rows):
        return sum(1 for r in rows if r["in_exact_topk"]) / len(rows)

    ham = knn_binary_rerank(spark, sf_smoke).collect()
    rab = knn_rabitq_rerank(spark, sf_smoke).collect()
    assert len(rab) == 50
    by_q = {}
    for r in rab:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in by_q.values())
    assert recall(rab) >= recall(ham) >= 0.8, (recall(rab), recall(ham))


def test_lit_double_arrays_bitwise_equals_column_spelling(spark):
    """lit_double_arrays (one SQL parse) must produce the bit-identical
    literal tree the per-element F.array/F.lit spelling builds — the
    whole point is removing thousands of py4j roundtrips per trained
    codebook WITHOUT touching a single float (oracle hashes depend on
    it).  Exercises the repr() round-trip on the nasty cases: -0.0,
    subnormal-adjacent, max-double, shortest-repr exponents."""
    import random
    import struct

    from heatmap_spark.operators.similarity import lit_double_arrays

    rnd = random.Random(13)
    vals = [[rnd.uniform(-1e6, 1e6) for _ in range(16)] for _ in range(8)]
    vals[0][:4] = [-0.0, 1e-300, 1.7976931348623157e308, 3.141592653589793e-17]
    old = F.array(*[F.array(*[F.lit(float(x)) for x in row]) for row in vals])
    row = spark.range(1).select(
        old.alias("o"), lit_double_arrays(vals).alias("n")
    ).first()
    pack = lambda arr: [struct.pack("<d", v) for sub in arr for v in sub]  # noqa: E731
    assert pack(row["o"]) == pack(row["n"])
