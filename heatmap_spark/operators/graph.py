"""Graph operators over derived document-similarity graphs.

Connected components (operators/dedup.py) picks *a* canonical doc per
near-dup cluster; PageRank ranks docs *within* the similarity graph —
the standard centrality signal for choosing which duplicate to keep in
a training-data pipeline.

Exactness policy: the iteration runs in FIXED-POINT INTEGER arithmetic
(ranks scaled to parts-per-trillion, integer division everywhere).
Floating-point PageRank is partition-order-dependent (double sums do
not reassociate); the integer form is bit-identical on any cluster, any
partitioning, and in DuckDB — so an iterative algorithm becomes
oracle-checkable, and a 1000-executor production run is reproducible
run-to-run.

Scale: each iteration is one join (edges × ranks — ranks is the small
side after aggregation) + one groupBy on the destination node; the
edge list and degree table are persisted once and reused across
iterations.  Fixed iteration count (power iteration converges
geometrically; 3 suffices for a ranking signal on near-dup clusters,
which are small-diameter by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from heatmap_spark.operators.dedup import minhash_lsh_candidates

SCALE = 10**12  # ranks in parts-per-trillion


def pagerank_fixed_point(pairs: DataFrame, iters: int = 3) -> DataFrame:
    """(doc_a, doc_b) undirected pairs → (doc_id, rank_ppt).

    r0 = SCALE div N;  r' = (15·SCALE) div (100·N) + (85·Σ(r div deg)) div 100
    — every operation integer, so the result is independent of
    partitioning and summation order.

    Cache lifetime: edges/deg are DISK_ONLY-persisted for reuse across
    the ``iters`` join rounds, the final ranks (one small row per node)
    are materialized eagerly via localCheckpoint, and the persisted
    blocks are released before returning — repeated invocations do not
    accumulate cached blocks for the app lifetime (same discipline as
    passage dedup's window cache).
    """
    from pyspark.storagelevel import StorageLevel

    edges = (
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .unionByName(pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v")))
        .persist(StorageLevel.DISK_ONLY)
    )
    deg = (
        edges.groupBy("u")
        .agg(F.count(F.lit(1)).alias("d"))
        .persist(StorageLevel.DISK_ONLY)
    )
    try:
        ncnt = deg.agg(F.count(F.lit(1)).alias("n"))  # 1 row, broadcast

        ranks = deg.crossJoin(F.broadcast(ncnt)).select(
            F.col("u").alias("node"), F.expr(f"{SCALE} div n").alias("r")
        )
        for _ in range(iters):
            contribs = (
                edges.join(ranks.withColumnRenamed("node", "u"), "u")
                .join(deg, "u")
                .groupBy(F.col("v").alias("node"))
                .agg(F.sum(F.expr("r div d")).alias("contrib"))
            )
            ranks = contribs.crossJoin(F.broadcast(ncnt)).select(
                "node",
                F.expr(
                    f"(15 * {SCALE}) div (100 * n) + (85 * contrib) div 100"
                ).alias("r"),
            )
        out = ranks.select(
            F.col("node").alias("doc_id"), F.col("r").alias("rank_ppt")
        )
        # Materialize (all iterations run against the cached edges/deg
        # here), then the finally releases the caches.
        return out.localCheckpoint(eager=True)
    finally:
        edges.unpersist()
        deg.unpersist()


def pagerank_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared query: PageRank over the MinHash-LSH candidate graph."""
    return pagerank_fixed_point(minhash_lsh_candidates(spark, sf_dir))


def triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the near-dup candidate graph: one row
    (n_nodes, n_edges, n_triangles).

    Triangles = oriented 3-cliques over the canonical (doc_a < doc_b)
    edge list: join ab⋈bc on the shared middle vertex, then close the
    wedge against ac.  The a<b<c orientation counts each triangle
    exactly once and keeps both joins equi-joins (shuffle on one key
    each, broadcastable when the edge list is small).  Triangle density
    distinguishes true duplicate *clusters* (cliquish) from chains of
    borderline pairs — a useful dedup-quality signal at scale.

    Reference: none — SURVEY.md §2.8 (graph extension).
    """
    pairs = minhash_lsh_candidates(spark, sf_dir).select("doc_a", "doc_b")
    ab = pairs.alias("ab")
    bc = pairs.alias("bc")
    ac = pairs.alias("ac")
    wedges = ab.join(bc, F.col("ab.doc_b") == F.col("bc.doc_a"))
    tris = wedges.join(
        ac,
        (F.col("ac.doc_a") == F.col("ab.doc_a"))
        & (F.col("ac.doc_b") == F.col("bc.doc_b")),
    )
    nodes = pairs.select(F.col("doc_a").alias("d")).unionByName(
        pairs.select(F.col("doc_b").alias("d"))
    ).distinct()
    return (
        tris.agg(F.count(F.lit(1)).alias("n_triangles"))
        .crossJoin(pairs.agg(F.count(F.lit(1)).alias("n_edges")))
        .crossJoin(nodes.agg(F.count(F.lit(1)).alias("n_nodes")))
        .select("n_nodes", "n_edges", "n_triangles")
    )


def link_prediction_common_neighbors(
    spark: SparkSession, sf_dir: str, top: int = 20
) -> DataFrame:
    """Link prediction on the co-purchase graph by common-neighbor
    count (the classic CN score): parts never bought together but
    whose neighborhoods overlap — for every NON-edge pair (u < v)
    reachable in two hops, score = |N(u) ∩ N(v)|.  This is the
    "customers also bought" recommender primitive.  (The near-dup doc
    graph is unsuitable here: LSH candidate clusters are cliques, so
    its two-hop non-edge set is empty by construction.)

    Distributed shape: two-hop self-join THROUGH the shared neighbor
    (u–w, w–v) — pairs only form where a witness exists, never
    all-pairs — minus existing edges via left-anti join; the two-hop
    blowup is bounded by degree² per node, the standard CN cost.
    Deterministic top-k via TakeOrderedAndProject:
    (score desc, doc_a, doc_b).
    """
    from heatmap_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("pb"))
    cand = (
        a.join(b, "o")
        .where(F.col("pa") < F.col("pb"))
        .select(F.col("pa").alias("doc_a"), F.col("pb").alias("doc_b"))
        .distinct()
    )
    edges = (
        cand.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .union(cand.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v")))
        .distinct()
    )
    e1 = edges.select(F.col("u").alias("a"), F.col("v").alias("w"))
    e2 = edges.select(F.col("u").alias("w"), F.col("v").alias("b"))
    two_hop = (
        e1.join(e2, "w")
        .where(F.col("a") < F.col("b"))
        .groupBy(F.col("a").alias("doc_a"), F.col("b").alias("doc_b"))
        .agg(F.count("*").alias("common_neighbors"))
    )
    non_edges = two_hop.join(
        cand.select("doc_a", "doc_b"), ["doc_a", "doc_b"], "left_anti"
    )
    from pyspark.sql.window import Window as W

    # distributed top-k first (TakeOrderedAndProject — per-partition
    # heaps, no global sort), then rank the ≤top surviving rows
    topk = non_edges.orderBy(
        F.desc("common_neighbors"), F.asc("doc_a"), F.asc("doc_b")
    ).limit(top)
    w = W.orderBy(F.desc("common_neighbors"), F.asc("doc_a"), F.asc("doc_b"))
    return topk.select(
        F.row_number().over(w).cast("int").alias("rank"),
        "doc_a",
        "doc_b",
        "common_neighbors",
    )


def hash_walks(
    spark: SparkSession, sf_dir: str, n_steps: int = 3
) -> DataFrame:
    """Deterministic ``n_steps``-step walks over the near-dup graph —
    the DeepWalk/node2vec corpus-generation primitive made exact: at
    step k a walker at node u moves to the neighbor v minimizing
    md5(u_k_v), a reproducible stand-in for the RNG choice (same
    paths on any engine, run, or partitioning — which also makes the
    walk corpus oracle-checkable).  Walkers start at every node; a
    node with no outgoing edge ends its walk early.

    Scale shape: the next-hop table (argmin per (node, step) — ONE
    row_number window over edges × steps) is computed once, then each
    step is an equi-join of the frontier against it; n_steps joins
    total, never an all-pairs product.  Walk storage is O(nodes ·
    steps).

    Reference: none — SURVEY.md §2.8 graph family (walk corpus for
    embedding training).
    """
    from pyspark.sql.window import Window as W

    cand = minhash_lsh_candidates(spark, sf_dir).select("doc_a", "doc_b")
    adj = cand.select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    ).unionByName(
        cand.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
    )
    ks = F.explode(F.array(*[F.lit(k) for k in range(1, n_steps + 1)])).alias("k")
    pri = F.md5(
        F.concat_ws(
            "_",
            F.col("u").cast("string"),
            F.col("k").cast("string"),
            F.col("v").cast("string"),
        )
    )
    w = W.partitionBy("u", "k").orderBy(pri)
    nexthop = (
        adj.select("u", "v", ks)
        .select("u", "k", "v", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") == 1)
        .select("u", "k", "v")
    )
    starts = adj.select(F.col("u").alias("node")).distinct()
    frontier = starts.select(
        F.col("node").alias("start_id"), F.lit(0).alias("step"), "node"
    )
    paths = [frontier]
    cur = frontier
    for k in range(1, n_steps + 1):
        nh = nexthop.where(F.col("k") == k).select(
            F.col("u").alias("node"), F.col("v").alias("nxt")
        )
        cur = (
            cur.join(nh, "node")
            .select("start_id", F.lit(k).alias("step"), F.col("nxt").alias("node"))
        )
        paths.append(cur)
    out = paths[0]
    for p in paths[1:]:
        out = out.unionByName(p)
    return out.select(
        "start_id", F.col("step").cast("int").alias("step"), F.col("node").alias("node_id")
    )
