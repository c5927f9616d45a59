#!/usr/bin/env python
"""Operator scale probes at ~100x the sf0.1 fixture, all synthetic and
deterministic (spark.range arithmetic — no fixture reads, no RNG).
Referenced by BASELINE.md.

    python scripts/scale_probe.py [n_points]          # pyramid (default 10M)
    python scripts/scale_probe.py dedup [n_docs]      # MinHash-LSH (default 500k)
    python scripts/scale_probe.py knn [n_vecs]        # brute vs IVF (default 1M)
    python scripts/scale_probe.py gapfill [n_events]  # dense-grid LOCF (default 10M)
    python scripts/scale_probe.py pagerank [n_nodes]  # 3-iter fixed point (default 2M)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from heatmap_spark import get_spark
from heatmap_spark.operators import pyramid as P


def synthetic_locations(spark, n: int):
    return spark.range(n).select(
        (F.expr("CAST(mod(id * 104729, 170000) AS DOUBLE)") / 1000.0 - 85.0).alias("latitude"),
        (F.expr("CAST(mod(id * 7919, 360000) AS DOUBLE)") / 1000.0 - 180.0).alias("longitude"),
        F.timestamp_millis(F.lit(1700000000000) + F.col("id") % 2592000000).alias("ts"),
        F.concat(F.lit("u"), (F.col("id") % 5000).cast("string")).alias("user_id"),
        F.when(F.col("id") % 20 == 0, F.lit("background"))
        .otherwise(F.lit("gps"))
        .alias("source"),
        F.lit(1.0).alias("weight"),
    )


def synthetic_documents(spark, n: int):
    """(doc_id, text): 60 tokens per doc, deterministic; every 13th doc
    repeats its predecessor's text so LSH has real duplicates to find.

    Token j of doc b is w[(b+1)(j+1) mod 999983].  The multiplicative
    form matters: two docs sharing any 3 consecutive tokens forces
    (b1+1) = (b2+1) mod 999983, and the prime exceeds any probe size we
    run, so the ONLY shingle collisions are the deliberate dups — an
    affine form (b·P + j·Q) makes every doc a shifted slice of one
    global sequence and the probe explodes into millions of accidental
    near-dup pairs (measured: 72M candidate pairs at 500k docs).
    """
    base = F.when(F.col("id") % 13 == 0, F.col("id") - 1).otherwise(F.col("id"))
    toks = F.transform(
        F.sequence(F.lit(0), F.lit(59)),
        lambda j: F.concat(
            F.lit("w"), (((base + 1) * (j + 1)) % 999983).cast("string")
        ),
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"), F.concat_ws(" ", toks).alias("text")
    )


def synthetic_embeddings(spark, n: int, dim: int = 64):
    """(vec_id, vec): deterministic dense vectors in [0, 1)^dim."""
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (((F.col("id") * 31 + j * 7919) % 1000).cast("double") / 1000.0),
    )
    return spark.range(n).select(F.col("id").alias("vec_id"), vec.alias("vec"))


def synthetic_dup_embeddings(spark, n: int):
    """CENTERED murmur3-mixed vectors (unlike synthetic_embeddings'
    [0,1)^dim, whose positive-orthant cosines cluster near 1, and
    unlike lattice arithmetic, whose orbits alias into massive
    accidental duplicate classes), with every 13th vector a tiny
    perturbation of its predecessor — the planted dups to find."""
    base = F.when(F.col("id") % 13 == 0, F.col("id") - 1).otherwise(F.col("id"))
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda j: (F.pmod(F.hash(base, j), F.lit(1000)).cast("double") / 1000.0 - 0.5)
        + F.when(F.col("id") % 13 == 0, (F.col("id") % 7).cast("double") / 1e4).otherwise(F.lit(0.0)),
    )
    return spark.range(n).select(F.col("id").alias("vec_id"), vec.alias("vec"))


def synthetic_clustered_embeddings(spark, n: int, centers: int = 256, dim: int = 64):
    """(vec_id, vec): CLUSTERED vectors — center (id % centers) plus
    small per-vector noise.  Real embedding corpora are clustered;
    uniform-random vectors are the degenerate worst case for graph
    navigation (no structure to navigate)."""
    c = F.col("id") % centers
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (F.pmod(F.hash(c, j), F.lit(1000)).cast("double") / 1000.0 - 0.5)
        + (F.pmod(F.hash(F.col("id"), j), F.lit(100)).cast("double") / 1000.0 - 0.05),
    )
    return spark.range(n).select(F.col("id").alias("vec_id"), vec.alias("vec"))


def probe_pyramid(spark, n: int) -> None:
    loc = synthetic_locations(spark, n)
    loc.count()  # warm
    visible = round(n * 0.95)
    for mode in ("explode", "cascade"):
        t0 = time.perf_counter()
        P.build_pyramid(loc, mode=mode).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        print(f"{mode} {n:,} pts: {dt:.1f}s = {visible / dt / 1000:.0f}k pts/s")


def probe_dedup(spark, n: int) -> None:
    from heatmap_spark.operators.dedup import minhash_lsh_candidates_df

    docs = synthetic_documents(spark, n)
    docs.count()  # warm
    t0 = time.perf_counter()
    pairs = minhash_lsh_candidates_df(docs).count()
    dt = time.perf_counter() - t0
    print(f"minhash-lsh {n:,} docs: {dt:.1f}s = {n / dt / 1000:.0f}k docs/s, {pairs:,} candidate pairs")


def probe_knn(spark, n: int) -> None:
    from pyspark.storagelevel import StorageLevel

    from heatmap_spark.operators.similarity import (
        ivf_assign,
        knn_cosine_df,
        knn_cosine_ivf_df,
    )

    emb = synthetic_embeddings(spark, n)
    emb.count()  # warm
    t0 = time.perf_counter()
    rows = knn_cosine_df(emb).count()
    dt = time.perf_counter() - t0
    print(f"knn-brute {n:,} vecs x 10 queries: {dt:.1f}s = {n / dt / 1000:.0f}k vecs/s ({rows} rows)")

    # IVF lifecycle split: build (train codebook + assign, stored) vs query
    t0 = time.perf_counter()
    assigned = ivf_assign(emb).localCheckpoint(
        eager=True, storageLevel=StorageLevel.DISK_ONLY
    )
    build = time.perf_counter() - t0
    t0 = time.perf_counter()
    rows = knn_cosine_ivf_df(emb, assigned=assigned).count()
    query = time.perf_counter() - t0
    print(
        f"knn-ivf {n:,} vecs: build {build:.1f}s, query x 10 {query:.1f}s"
        f" = {n / query / 1000:.0f}k vecs/s ({rows} rows)"
    )

    # k-means-trained codebook: one Lloyd iteration of training cost
    t0 = time.perf_counter()
    trained = ivf_assign(emb, train_iters=1).localCheckpoint(
        eager=True, storageLevel=StorageLevel.DISK_ONLY
    )
    tbuild = time.perf_counter() - t0
    t0 = time.perf_counter()
    rows = knn_cosine_ivf_df(emb, assigned=trained).count()
    tquery = time.perf_counter() - t0
    print(
        f"knn-ivf-trained(1 iter) {n:,} vecs: build {tbuild:.1f}s,"
        f" query x 10 {tquery:.1f}s ({rows} rows)"
    )


def probe_neardup(spark, n: int) -> None:
    """Bucketed embedding near-dup at n vectors (default 100k), using
    the sign-LSH bucketing family: bucket count scales exponentially
    in plane count (here ~n/64 buckets) with linear assignment cost,
    so the pair join is quadratic only within a block, never
    globally — the family the IVF literal codebook hands over to when
    n_buckets must track corpus size."""
    import math

    from heatmap_spark.operators.similarity import (
        embedding_near_dup_pairs_df,
        hyperplane_assign,
    )

    emb = synthetic_dup_embeddings(spark, n)
    emb.count()  # warm
    n_planes = max(6, int(math.log2(max(n, 2) / 64)))
    t0 = time.perf_counter()
    assigned = hyperplane_assign(emb, n_planes=n_planes)
    pairs = embedding_near_dup_pairs_df(
        emb, threshold=0.99, assigned=assigned
    ).count()
    dt = time.perf_counter() - t0
    planted = n // 13
    print(
        f"embedding-near-dup {n:,} vecs, 2^{n_planes} sign-LSH buckets:"
        f" {dt:.1f}s = {n / dt / 1000:.0f}k vecs/s,"
        f" {pairs:,} pairs >= 0.99 (planted {planted:,})"
    )


def probe_curation(spark, n: int) -> None:
    """End-to-end fluent curation at n docs (default 500k): repetition
    filter → LSH near-dup removal → split, one composed plan.  (The
    quality/Gopher stage is map-only noise at probe scale and the
    synthetic docs all pass it; the expensive stages are the shingle
    pipelines.)"""
    from heatmap_spark.api import Corpus

    docs = synthetic_documents(spark, n)
    docs.count()  # warm
    t0 = time.perf_counter()
    out = (
        Corpus(spark)
        .from_documents(docs)
        .repetition_filter()
        .dedup("minhash")
        .split()
        .df()
        .count()
    )
    dt = time.perf_counter() - t0
    print(
        f"curation {n:,} docs -> {out:,} kept in {dt:.1f}s"
        f" = {n / dt / 1000:.0f}k docs/s"
    )


def probe_od(spark, n: int) -> None:
    """Origin-destination matrix at n points (default 10M): one lag
    window per user + one combinable groupBy — the episodes/funnel
    cost shape applied to the geo domain."""
    from heatmap_spark.functions import tiles as tl
    from pyspark.sql.window import Window as W

    loc = synthetic_locations(spark, n).where(F.col("source") != "background")
    loc.count()  # warm
    t0 = time.perf_counter()
    cells = loc.select(
        "user_id", "ts", "latitude", "longitude",
        tl.tile_id("latitude", "longitude", 6).alias("cell"),
    )
    w = W.partitionBy("user_id").orderBy("ts", "latitude", "longitude")
    trans = cells.select(
        "user_id",
        F.lag("cell").over(w).alias("from_cell"),
        F.col("cell").alias("to_cell"),
    ).where(F.col("from_cell").isNotNull())
    rows = trans.groupBy("from_cell", "to_cell").agg(
        F.count("*").alias("n_transitions")
    ).count()
    dt = time.perf_counter() - t0
    print(
        f"od-matrix {n:,} points -> {rows:,} directed flows in {dt:.1f}s"
        f" = {n / dt / 1e6:.1f}M pts/s"
    )


def probe_gapfill(spark, n: int) -> None:
    """Gap-fill 10M irregular events onto a dense (50 types x 30-day
    minute grid) — the spine join + LOCF window at 100x bench scale."""
    from heatmap_spark.operators.timeseries import gap_fill

    ev = spark.range(n).select(
        F.concat(F.lit("t"), (F.col("id") % 50).cast("string")).alias("event_type"),
        F.timestamp_millis(
            F.lit(1700000000000) + (F.col("id") * 7919) % (30 * 86400 * 1000)
        ).alias("ts"),
        ((F.col("id") % 1000) / 10.0).alias("value"),
    )
    t0 = time.perf_counter()
    out = gap_fill(ev, "event_type", "ts", "value", slot="minute")
    rows = out.count()
    dt = time.perf_counter() - t0
    print(
        f"gapfill {n:,} events -> {rows:,} grid slots in {dt:.1f}s"
        f" = {n / dt / 1000:.0f}k events/s"
    )


def probe_pagerank(spark, n: int) -> None:
    """Fixed-point PageRank, 3 iterations, on a ~2n-edge graph with
    heavy hubs (every id links to id//2 and id//3 — small ids collect
    millions of in-edges, stressing the per-iteration groupBy skew)."""
    from heatmap_spark.operators.graph import pagerank_fixed_point

    half = spark.range(2, n).select(
        F.col("id").alias("doc_a"), (F.col("id") / 2).cast("bigint").alias("doc_b")
    )
    third = spark.range(3, n).select(
        F.col("id").alias("doc_a"), (F.col("id") / 3).cast("bigint").alias("doc_b")
    )
    pairs = half.unionByName(third).where("doc_a <> doc_b")
    t0 = time.perf_counter()
    rows = pagerank_fixed_point(pairs, iters=3).count()
    dt = time.perf_counter() - t0
    n_edges = 2 * (2 * n - 5)  # symmetrized
    print(
        f"pagerank {rows:,} nodes / ~{n_edges:,} directed edges,"
        f" 3 iters in {dt:.1f}s = {n_edges * 3 / dt / 1e6:.1f}M edge-visits/s"
    )


def _synthetic_events(spark, n):
    """(user_id, ts, event_id, event_type) at ~100k users, deterministic."""
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 100_000).alias("user_id"),
        F.timestamp_millis(
            F.lit(1700000000000) + (F.col("id") * 7919) % (90 * 86400 * 1000)
        ).alias("ts"),
        # type depends on the user's k-th event (id div 100000), not just
        # id: the per-user stride (100000) times any multiplier is ≡ 0
        # mod 5, which would freeze each user's type forever
        F.element_at(
            F.array(*[F.lit(t) for t in ("view", "click", "purchase", "signup", "error")]),
            (((F.col("id") % 100_000 + F.col("id") / 100_000).cast("bigint") * 104729) % 5 + 1).cast("int"),
        ).alias("event_type"),
    )


def probe_funnel(spark, n: int) -> None:
    """Ordered view->click->purchase funnel over n events / 100k users —
    the chained-cumulative-window shape at 100x bench scale (one
    user_id shuffle regardless of n)."""
    from heatmap_spark.operators.sessions import event_funnel_df

    ev = _synthetic_events(spark, n)
    t0 = time.perf_counter()
    row = event_funnel_df(ev).collect()[0]
    dt = time.perf_counter() - t0
    print(
        f"funnel {n:,} events / {row.n_users:,} users in {dt:.1f}s"
        f" = {n / dt / 1e6:.1f}M events/s"
        f" (view {row.n_view:,} -> click {row.n_click_after_view:,}"
        f" -> purchase {row.n_purchase_after_funnel:,})"
    )


def probe_episodes(spark, n: int) -> None:
    """Gaps-and-islands episode collapse at 100x bench scale (single
    exchange: lag + running-sum island key)."""
    from heatmap_spark.operators.timeseries import state_episodes_df

    ev = _synthetic_events(spark, n)
    t0 = time.perf_counter()
    rows = state_episodes_df(ev).count()
    dt = time.perf_counter() - t0
    print(
        f"episodes {n:,} events -> {rows:,} episodes in {dt:.1f}s"
        f" = {n / dt / 1e6:.1f}M events/s"
    )


def probe_skew(spark, n: int) -> None:
    """Pyramid build under dense-city skew: 80% of n points land inside
    one ~0.1° box (a single zoom-21 neighborhood), the rest scatter
    globally.  This is the hot-tile shape BASELINE.md flags for 100 TB;
    AQE splits the oversized partial-aggregate partitions at runtime.
    Compare with `pyramid` (uniform scatter) — the skewed run should
    not be catastrophically slower than uniform."""
    from heatmap_spark.operators.pyramid import build_pyramid

    dense = F.col("id") % 5 != 0  # 80%
    loc = spark.range(n).select(
        F.when(
            dense, 40.0 + (F.col("id") % 1000) / 10000.0
        ).otherwise(
            F.expr("CAST(mod(id * 104729, 170000) AS DOUBLE)") / 1000.0 - 85.0
        ).alias("latitude"),
        F.when(
            dense, -74.0 + (F.expr("id div 7") % 1000) / 10000.0
        ).otherwise(
            F.expr("CAST(mod(id * 7919, 360000) AS DOUBLE)") / 1000.0 - 180.0
        ).alias("longitude"),
        F.timestamp_millis(F.lit(1700000000000) + F.col("id") % 86400000).alias("ts"),
        F.concat(F.lit("u"), (F.col("id") % 100_000).cast("string")).alias("user_id"),
        F.lit("gps").alias("source"),
        F.lit(1.0).alias("weight"),
    )
    t0 = time.perf_counter()
    rows = build_pyramid(loc, mode="explode").count()
    dt = time.perf_counter() - t0
    print(
        f"skewed pyramid {n:,} points (80% one city) -> {rows:,} tiles"
        f" in {dt:.1f}s = {n / dt / 1000:.0f}k pts/s"
    )



def probe_passages(spark, n: int) -> None:
    """duplicated_passages at ~100x sf0.1: every 13th doc repeats its
    predecessor's full 60-token text, so exactly 2*(n//13) docs must
    surface with every window duplicated (dup_frac 1.0)."""
    from heatmap_spark.operators.dedup import duplicated_passages_df

    docs = synthetic_documents(spark, n)
    docs.count()  # warm
    t0 = time.perf_counter()
    res = duplicated_passages_df(docs)
    flagged = res.where(F.col("n_dup_windows") > 0).count()
    dt = time.perf_counter() - t0
    expect = 2 * (n // 13) - (1 if n % 13 == 1 else 0)
    print(
        f"duplicated-passages {n:,} docs: {dt:.1f}s = {n / dt / 1000:.0f}k docs/s, "
        f"{flagged:,} docs flagged (expected ~{expect:,})"
    )
    # removal: planted full-dup docs must clean to EMPTY text; all
    # other docs survive untouched (token conservation check)
    from heatmap_spark.operators.dedup import remove_duplicated_passages_df

    t0 = time.perf_counter()
    rem = remove_duplicated_passages_df(docs)
    stats = rem.agg(
        F.count("*").alias("docs"),
        F.sum((F.col("n_removed") == F.col("n_tokens")).cast("int")).alias(
            "emptied"
        ),
        F.sum((F.col("n_removed") == 0).cast("int")).alias("untouched"),
    ).first()
    dt = time.perf_counter() - t0
    print(
        f"passage-removal {n:,} docs: {dt:.1f}s = {n / dt / 1000:.0f}k docs/s, "
        f"{stats.emptied:,} emptied (expected ~{expect:,}), "
        f"{stats.untouched:,} untouched"
    )


def probe_semdedup(spark, n: int) -> None:
    """semantic_dedup at scale with the sign-LSH bucket family (bucket
    count tracks corpus size): every 13th vector is a perturbed copy of
    its predecessor, so ~n/13 vectors must be dropped."""
    from heatmap_spark.operators.similarity import (
        hyperplane_assign,
        semantic_dedup_df,
    )

    emb = synthetic_dup_embeddings(spark, n)
    emb.count()  # warm
    t0 = time.perf_counter()
    assigned = hyperplane_assign(emb, n_planes=10)
    dropped = (
        semantic_dedup_df(emb, threshold=0.99, assigned=assigned)
        .where(~F.col("keep"))
        .count()
    )
    dt = time.perf_counter() - t0
    print(
        f"semantic-dedup {n:,} vecs: {dt:.1f}s = {n / dt / 1000:.0f}k vecs/s, "
        f"{dropped:,} dropped (planted {n // 13:,})"
    )


def probe_split(spark, n: int) -> None:
    """leakage_safe_split at scale: CC over the planted-dup pair graph
    (clusters of size 2, diameter 1) + the corpus-wide split join.
    Every doc of a planted pair must share its twin's split."""
    import heatmap_spark.operators.dedup as dd

    docs = synthetic_documents(spark, n)
    docs.count()  # warm
    orig = dd.load_table
    dd.load_table = lambda spark, sf_dir, name: docs
    try:
        t0 = time.perf_counter()
        out = dd.leakage_safe_split(spark, "synthetic")
        by_split = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
        mismatched = (
            out.alias("a")
            .join(out.alias("b"), F.col("a.doc_id") == F.col("b.doc_id") + 1)
            .where((F.col("a.doc_id") % 13 == 0) & (F.col("a.split") != F.col("b.split")))
            .count()
        )
        dt = time.perf_counter() - t0
    finally:
        dd.load_table = orig
    print(
        f"leakage-split {n:,} docs: {dt:.1f}s = {n / dt / 1000:.0f}k docs/s, "
        f"splits {by_split}, cross-split planted pairs: {mismatched} (must be 0)"
    )


def probe_incr(spark, n: int) -> None:
    """incremental_dedup at scale: planted dups (every 13th doc copies
    its predecessor) classify as dup_of_corpus when the twin is below
    the 80% id threshold, dup_in_batch when both are in the batch."""
    import heatmap_spark.operators.dedup as dd

    docs = synthetic_documents(spark, n)
    docs.count()  # warm
    orig = dd.load_table
    dd.load_table = lambda spark, sf_dir, name: docs
    try:
        t0 = time.perf_counter()
        counts = {
            r["status"]: r["n"]
            for r in dd.incremental_dedup(spark, "synthetic")
            .groupBy("status").agg(F.count("*").alias("n")).collect()
        }
        dt = time.perf_counter() - t0
    finally:
        dd.load_table = orig
    thr = ((n - 1) * 4) // 5
    batch = n - thr
    planted_in_batch = sum(1 for i in range(thr, n) if i % 13 == 0)
    print(
        f"incremental-dedup {n:,} docs ({batch:,} new): {dt:.1f}s = "
        f"{n / dt / 1000:.0f}k docs/s, statuses {counts} "
        f"(planted batch dups: {planted_in_batch:,})"
    )


def probe_chunk(spark, n: int) -> None:
    """chunk_documents at scale: map-only scan-rate ceiling; 60-token
    docs at w=64 yield exactly one chunk per doc."""
    import heatmap_spark.operators.textops as tx

    docs = synthetic_documents(spark, n)
    docs.count()  # warm
    orig = tx.load_table
    tx.load_table = lambda spark, sf_dir, name: docs
    try:
        t0 = time.perf_counter()
        n_chunks = tx.chunk_documents(spark, "synthetic").count()
        dt = time.perf_counter() - t0
    finally:
        tx.load_table = orig
    print(
        f"chunking {n:,} docs: {dt:.1f}s = {n / dt / 1000:.0f}k docs/s, "
        f"{n_chunks:,} chunks (expect {n:,})"
    )


def probe_stream(spark, n: int) -> None:
    """End-to-end Structured Streaming throughput: n synthetic points
    land as 8 parquet files, a file stream with maxFilesPerTrigger=2
    replays them as 4 micro-batches through stream_pyramid_to_store
    (per-batch pyramid build + versioned store merge under the replay
    guard).  Verifies the final store equals the one-shot batch pyramid
    row-for-row in count and total visits."""
    import shutil
    import tempfile

    from heatmap_spark.streaming.tile_store import (
        read_tile_store,
        stream_pyramid_to_store,
    )

    root = tempfile.mkdtemp(prefix="stream_probe_")
    src, store, ckpt = [os.path.join(root, d) for d in ("src", "store", "ckpt")]
    try:
        synthetic_locations(spark, n).repartition(8).write.parquet(src)
        schema = spark.read.parquet(src).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 2)
            .parquet(src)
        )
        t0 = time.perf_counter()
        q = stream_pyramid_to_store(stream, store, ckpt, min_zoom=6, max_zoom=16)
        q.awaitTermination()
        dt = time.perf_counter() - t0
        got = read_tile_store(spark, store)
        n_tiles = got.count()
        batch = P.build_pyramid(
            synthetic_locations(spark, n), mode="explode", min_zoom=6, max_zoom=16
        )
        expect_tiles = batch.count()
        print(
            f"streaming pyramid {n:,} events in 4 micro-batches: {dt:.1f}s = "
            f"{n / dt / 1000:.0f}k events/s, store tiles {n_tiles:,} "
            f"(batch-equivalent {expect_tiles:,})"
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def probe_streampart(spark, n: int) -> None:
    """Locality payoff of the partitioned tile store: 4 city-localized
    micro-batches (n/4 points each, ~0.5-degree boxes) merged into the
    flat store (whole-store rewrite per batch) vs the bucket-partitioned
    store (touched buckets only).  Store contents must be identical."""
    import shutil
    import tempfile

    from heatmap_spark.streaming.tile_store import (
        merge_delta_into_partitioned_store,
        merge_delta_into_store,
        read_partitioned_store,
        read_tile_store,
    )

    cities = [(40.7, -74.0), (51.5, -0.1), (35.7, 139.7), (-33.9, 151.2)]
    per = n // 20

    def city_batch(i):
        la, lo = cities[i]
        return spark.range(per).select(
            (F.lit(la) + (F.col("id") % 1000).cast("double") / 2000.0).alias("latitude"),
            (F.lit(lo) + (F.floor(F.col("id") / 1000) % 1000).cast("double") / 2000.0).alias("longitude"),
            F.timestamp_millis(F.lit(1700000000000) + F.col("id") % 2592000000).alias("ts"),
            F.concat(F.lit("u"), (F.col("id") % 5000).cast("string")).alias("user_id"),
            F.lit("gps").alias("source"),
            F.lit(1.0).alias("weight"),
        )

    base = P.build_pyramid(synthetic_locations(spark, n), mode="explode", min_zoom=6, max_zoom=16)
    deltas = [
        P.build_pyramid(city_batch(i), mode="explode", min_zoom=6, max_zoom=16)
        for i in range(len(cities))
    ]
    for d in deltas:
        d.count()  # warm

    root = tempfile.mkdtemp(prefix="streampart_")
    flat, part = os.path.join(root, "flat"), os.path.join(root, "part")
    try:
        # batch 0 = the historical base (uniform global points, ~33M
        # tiles at n=2M) — its build cost is common to both layouts and
        # excluded; we time the 4 localized incremental batches.
        merge_delta_into_store(spark, base, flat, batch_id=0)
        merge_delta_into_partitioned_store(spark, base, part, batch_id=0)
        t0 = time.perf_counter()
        for i, d in enumerate(deltas):
            merge_delta_into_store(spark, d, flat, batch_id=i + 1)
        t_flat = time.perf_counter() - t0
        t0 = time.perf_counter()
        touched = [
            merge_delta_into_partitioned_store(spark, d, part, batch_id=i + 1)
            for i, d in enumerate(deltas)
        ]
        t_part = time.perf_counter() - t0
        a, b = read_tile_store(spark, flat), read_partitioned_store(spark, part)
        same = a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
        print(
            f"partitioned-store locality: {n:,}-point base + 4 city batches "
            f"({per:,} points each): flat {t_flat:.1f}s vs partitioned "
            f"{t_part:.1f}s ({t_flat / t_part:.1f}x), buckets touched per "
            f"batch {touched} of 256, stores identical: {same}"
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def probe_pq(spark, n: int) -> None:
    """PQ at scale: codebook train on a 100k sample, map-only encode of
    the full corpus (512 B floats -> 16 B codes), ADC top-5 for 10
    queries over the compressed domain + exact re-rank of the 8x
    shortlist.  Planted dups (every 13th vector) must surface as their
    twin's top neighbor."""
    from pyspark.sql import functions as F

    from heatmap_spark.operators.similarity import (
        pq_adc_topk_np,
        pq_codebooks,
        pq_encode_np,
    )

    m, k = 16, 32
    emb = synthetic_dup_embeddings(spark, n)
    emb.count()  # warm
    t0 = time.perf_counter()
    cb = pq_codebooks(emb.where(F.col("vec_id") < 100_000), m, k, train_iters=1)
    t_train = time.perf_counter() - t0
    t0 = time.perf_counter()
    n_codes = pq_encode_np(emb, cb, m, k).count()
    t_enc = time.perf_counter() - t0
    t0 = time.perf_counter()
    top = pq_adc_topk_np(emb, cb, n_queries=10, topk=5, m=m, k=k, rerank_oversample=8)
    rows = top.where(F.col("rank") == 1).collect()
    t_q = time.perf_counter() - t0
    # queries 0..9: vec 13k's twin is 13k... here twins are (i-1, i) with
    # i % 13 == 0 -> query 0 has twin 1? No: id 13 copies id 12.  Among
    # queries 0..9 none is a planted twin, so just report top-1 ids.
    print(
        f"PQ {n:,} vecs: train {t_train:.1f}s (100k sample), encode "
        f"{t_enc:.1f}s = {n / t_enc / 1000:.0f}k vecs/s, ADC top-5 for 10 "
        f"queries {t_q:.1f}s, codes={n_codes:,}, "
        f"bytes/vec 512 -> {m}"
    )


def probe_opq(spark, n: int) -> None:
    """OPQ at scale: rotation+codebook train on a 100k sample (each OPQ
    iteration = map-only rotate, linear PQ train, one distributed
    dim x dim cross-matrix pass + driver-side SVD), then map-only
    rotate+encode of the full corpus at 8 B/vec (64x compression) and
    ADC top-5 + exact re-rank."""
    import numpy as np
    from pyspark.sql import functions as F

    from heatmap_spark.operators.similarity import (
        opq_train,
        pq_adc_scores_np,
        pq_encode_np,
        rotate_vectors,
        _l2_normalize,
        _rerank_exact,
    )
    from pyspark.sql.window import Window as W
    from pyspark.storagelevel import StorageLevel

    m, k = 8, 32
    emb = synthetic_dup_embeddings(spark, n)
    emb.count()  # warm
    t0 = time.perf_counter()
    R, cb = opq_train(
        emb.where(F.col("vec_id") < 100_000), m, k, opq_iters=3, train_iters=1
    )
    t_train = time.perf_counter() - t0
    nv = emb.select("vec_id", _l2_normalize(F.col("vec")).alias("vec"))
    t0 = time.perf_counter()
    codes = pq_encode_np(rotate_vectors(nv, R), cb, m, k).localCheckpoint(
        eager=True, storageLevel=StorageLevel.DISK_ONLY
    )
    n_codes = codes.count()
    t_enc = time.perf_counter() - t0
    t0 = time.perf_counter()
    Rm = np.asarray(R)
    raw_queries = [
        (r["vec_id"], r["vec"]) for r in nv.where(F.col("vec_id") < 10).collect()
    ]
    rot_queries = [(qid, list(np.asarray(qv) @ Rm)) for qid, qv in raw_queries]
    scored = pq_adc_scores_np(codes, cb, rot_queries, m, k).where(
        F.col("query_id") != F.col("neighbor_id")
    )
    w = W.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("neighbor_id"))
    shortlist = (
        scored.select("query_id", "neighbor_id", F.row_number().over(w).alias("rank"))
        .where(F.col("rank") <= 40)
        .select("query_id", "neighbor_id")
    )
    n_top = _rerank_exact(shortlist, emb, raw_queries, 5).count()
    t_q = time.perf_counter() - t0
    print(
        f"OPQ {n:,} vecs: train {t_train:.1f}s (100k sample, 3 OPQ iters), "
        f"rotate+encode {t_enc:.1f}s = {n / t_enc / 1000:.0f}k vecs/s, ADC "
        f"top-5 for 10 queries {t_q:.1f}s, codes={n_codes:,}, "
        f"bytes/vec 512 -> {m}, top rows={n_top}"
    )


def probe_streampass(spark, n: int) -> None:
    """Log-structured passage store at n docs (default 500k), ingested
    in 5 equal batches: per-batch merge cost must track BATCH size
    (flat across batches as history grows 5x), compaction is the only
    history-proportional step, and the final read must agree with the
    one-shot batch detector (aggregate-level equality — full
    row-compare is its own batch run)."""
    import shutil
    import tempfile

    from heatmap_spark.operators.dedup import duplicated_passages_df
    from heatmap_spark.streaming.passages import (
        compact_passage_store,
        merge_batch_into_passage_store,
        read_duplicated_passages,
    )

    docs = synthetic_documents(spark, n)
    docs.count()  # warm
    root = tempfile.mkdtemp(prefix="passage_probe_")
    store = f"{root}/store"
    per = n // 5
    try:
        times = []
        for b in range(5):
            batch = docs.where(
                (F.col("doc_id") >= b * per) & (F.col("doc_id") < (b + 1) * per)
            )
            t0 = time.perf_counter()
            merge_batch_into_passage_store(spark, batch, store, batch_id=b)
            times.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        compact_passage_store(spark, store)
        t_compact = time.perf_counter() - t0
        t0 = time.perf_counter()
        got = read_duplicated_passages(spark, store).agg(
            F.count("*").alias("docs"), F.sum("n_dup_windows").alias("dupw")
        ).first()
        t_read = time.perf_counter() - t0
        want = duplicated_passages_df(docs.where(F.col("doc_id") < 5 * per)).agg(
            F.count("*").alias("docs"), F.sum("n_dup_windows").alias("dupw")
        ).first()
        same = (got.docs, got.dupw) == (want.docs, want.dupw)
        tline = "/".join(f"{t:.1f}" for t in times)
        print(
            f"passage-store {n:,} docs in 5 batches: per-batch {tline}s "
            f"(flat = O(batch)), compaction {t_compact:.1f}s, read "
            f"{t_read:.1f}s, agrees with batch detector: {same}"
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def probe_serve(spark, n: int) -> None:
    """Point-serving reads against a large partitioned tile store
    (default 2M points → ~33M pyramid rows): one result-set fetch must
    cost a bucket's row groups, not a store scan."""
    import shutil
    import tempfile

    from heatmap_spark.streaming.tile_store import (
        merge_delta_into_partitioned_store,
        read_partitioned_store,
        read_resultset,
    )

    root = tempfile.mkdtemp(prefix="serve_probe_")
    store = f"{root}/store"
    try:
        loc = synthetic_locations(spark, n)
        delta = P.build_pyramid(loc, mode="explode", min_zoom=6, max_zoom=21)
        t0 = time.perf_counter()
        merge_delta_into_partitioned_store(spark, delta, store, batch_id=0)
        t_build = time.perf_counter() - t0
        # busiest zoom-7 parent for the aggregate group
        top = (
            read_partitioned_store(spark, store)
            .where((F.col("zoom") == 12) & (F.col("user_group") == "all"))
            .groupBy(F.expr("shiftright(row, 5)").alias("r"), F.expr("shiftright(col, 5)").alias("c"))
            .agg(F.sum("visits").alias("t"))
            .orderBy(F.desc("t"))
            .first()
        )
        t0 = time.perf_counter()
        full = read_partitioned_store(spark, store).where(
            F.col("zoom") == 12
        ).count()
        t_full = time.perf_counter() - t0
        tid = f"7_{top['r']}_{top['c']}"
        t0 = time.perf_counter()
        rs = read_resultset(spark, store, "all", "alltime", tid).collect()
        t_point = time.perf_counter() - t0
        n_entries = len(rs[0]["heatmap"]) if rs else 0
        print(
            f"serve {n:,} pts: store build {t_build:.1f}s, full zoom-12 "
            f"scan {t_full:.1f}s vs point result-set fetch {t_point:.2f}s "
            f"({t_full / max(t_point, 1e-9):.0f}x, {n_entries} entries from "
            f"parent {tid})"
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def probe_ivfpq(spark, n: int) -> None:
    """IVFADC at n vectors (default 1M), 64 coarse lists: build
    (coarse train + assign + residual PQ train + encode) vs query at
    nprobe 2 and 8 — query cost must track the probed candidate
    fraction, not corpus size."""
    from pyspark.storagelevel import StorageLevel

    from heatmap_spark.operators.similarity import ivfpq_build, ivfpq_topk

    nb, m, k = 64, 8, 32
    emb = synthetic_dup_embeddings(spark, n)
    emb.count()  # warm
    t0 = time.perf_counter()
    coarse, cb, codes = ivfpq_build(emb, nb, m, k, train_iters=1, train_sample_n=100_000)
    codes = codes.localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)
    n_codes = codes.count()
    t_build = time.perf_counter() - t0
    for nprobe in (2, 8):
        t0 = time.perf_counter()
        rows = ivfpq_topk(
            emb, coarse, cb, codes, n_queries=10, topk=5, m=m, k=k, nprobe=nprobe
        ).count()
        dt = time.perf_counter() - t0
        print(
            f"ivfpq {n:,} vecs, {nb} lists: nprobe={nprobe} "
            f"(~{nprobe / nb:.1%} candidates) query x 10 {dt:.1f}s "
            f"({rows} rows)"
        )
    print(
        f"ivfpq build {n:,} vecs: {t_build:.1f}s = "
        f"{n / t_build / 1000:.0f}k vecs/s, codes={n_codes:,}, "
        f"bytes/vec 512 -> {m}+bucket"
    )


def probe_vocab(spark, n: int) -> None:
    """Vocabulary-drift store at n docs (default 2M) in 5 batches whose
    token universes SHIFT half a window per batch (planted drift —
    expected OOV ≈ 0.5 per batch after the first), so the probe
    demonstrates both the flat O(batch) ingest cost AND a real drift
    signal; compaction folds the partials."""
    import tempfile

    from heatmap_spark.streaming.vocab import (
        compact_vocab_store,
        merge_batch_into_vocab_store,
        read_vocab_drift,
    )

    nb = 5
    per_batch = n // nb
    store = tempfile.mkdtemp(prefix="vocab_probe_") + "/store"
    per = []
    for b in range(nb):
        # 60 tokens/doc drawn from a 200k-token window that advances
        # 100k per batch — half of each batch's vocabulary is new
        shift = b * 100_000
        toks = F.transform(
            F.sequence(F.lit(0), F.lit(59)),
            lambda j: F.concat(
                F.lit("w"),
                ((((F.col("id") + 1) * (j + 1)) % 200_000) + shift).cast("string"),
            ),
        )
        batch = spark.range(per_batch).select(
            (F.col("id") + b * per_batch).alias("doc_id"),
            F.concat_ws(" ", toks).alias("text"),
        )
        batch.count()  # warm
        t0 = time.perf_counter()
        merge_batch_into_vocab_store(spark, batch, store, b)
        per.append(time.perf_counter() - t0)
    t0 = time.perf_counter()
    folded = compact_vocab_store(spark, store)
    t_comp = time.perf_counter() - t0
    log = {r["batch_id"]: r for r in read_vocab_drift(spark, store).collect()}
    print(
        f"vocab {n:,} docs / {nb} batches: per-batch "
        + "/".join(f"{t:.1f}" for t in per)
        + f" s, compaction({folded}) {t_comp:.1f}s, "
        f"oov by batch "
        + "/".join(f"{log[b]['oov_rate']:.3f}" for b in sorted(log))
        + f", l1 final {log[nb - 1]['l1_drift']:.4f}"
    )


def probe_ann_store(spark, n: int) -> None:
    """Incremental ANN store at n vectors (default 1M) in 5 batches:
    batch 0 pays model training once; later batches must be flat
    O(batch) map-only encodes.  Compaction folds to the
    bucket-partitioned base; a store-served query must match the
    probed-candidate cost profile of the one-shot index."""
    import tempfile

    from heatmap_spark.streaming.ann_store import (
        ann_store_topk,
        compact_ann_store,
        merge_batch_into_ann_store,
        read_ann_codes,
    )

    emb = synthetic_dup_embeddings(spark, n)
    emb.count()  # warm
    store = tempfile.mkdtemp(prefix="ann_store_probe_") + "/store"
    nb_batches, nb, m, k = 5, 64, 8, 32
    per = []
    n0 = (n + nb_batches - 1) // nb_batches
    for b in range(nb_batches):
        batch = emb.where(
            (F.col("vec_id") >= b * n0) & (F.col("vec_id") < (b + 1) * n0)
        )
        t0 = time.perf_counter()
        merge_batch_into_ann_store(spark, batch, store, b, n_buckets=nb, m=m, k=k)
        per.append(time.perf_counter() - t0)
    t0 = time.perf_counter()
    folded = compact_ann_store(spark, store)
    t_comp = time.perf_counter() - t0
    n_codes = read_ann_codes(spark, store).count()
    t0 = time.perf_counter()
    rows = ann_store_topk(spark, store, emb, nprobe=8, m=m, k=k).count()
    t_q = time.perf_counter() - t0
    print(
        f"ann-store {n:,} vecs / {nb_batches} batches, {nb} lists: per-batch "
        + "/".join(f"{t:.1f}" for t in per)
        + f" s (batch 0 includes model training), compaction({folded}) "
        f"{t_comp:.1f}s, {n_codes:,} codes, store-served query x 10 "
        f"{t_q:.1f}s ({rows} rows)"
    )

    # OPQ arm: same lifecycle with the learned residual rotation —
    # batch 0 additionally pays opq_train; later batches must stay
    # flat (the rotation is one fused matmul inside the encode scan)
    store2 = tempfile.mkdtemp(prefix="ann_store_opq_probe_") + "/store"
    per2 = []
    for b in range(nb_batches):
        batch = emb.where(
            (F.col("vec_id") >= b * n0) & (F.col("vec_id") < (b + 1) * n0)
        )
        t0 = time.perf_counter()
        merge_batch_into_ann_store(
            spark, batch, store2, b, n_buckets=nb, m=m, k=k,
            opq=True, opq_iters=2,
        )
        per2.append(time.perf_counter() - t0)
    t0 = time.perf_counter()
    rows2 = ann_store_topk(spark, store2, emb, nprobe=8, m=m, k=k).count()
    t_q2 = time.perf_counter() - t0
    steady = sum(per[1:]) / (nb_batches - 1)
    steady2 = sum(per2[1:]) / (nb_batches - 1)
    print(
        f"ann-store OPQ arm {n:,} vecs: per-batch "
        + "/".join(f"{t:.1f}" for t in per2)
        + f" s (batch 0 includes opq_train); steady-state encode "
        f"{steady2:.1f}s vs plain {steady:.1f}s "
        f"({steady2 / steady:.2f}x — the frozen rotation's cost inside "
        f"the scan), rotated-store query x 10 {t_q2:.1f}s ({rows2} rows)"
    )


def probe_holt(spark, n: int) -> None:
    """Forecasting folds at n events (default 10M) over 100k keys:
    each key's series (~n/100k elements) folds in one task — per-key
    sequential is the honest shape for the recurrence; throughput
    comes from key parallelism."""
    ev = spark.range(n).select(
        F.concat(F.lit("k"), (F.col("id") % 100_000).cast("string")).alias(
            "event_type"
        ),
        F.timestamp_millis(F.lit(1700000000000) + F.col("id") * 100).alias("ts"),
        F.col("id").alias("event_id"),
        (F.pmod(F.hash(F.col("id")), F.lit(1000)).cast("double") / 10.0).alias(
            "value"
        ),
    )
    ev.count()  # warm
    # same fold as timeseries.holt_by_type, applied to the synthetic
    # relation (the operator itself is fixture-bound)
    series = ev.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("ts", "event_id", "value"))),
            lambda s: s["value"].cast("double"),
        ).alias("vals")
    )
    a, ia, bt, ib = F.lit(0.5), F.lit(0.5), F.lit(0.3), F.lit(0.7)

    def step(acc, x):
        new_l = a * x + ia * (acc["l"] + acc["b"])
        new_b = bt * (new_l - acc["l"]) + ib * acc["b"]
        return F.struct(new_l.alias("l"), new_b.alias("b"))

    st = F.aggregate(
        F.slice(F.col("vals"), 2, F.size("vals")),
        F.struct(F.element_at(F.col("vals"), 1).alias("l"), F.lit(0.0).alias("b")),
        step,
    )
    t0 = time.perf_counter()
    rows = series.select("event_type", st["l"].alias("level")).count()
    dt = time.perf_counter() - t0
    print(
        f"holt {n:,} events / {rows:,} keys: {dt:.1f}s = "
        f"{n / dt / 1000:.0f}k events/s (one groupBy exchange, "
        f"per-key JVM fold)"
    )


def probe_entity(spark, n: int) -> None:
    """Entity resolution at n base records (default 2M) + n/3 dirty
    variants: candidate generation must stay an equi-join bounded by
    block sizes (nation × segment × balance band ≈ 250k blocks here),
    and CC must converge in O(log d) rounds on the star-shaped match
    graph.  Planted variants must all link back to their originals."""
    from heatmap_spark.operators.dedup import connected_components
    from heatmap_spark.operators.entity import (
        _VARIANT_OFFSET,
        er_candidate_pairs,
    )

    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY", "HOUSEHOLD"]
    seg = F.element_at(
        F.array(*[F.lit(s) for s in segs]), (F.col("id") % 5 + 1).cast("int")
    )
    base = spark.range(n).select(
        F.col("id").alias("rec_id"),
        F.format_string("Customer#%09d", F.col("id")).alias("name"),
        (F.col("id") % 25).cast("int").alias("nation"),
        seg.alias("segment"),
        (F.pmod(F.hash(F.col("id")), F.lit(10_000_000)).cast("double") / 100.0).alias("bal"),
        F.lit("src").alias("source"),
    )
    var = base.where(F.col("rec_id") % 3 == 0).select(
        (F.col("rec_id") + _VARIANT_OFFSET * 10).alias("rec_id"),
        F.concat(F.lower("name"), F.lit("x")).alias("name"),
        "nation",
        "segment",
        (F.col("bal") + 0.25).alias("bal"),
        F.lit("crm").alias("source"),
    )
    records = base.unionByName(var)
    records.count()  # warm
    t0 = time.perf_counter()
    pairs = er_candidate_pairs(records)
    n_pairs = pairs.count()
    t_cand = time.perf_counter() - t0
    planted = (n + 2) // 3
    linked = pairs.where(
        F.col("v") - F.col("u") == _VARIANT_OFFSET * 10
    ).count()
    t0 = time.perf_counter()
    n_clustered = connected_components(pairs, "u", "v").count()
    t_cc = time.perf_counter() - t0
    total = n + planted
    print(
        f"entity {total:,} records: candidates {t_cand:.1f}s = "
        f"{total / t_cand / 1000:.0f}k recs/s, {n_pairs:,} pairs "
        f"({linked:,}/{planted:,} planted links found), "
        f"cc {t_cc:.1f}s over {n_clustered:,} matched records"
    )


def probe_entity_store(spark, n: int) -> None:
    """Incremental ER at n base records (default 1M) in 3 batches:
    per-batch ingest cost must track the batch and its block partners
    (the history joins through the block key only); the final streamed
    assignment must link every planted variant across batches."""
    import tempfile

    from heatmap_spark.operators.entity import _VARIANT_OFFSET
    from heatmap_spark.streaming.entity_store import (
        compact_entity_store,
        merge_batch_into_entity_store,
        read_entity_assignments,
    )

    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY", "HOUSEHOLD"]
    seg = F.element_at(
        F.array(*[F.lit(s) for s in segs]), (F.col("id") % 5 + 1).cast("int")
    )
    base = spark.range(n).select(
        F.col("id").alias("rec_id"),
        F.format_string("Customer#%09d", F.col("id")).alias("name"),
        (F.col("id") % 25).cast("int").alias("nation"),
        seg.alias("segment"),
        (F.pmod(F.hash(F.col("id")), F.lit(10_000_000)).cast("double") / 100.0).alias("bal"),
        F.lit("src").alias("source"),
    )
    var = base.where(F.col("rec_id") % 3 == 0).select(
        (F.col("rec_id") + _VARIANT_OFFSET * 10).alias("rec_id"),
        F.concat(F.lower("name"), F.lit("x")).alias("name"),
        "nation",
        "segment",
        (F.col("bal") + 0.25).alias("bal"),
        F.lit("crm").alias("source"),
    )
    records = base.unionByName(var)
    records.count()  # warm
    store = tempfile.mkdtemp(prefix="entity_store_probe_") + "/store"
    per = []
    for b in range(3):
        batch = records.where(F.col("rec_id") % 3 == b)
        t0 = time.perf_counter()
        merge_batch_into_entity_store(spark, batch, store, b)
        per.append(time.perf_counter() - t0)
        if b == 1:
            compact_entity_store(spark, store)
    t0 = time.perf_counter()
    out = read_entity_assignments(spark, store)
    planted = (n + 2) // 3
    linked = out.where(
        (F.col("source") == "crm") & (F.col("n_sources") == 2)
    ).count()
    t_read = time.perf_counter() - t0
    total = n + planted
    print(
        f"entity-store {total:,} records / 3 batches: per-batch "
        + "/".join(f"{t:.1f}" for t in per)
        + f" s, final assignment {t_read:.1f}s, "
        f"{linked:,}/{planted:,} planted variants linked cross-batch"
    )


def probe_ivfpq_opq(spark, n: int) -> None:
    """OPQ+IVFPQ chain at n vectors (default 1M), 64 coarse lists:
    build (coarse train + assign + OPQ rotation train on residual
    sample + rotated-residual encode) vs query at nprobe 2 and 8 —
    the rotation adds one matmul per Arrow batch to the encode and a
    driver-side dim×dim matmul per probed bucket at query time, so
    both costs must stay within noise of plain IVFPQ."""
    from pyspark.storagelevel import StorageLevel

    from heatmap_spark.operators.similarity import ivfpq_opq_build, ivfpq_topk

    nb, m, k = 64, 8, 32
    emb = synthetic_dup_embeddings(spark, n)
    emb.count()  # warm
    t0 = time.perf_counter()
    coarse, R, cb, codes = ivfpq_opq_build(
        emb, nb, m, k, opq_iters=3, train_iters=1, train_sample_n=100_000
    )
    codes = codes.localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)
    n_codes = codes.count()
    t_build = time.perf_counter() - t0
    for nprobe in (2, 8):
        t0 = time.perf_counter()
        rows = ivfpq_topk(
            emb, coarse, cb, codes, n_queries=10, topk=5, m=m, k=k,
            nprobe=nprobe, R=R,
        ).count()
        dt = time.perf_counter() - t0
        print(
            f"ivfpq_opq {n:,} vecs, {nb} lists: nprobe={nprobe} "
            f"(~{nprobe / nb:.1%} candidates) query x 10 {dt:.1f}s "
            f"({rows} rows)"
        )
    print(
        f"ivfpq_opq build {n:,} vecs: {t_build:.1f}s = "
        f"{n / t_build / 1000:.0f}k vecs/s, codes={n_codes:,}, "
        f"bytes/vec 512 -> {m}+bucket"
    )


def probe_bpe(spark, n: int) -> None:
    """BPE at n docs (default 2M): the word-frequency aggregate is the
    only corpus-sized pass; the 40-round merge loop runs on the
    word-count TABLE (vocabulary-sized), so its cost must NOT track
    corpus row count.  Encode throughput is the Arrow-batched serving
    path."""
    from heatmap_spark.operators.textops import bpe_encode_df, bpe_train_merges

    docs = synthetic_documents(spark, n)
    docs.count()  # warm
    t0 = time.perf_counter()
    merges = bpe_train_merges(docs.select("text"), n_merges=40)
    t_train = time.perf_counter() - t0
    t0 = time.perf_counter()
    n_enc = bpe_encode_df(docs, merges).count()
    t_enc = time.perf_counter() - t0
    print(
        f"bpe {n:,} docs: train 40 merges {t_train:.1f}s (word-count agg + "
        f"vocab-table loop), encode {t_enc:.1f}s = {n / t_enc / 1000:.0f}k "
        f"docs/s, {n_enc:,} rows, top merge {merges[0][:3]}"
    )


def probe_cc(spark, n: int) -> None:
    """Pointer-jumping connected components at n edges (default 10M):
    path components of length 65,536 — the DIAMETER-stress shape (a
    near-dup cluster graph is shallow; this pins the O(log d)
    convergence and the non-convergence guard at scale).  Expected
    rounds ≈ log2(65,536) + small constant."""
    from heatmap_spark.operators.dedup import connected_components

    B = 65_536
    edges = (
        spark.range(1, n + 1)
        .where(F.col("id") % B != 0)
        .select((F.col("id") - 1).alias("doc_a"), F.col("id").alias("doc_b"))
    )
    edges.count()  # warm
    rounds: list = []
    t0 = time.perf_counter()
    labels = connected_components(edges, rounds_out=rounds)
    stats = labels.agg(
        F.countDistinct("cluster_id").alias("ncomp"),
        F.count("*").alias("nodes"),
    ).first()
    dt = time.perf_counter() - t0
    expect = (n + 1 + B - 1) // B
    print(
        f"cc {n:,} edges (paths of {B:,}): {dt:.1f}s, {rounds[0]} rounds, "
        f"{stats.ncomp:,} components (expect {expect:,}), "
        f"{stats.nodes:,} nodes = {stats.nodes / dt / 1000:.0f}k nodes/s"
    )




def probe_bpe_drift(spark, n: int) -> None:
    """BPE-fertility-drift store at n docs (default 2M) in 4 batches
    whose language SHIFTS: batches 0-1 are English-digraph-friendly
    words (the frozen merges bite), batches 2-3 draw from a consonant
    alphabet the merges barely match — fertility must RISE, which is
    exactly the drift the store exists to surface, while per-batch
    ingest cost stays flat (map-only encode)."""
    import tempfile

    from heatmap_spark.streaming.bpe_drift import (
        merge_batch_into_bpe_store,
        read_bpe_drift,
    )

    nb = 4
    per_batch = n // nb
    store = tempfile.mkdtemp(prefix="bpe_drift_probe_") + "/store"
    per = []
    for b in range(nb):
        # 30 words/doc; early batches cycle merge-friendly stems, late
        # batches cycle stems with no vowels/digraphs in the merge list
        stems = (
            ["the", "ing", "and", "tion", "ther", "ent", "ound", "ofto"]
            if b < 2
            else ["xzq", "qvz", "zxv", "qqz", "vxz", "zzq", "xqv", "vvx"]
        )
        arr = "array({})".format(
            ", ".join(f"'{w}'" for w in stems)
        )
        toks = F.transform(
            F.sequence(F.lit(0), F.lit(29)),
            lambda j: F.concat(
                F.expr(arr)[((F.col("id") + j) % 8).cast("int")],
                (((F.col("id") + 1) * (j + 3)) % 97).cast("string"),
            ),
        )
        batch = spark.range(per_batch).select(
            (F.col("id") + b * per_batch).alias("doc_id"),
            F.concat_ws(" ", toks).alias("text"),
        )
        batch.count()  # warm
        t0 = time.perf_counter()
        merge_batch_into_bpe_store(spark, batch, store, b)
        per.append(time.perf_counter() - t0)
    log = {r["batch_id"]: r for r in read_bpe_drift(spark, store).collect()}
    ferts = [log[b]["fertility"] for b in sorted(log)]
    assert ferts[2] > ferts[1], "language shift must raise fertility"
    print(
        f"bpe_drift {n:,} docs / {nb} batches: per-batch "
        + "/".join(f"{t:.1f}" for t in per)
        + " s, fertility "
        + "/".join(f"{f:.3f}" for f in ferts)
        + f", drift at shift {log[2]['fertility_drift']:+.3f}"
    )


def probe_rowstore(spark, n: int) -> None:
    """Row store at n rows (default 2M): bucketed Arrow write with
    manifest commit, full scan back, and a keyed point read that must
    touch 1/64 of the store (pruning verified reader-level, then timed
    end-to-end)."""
    import tempfile

    from pyspark.sql.datasource import EqualTo

    from heatmap_spark.sources.rowstore import (
        make_rowstore_datasource,
        read_rowstore,
        write_rowstore,
    )

    df = spark.range(n).select(
        F.col("id").alias("row_id"),
        F.concat(F.lit("u"), (F.col("id") % 100_000).cast("string")).alias("user_id"),
        (F.col("id") * 7919 % 360000 / 1000.0 - 180.0).alias("x"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    df.count()  # warm
    store = tempfile.mkdtemp(prefix="rowstore_probe_") + "/t"
    t0 = time.perf_counter()
    write_rowstore(df, store, bucket_key="user_id", n_buckets=64, mode="overwrite")
    t_w = time.perf_counter() - t0
    t0 = time.perf_counter()
    total = read_rowstore(spark, store).count()
    t_scan = time.perf_counter() - t0
    assert total == n
    cls = make_rowstore_datasource()
    ds = cls(options={"path": store})
    rd = ds.reader(ds.schema())
    rd.pushFilters([EqualTo(("user_id",), "u42")])
    pruned_parts = rd.partitions()
    all_parts = ds.reader(ds.schema()).partitions()
    # per-file partitions: the prune keeps only the key's bucket's
    # files — about 1/64 of the store's files
    assert 0 < len(pruned_parts) <= len(all_parts) // 32
    t0 = time.perf_counter()
    hits = read_rowstore(spark, store).where(F.col("user_id") == "u42").count()
    t_point = time.perf_counter() - t0
    print(
        f"rowstore {n:,} rows / 64 buckets: write+commit {t_w:.1f}s "
        f"({n / t_w / 1000:.0f}k rows/s), full scan {t_scan:.1f}s, "
        f"keyed read (1/64 pruned, {hits} rows) {t_point:.1f}s"
    )


def probe_kmeans(spark, n: int) -> None:
    """Integer fixed-point k-means at n synthetic 64-dim vectors
    (default 500k), k=8, 2 Lloyd iterations — per-iteration cost is
    one (cluster,pos) partial-sum shuffle + one map-only reassign."""
    from heatmap_spark.operators import similarity as sim

    emb = synthetic_embeddings(spark, n)
    emb = emb.select("vec_id", F.col("vec").alias("embedding"))
    import heatmap_spark.operators.similarity as s2
    from unittest import mock

    emb.count()  # warm
    t0 = time.perf_counter()
    with mock.patch.object(s2, "load_table", lambda sp, d, t: emb):
        out = sim.kmeans_embeddings(spark, "ignored", k=8, iters=2)
        sizes = sorted(
            r["cluster_size"]
            for r in out.select("cluster", "cluster_size").distinct().collect()
        )
    t = time.perf_counter() - t0
    assert sum(sizes) == n
    print(
        f"kmeans {n:,} x 64-dim, k=8, 2 iters: {t:.1f}s "
        f"({n / t / 1000:.0f}k vecs/s), cluster sizes {sizes[0]:,}..{sizes[-1]:,}"
    )





def probe_acf(spark, n: int) -> None:
    """Autocorrelation at n events (default 10M) over 50 event types /
    90 days of hourly slots: the corpus-sized cost is ONE (type, hour)
    count aggregate; the ACF itself runs on the bounded dense grid
    (50 x 2160 rows), so wall-clock tracks input size, not lag count.
    A planted 24h-periodic type must dominate the lag-24 ranking."""
    from unittest import mock

    import heatmap_spark.operators.timeseries as ts

    hours = 90 * 24
    ev = spark.range(n).select(
        F.col("id").alias("event_id"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("t0"),
        (F.col("id") % 50).cast("int").alias("tix"),
    )
    # type 0 is 24h-periodic: every day hit, events only in hours 0-5
    # (derive from id DIV 50 — the dense per-type counter — so the
    # prime multipliers stay coprime with the day/offset moduli);
    # other types spread uniformly via a prime multiplier
    j = F.floor(F.col("event_id") / F.lit(50)).cast("long")
    # day from j mod 90, hour-offset from the SWEEP counter (j div 90)
    # — decoupled moduli, so every day accumulates events across all
    # six early hours instead of one (day, offset) pair per j
    hour_of = F.when(
        F.col("tix") == 0,
        (j % (hours // 24)) * 24 + (F.floor(j / F.lit(hours // 24)) % 6),
    ).otherwise((F.col("event_id") * 104729) % hours)
    events = ev.select(
        "event_id",
        (F.col("t0") + F.make_interval(hours=hour_of.cast("int"))).alias("ts"),
        F.lit(1).alias("user_id"),
        F.concat(F.lit("t"), F.col("tix").cast("string")).alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    events.count()  # warm
    t0 = time.perf_counter()
    with mock.patch.object(ts, "load_table", lambda sp, d, t: events):
        out = ts.autocorrelation(spark, "ignored", max_lag=24).collect()
    t = time.perf_counter() - t0
    by = {(r["event_type"], r["lag"]): r["acf"] for r in out}
    p24 = by[("t0", 24)]
    others = [by[(f"t{i}", 24)] for i in range(1, 50)]
    assert p24 > 0.5 > max(others), (p24, max(others))
    print(
        f"acf {n:,} events / 50 types / 24 lags: {t:.1f}s "
        f"({n / t / 1e6:.1f}M events/s); planted 24h period acf(24)="
        f"{p24:.3f} vs max other {max(others):+.3f}"
    )



def probe_cms(spark, n: int) -> None:
    """CMS build over n docs (60 tokens each → 60n occurrences, 240n
    cell increments): the grid stays 1024 rows no matter what, so the
    shuffle moves O(partitions·cells).  Verifies est >= true on the
    top-20 and prints throughput."""
    from heatmap_spark.operators.profiling import cms_cells

    docs = synthetic_documents(spark, n)
    tok = docs.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
    tok.count()  # warm
    t0 = time.perf_counter()
    cells = cms_cells(tok).localCheckpoint(eager=True)
    t = time.perf_counter() - t0
    n_cells = cells.count()
    total = cells.where(F.col("j") == 0).agg(F.sum("cnt")).first()[0]
    assert n_cells <= 1024 and total == 60 * n
    print(
        f"cms {n:,} docs ({60*n:,} occurrences): build {t:.1f}s "
        f"({60*n/t/1e6:.1f}M tok/s), grid {n_cells} cells"
    )


def probe_classifier(spark, n: int) -> None:
    """Hashed linear classifier forward pass over n docs (60 tokens →
    119 features each): map-only scoring + one doc_id re-agg."""
    from heatmap_spark.operators.textops import quality_classifier

    docs = synthetic_documents(spark, n)
    docs.count()  # warm
    import heatmap_spark.operators.textops as T

    t0 = time.perf_counter()
    # score the synthetic corpus by swapping the loader via a view of
    # the same shape the operator expects
    toks = F.filter(F.split(F.lower("text"), "[^a-z0-9]+"), lambda x: x != F.lit(""))
    bigrams = F.filter(
        F.zip_with(
            toks,
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
            lambda a, b: F.concat(a, F.lit("_"), b),
        ),
        lambda x: x.isNotNull(),
    )
    feats = docs.select("doc_id", F.explode(F.concat(toks, bigrams)).alias("feat"))
    h = F.conv(F.substring(F.md5(F.col("feat")), 1, 12), 16, 10).cast("bigint")
    w = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("w"), (h % 4096).cast("string"))), 1, 12),
            16, 10,
        ).cast("bigint") % 2001 - 1000
    )
    out = feats.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_feats"), F.sum(w).alias("score")
    )
    out.write.format("noop").mode("overwrite").save()
    t = time.perf_counter() - t0
    print(
        f"classifier {n:,} docs ({119*n:,} hashed features): {t:.1f}s "
        f"({119*n/t/1e6:.1f}M feats/s)"
    )


def probe_textindex(spark, n: int) -> None:
    """Inverted-index build over n docs + a routed 3-term point read:
    serving cost must not scale with index size (opens ≤3 of 64
    bucket dirs)."""
    import tempfile

    from heatmap_spark.streaming.text_index import (
        build_inverted_index,
        search_index,
        term_bucket,
    )

    docs = synthetic_documents(spark, n)
    docs.count()  # warm
    store = tempfile.mkdtemp(prefix="textindex_probe_") + "/index"
    t0 = time.perf_counter()
    build_inverted_index(docs, store)
    tb = time.perf_counter() - t0
    qterms = ["w1", "w2", "w3"]
    t0 = time.perf_counter()
    rows = search_index(spark, store, qterms, k=20).collect()
    ts = time.perf_counter() - t0
    print(
        f"textindex {n:,} docs: build {tb:.1f}s ({60*n/tb/1e6:.1f}M postings-in/s); "
        f"3-term serve {ts:.2f}s over buckets "
        f"{sorted({term_bucket(t) for t in qterms})} -> {len(rows)} hits"
    )
    import shutil

    shutil.rmtree(store, ignore_errors=True)


def probe_cusum(spark, n: int) -> None:
    """CUSUM fold over n events across 50 series: one aggregate
    computes sorted series + moments; fold is JVM-side."""
    from heatmap_spark.operators.timeseries import cusum_df

    ev = spark.range(n).select(
        F.concat(F.lit("t"), (F.col("id") % 50).cast("string")).alias("event_type"),
        F.timestamp_millis(F.lit(1700000000000) + F.col("id") * 1000).alias("ts"),
        F.col("id").alias("event_id"),
        # drifting mean at 80% of each series so alarms fire
        (
            (F.pmod(F.hash("id"), F.lit(1000)).cast("double") / 100.0)
            + F.when(F.col("id") % 50 < 25, (F.col("id") / n * 20.0)).otherwise(0.0)
        ).alias("value"),
    )
    ev.count()  # warm
    t0 = time.perf_counter()
    rows = cusum_df(ev).collect()
    t = time.perf_counter() - t0
    n_alarm_series = sum(1 for r in rows if r["n_alarms"] > 0)
    print(
        f"cusum {n:,} events / 50 series: {t:.1f}s ({n/t/1e6:.1f}M events/s); "
        f"{n_alarm_series}/50 series alarmed"
    )



def probe_merge(spark, n: int) -> None:
    """MERGE INTO the rowstore at scale: n-row store, ~6% of keys
    updated; only touched buckets rewrite (untouched buckets' files
    byte-identical), and time travel to the pre-merge snapshot still
    answers."""
    import tempfile

    from pyspark.sql import functions as F

    from heatmap_spark.sources.rowstore import (
        merge_upsert_rowstore,
        read_manifest,
        read_rowstore,
        write_rowstore,
    )

    store = tempfile.mkdtemp(prefix="rowstore_merge_probe_") + "/t"
    df = spark.range(n).select(
        F.concat(F.lit("k"), (F.col("id") % 200_000).cast("string")).alias("key"),
        F.col("id").alias("val"),
        (F.col("id") % 1000).cast("double").alias("w"),
    )
    t0 = time.perf_counter()
    write_rowstore(df, store, bucket_key="key", n_buckets=64, mode="overwrite")
    tw = time.perf_counter() - t0
    files_v1 = {e["name"] for e in read_manifest(store)["files"]}

    # tenant-style concentrated update: all keys of 3 of 64 buckets
    bexpr = F.crc32(F.col("key").cast("string").cast("binary")) % 64
    upd = df.where(bexpr.isin(0, 1, 2)).withColumn("w", F.col("w") + 0.5)
    n_upd_keys = upd.select("key").distinct().count()
    t0 = time.perf_counter()
    merge_upsert_rowstore(spark, upd, store)
    tm = time.perf_counter() - t0

    man = read_manifest(store)
    touched = {e["bucket"] for e in man["files"] if "rm" in e}
    untouched_live = [
        e for e in man["files"]
        if e["bucket"] not in touched and "rm" not in e
    ]
    assert {e["name"] for e in untouched_live} <= files_v1  # no rewrite
    total = read_rowstore(spark, store).count()
    v1 = read_rowstore(spark, store, as_of_version=1).count()
    assert total == n and v1 == n
    print(
        f"merge {n:,} rows, {n_upd_keys:,} keys updated across "
        f"{len(touched)}/64 buckets: initial write {tw:.1f}s, merge {tm:.1f}s; "
        f"untouched buckets byte-identical; pre-merge snapshot intact"
    )



def probe_bigram(spark, n: int) -> None:
    """Interpolated bigram LM over n docs (60 tokens → 59 bigrams
    each): model tables are aggregates of the occurrence stream; the
    corpus joins back token-keyed."""
    from pyspark.sql import functions as F

    docs = synthetic_documents(spark, n)
    docs.count()  # warm
    toks = F.filter(F.split(F.lower("text"), "[^a-z0-9]+"), lambda x: x != F.lit(""))
    bg = F.filter(
        F.zip_with(toks, F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
                   lambda a, b: F.concat(a, F.lit(" "), b)),
        lambda x: x.isNotNull(),
    )
    t0 = time.perf_counter()
    occ = docs.select("doc_id", F.explode(bg).alias("bgr")).select(
        "doc_id", "bgr", F.substring_index("bgr", " ", 1).alias("w1")
    )
    cb = occ.groupBy("bgr").agg(F.count(F.lit(1)).alias("cb"))
    cw = occ.groupBy("w1").agg(F.count(F.lit(1)).alias("cw"))
    out = (
        occ.join(cb, "bgr").join(cw, "w1")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("nb"),
             F.sum(F.log2(F.col("cb") / F.col("cw"))).alias("s"))
    )
    out.write.format("noop").mode("overwrite").save()
    t = time.perf_counter() - t0
    print(f"bigram-lm {n:,} docs ({59*n:,} bigram positions): {t:.1f}s "
          f"({59*n/t/1e6:.1f}M positions/s)")


def probe_span(spark, n: int) -> None:
    """Span corruption over n docs: explode→window→reassemble;
    verifies mask rate lands near 15%."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    docs = synthetic_documents(spark, n)
    docs.count()  # warm
    toks = F.filter(F.split(F.lower("text"), "[^a-z0-9]+"), lambda x: x != F.lit(""))
    nblk = F.ceil(F.size(toks) / F.lit(3)).cast("int")
    t0 = time.perf_counter()
    spans = docs.select(
        "doc_id",
        F.posexplode(F.transform(
            F.sequence(F.lit(0), F.greatest(nblk - 1, F.lit(0))),
            lambda b: F.concat_ws(" ", F.slice(toks, b * 3 + 1, 3)),
        )).alias("si", "st"),
    ).where(F.col("st") != "")
    h = F.conv(F.substring(F.md5(F.concat(F.col("doc_id").cast("string"),
        F.lit("_"), F.col("si").cast("string"))), 1, 6), 16, 10).cast("bigint")
    m = (h % 100) < 15
    w = W.partitionBy("doc_id").orderBy("si")
    out = spans.select("doc_id", "si", "st", m.alias("m"),
                       (F.sum(m.cast("int")).over(w) - 1).alias("k"))
    agg = out.groupBy("doc_id").agg(F.sum(F.col("m").cast("int")).alias("nm"),
                                    F.count(F.lit(1)).alias("ns"))
    tot = agg.agg(F.sum("nm"), F.sum("ns")).first()
    t = time.perf_counter() - t0
    rate = tot[0] / tot[1]
    assert 0.12 < rate < 0.18, rate
    print(f"span-corruption {n:,} docs ({tot[1]:,} spans): {t:.1f}s "
          f"({tot[1]/t/1e6:.1f}M spans/s), mask rate {rate:.3f}")



def probe_textindex_inc(spark, n: int) -> None:
    """Incremental index: ingest 4 batches of n/4 docs; the routed
    serving read must stay ~flat while the index quadruples (it opens
    ≤ terms × batches bucket dirs, never the corpus)."""
    import tempfile

    from pyspark.sql import functions as F

    from heatmap_spark.streaming.text_index import (
        merge_batch_into_index,
        search_incremental_index,
    )

    docs = synthetic_documents(spark, n)
    docs.count()  # warm
    store = tempfile.mkdtemp(prefix="textindex_inc_probe_") + "/index"
    per = n // 4
    serve_times = []
    for b in range(4):
        batch = docs.where(
            (F.col("doc_id") >= b * per) & (F.col("doc_id") < (b + 1) * per)
        )
        t0 = time.perf_counter()
        merge_batch_into_index(spark, batch, store, b)
        ti = time.perf_counter() - t0
        t0 = time.perf_counter()
        hits = search_incremental_index(spark, store, ["w1", "w2", "w3"], k=10).count()
        ts = time.perf_counter() - t0
        serve_times.append(ts)
        print(f"batch {b}: ingest {ti:.1f}s, serve {ts:.2f}s ({hits} hits)")
    assert serve_times[-1] < 4 * serve_times[0] + 1.0, serve_times
    print(
        f"textindex-inc {n:,} docs / 4 batches: serve times {['%.2f' % t for t in serve_times]}"
        " — flat while the index grew 4x"
    )



def probe_mixer(spark, n: int) -> None:
    """token_budget_mix's segmented scan vs the flat per-lang window
    under HOT-DOMAIN skew: 90% of n doc summaries land in one lang, so
    the flat spelling sorts ~0.9n rows through a single partition while
    the segmented spelling spreads them over 256 (lang, seg) groups.
    Asserts the two selections are identical before timing claims."""
    from pyspark.sql import Window as W

    summary = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 < 9, F.lit("en"))
        .otherwise(F.concat(F.lit("l"), (F.col("id") % 7).cast("string")))
        .alias("lang"),
        (F.col("id") % 300 + 1).cast("bigint").alias("n_tokens"),
        F.md5(F.col("id").cast("string")).alias("rk"),
    )
    summary.count()  # warm
    budget = n * 10  # deep cutoff: most of the stream participates

    w_flat = (
        W.partitionBy("lang")
        .orderBy("rk", "doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    flat = summary.select(
        "doc_id", F.sum("n_tokens").over(w_flat).cast("bigint").alias("cum")
    ).where(F.col("cum") <= budget)

    seg = summary.withColumn("seg", F.substring("rk", 1, 2))
    w_seg = (
        W.partitionBy("lang", "seg")
        .orderBy("rk", "doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    within = seg.withColumn("seg_cum", F.sum("n_tokens").over(w_seg).cast("bigint"))
    totals = within.groupBy("lang", "seg").agg(
        F.sum("n_tokens").cast("bigint").alias("seg_total")
    )
    w_off = (
        W.partitionBy("lang").orderBy("seg")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    offsets = totals.select(
        "lang", "seg",
        (F.sum("seg_total").over(w_off) - F.col("seg_total")).alias("seg_off"),
    )
    segd = (
        within.join(F.broadcast(offsets), ["lang", "seg"])
        .select("doc_id", (F.col("seg_off") + F.col("seg_cum")).alias("cum"))
        .where(F.col("cum") <= budget)
    )

    t0 = time.perf_counter()
    n_seg = segd.count()
    dt_seg = time.perf_counter() - t0
    t0 = time.perf_counter()
    n_flat = flat.count()
    dt_flat = time.perf_counter() - t0
    assert n_seg == n_flat, (n_seg, n_flat)
    assert segd.exceptAll(flat).isEmpty()
    print(
        f"mixer {n:,} summaries (90% one lang), kept {n_seg:,}: "
        f"flat per-lang window {dt_flat:.1f}s vs segmented scan "
        f"{dt_seg:.1f}s = {dt_flat / dt_seg:.1f}x"
    )




def probe_entropy(spark, n: int) -> None:
    """Character-entropy gate over n docs (~420 chars each): the
    explode fans out to ~420n char occurrences, but map-side combine
    collapses each partition to <= |alphabet| rows per doc before the
    exchange — shuffle volume is alphabet-bounded, not length-bound."""
    from pyspark.sql import functions as F

    docs = synthetic_documents(spark, n)
    docs.count()  # warm
    t0 = time.perf_counter()
    chars = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), "")).alias("ch")
    ).where(F.col("ch") != "")
    counts = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    totals = counts.groupBy("doc_id").agg(F.sum("c").alias("nn"))
    term = F.round(
        -(F.col("c") / F.col("nn")) * F.log2(F.col("c") / F.col("nn")), 9
    ).cast("decimal(28,9)")
    out = (
        counts.join(totals, "doc_id")
        .groupBy("doc_id")
        .agg(F.round(F.sum(term).cast("double"), 6).alias("h"))
    )
    out.write.format("noop").mode("overwrite").save()
    t = time.perf_counter() - t0
    print(f"char-entropy {n:,} docs: {t:.1f}s ({n / t / 1000:.0f}k docs/s)")


def probe_pmi(spark, n: int) -> None:
    """PMI collocations over n docs (59n bigram positions): the
    min-count filter lands on the bigram aggregate BEFORE the unigram
    joins, so only frequent bigrams reach the join stage."""
    from pyspark.sql import functions as F

    docs = synthetic_documents(spark, n)
    docs.count()  # warm
    toks = F.filter(F.split(F.lower("text"), "[^a-z0-9]+"), lambda x: x != F.lit(""))
    bg = F.filter(
        F.zip_with(toks, F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
                   lambda a, b: F.concat(a, F.lit(" "), b)),
        lambda x: x.isNotNull(),
    )
    t0 = time.perf_counter()
    occ = docs.select(F.explode(bg).alias("bgr"))
    tok = docs.select(F.explode(toks).alias("token"))
    cb = (
        occ.groupBy("bgr").agg(F.count(F.lit(1)).alias("c12"))
        .where(F.col("c12") >= 10)
        .select("bgr", "c12",
                F.substring_index("bgr", " ", 1).alias("w1"),
                F.substring_index("bgr", " ", -1).alias("w2"))
    )
    uni = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cu"))
    tot = tok.agg(F.count(F.lit(1)).alias("n1")).crossJoin(
        occ.agg(F.count(F.lit(1)).alias("n2"))
    )
    out = (
        cb.join(uni.withColumnRenamed("token", "w1").withColumnRenamed("cu", "c1"), "w1")
        .join(uni.withColumnRenamed("token", "w2").withColumnRenamed("cu", "c2"), "w2")
        .crossJoin(F.broadcast(tot))
        .select(F.log2((F.col("c12") / F.col("n2"))
                       / ((F.col("c1") / F.col("n1")) * (F.col("c2") / F.col("n1")))).alias("pmi"))
    )
    n_out = out.count()
    t = time.perf_counter() - t0
    print(f"pmi {n:,} docs ({59*n:,} bigram positions): {t:.1f}s "
          f"({59*n/t/1e6:.1f}M positions/s), {n_out:,} collocations")



def probe_skipping(spark, n: int) -> None:
    """Data skipping at n rows (default 2M): write with random layout
    (range predicates on a non-key column prune nothing), then
    optimize_rowstore clusters by that column and the same scan prunes
    most files — wall-clock before/after plus reader-level file
    counts."""
    import tempfile

    from pyspark.sql.datasource import GreaterThanOrEqual

    from heatmap_spark.sources.rowstore import (
        make_rowstore_datasource,
        optimize_rowstore,
        read_rowstore,
        write_rowstore,
    )

    df = spark.range(n).select(
        F.concat(F.lit("u"), (F.col("id") % 100_000).cast("string")).alias("user_id"),
        (F.col("id") * 7919 % 1_000_000).alias("metric"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    df.count()  # warm
    store = tempfile.mkdtemp(prefix="rowstore_skip_") + "/t"
    write_rowstore(df.repartition(32), store, bucket_key="user_id",
                   n_buckets=16, mode="overwrite")
    cls = make_rowstore_datasource()

    def nfiles(filters):
        ds = cls(options={"path": store, "max_partition_bytes": "1",
                          "open_cost_bytes": "0"})
        r = ds.reader(ds.schema())
        if filters:
            r.pushFilters(filters)
        return len(r.partitions())

    flt = [GreaterThanOrEqual(("metric",), 990_000)]
    pre_all, pre_f = nfiles([]), nfiles(flt)
    t0 = time.perf_counter()
    hits = read_rowstore(spark, store).where(F.col("metric") >= 990_000).count()
    t_pre = time.perf_counter() - t0
    t0 = time.perf_counter()
    optimize_rowstore(spark, store, by="metric")
    t_opt = time.perf_counter() - t0
    post_all, post_f = nfiles([]), nfiles(flt)
    t0 = time.perf_counter()
    hits2 = read_rowstore(spark, store).where(F.col("metric") >= 990_000).count()
    t_post = time.perf_counter() - t0
    assert hits == hits2
    print(
        f"data-skipping {n:,} rows: pre-optimize scan {pre_f}/{pre_all} files "
        f"{t_pre:.1f}s; optimize(by=metric) {t_opt:.1f}s; post-optimize "
        f"{post_f}/{post_all} files {t_post:.1f}s ({hits:,} hits, "
        f"{t_pre / max(t_post, 1e-9):.1f}x)"
    )


def probe_codec(spark, n: int) -> None:
    """Python-codec ceiling, measured (VERDICT r8 item 5): the
    from-scratch MJPEG decode is a sequential Python bit-loop per
    file — correct and test-pinned but far slower than libjpeg.  The
    probe times (a) the bare binaryFile scan over n//10 synthetic AVI
    files (10 frames of 64x64 gray each) and (b) the same scan plus a
    FULL T.81 decode of every frame, both distributed, so the "swap
    the kernel body for PIL/libjpeg at production" claim
    (operators/multimodal.py module docstring) carries a measured
    frames/s + MPx/s number and the scan-vs-kernel split is explicit:
    the plan shape (split-planned binaryFile scan + map-only decode)
    is the one a native kernel would keep."""
    import shutil
    import tempfile

    import pandas as pd

    from heatmap_spark.operators.multimodal import (
        avi_encode,
        avi_frame_blobs,
        jpeg_decode,
    )

    n_files = max(1, n // 10)
    d = tempfile.mkdtemp(prefix="codec_probe_")
    aenc = avi_encode

    def wbatches(it):
        import os

        import numpy as np

        for pdf in it:
            cnt = 0
            for i in pdf["id"]:
                vals = (
                    np.arange(64 * 64 * 10, dtype=np.int64) * (int(i) * 2 + 1) * 104729
                ) % 256
                frames = [
                    vals[f * 4096 : (f + 1) * 4096].reshape(64, 64).astype(np.uint8)
                    for f in range(10)
                ]
                with open(os.path.join(d, f"{int(i)}.avi"), "wb") as fh:
                    fh.write(aenc(frames, fps=10))
                cnt += 1
            yield pd.DataFrame({"n": [cnt]})

    wrote = (
        spark.range(n_files)
        .repartition(32)
        .mapInPandas(wbatches, schema="n long")
        .agg(F.sum("n"))
        .first()[0]
    )
    assert wrote == n_files

    scan = spark.read.format("binaryFile").load(d)
    t0 = time.perf_counter()
    n_bytes = scan.agg(F.sum(F.length("content"))).first()[0]
    t_scan = time.perf_counter() - t0

    fb, jd = avi_frame_blobs, jpeg_decode

    def dbatches(it):
        for pdf in it:
            nf = npx = 0
            for content in pdf["content"]:
                _fps, _w, _h, blobs = fb(bytes(content))
                for b in blobs:
                    hh, ww, _ch, _px = jd(b)
                    nf += 1
                    npx += hh * ww
            yield pd.DataFrame({"frames": [nf], "pixels": [npx]})

    t0 = time.perf_counter()
    row = (
        scan.select("content")
        .mapInPandas(dbatches, schema="frames long, pixels long")
        .agg(F.sum("frames"), F.sum("pixels"))
        .first()
    )
    t_dec = time.perf_counter() - t0
    frames, pixels = row[0], row[1]
    assert frames == n_files * 10 and pixels == frames * 4096
    print(
        f"codec ceiling {n_files:,} AVI files / {frames:,} frames "
        f"({n_bytes/1e6:.1f} MB): scan-only {t_scan:.2f}s; scan+decode "
        f"{t_dec:.2f}s = {frames/t_dec:,.0f} frames/s, "
        f"{pixels/t_dec/1e6:.1f} MPx/s (Python T.81 kernel); kernel share "
        f"{100*(t_dec-t_scan)/t_dec:.0f}% of wall — a libjpeg-class kernel "
        f"(~100x per-pixel) would leave the scan-bound floor of ~{t_scan:.2f}s"
    )
    shutil.rmtree(d, ignore_errors=True)


def probe_graphann(spark, n: int) -> None:
    """Graph-ANN scale: NN-Descent build cost per round (candidates
    ~N·degree², two keyed joins + a top-K window each) and broadcast
    beam-search latency/recall at corpus sizes the 500-vector fixture
    can't exercise.  Recall is vs exact brute force on 10 queries."""
    from heatmap_spark.operators.similarity import (
        graph_beam_search,
        hnsw_hierarchy,
        hnsw_search,
        knn_cosine_df,
    )

    emb = synthetic_clustered_embeddings(spark, n).localCheckpoint(eager=True)
    t0 = time.perf_counter()
    graphs = hnsw_hierarchy(emb, degree=12, iters=3)
    n_edges = graphs[0][1].count()
    t_build = time.perf_counter() - t0
    exact = knn_cosine_df(emb, 10, 5).select("query_id", "neighbor_id")
    exact = exact.localCheckpoint(eager=True)
    ne = exact.count()

    def recall(df):
        return (
            exact.join(
                df.select("query_id", "neighbor_id"),
                ["query_id", "neighbor_id"],
            ).count()
            / ne
        )

    t0 = time.perf_counter()
    r_flat = recall(graph_beam_search(emb, graphs[0][1], 10, 5, beam=16, hops=5))
    t_flat = time.perf_counter() - t0
    t0 = time.perf_counter()
    r_hier = recall(hnsw_search(emb, graphs, 10, 5, beam=16, hops=5))
    t_hier = time.perf_counter() - t0
    from heatmap_spark.operators.similarity import adaptive_beam

    auto = adaptive_beam(n)
    t0 = time.perf_counter()
    r_auto = recall(hnsw_search(emb, graphs, 10, 5, beam=None, hops=5))
    t_auto = time.perf_counter() - t0
    print(
        f"graph-ANN {n:,} clustered vecs: hierarchy({len(graphs)} levels, "
        f"deg 12, 3 rounds) {t_build:.1f}s ({n_edges:,} L0 edges); flat "
        f"L0-only search recall@5 {r_flat:.2f} in {t_flat:.1f}s vs "
        f"HIERARCHICAL descent recall@5 {r_hier:.2f} in {t_hier:.1f}s "
        f"(fixed beam 16) / {r_auto:.2f} in {t_auto:.1f}s (ADAPTIVE "
        f"beam=None → {auto} = 2·log2(N); recall should hold at any N "
        f"without retuning)"
    )


def probe_geofence(spark, n: int) -> None:
    """Point-in-polygon classification + transition detection at 100×
    bench scale: the membership test is plan-literal Column math fused
    into the scan, so classification should run at scan rate; the
    transition pass adds one (user, fence) window."""
    from heatmap_spark.operators.geo import GEOFENCES, point_in_polygon

    loc = synthetic_locations(spark, n).where("source <> 'background'")
    lon, lat = F.col("longitude"), F.col("latitude")
    flags = F.array(
        *[
            F.struct(
                F.lit(name).alias("fence"),
                point_in_polygon(lon, lat, poly).alias("inside"),
            )
            for name, poly in GEOFENCES
        ]
    )
    per_point = loc.select("user_id", "ts", F.explode(flags).alias("f")).select(
        "user_id", "ts", F.col("f.fence").alias("fence"), F.col("f.inside").alias("inside")
    )
    t0 = time.perf_counter()
    counts = (
        per_point.groupBy("fence")
        .agg(F.sum(F.when(F.col("inside"), 1).otherwise(0)).alias("n_points"))
        .collect()
    )
    t_cls = time.perf_counter() - t0
    from pyspark.sql.window import Window as W

    w = W.partitionBy("user_id", "fence").orderBy("ts")
    t0 = time.perf_counter()
    trans = (
        per_point.select(
            "fence", "inside", F.lag("inside").over(w).alias("prev")
        )
        .where(F.col("inside") & ~F.coalesce("prev", F.lit(False)))
        .groupBy("fence")
        .count()
        .collect()
    )
    t_tr = time.perf_counter() - t0
    inside_total = sum(r["n_points"] for r in counts)
    entries = sum(r["count"] for r in trans)
    print(
        f"geofence {n:,} pts × {len(GEOFENCES)} fences: classify+agg "
        f"{t_cls:.1f}s ({n / t_cls / 1e6:.1f}M pts/s), {inside_total:,} "
        f"inside; transition window {t_tr:.1f}s, {entries:,} entries"
    )


def probe_hll(spark, n: int) -> None:
    """Portable-HLL register build at 100× bench scale, estimate
    accuracy vs exact, and the cost of the register-max union."""
    from heatmap_spark.operators.profiling import hll_estimate, hll_register_table

    m = max(n // 3, 1)
    ev = spark.range(n).select(
        F.concat(F.lit("t"), (F.col("id") % 5).cast("string")).alias("event_type"),
        ((F.col("id") * 2654435761) % m).alias("user_id"),
    )
    t0 = time.perf_counter()
    regs = hll_register_table(ev, "user_id", ["event_type"]).localCheckpoint(
        eager=True
    )
    t_build = time.perf_counter() - t0
    t0 = time.perf_counter()
    merged = (
        regs.groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
        .select(F.lit("__all__").alias("event_type"), "bucket", "rho")
    )
    ests = {
        r["event_type"]: r["hll_users"]
        for r in hll_estimate(regs.unionByName(merged), ["event_type"]).collect()
    }
    t_est = time.perf_counter() - t0
    exact_all = ev.select("user_id").distinct().count()
    err = abs(ests["__all__"] - exact_all) / exact_all
    print(
        f"portable HLL {n:,} events: register build {t_build:.1f}s "
        f"({n / t_build / 1e6:.1f}M rows/s, ≤256 rows/type state); "
        f"union+estimate {t_est:.1f}s; '__all__' est {ests['__all__']:,.0f} "
        f"vs exact {exact_all:,} (rel err {err:.3f}; m=256 ⇒ σ≈6.5%)"
    )


def probe_kmvstore(spark, n: int) -> None:
    """Streaming KMV (θ-sketch) store at 100× bench scale: per-batch
    cost is one distinct + per-type top-k over the BATCH (partials
    ≤64 rows/type), compaction folds k-row tables, and the
    accumulated estimate must match the one-shot sketch exactly (the
    KMV merge identity is exact, not approximate)."""
    import tempfile

    from heatmap_spark.operators.profiling import kmv_hashes
    from heatmap_spark.streaming.kmv import (
        _topk,
        accumulated_sketch,
        compact_kmv_store,
        merge_batch_into_kmv_store,
        serve_kmv_estimates,
    )

    m = max(n // 3, 1)
    ev = spark.range(n).select(
        F.concat(F.lit("t"), (F.col("id") % 5).cast("string")).alias("event_type"),
        ((F.col("id") * 2654435761) % m).alias("user_id"),
        F.col("id").alias("event_id"),
    )
    store = tempfile.mkdtemp(prefix="kmv_probe_") + "/store"
    t0 = time.perf_counter()
    for b in range(3):
        batch = ev.where(
            F.expr(f"CAST(event_id * 3 DIV {n} AS INT)") == b
        ).select("event_type", "user_id")
        merge_batch_into_kmv_store(spark, batch, store, b)
        if b == 1:
            compact_kmv_store(spark, store)
    t_build = time.perf_counter() - t0
    t0 = time.perf_counter()
    ests = {
        r["event_type"]: r["kmv_users"]
        for r in serve_kmv_estimates(spark, store).collect()
    }
    t_est = time.perf_counter() - t0
    one_shot = sorted(
        (r["event_type"], r["hv"])
        for r in _topk(kmv_hashes(ev, "user_id", ["event_type"]), 64).collect()
    )
    streamed = sorted(
        (r["event_type"], r["hv"])
        for r in accumulated_sketch(spark, store).collect()
    )
    exact_all = ev.select("user_id").distinct().count()
    err = abs(ests["__all__"] - exact_all) / exact_all
    print(
        f"KMV store {n:,} events, 3 batches + mid-stream compaction: "
        f"ingest {t_build:.1f}s ({n / t_build / 1e6:.1f}M rows/s, ≤64 "
        f"rows/type state); serve {t_est:.1f}s; accumulated sketch "
        f"{'==' if streamed == one_shot else '!='} one-shot (exact merge "
        f"identity); '__all__' est {ests['__all__']:,.0f} vs exact "
        f"{exact_all:,} (rel err {err:.3f}; k=64 ⇒ σ≈12.6%)"
    )


def probe_driftstore(spark, n: int) -> None:
    """Streaming drift store at 100× bench scale: per-batch cost is
    one hash aggregate over the batch, state is the distinct-value
    table (quantized values here, the store's intended regime), and
    the served KS must equal the one-shot statistic exactly."""
    import tempfile

    from heatmap_spark.operators import profiling as P_
    from heatmap_spark.operators.profiling import (
        ks_from_value_table,
        mwu_from_value_table,
        w1_from_value_table,
    )
    from heatmap_spark.streaming.drift import (
        accumulated_value_table,
        compact_drift_store,
        merge_batch_into_drift_store,
        serve_drift_ks,
        serve_drift_mwu,
        serve_drift_w1,
    )

    ev = _synthetic_events(spark, n)
    drift = F.when(F.col("event_id") > n // 2, F.lit(7.5)).otherwise(F.lit(0.0))
    labeled = ev.select(
        "event_type",
        F.when(F.col("event_id") <= n // 2, F.lit(1)).otherwise(F.lit(0)).alias("is_a"),
        (((F.col("event_id") * 104729) % 4096).cast("double") / 16.0 + drift).alias("value"),
        "event_id",
    )
    store = tempfile.mkdtemp(prefix="drift_probe_") + "/store"
    t0 = time.perf_counter()
    for b in range(3):
        batch = labeled.where(
            F.expr(f"CAST(event_id * 3 DIV {n} AS INT)") == b
        ).select("event_type", "is_a", "value")
        merge_batch_into_drift_store(spark, batch, store, b)
        if b == 1:
            compact_drift_store(spark, store)
    t_build = time.perf_counter() - t0
    n_state = accumulated_value_table(spark, store).count()
    per_val = labeled.groupBy("event_type", "value").agg(
        F.sum("is_a").alias("da"), F.sum(F.lit(1) - F.col("is_a")).alias("db")
    )
    # all three served statistics must be bit-identical to their
    # one-shot twins over the full history (VERDICT r10 item 5 extends
    # the original KS-only parity to MWU and W1)
    arms = [
        ("KS", serve_drift_ks, ks_from_value_table),
        ("MWU", serve_drift_mwu, mwu_from_value_table),
        ("W1", serve_drift_w1, w1_from_value_table),
    ]
    lines = []
    for name, serve_fn, oneshot_fn in arms:
        t0 = time.perf_counter()
        served = sorted(tuple(r) for r in serve_fn(spark, store).collect())
        t_serve = time.perf_counter() - t0
        one_shot = sorted(tuple(r) for r in oneshot_fn(per_val).collect())
        verdict = "BIT-IDENTICAL" if served == one_shot else "DIFFERS"
        lines.append(f"{name} {t_serve:.1f}s {verdict}")
    print(
        f"drift store {n:,} events, 3 batches + mid-stream compaction: "
        f"ingest {t_build:.1f}s ({n / t_build / 1e6:.1f}M rows/s), state "
        f"{n_state:,} (type, value) rows; served vs one-shot: "
        + "; ".join(lines)
    )


def probe_kllstore(spark, n: int) -> None:
    """KLL sketch-drift store at 100× bench scale: per-batch cost is
    one hash aggregate; state is FIXED-SIZE per (type, half) sketch
    regardless of distinct values (the exact drift arm's state grows
    with them); served approximate KS must sit inside the pinned 0.08
    bound of the exact statistic."""
    import tempfile

    from heatmap_spark.operators.profiling import (
        ks_from_value_table,
        mwu_from_value_table,
        w1_from_value_table,
    )
    from heatmap_spark.streaming.kll_store import (
        accumulated_sketches,
        compact_kll_store,
        emit_binning_histogram,
        emit_binning_snapshot,
        merge_batch_into_kll_store,
        read_binning_histogram,
        read_binning_timeline,
        serve_kll_drift,
        serve_kll_mwu,
        serve_kll_w1,
    )

    ev = _synthetic_events(spark, n)
    drift = F.when(F.col("event_id") > n // 2, F.lit(7.5)).otherwise(F.lit(0.0))
    # CONTINUOUS values (hash-noise added) — the regime where the
    # exact arm's distinct-value state would approach n rows and the
    # sketch arm is the only viable store
    labeled = ev.select(
        "event_type",
        F.when(F.col("event_id") <= n // 2, F.lit(1)).otherwise(F.lit(0)).alias("is_a"),
        (
            ((F.col("event_id") * 104729) % 4096).cast("double") / 16.0
            + drift
            + F.pmod(F.hash("event_id"), F.lit(1000000)).cast("double") / 1e9
        ).alias("value"),
        "event_id",
    )
    store = tempfile.mkdtemp(prefix="kll_probe_") + "/store"
    t0 = time.perf_counter()
    t_emit = 0.0
    for b in range(3):
        batch = labeled.where(
            F.expr(f"CAST(event_id * 3 DIV {n} AS INT)") == b
        ).select("event_type", "is_a", "value")
        merge_batch_into_kll_store(spark, batch, store, b)
        t1 = time.perf_counter()
        emit_binning_snapshot(spark, store, b)
        emit_binning_histogram(
            spark, store, batch.select("event_type", "value"), b
        )
        t_emit += time.perf_counter() - t1
        if b == 1:
            compact_kll_store(spark, store)
    t_build = time.perf_counter() - t0 - t_emit
    acc = accumulated_sketches(spark, store)
    state_rows = acc.count()
    state_bytes = sum(
        len(bytes(r["sk_a"])) + len(bytes(r["sk_b"])) for r in acc.collect()
    )
    n_distinct = labeled.select("event_type", "value").distinct().count()
    t0 = time.perf_counter()
    served = {
        r["event_type"]: r["ks_approx"]
        for r in serve_kll_drift(spark, store).collect()
    }
    t_serve = time.perf_counter() - t0
    per_val = labeled.groupBy("event_type", "value").agg(
        F.sum("is_a").alias("da"), F.sum(F.lit(1) - F.col("is_a")).alias("db")
    )
    exact = {
        r["event_type"]: r["ks_d"]
        for r in ks_from_value_table(per_val).collect()
    }
    gap = max(abs(served[t] - exact[t]) for t in exact)
    served_w1 = {
        r["event_type"]: r["w1_approx"]
        for r in serve_kll_w1(spark, store).collect()
    }
    exact_w1 = {
        r["event_type"]: r["w1"]
        for r in w1_from_value_table(per_val).collect()
    }
    vrange = labeled.agg(F.max("value") - F.min("value")).first()[0]
    gap_w1 = max(abs(served_w1[t] - exact_w1[t]) for t in exact_w1)
    served_mwu = {
        r["event_type"]: r["auc_approx"]
        for r in serve_kll_mwu(spark, store).collect()
    }
    exact_mwu = {
        r["event_type"]: r["u2"]
        / (2.0 * r["n_first_half"] * r["n_second_half"])
        for r in mwu_from_value_table(per_val).collect()
    }
    gap_mwu = max(abs(served_mwu[t] - exact_mwu[t]) for t in exact_mwu)
    shifts = sorted(
        (r["batch_id"], r["boundary_shift"])
        for r in read_binning_timeline(spark, store).collect()
    )
    l1 = {}
    for r in read_binning_histogram(spark, store).collect():
        l1[r["batch_id"]] = max(l1.get(r["batch_id"], 0.0), r["l1_vs_uniform"])
    print(
        f"kll drift store {n:,} events ({n_distinct:,} distinct (type,value) "
        f"— the exact arm's state), 3 batches + mid-stream compaction: "
        f"ingest {t_build:.1f}s ({n / t_build / 1e6:.1f}M rows/s), state "
        f"{state_rows} sketch rows / {state_bytes / 1024:.0f} KiB total; "
        f"serve approx KS {t_serve:.1f}s, max |approx-exact| {gap:.4f} "
        f"({'INSIDE' if gap <= 0.08 else 'OUTSIDE'} the pinned 0.08 bound); "
        f"W1 max gap {gap_w1:.3f} of range {vrange:.0f} "
        f"({'INSIDE' if gap_w1 <= 0.05 * vrange else 'OUTSIDE'} 0.05·range); "
        f"MWU AUC max gap {gap_mwu:.4f} "
        f"({'INSIDE' if gap_mwu <= 0.08 else 'OUTSIDE'} the pinned 0.08); "
        f"binning dashboard: 3 snapshot+histogram emits {t_emit:.1f}s "
        f"total (sketch-relation-sized + one O(batch) map-only agg), max "
        f"per-batch boundary shift "
        f"{max(s for _, s in shifts if s is not None):.4f} of range — the "
        f"randomized-sketch noise floor (k=200 rank error ~1.3%) HIDES "
        f"the planted +7.5 drift (2.8% of range) in the boundary arm; "
        f"the population arm separates it: per-batch L1 vs uniform "
        f"{[(b, round(v, 4)) for b, v in sorted(l1.items())]} — batch 0 "
        f"is the drift-free reference (its L1 IS the sketch-boundary "
        f"error floor; multinomial noise alone at 3.3M-row batches "
        f"would be ~0.001) and the half/fully-drifted batches rise ~2x "
        f"above it, on the L1-hardest drift shape (a pure location "
        f"shift moves only edge-bin mass)"
    )


def probe_binning(spark, n: int) -> None:
    """Equal-frequency quantile binning at 100× bench scale, both
    boundary sources (VERDICT r11 item 5):

    * EXACT arm on a tie-heavy quantized column (4096 distinct values
      per type at 10M rows) — the rank window runs over the
      distinct-value table, not rows, and percentile_disc ties make
      bin populations uneven by whole tie groups (measured as skew);
    * SKETCH-SERVED arm (serve_kll_bins) on a CONTINUOUS column where
      the distinct-value table would approach n rows — boundaries come
      from the pooled KLL sketches (fixed-size state), binning tail
      identical and map-only.
    """
    import tempfile

    from heatmap_spark.operators.profiling import equal_frequency_bins
    from heatmap_spark.streaming.kll_store import (
        accumulated_sketches,
        compact_kll_store,
        merge_batch_into_kll_store,
        serve_kll_bins,
    )

    ev = _synthetic_events(spark, n)
    # exact arm: quantized values, heavy ties (~n/4096 rows per value)
    quantized = ev.select(
        "event_type",
        (((F.col("event_id") * 104729) % 4096).cast("double") / 16.0).alias(
            "value"
        ),
    )
    n_distinct = quantized.distinct().count()
    t0 = time.perf_counter()
    bins = equal_frequency_bins(quantized).collect()
    t_exact = time.perf_counter() - t0
    per_type_n: dict[str, int] = {}
    for r in bins:
        per_type_n[r["event_type"]] = per_type_n.get(r["event_type"], 0) + r["n_rows"]
    skew = max(
        abs(r["n_rows"] - per_type_n[r["event_type"]] / 10)
        / (per_type_n[r["event_type"]] / 10)
        for r in bins
    )
    total = sum(r["n_rows"] for r in bins)
    print(
        f"exact quantile binning {n:,} rows ({n_distinct:,} distinct "
        f"(type,value) — the window's sort size): {t_exact:.1f}s "
        f"({n / t_exact / 1e6:.1f}M rows/s), {len(bins)} bins cover "
        f"{total:,} rows, max bin-population skew {skew:.1%} of ideal "
        f"N/10 (percentile_disc ties absorb whole tie groups)"
    )

    # sketch arm: continuous values — hash noise makes (type, value)
    # effectively unique, the regime where the exact arm's window
    # would sort ~n rows and the KLL boundaries are the scale path
    continuous = ev.select(
        "event_type",
        F.lit(1).alias("is_a"),
        (
            ((F.col("event_id") * 104729) % 4096).cast("double") / 16.0
            + F.pmod(F.hash("event_id"), F.lit(1000000)).cast("double") / 1e9
        ).alias("value"),
        "event_id",
    )
    store = tempfile.mkdtemp(prefix="bin_probe_") + "/store"
    t0 = time.perf_counter()
    for b in range(3):
        batch = continuous.where(
            F.expr(f"CAST(event_id * 3 DIV {n} AS INT)") == b
        ).select("event_type", "is_a", "value")
        merge_batch_into_kll_store(spark, batch, store, b)
        if b == 1:
            compact_kll_store(spark, store)
    t_build = time.perf_counter() - t0
    acc = accumulated_sketches(spark, store)
    state_bytes = sum(
        len(bytes(r["sk_a"])) + len(bytes(r["sk_b"])) for r in acc.collect()
    )
    t0 = time.perf_counter()
    sbins = serve_kll_bins(
        spark, store, continuous.select("event_type", "value")
    ).collect()
    t_bin = time.perf_counter() - t0
    per_type_n = {}
    for r in sbins:
        per_type_n[r["event_type"]] = per_type_n.get(r["event_type"], 0) + r["n_rows"]
    sskew = max(
        abs(r["n_rows"] - per_type_n[r["event_type"]] / 10)
        / (per_type_n[r["event_type"]] / 10)
        for r in sbins
    )
    stotal = sum(r["n_rows"] for r in sbins)
    print(
        f"KLL-served binning {n:,} CONTINUOUS rows (distinct ≈ n — exact "
        f"arm would sort it): sketch ingest {t_build:.1f}s, state "
        f"{state_bytes / 1024:.0f} KiB; boundary serve + map-only bin "
        f"{t_bin:.1f}s ({n / t_bin / 1e6:.1f}M rows/s), {len(sbins)} bins "
        f"cover {stotal:,} rows, max bin-population skew {sskew:.1%} of "
        f"ideal (KLL rank error, no tie absorption)"
    )


def probe_dsir(spark, n: int) -> None:
    """DSIR weights at 100× bench scale: the λ table stays ≤1024 rows
    no matter the corpus, so cost is two tokenize passes + three hash
    aggregations."""
    from heatmap_spark.operators.textops import dsir_weights_df

    docs = synthetic_documents(spark, n).select(
        "doc_id",
        F.concat(
            F.lit(""),
            F.element_at(
                F.array(*[F.lit(x) for x in ["en", "de", "es", "fr", "zh"]]),
                (F.col("doc_id") % 5 + 1).cast("int"),
            ),
        ).alias("lang"),
        "text",
    )
    t0 = time.perf_counter()
    out = dsir_weights_df(docs).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("selected"), 1).otherwise(0)).alias("sel"),
    ).collect()[0]
    t = time.perf_counter() - t0
    print(
        f"DSIR {n:,} docs (60 tokens each): {t:.1f}s "
        f"({n / t / 1e3:.0f}k docs/s), {out['sel']:,}/{out['n']:,} selected "
        f"(λ table ≤1024 rows broadcast)"
    )


def probe_joinview(spark, n: int) -> None:
    """Incremental join-view maintenance at scale: n left rows / 3n
    right rows arriving in 5 misaligned batches each; per-batch cost is
    delta-vs-state, and the maintained view must count-match the
    one-shot join."""
    import shutil
    import tempfile

    from heatmap_spark.streaming.joinview import (
        compact_join_view,
        merge_batch_into_join_view,
        read_join_view,
    )

    left = spark.range(n).select(
        F.col("id").alias("okey"), (F.col("id") % 97).alias("attr")
    )
    right = spark.range(3 * n).select(
        (F.col("id") % n).alias("okey"), (F.col("id") % 31).alias("val")
    )
    store = tempfile.mkdtemp(prefix="jv_probe_") + "/store"
    try:
        t0 = time.perf_counter()
        per_batch = []
        for b in range(5):
            tb = time.perf_counter()
            ld = left.where(F.expr(f"CAST(okey * 5 DIV {n} AS INT)") == b)
            rd = right.where(F.col("okey") % 5 == b)
            merge_batch_into_join_view(spark, store, b, ld, rd, ["okey"])
            per_batch.append(time.perf_counter() - tb)
            if b == 2:
                compact_join_view(spark, store)
        t_all = time.perf_counter() - t0
        got = read_join_view(spark, store).count()
        want = left.join(right, "okey").count()
        assert got == want, (got, want)
        print(
            f"join-view {n:,}⋈{3 * n:,} over 5 misaligned batches: "
            f"{t_all:.1f}s total (per-batch {' '.join(f'{t:.1f}' for t in per_batch)}s, "
            f"compaction after batch 2); view rows {got:,} == one-shot join"
        )
    finally:
        shutil.rmtree(os.path.dirname(store), ignore_errors=True)


def probe_binaryann(spark, n: int) -> None:
    """Binary 1-bit search at 100× bench scale: code-build rate (map
    only), Hamming-shortlist+rerank latency for 10 queries, and the
    realized recall vs exact brute force."""
    from pyspark.sql.window import Window as W

    from heatmap_spark.operators.similarity import (
        binary_codes,
        dot_expr,
        knn_cosine_df,
        norm_expr,
    )

    emb = synthetic_clustered_embeddings(spark, n).select(
        "vec_id", F.col("vec").cast("array<double>").alias("vec")
    )
    t0 = time.perf_counter()
    codes = binary_codes(emb).localCheckpoint(eager=True)
    t_build = time.perf_counter() - t0

    shortlist = 4096
    queries = codes.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("code_lo").alias("qlo"),
        F.col("code_hi").alias("qhi"),
    )
    ham = (
        F.bit_count(F.col("qlo").bitwiseXOR(F.col("code_lo")))
        + F.bit_count(F.col("qhi").bitwiseXOR(F.col("code_hi")))
    ).cast("int")
    w = W.partitionBy("query_id").orderBy(F.asc("hamming"), F.asc("neighbor_id"))
    t0 = time.perf_counter()
    short = (
        codes.crossJoin(F.broadcast(queries))
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), ham.alias("hamming"))
        .select("query_id", "neighbor_id", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= shortlist)
    )
    nvec = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("vec").alias("nvec"),
        norm_expr(F.col("vec")).alias("nn"),
    )
    qvec = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("qvec"),
        norm_expr(F.col("vec")).alias("qn"),
    )
    cos = F.round(
        dot_expr(F.col("qvec"), F.col("nvec")) / (F.col("qn") * F.col("nn")), 6
    )
    w2 = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    top = (
        short.join(nvec, "neighbor_id")
        .join(F.broadcast(qvec), "query_id")
        .select("query_id", "neighbor_id", cos.alias("cosine"))
        .select("query_id", "neighbor_id", F.row_number().over(w2).alias("rk"))
        .where(F.col("rk") <= 5)
        .localCheckpoint(eager=True)
    )
    t_search = time.perf_counter() - t0
    t0 = time.perf_counter()
    exact = knn_cosine_df(emb, 10, 5).select("query_id", "neighbor_id")
    ne = exact.count()
    hits = exact.join(top.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"]).count()
    t_exact = time.perf_counter() - t0
    print(
        f"binary ANN {n:,} vecs: code build {t_build:.1f}s "
        f"({n / t_build / 1e6:.1f}M vecs/s, 16 B/vec); shortlist {shortlist} "
        f"+ rerank for 10 queries {t_search:.1f}s vs exact {t_exact:.1f}s; "
        f"recall@5 {hits / ne:.2f}"
    )

    # RaBitQ asymmetric-estimator arm: same codes + 2 corpus floats,
    # shortlist by signed query-coordinate sums instead of Hamming —
    # compare recall at the SAME shortlist size
    from functools import reduce
    from operator import add

    from heatmap_spark.operators.similarity import fwht_rotate, rabitq_codes

    rcodes = rabitq_codes(emb).localCheckpoint(eager=True)
    rqvec = (
        emb.where(F.col("vec_id") < 10)
        .select("vec_id", fwht_rotate("vec").alias("vec"))
        .localCheckpoint(eager=True)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("vec").alias("qvec"),
            norm_expr(F.col("vec")).alias("qn"),
        )
    )

    def signed_sum(code, lo):
        return reduce(
            add,
            [
                F.when(
                    code.bitwiseAND(F.lit(1 << i)) != 0,
                    F.element_at(F.col("qvec"), lo + i + 1),
                ).otherwise(-F.element_at(F.col("qvec"), lo + i + 1))
                for i in range(32)
            ],
        )

    est = (
        (signed_sum(F.col("code_lo"), 0) + signed_sum(F.col("code_hi"), 32))
        * F.col("nn")
        / (F.col("qn") * F.col("sum_abs"))
    )
    we = W.partitionBy("query_id").orderBy(F.desc("est"), F.asc("neighbor_id"))
    t0 = time.perf_counter()
    rshort = (
        rcodes.crossJoin(F.broadcast(rqvec))
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), est.alias("est"))
        .select("query_id", "neighbor_id", F.row_number().over(we).alias("rn"))
        .where(F.col("rn") <= shortlist)
    )
    rtop = (
        rshort.join(nvec, "neighbor_id")
        .join(F.broadcast(qvec), "query_id")
        .select("query_id", "neighbor_id", cos.alias("cosine"))
        .select("query_id", "neighbor_id", F.row_number().over(w2).alias("rk"))
        .where(F.col("rk") <= 5)
        .localCheckpoint(eager=True)
    )
    t_rab = time.perf_counter() - t0
    rhits = exact.join(
        rtop.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"]
    ).count()
    print(
        f"rabitq ANN {n:,} vecs: estimator shortlist {shortlist} + rerank "
        f"{t_rab:.1f}s (24 B/vec); recall@5 {rhits / ne:.2f} vs Hamming "
        f"{hits / ne:.2f} at the same shortlist"
    )

    # the estimator's edge is at TIGHT shortlists (the memory-bound
    # serving point): re-rank only the top-64 of each arm's ranking
    def small_recall(sl):
        t5 = (
            sl.where(F.col("rn") <= 64)
            .join(nvec, "neighbor_id")
            .join(F.broadcast(qvec), "query_id")
            .select("query_id", "neighbor_id", cos.alias("cosine"))
            .select("query_id", "neighbor_id", F.row_number().over(w2).alias("rk"))
            .where(F.col("rk") <= 5)
        )
        return (
            exact.join(
                t5.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"]
            ).count()
            / ne
        )

    print(
        f"rabitq vs Hamming at shortlist 64 ({n:,} vecs, clustered): "
        f"estimator recall@5 {small_recall(rshort):.2f} vs Hamming "
        f"{small_recall(short):.2f} — on clustered corpora the true "
        f"neighbors share the query's exact code, so code-match-first "
        f"(Hamming) wins tight shortlists; the estimator wins on "
        f"near-isotropic data (fixture: 1.00 vs 0.86)"
    )


def probe_unigram(spark, n: int) -> None:
    """Unigram-LM trainer at scale: the corpus pass is the word
    aggregate; EM cost tracks DISTINCT words (the vocabulary table),
    not corpus rows."""
    from heatmap_spark.operators.textops import unigram_train

    docs = synthetic_documents(spark, n)
    t0 = time.perf_counter()
    vocab = unigram_train(docs, vocab_size=96)
    t = time.perf_counter() - t0
    n_words = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .where(F.col("w") != "")
        .distinct()
        .count()
    )
    multi = sum(1 for p, _, _ in vocab if len(p) > 1)
    print(
        f"unigram-LM {n:,} docs ({n_words:,} distinct words): train "
        f"{t:.1f}s → {len(vocab)} pieces ({multi} multi-char); EM ran on "
        f"the word table, corpus touched once"
    )


def probe_drifttests(spark, n: int) -> None:
    """The drift trio at 100× bench scale over synthetic events: PSI
    (binned), KS (one sorted window/type), MWU (one ranked window/type)
    — the windows dominate; PSI is aggregate-only."""
    from heatmap_spark.operators import profiling as P_

    ev = _synthetic_events(spark, n)
    # deterministic value with a planted second-half mean shift so the
    # tests have something to detect
    drift = F.when(
        F.col("event_id") > n // 2, F.lit(7.5)
    ).otherwise(F.lit(0.0))
    tmp = ev.select(
        "event_type",
        "ts",
        (((F.col("event_id") * 104729) % 100000).cast("double") / 100.0 + drift)
        .alias("value"),
    )
    tmp.createOrReplaceTempView("__drift_probe_events")


    fake_load = lambda spark_, sf_, name_: spark_.table("__drift_probe_events")  # noqa: E731
    saved = P_.load_table
    P_.load_table = fake_load
    try:
        t0 = time.perf_counter()
        n_psi = P_.drift_report(spark, "unused").count()
        t_psi = time.perf_counter() - t0
        t0 = time.perf_counter()
        n_ks = P_.ks_test(spark, "unused").count()
        t_ks = time.perf_counter() - t0
        t0 = time.perf_counter()
        n_mwu = P_.mann_whitney(spark, "unused").count()
        t_mwu = time.perf_counter() - t0
    finally:
        P_.load_table = saved
    print(
        f"drift trio {n:,} events × 5 types: PSI {t_psi:.1f}s "
        f"({n_psi} rows), KS {t_ks:.1f}s ({n_ks}), MWU {t_mwu:.1f}s "
        f"({n_mwu}) — PSI is aggregate-only; KS/MWU rank the "
        f"distinct-value table, not raw rows"
    )

    # worst case the r9 verdict flagged: one hot type holding 90% of
    # rows.  With the distributed-rank spelling the window partition
    # is the hot type's DISTINCT values (quantized to ~4k here), so
    # the hot type costs a hash aggregate spread over (type, value),
    # never a 0.9·n single-task sort.
    skewed = ev.select(
        F.when((F.col("event_id") % 10) < 9, F.lit("hot"))
        .otherwise(F.col("event_type"))
        .alias("event_type"),
        "ts",
        (((F.col("event_id") * 104729) % 4096).cast("double") / 16.0 + drift)
        .alias("value"),
    )
    skewed.createOrReplaceTempView("__drift_probe_events")
    n_distinct = skewed.where(F.col("event_type") == "hot").select(
        "value"
    ).distinct().count()
    P_.load_table = fake_load
    try:
        t0 = time.perf_counter()
        n_ks = P_.ks_test(spark, "unused").count()
        t_ks = time.perf_counter() - t0
        t0 = time.perf_counter()
        n_mwu = P_.mann_whitney(spark, "unused").count()
        t_mwu = time.perf_counter() - t0
    finally:
        P_.load_table = saved
    print(
        f"drift skew {n:,} events, hot type 90% ({n_distinct:,} distinct "
        f"values): KS {t_ks:.1f}s ({n_ks} rows), MWU {t_mwu:.1f}s "
        f"({n_mwu}) — hot-type window sorts {n_distinct:,} rows, not "
        f"{int(n * 0.9):,}"
    )


def main() -> None:
    args = sys.argv[1:]
    which = args.pop(0) if args and not args[0].isdigit() else "pyramid"
    defaults = {"pyramid": 10_000_000, "dedup": 500_000, "knn": 1_000_000,
                "gapfill": 10_000_000, "pagerank": 2_000_000,
                "funnel": 10_000_000, "episodes": 10_000_000,
                "skew": 10_000_000, "neardup": 100_000, "od": 10_000_000,
                "curation": 500_000,
                "passages": 500_000, "semdedup": 100_000,
                "split": 500_000, "incr": 500_000, "chunk": 2_000_000,
                "stream": 2_000_000, "streampart": 2_000_000, "pq": 1_000_000, "opq": 1_000_000, "cc": 10_000_000, "streampass": 500_000, "bpe": 2_000_000, "ivfpq": 1_000_000, "ivfpq_opq": 1_000_000, "entity": 2_000_000, "entity_store": 1_000_000, "holt": 10_000_000, "vocab": 2_000_000, "ann_store": 1_000_000, "serve": 2_000_000, "bpe_drift": 2_000_000, "rowstore": 2_000_000, "kmeans": 500_000, "acf": 10_000_000, "cms": 2_000_000, "classifier": 2_000_000, "textindex": 2_000_000, "cusum": 10_000_000, "merge": 2_000_000, "bigram": 2_000_000, "span": 2_000_000, "textindex_inc": 2_000_000, "mixer": 20_000_000, "entropy": 1_000_000, "pmi": 2_000_000, "skipping": 2_000_000, "codec": 2_000, "graphann": 50_000, "geofence": 10_000_000, "hll": 20_000_000, "kmvstore": 20_000_000, "driftstore": 10_000_000, "kllstore": 10_000_000, "dsir": 2_000_000, "joinview": 2_000_000, "binaryann": 1_000_000, "unigram": 500_000, "drifttests": 10_000_000, "binning": 10_000_000}
    n = int(args[0]) if args else defaults[which]
    spark = get_spark("scale-probe")
    {"pyramid": probe_pyramid, "dedup": probe_dedup, "knn": probe_knn,
     "gapfill": probe_gapfill, "pagerank": probe_pagerank,
     "funnel": probe_funnel, "episodes": probe_episodes,
     "skew": probe_skew, "neardup": probe_neardup,
     "od": probe_od, "curation": probe_curation,
     "passages": probe_passages, "semdedup": probe_semdedup,
     "split": probe_split, "incr": probe_incr,
     "chunk": probe_chunk, "stream": probe_stream,
     "streampart": probe_streampart, "pq": probe_pq,
     "opq": probe_opq, "cc": probe_cc,
     "streampass": probe_streampass, "bpe": probe_bpe,
     "ivfpq": probe_ivfpq, "ivfpq_opq": probe_ivfpq_opq, "entity": probe_entity, "entity_store": probe_entity_store, "holt": probe_holt, "vocab": probe_vocab, "ann_store": probe_ann_store, "serve": probe_serve, "bpe_drift": probe_bpe_drift, "rowstore": probe_rowstore, "kmeans": probe_kmeans, "acf": probe_acf, "cms": probe_cms, "classifier": probe_classifier, "textindex": probe_textindex, "cusum": probe_cusum, "merge": probe_merge, "bigram": probe_bigram, "span": probe_span, "textindex_inc": probe_textindex_inc, "mixer": probe_mixer, "entropy": probe_entropy, "pmi": probe_pmi, "skipping": probe_skipping, "codec": probe_codec, "graphann": probe_graphann, "geofence": probe_geofence, "hll": probe_hll, "kmvstore": probe_kmvstore, "driftstore": probe_driftstore, "kllstore": probe_kllstore, "dsir": probe_dsir, "joinview": probe_joinview, "binaryann": probe_binaryann, "unigram": probe_unigram, "drifttests": probe_drifttests, "binning": probe_binning}[which](spark, n)


if __name__ == "__main__":
    main()
