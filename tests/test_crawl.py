"""Streaming crawl-dedup store: sequential-drain stream ≡ direct batch
merges; replay guard; flag immutability."""

from pyspark.sql import functions as F

from heatmap_spark.sources.tables import load_table
from heatmap_spark.streaming.crawl import (
    merge_batch_into_lsh_store,
    read_crawl_flags,
    stream_lsh_dedup,
)


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select("doc_id", "text")


def _thirds(docs):
    mx = docs.agg(F.max("doc_id")).first()[0] + 1
    return [
        docs.where(F.expr(f"CAST(doc_id * 3 DIV {mx} AS INT)") == b)
        for b in range(3)
    ]


def test_streamed_crawl_equals_direct_merges(spark, sf_smoke, tmp_path):
    """Three availableNow drains (one new file each — a growing crawl
    directory) must produce the same flag log as direct per-batch
    merges, including the order-dependent statuses."""
    docs = _docs(spark, sf_smoke)
    batches = _thirds(docs)

    direct_store = str(tmp_path / "direct")
    for b, bdf in enumerate(batches):
        assert merge_batch_into_lsh_store(spark, bdf, direct_store, b)
    want = read_crawl_flags(spark, direct_store)

    src = str(tmp_path / "in")
    stream_store = str(tmp_path / "streamed")
    ckpt = str(tmp_path / "ckpt")
    for b, bdf in enumerate(batches):
        bdf.coalesce(1).write.mode("append").parquet(src)
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", "10")  # drain everything new
            .parquet(src)
        )
        q = stream_lsh_dedup(stream, stream_store, ckpt)
        q.awaitTermination(timeout=300)
    got = read_crawl_flags(spark, stream_store)
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()


def test_crawl_replay_and_immutability(spark, sf_smoke, tmp_path):
    docs = _docs(spark, sf_smoke)
    batches = _thirds(docs)
    store = str(tmp_path / "store")
    assert merge_batch_into_lsh_store(spark, batches[0], store, 0)
    f0 = read_crawl_flags(spark, store).collect()
    # replay of a committed batch is a no-op
    assert not merge_batch_into_lsh_store(spark, batches[0], store, 0)
    assert merge_batch_into_lsh_store(spark, batches[1], store, 1)
    # batch-0 flags never change after batch 1 lands (immutable log)
    f0_after = (
        read_crawl_flags(spark, store).where(F.col("batch") == 0).collect()
    )
    assert sorted(map(tuple, f0)) == sorted(map(tuple, f0_after))
    # every batch-1 doc got exactly one flag with a valid status
    f1 = read_crawl_flags(spark, store).where(F.col("batch") == 1)
    assert f1.count() == batches[1].count()
    assert (
        f1.where(
            ~F.col("status").isin("dup_of_corpus", "dup_in_batch", "new")
        ).count()
        == 0
    )


def test_crawl_compaction_transparent_to_flagging(spark, sf_smoke, tmp_path):
    """Compacting the postings partials between batches must not change
    any later batch's flags: two stores — one compacted after every
    batch, one never — produce identical flag logs."""
    from heatmap_spark.streaming.crawl import compact_crawl_store

    docs = _docs(spark, sf_smoke)
    batches = _thirds(docs)
    plain, compacted = str(tmp_path / "plain"), str(tmp_path / "compacted")
    for b, bdf in enumerate(batches):
        merge_batch_into_lsh_store(spark, bdf, plain, b)
        merge_batch_into_lsh_store(spark, bdf, compacted, b)
        folded = compact_crawl_store(spark, compacted)
        assert folded >= 1
    want = read_crawl_flags(spark, plain)
    got = read_crawl_flags(spark, compacted)
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()


def test_dedup_fusion_clusters_superset_signals(spark, sf_smoke):
    """Fusion clusters must be coarser-or-equal than each single
    signal: every LSH candidate pair and every fingerprint group lands
    in one fusion cluster; provenance flags match edge membership."""
    from heatmap_spark.operators.dedup import (
        dedup_fusion,
        fingerprint_dedup,
        minhash_lsh_candidates,
    )

    out = dedup_fusion(spark, sf_smoke)
    cl = {r["doc_id"]: r["cluster_id"] for r in out.collect()}
    # LSH pairs co-clustered
    for r in minhash_lsh_candidates(spark, sf_smoke).collect():
        assert cl[r["doc_a"]] == cl[r["doc_b"]]
    # fingerprint groups co-clustered: n_members >= group size
    sizes = {r["doc_id"]: r["n_members"] for r in out.collect()}
    fp_groups = fingerprint_dedup(spark, sf_smoke).collect()
    for g in fp_groups:
        if g["n_members"] > 1:
            assert sizes[g["keep_id"]] >= g["n_members"]
    # provenance sanity: singleton clusters carry no edge flags
    singles = out.where(
        (F.col("n_members") == 1)
        & ((F.col("has_fp_edge") == 1) | (F.col("has_lsh_edge") == 1))
    )
    assert singles.count() == 0
