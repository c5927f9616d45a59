"""Inverted-index serving store: build, routing, pruning, scoring."""

from pyspark.sql import functions as F

from heatmap_spark.sources.tables import load_table
from heatmap_spark.streaming.text_index import (
    N_BUCKETS,
    build_inverted_index,
    search_index,
    term_bucket,
    term_bucket_col,
)


def test_bucket_routing_jvm_matches_driver(spark, sf_smoke):
    """JVM crc32 bucket ≡ driver-side zlib bucket for every corpus
    term (the routing contract the serving read depends on)."""
    docs = load_table(spark, sf_smoke, "documents")
    from heatmap_spark.operators.textops import _all_tokens

    terms = (
        docs.select(F.explode(_all_tokens()).alias("term"))
        .distinct()
        .select("term", term_bucket_col(F.col("term")).alias("b"))
        .collect()
    )
    assert terms
    for r in terms:
        assert r["b"] == term_bucket(r["term"])
        assert 0 <= r["b"] < N_BUCKETS


def test_serving_read_opens_only_routed_buckets(spark, sf_smoke, tmp_path):
    """The point read's postings scan touches ONLY the bucket dirs of
    the query terms (directory-level pruning — the store's point), and
    its scores equal a direct full-corpus computation."""
    store = str(tmp_path / "index")
    docs = load_table(spark, sf_smoke, "documents")
    build_inverted_index(docs, store)

    qterms = ["spark", "join", "table"]
    out = search_index(spark, store, qterms, k=20)
    want_buckets = {term_bucket(t) for t in qterms}

    # files actually opened by the serving postings scan
    import zlib

    post_dirs = [f"{store}/postings/bucket={b}" for b in sorted(want_buckets)]
    files = (
        spark.read.parquet(*post_dirs)
        .where(F.col("term").isin(*qterms))
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    )
    for r in files:
        assert any(f"bucket={b}/" in r["f"] or f"bucket={b}" in r["f"] for b in want_buckets)

    # scoring parity vs direct computation over the raw corpus
    from heatmap_spark.operators.textops import _all_tokens

    toks = docs.select("doc_id", F.explode(_all_tokens()).alias("term")).where(
        F.col("term").isin(*qterms)
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.count()
    contrib = F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))
    direct = (
        tf.join(dfq, "term")
        .groupBy("doc_id")
        .agg(F.round(F.sum(contrib), 6).alias("tfidf_direct"))
    )
    joined = out.join(direct, "doc_id", "left").collect()
    assert len(joined) > 0
    for r in joined:
        assert r["tfidf_direct"] is not None
        assert abs(r["tfidf"] - r["tfidf_direct"]) < 1e-9
        assert 1 <= r["n_terms"] <= 3


def test_incremental_index_equals_oneshot_and_replays(spark, sf_smoke, tmp_path):
    """The accumulated incremental index serves IDENTICAL results to a
    one-shot build over the same corpus (mergeability); replaying a
    committed batch is a no-op."""
    from pyspark.sql import functions as F

    from heatmap_spark.sources.tables import load_table
    from heatmap_spark.streaming.text_index import (
        build_inverted_index,
        merge_batch_into_index,
        search_incremental_index,
        search_index,
    )

    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    mx = docs.agg(F.max("doc_id")).first()[0] + 1
    inc = str(tmp_path / "inc")
    for b in range(3):
        batch = docs.where(F.expr(f"CAST(doc_id * 3 DIV {mx} AS INT)") == b)
        assert merge_batch_into_index(spark, batch, inc, b)
    assert not merge_batch_into_index(spark, docs.limit(5), inc, 2)

    one = str(tmp_path / "one")
    build_inverted_index(docs, one)
    qterms = ["spark", "join", "table"]
    a = [tuple(r) for r in search_incremental_index(spark, inc, qterms).collect()]
    b = [tuple(r) for r in search_index(spark, one, qterms).collect()]
    assert a == b and a
