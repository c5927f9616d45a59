"""Text analysis operators: stats, quality scoring, language ID, token
counting — all native Column expressions over the documents table."""

from __future__ import annotations

import math as _math
import re
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from heatmap_spark.operators.dedup import TOKEN_SPLIT
from heatmap_spark.sources.tables import load_table, register_sf_view

EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

# A BPE-ish segmentation: word pieces, digit runs, or single non-space symbols.
BPE_ISH = "[a-z]+|[0-9]+|[^a-z0-9\\s]"


def _all_tokens(text: str = "text") -> F.Column:
    """All tokens (with repeats), lowercased, empties dropped."""
    toks = F.split(F.lower(F.col(text)), TOKEN_SPLIT)
    return F.filter(toks, lambda t: t != "")


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document stats + a simple length/diversity quality score.

    The token array is materialized once as a column — referencing the
    tokenizer expression from each stat would re-split the text per
    use (no CSE across projections of the same subexpression tree).
    """
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", F.length("text").alias("n_chars"), _all_tokens().alias("toks"))
    n_tokens = F.size("toks")
    n_distinct = F.size(F.array_distinct("toks"))
    stop_hits = F.size(F.filter("toks", lambda x: x.isin(*EN_STOPWORDS)))
    return t.select(
        "doc_id",
        "n_chars",
        n_tokens.alias("n_tokens"),
        n_distinct.alias("n_distinct_tokens"),
        F.round(n_distinct / n_tokens, 6).alias("ttr"),
        F.round(stop_hits / n_tokens, 6).alias("stopword_ratio"),
        F.round(F.col("n_chars") / n_tokens, 6).alias("avg_token_span"),
    )


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-ratio language heuristic (n-gram-free LID baseline):
    classify as 'en' when English stopword mass exceeds 5%."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", "lang", _all_tokens().alias("toks"))
    ratio = F.size(F.filter("toks", lambda x: x.isin(*EN_STOPWORDS))) / F.size("toks")
    return t.select(
        "doc_id",
        "lang",
        F.round(ratio, 6).alias("en_stop_ratio"),
        F.when(ratio > 0.05, F.lit("en")).otherwise(F.lit("other")).alias("predicted_lang"),
    )


def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace vs BPE-ish token counts per document."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.filter(F.split(F.col("text"), "\\s+"), lambda t: t != "")).alias("n_ws_tokens"),
        F.regexp_count(F.lower(F.col("text")), F.lit(BPE_ISH)).alias("n_bpe_tokens"),
    )


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary column plumbing: documents as utf-8 blobs with typed
    metadata — the schema shape image/audio payloads use (the decode
    stage itself is the stub in operators/multimodal.py)."""
    docs = load_table(spark, sf_dir, "documents")
    blob = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        F.octet_length("text").alias("n_bytes"),
        F.md5(blob).alias("content_md5"),
        F.col("lang").alias("meta_lang"),
        F.col("source").alias("meta_source"),
    )


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top TF-IDF term per document (deterministic tiebreak on term).

    tf = in-doc term count, idf = ln((N+1)/(df+1)); all portable math
    (ln, integer counts), ranked per doc by (score desc, term asc).
    """
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()  # scalar; fixture-sized (at scale: broadcast agg)
    terms = docs.select("doc_id", F.explode(_all_tokens()).alias("term"))
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = terms.distinct().groupBy("term").agg(F.count("*").alias("df"))
    scored = tf.join(df_, "term").select(
        "doc_id",
        "term",
        F.round(
            F.col("tf") * F.log((F.lit(float(n_docs)) + 1.0) / (F.col("df") + 1.0)), 6
        ).alias("tfidf"),
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", "term", "tfidf")
    )


def rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive document fingerprint: polynomial rolling hash
    folded over per-token codes, all in exact int64 arithmetic
    (h = (h·1000003 + code) mod 2^31−1), so any engine reproduces it.

    Complements the order-insensitive md5 bag fingerprint in
    operators/dedup.fingerprint_dedup: reordering words changes THIS
    fingerprint but not that one.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", _all_tokens().alias("toks"))
    code = lambda tok: (  # noqa: E731
        F.ascii(tok) * 65536 + F.ascii(F.reverse(tok)) * 256 + F.length(tok) % 256
    ).cast("bigint")
    fp = F.aggregate(
        F.transform(F.col("toks"), code),
        F.lit(0).cast("bigint"),
        lambda a, x: (a * 1000003 + x) % 2147483647,
    )
    return t.select("doc_id", fp.alias("fingerprint"))


def token_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional token frequencies (posexplode / UNNEST WITH ORDINALITY):
    how often each token opens a document, by position 1..3.  The slice
    happens BEFORE the generator, so the explode emits 3 rows/doc, not
    every token — at 100 TB that's the difference between a 3x and a
    500x row blow-up feeding the aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.posexplode(F.slice(F.split("text", " "), 1, 3)).alias("pos0", "token")
        )
        .groupBy(
            (F.col("pos0") + 1).cast("int").alias("pos"),
            "token",
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def normalized_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus normalization (the cleanup pass that precedes dedup in a
    training-data pipeline): lowercase, strip non-alphanumerics, squeeze
    whitespace — all JVM-side regexp_replace, no Python in the loop —
    then per-language stats on the cleaned form.  Averages follow the
    exact policy (integer sums cast to double / count)."""
    docs = load_table(spark, sf_dir, "documents")
    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    return (
        docs.select("lang", cleaned.alias("c"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.sum(F.length("c")).cast("double") / F.count(F.lit(1))).alias(
                "avg_clean_chars"
            ),
            (F.sum(F.size(F.split("c", " "))).cast("double") / F.count(F.lit(1))).alias(
                "avg_tokens"
            ),
        )
    )


def ngram_udtf_demo(spark: SparkSession, sf_dir: str, n: int = 2) -> DataFrame:
    """Python UDTF surface (SQL-callable table function, Spark 3.5+):
    explode each document into its word n-grams with positions.

    This pins the engine's LAST escape hatch (SURVEY.md §2.7: native
    exprs → pandas_udf → applyInPandas → UDTF/UDF): the same result is
    produced JVM-side by token_positions/shingles_expr — the UDTF
    exists to prove the extension API, not as the production path, and
    a 100 TB run would use the native spelling.  The UDTF is defined
    lazily (worker-pickled by value) and registered for spark.sql use.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, ngram string")
    class NGrams:
        def eval(self, text: str, n: int):  # noqa: A002
            toks = [t for t in re.split(r"[^a-z0-9]+", (text or "").lower()) if t]
            for i in range(len(toks) - n + 1):
                yield i, " ".join(toks[i : i + n])

    spark.udtf.register("hs_ngrams", NGrams)
    v = register_sf_view(
        load_table(spark, sf_dir, "documents"), "__hs_docs_udtf", sf_dir
    )
    return spark.sql(
        f"""SELECT d.doc_id, g.pos, g.ngram
            FROM {v} d, LATERAL hs_ngrams(d.text, {n}) g"""
    )


BM25_QUERY_TERMS = ("spark", "join", "table")  # fixed demo query
BM25_K1 = 1.2
BM25_B = 0.75


def bm25_search(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """BM25 ranking of documents for a fixed 3-term query.

    Okapi BM25 with k1=1.2, b=0.75: score(d) = Σ_t idf(t) ·
    tf·(k1+1) / (tf + k1·(1−b+b·len_d/avgdl)), idf = ln((N−df+0.5)/
    (df+0.5) + 1).  Determinism across engines: every input to the
    double math is an exact integer aggregate (tf, df, doclen, N,
    Σlen), avgdl is one double division, and the per-term scores are
    added in FIXED term order (pivoted columns, not a double SUM whose
    accumulation order would depend on partitioning).

    Scale shape: the corpus stats (N, avgdl) and per-term df are tiny
    aggregates broadcast back onto the tf stream; candidate docs are
    filtered to those containing ≥1 query term BEFORE scoring, so the
    expensive path touches only the postings of the 3 query terms, not
    the corpus.  Top-k via TakeOrderedAndProject.

    Reference: none — SURVEY.md §2.8 (text-analysis extension; IR
    scoring for retrieval-style training-data curation).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", _all_tokens().alias("toks"))
    lens = toks.select("doc_id", F.size("toks").alias("doclen"))
    stats = lens.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doclen").alias("total_len"),
    )

    terms = toks.select("doc_id", F.explode("toks").alias("term")).where(
        F.col("term").isin(*BM25_QUERY_TERMS)
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    # df_ and stats are tiny aggregates (one row per query term / one
    # row total) — always broadcast.  lens is one row per corpus
    # document: NO broadcast hint (it would ship the whole corpus's
    # lengths to every executor at scale); the join key is doc_id and
    # the tf side is already restricted to candidate docs, so the
    # planner/AQE picks broadcast only when tf's candidate set is small.
    scored = (
        tf.join(F.broadcast(df_), "term")
        .join(lens, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    avgdl = F.col("total_len").cast("double") / F.col("n_docs")
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    contrib = idf * (
        F.col("tf") * (BM25_K1 + 1.0)
        / (
            F.col("tf")
            + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("doclen") / avgdl)
        )
    )
    per_term = scored.groupBy("doc_id").agg(
        *[
            F.sum(F.when(F.col("term") == t, contrib)).alias(f"s_{t}")
            for t in BM25_QUERY_TERMS
        ]
    )
    score = F.round(
        sum(
            (F.coalesce(F.col(f"s_{t}"), F.lit(0.0)) for t in BM25_QUERY_TERMS),
            F.lit(0.0),
        ),
        6,
    )
    return (
        per_term.select("doc_id", score.alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(k)
    )


NDCG_DEPTH = 20
RETRIEVAL_KS = (5, 10, 20)
# nDCG rank weights 1/log2(rank+1), SCALED TO EXACT INTEGERS (×1e12):
# summing ≤20 irrational doubles is accumulation-order-dependent across
# engines, but bigint sums are exact everywhere — the single final
# dcg/idcg division is one IEEE op, bit-identical on both sides.
NDCG_W_INT = tuple(
    int(round(1e12 / _math.log2(i + 1))) for i in range(1, NDCG_DEPTH + 1)
)
NDCG_CUM_INT = tuple(
    sum(NDCG_W_INT[:i]) for i in range(1, NDCG_DEPTH + 1)
)


def retrieval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality evaluation of the BM25 arm — the metrics layer
    a retrieval/curation pipeline reports: precision@k, recall@k,
    MRR@k, and binary-gain nDCG@k for k in (5, 10, 20), one row per k.

    Ground truth is deterministic and engine-replayable: a document is
    RELEVANT iff it contains all three fixed query terms (the
    conjunctive match BM25's saturation should rank highly but is not
    guaranteed to — which is exactly what the metrics measure).

    Determinism: hits are exact counts; MRR is a MAX over exact
    1/rank divisions (order-free); DCG/IDCG sum the integer-scaled
    weight literals above (exact bigint arithmetic), so the only
    float ops are single divisions of exact integers, then round(9).

    Scale shape: the ranked list is ≤ NDCG_DEPTH rows (bm25_search's
    TakeOrderedAndProject); the relevance scan is one map-only pass
    with an aggregate; everything after is constant-sized.

    Reference: none — SURVEY.md §2.8 extension (retrieval eval for
    training-data curation).
    """
    from pyspark.sql.window import Window as W

    ranked = bm25_search(spark, sf_dir, k=NDCG_DEPTH)
    ranked = ranked.select(
        "doc_id",
        F.row_number()
        .over(W.orderBy(F.desc("bm25"), F.asc("doc_id")))
        .alias("rank"),
    )
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", _all_tokens().alias("toks"))
    rel = toks.where(
        reduce(
            lambda a, b: a & b,
            [F.array_contains("toks", t) for t in BM25_QUERY_TERMS],
        )
    ).select("doc_id")
    n_rel_df = rel.agg(F.count(F.lit(1)).alias("n_rel"))

    j = ranked.join(rel.withColumn("is_rel", F.lit(True)), "doc_id", "left").select(
        "rank", F.coalesce("is_rel", F.lit(False)).alias("is_rel")
    )
    ks = spark.createDataFrame([(k,) for k in RETRIEVAL_KS], "k int")
    w_arr = F.array(*[F.lit(x) for x in NDCG_W_INT])
    cum_arr = F.array(*[F.lit(x) for x in NDCG_CUM_INT])
    in_k = F.col("is_rel") & (F.col("rank") <= F.col("k"))
    g = (
        j.crossJoin(F.broadcast(ks))
        .groupBy("k")
        .agg(
            F.sum(in_k.cast("long")).alias("hits"),
            F.max(F.when(in_k, F.lit(1.0) / F.col("rank"))).alias("mrr0"),
            F.sum(F.when(in_k, F.element_at(w_arr, F.col("rank")))).alias("dcg_int"),
        )
        .crossJoin(F.broadcast(n_rel_df))
    )
    idcg_int = F.element_at(cum_arr, F.least(F.col("k"), F.col("n_rel")).cast("int"))
    has_rel = F.col("n_rel") > 0
    return g.select(
        F.col("k").cast("int").alias("k"),
        F.col("n_rel").cast("bigint").alias("n_relevant"),
        F.col("hits").cast("bigint").alias("hits"),
        F.round(F.col("hits") / F.col("k"), 9).alias("precision_at_k"),
        F.round(
            F.when(has_rel, F.col("hits") / F.col("n_rel")).otherwise(0.0), 9
        ).alias("recall_at_k"),
        F.round(F.coalesce("mrr0", F.lit(0.0)), 9).alias("mrr_at_k"),
        F.round(
            F.when(
                has_rel,
                F.coalesce("dcg_int", F.lit(0)).cast("double") / idcg_int,
            ).otherwise(0.0),
            9,
        ).alias("ndcg_at_k"),
    ).orderBy("k")


def repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style repetition signals per document: duplicate-token
    fraction, duplicate-trigram fraction, and the fraction of tokens
    covered by the single most frequent bigram.

    These are the filters a pretraining-data pipeline runs to drop
    boilerplate/templated pages (Rae et al. 2021 "Gopher" §A1.1,
    Raffel et al. 2020 "C4"); our fixture has no newlines, so the
    line-level variants degenerate and the token/n-gram forms carry
    the signal.  Array stats are per-row Column expressions (no
    shuffle); the bigram mode needs one explode + two aggregations —
    all JVM-side, linear in corpus token count.

    Reference: none — SURVEY.md §2.8 (LLM-pipeline text analysis).
    """
    return repetition_metrics_df(load_table(spark, sf_dir, "documents"))


def repetition_metrics_df(docs: DataFrame) -> DataFrame:
    """DataFrame-core of :func:`repetition_metrics` over any
    (doc_id, text) relation (used by the fluent Corpus builder)."""
    t = docs.select("doc_id", _all_tokens().alias("toks"))
    n = F.size("toks")
    tri = F.transform(
        F.sequence(F.lit(1), F.greatest(n - 2, F.lit(0))),
        lambda i: F.concat_ws(
            " ",
            F.element_at("toks", i),
            F.element_at("toks", i + 1),
            F.element_at("toks", i + 2),
        ),
    )
    # the trigram array is materialized as a real column first — no CSE
    # inside projections, same reason as _doc_shingles
    base = (
        t.withColumn("__tri__", tri)
        .select(
            "doc_id",
            "toks",
            n.alias("n_tokens"),
            F.round(1.0 - F.size(F.array_distinct("toks")) / n, 6).alias(
                "dup_token_frac"
            ),
            F.round(
                1.0
                - F.size(F.array_distinct("__tri__"))
                / F.greatest(F.size("__tri__"), F.lit(1)),
                6,
            ).alias("dup_trigram_frac"),
        )
    )
    bg = F.transform(
        F.sequence(F.lit(1), F.greatest(n - 1, F.lit(0))),
        lambda i: F.concat_ws(
            " ", F.element_at("toks", i), F.element_at("toks", i + 1)
        ),
    )
    bigram_counts = (
        t.select("doc_id", F.explode(bg).alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_bigram_count"))
    )
    return (
        base.join(bigram_counts, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            "dup_token_frac",
            "dup_trigram_frac",
            F.round(
                2.0 * F.col("top_bigram_count") / F.col("n_tokens"), 6
            ).alias("top_bigram_frac"),
        )
    )


GOPHER_MIN_TOKENS = 50
GOPHER_MAX_TOKENS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_MIN_DISTINCT_STOPWORDS = 2


def gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule-based quality filter (Rae et al. 2021 §A1.1),
    one boolean per rule + the conjunctive keep decision:

    * token count in [50, 100k]
    * mean word length in [3, 10]
    * ≥ 80% of tokens contain at least one alphabetic character
    * ≥ 2 distinct English stopwords present

    Pure per-row Column arithmetic over the token array — no shuffle,
    no UDF; at 100 TB this is a map-only pass that fuses into the scan.

    Reference: none — SURVEY.md §2.8 (LLM-pipeline quality scoring).
    """
    return gopher_quality_df(load_table(spark, sf_dir, "documents"))


def gopher_quality_df(docs: DataFrame) -> DataFrame:
    """DataFrame-core of :func:`gopher_quality` over any (doc_id, text)
    relation (used by the fluent Corpus builder)."""
    t = docs.select("doc_id", _all_tokens().alias("toks"))
    n = F.size("toks")
    mean_len = F.round(
        F.aggregate(
            "toks", F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        )
        / n,
        6,
    )
    alpha_frac = F.round(
        F.size(F.filter("toks", lambda x: x.rlike("[a-z]"))) / n, 6
    )
    n_stop = F.size(
        F.array_distinct(F.filter("toks", lambda x: x.isin(*EN_STOPWORDS)))
    )
    t2 = t.select(
        "doc_id",
        n.alias("n_tokens"),
        mean_len.alias("mean_word_len"),
        alpha_frac.alias("alpha_frac"),
        n_stop.alias("n_distinct_stopwords"),
    )
    ok_len = F.col("n_tokens").between(GOPHER_MIN_TOKENS, GOPHER_MAX_TOKENS)
    ok_word = F.col("mean_word_len").between(
        GOPHER_MIN_MEAN_WORD_LEN, GOPHER_MAX_MEAN_WORD_LEN
    )
    ok_alpha = F.col("alpha_frac") >= GOPHER_MIN_ALPHA_FRAC
    ok_stop = F.col("n_distinct_stopwords") >= GOPHER_MIN_DISTINCT_STOPWORDS
    return t2.select(
        "doc_id",
        "n_tokens",
        "mean_word_len",
        "alpha_frac",
        "n_distinct_stopwords",
        ok_len.alias("ok_token_count"),
        ok_word.alias("ok_mean_word_len"),
        ok_alpha.alias("ok_alpha_frac"),
        ok_stop.alias("ok_stopwords"),
        (ok_len & ok_word & ok_alpha & ok_stop).alias("keep"),
    )


def feature_hashing(
    spark: SparkSession, sf_dir: str, dim: int = 1024
) -> DataFrame:
    """Hashing-trick bag-of-words featurizer (Weinberger et al., ICML
    2009): token → bucket = md5-derived 48-bit int mod ``dim``, output
    the sparse (doc_id, bucket, count) triplets.

    This is how a 100 TB corpus becomes fixed-width model input with no
    vocabulary build, no dictionary broadcast, no OOV handling — the
    hash IS the vocabulary.  One explode + one groupBy (map-side
    combinable); md5+hex→int is the same portable kernel the MinHash
    family uses, so the oracle reproduces buckets bit-for-bit.

    Reference: none — SURVEY.md §2.8 (LLM-pipeline featurization).
    """
    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select("doc_id", F.explode(_all_tokens()).alias("term"))
    bucket = (
        F.conv(F.substring(F.md5("term"), 1, 12), 16, 10).cast("bigint")
        % dim
    ).cast("int")
    return (
        terms.select("doc_id", bucket.alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("count"))
    )


def mixing_sample(
    spark: SparkSession,
    sf_dir: str,
    weights: dict[str, float] | None = None,
) -> DataFrame:
    """Deterministic domain-mixing sampler: keep each document with
    probability ``weights[source]`` (default: src0 1.0, src1 0.5,
    src2 0.25, others 0.1), decided by an md5 hash of the doc_id — the
    way a pretraining mix reweights domains without an RNG, so the
    SAME documents are chosen on every run, any cluster, any
    partitioning (rerunning a 100 TB mix is reproducible, and
    incremental runs agree with full runs).

    Map-only: hash-threshold predicate, no shuffle, fuses into the
    scan.  hexint(md5)/2^48 is uniform on [0,1) and portable (same
    kernel as the MinHash family).

    Reference: none — SURVEY.md §2.8 (LLM-pipeline data mixing).
    """
    if weights is None:
        weights = {"src0": 1.0, "src1": 0.5, "src2": 0.25}
    default_w = 0.1
    docs = load_table(spark, sf_dir, "documents")
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10)
        .cast("bigint")
        .cast("double")
        / float(1 << 48)
    )
    w = F.lit(default_w)
    for src, wt in sorted(weights.items()):
        w = F.when(F.col("source") == src, F.lit(float(wt))).otherwise(w)
    return docs.where(u < w).select("doc_id", "source", "lang", "n_chars")


def pack_sequences(
    spark: SparkSession,
    sf_dir: str,
    budget: int = 512,
    n_buckets: int = 16,
) -> DataFrame:
    """Sequence packing for training: assign documents to fixed-token-
    budget packs.  Documents are hash-bucketed (doc_id % n_buckets),
    ordered deterministically within each bucket, and a running token
    sum greedily opens a new pack whenever the budget would overflow —
    pack_id = floor((cumsum - n_tokens) / budget).

    The bucket IS the unit of parallelism: each bucket's packing is an
    independent window (one shuffle on bucket), so the operator scales
    by raising n_buckets — the global-greedy spelling would be a
    single-task window at 100 TB.  Cross-bucket packs never mix, which
    costs at most one under-filled pack per bucket.

    Reference: none — SURVEY.md §2.8 (LLM-pipeline batch assembly).
    """
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        (F.col("doc_id") % n_buckets).cast("int").alias("bucket"),
        F.size(_all_tokens()).alias("n_tokens"),
    )
    w = W.partitionBy("bucket").orderBy("doc_id")
    csum = F.sum("n_tokens").over(w)
    return t.select(
        "doc_id",
        "bucket",
        "n_tokens",
        F.floor((csum - F.col("n_tokens")) / budget).cast("int").alias("pack_id"),
    )


def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: count and replace emails / phone numbers / IPv4
    addresses with typed placeholders — the scrubbing pass a training
    corpus runs before anything else sees the text.

    The fixture corpus carries no PII, so a deterministic contact
    header (email, phone, ip derived from doc_id) is prepended FIRST
    and then scrubbed — the redaction machinery operates on real
    matches and the md5 of the scrubbed text is hash-checked
    end-to-end against DuckDB running the same RE2-safe patterns
    (no lookaround, portable across Java regex / RE2).

    Map-only: regexp_count + chained regexp_replace, fuses into the
    scan; at 100 TB this is pure per-row CPU with zero shuffle.

    Reference: none — SURVEY.md §2.8 (LLM-pipeline text scrubbing).
    """
    docs = load_table(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit("contact: user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com ph +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" ip 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".1 "),
        F.col("text"),
    )
    email_re = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z][a-z]+"
    phone_re = "\\+1-555-[0-9][0-9][0-9][0-9]"
    ip_re = "10\\.0\\.[0-9]+\\.[0-9]+"
    t = docs.select("doc_id", raw.alias("raw"))
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("raw"), email_re, "<EMAIL>"),
            phone_re,
            "<PHONE>",
        ),
        ip_re,
        "<IP>",
    )
    return t.select(
        "doc_id",
        F.regexp_count(F.col("raw"), F.lit(email_re)).alias("n_emails"),
        F.regexp_count(F.col("raw"), F.lit(phone_re)).alias("n_phones"),
        F.regexp_count(F.col("raw"), F.lit(ip_re)).alias("n_ips"),
        F.md5(scrubbed).alias("scrubbed_md5"),
    )


def novelty_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty: the fraction of a document's shingles
    FIRST seen in that document (ordered by doc_id — the ingestion
    order in an append-only corpus).  A near-zero score means the doc
    is assembled from already-seen content; the running metric an
    incremental corpus refresh tracks to decide whether a crawl batch
    adds anything.

    Shape: one groupBy(token) for the global first-seen owner + one
    postings join back + one per-doc aggregate — all combinable, no
    window over the corpus.
    """
    from heatmap_spark.operators.dedup import _doc_shingles

    docs = load_table(spark, sf_dir, "documents")
    post = _doc_shingles(docs).localCheckpoint(eager=True)
    first_seen = post.groupBy("token").agg(F.min("doc_id").alias("first_doc"))
    joined = post.join(first_seen, "token")
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.count_if(F.col("first_doc") == F.col("doc_id")).alias("n_novel"),
        )
        .select(
            "doc_id",
            F.col("n_shingles").cast("int").alias("n_shingles"),
            F.col("n_novel").cast("int").alias("n_novel"),
            F.round(F.col("n_novel") / F.col("n_shingles"), 6).alias("novelty"),
        )
    )


def lang_id_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier evaluation at corpus scale: per-class precision /
    recall / F1 of the stopword language-ID heuristic against the
    fixture's ground-truth lang label (binarized en vs other — the
    classifier's output space).

    One conditional aggregate per class over a single pass — the
    pattern any model-eval job uses on billions of scored rows (no
    sklearn round-trip, no collect).  Ratios are exact integer-count
    divisions rounded at the end, so the oracle hash-matches.
    """
    pred = lang_id(spark, sf_dir).select(
        "doc_id",
        F.when(F.col("lang") == "en", F.lit("en"))
        .otherwise(F.lit("other"))
        .alias("actual"),
        F.col("predicted_lang").alias("predicted"),
    )
    classes = spark.createDataFrame([("en",), ("other",)], "cls string")
    scored = pred.crossJoin(F.broadcast(classes))
    agg = scored.groupBy("cls").agg(
        F.count_if(F.col("actual") == F.col("cls")).alias("n_actual"),
        F.count_if(
            (F.col("actual") == F.col("cls")) & (F.col("predicted") == F.col("cls"))
        ).alias("tp"),
        F.count_if(
            (F.col("actual") != F.col("cls")) & (F.col("predicted") == F.col("cls"))
        ).alias("fp"),
        F.count_if(
            (F.col("actual") == F.col("cls")) & (F.col("predicted") != F.col("cls"))
        ).alias("fn"),
    )
    precision = F.col("tp") / F.greatest(F.col("tp") + F.col("fp"), F.lit(1))
    recall = F.col("tp") / F.greatest(F.col("tp") + F.col("fn"), F.lit(1))
    f1 = (
        2.0
        * F.col("tp")
        / F.greatest(2 * F.col("tp") + F.col("fp") + F.col("fn"), F.lit(1))
    )
    return agg.select(
        "cls",
        "n_actual",
        "tp",
        "fp",
        "fn",
        F.round(precision, 6).alias("precision"),
        F.round(recall, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )


def unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram language-model score (CCNet-style quality
    signal): avg_log2_prob = mean over token occurrences of
    log2(corpus_tf / corpus_total_tokens).

    Natural prose scores high (common words), gibberish / boilerplate /
    wrong-language text scores low — the classic cheap LM filter run
    before an expensive model-based one.  Scale shape: one explode to
    token occurrences, one map-side-combinable groupBy for the vocab
    counts, a 1-row broadcast for the corpus total, then a token-keyed
    equi-join back onto the occurrence stream (AQE broadcasts the vocab
    side when it fits; at 100 TB the vocab is ~10^7 rows — orders of
    magnitude below the occurrence stream either way).  Per-token log
    probs are rounded to 6 decimals and summed as DECIMAL so the score
    is bit-identical on any partitioning and in the DuckDB oracle
    (functions/exact.py policy).
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(_all_tokens()).alias("token"))
    vocab = tok.groupBy("token").agg(F.count("*").alias("tf"))
    total = vocab.agg(F.sum("tf").alias("n_total"))
    lp = F.round(F.log2(F.col("tf") / F.col("n_total")), 6).cast("decimal(18,6)")
    return (
        tok.join(vocab, "token")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            (F.sum(lp).cast("double") / F.count("*")).alias("avg_log2_prob"),
        )
    )


def chunk_documents(
    spark: SparkSession, sf_dir: str, w: int = 64, stride: int = 48
) -> DataFrame:
    """RAG-style document chunking: overlapping ``w``-token windows at
    ``stride``-token steps over whitespace tokens (case preserved —
    chunks are retrieval payload, not match keys).

    The reference has no text surface at all (SURVEY.md §2.8); this is
    the standard retrieval/context-window prep every LLM data pipeline
    runs before embedding.  Start positions are 1, 1+stride, … up to
    max(n_tokens − (w − stride), 1), so every token lands in ≥1 chunk
    and the final chunk may run short; consecutive chunks share exactly
    w − stride tokens.  Zero-token documents emit no chunks.

    Scale shape: map-only — tokenize once, explode the start sequence,
    slice per start.  No shuffle at all; chunk count per doc is
    ~n_tokens/stride so output is a bounded constant factor of input,
    and the whole plan fuses into the parquet scan (predicate/column
    pruning intact).  The same arithmetic runs verbatim in DuckDB
    (generate_series + list slicing), so chunk text is hash-checked.
    """
    return chunk_documents_df(load_table(spark, sf_dir, "documents"), w, stride)


def chunk_documents_df(docs: DataFrame, w: int = 64, stride: int = 48) -> DataFrame:
    """DataFrame-core of :func:`chunk_documents` over any
    (doc_id, text) relation (fluent Corpus.chunk / scale probe)."""
    toks = F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")
    t = docs.select("doc_id", toks.alias("tk")).where(F.size("tk") >= 1)
    last_start = F.greatest(F.size("tk") - F.lit(w - stride), F.lit(1))
    e = t.select(
        "doc_id",
        "tk",
        F.explode(F.sequence(F.lit(1), last_start, F.lit(stride))).alias("st"),
    )
    piece = F.slice("tk", F.col("st"), F.lit(w))
    return e.select(
        "doc_id",
        ((F.col("st") - 1) / stride).cast("int").alias("chunk_idx"),
        F.concat_ws(" ", piece).alias("chunk_text"),
        F.size(piece).alias("n_chunk_tokens"),
    )


# ---------------------------------------------------------------------------
# BPE: corpus-scale byte-pair-encoding merge training + encode.
# ---------------------------------------------------------------------------


def _bpe_apply_merge(syms, left: str, right: str, merged: str):
    """Greedy left-to-right replacement of adjacent (left, right) with
    ``merged`` — one sequential fold over the symbol array (the fold
    order IS the BPE greedy order, so overlapping occurrences resolve
    exactly like the reference algorithm: 'aaa' + (a,a) → [aa, a])."""
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _bpe_train_driver(
    word_counts: dict[str, int], n_merges: int
) -> list[tuple[str, str, str, int]]:
    """The BPE merge loop on a driver-resident word-frequency table —
    BYTE-IDENTICAL to the distributed loop below (exact integer pair
    counts, arg-max by (count desc, left asc, right asc), greedy
    left-to-right replacement; tests/test_bpe.py pins the equivalence
    against this same algorithm).  Called only when the vocabulary is
    model-sized (guide §5.4, the dense-regions/IVF-codebook class):
    the loop's state is |vocab| symbol arrays, independent of corpus
    row count."""
    vocab = {w: list(w) + ["</w>"] for w in word_counts}
    merges: list[tuple[str, str, str, int]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            c = word_counts[w]
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + c
        if not counts:
            break
        (l, r), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        m = l + r
        merges.append((l, r, m, c))
        for w, syms in vocab.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == l and s == r:
                    out[-1] = m
                else:
                    out.append(s)
            vocab[w] = out
    return merges


def bpe_train_merges(
    docs: DataFrame,
    n_merges: int = 40,
    driver_vocab_limit: int = 8192,
) -> list[tuple[str, str, str, int]]:
    """Train BPE merges (Sennrich et al. 2016, "Neural Machine
    Translation of Rare Words with Subword Units" — public method) over
    a (doc_id, text) corpus.  Returns [(left, right, merged,
    pair_count), …] in rank order.

    Scale shape — the detail that makes corpus-scale BPE viable, and
    how every production trainer works: the ONLY corpus-sized pass is
    the word-frequency aggregate (one shuffle on the word).  The merge
    loop then runs entirely on the word-frequency TABLE (distinct
    words × their counts — vocabulary-sized, independent of corpus row
    count): each round explodes adjacent symbol pairs weighted by word
    frequency, takes the arg-max pair (ties broken (count desc, left
    asc, right asc) — fully deterministic), and rewrites the symbol
    arrays map-only with one fold.  Rewrites stay LAZY and the loop
    localCheckpoints every 8 rounds (the pyramid cascade's stride
    idiom, r12 guide §1.2/§5): a round's arg-max scan re-applies at
    most 7 pending map-only rewrites instead of the loop paying a
    materialization job per round — 40 vocab materializations become
    5, and the rewrites themselves are unchanged, so the merge table
    is byte-identical.

    r13 (guide §5.4): when the vocabulary is MODEL-SIZED
    (≤ ``driver_vocab_limit`` distinct words — probed with a
    limit-bounded collect, never an unbounded one), the merge loop runs
    driver-side on the collected word-frequency table instead of
    issuing ~2·n_merges driver-synchronous Spark jobs over a tiny
    relation: 40 arg-max jobs + stride checkpoints become ONE collect
    plus pure-Python integer arithmetic.  Exact same merges — the loop
    is integer-exact with identical tie-breaks (pinned byte-identical
    by tests/test_bpe.py), and the corpus-sized word-frequency
    aggregate stays distributed either way.  Vocabularies past the
    bound keep the distributed loop below, so nothing is lost at 100 TB
    where the vocab can exceed driver memory.

    Training stops early when no adjacent pair remains (every word
    fully merged)."""
    words = (
        docs.select(
            F.explode(
                F.filter(
                    F.split(F.lower(F.col("text")), TOKEN_SPLIT),
                    lambda t: t != "",
                )
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )
    probe = words.limit(driver_vocab_limit + 1).collect()
    if len(probe) <= driver_vocab_limit:
        return _bpe_train_driver({r["w"]: r["cnt"] for r in probe}, n_merges)
    vocab = words.select(
        "cnt", F.concat(F.split("w", ""), F.array(F.lit("</w>"))).alias("syms")
    ).localCheckpoint(eager=True)
    merges: list[tuple[str, str, str, int]] = []
    for rnd in range(n_merges):
        pair_structs = F.when(
            F.size("syms") >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size("syms") - 1),
                lambda i: F.struct(
                    F.element_at("syms", i).alias("l"),
                    F.element_at("syms", i + 1).alias("r"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))
        best = (
            vocab.select("cnt", F.explode(pair_structs).alias("p"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.desc("c"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        l, r, c = best[0]["l"], best[0]["r"], int(best[0]["c"])
        m = l + r
        merges.append((l, r, m, c))
        vocab = vocab.withColumn(
            "syms", _bpe_apply_merge(F.col("syms"), l, r, m)
        )
        if rnd % 8 == 7:  # stride checkpoint: bound lineage, not per-round
            vocab = vocab.localCheckpoint(eager=True)
    return merges


def bpe_merges(
    spark: SparkSession, sf_dir: str, n_merges: int = 40
) -> DataFrame:
    """Declared query: the trained merge table (rank, left, right,
    merged, pair_count) over the documents fixture.  Training is
    iterative (the SQL-inexpressible class — no DuckDB oracle), so the
    query self-checks its invariants and RAISES on violation:
    pair counts must be non-increasing in rank (merging the most
    frequent pair can only create pairs no more frequent than it), and
    every merged symbol must be the concatenation of its parts.
    Exact-match verification against a pure-Python reference trainer
    lives in tests/test_bpe.py."""
    ms = bpe_train_merges(
        load_table(spark, sf_dir, "documents").select("text"), n_merges
    )
    if not ms:
        raise AssertionError("bpe_merges: corpus produced no merges")
    for i in range(1, len(ms)):
        if ms[i][3] > ms[i - 1][3]:
            raise AssertionError(
                f"BPE invariant broken: pair count rose at rank {i}: "
                f"{ms[i - 1]} -> {ms[i]}"
            )
    for l, r, m, _ in ms:
        if m != l + r:
            raise AssertionError(f"merged symbol {m!r} != {l!r}+{r!r}")
    return spark.createDataFrame(
        [(i, l, r, m, c) for i, (l, r, m, c) in enumerate(ms)],
        "rank int, left string, right string, merged string, pair_count bigint",
    )


def bpe_encode_df(docs: DataFrame, merges: list[tuple[str, str, str, int]]) -> DataFrame:
    """Arrow-batched BPE encode: (doc_id, n_chars, n_words,
    n_bpe_tokens).  The merge list rides the closure (a few KB);
    encoding applies merges in rank order per word — identical
    semantics to training's vocab rewrite, so a word seen in training
    encodes to exactly its trained symbol sequence.  Map-only: fuses
    into the scan, no shuffle, Python cost amortized over Arrow
    batches (the PQ-encode deployment shape)."""
    import re as _re

    mlist = [(l, r, m) for l, r, m, _ in merges]
    tok_re = TOKEN_SPLIT

    def kern(batches):
        import pandas as pd

        splitter = _re.compile(tok_re)

        def encode(text):
            words = [w for w in splitter.split(text.lower()) if w != ""]
            total = 0
            for w in words:
                syms = list(w) + ["</w>"]
                for l, r, m in mlist:
                    out = []
                    for s in syms:
                        if out and out[-1] == l and s == r:
                            out[-1] = m
                        else:
                            out.append(s)
                    syms = out
                total += len(syms)
            return len(words), total

        for pdf in batches:
            enc = pdf["text"].map(lambda t: encode(t or ""))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_chars": pdf["text"].map(lambda t: len(t or "")),
                    "n_words": enc.map(lambda e: e[0]),
                    "n_bpe_tokens": enc.map(lambda e: e[1]),
                }
            )

    return docs.select("doc_id", "text").mapInPandas(
        kern, "doc_id bigint, n_chars bigint, n_words bigint, n_bpe_tokens bigint"
    )


def bpe_token_counts(
    spark: SparkSession, sf_dir: str, n_merges: int = 40
) -> DataFrame:
    """Declared query: per-doc BPE token counts under freshly trained
    merges.  Self-checks: every doc's BPE token count must lie between
    its word count (fully merged floor) and chars + words (unmerged
    ceiling), and SOME doc must compress (fewer symbols than
    chars+words) or the merges did nothing."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ms = bpe_train_merges(docs.select("text"), n_merges)
    out = bpe_encode_df(docs, ms).localCheckpoint(eager=True)
    bad = out.where(
        (F.col("n_bpe_tokens") < F.col("n_words"))
        | (F.col("n_bpe_tokens") > F.col("n_chars") + F.col("n_words"))
    ).count()
    if bad:
        raise AssertionError(f"BPE bounds violated for {bad} docs")
    compressed = out.where(
        F.col("n_bpe_tokens") < F.col("n_chars") + F.col("n_words")
    ).count()
    if compressed == 0:
        raise AssertionError("BPE merges compressed nothing")
    return out


def token_budget_mix(
    spark: SparkSession, sf_dir: str, budget_per_lang: int = 2000
) -> DataFrame:
    """Epoch construction with EXACT per-domain token budgets: within
    each lang, documents are taken in a deterministic shuffled order
    (md5 of the doc id — reproducible across runs and engines) until
    the cumulative token count reaches the budget; the doc that would
    cross it is excluded.  The rate-based :func:`mixing_sample` hits a
    target in expectation; this hits it by construction — the mixer a
    token-accounted pretraining epoch needs.

    Scale shape — SEGMENTED SCAN (the ewma_segmented pattern applied
    to a prefix sum): a per-lang window alone would sort one hot
    domain's entire doc-summary stream through a single partition.
    Instead the shuffled order key (md5 hex) is split on its first two
    hex chars into 256 segments whose lexicographic order IS the scan
    order (the segment id is a prefix of the sort key), so:

    1. within-segment cumsum — windows over (lang, seg), 256-way
       parallel per domain, summaries only (the text column never
       enters a sort);
    2. per-segment totals — one small groupBy (|langs|·256 rows);
    3. segment offsets — a prefix sum over that TINY relation;
    4. broadcast the offsets back and add.

    Exact integer arithmetic throughout, so the result is
    value-hash-identical to the flat per-lang window (the DuckDB
    oracle keeps the flat spelling — it is the semantic twin)."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    toks = F.size(
        F.filter(F.split("text", r"\s+"), lambda x: x != F.lit(""))
    ).cast("bigint")
    summary = docs.select(
        "doc_id",
        "lang",
        toks.alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("rk"),
    ).withColumn("seg", F.substring("rk", 1, 2))
    w_seg = (
        W.partitionBy("lang", "seg")
        .orderBy("rk", "doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    within = summary.withColumn(
        "seg_cum", F.sum("n_tokens").over(w_seg).cast("bigint")
    )
    totals = within.groupBy("lang", "seg").agg(
        F.sum("n_tokens").cast("bigint").alias("seg_total")
    )
    w_off = (
        W.partitionBy("lang")
        .orderBy("seg")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    offsets = totals.select(
        "lang",
        "seg",
        (F.sum("seg_total").over(w_off) - F.col("seg_total")).alias("seg_off"),
    )
    return (
        within.join(F.broadcast(offsets), ["lang", "seg"])
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            (F.col("seg_off") + F.col("seg_cum")).cast("bigint").alias("cum_tokens"),
        )
        .where(F.col("cum_tokens") <= F.lit(budget_per_lang))
    )


def curriculum_buckets(
    spark: SparkSession, sf_dir: str, n_buckets: int = 10
) -> DataFrame:
    """Curriculum assignment: each document's unigram-LM difficulty
    (bits per token = −avg log2 prob, the CCNet-style signal
    :func:`unigram_logprob` computes) binned into ``n_buckets``
    equal-population tiers via NTILE — the easy→hard ordering a
    curriculum-learning schedule samples from (Bengio et al. 2009;
    public method).  Docs that tokenize to zero tokens have no
    difficulty and are excluded (mirrored by the oracle's join).

    Determinism: the decimal-summed per-token log probs make the
    difficulty bit-identical on any partitioning, and the NTILE
    ordering carries a doc_id tiebreak, so the full assignment
    value-hashes cross-engine.

    Scale shape: the corpus-sized work is unigram_logprob's (explode +
    vocab groupBy + token join); the NTILE runs over the per-doc
    SUMMARY relation (doc_id, difficulty) — the token_budget_mix
    pattern, one global sorted pass of narrow summary rows, never of
    documents."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(_all_tokens()).alias("token"))
    vocab = tok.groupBy("token").agg(F.count("*").alias("tf"))
    total = vocab.agg(F.sum("tf").alias("n_total"))
    lp = F.round(F.log2(F.col("tf") / F.col("n_total")), 6).cast("decimal(18,6)")
    per_doc = (
        tok.join(vocab, "token")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            (-(F.sum(lp).cast("double")) / F.count("*")).alias("bpt"),
        )
    )
    w = W.orderBy("bpt", "doc_id")
    return (
        per_doc.join(docs.select("doc_id", "lang"), "doc_id")
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            F.round("bpt", 6).alias("bits_per_token"),
            F.ntile(n_buckets).over(w).cast("int").alias("difficulty_decile"),
        )
    )


def quality_classifier(
    spark: SparkSession,
    sf_dir: str,
    n_buckets: int = 4096,
) -> DataFrame:
    """Linear text-classifier INFERENCE, fastText-style (Joulin et al.
    2016): hash unigram+bigram features into ``n_buckets``, look up an
    integer weight per bucket, sum — label = sign(score).  The weight
    "model" is derived deterministically from the bucket id
    (md5-keyed integers in [-1000, 1000]) so the whole forward pass is
    EXACT bigint arithmetic and value-hashes cross-engine; swapping in
    trained weights changes one expression, not the plan.

    Scale shape: the hot path is map-only (tokenize → hash → weight,
    all JVM expressions fused into the scan) followed by ONE doc_id
    re-aggregation with map-side combine.  No weight table is shipped
    anywhere — the "embedding lookup" is closed-form in the plan,
    which is exactly what you want for a 4096-bucket hashed model; a
    trained table would be a broadcast join against 4096 rows.

    Output per doc: feature count, integer score, mean weight, label.

    Reference: none — SURVEY.md §2.8 quality-filter family (the
    model-based rung above the Gopher rule filters).
    """
    return quality_classifier_df(
        load_table(spark, sf_dir, "documents"), n_buckets
    )


def quality_classifier_df(docs: DataFrame, n_buckets: int = 4096) -> DataFrame:
    """DataFrame-core of :func:`quality_classifier` over any
    (doc_id, text) relation (the fluent Corpus stage uses it)."""
    toks = _all_tokens()
    bigrams = F.filter(
        F.zip_with(
            toks,
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
            lambda a, b: F.concat(a, F.lit("_"), b),
        ),
        lambda x: x.isNotNull(),
    )
    feats = docs.select(
        "doc_id", F.explode(F.concat(toks, bigrams)).alias("feat")
    )
    h = F.conv(F.substring(F.md5(F.col("feat")), 1, 12), 16, 10).cast("bigint")
    bucket = h % n_buckets
    w = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("w"), bucket.cast("string"))), 1, 12),
            16,
            10,
        ).cast("bigint")
        % 2001
        - 1000
    )
    scored = feats.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_feats"),
        F.sum(w).cast("bigint").alias("score"),
    )
    return scored.select(
        "doc_id",
        "n_feats",
        "score",
        F.round(F.col("score").cast("double") / F.col("n_feats"), 6).alias("mean_w"),
        (F.col("score") > 0).alias("label"),
    )


def bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document interpolated bigram language-model score — the LM
    rung above :func:`unigram_logprob`:

        p(w2 | w1) = 0.8 · c(w1 w2)/c(w1 ·) + 0.2 · tf(w2)/N

    avg_log2_prob = mean over bigram positions of log2 p, and
    ppl = 2^(−avg) (perplexity).  Repetitive/boilerplate text scores
    near 0 bits; cross-domain or shuffled text scores low — a sharper
    cheap quality filter than the unigram version because it sees word
    ORDER.

    Determinism: all counts are exact integers; each position's log2
    is rounded to 6 decimals and summed as DECIMAL (the unigram
    policy), so the per-doc averages are bit-identical on any
    partitioning and in the oracle.

    Scale shape: one bigram explode; the model tables (bigram counts,
    context counts, vocab) are map-side-combinable aggregates of that
    same stream, then token-keyed equi-joins back onto it — the vocab
    side is orders of magnitude smaller than the occurrence stream, so
    AQE broadcasts where it fits.  No Python anywhere.

    Reference: none — SURVEY.md §2.8 quality-filter family.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = _all_tokens()
    bg_arr = F.filter(
        F.zip_with(
            toks,
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
        lambda x: x.isNotNull(),
    )
    occ = docs.select("doc_id", F.explode(bg_arr).alias("bg")).select(
        "doc_id",
        "bg",
        F.substring_index("bg", " ", 1).alias("w1"),
        F.substring_index("bg", " ", -1).alias("w2"),
    )
    cb = occ.groupBy("bg").agg(F.count(F.lit(1)).alias("cb"))
    cw = occ.groupBy("w1").agg(F.count(F.lit(1)).alias("cw"))
    tok = docs.select(F.explode(toks).alias("token"))
    vocab = tok.groupBy("token").agg(F.count(F.lit(1)).alias("tf"))
    total = tok.agg(F.count(F.lit(1)).alias("n_total"))
    p = F.lit(0.8) * (F.col("cb") / F.col("cw")) + F.lit(0.2) * (
        F.col("tf") / F.col("n_total")
    )
    lp = F.round(F.log2(p), 6).cast("decimal(18,6)")
    return (
        occ.join(cb, "bg")
        .join(cw, "w1")
        .join(vocab, occ["w2"] == vocab["token"])
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            (F.sum(lp).cast("double") / F.count(F.lit(1))).alias("avg_log2_prob"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            F.round("avg_log2_prob", 6).alias("avg_log2_prob"),
            F.round(F.pow(F.lit(2.0), -F.round(F.col("avg_log2_prob"), 6)), 6).alias(
                "ppl"
            ),
        )
    )


def temperature_mix(
    spark: SparkSession,
    sf_dir: str,
    temperature: float = 0.7,
    total_budget: int = 10000,
) -> DataFrame:
    """Temperature-scaled domain mixture weights — the standard
    pretraining reweighting (multilingual BERT / XLM-R exponential
    smoothing, T≈0.7): sampling share of domain d ∝ n_d^T, which
    up-weights small domains relative to proportional sampling while
    keeping large ones dominant.  Emits per lang: exact token count,
    natural share, temperature share, and the integer token budget
    floor(share · total_budget).

    Determinism: token counts are exact integers; the power/normalize
    arithmetic runs in double with one final floor, every intermediate
    written identically in the oracle; shares round to 6.

    Scale shape: ONE map-side-combinable aggregate over the doc
    summary; the power/normalize step runs on the per-domain result
    (a handful of rows).  Composes with token_budget_mix, which turns
    each budget into an exact document selection.

    Reference: none — SURVEY.md §2.8 mixing family.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = F.size(
        F.filter(F.split("text", r"\s+"), lambda x: x != F.lit(""))
    ).cast("bigint")
    per = docs.select("lang", toks.alias("n")).groupBy("lang").agg(
        F.sum("n").cast("bigint").alias("n_tokens")
    )
    from pyspark.sql.window import Window as W

    t = F.lit(float(temperature))
    w = F.pow(F.col("n_tokens").cast("double"), t)
    # unpartitioned windows over the PER-DOMAIN relation (a handful of
    # rows) — bounded regardless of corpus size
    tot_n = F.sum("n_tokens").over(W.partitionBy())
    tot_w = F.sum(w).over(W.partitionBy())
    return per.select(
        "lang",
        "n_tokens",
        F.round(F.col("n_tokens") / tot_n, 6).alias("natural_share"),
        F.round(w / tot_w, 6).alias("temp_share"),
        F.floor(w / tot_w * F.lit(float(total_budget)))
        .cast("bigint")
        .alias("token_budget"),
    )


def span_corruption(
    spark: SparkSession,
    sf_dir: str,
    block: int = 3,
    mask_pct: int = 15,
) -> DataFrame:
    """T5-style span-corruption pairs (Raffel et al. 2020): split each
    document's token stream into fixed ``block``-token spans, mask a
    deterministic ~``mask_pct``% of spans (md5 of (doc_id, span) —
    reproducible across runs, engines, partitionings), and emit the
    encoder input (masked spans collapsed to ``<extra_id_K>``
    sentinels, K in span order) plus the decoder target (each sentinel
    followed by the span it replaced).  Fixed-size spans instead of
    T5's sampled span lengths keeps the op exact and engine-portable;
    adjacent masked spans keep their own sentinels (documented
    simplification).

    Scale shape: explode to (doc, span) rows, ONE window per doc_id
    for the running sentinel index, re-assemble with ordered
    collect_list — linear, one shuffle on doc_id; strings never leave
    the JVM.

    Reference: none — SURVEY.md §2.8 extension (self-supervised
    objective construction over the documents table).
    """
    return span_corruption_df(
        load_table(spark, sf_dir, "documents"), block, mask_pct
    )


def span_corruption_df(
    docs: DataFrame, block: int = 3, mask_pct: int = 15
) -> DataFrame:
    """DataFrame-core of :func:`span_corruption` over any
    (doc_id, text) relation."""
    from pyspark.sql.window import Window as W

    toks = _all_tokens()
    nblk = F.ceil(F.size(toks) / F.lit(block)).cast("int")
    spans = docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.posexplode(
            F.transform(
                # greatest guards zero-token docs (sequence(0, -1)
                # would DESCEND); the empty span filters out below
                F.sequence(F.lit(0), F.greatest(nblk - 1, F.lit(0))),
                lambda b: F.concat_ws(
                    " ", F.slice(toks, b * block + 1, block)
                ),
            )
        ).alias("span_idx", "span_text"),
    ).where(F.col("span_text") != "")
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit("_"),
                    F.col("span_idx").cast("string"),
                )
            ),
            1,
            6,
        ),
        16,
        10,
    ).cast("bigint")
    masked = (h % 100) < mask_pct
    w = W.partitionBy("doc_id").orderBy("span_idx")
    flagged = spans.select(
        "doc_id",
        "n_tokens",
        "span_idx",
        "span_text",
        masked.alias("is_masked"),
        (F.sum(masked.cast("int")).over(w) - 1).alias("k"),
    )
    piece_in = F.when(
        F.col("is_masked"),
        F.concat(F.lit("<extra_id_"), F.col("k").cast("string"), F.lit(">")),
    ).otherwise(F.col("span_text"))
    piece_tgt = F.when(
        F.col("is_masked"),
        F.concat(
            F.lit("<extra_id_"),
            F.col("k").cast("string"),
            F.lit("> "),
            F.col("span_text"),
        ),
    )
    return (
        flagged.select(
            "doc_id", "n_tokens", "span_idx",
            piece_in.alias("pi"),
            piece_tgt.alias("pt"),
            F.col("is_masked").cast("int").alias("m"),
        )
        .groupBy("doc_id", "n_tokens")
        .agg(
            F.sum("m").cast("int").alias("n_masked_spans"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("span_idx", "pi"))),
                    lambda s: s["pi"],
                ),
            ).alias("inputs"),
            F.concat_ws(
                " ",
                F.filter(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("span_idx", "pt"))),
                        lambda s: s["pt"],
                    ),
                    lambda x: x.isNotNull(),
                ),
            ).alias("targets"),
        )
    )


def preference_pairs(
    spark: SparkSession, sf_dir: str, n_groups: int = 50
) -> DataFrame:
    """Preference-pair construction (DPO/RLHF reward-data prep): within
    each group (deterministic doc_id % ``n_groups`` here — the stand-in
    for a shared prompt), pick the highest-scoring document as
    ``chosen`` and the lowest as ``rejected`` under the hashed linear
    classifier's EXACT integer score (quality_classifier), with doc_id
    tiebreaks; emit the pair and its integer margin.  Groups smaller
    than 2 emit nothing; a group whose max == min (zero margin) is
    kept with margin 0 (callers filter by margin threshold).

    Scale shape: the scoring pass is the classifier's (map-only + one
    re-agg); pair selection is two window functions over ONE group
    shuffle of the doc-SUMMARY relation.

    Reference: none — SURVEY.md §2.8 extension (alignment-data prep).
    """
    from pyspark.sql.window import Window as W

    scored = quality_classifier(spark, sf_dir).select(
        "doc_id", "score", (F.col("doc_id") % n_groups).alias("group_id")
    )
    w_hi = W.partitionBy("group_id").orderBy(F.desc("score"), F.asc("doc_id"))
    w_lo = W.partitionBy("group_id").orderBy(F.asc("score"), F.asc("doc_id"))
    ranked = scored.select(
        "group_id",
        "doc_id",
        "score",
        F.row_number().over(w_hi).alias("r_hi"),
        F.row_number().over(w_lo).alias("r_lo"),
        F.count(F.lit(1)).over(W.partitionBy("group_id")).alias("n_in_group"),
    )
    hi = ranked.where(F.col("r_hi") == 1).select(
        "group_id",
        F.col("doc_id").alias("chosen_doc"),
        F.col("score").alias("chosen_score"),
        "n_in_group",
    )
    lo = ranked.where(F.col("r_lo") == 1).select(
        "group_id",
        F.col("doc_id").alias("rejected_doc"),
        F.col("score").alias("rejected_score"),
    )
    return (
        hi.join(lo, "group_id")
        .where(F.col("n_in_group") >= 2)
        .select(
            F.col("group_id").cast("bigint").alias("group_id"),
            "chosen_doc",
            "rejected_doc",
            "chosen_score",
            "rejected_score",
            (F.col("chosen_score") - F.col("rejected_score"))
            .cast("bigint")
            .alias("margin"),
        )
    )


def unigram_sampling_table(
    spark: SparkSession, sf_dir: str, power: float = 0.75, scale: int = 1000
) -> DataFrame:
    """Smoothed unigram sampling table (word2vec's count^0.75 negative
    -sampling distribution): per token, an INTEGER weight
    floor(count^0.75 · scale) and the half-open cumulative range
    [range_lo, range_hi) an alias-free sampler probes with a uniform
    integer draw in [0, max(range_hi)) — the artifact embedding
    trainers precompute from corpus statistics.

    Determinism: counts exact; weight = ONE double pow + floor per
    token (no cross-token float normalization — a Σ over thousands of
    doubles is summation-order-dependent across engines and could flip
    floor boundaries); ranges are integer window sums in (token)
    order, so the whole table value-hashes.

    Scale shape: one vocab aggregate (map-side combinable), one window
    over the VOCAB relation (sublinear in corpus under Zipf), ordered
    by token for determinism.
    """
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(_all_tokens()).alias("token"))
    vocab = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    wgt = F.pow(F.col("cnt").cast("double"), F.lit(float(power)))
    weighted = vocab.select(
        "token",
        F.col("cnt").cast("bigint").alias("cnt"),
        F.floor(wgt * F.lit(float(scale))).cast("bigint").alias("weight"),
    )
    w = W.orderBy("token").rowsBetween(W.unboundedPreceding, W.currentRow)
    return weighted.select(
        "token",
        "cnt",
        "weight",
        (F.sum("weight").over(w) - F.col("weight")).cast("bigint").alias("range_lo"),
        F.sum("weight").over(w).cast("bigint").alias("range_hi"),
    )


def pmi_collocations(
    spark: SparkSession, sf_dir: str, min_count: int = 10
) -> DataFrame:
    """Corpus-level collocation mining: bigrams ranked by pointwise
    mutual information — the classic phrase detector (word2vec's
    phrase pass, NLTK's collocation finder) a pretraining pipeline
    runs to fold multi-word units ("new york") into single tokens:

        PMI(w1, w2) = log2( p(w1 w2) / (p(w1) · p(w2)) )
                    = log2( (c12/N2) / ((c1/N1) · (c2/N1)) )

    with c12 the bigram count over N2 bigram positions and c1/c2 the
    unigram counts over N1 token positions.  Emits every bigram with
    c12 ≥ min_count and rounded PMI > 0 (positively associated) —
    a threshold set, not a top-k, so the result is deterministic with
    no ordering boundary.

    Determinism: every count is an exact integer; PMI is ONE double
    expression written identically in the oracle, rounded to 6.

    Scale shape: the min_count filter lands on the bigram aggregate
    BEFORE the unigram joins, so the joined stream is the (tiny) set
    of frequent bigrams, not the corpus; unigram counts join on token
    keys (AQE broadcasts the survivors); the two corpus totals attach
    as one broadcast row.  All map-side-combinable aggregates of one
    explode — no Python, no window, no skew pivot (the hottest token
    key caps at vocabulary frequency, sharded by the hash aggregate's
    partial combine).

    Reference: none — SURVEY.md §2.8 text-analysis family.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = _all_tokens()
    bg_arr = F.filter(
        F.zip_with(
            toks,
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
        lambda x: x.isNotNull(),
    )
    occ = docs.select(F.explode(bg_arr).alias("bg"))
    tok = docs.select(F.explode(toks).alias("token"))
    cb = (
        occ.groupBy("bg")
        .agg(F.count(F.lit(1)).alias("c_bigram"))
        .where(F.col("c_bigram") >= min_count)
        .select(
            "bg",
            "c_bigram",
            F.substring_index("bg", " ", 1).alias("w1"),
            F.substring_index("bg", " ", -1).alias("w2"),
        )
    )
    uni = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cu"))
    totals = tok.agg(
        F.count(F.lit(1)).alias("n1")
    ).crossJoin(occ.agg(F.count(F.lit(1)).alias("n2")))
    u1 = uni.select(F.col("token").alias("w1"), F.col("cu").alias("c_w1"))
    u2 = uni.select(F.col("token").alias("w2"), F.col("cu").alias("c_w2"))
    pmi = F.round(
        F.log2(
            (F.col("c_bigram") / F.col("n2"))
            / ((F.col("c_w1") / F.col("n1")) * (F.col("c_w2") / F.col("n1")))
        ),
        6,
    )
    return (
        cb.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            F.col("bg").alias("bigram"),
            F.col("c_bigram").cast("bigint").alias("c_bigram"),
            F.col("c_w1").cast("bigint").alias("c_w1"),
            F.col("c_w2").cast("bigint").alias("c_w2"),
            pmi.alias("pmi"),
        )
        .where(F.col("pmi") > 0)
    )


def readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Flesch reading ease + Flesch-Kincaid grade with
    fully deterministic structural counts — the readability gate a
    curation pipeline uses alongside the Gopher rules (drop the
    unreadable tail, stratify the rest):

        ease  = 206.835 − 1.015·(words/sentences) − 84.6·(syll/words)
        grade = 0.39·(words/sentences) + 11.8·(syll/words) − 15.59

    Sentences: runs of [.!?]+ bound non-blank segments (min 1, so a
    fragment without terminal punctuation is one sentence).  Syllable
    heuristic: vowel groups [aeiouy]+ per word, min 1 — the standard
    cheap approximation; both engines count it with the same regex.

    Determinism: sentence/word/syllable counts are exact integers
    (the syllable fold is an integer aggregate over the token array —
    no double accumulation), and each score is one double expression
    written identically in the oracle, rounded to 4.

    Scale shape: map-only — one projection per document, no shuffle,
    no Python; the regex work stays inside whole-stage codegen.

    Reference: none — SURVEY.md §2.8 quality-filter family.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = _all_tokens()
    sentences = F.greatest(
        F.lit(1),
        F.size(
            F.filter(
                F.split(F.col("text"), r"[.!?]+"),
                lambda s: F.trim(s) != "",
            )
        ),
    ).cast("bigint")
    words = F.size(toks).cast("bigint")
    syllables = F.aggregate(
        toks,
        F.lit(0).cast("bigint"),
        lambda acc, wd: acc
        + F.greatest(
            F.lit(1),
            F.size(F.regexp_extract_all(wd, F.lit("[aeiouy]+"), 0)),
        ),
    )
    t = docs.select(
        "doc_id",
        sentences.alias("n_sentences"),
        words.alias("n_words"),
        syllables.alias("n_syllables"),
    )
    wps = F.col("n_words") / F.greatest(F.lit(1), F.col("n_sentences"))
    spw = F.col("n_syllables") / F.greatest(F.lit(1), F.col("n_words"))
    return t.select(
        "doc_id",
        "n_sentences",
        "n_words",
        "n_syllables",
        F.round(F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw, 4).alias(
            "flesch_ease"
        ),
        F.round(F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59), 4).alias(
            "fk_grade"
        ),
    )


def char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon entropy of the character distribution —
    the compression-ratio proxy that catches what token rules miss:
    binary blobs and base64 runs score near log2(alphabet) ≈ 6 bits,
    single-character spam near 0, natural language ~4.0-4.5.  A
    standard cheap gate before the heavier quality classifiers.

        H(doc) = −Σ_c (n_c/n)·log2(n_c/n)   over characters c

    Determinism: character counts are exact integers; each character's
    −p·log2(p) term rounds to 9 decimals and sums as DECIMAL(28,9)
    (the unigram-logprob policy), so the per-document sum is
    bit-identical on any partitioning and in the oracle; the final
    entropy rounds to 6.

    Scale shape: one explode to character occurrences, then a
    (doc_id, char)-keyed hash aggregate — map-side combine collapses
    each partition's occurrences to ≤ |alphabet| rows per document
    before the exchange, so shuffle volume is ~alphabet-sized per doc
    regardless of document length; the per-doc total joins back on
    doc_id (co-partitioned with the term aggregate by the same key).

    Reference: none — SURVEY.md §2.8 quality-filter family.
    """
    docs = load_table(spark, sf_dir, "documents")
    chars = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), "")).alias("ch")
    ).where(F.col("ch") != "")
    counts = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    totals = counts.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct_chars"),
    )
    term = F.round(
        -(F.col("c") / F.col("n")) * F.log2(F.col("c") / F.col("n")), 9
    ).cast("decimal(28,9)")
    return (
        counts.join(totals, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.max("n").alias("n_chars"),
            F.max("n_distinct_chars").alias("n_distinct_chars"),
            F.round(F.sum(term).cast("double"), 6).alias("entropy_bits"),
        )
    )


def zipf_fit(spark: SparkSession, sf_dir: str, top_k: int = 1000) -> DataFrame:
    """Zipf's-law fit over the corpus vocabulary — the classic corpus
    health diagnostic (natural language sits near slope −1; generated
    or templated text flattens, boilerplate steepens): OLS of
    log2(freq) on log2(rank) over the top_k terms,

        slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²).

    Determinism: term frequencies are exact integers and the rank
    order has a total tiebreak (freq desc, token asc), so the top-k
    SET and every rank are engine-independent; each OLS term rounds to
    9 decimals and sums as DECIMAL(28,9) (the unigram-logprob policy),
    then ONE double expression per coefficient, rounded to 6.

    Scale shape: the frequency table is a map-side-combinable
    aggregate; the global order is a TakeOrderedAndProject top-k, and
    the only unpartitioned window ranks those ≤ top_k rows — bounded
    by construction, not by data (the retrieval_metrics precedent).

    Reference: none — SURVEY.md §2.8 text-analysis family.
    """
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf_dir, "documents")
    freq = (
        docs.select(F.explode(_all_tokens()).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("token"))
        .limit(top_k)
    )
    ranked = freq.withColumn(
        "rank",
        F.row_number().over(W.orderBy(F.desc("freq"), F.asc("token"))),
    )
    x = F.log2(F.col("rank").cast("double"))
    y = F.log2(F.col("freq").cast("double"))
    d9 = lambda c: F.round(c, 9).cast("decimal(28,9)")  # noqa: E731
    agg = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_terms"),
        F.sum(d9(x)).alias("sx"),
        F.sum(d9(y)).alias("sy"),
        F.sum(d9(x * y)).alias("sxy"),
        F.sum(d9(x * x)).alias("sxx"),
    )
    n = F.col("n_terms").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return agg.select(
        "n_terms",
        F.round(slope, 6).alias("zipf_slope"),
        F.round((sy - F.round(slope, 6) * sx) / n, 6).alias("intercept"),
    )


def dsir_weights(
    spark: SparkSession,
    sf_dir: str,
    n_buckets: int = 1024,
    target_lang: str = "en",
) -> DataFrame:
    """DSIR-style data selection: per-document importance log-weights
    from hashed n-gram features (Xie et al., "Data Selection for
    Language Models via Importance Resampling", NeurIPS 2023).

    The target distribution is the corpus slice that looks like what
    you want more of (here: lang == 'en', standing in for "a trusted
    high-quality corpus"); the raw distribution is the whole corpus.
    Both are bag-of-hashed-feature unigram+bigram models with add-0.5
    smoothing over ``n_buckets`` buckets, and a document's weight is

        log p_target(doc) - log p_raw(doc)
          = Σ_f  count_f(doc) · λ_f,   λ_f = ln(p̂_target(f) / p̂_raw(f))

    DSIR then resamples ∝ exp(weight); the deterministic analogue here
    flags ``selected`` = (weight > 0), i.e. docs the target model
    likes better than the raw model.

    Cross-engine exactness: each λ_f is ONE double ln of one division
    (identical operand order in the oracle), rounded to 9 decimals and
    carried as DECIMAL(18,9); per-doc scores are exact decimal sums of
    integer-count × λ products — order-independent, value-hashable.

    Scale shape (pinned in test_plans.py): the feature-distribution
    relation is ≤ n_buckets rows NO MATTER the corpus size — it
    aggregates once (exchange 1), rides back as a BROADCAST onto the
    per-doc feature counts, and the only other exchange is the per-doc
    aggregation.  Nothing corpus-sized is ever joined or sorted; at
    100 TB this is two map-side-combined aggregates and a 1024-row
    broadcast, the same cost shape as quality_classifier.

    Reference: none — SURVEY.md §2.8 curation family (the
    distribution-matching rung above the rule/classifier filters).
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    return dsir_weights_df(docs, n_buckets, target_lang)


def dsir_weights_df(
    docs: DataFrame, n_buckets: int = 1024, target_lang: str = "en"
) -> DataFrame:
    """DataFrame-core of :func:`dsir_weights` over any
    (doc_id, lang, text) relation (the scale probe uses it)."""
    toks = _all_tokens()
    bigrams = F.filter(
        F.zip_with(
            toks,
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
            lambda a, b: F.concat(a, F.lit("_"), b),
        ),
        lambda x: x.isNotNull(),
    )
    feats = docs.select(
        "doc_id", "lang", F.explode(F.concat(toks, bigrams)).alias("feat")
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("feat")), 1, 12), 16, 10).cast("bigint")
        % n_buckets
    )
    fb = feats.select("doc_id", "lang", bucket.alias("bucket"))

    half_b = 0.5 * n_buckets
    # the distribution is ≤ n_buckets rows; checkpoint it eagerly so
    # totals and λ derive from ONE tokenize pass instead of re-running
    # the corpus aggregation once per consumer
    dist = (
        fb.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("cnt_raw"),
            F.sum(
                F.when(F.col("lang") == target_lang, F.lit(1)).otherwise(F.lit(0))
            ).alias("cnt_target"),
        )
        .localCheckpoint(eager=True)
    )
    totals = dist.agg(
        F.sum("cnt_raw").alias("tot_raw"), F.sum("cnt_target").alias("tot_target")
    )
    # λ = ln( ((t+0.5) * (tot_raw+B/2)) / ((r+0.5) * (tot_target+B/2)) )
    # — one ln of one division, operand order mirrored in the oracle
    lam = F.log(
        (
            (F.col("cnt_target").cast("double") + F.lit(0.5))
            * (F.col("tot_raw").cast("double") + F.lit(half_b))
        )
        / (
            (F.col("cnt_raw").cast("double") + F.lit(0.5))
            * (F.col("tot_target").cast("double") + F.lit(half_b))
        )
    )
    lam_tbl = dist.crossJoin(F.broadcast(totals)).select(
        "bucket", F.round(lam, 9).cast("decimal(18,9)").alias("lam")
    )

    # lang rides the grouping keys (functionally dependent on doc_id),
    # so no corpus-sized join back to documents is ever needed
    per_doc_bucket = fb.groupBy("doc_id", "lang", "bucket").agg(
        F.count(F.lit(1)).alias("n")
    )
    scored = (
        per_doc_bucket.join(F.broadcast(lam_tbl), "bucket")
        .groupBy("doc_id", "lang")
        .agg(
            # decimal(10,0) × decimal(18,9) = decimal(29,9): within
            # Spark's 38-digit cap, so the product keeps all 9 decimals
            # exactly (a (20,0) count would push precision to 39 and
            # Spark would silently round the scale down to 8)
            F.sum(F.col("n").cast("decimal(10,0)") * F.col("lam")).alias("s"),
            F.sum("n").cast("bigint").alias("n_feats"),
        )
    )
    return scored.select(
        "doc_id",
        "lang",
        "n_feats",
        # round the EXACT decimal (half-away-from-zero in both
        # engines), then cast — rounding the double instead differs
        # by 1 ulp between engines on ~3% of docs
        F.round(F.col("s"), 6).cast("double").alias("dsir_logweight"),
        (F.col("s") > 0).alias("selected"),
    )


# ---------------------------------------------------------------------------
# Unigram-LM subword tokenizer (SentencePiece-style) — the other major
# tokenizer family next to BPE (Kudo 2018, "Subword Regularization:
# Improving Neural Network Translation Models with Multiple Subword
# Candidates" — public method).
# ---------------------------------------------------------------------------


def viterbi_segment(
    word: str, logp: dict[str, float], max_piece_len: int
) -> list[str]:
    """Best segmentation of ``word`` under piece log-probs: classic
    Viterbi over cut positions.  Deterministic tie-break: candidate
    start positions are scanned ascending and only a STRICTLY better
    score replaces the incumbent, so on exact float ties the earliest
    start (longest final piece) wins — the rule both the distributed
    kernel and the pure-python test reference share."""
    n = len(word)
    NEG = float("-inf")
    score = [NEG] * (n + 1)
    back = [0] * (n + 1)
    score[0] = 0.0
    for i in range(1, n + 1):
        for j in range(max(0, i - max_piece_len), i):
            if score[j] == NEG:
                continue
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                continue
            s = score[j] + lp
            if s > score[i]:
                score[i] = s
                back[i] = j
    if score[n] == NEG:  # unreachable when all single chars are in vocab
        return list(word)
    out: list[str] = []
    i = n
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    return out[::-1]


def _unigram_estep_counts(
    words: DataFrame, logp: dict[str, float], max_piece_len: int
) -> DataFrame:
    """E-step: Viterbi-segment each distinct word (Arrow-batched
    kernel, model dict in the closure — the bpe_encode escape-hatch
    shape) and emit (piece, c) expected counts weighted by word
    frequency.  Input/output are vocabulary-sized relations."""
    import pandas as pd  # noqa: F401  (kernel dependency)

    model = dict(logp)
    mpl = max_piece_len

    def kern(batches):
        import pandas as pd

        # worker-side copy of viterbi_segment: a module-level function
        # would pickle BY REFERENCE and break when the grading driver
        # imports this repo from a foreign cwd (workers can't import
        # heatmap_spark) — the same constraint bpe_encode_df documents;
        # test_unigram.py pins the two implementations equal
        def vit(word):
            n = len(word)
            NEG = float("-inf")
            score = [NEG] * (n + 1)
            back = [0] * (n + 1)
            score[0] = 0.0
            for i in range(1, n + 1):
                for j in range(max(0, i - mpl), i):
                    if score[j] == NEG:
                        continue
                    lp = model.get(word[j:i])
                    if lp is None:
                        continue
                    s = score[j] + lp
                    if s > score[i]:
                        score[i] = s
                        back[i] = j
            if score[n] == NEG:
                return list(word)
            out = []
            i = n
            while i > 0:
                j = back[i]
                out.append(word[j:i])
                i = j
            return out[::-1]

        for pdf in batches:
            pieces: list[str] = []
            counts: list[int] = []
            for w, c in zip(pdf["w"], pdf["cnt"]):
                for p in vit(w):
                    pieces.append(p)
                    counts.append(int(c))
            yield pd.DataFrame({"piece": pieces, "c": counts})

    seg = words.mapInPandas(kern, "piece string, c long")
    return seg.groupBy("piece").agg(F.sum("c").alias("c"))


def unigram_train(
    docs: DataFrame,
    vocab_size: int = 96,
    max_piece_len: int = 4,
    em_iters: int = 3,
    seed_mult: int = 3,
) -> list[tuple[str, int, float]]:
    """Train a unigram-LM subword vocabulary over a (…, text) corpus.
    Returns [(piece, expected_count, logprob), …] sorted by
    (count desc, piece asc).

    Scale shape — the same argument as bpe_train_merges: the ONLY
    corpus-sized pass is the word-frequency aggregate.  Seeding
    (substring scores), every E-step (Viterbi segmentation, model in
    the kernel closure), and every M-step (piece-count aggregate) run
    on the word-frequency TABLE — vocabulary-sized, independent of
    corpus rows — and the model that crosses the driver boundary is
    ≤ seed_mult·vocab_size (piece, count) rows per round.

    Simplifications vs full SentencePiece, stated honestly: pruning
    keeps the top pieces by expected count (not by loss-delta), there
    is no subword-regularization sampling (we always take the Viterbi
    path), and seeding scores substrings by raw occurrence weight (not
    the ESA suffix-array seed).  Every step is deterministic — integer
    counts, python-float log-probs derived from them, and a fixed
    Viterbi tie-break — so the trained vocabulary is exactly
    reproducible (pinned against a pure-python reference trainer in
    tests/test_unigram.py)."""
    words = (
        docs.select(F.explode(_all_tokens()).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=True)
    )
    # seed: all substrings (length ≤ max_piece_len) scored by total
    # occurrence weight — one aggregate over the word table
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.lit(max_piece_len)),
            lambda L: F.when(
                F.length("w") >= L,
                F.transform(
                    F.sequence(F.lit(0), F.length("w") - L),
                    lambda i: F.col("w").substr(i + 1, L),
                ),
            ).otherwise(F.array().cast("array<string>")),
        )
    )
    scored = (
        words.select("cnt", F.explode(subs).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("cnt").alias("c"))
    )
    seed_size = vocab_size * seed_mult
    top = scored.orderBy(F.desc("c"), F.asc("piece")).limit(seed_size).collect()
    chars = {
        r["piece"]: int(r["c"])
        for r in scored.where(F.length("piece") == 1).collect()
    }
    counts = {r["piece"]: int(r["c"]) for r in top}
    counts.update(chars)  # single chars are never dropped (coverage)

    def to_logp(cnt: dict[str, int]) -> dict[str, float]:
        import math

        total = sum(cnt.values())
        return {p: math.log(c / total) for p, c in cnt.items() if c > 0}

    for it in range(em_iters):
        logp = to_logp(counts)
        est = {
            r["piece"]: int(r["c"])
            for r in _unigram_estep_counts(words, logp, max_piece_len).collect()
        }
        # prune to target size on the LAST iteration, to 2× before it;
        # single chars always survive (keep Viterbi total coverage)
        target = vocab_size if it == em_iters - 1 else vocab_size * 2
        multi = sorted(
            ((p, c) for p, c in est.items() if len(p) > 1),
            key=lambda pc: (-pc[1], pc[0]),
        )
        keep_multi = multi[: max(target - len(chars), 0)]
        # chars take their E-step count floored at 1: coverage requires
        # every char to keep positive probability even when no Viterbi
        # path used it this round (SentencePiece's char-retention rule)
        counts = {p: max(est.get(p, 0), 1) for p in chars}
        counts.update(dict(keep_multi))
    logp = to_logp(counts)
    return sorted(
        ((p, c, logp[p]) for p, c in counts.items() if c > 0),
        key=lambda x: (-x[1], x[0]),
    )


def unigram_vocab(
    spark: SparkSession, sf_dir: str, vocab_size: int = 96
) -> DataFrame:
    """Declared query (q_unigram_vocab): the trained unigram-LM
    vocabulary (rank, piece, count, logprob) over the documents
    fixture.  Training is iterative EM (the SQL-inexpressible class,
    like q_bpe_merges — no DuckDB oracle), so the query self-checks
    invariants and RAISES on violation: probabilities form a
    distribution (Σ exp(logprob) ≈ 1), every single character of the
    corpus vocabulary survives pruning (coverage — any word stays
    segmentable), counts are non-increasing in rank, and no piece
    exceeds the length cap.  Exact-match verification against a
    pure-python reference trainer lives in tests/test_unigram.py."""
    import math

    docs = load_table(spark, sf_dir, "documents").select("text")
    vocab = unigram_train(docs, vocab_size=vocab_size)
    if not vocab:
        raise AssertionError("unigram_vocab: empty vocabulary")
    total_p = sum(math.exp(lp) for _, _, lp in vocab)
    if abs(total_p - 1.0) > 1e-9:
        raise AssertionError(f"unigram probs sum to {total_p}, not 1")
    for i in range(1, len(vocab)):
        if vocab[i][1] > vocab[i - 1][1]:
            raise AssertionError(f"count rose at rank {i}")
    if any(len(p) > 4 for p, _, _ in vocab):
        raise AssertionError("piece exceeds max_piece_len")
    corpus_chars = {
        r["ch"]
        for r in docs.select(
            F.explode(F.split(F.array_join(_all_tokens(), ""), "")).alias("ch")
        )
        .where(F.col("ch") != "")
        .distinct()
        .collect()
    }
    vocab_pieces = {p for p, _, _ in vocab}
    missing = corpus_chars - vocab_pieces
    if missing:
        raise AssertionError(f"single-char coverage broken: {sorted(missing)}")
    return spark.createDataFrame(
        [
            (i, p, c, round(lp, 9))
            for i, (p, c, lp) in enumerate(vocab)
        ],
        "rank int, piece string, count bigint, logprob double",
    )
