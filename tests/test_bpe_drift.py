"""Streaming BPE-fertility-drift store: fold ≡ nested-replace oracle
equivalence, metrics-log semantics, replay guard, and the foreachBatch
entry point."""

import random

from pyspark.sql import functions as F

from heatmap_spark.sources.tables import load_table
from heatmap_spark.streaming.bpe_drift import (
    FROZEN_MERGES,
    bpe_doc_metrics,
    merge_batch_into_bpe_store,
    read_bpe_drift,
    stream_bpe_drift,
)


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select("doc_id", "text")


def _batches(docs, n=3):
    mx = docs.agg(F.max("doc_id")).first()[0] + 1
    return [
        docs.where(F.expr(f"CAST(doc_id * 3 DIV {mx} AS INT)") == b)
        for b in range(n)
    ]


def _fold(word, merges):
    syms = list(word) + ["</w>"]
    for left, right in merges:
        out = []
        for s in syms:
            if out and out[-1] == left and s == right:
                out[-1] = left + right
            else:
                out.append(s)
        syms = out
    return syms


def _replace_chain(word, merges):
    s = "  " + "  ".join(list(word) + ["</w>"]) + "  "
    for left, right in merges:
        s = s.replace(f" {left}  {right} ", f" {left + right} ")
    parts = s.split("  ")
    return parts[1:-1]


def test_fold_equals_replace_chain_random_words():
    """The oracle's nested-replace tokenization is symbol-for-symbol
    the fold the Spark kernel runs — on the frozen merges and on an
    adversarial list with self-merges (l == r) and chained merges."""
    adversarial = [("a", "a"), ("a", "b"), ("aa", "b"), ("b", "</w>"),
                   ("ab", "</w>"), ("c", "ab</w>")]
    rng = random.Random(7)
    for merges, alphabet in ((FROZEN_MERGES, "thequickbrownfx123"),
                             (adversarial, "abc")):
        for _ in range(3000):
            w = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 10)))
            assert _fold(w, merges) == _replace_chain(w, merges), w


def test_doc_metrics_bounds(spark, sf_smoke):
    """Per-doc invariants under the frozen merges: word count ≤ BPE
    tokens ≤ chars + words (each word is ≥1 and ≤ len+1 symbols), and
    the corpus must compress somewhere (English merges on English-ish
    fixture text)."""
    out = bpe_doc_metrics(_docs(spark, sf_smoke)).localCheckpoint(eager=True)
    bad = out.where(
        (F.col("n_bpe_tokens") < F.col("n_words"))
        | (F.col("n_bpe_tokens") > F.col("n_chars") + F.col("n_words"))
        | (F.col("n_frag_words") > F.col("n_words"))
    ).count()
    assert bad == 0
    assert (
        out.where(
            F.col("n_bpe_tokens") < F.col("n_chars") + F.col("n_words")
        ).count()
        > 0
    )


def test_metrics_log_semantics(spark, sf_smoke, tmp_path):
    """Batch 0 has zero drift by definition; integer totals conserve
    vs a one-shot pass; fertility is the quotient of the stored sums."""
    store = str(tmp_path / "store")
    docs = _docs(spark, sf_smoke)
    for b, batch in enumerate(_batches(docs)):
        assert merge_batch_into_bpe_store(spark, batch, store, b)
    log = {r["batch_id"]: r for r in read_bpe_drift(spark, store).collect()}
    assert sorted(log) == [0, 1, 2]
    assert log[0]["fertility_drift"] == 0.0
    one_shot = bpe_doc_metrics(docs).agg(
        F.sum("n_words"), F.sum("n_bpe_tokens"), F.sum("n_frag_words")
    ).first()
    assert sum(r["n_words"] for r in log.values()) == one_shot[0]
    assert sum(r["n_bpe_tokens"] for r in log.values()) == one_shot[1]
    assert sum(r["n_frag_words"] for r in log.values()) == one_shot[2]
    for r in log.values():
        if r["n_words"]:
            assert r["fertility"] == round(r["n_bpe_tokens"] / r["n_words"], 6)


def test_replay_is_noop(spark, sf_smoke, tmp_path):
    store = str(tmp_path / "store")
    b0, b1, _ = _batches(_docs(spark, sf_smoke))
    assert merge_batch_into_bpe_store(spark, b0, store, 0)
    assert merge_batch_into_bpe_store(spark, b1, store, 1)
    before = sorted(read_bpe_drift(spark, store).collect())
    assert not merge_batch_into_bpe_store(spark, b1, store, 1)
    assert sorted(read_bpe_drift(spark, store).collect()) == before


def test_streaming_entry_point(spark, sf_smoke, tmp_path):
    store, src = str(tmp_path / "store"), str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    docs = _docs(spark, sf_smoke)
    docs.repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = stream_bpe_drift(stream, store, ckpt)
    q.awaitTermination(timeout=300)
    log = read_bpe_drift(spark, store)
    assert log.count() >= 3
    one_shot = bpe_doc_metrics(docs).agg(F.sum("n_bpe_tokens")).first()[0]
    assert log.agg(F.sum("n_bpe_tokens")).first()[0] == one_shot
