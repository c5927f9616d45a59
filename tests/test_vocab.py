"""Streaming vocabulary-drift store: drift-log semantics, replay
guard, compaction transparency, and the foreachBatch entry point."""

from pyspark.sql import functions as F

from heatmap_spark.sources.tables import load_table
from heatmap_spark.streaming.vocab import (
    accumulated_vocab,
    compact_vocab_store,
    merge_batch_into_vocab_store,
    read_vocab_drift,
    stream_vocab_drift,
)


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select("doc_id", "text")


def _batches(docs, n=3):
    mx = docs.agg(F.max("doc_id")).first()[0] + 1
    return [
        docs.where(F.expr(f"CAST(doc_id * 3 DIV {mx} AS INT)") == b)
        for b in range(n)
    ]


def _corpus_token_stats(spark, docs):
    toks = docs.select(
        F.explode(
            F.filter(F.split(F.lower("text"), "[^a-z0-9]+"), lambda x: x != F.lit(""))
        ).alias("token")
    )
    return toks.count(), toks.distinct().count()


def test_drift_log_semantics(spark, sf_smoke, tmp_path):
    """First batch is all-new (oov 1.0, drift 0.0); occurrence totals
    conserve; summed new-type counts equal the corpus type count
    (each type is new exactly once)."""
    store = str(tmp_path / "store")
    docs = _docs(spark, sf_smoke)
    for b, batch in enumerate(_batches(docs)):
        assert merge_batch_into_vocab_store(spark, batch, store, b)
    log = {r["batch_id"]: r for r in read_vocab_drift(spark, store).collect()}
    assert sorted(log) == [0, 1, 2]
    assert log[0]["oov_rate"] == 1.0 and log[0]["l1_drift"] == 0.0
    n_occ, n_types = _corpus_token_stats(spark, docs)
    assert sum(r["n_tokens"] for r in log.values()) == n_occ
    assert sum(r["n_new_types"] for r in log.values()) == n_types
    for b in (1, 2):
        assert 0.0 <= log[b]["oov_rate"] <= 1.0
        assert 0.0 <= log[b]["l1_drift"] <= 2.0
    acc = accumulated_vocab(spark, store)
    assert acc.agg(F.sum("c")).first()[0] == n_occ


def test_replay_is_noop(spark, sf_smoke, tmp_path):
    store = str(tmp_path / "store")
    docs = _docs(spark, sf_smoke)
    b0, b1, _ = _batches(docs)
    assert merge_batch_into_vocab_store(spark, b0, store, 0)
    assert merge_batch_into_vocab_store(spark, b1, store, 1)
    before = sorted(read_vocab_drift(spark, store).collect())
    assert not merge_batch_into_vocab_store(spark, b1, store, 1)
    assert sorted(read_vocab_drift(spark, store).collect()) == before


def test_compaction_transparent_to_drift(spark, sf_smoke, tmp_path):
    """Compacting mid-history changes neither the accumulated vocab nor
    the drift a later batch computes."""
    docs = _docs(spark, sf_smoke)
    b0, b1, b2 = _batches(docs)
    plain, comp = str(tmp_path / "plain"), str(tmp_path / "comp")
    for store in (plain, comp):
        assert merge_batch_into_vocab_store(spark, b0, store, 0)
        assert merge_batch_into_vocab_store(spark, b1, store, 1)
    assert compact_vocab_store(spark, comp) == 2
    a, b = accumulated_vocab(spark, plain), accumulated_vocab(spark, comp)
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
    for store in (plain, comp):
        assert merge_batch_into_vocab_store(spark, b2, store, 2)
    lp = sorted(read_vocab_drift(spark, plain).collect())
    lc = sorted(read_vocab_drift(spark, comp).collect())
    assert lp == lc
    # nothing unfolded left to fold; stragglers GC'd
    assert compact_vocab_store(spark, comp) == 1  # folds batch 2


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
    q = stream_vocab_drift(stream, store, ckpt)
    q.awaitTermination(timeout=300)
    log = read_vocab_drift(spark, store)
    n_occ, _ = _corpus_token_stats(spark, docs)
    assert log.count() >= 3
    assert log.agg(F.sum("n_tokens")).first()[0] == n_occ
