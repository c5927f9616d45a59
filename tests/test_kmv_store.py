"""Streaming KMV (θ-sketch) store: the exact merge identity, replay
idempotence, LSM compaction transparency, and estimate determinism."""

import tempfile

from pyspark.sql import functions as F

from heatmap_spark.operators.profiling import _KMV_K, kmv_hashes
from heatmap_spark.sources.tables import load_table
from heatmap_spark.streaming.kmv import (
    _topk,
    accumulated_sketch,
    compact_kmv_store,
    merge_batch_into_kmv_store,
    serve_kmv_estimates,
)


def _sk(df):
    return sorted((r["event_type"], r["hv"]) for r in df.collect())


def _events(spark, sf_smoke):
    return load_table(spark, sf_smoke, "events").select(
        "event_type", "user_id", "event_id"
    )


def _one_shot(ev, k=_KMV_K):
    return _topk(kmv_hashes(ev, "user_id", ["event_type"]), k)


def _build(spark, ev, store, compact_at=None):
    mx = ev.agg(F.max("event_id")).first()[0] + 1
    for b in range(3):
        batch = ev.where(
            F.expr(f"CAST(event_id * 3 DIV {mx} AS INT)") == b
        ).select("event_type", "user_id")
        merge_batch_into_kmv_store(spark, batch, store, b)
        if compact_at == b:
            compact_kmv_store(spark, store)


def test_merge_identity_exact(spark, sf_smoke):
    """top-k of unioned per-batch top-ks == top-k of the whole set,
    bit-for-bit — the mergeability the store relies on."""
    ev = _events(spark, sf_smoke)
    store = tempfile.mkdtemp(prefix="kmv_t_") + "/s"
    _build(spark, ev, store)
    assert _sk(accumulated_sketch(spark, store)) == _sk(_one_shot(ev))


def test_compaction_is_transparent(spark, sf_smoke):
    ev = _events(spark, sf_smoke)
    store = tempfile.mkdtemp(prefix="kmv_t_") + "/s"
    _build(spark, ev, store, compact_at=1)
    assert _sk(accumulated_sketch(spark, store)) == _sk(_one_shot(ev))
    # fold everything, partials all GC'd, read unchanged
    compact_kmv_store(spark, store)
    assert _sk(accumulated_sketch(spark, store)) == _sk(_one_shot(ev))


def test_replayed_batch_is_noop(spark, sf_smoke):
    ev = _events(spark, sf_smoke)
    store = tempfile.mkdtemp(prefix="kmv_t_") + "/s"
    _build(spark, ev, store)
    before = _sk(accumulated_sketch(spark, store))
    replay = ev.limit(100).select("event_type", "user_id")
    assert merge_batch_into_kmv_store(spark, replay, store, 1) is False
    assert _sk(accumulated_sketch(spark, store)) == before


def test_estimates_bounded_and_exact_below_k(spark, sf_smoke):
    """Types with fewer than k distinct users report their EXACT count;
    estimated types land within the standard ~1/sqrt(k) band."""
    ev = _events(spark, sf_smoke)
    store = tempfile.mkdtemp(prefix="kmv_t_") + "/s"
    _build(spark, ev, store, compact_at=1)
    est = {r["event_type"]: r for r in serve_kmv_estimates(spark, store).collect()}
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    exact["__all__"] = ev.select("user_id").distinct().count()
    assert set(est) == set(exact)
    for et, n in exact.items():
        row = est[et]
        if row["sketch_size"] < _KMV_K:
            assert row["kmv_users"] == float(n), et
        else:
            assert abs(row["kmv_users"] - n) / n < 0.5, (et, row["kmv_users"], n)


def test_uncommitted_partial_is_invisible(spark, sf_smoke):
    """Crash window: a partial directory written without the marker
    advancing (process died mid-ingest) must not change reads — the
    committed-batch filter is what makes the overwrite-on-replay
    protocol exactly-once."""
    ev = _events(spark, sf_smoke)
    store = tempfile.mkdtemp(prefix="kmv_t_") + "/s"
    _build(spark, ev, store)
    before = _sk(accumulated_sketch(spark, store))
    _topk(kmv_hashes(ev.limit(500).select("event_type", "user_id"),
                     "user_id", ["event_type"]), _KMV_K).write.mode(
        "overwrite"
    ).parquet(store + "/sk/batch=7")
    assert _sk(accumulated_sketch(spark, store)) == before


def test_empty_store_serve_raises_value_error(spark):
    """serve_kmv_estimates on an uncommitted store raises the explicit
    empty-store error (the ann/kll pattern), not an AttributeError."""
    import tempfile

    import pytest

    from heatmap_spark.streaming.kmv import serve_kmv_estimates

    store = tempfile.mkdtemp(prefix="kmv_empty_") + "/s"
    with pytest.raises(ValueError, match="no committed batches"):
        serve_kmv_estimates(spark, store)
