"""Streaming drift store: sum-merge identity, replay idempotence,
compaction transparency, and bit-identical served statistics."""

import tempfile

from pyspark.sql import functions as F

from heatmap_spark.operators.profiling import (
    drift_value_table,
    ks_test,
    mann_whitney,
    wasserstein_drift,
)
from heatmap_spark.sources.tables import load_table
from heatmap_spark.streaming.drift import (
    accumulated_value_table,
    compact_drift_store,
    merge_batch_into_drift_store,
    serve_drift_ks,
    serve_drift_mwu,
    serve_drift_w1,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _labeled(spark, sf_smoke):
    ev = load_table(spark, sf_smoke, "events").select(
        "event_type", "ts", "value", "event_id"
    )
    split = ev.agg(F.expr("percentile(unix_timestamp(ts), 0.5)")).first()[0]
    return ev.select(
        "event_type",
        F.when(F.unix_timestamp("ts") <= F.lit(split), F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_a"),
        "value",
        "event_id",
    )


def _build(spark, labeled, store, compact_at=None):
    mx = labeled.agg(F.max("event_id")).first()[0] + 1
    for b in range(3):
        batch = labeled.where(
            F.expr(f"CAST(event_id * 3 DIV {mx} AS INT)") == b
        ).select("event_type", "is_a", "value")
        merge_batch_into_drift_store(spark, batch, store, b)
        if compact_at == b:
            compact_drift_store(spark, store)


def test_accumulated_equals_one_shot_value_table(spark, sf_smoke):
    labeled = _labeled(spark, sf_smoke)
    store = tempfile.mkdtemp(prefix="drift_t_") + "/s"
    _build(spark, labeled, store, compact_at=1)
    assert _rows(accumulated_value_table(spark, store)) == _rows(
        drift_value_table(spark, sf_smoke)
    )
    compact_drift_store(spark, store)  # full fold, read unchanged
    assert _rows(accumulated_value_table(spark, store)) == _rows(
        drift_value_table(spark, sf_smoke)
    )


def test_served_statistics_bit_identical(spark, sf_smoke):
    labeled = _labeled(spark, sf_smoke)
    store = tempfile.mkdtemp(prefix="drift_t_") + "/s"
    _build(spark, labeled, store, compact_at=1)
    assert _rows(serve_drift_ks(spark, store)) == _rows(
        ks_test(spark, sf_smoke)
    )
    assert _rows(serve_drift_mwu(spark, store)) == _rows(
        mann_whitney(spark, sf_smoke)
    )
    assert _rows(serve_drift_w1(spark, store)) == _rows(
        wasserstein_drift(spark, sf_smoke)
    )


def test_replayed_batch_is_noop(spark, sf_smoke):
    labeled = _labeled(spark, sf_smoke)
    store = tempfile.mkdtemp(prefix="drift_t_") + "/s"
    _build(spark, labeled, store)
    before = _rows(accumulated_value_table(spark, store))
    replay = labeled.limit(200).select("event_type", "is_a", "value")
    assert merge_batch_into_drift_store(spark, replay, store, 2) is False
    assert _rows(accumulated_value_table(spark, store)) == before


def test_uncommitted_partial_is_invisible(spark, sf_smoke):
    """Crash window: a value-table partial written without the marker
    advancing must not change reads or the served statistics."""
    labeled = _labeled(spark, sf_smoke)
    store = tempfile.mkdtemp(prefix="drift_t_") + "/s"
    _build(spark, labeled, store)
    before = _rows(serve_drift_ks(spark, store))
    labeled.limit(500).groupBy("event_type", "value").agg(
        F.sum("is_a").alias("da"),
        F.sum(F.lit(1) - F.col("is_a")).alias("db"),
    ).write.mode("overwrite").parquet(store + "/vals/batch=9")
    assert _rows(serve_drift_ks(spark, store)) == before


def test_empty_store_serve_raises_value_error(spark):
    """Serve paths on an uncommitted store raise the explicit
    empty-store error (the ann/kll pattern), not an AttributeError on
    None."""
    import tempfile

    import pytest

    from heatmap_spark.streaming.drift import (
        serve_drift_ks,
        serve_drift_mwu,
        serve_drift_w1,
    )

    store = tempfile.mkdtemp(prefix="drift_empty_") + "/s"
    for serve in (serve_drift_ks, serve_drift_mwu, serve_drift_w1):
        with pytest.raises(ValueError, match="no committed batches"):
            serve(spark, store)
