"""Streaming drift store: the exact rank tests' incremental arm.

KS and Mann–Whitney both rank over the distinct-value table
(event_type, value, da, db) — per-half counts at each observed value
(operators/profiling.py drift_value_table).  That table is an
EXACTLY-mergeable summary: counts SUM across batches (commutative,
associative; replays are excluded by the shared marker protocol, and
compaction's sum-fold is the same operation).  So a monitoring
pipeline can ingest labeled events batch by batch, keep only the
value-table grain, and serve KS/MWU statistics that are BIT-IDENTICAL
to a one-shot computation over the full history — the streamed
queries (queries.py q_streaming_drift_ks / _mwu) share the batch
queries' DuckDB oracles verbatim, so the driver value-hash certifies
incremental maintenance of an exact order statistic.

Store layout on the shared log-structured protocol (passages.py):

* ``vals/batch=<id>``  — the batch's (event_type, value, da, db)
  partial, one row per distinct (type, value) IN THE BATCH.
* ``vals_base/v=<n>``  — compaction target (sum-folded).

At 100 TB: per-batch work is one hash aggregate over the batch (keys
spread across (type, value) — a hot type fans out), state is bounded
by distinct values seen, reads span (1 base + recent partials), and
the served statistic still sorts only the distinct-value table.

Unlike HLL/KMV this summary is EXACT, not an estimator — the trade is
state linear in distinct values rather than fixed-size, the right
half of the drift-monitoring design space when values are quantized
(sensor grids, price ticks, binned features).

Reference: none — SURVEY.md §2.8 streaming-store + profiling families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from heatmap_spark.operators.profiling import (
    ks_from_value_table,
    mwu_from_value_table,
    w1_from_value_table,
)
from heatmap_spark.streaming.passages import (
    _batch_id,
    _committed_batches,
    _parse_base_marker,
    _read_last_batch,
)
from heatmap_spark.streaming.tile_store import _Fs, _join

_LATEST = "_LATEST"


def _sum_fold(df: DataFrame) -> DataFrame:
    return df.groupBy("event_type", "value").agg(
        F.sum("da").alias("da"), F.sum("db").alias("db")
    )


def _vals_base(
    spark: SparkSession, store_path: str
) -> tuple[DataFrame | None, int, int]:
    fs = _Fs()
    marker = _join(store_path, "vals_base", _LATEST)
    if not fs.exists(marker):
        return None, -1, -1
    ver, folded = _parse_base_marker(fs.read_text(marker))
    return (
        spark.read.parquet(_join(store_path, "vals_base", f"v={ver}")),
        ver,
        folded,
    )


def merge_batch_into_drift_store(
    spark: SparkSession,
    labeled_batch: DataFrame,
    store_path: str,
    batch_id: int,
) -> bool:
    """Ingest one labeled micro-batch (event_type, is_a, value): write
    its distinct-value partial, then commit the marker.  ``is_a`` is
    the stream-half label (1 = reference window) — the caller owns the
    split policy, the store only maintains the counts.  Returns False
    (no-op) on replay of a committed batch."""
    if batch_id <= _read_last_batch(store_path):
        return False
    fs = _Fs(spark)
    partial = labeled_batch.groupBy("event_type", "value").agg(
        F.sum("is_a").alias("da"),
        F.sum(F.lit(1) - F.col("is_a")).alias("db"),
    )
    partial.write.mode("overwrite").parquet(
        _join(store_path, "vals", f"batch={batch_id}")
    )
    fs.write_text_atomic(_join(store_path, _LATEST), str(batch_id))
    return True


def accumulated_value_table(
    spark: SparkSession, store_path: str
) -> DataFrame | None:
    """(event_type, value, da, db) sum-merged over compacted base +
    partials since its fold — equal to drift_value_table over the full
    ingested history by the sum-merge identity."""
    base, _, folded = _vals_base(spark, store_path)
    dirs = _committed_batches(store_path, "vals", min_batch=folded)
    parts = [spark.read.parquet(*dirs)] if dirs else []
    if base is not None:
        parts.append(base)
    if not parts:
        return None
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    return _sum_fold(allp)


def stream_drift(labeled_stream: DataFrame, store_path: str, checkpoint_path: str):
    """Maintain the value-table store from a labeled
    (event_type, is_a, value) stream via foreachBatch (availableNow
    trigger)."""
    spark = labeled_stream.sparkSession

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        merge_batch_into_drift_store(spark, batch_df, store_path, batch_id)

    return (
        labeled_stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def compact_drift_store(spark: SparkSession, store_path: str) -> int:
    """LSM compaction: sum-fold committed partials into a new base,
    folded-batch marker + pure-GC deletes."""
    fs = _Fs(spark)
    base, ver, folded = _vals_base(spark, store_path)
    partials = _committed_batches(store_path, "vals", min_batch=folded)
    if not partials:
        for p in _committed_batches(store_path, "vals"):
            if _batch_id(p) <= folded:
                fs.delete(p)
        return 0
    new_folded = max(_batch_id(p) for p in partials)
    allp = spark.read.parquet(*partials)
    if base is not None:
        allp = allp.unionByName(base)
    merged = _sum_fold(allp)
    merged.write.mode("overwrite").parquet(
        _join(store_path, "vals_base", f"v={ver + 1}")
    )
    fs.write_text_atomic(
        _join(store_path, "vals_base", _LATEST), f"{ver + 1}:{new_folded}"
    )
    removed = 0
    for p in _committed_batches(store_path, "vals"):
        if _batch_id(p) <= new_folded:
            fs.delete(p)
            removed += 1
    return removed


def _acc_or_raise(spark: SparkSession, store_path: str) -> DataFrame:
    """Serve-path accumulation with the explicit empty-store error the
    other stores raise (the ann/kll 'no committed' pattern) — otherwise
    an uncommitted store surfaces as an AttributeError on None."""
    acc = accumulated_value_table(spark, store_path)
    if acc is None:
        raise ValueError("drift store has no committed batches")
    return acc


def serve_drift_ks(spark: SparkSession, store_path: str) -> DataFrame:
    """Exact two-sample KS from the accumulated value table —
    bit-identical to the one-shot ks_test over the same history."""
    return ks_from_value_table(_acc_or_raise(spark, store_path))


def serve_drift_mwu(spark: SparkSession, store_path: str) -> DataFrame:
    """Exact tie-corrected Mann–Whitney U from the accumulated value
    table — bit-identical to the one-shot mann_whitney."""
    return mwu_from_value_table(_acc_or_raise(spark, store_path))


def serve_drift_w1(spark: SparkSession, store_path: str) -> DataFrame:
    """Exact-quantized 1-Wasserstein drift from the accumulated value
    table — bit-identical to the one-shot wasserstein_drift."""
    return w1_from_value_table(_acc_or_raise(spark, store_path))
