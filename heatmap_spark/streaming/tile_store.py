"""Streaming pyramid maintenance into a persistent parquet tile store.

The missing production write path: the reference recomputes the whole
pyramid per run and upserts rows into Cassandra (reference
heatmap.py:128-137,156-157).  Here the same outcome is incremental —
each micro-batch of locations becomes a DELTA pyramid, merged into the
stored base with :func:`heatmap_spark.operators.pyramid.pyramid_merge`
(sum is reassociative, so merge = union + re-aggregate), and the new
base is written Z-ordered so bbox reads over the store prune row
groups (operators/layout.py).

Storage is versioned directories + a ``_LATEST`` marker, swapped only
after the new version's write succeeds — readers never observe a
partial version.  On a real deployment this versioning is what an ACID
table format (Delta/Iceberg/Hudi) provides; the merge/layout logic
here is format-agnostic and would move over unchanged.

Exactly-once: the marker records (version, last merged batch_id).  A
micro-batch replayed after a crash (checkpoint not yet committed but
marker already swapped) is detected by ``batch_id <= last`` and
skipped, so a delta is never merged twice; a crash BEFORE the swap
leaves an orphan version dir the next write simply overwrites.

Scale shape per batch: the delta shuffles only the micro-batch's
aggregates, the merge shuffles (base ∪ delta) AGGREGATE rows — never
raw event history — and the base row count is bounded by the live tile
set, so steady-state cost is O(batch + live tiles), independent of
total history (the property that matters at 100 TB/day).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from heatmap_spark.operators.layout import cluster_by_zorder
from heatmap_spark.operators.pyramid import build_pyramid, pyramid_merge

_LATEST = "_LATEST"


def _read_marker(store_path: str) -> tuple[int, int]:
    """(version, last_batch_id), (-1, -1) if nothing committed."""
    marker = os.path.join(store_path, _LATEST)
    if not os.path.exists(marker):
        return -1, -1
    with open(marker, encoding="utf-8") as f:
        version, batch = f.read().strip().split(":")
    return int(version), int(batch)


def read_tile_store(spark: SparkSession, store_path: str) -> DataFrame | None:
    """Current pyramid in the store, or None if no version committed."""
    version, _ = _read_marker(store_path)
    if version < 0:
        return None
    return spark.read.parquet(os.path.join(store_path, f"v={version}"))


def merge_delta_into_store(
    spark: SparkSession, delta: DataFrame, store_path: str, batch_id: int = 0
) -> bool:
    """Merge one delta pyramid into the store: write a new Z-ordered
    version dir, then atomically swap the marker.  Returns False (no-op)
    if ``batch_id`` was already merged — the replay guard."""
    version, last_batch = _read_marker(store_path)
    if batch_id <= last_batch:
        return False
    base = read_tile_store(spark, store_path)
    merged = delta if base is None else pyramid_merge(base, delta)
    nxt = version + 1
    out = cluster_by_zorder(
        merged, num_partitions=max(2, spark.sparkContext.defaultParallelism // 4)
    )
    out.write.mode("overwrite").parquet(os.path.join(store_path, f"v={nxt}"))
    marker = os.path.join(store_path, _LATEST)
    tmp = marker + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(f"{nxt}:{batch_id}")
    os.replace(tmp, marker)  # atomic on POSIX — readers see old or new
    return True


def stream_pyramid_to_store(
    locations: DataFrame,
    store_path: str,
    checkpoint_path: str,
    min_zoom: int = 6,
    max_zoom: int = 21,
):
    """Maintain the tile store from a locations stream via foreachBatch.

    Returns the started StreamingQuery (availableNow trigger drains all
    pending input then stops — call ``.awaitTermination()``).  Each
    micro-batch runs the BATCH pyramid build on the batch DataFrame and
    merges under the replay guard above.
    """
    spark = locations.sparkSession

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        delta = build_pyramid(batch_df, mode="explode", min_zoom=min_zoom, max_zoom=max_zoom)
        merge_delta_into_store(spark, delta, store_path, batch_id)

    return (
        locations.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
