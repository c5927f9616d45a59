"""Streaming count-min sketch store: incremental frequency summaries.

CMS grids are MERGEABLE (cellwise sum), which makes the sketch the
textbook incremental frequency summary: each micro-batch contributes a
fixed-size (depth × width) partial, and the accumulated sketch is the
cellwise sum of base + partials — O(cells) per batch regardless of
batch or corpus size.  This store instantiates the repo's shared
log-structured protocol (passages.py: per-batch dirs, `_LATEST`
marker committed last so replays are no-ops, LSM compaction with a
folded-batch marker making partial deletes pure GC) for the sketch:

* ``cells/batch=<id>``  — the batch's (j, col, cnt) grid.
* ``cells_base/v=<n>``  — compaction target.

Estimates off the accumulated grid are EXACTLY the one-shot batch
sketch of the concatenated stream (the mergeability identity), so the
streaming query shares the batch query's DuckDB oracle verbatim —
the value hash certifies incremental maintenance end-to-end.

Reference: none — SURVEY.md §2.8 sketch + streaming-store families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from heatmap_spark.operators.profiling import cms_cells
from heatmap_spark.streaming.passages import (
    _batch_id,
    _committed_batches,
    _parse_base_marker,
    _read_last_batch,
)
from heatmap_spark.streaming.tile_store import _Fs, _join

_LATEST = "_LATEST"


def _cells_base(
    spark: SparkSession, store_path: str
) -> tuple[DataFrame | None, int, int]:
    fs = _Fs()
    marker = _join(store_path, "cells_base", _LATEST)
    if not fs.exists(marker):
        return None, -1, -1
    ver, folded = _parse_base_marker(fs.read_text(marker))
    return (
        spark.read.parquet(_join(store_path, "cells_base", f"v={ver}")),
        ver,
        folded,
    )


def accumulated_sketch(spark: SparkSession, store_path: str) -> DataFrame | None:
    """(j, col, cnt) summed over compacted base + partials since its
    fold — the cellwise-merge identity."""
    base, _, folded = _cells_base(spark, store_path)
    dirs = _committed_batches(store_path, "cells", min_batch=folded)
    parts = [spark.read.parquet(*dirs)] if dirs else []
    if base is not None:
        parts.append(base)
    if not parts:
        return None
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    return allp.groupBy("j", "col").agg(F.sum("cnt").cast("bigint").alias("cnt"))


def merge_batch_into_cms_store(
    spark: SparkSession, batch_docs: DataFrame, store_path: str, batch_id: int,
    depth: int = 4, width: int = 256,
) -> bool:
    """Ingest one (doc_id, text) micro-batch: write its fixed-size cell
    grid, then commit the marker.  Returns False (no-op) on replay of
    a committed batch."""
    if batch_id <= _read_last_batch(store_path):
        return False
    fs = _Fs(spark)
    from heatmap_spark.operators.textops import _all_tokens

    tok = batch_docs.select(F.explode(_all_tokens()).alias("token"))
    cms_cells(tok, depth, width).write.mode("overwrite").parquet(
        _join(store_path, "cells", f"batch={batch_id}")
    )
    fs.write_text_atomic(_join(store_path, _LATEST), str(batch_id))
    return True


def stream_cms(docs_stream: DataFrame, store_path: str, checkpoint_path: str):
    """Maintain the sketch store from a (doc_id, text) stream via
    foreachBatch (availableNow trigger)."""
    spark = docs_stream.sparkSession

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        merge_batch_into_cms_store(spark, batch_df, store_path, batch_id)

    return (
        docs_stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def compact_cms_store(spark: SparkSession, store_path: str) -> int:
    """LSM compaction: fold committed cell partials into a new base
    (cellwise sum), folded-batch marker + pure-GC deletes."""
    fs = _Fs(spark)
    base, ver, folded = _cells_base(spark, store_path)
    partials = _committed_batches(store_path, "cells", min_batch=folded)
    if not partials:
        for p in _committed_batches(store_path, "cells"):
            if _batch_id(p) <= folded:
                fs.delete(p)
        return 0
    new_folded = max(_batch_id(p) for p in partials)
    allp = spark.read.parquet(*partials)
    if base is not None:
        allp = allp.unionByName(base)
    merged = allp.groupBy("j", "col").agg(F.sum("cnt").cast("bigint").alias("cnt"))
    merged.write.mode("overwrite").parquet(
        _join(store_path, "cells_base", f"v={ver + 1}")
    )
    fs.write_text_atomic(
        _join(store_path, "cells_base", _LATEST), f"{ver + 1}:{new_folded}"
    )
    removed = 0
    for p in _committed_batches(store_path, "cells"):
        if _batch_id(p) <= new_folded:
            fs.delete(p)
            removed += 1
    return removed


def estimate_heavy_hitters(
    spark: SparkSession, store_path: str, candidates: DataFrame,
    depth: int = 4, width: int = 256,
) -> DataFrame:
    """Frequency estimates for a (token, true_cnt) candidate relation
    off the ACCUMULATED sketch: est = min_j cell[j][h_j(token)].

    The cell lookup is a LEFT join with a 0 fallback: the store only
    materializes cells at least one ingested token hashed into, so a
    candidate the corpus never saw lands on unmaterialized cells — its
    CMS estimate is 0 (the sketch's answer for a never-incremented
    counter), not a silently dropped row.  An inner join here would
    also drop a seen token whose OTHER rows all collide, inflating
    min_j over the surviving subset."""
    cells = accumulated_sketch(spark, store_path)
    if cells is None:
        raise ValueError("CMS store has no committed batches")
    ch = F.md5(F.col("token"))
    rows_j = F.explode(F.array(*[F.lit(j) for j in range(depth)])).alias("j")
    cand = candidates.select(
        "token",
        "true_cnt",
        F.conv(F.substring(ch, 1, 12), 16, 10).cast("bigint").alias("h1"),
        F.conv(F.substring(ch, 13, 12), 16, 10).cast("bigint").alias("h2"),
    ).select("token", "true_cnt", rows_j, "h1", "h2")
    est = (
        cand.join(
            F.broadcast(cells),
            (cells["j"] == cand["j"])
            & (cells["col"] == (cand["h1"] + cand["j"] * cand["h2"]) % width),
            "left",
        )
        .groupBy("token", "true_cnt")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cms_est"))
    )
    return est.select(
        "token",
        F.col("true_cnt").cast("bigint").alias("true_cnt"),
        F.col("cms_est").cast("bigint").alias("cms_est"),
        (F.col("cms_est") - F.col("true_cnt")).cast("bigint").alias("overestimate"),
    )
