"""Streaming tile store: multi-batch merge == batch pyramid; replay guard."""

from pyspark.sql import functions as F

from heatmap_spark.operators.pyramid import build_pyramid
from heatmap_spark.sources.locations import load_locations
from heatmap_spark.streaming.tile_store import (
    _read_marker,
    merge_delta_into_store,
    read_tile_store,
    stream_pyramid_to_store,
)

ZOOMS = dict(min_zoom=8, max_zoom=12)


def test_streamed_store_equals_batch_pyramid(spark, sf_smoke, tmp_path):
    src = str(tmp_path / "in")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    loc = load_locations(spark, sf_smoke)
    loc.repartition(3).write.parquet(src)

    stream = (
        spark.readStream.schema(loc.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = stream_pyramid_to_store(stream, store, ckpt, **ZOOMS)
    q.awaitTermination(timeout=300)

    version, last_batch = _read_marker(store)
    assert last_batch >= 2, "expected one merge per input file"
    assert version == last_batch

    got = read_tile_store(spark, store)
    want = build_pyramid(spark.read.parquet(src), mode="explode", **ZOOMS)
    # visits are sums of 1.0 weights — integer-valued doubles, exact
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()


def test_replayed_batch_is_skipped(spark, sf_smoke, tmp_path):
    store = str(tmp_path / "store")
    delta = build_pyramid(load_locations(spark, sf_smoke), mode="explode", **ZOOMS)
    assert merge_delta_into_store(spark, delta, store, batch_id=0)
    v1 = _read_marker(store)
    total1 = read_tile_store(spark, store).agg(F.sum("visits")).first()[0]
    # crash-replay of the same micro-batch: must be a no-op
    assert not merge_delta_into_store(spark, delta, store, batch_id=0)
    assert _read_marker(store) == v1
    assert read_tile_store(spark, store).agg(F.sum("visits")).first()[0] == total1
    # the next batch does merge, doubling every tile's count
    assert merge_delta_into_store(spark, delta, store, batch_id=1)
    total2 = read_tile_store(spark, store).agg(F.sum("visits")).first()[0]
    assert total2 == 2 * total1
