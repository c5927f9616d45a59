"""Python-DataSource row store: roundtrip fidelity, manifest commit
protocol (append/overwrite versioning), reader-level bucket pruning,
and the manifest-version stream feed."""

import json
import os

from pyspark.sql import functions as F

from heatmap_spark.sources.locations import load_locations
from heatmap_spark.sources.rowstore import (
    _bucket_of,
    make_rowstore_datasource,
    read_manifest,
    read_rowstore,
    stream_rowstore,
    write_rowstore,
)


def _loc(spark, sf_dir):
    return load_locations(spark, sf_dir)


def test_roundtrip_exact(spark, sf_smoke, tmp_path):
    """write → commit → scan is lossless for every column type in the
    locations surface (double, timestamp, bigint, string)."""
    store = str(tmp_path / "locations")
    loc = _loc(spark, sf_smoke)
    write_rowstore(loc, store, bucket_key="user_id", mode="overwrite")
    back = read_rowstore(spark, store)
    assert back.schema == loc.schema
    assert back.count() == loc.count()
    assert loc.exceptAll(back).isEmpty() and back.exceptAll(loc).isEmpty()


def test_append_and_overwrite_versions(spark, sf_smoke, tmp_path):
    store = str(tmp_path / "locations")
    loc = _loc(spark, sf_smoke)
    halves = [loc.where(F.expr("mod(timestamp_ms, 2)") == i) for i in (0, 1)]
    write_rowstore(halves[0], store, bucket_key="user_id", mode="overwrite")
    assert read_manifest(store)["version"] == 1
    write_rowstore(halves[1], store, mode="append")  # layout inherited
    man = read_manifest(store)
    assert man["version"] == 2
    assert read_rowstore(spark, store).count() == loc.count()
    # overwrite resets the manifest (old files become unreferenced orphans)
    write_rowstore(halves[0], store, bucket_key="user_id", mode="overwrite")
    man = read_manifest(store)
    assert man["version"] == 1
    assert read_rowstore(spark, store).count() == halves[0].count()
    # manifest entries carry bucket + stats for pruning
    for e in man["files"]:
        assert e["v"] == 1 and e["n_rows"] > 0 and e["min"] <= e["max"]


def test_reader_level_bucket_pruning(spark, sf_smoke, tmp_path):
    """An EqualTo on the bucket key must shrink partitions() to the
    single matching bucket — the keyed-point-read scale contract."""
    from pyspark.sql.datasource import EqualTo

    store = str(tmp_path / "locations")
    write_rowstore(
        _loc(spark, sf_smoke), store, bucket_key="user_id",
        n_buckets=16, mode="overwrite",
    )
    cls = make_rowstore_datasource()
    ds = cls(options={"path": store})
    full = ds.reader(ds.schema())
    n_all = len(full.partitions())
    assert n_all > 1  # multiple buckets actually populated
    pruned = ds.reader(ds.schema())
    unhandled = list(pruned.pushFilters([EqualTo(("user_id",), "u1")]))
    assert len(unhandled) == 1  # pruning only — Spark re-applies
    parts = pruned.partitions()
    assert len(parts) == 1
    # and the surviving bucket is crc32('u1') % 16
    b = _bucket_of("u1", 16)
    assert all(f"/b{b}-" in fn for fn in parts[0].files)


def test_pruned_read_correct_rows(spark, sf_smoke, tmp_path):
    """With pushdown enabled (register_rowstore sets it) the pruned
    scan returns exactly the predicate's rows."""
    store = str(tmp_path / "locations")
    loc = _loc(spark, sf_smoke)
    write_rowstore(loc, store, bucket_key="user_id", mode="overwrite")
    got = read_rowstore(spark, store).where(F.col("user_id") == "u1")
    want = loc.where(F.col("user_id") == "u1")
    assert got.count() == want.count() > 0
    assert want.exceptAll(got).isEmpty()


def test_stream_is_incremental(spark, sf_smoke, tmp_path):
    """The stream feed drains commit deltas exactly once: drain after
    commit 1, append commit 2, drain again — the sink holds each row
    exactly once and equals the full relation."""
    store = str(tmp_path / "locations")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    loc = _loc(spark, sf_smoke)
    halves = [loc.where(F.expr("mod(timestamp_ms, 2)") == i) for i in (0, 1)]

    def drain():
        q = (
            stream_rowstore(spark, store)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout=300)

    write_rowstore(halves[0], store, bucket_key="user_id", mode="overwrite")
    drain()
    assert spark.read.parquet(out).count() == halves[0].count()
    write_rowstore(halves[1], store, mode="append")
    drain()
    got = spark.read.parquet(out)
    assert got.count() == loc.count()
    assert loc.exceptAll(got).isEmpty()


def test_first_write_requires_bucket_key(spark, sf_smoke, tmp_path):
    import pytest

    with pytest.raises(Exception, match="bucket_key"):
        write_rowstore(
            _loc(spark, sf_smoke), str(tmp_path / "x"), mode="overwrite"
        )


def test_uncommitted_files_invisible(spark, sf_smoke, tmp_path):
    """Readers list files from the manifest only: a stray data file
    (simulated crashed task) must not surface rows."""
    store = str(tmp_path / "locations")
    loc = _loc(spark, sf_smoke)
    write_rowstore(loc, store, bucket_key="user_id", mode="overwrite")
    n = read_rowstore(spark, store).count()
    # copy an existing committed file to an orphan name
    man = read_manifest(store)
    src = os.path.join(store, man["files"][0]["name"])
    with open(src, "rb") as fh:
        blob = fh.read()
    with open(os.path.join(store, "data", "b0-orphan.arrow"), "wb") as fh:
        fh.write(blob)
    assert read_rowstore(spark, store).count() == n
