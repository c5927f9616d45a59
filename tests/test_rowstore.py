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
    # names and types round-trip exactly; nullability is all-TRUE by
    # store policy (files are written all-nullable, and schema
    # evolution null-fills — a non-nullable declared field would let
    # codegen read a null slot as a raw value)
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in loc.schema.fields
    ]
    assert all(f.nullable for f in back.schema.fields)
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
    # force per-file splits (no packing) so partition counts expose
    # the pruning; default packing is covered by the probe/roundtrips
    ds = cls(options={"path": store, "max_partition_bytes": "1",
                      "open_cost_bytes": "0"})
    full = ds.reader(ds.schema())
    n_all = len(full.partitions())
    assert n_all > 1  # multiple buckets actually populated
    pruned = ds.reader(ds.schema())
    unhandled = list(pruned.pushFilters([EqualTo(("user_id",), "u1")]))
    assert len(unhandled) == 1  # pruning only — Spark re-applies
    parts = pruned.partitions()
    # per-FILE partitions: only the key's bucket survives, so the
    # partition count equals that bucket's file count — strictly fewer
    # than the unpruned scan's
    assert 0 < len(parts) < n_all
    b = _bucket_of("u1", 16)
    assert all(f"/b{b}-" in fn for p in parts for fn in p.files)


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


def test_stream_sink_epoch_idempotent(spark, sf_smoke, tmp_path):
    """writeStream into the store: a replayed epoch (same batchId
    committed twice — the crash-between-sink-commit-and-checkpoint
    window) must discard its rewrite, not double-append."""
    store = str(tmp_path / "locations")
    loc = _loc(spark, sf_smoke)
    cls = make_rowstore_datasource()
    ds = cls(options={"path": store, "bucket_key": "user_id"})
    import pyarrow as pa

    w = ds.streamWriter(loc.schema, False)
    tbl = pa.Table.from_pandas(loc.toPandas())
    # pandas hands Arrow ns timestamps; Spark's Arrow reader takes us
    # (the real writeStream path produces us natively)
    tbl = tbl.cast(
        pa.schema(
            [
                pa.field(f.name, pa.timestamp("us"))
                if pa.types.is_timestamp(f.type)
                else f
                for f in tbl.schema
            ]
        )
    )
    batches = tbl.to_batches()

    msg = w.write(iter(batches))
    w.commit([msg], 0)
    n1 = read_rowstore(spark, store).count()
    man1 = read_manifest(store)
    # replay epoch 0: tasks rewrite, commit must no-op + GC the rewrite
    msg2 = w.write(iter(batches))
    w.commit([msg2], 0)
    assert read_rowstore(spark, store).count() == n1
    man2 = read_manifest(store)
    assert man2["version"] == man1["version"] == 1
    assert man2["epochs"] == [0]
    assert len(man2["files"]) == len(man1["files"])
    # the replayed task files were deleted, not orphaned
    for _, name, *_rest in msg2.entries:
        assert not os.path.exists(os.path.join(store, name))
    # a NEW epoch appends normally
    msg3 = w.write(iter(batches))
    w.commit([msg3], 1)
    assert read_rowstore(spark, store).count() == 2 * n1
    assert read_manifest(store)["epochs"] == [0, 1]


def test_stream_sink_end_to_end(spark, sf_smoke, tmp_path):
    """readStream(parquet) → writeStream(heatmap_rowstore) →
    batch read equals the source relation."""
    from heatmap_spark.sources.rowstore import stream_write_rowstore

    loc = _loc(spark, sf_smoke)
    src, store = str(tmp_path / "src"), str(tmp_path / "locations")
    loc.repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema(loc.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = stream_write_rowstore(stream, store, str(tmp_path / "ckpt"),
                              bucket_key="user_id")
    q.awaitTermination(timeout=300)
    got = read_rowstore(spark, store)
    assert got.count() == loc.count()
    assert loc.exceptAll(got).isEmpty()
    # multiple epochs actually committed (3 source files)
    assert len(read_manifest(store)["epochs"]) >= 1


def test_compact_and_vacuum(spark, sf_smoke, tmp_path):
    """Three appends fragment the store; compaction rewrites it through
    the engine (rows identical, fewer files, version monotonic, epoch
    guard preserved) and vacuum reclaims the unreferenced files."""
    from heatmap_spark.sources.rowstore import compact_rowstore, vacuum_rowstore

    store = str(tmp_path / "locations")
    loc = _loc(spark, sf_smoke)
    thirds = [loc.where(F.expr("mod(timestamp_ms, 3)") == i) for i in range(3)]
    write_rowstore(thirds[0], store, bucket_key="user_id", mode="overwrite")
    write_rowstore(thirds[1], store, mode="append")
    write_rowstore(thirds[2], store, mode="append")
    man = read_manifest(store)
    n_files_before = len(man["files"])
    v_before = man["version"]
    assert v_before == 3
    n_rows = loc.count()

    compacted = compact_rowstore(spark, store)
    assert compacted > 0
    man2 = read_manifest(store)
    assert len(man2["files"]) < n_files_before
    assert man2["version"] == v_before + 1
    back = read_rowstore(spark, store)
    assert back.count() == n_rows
    assert loc.exceptAll(back).isEmpty()

    # old files are now unreferenced on disk; vacuum removes them and
    # reads are unaffected
    removed = vacuum_rowstore(store)
    assert removed >= compacted
    assert read_rowstore(spark, store).count() == n_rows
    # vacuum is idempotent
    assert vacuum_rowstore(store) == 0


def test_reader_in_and_range_pruning(spark, sf_smoke, tmp_path):
    """In-filters prune to the union of the keys' buckets; range
    predicates prune files via the manifest's min/max stats (store
    bucketed by doc_id, whose per-file stats are disjoint ranges after
    a sorted write)."""
    from pyspark.sql.datasource import EqualTo, GreaterThan, In

    from heatmap_spark.sources.tables import load_table

    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    store = str(tmp_path / "docs")
    # one file per bucket with tight doc_id ranges: sort + single task
    write_rowstore(
        docs.orderBy("doc_id").coalesce(1), store,
        bucket_key="doc_id", n_buckets=8, mode="overwrite",
    )
    cls = make_rowstore_datasource()
    ds = cls(options={"path": store, "max_partition_bytes": "1",
                      "open_cost_bytes": "0"})
    n_all = len(ds.reader(ds.schema()).partitions())

    rd_in = ds.reader(ds.schema())
    rd_in.pushFilters([In(("doc_id",), (1, 2, 3))])
    keep = {_bucket_of(k, 8) for k in (1, 2, 3)}
    parts = rd_in.partitions()
    assert 0 < len(parts) <= len(keep) < n_all

    # range pruning: every file whose max <= threshold is skipped
    man = read_manifest(store)
    hi = max(e["max"] for e in man["files"])
    rd_gt = ds.reader(ds.schema())
    rd_gt.pushFilters([GreaterThan(("doc_id",), hi)])  # nothing above max
    assert all(not p.files for p in rd_gt.partitions())
    # equality outside every [min,max] prunes all files too
    rd_eq = ds.reader(ds.schema())
    rd_eq.pushFilters([EqualTo(("doc_id",), hi + 10**6)])
    assert all(not p.files for p in rd_eq.partitions())
    # and correctness end-to-end (Spark re-applies the predicate)
    got = read_rowstore(spark, store).where(F.col("doc_id").isin(1, 2, 3))
    assert got.count() == 3


def test_time_travel_snapshots_and_history(spark, sf_smoke, tmp_path):
    """as-of reads return exactly the rows committed by <= that
    version; the history log tallies per-version adds; pruning still
    composes with the as-of filter."""
    from pyspark.sql import functions as F

    from heatmap_spark.sources.locations import load_locations
    from heatmap_spark.sources.rowstore import (
        read_rowstore,
        rowstore_history,
        write_rowstore,
    )

    store = str(tmp_path / "tt")
    loc = load_locations(spark, sf_smoke)
    half = F.substring(F.md5("user_id"), 1, 1) <= "7"
    a, b = loc.where(half), loc.where(~half)
    write_rowstore(a, store, bucket_key="user_id", mode="overwrite")
    write_rowstore(b, store, bucket_key="user_id", mode="append")

    na, nb = a.count(), b.count()
    assert read_rowstore(spark, store, as_of_version=1).count() == na
    assert read_rowstore(spark, store, as_of_version=2).count() == na + nb
    assert read_rowstore(spark, store).count() == na + nb

    hist = rowstore_history(store)
    assert [h["version"] for h in hist] == [1, 2]
    assert hist[0]["n_rows_added"] == na
    assert hist[1]["n_rows_added"] == nb
    assert hist[-1]["cum_rows"] == na + nb

    # snapshot content equality, not just counts
    got = read_rowstore(spark, store, as_of_version=1)
    assert got.exceptAll(a).count() == 0 and a.exceptAll(got).count() == 0

    # keyed pruning composes with as-of
    one = read_rowstore(spark, store, as_of_version=1).where(
        F.col("user_id") == "u1"
    )
    direct = a.where(F.col("user_id") == "u1")
    assert one.count() == direct.count()


def test_merge_upsert_bucket_rewrite(spark, sf_smoke, tmp_path):
    """MERGE semantics: updated keys' rows are replaced, unmatched
    keys survive, brand-new keys insert; untouched buckets keep their
    ORIGINAL files (no rewrite); time travel to the pre-merge version
    still sees the old values."""
    from pyspark.sql import functions as F

    from heatmap_spark.sources.locations import load_locations
    from heatmap_spark.sources.rowstore import (
        merge_upsert_rowstore,
        read_manifest,
        read_rowstore,
        write_rowstore,
    )

    store = str(tmp_path / "m")
    loc = load_locations(spark, sf_smoke)
    write_rowstore(loc, store, bucket_key="user_id", mode="overwrite")
    files_before = {e["name"]: e for e in read_manifest(store)["files"]}

    sel = F.substring(F.md5("user_id"), 1, 1) <= "3"
    updates = loc.where(sel).withColumn("weight", F.col("weight") * 2)
    # plus a brand-new key (insert arm)
    new_row = loc.limit(1).withColumn("user_id", F.lit("brand_new_user"))
    merge_upsert_rowstore(spark, updates.unionByName(new_row), store)

    after = read_rowstore(spark, store)
    assert after.count() == loc.count() + 1
    assert after.where(F.col("user_id") == "brand_new_user").count() == 1
    want = loc.withColumn(
        "weight", F.when(sel, F.col("weight") * 2).otherwise(F.col("weight"))
    )
    got_sum = after.where(F.col("user_id") != "brand_new_user").agg(
        F.sum("weight")
    ).first()[0]
    assert abs(got_sum - want.agg(F.sum("weight")).first()[0]) < 1e-9

    man = read_manifest(store)
    live = [e for e in man["files"] if "rm" not in e]
    removed = [e for e in man["files"] if "rm" in e]
    assert removed, "merge must soft-delete replaced files"
    touched_buckets = {e["bucket"] for e in removed}
    # untouched buckets keep their original file entries live
    for name, e in files_before.items():
        if e["bucket"] not in touched_buckets:
            assert any(l["name"] == name for l in live)
    # time travel: pre-merge snapshot has the original weights
    v1 = read_rowstore(spark, store, as_of_version=1)
    assert v1.count() == loc.count()
    assert abs(
        v1.agg(F.sum("weight")).first()[0] - loc.agg(F.sum("weight")).first()[0]
    ) < 1e-9


def test_vacuum_rowstore_drops_replaced_and_orphans(spark, sf_smoke, tmp_path):
    """Vacuum removes rm'd files past the retention window and orphan
    task files, never live ones; the current snapshot is unchanged;
    explicit bucket routing prunes the merge read at file level."""
    import os

    from pyspark.sql import functions as F

    from heatmap_spark.sources.locations import load_locations
    from heatmap_spark.sources.rowstore import (
        merge_upsert_rowstore,
        read_manifest,
        read_rowstore,
        vacuum_rowstore,
        write_rowstore,
    )

    store = str(tmp_path / "v")
    loc = load_locations(spark, sf_smoke)
    write_rowstore(loc, store, bucket_key="user_id", mode="overwrite")
    updates = loc.where(F.substring(F.md5("user_id"), 1, 1) <= "3").withColumn(
        "weight", F.col("weight") * 2
    )
    merge_upsert_rowstore(spark, updates, store)
    before = read_rowstore(spark, store)
    n_before = before.count()
    want_sum = before.agg(F.sum("weight")).first()[0]

    # plant an orphan (crashed write)
    orphan = os.path.join(store, "data", "b0-deadbeef.arrow")
    with open(orphan, "wb") as fh:
        fh.write(b"junk")

    removed = vacuum_rowstore(store, keep_versions=1)
    assert removed >= 1
    assert not os.path.exists(orphan)
    man = read_manifest(store)
    assert all("rm" not in e or e["rm"] > man["version"] - 1 for e in man["files"])
    for e in man["files"]:
        assert os.path.exists(os.path.join(store, e["name"]))

    after = read_rowstore(spark, store)
    assert after.count() == n_before
    assert abs(after.agg(F.sum("weight")).first()[0] - want_sum) < 1e-9

    # bucket routing returns exactly the touched buckets' rows
    n = man["n_buckets"]
    be = F.crc32(F.col("user_id").cast("string").cast("binary")) % n
    some = sorted(
        r[0] for r in after.select(be.alias("b")).distinct().limit(3).collect()
    )
    routed = read_rowstore(spark, store, buckets=some)
    assert routed.count() == after.where(be.isin(*some)).count()


def test_delete_from_rowstore_erasure(spark, sf_smoke, tmp_path):
    """Deleted keys vanish from the current snapshot (all their rows),
    everything else survives byte-for-byte, the pre-delete snapshot
    still answers (auditable erasure), and vacuum then makes the
    physical bytes leave."""
    import os

    from pyspark.sql import functions as F

    from heatmap_spark.sources.locations import load_locations
    from heatmap_spark.sources.rowstore import (
        delete_from_rowstore,
        read_manifest,
        read_rowstore,
        vacuum_rowstore,
        write_rowstore,
    )

    store = str(tmp_path / "d")
    loc = load_locations(spark, sf_smoke)
    write_rowstore(loc, store, bucket_key="user_id", mode="overwrite")
    victims = loc.select("user_id").distinct().orderBy("user_id").limit(3)
    vic = {r["user_id"] for r in victims.collect()}

    delete_from_rowstore(spark, victims, store)
    # fresh read per action (see read_rowstore's USAGE NOTE: a
    # filtered action freezes its pruned scan on that DataFrame)
    assert (
        read_rowstore(spark, store).where(F.col("user_id").isin(*vic)).count()
        == 0
    )
    after_n = read_rowstore(spark, store).count()
    assert after_n == loc.where(~F.col("user_id").isin(*vic)).count()
    # pre-delete snapshot is intact until vacuum
    v1 = read_rowstore(spark, store, as_of_version=1)
    assert v1.where(F.col("user_id").isin(*vic)).count() > 0

    removed_files = [e["name"] for e in read_manifest(store)["files"] if "rm" in e]
    assert removed_files
    assert vacuum_rowstore(store, keep_versions=0) >= len(removed_files)
    for name in removed_files:
        assert not os.path.exists(os.path.join(store, name))
    # current snapshot unaffected by the vacuum
    assert read_rowstore(spark, store).count() == after_n


def test_push_filter_state_never_leaks_across_fresh_reads(spark, sf_smoke, tmp_path):
    """The reader resets pruning state per pushFilters call, and fresh
    read_rowstore calls are fully independent: filtered → unfiltered →
    differently-filtered all return their own correct results."""
    from pyspark.sql import functions as F

    from heatmap_spark.sources.locations import load_locations
    from heatmap_spark.sources.rowstore import read_rowstore, write_rowstore

    store = str(tmp_path / "leak")
    loc = load_locations(spark, sf_smoke)
    write_rowstore(loc, store, bucket_key="user_id", mode="overwrite")

    n_u1 = loc.where(F.col("user_id") == "u1").count()
    n_u2 = loc.where(F.col("user_id") == "u2").count()
    assert read_rowstore(spark, store).where(F.col("user_id") == "u1").count() == n_u1
    assert read_rowstore(spark, store).count() == loc.count()
    assert read_rowstore(spark, store).where(F.col("user_id") == "u2").count() == n_u2


def test_stream_fails_loudly_after_merge(spark, sf_smoke, tmp_path):
    """The CDC stream is an append-only contract: once a MERGE soft-
    deletes files ('rm' marks), a version-range replay would double-
    count rewritten rows — the reader must refuse, not silently emit."""
    import pytest

    from heatmap_spark.sources.rowstore import merge_upsert_rowstore

    store = str(tmp_path / "m")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    loc = _loc(spark, sf_smoke)
    write_rowstore(loc, store, bucket_key="user_id", mode="overwrite")
    updates = loc.where(F.substring(F.md5("user_id"), 1, 1) <= "3").withColumn(
        "weight", F.col("weight") * 2
    )
    merge_upsert_rowstore(spark, updates, store)

    q = (
        stream_rowstore(spark, store)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="append-only"):
        q.awaitTermination(timeout=300)


def test_cdc_prefix_replay_before_merge_stays_valid(spark, sf_smoke, tmp_path):
    """A checkpoint replay of a window ENTIRELY BEFORE the earliest
    MERGE commit is still a faithful pure-append change log — the CDC
    guard must allow it (a stream that committed batches pre-merge can
    resume and re-emit them), while any window overlapping the rewrite
    still refuses.  Vacuuming the 'rm' marks must preserve the
    boundary via the recorded earliest_rewrite version."""
    import pytest

    from heatmap_spark.sources.rowstore import (
        make_rowstore_datasource,
        merge_upsert_rowstore,
        vacuum_rowstore,
    )

    store = str(tmp_path / "m")
    loc = _loc(spark, sf_smoke)
    write_rowstore(loc, store, bucket_key="user_id", mode="overwrite")  # v1
    write_rowstore(
        loc.limit(5), store, bucket_key="user_id", mode="append"
    )  # v2
    updates = loc.limit(3).withColumn("weight", F.col("weight") * 2)
    merge_upsert_rowstore(spark, updates, store)  # v3 — the rewrite

    reader = make_rowstore_datasource()({"path": store}).simpleStreamReader(None)
    # windows entirely before v3: pure appends, replay allowed
    assert len(reader.readBetweenOffsets({"version": 0}, {"version": 1})) > 0
    assert len(reader.readBetweenOffsets({"version": 1}, {"version": 2})) > 0
    # any window reaching the rewrite still refuses
    with pytest.raises(ValueError, match="append-only"):
        reader.readBetweenOffsets({"version": 0}, {"version": 3})
    with pytest.raises(ValueError, match="append-only"):
        reader.readBetweenOffsets({"version": 2}, {"version": 3})

    # expiring the 'rm' marks keeps the same boundary, not a blanket ban
    vacuum_rowstore(store, keep_versions=0)
    assert not any("rm" in e for e in read_manifest(store)["files"])
    assert read_manifest(store)["earliest_rewrite"] == 3
    reader2 = make_rowstore_datasource()({"path": store}).simpleStreamReader(None)
    assert len(reader2.readBetweenOffsets({"version": 0}, {"version": 2})) > 0
    with pytest.raises(ValueError, match="append-only"):
        reader2.readBetweenOffsets({"version": 2}, {"version": 3})


def test_vacuum_cannot_rearm_cdc_stream(spark, sf_smoke, tmp_path):
    """vacuum_rowstore(keep_versions=...) deletes the 'rm' manifest
    entries the CDC guard inspects — the manifest must keep a durable
    tombstone so the stream still refuses after the marks are gone."""
    import pytest

    from heatmap_spark.sources.rowstore import (
        merge_upsert_rowstore,
        vacuum_rowstore,
    )

    store = str(tmp_path / "m")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    loc = _loc(spark, sf_smoke)
    write_rowstore(loc, store, bucket_key="user_id", mode="overwrite")
    updates = loc.where(F.substring(F.md5("user_id"), 1, 1) <= "3").withColumn(
        "weight", F.col("weight") * 2
    )
    merge_upsert_rowstore(spark, updates, store)
    vacuum_rowstore(store, keep_versions=0)
    assert not any("rm" in e for e in read_manifest(store)["files"])

    q = (
        stream_rowstore(spark, store)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="append-only"):
        q.awaitTermination(timeout=300)


def test_compact_optimize_poison_cdc_window_not_prefix(spark, sf_smoke, tmp_path):
    """compact_rowstore / optimize_rowstore rewrite every file through
    the overwrite path, which writes a FRESH manifest — without a
    carried tombstone a checkpointed CDC stream crossing the rewrite
    would silently replay the whole compacted store as new adds
    (double-count).  The rewrite must record itself as
    earliest_rewrite so the append-only guard fires, while windows
    entirely before it stay replayable; and a prior MERGE's earlier
    boundary must survive the rewrite (min, not overwrite)."""
    import pytest

    from heatmap_spark.sources.rowstore import (
        compact_rowstore,
        make_rowstore_datasource,
        merge_upsert_rowstore,
        optimize_rowstore,
    )

    loc = _loc(spark, sf_smoke)

    # -- compaction on a pure-append store: boundary == its own version
    store = str(tmp_path / "c")
    write_rowstore(loc, store, bucket_key="user_id", mode="overwrite")  # v1
    write_rowstore(loc.limit(5), store, mode="append")  # v2
    assert compact_rowstore(spark, store) >= 0  # v3 — the rewrite
    man = read_manifest(store)
    assert man["version"] == 3
    assert man["rewrites_expired"] is True
    assert man["earliest_rewrite"] == 3
    reader = make_rowstore_datasource()({"path": store}).simpleStreamReader(None)
    # a prefix window is ALLOWED (a restart re-acking sink-committed
    # batches must not die) but replays empty — the rewrite moved every
    # pre-rewrite file out of the manifest; the rows live in the v3
    # snapshot, which only read_rowstore (not the CDC log) can serve
    assert reader.readBetweenOffsets({"version": 0}, {"version": 2}) == []
    with pytest.raises(ValueError, match="append-only"):
        reader.readBetweenOffsets({"version": 0}, {"version": 3})
    with pytest.raises(ValueError, match="append-only"):
        reader.readBetweenOffsets({"version": 2}, {"version": 3})

    # -- optimize after a MERGE: the merge's earlier boundary survives
    store2 = str(tmp_path / "o")
    write_rowstore(loc, store2, bucket_key="user_id", mode="overwrite")  # v1
    write_rowstore(loc.limit(5), store2, mode="append")  # v2
    updates = loc.limit(3).withColumn("weight", F.col("weight") * 2)
    merge_upsert_rowstore(spark, updates, store2)  # v3 — first rewrite
    optimize_rowstore(spark, store2, by="weight")  # v4 — erases 'rm' marks
    man2 = read_manifest(store2)
    assert man2["version"] == 4
    assert not any("rm" in e for e in man2["files"])
    assert man2["earliest_rewrite"] == 3  # min(merge v3, optimize v4)
    reader2 = make_rowstore_datasource()({"path": store2}).simpleStreamReader(None)
    assert reader2.readBetweenOffsets({"version": 0}, {"version": 2}) == []
    with pytest.raises(ValueError, match="append-only"):
        reader2.readBetweenOffsets({"version": 0}, {"version": 4})
    with pytest.raises(ValueError, match="append-only"):
        reader2.readBetweenOffsets({"version": 3}, {"version": 4})


def test_schema_evolution_append_widens_and_null_fills(spark, tmp_path):
    """Additive evolution (Delta-style): an append may add new columns
    (store widens; OLD files null-fill at read) and omit existing
    nullable ones (null-filled at write); type changes and a missing
    bucket key refuse loudly; merges across the evolution boundary
    union by name."""
    import pytest

    from heatmap_spark.sources.rowstore import merge_upsert_rowstore

    store = str(tmp_path / "evo")
    base = spark.range(10).select(
        F.concat(F.lit("u"), F.col("id")).alias("user_id"),
        (F.col("id") * 2).alias("weight"),
    )
    write_rowstore(base, store, bucket_key="user_id", mode="overwrite")  # v1
    evolved = spark.range(10, 15).select(
        F.concat(F.lit("u"), F.col("id")).alias("user_id"),
        F.lit("web").alias("source"),  # new column; 'weight' omitted
    )
    write_rowstore(evolved, store, bucket_key="user_id", mode="append")  # v2

    out = read_rowstore(spark, store)
    assert [f.name for f in out.schema.fields] == ["user_id", "weight", "source"]
    rows = {r["user_id"]: (r["weight"], r["source"]) for r in out.collect()}
    assert len(rows) == 15
    assert rows["u3"] == (6, None)       # pre-evolution file, new col null
    assert rows["u12"] == (None, "web")  # omitted col null-filled at write

    # keyed pruning still works across old+new files
    one = read_rowstore(spark, store).where(F.col("user_id") == "u12")
    assert one.collect()[0]["source"] == "web"
    # time travel to the pre-evolution version reads (union schema)
    v1 = read_rowstore(spark, store, as_of_version=1)
    assert v1.count() == 10 and "source" in v1.columns
    assert v1.where(F.col("source").isNotNull()).count() == 0

    # manifest schema is the committed union, all nullable
    man = read_manifest(store)
    fields = json.loads(man["schema"])["fields"]
    assert [f["name"] for f in fields] == ["user_id", "weight", "source"]
    assert all(f["nullable"] for f in fields)

    # type change refuses
    with pytest.raises(Exception, match="additive only"):
        write_rowstore(
            spark.range(1).select(
                F.lit("u1").alias("user_id"), F.lit("x").alias("weight")
            ),
            store, bucket_key="user_id", mode="append",
        )
    # missing bucket key refuses
    with pytest.raises(Exception, match="bucket key"):
        write_rowstore(
            spark.range(1).select(F.lit(9).cast("bigint").alias("weight")),
            store, bucket_key="user_id", mode="append",
        )

    # MERGE across the evolution boundary: update one old row with the
    # widened schema; kept rows union by name
    upd = spark.range(1).select(
        F.lit("u3").alias("user_id"),
        F.lit(99).cast("bigint").alias("weight"),
        F.lit("crawl").alias("source"),
    )
    merge_upsert_rowstore(spark, upd, store)
    rows2 = {
        r["user_id"]: (r["weight"], r["source"])
        for r in read_rowstore(spark, store).collect()
    }
    assert rows2["u3"] == (99, "crawl") and len(rows2) == 15
    assert rows2["u4"] == (8, None)


def test_schema_evolution_stream_projects_to_start_schema(spark, tmp_path):
    """A CDC stream binds to the schema at stream start; commits that
    later widen the store replay projected onto the start-time columns
    (every micro-batch matches the declared schema)."""
    from heatmap_spark.sources.rowstore import make_rowstore_datasource

    store = str(tmp_path / "evostream")
    base = spark.range(4).select(
        F.concat(F.lit("u"), F.col("id")).alias("user_id"),
        (F.col("id") * 2).alias("weight"),
    )
    write_rowstore(base, store, bucket_key="user_id", mode="overwrite")  # v1
    reader = make_rowstore_datasource()({"path": store}).simpleStreamReader(None)
    evolved = spark.range(4, 6).select(
        F.concat(F.lit("u"), F.col("id")).alias("user_id"),
        (F.col("id") * 2).alias("weight"),
        F.lit("web").alias("source"),
    )
    write_rowstore(evolved, store, bucket_key="user_id", mode="append")  # v2
    rows = reader.readBetweenOffsets({"version": 1}, {"version": 2})
    # projected to the start-time 2-column schema, post-evolution rows
    assert sorted(rows) == [("u4", 8), ("u5", 10)]


def test_inclusive_range_pruning_keeps_boundary_files(spark, tmp_path):
    """REGRESSION: >= / <= filters whose value equals a file's max/min
    must NOT prune that file — the boundary row matches the inclusive
    predicate, and pruning it is silent row loss (observed before the
    fix: user_id >= 'k4' dropped 'k4' when a file's max was 'k4')."""
    store = str(tmp_path / "b")
    df1 = spark.range(0, 5).select(F.concat(F.lit("k"), F.col("id")).alias("user_id"))
    df2 = spark.range(5, 9).select(F.concat(F.lit("k"), F.col("id")).alias("user_id"))
    write_rowstore(df1.coalesce(1), store, bucket_key="user_id", n_buckets=1, mode="overwrite")
    write_rowstore(df2.coalesce(1), store, bucket_key="user_id", n_buckets=1, mode="append")
    # file 1 max == 'k4', file 2 min == 'k5' — probe all four boundaries
    got = sorted(r[0] for r in read_rowstore(spark, store).where(F.col("user_id") >= "k4").collect())
    assert got == ["k4", "k5", "k6", "k7", "k8"], got
    got = sorted(r[0] for r in read_rowstore(spark, store).where(F.col("user_id") <= "k5").collect())
    assert got == ["k0", "k1", "k2", "k3", "k4", "k5"], got
    # strict bounds still exclude the boundary row but lose nothing else
    got = sorted(r[0] for r in read_rowstore(spark, store).where(F.col("user_id") > "k4").collect())
    assert got == ["k5", "k6", "k7", "k8"], got
    got = sorted(r[0] for r in read_rowstore(spark, store).where(F.col("user_id") < "k5").collect())
    assert got == ["k0", "k1", "k2", "k3", "k4"], got


def test_column_stats_data_skipping_and_optimize(spark, tmp_path):
    """Per-file min/max stats for every orderable column (Delta-style
    data skipping): a range predicate on a NON-key column prunes files
    whose stats exclude it — selective only after optimize_rowstore
    clusters the layout by that column — and pruning never changes
    results."""
    from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual

    from heatmap_spark.sources.rowstore import optimize_rowstore

    store = str(tmp_path / "s")
    df = spark.range(20000).select(
        F.concat(F.lit("u"), (F.col("id") % 97)).alias("user_id"),
        (F.col("id") % 500).alias("weight"),
    )
    write_rowstore(
        df.repartition(8), store, bucket_key="user_id", n_buckets=4,
        mode="overwrite",
    )
    man = read_manifest(store)
    assert all(set(e["stats"]) == {"user_id", "weight"} for e in man["files"])
    for e in man["files"]:
        assert e["stats"]["weight"][0] <= e["stats"]["weight"][1]

    cls = make_rowstore_datasource()

    def nparts(filters):
        ds = cls(options={"path": store, "max_partition_bytes": "1",
                          "open_cost_bytes": "0"})
        r = ds.reader(ds.schema())
        if filters:
            r.pushFilters(filters)
        return len(r.partitions())

    full = nparts([])
    n = optimize_rowstore(spark, store, by="weight")
    assert n == len(read_manifest(store)["files"])
    clustered_full = nparts([])
    pruned = nparts([GreaterThanOrEqual(("weight",), 495)])
    assert pruned < clustered_full, (pruned, clustered_full, full)
    # equality on the non-key column prunes too
    assert nparts([EqualTo(("weight",), 0)]) < clustered_full
    # results identical through the real read path
    got = read_rowstore(spark, store).where(F.col("weight") >= 495)
    exp = df.where(F.col("weight") >= 495)
    assert got.count() == exp.count() > 0
    assert exp.exceptAll(got.select("user_id", "weight")).isEmpty()
    # inclusive boundary on non-key stats keeps the boundary file
    top = max(e["stats"]["weight"][1] for e in read_manifest(store)["files"])
    got = read_rowstore(spark, store).where(F.col("weight") >= top)
    assert got.count() == df.where(F.col("weight") >= top).count() > 0


def test_merge_into_conditional_clauses(spark, tmp_path):
    """Full MERGE grammar: WHEN MATCHED AND cond DELETE (wins over
    update), WHEN MATCHED AND cond UPDATE SET (unlisted columns keep
    target values; NULL conditions keep the row unchanged), WHEN NOT
    MATCHED INSERT values; unmatched target rows untouched; a source
    with two rows per key refuses (Delta's multiple-matches
    contract)."""
    import pytest

    from heatmap_spark.sources.rowstore import merge_into_rowstore

    store = str(tmp_path / "m")
    target = spark.createDataFrame(
        [("u1", 10.0, "a"), ("u2", 20.0, "b"), ("u3", 30.0, "c"),
         ("u4", 40.0, "d")],
        "user_id string, weight double, tag string",
    )
    write_rowstore(target, store, bucket_key="user_id", n_buckets=2,
                   mode="overwrite")
    source = spark.createDataFrame(
        [("u1", "del", 0.0), ("u2", "upd", 5.0), ("u3", "noop", None),
         ("u9", "new", 9.0)],
        "user_id string, action string, delta double",
    )
    merge_into_rowstore(
        spark, source, store,
        matched_update={"weight": "t.weight + s.delta"},
        matched_update_cond="s.action = 'upd'",
        matched_delete_cond="s.action = 'del'",
        insert_values={"user_id": "s.user_id", "weight": "s.delta"},
    )
    got = {
        r["user_id"]: (r["weight"], r["tag"])
        for r in read_rowstore(spark, store).collect()
    }
    assert got == {
        "u2": (25.0, "b"),       # updated; unlisted tag kept
        "u3": (30.0, "c"),       # matched, neither clause fires
        "u4": (40.0, "d"),       # unmatched target untouched
        "u9": (9.0, None),       # inserted; unlisted tag null-fills
    }, got
    # NULL update condition keeps the row unchanged (not dropped)
    merge_into_rowstore(
        spark,
        spark.createDataFrame([("u3", None)], "user_id string, delta double"),
        store,
        matched_update={"weight": "t.weight + s.delta"},
        matched_update_cond="s.delta > 0",  # NULL here
    )
    assert read_rowstore(spark, store).where(
        F.col("user_id") == "u3"
    ).first()["weight"] == 30.0
    # time travel still sees the pre-merge snapshot
    v1 = read_rowstore(spark, store, as_of_version=1)
    assert {r["user_id"] for r in v1.collect()} == {"u1", "u2", "u3", "u4"}
    # multiple source rows per key refuse
    dup = spark.createDataFrame(
        [("u2", "upd", 1.0), ("u2", "upd", 2.0)],
        "user_id string, action string, delta double",
    )
    with pytest.raises(ValueError, match="multiple source rows"):
        merge_into_rowstore(
            spark, dup, store, matched_update={"weight": "s.delta"}
        )


def test_stream_rate_limit_bounds_catchup_batches(spark, sf_smoke, tmp_path):
    """max_versions_per_batch: a stream starting behind a 3-commit
    backlog advances one manifest version per micro-batch instead of
    swallowing the backlog in one driver-side batch; each availableNow
    drain takes ONE bounded batch from the checkpoint, so repeated
    drains converge on the full relation (the batch-mode catch-up
    loop)."""
    from heatmap_spark.sources.rowstore import make_rowstore_datasource

    store = str(tmp_path / "locations")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    loc = _loc(spark, sf_smoke)
    thirds = [loc.where(F.expr("mod(timestamp_ms, 3)") == i) for i in range(3)]
    write_rowstore(thirds[0], store, bucket_key="user_id", mode="overwrite")
    write_rowstore(thirds[1], store, mode="append")
    write_rowstore(thirds[2], store, mode="append")

    # reader-level: one version per read() call
    ds = make_rowstore_datasource()(
        {"path": store, "max_versions_per_batch": "1"}
    )
    r = ds.simpleStreamReader(None)
    rows1, off1 = r.read({"version": 0})
    assert off1 == {"version": 1}
    assert len(rows1) == thirds[0].count()
    rows2, off2 = r.read(off1)
    assert off2 == {"version": 2}
    assert len(rows2) == thirds[1].count()
    # caught up: offset stops advancing; the result is an empty
    # ITERATOR (Spark's wrapper probes same-offset batches with
    # next() — a latent TypeError with a list, fixed this round)
    rows4, off4 = r.read({"version": 3})
    assert off4 == {"version": 3} and list(rows4) == []

    # end-to-end: each availableNow drain advances ONE commit from
    # the checkpoint; three drains converge on the full relation
    def drain():
        q = (
            stream_rowstore(spark, store, max_versions_per_batch=1)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout=300)
        return spark.read.parquet(out).count()

    c1 = drain()
    assert c1 == thirds[0].count()
    c2 = drain()
    assert c2 == c1 + thirds[1].count()
    c3 = drain()
    got = spark.read.parquet(out)
    assert c3 == got.count() == loc.count()
    assert loc.exceptAll(got).isEmpty()
    # caught up: a further drain adds nothing
    assert drain() == c3


def test_optimize_multi_column_zorder_prunes_both_dimensions(spark, tmp_path):
    """optimize_rowstore(by=[a, b]) — Delta-style multi-column ZORDER
    (quantile-bucket ids, bit-interleaved): after the rewrite a range
    predicate on EITHER column prunes files via per-file stats, and
    pruning never changes results.  Single-column clustering by 'a'
    would leave 'b' scattered across every file."""
    from pyspark.sql.datasource import GreaterThanOrEqual

    from heatmap_spark.sources.rowstore import optimize_rowstore

    store = str(tmp_path / "z")
    df = spark.range(40000).select(
        F.concat(F.lit("u"), (F.col("id") % 97)).alias("user_id"),
        (F.col("id") % 500).alias("a"),
        ((F.col("id") * 7919) % 1000).alias("b"),
    )
    write_rowstore(
        df.repartition(8), store, bucket_key="user_id", n_buckets=2,
        mode="overwrite",
    )
    cls = make_rowstore_datasource()

    def nparts(filters):
        ds = cls(options={"path": store, "max_partition_bytes": "1",
                          "open_cost_bytes": "0"})
        r = ds.reader(ds.schema())
        if filters:
            r.pushFilters(filters)
        return len(r.partitions())

    optimize_rowstore(spark, store, by=["a", "b"], n_partitions=16)
    full = nparts([])
    pruned_a = nparts([GreaterThanOrEqual(("a",), 450)])
    pruned_b = nparts([GreaterThanOrEqual(("b",), 900)])
    assert pruned_a < full, (pruned_a, full)
    assert pruned_b < full, (pruned_b, full)
    # results identical through the real read path, both dimensions
    for col, cut in (("a", 450), ("b", 900)):
        got = read_rowstore(spark, store).where(F.col(col) >= cut)
        exp = df.where(F.col(col) >= cut)
        assert got.count() == exp.count() > 0
        assert exp.exceptAll(got.select("user_id", "a", "b")).isEmpty()
