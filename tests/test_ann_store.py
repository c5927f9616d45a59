"""Incremental ANN (IVFPQ) codes store: frozen-model equivalence with
the one-shot build, replay guard, compaction transparency, and serving
straight from the store."""

from pyspark.sql import functions as F

from heatmap_spark.sources.tables import load_table
from heatmap_spark.streaming.ann_store import (
    ann_store_topk,
    compact_ann_store,
    load_ann_model,
    merge_batch_into_ann_store,
    read_ann_codes,
)


def _emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )


def _range_batches(emb, n_batches=3):
    n = emb.count()
    n0 = (n + n_batches - 1) // n_batches
    return [
        emb.where((F.col("vec_id") >= i * n0) & (F.col("vec_id") < (i + 1) * n0))
        for i in range(n_batches)
    ]


def test_streamed_codes_equal_one_shot_build(spark, sf_smoke, tmp_path):
    from heatmap_spark.operators.similarity import ivfpq_build

    emb = _emb(spark, sf_smoke)
    batches = _range_batches(emb)
    n0 = batches[0].count()
    store = str(tmp_path / "store")
    for b, batch in enumerate(batches):
        assert merge_batch_into_ann_store(spark, batch, store, b)
    got = read_ann_codes(spark, store).select("vec_id", "bucket", "codes")
    _, _, want = ivfpq_build(emb, train_iters=1, train_sample_n=n0)
    want = want.select("vec_id", "bucket", "codes")
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()
    assert got.count() == emb.count()


def test_replay_and_compaction_preserve_codes_and_search(spark, sf_smoke, tmp_path):
    emb = _emb(spark, sf_smoke)
    batches = _range_batches(emb)
    store = str(tmp_path / "store")
    for b, batch in enumerate(batches):
        assert merge_batch_into_ann_store(spark, batch, store, b)
    # replay guard: committed batch is a no-op and the model is stable
    model_before = load_ann_model(spark, store)
    assert not merge_batch_into_ann_store(spark, batches[1], store, 1)
    assert load_ann_model(spark, store) == model_before

    before = sorted(
        tuple(r) for r in read_ann_codes(spark, store).select("vec_id", "bucket").collect()
    )
    res_before = sorted(
        tuple(r)
        for r in ann_store_topk(spark, store, emb, nprobe=8)
        .select("query_id", "neighbor_id")
        .collect()
    )
    assert compact_ann_store(spark, store) == 3
    after = sorted(
        tuple(r) for r in read_ann_codes(spark, store).select("vec_id", "bucket").collect()
    )
    assert before == after
    res_after = sorted(
        tuple(r)
        for r in ann_store_topk(spark, store, emb, nprobe=8)
        .select("query_id", "neighbor_id")
        .collect()
    )
    assert res_before == res_after
    assert len(res_after) == 10 * 5  # topk rows per query
    # second compaction: nothing unfolded remains
    assert compact_ann_store(spark, store) == 0


def test_drift_monitor_trips_on_distribution_shift(spark, sf_smoke, tmp_path):
    """Frozen-model drift trigger (VERDICT r11 item 6): recall probed
    against the exact twin stays above the floor while the stream
    matches the training distribution, and the retrain_flag TRIPS when
    a shifted batch arrives (vectors in a region the frozen
    coarse/PQ codebooks never saw — quantized distance estimates
    degrade, served top-k diverges from exact).  Cadence: off-cadence
    batches are a no-op (no probe paid)."""
    from heatmap_spark.streaming.ann_store import (
        monitor_ann_drift,
        read_ann_drift,
    )

    emb = _emb(spark, sf_smoke)
    n = emb.count()
    # shifted batch: reversed coordinates, rescaled + offset — a
    # subspace the frozen residual codebooks never modeled
    shifted = emb.select(
        (F.col("vec_id") + n).alias("vec_id"),
        F.transform(F.reverse("vec"), lambda x: x * 2.0 + 3.0).alias("vec"),
    )
    # probe queries are drawn FROM each regime and keyed negatively —
    # the recent-stream shape the queries= hook exists for (ids never
    # collide with the store's id space)
    healthy_q = emb.where(F.col("vec_id") < 10).select(
        (F.col("vec_id") - 10).alias("vec_id"), "vec"
    )
    shifted_q = shifted.where(F.col("vec_id") < n + 10).select(
        (F.col("vec_id") - n - 10).alias("vec_id"), "vec"
    )

    store = str(tmp_path / "store")
    assert merge_batch_into_ann_store(spark, emb, store, 0)
    # healthy: trained-on distribution, recall clears the floor
    flag0 = monitor_ann_drift(
        spark, store, emb, 0, every=2, nprobe=8, queries=healthy_q
    )
    assert flag0 is False
    # off-cadence batch: no probe, no row
    assert (
        monitor_ann_drift(spark, store, emb, 1, every=2, queries=healthy_q)
        is None
    )
    assert read_ann_drift(spark, store).count() == 1

    assert merge_batch_into_ann_store(spark, shifted, store, 1)
    probe = emb.unionByName(shifted)  # the full ingested corpus
    flag1 = monitor_ann_drift(
        spark, store, probe, 1, every=1, nprobe=8, queries=shifted_q
    )
    assert flag1 is True
    log = {r["batch_id"]: r for r in read_ann_drift(spark, store).collect()}
    assert set(log) == {0, 1}
    assert log[0]["retrain_flag"] is False and log[0]["recall"] >= 0.8
    assert log[1]["retrain_flag"] is True and log[1]["recall"] < 0.8


def test_opq_arm_codes_equal_one_shot_and_serve(spark, sf_smoke, tmp_path):
    """OPQ arm: the frozen model gains the learned rotation; streamed
    codes must be bit-identical to a one-shot ivfpq_opq_build on the
    same prefix, the rotation must round-trip through parquet, and
    serving must pick it up automatically (R= hook)."""
    from heatmap_spark.operators.similarity import ivfpq_opq_build
    from heatmap_spark.streaming.ann_store import load_ann_rotation

    emb = _emb(spark, sf_smoke)
    batches = _range_batches(emb)
    n0 = batches[0].count()
    store = str(tmp_path / "store")
    for b, batch in enumerate(batches):
        assert merge_batch_into_ann_store(
            spark, batch, store, b, opq=True, opq_iters=2
        )
        if b == 1:
            compact_ann_store(spark, store)
    got = read_ann_codes(spark, store).select("vec_id", "bucket", "codes")
    _, R, _, want = ivfpq_opq_build(
        emb, opq_iters=2, train_iters=1, train_sample_n=n0
    )
    want = want.select("vec_id", "bucket", "codes")
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()
    # rotation round-trips through the store and is orthonormal
    R2 = load_ann_rotation(spark, store)
    assert R2 == R
    import numpy as np

    Rm = np.asarray(R2)
    assert np.allclose(Rm @ Rm.T, np.eye(Rm.shape[0]), atol=1e-9)
    res = ann_store_topk(spark, store, emb, nprobe=8)
    assert res.count() == 10 * 5
    # plain store has no rotation
    store2 = str(tmp_path / "plain")
    assert merge_batch_into_ann_store(spark, batches[0], store2, 0)
    assert load_ann_rotation(spark, store2) is None
