"""Incremental entity-resolution store: streamed assignment equals the
one-shot batch ER; replay guard; compaction transparency; cross-batch
links actually form."""

from pyspark.sql import functions as F

from heatmap_spark.operators.entity import (
    dirty_customer_records,
    entity_resolution,
)
from heatmap_spark.streaming.entity_store import (
    accumulated_records,
    compact_entity_store,
    merge_batch_into_entity_store,
    read_entity_assignments,
)


def _batches(records, n=3):
    return [records.where(F.col("rec_id") % n == b) for b in range(n)]


def test_streamed_assignment_equals_batch_er(spark, sf_smoke, tmp_path):
    store = str(tmp_path / "store")
    records = dirty_customer_records(spark, sf_smoke)
    for b, batch in enumerate(_batches(records)):
        assert merge_batch_into_entity_store(spark, batch, store, b)
    got = read_entity_assignments(spark, store)
    want = entity_resolution(spark, sf_smoke)
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()
    # cross-batch linkage really happened: variants (rec_id % 3 shifted
    # by the +2e6 offset) mostly sit in a different batch than their
    # original, yet every crm record ends in a 2-source entity
    assert (
        got.where((F.col("source") == "crm") & (F.col("n_sources") != 2)).count()
        == 0
    )


def test_replay_and_midstream_compaction(spark, sf_smoke, tmp_path):
    store = str(tmp_path / "store")
    records = dirty_customer_records(spark, sf_smoke)
    b0, b1, b2 = _batches(records)
    assert merge_batch_into_entity_store(spark, b0, store, 0)
    assert merge_batch_into_entity_store(spark, b1, store, 1)
    # replay of a committed batch: no-op, records not duplicated
    n_before = accumulated_records(spark, store).count()
    assert not merge_batch_into_entity_store(spark, b1, store, 1)
    assert accumulated_records(spark, store).count() == n_before
    # compact mid-stream, then ingest the last batch — result unchanged
    assert compact_entity_store(spark, store) == 2
    assert merge_batch_into_entity_store(spark, b2, store, 2)
    got = read_entity_assignments(spark, store)
    want = entity_resolution(spark, sf_smoke)
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()
    # second compaction folds only the straggler batch
    assert compact_entity_store(spark, store) == 1
