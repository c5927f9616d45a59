"""Portable HLL: register determinism, accuracy, streaming store
mergeability/replay/compaction, and the sketch-identity guarantee."""

import math

from pyspark.sql import functions as F

from heatmap_spark.operators.profiling import (
    hll_estimate,
    hll_portable,
    hll_register_table,
)
from heatmap_spark.sources.tables import load_table
from heatmap_spark.streaming.hll import (
    accumulated_registers,
    compact_hll_store,
    merge_batch_into_hll_store,
)


def _regs(df):
    return {(r["event_type"], r["bucket"]): r["rho"] for r in df.collect()}


def _py_registers(pairs):
    """Pure-python reference: (event_type, user_id) -> register dict."""
    import hashlib

    out = {}
    for et, uid in pairs:
        h = hashlib.md5(str(uid).encode()).hexdigest()
        bucket = int(h[:2], 16)
        w = int(h[2:16], 16)
        rho = 57 if w == 0 else 57 - w.bit_length()
        k = (et, bucket)
        out[k] = max(out.get(k, 0), rho)
    return out


def test_register_table_matches_pure_python(spark, sf_smoke):
    ev = load_table(spark, sf_smoke, "events").select("event_type", "user_id")
    got = _regs(hll_register_table(ev, "user_id", ["event_type"]))
    want = _py_registers(
        [(r["event_type"], r["user_id"]) for r in ev.collect()]
    )
    assert got == want


def test_register_merge_is_partition_independent(spark, sf_smoke):
    """max-merge identity: registers of (A ∪ B) == bucketwise max of
    registers(A), registers(B) — the mergeability the store relies on."""
    ev = load_table(spark, sf_smoke, "events").select("event_type", "user_id")
    a = ev.where(F.col("user_id") % 2 == 0)
    b = ev.where(F.col("user_id") % 2 == 1)
    merged = (
        hll_register_table(a, "user_id", ["event_type"])
        .unionByName(hll_register_table(b, "user_id", ["event_type"]))
        .groupBy("event_type", "bucket")
        .agg(F.max("rho").alias("rho"))
    )
    assert _regs(merged) == _regs(hll_register_table(ev, "user_id", ["event_type"]))


def test_hll_portable_accuracy_and_union(spark, sf_smoke):
    rows = hll_portable(spark, sf_smoke).collect()
    by_type = {r["event_type"]: r for r in rows}
    assert "__all__" in by_type
    for r in rows:
        # standard HLL error for m=256 is ~1.04/sqrt(256) = 6.5%; allow 3σ
        assert r["exact_users"] > 0
        rel = abs(r["hll_users"] - r["exact_users"]) / r["exact_users"]
        assert rel < 0.20, (r["event_type"], r["hll_users"], r["exact_users"])
    # the union estimates at least the largest single type
    biggest = max(
        r["exact_users"] for r in rows if r["event_type"] != "__all__"
    )
    assert by_type["__all__"]["exact_users"] >= biggest


def test_linear_counting_small_range(spark):
    """A 20-element set must take the linear-counting branch and land
    very close (registers_set ≈ n when n << m)."""
    df = spark.range(20).select(
        F.lit("t").alias("event_type"), F.col("id").alias("user_id")
    )
    regs = hll_register_table(df, "user_id", ["event_type"])
    row = hll_estimate(regs, ["event_type"]).first()
    zeros = 256 - row["registers_set"]
    expect = 256.0 * math.log(256.0 / zeros)
    assert abs(row["hll_users"] - round(expect, 4)) < 1e-9
    assert abs(row["hll_users"] - 20) < 3


def test_hll_store_merge_replay_compact(spark, sf_smoke, tmp_path):
    store = str(tmp_path / "hll")
    ev = load_table(spark, sf_smoke, "events").select(
        "event_type", "user_id", "event_id"
    )
    mx = ev.agg(F.max("event_id")).first()[0] + 1
    for b in range(3):
        batch = ev.where(F.expr(f"CAST(event_id * 3 DIV {mx} AS INT)") == b).select(
            "event_type", "user_id"
        )
        assert merge_batch_into_hll_store(spark, batch, store, b)

    oneshot = _regs(hll_register_table(ev, "user_id", ["event_type"]))
    assert _regs(accumulated_registers(spark, store)) == oneshot

    # replay of a committed batch is a no-op (and couldn't change the
    # registers even if it ran — max is idempotent)
    assert not merge_batch_into_hll_store(spark, ev.limit(5), store, 2)
    assert _regs(accumulated_registers(spark, store)) == oneshot

    removed = compact_hll_store(spark, store)
    assert removed == 3
    assert _regs(accumulated_registers(spark, store)) == oneshot
    assert compact_hll_store(spark, store) == 0
    assert _regs(accumulated_registers(spark, store)) == oneshot
