"""Incremental join-view store: pair-exactly-once delta rule, replay
guard, compaction, empty deltas, misalignment coverage."""

from collections import Counter

from pyspark.sql import functions as F

from heatmap_spark.sources.tables import load_table
from heatmap_spark.streaming.joinview import (
    compact_join_view,
    merge_batch_into_join_view,
    read_join_view,
)


def _sides(spark, sf):
    orders = load_table(spark, sf, "orders").select(
        F.col("o_orderkey").alias("okey"), "o_orderdate"
    )
    li = load_table(spark, sf, "lineitem").select(
        F.col("l_orderkey").alias("okey"), "l_extendedprice"
    )
    return orders, li


def _multiset(df):
    return Counter(tuple(r) for r in df.collect())


def test_join_view_equals_one_shot_join(spark, sf_smoke, tmp_path):
    store = str(tmp_path / "jv")
    orders, li = _sides(spark, sf_smoke)
    mx = orders.agg(F.max("okey")).first()[0] + 1
    for b in range(3):
        od = orders.where(F.expr(f"CAST(okey * 3 DIV {mx} AS INT)") == b)
        ld = li.where(F.col("okey") % 3 == b)
        assert merge_batch_into_join_view(spark, store, b, od, ld, ["okey"])

    oneshot = _multiset(orders.join(li, "okey"))
    got = _multiset(read_join_view(spark, store).select(*orders.join(li, "okey").columns))
    assert got == oneshot  # exactly once: multiset equality, not set

    # the misaligned thirds make EVERY (left-batch, right-batch) combo
    # contribute pairs — all three delta terms fire in batches 1 and 2
    combos = (
        orders.withColumn("bi", F.expr(f"CAST(okey * 3 DIV {mx} AS INT)"))
        .join(li.withColumn("bj", F.col("okey") % 3), "okey")
        .groupBy("bi", "bj")
        .count()
        .collect()
    )
    assert {(r["bi"], r["bj"]) for r in combos} == {
        (i, j) for i in range(3) for j in range(3)
    }

    # replay of a committed batch is a no-op
    assert not merge_batch_into_join_view(
        spark, store, 2, orders.limit(3), li.limit(3), ["okey"]
    )
    assert _multiset(
        read_join_view(spark, store).select(*orders.join(li, "okey").columns)
    ) == oneshot

    # compaction folds view partials and preserves the rows
    removed = compact_join_view(spark, store)
    assert removed == 3
    assert _multiset(
        read_join_view(spark, store).select(*orders.join(li, "okey").columns)
    ) == oneshot
    assert compact_join_view(spark, store) == 0


def test_join_view_empty_delta_sides(spark, sf_smoke, tmp_path):
    """A batch where one side's delta is empty emits only the other
    side's term against accumulated state."""
    store = str(tmp_path / "jv")
    orders, li = _sides(spark, sf_smoke)
    empty_o = orders.limit(0)
    empty_l = li.limit(0)
    # batch 0: only left rows (no pairs yet — right state is empty)
    assert merge_batch_into_join_view(spark, store, 0, orders, empty_l, ["okey"])
    v0 = read_join_view(spark, store)
    assert v0.count() == 0
    # batch 1: only right rows — all pairs appear now via L_state ⋈ ΔR
    assert merge_batch_into_join_view(spark, store, 1, empty_o, li, ["okey"])
    assert _multiset(
        read_join_view(spark, store).select(*orders.join(li, "okey").columns)
    ) == _multiset(orders.join(li, "okey"))


def test_join_view_exactly_once_for_arbitrary_splits(spark, tmp_path):
    """Property: for ANY assignment of left/right rows to batches —
    including empty deltas and keys arriving on one side only — the
    maintained view is multiset-equal to the one-shot join.  Driven by
    deterministic hash splits at several seeds instead of @given (a
    SparkSession inside hypothesis is too slow), which still explores
    lopsided and interleaved arrival orders."""
    from pyspark.sql import functions as F

    for seed in (1, 7, 13):
        store = str(tmp_path / f"jv{seed}")
        left = spark.range(40).select(
            (F.col("id") % 17).alias("okey"), F.col("id").alias("l_attr")
        )
        right = spark.range(60).select(
            (F.col("id") % 23).alias("okey"), F.col("id").alias("r_attr")
        )
        n_batches = 4
        lsplit = F.pmod(F.xxhash64(F.col("l_attr") + seed), F.lit(n_batches))
        rsplit = F.pmod(F.xxhash64(F.col("r_attr") * 31 + seed), F.lit(n_batches))
        for b in range(n_batches):
            ld = left.where(lsplit == b)
            rd = right.where(rsplit == b)
            assert merge_batch_into_join_view(spark, store, b, ld, rd, ["okey"])
        got = _multiset(read_join_view(spark, store).select("okey", "l_attr", "r_attr"))
        want = _multiset(left.join(right, "okey").select("okey", "l_attr", "r_attr"))
        assert got == want, seed
