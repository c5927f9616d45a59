"""Bucketed-table co-located join: the shuffle-free fact-fact join
pattern for repeated joins at 100 TB (pyspark_guide §Partitioning).

Writes lineitem and orders bucketed by order key, joins them, and pins
that the join happens WITHOUT a shuffle exchange on either side."""

import pytest
from pyspark.sql import functions as F

from heatmap_spark.plans import plan_string
from heatmap_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_smoke):
    # spark.sql.warehouse.dir is a static conf — bucketed tables land in
    # the session's default warehouse; DROPs below clean them up.
    li = load_table(spark, sf_smoke, "lineitem")
    orders = load_table(spark, sf_smoke, "orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    (
        li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").format("parquet").saveAsTable("b_lineitem")
    )
    (
        orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").format("parquet").saveAsTable("b_orders")
    )
    yield "b_lineitem", "b_orders"
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bucketed_join_has_no_shuffle(spark, sf_smoke, bucketed_tables):
    li_t, o_t = bucketed_tables
    li = spark.table(li_t)
    orders = spark.table(o_t)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy(
            "o_orderstatus"
        ).agg(F.count("*").alias("n"))
        plan = plan_string(joined, "simple")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    # the join itself must not introduce exchanges; only the final
    # aggregation shuffles
    join_part = plan.split("HashAggregate")[-1]
    assert "Exchange" not in join_part, plan
    # and it returns the right answer
    got = {r.o_orderstatus: r.n for r in joined.collect()}
    li_raw = load_table(spark, sf_smoke, "lineitem")
    o_raw = load_table(spark, sf_smoke, "orders")
    exp = {
        r.o_orderstatus: r.n
        for r in li_raw.join(o_raw, li_raw.l_orderkey == o_raw.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == exp
