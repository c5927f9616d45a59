"""Relational operator surface: joins, windows, rollups, set ops, top-k.

The reference has none of these (single-table pipeline — SURVEY.md
§2.8); they are part of this engine's declared capability set, exercised
as TPC-H-style queries over the driver fixtures.  Everything is
DataFrame-native so Catalyst gets predicate pushdown, column pruning,
join selection (broadcast for the small dims), and AQE.

Scale notes (100 TB): dimension tables (region/nation/customer/supplier/
part at TPC-H ratios) stay far below the broadcast threshold relative to
lineitem/orders — we hint ``broadcast`` explicitly where the dimension
is guaranteed small.  Fact-fact joins (orders⋈lineitem) shuffle on the
join key; AQE handles skew.  Window queries partition by their natural
key; no global sorts except final presentation ORDER BY + LIMIT (top-k
is executed as TakeOrderedAndProject, not a full sort).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from heatmap_spark.functions.exact import davg, dec, dsum
from heatmap_spark.sources.tables import load_table, register_sf_view


def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary: groupBy + 8 aggregates (partial+final hash agg)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = dec("l_extendedprice") * (F.lit(1).cast("decimal(12,4)") - dec("l_discount"))
    charge = disc_price * (F.lit(1).cast("decimal(12,4)") + dec("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).cast("decimal(18,6)").cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("decimal(18,6)").cast("double").alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping priority: 3-way join + agg + deterministic top 10."""
    cust = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    revenue = F.sum(dec("l_extendedprice") * (F.lit(1).cast("decimal(12,4)") - dec("l_discount")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revenue.cast("decimal(18,6)").cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local supplier volume: 6-way join through region→nation→cust/supp."""
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.sum(dec("l_extendedprice") * (F.lit(1).cast("decimal(12,4)") - dec("l_discount")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .where(cust.c_nationkey == supp.s_nationkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(revenue.cast("decimal(18,6)").cast("double").alias("revenue"))
    )


def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast revenue change: tight filter + single agg (pure scan path)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(dec("l_extendedprice") * dec("l_discount")).cast("decimal(18,6)").cast("double").alias("revenue"))
    )


def top_parts_per_brand(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """Per-group top-k via row_number window (deterministic tiebreak)."""
    part = load_table(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        part.select("p_brand", "p_partkey", "p_retailprice", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= k)
    )


def customer_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running revenue per customer (ROWS frame, unique order for determinism)."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_total"),
    )


def rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ROLLUP over (priority, status) — the relational cousin of the
    tile pyramid's hierarchical rollup."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.rollup("o_orderpriority", "o_orderstatus").agg(
        F.count("*").alias("n_orders"), dsum("o_totalprice").alias("total_price")
    )


def cube_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native CUBE over (returnflag, linestatus)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_items"), dsum("l_quantity").alias("sum_qty")
    )


def customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


def nations_without_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference (EXCEPT distinct)."""
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("n_nationkey")
    )
    return nation.subtract(supp)


def distinct_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (expand-based count distinct)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"), F.count("*").alias("n_events")
    )


def event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot via conditional aggregation (portable SQL shape)."""
    ev = load_table(spark, sf_dir, "events")
    agg = [
        F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).alias(f"n_{t}")
        for t in ("click", "view", "purchase", "signup", "error")
    ]
    return ev.groupBy("user_id").agg(*agg)


def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL approximate distinct — sketch semantics differ across engines
    (Spark's HLL++ vs DuckDB's HLL give different estimates on the same
    input), so no cross-engine value oracle can exist; declared
    rows-only.  Instead the exact twin is cross-checked IN-QUERY: the
    same scan computes ``count_distinct`` per group and the query
    RAISES if any group's estimate strays beyond 15 % relative error
    (3x the default rsd=0.05 of approx_count_distinct), so the driver
    row stays a live accuracy gate.  The collect is group-cardinality
    sized (|l_returnflag| = 3), not data-sized."""
    li = load_table(spark, sf_dir, "lineitem")
    out = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.count_distinct("l_partkey").alias("exact_parts"),
    ).localCheckpoint(eager=True)
    bad = out.where(
        F.abs(F.col("approx_parts") - F.col("exact_parts"))
        > 0.15 * F.col("exact_parts")
    ).count()
    if bad:
        raise AssertionError(
            f"approx_count_distinct strayed beyond 15% relative error vs "
            f"the exact twin for {bad} group(s)"
        )
    return out.select("l_returnflag", "approx_parts")


def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (interpolated) percentiles per event_type — Spark's exact
    `percentile` ≡ DuckDB's `quantile_cont` (both linear interpolation
    over the sorted values)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        F.round(F.min("value"), 6).alias("vmin"),
        F.round(F.max("value"), 6).alias("vmax"),
    )


def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from the props payload column."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )


def grouping_sets_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS through the SQL surface (every capability
    is reachable from spark.sql over registered views)."""
    v = register_sf_view(
        load_table(spark, sf_dir, "lineitem"), "__hs_lineitem", sf_dir
    )
    return spark.sql(
        f"""SELECT l_returnflag, l_linestatus, count(*) AS n_items
           FROM {v}
           GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())"""
    )


def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string expression surface over customer names."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.regexp_replace("c_name", "[0-9]+", "#").alias("name_masked"),
        F.reverse(F.col("c_name")).alias("name_rev"),
        F.concat_ws("-", F.lit("c"), F.col("c_custkey").cast("string")).alias("name_key"),
    )


def window_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank/lag/lead/ntile in one pass (per-nation customer
    balances, fully deterministic ordering)."""
    cust = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return cust.select(
        "c_custkey",
        "c_nationkey",
        F.round("c_acctbal", 2).alias("acctbal"),
        F.rank().over(w).alias("bal_rank"),
        F.dense_rank().over(w).alias("bal_dense_rank"),
        F.lag("c_custkey", 1).over(w).alias("prev_cust"),
        F.lead("c_custkey", 1).over(w).alias("next_cust"),
        F.ntile(4).over(w).alias("quartile"),
    )


def range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (non-equi) join: orders classified into price bands.

    The band dimension is tiny → broadcast nested-loop is the right
    plan (Spark picks it automatically for a broadcast non-equi join);
    for fact-fact range joins the scalable rewrite is bucketize +
    equi-join on bucket + residual filter.
    """
    orders = load_table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        [("S", 0.0, 50_000.0), ("M", 50_000.0, 150_000.0),
         ("L", 150_000.0, 300_000.0), ("XL", 300_000.0, 1e18)],
        "band string, lo double, hi double",
    )
    return (
        orders.join(
            F.broadcast(bands),
            (orders.o_totalprice >= bands.lo) & (orders.o_totalprice < bands.hi),
        )
        .groupBy("band")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("total"))
    )


def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume shipping between two nations (bidirectional), per year —
    nation self-join through both supplier and customer sides."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2") | (
        F.col("supp_nation") == "NATION_2"
    ) & (F.col("cust_nation") == "NATION_1")
    revenue = F.sum(dec("l_extendedprice") * (F.lit(1).cast("decimal(12,4)") - dec("l_discount")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("s_nkey"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("c_nkey"))
        .where(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(revenue.cast("decimal(18,6)").cast("double").alias("revenue"))
    )


def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item reporting: top 20 customers by lost revenue."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    revenue = F.sum(dec("l_extendedprice") * (F.lit(1).cast("decimal(12,4)") - dec("l_discount")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(revenue.cast("decimal(18,6)").cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


def above_average_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery shape: customers with balance above the global
    mean (mean via exact decimal sum / count for cross-engine parity).
    Expressed as a broadcast cross-join of the 1-row aggregate — what a
    decorrelated scalar subquery compiles to anyway."""
    cust = load_table(spark, sf_dir, "customer")
    avg_bal = cust.agg(
        (F.sum(dec("c_acctbal")).cast("double") / F.count("c_acctbal")).alias("avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .select("c_custkey", F.round("c_acctbal", 2).alias("acctbal"))
    )


def approx_quantiles_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile sketch per event_type (engine-specific
    estimates — rows-only driver check).

    The three quantiles are emitted as SCALAR double columns
    (p50/p90/p99), not the raw ``array<double>`` the aggregate
    returns: the correctness driver canonicalizes cell values by
    sorting/hashing and an array cell is unhashable there.

    Two raise pins keep the rows-only driver row a live accuracy gate
    (the q_approx_distinct standard — VERDICT r11 item 2):
    (1) monotonicity p50 ≤ p90 ≤ p99;
    (2) exact-twin BRACKET: approx_percentile's contract at the
    default accuracy=10000 is a rank error ≤ N/10000, so each
    estimate must lie between the exact interpolated percentiles at
    p ∓ 0.005 (50× the guaranteed rank slack, same one-scan agg) —
    a value-space bound derived from the rank guarantee that holds
    under any value distribution, ties included (the bracketing
    order statistics simply coincide under ties).
    """
    ev = load_table(spark, sf_dir, "events")
    q = ev.groupBy("event_type").agg(
        F.expr("approx_percentile(value, array(0.5, 0.9, 0.99))").alias("qs"),
        F.expr(
            "percentile(value, array(0.495, 0.505, 0.895, 0.905, 0.985, 0.995))"
        ).alias("br"),
    )
    out = q.select(
        "event_type",
        F.round(F.element_at("qs", 1), 6).alias("p50"),
        F.round(F.element_at("qs", 2), 6).alias("p90"),
        F.round(F.element_at("qs", 3), 6).alias("p99"),
        "br",
    ).localCheckpoint(eager=True)
    in_bracket = [
        F.col(p).between(
            F.element_at("br", 2 * i + 1) - F.lit(1e-6),
            F.element_at("br", 2 * i + 2) + F.lit(1e-6),
        )
        for i, p in enumerate(("p50", "p90", "p99"))
    ]
    bad = out.where(
        # NULL estimates (a degenerate all-NULL group) are violations,
        # not three-valued silent passes — the kll-drift guard pattern
        F.col("p50").isNull()
        | F.col("p90").isNull()
        | F.col("p99").isNull()
        | F.col("br").isNull()
        | (F.col("p50") > F.col("p90"))
        | (F.col("p90") > F.col("p99"))
        | ~(in_bracket[0] & in_bracket[1] & in_bracket[2])
    ).count()
    if bad:
        raise AssertionError(
            f"approx_percentile pin violated for {bad} group(s): "
            f"NULL estimate, monotonicity p50<=p90<=p99, or an estimate "
            f"outside the exact percentile bracket at p∓0.005"
        )
    return out.drop("br")


def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority checking: correlated EXISTS (semi join) against
    date-filtered lineitems shipped after their order date."""
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    matched = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return matched.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


def unpivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide→long) of the per-user event-type counts via stack —
    the inverse of event_type_pivot."""
    wide = event_type_pivot(spark, sf_dir)
    return wide.select(
        "user_id",
        F.expr(
            "stack(5, 'click', n_click, 'view', n_view, 'purchase', n_purchase, "
            "'signup', n_signup, 'error', n_error) AS (event_type, n)"
        ),
    ).where(F.col("n") > 0)


def order_extremes_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_by/max_by: each customer's cheapest and priciest order key.

    Ties on o_totalprice are resolved deterministically by folding the
    orderkey into the ordering key (min_by/max_by alone are
    tie-nondeterministic in any engine).  The key is a zero-padded
    string '<cents>_<orderkey>' whose lexicographic order equals the
    numeric order — portable where struct-ordered min_by isn't.
    """
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    price_key = F.concat_ws(
        "_",
        F.lpad(cents.cast("string"), 12, "0"),
        F.lpad(F.col("o_orderkey").cast("string"), 12, "0"),
    )
    return orders.groupBy("o_custkey").agg(
        F.min_by("o_orderkey", price_key).alias("cheapest_order"),
        F.max_by("o_orderkey", price_key).alias("priciest_order"),
        F.count("*").alias("n_orders"),
    )


def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion effect: conditional-aggregate ratio over a part join."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    disc = dec("l_extendedprice") * (F.lit(1).cast("decimal(12,4)") - dec("l_discount"))
    promo = F.sum(
        F.when(F.col("p_type").startswith("PROMO"), disc).otherwise(F.lit(0).cast("decimal(12,4)"))
    )
    total = F.sum(disc)
    return li.join(F.broadcast(part), li.l_partkey == part.p_partkey).agg(
        F.round(
            F.lit(100.0) * promo.cast("decimal(18,6)").cast("double")
            / total.cast("decimal(18,6)").cast("double"),
            6,
        ).alias("promo_revenue_pct")
    )


def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume customers: HAVING on a grouped sum, joined back to
    order/customer detail (top 20, deterministic)."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("qty"))
        .where(F.col("qty") > 150)
        .select("l_orderkey", F.col("qty").cast("double").alias("total_qty"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate", "total_qty")
        .orderBy(F.desc("total_qty"), "o_orderkey")
        .limit(20)
    )


def events_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-day rollup via date_trunc (timestamp-typed day buckets)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(F.date_trunc("day", "ts").alias("day"), "event_type").agg(
        F.count("*").alias("n_events"), dsum("value").alias("total_value")
    )


def customer_order_counts_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join with null-safe aggregation: every customer with
    their order count and total — zero/0.0 for customers without orders
    (the join type family the semi/anti pair doesn't cover)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    joined = cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
    return joined.groupBy("c_custkey", "c_name").agg(
        F.count("o_orderkey").alias("n_orders"),
        F.coalesce(F.sum(dec("o_totalprice")).cast("double"), F.lit(0.0)).alias("total_spent"),
    )


def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted revenue under disjunctive brand/size/quantity predicates
    (Q19 shape): OR-of-ANDs that Catalyst must keep sargable."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size").between(1, 15)) & (F.col("l_quantity") < 11))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size").between(1, 25)) & (F.col("l_quantity").between(10, 20)))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size").between(1, 35)) & (F.col("l_quantity") > 20))
    )
    revenue = F.sum(dec("l_extendedprice") * (F.lit(1).cast("decimal(12,4)") - dec("l_discount")))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .where(cond)
        .agg(revenue.cast("decimal(18,6)").cast("double").alias("revenue"))
    )


def customer_order_lists(spark: SparkSession, sf_dir: str, max_orders: int = 5) -> DataFrame:
    """Ordered string aggregation: first N orderkeys per customer as a
    comma list (deterministic ordering inside the aggregate)."""
    from pyspark.sql.window import Window as W

    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderkey")
    top = orders.select(
        "o_custkey", "o_orderkey", F.row_number().over(w).alias("rn")
    ).where(F.col("rn") <= max_orders)
    return top.groupBy("o_custkey").agg(
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", F.col("o_orderkey").alias("k")))),
                lambda s: s["k"].cast("string"),
            ),
        ).alias("first_orders")
    )


def nations_with_both(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set intersection: nation keys present among BOTH customers and
    suppliers (INTERSECT distinct — completes the set-op family with
    q_except_nations)."""
    cust_n = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("n_nationkey")
    )
    supp_n = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("n_nationkey")
    )
    return cust_n.intersect(supp_n)


def ship_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic: order→ship latency in days per priority
    (datediff over DATE casts; mean as exact-sum / count)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    days = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            (F.sum(days).cast("double") / F.count("*")).alias("avg_days"),
            F.min(days).alias("min_days"),
            F.max(days).alias("max_days"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H completion (adapted).  The driver fixtures are TPC-H-shaped but
# carry no partsupp table and omit several columns (l_commitdate,
# l_receiptdate, l_shipmode, c_phone, p_container, p_mfgr, o_comment), so
# the remaining queries below keep each original's OPERATOR SHAPE
# (correlated subqueries, scalar aggregates, semi/anti joins, histograms
# of histograms) while substituting available columns — the same
# precedent tpch_q4/q19 set.  Reference: none (SURVEY.md §2.8 — the
# reference engine has no relational surface at all).
# ---------------------------------------------------------------------------


def _disc_price() -> Column:
    """l_extendedprice * (1 - l_discount) under the exact-decimal policy."""
    return dec("l_extendedprice") * (F.lit(1).cast("decimal(12,4)") - dec("l_discount"))


def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best supplier per part (Q2 shape: correlated MAX subquery joined
    back on equality).  No partsupp/supplycost in the fixtures, so "best"
    is the highest-acctbal EUROPE supplier that has shipped the part."""
    part = load_table(spark, sf_dir, "part").where(F.col("p_size").isin(15, 25, 35))
    pairs = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    nation = load_table(spark, sf_dir, "nation")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cand = (
        pairs.join(F.broadcast(part), pairs.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), pairs.l_suppkey == F.col("s_suppkey"))
        .select("p_partkey", "p_name", "s_name", "s_acctbal", "n_name")
    )
    best = cand.groupBy(F.col("p_partkey").alias("bk")).agg(
        F.max("s_acctbal").alias("best_bal")
    )
    return (
        cand.join(
            best,
            (cand.p_partkey == best.bk) & (cand.s_acctbal == best.best_bal),
        )
        .select("p_partkey", "p_name", "s_name", "s_acctbal", "n_name")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share (Q8): 7-table join, conditional/total sum
    ratio per order year."""
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").alias("n1")
    n2 = load_table(spark, sf_dir, "nation").alias("n2")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    vol = _disc_price()
    nation_vol = F.sum(
        F.when(F.col("n2.n_name") == "NATION_3", vol).otherwise(
            F.lit(0).cast("decimal(12,4)")
        )
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("n1.n_nationkey"))
        .join(F.broadcast(region), F.col("n1.n_regionkey") == region.r_regionkey)
        .join(F.broadcast(n2), supp.s_nationkey == F.col("n2.n_nationkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            (
                nation_vol.cast("decimal(18,6)").cast("double")
                / F.sum(vol).cast("decimal(18,6)").cast("double")
            ).alias("mkt_share")
        )
    )


def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-type profit (Q9 shape): LIKE-filtered part join, profit by
    supplier nation and order year (no supplycost column → profit is the
    discounted revenue)."""
    part = load_table(spark, sf_dir, "part").where(F.col("p_name").contains("red"))
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("n_name", F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.sum(_disc_price()).cast("decimal(18,6)").cast("double").alias("sum_profit")
        )
    )


def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Important parts (Q11 shape): per-part value within one nation's
    suppliers, HAVING value > fraction × global scalar subquery."""
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    li = load_table(spark, sf_dir, "lineitem")
    value = dec("l_extendedprice") * dec("l_quantity")
    per_part = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(value).alias("value_dec"))
    )
    total = per_part.agg(
        F.sum("value_dec").cast("decimal(18,6)").cast("double").alias("total_value")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(
            F.col("value_dec").cast("decimal(18,6)").cast("double")
            > 0.0005 * F.col("total_value")
        )
        .select(
            "l_partkey",
            F.col("value_dec").cast("decimal(18,6)").cast("double").alias("part_value"),
        )
    )


def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-shipment priority mix (Q12 shape: conditional counts; no
    shipmode column → grouped by ship year, late = shipped >60 days
    after the order date)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .where(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy(F.year("l_shipdate").cast("int").alias("ship_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count distribution (Q13): left join + histogram of
    a histogram (no o_comment column → the exclusion filter drops urgent
    orders instead of 'special request' comments)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier (Q15): quarterly revenue view + scalar MAX subquery,
    equality-joined back (exact decimal comparison, double output)."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy("l_suppkey").agg(F.sum(_disc_price()).alias("rev_dec"))
    best = revenue.agg(F.max("rev_dec").alias("best_rev"))
    supp = load_table(spark, sf_dir, "supplier")
    return (
        revenue.crossJoin(F.broadcast(best))
        .where(F.col("rev_dec") == F.col("best_rev"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("rev_dec").cast("decimal(18,6)").cast("double").alias("total_revenue"),
        )
    )


def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier breadth per part attribute (Q16 shape: negated filters +
    COUNT DISTINCT; supplier links come from lineitem instead of the
    absent partsupp table)."""
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#5")
        & (~F.col("p_type").startswith("PROMO"))
        & (F.col("p_size").isin(1, 9, 15, 22, 28, 35, 42, 49))
    )
    pairs = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    return (
        pairs.join(F.broadcast(part), pairs.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity revenue (Q17): correlated per-part AVG subquery as
    a grouped join-back; avg is the exact decimal-sum/count form."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL")
    )
    avg_qty = (
        li.groupBy(F.col("l_partkey").alias("ap_partkey"))
        .agg((F.sum(dec("l_quantity")).cast("double") / F.count("*")).alias("avg_qty"))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(avg_qty, li.l_partkey == F.col("ap_partkey"))
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (F.sum(dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Potential promotion suppliers (Q20 shape: nested semi joins over an
    aggregated subquery — suppliers in one nation that shipped >50 units
    of some 'blue' part during 1996)."""
    part = load_table(spark, sf_dir, "part").where(F.col("p_name").startswith("blue"))
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    heavy = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 50)
        .select("l_suppkey")
    )
    nation = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_6")
    return (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .join(heavy, F.col("s_suppkey") == heavy.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
    )


def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who kept orders waiting (Q21 shape: EXISTS another
    supplier / NOT EXISTS another late supplier, expressed as one
    per-order aggregation; late = shipped >30 days after order date)."""
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem")
    lines = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
            ).cast("int").alias("late"),
        )
    )
    per_supp = lines.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("late").alias("is_late")
    )
    per_order = per_supp.groupBy(F.col("l_orderkey").alias("o_key")).agg(
        F.count("*").alias("n_supp"), F.sum("is_late").alias("n_late")
    )
    blamed = per_supp.where(F.col("is_late") == 1).join(
        per_order.where((F.col("n_supp") > 1) & (F.col("n_late") == 1)),
        F.col("l_orderkey") == F.col("o_key"),
    )
    supp = load_table(spark, sf_dir, "supplier")
    return (
        blamed.join(F.broadcast(supp), blamed.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sales opportunity (Q22 shape: scalar AVG subquery + anti
    join; no c_phone column → country code is the nation key, and every
    fixture customer has orders → the anti join excludes customers with
    RECENT orders instead of any orders)."""
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13)
    )
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(
        (F.sum(dec("c_acctbal")).cast("double") / F.count("*")).alias("avg_bal")
    )
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, F.col("c_custkey") == orders.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
    )


def lateral_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with ORDER BY + LIMIT: each nation's
    top-2 customers by account balance.  Catalyst decorrelates this into
    a ranked window join — the same physical plan a hand-written
    row_number() <= 2 would give — so the declarative form costs nothing
    at scale while staying ANSI-portable (DuckDB runs it verbatim)."""
    vn = register_sf_view(load_table(spark, sf_dir, "nation"), "hs_nation", sf_dir)
    vc = register_sf_view(
        load_table(spark, sf_dir, "customer"), "hs_customer", sf_dir
    )
    return spark.sql(
        f"""SELECT n_name, t.c_name, t.c_acctbal
FROM {vn} n, LATERAL (
  SELECT c_name, c_acctbal FROM {vc} c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t"""
    )


def quantity_median_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median (interpolated, ≡ DuckDB quantile_cont(0.5)) and a
    *deterministic* mode per return flag.

    Spark's and DuckDB's built-in ``mode`` both pick an arbitrary value
    on frequency ties, which is unacceptable for a reproducible
    pipeline; we define mode as the smallest value among the most
    frequent — computed as a count + row_number composition, which is
    also how it stays one-shuffle-scalable (no global sort, partial
    aggregation on (flag, qty) first)."""
    li = load_table(spark, sf_dir, "lineitem")
    med = li.groupBy("l_returnflag").agg(
        F.round(F.median("l_quantity"), 6).alias("median_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    counts = li.groupBy("l_returnflag", "l_quantity").agg(F.count(F.lit(1)).alias("cnt"))
    w = W.partitionBy("l_returnflag").orderBy(F.desc("cnt"), F.asc("l_quantity"))
    mode = (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("l_returnflag", F.col("l_quantity").alias("mode_qty"))
    )
    return med.join(mode, "l_returnflag")


def variant_props_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured aggregation through Spark 4's VARIANT type:
    parse the JSON payload once into the binary variant encoding, then
    extract typed fields.  At scale this replaces per-access string
    re-parsing (get_json_object) with a single parse + cheap binary
    reads — the right pattern for wide JSON payloads on 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type",
        F.try_variant_get(F.parse_json("props"), "$.k", "int").alias("k"),
    )
    return v.groupBy("event_type").agg(
        F.sum("k").cast("bigint").alias("k_sum"),
        F.max("k").alias("k_max"),
        F.count("k").alias("k_count"),
    )


def filtered_bool_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI aggregate FILTER clause + boolean aggregates through the
    SQL surface (both run verbatim in DuckDB)."""
    v = register_sf_view(load_table(spark, sf_dir, "orders"), "__hs_orders", sf_dir)
    return spark.sql(
        f"""SELECT o_orderpriority,
  count(*) AS n_orders,
  count(*) FILTER (WHERE o_totalprice > 100000) AS n_big,
  bool_or(o_orderstatus = 'F') AS any_finished,
  bool_and(o_totalprice > 0) AS all_positive,
  CAST(sum(CAST(o_totalprice AS DECIMAL(12,4))) FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS open_total
FROM {v} GROUP BY o_orderpriority"""
    )


def full_outer_nation_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join completing the join-type matrix: per-nation
    customer counts vs supplier counts — nations may exist on either
    side only, and both null-sides must survive."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return (
        cust.join(supp, "nk", "full_outer")
        .select(
            F.col("nk").alias("nationkey"),
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
    )


def cross_join_region_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit CROSS JOIN (the one place a cartesian product is the
    semantics, not an accident): all region pairs with a stable order
    key. Bounded dimension x dimension only — never fact-side."""
    r = load_table(spark, sf_dir, "region")
    a = r.select(F.col("r_regionkey").alias("ka"), F.col("r_name").alias("name_a"))
    b = r.select(F.col("r_regionkey").alias("kb"), F.col("r_name").alias("name_b"))
    return a.crossJoin(b).where(F.col("ka") < F.col("kb"))


def collection_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/map expression surface in one pass: construction, set ops,
    higher-order transforms — all JVM-side, all with DuckDB list_*
    twins."""
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.array_sort(F.collect_list("o_orderkey")).alias("orders"),
    )
    # array-typed outputs serialize to csv strings: the driver's value
    # hash compares scalars, and pandas ndarray-vs-list equality is
    # ill-defined — strings are the portable wire form
    return per_cust.select(
        "o_custkey",
        F.size("orders").alias("n_orders"),
        F.element_at("orders", 1).alias("first_order"),
        F.element_at("orders", -1).alias("last_order"),
        F.array_join(F.slice("orders", 1, 3), ",").alias("first3"),
        F.array_contains("orders", F.lit(7)).alias("has_order_7"),
        F.expr("aggregate(orders, CAST(0 AS BIGINT), (a, x) -> a + x)").alias("order_sum"),
        F.array_join(F.expr("transform(orders, x -> x * 2)"), ",").alias("doubled"),
        F.array_join(F.expr("filter(orders, x -> x % 2 = 0)"), ",").alias("even_orders"),
        F.array_join(
            F.array_sort(F.array_distinct(F.expr("transform(orders, x -> x % 10)"))), ","
        ).alias("last_digits"),
    )


def datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime expression surface with exact DuckDB twins (fields,
    truncation, arithmetic; anything with engine-specific conventions —
    ISO weeks, months_between fractions — is deliberately excluded
    from the oracle-checked set)."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("y"),
        F.quarter(d).alias("q"),
        F.month(d).alias("m"),
        F.dayofmonth(d).alias("dom"),
        F.hour(d).alias("h"),
        F.date_trunc("month", d).alias("month_start"),
        # DATE-typed outputs ride as ISO strings (pandas date dtype
        # diverges between engines; strings compare exactly)
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.date_add(d.cast("date"), 7), "yyyy-MM-dd").alias("plus_week"),
        F.date_format(F.date_sub(d.cast("date"), 3), "yyyy-MM-dd").alias("minus_3d"),
        F.datediff(d, F.to_date(F.lit("1995-01-01"))).alias("days_since_95"),
        F.date_format(d, "yyyy-MM-dd").alias("iso_day"),
    )


def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (percent_rank / cume_dist) plus
    explicit-frame first/last_value — the window families not already
    covered by window_variety (rank/lag/lead/ntile).

    Ordering is made total (acctbal desc, custkey asc) so both the
    fractions and the frame endpoints are deterministic; the fractions
    are exact integer ratios evaluated in double, bitwise-identical
    across engines.
    """
    cust = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return cust.select(
        "c_custkey",
        "c_nationkey",
        F.percent_rank().over(w).alias("bal_pct_rank"),
        F.cume_dist().over(w).alias("bal_cume_dist"),
        F.first_value(F.col("c_custkey")).over(wfull).alias("richest_cust"),
        F.last_value(F.col("c_custkey")).over(wfull).alias("poorest_cust"),
    )


def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType expression surface in one pass: construction
    (map_from_entries), inspection (size/map_keys), folds over values
    (aggregate), and the higher-order map transforms (map_filter /
    transform_values).

    Maps have no canonical entry order, so every map-typed output is
    serialized to a sorted ``k:v`` csv string — the portable wire form
    for the driver's value hash (same rationale as collection_functions
    for arrays).  The DuckDB oracle never builds a MAP at all: sorted
    ``string_agg`` over the grouped counts is definitionally the same
    serialization, which is exactly the point — the *semantics* are
    relational, the map is a physical container.
    """
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    m = per_cust.groupBy("o_custkey").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("o_orderpriority", "cnt")))
        ).alias("pri_counts")
    )

    def _ser(map_expr: str) -> Column:
        return F.array_join(
            F.array_sort(
                F.expr(f"transform(map_entries({map_expr}), "
                       "e -> concat(e.key, ':', cast(e.value as string)))")
            ),
            ",",
        )

    return m.select(
        "o_custkey",
        F.size("pri_counts").alias("n_priorities"),
        F.array_join(F.array_sort(F.map_keys("pri_counts")), ",").alias("priorities"),
        F.expr(
            "aggregate(map_values(pri_counts), CAST(0 AS BIGINT), (a, x) -> a + x)"
        ).alias("total_orders"),
        _ser("pri_counts").alias("entries_csv"),
        _ser("map_filter(pri_counts, (k, v) -> v >= 2)").alias("repeat_csv"),
        _ser("transform_values(pri_counts, (k, v) -> v * 10)").alias("scaled_csv"),
    )


def null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling expression surface: nullif / coalesce / nvl2 /
    null-safe comparison (``<=>`` ≡ IS NOT DISTINCT FROM), plus the
    count(*) vs count(col) distinction under grouping.

    The fixtures are fully non-null, so nulls are *manufactured* with
    nullif — which also pins nullif itself.  Every construct here has
    an exact ANSI twin DuckDB executes verbatim (nvl2 is spelled as
    CASE in the oracle; semantics identical).
    """
    o = load_table(spark, sf_dir, "orders")
    urgent_null = F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT"))
    rows = o.select(
        "o_orderstatus",
        urgent_null.alias("pri_or_null"),
        F.coalesce(urgent_null, F.lit("URGENT")).alias("pri_filled"),
        F.nvl2(urgent_null, F.lit("routine"), F.lit("rush")).alias("pri_class"),
        (~F.col("o_orderstatus").eqNullSafe(F.lit("O"))).alias("closed"),
    )
    return rows.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("pri_or_null").alias("n_nonnull"),
        (F.count(F.lit(1)) - F.count("pri_or_null")).alias("n_null"),
        F.countDistinct("pri_filled").alias("n_pri"),
        F.sum(F.col("closed").cast("bigint")).alias("n_closed"),
        F.sum((F.col("pri_class") == F.lit("rush")).cast("bigint")).alias("n_rush"),
    )


def conditional_safety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safety sweep: try_divide (null, not error, on /0),
    least/greatest, and order-independent double extrema.

    Under ANSI mode (Spark 4 default) a bare x/0 throws; the try_*
    family degrades to NULL — the right semantics for a 100 TB batch
    job where one poison row must not kill the stage.  Aggregates here
    are counts and min/max only (order-independent), so doubles stay
    oracle-exact without decimal casts.
    """
    li = load_table(spark, sf_dir, "lineitem")
    safe = F.try_divide(F.col("l_extendedprice"), F.col("l_quantity"))
    poisoned = F.try_divide(F.col("l_extendedprice"), F.lit(0.0))
    return li.groupBy("l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(poisoned).alias("n_div0_nonnull"),  # 0: all null, no error
        F.min(safe).alias("min_unit_price"),
        F.max(safe).alias("max_unit_price"),
        F.min(F.least("l_tax", "l_discount")).alias("min_least"),
        F.max(F.greatest("l_tax", "l_discount")).alias("max_greatest"),
    )


def basket_pairs(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """Market-basket co-occurrence: the k most co-ordered part pairs.

    Scatter form: collect each order's distinct parts (baskets are
    small — bounded per order), explode the within-basket pair
    combinations, count.  This avoids the lineitem self-join on
    l_orderkey, whose output is quadratic in basket size BEFORE the
    aggregate can shrink it; the explode form materializes the same
    pairs but inside one aggregation pipeline with map-side combine.
    Pairs are oriented (a < b) so each unordered pair counts once.
    """
    li = load_table(spark, sf_dir, "lineitem")
    baskets = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("parts")
    )
    pairs = baskets.select(
        F.explode(
            F.filter(
                F.flatten(
                    F.transform(
                        F.col("parts"),
                        lambda a: F.transform(
                            F.col("parts"), lambda b: F.struct(a.alias("pa"), b.alias("pb"))
                        ),
                    )
                ),
                lambda s: s["pa"] < s["pb"],
            )
        ).alias("p")
    )
    return (
        pairs.groupBy(F.col("p.pa").alias("part_a"), F.col("p.pb").alias("part_b"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.desc("n_orders"), "part_a", "part_b")
        .limit(k)
    )


def yoy_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue per order priority: yearly exact-decimal
    totals, previous year via lag, growth ratio in double.

    Two tiny shuffles (yearly agg, then a window over ~priorities x
    years rows) — the growth math runs on the aggregated result, so
    the fact scan is touched once.
    """
    orders = load_table(spark, sf_dir, "orders")
    yearly = orders.groupBy(
        "o_orderpriority", F.year("o_orderdate").alias("yr")
    ).agg(dsum("o_totalprice").alias("revenue"))
    w = W.partitionBy("o_orderpriority").orderBy("yr")
    prev = F.lag("revenue").over(w)
    return yearly.select(
        "o_orderpriority",
        "yr",
        "revenue",
        prev.alias("prev_revenue"),
        F.round((F.col("revenue") - prev) / prev, 6).alias("yoy_growth"),
    )


def collation_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 string collations: case-insensitive distinct counts and
    equality via UTF8_LCASE, against the binary-collation defaults.

    Collation rides the TYPE, so a collated groupBy/join hashes the
    collation key form directly — no lower() materialization on the
    hot path (the oracle uses lower() because collation is exactly
    equivalent to it for this data).  Mixed-case input is derived
    deterministically from c_custkey parity.
    """
    cust = load_table(spark, sf_dir, "customer")
    mixed = F.when(
        F.col("c_custkey") % 2 == 0, F.upper("c_mktsegment")
    ).otherwise(F.lower("c_mktsegment"))
    t = cust.select(mixed.alias("seg"))
    ci = F.collate(F.col("seg"), "UTF8_LCASE")
    return t.agg(
        F.count_distinct(ci).alias("n_ci"),
        F.count_distinct("seg").alias("n_cs"),
        F.count(F.when(ci == "BUILDING", 1)).alias("n_building_ci"),
    )


def exists_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS through the SQL surface: Catalyst
    decorrelates both into semi/anti joins (same physical plan the
    DataFrame spellings produce) — the declarative form is free."""
    vn = register_sf_view(load_table(spark, sf_dir, "nation"), "hs_nation", sf_dir)
    vs = register_sf_view(load_table(spark, sf_dir, "supplier"), "hs_supplier", sf_dir)
    vc = register_sf_view(load_table(spark, sf_dir, "customer"), "hs_customer", sf_dir)
    return spark.sql(
        f"""SELECT n.n_name,
  EXISTS (SELECT 1 FROM {vs} s WHERE s.s_nationkey = n.n_nationkey)
    AS has_supplier,
  NOT EXISTS (SELECT 1 FROM {vc} c WHERE c.c_nationkey = n.n_nationkey
              AND c.c_acctbal > 9000.0) AS no_rich_customer
FROM {vn} n"""
    )


def set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set operations (INTERSECT ALL / EXCEPT ALL) over
    customer vs supplier nation keys — multiplicity-preserving, which
    the DISTINCT forms destroy."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nk")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nk")
    )
    inter = cust.intersectAll(supp).groupBy("nk").agg(
        F.count(F.lit(1)).alias("n"), F.lit("intersect_all").alias("op")
    )
    exc = cust.exceptAll(supp).groupBy("nk").agg(
        F.count(F.lit(1)).alias("n"), F.lit("except_all").alias("op")
    )
    return inter.unionByName(exc).select("op", "nk", "n")


def window_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead/lag/nth_value with IGNORE NULLS — gap-tolerant neighbor
    lookups (LOCF's window-function cousins)."""
    ev = load_table(spark, sf_dir, "events")
    nullable_val = F.when(F.col("event_type") != "error", F.col("value"))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return ev.select(
        "user_id",
        "event_id",
        nullable_val.alias("val_or_null"),
        F.last(nullable_val, ignorenulls=True).over(wf).alias("last_good"),
        F.first(nullable_val, ignorenulls=True).over(wf).alias("first_good"),
    )


def revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total (ratio_to_report): each nation's share of total
    revenue via an unpartitioned window sum over the exact decimal
    per-nation aggregates — the window runs on ~25 aggregated rows, so
    the single-partition frame is free (never window the fact table
    this way)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_nation = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_nationkey")
        .agg(dsum("o_totalprice").alias("revenue"))
    )
    # total as an exact decimal window sum — a double SUM OVER () is
    # accumulation-order dependent and would break the value hash
    total = (
        F.sum(F.col("revenue").cast("decimal(18,6)"))
        .over(W.partitionBy())
        .cast("double")
    )
    return per_nation.select(
        "c_nationkey",
        "revenue",
        F.round(F.col("revenue") / total, 6).alias("revenue_share"),
    )


def trending_by_day(spark: SparkSession, sf_dir: str, top: int = 3) -> DataFrame:
    """Windowed top-k (trending): the k most frequent event types per
    day, ranked with deterministic tie-breaks — the "what's hot today"
    query over any event stream.  One aggregate (map-side combinable)
    + a rank over the tiny per-day result; the raw stream is never
    window-sorted."""
    from pyspark.sql.window import Window as W

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            F.date_trunc("day", "ts").alias("day"), "event_type"
        ).agg(F.count("*").alias("n"))
    )
    w = W.partitionBy("day").orderBy(F.desc("n"), F.asc("event_type"))
    return (
        daily.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= top)
        .select("day", "rank", "event_type", "n")
    )
