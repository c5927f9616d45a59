"""Data-profiling and sampling operators for large-scale pipeline hygiene.

A 100 TB training-data pipeline needs reproducible sampling, per-column
profiles, distribution statistics, and histograms before any expensive
transform runs.  Everything here follows the repo's cross-engine-exact
policy (see functions/exact.py): deterministic md5-based sampling
instead of RNG `.sample()` (portable across engines, runs, AND
partitionings — a seeded Spark sample changes with the split layout,
which is exactly what you don't want in a reproducible data pipeline),
exact decimal sums for moments, and integer/IEEE-identical bucketing.

Scale notes (local[32] now, 1000 executors later):
- `hash_sample` is a pure narrow filter — no shuffle, pushes the md5
  predicate into the scan stage, and samples the same rows no matter
  how the input is split.
- `column_profile` uses exact count(DISTINCT) per column, which Spark
  executes via Expand (one pass, grouped per distinct-column).  At
  100 TB swap `F.countDistinct` for `F.approx_count_distinct` (HLL,
  single pass, no expand) — kept exact here so the DuckDB oracle can
  hash-match.
- `corr_stats` reduces each group to five decimal sums (map-side
  partial aggregation), then finishes the Pearson/stddev algebra in
  double on the tiny grouped result.  Operand columns (l_discount,
  l_tax ≤ 0.1) keep every scaled sum far below 2^53, so the final
  decimal→double casts are exact in both engines.
- histograms are a single hash aggregate over a computed bucket key.

Reference: none — SURVEY.md §2.8 (the reference engine has no
profiling/sampling surface; this is the LLM-pipeline extension).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from heatmap_spark.functions.exact import dec, dsum
from heatmap_spark.sources.tables import load_table


def _md5_keep(key: Column, hex_prefix_max: str) -> Column:
    """Deterministic sampling predicate: keep rows whose md5 hex prefix
    sorts <= the cutoff.  A 2-char cutoff 'NN' keeps (NN+1)/256 of rows
    uniformly, identically in any engine that has md5."""
    n = len(hex_prefix_max)
    return F.substring(F.md5(key.cast("string")), 1, n) <= hex_prefix_max


def hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% deterministic sample of orders (md5 prefix <= '19' keeps
    26/256), then per-priority sampled counts + exact revenue.  The
    sample is stable under repartitioning — unlike df.sample(seed=..),
    whose output depends on the physical split layout."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.where(_md5_keep(F.col("o_orderkey"), "19"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            dsum("o_totalprice").alias("sampled_revenue"),
        )
    )


_PROFILE_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]


def column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile of orders (row count, nulls, exact distinct,
    min/max as strings) in ONE aggregation pass, unpivoted via stack().
    At 100 TB the exact countDistinct becomes approx_count_distinct."""
    orders = load_table(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in _PROFILE_COLS:
        aggs += [
            F.count(c).alias(f"c_{c}"),
            F.countDistinct(c).alias(f"d_{c}"),
            F.min(c).cast("string").alias(f"mn_{c}"),
            F.max(c).cast("string").alias(f"mx_{c}"),
        ]
    wide = orders.agg(*aggs)
    parts = ", ".join(
        f"'{c}', n, n - c_{c}, d_{c}, mn_{c}, mx_{c}" for c in _PROFILE_COLS
    )
    return wide.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {parts}) AS "
            "(column_name, n_rows, n_nulls, n_distinct, min_value, max_value)"
        )
    )


def corr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation of (l_discount, l_tax) and stddev of
    l_discount per l_linestatus, from five exact decimal sums per group.

    Built-in corr()/stddev() stream double accumulators whose value
    depends on partition order — not reproducible, not oracle-matchable.
    Reducing to exact decimal sums first makes the statistic a pure
    function of the data (identical on 1 core or 1000 executors), and
    the closing algebra runs in double on the already-tiny grouped rows.
    """
    li = load_table(spark, sf_dir, "lineitem")
    x, y = dec("l_discount"), dec("l_tax")
    grouped = li.groupBy("l_linestatus").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    return grouped.select(
        "l_linestatus",
        (
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy))
        ).alias("corr_disc_tax"),
        F.sqrt((sxx - sx * sx / n) / (n - F.lit(1.0))).alias("stddev_disc"),
        (sx / n).alias("avg_disc"),
    )


def price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of o_totalprice (bucket = floor(p/50000)).
    Double division + floor are IEEE-identical across engines; the
    bucket key is computed in the scan stage, so this is one hash
    aggregate with map-side combine."""
    orders = load_table(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / F.lit(50000.0)).cast("int")
    return (
        orders.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("bucket_revenue"),
        )
        .withColumn("bucket_lo", (F.col("bucket") * F.lit(50000.0)))
    )


def doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length distribution per source: bucket = floor(n_chars/200),
    plus each bucket's share of total characters (exact integer sums)."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.floor(F.col("n_chars") / F.lit(200.0)).cast("int")
    return (
        docs.groupBy("source", bucket.alias("len_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


def quantile_binning(
    spark: SparkSession, sf_dir: str, n_bins: int = 10
) -> DataFrame:
    """EXACT equal-frequency binning (the ML QuantileDiscretizer
    pattern, made deterministic and oracle-shareable): per event_type,
    the n_bins−1 boundaries are percentile_disc values — the smallest
    observed value whose cumulative count reaches ceil(j·N/n_bins) —
    and every row is assigned bin = 1 + #(boundaries < value).
    Output: one row per (event_type, bin) with its row count and
    exact [lo, hi] value range.

    Scale shape (the drift family's distinct-value-table argument):
    boundaries come from ONE hash aggregate to the (type, value)
    grain + ONE sorted window over distinct values (not rows) + a
    constant-size explode (n_bins−1 threshold slots per distinct
    value row, pruned immediately); the boundary arrays are n_bins−1
    doubles per type, broadcast back to the row scan; binning itself
    is a native array filter, map-only.  Ties share bins (disc
    semantics), so bins can be uneven under heavy ties — exactly what
    percentile_disc gives, and exactly reproducible cross-engine:
    thresholds use pure integer arithmetic ((j·N + n_bins − 1) DIV
    n_bins), no float ceil.

    At 100 TB: the distinct-value window is the only sort and it
    sorts the value table; quantized/low-cardinality columns are
    cheap, continuous columns can pre-quantize or swap the boundary
    source for the KLL store's approximate grid (kll_store) without
    touching the binning tail.

    Reference: none — SURVEY.md §2.8 (profiling/ML-prep extension).
    """
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    return equal_frequency_bins(ev, n_bins)


def equal_frequency_bins(ev: DataFrame, n_bins: int = 10) -> DataFrame:
    """DataFrame-core of :func:`quantile_binning` over any
    (event_type, value) relation — shared by the registry query and
    the 10M-row scale probe (scripts/scale_probe.py binning).  Plan
    shape and semantics documented on the wrapper."""
    per_val = ev.groupBy("event_type", "value").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    word = W.partitionBy("event_type").orderBy("value")
    wall = W.partitionBy("event_type")
    cum = per_val.select(
        "event_type",
        "value",
        F.sum("cnt").over(word).alias("cum"),
        (F.sum("cnt").over(word) - F.col("cnt")).alias("prev_cum"),
        F.sum("cnt").over(wall).alias("n_total"),
    )
    # distinct value v is the percentile_disc boundary for every j
    # whose threshold T_j = (j*N + nb - 1) DIV nb lands in
    # (prev_cum, cum]; nb is tiny so a constant explode + filter is
    # cheaper than a range join
    j = F.explode(F.sequence(F.lit(1), F.lit(n_bins - 1))).alias("j")
    # `div` is Spark's integer division on longs — exact at any N,
    # matching the oracle's `//`; the earlier F.floor(a / b) spelling
    # routed through DOUBLE division (exact only while j*N+9 < 2^53)
    thr = F.expr(f"(j * n_total + {n_bins - 1}) div {n_bins}")
    bnd = (
        cum.select("event_type", "value", "prev_cum", "cum", "n_total", j)
        .where((F.col("prev_cum") < thr) & (thr <= F.col("cum")))
        .groupBy("event_type")
        .agg(F.array_sort(F.collect_list("value")).alias("bounds"))
    )
    binned = ev.join(F.broadcast(bnd), "event_type").select(
        "event_type",
        "value",
        (
            F.lit(1)
            + F.size(F.filter("bounds", lambda b: b < F.col("value")))
        ).cast("int").alias("bin"),
    )
    return binned.groupBy("event_type", "bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.round(F.min("value"), 6).alias("lo"),
        F.round(F.max("value"), 6).alias("hi"),
    )


def reservoir_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 'reservoir' sample: k=3 events per event_type,
    ranked by md5 of the event id.  Equivalent in distribution to a
    uniform reservoir sample but reproducible across engines, runs, and
    partitionings; executes as one window over a shuffle by group key
    (no driver-side collection, no RNG state)."""
    events = load_table(spark, sf_dir, "events")
    rank_key = F.md5(F.col("event_id").cast("string"))
    w = (
        W.partitionBy("event_type")
        .orderBy(rank_key, "event_id")
    )
    return (
        events.select("event_type", "event_id", "user_id")
        .withColumn("rn", F.row_number().over(w).cast("int"))
        .where(F.col("rn") <= 3)
    )


def hll_user_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable Apache DataSketches HLL distinct-user counts: one
    sketch per event_type plus their lossless union as '__all__'.

    This is the 100 TB cardinality pattern: sketch partials per
    partition / day / type, persist the binary sketches, and merge them
    later without rescanning raw data — `hll_union_agg` over stored
    sketches replaces a full recount.  Estimates are engine-specific
    (DuckDB uses a different HLL), so no cross-engine value oracle can
    exist; declared rows-only.  The exact twin rides the SAME result
    (the ``exact_users`` column), and the query RAISES if any row's
    estimate strays beyond 5 % relative error (3x the ~1.6 % RSE of
    the lgK=12 DataSketches default) — the driver row is a live
    accuracy gate, not just a shape check.  The validation collect is
    group-cardinality sized (#event_types + 1)."""
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count_distinct("user_id").alias("exact_users"),
    )
    per_type = per.select(
        "event_type",
        F.hll_sketch_estimate("sk").alias("approx_users"),
        "exact_users",
    )
    overall = (
        per.agg(F.hll_union_agg("sk").alias("sku"))
        .crossJoin(ev.agg(F.count_distinct("user_id").alias("exact_users")))
        .select(
            F.lit("__all__").alias("event_type"),
            F.hll_sketch_estimate("sku").alias("approx_users"),
            "exact_users",
        )
    )
    out = per_type.unionByName(overall).localCheckpoint(eager=True)
    bad = out.where(
        F.abs(F.col("approx_users") - F.col("exact_users"))
        > 0.05 * F.col("exact_users")
    ).count()
    if bad:
        raise AssertionError(
            f"HLL estimate strayed beyond 5% relative error vs the exact "
            f"twin for {bad} row(s)"
        )
    return out


def run_with_metrics(df, metrics, action=None):
    """Single-pass pipeline observability via ``df.observe``: attach
    named aggregate metrics to a plan, run the action once, and read
    the metrics back — no second scan.

    At 100 TB a separate "count the nulls we just wrote" query doubles
    the IO; observed metrics ride the same pass (computed inside the
    executors, merged on the driver).  ``metrics`` maps name → aggregate
    Column; returns the metric dict after running ``action`` (default:
    noop-sink write, i.e. full materialization).
    """
    from pyspark.sql import Observation

    obs = Observation()
    observed = df.observe(obs, *[c.alias(k) for k, c in metrics.items()])
    if action is None:
        observed.write.format("noop").mode("overwrite").save()
    else:
        action(observed)
    return obs.get


def regression_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type OLS trend of value over time: slope (value units
    per minute), intercept at t0 = 2024-01-01, and R².

    Like ``corr_stats``, the statistic is reduced to exact decimal sums
    (x = integer minutes since 2024-01-01, y = value cast to decimal)
    so the five operands are pure functions of the data — identical on
    any partitioning — and the closing OLS algebra runs in double on
    one tiny row per group.  Built-in regr_slope/regr_intercept stream
    double accumulators whose value depends on partition order, which
    can't hash-match an oracle and isn't reproducible run-to-run at
    100 TB either.

    Reference: none — SURVEY.md §2.8 (profiling extension).
    """
    ev = load_table(spark, sf_dir, "events")
    # minutes since 2024-01-01 00:00 UTC; session TZ is pinned UTC by
    # load_table so unix_timestamp is the true epoch
    x = (F.floor(F.unix_timestamp("ts") / 60) - F.lit(28401120)).cast(
        "decimal(18,0)"
    )
    y = dec("value")
    grouped = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    r_num = n * sxy - sx * sy
    r_den = F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    return grouped.select(
        "event_type",
        slope.alias("slope_per_min"),
        ((sy - slope * sx) / n).alias("intercept"),
        ((r_num / r_den) * (r_num / r_den)).alias("r2"),
        n.cast("long").alias("n_events"),
    )


def bitmap_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per event type via Spark 4 bitmap
    aggregates: bucket each user_id into a 32k-bit bitmap
    (bitmap_bucket_number/bitmap_bit_position), OR the bitmaps per
    (type, bucket) with bitmap_construct_agg, then sum the popcounts.

    Versus COUNT(DISTINCT): no Expand, and the shuffled state per
    (type, bucket) is one 4 KB bitmap instead of one row per distinct
    value — the classic bitmap-index distinct for high-cardinality
    keys at 100 TB.  Exact, so the oracle is plain COUNT(DISTINCT).

    Reference: none — SURVEY.md §2.8 (distinct/approx-distinct family).
    """
    ev = load_table(spark, sf_dir, "events")
    per_bucket = ev.groupBy(
        "event_type",
        F.expr("bitmap_bucket_number(user_id)").alias("bucket"),
    ).agg(
        F.expr(
            "bitmap_count(bitmap_construct_agg(bitmap_bit_position(user_id)))"
        ).alias("cnt")
    )
    return per_bucket.groupBy("event_type").agg(
        F.sum("cnt").alias("distinct_users")
    )


def file_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-input-file audit via Spark's hidden ``_metadata`` column:
    file name, row count, and key extrema for the orders and lineitem
    scans.

    ``_metadata`` is populated by the file source at scan time — no
    extra read, no UDF — which is how a 100 TB pipeline attributes bad
    rows back to the file (and retention/compaction decisions to row
    counts) without a separate listing job.  The oracle reads the same
    files with DuckDB's filename=true.
    """
    rows = []
    for name, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        df = load_table(spark, sf_dir, name)
        rows.append(
            df.groupBy(
                F.lit(name).alias("table_name"),
                F.col("_metadata.file_name").alias("file_name"),
            ).agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.min(key).alias("min_key"),
                F.max(key).alias("max_key"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def theta_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable Theta-sketch set operations (Spark 4.1 DataSketches
    surface): per event_type user sketches, then union / intersection /
    difference ESTIMATES between every ordered pair of event types —
    the audience-overlap question ("users who viewed AND clicked")
    answered without a shuffle of raw ids per pair.

    100 TB shape: theta sketches are partial-aggregated map-side and
    merged associatively, so per-segment sketches can be persisted once
    and every pairwise overlap computed from the tiny sketch blobs —
    set EXPRESSIONS over sketches replace COUNT(DISTINCT) joins.

    Oracle-checkability: a theta sketch with default lgK=12 is EXACT
    below ~4096 distinct items; the fixture's per-type user counts sit
    far under that, so estimates equal exact set cardinalities and the
    DuckDB oracle computes them with plain COUNT(DISTINCT) set algebra.
    assert_true guards the precondition LOUDLY (same pattern as
    q_approx_top_k) instead of letting a grown fixture silently
    diverge.

    Reference: none — SURVEY.md §2.8 (sketch/profiling extension).
    """
    ev = load_table(spark, sf_dir, "events")
    guard = ev.agg(
        F.assert_true(
            F.count_distinct("user_id") < F.lit(4000),
            F.lit("theta exactness precondition: NDV(user_id) too high"),
        ).alias("g")
    )
    per = ev.groupBy("event_type").agg(F.theta_sketch_agg("user_id").alias("sk"))
    a = per.select(F.col("event_type").alias("type_a"), F.col("sk").alias("sk_a"))
    b = per.select(F.col("event_type").alias("type_b"), F.col("sk").alias("sk_b"))
    pairs = a.join(b, F.col("type_a") < F.col("type_b"))
    return (
        pairs.join(guard, F.col("g").isNull(), "left")
        .select(
            "type_a",
            "type_b",
            F.theta_sketch_estimate(F.theta_union("sk_a", "sk_b"))
            .cast("bigint")
            .alias("union_users"),
            F.theta_sketch_estimate(F.theta_intersection("sk_a", "sk_b"))
            .cast("bigint")
            .alias("common_users"),
            F.theta_sketch_estimate(F.theta_difference("sk_a", "sk_b"))
            .cast("bigint")
            .alias("only_a_users"),
        )
    )


def kll_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable KLL quantile sketches per event_type: p50/p90/p99 of
    `value` from one sketch aggregate, plus the stream length the
    sketch saw (get_n — always exact).

    Like the HLL query this is declared rows-only (KLL is a randomized
    compactor; estimates are engine-specific — no cross-engine value
    oracle can exist), with the rank-error bound pinned in tests
    against exact percentile_cont.  In-query the driver row is kept a
    live gate by RAISING on three invariants that hold at ANY scale
    without a data-sized sort: (1) ``n_seen`` must equal the exact
    per-group count of non-null values (get_n is exact by the KLL
    contract); (2) quantiles are monotone p50 <= p90 <= p99;
    (3) every quantile lies inside the exact [min, max] of the group
    (KLL returns only values it saw).  The point is the LIFECYCLE:
    per-partition sketch partials merge associatively, so per-day
    sketches persist once and any later quantile query is
    sketch-merge-sized, not data-sized.

    Reference: none — SURVEY.md §2.8 (sketch/profiling extension).
    """
    ev = load_table(spark, sf_dir, "events")
    sk = ev.groupBy("event_type").agg(
        F.kll_sketch_agg_double("value").alias("sk"),
        F.count("value").alias("exact_n"),
        F.min("value").alias("exact_min"),
        F.max("value").alias("exact_max"),
    )
    out = sk.select(
        "event_type",
        F.kll_sketch_get_n_double("sk").alias("n_seen"),
        F.round(F.kll_sketch_get_quantile_double("sk", F.lit(0.5)), 6).alias("p50"),
        F.round(F.kll_sketch_get_quantile_double("sk", F.lit(0.9)), 6).alias("p90"),
        F.round(F.kll_sketch_get_quantile_double("sk", F.lit(0.99)), 6).alias("p99"),
        "exact_n",
        F.round("exact_min", 6).alias("exact_min"),
        F.round("exact_max", 6).alias("exact_max"),
    ).localCheckpoint(eager=True)
    bad = out.where(
        (F.col("n_seen") != F.col("exact_n"))
        | (F.col("p50") > F.col("p90"))
        | (F.col("p90") > F.col("p99"))
        | (F.col("p50") < F.col("exact_min"))
        | (F.col("p99") > F.col("exact_max"))
    ).count()
    if bad:
        raise AssertionError(
            f"KLL invariant (exact n / monotone quantiles / [min,max] "
            f"envelope) violated for {bad} group(s)"
        )
    return out.select("event_type", "n_seen", "p50", "p90", "p99")


def data_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality validation suite (the Deequ/Great-
    Expectations pattern as plain aggregates): one row per check with
    (check_name, n_checked, n_violations, passed).

    Checks: key uniqueness (orders), domain range (lineitem quantity),
    non-null (customer key), referential integrity orders→customer
    (broadcast-friendly anti-join count), cross-column consistency
    (documents n_chars vs length(text)), and non-empty text.

    Every check is a conditional aggregate over ONE scan of its table
    (count + count_if — map-side combinable), except referential
    integrity which is one anti-join; the union of one-row results is
    driver-free.  At 100 TB this is the nightly contract gate that
    runs BEFORE data reaches training pipelines.

    Reference: none — SURVEY.md §2.8 (profiling/validation extension).
    """
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    customer = load_table(spark, sf_dir, "customer")
    docs = load_table(spark, sf_dir, "documents")

    def check(name: str, agg_df: DataFrame) -> DataFrame:
        return agg_df.select(
            F.lit(name).alias("check_name"),
            F.col("n_checked").cast("bigint").alias("n_checked"),
            F.col("n_violations").cast("bigint").alias("n_violations"),
            (F.col("n_violations") == 0).alias("passed"),
        )

    unique_orders = check(
        "orders.o_orderkey unique",
        orders.agg(
            F.count("*").alias("n_checked"),
            (F.count("*") - F.count_distinct("o_orderkey")).alias("n_violations"),
        ),
    )
    qty_range = check(
        "lineitem.l_quantity in [1,50]",
        lineitem.agg(
            F.count("*").alias("n_checked"),
            F.count_if(
                ~F.col("l_quantity").between(1, 50)
            ).alias("n_violations"),
        ),
    )
    cust_notnull = check(
        "customer.c_custkey not null",
        customer.agg(
            F.count("*").alias("n_checked"),
            F.count_if(F.col("c_custkey").isNull()).alias("n_violations"),
        ),
    )
    fk = check(
        "orders.o_custkey references customer",
        orders.select("o_custkey")
        .join(
            customer.select(F.col("c_custkey").alias("o_custkey")),
            "o_custkey",
            "left_anti",
        )
        .agg(F.count("*").alias("n_violations"))
        .crossJoin(orders.agg(F.count("*").alias("n_checked"))),
    )
    chars_consistent = check(
        "documents.n_chars = length(text)",
        docs.agg(
            F.count("*").alias("n_checked"),
            F.count_if(
                F.col("n_chars") != F.length("text")
            ).alias("n_violations"),
        ),
    )
    nonempty = check(
        "documents.text non-empty",
        docs.agg(
            F.count("*").alias("n_checked"),
            F.count_if(F.length("text") == 0).alias("n_violations"),
        ),
    )
    out = unique_orders
    for c in (qty_range, cust_notnull, fk, chars_consistent, nonempty):
        out = out.unionByName(c)
    return out


def zscore_outliers(spark: SparkSession, sf_dir: str, threshold: float = 3.0) -> DataFrame:
    """Per-type z-score anomalies: events whose value deviates from the
    type mean by ≥ threshold standard deviations.

    Moments follow the exact policy (functions/exact): sum and
    sum-of-squares accumulate in DECIMAL (order-independent — identical
    on any partitioning or engine), converting to DOUBLE only for the
    final mean/std, so z-scores are bit-reproducible and the oracle
    hash-matches.  The tiny per-type moment table broadcasts back onto
    the event stream — one aggregate + one broadcast join, no window.
    """
    from heatmap_spark.functions.exact import dec

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    stats = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(dec("value")).cast("double").alias("s1"),
        F.sum(dec("value") * dec("value")).cast("double").alias("s2"),
    )
    mean = F.col("s1") / F.col("n")
    var = F.col("s2") / F.col("n") - mean * mean
    enriched = ev.join(
        F.broadcast(
            stats.select(
                "event_type", mean.alias("mean"), F.sqrt(var).alias("std")
            )
        ),
        "event_type",
    )
    z = (F.col("value") - F.col("mean")) / F.col("std")
    return (
        enriched.where(F.abs(z) >= threshold)
        .select(
            "event_type",
            "event_id",
            F.round("value", 6).alias("value"),
            F.round(z, 6).alias("z"),
        )
    )


def weighted_sample(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k per source group, via
    the Efraimidis-Spirakis A-ES key (PIPS 2006): each item draws
    u ∈ (0,1) and ranks by key = ln(u)/w — the top-k by key are a
    weighted sample without replacement (heavier docs proportionally
    likelier), computed as ONE map-side key projection + a per-group
    top-k.  No rejection loops, no sequential draws — the distributed
    form of weighted reservoir sampling.

    u is hash-derived (md5 of doc_id → uniform 48-bit), so the sample
    is deterministic and rerun-reproducible like mixing_sample; the
    key is rounded to 6 decimals before ranking with doc_id tiebreak,
    making the ordering engine-portable (raw ln/pow ulp differences
    cannot flip ranks).  Weight = n_chars (longer docs favored — the
    token-budget-proportional choice a corpus sampler makes).
    """
    docs = load_table(spark, sf_dir, "documents")
    u = (
        (
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10
            ).cast("bigint")
            + 1
        ).cast("double")
        / float((1 << 48) + 1)
    )
    key = F.round(F.log(u) / F.col("n_chars"), 6)
    from pyspark.sql.window import Window as W

    w = W.partitionBy("source").orderBy(F.desc("es_key"), F.asc("doc_id"))
    return (
        docs.select("doc_id", "source", "n_chars", key.alias("es_key"))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("source", "rank", "doc_id", "n_chars", "es_key")
    )


def cms_cells(tok: DataFrame, depth: int = 4, width: int = 256) -> DataFrame:
    """Build the CMS counter grid from a (token) occurrence stream:
    (j, col, cnt) rows, ≤ depth·width of them regardless of input
    size.  h_j = (h1 + j·h2) mod width off one md5 per occurrence
    (Kirsch-Mitzenmacher).  The grid is MERGEABLE: cellwise sum of two
    grids ≡ the grid of the concatenated streams — the property the
    streaming store and any map-side partial aggregation rely on."""
    h = F.md5(F.col("token"))
    hashed = tok.select(
        F.conv(F.substring(h, 1, 12), 16, 10).cast("bigint").alias("h1"),
        F.conv(F.substring(h, 13, 12), 16, 10).cast("bigint").alias("h2"),
    )
    rows_j = F.explode(F.array(*[F.lit(j) for j in range(depth)])).alias("j")
    return (
        hashed.select("h1", "h2", rows_j)
        .select("j", ((F.col("h1") + F.col("j") * F.col("h2")) % width).alias("col"))
        .groupBy("j", "col")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def cms_heavy_hitters(
    spark: SparkSession,
    sf_dir: str,
    depth: int = 4,
    width: int = 256,
    k: int = 20,
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan '05) over the document
    token stream, audited against exact counts for the true top-``k``
    tokens: est(t) = min_j cell[j][h_j(t)] with h_j = (h1 + j·h2) mod
    width (Kirsch-Mitzenmacher double hashing off ONE md5 per token,
    the same trick the MinHash path uses).  CMS guarantees
    est >= true; the ``overestimate`` column is the realized error.

    Scale shape: the sketch is a FIXED depth x width counter grid
    (1024 cells here) regardless of corpus size — the build is one
    hash aggregate whose map-side partials are each ≤1024 rows, so the
    shuffle moves O(partitions · cells), not O(tokens).  Estimation
    broadcasts the tiny cell grid onto the candidates.  Mergeability
    (sketch(A ∪ B) = cellwise sketch(A)+sketch(B)) is what makes this
    the standard distributed/streaming frequency summary.

    Reference: none — SURVEY.md §2.8 sketch family (HLL, KLL, theta,
    bitmap) extension.
    """
    from heatmap_spark.operators.textops import _all_tokens

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(_all_tokens()).alias("token"))
    rows_j = F.explode(F.array(*[F.lit(j) for j in range(depth)])).alias("j")
    cells = cms_cells(tok, depth, width)
    true_cnt = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("true_cnt"))
        .orderBy(F.desc("true_cnt"), F.asc("token"))
        .limit(k)
    )
    ch = F.md5(F.col("token"))
    cand = true_cnt.select(
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
        )
        .groupBy("token", "true_cnt")
        .agg(F.min("cnt").alias("cms_est"))
    )
    return est.select(
        "token",
        F.col("true_cnt").cast("bigint").alias("true_cnt"),
        F.col("cms_est").cast("bigint").alias("cms_est"),
        (F.col("cms_est") - F.col("true_cnt")).cast("bigint").alias("overestimate"),
    )


def winsorized_stats(
    spark: SparkSession, sf_dir: str, lo: float = 0.05, hi: float = 0.95
) -> DataFrame:
    """Winsorized (clamped-tail) robust statistics per event_type: clamp
    values to the exact [p05, p95] continuous quantiles, then report
    the winsorized mean alongside tail-clamp counts — the outlier-
    robust companion to zscore_outliers (which FLAGS tails, while this
    BOUNDS their influence, the standard pre-normalization step for
    noisy telemetry/quality signals).

    Exactness: quantiles via Spark `percentile` ≡ DuckDB
    `quantile_cont` (the q_percentiles parity); each clamped value is
    rounded to 6 decimals and summed as DECIMAL so the mean is
    bit-identical on any partitioning.  Two passes: one tiny per-type
    quantile aggregate broadcast back, one clamp+sum aggregate.
    """
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    q = ev.groupBy("event_type").agg(
        F.expr(f"percentile(value, CAST({lo} AS DOUBLE))").alias("p_lo"),
        F.expr(f"percentile(value, CAST({hi} AS DOUBLE))").alias("p_hi"),
    )
    j = ev.join(F.broadcast(q), "event_type")
    clamped = F.least(F.greatest(F.col("value"), F.col("p_lo")), F.col("p_hi"))
    cdec = F.round(clamped, 6).cast("decimal(18,6)")
    return (
        j.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.first("p_lo"), 6).alias("p_lo"),
            F.round(F.first("p_hi"), 6).alias("p_hi"),
            (F.sum(cdec).cast("double") / F.count(F.lit(1))).alias("wmean"),
            F.sum((F.col("value") < F.col("p_lo")).cast("int"))
            .cast("int")
            .alias("n_clamped_lo"),
            F.sum((F.col("value") > F.col("p_hi")).cast("int"))
            .cast("int")
            .alias("n_clamped_hi"),
        )
        .select(
            "event_type", "n", "p_lo", "p_hi",
            F.round("wmean", 6).alias("wmean"),
            "n_clamped_lo", "n_clamped_hi",
        )
    )


def corpus_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row corpus DATACARD (the summary block a dataset release
    ships): document/token/char totals, language count and Shannon
    entropy of the language mix (bits — the diversity number), and the
    exact-duplicate rate (md5 of the token-normalized text, the
    dedup_exact signal).

    Exactness: counts are integers; each language's −p·log2 p term is
    rounded to 6 decimals and summed as DECIMAL (order-independent,
    the unigram-LM policy), so even the entropy value hashes.

    Scale shape: one pass for the per-doc summary, two map-side-
    combinable aggregates (per-lang, per-fingerprint) and a final
    single-row combine — no sorts, no windows over the corpus.
    """
    from heatmap_spark.operators.dedup import tokens_expr

    docs = load_table(spark, sf_dir, "documents")
    all_toks = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda t: t != ""
    )
    base = docs.select(
        "doc_id",
        "lang",
        F.col("n_chars"),
        F.size(all_toks).cast("bigint").alias("n_tokens"),
        # tokens_expr() is already the DISTINCT token set
        F.md5(F.concat_ws(" ", F.array_sort(tokens_expr()))).alias("fp"),
    )
    totals = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )
    lang = base.groupBy("lang").agg(F.count(F.lit(1)).alias("c"))
    n_docs_w = F.sum("c").over(W.partitionBy())
    p = F.col("c") / n_docs_w
    ent_term = F.round(-p * F.log2(p), 6).cast("decimal(18,6)")
    lang_sum = lang.select(ent_term.alias("t"), F.lit(1).alias("one")).groupBy(
        "one"
    ).agg(
        F.count(F.lit(1)).cast("int").alias("n_langs"),
        F.sum("t").cast("double").alias("lang_entropy_bits"),
    )
    dups = (
        base.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("n_exact_dup_docs")
        )
    )
    return (
        totals.crossJoin(F.broadcast(lang_sum.drop("one")))
        .crossJoin(F.broadcast(dups))
        .select(
            "n_docs",
            "total_tokens",
            "total_chars",
            F.round(F.col("total_tokens").cast("double") / F.col("n_docs"), 6).alias(
                "avg_tokens"
            ),
            "n_langs",
            F.round("lang_entropy_bits", 6).alias("lang_entropy_bits"),
            "n_exact_dup_docs",
            F.round(
                F.col("n_exact_dup_docs").cast("double") / F.col("n_docs"), 6
            ).alias("dup_rate"),
        )
    )


def annotator_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-annotator agreement (Cohen's kappa, 1960 — public method)
    over binary document labels: the label-quality gate preference /
    RLHF data runs before training on human judgments.  One row per
    annotator pair with the observed agreement p_o, chance agreement
    p_e, and kappa.

    The three synthetic annotators are deterministic md5 derivations:
    annotator 0 is the base signal (md5 parity of doc_id); annotators
    1 and 2 flip the base label on ~10% / ~20% of docs (md5-keyed),
    so expected kappa degrades with noise — the structure the metric
    exists to expose.  Swapping in real labels changes one select.

    Determinism: every count is an exact integer; kappa reduces to a
    SINGLE division of exact bigints —
        kappa = (n·agree − X) / (n² − X),
        X = n_a1·n_b1 + n_a0·n_b0
    (multiply (p_o − p_e)/(1 − p_e) through by n²), so the only float
    op is one IEEE division, bit-identical cross-engine, then round(9).

    Scale shape: one map-only label derivation fused into the scan,
    ONE aggregate row for the whole corpus (all pairwise sums in a
    single reduce with map-side combine), constant-sized thereafter.

    Reference: none — SURVEY.md §2.8 extension (preference-data
    quality evaluation).
    """
    docs = load_table(spark, sf_dir, "documents")

    def h(col: Column) -> Column:
        return F.conv(F.substring(F.md5(col), 1, 6), 16, 10).cast("bigint")

    did = F.col("doc_id").cast("string")
    base = (h(did) % 2).cast("int")
    flips = [
        F.lit(0),
        (h(F.concat(F.lit("ann1:"), did)) % 100 < 10).cast("int"),
        (h(F.concat(F.lit("ann2:"), did)) % 100 < 20).cast("int"),
    ]
    labeled = docs.select(
        *[
            ((base + flips[i]) % 2).alias(f"l{i}")
            for i in range(3)
        ]
    )
    agg = labeled.agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(f"l{i}").alias(f"s{i}") for i in range(3)],
        *[
            F.sum((F.col(f"l{a}") == F.col(f"l{b}")).cast("long")).alias(
                f"agree{a}{b}"
            )
            for a, b in ((0, 1), (0, 2), (1, 2))
        ],
    )

    def pair_struct(a: int, b: int) -> Column:
        # exact integer arithmetic in decimal(38,0) — n² would overflow
        # bigint beyond ~3e9 docs — then ONE double division per metric
        def d(c: Column) -> Column:
            return c.cast("decimal(38,0)")

        n = F.col("n")
        sa, sb = F.col(f"s{a}"), F.col(f"s{b}")
        agree = F.col(f"agree{a}{b}")
        x = d(sa) * d(sb) + d(n - sa) * d(n - sb)
        n2 = d(n) * d(n)
        kap_den = n2 - x
        return F.struct(
            F.lit(f"ann{a}-ann{b}").alias("pair"),
            n.cast("bigint").alias("n"),
            agree.cast("bigint").alias("n_agree"),
            F.round(agree.cast("double") / n.cast("double"), 9).alias("p_o"),
            F.round(x.cast("double") / n2.cast("double"), 9).alias("p_e"),
            F.round(
                F.when(kap_den == d(F.lit(0)), F.lit(0.0)).otherwise(
                    (d(n) * d(agree) - x).cast("double")
                    / kap_den.cast("double")
                ),
                9,
            ).alias("kappa"),
        )

    # all three pairs projected from ONE aggregate row in one plan —
    # unioning three selects over the same (uncached) agg would rescan
    # the corpus three times per materialization
    pairs = F.array(*[pair_struct(a, b) for a, b in ((0, 1), (0, 2), (1, 2))])
    return agg.select(F.explode(pairs).alias("r")).select("r.*")


# ---------------------------------------------------------------------------
# Portable HLL: deterministic md5-register HyperLogLog (cross-engine exact)
# ---------------------------------------------------------------------------

_HLL_P = 8  # 2^8 = 256 registers
_HLL_M = 1 << _HLL_P
_HLL_WBITS = 56  # md5 bits after the bucket prefix used for rho
_HLL_SCALE = 1 << (_HLL_WBITS + 1)  # 2^57: exact-integer scale for Σ 2^-rho


def _hll_alpha() -> Column:
    """alpha_256 as the SAME IEEE expression tree the oracle writes:
    0.7213 / (1.0 + 1.079 / 256.0) — every literal a double."""
    return F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(256.0))


def hll_register_table(
    df: DataFrame, key: Column | str, group_cols: list[str]
) -> DataFrame:
    """(group..., bucket, rho) register table of a from-scratch
    HyperLogLog with p=8 — the sketch ITSELF, not an opaque binary.

    Flajolet HLL over a portable hash: h = md5(string(key)); the first
    2 hex chars are the bucket (0..255), the next 14 hex chars are a
    56-bit value w, and rho = (leading zeros of w in 56 bits) + 1 =
    57 - bit_length(w), computed as integer string-length of bin(w) —
    no float log2, so the register values are EXACTLY reproducible in
    any engine with md5 + bin (DuckDB oracle mirrors them bit-for-bit,
    unlike `hll_sketch_agg`'s engine-private binary, which is why
    q_hll_sketches is rows-only but q_hll_portable carries a full
    value hash).

    The register table is the persistence/merge unit: ≤256 rows per
    group regardless of input size, merged by max(rho) per bucket —
    commutative, associative, idempotent, so partial sketches from any
    partitioning (per-day, per-file, per-executor) union into the same
    registers the one-shot build produces.  At 100 TB: sketch each
    ingest partition once, store 256-row register tables, and answer
    cardinality queries (and their unions) without ever rescanning.
    """
    key = F.col(key) if isinstance(key, str) else key
    h = F.md5(key.cast("string"))
    bucket = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
    w = F.conv(F.substring(h, 3, 14), 16, 10).cast("bigint")
    rho = (
        F.when(w == 0, F.lit(_HLL_WBITS + 1))
        .otherwise(F.lit(_HLL_WBITS + 1) - F.length(F.bin(w)))
        .cast("int")
    )
    return (
        df.select(*group_cols, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """Cardinality estimate off a register table: raw harmonic-mean
    estimate with Flajolet's small-range linear-counting correction.

    Σ 2^-rho is computed EXACTLY: each register contributes the integer
    2^(57-rho) (bigint shift), absent registers contribute 2^57, and
    the decimal-summed total is divided by 2^57 only after the single
    cast to double — order-independent, so the estimate is bit-identical
    on any partitioning and in the DuckDB oracle."""
    two57 = F.lit(_HLL_SCALE).cast("decimal(20,0)")
    est = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("int").alias("registers_set"),
        F.sum(
            F.expr(
                f"CAST(shiftleft(CAST(1 AS BIGINT), {_HLL_WBITS + 1} - rho)"
                " AS DECIMAL(20,0))"
            )
        ).alias("s_present"),
    )
    zeros = (F.lit(_HLL_M) - F.col("registers_set")).cast("int")
    s = (F.col("s_present") + zeros.cast("decimal(20,0)") * two57).cast("double")
    raw = _hll_alpha() * F.lit(float(_HLL_M * _HLL_M)) / (s / F.lit(float(_HLL_SCALE)))
    linear = F.lit(float(_HLL_M)) * F.log(F.lit(float(_HLL_M)) / zeros.cast("double"))
    users = F.when(
        (raw <= F.lit(2.5 * _HLL_M)) & (zeros > 0), linear
    ).otherwise(raw)
    return est.select(
        *group_cols,
        F.round(users, 4).alias("hll_users"),
        "registers_set",
    )


def hll_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared query (q_hll_portable): per-event-type distinct-user
    estimates from the portable register-table HLL, plus the lossless
    register-max union as '__all__', each beside the exact count.

    The union row is the mergeability demonstration: '__all__' is NOT
    re-sketched from raw data — its registers are max(rho) over the
    per-type register tables (256-row inputs), exactly how stored
    partial sketches combine at 100 TB.  Every value is deterministic
    (md5 registers + exact-integer harmonic sum), so the driver
    value-hashes estimates AND register counts against DuckDB."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    regs = hll_register_table(ev, "user_id", ["event_type"])
    merged = (
        regs.groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
        .select(F.lit("__all__").alias("event_type"), "bucket", "rho")
    )
    est = hll_estimate(regs.unionByName(merged), ["event_type"])
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users")
    )
    exact_all = ev.agg(
        F.count_distinct("user_id").alias("exact_users")
    ).select(F.lit("__all__").alias("event_type"), "exact_users")
    exact_u = exact.unionByName(exact_all)
    return est.join(exact_u, "event_type").select(
        "event_type",
        F.col("exact_users").cast("bigint").alias("exact_users"),
        "hll_users",
        "registers_set",
    )


def mad_outliers(
    spark: SparkSession, sf_dir: str, cutoff: float = 3.5
) -> DataFrame:
    """Robust per-type outlier detection: the Iglewicz–Hoaglin modified
    z-score 0.6745·(x − median)/MAD with the standard 3.5 cutoff.

    `zscore_outliers` (PLANS.md §21) breaks down exactly when it
    matters — heavy outliers inflate the stddev they are tested
    against — while median/MAD has a 50% breakdown point; together they
    are the parametric/robust pair every data-quality suite ships.

    Scale shape: three scan passes with NO data shuffle — each
    statistics relation is ≤ |event_types| rows and broadcasts back
    onto the stream (the "broadcast the statistics, not the stream"
    argument of §21).  The exact medians are the oracle-checkable
    choice; at 100 TB swap them for approx_percentile and the plan
    shape is unchanged.  Medians are rounded to 9 decimals BEFORE the
    deviation pass so every downstream comparison is cross-engine
    bit-identical; mad == 0 (≥50% duplicated values) yields NULL robust
    scores, counted as non-outliers in both engines."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.round(F.median("value"), 9).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        "value",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("event_type").agg(
        F.round(F.median("adev"), 9).alias("mad")
    )
    rz = F.when(
        F.col("mad") != 0,
        F.lit(0.6745) * (F.col("value") - F.col("med")) / F.col("mad"),
    )
    flagged = dev.join(F.broadcast(mad), "event_type").select(
        "event_type", "med", "mad", rz.alias("rz")
    )
    return (
        flagged.groupBy("event_type", "med", "mad")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.when(F.abs("rz") > cutoff, 1).otherwise(0))
            .cast("bigint")
            .alias("n_outliers"),
        )
        .select(
            "event_type",
            "med",
            "mad",
            "n",
            "n_outliers",
            F.round(
                F.col("n_outliers").cast("double") / F.col("n").cast("double"), 6
            ).alias("outlier_share"),
        )
    )


# ---------------------------------------------------------------------------
# Portable KMV (k-minimum values) sketch: set-operation estimates
# ---------------------------------------------------------------------------

_KMV_K = 64
_KMV_SCALE = float(1 << 48)  # md5 48-bit prefix → [0, 1)


def kmv_hashes(df: DataFrame, key: Column | str, group_cols: list[str]) -> DataFrame:
    """(group..., hv): DISTINCT portable hash values per group — the
    KMV sketch is the k smallest of these.  hv is the 48-bit md5
    prefix as bigint (exact in any engine; ties impossible below
    ~2^24 distinct keys by birthday bound, and identical cross-engine
    even when they happen)."""
    key = F.col(key) if isinstance(key, str) else key
    hv = F.conv(F.substring(F.md5(key.cast("string")), 1, 12), 16, 10).cast(
        "bigint"
    )
    return df.select(*group_cols, hv.alias("hv")).distinct()


def kmv_audience_overlap(
    spark: SparkSession, sf_dir: str, k: int = _KMV_K
) -> DataFrame:
    """Declared query (q_kmv_overlap): pairwise audience union and
    intersection ESTIMATES per event-type pair from k-minimum-values
    sketches (Beyer et al. 2007 / the theta-sketch construction),
    beside the exact counts.

    Unlike `theta_audience_overlap` (exact below DataSketches
    capacity), this is a REAL estimator whose estimates value-hash:
    the sketch of a set is its k smallest md5 values — deterministic,
    mergeable (union sketch = k smallest of the concatenated sketches)
    and fully reproducible in SQL.  Estimators:

        distinct(A)   ≈ (k−1) / r_k            (r_k = kth smallest /2^48)
        union(A,B)    ≈ (k−1) / r_k(merged)
        jaccard(A,B)  ≈ |merged_k ∩ A_k ∩ B_k| / k
        inter(A,B)    ≈ jaccard · union

    Scale shape: the per-group top-k is a WindowGroupLimit (partial
    top-k BEFORE the exchange — only k rows per group per partition
    move); everything after runs on k-row relations.  At 100 TB you
    persist the 64-row sketches per type/day and answer any pairwise
    overlap later without touching raw events — the same
    store-the-sketch argument as the portable HLL, extended from
    cardinality to SET ALGEBRA."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    hashes = kmv_hashes(ev, "user_id", ["event_type"]).localCheckpoint(
        eager=True
    )
    w = W.partitionBy("event_type").orderBy("hv")
    sk = hashes.select(
        "event_type", "hv", F.row_number().over(w).alias("rn")
    ).where(F.col("rn") <= k)

    a = sk.select(
        F.col("event_type").alias("type_a"), F.col("hv").alias("hv")
    )
    b = sk.select(
        F.col("event_type").alias("type_b"), F.col("hv").alias("hv")
    )
    pairs = (
        a.select("type_a")
        .distinct()
        .join(b.select("type_b").distinct(), F.col("type_a") < F.col("type_b"))
    )
    # merged candidate hashes per pair: union of the two k-sets with
    # membership flags (a hash can sit in both sketches)
    cand = (
        pairs.join(a, "type_a")
        .select("type_a", "type_b", "hv", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
        .unionByName(
            pairs.join(b, "type_b").select(
                "type_a", "type_b", "hv", F.lit(0).alias("in_a"), F.lit(1).alias("in_b")
            )
        )
        .groupBy("type_a", "type_b", "hv")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    wm = W.partitionBy("type_a", "type_b").orderBy("hv")
    merged = cand.select(
        "type_a", "type_b", "hv", "in_a", "in_b",
        F.row_number().over(wm).alias("rn"),
    ).where(F.col("rn") <= k)
    est = merged.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).alias("m"),
        F.max(F.when(F.col("rn") == k, F.col("hv"))).alias("kth"),
        F.sum(
            F.when((F.col("in_a") == 1) & (F.col("in_b") == 1), 1).otherwise(0)
        ).alias("shared"),
    )
    # fewer than k merged values ⇒ the sketch IS the union (exact)
    union_est = F.when(
        F.col("m") < k, F.col("m").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) / (F.col("kth").cast("double") / F.lit(_KMV_SCALE))
    )
    jacc = F.col("shared").cast("double") / F.col("m").cast("double")
    exact = (
        ev.select("event_type", "user_id")
        .distinct()
        .groupBy("user_id")
        .agg(F.collect_set("event_type").alias("types"))
    )
    # exact pairwise counts from one aggregate (types per user)
    ex = (
        exact.select(F.explode("types").alias("type_a"), "types")
        .select("type_a", F.explode("types").alias("type_b"))
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_inter"))
    )
    ex_card = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("nd")
    )
    out = (
        est.join(ex, ["type_a", "type_b"], "left")
        .join(
            ex_card.select(F.col("event_type").alias("type_a"), F.col("nd").alias("nd_a")),
            "type_a",
        )
        .join(
            ex_card.select(F.col("event_type").alias("type_b"), F.col("nd").alias("nd_b")),
            "type_b",
        )
    )
    return out.select(
        "type_a",
        "type_b",
        F.round(union_est, 4).alias("union_est"),
        F.round(F.round(jacc, 9) * F.round(union_est, 4), 4).alias("inter_est"),
        (F.col("nd_a") + F.col("nd_b") - F.coalesce("exact_inter", F.lit(0)))
        .cast("bigint")
        .alias("exact_union"),
        F.coalesce("exact_inter", F.lit(0)).cast("bigint").alias("exact_inter"),
    )


def drift_report(spark: SparkSession, sf_dir: str, n_bins: int = 10) -> DataFrame:
    """Distribution-drift report between the first and second half of
    the event stream (split at the median timestamp): per event type,
    row counts, exact value sums, and the Population Stability Index
    over ``n_bins`` fixed-width value bins — the standard
    training-data / feature-drift monitor (PSI < 0.1 stable, > 0.25
    action).

    Determinism policy: bin edges come from per-type min/max (exact
    double comparisons), smoothed bin shares use add-0.5 counts
    (integers), and each PSI term (pa−pb)·ln(pa/pb) is FLOOR-quantized
    to 1e-12 and summed as an exact bigint — floor is tie-free and
    implementation-identical across engines, unlike round-on-double,
    and the integer sum is order-independent.  The final /1e12 divides
    identical integers in both engines.

    Scale shape: two scan passes (median, then one aggregate tree);
    every derived relation is ≤ |types|·n_bins rows and broadcasts.
    """
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts", "value")
    split = ev.agg(
        F.expr("percentile(unix_timestamp(ts), 0.5)")
    ).first()[0]
    base = ev.select(
        "event_type",
        F.when(F.unix_timestamp("ts") <= F.lit(split), F.lit("a"))
        .otherwise(F.lit("b"))
        .alias("half"),
        "value",
    )
    rng = base.groupBy("event_type").agg(
        F.min("value").alias("mn"), F.max("value").alias("mx")
    )
    wb = (F.col("mx") - F.col("mn")) / F.lit(float(n_bins))
    binned = base.join(F.broadcast(rng), "event_type").select(
        "event_type",
        "half",
        "value",
        F.when(
            F.col("mx") > F.col("mn"),
            F.least(
                F.floor((F.col("value") - F.col("mn")) / wb),
                F.lit(n_bins - 1),
            ),
        )
        .otherwise(F.lit(0))
        .cast("int")
        .alias("bin"),
    )
    per_bin = binned.groupBy("event_type", "bin").agg(
        F.sum(F.when(F.col("half") == "a", 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("half") == "b", 1).otherwise(0)).alias("cb"),
    )
    totals = binned.groupBy("event_type").agg(
        F.sum(F.when(F.col("half") == "a", 1).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("half") == "b", 1).otherwise(0)).alias("nb"),
        F.sum(F.when(F.col("half") == "a", dec("value"))).alias("sa"),
        F.sum(F.when(F.col("half") == "b", dec("value"))).alias("sb"),
    )
    pa = (F.col("ca").cast("double") + F.lit(0.5)) / (
        F.col("na").cast("double") + F.lit(0.5 * n_bins)
    )
    pb = (F.col("cb").cast("double") + F.lit(0.5)) / (
        F.col("nb").cast("double") + F.lit(0.5 * n_bins)
    )
    term = F.floor((pa - pb) * F.log(pa / pb) * F.lit(1e12)).cast("bigint")
    psi = (
        per_bin.join(F.broadcast(totals.select("event_type", "na", "nb")), "event_type")
        .groupBy("event_type")
        .agg(F.sum(term).alias("psi_int"))
        .select(
            "event_type",
            (F.col("psi_int").cast("double") / F.lit(1e12)).alias("psi"),
        )
    )
    return totals.join(psi, "event_type").select(
        "event_type",
        F.col("na").cast("bigint").alias("n_first_half"),
        F.col("nb").cast("bigint").alias("n_second_half"),
        F.col("sa").cast("double").alias("value_sum_first"),
        F.col("sb").cast("double").alias("value_sum_second"),
        "psi",
    )


def drift_value_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, value, da, db): DISTINCT-VALUE counts per stream
    half (median-ts split) — the relation both exact rank tests run
    over, and an EXACTLY-MERGEABLE summary: counts sum across
    batches, so the streaming drift store (streaming/drift.py) keeps
    this grain and serves KS/MWU bit-identical to a one-shot build."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts", "value")
    split = ev.agg(F.expr("percentile(unix_timestamp(ts), 0.5)")).first()[0]
    base = ev.select(
        "event_type",
        F.when(F.unix_timestamp("ts") <= F.lit(split), F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_a"),
        "value",
    )
    return base.groupBy("event_type", "value").agg(
        F.sum("is_a").alias("da"),
        F.sum(F.lit(1) - F.col("is_a")).alias("db"),
    )


def ks_from_value_table(per_val: DataFrame) -> DataFrame:
    """KS tail over a (event_type, value, da, db) distinct-value
    table — shared by the batch query and the streaming drift store
    (whose accumulated table is identical by the sum-merge
    identity)."""
    wcum = (
        W.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # each distinct-value row IS the end of its tie group: the running
    # sums of the per-value counts are exactly the end-of-group
    # cumulative CDF counts of the per-row spelling
    cum = per_val.select(
        "event_type",
        "value",
        F.sum("da").over(wcum).alias("ca"),
        F.sum("db").over(wcum).alias("cb"),
    )
    totals = per_val.groupBy("event_type").agg(
        F.sum("da").alias("na"),
        F.sum("db").alias("nb"),
    )
    gap = F.abs(F.col("ca") * F.col("nb") - F.col("cb") * F.col("na"))
    sup = (
        cum.join(F.broadcast(totals), "event_type")
        .groupBy("event_type", "na", "nb")
        .agg(F.max(gap).alias("sup_num"))
    )
    d = F.col("sup_num").cast("double") / (
        F.col("na").cast("double") * F.col("nb").cast("double")
    )
    ks = d * F.sqrt(
        F.col("na").cast("double")
        * F.col("nb").cast("double")
        / (F.col("na").cast("double") + F.col("nb").cast("double"))
    )
    return sup.select(
        "event_type",
        F.col("na").cast("bigint").alias("n_first_half"),
        F.col("nb").cast("bigint").alias("n_second_half"),
        F.col("sup_num").cast("bigint").alias("sup_numerator"),
        d.alias("ks_d"),
        ks.alias("ks_scaled"),
    )


def ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic per event type
    between the first and second half of the stream (median-ts split,
    like drift_report): D = sup |F̂_a(x) − F̂_b(x)|, the
    distribution-free companion to the binned PSI — PSI says how much
    mass moved between coarse bins, KS catches any shape change at
    full resolution.

    Exactness without a single float until the end: at each observed
    value the CDF gap is |ca·nb − cb·na| / (na·nb) with integer
    numerator, so the sup is an integer MAX and D divides two exact
    integers once.  The scaled statistic
    KS = D·√(na·nb/(na+nb)) (≳1.36 ⇒ p<0.05) is one sqrt on top.

    Scale shape (distributed-rank spelling): the raw relation is first
    REDUCED to the distinct-value table (event_type, value, da, db)
    by a hash aggregate — partial map-side combine, keys spread over
    (type, value) so a hot type still fans out — and the single sorted
    window runs over THAT table, whose partition size is distinct
    values per type, not rows per type.  The CDF at the end of each
    tie group is just the running sum of per-value counts, so the
    statistic is bit-identical to the per-row spelling while a
    90%-skewed hot type no longer serializes a corpus-sized sort."""
    return ks_from_value_table(drift_value_table(spark, sf_dir))


def w1_from_value_table(per_val: DataFrame) -> DataFrame:
    """1-Wasserstein (earth-mover) distance between the stream halves
    from the (event_type, value, da, db) distinct-value table:
    W₁ = Σ_i |F̂_a(v_i) − F̂_b(v_i)| · (v_{i+1} − v_i) — the integrated
    CDF gap, completing the drift family's geometry (PSI: binned mass,
    KS: sup gap, W₁: integrated gap, MWU: rank dominance, χ²:
    categorical).  Unlike KS it scales with HOW FAR mass moved, not
    just whether it did.

    Determinism policy (as PSI/χ²): each term's float product
    |ca·nb − cb·na|/(na·nb) · gap is computed in one fixed operand
    order, floor-quantized@1e-9, and summed as exact bigint — so the
    statistic value-hashes cross-engine.  Scale shape: the SAME single
    sorted window as KS (cumulative counts + lead(value) off one
    sort of the distinct-value table)."""
    wcum = (
        W.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    word = W.partitionBy("event_type").orderBy("value")
    cum = per_val.select(
        "event_type",
        "value",
        F.sum("da").over(wcum).alias("ca"),
        F.sum("db").over(wcum).alias("cb"),
        F.lead("value").over(word).alias("v_next"),
    )
    totals = per_val.groupBy("event_type").agg(
        F.sum("da").alias("na"),
        F.sum("db").alias("nb"),
    )
    gap_num = F.abs(F.col("ca") * F.col("nb") - F.col("cb") * F.col("na"))
    term = (
        gap_num.cast("double")
        / (F.col("na").cast("double") * F.col("nb").cast("double"))
        * (F.col("v_next") - F.col("value"))
    )
    agg = (
        cum.join(F.broadcast(totals), "event_type")
        .where(F.col("v_next").isNotNull())
        .groupBy("event_type", "na", "nb")
        .agg(
            F.sum(F.floor(term * F.lit(1e9)).cast("bigint")).alias("w1_nano")
        )
    )
    return agg.select(
        "event_type",
        F.col("na").cast("bigint").alias("n_first_half"),
        F.col("nb").cast("bigint").alias("n_second_half"),
        F.col("w1_nano").cast("bigint").alias("w1_nano"),
        (F.col("w1_nano").cast("double") / F.lit(1e9)).alias("w1"),
    )


def wasserstein_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared query (q_wasserstein_drift): exact-quantized W₁ drift
    per event type between the stream halves, off the shared
    distinct-value table (one hash aggregate + one sorted window)."""
    return w1_from_value_table(drift_value_table(spark, sf_dir))


def mwu_from_value_table(per_val: DataFrame) -> DataFrame:
    """Mann–Whitney tail over a (event_type, value, da, db)
    distinct-value table — shared by the batch query and the
    streaming drift store."""
    wcum = (
        W.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    t = F.col("da") + F.col("db")
    cum = per_val.select(
        "event_type",
        F.col("da").alias("ta"),
        t.alias("t"),
        F.sum(t).over(wcum).alias("cum_t"),
    )
    j = cum.groupBy("event_type").agg(
        F.sum(
            F.col("ta")
            * (F.lit(2) * F.col("cum_t") - F.col("t") + F.lit(1))
        ).alias("r2a"),
        F.sum("ta").alias("na"),
        F.sum(F.col("t") - F.col("ta")).alias("nb"),
        F.sum(
            F.col("t") * F.col("t") * F.col("t") - F.col("t")
        ).alias("tie_term"),
    )
    u2 = F.col("r2a") - F.col("na") * (F.col("na") + F.lit(1))
    na_d, nb_d = F.col("na").cast("double"), F.col("nb").cast("double")
    n_d = na_d + nb_d
    sigma2 = (na_d * nb_d / F.lit(12.0)) * (
        (n_d + F.lit(1.0)) - F.col("tie_term").cast("double") / (n_d * (n_d - F.lit(1.0)))
    )
    z = (u2.cast("double") - na_d * nb_d) / (F.lit(2.0) * F.sqrt(sigma2))
    return j.select(
        "event_type",
        F.col("na").cast("bigint").alias("n_first_half"),
        F.col("nb").cast("bigint").alias("n_second_half"),
        u2.cast("bigint").alias("u2"),
        F.col("tie_term").cast("bigint").alias("tie_term"),
        z.alias("z"),
    )


def mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Mann–Whitney U (Wilcoxon rank-sum) per event type between
    the stream halves — the rank-based location test completing the
    drift trio (PSI: binned mass, KS: CDF shape, MWU: stochastic
    dominance).

    Tie-exactness trick: the average rank of a tie group is the
    half-integer (2·rank() + t − 1)/2, so DOUBLED ranks are integers —
    the rank sum R2a, the doubled statistic U2 = R2a − na(na+1) = 2U,
    and the tie-correction term Σ(t³−t) all stay exact bigints; the
    normal-approximation z (with tie-corrected variance) is the single
    float expression at the end, computed in one fixed operand order.

    Scale shape (distributed-rank spelling): reduce to the
    distinct-value table (event_type, value, ta, tb) with a hash
    aggregate first, then run the single sorted window over that
    table.  For a tie group of size t = ta+tb ending at running total
    cum_t, the group starts at rank cum_t−t+1, so every member's
    DOUBLED average rank is 2·(cum_t−t+1)+t−1 = 2·cum_t−t+1 — the
    group contributes ta·(2·cum_t−t+1) to R2a and t³−t to the tie
    term, bit-identical to ranking raw rows while the window
    partition holds distinct values, not rows."""
    return mwu_from_value_table(drift_value_table(spark, sf_dir))


def chi2_composition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """χ² test of homogeneity on the CATEGORICAL axis the numeric drift
    trio doesn't cover: did the event-type COMPOSITION change between
    the stream halves?  Contingency table is |types|×2; expected counts
    come from the margins; each cell's (O−E)²/E contribution is
    floor-quantized@1e-9 and summed as exact bigint (the drift_report
    determinism policy), so the statistic value-hashes.

    Output: one row per type with observed counts and its χ²
    contribution, plus a '__total__' row carrying the full statistic
    and degrees of freedom (|types|−1).  Everything after the count
    aggregate runs on a |types|-row relation."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts")
    split = ev.agg(F.expr("percentile(unix_timestamp(ts), 0.5)")).first()[0]
    counts = ev.groupBy("event_type").agg(
        F.sum(
            F.when(F.unix_timestamp("ts") <= F.lit(split), 1).otherwise(0)
        ).alias("oa"),
        F.sum(
            F.when(F.unix_timestamp("ts") > F.lit(split), 1).otherwise(0)
        ).alias("ob"),
    )
    margins = counts.agg(
        F.sum("oa").alias("ta"), F.sum("ob").alias("tb")
    )
    j = counts.crossJoin(F.broadcast(margins))
    n_d = (F.col("ta") + F.col("tb")).cast("double")
    row_d = (F.col("oa") + F.col("ob")).cast("double")
    ea = row_d * (F.col("ta").cast("double") / n_d)
    eb = row_d * (F.col("tb").cast("double") / n_d)
    cell = (
        (F.col("oa").cast("double") - ea) * (F.col("oa").cast("double") - ea) / ea
        + (F.col("ob").cast("double") - eb) * (F.col("ob").cast("double") - eb) / eb
    )
    contrib_int = F.floor(cell * F.lit(1e9)).cast("bigint")
    per_type = j.select(
        "event_type",
        F.col("oa").cast("bigint").alias("n_first_half"),
        F.col("ob").cast("bigint").alias("n_second_half"),
        contrib_int.alias("chi2_contrib_nano"),
        (contrib_int.cast("double") / F.lit(1e9)).alias("chi2_contrib"),
    )
    total = per_type.agg(
        F.lit("__total__").alias("event_type"),
        F.sum("n_first_half").cast("bigint").alias("n_first_half"),
        F.sum("n_second_half").cast("bigint").alias("n_second_half"),
        F.sum("chi2_contrib_nano").cast("bigint").alias("chi2_contrib_nano"),
        (F.sum("chi2_contrib_nano").cast("double") / F.lit(1e9)).alias(
            "chi2_contrib"
        ),
    )
    return per_type.unionByName(total)
