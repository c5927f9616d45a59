"""Time-series operators: gap-fill resampling, forward fill, and
range-frame rolling aggregates.

The reference has no time-series surface at all (reference heatmap.py is
a single batch pyramid; SURVEY.md §2.8) — these are the regularization
operations a telemetry / training-data pipeline needs: project an
irregular event stream onto a fixed time grid (gap-fill), carry the last
observation forward (ffill), and compute rolling aggregates over *time*
ranges rather than row counts (a RANGE frame is correct under irregular
sampling where a ROWS frame silently is not).

Scale notes (100 TB): the spine is |keys| × |grid slots| rows — tiny
relative to the input — and it joins against an already-aggregated
relation, so AQE turns the join into a broadcast. The only wide
operations are the initial groupBy (the minimum shuffle this semantics
admits) and one shuffle on the window partition key followed by a single
sorted scan per partition. Nothing here touches Python at runtime: every
expression is whole-stage-codegen'd Column math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from heatmap_spark.functions.exact import dec
from heatmap_spark.sources.tables import load_table


def gap_fill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    slot: str = "hour",
) -> DataFrame:
    """Resample ``df`` onto a dense per-``key_col`` grid of ``slot``
    buckets spanning the global [min, max] bucket range.

    Output: (key, slot_ts, n_events, ffill_avg_value) — one row per
    (key, bucket) even where the input has no events; the running
    average carries forward across empty buckets (classic LOCF).

    Exactness: the bucket average is decimal-sum / count (see
    functions/exact.py) so the forward-filled value is bit-identical to
    the DuckDB oracle's.
    """
    agg = df.groupBy(
        F.col(key_col).alias("key"), F.date_trunc(slot, F.col(ts_col)).alias("slot_ts")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(dec(value_col)).cast("double") / F.count(value_col)).alias("av"),
    )
    bounds = agg.agg(F.min("slot_ts").alias("mn"), F.max("slot_ts").alias("mx"))
    keys = df.select(F.col(key_col).alias("key")).distinct()
    spine = keys.crossJoin(F.broadcast(bounds)).select(
        "key",
        F.explode(F.sequence("mn", "mx", F.expr(f"interval 1 {slot}"))).alias("slot_ts"),
    )
    joined = spine.join(F.broadcast(agg), ["key", "slot_ts"], "left")
    w = W.partitionBy("key").orderBy("slot_ts").rowsBetween(W.unboundedPreceding, 0)
    return joined.select(
        F.col("key"),
        F.col("slot_ts"),
        F.coalesce("n", F.lit(0)).alias("n_events"),
        F.round(F.last("av", ignorenulls=True).over(w), 6).alias("ffill_avg_value"),
    )


def gap_fill_hourly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared-query wrapper: hourly event grid per event_type."""
    ev = load_table(spark, sf_dir, "events")
    out = gap_fill(ev, "event_type", "ts", "value", slot="hour")
    return out.select(
        F.col("key").alias("event_type"),
        F.col("slot_ts").alias("hour"),
        "n_events",
        "ffill_avg_value",
    )


def rolling_revenue_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer rolling 7-day spend via a RANGE frame keyed on
    epoch-days.

    RANGE (not ROWS) is the point: customers order irregularly, so the
    frame must be defined by *time distance*, and every order on the
    same day must fall in the same frame regardless of intra-day tie
    order — which also makes the result fully deterministic without a
    unique tiebreaker. One shuffle on o_custkey, one sorted scan.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.datediff("o_orderdate", F.to_date(F.lit("1970-01-01"))).alias("epoch_day"),
        dec("o_totalprice").alias("price"),
    )
    w = W.partitionBy("o_custkey").orderBy("epoch_day").rangeBetween(-6, 0)
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.sum("price").over(w).cast("double").alias("spent_7d"),
        F.count(F.lit(1)).over(w).cast("int").alias("n_orders_7d"),
    )


def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension build: turn the per-user event
    log into versioned state intervals [valid_from, valid_to), open
    interval (valid_to NULL) for the current state.

    One window pass over one user_id shuffle — the standard SCD2
    "next row's timestamp closes my interval" construction.  At 100 TB
    the partition key (user) bounds state; no self-join, no collect.

    Reference: none — SURVEY.md §2.8 (window-function family; the
    LLM-pipeline use is versioned metadata/dimension snapshots).
    """
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        (F.lead("ts").over(w).isNull()).alias("is_current"),
    )


def state_episodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: collapse each user's consecutive same-type
    events into episodes (state, episode start/end, event count).

    The island key is a running sum of state-change flags (lag +
    cumulative sum) — deliberately NOT the difference-of-two-
    row_numbers textbook form, which needs a second shuffle on
    (user, state): here both window functions share one partitioning
    and one sort, and the closing aggregate reuses that partitioning,
    so the whole operator is ONE exchange at any scale.

    Reference: none — SURVEY.md §2.8 (sessionization family).
    """
    return state_episodes_df(load_table(spark, sf_dir, "events"))


def state_episodes_df(ev: DataFrame) -> DataFrame:
    """Core episodes over any (user_id, ts, event_id, event_type) frame."""
    w_all = W.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = w_all.rowsBetween(W.unboundedPreceding, W.currentRow)
    changed = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.when(
            F.lag("event_type").over(w_all).isNull()
            | (F.lag("event_type").over(w_all) != F.col("event_type")),
            1,
        ).otherwise(0).alias("chg"),
    )
    islands = changed.select(
        "user_id",
        "event_type",
        "ts",
        F.sum("chg").over(w_run).alias("island"),
    )
    return islands.groupBy("user_id", "event_type", "island").agg(
        F.min("ts").alias("episode_start"),
        F.max("ts").alias("episode_end"),
        F.count(F.lit(1)).alias("n_events"),
    ).select(
        "user_id",
        F.col("event_type").alias("state"),
        "episode_start",
        "episode_end",
        "n_events",
    )


def ewma_by_type(spark: SparkSession, sf_dir: str, alpha: float = 0.5) -> DataFrame:
    """Exponentially weighted moving average per event_type as an
    ORDERED FOLD: the series is collected in (ts, event_id) order and
    reduced with acc = α·x + (1−α)·acc, seeded by the first element —
    the same left-fold DuckDB's list_reduce computes, so the entire
    recurrence (an inherently sequential computation) is hash-checked
    cross-engine.

    Scale note: a per-key fold materializes the key's series in one
    task — fine for per-entity series (the common case: one device /
    user / symbol per key), and the honest spelling for a recurrence
    that cannot be partial-aggregated.  Very long single series would
    use the segmented-scan decomposition (fold partials compose as
    (a·acc + b)) — noted, not needed at fixture scale.
    """
    from heatmap_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    series = ev.groupBy("event_type").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "value"))
            ),
            lambda s: s["value"],
        ).alias("vals")
    )
    a = F.lit(float(alpha))
    ewma = F.aggregate(
        F.slice(F.col("vals"), 2, F.size("vals")),
        F.element_at(F.col("vals"), 1),
        lambda acc, x: a * x + (F.lit(1.0) - a) * acc,
    )
    return series.select(
        "event_type",
        F.size("vals").alias("n"),
        F.round(ewma, 6).alias("ewma"),
    )


def ewma_segmented(spark: SparkSession, sf_dir: str, alpha: float = 0.5) -> DataFrame:
    """EWMA by segmented scan: the recurrence acc' = (1-α)·acc + α·x is
    AFFINE, so any segment folds to a pair (A, B) with
    acc_out = A·acc_in + B, and segments compose associatively:
    (A2,B2)∘(A1,B1) = (A2·A1, A2·B1 + B2) — the classic
    parallel-prefix decomposition (Blelloch scan) that makes an
    inherently sequential computation distributable.

    Physical plan: per (event_type, day) the segment folds IN-ARRAY
    (each day's slice is one task — no single task ever holds the full
    series), then the per-day (A, B) pairs compose in day order with a
    second small fold.  Zero-init convention (acc₀ = 0 ⇒ result =
    B_total) so every segment is uniform; ewma_by_type keeps the
    seeded-by-first-element convention for comparison.

    Both folds are mirrored operation-for-operation in the DuckDB
    oracle, so the hierarchical float evaluation is bit-checked — and
    a test pins agreement with the flat sequential fold to 1e-9.
    """
    from heatmap_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    a = float(alpha)
    per_day = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("ts", "event_id", "value"))),
            lambda s: s["value"],
        ).alias("vals")
    )
    seg_a = F.aggregate(
        F.col("vals"), F.lit(1.0), lambda acc, x: acc * F.lit(1.0 - a)
    )
    seg_b = F.aggregate(
        F.col("vals"),
        F.lit(0.0),
        lambda acc, x: F.lit(1.0 - a) * acc + F.lit(a) * x,
    )
    segments = per_day.select(
        "event_type",
        "day",
        F.size("vals").alias("n"),
        seg_a.alias("seg_a"),
        seg_b.alias("seg_b"),
    )
    composed = segments.groupBy("event_type").agg(
        F.sum("n").alias("n"),
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct("day", "seg_a", "seg_b"))
            ),
            F.struct(F.lit(1.0).alias("a"), F.lit(0.0).alias("b")),
            lambda acc, s: F.struct(
                (s["seg_a"] * acc["a"]).alias("a"),
                (s["seg_a"] * acc["b"] + s["seg_b"]).alias("b"),
            ),
        ).alias("ab"),
    )
    return composed.select(
        "event_type",
        F.col("n").cast("int").alias("n"),
        F.round(F.col("ab")["b"], 6).alias("ewma"),
    )


def holt_by_type(
    spark: SparkSession,
    sf_dir: str,
    alpha: float = 0.5,
    beta: float = 0.3,
    horizon: int = 3,
) -> DataFrame:
    """Holt linear-trend exponential smoothing (double exponential
    smoothing, Holt 1957 — public method) per event_type, plus h-step
    forecasts level + h·trend.

    The coupled recurrence
        l' = α·x + (1−α)·(l + b)
        b' = β·(l' − l) + (1−β)·b
    is an ORDERED FOLD over the (ts, event_id)-sorted series with a
    struct(level, trend) accumulator, seeded (l₀, b₀) = (x₀, 0) —
    exactly the left fold DuckDB's list_reduce computes over
    [x, 0] pairs, so the whole two-variable sequential recurrence is
    value-hash-checked cross-engine (the ewma pattern, one dimension
    up).  The smoothing constants are written as exact double literals
    on BOTH sides (0.5/0.5 and 0.3/0.7) so the arithmetic sequences
    are bit-identical.

    Scale note: one task materializes one key's series — the honest
    spelling for an unpartitionable recurrence (see ewma_by_type); the
    affine segmented-scan decomposition generalizes (the Holt step is
    linear in (l, b): a 2×2 matrix-affine map, composable
    associatively) if a single series ever outgrows a task.
    """
    from heatmap_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    series = ev.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("ts", "event_id", "value"))),
            lambda s: s["value"].cast("double"),
        ).alias("vals")
    )
    a, ia = F.lit(float(alpha)), F.lit(round(1.0 - alpha, 15))
    bt, ib = F.lit(float(beta)), F.lit(round(1.0 - beta, 15))

    def step(acc, x):
        new_l = a * x + ia * (acc["l"] + acc["b"])
        new_b = bt * (new_l - acc["l"]) + ib * acc["b"]
        return F.struct(new_l.alias("l"), new_b.alias("b"))

    st = F.aggregate(
        F.slice(F.col("vals"), 2, F.size("vals")),
        F.struct(
            F.element_at(F.col("vals"), 1).alias("l"), F.lit(0.0).alias("b")
        ),
        step,
    )
    cols = [
        F.col("event_type"),
        F.size("vals").alias("n"),
        F.round(st["l"], 6).alias("level"),
        F.round(st["b"], 6).alias("trend"),
    ]
    for h in range(1, horizon + 1):
        cols.append(
            F.round(st["l"] + F.lit(float(h)) * st["b"], 6).alias(f"fc_{h}")
        )
    return series.select(*cols)


def holt_winters_by_type(
    spark: SparkSession,
    sf_dir: str,
    alpha: float = 0.5,
    beta: float = 0.3,
    gamma: float = 0.2,
    period: int = 7,
    horizon: int = 3,
) -> DataFrame:
    """Additive Holt-Winters (triple exponential smoothing, Winters
    1960 — public method) per event_type: level + trend + a
    ``period``-slot seasonal vector, folded over the (ts, event_id)-
    ordered series with an array<double> accumulator
    [l, b, s_0..s_{m-1}] — the top of the EWMA → Holt → Holt-Winters
    recurrence ladder, still value-hash-checked cross-engine (DuckDB
    folds the identical state list; indices are aligned 1-based
    element_at vs 1-based list indexing, and the seasonal-slot update
    uses the engines' indexed-lambda forms with the base difference
    accounted for).

    Convention (shared by both engines, pinned by the oracle):
    l0 = x0, b0 = 0, s = zeros; step t >= 1 uses seasonal slot
    t mod m;  l' = α(x − s_t) + (1−α)(l+b);  b' = β(l'−l) + (1−β)b;
    s_t' = γ(x − l') + (1−γ)s_t.  Forecast h steps out:
    l + h·b + s[(n−1+h) mod m].
    """
    from heatmap_spark.sources.tables import load_table

    m = period
    ev = load_table(spark, sf_dir, "events")
    series = ev.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("ts", "event_id", "value"))),
            lambda s: s["value"].cast("double"),
        ).alias("vals")
    )
    a, ia = F.lit(float(alpha)), F.lit(round(1.0 - alpha, 15))
    bt, ib = F.lit(float(beta)), F.lit(round(1.0 - beta, 15))
    g, ig = F.lit(float(gamma)), F.lit(round(1.0 - gamma, 15))

    # elements carry their own step index t (the slice is 0-based in
    # Spark's transform, so t = i + 1)
    elems = F.transform(
        F.slice(F.col("vals"), 2, F.size("vals")),
        lambda x, i: F.array(x, (i + F.lit(1)).cast("double")),
    )
    init = F.concat(
        F.array(F.element_at(F.col("vals"), 1), F.lit(0.0)),
        F.array_repeat(F.lit(0.0), m),
    )

    def step(acc, e):
        x = F.element_at(e, 1)
        t = F.element_at(e, 2)
        idx = (t.cast("int") % F.lit(m))  # 0-based season slot
        l, b = F.element_at(acc, 1), F.element_at(acc, 2)
        si = F.element_at(acc, idx + F.lit(3))
        new_l = a * (x - si) + ia * (l + b)
        new_b = bt * (new_l - l) + ib * b
        new_si = g * (x - new_l) + ig * si
        season = F.transform(
            F.slice(acc, 3, m),
            lambda v, j: F.when(j == idx, new_si).otherwise(v),
        )
        return F.concat(F.array(new_l, new_b), season)

    st = F.aggregate(elems, init, step)
    n = F.size("vals")
    level, trend = F.element_at(st, 1), F.element_at(st, 2)
    cols = [
        F.col("event_type"),
        n.alias("n"),
        F.round(level, 6).alias("level"),
        F.round(trend, 6).alias("trend"),
    ]
    for h in range(1, horizon + 1):
        slot = ((n - 1 + F.lit(h)) % F.lit(m)).cast("int")
        cols.append(
            F.round(
                level + F.lit(float(h)) * trend + F.element_at(st, slot + F.lit(3)),
                6,
            ).alias(f"fc_{h}")
        )
    return series.select(*cols)


def autocorrelation(
    spark: SparkSession, sf_dir: str, max_lag: int = 6
) -> DataFrame:
    """Sample autocorrelation of the hourly event-count series per
    event_type, lags 1..max_lag — the seasonality/burstiness detector
    a telemetry or crawl-rate pipeline runs before choosing a
    forecasting fold (reference has no time-series surface;
    SURVEY.md §2.8 extension).

    Definition (statistical ACF, global series mean)::

        r_k = Σ_{t≤n−k} (x_t − x̄)(x_{t+k} − x̄) / Σ_t (x_t − x̄)²

    over the GAP-FILLED series (zeros on empty hours of the global
    [min, max] hour grid — ACF over a series with silently missing
    slots is wrong, which is why this composes with gap-fill).

    Exactness: counts are integers, so multiplying through by n²
    clears the rational mean x̄ = T/n entirely::

        n²·num_k = n²·Σx_t·x_{t+k} − n·T·Σ(x_t + x_{t+k}) + (n−k)·T²
        n²·den   = n²·Σx² − n·T²

    Every term is an exact integer (decimal(38,0) against corpus-scale
    overflow, as in the vocab store's L1), and r_k is ONE double
    division — bit-identical in any partitioning and in DuckDB, so an
    inherently sequential-looking statistic hash-checks cross-engine.

    Scale shape: one groupBy (type, hour) to counts, one broadcast
    spine join, one window shuffle per event_type (all max_lag lags
    read from the same sorted partition pass), one final groupBy type.
    The series length is |grid hours| — bounded by time span, not by
    corpus size, so state per type is trivially small at 100 TB.
    """
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy(
        F.col("event_type"), F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    bounds = agg.agg(F.min("hour").alias("mn"), F.max("hour").alias("mx"))
    types = ev.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.explode(F.sequence("mn", "mx", F.expr("interval 1 hour"))).alias("hour"),
    )
    series = spine.join(F.broadcast(agg), ["event_type", "hour"], "left").select(
        "event_type",
        "hour",
        F.coalesce("cnt", F.lit(0)).cast("decimal(38,0)").alias("x"),
    )
    w = W.partitionBy("event_type").orderBy("hour")
    lag_cols = [F.lag("x", k).over(w).alias(f"lx{k}") for k in range(1, max_lag + 1)]
    with_lags = series.select("event_type", "x", *lag_cols)

    aggs = [
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("t"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,0)").alias("ss"),
    ]
    for k in range(1, max_lag + 1):
        lx = F.col(f"lx{k}")
        aggs.append(
            F.sum(F.when(lx.isNotNull(), F.col("x") * lx).otherwise(F.lit(0)))
            .cast("decimal(38,0)")
            .alias(f"s{k}")
        )
        aggs.append(
            F.sum(F.when(lx.isNotNull(), F.col("x") + lx).otherwise(F.lit(0)))
            .cast("decimal(38,0)")
            .alias(f"a{k}")
        )
    per_type = with_lags.groupBy("event_type").agg(*aggs)

    stack_args = ", ".join(
        f"{k}, s{k}, a{k}" for k in range(1, max_lag + 1)
    )
    unp = per_type.select(
        "event_type",
        "n",
        "t",
        "ss",
        F.expr(f"stack({max_lag}, {stack_args}) AS (lag, sk, ak)"),
    )
    num = (
        F.col("n") * F.col("n") * F.col("sk")
        - F.col("n") * F.col("t") * F.col("ak")
        + (F.col("n") - F.col("lag")) * F.col("t") * F.col("t")
    )
    den = F.col("n") * F.col("n") * F.col("ss") - F.col("n") * F.col("t") * F.col("t")
    return unp.select(
        "event_type",
        F.col("lag").cast("int").alias("lag"),
        (F.col("n") - F.col("lag")).cast("bigint").alias("n_pairs"),
        F.when(
            den != F.lit(0),
            F.round(num.cast("double") / den.cast("double"), 6),
        ).alias("acf"),
    )


def forecast_backtest(
    spark: SparkSession,
    sf_dir: str,
    alpha: float = 0.5,
    beta: float = 0.3,
    horizon: int = 5,
    season: int = 7,
) -> DataFrame:
    """Holdout backtest of the Holt fold against the seasonal-naive
    baseline — the model-selection step a forecasting pipeline runs
    before trusting a method (Hyndman & Koehler 2006's MASE is the
    standard scale-free score; public method).

    Per event_type, the (ts, event_id)-ordered value series is split
    at n − horizon; the last ``horizon`` observations are the test
    window.  Reported per type:

    * ``mae_holt``    — mean |x − (level + i·trend)| of the Holt
      (α, β) fold trained on the train slice only;
    * ``mae_snaive``  — mean |x − x[t − season]| (seasonal-naive);
    * ``mase_holt``   — mae_holt scaled by the train slice's one-step
      naive MAE (< 1 ⇒ beats naive in-sample drift);
    * ``winner``      — holt | seasonal_naive on the UNROUNDED error
      sums (ties to holt).

    Exactness: every quantity is a sequential left fold or zip over
    index-ordered arrays (the q_holt_forecast discipline), with
    smoothing constants as exact double literals, so the whole
    backtest value-hashes against the DuckDB twin.  Scale: one groupBy
    exchange; one task holds one key's series (see holt_by_type for
    the segmented-scan escape hatch).
    """
    ev = load_table(spark, sf_dir, "events")
    series = ev.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("ts", "event_id", "value"))),
            lambda s: s["value"].cast("double"),
        ).alias("vals")
    )
    h, m = horizon, season
    n = F.size("vals")
    n_train = n - F.lit(h)
    train = F.slice("vals", 1, n_train)
    test = F.slice("vals", n_train + 1, F.lit(h))

    a, ia = F.lit(float(alpha)), F.lit(round(1.0 - alpha, 15))
    bt, ib = F.lit(float(beta)), F.lit(round(1.0 - beta, 15))

    def step(acc, x):
        new_l = a * x + ia * (acc["l"] + acc["b"])
        new_b = bt * (new_l - acc["l"]) + ib * acc["b"]
        return F.struct(new_l.alias("l"), new_b.alias("b"))

    init = F.struct(
        F.element_at(train, 1).alias("l"), F.lit(0.0).alias("b")
    )
    st = F.aggregate(F.slice(train, 2, n_train - 1), init, step)
    level, trend = st["l"], st["b"]

    def fold_sum(arr):
        return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)

    idx = F.sequence(F.lit(1), F.lit(h))
    holt_errs = F.transform(
        idx,
        lambda i: F.abs(
            F.element_at("vals", (n_train + i).cast("int"))
            - (level + i.cast("double") * trend)
        ),
    )
    snaive_errs = F.transform(
        idx,
        lambda i: F.abs(
            F.element_at("vals", (n_train + i).cast("int"))
            - F.element_at("vals", (n_train + i - F.lit(m)).cast("int"))
        ),
    )
    insample_naive = F.zip_with(
        F.slice(train, 2, n_train - 1),
        F.slice(train, 1, n_train - 1),
        lambda cur, prev: F.abs(cur - prev),
    )
    sum_holt = fold_sum(holt_errs)
    sum_snaive = fold_sum(snaive_errs)
    scale = fold_sum(insample_naive) / (n_train - 1).cast("double")
    return series.where(n > F.lit(m + h)).select(
        "event_type",
        n.cast("int").alias("n"),
        n_train.cast("int").alias("n_train"),
        F.round(sum_holt / F.lit(float(h)), 6).alias("mae_holt"),
        F.round(sum_snaive / F.lit(float(h)), 6).alias("mae_snaive"),
        F.round(sum_holt / F.lit(float(h)) / scale, 6).alias("mase_holt"),
        F.when(sum_holt <= sum_snaive, F.lit("holt"))
        .otherwise(F.lit("seasonal_naive"))
        .alias("winner"),
    )


def cusum_changepoints(
    spark: SparkSession,
    sf_dir: str,
    kappa: float = 0.5,
    h: float = 3.0,
) -> DataFrame:
    """Two-sided CUSUM changepoint detection (Page 1954) per
    event_type over the (ts, event_id)-ordered value series:

        S⁺_t = max(0, S⁺_{t-1} + z_t − κ)
        S⁻_t = max(0, S⁻_{t-1} − z_t − κ)     alarm when either > h,
                                               then both reset to 0

    with z_t the per-type z-score from exact decimal moments (the
    zscore_outliers policy, so μ/σ are bit-identical on any
    partitioning or engine).  The whole detector is an ordered fold
    with a (S⁺, S⁻, n_alarms, first_alarm, idx) accumulator — the
    Holt/EWMA pattern three dimensions up — so alarm counts AND the
    first alarm position value-hash cross-engine.

    Scale note: ONE aggregate computes the sorted series and the
    moments together (no second pass, no join); one task materializes
    one key's series — the honest spelling for an unpartitionable
    recurrence (the max(0,·) clamp breaks the affine composition that
    lets EWMA distribute; see ewma_segmented).

    Reference: none — SURVEY.md §2.8 temporal extension (drift/quality
    monitoring for data pipelines).
    """
    from heatmap_spark.sources.tables import load_table

    return cusum_df(load_table(spark, sf_dir, "events"), kappa, h)


def cusum_df(ev: DataFrame, kappa: float = 0.5, h: float = 3.0) -> DataFrame:
    """DataFrame-core of :func:`cusum_changepoints` over any
    (event_type, ts, event_id, value) relation (planted-shift tests
    run it on synthetic series)."""
    from heatmap_spark.functions.exact import dec

    series = ev.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("ts", "event_id", "value"))),
            lambda s: s["value"].cast("double"),
        ).alias("vals"),
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("value")).cast("double").alias("s1"),
        F.sum(dec("value") * dec("value")).cast("double").alias("s2"),
    )
    mean = F.col("s1") / F.col("n")
    std = F.sqrt(F.col("s2") / F.col("n") - mean * mean)
    zs = F.transform(F.col("vals"), lambda v: (v - mean) / std)

    kap, lim = F.lit(float(kappa)), F.lit(float(h))

    def step(acc, z):
        idx2 = acc["idx"] + F.lit(1)
        sp1 = F.greatest(F.lit(0.0), acc["sp"] + z - kap)
        sn1 = F.greatest(F.lit(0.0), acc["sn"] - z - kap)
        alarm = (sp1 > lim) | (sn1 > lim)
        return F.struct(
            F.when(alarm, F.lit(0.0)).otherwise(sp1).alias("sp"),
            F.when(alarm, F.lit(0.0)).otherwise(sn1).alias("sn"),
            (acc["cnt"] + F.when(alarm, F.lit(1)).otherwise(F.lit(0))).alias("cnt"),
            F.when(alarm & (acc["first"] < F.lit(0)), idx2)
            .otherwise(acc["first"])
            .alias("first"),
            idx2.alias("idx"),
        )

    st = F.aggregate(
        zs,
        F.struct(
            F.lit(0.0).alias("sp"),
            F.lit(0.0).alias("sn"),
            F.lit(0).cast("long").alias("cnt"),
            F.lit(-1).cast("long").alias("first"),
            F.lit(0).cast("long").alias("idx"),
        ),
        step,
    )
    return series.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.round(mean, 6).alias("mean"),
        F.round(std, 6).alias("std"),
        st["cnt"].cast("int").alias("n_alarms"),
        st["first"].cast("int").alias("first_alarm"),
        F.round(st["sp"], 6).alias("final_s_pos"),
        F.round(st["sn"], 6).alias("final_s_neg"),
    )


def embargo_split(
    spark: SparkSession,
    sf_dir: str,
    train_frac: float = 0.7,
    embargo_s: int = 3600,
) -> DataFrame:
    """Purged temporal train/test split with an embargo gap (the
    leakage control from financial ML, López de Prado's purged CV,
    applied the way time-ordered eval sets are cut for model training
    data): everything at or before the train-fraction time cutoff is
    ``train``; events inside the following ``embargo_s`` seconds are
    ``embargo`` — EXCLUDED from both sets, so temporally-correlated
    neighbors of late train rows can't leak into test; the rest is
    ``test``.

    The cutoff is the exact continuous quantile of the event-time
    distribution (Spark `percentile` ≡ DuckDB `quantile_cont`, the
    q_percentiles parity), computed on integer epoch-micros — one
    aggregate, broadcast back; the labeling is a map-only comparison.
    No global sort anywhere.

    Reference: none — SURVEY.md §2.8 split family (hash split,
    leakage-safe near-dup split; this is the temporal member).
    """
    from heatmap_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", F.unix_micros("ts").alias("ts_us")
    )
    cut = ev.agg(
        F.expr(f"percentile(ts_us, CAST({train_frac} AS DOUBLE))").alias("cutoff")
    )
    out = ev.crossJoin(F.broadcast(cut))
    split = (
        F.when(F.col("ts_us") <= F.col("cutoff"), F.lit("train"))
        .when(
            F.col("ts_us") <= F.col("cutoff") + F.lit(float(embargo_s) * 1e6),
            F.lit("embargo"),
        )
        .otherwise(F.lit("test"))
    )
    return out.select("event_id", "ts", split.alias("split"))
