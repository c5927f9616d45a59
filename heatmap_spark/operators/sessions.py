"""Event-time operators: sessionization and as-of join.

Spark has no native batch as-of join; both operators here are
compositions of windows over the natural partition key (user), so they
scale horizontally: one shuffle on user_id, then per-partition sorted
scans — no cross joins, no driver-side loops (SURVEY.md §2.8,
pyspark_guide "Common OLAP patterns").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from heatmap_spark.functions.exact import dsum
from heatmap_spark.sources.tables import load_table


def sessionize(
    events: DataFrame, gap_minutes: int = 60, user_col: str = "user_id", ts_col: str = "ts"
) -> DataFrame:
    """Split each user's event stream into sessions at gaps > gap_minutes.

    lag(ts) + cumulative sum of gap flags — the classic shuffle-once
    sessionization.  Session ids are 1-based per user.
    """
    w = W.partitionBy(user_col).orderBy(ts_col, "event_id")
    gap_ms = gap_minutes * 60 * 1000
    with_flag = events.select(
        user_col,
        ts_col,
        "event_id",
        "value",
        (
            (F.unix_millis(F.col(ts_col)) - F.unix_millis(F.lag(ts_col).over(w)) > gap_ms)
            | F.lag(ts_col).over(w).isNull()
        )
        .cast("int")
        .alias("is_new_session"),
    )
    w_rows = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return with_flag.select(
        user_col,
        ts_col,
        "event_id",
        "value",
        F.sum("is_new_session").over(w_rows).alias("session_id"),
    )


def session_stats(spark: SparkSession, sf_dir: str, gap_minutes: int = 60) -> DataFrame:
    """Per-session aggregates over the events fixture."""
    ev = load_table(spark, sf_dir, "events")
    s = sessionize(ev, gap_minutes)
    return s.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        dsum("value").alias("total_value"),
    )


def asof_join_last_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each 'purchase' event, the most recent 'signup' at-or-before it
    by the same user (as-of backward join).

    Implemented as the scalable union+window form: tag both sides, sort
    by (user, ts, side) with signups first on ties (<= semantics), then
    last non-null signup ts over a running frame.  One shuffle on
    user_id; no range cross join — at 100 TB this is the only shape that
    doesn't blow up (a broadcast-nested-loop range join would).
    """
    ev = load_table(spark, sf_dir, "events")
    signups = ev.where(F.col("event_type") == "signup").select(
        "user_id", F.col("ts"), F.lit(0).alias("side"), F.col("ts").alias("signup_ts"),
        F.lit(None).cast("long").alias("event_id"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts"), F.lit(1).alias("side"),
        F.lit(None).cast("timestamp").alias("signup_ts"), F.col("event_id"),
    )
    unioned = signups.unionByName(purchases)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        unioned.select(
            "user_id",
            "ts",
            "side",
            "event_id",
            F.last("signup_ts", ignorenulls=True).over(w).alias("last_signup_ts"),
        )
        .where(F.col("side") == 1)
        .select("event_id", F.col("ts").alias("purchase_ts"), "last_signup_ts")
    )


def tumbling_window_counts(spark: SparkSession, sf_dir: str, minutes: int = 5) -> DataFrame:
    """Epoch-aligned tumbling window aggregate (batch twin of the
    streaming path in heatmap_spark.streaming)."""
    ev = load_table(spark, sf_dir, "events")
    win = F.window("ts", f"{minutes} minutes")
    return ev.groupBy(win.alias("w"), "event_type").agg(
        F.count("*").alias("n_events"), dsum("value").alias("total_value")
    ).select(
        F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value"
    )


def sliding_window_counts(
    spark: SparkSession, sf_dir: str, size_min: int = 10, slide_min: int = 5
) -> DataFrame:
    """Sliding (overlapping) windows: each event lands in
    size/slide windows; Spark's window() generates the overlap set."""
    ev = load_table(spark, sf_dir, "events")
    win = F.window("ts", f"{size_min} minutes", f"{slide_min} minutes")
    return (
        ev.groupBy(win.alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


def asof_join_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The as-of join again, as a cogrouped-map (applyInPandas over
    ``cogroup``): both sides shuffle on user_id, and each group pair is
    handed to ``pandas.merge_asof`` in one Arrow batch.

    Same result as :func:`asof_join_last_signup` (the union+window form
    is preferred on the hot path — pure JVM); this is the escape-hatch
    pattern for per-key logic windows can't express (SURVEY.md §2.7
    preference order).  Scale shape is identical: one shuffle per side
    on the group key, no cross join, groups stream through Arrow.
    """
    import pandas as pd

    ev = load_table(spark, sf_dir, "events")
    signups = ev.where(F.col("event_type") == "signup").select("user_id", "ts")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )

    # nested closure: cloudpickle serializes it BY VALUE (a
    # module-level def pickles by reference and breaks when the driver
    # imports this module from a different working directory)
    def merge(purch: pd.DataFrame, sign: pd.DataFrame) -> pd.DataFrame:
        if purch.empty:
            return pd.DataFrame(
                {"event_id": pd.Series([], dtype="int64"),
                 "purchase_ts": pd.Series([], dtype="datetime64[us]"),
                 "last_signup_ts": pd.Series([], dtype="datetime64[us]")}
            )
        purch = purch.sort_values("ts")
        sign = sign.sort_values("ts")
        out = pd.merge_asof(
            purch, sign.rename(columns={"ts": "last_signup_ts"}),
            left_on="ts", right_on="last_signup_ts",
            by="user_id", direction="backward",
        )
        return out.rename(columns={"ts": "purchase_ts"})[
            ["event_id", "purchase_ts", "last_signup_ts"]
        ]

    return purchases.groupBy("user_id").cogroup(
        signups.groupBy("user_id")
    ).applyInPandas(
        merge,
        schema="event_id long, purchase_ts timestamp, last_signup_ts timestamp",
    )


def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel over the events stream: how many users viewed,
    then clicked at-or-after their first view, then purchased
    at-or-after that click.

    Single shuffle on user_id; the three stage timestamps are chained
    cumulative-window minimums (each stage's window only admits events
    at-or-after the previous stage's first hit), computed in three
    window passes that reuse one sort.  This is the standard funnel
    shape for product analytics at scale — no self-joins, no
    per-user collect.

    Reference: none — SURVEY.md §2.8 (window-function family).
    """
    return event_funnel_df(load_table(spark, sf_dir, "events"))


def event_funnel_df(ev: DataFrame) -> DataFrame:
    """Core funnel over any (user_id, ts, event_id, event_type) frame."""
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    t = F.col("event_type")
    s1 = ev.select(
        "user_id", "ts", "event_id", "event_type",
        F.min(F.when(t == "view", F.col("ts"))).over(w).alias("fv"),
    )
    s2 = s1.select(
        "*",
        F.min(
            F.when(
                (t == "click") & F.col("fv").isNotNull() & (F.col("ts") >= F.col("fv")),
                F.col("ts"),
            )
        ).over(w).alias("fc"),
    )
    s3 = s2.select(
        "*",
        F.min(
            F.when(
                (t == "purchase") & F.col("fc").isNotNull() & (F.col("ts") >= F.col("fc")),
                F.col("ts"),
            )
        ).over(w).alias("fp"),
    )
    per_user = s3.groupBy("user_id").agg(
        F.min("fv").alias("tv"), F.min("fc").alias("tc"), F.min("fp").alias("tp")
    )
    return per_user.agg(
        F.count("tv").alias("n_view"),
        F.count("tc").alias("n_click_after_view"),
        F.count("tp").alias("n_purchase_after_funnel"),
        F.count(F.lit(1)).alias("n_users"),
    )


def session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session aggregates via the NATIVE session_window operator in
    batch mode (same operator the streaming path uses — one engine
    surface, two execution modes).

    Boundary semantics: a new session starts when the gap is >= the
    60-minute timeout (an event at exactly start+gap falls outside the
    closing window); the lag-based :func:`sessionize` uses > — the two
    agree everywhere except exact-boundary gaps.  window.end is
    last_event_ts + gap by definition.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "1 hour"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("window_end"),
            "n_events",
            "total_value",
        )
    )


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by signup week, counted
    as retained in each subsequent week they were active.

    Two aggregates and one join, all on the user key or the small
    cohort key: per-user cohort week (min signup), distinct
    (user, activity-week) pairs, then the cohort x offset counts with
    the cohort size broadcast back in for the rate.  The classic
    product-analytics query, kept exactly SQL-portable (ISO
    Monday-start weeks, integer day arithmetic).
    """
    ev = load_table(spark, sf_dir, "events")
    cohorts = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).alias("cohort_week"))
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("act_week")
    ).distinct()
    joined = activity.join(cohorts, "user_id").where(
        F.col("act_week") >= F.col("cohort_week")
    )
    cells = joined.groupBy(
        "cohort_week",
        (
            F.datediff(F.col("act_week"), F.col("cohort_week")) / 7
        ).cast("int").alias("week_offset"),
    ).agg(F.count(F.lit(1)).alias("n_active"))
    sizes = cohorts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    return cells.join(F.broadcast(sizes), "cohort_week").select(
        "cohort_week",
        "week_offset",
        "n_active",
        "cohort_size",
        F.round(F.col("n_active") / F.col("cohort_size"), 6).alias("retention"),
    )


def od_matrix(spark: SparkSession, sf_dir: str, zoom: int = 6) -> DataFrame:
    """Origin→destination transition matrix: per user, consecutive
    location points (ordered by ts with coordinate tiebreaks) become
    (from_cell, to_cell) quadtree-cell transitions at ``zoom``; the
    output counts each directed transition across all users — the
    mobility-flow aggregate heatmap consumers pair with the density
    pyramid.

    One window shuffle on user_id (lag) + one map-side-combinable
    groupBy; self-transitions (both points in one cell) are kept — a
    downstream filter drops them when only flows matter.  The cell
    discretizer is the reference's tile math (tile.py:29-37).
    """
    from heatmap_spark.functions import tiles as tl
    from heatmap_spark.sources.locations import load_locations

    loc = load_locations(spark, sf_dir).where(F.col("source") != "background")
    cells = loc.select(
        "user_id",
        "ts",
        "latitude",
        "longitude",
        tl.tile_id("latitude", "longitude", zoom).alias("cell"),
    )
    w = W.partitionBy("user_id").orderBy("ts", "latitude", "longitude")
    trans = cells.select(
        "user_id",
        F.lag("cell").over(w).alias("from_cell"),
        F.col("cell").alias("to_cell"),
    ).where(F.col("from_cell").isNotNull())
    return trans.groupBy("from_cell", "to_cell").agg(
        F.count("*").alias("n_transitions")
    )


def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch conversion attribution: each purchase is credited to
    the same user's most recent 'view' at-or-before it, with the
    view→purchase latency in seconds.

    Same scalable union+window shape as asof_join_last_signup (one
    user shuffle, no range join), but carrying the view's EVENT ID —
    so the sort is made total with (ts, side, event_id) and the
    attributed view is deterministic even when several views share a
    timestamp.  Unattributed purchases (no preceding view) keep NULL
    credit — the funnel's cold-start rows.
    """
    ev = load_table(spark, sf_dir, "events")
    views = ev.where(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.lit(0).alias("side"),
        "event_id",
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("side"),
        "event_id",
        F.lit(None).cast("long").alias("view_id"),
        F.lit(None).cast("timestamp").alias("view_ts"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    unioned = views.unionByName(purchases)
    return (
        unioned.select(
            "user_id",
            "ts",
            "side",
            "event_id",
            F.last("view_id", ignorenulls=True).over(w).alias("attributed_view_id"),
            F.last("view_ts", ignorenulls=True).over(w).alias("attributed_view_ts"),
        )
        .where(F.col("side") == 1)
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            "attributed_view_id",
            (
                F.unix_timestamp("ts") - F.unix_timestamp("attributed_view_ts")
            ).alias("gap_s"),
        )
    )


def conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View→purchase latency distribution over the attributed pairs:
    count, exact interpolated percentiles (p50/p90), and max — the
    time-to-convert metric a growth dashboard reads.  One extra
    aggregate over attribution_last_touch's single-shuffle output."""
    attributed = attribution_last_touch(spark, sf_dir).where(
        F.col("gap_s").isNotNull()
    )
    return attributed.agg(
        F.count("*").alias("n_attributed"),
        F.round(F.percentile("gap_s", F.lit(0.5)), 6).alias("p50_s"),
        F.round(F.percentile("gap_s", F.lit(0.9)), 6).alias("p90_s"),
        F.max("gap_s").alias("max_s"),
    )
