"""Time-series + sketch operator invariants beyond the oracle equality
checks (which run automatically via tests/test_oracle.py).
"""

from pyspark.sql import functions as F

from heatmap_spark.operators.profiling import hll_user_sketches
from heatmap_spark.operators.timeseries import gap_fill_hourly_events, rolling_revenue_7d
from heatmap_spark.sources.tables import load_table


def test_gap_fill_grid_is_dense(spark, sf_smoke):
    """Every (event_type, hour) slot in the global span exists exactly
    once, and the zero-filled counts still sum to the raw row count."""
    out = gap_fill_hourly_events(spark, sf_smoke).cache()
    ev = load_table(spark, sf_smoke, "events")

    n_types = ev.select("event_type").distinct().count()
    bounds = out.agg(
        F.min("hour").alias("mn"), F.max("hour").alias("mx"), F.count(F.lit(1)).alias("n")
    ).first()
    span_hours = int((bounds.mx - bounds.mn).total_seconds() // 3600) + 1
    assert bounds.n == n_types * span_hours

    assert out.select(F.sum("n_events")).first()[0] == ev.count()
    # dense: no duplicate slots
    assert out.select("event_type", "hour").distinct().count() == bounds.n
    out.unpersist()


def test_rolling_range_frame_counts_by_time_not_rows(spark, sf_smoke):
    """The 7-day frame must include every same-window order regardless
    of row order: recompute one customer's frame with a self-join."""
    out = rolling_revenue_7d(spark, sf_smoke)
    o = load_table(spark, sf_smoke, "orders")
    cust = o.groupBy("o_custkey").count().orderBy(F.desc("count"), "o_custkey").first()[0]

    got = {r.o_orderkey: r.n_orders_7d for r in out.where(F.col("o_custkey") == cust).collect()}
    rows = o.where(F.col("o_custkey") == cust).select("o_orderkey", "o_orderdate").collect()
    for r in rows:
        expect = sum(
            1 for s in rows if 0 <= (r.o_orderdate - s.o_orderdate).days <= 6
        )
        assert got[r.o_orderkey] == expect


def test_hll_estimates_within_tolerance(spark, sf_smoke):
    """DataSketches HLL at default lgK=12 is ~1.6% rel. std error; pin a
    generous 5% bound vs the exact distinct counts, and the union row
    must estimate the global distinct (not the sum of per-type)."""
    rows = hll_user_sketches(spark, sf_smoke).collect()
    assert {"__all__"} < {r.event_type for r in rows}
    for r in rows:
        assert abs(r.approx_users - r.exact_users) <= max(2, 0.05 * r.exact_users), r


def test_kll_quantiles_within_rank_error(spark, sf_smoke):
    """KLL p50/p90/p99 must land within a small RANK error of the
    exact distribution (k=200 ⇒ ~1.65% rank error at 99% confidence;
    we allow 3%), and get_n must be exact."""
    from pyspark.sql import functions as F

    from heatmap_spark.operators.profiling import kll_value_quantiles
    from heatmap_spark.sources.tables import load_table

    ev = load_table(spark, sf_smoke, "events")
    got = {r.event_type: r for r in kll_value_quantiles(spark, sf_smoke).collect()}
    for et, r in got.items():
        vals = sorted(
            x.value for x in ev.where(F.col("event_type") == et).select("value").collect()
        )
        assert r.n_seen == len(vals)
        for q, est in ((0.5, r.p50), (0.9, r.p90), (0.99, r.p99)):
            import bisect

            lo = bisect.bisect_left(vals, est)
            hi = bisect.bisect_right(vals, est)
            rank_lo, rank_hi = lo / len(vals), hi / len(vals)
            assert rank_lo - 0.03 <= q <= rank_hi + 0.03, (et, q, est, rank_lo, rank_hi)


def test_ewma_within_series_bounds_and_order_sensitive(spark, sf_smoke):
    """EWMA lies within [min, max] of its series, and reversing the
    order changes the result (it is genuinely order-sensitive)."""
    from pyspark.sql import functions as F

    from heatmap_spark.operators.timeseries import ewma_by_type
    from heatmap_spark.sources.tables import load_table

    got = {r.event_type: r for r in ewma_by_type(spark, sf_smoke).collect()}
    ev = load_table(spark, sf_smoke, "events")
    bounds = {
        r.event_type: (r.lo, r.hi)
        for r in ev.groupBy("event_type")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    }
    assert set(got) == set(bounds)
    for et, r in got.items():
        lo, hi = bounds[et]
        assert lo - 1e-6 <= r.ewma <= hi + 1e-6


def test_zscore_outliers_are_extreme(spark, sf_correct):
    """Every reported row has |z| >= 3 and its value is beyond
    mean ± 3·std of its type."""
    from heatmap_spark.operators.profiling import zscore_outliers

    rows = zscore_outliers(spark, sf_correct).collect()
    assert rows
    for r in rows:
        assert abs(r.z) >= 3.0


def test_ewma_segmented_matches_flat_fold(spark, sf_smoke):
    """The segmented scan (per-day affine folds composed in order) must
    agree with the flat zero-init sequential fold to float-assoc
    tolerance — same math, different association."""
    from pyspark.sql import functions as F

    from heatmap_spark.operators.timeseries import ewma_segmented
    from heatmap_spark.sources.tables import load_table

    got = {r.event_type: r for r in ewma_segmented(spark, sf_smoke).collect()}
    ev = load_table(spark, sf_smoke, "events")
    series = (
        ev.select("event_type", "ts", "event_id", "value")
        .orderBy("event_type", "ts", "event_id")
        .collect()
    )
    flat = {}
    counts = {}
    for r in series:
        acc = flat.get(r.event_type, 0.0)
        flat[r.event_type] = 0.5 * acc + 0.5 * r.value
        counts[r.event_type] = counts.get(r.event_type, 0) + 1
    assert set(got) == set(flat)
    for et, r in got.items():
        assert r.n == counts[et]
        # the query rounds to 6 decimals; assoc error itself is ~1e-12
        assert abs(r.ewma - flat[et]) < 1e-6


def test_holt_matches_python_reference(spark, sf_smoke):
    """The distributed Holt fold reproduces a direct Python recurrence
    over the same ordered series, and forecasts extrapolate linearly."""
    from heatmap_spark.operators.timeseries import holt_by_type
    from heatmap_spark.sources.tables import load_table

    got = {r["event_type"]: r for r in holt_by_type(spark, sf_smoke).collect()}
    ev = (
        load_table(spark, sf_smoke, "events")
        .select("event_type", "ts", "event_id", "value")
        .collect()
    )
    series = {}
    for r in sorted(ev, key=lambda r: (r["event_type"], r["ts"], r["event_id"])):
        series.setdefault(r["event_type"], []).append(float(r["value"]))
    a, b = 0.5, 0.3
    for et, vals in series.items():
        level, trend = vals[0], 0.0
        for x in vals[1:]:
            new_l = a * x + (1 - a) * (level + trend)
            trend = b * (new_l - level) + (1 - b) * trend
            level = new_l
        g = got[et]
        assert g["n"] == len(vals)
        assert abs(g["level"] - level) < 1e-6
        assert abs(g["trend"] - trend) < 1e-6
        for h in (1, 2, 3):
            assert abs(g[f"fc_{h}"] - (level + h * trend)) < 1e-6


def test_holt_winters_matches_python_reference(spark, sf_smoke):
    """The 9-slot array fold reproduces a direct Python triple-smoothing
    recurrence, seasonal forecasts included."""
    from heatmap_spark.operators.timeseries import holt_winters_by_type
    from heatmap_spark.sources.tables import load_table

    got = {
        r["event_type"]: r for r in holt_winters_by_type(spark, sf_smoke).collect()
    }
    ev = (
        load_table(spark, sf_smoke, "events")
        .select("event_type", "ts", "event_id", "value")
        .collect()
    )
    series = {}
    for r in sorted(ev, key=lambda r: (r["event_type"], r["ts"], r["event_id"])):
        series.setdefault(r["event_type"], []).append(float(r["value"]))
    a, b, g, m = 0.5, 0.3, 0.2, 7
    for et, vals in series.items():
        level, trend, season = vals[0], 0.0, [0.0] * m
        for t in range(1, len(vals)):
            x, si = vals[t], season[t % m]
            new_l = a * (x - si) + (1 - a) * (level + trend)
            trend = b * (new_l - level) + (1 - b) * trend
            season[t % m] = g * (x - new_l) + (1 - g) * si
            level = new_l
        gt = got[et]
        n = len(vals)
        assert gt["n"] == n
        assert abs(gt["level"] - level) < 1e-6
        assert abs(gt["trend"] - trend) < 1e-6
        for h in (1, 2, 3):
            fc = level + h * trend + season[(n - 1 + h) % m]
            assert abs(gt[f"fc_{h}"] - fc) < 1e-6


def test_forecast_backtest_metrics_consistent(spark, sf_smoke):
    from heatmap_spark.operators.timeseries import forecast_backtest

    out = forecast_backtest(spark, sf_smoke).localCheckpoint(eager=True)
    rows = out.collect()
    assert rows  # every fixture type has > 12 observations
    for r in rows:
        assert r["n_train"] == r["n"] - 5
        assert r["mae_holt"] >= 0 and r["mae_snaive"] >= 0
        assert r["mase_holt"] >= 0
        want = "holt" if r["mae_holt"] <= r["mae_snaive"] else "seasonal_naive"
        # winner is decided on unrounded sums; rounded maes can tie —
        # only assert consistency when the rounded values differ
        if r["mae_holt"] != r["mae_snaive"]:
            assert r["winner"] == want


def test_forecast_backtest_holt_wins_on_linear_trend(spark):
    """A clean linear-trend series is Holt's home turf: extrapolation
    must beat repeating week-old values."""
    import datetime as dt
    from unittest import mock

    import heatmap_spark.operators.timeseries as ts

    base = dt.datetime(2024, 1, 1)
    data = [
        (i, base + dt.timedelta(hours=i), 1, "lin", float(10 + 3 * i), "{}")
        for i in range(60)
    ]
    df = spark.createDataFrame(
        data,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string",
    )
    with mock.patch.object(ts, "load_table", lambda s, d, t: df):
        r = ts.forecast_backtest(spark, "ignored").collect()[0]
    assert r["winner"] == "holt"
    assert r["mase_holt"] < 1.0  # beats in-sample naive drift too


def test_cusum_detects_planted_level_shift(spark):
    """A flat series with a +8-unit level shift over its last 10
    points must alarm shortly after the shift and never before (the
    shift is kept short so it doesn't drag the global mean far from
    the base regime); a pure flat series never alarms."""
    import datetime

    from heatmap_spark.operators.timeseries import cusum_df

    base = datetime.datetime(2024, 1, 1)
    rows = []
    for i in range(100):
        # mild alternation so std > 0; shift of +8 units at i >= 90
        v = 10.0 + (0.5 if i % 2 else -0.5) + (8.0 if i >= 90 else 0.0)
        rows.append(("shifted", base + datetime.timedelta(minutes=i), i, v))
        rows.append(
            ("flat", base + datetime.timedelta(minutes=i), i,
             10.0 + (0.5 if i % 2 else -0.5))
        )
    ev = spark.createDataFrame(rows, "event_type string, ts timestamp, event_id long, value double")
    out = {r["event_type"]: r for r in cusum_df(ev).collect()}
    assert out["flat"]["n_alarms"] == 0
    assert out["flat"]["first_alarm"] == -1
    assert out["shifted"]["n_alarms"] >= 1
    assert 91 <= out["shifted"]["first_alarm"] <= 99


def test_cusum_changepoints_fixture_invariants(spark, sf_smoke):
    """Fold-state invariants on the fixture: final S's in [0, h],
    first_alarm null-object is -1 iff n_alarms == 0."""
    from heatmap_spark.operators.timeseries import cusum_changepoints

    for r in cusum_changepoints(spark, sf_smoke).collect():
        assert 0.0 <= r["final_s_pos"] <= 3.0
        assert 0.0 <= r["final_s_neg"] <= 3.0
        assert (r["n_alarms"] == 0) == (r["first_alarm"] == -1)
        if r["n_alarms"] > 0:
            assert 1 <= r["first_alarm"] <= r["n"]


def test_embargo_split_properties(spark, sf_smoke):
    """Train fraction ≈ 0.7; the embargo band is temporally BETWEEN
    train and test (max train ts <= min embargo ts <= min test ts) and
    spans at most embargo_s; no event is unlabeled."""
    from pyspark.sql import functions as F

    from heatmap_spark.operators.timeseries import embargo_split

    out = embargo_split(spark, sf_smoke).localCheckpoint(eager=True)
    n = out.count()
    counts = {r["split"]: r["cnt"] for r in
              out.groupBy("split").agg(F.count("*").alias("cnt")).collect()}
    assert abs(counts["train"] / n - 0.7) < 0.02
    assert counts.get("test", 0) > 0
    b = {s: out.where(F.col("split") == s) for s in counts}
    mx_train = b["train"].agg(F.max("ts")).first()[0]
    mn_test = b["test"].agg(F.min("ts")).first()[0]
    from heatmap_spark.sources.tables import load_table

    ev = load_table(out.sparkSession, sf_smoke, "events")
    cutoff = ev.agg(
        F.expr("percentile(unix_micros(ts), CAST(0.7 AS DOUBLE))")
    ).first()[0]
    if "embargo" in b and counts.get("embargo"):
        mn_e = b["embargo"].agg(F.min(F.unix_micros("ts"))).first()[0]
        mx_e = b["embargo"].agg(F.max(F.unix_micros("ts"))).first()[0]
        assert mn_e > cutoff and mx_e <= cutoff + 3600 * 1_000_000
    mn_test_us = b["test"].agg(F.min(F.unix_micros("ts"))).first()[0]
    assert mn_test_us > cutoff + 3600 * 1_000_000
    assert mx_train is not None and mn_test is not None
    assert sum(counts.values()) == n


def test_quantile_binning_invariants(spark, sf_smoke):
    """Exact equal-frequency binning (round 11): per type the bin
    counts must sum to the row count, bins are 1..n_bins when the
    type has enough distinct values, value ranges are ordered and
    non-overlapping across bins (hi of bin j <= lo of bin j+1 up to
    the rounding the query applies), and no bin exceeds the
    percentile_disc ceiling ceil(N/n_bins) + tie slack (bins absorb
    whole tie groups, so the slack is the largest tie group)."""
    from heatmap_spark.operators.profiling import quantile_binning
    from heatmap_spark.sources.tables import load_table

    out = quantile_binning(spark, sf_smoke).collect()
    ev = load_table(spark, sf_smoke, "events")
    n_per_type = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count("value").alias("n")).collect()
    }
    max_tie = {
        r["event_type"]: r["m"]
        for r in ev.groupBy("event_type", "value")
        .count()
        .groupBy("event_type")
        .agg(F.max("count").alias("m"))
        .collect()
    }
    by_type = {}
    for r in out:
        by_type.setdefault(r["event_type"], []).append(r)
    assert set(by_type) == set(n_per_type)
    for t, rows in by_type.items():
        rows.sort(key=lambda r: r["bin"])
        assert sum(r["n_rows"] for r in rows) == n_per_type[t]
        assert [r["bin"] for r in rows] == list(range(1, len(rows) + 1))
        for a, b in zip(rows, rows[1:]):
            assert a["hi"] <= b["lo"]
        ceiling = -(-n_per_type[t] // 10) + max_tie[t]
        assert all(r["n_rows"] <= ceiling for r in rows), (t, rows)
