"""Streaming KLL sketch-drift store: exact side-channel merge
identity, replay idempotence, compaction transparency, crash-window
invisibility, and the approximate-KS error bound vs the exact arm."""

import tempfile

from pyspark.sql import functions as F

from heatmap_spark.operators.profiling import (
    ks_from_value_table,
    w1_from_value_table,
)
from heatmap_spark.sources.tables import load_table
from heatmap_spark.streaming.kll_store import (
    accumulated_sketches,
    compact_kll_store,
    merge_batch_into_kll_store,
    serve_kll_drift,
    serve_kll_quantiles,
    serve_kll_w1,
)


def _labeled(spark, sf_smoke):
    ev = load_table(spark, sf_smoke, "events").select(
        "event_type", "ts", "value", "event_id"
    )
    split = ev.agg(F.expr("percentile(unix_timestamp(ts), 0.5)")).first()[0]
    return ev.select(
        "event_type",
        F.when(F.unix_timestamp("ts") <= F.lit(split), F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_a"),
        "value",
        "event_id",
    )


def _build(spark, labeled, store, compact_at=None):
    mx = labeled.agg(F.max("event_id")).first()[0] + 1
    for b in range(3):
        batch = labeled.where(
            F.expr(f"CAST(event_id * 3 DIV {mx} AS INT)") == b
        ).select("event_type", "is_a", "value")
        merge_batch_into_kll_store(spark, batch, store, b)
        if compact_at == b:
            compact_kll_store(spark, store)


def _exact_counts(labeled):
    return {
        r["event_type"]: (r["na"], r["nb"], r["vmin"], r["vmax"])
        for r in labeled.groupBy("event_type")
        .agg(
            F.sum("is_a").alias("na"),
            F.sum(F.lit(1) - F.col("is_a")).alias("nb"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
        )
        .collect()
    }


def test_exact_side_channels_merge_exactly(spark, sf_smoke):
    """n/min/max per half are plain sums/mins/maxes — the streamed
    store must reproduce them exactly through partials + compaction."""
    labeled = _labeled(spark, sf_smoke)
    store = tempfile.mkdtemp(prefix="kll_t_") + "/s"
    _build(spark, labeled, store, compact_at=1)
    want = _exact_counts(labeled)
    for r in accumulated_sketches(spark, store).collect():
        na, nb, vmin, vmax = want[r["event_type"]]
        assert (r["na"], r["nb"]) == (na, nb)
        assert min(r["min_a"], r["min_b"]) == vmin
        assert max(r["max_a"], r["max_b"]) == vmax


def test_served_ks_within_sketch_bound(spark, sf_smoke):
    """|approx − exact| per type must stay inside the pinned 0.08
    bound (theory: 2·(rank_err + 1/grid) ≈ 0.037 at the defaults),
    and compaction must not move the served value's guarantee."""
    labeled = _labeled(spark, sf_smoke)
    store = tempfile.mkdtemp(prefix="kll_t_") + "/s"
    _build(spark, labeled, store, compact_at=1)
    per_val = labeled.groupBy("event_type", "value").agg(
        F.sum("is_a").alias("da"),
        F.sum(F.lit(1) - F.col("is_a")).alias("db"),
    )
    exact = {
        r["event_type"]: r["ks_d"]
        for r in ks_from_value_table(per_val).collect()
    }
    served = serve_kll_drift(spark, store).collect()
    assert len(served) == len(exact)
    for r in served:
        assert abs(r["ks_approx"] - exact[r["event_type"]]) <= 0.08, (
            r["event_type"],
            r["ks_approx"],
            exact[r["event_type"]],
        )


def test_served_w1_within_sketch_bound(spark, sf_smoke):
    """|W1_approx − W1_exact| per type must stay inside 0.05·range
    (theory: 2·(rank_err + 1/grid)·range ≈ 0.037·range)."""
    labeled = _labeled(spark, sf_smoke)
    store = tempfile.mkdtemp(prefix="kll_t_") + "/s"
    _build(spark, labeled, store, compact_at=1)
    per_val = labeled.groupBy("event_type", "value").agg(
        F.sum("is_a").alias("da"),
        F.sum(F.lit(1) - F.col("is_a")).alias("db"),
    )
    exact = {
        r["event_type"]: r["w1"]
        for r in w1_from_value_table(per_val).collect()
    }
    vmin, vmax = labeled.agg(F.min("value"), F.max("value")).first()
    bound = 0.05 * (vmax - vmin)
    served = serve_kll_w1(spark, store).collect()
    assert len(served) == len(exact)
    for r in served:
        assert abs(r["w1_approx"] - exact[r["event_type"]]) <= bound, (
            r["event_type"],
            r["w1_approx"],
            exact[r["event_type"]],
        )


def test_served_quantiles_monotone_and_in_envelope(spark, sf_smoke):
    labeled = _labeled(spark, sf_smoke)
    store = tempfile.mkdtemp(prefix="kll_t_") + "/s"
    _build(spark, labeled, store)
    want = _exact_counts(labeled)
    rows = serve_kll_quantiles(spark, store).collect()
    assert {(r["event_type"], r["half"]) for r in rows} == {
        (t, h) for t in want for h in ("a", "b")
    }
    for r in rows:
        _, _, vmin, vmax = want[r["event_type"]]
        assert r["p50"] <= r["p90"] <= r["p99"]
        # KLL returns only values it saw — the global envelope holds
        # for either half
        assert vmin <= r["p50"] and r["p99"] <= vmax


def test_served_bins_near_equal_frequency(spark, sf_smoke):
    """Sketch-served binning (the quantile_binning swap point): per
    type the bins must partition all rows, be ordered and
    non-overlapping, and each bin's population must sit within the
    sketch tolerance of the ideal N/n_bins — rank error + grid
    rounding + the largest tie group (a boundary absorbs whole tie
    groups exactly like the exact arm)."""
    from heatmap_spark.streaming.kll_store import serve_kll_bins

    labeled = _labeled(spark, sf_smoke)
    store = tempfile.mkdtemp(prefix="kll_t_") + "/s"
    _build(spark, labeled, store, compact_at=1)
    rows = labeled.select("event_type", "value")
    out = serve_kll_bins(spark, store, rows).collect()
    n_per_type = {
        r["event_type"]: r["n"]
        for r in rows.groupBy("event_type").agg(F.count("value").alias("n")).collect()
    }
    max_tie = {
        r["event_type"]: r["m"]
        for r in rows.groupBy("event_type", "value")
        .count()
        .groupBy("event_type")
        .agg(F.max("count").alias("m"))
        .collect()
    }
    by_type = {}
    for r in out:
        by_type.setdefault(r["event_type"], []).append(r)
    assert set(by_type) == set(n_per_type)
    for t, brs in by_type.items():
        brs.sort(key=lambda r: r["bin"])
        n = n_per_type[t]
        assert sum(r["n_rows"] for r in brs) == n
        for a, b in zip(brs, brs[1:]):
            assert a["hi"] <= b["lo"]
        # KLL default k=200: double-sided rank error ~1.33%; slack
        # for tie absorption
        tol = 0.03 * n + max_tie[t]
        for r in brs:
            assert abs(r["n_rows"] - n / 10) <= tol, (t, r, n)


def test_served_mwu_within_sketch_bound(spark, sf_smoke):
    """|AUC_approx − AUC_exact| per type must stay inside the pinned
    0.08 bound (theory: 2·(rank_err + 1/grid) ≈ 0.037 on continuous
    values; tie bias is ~0 on events.value).  Exact twin is
    U₂/(2·na·nb) from the distinct-value arm."""
    from heatmap_spark.operators.profiling import mwu_from_value_table
    from heatmap_spark.streaming.kll_store import serve_kll_mwu

    labeled = _labeled(spark, sf_smoke)
    store = tempfile.mkdtemp(prefix="kll_t_") + "/s"
    _build(spark, labeled, store, compact_at=1)
    per_val = labeled.groupBy("event_type", "value").agg(
        F.sum("is_a").alias("da"),
        F.sum(F.lit(1) - F.col("is_a")).alias("db"),
    )
    exact = {
        r["event_type"]: r["u2"]
        / (2.0 * r["n_first_half"] * r["n_second_half"])
        for r in mwu_from_value_table(per_val).collect()
    }
    served = serve_kll_mwu(spark, store).collect()
    assert len(served) == len(exact)
    for r in served:
        assert 0.0 <= r["auc_approx"] <= 1.0
        assert abs(r["auc_approx"] - exact[r["event_type"]]) <= 0.08, (
            r["event_type"],
            r["auc_approx"],
            exact[r["event_type"]],
        )


def test_empty_store_serve_raises_value_error(spark):
    """Every serve path on an uncommitted store must raise the
    explicit empty-store error, not an AttributeError on None
    (ADVICE r11) — matching ann_store's 'no committed codes'."""
    import pytest

    from heatmap_spark.streaming.kll_store import (
        serve_kll_bins,
        serve_kll_mwu,
    )

    store = tempfile.mkdtemp(prefix="kll_empty_") + "/s"
    rows = spark.createDataFrame(
        [("t", 1.0)], "event_type string, value double"
    )
    for serve in (
        serve_kll_quantiles,
        serve_kll_drift,
        serve_kll_w1,
        serve_kll_mwu,
    ):
        with pytest.raises(ValueError, match="no committed batches"):
            serve(spark, store)
    with pytest.raises(ValueError, match="no committed batches"):
        serve_kll_bins(spark, store, rows)


def test_replayed_batch_is_noop(spark, sf_smoke):
    labeled = _labeled(spark, sf_smoke)
    store = tempfile.mkdtemp(prefix="kll_t_") + "/s"
    _build(spark, labeled, store)
    before = {
        r["event_type"]: (r["na"], r["nb"])
        for r in accumulated_sketches(spark, store).collect()
    }
    replay = labeled.limit(200).select("event_type", "is_a", "value")
    assert merge_batch_into_kll_store(spark, replay, store, 2) is False
    after = {
        r["event_type"]: (r["na"], r["nb"])
        for r in accumulated_sketches(spark, store).collect()
    }
    assert after == before


def test_uncommitted_partial_is_invisible(spark, sf_smoke):
    """Crash window: a sketch partial written without the marker
    advancing must not change the accumulated read."""
    from heatmap_spark.streaming.kll_store import _half_sketch_partial

    labeled = _labeled(spark, sf_smoke)
    store = tempfile.mkdtemp(prefix="kll_t_") + "/s"
    _build(spark, labeled, store)
    before = {
        r["event_type"]: (r["na"], r["nb"])
        for r in accumulated_sketches(spark, store).collect()
    }
    _half_sketch_partial(
        labeled.limit(500).select("event_type", "is_a", "value")
    ).write.mode("overwrite").parquet(store + "/sk/batch=9")
    after = {
        r["event_type"]: (r["na"], r["nb"])
        for r in accumulated_sketches(spark, store).collect()
    }
    assert after == before


def test_binning_timeline_survives_compaction_and_guards(spark, sf_smoke):
    """Boundary snapshots are bins-sized timeline rows the compactor
    never GCs: after a mid-stream compaction deletes the sketch
    partials, every (type, batch) snapshot is still readable.  Emit is
    replay-idempotent and refuses off-commit batches."""
    import pytest

    from heatmap_spark.streaming.kll_store import (
        emit_binning_histogram,
        emit_binning_snapshot,
        read_binning_histogram,
        read_binning_timeline,
    )

    labeled = _labeled(spark, sf_smoke)
    mx = labeled.agg(F.max("event_id")).first()[0] + 1
    store = tempfile.mkdtemp(prefix="kll_tl_") + "/s"
    with pytest.raises(ValueError, match="no committed binning"):
        read_binning_timeline(spark, store)
    with pytest.raises(ValueError, match="no committed histogram"):
        read_binning_histogram(spark, store)
    for b in range(3):
        batch = labeled.where(
            F.expr(f"CAST(event_id * 3 DIV {mx} AS INT)") == b
        ).select("event_type", "is_a", "value")
        merge_batch_into_kll_store(spark, batch, store, b)
        if b == 0:
            # the histogram needs its batch's snapshot first
            with pytest.raises(ValueError, match="no boundary snapshot"):
                emit_binning_histogram(
                    spark, store, batch.select("event_type", "value"), b
                )
        assert emit_binning_snapshot(spark, store, b) is True
        assert (
            emit_binning_histogram(
                spark, store, batch.select("event_type", "value"), b
            )
            is True
        )
        if b == 1:
            compact_kll_store(spark, store)
    n_types = labeled.select("event_type").distinct().count()
    tl = read_binning_timeline(spark, store)
    assert tl.count() == 3 * n_types
    hist = read_binning_histogram(spark, store)
    assert hist.count() == 3 * n_types
    # per-batch bin shares sum to 1 via the sequence fill: L1 bounded
    assert (
        hist.where(F.col("l1_vs_uniform") > 2.0).count() == 0
    )
    # replay of an emitted snapshot/histogram: no-op; off-commit: loud
    assert emit_binning_snapshot(spark, store, 2) is False
    assert (
        emit_binning_histogram(
            spark,
            store,
            labeled.limit(5).select("event_type", "value"),
            2,
        )
        is False
    )
    with pytest.raises(ValueError, match="sketch log is at batch 2"):
        emit_binning_snapshot(spark, store, 5)
    # first snapshot has no predecessor; later ones must have a shift
    assert (
        tl.where(
            (F.col("batch_id") > 0) & F.col("boundary_shift").isNull()
        ).count()
        == 0
    )
    assert (
        tl.where(
            (F.col("batch_id") == 0) & F.col("boundary_shift").isNotNull()
        ).count()
        == 0
    )


def test_binning_timeline_shift_trips_on_distribution_move(spark):
    """The stability metric is the staleness signal: a planted level
    shift (values jump by 2x the original range at batch 2) must spike
    boundary_shift at the shift batch, while the stationary batches
    before it stay low."""
    from heatmap_spark.streaming.kll_store import (
        emit_binning_histogram,
        emit_binning_snapshot,
        merge_batch_into_kll_store,
        read_binning_histogram,
        read_binning_timeline,
    )

    base = spark.range(8000).select(
        F.lit("t").alias("event_type"),
        F.pmod(F.hash("id"), F.lit(2)).cast("int").alias("is_a"),
        (F.pmod(F.hash("id", F.lit(7)), F.lit(100000)).cast("double") / 1000.0).alias(
            "value"
        ),
        F.col("id"),
    )
    store = tempfile.mkdtemp(prefix="kll_tl_shift_") + "/s"
    for b in range(4):
        batch = base.where(F.col("id") % 4 == b)
        if b >= 2:  # the planted move: +200 on a ~[0, 100) base
            batch = batch.withColumn("value", F.col("value") + F.lit(200.0))
        merge_batch_into_kll_store(
            spark,
            batch.select("event_type", "is_a", "value"),
            store,
            b,
        )
        emit_binning_snapshot(spark, store, b)
        emit_binning_histogram(
            spark, store, batch.select("event_type", "value"), b
        )
    shifts = {
        r["batch_id"]: r["boundary_shift"]
        for r in read_binning_timeline(spark, store).collect()
    }
    assert shifts[0] is None
    assert shifts[1] < 0.05, shifts  # stationary: boundaries settled
    assert shifts[2] > 0.15, shifts  # the move: boundaries jumped
    l1 = {
        r["batch_id"]: r["l1_vs_uniform"]
        for r in read_binning_histogram(spark, store).collect()
    }
    # population arm sees the same move: the shifted batch piles into
    # the top bins of its own pooled snapshot
    assert l1[1] < 0.25, l1
    assert l1[2] > 0.5, l1


def test_binning_stream_entry_point(spark, sf_smoke, tmp_path):
    """stream_binning drives the whole dashboard from a file stream:
    every committed micro-batch leaves a boundary snapshot AND a
    histogram row set, and the accumulated counts cover the corpus."""
    from heatmap_spark.streaming.kll_store import (
        read_binning_histogram,
        read_binning_timeline,
        stream_binning,
    )

    labeled = _labeled(spark, sf_smoke).select(
        "event_type", "is_a", "value"
    )
    store, src = str(tmp_path / "store"), str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    labeled.repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema(labeled.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = stream_binning(stream, store, ckpt)
    q.awaitTermination(timeout=300)
    tl = read_binning_timeline(spark, store)
    hist = read_binning_histogram(spark, store)
    n_batches = tl.select("batch_id").distinct().count()
    assert n_batches >= 3
    # one snapshot per (type, batch) and one histogram row per too
    assert tl.count() == hist.count()
    # the histogram log partitions the corpus exactly
    assert (
        hist.agg(F.sum("n_batch")).first()[0] == labeled.count()
    )


def test_binning_histogram_crash_window_invisible(spark, sf_smoke):
    """A hist dir written without the sketch marker covering it is
    invisible to the reader — the store-wide crash-window contract."""
    from heatmap_spark.streaming.kll_store import (
        emit_binning_histogram,
        emit_binning_snapshot,
        read_binning_histogram,
    )

    labeled = _labeled(spark, sf_smoke)
    store = tempfile.mkdtemp(prefix="kll_hist_cw_") + "/s"
    batch = labeled.limit(400).select("event_type", "is_a", "value")
    merge_batch_into_kll_store(spark, batch, store, 0)
    emit_binning_snapshot(spark, store, 0)
    emit_binning_histogram(
        spark, store, batch.select("event_type", "value"), 0
    )
    before = sorted(
        (r["batch_id"], r["event_type"], r["n_batch"])
        for r in read_binning_histogram(spark, store).collect()
    )
    # orphan hist partial beyond the committed marker
    spark.read.parquet(store + "/hist/batch=0").withColumn(
        "batch_id", F.lit(9)
    ).write.parquet(store + "/hist/batch=9")
    after = sorted(
        (r["batch_id"], r["event_type"], r["n_batch"])
        for r in read_binning_histogram(spark, store).collect()
    )
    assert after == before


def test_dashboard_metrics_match_pure_python_reference(spark, sf_smoke):
    """boundary_shift and l1_vs_uniform recomputed in plain Python
    from the raw bins/hist logs must equal the Spark-computed columns
    (round@6) — pins the metric arithmetic itself, not just its
    behavior under stationary/shifted streams."""
    from heatmap_spark.streaming.kll_store import (
        emit_binning_histogram,
        emit_binning_snapshot,
        read_binning_histogram,
        read_binning_timeline,
    )

    labeled = _labeled(spark, sf_smoke)
    mx = labeled.agg(F.max("event_id")).first()[0] + 1
    store = tempfile.mkdtemp(prefix="kll_ref_") + "/s"
    for b in range(3):
        batch = labeled.where(
            F.expr(f"CAST(event_id * 3 DIV {mx} AS INT)") == b
        ).select("event_type", "is_a", "value")
        merge_batch_into_kll_store(spark, batch, store, b)
        emit_binning_snapshot(spark, store, b)
        emit_binning_histogram(
            spark, store, batch.select("event_type", "value"), b
        )

    # raw logs, straight off parquet
    snaps = {}
    for r in spark.read.parquet(store + "/bins/batch=*").collect():
        snaps[(r["event_type"], r["batch_id"])] = (
            list(r["bounds"]), r["vmin"], r["vmax"], r["n_bins"]
        )
    hists = {}
    for r in spark.read.parquet(store + "/hist/batch=*").collect():
        hists.setdefault((r["event_type"], r["batch_id"]), {})[r["bin"]] = r[
            "n_rows"
        ]

    for r in read_binning_timeline(spark, store).collect():
        key = (r["event_type"], r["batch_id"])
        if r["batch_id"] == 0:
            assert r["boundary_shift"] is None
            continue
        bounds, vmin, vmax, _ = snaps[key]
        pbounds = snaps[(r["event_type"], r["batch_id"] - 1)][0]
        want = max(abs(a - b) for a, b in zip(bounds, pbounds)) / (
            vmax - vmin
        )
        assert abs(r["boundary_shift"] - want) < 1e-6, key

    for r in read_binning_histogram(spark, store).collect():
        key = (r["event_type"], r["batch_id"])
        by_bin = hists[key]
        n = sum(by_bin.values())
        assert r["n_batch"] == n
        want = sum(
            abs(by_bin.get(b, 0) / n - 1.0 / r["n_bins"])
            for b in range(1, r["n_bins"] + 1)
        )
        assert abs(r["l1_vs_uniform"] - want) < 1e-6, key


def test_binning_tolerates_one_sided_store(spark, sf_smoke):
    """A store fed entirely into one half (the binning arms pool the
    halves, so callers that don't care about drift labels may ingest
    is_a=1 throughout) must still serve non-NULL boundaries and bins —
    merging a half with itself preserves every quantile."""
    from heatmap_spark.streaming.kll_store import (
        emit_binning_histogram,
        emit_binning_snapshot,
        read_binning_histogram,
        read_binning_timeline,
        serve_kll_bins,
    )

    labeled = _labeled(spark, sf_smoke).select(
        "event_type", F.lit(1).alias("is_a"), "value"
    )
    store = tempfile.mkdtemp(prefix="kll_oneside_") + "/s"
    merge_batch_into_kll_store(spark, labeled, store, 0)
    emit_binning_snapshot(spark, store, 0)
    emit_binning_histogram(
        spark, store, labeled.select("event_type", "value"), 0
    )
    tl = read_binning_timeline(spark, store)
    assert tl.where(F.col("bounds").isNull()).count() == 0
    assert tl.where(F.expr("exists(bounds, b -> b is null)")).count() == 0
    hist = read_binning_histogram(spark, store)
    assert hist.where(F.col("l1_vs_uniform").isNull()).count() == 0
    # and the serve-side binning covers every row
    total = (
        serve_kll_bins(
            spark, store, labeled.select("event_type", "value")
        )
        .agg(F.sum("n_rows"))
        .first()[0]
    )
    assert total == labeled.count()
