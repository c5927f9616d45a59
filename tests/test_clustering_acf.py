"""Round-5 analytics landings: integer fixed-point k-means and the
exact-integer autocorrelation fold."""

from pyspark.sql import functions as F

from heatmap_spark.operators.similarity import _tdiv, kmeans_embeddings
from heatmap_spark.operators.timeseries import autocorrelation
from heatmap_spark.sources.tables import load_table


def test_tdiv_matches_engine_semantics():
    # Spark div / DuckDB // truncate toward zero; Python // floors
    assert _tdiv(7, 2) == 3
    assert _tdiv(-7, 2) == -3  # floor would give -4
    assert _tdiv(0, 5) == 0


def test_kmeans_partitions_and_improves(spark, sf_smoke):
    out = kmeans_embeddings(spark, sf_smoke, k=8, iters=2).localCheckpoint(
        eager=True
    )
    emb = load_table(spark, sf_smoke, "embeddings")
    n = emb.count()
    assert out.count() == n  # every vector assigned exactly once
    clusters = out.select("cluster").distinct()
    assert clusters.where((F.col("cluster") < 0) | (F.col("cluster") >= 8)).count() == 0
    # cluster_size is consistent with the assignment
    sizes = out.groupBy("cluster").count()
    bad = (
        out.select("cluster", "cluster_size")
        .distinct()
        .join(sizes, "cluster")
        .where(F.col("cluster_size") != F.col("count"))
        .count()
    )
    assert bad == 0
    # Lloyd iterations must beat the arbitrary vec_id % k seed:
    # compare exact integer inertia of the final assignment vs seed.
    q = emb.select(
        "vec_id",
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: F.floor(x * F.lit(1000000000.0)).cast("long"),
        ).alias("qv"),
    )

    def inertia(assign):
        cent = (
            assign.join(q, "vec_id")
            .select("cluster", F.posexplode("qv").alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg((F.sum("x") / F.count(F.lit(1))).alias("m"))
        )
        j = (
            assign.join(q, "vec_id")
            .select("cluster", F.posexplode("qv").alias("pos", "x"))
            .join(cent, ["cluster", "pos"])
        )
        return j.agg(
            F.sum((F.col("x") - F.col("m")) * (F.col("x") - F.col("m")))
        ).first()[0]

    seed = q.select("vec_id", (F.col("vec_id") % 8).cast("int").alias("cluster"))
    final = out.select("vec_id", "cluster")
    assert inertia(final) < inertia(seed)


def test_kmeans_deterministic(spark, sf_smoke):
    a = sorted(kmeans_embeddings(spark, sf_smoke).collect())
    b = sorted(kmeans_embeddings(spark, sf_smoke).collect())
    assert a == b


def test_acf_bounds_and_shape(spark, sf_smoke):
    out = autocorrelation(spark, sf_smoke, max_lag=6).localCheckpoint(eager=True)
    types = load_table(spark, sf_smoke, "events").select("event_type").distinct()
    assert out.count() == types.count() * 6
    # |r_k| <= 1 (Cauchy-Schwarz on the centered series) and n_pairs
    # decreases by exactly one per extra lag
    assert out.where(F.abs(F.col("acf")) > 1.0).count() == 0
    steps = (
        out.groupBy("event_type")
        .agg((F.max("n_pairs") - F.min("n_pairs")).alias("spread"))
        .where(F.col("spread") != 5)
        .count()
    )
    assert steps == 0


def test_acf_detects_planted_period(spark):
    """A strict period-3 hourly series must score acf(3) ≈ (n−3)/n
    (the statistical ACF's numerator has n−k terms against the n-term
    variance, so even a perfect period lands just under 1) and a
    negative acf at the off-phase lags."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    data = []
    eid = 0
    for h in range(240):
        n_events = [5, 1, 0][h % 3]
        for _ in range(n_events):
            data.append((eid, base + dt.timedelta(hours=h, minutes=1), 7, "p3", 1.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        data,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string",
    )
    import heatmap_spark.operators.timeseries as ts
    from unittest import mock

    with mock.patch.object(ts, "load_table", lambda s, d, t: df):
        out = {r["lag"]: r["acf"] for r in ts.autocorrelation(spark, "ignored", max_lag=3).collect()}
    assert 0.98 < out[3] <= 1.0
    assert out[1] < 0 and out[2] < 0
