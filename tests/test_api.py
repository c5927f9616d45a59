"""Fluent API + connector-gating tests."""

import json

import pytest
from pyspark.sql import functions as F

from heatmap_spark.api import Heatmap
from heatmap_spark.operators import pyramid as P
from heatmap_spark.sources.connectors import ConnectorUnavailable, read_cassandra, write_cassandra
from heatmap_spark.sources.locations import load_locations


def test_fluent_chain_matches_operators(spark, sf_smoke, tmp_path):
    built = (
        Heatmap(spark)
        .from_events_dir(sf_smoke)
        .pyramid(mode="explode")
        .resultsets()
        .table()
        .df()
    )
    direct = P.heatmap_table(
        P.resultsets(P.build_pyramid(load_locations(spark, sf_smoke), mode="explode"))
    )
    got = {r.id: json.loads(r.heatmap) for r in built.collect()}
    exp = {r.id: json.loads(r.heatmap) for r in direct.collect()}
    assert got == exp and len(got) > 0


def test_fluent_save_roundtrip(spark, sf_smoke, tmp_path):
    out = str(tmp_path / "heatmaps")
    Heatmap(spark).from_events_dir(sf_smoke).pyramid().resultsets().table().save(
        out, mode="overwrite"
    )
    back = spark.read.parquet(out)
    assert back.count() > 0
    assert set(back.columns) == {"id", "heatmap"}


def test_from_locations_defaults_weight(spark):
    df = spark.createDataFrame(
        [(10.0, 20.0, None, "u1", "gps")],
        "latitude double, longitude double, ts timestamp, user_id string, source string",
    )
    b = Heatmap(spark).from_locations(df)
    assert "weight" in b.df().columns
    assert b.df().first().weight == 1.0


def test_stage_order_enforced(spark, sf_smoke):
    h = Heatmap(spark).from_events_dir(sf_smoke)
    with pytest.raises(ValueError):
        h.resultsets()
    with pytest.raises(ValueError):
        h.pyramid().table()


def test_connectors_gate_cleanly(spark):
    with pytest.raises(ConnectorUnavailable):
        read_cassandra(spark, host="127.0.0.1")
    df = spark.createDataFrame([("a", "{}")], "id string, heatmap string")
    with pytest.raises(ConnectorUnavailable):
        write_cassandra(df)


def test_fluent_smooth_stage(spark, sf_smoke):
    from heatmap_spark.api import Heatmap

    sm = (
        Heatmap(spark)
        .from_events_dir(sf_smoke)
        .pyramid()
        .smooth(8)
        .df()
    )
    assert sm.columns == ["user_group", "timespan", "row", "col", "smoothed"]
    assert sm.count() > 0


def test_concurrent_queries_different_sf_dirs(spark, sf_smoke, sf_correct):
    """SQL-surface queries registered via sf_dir-encoded views must not
    cross-contaminate when run concurrently against different scale
    dirs (the fixed-name race: thread B's view replacement landing
    between thread A's registration and analysis)."""
    from concurrent.futures import ThreadPoolExecutor

    from heatmap_spark.queries import q_heatmap_pyramid_sql

    def run(sf):
        return q_heatmap_pyramid_sql(spark, sf).count()

    expected = {sf: run(sf) for sf in (sf_smoke, sf_correct)}
    assert expected[sf_smoke] != expected[sf_correct]
    with ThreadPoolExecutor(4) as ex:
        futures = [
            (sf, ex.submit(run, sf))
            for _ in range(3)
            for sf in (sf_smoke, sf_correct)
        ]
        for sf, fut in futures:
            assert fut.result(timeout=300) == expected[sf]
