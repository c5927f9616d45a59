"""Partition pruning: a date-partitioned heatmap sink must answer
single-partition queries by scanning ONE partition (PartitionFilters in
the scan, not a post-scan filter) — the layout that makes timespan
queries cheap at 100 TB."""

import pytest
from pyspark.sql import functions as F

from heatmap_spark.operators import pyramid as P
from heatmap_spark.plans import plan_string
from heatmap_spark.sources.locations import load_locations


@pytest.fixture(scope="module")
def partitioned_sink(spark, sf_smoke, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("pyr_parts") / "pyramid")
    df = P.build_pyramid(
        load_locations(spark, sf_smoke),
        mode="explode",
        timespans=("day",),
        min_zoom=10,
        max_zoom=10,
    )
    df.write.partitionBy("timespan").mode("overwrite").parquet(out)
    return out


def test_partition_filter_reaches_scan(spark, partitioned_sink):
    back = spark.read.parquet(partitioned_sink)
    days = [r.timespan for r in back.select("timespan").distinct().collect()]
    assert len(days) > 1  # fixture spans multiple days
    one = back.where(F.col("timespan") == days[0])
    plan = plan_string(one, "formatted")
    assert "PartitionFilters" in plan
    # the partition predicate must be IN PartitionFilters, not a residual filter
    pf_lines = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert any("timespan" in l for l in pf_lines), plan
    assert one.count() > 0


def test_partitioned_roundtrip_totals(spark, sf_smoke, partitioned_sink):
    back = spark.read.parquet(partitioned_sink)
    direct = P.build_pyramid(
        load_locations(spark, sf_smoke),
        mode="explode",
        timespans=("day",),
        min_zoom=10,
        max_zoom=10,
    )
    assert back.agg(F.sum("visits")).first()[0] == direct.agg(F.sum("visits")).first()[0]
    assert back.count() == direct.count()
