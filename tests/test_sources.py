"""Python DataSource + Kafka connector gating (sources/)."""

import pytest

from heatmap_spark.sources.connectors import ConnectorUnavailable, read_kafka_stream
from heatmap_spark.sources.pydatasource import register


def test_synthetic_locations_datasource(spark):
    register(spark)
    df = (
        spark.read.format("synthetic_locations")
        .option("n_rows", "5000")
        .option("n_partitions", "8")
        .load()
    )
    assert df.count() == 5000
    assert df.rdd.getNumPartitions() == 8
    # deterministic: same derivation as sources/locations.py for any id
    row = df.where("event_id = 42").first()
    assert row.latitude == (42 * 104729) % 170000 / 1000.0 - 85.0
    assert row.longitude == (42 * 7919) % 360000 / 1000.0 - 180.0
    assert row.user_id == "u42" and row.source == "gps"
    assert df.where("event_id = 37").first().user_id == "x37"
    assert df.where("event_id = 22").first().user_id == "rt-22"
    assert df.where("event_id = 20").first().source == "background"
    # no dupes / no gaps across partition fences
    assert df.select("event_id").distinct().count() == 5000


def test_kafka_connector_gates_cleanly(spark):
    with pytest.raises(ConnectorUnavailable, match="kafka"):
        read_kafka_stream(spark, "localhost:9092", "events")
