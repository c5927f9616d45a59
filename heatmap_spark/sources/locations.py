"""Deterministic ``locations`` table derived from the ``events`` fixture.

The reference's input table (Cassandra ``rhom.locations``, reference
heatmap.py:137; fields consumed at heatmap.py:27-34) has schema
(latitude, longitude, timestamp, user_id, source).  The driver testdata
has no locations parquet, so we derive one *deterministically and
SQL-expressibly* from ``events`` — the same rows are reproducible in
Spark and in DuckDB, which makes every heatmap query oracle-checkable
end-to-end (FIXTURES.md §3 suggests exactly this derivation).

Derivation (pure integer arithmetic → bit-identical across engines):
  latitude  = mod(event_id * 104729, 170000)/1000 − 85     ∈ [−85, 85)
  longitude = mod(event_id * 7919,  360000)/1000 − 180     ∈ [−180, 180)
  user_id   = 'x…' | 'rt-…' | 'u…' prefix classes exercising the
              reference's user-group rules (heatmap.py:64-70)
  source    = 'background' for 5% of rows (heatmap.py:28 filter)
  weight    = 1.0  (the reference's per-visit count, heatmap.py:35)

Multipliers 104729/7919 are primes so consecutive event_ids scatter
across the globe (dense-city skew is exercised separately by the
pyramid's AQE config).  Latitude stays inside the Web-Mercator domain
(±85.051128, tile.py:17).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_TEMPLATE = """
SELECT
  CAST(mod(event_id * 104729, 170000) AS DOUBLE) / 1000.0 - 85.0 AS latitude,
  CAST(mod(event_id * 7919, 360000) AS DOUBLE) / 1000.0 - 180.0 AS longitude,
  ts,
  {epoch_ms} AS timestamp_ms,
  CASE
    WHEN mod(user_id, 37) = 0 THEN 'x' || CAST(user_id AS {str_t})
    WHEN mod(user_id, 11) = 0 THEN 'rt-' || CAST(user_id AS {str_t})
    ELSE 'u' || CAST(user_id AS {str_t})
  END AS user_id,
  CASE WHEN mod(event_id, 20) = 0 THEN 'background' ELSE 'gps' END AS source,
  CAST(1.0 AS DOUBLE) AS weight
FROM {events}
"""


def locations_sql(dialect: str, events: str = "events") -> str:
    """The derivation as SQL for ``dialect`` ('spark' | 'duckdb').

    ``events`` is the relation to read from (view name or inline scan).
    """
    if dialect == "spark":
        return _TEMPLATE.format(str_t="STRING", epoch_ms="unix_millis(ts)", events=events)
    if dialect == "duckdb":
        return _TEMPLATE.format(str_t="VARCHAR", epoch_ms="epoch_ms(ts)", events=events)
    raise ValueError(f"unknown dialect {dialect!r}")


def load_locations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived locations DataFrame for a testdata scale-factor dir."""
    from heatmap_spark.sources.tables import load_table

    from heatmap_spark.sources.tables import register_sf_view

    view = register_sf_view(
        load_table(spark, sf_dir, "events"), "__heatmap_spark_events", sf_dir
    )
    return spark.sql(locations_sql("spark", events=view))
