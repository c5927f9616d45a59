"""Table sources: parquet fixtures + the derived ``locations`` table."""

from heatmap_spark.sources.tables import TABLES, load_table, register_views
from heatmap_spark.sources.locations import load_locations, locations_sql

__all__ = ["TABLES", "load_table", "register_views", "load_locations", "locations_sql"]
