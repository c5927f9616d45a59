"""Fluent engine API — the user-facing lifecycle (SURVEY.md §3 E2'):

    Heatmap(spark).from_events_dir(sf_dir).pyramid().resultsets().table().save(path)

Each step stays a DataFrame, so the whole chain is ONE Catalyst plan:
parse/analyze → optimize → whole-stage codegen → AQE.  Compare the
reference's lifecycle (heatmap.py:152-158): config-hack context
restart, RDD drop-down after load, 32 shuffle stages, zero optimizer
visibility.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from heatmap_spark.functions.timespans import DEFAULT_TIMESPANS
from heatmap_spark.operators import pyramid as _pyr
from heatmap_spark.sources.locations import load_locations

LOCATIONS_SCHEMA = "latitude double, longitude double, ts timestamp, user_id string, source string, weight double"


class Heatmap:
    """Entry point bound to a SparkSession."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def from_locations(self, df: DataFrame) -> "HeatmapBuilder":
        """Start from any DataFrame with the locations schema
        (latitude, longitude, ts, user_id, source[, weight])."""
        if "weight" not in df.columns:
            from pyspark.sql import functions as F

            df = df.withColumn("weight", F.lit(1.0))
        return HeatmapBuilder(self.spark, df)

    def from_parquet(self, path: str) -> "HeatmapBuilder":
        return self.from_locations(self.spark.read.parquet(path))

    def from_events_dir(self, sf_dir: str) -> "HeatmapBuilder":
        """Start from the deterministic events→locations derivation."""
        return HeatmapBuilder(self.spark, load_locations(self.spark, sf_dir))


class HeatmapBuilder:
    def __init__(self, spark: SparkSession, df: DataFrame, stage: str = "locations"):
        self.spark = spark
        self._df = df
        self._stage = stage

    def pyramid(
        self,
        mode: str = "explode",
        timespans: tuple[str, ...] = DEFAULT_TIMESPANS,
        min_zoom: int = _pyr.MIN_PYRAMID_ZOOM,
        max_zoom: int = _pyr.DETAIL_MAX_ZOOM,
    ) -> "HeatmapBuilder":
        if self._stage != "locations":
            raise ValueError(f"pyramid() must follow locations, not {self._stage}")
        df = _pyr.build_pyramid(
            self._df, mode=mode, timespans=timespans, min_zoom=min_zoom, max_zoom=max_zoom
        )
        return HeatmapBuilder(self.spark, df, "pyramid")

    def resultsets(self) -> "HeatmapBuilder":
        if self._stage != "pyramid":
            raise ValueError(f"resultsets() must follow pyramid(), not {self._stage}")
        return HeatmapBuilder(self.spark, _pyr.resultsets(self._df), "resultsets")

    def smooth(self, zoom: int) -> "HeatmapBuilder":
        """3x3 kernel smoothing of one pyramid level (see
        operators/pyramid.smooth_tiles)."""
        if self._stage != "pyramid":
            raise ValueError(f"smooth() must follow pyramid(), not {self._stage}")
        return HeatmapBuilder(self.spark, _pyr.smooth_tiles(self._df, zoom), "smoothed")

    def table(self) -> "HeatmapBuilder":
        """The sink shape (id, heatmap JSON) — reference heatmap.py:156-157."""
        if self._stage != "resultsets":
            raise ValueError(f"table() must follow resultsets(), not {self._stage}")
        return HeatmapBuilder(self.spark, _pyr.heatmap_table(self._df), "table")

    def df(self) -> DataFrame:
        return self._df

    def save(self, path: str, fmt: str = "parquet", mode: str = "append") -> None:
        """Append to the heatmaps sink (reference heatmap.py:149-150 used
        Cassandra append; parquet is the test/fixture sink)."""
        self._df.write.format(fmt).mode(mode).save(path)
