"""Scalar expression libraries (all pure Column math — no UDFs)."""

from heatmap_spark.functions.tiles import (
    tile_ancestors,
    tile_bounds,
    tile_center,
    tile_children,
    tile_col,
    tile_decode,
    tile_id,
    tile_id_from_zrc,
    tile_parent,
    tile_parent_zrc,
    tile_row,
)
from heatmap_spark.functions.timespans import timespan_label, timespan_labels

__all__ = [
    "tile_row",
    "tile_col",
    "tile_id",
    "tile_id_from_zrc",
    "tile_decode",
    "tile_parent",
    "tile_parent_zrc",
    "tile_bounds",
    "tile_center",
    "tile_ancestors",
    "tile_children",
    "timespan_label",
    "timespan_labels",
]
