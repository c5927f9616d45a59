"""heatmap_spark — a PySpark-native analytics engine.

A from-scratch, DataFrame-first engine with the query/data-processing
capabilities of the reference heatmap job (see SURVEY.md): Web-Mercator
quadtree tile quantization, multi-zoom heatmap pyramids, user-group and
timespan expansion, JSON result-set packaging — plus the relational
surface (joins, windows, rollups, set ops), streaming windows, and
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal column plumbing) designed for 100 TB scale.

Design stance (SURVEY.md §7): everything is a DataFrame; zero Python
UDFs on the hot path; keys are columns, never concatenated strings
(the ``|``-joined id exists only as a sink-side presentation column);
explicit schemas at table boundaries; AQE on.
"""

from heatmap_spark.session import get_spark


def __getattr__(name):
    # lazy re-exports so `import heatmap_spark` stays light
    if name == "Heatmap":
        from heatmap_spark.api import Heatmap

        return Heatmap
    if name == "REGISTRY":
        from heatmap_spark.queries import REGISTRY

        return REGISTRY
    raise AttributeError(name)


__all__ = ["get_spark", "Heatmap", "REGISTRY"]
__version__ = "0.1.0"
