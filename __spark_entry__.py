"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The real surface lives in ``heatmap_spark.queries.REGISTRY``; this file
stays a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from heatmap_spark.queries import get_oracles, get_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the full 16-level heatmap pyramid (explode mode)
    over locations derived from /root/testdata/sf0.001."""
    from heatmap_spark.queries import q_heatmap_pyramid

    return q_heatmap_pyramid(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return get_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for every value-checkable query."""
    return get_oracles()
