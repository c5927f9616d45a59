"""Physical-plan inspection: the measurable form of the engine's
Catalyst-first design promises (SURVEY.md §4).

Used by tests/test_plans.py to pin:
  * filters reach the parquet scan (PushedFilters) — predicate pushdown
  * scans read only needed columns (ReadSchema) — column pruning
  * small dims join via BroadcastHashJoin — no fact-side shuffle
  * the explode-mode pyramid has exactly ONE exchange
  * no Python evaluation (BatchEvalPython/ArrowEvalPython) on hot paths
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (same text df.explain prints)."""
    return df.sparkSession._jvm.PythonSQLUtils.explainString(  # type: ignore[union-attr]
        df._jdf.queryExecution(), mode
    )


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the (pre-AQE) physical plan."""
    plan = plan_string(df, "simple")
    return len(re.findall(r"\bExchange (?:hash|range|Single)", plan))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in plan_string(df, "simple")


def has_python_eval(df: DataFrame) -> bool:
    plan = plan_string(df, "simple")
    return "BatchEvalPython" in plan or "ArrowEvalPython" in plan


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters lines of every scan in the formatted plan."""
    plan = plan_string(df, "formatted")
    return "\n".join(line.strip() for line in plan.splitlines() if "PushedFilters" in line)
