"""Plan inspection helpers (the engine's .explain-driven feedback loop)."""

from heatmap_spark.plans.inspect import (
    count_exchanges,
    has_broadcast_join,
    has_python_eval,
    plan_string,
    pushed_filters,
)

__all__ = [
    "plan_string",
    "count_exchanges",
    "has_broadcast_join",
    "has_python_eval",
    "pushed_filters",
]
