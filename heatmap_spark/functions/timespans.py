"""Timespan label expressions.

Implements the *declared* surface of the reference's
``build_timespan_label`` (reference heatmap.py:38-52): labels
``alltime``, ``yyyy``, ``yyyy-MM``, ``yyyy-MM-dd`` (zero-padded month/
day exactly as the reference hand-pads at heatmap.py:39-44).

Note: the reference's main loop hard-codes ``["alltime"]`` and its
early-return quirk would drop all but the first timespan anyway
(SURVEY.md §2.3 Q1); we implement the declared multi-timespan surface
correctly — one exploded label row per requested timespan type.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TIMESPAN_FORMATS = {
    "alltime": None,
    "year": "yyyy",
    "month": "yyyy-MM",
    "day": "yyyy-MM-dd",
}

DEFAULT_TIMESPANS = ("alltime",)  # reference heatmap.py:62


def timespan_label(ts: Column | str, timespan_type: str) -> Column:
    """Label for one timespan type (reference heatmap.py:45-52)."""
    if timespan_type not in TIMESPAN_FORMATS:
        raise ValueError(f"unknown timespan type {timespan_type!r}")
    fmt = TIMESPAN_FORMATS[timespan_type]
    if fmt is None:
        return F.lit("alltime")
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.date_format(c, fmt)


def timespan_labels(ts: Column | str, timespan_types: tuple[str, ...]) -> Column:
    """array<string> of labels — explode to get one row per timespan."""
    return F.array(*[timespan_label(ts, t) for t in timespan_types])
