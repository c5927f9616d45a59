"""Cross-engine-exact aggregation helpers.

Double-precision SUMs are order-dependent, so a Spark sum and a DuckDB
sum of the same column can differ in the last ulps — enough to break
the driver's value-hash comparison.  Policy: monetary/metric sums cast
to DECIMAL first (exact integer arithmetic → bit-identical in any
engine, any partitioning, any 1000-executor cluster), then the final
result casts back to DOUBLE.  Averages are expressed as
CAST(decimal_sum AS DOUBLE) / count so both engines produce the same
double.  This is also the *right* semantics for money at 100 TB scale:
a partition-order-independent aggregate is reproducible run-to-run.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(12,4)"
ONE = "CAST(1 AS DECIMAL(12,4))"  # SQL literal twin


def dec(c: Column | str) -> Column:
    """Cast to the canonical exact decimal."""
    c = F.col(c) if isinstance(c, str) else c
    return c.cast(DEC)


def dsum(c: Column | str) -> Column:
    """Exact sum → DOUBLE."""
    return F.sum(dec(c)).cast("double")


def davg(c: Column | str) -> Column:
    """Exact-sum average → DOUBLE (decimal sum / count, like the oracle)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.sum(dec(c)).cast("double") / F.count(c)
