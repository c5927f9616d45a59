#!/usr/bin/env python
"""Pyramid scale probe: synthetic N-point locations (default 10M = 100×
the sf0.1 fixture), same derivation arithmetic as sources/locations.py,
explode vs cascade.  Referenced by BASELINE.md.

    python scripts/scale_probe.py [n_points]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from heatmap_spark import get_spark
from heatmap_spark.operators import pyramid as P


def synthetic_locations(spark, n: int):
    return spark.range(n).select(
        (F.expr("CAST(mod(id * 104729, 170000) AS DOUBLE)") / 1000.0 - 85.0).alias("latitude"),
        (F.expr("CAST(mod(id * 7919, 360000) AS DOUBLE)") / 1000.0 - 180.0).alias("longitude"),
        F.timestamp_millis(F.lit(1700000000000) + F.col("id") % 2592000000).alias("ts"),
        F.concat(F.lit("u"), (F.col("id") % 5000).cast("string")).alias("user_id"),
        F.when(F.col("id") % 20 == 0, F.lit("background"))
        .otherwise(F.lit("gps"))
        .alias("source"),
        F.lit(1.0).alias("weight"),
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    spark = get_spark("scale-probe")
    loc = synthetic_locations(spark, n)
    loc.count()  # warm
    visible = round(n * 0.95)
    for mode in ("explode", "cascade"):
        t0 = time.perf_counter()
        P.build_pyramid(loc, mode=mode).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        print(f"{mode} {n:,} pts: {dt:.1f}s = {visible / dt / 1000:.0f}k pts/s")


if __name__ == "__main__":
    main()
