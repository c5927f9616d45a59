#!/usr/bin/env python
"""Capture .explain('formatted') for queries into plans/r12/<name>_<tag>.txt.

Usage: python scripts/capture_plans.py <tag> [query ...]
With no query names, captures every headline query.  Plan capture only
builds the DataFrame (no execution), so it is cheap; queries whose
build phase itself runs jobs (store builds) still pay that cost.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from heatmap_spark import get_spark  # noqa: E402
from heatmap_spark.queries import REGISTRY, headline_queries  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r12")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan-capture")
    fns = (
        {n: REGISTRY[n].fn for n in names}
        if names
        else headline_queries()
    )
    for name, fn in fns.items():
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
