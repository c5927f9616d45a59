#!/usr/bin/env python
"""Capture .explain('formatted') for queries into plans/<round>/<name>_<tag>.txt.

Usage: python scripts/capture_plans.py <tag> [query ...]
Env: SPARK_GRAFT_SF_DIR (default sf0.1), PLANS_ROUND (default r13).
With no query names, captures every headline query.

Per-stage capture (VERDICT r12 item 8): queries that materialize
intermediates with localCheckpoint used to dump as a vacuous
``Scan ExistingRDD`` — everything upstream of the checkpoint was
invisible.  This harness hooks DataFrame.localCheckpoint for the
duration of each query build and appends the PRE-checkpoint plan of
every materialization stage to the same file, so the file shows the
full lineage: stage plans in execution order, then the final plan.
The hook still performs the real checkpoint, so query semantics and
any in-build raise pins are untouched.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame  # noqa: E402

from heatmap_spark import get_spark  # noqa: E402
from heatmap_spark.queries import REGISTRY, headline_queries  # noqa: E402


def _formatted(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rnd = os.environ.get("PLANS_ROUND", "r13")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", rnd
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan-capture")
    fns = {n: REGISTRY[n].fn for n in names} if names else headline_queries()
    real_ckpt = DataFrame.localCheckpoint
    for name, fn in fns.items():
        stages: list[str] = []

        def hooked(self, eager=True, storageLevel=None):  # noqa: ANN001
            stages.append(_formatted(self))
            if storageLevel is None:
                return real_ckpt(self, eager=eager)
            return real_ckpt(self, eager=eager, storageLevel=storageLevel)

        DataFrame.localCheckpoint = hooked
        try:
            df = fn(spark, sf_dir)
            final = _formatted(df)
        finally:
            DataFrame.localCheckpoint = real_ckpt
        parts = [
            f"== stage {i + 1} (pre-localCheckpoint materialization) ==\n{p}"
            for i, p in enumerate(stages)
        ]
        parts.append(f"== final plan ==\n{final}")
        plan = "\n\n".join(parts)
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes, {len(stages)} checkpoint stages)")


if __name__ == "__main__":
    main()
