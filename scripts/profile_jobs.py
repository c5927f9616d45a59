#!/usr/bin/env python
"""Run registry queries and report wall-clock + Spark JOB COUNT per query.

Usage: python scripts/profile_jobs.py [out.json] [name ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.01).

Job count is the per-query delta of the driver AppStatusStore's job
list — the direct measure for "coalesced per-batch job counts"
(VERDICT r12 item 3): iterative/streaming operators pay a fixed
scheduling + barrier cost per driver-synchronous job, so removing
standalone materialization jobs shows up here even when total compute
is unchanged.  One timed run per query through the noop sink (same
methodology as scripts/time_registry.py).
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from heatmap_spark import get_spark  # noqa: E402
from heatmap_spark.queries import REGISTRY  # noqa: E402


def _n_jobs(spark) -> int:
    gw = spark.sparkContext._gateway
    store = spark.sparkContext._jsc.sc().statusStore()
    empty = gw.jvm.java.util.ArrayList()
    return store.jobsList(empty).size()


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/job_profile.json"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("job-profile")
    out: dict[str, dict] = {}
    for name in names:
        spark.sparkContext.setJobDescription(name)
        j0, t0 = _n_jobs(spark), time.perf_counter()
        try:
            REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            err = None
        except Exception:  # noqa: BLE001
            err = traceback.format_exc(limit=3)
        wall = round(time.perf_counter() - t0, 3)
        out[name] = {"sec": wall, "n_jobs": _n_jobs(spark) - j0, "err": err}
        spark.sparkContext.setJobDescription(None)
        spark.catalog.clearCache()
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for rid in list(jmap.keySet().toArray()):
            jmap.get(rid).unpersist()
        print(f"{name}: {wall}s, {out[name]['n_jobs']} jobs"
              + ("  ERROR" if err else ""), flush=True)
    with open(out_path, "w") as fh:
        json.dump({"sf_dir": sf_dir, "queries": out}, fh, indent=1)


if __name__ == "__main__":
    main()
