#!/usr/bin/env python
"""Time every registry query end-to-end through the noop sink.

Usage: python scripts/time_registry.py [out.json] [name ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.01).

One timed run per query (build + noop materialization — the same
methodology the driver's correctness sweep pays), sequential, with a
per-query job description so the UI/event log stays readable.  Output:
JSON {name: seconds} sorted slowest-first, printed and written.
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


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/registry_times.json"
    names = sys.argv[2:] or list(REGISTRY)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("registry-sweep")
    times: dict[str, float] = {}
    errors: dict[str, str] = {}
    for i, name in enumerate(names):
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        try:
            REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times[name] = round(time.perf_counter() - t0, 3)
        except Exception:  # noqa: BLE001
            errors[name] = traceback.format_exc(limit=3)
            times[name] = round(time.perf_counter() - t0, 3)
        finally:
            spark.sparkContext.setJobDescription(None)
            spark.catalog.clearCache()
            jmap = spark.sparkContext._jsc.getPersistentRDDs()
            for rid in list(jmap.keySet().toArray()):
                jmap.get(rid).unpersist()
        print(f"[{i + 1}/{len(names)}] {name}: {times[name]}s"
              + ("  ERROR" if name in errors else ""), flush=True)
    ranked = dict(sorted(times.items(), key=lambda kv: -kv[1]))
    with open(out_path, "w") as fh:
        json.dump({"sf_dir": sf_dir, "times": ranked, "errors": errors}, fh, indent=1)
    print(json.dumps({"total_sec": round(sum(times.values()), 1),
                      "n": len(times), "n_errors": len(errors)}))
    print("top 15:", json.dumps(dict(list(ranked.items())[:15]), indent=1))


if __name__ == "__main__":
    main()
