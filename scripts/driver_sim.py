"""Simulate the grading driver: plain SparkSession, import __spark_entry__
by path, run queries() vs oracle_sql() through DuckDB at sf0.01, compare
with STRICT equality (columns sorted by name, rows order-insensitive).

Usage:
    TZ=America/Los_Angeles python scripts/driver_sim.py [query ...]
With no args sweeps every query in queries().  Exit 0 iff all match.
"""
import importlib.util
import os
import sys

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v
            )
    return df.sort_values(list(df.columns), ignore_index=True)


def main() -> int:
    only = set(sys.argv[1:])
    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, osql = mod.queries(), mod.oracle_sql()
    failures, skipped = [], []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"spark error: {e}"))
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in osql:
            skipped.append(name)
            print(f"rows-only {name}: {len(sdf)} rows")
            continue
        try:
            ddf = con.execute(osql[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"duckdb error: {e}"))
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        s, d = normalize(sdf), normalize(ddf)
        if list(s.columns) != list(d.columns):
            failures.append((name, f"columns {list(s.columns)} vs {list(d.columns)}"))
            print(f"FAIL {name}: columns {list(s.columns)} vs {list(d.columns)}")
            continue
        if len(s) != len(d):
            failures.append((name, f"rows {len(s)} vs {len(d)}"))
            print(f"FAIL {name}: rows {len(s)} vs {len(d)}")
            continue
        try:
            pd.testing.assert_frame_equal(s, d, check_dtype=False, check_exact=True)
        except AssertionError as e:
            failures.append((name, str(e).splitlines()[0]))
            print(f"FAIL {name}: {str(e).splitlines()[0]}")
            continue
        print(f"ok   {name} ({len(s)} rows)")

    print(f"\n{len(failures)} failures, {len(skipped)} rows-only")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
