"""Parquet table loading for the driver-generated fixtures (TESTDATA.md).

Production sources for the reference were Cassandra / CosmosDB
(reference heatmap.py:131-147); those connectors are config, not engine
code — see ``heatmap_spark.sources.connectors``.  Tests and the bench
read the deterministic parquet fixtures.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; known: {TABLES}")
    # Fixture timestamps are UTC instants and the DuckDB oracle compares
    # them TZ-naive; a non-UTC session would shift every date label and
    # collected timestamp.  Pin UTC here — the one choke point every
    # query loads through — so results are correct even when the caller
    # built the session without it.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # Some driver-generated events fixtures store TIMESTAMP(NANOS),
        # which Spark's parquet reader rejects; others store plain
        # micros.  Read with nanosAsLong on, then normalize: a LongType
        # ts is nanos → truncate to micros (the same truncation DuckDB
        # applies reading ns into its us-precision TIMESTAMP, so oracle
        # comparisons agree); a timestamp ts passes through unchanged.
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        # Streaming watermarks and epoch functions need TIMESTAMP (LTZ);
        # with the session pinned to UTC the NTZ→LTZ cast is value-
        # preserving, so batch results and the DuckDB oracle agree.
        return df.select(
            "event_id",
            F.col("ts").cast("timestamp").alias("ts"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def register_sf_view(df: DataFrame, base: str, sf_dir: str) -> str:
    """Register ``df`` under a temp-view name that ENCODES ``sf_dir``.

    Query functions that go through spark.sql need a view; a fixed view
    name is a race under concurrent queries against different scale
    dirs (thread B's createOrReplaceTempView can land between thread
    A's registration and A's spark.sql analysis, silently swapping A's
    data).  Encoding the dir in the name makes registration idempotent
    per (view, sf_dir) and concurrency-safe.  ``register_views`` keeps
    canonical fixture names for interactive use — single-dir sessions.
    """
    import hashlib as _hashlib
    import os as _os
    import re as _re

    # sanitized name + short hash of the ABSOLUTE dir: the hash keeps
    # the mapping injective (sanitization alone collides 'sf0.1' with
    # 'sf0_1', and relative vs absolute spellings of one dir), the
    # readable prefix keeps plans debuggable
    abs_dir = _os.path.abspath(sf_dir)
    digest = _hashlib.md5(abs_dir.encode()).hexdigest()[:8]
    name = (
        base
        + "_"
        + _re.sub(r"[^A-Za-z0-9]", "_", sf_dir).strip("_")
        + "_"
        + digest
    )
    df.createOrReplaceTempView(name)
    return name
