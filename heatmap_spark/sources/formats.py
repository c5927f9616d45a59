"""Multi-format table IO: parquet (default), ORC, CSV, JSON, XML.

The reference reads Cassandra / CosmosDB only (reference
heatmap.py:131-147); a general engine must also ingest and emit the
common file formats.  Everything here goes through the native Spark
DataSource V2 readers/writers — splittable scans, predicate pushdown
and column pruning where the format supports it (parquet/ORC), explicit
schemas for the text formats (schema inference is a full extra pass at
100 TB, so ``read_table`` refuses CSV/JSON without a schema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

FORMATS = ("parquet", "orc", "csv", "json", "xml")

# Lossless text round-trip needs explicit timestamp handling; parquet
# and ORC are binary-typed and need nothing.
_CSV_OPTS = {"header": "true", "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"}
_JSON_OPTS = {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"}
_XML_OPTS = {"rowTag": "row", "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"}


def _check(fmt: str) -> None:
    if fmt not in FORMATS:
        raise ValueError(f"unknown format {fmt!r}; known: {FORMATS}")


def write_table(df: DataFrame, path: str, fmt: str = "parquet", **options: str) -> None:
    _check(fmt)
    base = (
        _CSV_OPTS if fmt == "csv"
        else _JSON_OPTS if fmt == "json"
        else _XML_OPTS if fmt == "xml"
        else {}
    )
    df.write.format(fmt).options(**{**base, **options}).mode("overwrite").save(path)


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | None = None,
    **options: str,
) -> DataFrame:
    _check(fmt)
    if fmt in ("csv", "json", "xml") and schema is None:
        raise ValueError(
            f"{fmt} requires an explicit schema: inference costs a full "
            "extra scan and silently widens types at scale"
        )
    base = (
        _CSV_OPTS if fmt == "csv"
        else _JSON_OPTS if fmt == "json"
        else _XML_OPTS if fmt == "xml"
        else {}
    )
    reader = spark.read.format(fmt).options(**{**base, **options})
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def read_with_quarantine(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema: StructType,
    corrupt_col: str = "_corrupt_record",
) -> tuple[DataFrame, DataFrame]:
    """Fault-tolerant text ingestion: returns (good, quarantine).

    PERMISSIVE-mode read with an explicit corrupt-record column: rows
    that fail the schema land in ``quarantine`` with their raw text
    intact (for replay after a parser fix) instead of killing the job
    (FAILFAST) or silently nulling out (PERMISSIVE without the
    column).  At 100 TB a single malformed line MUST NOT abort a
    multi-hour ingest, and dropping it unlogged is a data-loss bug —
    this is the standard quarantine split, one scan, no UDFs.

    Spark caveat encoded here: queries referencing ONLY the corrupt
    column on a raw read are disallowed
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN — the parser
    would never run for the pruned projection), so the full projection
    is cached before the split; both halves then filter the same
    materialized parse, which also guarantees good/bad see one
    consistent read of mutable input files.

    Cache lifetime: the shared parse stays cached until Spark's LRU
    block manager evicts it (MEMORY_AND_DISK default) — deliberate,
    because unpersisting before the caller consumes BOTH halves would
    re-parse and could see a different read of mutable inputs.  A
    caller done with both halves can release it early via
    ``good.sparkSession.catalog.clearCache()`` or by unpersisting the
    parent (``good.storageLevel``-bearing) plan.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType, StructField

    if fmt not in ("csv", "json"):
        raise ValueError(f"quarantine reads support csv/json, not {fmt!r}")
    full = StructType(list(schema.fields) + [StructField(corrupt_col, StringType())])
    df = read_table(
        spark,
        path,
        fmt,
        schema=full,
        mode="PERMISSIVE",
        columnNameOfCorruptRecord=corrupt_col,
    ).cache()
    good = df.where(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = df.where(F.col(corrupt_col).isNotNull()).select(
        F.col(corrupt_col).alias("raw_record")
    )
    return good, bad
