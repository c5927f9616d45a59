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
