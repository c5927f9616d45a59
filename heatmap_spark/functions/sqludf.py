"""Raw-SQL surface for the tile library: SQL scalar functions.

SURVEY.md §4 notes the tile math should be callable from SQL strings
without a Python UDF.  Spark 4 SQL scalar functions (CREATE FUNCTION
... RETURN <expr>) are the clean mechanism: the body is a pure
built-in expression that Catalyst *inlines* at analysis time, so a
query using ``tile_id(lat, lon, z)`` compiles to exactly the same
codegen'd plan as the Column-API form in functions/tiles.py — zero
Python workers, full pushdown through the expression.

Formulas mirror functions/tiles.py (reference tile.py:8-21, 56-64)
with identical operation order, so SQL-surface results are
bit-identical to the Column API and to the reference oracle.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_FUNCTIONS = {
    "tile_row": """
CREATE OR REPLACE TEMPORARY FUNCTION tile_row(lat DOUBLE, zoom INT)
RETURNS BIGINT
RETURN CAST(floor((1.0D - ln(tan(lat * pi() / 180.0D)
  + 1.0D / cos(lat * pi() / 180.0D)) / pi()) / 2.0D
  * pow(2.0D, zoom)) AS BIGINT)""",
    "tile_col": """
CREATE OR REPLACE TEMPORARY FUNCTION tile_col(lon DOUBLE, zoom INT)
RETURNS BIGINT
RETURN CAST(floor((lon + 180.0D) / 360.0D * pow(2.0D, zoom)) AS BIGINT)""",
    "tile_id": """
CREATE OR REPLACE TEMPORARY FUNCTION tile_id(lat DOUBLE, lon DOUBLE, zoom INT)
RETURNS STRING
RETURN concat_ws('_', CAST(zoom AS STRING),
  CAST(tile_row(lat, zoom) AS STRING),
  CAST(tile_col(lon, zoom) AS STRING))""",
    "tile_parent": """
CREATE OR REPLACE TEMPORARY FUNCTION tile_parent(tid STRING, delta INT)
RETURNS STRING
RETURN concat_ws('_',
  CAST(try_cast(element_at(split(tid, '_'), 1) AS INT) - delta AS STRING),
  CAST(shiftright(try_cast(element_at(split(tid, '_'), 2) AS BIGINT), delta) AS STRING),
  CAST(shiftright(try_cast(element_at(split(tid, '_'), 3) AS BIGINT), delta) AS STRING))""",
}


def register_sql_functions(spark: SparkSession) -> None:
    """Idempotent registration (CREATE OR REPLACE) of the SQL tile
    functions on this session."""
    for ddl in _FUNCTIONS.values():
        spark.sql(ddl)
