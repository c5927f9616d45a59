"""Multi-format source/sink round-trips (sources/formats.py)."""

import pytest

from heatmap_spark.sources.formats import read_table, write_table
from heatmap_spark.sources.tables import load_table


def _sample(spark, sf_smoke):
    # orders has ints, doubles, strings, and a timestamp — every type
    # class the text formats can mangle.
    return load_table(spark, sf_smoke, "orders").limit(200)


@pytest.mark.parametrize("fmt", ["parquet", "orc", "csv", "json", "xml"])
def test_round_trip(spark, sf_smoke, tmp_path, fmt):
    df = _sample(spark, sf_smoke)
    path = str(tmp_path / f"orders_{fmt}")
    write_table(df, path, fmt)
    back = read_table(spark, path, fmt, schema=df.schema)
    assert back.schema == df.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_text_formats_require_schema(spark, tmp_path):
    with pytest.raises(ValueError, match="explicit schema"):
        read_table(spark, str(tmp_path), "csv")
    with pytest.raises(ValueError, match="unknown format"):
        read_table(spark, str(tmp_path), "avroish")
