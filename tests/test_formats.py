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


def test_quarantine_split_keeps_bad_rows_replayable(spark, tmp_path):
    """Malformed lines land in quarantine with raw text intact; good
    rows parse; nothing is dropped or aborts the read."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from heatmap_spark.sources.formats import read_with_quarantine

    p = tmp_path / "in.json"
    p.write_text(
        '{"id": 1, "name": "ok"}\n'
        "this is not json at all\n"
        '{"id": "NOT_A_NUMBER", "name": "bad type"}\n'
        '{"id": 3, "name": "fine"}\n'
    )
    schema = StructType(
        [StructField("id", LongType()), StructField("name", StringType())]
    )
    good, bad = read_with_quarantine(spark, str(p), "json", schema)
    assert sorted(r.id for r in good.collect()) == [1, 3]
    raw = [r.raw_record for r in bad.collect()]
    assert len(raw) == 2
    assert "this is not json at all" in raw
    assert any("NOT_A_NUMBER" in r for r in raw)
    assert good.count() + bad.count() == 4
