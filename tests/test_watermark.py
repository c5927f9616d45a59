"""Late-data policy: watermarked streaming aggregation (append mode).

Pins Spark's actual guarantee: a late row arriving while its window's
state is still live IS aggregated (the watermark is a lower bound on
eviction, not an input filter); a late row arriving AFTER the window
was finalized and evicted is dropped and can never re-emit the window.

Three micro-batches via maxFilesPerTrigger=1 + mtime ordering:
  batch 1  10:00..11:00 data  → watermark after commit: 10:50
  batch 2  11:20 on-time      → 10:00-10:30 window emitted + evicted
                                (wm 10:50 > window end), wm → 11:10
  batch 3  10:06 LATE row     → state gone: dropped, no duplicate emit
"""

import datetime as dt
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
    ]
)

BASE = dt.datetime(2024, 6, 1, 10, 0, 0)


def _write(path, rows, mtime=None):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    schema = pa.schema(
        [("event_id", pa.int64()), ("ts", pa.timestamp("us")), ("user_id", pa.int64())]
    )
    pq.write_table(pa.Table.from_pandas(pdf, schema=schema), path)
    if mtime is not None:
        os.utime(path, (mtime, mtime))


@pytest.fixture()
def three_batch_dir(tmp_path):
    d = tmp_path / "stream"
    d.mkdir()
    _write(
        d / "batch1.parquet",
        [
            (1, BASE, 1),
            (2, BASE + dt.timedelta(minutes=5), 1),
            (3, BASE + dt.timedelta(minutes=40), 2),
            (4, BASE + dt.timedelta(minutes=60), 2),
        ],
        mtime=1_000,
    )
    _write(
        d / "batch2.parquet",
        [(6, BASE + dt.timedelta(minutes=80), 3)],
        mtime=2_000,
    )
    _write(
        d / "batch3.parquet",
        [(5, BASE + dt.timedelta(minutes=6), 1)],  # late beyond evicted window
    )
    return str(d)


def test_late_row_after_eviction_is_dropped(spark, three_batch_dir):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(three_batch_dir)
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        # ws as a session-TZ (UTC) string: collect() would otherwise convert
        # TIMESTAMP to an OS-local naive datetime, shifting by the host TZ.
        .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("ws"), "n")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_late")
        .start()
    )
    q.processAllAvailable()
    n_batches = len([p for p in q.recentProgress if p is not None])
    q.stop()
    rows = spark.sql("SELECT * FROM t_late").collect()
    counts = {}
    for r in rows:
        counts.setdefault(r.ws, []).append(r.n)

    def key(d):
        return d.strftime("%Y-%m-%d %H:%M:%S")

    assert n_batches >= 3  # the three files really were separate batches
    # finalized 10:00-10:30 window: exactly ONE emission, on-time rows only
    assert counts[key(BASE)] == [2], counts
    # 10:30-11:00 window finalized with its single on-time event
    assert counts[key(BASE + dt.timedelta(minutes=30))] == [1], counts
    # the late row neither re-emitted the old window nor appears anywhere
    assert sum(n for v in counts.values() for n in v) == 3, counts
