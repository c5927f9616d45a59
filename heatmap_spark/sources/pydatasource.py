"""Custom Python DataSource (Spark 4 extension API): a partitioned,
deterministic synthetic ``locations`` generator.

Demonstrates the engine's source-extension surface
(`pyspark.sql.datasource`) with something genuinely useful: scale
probes can read N synthetic points at any parallelism with zero input
files — `spark.read.format("synthetic_locations").option("n_rows",
"10000000")` — using the same integer derivation as
sources/locations.py, so results stay oracle-checkable.

Scale: `partitions()` splits the id range evenly; each task generates
its slice independently (no driver materialization, no skew).  Python
generation throughput is the bottleneck by design — this source is for
correctness/scale probing, not the production hot path (real ingest is
parquet/Cassandra, JVM-side).
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

SCHEMA = (
    "event_id bigint, latitude double, longitude double, "
    "user_id string, source string, weight double"
)


def _bounds(n: int, p: int) -> list[int]:
    """Partition fence posts over ids 1..n (p+1 entries)."""
    return [(j * n) // p + 1 for j in range(p)] + [n + 1]


class SyntheticLocationsDataSource(DataSource):
    """spark.read.format("synthetic_locations")
    .option("n_rows", ...).option("n_partitions", ...)"""

    @classmethod
    def name(cls) -> str:
        return "synthetic_locations"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> DataSourceReader:
        n = int(self.options.get("n_rows", "10000"))
        p = max(1, int(self.options.get("n_partitions", "16")))

        class Reader(DataSourceReader):
            def partitions(self):
                return [InputPartition(lo) for lo in _bounds(n, p)[:-1]]

            def read(self, partition):
                fence = _bounds(n, p)
                lo = partition.value
                hi = fence[fence.index(lo) + 1]
                # same primes as sources/locations.py — bit-identical rows
                for e in range(lo, hi):
                    uid = (
                        f"x{e}" if e % 37 == 0 else f"rt-{e}" if e % 11 == 0 else f"u{e}"
                    )
                    yield (
                        e,
                        (e * 104729) % 170000 / 1000.0 - 85.0,
                        (e * 7919) % 360000 / 1000.0 - 180.0,
                        uid,
                        "background" if e % 20 == 0 else "gps",
                        1.0,
                    )

        return Reader()


def register(spark) -> None:
    spark.dataSource.register(SyntheticLocationsDataSource)
