"""Production source/sink connectors — config parity with the reference.

The reference reads Cassandra (rhom.locations) or CosmosDB and appends
heatmaps to Cassandra (reference heatmap.py:131-150).  Those are
connector *configurations*, not engine code; this module provides the
same surface on modern connector APIs, gated cleanly when the jars are
absent (this container has none — the parquet fixtures stand in, and
tests cover the gating).

Reference parity map:
  S1 get_rows/Cassandra  (heatmap.py:131-137) → read_cassandra
  S2 CosmosDB branch     (heatmap.py:138-146) → read_cosmos
  S3 write_heatmap_dataframes (heatmap.py:149-150) → write_cassandra
Unlike the reference — which stops and recreates the SparkContext to
inject connection config (heatmap.py:133-135) — connection settings
ride on the reader/writer options.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

CASSANDRA_FORMAT = "org.apache.spark.sql.cassandra"
COSMOS_FORMAT = "cosmos.oltp"


class ConnectorUnavailable(RuntimeError):
    pass


def _raise_if_missing(spark: SparkSession, fmt: str, err: Exception):
    raise ConnectorUnavailable(
        f"data source {fmt!r} is not on the classpath; add the connector "
        f"jar via spark.jars.packages (original error: {err})"
    )


def read_cassandra(
    spark: SparkSession, keyspace: str = "rhom", table: str = "locations", host: str | None = None
) -> DataFrame:
    """Cassandra scan (reference S1).  ``host`` maps to
    spark.cassandra.connection.host (set per-read, no context restart)."""
    reader = spark.read.format(CASSANDRA_FORMAT).options(keyspace=keyspace, table=table)
    if host:
        reader = reader.option("spark.cassandra.connection.host", host)
    try:
        return reader.load()
    except Exception as e:  # jar absent in this container
        _raise_if_missing(spark, CASSANDRA_FORMAT, e)


def read_cosmos(
    spark: SparkSession, endpoint: str, key: str, database: str = "locationsdb",
    container: str = "locations",
) -> DataFrame:
    """CosmosDB scan (reference S2, modernized options)."""
    try:
        return (
            spark.read.format(COSMOS_FORMAT)
            .option("spark.cosmos.accountEndpoint", endpoint)
            .option("spark.cosmos.accountKey", key)
            .option("spark.cosmos.database", database)
            .option("spark.cosmos.container", container)
            .load()
        )
    except Exception as e:
        _raise_if_missing(spark, COSMOS_FORMAT, e)


def write_cassandra(
    df: DataFrame, keyspace: str = "rhom", table: str = "heatmaps", host: str | None = None
) -> None:
    """Append to the heatmaps table (reference S3)."""
    writer = df.write.format(CASSANDRA_FORMAT).mode("append").options(
        keyspace=keyspace, table=table
    )
    if host:
        writer = writer.option("spark.cassandra.connection.host", host)
    try:
        writer.save()
    except Exception as e:
        _raise_if_missing(df.sparkSession, CASSANDRA_FORMAT, e)


KAFKA_FORMAT = "kafka"


def read_kafka_stream(
    spark: SparkSession, bootstrap_servers: str, topic: str, starting_offsets: str = "earliest"
) -> DataFrame:
    """Streaming Kafka source (the production stream ingress; the file
    stream in streaming/incremental.py is its test stand-in — same
    downstream code).  Gated: the Kafka connector jar is not in this
    container."""
    try:
        return (
            spark.readStream.format(KAFKA_FORMAT)
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("subscribe", topic)
            .option("startingOffsets", starting_offsets)
            .load()
        )
    except Exception as e:
        _raise_if_missing(spark, KAFKA_FORMAT, e)


def write_kafka(df: DataFrame, bootstrap_servers: str, topic: str) -> None:
    """Batch write to Kafka (df must have key/value binary columns)."""
    try:
        (
            df.write.format(KAFKA_FORMAT)
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("topic", topic)
            .save()
        )
    except Exception as e:
        _raise_if_missing(df.sparkSession, KAFKA_FORMAT, e)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
) -> DataFrame:
    """JDBC source with partitioned reads (the RDBMS ingest path).

    Always pass the partition-column bounds for real tables — without
    them the whole table arrives through ONE connection/task, which at
    scale is both slow and an OOM; with them Spark issues
    ``num_partitions`` bounded range scans in parallel.  Gated: no JDBC
    driver jar ships in this container.
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    try:
        return reader.load()
    except Exception as e:
        _raise_if_missing(spark, "jdbc", e)


def write_delta(df: DataFrame, path: str, mode: str = "append") -> None:
    """Delta Lake sink (gated): transactional append/overwrite with
    time travel — the production tile-store sink when delta-spark is on
    the classpath.  In this container the jar is absent; the parquet
    sink (api.HeatmapBuilder.save) is the tested path, and MERGE
    semantics are provided engine-side by operators/layout.merge_upsert.
    """
    try:
        df.write.format("delta").mode(mode).save(path)
    except Exception as e:
        _raise_if_missing(df.sparkSession, "delta", e)


def write_iceberg(df: DataFrame, table: str, mode: str = "append") -> None:
    """Apache Iceberg sink (gated): writes to an Iceberg catalog table
    (hidden-partition layout, snapshot isolation, schema evolution).
    Jar absent in this container — gated like the Cassandra/Cosmos
    connectors, with the gating behavior under test."""
    try:
        writer = df.writeTo(table)
        if mode == "append":
            writer.append()
        else:
            writer.createOrReplace()
    except Exception as e:
        _raise_if_missing(df.sparkSession, "iceberg", e)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro source (gated): the row-oriented interchange format of the
    Kafka/schema-registry world — the natural landing format for the
    reference's location feed when it arrives via a log pipeline.
    Spark's `avro` format lives in the external spark-avro module, so
    this gates exactly like the Kafka/Delta connectors; the multi-
    format parquet/ORC/CSV/JSON surface (sources/formats.py) is the
    in-container tested path."""
    try:
        return spark.read.format("avro").load(path)
    except Exception as e:
        _raise_if_missing(spark, "avro", e)


def write_avro(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Avro sink (gated like read_avro)."""
    try:
        df.write.format("avro").mode(mode).save(path)
    except Exception as e:
        _raise_if_missing(df.sparkSession, "avro", e)
