"""Gated connectors for sources whose drivers are not in this container
(SURVEY.md §2.1 breadth). Each helper raises a clear error unless its
backing jar/package is importable — the calling plan shape is the same
either way, so swapping a fixture file source for one of these is a
one-line change in a pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc(spark: SparkSession, url: str, table: str,
              partition_column: str | None = None,
              num_partitions: int = 8, **options) -> DataFrame:
    """JDBC source with explicit read-parallelism.

    Without ``partition_column`` a JDBC read is ONE task regardless of
    cluster size — always provide the column + bounds at scale.
    """
    reader = (spark.read.format("jdbc")
              .option("url", url).option("dbtable", table))
    if partition_column is not None:
        reader = (reader.option("partitionColumn", partition_column)
                  .option("numPartitions", str(num_partitions)))
    for k, v in options.items():
        reader = reader.option(k, v)
    try:
        return reader.load()
    except Exception as exc:  # driver jar absent in this container
        raise NotImplementedError(
            "JDBC driver jar not on the classpath in this environment; "
            "add it via spark.jars and re-call") from exc


def read_kafka_stream(spark: SparkSession, bootstrap: str,
                      topic: str) -> DataFrame:
    """Kafka streaming source — the production stand-in for the file
    replay used by streaming/jobs.py (same downstream plan)."""
    try:
        return (spark.readStream.format("kafka")
                .option("kafka.bootstrap.servers", bootstrap)
                .option("subscribe", topic)
                .load())
    except Exception as exc:
        raise NotImplementedError(
            "spark-sql-kafka package not on the classpath in this "
            "environment; add org.apache.spark:spark-sql-kafka-0-10") from exc


def read_delta(spark: SparkSession, path: str) -> DataFrame:
    """Delta Lake table read (ACID/tx-log format)."""
    try:
        return spark.read.format("delta").load(path)
    except Exception as exc:
        raise NotImplementedError(
            "delta-spark not installed in this environment") from exc
