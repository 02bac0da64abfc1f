"""Gated connectors for sources whose drivers are not in this container
(SURVEY.md §2.1 breadth). Each helper raises a clear error unless its
backing jar/package is importable — the calling plan shape is the same
either way, so swapping a fixture file source for one of these is a
one-line change in a pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: Error-text markers that genuinely mean "the driver/package jar is not
#: on the classpath". Only these are translated into the documented
#: NotImplementedError gate — anything else (Derby exclusive-lock
#: contention, SQL/type errors, network failures) re-raises unchanged so
#: real failures are never misdiagnosed as a missing jar.
_MISSING_DRIVER_MARKERS = (
    "ClassNotFoundException",
    "NoClassDefFoundError",
    "No suitable driver",
    "Failed to find data source",
    "DATA_SOURCE_NOT_FOUND",
)


def _is_missing_driver(exc: Exception) -> bool:
    return any(m in str(exc) for m in _MISSING_DRIVER_MARKERS)


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
    except Exception as exc:
        if _is_missing_driver(exc):  # driver jar absent in this container
            raise NotImplementedError(
                "JDBC driver jar not on the classpath in this environment; "
                "add it via spark.jars and re-call") from exc
        raise


#: Embedded-Derby JDBC driver — ships in Spark's own jars/ directory
#: (derby*.jar, pulled in for the Hive metastore), so unlike
#: Postgres/MySQL this JDBC path is runnable in ANY stock Spark
#: deployment with zero extra jars. Single-JVM embedded engine: right
#: for tests and local tools; point ``read_jdbc``/``write_jdbc`` at a
#: server-grade URL + driver in production.
DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def derby_url(db_dir: str) -> str:
    """JDBC URL for an embedded Derby database at ``db_dir`` (created on
    first use). The database is locked by one JVM at a time — callers
    should derive the path per-process when concurrent suites may run."""
    return f"jdbc:derby:{db_dir};create=true"


def write_jdbc(df: DataFrame, url: str, table: str,
               driver: str | None = None, mode: str = "overwrite",
               **options) -> None:
    """JDBC sink. At scale, batch size and transaction shape are the
    knobs (``batchsize``, ``isolationLevel``, ``truncate``) — a plain
    overwrite DROPs and re-CREATEs the table, losing indexes; pass
    ``truncate=true`` to keep DDL. Each input partition writes its own
    connection/transaction, so upstream ``repartition(n)`` is the
    parallelism control."""
    w = df.write.format("jdbc").option("url", url).option("dbtable", table)
    if driver is not None:
        w = w.option("driver", driver)
    for k, v in options.items():
        w = w.option(k, v)
    try:
        w.mode(mode).save()
    except Exception as exc:
        if _is_missing_driver(exc):
            raise NotImplementedError(
                "JDBC driver jar not on the classpath in this environment; "
                "add it via spark.jars and re-call") from exc
        raise


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
        if _is_missing_driver(exc):
            raise NotImplementedError(
                "spark-sql-kafka package not on the classpath in this "
                "environment; add org.apache.spark:spark-sql-kafka-0-10"
            ) from exc
        raise


def read_delta(spark: SparkSession, path: str) -> DataFrame:
    """Delta Lake table read (ACID/tx-log format)."""
    try:
        return spark.read.format("delta").load(path)
    except Exception as exc:
        if _is_missing_driver(exc):
            raise NotImplementedError(
                "delta-spark not installed in this environment") from exc
        raise


def read_avro(spark: SparkSession, path: str, **options) -> DataFrame:
    """Avro source (external module since Spark 2.4: the spark-avro jar
    is not bundled in pip pyspark). Column-pruning pushes into the
    Avro reader; schema evolution is handled by passing ``avroSchema``
    (the reader schema) — the standard pattern for reading a topic
    dump written across producer schema versions."""
    reader = spark.read.format("avro")
    for k, v in options.items():
        reader = reader.option(k, v)
    try:
        return reader.load(path)
    except Exception as exc:
        if _is_missing_driver(exc):
            raise NotImplementedError(
                "spark-avro module not on the classpath in this "
                "environment; add org.apache.spark:spark-avro via "
                "spark.jars.packages and re-call") from exc
        raise


def write_avro(df: DataFrame, path: str, mode: str = "overwrite",
               compression: str = "snappy", **options) -> None:
    """Avro sink — row-oriented, so the right interchange format for
    downstream row-at-a-time consumers (Kafka replay, RPC fixtures);
    keep parquet for analytics. Partition layout follows the input
    partitioning exactly like the parquet sink."""
    w = (df.write.format("avro").option("compression", compression))
    for k, v in options.items():
        w = w.option(k, v)
    try:
        w.mode(mode).save(path)
    except Exception as exc:
        if _is_missing_driver(exc):
            raise NotImplementedError(
                "spark-avro module not on the classpath in this "
                "environment; add org.apache.spark:spark-avro via "
                "spark.jars.packages and re-call") from exc
        raise
