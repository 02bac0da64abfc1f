"""Gate tests for the environment-gated connectors (VERDICT r01 item 8):
each helper must fail with its documented NotImplementedError (clear
remediation message), never a raw classpath stack trace. delta-spark is
probed at import time — if a future environment provides it, the Delta
round-trip test activates automatically.
"""

from __future__ import annotations

import pytest

from integrator_spark.sources.connectors import (
    read_delta,
    read_jdbc,
    read_kafka_stream,
)

try:  # container has no network; present only if preinstalled
    import delta  # noqa: F401
    HAVE_DELTA = True
except ImportError:
    HAVE_DELTA = False


def test_jdbc_gate_raises_documented_error(spark):
    with pytest.raises(NotImplementedError, match="JDBC driver jar"):
        read_jdbc(spark, "jdbc:postgresql://db:5432/x", "t",
                  partition_column="id", num_partitions=4).collect()


def test_jdbc_derby_roundtrip_partitioned(spark, tmp_path):
    # Real JDBC integration (VERDICT r3 stretch): embedded Derby ships
    # in Spark's jars, so write+partitioned-read must actually work.
    from integrator_spark.sources.connectors import (
        DERBY_DRIVER,
        derby_url,
        write_jdbc,
    )

    url = derby_url(str(tmp_path / "db"))
    src = spark.range(0, 100).selectExpr("id", "id % 7 AS grp")
    write_jdbc(src, url, "t", driver=DERBY_DRIVER)
    back = (spark.read.format("jdbc").option("url", url)
            .option("dbtable", "t").option("driver", DERBY_DRIVER)
            .option("partitionColumn", "id").option("lowerBound", "0")
            .option("upperBound", "100").option("numPartitions", "4").load())
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 100
    assert back.agg({"id": "sum"}).first()[0] == 4950
    # overwrite is idempotent
    write_jdbc(src.filter("id < 10"), url, "t", driver=DERBY_DRIVER)
    assert (spark.read.format("jdbc").option("url", url)
            .option("dbtable", "t").option("driver", DERBY_DRIVER)
            .load().count() == 10)


def test_kafka_gate_raises_documented_error(spark):
    with pytest.raises(NotImplementedError, match="spark-sql-kafka"):
        read_kafka_stream(spark, "broker:9092", "events")


@pytest.mark.skipif(HAVE_DELTA, reason="delta-spark present: gate open")
def test_delta_gate_raises_documented_error(spark, tmp_path):
    with pytest.raises(NotImplementedError, match="delta-spark"):
        read_delta(spark, str(tmp_path / "tbl")).collect()


@pytest.mark.skipif(not HAVE_DELTA, reason="delta-spark not installed")
def test_delta_round_trip(spark, tmp_path):
    path = str(tmp_path / "tbl")
    spark.range(10).write.format("delta").save(path)
    assert read_delta(spark, path).count() == 10


def test_avro_gate_raises_documented_error(spark, tmp_path):
    from integrator_spark.sources.connectors import read_avro, write_avro
    df = spark.range(3)
    with pytest.raises(NotImplementedError, match="spark-avro"):
        write_avro(df, str(tmp_path / "avro_out"))
    with pytest.raises(NotImplementedError, match="spark-avro"):
        read_avro(spark, str(tmp_path / "avro_out"))
