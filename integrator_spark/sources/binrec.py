"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API): a
length-fixed binary record format ("binrec") — the pattern for
ingesting a proprietary wire/log format straight into DataFrames
without a JVM connector.

Record layout: little-endian (int64 event_id, int64 user_id,
float64 value) = 24 bytes, no framing — offset math IS the splitter,
so the reader hands Spark one InputPartition per shard file and each
partition streams its records independently (the same
split-by-byte-range contract Parquet/CSV readers use; a 100 TB binrec
dataset scales by shard count, not driver memory).

Staging is distributed: each upstream partition writes its own shard
via foreachPartition — no driver staging loop.
"""

from __future__ import annotations

import os
import struct
import uuid
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

RECORD_FMT = "<qqd"
RECORD_SIZE = struct.calcsize(RECORD_FMT)
SCHEMA = "event_id long, user_id long, value double"


class BinRecPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class BinRecReader(DataSourceReader):
    def __init__(self, options):
        self.dir = options["path"]

    def partitions(self):
        return [BinRecPartition(os.path.join(self.dir, f))
                for f in sorted(os.listdir(self.dir))
                if f.endswith(".bin")]

    def read(self, partition: BinRecPartition) -> Iterator[tuple]:
        with open(partition.path, "rb") as fh:
            data = fh.read()
        if len(data) % RECORD_SIZE:
            raise ValueError(f"corrupt shard {partition.path}: "
                             f"{len(data)} bytes not a record multiple")
        for off in range(0, len(data), RECORD_SIZE):
            yield struct.unpack_from(RECORD_FMT, data, off)


class BinRecDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "binrec"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> BinRecReader:
        return BinRecReader(self.options)


def stage_binrec(df: DataFrame, out_dir: str) -> None:
    """Write (event_id, user_id, value) rows as binrec shards — one
    shard per partition, written ON THE EXECUTORS."""
    os.makedirs(out_dir, exist_ok=True)
    for f in os.listdir(out_dir):
        if f.endswith(".bin"):
            os.remove(os.path.join(out_dir, f))

    def write_shard(rows) -> None:
        buf = bytearray()
        for r in rows:
            buf += struct.pack(RECORD_FMT, r["event_id"], r["user_id"],
                              r["value"])
        if buf:
            shard = os.path.join(out_dir, f"shard-{uuid.uuid4().hex}.bin")
            with open(shard, "wb") as fh:
                fh.write(bytes(buf))

    df.select("event_id", "user_id", "value").foreachPartition(write_shard)


def register(spark: SparkSession) -> None:
    spark.dataSource.register(BinRecDataSource)
