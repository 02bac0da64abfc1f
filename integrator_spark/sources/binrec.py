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
from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    DataSourceStreamReader, InputPartition)

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


class BinRecStreamReader(DataSourceStreamReader):
    """Streaming face of the binrec format (Spark 4
    ``DataSourceStreamReader``): the offset is simply "how many shard
    files (in sorted-name order) have been consumed", so a micro-batch
    is a contiguous shard range and replaying any committed range
    re-reads exactly the same bytes — the idempotent-offset contract
    Kafka's (topic, partition, offset) triples implement, in one
    integer. ``shardsPerTrigger`` rate-limits how far ``latestOffset``
    advances per call, which is how a Python streaming source bounds
    micro-batch size under a processingTime trigger (availableNow
    snapshots ONE latestOffset as the run's terminal offset — measured
    2 of 6 shards — so rate-limited drains use a processingTime loop;
    see streaming/jobs.py::stream_custom_source).

    New shards appended later (names sort AFTER consumed ones — the
    staging uses uuid names, so production would use monotonic names)
    are picked up by subsequent triggers; `commit` persists the
    committed floor to the optional ``progressFile`` (shards
    themselves are immutable; batch progress lives in the
    checkpoint)."""

    def __init__(self, options):
        self.dir = options["path"]
        self.per_trigger = int(options.get("shardsPerTrigger", 0) or 0)
        # Rate-limit base. The engine calls latestOffset() BEFORE
        # initialOffset() on a fresh query and before any
        # partitions()/commit() replay on a clean restart (measured,
        # pyspark 4.1.2 — there is no admission-control signature that
        # would hand the start offset in) — so the base cannot wait
        # for an engine-supplied offset, and capping from a fresh
        # in-memory 0 after a clean restart returns an offset BEHIND
        # the committed start: the backwards end is logged, becomes
        # the next batch's start, and already-processed shards are
        # re-read (duplicate rows — round-10 advisor finding). The
        # durable fix: the optional ``progressFile`` persists the
        # committed floor across reader instances (commit() rewrites
        # it atomically); colocate it with the stream's own lifecycle
        # as the registered stream does. Without the option a FRESH
        # query is still correctly capped from 0 — only
        # checkpoint-restarts of rate-limited streams need the file.
        self._progress = options.get("progressFile")
        self._last = 0
        if self._progress:
            try:
                with open(self._progress) as fh:
                    self._last = max(0, int(fh.read().strip() or 0))
            except (OSError, ValueError):
                self._last = 0   # absent/corrupt file → fresh base

    def _shards(self) -> list[str]:
        return sorted(f for f in os.listdir(self.dir)
                      if f.endswith(".bin"))

    def initialOffset(self) -> dict:
        return {"shard": 0}

    def latestOffset(self) -> dict:
        n = len(self._shards())
        if self.per_trigger > 0:
            n = min(n, self._last + self.per_trigger)
        self._last = max(self._last, n)
        return {"shard": n}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        # Engine-supplied offsets — fold both ends into the rate-limit
        # base so it can never lag the checkpoint on a replay.
        self._last = max(self._last, start["shard"], end["shard"])
        shards = self._shards()
        return [BinRecPartition(os.path.join(self.dir, f))
                for f in shards[start["shard"]:end["shard"]]]

    def read(self, partition: BinRecPartition) -> Iterator[tuple]:
        with open(partition.path, "rb") as fh:
            data = fh.read()
        if len(data) % RECORD_SIZE:
            raise ValueError(f"corrupt shard {partition.path}: "
                             f"{len(data)} bytes not a record multiple")
        for off in range(0, len(data), RECORD_SIZE):
            yield struct.unpack_from(RECORD_FMT, data, off)

    def commit(self, end: dict) -> None:
        # Shards are immutable so there is nothing to clean up; the
        # committed end is the durable floor for the rate-limit base.
        self._last = max(self._last, end["shard"])
        if self._progress:
            tmp = self._progress + ".tmp"
            try:
                with open(tmp, "w") as fh:
                    fh.write(str(self._last))
                os.replace(tmp, self._progress)
            except OSError:
                pass   # progress persistence is best-effort


class BinRecDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "binrec"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> BinRecReader:
        return BinRecReader(self.options)

    def streamReader(self, schema) -> BinRecStreamReader:
        return BinRecStreamReader(self.options)


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
