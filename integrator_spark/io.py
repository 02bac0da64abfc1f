"""Typed table loaders + view registry (the engine's source layer).

Maps the reference's ingest stage (raw RDF cell data fetched from a
triple store — SURVEY.md §1.1/§3.1) onto Spark sources: Parquet is the
primary format; CSV/JSON scans live in ``queries/sources.py``.

The one physical quirk: ``events.parquet`` stores TIMESTAMP(NANOS),
which Spark 4.1.2's Parquet reader rejects outright. With
``spark.sql.legacy.parquet.nanosAsLong=true`` the column arrives as a
long (nanos since epoch); we convert with exact integer division to
microseconds (``ts div 1000`` — no float round-trip, so no precision
loss) and rebuild a TimestampType column. DuckDB reads the same file
natively as TIMESTAMP_NS, so both engines agree at microsecond
precision after the conversion.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import ensure_runtime_confs

#: All fixture tables (FIXTURES.md), in FK-dependency order.
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table with schema fix-ups applied."""
    ensure_runtime_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) read as long; exact integer ns -> us.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def table_bytes(sf_dir: str, name: str) -> int | None:
    """On-disk size of one fixture table (file or directory of parts) —
    the zero-job size estimate behind the engine's physical-strategy
    routing (rollup pre-agg, long-vs-decimal exact sums, kNN broadcast
    budget). None when the path isn't locally stat-able (object store);
    callers must treat None as 'assume big' and pick the scale path."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        if os.path.isdir(path):
            return sum(e.stat().st_size for e in os.scandir(path)
                       if e.is_file())
        return os.path.getsize(path)
    except OSError:
        return None


def load_all(spark: SparkSession, sf_dir: str,
             tables: list[str] | None = None) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in (tables or TABLES)}


def register_views(spark: SparkSession, sf_dir: str,
                   tables: list[str] | None = None) -> dict[str, DataFrame]:
    """Register each table as a temp view (the engine's 'catalog').

    Mirrors the reference's SPARQL-endpoint surface (SURVEY.md §1.2):
    after registration, the full analytical surface is available via
    ``spark.sql`` over these names.
    """
    dfs = load_all(spark, sf_dir, tables)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs


def derived_dir(sf_dir: str, *parts: str) -> str:
    """Writable scratch area for derived files (CSV/JSON exports, sinks,
    streaming checkpoints). Kept inside the repo (never under the
    read-only testdata root) and git-ignored."""
    base = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "_derived",
        os.path.basename(os.path.normpath(sf_dir)),
        *parts,
    )
    os.makedirs(os.path.dirname(base) if parts else base, exist_ok=True)
    return base
