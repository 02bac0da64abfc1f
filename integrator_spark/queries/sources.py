"""Sources & sinks beyond Parquet (SURVEY.md §2.1): CSV scan, JSON scan,
parquet sink, partitioned sink.

Each query round-trips fixture data through the format under test and
aggregates the re-read result; the oracle computes the same aggregate
straight from the parquet views — equality proves the scan/sink is
lossless. Derived files live under ``_derived/<sf>/`` (git-ignored,
deterministic, rewritten per run).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.num import davg, dsum, sql_davg, sql_dsum
from ..io import derived_dir, load_table
from ..registry import register

DOCS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("n_chars", T.LongType()),
])

_DOCS_AGG_ORACLE = """
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(SUM(length(text)) AS BIGINT) AS sum_len
FROM documents
GROUP BY lang
"""


def _docs_agg(df: DataFrame) -> DataFrame:
    return (df.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_chars").alias("sum_chars"),
                 F.sum(F.length("text").cast("long")).alias("sum_len")))


@register("scan_csv", oracle=_DOCS_AGG_ORACLE, tags=("source", "csv"))
def scan_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV ingest with explicit schema: export documents → CSV (quoted,
    headered), re-read, aggregate. Matching the parquet-side oracle
    proves the delimited round-trip is lossless."""
    path = derived_dir(sf_dir, "documents_csv")
    (load_table(spark, sf_dir, "documents")
     .write.mode("overwrite").option("header", True).csv(path))
    df = spark.read.schema(DOCS_SCHEMA).option("header", True).csv(path)
    return _docs_agg(df)


@register("scan_json", oracle=_DOCS_AGG_ORACLE, tags=("source", "json"))
def scan_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newline-delimited JSON ingest with explicit schema (same
    round-trip discipline as scan_csv)."""
    path = derived_dir(sf_dir, "documents_json")
    (load_table(spark, sf_dir, "documents")
     .write.mode("overwrite").json(path))
    df = spark.read.schema(DOCS_SCHEMA).json(path)
    return _docs_agg(df)


@register("sink_parquet", oracle=f"""
SELECT COUNT(*) AS n_rows,
       {sql_dsum('l_quantity')} AS sum_qty,
       {sql_dsum('l_extendedprice')} AS sum_price
FROM lineitem
WHERE l_returnflag = 'A'
""", tags=("sink", "parquet"))
def sink_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet sink: write a filtered projection, re-read, aggregate —
    byte-exact round-trip of doubles and timestamps."""
    path = derived_dir(sf_dir, "lineitem_a_parquet")
    (load_table(spark, sf_dir, "lineitem")
     .filter(F.col("l_returnflag") == "A")
     .write.mode("overwrite").parquet(path))
    df = spark.read.parquet(path)
    return df.agg(F.count(F.lit(1)).alias("n_rows"),
                  dsum("l_quantity").alias("sum_qty"),
                  dsum("l_extendedprice").alias("sum_price"))


@register("sink_partitioned", oracle=f"""
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       {sql_dsum('o_totalprice')} AS total
FROM orders
GROUP BY o_orderstatus
""", tags=("sink", "parquet", "partitioned"))
def sink_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned sink (partitionBy the status column) +
    partition-pruning-friendly re-read. At 100 TB this layout is what
    makes status/date-sliced queries skip irrelevant files entirely."""
    src = load_table(spark, sf_dir, "orders")
    path = derived_dir(sf_dir, "orders_by_status")
    src.write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
    # explicit schema: an empty partitionBy write leaves no data files
    # to infer from
    df = spark.read.schema(src.schema).parquet(path)
    return (df.groupBy(F.col("o_orderstatus").cast("string").alias("o_orderstatus"))
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 dsum("o_totalprice").alias("total")))


@register("jdbc_roundtrip", oracle="""
SELECT n_regionkey,
       COUNT(*) AS n_nations,
       MIN(n_name) AS first_name
FROM nation
GROUP BY n_regionkey
""", tags=("source", "jdbc"))
def jdbc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real JDBC source+sink integration (no mock): write nation into an
    embedded Derby database (the Derby jars ship inside every stock
    Spark distribution), read it back as a PARTITIONED JDBC scan, and
    aggregate; matching the parquet-side oracle proves the SQL-typed
    round-trip is lossless.

    Scale posture: the read declares partitionColumn/bounds — without
    them a JDBC scan is ONE task regardless of cluster size (the #1
    production JDBC mistake). The write's parallelism is the upstream
    partition count (one connection+transaction per partition). The
    embedded engine is per-JVM (hence the per-process db path — Derby
    holds an exclusive lock); production swaps the URL/driver for a
    server-grade database, same plan."""
    import os

    from ..sources.connectors import DERBY_DRIVER, derby_url, write_jdbc

    db = os.path.join(derived_dir(sf_dir, "jdbc"), f"db_{os.getpid()}")
    url = derby_url(db)
    n = load_table(spark, sf_dir, "nation")
    write_jdbc(n, url, "nation", driver=DERBY_DRIVER)
    back = (spark.read.format("jdbc")
            .option("url", url).option("dbtable", "nation")
            .option("driver", DERBY_DRIVER)
            .option("partitionColumn", "n_nationkey")
            .option("lowerBound", "0").option("upperBound", "32")
            .option("numPartitions", "4")
            .load())
    return (back.groupBy("n_regionkey")
            .agg(F.count(F.lit(1)).alias("n_nations"),
                 F.min("n_name").alias("first_name")))


@register("scan_orc", oracle=_DOCS_AGG_ORACLE, tags=("source", "orc"))
def scan_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC ingest (the other built-in columnar format, same pushdown/
    pruning machinery as parquet): export -> re-read -> aggregate."""
    path = derived_dir(sf_dir, "documents_orc")
    (load_table(spark, sf_dir, "documents")
     .write.mode("overwrite").orc(path))
    df = spark.read.schema(DOCS_SCHEMA).orc(path)
    return _docs_agg(df)


@register("scan_custom_source", oracle=f"""
SELECT CAST(user_id % 8 AS BIGINT) AS bucket,
       COUNT(*) AS n_events,
       {sql_dsum('value')} AS total_value
FROM events
GROUP BY user_id % 8
""", tags=("source", "custom"))
def scan_custom_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python DataSource round trip (Spark 4
    pyspark.sql.datasource API): events staged as fixed-width binary
    "binrec" shards (written distributed, one shard per partition),
    read back through the registered `binrec` format — one
    InputPartition per shard, offset-math record splitting — and
    aggregated. The oracle computes the same aggregate from the
    original table, so a single corrupted/dropped record fails the
    gate. This is the no-JVM-connector path for proprietary wire
    formats (sources/binrec.py)."""
    from ..io import derived_dir
    from ..sources import binrec

    e = load_table(spark, sf_dir, "events")
    if e.isEmpty():   # nothing to stage: no shards for the reader
        return spark.createDataFrame(
            [], "bucket long, n_events long, total_value double")
    out = derived_dir(sf_dir, "binrec_events")
    binrec.stage_binrec(e.repartition(4), out)
    binrec.register(spark)
    raw = spark.read.format("binrec").option("path", out).load()
    return (raw.groupBy((F.col("user_id") % 8).cast("long").alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 dsum("value").alias("total_value")))


@register("scan_xml", oracle=f"""
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       {sql_davg('n_chars')} AS avg_chars
FROM documents
GROUP BY lang
""", tags=("source", "xml"))
def scan_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in XML source round trip (native in Spark 4 — no
    spark-xml package): documents exported as XML row elements via
    to_xml (distributed text sink, one shard per partition), read back
    with rowTag row discovery + explicit schema, and aggregated. The
    oracle computes the same aggregate from the original table, so any
    escaping/round-trip loss fails the gate."""
    d = load_table(spark, sf_dir, "documents")
    out = derived_dir(sf_dir, "xml_docs")
    (d.select("doc_id", "lang", "n_chars")
     .write.format("xml")
     .option("rootTag", "docs").option("rowTag", "doc")
     .mode("overwrite").save(out))
    back = (spark.read.format("xml").option("rowTag", "doc")
            .schema("doc_id long, lang string, n_chars long")
            .load(out))
    return (back.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_chars").alias("total_chars"),
                 davg("n_chars").alias("avg_chars")))


@register("scan_csv_malformed", oracle="""
SELECT 'good' AS kind, COUNT(*) AS n_rows,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents WHERE doc_id % 10 <> 3
UNION ALL
SELECT 'corrupt', COUNT(*), CAST(NULL AS BIGINT)
FROM documents WHERE doc_id % 10 = 3
""", tags=("source", "robustness"))
def scan_csv_malformed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-input handling (PERMISSIVE mode + columnNameOfCorruptRecord):
    a CSV export where every doc_id%10==3 row is deliberately mangled
    (wrong column count) must load WITHOUT failing the job, parking the
    broken lines in the corrupt-record column for quarantine — the
    only survivable posture when 100 TB of vendor CSV contains the
    inevitable bad rows (FAILFAST is for curated data; a single bad
    row would kill a day-long job). The oracle reconstructs the
    good/corrupt accounting from the clean source."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars")
    out = derived_dir(sf_dir, "csv_malformed")
    mangled = d.select(
        F.when(F.col("doc_id") % 10 == 3,
               F.concat_ws("|", "doc_id", "lang"))  # wrong delimiter+arity
        .otherwise(F.concat_ws(",", "doc_id", "lang", "n_chars"))
        .alias("value"))
    mangled.write.mode("overwrite").text(out)
    parsed = (spark.read
              .schema("doc_id long, lang string, n_chars long, _bad string")
              .option("mode", "PERMISSIVE")
              .option("columnNameOfCorruptRecord", "_bad")
              .csv(out))
    # cache: PERMISSIVE corrupt-column frames must not be re-parsed per
    # branch (Spark requires referencing _bad only alongside a cache/
    # materialization; this also keeps the two branches consistent).
    parsed = parsed.cache()
    kind = F.when(F.col("_bad").isNull(), "good").otherwise("corrupt")
    return (parsed.groupBy(kind.alias("kind"))
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum("n_chars").alias("total_chars")))
