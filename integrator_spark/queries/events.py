"""Event-time windowing — batch analogs of the streaming surface
(SURVEY.md §2.9). The same expressions run unchanged under
``readStream`` (see streaming/jobs.py); the DuckDB oracle checks the
batch semantics: tumbling, sliding, session windows, keyed dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.num import dsum, sql_dsum
from ..io import load_table
from ..registry import register

SEC_FMT = "yyyy-MM-dd HH:mm:ss"
SEC_FMT_DUCK = "%Y-%m-%d %H:%M:%S"
US_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"
US_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"


@register("events_tumbling", oracle=f"""
SELECT strftime(date_trunc('hour', ts), '{SEC_FMT_DUCK}') AS bucket_start,
       event_type,
       COUNT(*) AS n_events,
       {sql_dsum('value')} AS total_value
FROM events
GROUP BY 1, 2
""", tags=("events", "window"))
def events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregation via F.window (epoch-aligned,
    identical to date_trunc('hour') for 1h buckets)."""
    e = load_table(spark, sf_dir, "events")
    return (e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 dsum("value").alias("total_value"))
            .select(F.date_format("w.start", SEC_FMT).alias("bucket_start"),
                    "event_type", "n_events", "total_value"))


@register("events_sliding", oracle=f"""
SELECT strftime(time_bucket(INTERVAL '15 minutes', ts)
                - k * INTERVAL '15 minutes', '{SEC_FMT_DUCK}') AS bucket_start,
       COUNT(*) AS n_events,
       {sql_dsum('value')} AS total_value
FROM events CROSS JOIN (VALUES (0), (1), (2), (3)) ks(k)
GROUP BY 1
""", tags=("events", "window"))
def events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window: 1-hour windows every 15 minutes — each event lands
    in exactly 4 overlapping windows (oracle materializes them via a
    4-way unnest of slide offsets)."""
    e = load_table(spark, sf_dir, "events")
    return (e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 dsum("value").alias("total_value"))
            .select(F.date_format("w.start", SEC_FMT).alias("bucket_start"),
                    "n_events", "total_value"))


@register("events_session", oracle=f"""
WITH gaps AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sessions AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_id
  FROM gaps
)
SELECT user_id,
       strftime(MIN(ts), '{US_FMT_DUCK}') AS session_start,
       strftime(MAX(ts) + INTERVAL '30 minutes', '{US_FMT_DUCK}') AS session_end,
       COUNT(*) AS n_events
FROM sessions
GROUP BY user_id, session_id
""", tags=("events", "window", "session"))
def events_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows (30-min inactivity gap) via
    F.session_window — the oracle reproduces the semantics with the
    classic lag-gap + cumulative-sum islands construction."""
    e = load_table(spark, sf_dir, "events")
    return (e.groupBy(F.session_window("ts", "30 minutes").alias("s"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select("user_id",
                    F.date_format("s.start", US_FMT).alias("session_start"),
                    F.date_format("s.end", US_FMT).alias("session_end"),
                    "n_events"))


@register("events_dedup", oracle=f"""
SELECT user_id, event_type, event_id,
       strftime(ts, '{US_FMT_DUCK}') AS first_ts
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                           ORDER BY ts, event_id) = 1
""", tags=("events", "dedup"))
def events_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup keeping the earliest row per (user, event_type) — the
    batch analog of dropDuplicatesWithinWatermark, made deterministic
    with an explicit (ts, event_id) ordering."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (e.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("user_id", "event_type", "event_id",
                    F.date_format("ts", US_FMT).alias("first_ts")))
