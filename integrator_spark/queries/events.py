"""Event-time windowing — batch analogs of the streaming surface
(SURVEY.md §2.9). The same expressions run unchanged under
``readStream`` (see streaming/jobs.py); the DuckDB oracle checks the
batch semantics: tumbling, sliding, session windows, keyed dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.num import DEC, dsum, dsum_money, sql_dsum
from ..io import load_table, table_bytes
from ..registry import register


def _vsum(sf_dir: str):
    """Size-routed exact sum for events.value — a non-negative 2-dp
    amount column (measured: every value at sf0.1 equals round(value, 2);
    FIXTURES.md events schema), so the dsum_grid equivalence holds.
    Arbitrary-precision measures must keep dsum()."""
    b = table_bytes(sf_dir, "events")
    return lambda c: dsum_money(c, b)

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
    """Tumbling 1-hour window aggregation.

    Plan note: grouped on ``date_trunc('hour', ts)`` — for epoch-aligned
    1h buckets this is bit-identical to ``F.window(ts, '1 hour').start``
    but groups/shuffles on a bare 8-byte timestamp instead of F.window's
    (start, end) struct key. Measured at sf0.1/local[32]: 0.28 s vs
    0.67 s for the struct-key formulation — the struct key roughly
    doubles hash+shuffle row width for zero information (end = start +
    1h). The streaming variant keeps F.window (watermark eviction needs
    the window struct); batch does not."""
    e = load_table(spark, sf_dir, "events")
    return (e.groupBy(F.date_trunc("hour", "ts").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 _vsum(sf_dir)("value").alias("total_value"))
            .select(F.date_format("w", SEC_FMT).alias("bucket_start"),
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
    4-way unnest of slide offsets).

    Plan note: same materialization as the oracle — explode 4 slide
    offsets and group on a scalar 15-min-aligned timestamp, exactly
    what F.window(slide) does internally EXCEPT the group key is a bare
    8-byte timestamp instead of the (start, end) struct. Measured at
    sf0.1/local[32]: 0.39 s vs 0.88 s (with the size-routed grid sum,
    bit-identical rows). Same key-width argument as events_tumbling;
    the streaming variant keeps F.window for watermark eviction."""
    e = load_table(spark, sf_dir, "events")
    sec = F.col("ts").cast("long")
    bucket = (sec - F.pmod(sec, F.lit(900)) - F.col("_k") * 900).cast("timestamp")
    return (e.withColumn("_k", F.explode(F.array(*[F.lit(i) for i in range(4)])))
            .groupBy(bucket.alias("w"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 _vsum(sf_dir)("value").alias("total_value"))
            .select(F.date_format("w", SEC_FMT).alias("bucket_start"),
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


@register("events_resample", oracle=f"""
WITH grid AS (
  SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                TIMESTAMP '2024-01-31 00:00:00',
                                INTERVAL '6 hours')) AS bucket
), per_type AS (SELECT DISTINCT event_type FROM events),
obs AS (
  SELECT event_type, ts, value FROM events
  QUALIFY row_number() OVER (PARTITION BY event_type, ts
                             ORDER BY event_id DESC) = 1
)
SELECT strftime(g.bucket, '{SEC_FMT_DUCK}') AS bucket_start,
       t.event_type,
       o.value AS last_value
FROM grid g
CROSS JOIN per_type t
ASOF LEFT JOIN obs o
  ON o.event_type = t.event_type AND o.ts <= g.bucket
""", tags=("events", "resample", "timeseries"))
def events_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled resampling (the hypertable/time-series pattern): a
    regular 6-hour grid per event type, forward-filled with the last
    observation at or before each grid point — grid from sequence(),
    fill via the as-of operator. NULL before the first observation.

    Ties at identical (type, ts) resolve to the max event_id on both
    engines, keeping the fill deterministic.
    """
    from ..operators.asof import asof_join_backward
    from ..operators.dedup import exact_dedup_keep_first

    e = load_table(spark, sf_dir, "events")
    grid = (spark.sql("""
        SELECT explode(sequence(TIMESTAMP '2024-01-01 00:00:00',
                                TIMESTAMP '2024-01-31 00:00:00',
                                INTERVAL 6 HOURS)) AS bucket
    """))
    types = e.select("event_type").distinct()
    grid_t = grid.crossJoin(types)
    obs = exact_dedup_keep_first(
        e.select("event_type", F.col("ts").alias("o_ts"),
                 F.col("value"), "event_id"),
        key_cols=["event_type", "o_ts"],
        order_cols=[F.col("event_id").desc()]).drop("event_id")
    filled = asof_join_backward(
        grid_t, obs, on=["event_type"], left_ts="bucket",
        right_ts="o_ts", right_payload=["value"])
    return filled.select(
        F.date_format("bucket", SEC_FMT).alias("bucket_start"),
        "event_type",
        F.col("value").alias("last_value"))


@register("events_interpolate", oracle=f"""
WITH grid AS (
  SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                TIMESTAMP '2024-01-31 00:00:00',
                                INTERVAL '6 hours')) AS bucket
), per_type AS (SELECT DISTINCT event_type FROM events),
obs AS (
  SELECT event_type, ts, value FROM events
  WHERE value IS NOT NULL
  QUALIFY row_number() OVER (PARTITION BY event_type, ts
                             ORDER BY event_id DESC) = 1
)
SELECT strftime(g.bucket, '{SEC_FMT_DUCK}') AS bucket_start,
       t.event_type,
       ROUND(CASE
         WHEN p.ts IS NULL OR n.ts IS NULL THEN NULL
         WHEN n.ts = p.ts THEN p.value
         ELSE p.value + (n.value - p.value)
              * (CAST(epoch_us(g.bucket) - epoch_us(p.ts) AS DOUBLE)
                 / CAST(epoch_us(n.ts) - epoch_us(p.ts) AS DOUBLE))
       END, 6) AS interp_value
FROM grid g
CROSS JOIN per_type t
ASOF LEFT JOIN obs p
  ON p.event_type = t.event_type AND p.ts <= g.bucket
ASOF LEFT JOIN obs n
  ON n.event_type = t.event_type AND n.ts >= g.bucket
""", tags=("events", "resample", "timeseries", "interpolate"))
def events_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-interpolation gap fill (the other half of the hypertable
    resample surface next to events_resample's LOCF): at each 6-hour
    grid point per event type, interpolate between the latest
    observation at-or-before and the earliest at-or-after; NULL
    outside the observed range. Composes the backward AND the new
    forward as-of operators (operators/asof.py) — each is one union +
    one linear window pass per key, no range explosion.

    Determinism: the fraction is computed on exact int64 microsecond
    deltas cast to double (identical IEEE ops on both engines; a
    seconds-level unix_timestamp would truncate the fixture's
    microsecond timestamps), the same a + (b-a)*t expression shape on
    both sides, rounded to 6 dp. Ties at identical (type, ts) resolve
    to max event_id, as in events_resample. NULL-valued observations
    are dropped up front on both engines — the as-of operators fill
    payload columns per column, so a null value surviving into obs
    would pair an older value with the matched timestamp and skew the
    slope (the operator docstring's documented caveat).
    """
    from ..operators.asof import asof_join_backward, asof_join_forward
    from ..operators.dedup import exact_dedup_keep_first

    e = load_table(spark, sf_dir, "events")
    grid = spark.sql("""
        SELECT explode(sequence(TIMESTAMP '2024-01-01 00:00:00',
                                TIMESTAMP '2024-01-31 00:00:00',
                                INTERVAL 6 HOURS)) AS bucket
    """)
    types = e.select("event_type").distinct()
    grid_t = grid.crossJoin(types)
    obs = exact_dedup_keep_first(
        e.filter(F.col("value").isNotNull())
        .select("event_type", F.col("ts").alias("o_ts"),
                F.col("value"), "event_id"),
        key_cols=["event_type", "o_ts"],
        order_cols=[F.col("event_id").desc()]).drop("event_id")
    prev = (obs.select("event_type", "o_ts",
                       F.col("value").alias("p_val"))
            .withColumn("p_ts", F.col("o_ts")))
    nxt = (obs.select("event_type", "o_ts",
                      F.col("value").alias("n_val"))
           .withColumn("n_ts", F.col("o_ts")))
    with_prev = asof_join_backward(
        grid_t, prev, on=["event_type"], left_ts="bucket",
        right_ts="o_ts", right_payload=["p_val", "p_ts"])
    both = asof_join_forward(
        with_prev, nxt, on=["event_type"], left_ts="bucket",
        right_ts="o_ts", right_payload=["n_val", "n_ts"])
    frac = ((F.unix_micros("bucket") - F.unix_micros("p_ts"))
            .cast("double")
            / (F.unix_micros("n_ts") - F.unix_micros("p_ts"))
            .cast("double"))
    interp = (F.when(F.col("p_ts").isNull() | F.col("n_ts").isNull(),
                     F.lit(None).cast("double"))
              .when(F.col("n_ts") == F.col("p_ts"), F.col("p_val"))
              .otherwise(F.col("p_val")
                         + (F.col("n_val") - F.col("p_val")) * frac))
    return both.select(
        F.date_format("bucket", SEC_FMT).alias("bucket_start"),
        "event_type",
        F.round(interp, 6).alias("interp_value"))


@register("events_rollup_daily", oracle=f"""
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       COUNT(*) AS n_events,
       {sql_dsum('value')} AS total_value
FROM events
GROUP BY 1
""", tags=("events", "rollup", "timeseries"))
def events_rollup_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical time rollup (continuous-aggregate pattern): daily
    results computed by re-aggregating HOURLY partials rather than the
    raw stream — exactly how a 100 TB hypertable maintains multi-grain
    rollups incrementally. Decimal partial sums re-aggregate exactly,
    so the result matches the direct daily aggregation (the oracle)."""
    e = load_table(spark, sf_dir, "events")
    hourly = (e.groupBy(F.date_trunc("hour", "ts").alias("hour"))
              .agg(F.count(F.lit(1)).alias("_n"),
                   F.sum(F.col("value").cast(DEC)).alias("_v")))
    return (hourly.groupBy(F.date_format(F.date_trunc("day", "hour"),
                                         "yyyy-MM-dd").alias("day"))
            .agg(F.sum("_n").alias("n_events"),
                 F.sum("_v").cast("double").alias("total_value")))


@register("events_funnel", oracle="""
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
), s2 AS (
  SELECT s1.user_id, MIN(e.ts) AS t2
  FROM s1 JOIN events e
    ON e.user_id = s1.user_id AND e.event_type = 'click'
   AND e.ts > s1.t1 AND e.ts <= s1.t1 + INTERVAL 1 HOUR
  GROUP BY s1.user_id
), s3 AS (
  SELECT s2.user_id, MIN(e.ts) AS t3
  FROM s2 JOIN events e
    ON e.user_id = s2.user_id AND e.event_type = 'purchase'
   AND e.ts > s2.t2 AND e.ts <= s2.t2 + INTERVAL 1 HOUR
  GROUP BY s2.user_id
)
SELECT stage, n_users FROM (
  SELECT '1_view' AS stage, COUNT(*) AS n_users FROM s1
  UNION ALL SELECT '2_click_1h', COUNT(*) FROM s2
  UNION ALL SELECT '3_purchase_1h', COUNT(*) FROM s3
)
""", tags=("events", "funnel"))
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-funnel analytics: users who viewed, then clicked
    within 1 h of their first view, then purchased within 1 h of that
    first click — first-touch semantics at each stage.

    Each stage is a per-user MIN + an event-time range join whose left
    side only shrinks, so the plan is three shuffle-bounded
    aggregations — never a per-user collect or a cross join. At 100 TB
    the range join keys on user_id (the natural partitioning of an
    event stream), and AQE handles the hot-user skew."""
    e = load_table(spark, sf_dir, "events")

    def first_after(prev: DataFrame, prev_ts: str, etype: str,
                    out_ts: str) -> DataFrame:
        p = prev.alias("p")
        cond = ((F.col("e.user_id") == F.col("p.user_id")) &
                (F.col("e.event_type") == etype) &
                (F.col("e.ts") > F.col(f"p.{prev_ts}")) &
                (F.col("e.ts") <= F.col(f"p.{prev_ts}")
                 + F.expr("interval 1 hour")))
        return (e.alias("e").join(p, cond)
                .groupBy(F.col("p.user_id").alias("user_id"))
                .agg(F.min("e.ts").alias(out_ts)))

    s1 = (e.filter(F.col("event_type") == "view")
          .groupBy("user_id").agg(F.min("ts").alias("t1")))
    s2 = first_after(s1, "t1", "click", "t2")
    s3 = first_after(s2, "t2", "purchase", "t3")
    counts = [s1.agg(F.count(F.lit(1)).alias("n_users"))
              .select(F.lit("1_view").alias("stage"), "n_users"),
              s2.agg(F.count(F.lit(1)).alias("n_users"))
              .select(F.lit("2_click_1h").alias("stage"), "n_users"),
              s3.agg(F.count(F.lit(1)).alias("n_users"))
              .select(F.lit("3_purchase_1h").alias("stage"), "n_users")]
    out = counts[0]
    for c in counts[1:]:
        out = out.unionAll(c)
    return out


@register("events_outliers", oracle="""
WITH stats AS (
  SELECT event_type,
         CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS mu,
         (CAST(SUM(CAST(value * value AS DECIMAL(38,6))) AS DOUBLE)
          - CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
            * CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*))
         / (COUNT(*) - 1) AS var
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type, e.value,
       ROUND((e.value - s.mu) / sqrt(s.var), 6) AS zscore
FROM events e JOIN stats s ON s.event_type = e.event_type
WHERE abs((e.value - s.mu) / sqrt(s.var)) > 2.5
""", tags=("events", "outliers"))
def events_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score outlier detection (|z| > 2.5) — the data-quality
    screen a training pipeline runs on numeric telemetry.

    stddev_samp over doubles is partial-order-dependent, so the variance
    is built from decimal-exact SUM(x) and SUM(x*x) instead
    (E[x2] - E[x]2 on bit-identical operands) — the z-scores come out
    deterministic on any cluster size, and the oracle mirrors the same
    formula. One aggregation + one broadcast join back to the facts."""
    e = load_table(spark, sf_dir, "events")
    sum_v = F.sum(F.col("value").cast(DEC)).cast("double")
    sum_v2 = F.sum((F.col("value") * F.col("value")).cast(DEC)).cast("double")
    n = F.count(F.lit(1))
    stats = (e.groupBy(F.col("event_type").alias("et"))
             .agg((sum_v / n).alias("mu"),
                  ((sum_v2 - sum_v * sum_v / n) / (n - 1)).alias("var")))
    z = (F.col("value") - F.col("mu")) / F.sqrt(F.col("var"))
    return (e.join(F.broadcast(stats), F.col("event_type") == F.col("et"))
            .filter(F.abs(z) > 2.5)
            .select("event_id", "event_type", "value",
                    F.round(z, 6).alias("zscore")))


@register("events_retention", oracle="""
WITH firsts AS (
  SELECT user_id, date_trunc('day', MIN(ts)) AS cohort_day FROM events
  GROUP BY user_id
), activity AS (
  SELECT DISTINCT e.user_id,
         f.cohort_day,
         datediff('day', f.cohort_day, date_trunc('day', e.ts)) AS day_n
  FROM events e JOIN firsts f ON f.user_id = e.user_id
)
SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort,
       CAST(day_n AS BIGINT) AS day_n,
       COUNT(*) AS n_active
FROM activity
WHERE day_n <= 7
GROUP BY 1, 2
""", tags=("events", "retention"))
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen day, counted on
    each subsequent day they return (day 0..7) — the triangle chart
    behind every growth dashboard. Two aggregations + one equi join on
    user_id (the event stream's natural key); the DISTINCT collapses
    multi-event days before counting, so the join output, not the raw
    stream, is the shuffled volume."""
    e = load_table(spark, sf_dir, "events")
    firsts = (e.groupBy("user_id")
              .agg(F.date_trunc("day", F.min("ts")).alias("cohort_day")))
    activity = (e.join(firsts, "user_id")
                .select("user_id", "cohort_day",
                        F.datediff(F.date_trunc("day", "ts"), "cohort_day")
                         .alias("day_n"))
                .distinct())
    return (activity.filter(F.col("day_n") <= 7)
            .groupBy(F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort"),
                     F.col("day_n").cast("long").alias("day_n"))
            .agg(F.count(F.lit(1)).alias("n_active")))


@register("events_sessionize", oracle="""
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, event_id,
       CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS session_no
FROM flagged
""", tags=("events", "session"))
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level sessionization: assign every event its per-user session
    NUMBER (gap >= 30 min starts a new one) via the classic
    flag-then-running-sum — two window passes over ONE shuffle on
    user_id (same partitioning, Spark reuses the exchange). The
    aggregate view of the same sessions is events_session; this is the
    row-level labeling a feature pipeline joins back onto raw events."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    is_new = F.when(F.lag("ts").over(w).isNull()
                    | (gap >= 30 * 60 * 1_000_000), 1).otherwise(0)
    run = (Window.partitionBy("user_id").orderBy("ts", "event_id")
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (e.select("user_id", "event_id", is_new.alias("_new"), "ts")
            .select("user_id", "event_id",
                    F.sum("_new").over(run).cast("long").alias("session_no")))


@register("events_transitions", oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events
)
SELECT event_type AS from_type, next_type AS to_type,
       COUNT(*) AS n_transitions
FROM seq
WHERE next_type IS NOT NULL
GROUP BY 1, 2
""", tags=("events", "sequence"))
def events_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral transition matrix: counts of consecutive event-type
    pairs per user timeline (the first-order Markov statistics behind
    next-action prediction and funnel-drop diagnosis). One window
    shuffle on user_id + one aggregation — sequential pattern mining's
    base case, fully relational."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (e.select(F.col("event_type").alias("from_type"),
                     F.lead("event_type").over(w).alias("to_type"))
            .filter(F.col("to_type").isNotNull())
            .groupBy("from_type", "to_type")
            .agg(F.count(F.lit(1)).alias("n_transitions")))


@register("events_heatmap", oracle="""
SELECT CAST(isodow(ts) AS BIGINT) AS weekday,
       CAST(SUM(CASE WHEN hour(ts) < 6 THEN 1 ELSE 0 END) AS BIGINT)
         AS h00_05,
       CAST(SUM(CASE WHEN hour(ts) BETWEEN 6 AND 11 THEN 1 ELSE 0 END)
            AS BIGINT) AS h06_11,
       CAST(SUM(CASE WHEN hour(ts) BETWEEN 12 AND 17 THEN 1 ELSE 0 END)
            AS BIGINT) AS h12_17,
       CAST(SUM(CASE WHEN hour(ts) >= 18 THEN 1 ELSE 0 END) AS BIGINT)
         AS h18_23
FROM events
GROUP BY 1
""", tags=("events", "heatmap"))
def events_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity heatmap: ISO weekday × 6-hour daypart crosstab via
    pivot on derived time keys — the wide (dashboard-shaped) cousin of
    the long-form aggregations; the pivot's value set is declared
    explicitly so the plan is a single aggregation, no distinct-scan
    to discover columns."""
    e = load_table(spark, sf_dir, "events")
    part = (F.when(F.hour("ts") < 6, "h00_05")
            .when(F.hour("ts") < 12, "h06_11")
            .when(F.hour("ts") < 18, "h12_17")
            .otherwise("h18_23"))
    return (e.select(F.dayofweek("ts").alias("_dow"),
                     F.col("ts"), part.alias("part"))
            .select(
                # dayofweek is 1=Sunday; convert to ISO 1=Monday
                F.when(F.col("_dow") == 1, 7).otherwise(F.col("_dow") - 1)
                 .cast("long").alias("weekday"), "part")
            .groupBy("weekday")
            .pivot("part", ["h00_05", "h06_11", "h12_17", "h18_23"])
            .count()
            .na.fill(0)
            .select("weekday",
                    F.col("h00_05").cast("long").alias("h00_05"),
                    F.col("h06_11").cast("long").alias("h06_11"),
                    F.col("h12_17").cast("long").alias("h12_17"),
                    F.col("h18_23").cast("long").alias("h18_23")))


@register("events_session_dynamic", oracle=f"""
WITH gapped AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'click' THEN INTERVAL '10 minutes'
              WHEN event_type = 'purchase' THEN INTERVAL '60 minutes'
              ELSE INTERVAL '30 minutes' END AS gap
  FROM events
), marked AS (
  SELECT user_id, ts, gap,
         CASE WHEN MAX(ts + gap) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
              OR ts >= MAX(ts + gap) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS new_session
  FROM gapped
), sessions AS (
  SELECT user_id, ts, gap,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS session_id
  FROM marked
)
SELECT user_id,
       strftime(MIN(ts), '{US_FMT_DUCK}') AS session_start,
       strftime(MAX(ts + gap), '{US_FMT_DUCK}') AS session_end,
       COUNT(*) AS n_events
FROM sessions
GROUP BY user_id, session_id
""", tags=("events", "window", "session"))
def events_session_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a PER-EVENT inactivity gap (clicks close
    after 10 min, purchases hold the session 60 min, everything else
    30) — F.session_window with a conditional gap column, the Spark-4
    dynamic-gap surface. Each event extends the session to ts + its own
    gap; overlapping extents merge. The oracle reproduces that exactly
    with a running MAX(ts + gap) islands construction (the plain
    lag-diff trick is WRONG here: a long-gap event can bridge over a
    short-gap successor)."""
    e = load_table(spark, sf_dir, "events")
    gap = (F.when(F.col("event_type") == "click", "10 minutes")
           .when(F.col("event_type") == "purchase", "60 minutes")
           .otherwise("30 minutes"))
    return (e.groupBy(F.session_window("ts", gap).alias("s"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select("user_id",
                    F.date_format("s.start", US_FMT).alias("session_start"),
                    F.date_format("s.end", US_FMT).alias("session_end"),
                    "n_events"))


@register("events_attribution", oracle=f"""
WITH conv AS (
  SELECT user_id, ts AS c_ts, value FROM events
  WHERE event_type = 'purchase'
), touch AS (
  SELECT user_id, ts, event_type FROM events
  WHERE event_type IN ('click', 'view')
  QUALIFY row_number() OVER (PARTITION BY user_id, ts
                             ORDER BY event_id DESC) = 1
)
SELECT CASE WHEN t.ts IS NULL OR t.ts < c.c_ts - INTERVAL '24 hours'
            THEN 'direct' ELSE t.event_type END AS touch,
       COUNT(*) AS n_conversions,
       {sql_dsum('c.value')} AS attributed_revenue
FROM conv c
ASOF LEFT JOIN touch t
  ON t.user_id = c.user_id AND t.ts <= c.c_ts
GROUP BY 1 ORDER BY 1
""", tags=("events", "attribution", "asof"))
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch conversion attribution (the classic marketing-
    analytics warehouse pattern): each purchase is attributed to the
    same user's most recent click/view at-or-before it, falling back
    to 'direct' when there is none within a 24-hour lookback. Output
    is revenue and conversion counts per touch class.

    The attribution itself is the backward as-of operator keyed on
    user_id — one shuffle of each side on the user key plus a linear
    window pass, no per-user loops, no range-join explosion; the
    lookback is a post-filter CASE, not a join predicate. Touch ties
    at identical (user, ts) resolve to max event_id on both engines;
    revenue sums through the exact DECIMAL accumulator."""
    from ..operators.asof import asof_join_backward
    from ..operators.dedup import exact_dedup_keep_first

    e = load_table(spark, sf_dir, "events")
    conv = (e.filter(F.col("event_type") == "purchase")
            .select("user_id", F.col("ts").alias("c_ts"), "value"))
    touch = exact_dedup_keep_first(
        e.filter(F.col("event_type").isin("click", "view"))
        .select("user_id", F.col("ts").alias("o_ts"),
                F.col("event_type").alias("t_type"), "event_id"),
        key_cols=["user_id", "o_ts"],
        order_cols=[F.col("event_id").desc()]).drop("event_id")
    touch = touch.withColumn("t_ts", F.col("o_ts"))
    attributed = asof_join_backward(
        conv, touch, on=["user_id"], left_ts="c_ts",
        right_ts="o_ts", right_payload=["t_type", "t_ts"])
    label = (F.when(F.col("t_ts").isNull()
                    | (F.col("t_ts") < F.col("c_ts")
                       - F.expr("INTERVAL 24 HOURS")), F.lit("direct"))
             .otherwise(F.col("t_type")))
    return (attributed.select(label.alias("touch"), "value")
            .groupBy("touch")
            .agg(F.count(F.lit(1)).alias("n_conversions"),
                 dsum("value").alias("attributed_revenue"))
            .orderBy("touch"))


@register("events_attribution_linear", oracle=f"""
WITH conv AS (
  SELECT event_id AS conv_id, user_id, ts AS c_ts, value FROM events
  WHERE event_type = 'purchase'
), touch AS (
  SELECT user_id, ts AS t_ts, event_type AS t_type FROM events
  WHERE event_type IN ('click', 'view')
), m AS (
  SELECT c.conv_id, c.value, t.t_type
  FROM conv c JOIN touch t
    ON t.user_id = c.user_id
   AND t.t_ts <= c.c_ts
   AND t.t_ts >= c.c_ts - INTERVAL '24 hours'
), per_conv AS (
  SELECT conv_id, COUNT(*) AS n_t FROM m GROUP BY conv_id
), shares AS (
  SELECT m.t_type, ROUND(m.value / p.n_t, 6) AS share
  FROM m JOIN per_conv p USING (conv_id)
)
SELECT t_type AS touch, COUNT(*) AS n_touches,
       {sql_dsum('share')} AS attributed_revenue
FROM shares GROUP BY 1
UNION ALL
SELECT 'direct', COUNT(*), {sql_dsum('value')}
FROM conv WHERE conv_id NOT IN (SELECT conv_id FROM m)
""", tags=("events", "attribution", "rangejoin"))
def events_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: each purchase's value is split
    equally across ALL of the user's click/view touches in the 24-hour
    lookback (vs events_attribution's winner-takes-all last touch);
    purchases with no touch in window fall into a 'direct' bucket with
    their full value.

    The touch match is an equi join on user_id with the lookback as a
    range residual — Catalyst keeps it a hash/sort-merge join on the
    user key (the plan audit would flag a nested-loop), and the
    fan-out is bounded by touches-per-user-day. Per-conversion shares
    are rounded to 6 dp before the exact DECIMAL re-aggregation so
    both engines sum identical doubles."""
    e = load_table(spark, sf_dir, "events")
    conv = (e.filter(F.col("event_type") == "purchase")
            .select(F.col("event_id").alias("conv_id"), "user_id",
                    F.col("ts").alias("c_ts"), "value"))
    touch = (e.filter(F.col("event_type").isin("click", "view"))
             .select(F.col("user_id").alias("t_user"),
                     F.col("ts").alias("t_ts"),
                     F.col("event_type").alias("t_type")))
    m = conv.join(
        touch,
        (F.col("t_user") == F.col("user_id"))
        & (F.col("t_ts") <= F.col("c_ts"))
        & (F.col("t_ts") >= F.col("c_ts") - F.expr("INTERVAL 24 HOURS")))
    # The range join is the dominant cost and is referenced by three
    # subtrees below (shares, per-conv counts, direct anti-join);
    # Catalyst does not share common subplans, so materialize it once.
    m = m.localCheckpoint(eager=True)
    per_conv = m.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n_t"))
    shares = (m.join(per_conv, "conv_id")
              .select("t_type",
                      F.round(F.col("value") / F.col("n_t"), 6)
                      .alias("share")))
    by_type = (shares.groupBy(F.col("t_type").alias("touch"))
               .agg(F.count(F.lit(1)).alias("n_touches"),
                    dsum("share").alias("attributed_revenue")))
    direct = (conv.join(m.select("conv_id").distinct(), "conv_id",
                        "left_anti")
              .agg(F.count(F.lit(1)).alias("n_touches"),
                   dsum("value").alias("attributed_revenue"))
              .select(F.lit("direct").alias("touch"), "n_touches",
                      "attributed_revenue"))
    return by_type.unionByName(direct).orderBy("touch")


@register("events_ohlc", oracle=f"""
WITH obs AS (
  SELECT event_type, ts, value FROM events
  WHERE value IS NOT NULL
  QUALIFY row_number() OVER (PARTITION BY event_type, ts
                             ORDER BY event_id DESC) = 1
)
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       event_type,
       arg_min(value, ts) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       arg_max(value, ts) AS close,
       COUNT(*) AS n_ticks,
       {sql_dsum('value')} AS volume
FROM obs
GROUP BY 1, 2
""", tags=("events", "timeseries", "ohlc"))
def events_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candle bars (open-high-low-close + volume), daily per
    event type — the canonical financial/hypertable downsampling
    pattern. Open/close are the first/last value by timestamp inside
    the bar via min_by/max_by — a single map-side-combinable hash agg,
    no window pass, no sort: each partial carries one (ts, value)
    extremum per group, so the shuffle is |groups|-sized regardless of
    tick volume. Ties at identical (type, ts) are removed up front
    (max event_id wins, as in events_resample) so min_by/max_by are
    deterministic on both engines; volume uses the exact DECIMAL
    accumulator."""
    from ..operators.dedup import exact_dedup_keep_first

    e = load_table(spark, sf_dir, "events")
    obs = exact_dedup_keep_first(
        e.filter(F.col("value").isNotNull())
        .select("event_type", "ts", "value", "event_id"),
        key_cols=["event_type", "ts"],
        order_cols=[F.col("event_id").desc()]).drop("event_id")
    return (obs.groupBy(F.date_format(F.date_trunc("day", "ts"),
                                      "yyyy-MM-dd").alias("day"),
                        "event_type")
            .agg(F.min_by("value", "ts").alias("open"),
                 F.max("value").alias("high"),
                 F.min("value").alias("low"),
                 F.max_by("value", "ts").alias("close"),
                 F.count(F.lit(1)).alias("n_ticks"),
                 dsum("value").alias("volume")))


@register("events_twap", oracle=f"""
WITH obs AS (
  SELECT event_type, date_trunc('day', ts) AS d, ts, value FROM events
  WHERE value IS NOT NULL
), seg AS (
  SELECT event_type, d, value,
         epoch_us(COALESCE(
           lead(ts) OVER (PARTITION BY event_type, d ORDER BY ts),
           d + INTERVAL '1 day')) - epoch_us(ts) AS dur
  FROM obs
)
SELECT strftime(d, '%Y-%m-%d') AS day,
       event_type,
       ROUND(CAST(SUM(CAST(value * dur AS DECIMAL(38,6))) AS DOUBLE)
             / CAST(SUM(CAST(dur AS DECIMAL(38,6))) AS DOUBLE), 6) AS twap
FROM seg
GROUP BY 1, 2
""", tags=("events", "timeseries", "twap"))
def events_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average price per (day, event type) — the
    duration-weighted companion to events_ohlc's bars: each
    observation holds its value until the next one (or the end of the
    day for the last tick), TWAP = Σ value·duration / Σ duration.
    The fair average for irregularly-sampled series, where a plain
    AVG over-weights bursts.

    One lead() window per (type, day) partition — tick-count-bounded
    partitions, no global sort — then a hash agg. Durations are exact
    int64 microseconds and the weighted sums accumulate as
    DECIMAL(38,6) on both engines; the decimal->double cast can differ
    in the last ulp between engines (DuckDB scales an int128, Spark a
    BigDecimal), so the quotient rounds to 6 dp. Timestamps are unique per
    event_type in the fixture contract, making the lead() order total."""
    e = load_table(spark, sf_dir, "events")
    obs = (e.filter(F.col("value").isNotNull())
           .select("event_type", F.date_trunc("day", "ts").alias("d"),
                   "ts", "value"))
    w = Window.partitionBy("event_type", "d").orderBy("ts")
    nxt_us = F.coalesce(
        F.unix_micros(F.lead("ts").over(w)),
        F.unix_micros(F.col("d") + F.expr("INTERVAL 1 DAY")))
    seg = obs.select("event_type", "d", "value",
                     (nxt_us - F.unix_micros("ts")).alias("dur"))
    wide = "decimal(38,6)"  # value*dur reaches ~1e13 — past DEC's 1e12
    return (seg.groupBy(F.date_format("d", "yyyy-MM-dd").alias("day"),
                        "event_type")
            .agg(F.round(
                F.sum((F.col("value") * F.col("dur")).cast(wide))
                .cast("double")
                / F.sum(F.col("dur").cast(wide)).cast("double"), 6)
                .alias("twap")))


@register("events_funnel_time", oracle="""
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
), conv AS (
  SELECT s1.user_id,
         epoch_us(MIN(e.ts)) - epoch_us(s1.t1) AS delay_us
  FROM s1 JOIN events e
    ON e.user_id = s1.user_id AND e.event_type = 'purchase'
   AND e.ts > s1.t1 AND e.ts <= s1.t1 + INTERVAL 24 HOUR
  GROUP BY s1.user_id, s1.t1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
       ROUND(quantile_cont(CAST(delay_us AS DOUBLE), 0.25) / 1e6, 4) AS p25_s,
       ROUND(quantile_cont(CAST(delay_us AS DOUBLE), 0.50) / 1e6, 4) AS p50_s,
       ROUND(quantile_cont(CAST(delay_us AS DOUBLE), 0.75) / 1e6, 4) AS p75_s
FROM conv
""", tags=("events", "funnel"))
def events_funnel_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: for users whose first 'view' is
    followed by a 'purchase' within 24 h, the quartiles of that delay
    in seconds — the companion to events_funnel (which counts stage
    survivors; this measures how fast they move). Product analytics
    reads p50 here as the canonical conversion latency.

    Delays are exact integer microseconds (epoch_us both engines);
    the interpolated percentile runs over them and is rounded to 4 dp
    after the seconds conversion, the same parity contract as
    agg_percentile. Shape: per-user MIN (one shuffle), an event-time
    range join back to the fact on user_id (equi key + time residual,
    no BNLJ), then a global exact percentile — the only all-to-one
    step, over |converted users| values."""
    e = load_table(spark, sf_dir, "events")
    s1 = (e.where(F.col("event_type") == "view")
          .groupBy("user_id").agg(F.min("ts").alias("t1")))
    purchases = e.where(F.col("event_type") == "purchase")
    conv = (purchases.join(s1, "user_id")
            .where((F.col("ts") > F.col("t1"))
                   & (F.col("ts") <= F.col("t1")
                      + F.expr("INTERVAL 24 HOURS")))
            .groupBy("user_id", "t1")
            .agg((F.unix_micros(F.min("ts"))
                  - F.unix_micros(F.col("t1"))).alias("delay_us")))
    delay_d = F.col("delay_us").cast("double")
    return conv.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.round(F.percentile(delay_d, 0.25) / 1e6, 4).alias("p25_s"),
        F.round(F.percentile(delay_d, 0.50) / 1e6, 4).alias("p50_s"),
        F.round(F.percentile(delay_d, 0.75) / 1e6, 4).alias("p75_s"))


@register("events_streaks", oracle="""
WITH days AS (
  SELECT DISTINCT user_id, (CAST(ts AS DATE) - DATE '1970-01-01') AS x
  FROM events
),
isl AS (
  SELECT user_id, x,
         x - row_number() OVER (PARTITION BY user_id ORDER BY x) AS grp
  FROM days
),
runs AS (
  SELECT user_id, grp,
         CAST(COUNT(*) AS BIGINT) AS streak_days,
         strftime(DATE '1970-01-01' + CAST(MIN(x) AS INTEGER),
                  '%Y-%m-%d') AS streak_start
  FROM isl GROUP BY user_id, grp
),
best AS (
  SELECT user_id, streak_days, streak_start FROM runs
  QUALIFY row_number() OVER (
      PARTITION BY user_id
      ORDER BY streak_days DESC, streak_start) = 1
)
SELECT user_id, streak_days, streak_start
FROM best
ORDER BY streak_days DESC, user_id
LIMIT 20
""", tags=("events", "window", "timeseries"))
def events_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-active-day streak per user — the classic
    gaps-and-islands window pattern: day_number − row_number is
    constant exactly within a consecutive run, so one window plus one
    groupBy finds every island with no self-join and no iteration.
    The retention-adjacent "how sticky is this user" metric that
    events_active_users' fixed 7-day window can't express.

    Scale: one distinct over (user, day) — the only wide shuffle,
    partitioned by the same user key the window then uses, so the sort
    reuses the exchange — then per-user windows and one small agg. All
    integer arithmetic (epoch-day grid), deterministic ties: equal-
    length streaks resolve to the earliest start, the global top-20 to
    (streak DESC, user_id). Output: (user_id, streak_days,
    streak_start)."""
    e = load_table(spark, sf_dir, "events")
    days = (e.select("user_id",
                     F.datediff(F.to_date("ts"),
                                F.lit("1970-01-01").cast("date")).alias("x"))
            .distinct())
    w = Window.partitionBy("user_id").orderBy("x")
    isl = days.withColumn("grp", F.col("x") - F.row_number().over(w))
    runs = (isl.groupBy("user_id", "grp")
            .agg(F.count(F.lit(1)).alias("streak_days"),
                 F.date_format(
                     F.date_add(F.lit("1970-01-01").cast("date"),
                                F.min("x").cast("int")),
                     "yyyy-MM-dd").alias("streak_start")))
    bw = Window.partitionBy("user_id").orderBy(
        F.col("streak_days").desc(), "streak_start")
    best = (runs.withColumn("_rn", F.row_number().over(bw))
            .filter(F.col("_rn") == 1))
    return (best.select("user_id", "streak_days", "streak_start")
            .orderBy(F.col("streak_days").desc(), "user_id").limit(20))


#: Shared by the batch face below and streaming/jobs.py's
#: stream_pattern_match (the same semantics through the state-machine
#: path — one oracle, two execution models).
PATTERN_MATCH_ORACLE = """
WITH ev AS (SELECT user_id, ts, event_id,
                   substr(event_type, 1, 1) AS ch FROM events),
seqs AS (SELECT user_id,
                string_agg(ch, '' ORDER BY ts, event_id) AS seq,
                COUNT(*) AS n_events
         FROM ev GROUP BY user_id),
m AS (SELECT user_id, n_events,
             CAST((length(seq) - length(replace(seq, 'vcp', ''))) / 3
                  AS BIGINT) AS n_vcp,
             CAST(list_max(list_transform(
                      regexp_split_to_array(seq, '[^e]'),
                      x -> length(x))) AS BIGINT) AS max_err_run,
             regexp_matches(seq, 'v.*c.*p') AS converted
      FROM seqs)
SELECT user_id, CAST(n_events AS BIGINT) AS n_events, n_vcp,
       max_err_run, converted
FROM m ORDER BY user_id
"""


@register("events_pattern_match", oracle=PATTERN_MATCH_ORACLE,
          tags=("events", "pattern"))
def events_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-sequence pattern matching (the MATCH_RECOGNIZE use case,
    emulated relationally) — ORACLE-BACKED: each user's events
    collapse to a character sequence ordered by (ts, event_id), and
    the patterns run as string algebra so both engines compute
    EXACT integers: strictly-consecutive view→click→purchase count
    via the replace-length identity ((len - len(replace(seq,'vcp',
    '')))/3 — no regex counting, whose engines disagree on overlap
    semantics), longest consecutive-error run via split-on-[^e] +
    max length, and the loose v.*c.*p subsequence flag (the funnel
    events_funnel counts with range joins, here as one regex).

    Scale shape: one groupBy collect per user (the sequence), then
    pure per-row string expressions — no self-joins, no windows. The
    per-key sequence length is the skew dial: at 100 TB you bound it
    by sessionizing first (events_sessionize) and matching within
    sessions; the operator is unchanged, only the grouping key
    widens. A power-key guard is the same cap discipline as
    dedup's hot-shingle cutoffs."""
    e = load_table(spark, sf_dir, "events")
    ev = e.select("user_id",
                  F.struct(F.col("ts"), F.col("event_id"),
                           F.substring("event_type", 1, 1).alias("ch"))
                  .alias("s"))
    seqs = (ev.groupBy("user_id")
            .agg(F.concat_ws(
                     "", F.transform(F.array_sort(F.collect_list("s")),
                                     lambda x: x["ch"])).alias("seq"),
                 F.count(F.lit(1)).alias("n_events")))
    m = seqs.select(
        "user_id", F.col("n_events").cast("long").alias("n_events"),
        F.expr("CAST((length(seq) - length(replace(seq, 'vcp', ''))) / 3 "
               "AS BIGINT)").alias("n_vcp"),
        F.expr("CAST(array_max(transform(split(seq, '[^e]'), "
               "x -> length(x))) AS BIGINT)").alias("max_err_run"),
        F.col("seq").rlike("v.*c.*p").alias("converted"))
    return m.orderBy("user_id")
