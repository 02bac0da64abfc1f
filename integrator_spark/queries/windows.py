"""Window functions (SURVEY.md §2.5): ranking/top-k per group, analytic
lag/lead, frame aggregates (running + moving).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.num import DEC
from ..io import load_table
from ..registry import register

TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"


@register("window_topn", oracle="""
SELECT o_orderpriority, o_orderkey, o_totalprice,
       CAST(rn AS BIGINT) AS rn, CAST(rk AS BIGINT) AS rk,
       CAST(drk AS BIGINT) AS drk
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER w AS rn,
         rank()       OVER w AS rk,
         dense_rank() OVER w AS drk
  FROM orders
  WINDOW w AS (PARTITION BY o_orderpriority
               ORDER BY o_totalprice DESC, o_orderkey)
) WHERE rn <= 20
""", tags=("window",))
def window_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 orders per priority with row_number/rank/dense_rank.

    The orderkey tie-break makes row_number deterministic; rank and
    dense_rank are exercised on the same window.
    """
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (o.select("o_orderpriority", "o_orderkey", "o_totalprice",
                     F.row_number().over(w).cast("long").alias("rn"),
                     F.rank().over(w).cast("long").alias("rk"),
                     F.dense_rank().over(w).cast("long").alias("drk"))
            .filter(F.col("rn") <= 20))


@register("window_lag", oracle=f"""
SELECT event_id, user_id, value,
       lag(value)  OVER w AS prev_value,
       lead(value) OVER w AS next_value,
       first_value(value) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS first_val
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""", tags=("window",))
def window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic lag/lead/first over a per-user event timeline."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return e.select(
        "event_id", "user_id", "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.first("value").over(wf).alias("first_val"),
    )


@register("window_running", oracle=f"""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER w_run AS DOUBLE)
         AS running_total,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER w_mov AS DOUBLE)
         / COUNT(*) OVER w_mov AS moving_avg3
FROM orders
WINDOW
  w_run AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
  w_mov AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
""", tags=("window", "frame"))
def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame aggregates: running total + 3-row moving average per customer
    (decimal-exact sums keep the frames bit-deterministic)."""
    o = load_table(spark, sf_dir, "orders")
    order = [F.col("o_orderdate"), F.col("o_orderkey")]
    w_run = (Window.partitionBy("o_custkey").orderBy(*order)
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_mov = (Window.partitionBy("o_custkey").orderBy(*order)
             .rowsBetween(-2, Window.currentRow))
    dec_price = F.col("o_totalprice").cast(DEC)
    return o.select(
        "o_custkey", "o_orderkey",
        F.sum(dec_price).over(w_run).cast("double").alias("running_total"),
        (F.sum(dec_price).over(w_mov).cast("double")
         / F.count(F.lit(1)).over(w_mov)).alias("moving_avg3"),
    )


@register("window_range_frame", oracle="""
SELECT o_orderkey, o_orderpriority, o_totalprice,
       COUNT(*) OVER (PARTITION BY o_orderpriority
                      ORDER BY o_totalprice
                      RANGE BETWEEN 5000 PRECEDING AND CURRENT ROW)
         AS n_within_5k_below
FROM orders
WHERE o_orderkey % 25 = 0
""", tags=("window", "frame", "range"))
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-bounded frame (value-based, not row-based): how many
    orders in the same priority fall within 5000 below the current
    price. Well-defined under duplicate order keys because RANGE frames
    depend only on the ordering value."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 25 == 0)
    w = (Window.partitionBy("o_orderpriority")
         .orderBy("o_totalprice")
         .rangeBetween(-5000, Window.currentRow))
    return o.select("o_orderkey", "o_orderpriority", "o_totalprice",
                    F.count(F.lit(1)).over(w).alias("n_within_5k_below"))


@register("window_time_range", oracle="""
SELECT event_id, user_id,
       COUNT(*) OVER w AS n_1h,
       CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE) AS sum_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
""", tags=("window", "frame", "time"))
def window_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval RANGE frame: per-user trailing-hour event count and
    decimal-exact value sum — the sliding-window feature shape (events
    in the last hour before each event) that tumbling windows cannot
    express. Spark range frames need a numeric ordering, so the frame
    orders on epoch microseconds with a [-3.6e9, 0] bound — exactly the
    inclusive [ts - 1h, ts] interval the oracle's RANGE INTERVAL frame
    defines (ties share the frame in both engines). One shuffle on
    user_id; state per row is the frame aggregate, not the row set."""
    e = load_table(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id")
         .orderBy(F.unix_micros("ts"))
         .rangeBetween(-3_600_000_000, 0))
    return e.select(
        "event_id", "user_id",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.sum(F.col("value").cast(DEC)).over(w).cast("double").alias("sum_1h"))


@register("window_ewma", oracle="""
WITH lagged AS (
  SELECT user_id, event_id, ts, value,
         lag(value, 1) OVER w AS v1,
         lag(value, 2) OVER w AS v2,
         lag(value, 3) OVER w AS v3,
         lag(value, 4) OVER w AS v4
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, event_id,
       ROUND((value
              + 0.5 * COALESCE(v1, 0)
              + 0.25 * COALESCE(v2, 0)
              + 0.125 * COALESCE(v3, 0)
              + 0.0625 * COALESCE(v4, 0))
             / (1 + 0.5 * (CASE WHEN v1 IS NULL THEN 0 ELSE 1 END)
                  + 0.25 * (CASE WHEN v2 IS NULL THEN 0 ELSE 1 END)
                  + 0.125 * (CASE WHEN v3 IS NULL THEN 0 ELSE 1 END)
                  + 0.0625 * (CASE WHEN v4 IS NULL THEN 0 ELSE 1 END)),
             6) AS ewma5
FROM lagged
""", tags=("window", "ewma"))
def window_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated exponentially-weighted moving average (decay 0.5 over
    the trailing 5 events per user) built from explicit lag() taps with
    per-row renormalization at sequence starts — the smoothed-feature
    shape for telemetry/training features. Fixed taps keep the weights
    exact powers of two, so the arithmetic is bit-identical across
    engines with only a display rounding; one window shuffle on
    user_id. (An unbounded EWMA is inherently sequential — that
    variant belongs in applyInPandas, cf. stream_stateful.)"""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    taps = [(F.col("value"), F.lit(1.0))]
    for i, wgt in ((1, 0.5), (2, 0.25), (3, 0.125), (4, 0.0625)):
        taps.append((F.lag("value", i).over(w), F.lit(wgt)))
    num = sum((F.coalesce(v, F.lit(0.0)) * wt for v, wt in taps),
              F.lit(0.0))
    den = sum((F.when(v.isNull(), 0.0).otherwise(wt) for v, wt in taps),
              F.lit(0.0))
    return e.select("user_id", "event_id",
                    F.round(num / den, 6).alias("ewma5"))


@register("window_distinct_count", oracle="""
SELECT event_id, user_id,
       CAST(COUNT(DISTINCT event_type) OVER w AS BIGINT)
         AS n_types_so_far
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING)
""", tags=("window", "distinct"))
def window_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct count over a running window — a feature Spark's window
    functions reject outright (COUNT(DISTINCT ...) OVER is unsupported)
    but a training-feature pipeline wants constantly ("how many event
    types has this user produced so far"). Expressed as
    size(collect_set(...)) over the frame: same semantics, one window
    pass, set state bounded by the type cardinality (5 here — never
    use this for high-cardinality columns; sketch it instead)."""
    e = load_table(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return e.select(
        "event_id", "user_id",
        F.size(F.collect_set("event_type").over(w)).cast("long")
         .alias("n_types_so_far"))


@register("window_regression", oracle="""
WITH daily AS (
  SELECT datediff('day', DATE '2024-01-01', date_trunc('day', ts)) AS x,
         CAST(ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
                    / COUNT(*), 6) AS DECIMAL(38,6)) AS y_dec
  FROM events GROUP BY x
), rolled AS (
  SELECT x, y_dec,
         CAST(COUNT(*) OVER w AS BIGINT) AS n,
         CAST(SUM(x) OVER w AS BIGINT) AS sx,
         CAST(SUM(x * x) OVER w AS BIGINT) AS sx2,
         SUM(y_dec) OVER w AS sy,
         SUM(x * y_dec) OVER w AS sxy
  FROM daily
  WINDOW w AS (ORDER BY x ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT x AS day_index,
       ROUND(CAST(y_dec AS DOUBLE), 6) AS daily_mean,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sx2 - sx * sx AS DOUBLE), 6) AS slope_7d
FROM rolled WHERE n >= 3
""", tags=("window", "regression"))
def window_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day least-squares trend slope of the daily mean —
    "is the metric drifting up or down this week" as a continuous
    window statistic, the regression companion to window_ewma
    (smoothing) and events_cusum (level shifts).

    Slope comes from the closed form (n*Sxy - Sx*Sy)/(n*Sx2 - Sx^2)
    where x is the integer day index and y the 6-dp-rounded daily mean
    held as DECIMAL: every windowed sum is integer- or decimal-exact
    (no FP accumulation-order hazard in the sliding frames), and the
    single double division at the end rounds on identical operands.

    Shape: one map-side-combinable agg to |days| rows, then bounded
    7-row sliding frames over that tiny series. First two days are
    dropped (n < 3: a 2-point slope is noise, and n=1 would divide by
    zero)."""
    e = load_table(spark, sf_dir, "events")
    daily = (e.groupBy(F.datediff(F.date_trunc("day", "ts"),
                                  F.lit("2024-01-01").cast("date"))
                       .cast("long").alias("x"))
             .agg(F.round(F.sum(F.col("value").cast("decimal(38,6)"))
                          .cast("double") / F.count(F.lit(1)), 6)
                  .cast("decimal(38,6)").alias("y_dec")))
    w = Window.orderBy("x").rowsBetween(-6, Window.currentRow)
    rolled = daily.select(
        "x", "y_dec",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sx2"),
        F.sum("y_dec").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("y_dec")).over(w).alias("sxy"))
    n, sx, sx2, sy, sxy = (F.col(c) for c in ("n", "sx", "sx2", "sy", "sxy"))
    return (rolled.where(n >= 3)
            .select(F.col("x").alias("day_index"),
                    F.round(F.col("y_dec").cast("double"), 6)
                     .alias("daily_mean"),
                    F.round((n * sxy - sx * sy).cast("double")
                            / (n * sx2 - sx * sx).cast("double"), 6)
                     .alias("slope_7d")))


@register("window_first_last", oracle="""
SELECT event_id, user_id,
       first_value(value) OVER w AS first_val,
       last_value(value) OVER w AS last_val,
       first_value(CASE WHEN value > 100 THEN value END IGNORE NULLS)
         OVER w AS first_big
FROM events
WHERE user_id % 7 = 0
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""", tags=("window", "analytic"))
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value over the full partition frame, plus the
    IGNORE NULLS variant (first event over the threshold) — the
    session-attribute pattern ("stamp every row with the user's entry
    and exit readings"). The frame is explicitly UNBOUNDED ... UNBOUNDED:
    last_value over the DEFAULT frame (which ends at CURRENT ROW) is
    the classic silent-wrong-answer, so the full frame is spelled out
    on both engines. Ordering ties broken by event_id.

    Whole-frame analytics over partition-keyed windows — shuffles once
    on user_id, no single-partition step."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id") % 7 == 0)
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    big = F.when(F.col("value") > 100, F.col("value"))
    return e.select(
        "event_id", "user_id",
        F.first("value").over(w).alias("first_val"),
        F.last("value").over(w).alias("last_val"),
        F.first(big, ignorenulls=True).over(w).alias("first_big"))
