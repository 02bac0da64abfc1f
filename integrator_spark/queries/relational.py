"""Projection/filter/conditional, join variants, and set operations
(SURVEY.md §2.2, §2.3, §2.7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.num import dsum, sql_dsum
from ..io import load_table
from ..operators.asof import asof_join_backward
from ..registry import register

TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"


@register("proj_distinct", oracle="""
SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
""", tags=("projection",))
def proj_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row dedup over a projection (distinct shuffle with partial combine)."""
    return (load_table(spark, sf_dir, "orders")
            .select("o_orderstatus", "o_orderpriority")
            .distinct())


@register("case_bucketize", oracle=f"""
SELECT
  CASE WHEN o_totalprice < 50000 THEN 'low'
       WHEN o_totalprice < 150000 THEN 'mid'
       ELSE 'high' END AS bucket,
  COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING_MASKED') AS status_norm,
  COUNT(*) AS n_orders,
  {sql_dsum('o_totalprice')} AS total
FROM orders
GROUP BY 1, 2
""", tags=("projection",))
def case_bucketize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / coalesce / nullif conditional expressions."""
    o = load_table(spark, sf_dir, "orders")
    bucket = (F.when(F.col("o_totalprice") < 50000, "low")
              .when(F.col("o_totalprice") < 150000, "mid")
              .otherwise("high"))
    status_norm = F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")),
                             F.lit("PENDING_MASKED"))
    return (o.select(bucket.alias("bucket"), status_norm.alias("status_norm"),
                     "o_totalprice")
            .groupBy("bucket", "status_norm")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 dsum("o_totalprice").alias("total")))


# --- join variants -------------------------------------------------------

@register("join_outer", oracle=f"""
SELECT c_custkey,
       COUNT(o_orderkey) AS n_orders,
       {sql_dsum('COALESCE(o_totalprice, 0)')} AS total_spent
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
""", tags=("join",))
def join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with genuine null-extension (customers w/o orders)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (c.join(o, c.c_custkey == o.o_custkey, "left")
            .groupBy("c_custkey")
            .agg(F.count("o_orderkey").alias("n_orders"),
                 dsum(F.coalesce(F.col("o_totalprice"), F.lit(0))).alias("total_spent")))


@register("join_full", oracle="""
WITH cn AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust
            FROM customer WHERE c_acctbal < 0 GROUP BY 1),
     sn AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp
            FROM supplier WHERE s_acctbal < 0 GROUP BY 1)
SELECT COALESCE(cn.nk, sn.nk) AS nationkey,
       COALESCE(n_cust, 0) AS n_cust,
       COALESCE(n_supp, 0) AS n_supp
FROM cn FULL OUTER JOIN sn ON cn.nk = sn.nk
""", tags=("join",))
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join — both sides null-extend (per-nation debtors)."""
    c = (load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") < 0)
         .groupBy(F.col("c_nationkey").alias("nk_c"))
         .agg(F.count(F.lit(1)).alias("n_cust")))
    s = (load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
         .groupBy(F.col("s_nationkey").alias("nk_s"))
         .agg(F.count(F.lit(1)).alias("n_supp")))
    return (c.join(s, c.nk_c == s.nk_s, "full")
            .select(F.coalesce("nk_c", "nk_s").alias("nationkey"),
                    F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
                    F.coalesce("n_supp", F.lit(0)).alias("n_supp")))


@register("join_semi", oracle="""
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
""", tags=("join",))
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: existence filter, no right columns, no row blowup."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (c.join(o, c.c_custkey == o.o_custkey, "left_semi")
            .select("c_custkey", "c_name", "c_mktsegment"))


@register("join_anti", oracle="""
SELECT c_custkey, c_name, c_acctbal
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
""", tags=("join",))
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no urgent orders (the urgent-only
    filter keeps the result non-empty at every scale factor — an
    unfiltered variant is vacuously empty at sf>=0.01)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (c.join(o, c.c_custkey == o.o_custkey, "left_anti")
            .select("c_custkey", "c_name", "c_acctbal"))


@register("join_interval", oracle="""
WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
     c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
SELECT p.event_id, p.user_id, COUNT(c.ts) AS n_clicks_within_1h
FROM p LEFT JOIN c
  ON p.user_id = c.user_id
 AND c.ts >= p.ts AND c.ts < p.ts + INTERVAL 1 HOUR
GROUP BY p.event_id, p.user_id
""", tags=("join", "range"))
def join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/range join: equi key (user) + time-range predicate.

    Scale posture: the equi component keeps this a hash/sort-merge join
    on user_id with the range as a residual predicate — never a
    nested-loop over the full cross product.
    """
    e = load_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "event_id", F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"))
    c = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
    cond = ((F.col("p_user") == F.col("c_user"))
            & (F.col("c_ts") >= F.col("p_ts"))
            & (F.col("c_ts") < F.col("p_ts") + F.expr("INTERVAL 1 HOUR")))
    return (p.join(c, cond, "left")
            .groupBy(F.col("event_id"), F.col("p_user").alias("user_id"))
            .agg(F.count("c_ts").alias("n_clicks_within_1h")))


@register("join_asof", oracle=f"""
WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
     v AS (SELECT user_id, ts, MAX(value) AS v_value
           FROM events WHERE event_type = 'view' GROUP BY user_id, ts)
SELECT p.event_id, p.user_id,
       strftime(p.ts, '{TS_FMT_DUCK}') AS p_ts,
       strftime(v.ts, '{TS_FMT_DUCK}') AS v_ts,
       v.v_value
FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.ts <= p.ts
""", tags=("join", "asof"))
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: latest 'view' at or before each 'purchase' per user.

    Implemented via union + forward-fill window (operators/asof.py) —
    one shuffle per side, linear scan, no native primitive needed.
    """
    e = load_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    v = (e.filter(F.col("event_type") == "view")
         .groupBy("user_id", F.col("ts").alias("v_ts_raw"))
         .agg(F.max("value").alias("v_value"))
         .select("user_id", F.col("v_ts_raw").alias("v_ts"), "v_value"))
    joined = asof_join_backward(p, v, on=["user_id"], left_ts="ts",
                                right_ts="v_ts", right_payload=["v_ts", "v_value"])
    return joined.select(
        "event_id", "user_id",
        F.date_format("ts", TS_FMT).alias("p_ts"),
        F.date_format("v_ts", TS_FMT).alias("v_ts"),
        "v_value",
    )


# --- set operations ------------------------------------------------------

_SETOP_A = "SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'"
_SETOP_B = "SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'"


def _setop_sides(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    b = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    return a, b


@register("setop_union", oracle=f"{_SETOP_A} UNION ALL {_SETOP_B}", tags=("setop",))
def setop_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL — bag concatenation, duplicates preserved (no shuffle)."""
    a, b = _setop_sides(spark, sf_dir)
    return a.unionByName(b)


@register("setop_union_distinct", oracle=f"{_SETOP_A} UNION {_SETOP_B}", tags=("setop",))
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) — set union."""
    a, b = _setop_sides(spark, sf_dir)
    return a.unionByName(b).distinct()


@register("setop_intersect", oracle=f"{_SETOP_A} INTERSECT ALL {_SETOP_B}", tags=("setop",))
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — bag intersection (min multiplicity per value)."""
    a, b = _setop_sides(spark, sf_dir)
    return a.intersectAll(b)


@register("setop_except", oracle=f"{_SETOP_A} EXCEPT ALL {_SETOP_B}", tags=("setop",))
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag difference (multiplicity-subtracting)."""
    a, b = _setop_sides(spark, sf_dir)
    return a.exceptAll(b)


@register("sort_nulls", oracle="""
WITH j AS (
  SELECT c_custkey, c_name,
         CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal_masked
  FROM customer WHERE c_custkey % 10 = 0
)
SELECT c_custkey, c_name, bal_masked,
       CAST(row_number() OVER (ORDER BY bal_masked ASC NULLS FIRST, c_custkey)
            AS BIGINT) AS pos_nulls_first,
       CAST(row_number() OVER (ORDER BY bal_masked DESC NULLS LAST, c_custkey)
            AS BIGINT) AS pos_nulls_last
FROM j
""", tags=("sort",))
def sort_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sort with explicit null placement. An order-insensitive
    value hash can't see row order, so the two total orders
    (asc-nulls-first / desc-nulls-last) are materialized as rank
    columns — any placement difference between engines changes values."""
    from pyspark.sql import Window

    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 10 == 0)
    masked = F.when(F.col("c_acctbal") < 0, None).otherwise(F.col("c_acctbal"))
    j = c.select("c_custkey", "c_name", masked.alias("bal_masked"))
    w1 = Window.orderBy(F.col("bal_masked").asc_nulls_first(), F.col("c_custkey"))
    w2 = Window.orderBy(F.col("bal_masked").desc_nulls_last(), F.col("c_custkey"))
    return (j.select("c_custkey", "c_name", "bal_masked",
                     F.row_number().over(w1).cast("long").alias("pos_nulls_first"),
                     F.row_number().over(w2).cast("long").alias("pos_nulls_last"))
            .orderBy("pos_nulls_first"))
