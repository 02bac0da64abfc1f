"""TPC-H pattern completion — the six queries whose spec columns the
fixture lacks (``partsupp``, ``l_commitdate``/``l_receiptdate``,
comment/phone/address fields), re-expressed in spirit over the columns
that DO exist (TESTDATA.md schemas). Together with tpch.py this covers
all 22 TPC-H query *patterns*:

- q2  — correlated-min subquery (cheapest supplier per part)
- q9  — multi-fact profit join grouped by nation x year
- q11 — global-scalar threshold over a grouped aggregate
- q16 — grouped distinct-count with a NOT-IN supplier exclusion
- q20 — nested aggregate share filter feeding a semi-join chain
- q21 — double EXISTS / NOT-EXISTS self-join on the fact table

Every adaptation is documented on the query; the *relational shape*
(and therefore the physical plan class Spark must produce at 100 TB)
matches the spec query, which is what SURVEY.md §2 tracks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.num import dsum, sql_dsum
from ..io import load_table
from ..registry import register


def _region_suppliers(spark: SparkSession, sf_dir: str,
                      regions: tuple[str, ...]) -> DataFrame:
    """supplier ⨝ nation ⨝ region filtered to ``regions`` — a tiny
    dimension (|supplier| rows max), always broadcast."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
            .join(F.broadcast(r.filter(F.col("r_name").isin(*regions))),
                  F.col("n_regionkey") == F.col("r_regionkey"))
            .select("s_suppkey", "s_name", "s_acctbal", "n_name"))


Q2_ORACLE = """
WITH cost AS (
  SELECT l_partkey, l_suppkey,
         MIN(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
), euro AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
), ranked AS (
  SELECT p_partkey, p_name, s_name, s_acctbal, n_name, unit_cost,
         ROW_NUMBER() OVER (PARTITION BY p_partkey
                            ORDER BY unit_cost, s_suppkey) AS rn
  FROM part JOIN cost ON p_partkey = l_partkey
            JOIN euro ON l_suppkey = s_suppkey
  WHERE p_type = 'ECONOMY' AND p_size <= 25
)
SELECT p_partkey, p_name, s_name, s_acctbal, n_name,
       ROUND(unit_cost, 6) AS unit_cost
FROM ranked WHERE rn = 1
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
"""


@register("q2_min_cost_supplier", oracle=Q2_ORACLE,
          tags=("tpch", "subquery", "window"))
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 in spirit (minimum-cost supplier): for each ECONOMY
    part of size <= 25, the EUROPE supplier offering it cheapest.
    The fixture has no ``partsupp``, so the observed minimum unit price
    ``min(l_extendedprice / l_quantity)`` per (part, supplier) stands in
    for ``ps_supplycost``; the spec's correlated MIN subquery becomes a
    ROW_NUMBER window over the part key — the scale-correct rewrite
    (one shuffle on l_partkey instead of a per-row probe).

    Exactness: the double division is IEEE-identical cross-engine, MIN
    is order-independent, and the deterministic (cost, suppkey)
    tie-break pins one row per part.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cost = (li.groupBy("l_partkey", "l_suppkey")
            .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity"))
                 .alias("unit_cost")))
    euro = _region_suppliers(spark, sf_dir, ("EUROPE",))
    parts = p.filter((F.col("p_type") == "ECONOMY") & (F.col("p_size") <= 25))
    w = Window.partitionBy("p_partkey").orderBy("unit_cost", "s_suppkey")
    return (parts.join(cost, F.col("p_partkey") == F.col("l_partkey"))
            .join(F.broadcast(euro), F.col("l_suppkey") == F.col("s_suppkey"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("p_partkey", "p_name", "s_name", "s_acctbal", "n_name",
                    F.round("unit_cost", 6).alias("unit_cost"))
            .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name",
                     "p_partkey"))


_PROFIT = ("l_extendedprice * (1 - l_discount) "
           "- 0.5 * p_retailprice * l_quantity")

Q9_ORACLE = f"""
SELECT n_name, CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
       {sql_dsum(_PROFIT)} AS sum_profit
FROM lineitem
  JOIN part     ON p_partkey  = l_partkey
  JOIN supplier ON s_suppkey  = l_suppkey
  JOIN nation   ON n_nationkey = s_nationkey
  JOIN orders   ON o_orderkey = l_orderkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, YEAR(o_orderdate)
ORDER BY n_name, o_year DESC
"""


@register("q9_product_profit", oracle=Q9_ORACLE, tags=("tpch", "join"))
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 in spirit (product-type profit): per supplier nation
    and order year, total profit on parts whose name contains 'red'.
    No ``partsupp`` in the fixture, so modeled unit cost
    ``0.5 * p_retailprice`` stands in for ``ps_supplycost``; the shape
    is unchanged — a 5-way star join (lineitem fact, three broadcast
    dims, one fact-fact join on orderkey) feeding a (nation, year)
    aggregate.

    Profit can be negative, so the exact sum takes the decimal
    accumulator (``dsum``), never the non-negative grid shortcut.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    profit = (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
              - F.lit(0.5) * F.col("p_retailprice") * F.col("l_quantity"))
    return (li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
            .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
            .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
            .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("n_name", F.year("o_orderdate").cast("long").alias("o_year"))
            .agg(dsum(profit).alias("sum_profit"))
            .orderBy("n_name", F.col("o_year").desc()))


Q11_FRACTION = 0.001

Q11_ORACLE = f"""
WITH euro AS (
  SELECT s_suppkey FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
), value_by_part AS (
  SELECT l_partkey, {sql_dsum('l_extendedprice')} AS part_value
  FROM lineitem JOIN euro ON l_suppkey = s_suppkey
  GROUP BY l_partkey
)
SELECT l_partkey AS p_partkey, part_value
FROM value_by_part,
     (SELECT SUM(part_value) * {Q11_FRACTION} AS cutoff FROM value_by_part)
WHERE part_value > cutoff
ORDER BY part_value DESC, p_partkey
"""


@register("q11_important_parts", oracle=Q11_ORACLE,
          tags=("tpch", "subquery", "agg"))
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 in spirit (important stock): parts whose EUROPE-supplied
    traded value exceeds a fixed fraction of the total. ``partsupp``'s
    ``supplycost * availqty`` is replaced by summed ``l_extendedprice``
    from EUROPE suppliers; the shape is the spec's: a grouped aggregate
    compared against a *global* scalar aggregate of itself — the scalar
    is computed once and broadcast into the filter, never re-evaluated
    per row. The cutoff multiplication happens identically (double *
    literal) in both engines; part values are exact decimal-path sums.
    """
    li = load_table(spark, sf_dir, "lineitem")
    euro = _region_suppliers(spark, sf_dir, ("EUROPE",)).select("s_suppkey")
    by_part = (li.join(F.broadcast(euro),
                       F.col("l_suppkey") == F.col("s_suppkey"))
               .groupBy(F.col("l_partkey").alias("p_partkey"))
               .agg(dsum("l_extendedprice").alias("part_value")))
    cutoff = by_part.agg((F.sum("part_value") * Q11_FRACTION).alias("cutoff"))
    return (by_part.join(F.broadcast(cutoff))
            .filter(F.col("part_value") > F.col("cutoff"))
            .select("p_partkey", "part_value")
            .orderBy(F.col("part_value").desc(), "p_partkey"))


Q16_SIZES = (1, 4, 7, 10, 15, 20, 25, 30)

Q16_ORACLE = f"""
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
  JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type <> 'ECONOMY'
  AND p_size IN {Q16_SIZES}
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                        WHERE s_acctbal < 2000.0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


@register("q16_supplier_part_types", oracle=Q16_ORACLE,
          tags=("tpch", "anti", "agg"))
def q16_supplier_part_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 in spirit (parts/supplier relationship): distinct
    supplier count per (brand, type, size) bucket, excluding one brand,
    one type, off-list sizes, and a blocklisted supplier set. The
    fixture's (l_partkey, l_suppkey) distinct pairs stand in for
    ``partsupp``; low-balance suppliers (s_acctbal < 2000) stand in for
    the spec's complaint-comment exclusion. The NOT IN becomes a LEFT
    ANTI broadcast join — at 100 TB the blocklist is dimension-sized
    while the pair relation is fact-sized, so the anti probe must be on
    the fact side with the list broadcast, which this plan pins.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    bad = (load_table(spark, sf_dir, "supplier")
           .filter(F.col("s_acctbal") < 2000.0).select("s_suppkey"))
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    parts = p.filter((F.col("p_brand") != "Brand#1")
                     & (F.col("p_type") != "ECONOMY")
                     & (F.col("p_size").isin(*Q16_SIZES)))
    return (pairs.join(F.broadcast(bad),
                       F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
            .join(F.broadcast(parts), F.col("p_partkey") == F.col("l_partkey"))
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
            .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type",
                     "p_size"))


Q20_SHARE = 0.3

Q20_ORACLE = f"""
WITH y99 AS (
  SELECT l_partkey, l_suppkey, l_quantity FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '2000-01-01 00:00:00'
), per_ps AS (
  SELECT l_partkey, l_suppkey, {sql_dsum('l_quantity')} AS ps_qty
  FROM y99 GROUP BY l_partkey, l_suppkey
), per_p AS (
  SELECT l_partkey, {sql_dsum('l_quantity')} AS p_qty
  FROM y99 GROUP BY l_partkey
), dominant AS (
  SELECT DISTINCT ps.l_suppkey
  FROM per_ps ps
    JOIN per_p pp ON ps.l_partkey = pp.l_partkey
    JOIN part   ON p_partkey = ps.l_partkey
  WHERE p_name LIKE '%bolt%' AND ps.ps_qty > {Q20_SHARE} * pp.p_qty
)
SELECT s_suppkey, s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
  AND s_suppkey IN (SELECT l_suppkey FROM dominant)
ORDER BY s_name
"""


@register("q20_dominant_suppliers", oracle=Q20_ORACLE,
          tags=("tpch", "semi", "subquery"))
def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 in spirit (potential part promotion): EUROPE suppliers
    that shipped more than 30% of a 'bolt' part's total 1999 quantity.
    ``ps_availqty > 0.5 * shipped`` becomes a shipped-share test (the
    fixture has no stock column); the nested-aggregate-share filter
    feeding an IN semi-join — the pattern Q20 exists to exercise — is
    intact. Both quantity sums reuse the SAME year-filtered scan
    (Spark plans it once per branch with the pushed date filter), and
    the final IN is a LEFT SEMI join against the dimension-sized
    supplier table. Exact: grid-valued quantities through the decimal
    sum; the share comparison multiplies identically in both engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    y99 = (li.filter((F.col("l_shipdate") >= F.to_timestamp(F.lit("1999-01-01")))
                     & (F.col("l_shipdate") < F.to_timestamp(F.lit("2000-01-01"))))
           .select("l_partkey", "l_suppkey", "l_quantity"))
    per_ps = (y99.groupBy("l_partkey", "l_suppkey")
              .agg(dsum("l_quantity").alias("ps_qty")))
    per_p = (y99.groupBy(F.col("l_partkey").alias("_pk"))
             .agg(dsum("l_quantity").alias("p_qty")))
    bolts = p.filter(F.col("p_name").like("%bolt%")).select("p_partkey")
    dominant = (per_ps.join(per_p, F.col("l_partkey") == F.col("_pk"))
                .join(F.broadcast(bolts),
                      F.col("l_partkey") == F.col("p_partkey"))
                .filter(F.col("ps_qty") > F.lit(Q20_SHARE) * F.col("p_qty"))
                .select("l_suppkey").distinct())
    euro = _region_suppliers(spark, sf_dir, ("EUROPE",))
    return (euro.join(dominant, F.col("s_suppkey") == F.col("l_suppkey"),
                      "left_semi")
            .select("s_suppkey", "s_name", "n_name")
            .orderBy("s_name"))


Q21_LATE_DAYS = 60

Q21_ORACLE = f"""
SELECT s_name, COUNT(*) AS numwait
FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  JOIN lineitem l1 ON l1.l_suppkey = s_suppkey
  JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE r_name IN ('ASIA', 'EUROPE')
  AND o.o_orderstatus = 'F'
  AND date_diff('day', o.o_orderdate, l1.l_shipdate) > {Q21_LATE_DAYS}
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND date_diff('day', o.o_orderdate, l3.l_shipdate)
                        > {Q21_LATE_DAYS})
GROUP BY s_name
ORDER BY numwait DESC, s_name
"""


@register("q21_waiting_suppliers", oracle=Q21_ORACLE,
          tags=("tpch", "exists", "join"))
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 in spirit (suppliers who kept orders waiting): per
    ASIA/EUROPE supplier, late lines (shipped > 60 days after the
    order date — the fixture has no commit/receipt dates) on finished
    multi-supplier orders where it was the ONLY late supplier.

    The spec's correlated EXISTS / NOT-EXISTS pair (oracle above) is
    rewritten as one per-order aggregate — ``n_supp > 1`` ≡ EXISTS
    another supplier's line, ``n_late_supp = 1`` ≡ NOT EXISTS another
    late supplier (l1 itself is late) — then a single equi-join back to
    the late lines. At 100 TB this is the only viable plan: two
    correlated probes over the fact table become one extra aggregation
    on the key the join already shuffles on.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = (load_table(spark, sf_dir, "orders")
         .filter(F.col("o_orderstatus") == "F")
         .select("o_orderkey", "o_orderdate"))
    supp = _region_suppliers(spark, sf_dir, ("ASIA", "EUROPE"))
    lines = (li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
             .withColumn("_late", F.datediff("l_shipdate", "o_orderdate")
                         > Q21_LATE_DAYS))
    stats = (lines.groupBy(F.col("l_orderkey").alias("_ok"))
             .agg(F.countDistinct("l_suppkey").alias("n_supp"),
                  F.countDistinct(F.when(F.col("_late"), F.col("l_suppkey")))
                  .alias("n_late_supp"))
             .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
             .select("_ok"))
    return (lines.filter(F.col("_late"))
            .join(stats, F.col("l_orderkey") == F.col("_ok"))
            .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
            .groupBy("s_name")
            .agg(F.count(F.lit(1)).alias("numwait"))
            .orderBy(F.col("numwait").desc(), "s_name"))
