"""TPC-H-style analytical queries (SURVEY.md §2.2-2.6 'bench ✓' rows).

These exercise the engine's core relational path: parquet scan with
predicate pushdown, multi-measure hash aggregation, multi-way equi
joins (Catalyst picks broadcast-hash for the small dimensions), top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.num import DEC, davg, dsum, dsum_money, sql_davg, sql_dsum
from ..io import load_table, table_bytes
from ..registry import register


def _msum(sf_dir: str):
    """Size-routed exact sum for this sf_dir's lineitem-derived money/
    quantity expressions (all non-negative, <=6-dp grid — see
    functions/num.py dsum_grid): long micro-accumulator at bench scale,
    decimal accumulator at cluster scale, bit-identical values."""
    b = table_bytes(sf_dir, "lineitem")
    return lambda c: dsum_money(c, b)


def _sql_msum(sf_dir: str):
    """SQL-fragment twin of _msum for Spark-side ``spark.sql`` query
    text: same size routing, same bit-identical values. (Distinct from
    sql_dsum, which renders the DuckDB-oracle decimal form.)"""
    from ..functions.num import GRID_SCALE, LONG_SUM_MAX_BYTES

    b = table_bytes(sf_dir, "lineitem")
    if b is not None and b < LONG_SUM_MAX_BYTES:
        return lambda e: (f"CAST(CAST(SUM(FLOOR(({e}) * {GRID_SCALE} + 0.5)) "
                          f"AS DECIMAL(38,6)) / {GRID_SCALE} AS DOUBLE)")
    return lambda e: f"CAST(SUM(CAST(({e}) AS {DEC})) AS DOUBLE)"

Q1_CUTOFF = "2000-12-01"

Q1_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {sql_dsum('l_quantity')} AS sum_qty,
  {sql_dsum('l_extendedprice')} AS sum_base_price,
  {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
  {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
  {sql_davg('l_quantity')} AS avg_qty,
  {sql_davg('l_extendedprice')} AS avg_price,
  {sql_davg('l_discount')} AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF} 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", oracle=Q1_ORACLE, tags=("agg", "flagship"))
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: scan + pushed filter + 8-measure hash aggregation.

    Scale posture: single shuffle on (returnflag, linestatus) with
    map-side partial aggregation; the shipdate filter reaches the
    parquet reader (PushedFilters), only 8 of 11 columns are read.
    """
    # Built as ONE spark.sql string rather than a Column chain: the
    # values and physical plan are identical, but fresh-plan build time
    # drops ~40% (measured 1.12 s -> 0.69 s at sf0.1) — a SQL string is
    # one py4j round trip and one parse, where the equivalent
    # filter/groupBy/agg/select chain is dozens of synchronous py4j
    # Column constructions. Worth it only for bench-headline queries;
    # execution time is unchanged either way.
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("_q1_lineitem")
    s = _sql_msum(sf_dir)
    # avg_* are derived from the sums in the outer projection rather
    # than as extra aggregate expressions: identical values (dsum/count
    # is exactly davg), 3 fewer agg expressions to analyze/codegen.
    return spark.sql(f"""
        SELECT l_returnflag, l_linestatus,
               sum_qty, sum_base_price, sum_disc_price, sum_charge,
               sum_qty / count_order AS avg_qty,
               sum_base_price / count_order AS avg_price,
               _sum_disc / count_order AS avg_disc,
               count_order
        FROM (
          SELECT l_returnflag, l_linestatus,
                 {s('l_quantity')} AS sum_qty,
                 {s('l_extendedprice')} AS sum_base_price,
                 {s('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
                 {s('l_extendedprice * (1 - l_discount) * (1 + l_tax)')}
                   AS sum_charge,
                 {s('l_discount')} AS _sum_disc,
                 COUNT(*) AS count_order
          FROM _q1_lineitem
          WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF} 00:00:00'
          GROUP BY l_returnflag, l_linestatus
        )
        ORDER BY l_returnflag, l_linestatus
        """)


Q3_DATE = "1998-06-01"

Q3_ORACLE = f"""
SELECT
  l_orderkey,
  {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
  strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
  o_orderpriority
FROM customer
JOIN orders    ON c_custkey = o_custkey
JOIN lineitem  ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '{Q3_DATE} 00:00:00'
  AND l_shipdate  > TIMESTAMP '{Q3_DATE} 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register("q3_top_orders", oracle=Q3_ORACLE, tags=("join", "topk"))
def q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: 3-way join + aggregation + deterministic top-10.

    Scale posture: customer is the smallest side and is broadcast by
    Catalyst; orders⋈lineitem is a shuffled join on the orderkey; the
    final ordering is a TakeOrderedAndProject (no global sort
    materialization). Revenue is a decimal-exact sum, so the top-10
    cut is bit-deterministic vs the oracle.
    """
    # SQL-text form for the same reason as q1: identical plan, ~55%
    # less fresh-plan build time than the py4j Column chain (measured
    # 1.8 s -> 0.8 s at sf0.1; see BENCH_NOTES_r04.md).
    from ..io import register_views
    register_views(spark, sf_dir, ["customer", "orders", "lineitem"])
    s = _sql_msum(sf_dir)
    return spark.sql(f"""
        SELECT l_orderkey,
               {s('l_extendedprice * (1 - l_discount)')} AS revenue,
               date_format(o_orderdate, 'yyyy-MM-dd') AS orderdate,
               o_orderpriority
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '{Q3_DATE} 00:00:00'
          AND l_shipdate  > TIMESTAMP '{Q3_DATE} 00:00:00'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
        """)


Q5_LO, Q5_HI = "1996-01-01", "1997-01-01"

Q5_ORACLE = f"""
SELECT
  n_name,
  {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '{Q5_LO} 00:00:00'
  AND o_orderdate <  TIMESTAMP '{Q5_HI} 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC
"""


@register("q5_nation_revenue", oracle=Q5_ORACLE, tags=("join", "agg"))
def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: 6-way join (incl. a 2-column key) + per-nation revenue.

    Scale posture: nation/region/supplier are broadcast (all far under
    the 10 MB threshold); the only real shuffles are customer⋈orders
    and orders⋈lineitem. The region filter prunes before the joins.
    """
    # SQL-text form (same plan incl. the broadcast hints, ~35% less
    # fresh-plan build time — see q1/q3 and BENCH_NOTES_r04.md).
    from ..io import register_views
    register_views(spark, sf_dir,
                   ["customer", "orders", "lineitem", "supplier",
                    "nation", "region"])
    s = _sql_msum(sf_dir)
    return spark.sql(f"""
        SELECT /*+ BROADCAST(supplier), BROADCAST(nation),
                   BROADCAST(region) */
               n_name,
               {s('l_extendedprice * (1 - l_discount)')} AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '{Q5_LO} 00:00:00'
          AND o_orderdate <  TIMESTAMP '{Q5_HI} 00:00:00'
        GROUP BY n_name
        ORDER BY revenue DESC
        """)


Q4_LO, Q4_HI = "1996-01-01", "1996-04-01"

Q4_ORACLE = f"""
WITH eligible AS (
  SELECT o_orderkey, o_orderpriority FROM orders
  WHERE o_orderdate >= TIMESTAMP '{Q4_LO} 00:00:00'
    AND o_orderdate <  TIMESTAMP '{Q4_HI} 00:00:00'
)
SELECT o_orderpriority, COUNT(*) AS order_count
FROM eligible
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > TIMESTAMP '{Q4_HI} 00:00:00')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("q4_order_priority", oracle=Q4_ORACLE, tags=("join", "semi", "sql"))
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: date-sliced orders with a correlated EXISTS on late
    shipments, counted per priority — expressed as SQL text with a CTE
    (parser → semi-join rewrite path), same Catalyst pipeline as the
    DataFrame API."""
    from ..io import register_views
    register_views(spark, sf_dir, ["orders", "lineitem"])
    return spark.sql(f"""
        WITH eligible AS (
          SELECT o_orderkey, o_orderpriority FROM orders
          WHERE o_orderdate >= TIMESTAMP '{Q4_LO} 00:00:00'
            AND o_orderdate <  TIMESTAMP '{Q4_HI} 00:00:00'
        )
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM eligible
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > TIMESTAMP '{Q4_HI} 00:00:00')
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """)


@register("q6_forecast_revenue", oracle=f"""
SELECT {sql_dsum('l_extendedprice * l_discount')} AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1995-01-01 00:00:00'
  AND l_discount BETWEEN 0.02 AND 0.09
  AND l_quantity < 24
""", tags=("agg", "tpch"))
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: the pure scan-efficiency query — every predicate
    (date range, discount band, quantity cap) must reach the parquet
    reader as a pushed filter, and the plan is filter → one global
    agg, no shuffle beyond the final 1-row reduce. The query that most
    directly measures 'did the engine read only what it needed' at
    100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    return (li.filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1994-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1995-01-01")))
        & (F.col("l_discount") >= 0.02) & (F.col("l_discount") <= 0.09)
        & (F.col("l_quantity") < 24))
        .agg(_msum(sf_dir)(F.col("l_extendedprice") * F.col("l_discount"))
             .alias("revenue"),
             F.count(F.lit(1)).alias("n_items")))


@register("q18_large_orders", oracle=f"""
WITH big AS (
  SELECT l_orderkey
  FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(l_quantity) > 212
)
SELECT c.c_custkey, o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o.o_totalprice,
       {sql_dsum('l.l_quantity')} AS total_qty
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
GROUP BY c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 100
""", tags=("tpch", "join", "having"))
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): a HAVING-filtered semi-join
    feeding a three-way join + re-aggregation.

    Scale posture: the `big` order-key set is produced by one
    aggregation of lineitem and is tiny relative to the fact tables, so
    it LEFT SEMI joins (no row multiplication) before the expensive
    customer join; the final top-100 is TakeOrderedAndProject. The
    quantity threshold is tuned to the fixture's scale so the result is
    non-empty at sf0.001+."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (li.groupBy("l_orderkey")
           .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("_q"))
           .filter(F.col("_q") > 212)
           .select("l_orderkey"))
    return (o.join(big.withColumnRenamed("l_orderkey", "o_orderkey"),
                   "o_orderkey", "left_semi")
            .join(c, F.col("o_custkey") == F.col("c_custkey"))
            .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("c_custkey", "o_orderkey",
                     F.date_format("o_orderdate", "yyyy-MM-dd")
                      .alias("o_orderdate"),
                     "o_totalprice")
            .agg(_msum(sf_dir)("l_quantity").alias("total_qty"))
            .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
            .limit(100))


@register("q10_returned_items", oracle=f"""
SELECT c.c_custkey, c.c_name, n.n_name,
       {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
       c.c_acctbal
FROM customer c
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1995-07-01 00:00:00'
GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_acctbal
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
""", tags=("tpch", "join"))
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item losses): lineitem filtered to returns,
    date-sliced orders, customer + broadcast nation, top-20 customers
    by lost revenue. The order-date and returnflag filters both push
    into their scans BEFORE the join, so the join input is the sliced
    minority of both fact tables; nation broadcasts; top-20 fuses into
    TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (li.filter(F.col("l_returnflag") == "R")
            .join(o.filter(
                (F.col("o_orderdate") >= F.to_timestamp(F.lit("1995-01-01")))
                & (F.col("o_orderdate") < F.to_timestamp(F.lit("1995-07-01")))),
                F.col("l_orderkey") == F.col("o_orderkey"))
            .join(c, F.col("o_custkey") == F.col("c_custkey"))
            .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
            .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
            .agg(_msum(sf_dir)(rev).alias("revenue"))
            .select("c_custkey", "c_name", "n_name", "revenue", "c_acctbal")
            .orderBy(F.col("revenue").desc(), "c_custkey")
            .limit(20))


@register("q14_promo_effect", oracle=f"""
SELECT ROUND(100.0 * {sql_dsum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")}
             / {sql_dsum('l_extendedprice * (1 - l_discount)')}, 6)
         AS promo_revenue_pct,
       COUNT(*) AS n_items
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1995-03-01 00:00:00'
""", tags=("tpch", "join"))
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): conditional revenue ratio over a
    date-sliced lineitem joined to part. The part side broadcasts (it
    is the dimension); the CASE lives inside the decimal-exact sums so
    the ratio is deterministic. One shuffle-free broadcast join + a
    1-row global aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    sliced = li.filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1995-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1995-03-01"))))
    return (sliced.join(F.broadcast(p),
                        F.col("l_partkey") == F.col("p_partkey"))
            .agg((F.round(F.lit(100.0) * _msum(sf_dir)(promo) / _msum(sf_dir)(rev), 6))
                 .alias("promo_revenue_pct"),
                 F.count(F.lit(1)).alias("n_items")))


@register("q19_branded_revenue", oracle=f"""
SELECT {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#13' AND p_size BETWEEN 20 AND 50
       AND l_quantity BETWEEN 20 AND 45)
""", tags=("tpch", "join"))
def q19_branded_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue, OR-of-ANDs predicate
    spanning both join sides): the disjunction cannot be pushed below
    the join as-is, but each disjunct's SINGLE-side conjuncts can —
    Catalyst derives p_brand IN (...) and quantity range filters for
    the scans, then applies the full residual on the join output. The
    plan-shape check every optimizer gets wrong first."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30)
           & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#13") & F.col("p_size").between(20, 50)
           & F.col("l_quantity").between(20, 45)))
    return (li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
            .filter(cond)
            .agg(_msum(sf_dir)(rev).alias("revenue"),
                 F.count(F.lit(1)).alias("n_items")))


@register("q15_top_supplier", oracle=f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         {sql_dsum('l_extendedprice * (1 - l_discount)')} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s
JOIN revenue r ON r.supplier_no = s.s_suppkey
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s.s_suppkey
""", tags=("tpch", "subquery"))
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): a derived revenue view consumed twice —
    once joined to supplier, once reduced to its max — with the
    scalar-subquery equality selecting the peak supplier(s).

    Scale posture: the revenue view is computed ONCE per branch off a
    shared shuffle (Catalyst reuses the exchange for self-referencing
    subplans); the max is a 1-row broadcast into the filter, so no
    second full aggregation pass materializes. Ties (several suppliers
    at the max) all surface, keeping the result deterministic."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    rev = (li.filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1996-04-01"))))
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(_msum(sf_dir)(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))
             .alias("total_revenue")))
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    return (s.join(rev, F.col("s_suppkey") == F.col("supplier_no"))
            .join(F.broadcast(mx), F.col("total_revenue") == F.col("_mx"))
            .select("s_suppkey", "s_name", "total_revenue")
            .orderBy("s_suppkey"))


Q7_N1, Q7_N2 = "NATION_1", "NATION_2"

Q7_ORACLE = f"""
SELECT supp_nation, cust_nation, l_year,
       {sql_dsum('volume')} AS revenue
FROM (
  SELECT n1.n_name AS supp_nation,
         n2.n_name AS cust_nation,
         CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume
  FROM supplier s
  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = '{Q7_N1}' AND n2.n_name = '{Q7_N2}')
      OR (n1.n_name = '{Q7_N2}' AND n2.n_name = '{Q7_N1}'))
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


@register("q7_volume_shipping", oracle=Q7_ORACLE, tags=("tpch", "join"))
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): bidirectional two-nation trade flows
    by ship year. The disjunctive nation pair predicate lands AFTER the
    two broadcast nation joins (it references both sides), but both
    nation dims broadcast, so the only shuffles remain the
    lineitem⋈orders and orders⋈customer fact joins."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    n1 = F.broadcast(n.select(F.col("n_nationkey").alias("_sk"),
                              F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(n.select(F.col("n_nationkey").alias("_ck"),
                              F.col("n_name").alias("cust_nation")))
    msum = _msum(sf_dir)
    vol = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    pair = (((F.col("supp_nation") == Q7_N1) & (F.col("cust_nation") == Q7_N2))
            | ((F.col("supp_nation") == Q7_N2) & (F.col("cust_nation") == Q7_N1)))
    return (li
            .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
            .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
            .join(c, F.col("c_custkey") == F.col("o_custkey"))
            .join(n1, F.col("s_nationkey") == F.col("_sk"))
            .join(n2, F.col("c_nationkey") == F.col("_ck"))
            .filter(pair)
            .groupBy("supp_nation", "cust_nation",
                     F.year("l_shipdate").cast("long").alias("l_year"))
            .agg(msum(vol).alias("revenue"))
            .orderBy("supp_nation", "cust_nation", "l_year"))


Q8_TYPE, Q8_REGION = "PROMO", "ASIA"

Q8_ORACLE = f"""
SELECT o_year,
       ROUND(CAST(SUM(CASE WHEN nation = '{Q7_N1}'
                           THEN CAST(volume AS DECIMAL(38,6)) ELSE 0 END)
                  AS DOUBLE)
             / CAST(SUM(CAST(volume AS DECIMAL(38,6))) AS DOUBLE), 6)
         AS mkt_share
FROM (
  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume,
         n2.n_name AS nation
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
  JOIN region r   ON r.r_regionkey = n1.n_regionkey
  JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
  WHERE r.r_name = '{Q8_REGION}' AND p.p_type = '{Q8_TYPE}'
) all_nations
GROUP BY o_year
ORDER BY o_year
"""


@register("q8_market_share", oracle=Q8_ORACLE, tags=("tpch", "join"))
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): one supplier nation's share of
    a part-type's revenue inside one customer region, per order year —
    an 8-way join with a conditional-over-total ratio. Part filters to
    the PROMO slice before joining (pushed), every dim broadcasts, and
    the share is exact-decimal in both numerator and denominator so the
    division is bit-stable cross-engine."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == Q8_TYPE)
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == Q8_REGION)
    vol = (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).alias("volume")
    base = (li
            .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
            .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
            .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
            .join(c, F.col("c_custkey") == F.col("o_custkey"))
            .join(F.broadcast(n.select(F.col("n_nationkey").alias("_ck"),
                                       F.col("n_regionkey").alias("_crk"))),
                  F.col("c_nationkey") == F.col("_ck"))
            .join(F.broadcast(r), F.col("_crk") == F.col("r_regionkey"))
            .join(F.broadcast(n.select(F.col("n_nationkey").alias("_sk"),
                                       F.col("n_name").alias("nation"))),
                  F.col("s_nationkey") == F.col("_sk"))
            .select(F.year("o_orderdate").cast("long").alias("o_year"),
                    vol, "nation"))
    national = F.when(F.col("nation") == Q7_N1,
                      F.col("volume").cast(DEC)).otherwise(F.lit(0).cast(DEC))
    return (base.groupBy("o_year")
            .agg(F.round(F.sum(national).cast("double")
                         / F.sum(F.col("volume").cast(DEC)).cast("double"), 6)
                 .alias("mkt_share"))
            .orderBy("o_year"))


Q13_ORACLE = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@register("q13_order_distribution", oracle=Q13_ORACLE, tags=("tpch", "join",
                                                             "outer"))
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order distribution): LEFT OUTER join so
    customers with zero orders survive into the c_count=0 bucket, then
    a second aggregation over the counts — the canonical two-level
    histogram. COUNT(o_orderkey) (not COUNT(*)) is what zeroes the
    no-order customers. (The spec's o_comment NOT LIKE filter is
    dropped — the fixture carries no comment column.)"""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (c.join(o, c.c_custkey == o.o_custkey, "left_outer")
                .groupBy(c.c_custkey)
                .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count")
            .agg(F.count(F.lit(1)).alias("custdist"))
            .orderBy(F.col("custdist").desc(), F.col("c_count").desc()))


Q17_BRAND = "Brand#23"

Q17_ORACLE = f"""
SELECT {sql_dsum('l.l_extendedprice')} / 7.0 AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = '{Q17_BRAND}'
  AND l.l_quantity < (
    SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = l.l_partkey)
"""


@register("q17_small_quantity", oracle=Q17_ORACLE, tags=("tpch", "subquery"))
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): lineitems under 20% of
    their part's average quantity. The correlated scalar subquery
    decorrelates into a per-part average joined back to the fact — the
    textbook rewrite Catalyst cannot skip, made explicit here. avg is
    plain double: the 0.2x threshold comparison has slack >> fp error
    (quantities are integers), and the final sum is exact.
    (Brand-only filter: the fixture has no p_container.)"""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == Q17_BRAND)
    per_part = (li.groupBy(F.col("l_partkey").alias("_pk"))
                .agg(F.avg("l_quantity").alias("_avg_qty")))
    return (li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
            .join(per_part, F.col("l_partkey") == F.col("_pk"))
            .filter(F.col("l_quantity") < 0.2 * F.col("_avg_qty"))
            .agg((_msum(sf_dir)("l_extendedprice") / F.lit(7.0))
                 .alias("avg_yearly")))


Q22_ORACLE = """
WITH avg_bal AS (
  SELECT AVG(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0.0
)
SELECT c_nationkey,
       COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS totacctbal
FROM customer, avg_bal
WHERE c_acctbal > ab
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


@register("q22_global_sales_opportunity", oracle=Q22_ORACLE,
          tags=("tpch", "subquery", "anti"))
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity): above-average-balance
    customers with no RECENT order (none since 1999 — the fixture's
    customers almost all ordered at least once, so the spec's
    never-ordered predicate would be a degenerate 0-row query), grouped
    by nation (standing in for the spec's phone country code — the
    fixture has no c_phone). Shape:
    scalar aggregate broadcast into a filter + LEFT ANTI join against
    the orders fact — the anti join is the scale-critical piece
    (NOT EXISTS over 1.5 M orders must become a join, not a per-row
    probe). c_acctbal can be negative, so the exact total uses the
    decimal path, not the non-negative grid shortcut."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    avg_bal = (c.filter(F.col("c_acctbal") > 0.0)
               .agg(F.avg("c_acctbal").alias("_ab")))
    return (c.join(F.broadcast(avg_bal))
            .filter(F.col("c_acctbal") > F.col("_ab"))
            .join(o.filter(F.col("o_orderdate")
                           >= F.to_timestamp(F.lit("1999-01-01"))),
                  c.c_custkey == o.o_custkey, "left_anti")
            .groupBy("c_nationkey")
            .agg(F.count(F.lit(1)).alias("numcust"),
                 dsum("c_acctbal").alias("totacctbal"))
            .orderBy("c_nationkey"))


Q12_ORACLE = """
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN delay_days > 90 THEN 1 ELSE 0 END) AS BIGINT)
         AS late_count,
       COUNT(*) AS line_count,
       ROUND(CAST(SUM(CASE WHEN delay_days > 90 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS late_share
FROM (
  SELECT o.o_orderpriority,
         date_diff('day', o.o_orderdate, l.l_shipdate) AS delay_days
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("q12_shipping_delay", oracle=Q12_ORACLE, tags=("tpch", "join"))
def q12_shipping_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 in spirit (shipping-mode priority audit): per order
    priority, how many lineitems shipped more than 90 days after the
    order — conditional counting over a fact-fact join. (The spec
    buckets by l_shipmode against commit/receipt dates; the fixture
    carries none of those columns, so order→ship delay stands in.)
    Integer date arithmetic (datediff) is exact cross-engine; the late
    share is an exact-integer ratio, bit-stable under ROUND."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = F.when(F.datediff("l_shipdate", "o_orderdate") > 90, 1).otherwise(0)
    return (o.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.sum(late).cast("long").alias("late_count"),
                 F.count(F.lit(1)).alias("line_count"),
                 F.round(F.sum(late).cast("double") / F.count(F.lit(1)), 6)
                  .alias("late_share"))
            .orderBy("o_orderpriority"))
