"""Pattern-mining queries: association rules from market baskets.

The pair-support counting shares its shape with the co-purchase graph
derivation in queries/graph.py — a bounded per-order self-join — but
the output here is the rule metrics (support / confidence / lift),
the classic recommendation / cross-sell signal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register


@register("basket_rules", oracle="""
WITH baskets AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM baskets),
item AS (
  SELECT l_partkey, COUNT(*) AS supp FROM baskets GROUP BY 1
),
pair AS (
  SELECT a.l_partkey AS ante, b.l_partkey AS cons, COUNT(*) AS supp_ab
  FROM baskets a JOIN baskets b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING COUNT(*) >= 3
)
SELECT p.ante, p.cons, p.supp_ab,
       ROUND(CAST(p.supp_ab AS DOUBLE) / ia.supp, 6) AS confidence,
       ROUND(CAST(p.supp_ab AS DOUBLE) * n.n_orders
             / (CAST(ia.supp AS DOUBLE) * ic.supp), 6) AS lift
FROM pair p
JOIN item ia ON ia.l_partkey = p.ante
JOIN item ic ON ic.l_partkey = p.cons
CROSS JOIN n
ORDER BY lift DESC, p.ante, p.cons
LIMIT 20
""", tags=("mining", "basket"))
def basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over order baskets (the Apriori-at-pair-depth
    cross-sell primitive): for part pairs co-purchased in >= 3 orders,
    emit support, confidence(ante -> cons) and lift, top-20 by lift
    with a deterministic (ante, cons) tie-break.

    Pair supports come from the bounded per-order self-join (fan-out
    <= C(7,2) per TPC-H order — never a cartesian); item supports are
    one linear agg; the rule metrics join pair counts to two
    broadcastable item-support copies plus the 1-row basket total
    (allowlisted). All metrics are exact-integer ratios rounded to
    6 dp on both engines; deeper itemsets would iterate the same
    candidate-join + support-filter shape (Apriori's monotonicity
    bounds the frontier)."""
    from ..operators.ckpt import truncated_checkpoint

    # The distinct basket frame is consumed four times (basket total,
    # item supports, both self-join sides) — checkpoint it once
    # (eager=False: the first broadcast build materializes it) so the
    # scan + distinct shuffle run ONE time per query (r12, guide §1.2).
    li = truncated_checkpoint(
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey").distinct(), eager=False)
    n = li.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    item = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.count(F.lit(1)).alias("supp"))
    a = li.select(F.col("l_orderkey").alias("k"),
                  F.col("l_partkey").alias("ante"))
    b = li.select(F.col("l_orderkey").alias("k"),
                  F.col("l_partkey").alias("cons"))
    pair = (a.join(b, "k").filter(F.col("ante") < F.col("cons"))
            .groupBy("ante", "cons").agg(F.count(F.lit(1)).alias("supp_ab"))
            .filter(F.col("supp_ab") >= 3))
    ia = item.select(F.col("pk").alias("ante"), F.col("supp").alias("supp_a"))
    ic = item.select(F.col("pk").alias("cons"), F.col("supp").alias("supp_c"))
    return (pair.join(F.broadcast(ia), "ante")
            .join(F.broadcast(ic), "cons")
            .crossJoin(F.broadcast(n))
            .select("ante", "cons", "supp_ab",
                    F.round(F.col("supp_ab").cast("double")
                            / F.col("supp_a"), 6).alias("confidence"),
                    F.round(F.col("supp_ab").cast("double")
                            * F.col("n_orders")
                            / (F.col("supp_a").cast("double")
                               * F.col("supp_c")), 6).alias("lift"))
            .orderBy(F.col("lift").desc(), "ante", "cons")
            .limit(20))
