"""Second relational batch: HAVING, correlated & IN subqueries
(Catalyst decorrelation), pivot/unpivot reshaping, generator source,
null-safe equality join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.num import davg, dsum, sql_davg, sql_dsum
from ..io import load_table, register_views
from ..registry import register


@register("agg_having", oracle=f"""
SELECT o_custkey,
       COUNT(*) AS n_orders,
       {sql_dsum('o_totalprice')} AS total
FROM orders
GROUP BY o_custkey
HAVING COUNT(*) >= 15 AND SUM(o_totalprice) > 1000000
""", tags=("agg", "having"))
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filtering (HAVING) — a filter over the agg
    output, pushed nowhere (it can't be), evaluated on the group rows."""
    o = load_table(spark, sf_dir, "orders")
    return (o.groupBy("o_custkey")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 dsum("o_totalprice").alias("total"),
                 F.sum("o_totalprice").alias("_raw_total"))
            .filter((F.col("n_orders") >= 15) & (F.col("_raw_total") > 1_000_000))
            .drop("_raw_total"))


@register("subquery_scalar", oracle="""
SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
FROM orders o
WHERE o.o_totalprice > 2 * (SELECT AVG(o2.o_totalprice)
                            FROM orders o2
                            WHERE o2.o_custkey = o.o_custkey)
""", tags=("subquery",))
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — orders costing more than twice the
    customer's average. Catalyst decorrelates this into an aggregate +
    join (no per-row re-execution), exercised through the SQL entry."""
    register_views(spark, sf_dir, ["orders"])
    return spark.sql("""
        SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
        FROM orders o
        WHERE o.o_totalprice > 2 * (SELECT AVG(o2.o_totalprice)
                                    FROM orders o2
                                    WHERE o2.o_custkey = o.o_custkey)
    """)


@register("subquery_in", oracle="""
SELECT p_partkey, p_name, p_retailprice
FROM part
WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
""", tags=("subquery",))
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery — rewritten by Catalyst to a left-semi join."""
    register_views(spark, sf_dir, ["part", "lineitem"])
    return spark.sql("""
        SELECT p_partkey, p_name, p_retailprice
        FROM part
        WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
    """)


_PIVOT_TYPES = ["click", "view", "purchase", "signup", "error"]
_PIVOT_CASES = ",\n       ".join(
    f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{t}"
    for t in _PIVOT_TYPES)


@register("agg_pivot", oracle=f"""
SELECT user_id % 10 AS user_bucket,
       {_PIVOT_CASES}
FROM events
GROUP BY 1
""", tags=("agg", "pivot"))
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long → wide): event-type counts as columns per user
    bucket. The explicit value list keeps the plan a single-pass
    aggregation (an unlisted pivot needs a distinct-values pre-pass)."""
    e = load_table(spark, sf_dir, "events")
    pivoted = (e.groupBy((F.col("user_id") % 10).alias("user_bucket"))
               .pivot("event_type", _PIVOT_TYPES)
               .agg(F.count(F.lit(1))))
    return pivoted.select(
        "user_bucket",
        *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}")
          for t in _PIVOT_TYPES])


@register("agg_unpivot", oracle="""
SELECT l_returnflag, 'qty' AS measure, {q} AS val FROM lineitem GROUP BY 1
UNION ALL
SELECT l_returnflag, 'price', {p} FROM lineitem GROUP BY 1
UNION ALL
SELECT l_returnflag, 'disc', {d} FROM lineitem GROUP BY 1
""".format(q=sql_dsum("l_quantity"), p=sql_dsum("l_extendedprice"),
           d=sql_dsum("l_discount")), tags=("agg", "unpivot"))
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (wide → long): three measure columns become
    (measure, val) rows via DataFrame.unpivot."""
    li = load_table(spark, sf_dir, "lineitem")
    wide = (li.groupBy("l_returnflag")
            .agg(dsum("l_quantity").alias("qty"),
                 dsum("l_extendedprice").alias("price"),
                 dsum("l_discount").alias("disc")))
    return wide.unpivot("l_returnflag", ["qty", "price", "disc"],
                        "measure", "val")


@register("scan_range", oracle="""
SELECT CAST(i AS BIGINT) AS n,
       CAST(i * i AS BIGINT) AS n_sq,
       CAST(SUM(i) OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS BIGINT) AS running
FROM range(0, 1000) t(i)
""", tags=("source", "generator"))
def scan_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator source: spark.range — the zero-IO relation used for
    synthetic dimensions, sequence joins, and backfill scaffolding."""
    from pyspark.sql import Window

    df = spark.range(0, 1000).withColumnRenamed("id", "n")
    w = Window.orderBy("n").rowsBetween(Window.unboundedPreceding,
                                        Window.currentRow)
    return df.select("n", (F.col("n") * F.col("n")).alias("n_sq"),
                     F.sum("n").over(w).alias("running"))


@register("join_nullsafe", oracle="""
WITH a AS (SELECT o_orderkey, NULLIF(o_orderstatus, 'P') AS st FROM orders
           WHERE o_orderkey % 40 = 0),
     b AS (SELECT NULLIF(o_orderstatus, 'P') AS st, COUNT(*) AS n_all
           FROM orders GROUP BY 1)
SELECT a.o_orderkey, a.st, b.n_all
FROM a JOIN b ON a.st IS NOT DISTINCT FROM b.st
""", tags=("join", "nullsafe"))
def join_nullsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    match each other instead of dropping out — required when a masked
    dimension value is itself a legitimate group."""
    o = load_table(spark, sf_dir, "orders")
    a = (o.filter(F.col("o_orderkey") % 40 == 0)
         .select("o_orderkey", F.nullif("o_orderstatus", F.lit("P")).alias("st")))
    b = (o.groupBy(F.nullif("o_orderstatus", F.lit("P")).alias("st_b"))
         .agg(F.count(F.lit(1)).alias("n_all")))
    return (a.join(b, a.st.eqNullSafe(b.st_b))
            .select("o_orderkey", "st", "n_all"))


@register("join_right", oracle="""
SELECT c_custkey,
       COUNT(o_orderkey) AS n_orders
FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey
""", tags=("join",))
def join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join (the mirrored null-extension; customers with no
    orders keep a zero count)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (o.join(c, o.o_custkey == c.c_custkey, "right")
            .groupBy("c_custkey")
            .agg(F.count("o_orderkey").alias("n_orders")))


@register("edge_empty", oracle="""
SELECT o_orderstatus, COUNT(*) AS n
FROM orders
WHERE o_totalprice < 0
GROUP BY o_orderstatus
""", tags=("edge",))
def edge_empty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empty result set (no negative prices exist): both engines must
    agree on zero rows with the declared schema — the degenerate case
    a comparison harness is most likely to mishandle."""
    o = load_table(spark, sf_dir, "orders")
    return (o.filter(F.col("o_totalprice") < 0)
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n")))


@register("edge_all_null", oracle="""
SELECT o_orderpriority,
       COUNT(*) AS n_rows,
       COUNT(nullif(o_totalprice, o_totalprice)) AS n_nonnull,
       CAST(SUM(nullif(o_totalprice, o_totalprice)) AS DOUBLE) AS sum_null,
       CAST(MIN(nullif(o_totalprice, o_totalprice)) AS DOUBLE) AS min_null,
       COALESCE(CAST(AVG(nullif(o_totalprice, o_totalprice)) AS DOUBLE),
                -1.0) AS avg_or_default
FROM orders
GROUP BY o_orderpriority
""", tags=("edge", "nulls"))
def edge_all_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge semantics: every aggregate over an all-NULL column —
    COUNT(col)=0, SUM/MIN/AVG=NULL (not 0), COALESCE default applied —
    must agree between engines. The all-NULL column is synthesized with
    nullif(x, x) so the query runs on the standard fixture. Guards the
    null-handling contract every outer-join/gap-fill pipeline leans on."""
    o = load_table(spark, sf_dir, "orders")
    nul = F.expr("nullif(o_totalprice, o_totalprice)")
    return (o.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.count(nul).alias("n_nonnull"),
                 F.sum(nul).cast("double").alias("sum_null"),
                 F.min(nul).cast("double").alias("min_null"),
                 F.coalesce(F.avg(nul).cast("double"), F.lit(-1.0))
                  .alias("avg_or_default")))


@register("stats_chi2", oracle="""
WITH obs AS (
  SELECT lang, source, COUNT(*) AS o FROM documents GROUP BY lang, source
), tot AS (SELECT CAST(SUM(o) AS DOUBLE) AS n FROM obs),
rows_ AS (SELECT lang, CAST(SUM(o) AS DOUBLE) AS rt FROM obs GROUP BY lang),
cols_ AS (SELECT source, CAST(SUM(o) AS DOUBLE) AS ct FROM obs GROUP BY source)
SELECT COUNT(*) AS n_cells,
       CAST((SELECT COUNT(*) FROM rows_) - 1 AS BIGINT)
         * CAST((SELECT COUNT(*) FROM cols_) - 1 AS BIGINT) AS dof,
       CAST(SUM(CAST(ROUND(POW(o - rt * ct / n, 2) / (rt * ct / n), 6)
                     AS DECIMAL(38,6))) AS DOUBLE) AS chi2
FROM obs JOIN rows_ USING (lang) JOIN cols_ USING (source), tot
""", tags=("stats",))
def stats_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence statistic between two categorical
    columns (documents.lang x documents.source) from the contingency
    table: chi2 = sum over cells of (O-E)^2/E with E = row_tot *
    col_tot / N. Every count is an integer, so expected values and
    per-cell terms are identical doubles across engines; terms are
    6-dp-rounded and summed in exact DECIMAL so the 100-cell total is
    order-independent. The pre-training sanity check that a corpus
    dimension (language) isn't accidentally confounded with a pipeline
    dimension (source shard)."""
    d = load_table(spark, sf_dir, "documents")
    obs = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("o"))
    n = obs.agg(F.sum("o").cast("double").alias("_n"))
    rt = obs.groupBy("lang").agg(F.sum("o").cast("double").alias("_rt"))
    ct = obs.groupBy("source").agg(F.sum("o").cast("double").alias("_ct"))
    e = F.col("_rt") * F.col("_ct") / F.col("_n")
    term = F.round(F.pow(F.col("o") - e, 2) / e, 6).cast("decimal(38,6)")
    return (obs.join(F.broadcast(rt), "lang")
            .join(F.broadcast(ct), "source")
            .join(F.broadcast(n))
            .agg(F.count(F.lit(1)).alias("n_cells"),
                 ((F.countDistinct("lang") - 1)
                  * (F.countDistinct("source") - 1)).cast("long").alias("dof"),
                 F.sum(term).cast("double").alias("chi2")))


@register("stats_histogram", oracle="""
WITH bounds AS (
  SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi FROM orders
)
SELECT CAST(LEAST(CAST(FLOOR((o_totalprice - lo) / ((hi - lo) / 20.0))
                       AS BIGINT), 19) AS BIGINT) AS bin,
       COUNT(*) AS n,
       ROUND(MIN(o_totalprice), 2) AS bin_min,
       ROUND(MAX(o_totalprice), 2) AS bin_max
FROM orders, bounds
GROUP BY 1
ORDER BY 1
""", tags=("stats", "histogram"))
def stats_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width 20-bin histogram of order totals: global min/max from
    a 1-row broadcast, bin = floor((x-lo)/width) clamped so the max
    lands in the last bin. Both engines compute the identical IEEE
    doubles from identical inputs, so bin edges agree exactly —
    complements the equi-depth ml_quantile_bins."""
    o = load_table(spark, sf_dir, "orders")
    bounds = o.agg(F.min("o_totalprice").alias("_lo"),
                   F.max("o_totalprice").alias("_hi"))
    width = (F.col("_hi") - F.col("_lo")) / F.lit(20.0)
    bin_ = F.least(F.floor((F.col("o_totalprice") - F.col("_lo")) / width),
                   F.lit(19)).cast("long")
    return (o.join(F.broadcast(bounds))
            .groupBy(bin_.alias("bin"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.min("o_totalprice"), 2).alias("bin_min"),
                 F.round(F.max("o_totalprice"), 2).alias("bin_max"))
            .orderBy("bin"))


@register("stats_column_profile", oracle="""
SELECT 'o_custkey' AS col, COUNT(*) - COUNT(o_custkey) AS n_nulls,
       COUNT(DISTINCT o_custkey) AS n_distinct,
       CAST(MIN(o_custkey) AS VARCHAR) AS min_val,
       CAST(MAX(o_custkey) AS VARCHAR) AS max_val
FROM orders
UNION ALL
SELECT 'o_orderstatus', COUNT(*) - COUNT(o_orderstatus),
       COUNT(DISTINCT o_orderstatus),
       MIN(o_orderstatus), MAX(o_orderstatus)
FROM orders
UNION ALL
SELECT 'o_orderpriority', COUNT(*) - COUNT(o_orderpriority),
       COUNT(DISTINCT o_orderpriority),
       MIN(o_orderpriority), MAX(o_orderpriority)
FROM orders
""", tags=("stats", "profile"))
def stats_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level data profile (nulls, exact distinct, min/max as
    strings) for a selection of orders columns — the DESCRIBE-ANALYZE
    style pass a pipeline runs on arrival. One aggregation per column
    unioned; at 100 TB the same shape runs all columns in ONE pass via
    multiple aggregate expressions (done here as a union so each row's
    provenance stays a plain subquery the oracle mirrors)."""
    o = load_table(spark, sf_dir, "orders")

    def profile(col: str) -> DataFrame:
        return o.agg(
            F.lit(col).alias("col"),
            (F.count(F.lit(1)) - F.count(col)).alias("n_nulls"),
            F.countDistinct(col).alias("n_distinct"),
            F.min(col).cast("string").alias("min_val"),
            F.max(col).cast("string").alias("max_val"))

    out = profile("o_custkey")
    for c in ("o_orderstatus", "o_orderpriority"):
        out = out.unionByName(profile(c))
    return out


_AB_STATS = """
  SELECT CAST(user_id % 2 AS BIGINT) AS arm,
         CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS x
  FROM events GROUP BY user_id
"""

AB_ORACLE = f"""
WITH per_user AS ({_AB_STATS}),
arms AS (
  SELECT arm, COUNT(*) AS n,
         CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(x * x AS DECIMAL(38,6))) AS DOUBLE) AS sxx
  FROM per_user GROUP BY arm
), wide AS (
  SELECT MAX(CASE WHEN arm = 0 THEN n END) AS n0,
         MAX(CASE WHEN arm = 1 THEN n END) AS n1,
         MAX(CASE WHEN arm = 0 THEN sx END) AS sx0,
         MAX(CASE WHEN arm = 1 THEN sx END) AS sx1,
         MAX(CASE WHEN arm = 0 THEN sxx END) AS sxx0,
         MAX(CASE WHEN arm = 1 THEN sxx END) AS sxx1
  FROM arms
)
SELECT n0, n1,
       ROUND(sx0 / n0, 6) AS mean0,
       ROUND(sx1 / n1, 6) AS mean1,
       ROUND((sx0 / n0 - sx1 / n1)
             / SQRT(((sxx0 - sx0 * sx0 / n0) / (n0 - 1)) / n0
                    + ((sxx1 - sx1 * sx1 / n1) / (n1 - 1)) / n1), 6)
         AS t_stat,
       ROUND(POW(((sxx0 - sx0 * sx0 / n0) / (n0 - 1)) / n0
                 + ((sxx1 - sx1 * sx1 / n1) / (n1 - 1)) / n1, 2)
             / (POW(((sxx0 - sx0 * sx0 / n0) / (n0 - 1)) / n0, 2) / (n0 - 1)
                + POW(((sxx1 - sx1 * sx1 / n1) / (n1 - 1)) / n1, 2) / (n1 - 1)),
             6) AS welch_df
FROM wide
"""


@register("stats_ab_test", oracle=AB_ORACLE, tags=("stats", "abtest"))
def stats_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Welch t-test between experiment arms (user_id parity)
    on per-user total event value — the analysis unit is the USER, the
    standard guard against within-user correlation inflating
    significance. Three aggregations, all map-side-combinable: per-user
    sums (exact decimal), per-arm (n, Σx, Σx²) with the products
    6-dp-rounded into exact decimal sums so the arm moments are
    order-independent, then a 2-row conditional pivot into one row of
    closed-form statistics. Every post-aggregate expression is the
    same double arithmetic in the same order in both engines. At
    100 TB nothing leaves the executors but two moment rows."""
    e = load_table(spark, sf_dir, "events")
    per_user = (e.groupBy("user_id")
                .agg(F.sum(F.col("value").cast("decimal(38,6)"))
                     .cast("double").alias("x"))
                .select((F.col("user_id") % 2).cast("long").alias("arm"),
                        "x"))
    arms = (per_user.groupBy("arm")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("x").cast("decimal(38,6)"))
                 .cast("double").alias("sx"),
                 F.sum((F.col("x") * F.col("x")).cast("decimal(38,6)"))
                 .cast("double").alias("sxx")))

    def pick(col: str, arm: int):
        return F.max(F.when(F.col("arm") == arm, F.col(col)))

    wide = arms.agg(pick("n", 0).alias("n0"), pick("n", 1).alias("n1"),
                    pick("sx", 0).alias("sx0"), pick("sx", 1).alias("sx1"),
                    pick("sxx", 0).alias("sxx0"),
                    pick("sxx", 1).alias("sxx1"))
    n0, n1 = F.col("n0"), F.col("n1")
    sx0, sx1 = F.col("sx0"), F.col("sx1")
    se0 = ((F.col("sxx0") - sx0 * sx0 / n0) / (n0 - F.lit(1))) / n0
    se1 = ((F.col("sxx1") - sx1 * sx1 / n1) / (n1 - F.lit(1))) / n1
    return wide.select(
        "n0", "n1",
        F.round(sx0 / n0, 6).alias("mean0"),
        F.round(sx1 / n1, 6).alias("mean1"),
        F.round((sx0 / n0 - sx1 / n1) / F.sqrt(se0 + se1), 6)
         .alias("t_stat"),
        F.round(F.pow(se0 + se1, 2)
                / (F.pow(se0, 2) / (n0 - F.lit(1))
                   + F.pow(se1, 2) / (n1 - F.lit(1))), 6).alias("welch_df"))


MW_ORACLE = f"""
WITH per_user AS ({_AB_STATS}),
ranked AS (
  SELECT arm, x,
         row_number() OVER (ORDER BY x, arm) AS rn
  FROM per_user
), avg_ranks AS (
  SELECT arm, x, AVG(rn) OVER (PARTITION BY x) AS r
  FROM ranked
), ties AS (
  SELECT COALESCE(SUM(t * t * t - t), 0) AS tie_term FROM (
    SELECT COUNT(*) AS t FROM per_user GROUP BY x HAVING COUNT(*) > 1
  )
), sums AS (
  SELECT COUNT(CASE WHEN arm = 0 THEN 1 END) AS n0,
         COUNT(CASE WHEN arm = 1 THEN 1 END) AS n1,
         SUM(CASE WHEN arm = 1 THEN r END) AS r1
  FROM avg_ranks
)
SELECT n0, n1,
       ROUND(r1 - n1 * (n1 + 1) / 2.0, 6) AS u_stat,
       ROUND((r1 - n1 * (n1 + 1) / 2.0 - n0 * n1 / 2.0)
             / SQRT(n0 * n1 / 12.0
                    * ((n0 + n1 + 1)
                       - tie_term / (CAST(n0 + n1 AS DOUBLE)
                                     * (n0 + n1 - 1)))), 6) AS z_stat
FROM sums, ties
"""


@register("stats_mannwhitney", oracle=MW_ORACLE, tags=("stats", "abtest"))
def stats_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (rank-sum) test between the same experiment arms
    as stats_ab_test — the non-parametric companion for metrics too
    skewed for a t-test (per-user revenue usually is). Average ranks
    with the tie-corrected normal approximation. The rank runs through
    the RANGE-PARTITIONED two-phase prefix count (operators/prefix.py,
    round 11) over the per-user aggregate — no |users|-sized
    single-task sort; equal x values co-locate by range partitioning,
    so each tie group still occupies one contiguous rank block and the
    per-x AVG rank (the value the statistic uses — invariant to
    intra-tie order) is identical to the old global ROW_NUMBER's."""
    from pyspark.sql import Window

    from ..operators.prefix import ordered_prefix_sums

    e = load_table(spark, sf_dir, "events")
    per_user = (e.groupBy("user_id")
                .agg(F.sum(F.col("value").cast("decimal(38,6)"))
                     .cast("double").alias("x"))
                .select((F.col("user_id") % 2).cast("long").alias("arm"),
                        "x"))
    ranked = ordered_prefix_sums(per_user, ["x", "arm"],
                                 {"rn": F.lit(1)})
    r = F.avg("rn").over(Window.partitionBy("x"))
    avg_ranks = ranked.withColumn("r", r)
    ties = (per_user.groupBy("x").agg(F.count(F.lit(1)).alias("t"))
            .filter(F.col("t") > 1)
            .agg(F.coalesce(F.sum(F.col("t") * F.col("t") * F.col("t")
                                  - F.col("t")), F.lit(0))
                 .alias("tie_term")))
    sums = avg_ranks.agg(
        F.count(F.when(F.col("arm") == 0, 1)).alias("n0"),
        F.count(F.when(F.col("arm") == 1, 1)).alias("n1"),
        F.sum(F.when(F.col("arm") == 1, F.col("r"))).alias("r1"))
    n0, n1, r1 = F.col("n0"), F.col("n1"), F.col("r1")
    u = r1 - n1 * (n1 + F.lit(1)) / F.lit(2.0)
    mu = n0 * n1 / F.lit(2.0)
    var = (n0 * n1 / F.lit(12.0)
           * ((n0 + n1 + F.lit(1))
              - F.col("tie_term") / ((n0 + n1).cast("double")
                                     * (n0 + n1 - F.lit(1)))))
    # an empty arm makes U undefined (and the tie-correction division
    # hits ANSI divide-by-zero) — emit no row rather than crash
    return (sums.join(F.broadcast(ties))
            .where((n0 > 0) & (n1 > 0))
            .select("n0", "n1",
                    F.round(u, 6).alias("u_stat"),
                    F.round((u - mu) / F.sqrt(var), 6).alias("z_stat")))


PROP_THRESHOLD = 14

PROP_ORACLE = f"""
WITH conv AS (
  SELECT CAST(user_id % 2 AS BIGINT) AS arm,
         CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   >= {PROP_THRESHOLD} THEN 1 ELSE 0 END AS converted
  FROM events GROUP BY user_id
), wide AS (
  SELECT COUNT(CASE WHEN arm = 0 THEN 1 END) AS n0,
         COUNT(CASE WHEN arm = 1 THEN 1 END) AS n1,
         CAST(SUM(CASE WHEN arm = 0 THEN converted END) AS BIGINT) AS c0,
         CAST(SUM(CASE WHEN arm = 1 THEN converted END) AS BIGINT) AS c1
  FROM conv
)
SELECT n0, n1, c0, c1,
       ROUND(CAST(c0 AS DOUBLE) / n0, 6) AS rate0,
       ROUND(CAST(c1 AS DOUBLE) / n1, 6) AS rate1,
       ROUND((CAST(c0 AS DOUBLE) / n0 - CAST(c1 AS DOUBLE) / n1)
             / SQRT((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                    * (1 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                    * (1.0 / n0 + 1.0 / n1)), 6) AS z_stat
FROM wide
"""


@register("stats_proportion_test", oracle=PROP_ORACLE,
          tags=("stats", "abtest"))
def stats_proportion_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test on conversion (is the user a heavy
    purchaser — >= 14 purchase events, the fixture's median) between
    the same arms — the binary-outcome member of the A/B pack (t-test:
    means; Mann-Whitney: distributions; this: rates), with the
    pooled-variance denominator. Conversion collapses per user first
    (a thresholded count — map-side combinable), counts collapse per
    arm; all integer arithmetic until the final closed-form doubles,
    so cross-engine equality is trivial."""
    e = load_table(spark, sf_dir, "events")
    conv = (e.groupBy("user_id")
            .agg(F.when(F.sum(F.when(F.col("event_type") == "purchase", 1)
                              .otherwise(0)) >= PROP_THRESHOLD, 1)
                 .otherwise(0).alias("converted"))
            .select((F.col("user_id") % 2).cast("long").alias("arm"),
                    "converted"))
    wide = conv.agg(
        F.count(F.when(F.col("arm") == 0, 1)).alias("n0"),
        F.count(F.when(F.col("arm") == 1, 1)).alias("n1"),
        F.sum(F.when(F.col("arm") == 0, F.col("converted")))
        .cast("long").alias("c0"),
        F.sum(F.when(F.col("arm") == 1, F.col("converted")))
        .cast("long").alias("c1"))
    n0, n1 = F.col("n0"), F.col("n1")
    c0, c1 = F.col("c0"), F.col("c1")
    p0 = c0.cast("double") / n0
    p1 = c1.cast("double") / n1
    pp = (c0 + c1).cast("double") / (n0 + n1)
    z = (p0 - p1) / F.sqrt(pp * (F.lit(1) - pp)
                           * (F.lit(1.0) / n0 + F.lit(1.0) / n1))
    return wide.select("n0", "n1", "c0", "c1",
                       F.round(p0, 6).alias("rate0"),
                       F.round(p1, 6).alias("rate1"),
                       F.round(z, 6).alias("z_stat"))


CORR_ORACLE = f"""
WITH s AS (
  SELECT COUNT(*) AS n,
         {sql_dsum('l_quantity')} AS sq,
         {sql_dsum('l_extendedprice')} AS sp,
         {sql_dsum('l_discount')} AS sd,
         {sql_dsum('l_quantity * l_quantity')} AS sqq,
         {sql_dsum('l_extendedprice * l_extendedprice')} AS spp,
         {sql_dsum('l_discount * l_discount')} AS sdd,
         {sql_dsum('l_quantity * l_extendedprice')} AS sqp,
         {sql_dsum('l_quantity * l_discount')} AS sqd,
         {sql_dsum('l_extendedprice * l_discount')} AS spd
  FROM lineitem
)
SELECT CAST(n AS BIGINT) AS n,
  ROUND((n*sqp - sq*sp) / SQRT((n*sqq - sq*sq) * (n*spp - sp*sp)), 6)
    AS corr_qty_price,
  ROUND((n*sqd - sq*sd) / SQRT((n*sqq - sq*sq) * (n*sdd - sd*sd)), 6)
    AS corr_qty_disc,
  ROUND((n*spd - sp*sd) / SQRT((n*spp - sp*sp) * (n*sdd - sd*sd)), 6)
    AS corr_price_disc
FROM s
"""


@register("stats_correlation", oracle=CORR_ORACLE, tags=("stats", "profile"))
def stats_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix over the lineitem measures,
    computed from EXACT decimal sufficient statistics rather than the
    built-in ``corr`` — a float ``corr`` accumulates in partial-agg
    order and differs in the last bits across engines/partitionings;
    the closed form over bit-identical exact sums is deterministic
    everywhere, the same trick as stats_ab_test.

    Scale posture: one map-side-combined pass producing 10 scalars
    (n + 9 sums); the correlation arithmetic runs on a 1-row frame.
    Sum capacity: per-row products ≤1e10 on this schema, DECIMAL(28,6)
    accumulators hold ~1e22 — a 1e12-row table stays exact."""
    li = load_table(spark, sf_dir, "lineitem")
    q, p, d = F.col("l_quantity"), F.col("l_extendedprice"), F.col("l_discount")
    s = li.agg(
        F.count(F.lit(1)).alias("n"),
        dsum(q).alias("sq"), dsum(p).alias("sp"), dsum(d).alias("sd"),
        dsum(q * q).alias("sqq"), dsum(p * p).alias("spp"),
        dsum(d * d).alias("sdd"), dsum(q * p).alias("sqp"),
        dsum(q * d).alias("sqd"), dsum(p * d).alias("spd"))
    n = F.col("n")
    def corr(sxy, sx, sy, sxx, syy):
        return F.round(
            (n * F.col(sxy) - F.col(sx) * F.col(sy))
            / F.sqrt((n * F.col(sxx) - F.col(sx) * F.col(sx))
                     * (n * F.col(syy) - F.col(sy) * F.col(sy))), 6)
    return s.select(
        n.cast("long").alias("n"),
        corr("sqp", "sq", "sp", "sqq", "spp").alias("corr_qty_price"),
        corr("sqd", "sq", "sd", "sqq", "sdd").alias("corr_qty_disc"),
        corr("spd", "sp", "sd", "spp", "sdd").alias("corr_price_disc"))


KS_ORACLE = f"""
WITH per_user AS ({_AB_STATS}),
by_x AS (
  SELECT x,
         COUNT(CASE WHEN arm = 0 THEN 1 END) AS c0,
         COUNT(CASE WHEN arm = 1 THEN 1 END) AS c1
  FROM per_user GROUP BY x
), cum AS (
  SELECT SUM(c0) OVER (ORDER BY x
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum0,
         SUM(c1) OVER (ORDER BY x
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1
  FROM by_x
), tot AS (
  SELECT COUNT(CASE WHEN arm = 0 THEN 1 END) AS n0,
         COUNT(CASE WHEN arm = 1 THEN 1 END) AS n1
  FROM per_user
)
SELECT n0, n1,
       ROUND(MAX(ABS(CAST(cum0 AS DOUBLE) / n0
                     - CAST(cum1 AS DOUBLE) / n1)), 6) AS ks_stat,
       ROUND(SQRT(CAST(n0 * n1 AS DOUBLE) / (n0 + n1))
             * MAX(ABS(CAST(cum0 AS DOUBLE) / n0
                       - CAST(cum1 AS DOUBLE) / n1)), 6) AS ks_scaled
FROM cum, tot
GROUP BY n0, n1
"""


@register("stats_ks", oracle=KS_ORACLE, tags=("stats", "abtest"))
def stats_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between the same
    experiment arms as stats_ab_test / stats_mannwhitney — the
    distribution-shape companion: D = max |ECDF0(x) - ECDF1(x)|, plus
    the asymptotic scaling sqrt(n0*n1/(n0+n1))*D that feeds the KS
    p-value. Completes the A/B family: t-test (means), rank-sum
    (location), KS (whole distribution).

    Per-x counts first (one shuffle on x), then both ECDF cumulatives
    run through the RANGE-PARTITIONED two-phase prefix sum
    (operators/prefix.py, round 11) — no |users|-sized single-task
    window; value-identical (exact integer counts). Totals ride a
    1-row broadcast frame (allowlisted). ECDF differences are
    exact-integer ratios evaluated identically on both engines,
    rounded to 6 dp."""
    from ..operators.prefix import ordered_prefix_sums

    e = load_table(spark, sf_dir, "events")
    per_user = (e.groupBy("user_id")
                .agg(F.sum(F.col("value").cast("decimal(38,6)"))
                     .cast("double").alias("x"))
                .select((F.col("user_id") % 2).cast("long").alias("arm"),
                        "x"))
    by_x = per_user.groupBy("x").agg(
        F.count(F.when(F.col("arm") == 0, 1)).alias("c0"),
        F.count(F.when(F.col("arm") == 1, 1)).alias("c1"))
    cum = ordered_prefix_sums(
        by_x, ["x"], {"cum0": F.col("c0"), "cum1": F.col("c1")}
    ).select("cum0", "cum1")
    tot = per_user.agg(
        F.count(F.when(F.col("arm") == 0, 1)).alias("n0"),
        F.count(F.when(F.col("arm") == 1, 1)).alias("n1"))
    diff = F.abs(F.col("cum0").cast("double") / F.col("n0")
                 - F.col("cum1").cast("double") / F.col("n1"))
    return (cum.crossJoin(F.broadcast(tot))
            .groupBy("n0", "n1")
            .agg(F.round(F.max(diff), 6).alias("ks_stat"),
                 F.round(F.sqrt((F.col("n0") * F.col("n1")).cast("double")
                                / (F.col("n0") + F.col("n1")))
                         * F.max(diff), 6).alias("ks_scaled")))


# Poisson(1) inverse-CDF ladder (cumulative probs), capped at 8 —
# P(X > 8) < 1e-6, far below the 1e-9 resolution of the LCG uniform.
_POIS_CUM = [0.3678794411714423, 0.7357588823428846, 0.9196986029286058,
             0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
             0.9999167588507119, 0.9999897508033253]

_BOOT_B = 50

_BOOT_ORACLE = f"""
WITH per_user AS (
  SELECT user_id,
         CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS x
  FROM events GROUP BY user_id
), reps AS (SELECT unnest(range({_BOOT_B})) AS b),
weighted AS (
  SELECT r.b, p.x,
         (CASE
            {' '.join(f"WHEN ((p.user_id * 2654435761 + r.b * 40503 + 7) % 1000000007) / 1000000007.0 < {c} THEN {k}" for k, c in enumerate(_POIS_CUM))}
            ELSE 8 END) AS w
  FROM per_user p CROSS JOIN reps r
), means AS (
  SELECT b,
         ROUND(CAST(SUM(CAST(x * w AS DECIMAL(38,6))) AS DOUBLE)
               / CAST(SUM(CAST(w AS DECIMAL(38,6))) AS DOUBLE), 6) AS m
  FROM weighted GROUP BY b
), est AS (
  SELECT ROUND(CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE)
               / COUNT(*), 6) AS est_mean
  FROM per_user
)
SELECT {_BOOT_B} AS n_replicates,
       est_mean,
       ROUND(quantile_cont(m, 0.025), 6) AS ci_lo,
       ROUND(quantile_cont(m, 0.975), 6) AS ci_hi
FROM means, est
GROUP BY est_mean
"""


@register("stats_bootstrap", oracle=_BOOT_ORACLE,
          tags=("stats", "bootstrap"))
def stats_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap 95% confidence interval for mean per-user
    revenue — the standard trick for resampling at data scale: instead
    of materializing B resampled copies, each (unit, replicate) pair
    draws a Poisson(1) weight (the large-n limit of multinomial
    resampling), so B=50 replicates cost one B-way explode of the
    PER-USER aggregate (never the events fact) and one weighted agg.

    Fully deterministic and oracle-checked: the per-pair uniform is a
    pure-integer LCG hash ((uid*2654435761 + b*40503 + 7) mod 1e9+7,
    exact int64 arithmetic on both engines), pushed through the
    Poisson(1) inverse-CDF ladder; replicate means use decimal-exact
    weighted sums rounded to 6 dp, and the CI bounds are exact
    interpolated percentiles over the 50 identical replicate means
    (Spark percentile == DuckDB quantile_cont, the agg_percentile
    precedent)."""
    from pyspark.sql import Window  # noqa: F401  (parity with siblings)

    e = load_table(spark, sf_dir, "events")
    per_user = (e.groupBy("user_id")
                .agg(F.sum(F.col("value").cast("decimal(38,6)"))
                     .cast("double").alias("x")))
    reps = spark.range(_BOOT_B).select(F.col("id").alias("b"))
    u = (((F.col("user_id") * 2654435761) + F.col("b") * 40503 + 7)
         % 1000000007) / 1000000007.0
    w = F.lit(8)
    for k in range(len(_POIS_CUM) - 1, -1, -1):
        w = F.when(u < _POIS_CUM[k], F.lit(k)).otherwise(w)
    wide = "decimal(38,6)"
    means = (per_user.crossJoin(F.broadcast(reps))
             .select("b", "x", w.alias("w"))
             .groupBy("b")
             .agg(F.round(
                 F.sum((F.col("x") * F.col("w")).cast(wide)).cast("double")
                 / F.sum(F.col("w").cast(wide)).cast("double"), 6)
                 .alias("m")))
    est = per_user.agg(
        F.round(F.sum(F.col("x").cast(wide)).cast("double")
                / F.count(F.lit(1)), 6).alias("est_mean"))
    return (means.crossJoin(F.broadcast(est))
            .groupBy("est_mean")
            .agg(F.lit(_BOOT_B).alias("n_replicates"),
                 F.round(F.percentile("m", F.lit(0.025)), 6).alias("ci_lo"),
                 F.round(F.percentile("m", F.lit(0.975)), 6).alias("ci_hi"))
            .select("n_replicates", "est_mean", "ci_lo", "ci_hi"))


_EXISTS_SQL = """
SELECT c.c_custkey, c.c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderpriority = '1-URGENT')
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderstatus = 'P')
"""


@register("subquery_exists", oracle=_EXISTS_SQL,
          tags=("subquery", "exists"))
def subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS + NOT EXISTS in one predicate: customers with
    at least one urgent order and no pending order. Completes the
    subquery family (scalar, IN, EXISTS) — Catalyst decorrelates the
    pair into a LEFT SEMI join followed by a LEFT ANTI join on
    c_custkey, which is exactly the plan you would hand-write; the
    oracle runs the identical SQL text in DuckDB.

    Shape: two hash joins on the same key — under AQE the two probe
    passes share the shuffled orders exchange. No row explosion: semi/
    anti joins emit each customer at most once regardless of order
    fan-in, which is what makes EXISTS the scale-safe idiom vs a
    JOIN+DISTINCT."""
    from ..io import register_views
    register_views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(_EXISTS_SQL)


@register("scalar_bitwise", oracle="""
SELECT event_type,
       CAST(bit_and(event_id & 1023) AS BIGINT) AS and_all,
       CAST(bit_or(event_id & 1023) AS BIGINT) AS or_all,
       CAST(bit_xor(event_id & 1023) AS BIGINT) AS xor_all,
       CAST(SUM(CASE WHEN (event_id >> 3) & 1 = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS bit3_set,
       CAST(SUM(bit_count(CAST(event_id & 1023 AS BIGINT))) AS BIGINT)
         AS total_popcount
FROM events GROUP BY event_type
""", tags=("scalar", "bitwise"))
def scalar_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise function family: masked AND/OR/XOR reduction aggregates
    plus shift-and-test and popcount — the toolkit behind bitmap
    memberships, feature flags, and the SimHash/bloom kernels used
    elsewhere in the repo (operators/dedup.py relies on bit_count for
    Hamming distance; this query pins the primitive's cross-engine
    semantics on its own).

    All operations are exact integer ops with identical two's-
    complement semantics in both engines; one map-side-combinable
    aggregation, JVM codegen throughout."""
    e = load_table(spark, sf_dir, "events")
    return (e.select("event_type",
                     F.expr("event_id & 1023").alias("m"),
                     F.expr("(event_id >> 3) & 1").alias("b3"))
            .groupBy("event_type")
            .agg(F.expr("bit_and(m)").alias("and_all"),
                 F.expr("bit_or(m)").alias("or_all"),
                 F.expr("bit_xor(m)").alias("xor_all"),
                 F.sum(F.when(F.col("b3") == 1, 1).otherwise(0))
                  .alias("bit3_set"),
                 F.sum(F.bit_count("m")).cast("long")
                  .alias("total_popcount")))


@register("sql_recursive_hierarchy", oracle="""
WITH RECURSIVE chain(custkey, root, depth) AS (
  SELECT c_custkey, c_custkey, 0
  FROM customer WHERE c_custkey < 10
  UNION ALL
  SELECT c.c_custkey, ch.root, ch.depth + 1
  FROM customer c JOIN chain ch ON ch.custkey = c.c_custkey // 10
  WHERE c.c_custkey >= 10
)
SELECT depth,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(COUNT(DISTINCT root) AS BIGINT) AS n_roots,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
         AS total_acctbal
FROM chain JOIN customer c ON c.c_custkey = chain.custkey
GROUP BY depth
ORDER BY depth
""", tags=("sql", "recursive"))
def sql_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native recursive CTE (Spark 4 ``WITH RECURSIVE``) walking a
    synthetic management hierarchy over customer (parent(c) = c DIV 10
    — a forest rooted at custkeys < 10, depth ~log₁₀ n): per-depth
    headcount, root count, and exact-decimal balance rollup. This is
    the org-chart / bill-of-materials / referral-chain shape that had
    NO bounded-iteration SQL answer before Spark 4 — the engine itself
    iterates the recursion to a fixpoint (UnionLoop in the plan),
    exactly like the DuckDB oracle's recursive CTE, so unlike the
    fixed-round operators (pagerank, kcore) no unrolling is needed on
    either side.

    Scale: the recursion is LINEAR (each customer joins its single
    parent level), state per step is one slim (custkey, root, depth)
    frame, and depth is log-bounded by the key width — the same
    per-level join shape as bfs_levels but planned natively. All
    arithmetic integer/decimal-exact."""
    register_views(spark, sf_dir, ["customer"])
    return spark.sql("""
        WITH RECURSIVE chain(custkey, root, depth) AS (
          SELECT c_custkey, c_custkey, 0
          FROM customer WHERE c_custkey < 10
          UNION ALL
          SELECT c.c_custkey, ch.root, ch.depth + 1
          FROM customer c JOIN chain ch ON ch.custkey = c.c_custkey DIV 10
          WHERE c.c_custkey >= 10
        )
        SELECT depth,
               COUNT(*) AS n_customers,
               COUNT(DISTINCT root) AS n_roots,
               CAST(SUM(CAST(c.c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
                 AS total_acctbal
        FROM chain JOIN customer c ON c.c_custkey = chain.custkey
        GROUP BY depth
        ORDER BY depth
    """)
