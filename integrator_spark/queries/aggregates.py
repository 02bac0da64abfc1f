"""Aggregation operators (SURVEY.md §2.4): global/grouped/distinct,
grouping sets (rollup/cube), statistical aggregates, percentiles,
collect, approximate distinct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.num import DEC, davg, davg_money, dsum, sql_davg, sql_dsum
from ..io import load_table, table_bytes
from ..registry import register


@register("agg_global", oracle=f"""
SELECT COUNT(*) AS n_rows,
       {sql_dsum('l_quantity')} AS sum_qty,
       {sql_davg('l_extendedprice')} AS avg_price,
       strftime(MIN(l_shipdate), '%Y-%m-%d') AS min_ship,
       strftime(MAX(l_shipdate), '%Y-%m-%d') AS max_ship
FROM lineitem
""", tags=("agg",))
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global (no-key) aggregation — partial aggregation collapses to one row."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("l_quantity").alias("sum_qty"),
        davg("l_extendedprice").alias("avg_price"),
        F.date_format(F.min("l_shipdate"), "yyyy-MM-dd").alias("min_ship"),
        F.date_format(F.max("l_shipdate"), "yyyy-MM-dd").alias("max_ship"),
    )


@register("agg_distinct", oracle=f"""
SELECT o_orderpriority,
       COUNT(DISTINCT o_custkey) AS n_customers,
       COUNT(*) AS n_orders,
       {sql_davg('o_totalprice')} AS avg_price
FROM orders
GROUP BY o_orderpriority
""", tags=("agg",))
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct count alongside plain aggregates (expand + 2-phase).

    o_totalprice is a non-negative 2-dp money column, so the exact avg
    routes through the size-routed long micro-accumulator (davg_money)
    — measured 0.37 s vs 0.62 s for the decimal accumulator at sf0.1
    (BigDecimal codegen dominates a fresh plan at fixture scale)."""
    o = load_table(spark, sf_dir, "orders")
    return (o.groupBy("o_orderpriority")
            .agg(F.countDistinct("o_custkey").alias("n_customers"),
                 F.count(F.lit(1)).alias("n_orders"),
                 davg_money("o_totalprice",
                            table_bytes(sf_dir, "orders")).alias("avg_price")))


@register("agg_approx_distinct", oracle=None, tags=("agg", "approx"))
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct (rows-only: sketch estimates are
    engine-specific, so no cross-engine oracle — SURVEY.md §2.4)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag")
            .agg(F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
                 F.countDistinct("l_orderkey").alias("exact_orders")))


_REV = "l_extendedprice * (1 - l_discount)"



def _source_bytes(sf_dir: str, name: str) -> int:
    """table_bytes with the scale-first default: unknown size (object
    store) is treated as big."""
    from ..io import table_bytes

    size = table_bytes(sf_dir, name)
    return size if size is not None else (1 << 62)


@register("rollup_revenue", oracle=f"""
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
       COUNT(*) AS n_items,
       {sql_dsum(_REV)} AS revenue
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
""", tags=("agg", "groupingsets"))
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP: hierarchical subtotals + grand total with grouping id.

    Plan note: rollup expands every input row once per grouping set
    *before* partial aggregation, so the heavy exact aggregation is
    done first as a plain (flag, status) group-by and the rollup runs
    over the tiny intermediate (exact sums are associative, so
    re-aggregating partial sums is bit-identical) — at 100 TB this
    turns a 3x-expand shuffle of the fact table into one normal
    aggregation + a 6-row rollup. (The direct single-stage rollup was
    measured SLOWER even at 10 MB input — 1.42 s vs 0.71 s at sf0.1 —
    because the expand triples the exact-sum work, which dwarfs the
    extra stage boundary; pre-agg is the right plan at every scale.)
    The sum accumulator is size-routed like every money sum: long
    micro-units below LONG_SUM_MAX_BYTES, decimal beyond —
    bit-identical either way (functions/num.py dsum_grid).
    """
    from ..functions.num import GRID_SCALE, LONG_SUM_MAX_BYTES

    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    src = _source_bytes(sf_dir, "lineitem")
    if src < LONG_SUM_MAX_BYTES:
        # Grid-exact long micro-accumulator (see functions/num.py
        # dsum_grid): partial sums are BIGINTs, so re-aggregating them
        # through the rollup stays exact; decimal division only at the
        # final 10-row projection.
        micros = F.floor(rev.cast("double") * GRID_SCALE + F.lit(0.5))
        base = (li.groupBy("l_returnflag", "l_linestatus")
                .agg(F.count(F.lit(1)).alias("_n"),
                     F.sum(micros).alias("_rev_u")))
        return (base.rollup("l_returnflag", "l_linestatus")
                .agg(F.grouping_id().cast("long").alias("gid"),
                     F.sum("_n").alias("n_items"),
                     (F.sum("_rev_u").cast("decimal(38,6)")
                      / F.lit(GRID_SCALE)).cast("double").alias("revenue")))
    base = (li.groupBy("l_returnflag", "l_linestatus")
            .agg(F.count(F.lit(1)).alias("_n"),
                 F.sum(rev.cast(DEC)).alias("_rev")))
    return (base.rollup("l_returnflag", "l_linestatus")
            .agg(F.grouping_id().cast("long").alias("gid"),
                 F.sum("_n").alias("n_items"),
                 F.sum("_rev").cast("double").alias("revenue")))


@register("cube_revenue", oracle=f"""
SELECT c_mktsegment, o_orderstatus,
       CAST(GROUPING(c_mktsegment, o_orderstatus) AS BIGINT) AS gid,
       COUNT(*) AS n_orders,
       {sql_dsum('o_totalprice')} AS total
FROM customer JOIN orders ON c_custkey = o_custkey
GROUP BY CUBE(c_mktsegment, o_orderstatus)
""", tags=("agg", "groupingsets"))
def cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all key-subset aggregations over a join result."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (c.join(o, c.c_custkey == o.o_custkey)
            .cube("c_mktsegment", "o_orderstatus")
            .agg(F.grouping_id().cast("long").alias("gid"),
                 F.count(F.lit(1)).alias("n_orders"),
                 dsum("o_totalprice").alias("total")))


@register("agg_stats", oracle="""
SELECT l_returnflag,
       ROUND(stddev_samp(l_quantity), 6) AS sd_qty,
       ROUND(var_samp(l_quantity), 6) AS var_qty,
       ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       ROUND(covar_samp(l_quantity, l_discount), 6) AS cov_qty_disc
FROM lineitem
GROUP BY l_returnflag
""", tags=("agg", "stats"))
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (rounded: engines use different but
    numerically-stable accumulation orders; magnitudes here are small so
    ROUND(6) is far above the FP noise floor)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag")
            .agg(F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
                 F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
                 F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
                 F.round(F.covar_samp("l_quantity", "l_discount"), 6).alias("cov_qty_disc")))


@register("agg_percentile", oracle="""
SELECT o_orderpriority,
       ROUND(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.25), 4) AS p25,
       ROUND(median(CAST(o_totalprice AS DOUBLE)), 4) AS p50,
       ROUND(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.75), 4) AS p75,
       ROUND(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.90), 4) AS p90
FROM orders
GROUP BY o_orderpriority
""", tags=("agg", "percentile"))
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles + median (both engines implement
    the same linear-interpolation definition)."""
    o = load_table(spark, sf_dir, "orders")
    return (o.groupBy("o_orderpriority")
            .agg(F.round(F.percentile("o_totalprice", 0.25), 4).alias("p25"),
                 F.round(F.median("o_totalprice"), 4).alias("p50"),
                 F.round(F.percentile("o_totalprice", 0.75), 4).alias("p75"),
                 F.round(F.percentile("o_totalprice", 0.90), 4).alias("p90")))


@register("agg_collect", oracle="""
SELECT lang,
       array_to_string(list_sort(list(DISTINCT source)), ',') AS sources,
       COUNT(*) AS n_docs
FROM documents
GROUP BY lang
""", tags=("agg", "collect"))
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set → sorted → joined string (explicit sort makes the
    inherently unordered collect deterministic for comparison)."""
    d = load_table(spark, sf_dir, "documents")
    return (d.groupBy("lang")
            .agg(F.concat_ws(",", F.sort_array(F.collect_set("source"))).alias("sources"),
                 F.count(F.lit(1)).alias("n_docs")))


@register("agg_approx_percentile", oracle=None, tags=("agg", "approx", "percentile"))
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx (GK-sketch) next to the exact percentile —
    rows-only: sketch interpolation is engine-specific; the exact
    variant is oracle-checked by agg_percentile."""
    o = load_table(spark, sf_dir, "orders")
    return (o.groupBy("o_orderpriority")
            .agg(F.percentile_approx("o_totalprice", 0.5, 10000).alias("p50_approx"),
                 F.round(F.median("o_totalprice"), 4).alias("p50_exact")))


@register("groupingsets_revenue", oracle=f"""
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_items,
       {sql_dsum('l_quantity')} AS total_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
""", tags=("agg", "groupingsets"))
def groupingsets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (chosen key subsets, neither rollup nor
    cube) through the SQL entry — each set null-extends the other key."""
    from ..io import register_views
    register_views(spark, sf_dir, ["lineitem"])
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n_items,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
                 AS total_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """)


@register("agg_regression", oracle="""
WITH t AS (
  SELECT event_type,
         CAST(hour(ts) AS DOUBLE) AS x,
         value AS y
  FROM events
), s AS (
  SELECT event_type,
         COUNT(*) AS n,
         CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(y AS DECIMAL(38,6))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(x * y AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(x * x AS DECIMAL(38,6))) AS DOUBLE) AS sxx
  FROM t GROUP BY event_type
)
SELECT event_type, n,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 8) AS slope,
       ROUND((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 8)
         AS intercept
FROM s
""", tags=("agg", "regression"))
def agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group least-squares regression (value vs hour-of-day) from
    closed-form sufficient statistics — n, Σx, Σy, Σxy, Σx² — each a
    decimal-exact sum, so slope/intercept are deterministic on any
    cluster (the built-in regr_slope aggregates doubles and is not).
    One hash aggregation; the regression math is a projection. This is
    how model-ish statistics stay cheap at 100 TB: sufficient
    statistics shuffle, never rows."""
    e = load_table(spark, sf_dir, "events")
    x = F.hour("ts").cast("double")
    y = F.col("value")
    n = F.count(F.lit(1))
    sx = F.sum(x.cast(DEC)).cast("double")
    sy = F.sum(y.cast(DEC)).cast("double")
    sxy = F.sum((x * y).cast(DEC)).cast("double")
    sxx = F.sum((x * x).cast(DEC)).cast("double")
    s = (e.groupBy("event_type")
         .agg(n.alias("n"), sx.alias("sx"), sy.alias("sy"),
              sxy.alias("sxy"), sxx.alias("sxx")))
    slope = ((F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
             / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")))
    intercept = (F.col("sy") - slope * F.col("sx")) / F.col("n")
    return s.select("event_type", "n",
                    F.round(slope, 8).alias("slope"),
                    F.round(intercept, 8).alias("intercept"))


@register("agg_quantile_array", oracle="""
SELECT o_orderpriority,
       ROUND(quantile_cont(o_totalprice, 0.25), 4) AS q25,
       ROUND(quantile_cont(o_totalprice, 0.50), 4) AS q50,
       ROUND(quantile_cont(o_totalprice, 0.75), 4) AS q75,
       ROUND(quantile_cont(o_totalprice, 0.95), 4) AS q95
FROM orders
GROUP BY o_orderpriority
""", tags=("agg", "percentile"))
def agg_quantile_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-quantile profile in ONE aggregation: percentile() with an
    array of probabilities computes all four cut points in a single
    pass/shuffle (vs four separate sorted aggregations) — the quantile
    fan-out pattern for monitoring dashboards over wide fact tables.
    Exact interpolated quantiles, same definition both engines."""
    e = load_table(spark, sf_dir, "orders")
    q = F.percentile("o_totalprice",
                     F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75),
                             F.lit(0.95)))
    return (e.groupBy("o_orderpriority")
            .agg(q.alias("_q"))
            .select("o_orderpriority",
                    F.round(F.col("_q")[0], 4).alias("q25"),
                    F.round(F.col("_q")[1], 4).alias("q50"),
                    F.round(F.col("_q")[2], 4).alias("q75"),
                    F.round(F.col("_q")[3], 4).alias("q95")))


@register("agg_modern_funcs", oracle="""
SELECT event_type,
       CAST(count_if(value > 100) AS BIGINT) AS n_big,
       bool_and(value >= 0) AS all_nonneg,
       bool_or(value > 450) AS any_huge,
       CAST(COUNT(*) FILTER (WHERE user_id % 2 = 0) AS BIGINT)
         AS n_even_users
FROM events
GROUP BY event_type
""", tags=("agg", "modern"))
def agg_modern_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The modern aggregate-function pack: count_if, bool_and/bool_or,
    and FILTER-style conditional counting — all single-pass partial
    aggregates (no expansion, no second scan), identical names and
    semantics in both engines."""
    e = load_table(spark, sf_dir, "events")
    return (e.groupBy("event_type")
            .agg(F.count_if(F.col("value") > 100).alias("n_big"),
                 F.bool_and(F.col("value") >= 0).alias("all_nonneg"),
                 F.bool_or(F.col("value") > 450).alias("any_huge"),
                 F.count_if(F.col("user_id") % 2 == 0)
                  .alias("n_even_users")))


@register("agg_hll_sketch", oracle=None, tags=("agg", "approx", "sketch"))
def agg_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persistable, MERGEABLE distinct-count sketches (Spark 4 Datasketches
    HLL): per-event-type sketches built once, then UNIONED into a global
    estimate without revisiting the data — the incremental-rollup
    pattern for distinct users across arbitrary slices (store the
    sketch column per partition/day; any later union answers any
    slice). Rows-only: the sketch encoding is engine-specific;
    tests/test_sketches.py bounds both the per-group and the
    union-merged estimates against exact distinct counts."""
    e = load_table(spark, sf_dir, "events")
    per_type = (e.groupBy("event_type")
                .agg(F.hll_sketch_agg("user_id").alias("sk"),
                     F.countDistinct("user_id").alias("exact_users")))
    merged = per_type.agg(
        F.lit("__all__").alias("event_type"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
        F.max(F.lit(None).cast("long")).alias("exact_users_merged"))
    per_type_out = per_type.select(
        "event_type",
        F.hll_sketch_estimate("sk").alias("approx_users"),
        F.col("exact_users").cast("long").alias("exact_users_merged"))
    return per_type_out.unionAll(merged).orderBy("event_type")


@register("agg_argmax", oracle="""
WITH per AS (
  SELECT event_type, user_id,
         SUM(CAST(value AS DECIMAL(38,6))) AS x_dec
  FROM events GROUP BY event_type, user_id
), ranked AS (
  SELECT event_type, user_id, x_dec,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY x_dec DESC, user_id) AS rn
  FROM per
)
SELECT event_type, user_id AS top_user,
       ROUND(CAST(x_dec AS DOUBLE), 6) AS top_value
FROM ranked WHERE rn = 1
""", tags=("agg", "argmax"))
def agg_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arg_max with a deterministic tie policy: the user holding the
    maximum total value per event type, ties broken by lowest user_id.
    Built as rank-1-per-group rather than the engines' native
    arg_max/max_by, whose tie choice is unspecified (and DuckDB's
    cannot order on a composite without the printf trick — see
    events_ohlc) — the row-number formulation makes the SAME row win
    in both engines by construction.

    Shape: one map-side-combinable shuffle to per-(type,user) sums,
    then a per-type window over |users-per-type| rows. The window
    partitions on the group key, so there is no single-partition
    bottleneck at any scale."""
    e = load_table(spark, sf_dir, "events")
    per = e.groupBy("event_type", "user_id").agg(
        F.sum(F.col("value").cast("decimal(38,6)")).alias("x_dec"))
    from pyspark.sql import Window
    w = Window.partitionBy("event_type").orderBy(F.desc("x_dec"), "user_id")
    return (per.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("event_type", F.col("user_id").alias("top_user"),
                    F.round(F.col("x_dec").cast("double"), 6)
                     .alias("top_value")))


@register("agg_moments", oracle="""
WITH q AS (
  SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS x
  FROM lineitem
), sums AS (
  SELECT flag,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(CAST(SUM(x) AS BIGINT) AS DOUBLE) AS s1,
         CAST(CAST(SUM(x * x) AS BIGINT) AS DOUBLE) AS s2,
         CAST(CAST(SUM(x * x * x) AS BIGINT) AS DOUBLE) AS s3,
         CAST(CAST(SUM(x * x * x * x) AS BIGINT) AS DOUBLE) AS s4
  FROM q GROUP BY flag
)
SELECT flag, n,
       ROUND(s1 / n, 6) AS mean,
       ROUND((s2 - s1 * s1 / n) / n, 6) AS m2,
       ROUND(((s3 - 3 * (s1 / n) * s2 + 2 * n * (s1 / n) * (s1 / n) * (s1 / n)) / n)
             / POW((s2 - s1 * s1 / n) / n, 1.5), 6) AS skewness,
       ROUND(((s4 - 4 * (s1 / n) * s3 + 6 * (s1 / n) * (s1 / n) * s2
               - 3 * n * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n)) / n)
             / POW((s2 - s1 * s1 / n) / n, 2) - 3, 6) AS excess_kurtosis
FROM sums
""", tags=("agg", "stats"))
def agg_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewness and excess kurtosis per group from EXACT decimal power
    sums — the engines' built-in skewness/kurtosis use different
    streaming update formulas (not bit-comparable), so this computes
    the raw moments S1..S4 exactly as BIGINT (quantity is an integer
    <= 50, so x^4 <= 6.25e6; the sums stay inside a long well past
    sf100), casts once to double, and evaluates the SAME central-
    moment polynomial on both engines. Every floating step after the
    casts is an identical operand sequence; pow(x,1.5|2) is
    sqrt-composed/exactly-squared and IEEE-stable, rounded at 6 dp.

    The power sums are one map-side-combinable aggregation — the same
    one-pass sufficient-statistics shape as agg_regression, which is
    the 100 TB pattern: moments of any order are a single scan."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("long")
    sums = (li.groupBy(F.col("l_returnflag").alias("flag"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(x).cast("double").alias("s1"),
                 F.sum(x * x).cast("double").alias("s2"),
                 F.sum(x * x * x).cast("double").alias("s3"),
                 F.sum(x * x * x * x).cast("double").alias("s4")))
    n, s1, s2, s3, s4 = (F.col(c) for c in ("n", "s1", "s2", "s3", "s4"))
    mu = s1 / n
    m2 = (s2 - s1 * s1 / n) / n
    m3 = (s3 - 3 * mu * s2 + 2 * n * mu * mu * mu) / n
    m4 = (s4 - 4 * mu * s3 + 6 * mu * mu * s2 - 3 * n * mu * mu * mu * mu) / n
    return sums.select(
        "flag", "n",
        F.round(mu, 6).alias("mean"),
        F.round(m2, 6).alias("m2"),
        F.round(m3 / F.pow(m2, 1.5), 6).alias("skewness"),
        F.round(m4 / F.pow(m2, 2) - 3, 6).alias("excess_kurtosis"))


@register("agg_multi_distinct", oracle="""
SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
       CAST(COUNT(DISTINCT strftime(date_trunc('day', ts), '%Y-%m-%d'))
            AS BIGINT) AS n_days,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events
""", tags=("agg", "distinct"))
def agg_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple exact COUNT(DISTINCT ...) over different columns in ONE
    aggregation — the query shape behind Spark's Expand operator: the
    input is replicated once per distinct spec with the other columns
    nulled, then a single two-phase aggregate dedups all three streams
    together. Worth pinning because the naive alternative (three
    separate jobs + a join) triple-scans the fact; the Expand plan
    scans once at the cost of a 3x shuffle row multiplier — the right
    trade when the scan dominates, which at 100 TB it does.
    (agg_distinct covers the single-distinct case; agg_hll_sketch is
    the approximate escape when even the expanded shuffle is too hot.)"""
    e = load_table(spark, sf_dir, "events")
    return e.agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("event_type").alias("n_types"),
        F.countDistinct(F.date_format(F.date_trunc("day", "ts"),
                                      "yyyy-MM-dd")).alias("n_days"),
        F.count(F.lit(1)).alias("n_events"))


@register("agg_listagg", oracle="""
WITH du AS (
  SELECT DISTINCT event_type, user_id
  FROM events WHERE user_id < 15
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       string_agg(CAST(user_id AS VARCHAR), ',' ORDER BY user_id)
         AS user_csv
FROM du
GROUP BY event_type
ORDER BY event_type
""", tags=("agg", "listagg"))
def agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-standard ordered string aggregation (Spark 4 ``listagg …
    WITHIN GROUP (ORDER BY …)`` — DuckDB's ``string_agg(… ORDER BY)``):
    the report-friendly cousin of agg_collect's array output. The
    WITHIN GROUP ordering is the part that matters: an unordered
    string_agg is nondeterministic under partial aggregation, exactly
    the trap the registry's determinism discipline (explicit ordering
    on anything order-sensitive) exists to catch. Input bounded to a
    distinct (type, user<15) frame so the group strings stay small at
    every scale."""
    e = load_table(spark, sf_dir, "events")
    du = (e.filter(F.col("user_id") < 15)
          .select("event_type", "user_id").distinct())
    du.createOrReplaceTempView("_listagg_du")
    return du.sparkSession.sql("""
        SELECT event_type,
               COUNT(*) AS n_users,
               listagg(CAST(user_id AS STRING), ',')
                 WITHIN GROUP (ORDER BY user_id) AS user_csv
        FROM _listagg_du
        GROUP BY event_type
        ORDER BY event_type
    """)


# --------------------------------------------------------------------------
# Deterministic HyperLogLog (round 10, third wave): the sketch itself
# cross-engine replayed. agg_hll_sketch (Datasketches) stays the
# production face — this twin swaps the engine hash for md5 and every
# float accumulation for exact integers, so the DuckDB oracle rebuilds
# the registers AND the estimate bit-for-bit. The one float step left
# is the final alpha*m^2/Z division — identical IEEE ops on identical
# operands. Flajolet et al.'s raw estimator only (n >> 2.5m on the
# fixture, so no small-range branch — branches over ln() would be the
# first engine-dependent float path).

_HLL_P = 6                       # 2^6 = 64 registers
_HLL_M = 1 << _HLL_P
_HLL_WBITS = 48 - _HLL_P         # 42-bit register-selector remainder


def _hll_rho_case(col: str) -> str:
    """rho(w) = leading zeros of the 42-bit remainder + 1, as a pure
    integer CASE chain (descending power-of-two thresholds). The SAME
    string runs as a Spark expression and inside the DuckDB oracle —
    no log2() anywhere, because floor(log2(x)) at a power-of-two
    boundary is exactly where libm implementations may disagree."""
    branches = " ".join(
        f"WHEN {col} >= {1 << (_HLL_WBITS - 1 - i)} THEN {i + 1}"
        for i in range(_HLL_WBITS))
    return f"(CASE WHEN {col} = 0 THEN {_HLL_WBITS + 1} {branches} END)"


#: Final-estimate expression, shared textually: alpha_m * m^2 * 2^43
#: / S where S = SUM over all m registers of 2^(43 - M_j) — an exact
#: BIGINT (M_j <= 43, 64 terms < 2^49). Snapped to a 1e-4 grid with
#: FLOOR, not ROUND: ROUND is the one grid op the engines implement
#: differently (Spark re-rounds the shortest decimal repr, DuckDB the
#: binary value — they split on 1533.20875 at sf0.01), while FLOOR of
#: an identical double is pure IEEE and cannot diverge.
#: (Literals ride CAST(.. AS DOUBLE): Spark parses bare decimal
#: literals as DECIMAL and would carry decimal scale into the output
#: type — the values match but the driver's string compare sees
#: '1533.208700' vs '1533.2087'.)
_HLL_RAW = ("CAST(0.7213 AS DOUBLE) / (1.0 + CAST(1.079 AS DOUBLE) "
            "/ 64.0) * 4096.0 * 8796093022208.0 / s_total")
_HLL_EST = (f"CAST(FLOOR(({_HLL_RAW}) * 10000.0) AS DOUBLE) / 10000.0")
_HLL_ERR = (f"CAST(FLOOR((({_HLL_EST}) - CAST(n_exact AS DOUBLE)) "
            f"/ n_exact * 1000000.0) AS DOUBLE) / 1000000.0")


@register("agg_hll_det", oracle=f"""
WITH h AS (SELECT CAST(CAST('0x' || substr(md5(CAST(o_custkey AS VARCHAR)),
                             1, 12) AS UBIGINT) AS BIGINT) AS h
           FROM orders),
parts AS (SELECT h >> {_HLL_WBITS} AS bucket,
                 h & {(1 << _HLL_WBITS) - 1} AS w
          FROM h),
regs AS (SELECT bucket, MAX({_hll_rho_case('w')}) AS m_reg
         FROM parts GROUP BY bucket),
s AS (SELECT COUNT(*) AS n_buckets,
             SUM(CAST(1 AS BIGINT) << ({_HLL_WBITS + 1} - m_reg))
                 AS s_obs
      FROM regs),
tot AS (SELECT CAST(s_obs + ({_HLL_M} - n_buckets)
                    * (CAST(1 AS BIGINT) << {_HLL_WBITS + 1})
                AS BIGINT) AS s_total
        FROM s),
ex AS (SELECT COUNT(DISTINCT o_custkey) AS n_exact FROM orders)
SELECT CAST(n_exact AS BIGINT) AS n_exact,
       {_HLL_EST} AS n_est,
       {_HLL_ERR} AS err
FROM ex, tot
""", tags=("agg", "approx", "sketch"))
def agg_hll_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic HyperLogLog distinct-count of order customers —
    ORACLE-BACKED, registers and all: md5-hashed 48-bit values split
    into 6 bucket bits + 42 remainder bits, rho via a shared integer
    CASE chain (no log2 — libm-boundary-proof), per-bucket MAX(rho)
    registers, and the harmonic sum accumulated as EXACT BIGINTs
    (Σ 2^(43-M_j), 64 terms < 2^49) so engine summation order cannot
    matter; the single float step is the final alpha·m²/Z division,
    identical IEEE ops in both engines. Raw Flajolet estimator only:
    the fixture cardinality (1500 >> 2.5·64) sits squarely in its
    regime, and the small-range ln() branch would reintroduce the
    engine-dependent float path this twin exists to eliminate.

    Scale shape: ONE map-side-combinable groupBy over 64 bucket keys
    — the sketch property (registers merge by MAX) is what makes HLL
    the 100 TB distinct-count answer, and mergeability of THIS
    implementation is pinned in tests/test_sketches.py (per-priority
    registers MAX-merged == global registers). The estimate lands
    within the published ~1.04/sqrt(64) = 13% band (asserted)."""
    o = load_table(spark, sf_dir, "orders")
    h = o.select(F.expr(
        "CAST(conv(substr(md5(CAST(o_custkey AS STRING)), 1, 12), 16, 10) "
        "AS BIGINT)").alias("h"))
    parts = h.select(
        F.expr(f"shiftright(h, {_HLL_WBITS})").alias("bucket"),
        F.expr(f"h & {(1 << _HLL_WBITS) - 1}").alias("w"))
    regs = (parts.select("bucket",
                         F.expr(_hll_rho_case("w")).alias("rho"))
            .groupBy("bucket").agg(F.max("rho").alias("m_reg")))
    s = regs.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), "
                     f"{_HLL_WBITS + 1} - m_reg)")).alias("s_obs"))
    tot = s.select(
        (F.col("s_obs") + (F.lit(_HLL_M) - F.col("n_buckets"))
         * F.lit(1 << (_HLL_WBITS + 1))).cast("long").alias("s_total"))
    ex = o.agg(F.countDistinct("o_custkey").alias("n_exact"))
    return (ex.crossJoin(F.broadcast(tot))   # two 1-row frames
            .select(F.col("n_exact").cast("long").alias("n_exact"),
                    F.expr(_HLL_EST).alias("n_est"),
                    F.expr(_HLL_ERR).alias("err")))
