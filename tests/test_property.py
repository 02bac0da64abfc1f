"""Property-based mini-sqllogictest (SURVEY.md §5.2): randomized simple
predicates evaluated by both engines over the same parquet must agree
on count and an exact integer checksum. Catches comparison-semantics
drift (null handling, boundary inclusivity, string collation) that
fixed queries might miss.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from integrator_spark.io import load_table

from .conftest import TEST_SF_DIR

STATUSES = ["F", "O", "P"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]

predicate = st.fixed_dictionaries({
    "statuses": st.lists(st.sampled_from(STATUSES), min_size=1, max_size=3,
                         unique=True),
    "price_lo": st.integers(min_value=0, max_value=300_000),
    "price_span": st.integers(min_value=0, max_value=300_000),
    "priority": st.one_of(st.none(), st.sampled_from(PRIORITIES)),
    "negate": st.booleans(),
})


@settings(max_examples=20, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(p=predicate)
def test_random_filters_agree_with_duckdb(p, spark, duck):
    lo, hi = p["price_lo"], p["price_lo"] + p["price_span"]
    in_list = ", ".join(f"'{s}'" for s in p["statuses"])
    clauses = [f"o_orderstatus IN ({in_list})",
               f"o_totalprice BETWEEN {lo} AND {hi}"]
    if p["priority"] is not None:
        clauses.append(f"o_orderpriority = '{p['priority']}'")
    where = " AND ".join(clauses)
    if p["negate"]:
        where = f"NOT ({where})"

    o = load_table(spark, TEST_SF_DIR, "orders")
    cond = (F.col("o_orderstatus").isin(p["statuses"])
            & F.col("o_totalprice").between(F.lit(lo), F.lit(hi)))
    if p["priority"] is not None:
        cond = cond & (F.col("o_orderpriority") == p["priority"])
    if p["negate"]:
        cond = ~cond
    got = (o.filter(cond)
           .agg(F.count(F.lit(1)).alias("n"),
                F.coalesce(F.sum("o_orderkey"), F.lit(0)).alias("chk"))
           .collect()[0])

    want = duck.execute(
        f"SELECT COUNT(*), COALESCE(SUM(o_orderkey), 0) FROM orders WHERE {where}"
    ).fetchone()
    assert (got.n, got.chk) == want


AGG_KEYS = ["o_orderstatus", "o_orderpriority"]


@settings(max_examples=15, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(key=st.sampled_from(AGG_KEYS),
       lo=st.integers(min_value=0, max_value=400_000),
       use_distinct=st.booleans())
def test_random_aggregations_agree_with_duckdb(key, lo, use_distinct, spark, duck):
    """Randomized aggregation grammar: group key x filter x (count |
    count-distinct | integer checksum) must match DuckDB exactly."""
    o = load_table(spark, TEST_SF_DIR, "orders").filter(F.col("o_totalprice") >= lo)
    agg = (F.countDistinct("o_custkey") if use_distinct
           else F.coalesce(F.sum("o_orderkey"), F.lit(0)))
    got = sorted((r[0], r[1]) for r in
                 o.groupBy(key).agg(agg.alias("m")).collect())
    expr = ("COUNT(DISTINCT o_custkey)" if use_distinct
            else "COALESCE(SUM(o_orderkey), 0)")
    want = sorted(duck.execute(
        f"SELECT {key}, {expr} FROM orders WHERE o_totalprice >= {lo} "
        f"GROUP BY {key}").fetchall())
    assert got == want


@settings(max_examples=20, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(values=st.lists(
    st.decimals(min_value="0", max_value="999999.99", places=2),
    min_size=1, max_size=200))
def test_grid_long_sum_equals_decimal_sum(values, spark):
    # Property behind dsum_grid: for non-negative values on a 2-dp grid
    # (money), the long micro-accumulator and the DECIMAL(18,6) cast
    # path produce THE SAME double, including after a 2-dp x 2-dp
    # product (4-dp grid). Exercises ties, tiny and near-max magnitudes.
    from integrator_spark.functions.num import dsum, dsum_grid

    rows = [(float(v), float(v) * 0.07) for v in values]  # 2dp and 4dp
    df = spark.createDataFrame(rows, "a double, b double")
    got = df.agg(dsum_grid("a").alias("ga"), dsum("a").alias("da"),
                 dsum_grid(F.col("a") * (1 - F.lit(0.07))).alias("gp"),
                 dsum(F.col("a") * (1 - F.lit(0.07))).alias("dp")).collect()[0]
    assert got.ga == got.da
    assert got.gp == got.dp
