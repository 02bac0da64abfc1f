"""Bucketed-table co-located join (SURVEY.md §4 / pyspark guide):
writing both fact tables bucketed on the join key lets the join run
WITHOUT any shuffle exchange — the layout strategy for repeated
fact-fact joins at 100 TB. Exercised as a test (bucketed tables need a
session catalog + warehouse, which the external driver's session may
not configure)."""

from __future__ import annotations

from pyspark.sql import functions as F

from integrator_spark.io import load_table
from integrator_spark.plans.audit import plan_string

from .conftest import TEST_SF_DIR


def test_bucketed_join_has_no_shuffle(spark):
    o = load_table(spark, TEST_SF_DIR, "orders")
    c = load_table(spark, TEST_SF_DIR, "customer")
    (o.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
     .mode("overwrite").saveAsTable("b_orders"))
    (c.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
     .mode("overwrite").saveAsTable("b_customer"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (spark.table("b_orders")
             .join(spark.table("b_customer"),
                   F.col("o_custkey") == F.col("c_custkey"))
             .groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n")))
        plan = plan_string(j)
        join_part = plan.split("HashAggregate")[0]
        assert "Exchange" not in join_part, plan[:3000]
        got = {r.c_mktsegment: r.n for r in j.collect()}
        want = {r.c_mktsegment: r.n for r in
                (o.join(c, F.col("o_custkey") == F.col("c_custkey"))
                 .groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n"))
                 .collect())}
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")
