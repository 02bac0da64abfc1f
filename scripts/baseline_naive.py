#!/usr/bin/env python
"""Re-measure the BASELINE.md "naive PySpark" column under BOTH timing
protocols, so engine/bench ratios compare like with like.

The 10 headline queries in their straightforward, untuned PySpark
formulation (plain double sums, default join selection, no broadcast
hints, per-measure get_json_object, O(n^2) crossJoin kNN) — exactly the
shape a user would write first, NOT the engine's registered
implementations.

Two timing protocols per query (one warm-up collect first in both):
  rebuild  — build the DataFrame inside the timed region, then collect:
             each run pays Catalyst analysis/optimization again. This is
             what BENCH_r01/r02 measured.
  execute  — build once, collect N times: the plan is compiled once and
             cached on the DataFrame's QueryExecution; runs measure
             operator execution + scheduling, the steady-state cost a
             real client (cached plan / prepared statement) pays. This
             is what bench.py measures from round 3 on.

Prints one JSON line with both medians per query.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = 5


def _t(sf_dir, name):
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def q1(sf):
    li = _t(sf, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (li.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum("l_quantity"), F.sum("l_extendedprice"), F.sum(disc),
                 F.sum(disc * (1 + F.col("l_tax"))), F.avg("l_quantity"),
                 F.avg("l_extendedprice"), F.avg("l_discount"), F.count("*")))


def q3(sf):
    c = _t(sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(sf, "orders").filter(F.col("o_orderdate") < F.lit("1998-06-01").cast("timestamp"))
    li = _t(sf, "lineitem").filter(F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (c.join(o, c.c_custkey == o.o_custkey)
            .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
            .agg(F.sum(rev).alias("revenue"))
            .orderBy(F.col("revenue").desc(), "l_orderkey").limit(10))


def q5(sf):
    # Same date window as the engine's q5_nation_revenue — imported so
    # the paired engine/naive ratio compares identical work.
    from integrator_spark.queries.tpch import Q5_HI, Q5_LO
    c, s, n, r = (_t(sf, t) for t in ("customer", "supplier", "nation", "region"))
    o = _t(sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit(Q5_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q5_HI).cast("timestamp")))
    li = _t(sf, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (c.join(o, c.c_custkey == o.o_custkey)
            .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(s, (F.col("l_suppkey") == F.col("s_suppkey"))
                  & (F.col("c_nationkey") == F.col("s_nationkey")))
            .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
            .join(r.filter(F.col("r_name") == "ASIA"),
                  F.col("n_regionkey") == F.col("r_regionkey"))
            .groupBy("n_name").agg(F.sum(rev).alias("revenue"))
            .orderBy(F.col("revenue").desc()))


def agg_distinct(sf):
    return (_t(sf, "orders").groupBy("o_orderpriority")
            .agg(F.countDistinct("o_custkey"), F.count("*"), F.avg("o_totalprice")))


def window_topn(sf):
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (_t(sf, "orders")
            .select("o_orderpriority", "o_orderkey", "o_totalprice",
                    F.row_number().over(w).alias("rn"),
                    F.rank().over(w).alias("rk"),
                    F.dense_rank().over(w).alias("drk"))
            .filter(F.col("rn") <= 20))


def rollup_revenue(sf):
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (_t(sf, "lineitem").rollup("l_returnflag", "l_linestatus")
            .agg(F.grouping_id(), F.count("*"), F.sum(rev)))


def events_tumbling(sf):
    return (_t(sf, "events")
            .groupBy(F.window("ts", "1 hour"), "event_type")
            .agg(F.count("*"), F.sum("value")))


def events_json(sf):
    e = _t(sf, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (e.groupBy("event_type")
            .agg(F.count("*"),
                 F.avg(F.get_json_object("props", "$.k").cast("int")),
                 F.sum(F.when(k > 50, 1).otherwise(0))))


def docs_wordcount(sf):
    return (_t(sf, "documents")
            .select(F.explode(F.split(F.lower("text"), r"\s+")).alias("word"))
            .filter(F.length("word") > 3)
            .groupBy("word").count()
            .orderBy(F.col("count").desc(), "word").limit(20))


def vec_knn(sf):
    e = _t(sf, "embeddings")
    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x)
    a = e.select(F.col("vec_id").alias("ida"), F.col("embedding").alias("va"))
    b = e.select(F.col("vec_id").alias("idb"), F.col("embedding").alias("vb"))
    pairs = (a.crossJoin(b).filter(F.col("ida") != F.col("idb"))
             .select("ida", "idb",
                     (dot(F.col("va"), F.col("vb"))
                      / (F.sqrt(dot(F.col("va"), F.col("va")))
                         * F.sqrt(dot(F.col("vb"), F.col("vb"))))).alias("cos")))
    w = Window.partitionBy("ida").orderBy(F.col("cos").desc(), "idb")
    return pairs.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)


def web_url_dedup(sf):
    # The naive form a user ports from a single-machine crawler: a
    # row-at-a-time Python UDF around urllib.parse per URL, then the
    # same canonical-key groupBy. (The engine's face is pure JVM
    # regexp + HOF array filters.) The rendered raw URL uses the same
    # doc_id residue rules as integrator_spark/queries/web.py.
    from urllib.parse import parse_qsl, urlencode, urlsplit

    d = _t(sf, "documents")

    @F.udf("string")
    def canon(url):
        p = urlsplit(url)
        host = p.netloc.lower()
        if host.endswith(":443"):
            host = host[:-4]
        q = [(k, v) for k, v in parse_qsl(p.query)
             if not k.lower().startswith("utm_")]
        qs = ("?" + urlencode(q)) if q else ""
        return f"{p.scheme}://{host}{p.path}{qs}"

    ref = (F.col("doc_id") % 40).cast("string")
    cdn = F.concat(F.lit("cdn.src"), (F.col("doc_id") % 5).cast("string"),
                   F.lit(".example.com"))
    cdn = F.when(F.col("doc_id") % 2 == 1, F.upper(cdn)).otherwise(cdn)
    port = F.when(F.col("doc_id") % 3 == 0, F.lit(":443")).otherwise(F.lit(""))
    frag = F.when(F.col("doc_id") % 4 == 2, F.lit("#sec2")).otherwise(F.lit(""))
    raw = F.concat(F.lit("https://"), cdn, port, F.lit("/doc/"), ref,
                   F.lit("?utm_source=feed&id="), ref,
                   F.lit("&UTM_campaign=c"), (F.col("doc_id") % 3).cast("string"),
                   F.lit("&utm_content="), F.col("doc_id").cast("string"), frag)
    return (d.select("doc_id", canon(raw).alias("canon_url"))
            .groupBy("canon_url")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.min("doc_id").alias("keep_doc_id"))
            .filter(F.col("n_docs") > 1))


QUERIES = {
    "q1_pricing_summary": q1, "q3_top_orders": q3, "q5_nation_revenue": q5,
    "agg_distinct": agg_distinct, "window_topn": window_topn,
    "rollup_revenue": rollup_revenue, "events_tumbling": events_tumbling,
    "events_json": events_json, "docs_wordcount": docs_wordcount,
    "vec_knn": vec_knn, "web_url_dedup": web_url_dedup,
}

if __name__ == "__main__":
    spark = (SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]")
             .appName("baseline-naive")
             .config("spark.driver.memory", "8g")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.legacy.parquet.nanosAsLong", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["q1_pricing_summary"](SF_DIR).collect()   # session warm-up
    out = {}
    for name, fn in QUERIES.items():
        fn(SF_DIR).collect()                          # per-query warm-up
        rebuild, execute = [], []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            fn(SF_DIR).collect()
            rebuild.append(time.perf_counter() - t0)
        df = fn(SF_DIR)
        df.collect()
        for _ in range(RUNS):
            t0 = time.perf_counter()
            df.collect()
            execute.append(time.perf_counter() - t0)
        out[name] = {"rebuild": round(statistics.median(rebuild), 4),
                     "execute": round(statistics.median(execute), 4)}
    spark.stop()
    print(json.dumps({"sf_dir": SF_DIR, "runs": RUNS, "queries": out}))
