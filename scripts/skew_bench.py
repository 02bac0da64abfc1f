#!/usr/bin/env python
"""Measured skew demonstration: salted vs unsalted vs AQE on a REAL
zipf-skewed join (SCALING.md's skew section was argued from plan shape
until round 5 — this script converts it to wall + max-task numbers).

Data: events inflated 64x (~6.4M rows) with the engine-portable zipf
key from queries/scale.py (ZIPF_KEY_SQL): ~50% of all fact rows share
key 1. The join is fact x per-key dim on the skewed key with the merge
hint and broadcast disabled — the shape where a sort-merge join pins
the hot key's entire volume on one reducer.

Variants:
- unsalted (AQE off)      — the degenerate baseline: one straggler task
- AQE skew-join (default) — runtime split of the oversized partition
- salted 16x (AQE off)    — explicit (key, salt) spread, the fallback
                            when AQE's split granularity isn't enough

Metrics per variant: wall seconds and the MAX single task duration of
the stages the run created (Spark UI REST /taskSummary, quantile 1.0) —
max-task is the number skew actually shows up in.

Usage: python scripts/skew_bench.py [--inflate 64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from integrator_spark.io import derived_dir, load_table  # noqa: E402
from integrator_spark.queries.scale import zipf_key  # noqa: E402
from integrator_spark.session import RUNTIME_CONFS  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def api(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}{path}",
                                timeout=10) as r:
        return json.loads(r.read())


def completed_stage_ids(spark) -> set[int]:
    return {s["stageId"] for s in api(spark, "/stages?status=complete")}


def max_task_ms(spark, new_stages: set[int]) -> tuple[float, int]:
    """(max single-task duration ms, its stageId) across the stages."""
    worst, worst_sid = 0.0, -1
    for sid in new_stages:
        try:
            summ = api(spark, f"/stages/{sid}/0/taskSummary?quantiles=1.0")
            d = summ.get("duration", [0.0])[0]
            if d > worst:
                worst, worst_sid = d, sid
        except Exception:
            continue
    return worst, worst_sid


def run_variant(spark, name: str, thunk) -> dict:
    spark.sparkContext.setJobGroup(name, name)
    before = completed_stage_ids(spark)
    t0 = time.perf_counter()
    thunk()
    wall = time.perf_counter() - t0
    time.sleep(0.5)  # let the UI store catch up
    new = completed_stage_ids(spark) - before
    mt, sid = max_task_ms(spark, new)
    print(f"{name}: wall={wall:.2f}s max_task={mt / 1000:.2f}s "
          f"(stage {sid}, {len(new)} stages)", flush=True)
    return {"variant": name, "wall_s": round(wall, 2),
            "max_task_s": round(mt / 1000, 2)}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--inflate", type=int, default=64)
    args = ap.parse_args()

    b = (SparkSession.builder.master(f"local[{os.cpu_count()}]")
         .appName("skew-bench")
         .config("spark.ui.enabled", "true")
         .config("spark.driver.memory", "8g"))
    for k, v in RUNTIME_CONFS.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    # --- build the zipf-skewed fact table (deterministic inflation) ---
    path = derived_dir(SF_DIR, "zipf_fact", f"x{args.inflate}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        e = load_table(spark, SF_DIR, "events").select("event_id", "value")
        # Offset by max+1, not count: copies must not collide if the id
        # domain is ever sparse or 1-based (bench_sf1.py does the same).
        span = int(e.agg(F.max("event_id")).first()[0]) + 1
        copies = [e.withColumn("event_id", F.col("event_id") + F.lit(i * span))
                  for i in range(args.inflate)]
        fact = copies[0]
        for c in copies[1:]:
            fact = fact.unionByName(c)
        (fact.withColumn("skew_key", zipf_key())
         .write.mode("overwrite").parquet(path))
    fact = spark.read.parquet(path)
    n_rows = fact.count()
    hot = (fact.groupBy("skew_key").count()
           .orderBy(F.desc("count")).limit(3).collect())
    print(f"fact rows={n_rows}; hottest keys: "
          f"{[(r['skew_key'], r['count']) for r in hot]}", flush=True)

    dim = fact.groupBy(F.col("skew_key").alias("dk")) \
              .agg(F.count(F.lit(1)).alias("key_total"))
    dim.cache().count()

    def sink(df):
        df.write.format("noop").mode("overwrite").save()

    def set_confs(aqe: bool):
        spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(aqe).lower())

    def unsalted():
        j = fact.hint("merge").join(dim, fact["skew_key"] == dim["dk"])
        sink(j.groupBy("skew_key")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.min("key_total").alias("kt"),
                  F.sum("value").alias("tv")))

    def salted():
        buckets = 16
        ds = dim.withColumn(
            "salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))))
        fs = fact.withColumn(
            "salt", F.pmod(F.xxhash64("event_id"), F.lit(buckets)).cast("int"))
        j = fs.hint("merge").join(
            ds, (fs["skew_key"] == ds["dk"]) & (fs["salt"] == ds["salt"]))
        sink(j.groupBy("skew_key")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.min("key_total").alias("kt"),
                  F.sum("value").alias("tv")))

    results = []
    # warm the input cache/page cache once
    sink(fact.select(F.count(F.lit(1)).alias("c")))

    set_confs(aqe=False)
    results.append(run_variant(spark, "join_unsalted_noaqe", unsalted))
    set_confs(aqe=True)
    results.append(run_variant(spark, "join_unsalted_aqe_skew", unsalted))
    set_confs(aqe=False)
    results.append(run_variant(spark, "join_salted16_noaqe", salted))
    set_confs(aqe=True)

    print("\n| variant | wall s | max task s |")
    print("| ------- | ------ | ---------- |")
    for r in results:
        print(f"| {r['variant']} | {r['wall_s']} | {r['max_task_s']} |")
    print(json.dumps({"rows": n_rows, "results": results}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
