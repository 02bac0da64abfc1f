"""RocksDB vs HDFS-map state-store crossover (round-12 verdict item 4).

BENCH_r11 showed the RocksDB provider 3.2x SLOWER than the default
HDFS-backed map provider on the toy session-window drain (95k state
rows) — expected JNI/SST overhead at toy state, but the repo never
measured the regime RocksDB exists for: resident state large enough
that keeping every key as JVM objects on-heap (what the HDFS provider
does) becomes the bottleneck. This script drives a keyed-count
aggregation with K resident keys (seed batch touches all K, then 10
update batches touch K/50 each — the steady-state shape: big store,
small per-batch delta) under three provider configs:

  hdfs       - default HDFSBackedStateStoreProvider (all keys on heap)
  rocksdb    - RocksDBStateStoreProvider, full-snapshot checkpointing
  rocksdb+cl - RocksDB + changelog checkpointing (commit uploads the
               per-batch changelog, snapshotting moves to background
               maintenance — the conf the Spark docs recommend for
               production streaming)

Outputs one JSON line per (provider, K) with wall seconds, per-batch
commit/update times from StateOperatorProgress, and store telemetry
(memoryUsedBytes / rocksdbSstFileSize). Findings go to SCALING.md.

Usage: python scripts/rocksdb_crossover.py [K ...]   (default sweep)
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from integrator_spark.session import build_session  # noqa: E402
from integrator_spark.streaming.jobs import ROCKSDB_PROVIDER  # noqa: E402

DERIVED = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "_derived", "rocksdb_crossover")

N_UPDATE_BATCHES = 10
TOUCH_FRACTION = 50   # each update batch touches K/50 keys

PROVIDERS = {
    "hdfs": {},
    "rocksdb": {
        "spark.sql.streaming.stateStore.providerClass": ROCKSDB_PROVIDER,
    },
    "rocksdb+cl": {
        "spark.sql.streaming.stateStore.providerClass": ROCKSDB_PROVIDER,
        "spark.sql.streaming.stateStore.rocksdb."
        "changelogCheckpointing.enabled": "true",
    },
}


def gen_input(spark, k: int) -> str:
    """Seed shard with all K keys, then N update shards touching
    K/TOUCH_FRACTION keys each (a rolling window over the keyspace).
    Files are written sequentially so modification-time ordering
    replays seed-first."""
    root = os.path.join(DERIVED, f"k{k}")
    if os.path.isdir(os.path.join(root, "_done")):
        return root
    shutil.rmtree(root, ignore_errors=True)
    seed = spark.range(k).select(F.col("id").alias("key"),
                                 (F.col("id") % 97).alias("v"))
    seed.coalesce(4).write.mode("overwrite").parquet(
        os.path.join(root, "shard_00"))
    touch = max(1, k // TOUCH_FRACTION)
    for j in range(1, N_UPDATE_BATCHES + 1):
        lo = (j * touch * 7) % k
        upd = (spark.range(touch)
               .select(((F.col("id") + lo) % k).alias("key"),
                       (F.col("id") % 89).alias("v")))
        upd.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(root, f"shard_{j:02d}"))
        time.sleep(0.05)  # distinct mtimes -> stable replay order
    os.makedirs(os.path.join(root, "_done"), exist_ok=True)
    return root


def drain(spark, root: str, provider: str, k: int) -> dict:
    confs = PROVIDERS[provider]
    old = {}
    for key, val in confs.items():
        try:
            old[key] = spark.conf.get(key)
        except Exception:
            old[key] = None
        spark.conf.set(key, val)
    qname = f"xover_{provider.replace('+', '_')}_{k}"
    ckpt = os.path.join(DERIVED, "ckpt", qname)
    shutil.rmtree(ckpt, ignore_errors=True)
    try:
        src = (spark.readStream.schema("key long, v long")
               .option("maxFilesPerTrigger", 1)
               .parquet(os.path.join(root, "shard_*")))
        agg = (src.groupBy("key")
               .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")))
        t0 = time.perf_counter()
        q = (agg.writeStream.format("memory").queryName(qname)
             .outputMode("update")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        wall = round(time.perf_counter() - t0, 3)
        batches = []
        for p in q.recentProgress:
            pj = json.loads(p.json) if not isinstance(p, dict) else p
            for so in pj.get("stateOperators") or []:
                cm = so.get("customMetrics") or {}
                batches.append({
                    "batch": pj.get("batchId"),
                    "rows_total": so.get("numRowsTotal"),
                    "rows_updated": so.get("numRowsUpdated"),
                    "update_ms": so.get("allUpdatesTimeMs"),
                    "commit_ms": so.get("commitTimeMs"),
                    "mem_bytes": so.get("memoryUsedBytes"),
                    "sst_bytes": cm.get("rocksdbSstFileSize"),
                })
        spark.sql(f"DROP TABLE IF EXISTS {qname}")
        return {"provider": provider, "k": k, "wall_sec": wall,
                "sum_commit_ms": sum(b["commit_ms"] or 0 for b in batches),
                "sum_update_ms": sum(b["update_ms"] or 0 for b in batches),
                "peak_mem_bytes": max((b["mem_bytes"] or 0)
                                      for b in batches) if batches else 0,
                "last_sst_bytes": (batches[-1]["sst_bytes"]
                                   if batches else None),
                "rows_total": (batches[-1]["rows_total"]
                               if batches else None),
                "batches": batches}
    finally:
        for key, val in old.items():
            if val is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, val)
        shutil.rmtree(ckpt, ignore_errors=True)


def main() -> None:
    ks = ([int(float(a)) for a in sys.argv[1:]]
          or [200_000, 1_000_000, 4_000_000, 10_000_000])
    spark = build_session("rocksdb-crossover")
    results = []
    # Warm-up drain (not recorded): the first streaming query in a
    # session pays JIT + state-store class-loading that would bias
    # whichever provider runs first (measured ~15 s on the first
    # 200k hdfs drain vs ~16 s at 1M in a warm session).
    warm_root = gen_input(spark, 50_000)
    for provider in ("hdfs", "rocksdb", "rocksdb+cl"):
        drain(spark, warm_root, provider, 50_000)
    for k in ks:
        root = gen_input(spark, k)
        # interleave providers per K (A/B discipline): ambient noise
        # hits all three columns alike
        for provider in ("hdfs", "rocksdb", "rocksdb+cl"):
            r = drain(spark, root, provider, k)
            results.append(r)
            print(json.dumps({kk: vv for kk, vv in r.items()
                              if kk != "batches"}), flush=True)
    out = os.path.join(DERIVED, "results.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote", out)
    spark.stop()


if __name__ == "__main__":
    main()
