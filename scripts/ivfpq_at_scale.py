#!/usr/bin/env python
"""IVF-PQ at routing scale: the combined index (operators/pq.py
ivfpq_*) on the same 1.1M x dim-64 clustered corpus as
scripts/ann_at_scale.py — the configuration a 100 TB deployment would
actually run, and the measured answer to what scripts/pq_at_scale.py
shows about FLAT raw-vector PQ on clustered data (ADC shrinkage bias
~-0.29 with ranking noise ~0.04, comparable to within-cluster cosine
gaps -> mediocre recall at tight shortlists). Residual quantization
removes most of that: the residual's magnitude is the within-cell
spread, so the same 8-byte code budget spends its precision where the
neighbors actually differ.

Measurements (markdown rows for SCALING.md):
- build: coarse train + residual-codebook train + encode(+write,
  partitionBy(bucket)) wall, code-table bytes vs raw
- search at n_probe 8 / 32 (n_assign 1 and 2): wall + recall@1 vs the
  exact ground truth + scan fraction

Usage: OPENBLAS_NUM_THREADS=1 python scripts/ivfpq_at_scale.py
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("OMP_NUM_THREADS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from integrator_spark.io import derived_dir  # noqa: E402
from integrator_spark.operators.ivf import train_centroids  # noqa: E402
from integrator_spark.operators.knn import knn_search_broadcast  # noqa: E402
from integrator_spark.operators.pq import (  # noqa: E402
    ivfpq_encode,
    ivfpq_search,
    ivfpq_train,
)
from integrator_spark.session import build_session  # noqa: E402

from ann_at_scale import DIM, LATENT, N, QUERY_EVERY, generate  # noqa: E402

N_CELLS = 1024


def dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f))
                     for f in files if not f.startswith("_"))
    return total


def main() -> int:
    spark = build_session("ivfpq-at-scale")
    emb_path = generate(spark)
    emb = spark.read.parquet(emb_path)
    queries = emb.filter(F.col("vec_id") % QUERY_EVERY == 0)
    n_q = queries.count()
    raw_bytes = dir_bytes(emb_path)
    print(f"corpus={N} dim={DIM} latent={LATENT} queries={n_q} "
          f"raw={raw_bytes / 1e6:.0f} MB", flush=True)

    t0 = time.perf_counter()
    exact = {r["query_id"]: r["cos_sim"]
             for r in knn_search_broadcast(emb, queries, k=1).collect()}
    t_exact = time.perf_counter() - t0
    print(f"exact ground truth: {t_exact:.1f}s", flush=True)

    t0 = time.perf_counter()
    cent = train_centroids(emb, n_clusters=N_CELLS, sample_rows=100_000,
                           iters=10)
    cb = ivfpq_train(emb, cent, m=8, ksub=64, sample_rows=100_000, iters=10)
    t_train = time.perf_counter() - t0
    print(f"train: coarse {N_CELLS} cells + residual codebook "
          f"{t_train:.1f}s", flush=True)

    rows = []
    for n_assign in (1, 2):
        t0 = time.perf_counter()
        codes_path = derived_dir("/root/testdata/sf0.1", "bigknn",
                                 f"ivfpq_codes_a{n_assign}")
        # repartition("bucket") before the partitioned write: without
        # it every one of the 32 encode tasks writes its own file into
        # every bucket directory — 31,523 files measured for 1024
        # buckets, 258 MB of du for ~18 MB of data (the classic
        # small-files failure). With it each bucket is one task → one
        # file; at real scale the same line keeps file count = bucket
        # count instead of tasks × buckets.
        (ivfpq_encode(emb, cent, cb, n_assign=n_assign)
         .repartition("bucket")
         .write.mode("overwrite").partitionBy("bucket").parquet(codes_path))
        codes = spark.read.parquet(codes_path)
        t_encode = time.perf_counter() - t0
        code_bytes = dir_bytes(codes_path)
        print(f"n_assign={n_assign}: encode+write {t_encode:.1f}s "
              f"codes={code_bytes / 1e6:.0f} MB "
              f"({raw_bytes / code_bytes:.1f}x smaller)", flush=True)
        for n_probe in (8, 32):
            t0 = time.perf_counter()
            got = {r["query_id"]: r["cos_sim"]
                   for r in ivfpq_search(codes, emb, queries, cent, cb,
                                         n_probe=n_probe, k=1, shortlist=32)
                   .filter(F.col("rank") == 1).collect()}
            wall = time.perf_counter() - t0
            hits = sum(1 for qid, best in exact.items()
                       if got.get(qid, -2.0) >= best - 1e-6)
            rec = hits / len(exact)
            rows.append((n_assign, n_probe, t_train + t_encode,
                         raw_bytes / code_bytes, wall, rec,
                         n_probe / N_CELLS * n_assign))
            print(f"  n_probe={n_probe}: wall={wall:.1f}s "
                  f"recall@1={rec:.4f}", flush=True)

    # Serving shape: a small batch probes few distinct cells, so
    # prune_buckets turns the probe bound into directory pruning on
    # the partitionBy("bucket") code layout (same shape as the IVF
    # serve measurement in ann_at_scale.py).
    codes1 = spark.read.parquet(
        derived_dir("/root/testdata/sf0.1", "bigknn", "ivfpq_codes_a1"))
    serve_q = emb.filter(F.col("vec_id") % 34375 == 0)   # 32 queries
    for pruned in (False, True):
        t0 = time.perf_counter()
        n_out = ivfpq_search(codes1, emb, serve_q, cent, cb, n_probe=8,
                             k=1, shortlist=32,
                             prune_buckets=pruned).count()
        print(f"serve 32 queries n_probe=8 prune_buckets={pruned}: "
              f"{time.perf_counter() - t0:.1f}s ({n_out} rows)", flush=True)

    print("\n| plan | build s | codes vs raw | search s | recall@1 "
          "| ~scan frac |")
    print("| ---- | ------- | ------------ | -------- | -------- "
          "| ---------- |")
    print(f"| exact knn_search_broadcast | — | 1x | {t_exact:.1f} "
          f"| 1.0 | 100% |")
    for na, npb, build, ratio, wall, rec, frac in rows:
        print(f"| IVFPQ a={na} probe={npb} shortlist=32 | {build:.1f} | "
              f"{ratio:.1f}x | {wall:.1f} | {rec:.4f} | "
              f"{frac * 100:.1f}% |")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
