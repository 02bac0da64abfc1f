#!/usr/bin/env python
"""PQ at routing scale: product quantization (operators/pq.py) on the
same 1.1M x dim-64 clustered corpus as scripts/ann_at_scale.py (IVF)
and scripts/graph_ann_at_scale.py (NN-Descent + beam) — completing the
measured three-way ANN comparison in SCALING.md so a user can choose a
path on numbers, and adding the axis the other two don't have:
STORAGE. PQ codes at m=8 are 8 bytes/vector vs 256 bytes of float32 —
the 100 TB embedding corpus becomes ~3 TB of scannable codes.

Measurements (markdown table for SCALING.md):
- exact ground truth for 2000 sampled queries (knn_search_broadcast)
- PQ build wall: train (100k sample, per-subspace k-means) + encode +
  write, and the on-disk code-table size vs the raw embedding table
- ADC search wall + recall@1 at shortlist 32 / 128 (exact rerank on
  top of both), ksub 64 and 256

Usage: OPENBLAS_NUM_THREADS=1 python scripts/pq_at_scale.py
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
from integrator_spark.operators.knn import knn_search_broadcast  # noqa: E402
from integrator_spark.operators.pq import (  # noqa: E402
    pq_encode,
    pq_search,
    pq_train,
)
from integrator_spark.session import build_session  # noqa: E402

from ann_at_scale import DIM, LATENT, N, QUERY_EVERY, generate  # noqa: E402


def dir_bytes(path: str) -> int:
    return sum(os.path.getsize(os.path.join(path, f))
               for f in os.listdir(path) if not f.startswith("_"))


def main() -> int:
    spark = build_session("pq-at-scale")
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

    results = []
    for ksub in (64, 256):
        t0 = time.perf_counter()
        cb = pq_train(emb, m=8, ksub=ksub, sample_rows=100_000, iters=10)
        t_train = time.perf_counter() - t0
        t0 = time.perf_counter()
        codes_path = derived_dir("/root/testdata/sf0.1", "bigknn",
                                 f"pq_codes_k{ksub}")
        pq_encode(emb, cb).write.mode("overwrite").parquet(codes_path)
        codes = spark.read.parquet(codes_path)
        t_encode = time.perf_counter() - t0
        code_bytes = dir_bytes(codes_path)
        print(f"ksub={ksub}: train {t_train:.1f}s encode+write "
              f"{t_encode:.1f}s codes={code_bytes / 1e6:.0f} MB "
              f"({raw_bytes / code_bytes:.1f}x smaller)", flush=True)
        for shortlist in (32, 128):
            t0 = time.perf_counter()
            got = {r["query_id"]: r["cos_sim"]
                   for r in pq_search(codes, emb, queries, cb, k=1,
                                      shortlist=shortlist)
                   .filter(F.col("rank") == 1).collect()}
            wall = time.perf_counter() - t0
            hits = sum(1 for qid, best in exact.items()
                       if got.get(qid, -2.0) >= best - 1e-6)
            rec = hits / len(exact)
            results.append((ksub, shortlist, t_train + t_encode,
                            raw_bytes / code_bytes, wall, rec))
            print(f"  shortlist={shortlist}: wall={wall:.1f}s "
                  f"recall@1={rec:.4f}", flush=True)

    print("\n| plan | build s | codes vs raw | search s | recall@1 |")
    print("| ---- | ------- | ------------ | -------- | -------- |")
    print(f"| exact knn_search_broadcast | — | 1x | {t_exact:.1f} | 1.0 |")
    for ksub, sl, build, ratio, wall, rec in results:
        print(f"| PQ m=8 ksub={ksub} shortlist={sl} | {build:.1f} | "
              f"{ratio:.1f}x | {wall:.1f} | {rec:.4f} |")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
