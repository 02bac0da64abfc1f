#!/usr/bin/env python
"""ANN at routing scale: IVF (operators/ivf.py) on a 1.1M x dim-64
corpus, with exact ground truth from knn_search_broadcast — the
companion to scripts/knn_at_scale.py. That script proved the EXACT
path stays runnable above the broadcast budget (787 s of honest n²
BLAS); this one measures what the product actually does at that n:
probe-bounded IVF search plus an exact query-broadcast lookup, both in
seconds.

Corpus: deterministic CLUSTERED embeddings (512 latent clusters;
vector = normalize(alpha * centroid[id % 512] + noise), both from
splitmix64 counters — no RNG state). Clustered is the regime real
text/image embeddings live in and the one IVF is built for; the
isotropic table from knn_at_scale.py is kept for the exact-path
routing test precisely because it is IVF-adversarial (documented in
queries/scale.py::vec_ann_ivf).

Measurements (printed as a markdown table for SCALING.md):
- exact ground truth for 2000 sampled queries via knn_search_broadcast
  (broadcast the queries, stream the corpus — never collects it)
- IVF build (train on 100k sample + full assign) wall
- IVF search at n_probe 1 / 8 / 32: wall + recall@1 (value-based: hit
  if approx best >= exact best - 1e-6) + corpus scan fraction

Usage: OPENBLAS_NUM_THREADS=1 python scripts/ann_at_scale.py
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("OMP_NUM_THREADS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from integrator_spark.io import derived_dir  # noqa: E402
from integrator_spark.operators.ivf import (  # noqa: E402
    ivf_assign,
    ivf_search,
    train_centroids,
)
from integrator_spark.operators.knn import knn_search_broadcast  # noqa: E402
from integrator_spark.session import build_session  # noqa: E402

from integrator_spark.functions.synth import splitmix_vectors  # noqa: E402

# ALPHA calibration: splitmix noise has component variance 1/3, so its
# expected norm is sqrt(DIM/3) ~ 4.6; ALPHA = 9 puts the cluster signal
# at ~2x the noise norm -> intra-cluster cosine ~ ALPHA^2/(ALPHA^2 +
# DIM/3) ~ 0.79, inter-cluster ~ 0 — the separation profile of real
# text-embedding clusters. (ALPHA=1.5 measured as near-isotropic:
# recall@1 0.09/0.27/0.51 at probe 1/8/32 — noise buried the clusters.)
N, DIM, LATENT, ALPHA = 1_100_000, 64, 512, 9.0
N_CLUSTERS, SAMPLE, PROBES = 1024, 100_000, (1, 8, 32)
QUERY_EVERY = 550          # -> 2000 queries


def generate(spark) -> str:
    path = derived_dir("/root/testdata/sf0.1", "bigknn",
                       f"emb_clustered_{N}x{DIM}")
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    lat = splitmix_vectors(np.arange(LATENT) + 7_000_000, DIM).astype(np.float64)
    lat /= np.linalg.norm(lat, axis=1, keepdims=True)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            noise = splitmix_vectors(ids, DIM).astype(np.float64)
            mat = ALPHA * lat[ids % LATENT] + noise
            mat /= np.linalg.norm(mat, axis=1, keepdims=True)
            yield pd.DataFrame({"vec_id": ids,
                                "embedding": list(mat.astype(np.float32))})

    (spark.range(N).repartition(32)
     .mapInPandas(gen, "vec_id long, embedding array<float>")
     .write.mode("overwrite").parquet(path))
    return path


def main() -> int:
    spark = build_session("ann-at-scale")
    emb = spark.read.parquet(generate(spark))
    queries = emb.filter(F.col("vec_id") % QUERY_EVERY == 0)
    n_q = queries.count()
    print(f"corpus={N} dim={DIM} latent_clusters={LATENT} queries={n_q}")

    t0 = time.perf_counter()
    exact = {r["query_id"]: r["cos_sim"]
             for r in knn_search_broadcast(emb, queries, k=1).collect()}
    t_exact = time.perf_counter() - t0
    print(f"exact knn_search_broadcast: {t_exact:.1f}s "
          f"({n_q} queries x {N} corpus)", flush=True)

    t0 = time.perf_counter()
    cent = train_centroids(emb, n_clusters=N_CLUSTERS, sample_rows=SAMPLE,
                           iters=10)
    t_train = time.perf_counter() - t0
    t0 = time.perf_counter()
    index = ivf_assign(emb, cent, n_assign=1)
    index_path = derived_dir("/root/testdata/sf0.1", "bigknn", "ivf_index")
    # repartition("bucket") keeps file count = bucket count (one task
    # per bucket) instead of tasks x buckets — the round-7 IVFPQ run
    # measured 31,523 files / 258 MB du without it (small-files
    # failure); scan and directory-pruning semantics are unchanged.
    (index.repartition("bucket")
     .write.mode("overwrite").partitionBy("bucket").parquet(index_path))
    index = spark.read.parquet(index_path)
    t_assign = time.perf_counter() - t0
    print(f"IVF build: train {t_train:.1f}s (sample {SAMPLE}, "
          f"k={N_CLUSTERS}), assign+write {t_assign:.1f}s", flush=True)

    rows = []
    for n_probe in PROBES:
        t0 = time.perf_counter()
        got = {r["query_id"]: r["approx_cos"]
               for r in ivf_search(index, queries, cent,
                                   n_probe=n_probe, k=1).collect()}
        wall = time.perf_counter() - t0
        hits = sum(1 for qid, best in exact.items()
                   if got.get(qid, -2.0) >= best - 1e-6)
        rows.append((n_probe, round(wall, 1), round(hits / len(exact), 4),
                     round(n_probe / N_CLUSTERS, 4)))
        print(f"n_probe={n_probe}: wall={wall:.1f}s "
              f"recall@1={hits / len(exact):.4f}", flush=True)

    print(f"\n| plan | wall s | recall@1 | corpus scanned |")
    print(f"| ---- | ------ | -------- | -------------- |")
    print(f"| exact knn_search_broadcast | {t_exact:.1f} | 1.0 | 100% |")
    for n_probe, wall, rec, frac in rows:
        print(f"| IVF n_probe={n_probe} | {wall} | {rec} | {frac * 100:.1f}% |")
    print(f"\n(IVF build: {t_train + t_assign:.1f}s one-time; "
          f"exact all-pairs at this n for reference: 787s, "
          f"scripts/knn_at_scale.py)")

    # Serving shape: a SMALL query batch probes few distinct buckets, so
    # prune_buckets turns the probe bound into an IO bound (directory
    # pruning on the partitionBy("bucket") layout). The 2000-query table
    # above probes ~every bucket, hiding this; 32 queries do not.
    serve_q = emb.filter(F.col("vec_id") % 34375 == 0)   # 32 queries
    for pruned in (False, True):
        t0 = time.perf_counter()
        n_out = ivf_search(index, serve_q, cent, n_probe=8, k=1,
                           prune_buckets=pruned).count()
        print(f"serve 32 queries n_probe=8 prune_buckets={pruned}: "
              f"{time.perf_counter() - t0:.1f}s ({n_out} rows)", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
