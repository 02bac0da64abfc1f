#!/usr/bin/env python
"""Graph-ANN (NN-Descent build + batch beam search) at routing scale —
the round-6 companion to scripts/ann_at_scale.py, so a user can choose
between the two ANN paths on measured numbers from ONE session and ONE
corpus: the deterministic clustered 1.1M x 64 table (512 latent
clusters — the regime real text/image embeddings live in).

Measured, one table:
- exact ground truth: knn_search_broadcast for 2000 sampled queries.
- NN-Descent build (k=10, 3 rounds, broadcast-matrix scoring route —
  the skinny-shuffle path; the join route would shuffle ~60 GB of
  vector payload per round at this n): wall.
- beam search over the built graph for the same 2000 queries
  (beam 8, 3 hops, 4 entry points): wall, QPS, recall@1 (value-based:
  hit if found cos >= exact best - 1e-6).
- IVF (1024 cells, train 100k sample) build + n_probe=8 search on the
  same corpus/queries for the head-to-head rows.

Usage: OPENBLAS_NUM_THREADS=1 python scripts/graph_ann_at_scale.py
"""

from __future__ import annotations

import importlib.util
import os
import sys
import time

os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("OMP_NUM_THREADS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from integrator_spark.io import derived_dir  # noqa: E402
from integrator_spark.operators.ann_graph import (  # noqa: E402
    graph_ann_search,
    nn_descent,
)
from integrator_spark.operators.ivf import (  # noqa: E402
    ivf_assign,
    ivf_search,
    train_centroids,
)
from integrator_spark.operators.knn import knn_search_broadcast  # noqa: E402
from integrator_spark.session import build_session  # noqa: E402

K_GRAPH, ITERS, BEAM, HOPS = 10, 3, 8, 3
QUERY_EVERY = 550            # -> 2000 queries out of 1.1M


def _load(name: str):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def recall(exact: dict, got: dict) -> float:
    hits = sum(1 for qid, best in exact.items()
               if got.get(qid, -2.0) >= best - 1e-6)
    return round(hits / len(exact), 4)


def main() -> int:
    ann = _load("ann_at_scale")
    spark = build_session("graph-ann-at-scale")
    emb = spark.read.parquet(ann.generate(spark))
    n = emb.count()
    queries = emb.filter(F.col("vec_id") % QUERY_EVERY == 0)
    n_q = queries.count()
    print(f"corpus={n} dim={ann.DIM} queries={n_q}", flush=True)

    t0 = time.perf_counter()
    exact = {r["query_id"]: r["cos_sim"]
             for r in knn_search_broadcast(emb, queries, k=1).collect()}
    t_exact = time.perf_counter() - t0
    print(f"exact ground truth: {t_exact:.1f}s", flush=True)

    # --- IVF on the same corpus/queries ---------------------------------
    t0 = time.perf_counter()
    cent = train_centroids(emb, n_clusters=ann.N_CLUSTERS,
                           sample_rows=ann.SAMPLE, iters=10)
    index = ivf_assign(emb, cent, n_assign=1)
    index_path = derived_dir("/root/testdata/sf0.1", "bigknn", "ivf_index")
    index.write.mode("overwrite").partitionBy("bucket").parquet(index_path)
    index = spark.read.parquet(index_path)
    t_ivf_build = time.perf_counter() - t0
    t0 = time.perf_counter()
    got_i = {r["query_id"]: r["approx_cos"]
             for r in ivf_search(index, queries, cent, n_probe=8, k=1,
                                 prune_buckets=False).collect()}
    t_isearch = time.perf_counter() - t0
    rec_i = recall(exact, got_i)
    print(f"IVF build {t_ivf_build:.1f}s; n_probe=8 search "
          f"{t_isearch:.1f}s recall@1={rec_i}", flush=True)

    # --- NN-Descent build + quantizer-seeded beam search ----------------
    graph_path = derived_dir("/root/testdata/sf0.1", "bigknn", "nnd_graph")
    t0 = time.perf_counter()
    g = nn_descent(emb, k=K_GRAPH, iters=ITERS)
    g.write.mode("overwrite").parquet(graph_path)
    t_build = time.perf_counter() - t0
    graph = spark.read.parquet(graph_path)
    print(f"nn_descent build (k={K_GRAPH}, iters={ITERS}): "
          f"{t_build:.1f}s ({graph.count()} edges)", flush=True)

    # Per-query entries from the coarse quantizer (the SPANN-style
    # hybrid): top-2 cells per query by centroid similarity, 8 members
    # per cell. Query-side work is one tiny driver matmul (2000 x
    # n_cells); member lookup is a broadcast join against the index.
    import numpy as np
    from pyspark.sql import Window
    qpdf = queries.toPandas()
    qmat = np.array(qpdf["embedding"].tolist(), dtype=np.float64)
    qmat /= np.linalg.norm(qmat, axis=1, keepdims=True)
    top2 = np.argsort(-(qmat @ cent.T), axis=1)[:, :2]
    probe_pdf = {"qid": np.repeat(qpdf["vec_id"].to_numpy(), 2),
                 "bucket": top2.reshape(-1).astype("int32")}
    import pandas as pd
    probe_df = spark.createDataFrame(pd.DataFrame(probe_pdf))
    members = (index.select("vec_id", "bucket")
               .withColumn("_rn", F.row_number().over(
                   Window.partitionBy("bucket").orderBy("vec_id")))
               .filter(F.col("_rn") <= 8)
               .select("bucket", F.col("vec_id").alias("cand")))
    entry_df = probe_df.join(F.broadcast(members), "bucket") \
        .select("qid", "cand")

    t0 = time.perf_counter()
    got_g = {r["query_id"]: r["cos_sim"]
             for r in graph_ann_search(graph, emb, queries, k=1,
                                       beam=BEAM, hops=HOPS,
                                       entries=entry_df).collect()}
    t_gsearch = time.perf_counter() - t0
    rec_g = recall(exact, got_g)
    print(f"beam search (beam={BEAM}, hops={HOPS}, quantizer-seeded): "
          f"{t_gsearch:.1f}s recall@1={rec_g}", flush=True)

    print(f"\n| plan | build s (one-time) | search s ({n_q} q) | QPS | recall@1 |")
    print(f"| ---- | ------------------ | ------------------ | --- | -------- |")
    print(f"| exact knn_search_broadcast | — | {t_exact:.1f} | "
          f"{n_q / t_exact:.0f} | 1.0 |")
    print(f"| NN-Descent + quantizer-seeded beam (k={K_GRAPH}, beam={BEAM}, "
          f"hops={HOPS}) | {t_build:.1f} | {t_gsearch:.1f} | "
          f"{n_q / t_gsearch:.0f} | {rec_g} |")
    print(f"| IVF n_probe=8 ({ann.N_CLUSTERS} cells) | {t_ivf_build:.1f} | "
          f"{t_isearch:.1f} | {n_q / t_isearch:.0f} | {rec_i} |")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
