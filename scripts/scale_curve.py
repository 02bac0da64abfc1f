#!/usr/bin/env python
"""Empirical scale curve for the LLM-pipeline operators.

Inflates the sf0.1 corpus/embeddings k× (union with id offsets — which
also multiplies the duplicate population, the realistic dedup load) and
measures wall time at k = 1, 2, 4. A sub-quadratic slope is the point:
candidate-join dedup and blocked kNN must not bend like n².

Usage: python scripts/scale_curve.py  (prints a markdown table)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from integrator_spark.io import load_table  # noqa: E402
from integrator_spark.operators.dedup import (  # noqa: E402
    minhash_lsh_pairs,
    simhash_pairs,
)
from integrator_spark.operators.graph import pagerank  # noqa: E402
from integrator_spark.operators.knn import knn_blocked  # noqa: E402
from integrator_spark.session import build_session  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def inflate(df, k: int, id_col: str, n_base: int):
    parts = [df.withColumn(id_col, F.col(id_col) + F.lit(i * n_base))
             for i in range(k)]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    spark = build_session("scale-curve")
    docs = load_table(spark, SF_DIR, "documents")
    emb = load_table(spark, SF_DIR, "embeddings")
    n_docs, n_emb = docs.count(), emb.count()

    rows = []
    for k in (1, 2, 4):
        d = inflate(docs, k, "doc_id", n_docs)
        e = inflate(emb, k, "vec_id", n_emb)
        timings = {}

        t0 = time.perf_counter()
        n_exact = (d.groupBy(F.md5("text")).agg(F.min("doc_id")).count())
        timings["dedup_exact"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        n_mh = minhash_lsh_pairs(d, k=3, jaccard_dist=0.5).count()
        timings["dedup_minhash"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        n_sh = simhash_pairs(d, max_hamming=6).count()
        timings["dedup_simhash"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        n_knn = knn_blocked(e, k=1).count()
        timings["vec_knn_blocked"] = time.perf_counter() - t0

        # substring spans: cost tracks corpus tokens (gram shuffle)
        t0 = time.perf_counter()
        w = F.split(F.col("text"), " ")
        idx = F.sequence(F.lit(0), F.size(w) - 8)
        gram = F.transform(idx, lambda i: F.concat_ws(
            " ", *[F.element_at(w, i + j + 1) for j in range(8)]))
        n_spans = (d.filter(F.size(w) >= 8)
                   .select("doc_id", F.explode(gram).alias("gram"))
                   .groupBy("gram")
                   .agg(F.countDistinct("doc_id").alias("nd"))
                   .filter(F.col("nd") >= 2).count())
        timings["substring_spans"] = time.perf_counter() - t0

        # two-sided cosine pair scan, forced above the broadcast budget
        # (the round-4 replacement for the driver-collect scale-killer).
        # 64k-cell budget -> 2 blocks at k=1 up to 8 at k=4: realistic
        # block counts, not the degenerate hundreds a tiny budget gives.
        # NOTE: output pair count itself grows ~k² under duplicate
        # inflation (every copy pairs with every copy), so wall time is
        # expected to track OUTPUT here, not stay flat.
        t0 = time.perf_counter()
        from integrator_spark.operators.knn import cosine_pairs_exact
        n_cp = cosine_pairs_exact(e, threshold=0.45,
                                  max_broadcast_cells=64_000).count()
        timings["cosine_pairs_twosided"] = time.perf_counter() - t0

        # pagerank over the k-inflated similarity graph (log-round joins)
        t0 = time.perf_counter()
        from integrator_spark.operators.dedup import ngram_jaccard_pairs
        pairs = ngram_jaccard_pairs(d, k=3, threshold=0.5).select("d1", "d2")
        edges = pairs.unionByName(pairs.select(F.col("d2").alias("d1"),
                                               F.col("d1").alias("d2")))
        n_pr = pagerank(edges, src="d1", dst="d2", iterations=5).count()
        timings["pagerank5"] = time.perf_counter() - t0

        rows.append((k, k * n_docs, k * n_emb, timings,
                     dict(exact_groups=n_exact, mh_pairs=n_mh,
                          sh_pairs=n_sh, knn=n_knn, spans=n_spans,
                          cp_pairs=n_cp, pr_nodes=n_pr)))

    print("| k | docs | vectors | dedup_exact s | minhash s | simhash s "
          "| knn s | spans s | cospairs2s s | pagerank s |")
    print("| - | ---- | ------- | ------------- | --------- | --------- "
          "| ----- | ------- | ------------ | ---------- |")
    for k, nd, ne, t, out in rows:
        print(f"| {k} | {nd} | {ne} | {t['dedup_exact']:.1f} | "
              f"{t['dedup_minhash']:.1f} | {t['dedup_simhash']:.1f} | "
              f"{t['vec_knn_blocked']:.1f} | {t['substring_spans']:.1f} | "
              f"{t['cosine_pairs_twosided']:.1f} | {t['pagerank5']:.1f} |")
    print()
    for k, nd, ne, t, out in rows:
        print(f"k={k}: outputs {out}")
    spark.stop()


if __name__ == "__main__":
    main()
