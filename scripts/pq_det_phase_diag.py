#!/usr/bin/env python
"""Phase-level wall breakdown for vec_ann_pq_det at sf0.1 (guide §1:
decide WHERE the 20 s goes before touching anything): times the
threaded subspace fits, the ADC score+shortlist, and the exact-cosine
rerank as separate materializations. Diagnostic only — the registered
query's single-plan shape is unchanged."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from integrator_spark.io import load_table  # noqa: E402
from integrator_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from functools import reduce

    from integrator_spark.operators.dedup import _cosine_residual
    from integrator_spark.queries.scale import _ivf_det_assign, _ivf_det_fit

    m, sub_dim, k, iters, shortlist = 8, 8, 64, 3, 64
    spark = build_session("pq-det-phase-diag")
    e = load_table(spark, SF_DIR, "embeddings")
    e.count()

    t0 = time.perf_counter()

    def _fit_sub(s: int):
        e_s = e.select("vec_id",
                       F.slice("embedding", s * sub_dim + 1, sub_dim)
                       .alias("embedding"))
        q_s, cent = _ivf_det_fit(e_s, k=k, iters=iters, dim=sub_dim)
        code_s = (_ivf_det_assign(q_s, cent)
                  .select("vec_id", F.lit(s).alias("sub"), "bucket"))
        rows = [(b, [int(v) for v in vals])
                for b, vals in sorted(cent.items())]
        cdf = spark.createDataFrame(rows, "bucket int, c array<long>")
        dot = F.aggregate(F.zip_with("q", "c", lambda a, b: a * b),
                          F.lit(0).cast("long"), lambda acc, x: acc + x)
        lut_s = (q_s.crossJoin(F.broadcast(cdf))
                 .select("vec_id", F.lit(s).alias("sub"), "bucket",
                         dot.alias("d")))
        n2 = F.aggregate(F.transform("c", lambda x: x * x),
                         F.lit(0).cast("long"), lambda acc, x: acc + x)
        cn2_s = cdf.select(F.lit(s).alias("sub"), "bucket", n2.alias("n2"))
        return code_s, lut_s, cn2_s

    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=4) as pool:
        parts = list(pool.map(_fit_sub, range(m)))
    t_fit = time.perf_counter() - t0
    print(f"fits (threaded, lazy code/lut frames): {t_fit:.2f}s", flush=True)

    codes_df = reduce(lambda a, b: a.unionByName(b), [p[0] for p in parts])
    lut_df = reduce(lambda a, b: a.unionByName(b), [p[1] for p in parts])
    cn2_df = reduce(lambda a, b: a.unionByName(b), [p[2] for p in parts])

    t0 = time.perf_counter()
    xnorm = (codes_df.join(cn2_df, ["sub", "bucket"])
             .groupBy("vec_id").agg(F.sum("n2").alias("nrm2")))
    score = (codes_df.withColumnRenamed("vec_id", "x_id")
             .join(lut_df.withColumnRenamed("vec_id", "q_id"),
                   ["sub", "bucket"])
             .filter(F.col("q_id") != F.col("x_id"))
             .groupBy("q_id", "x_id").agg(F.sum("d").alias("dot")))
    val = (F.when(F.col("nrm2") == 0, F.lit(float("-inf")))
           .otherwise(F.col("dot").cast("double")
                      / F.sqrt(F.col("nrm2").cast("double"))))
    w = Window.partitionBy("q_id").orderBy(val.desc(), "x_id")
    short = (score.join(xnorm, score.x_id == xnorm.vec_id)
             .withColumn("_rn", F.row_number().over(w))
             .filter(F.col("_rn") <= shortlist)
             .select(F.col("q_id").alias("vec_id"),
                     F.col("x_id").alias("neighbor_id"))
             .localCheckpoint(eager=True))
    n_short = short.count()
    t_adc = time.perf_counter() - t0
    print(f"ADC score+shortlist ({n_short} rows): {t_adc:.2f}s", flush=True)

    t0 = time.perf_counter()
    scored = _cosine_residual(short, e, e, -1.0, "vec_id", "neighbor_id",
                              "vec_id", "embedding")
    w2 = Window.partitionBy("vec_id").orderBy(F.col("cos_sim").desc(),
                                              "neighbor_id")
    out = (scored.withColumn("_rn", F.row_number().over(w2))
           .filter(F.col("_rn") == 1)
           .select("vec_id", "neighbor_id",
                   F.col("cos_sim").alias("approx_cos"))
           .orderBy("vec_id"))
    n_out = len(out.collect())
    t_rr = time.perf_counter() - t0
    print(f"rerank+top1 ({n_out} rows): {t_rr:.2f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
