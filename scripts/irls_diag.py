#!/usr/bin/env python
"""Per-step wall breakdown for ml_logreg_irls (r12 session 4): where do
~16 s go across 8 Newton steps + loss pass at sf0.1?

Times, in one warmed session: (a) the feats checkpoint materialization,
(b) each step's 14-aggregate job as registered (decimal sums over the
9-dp-snapped sigmoid), (c) the same step with plain double sums (no
decimal cast), (d) the same with no exp/round (raw linear sums) — to
split job overhead vs decimal-aggregate cost vs sigmoid cost.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from integrator_spark.io import load_table  # noqa: E402
from integrator_spark.session import build_session  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = build_session("irls-diag")

o = load_table(spark, sf_dir, "orders")
feats = o.select(
    F.when(F.col("o_orderstatus") == "F", 1.0).otherwise(0.0).alias("y"),
    F.lit(1.0).alias("x0"),
    (F.col("o_totalprice") / 100000.0).alias("x1"),
    ((F.year("o_orderdate") - F.lit(1995)) / 4.0).alias("x2"),
    ((F.col("o_custkey") % 97) / 97.0).alias("x3"))
feats = feats.localCheckpoint(eager=False)
t0 = time.perf_counter()
n = feats.count()
print(f"checkpoint+count: {time.perf_counter()-t0:.3f}s rows={n}",
      flush=True)

beta = [0.1, -0.2, 0.3, -0.4]


def step(tag, mu_mode, decimal):
    z = (((F.lit(beta[0]) * F.col("x0") + F.lit(beta[1]) * F.col("x1"))
          + F.lit(beta[2]) * F.col("x2")) + F.lit(beta[3]) * F.col("x3"))
    if mu_mode == "sigmoid":
        mu = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 9)
    else:
        mu = z
    w = mu * (F.lit(1.0) - mu)
    cast = (lambda c: c.cast("decimal(28,9)")) if decimal else (lambda c: c)
    aggs = [F.sum(cast((F.col("y") - mu) * F.col(f"x{j}"))).alias(f"g{j}")
            for j in range(4)]
    aggs += [F.sum(cast((w * F.col(f"x{i}")) * F.col(f"x{j}")))
             .alias(f"h{i}{j}")
             for i in range(4) for j in range(4) if j >= i]
    t = time.perf_counter()
    feats.agg(*aggs).first()
    print(f"{tag}: {time.perf_counter()-t:.3f}s", flush=True)


for rep in range(3):
    step(f"registered (decimal+sigmoid) rep{rep}", "sigmoid", True)
for rep in range(3):
    step(f"double+sigmoid rep{rep}", "sigmoid", False)
for rep in range(3):
    step(f"decimal+linear rep{rep}", "linear", True)
# change literals per step like the real loop (plan cache miss per step)
for rep in range(3):
    beta = [b + 0.01 for b in beta]
    step(f"registered fresh-literals rep{rep}", "sigmoid", True)
spark.stop()
