"""Distributed supervised learning: logistic regression via IRLS
(iteratively reweighted least squares / Newton-Raphson).

The same executor/driver split as operators/pca.py: the data is only
ever touched by embarrassingly-parallel per-row expressions feeding a
k²-sized aggregate (k = feature count, a few dozen at most), and the
tiny k×k Newton solve happens driver-side in NumPy — the matrix does
not grow with rows, so the shape is identical at 10⁹ rows. Per
iteration: one JVM-side whole-stage-codegen pass over the fact table
producing gradient (k) + Hessian (k²) sums; no Python in the row loop,
no shuffle beyond the final partial-agg reduce.

Determinism: every per-row term is cast to DECIMAL(38,12) before
summing, so the accumulated gradient/Hessian are independent of
partition order and partial-agg tree shape — two runs (or two cluster
layouts) produce bit-identical coefficients.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Exact accumulator for |term| < ~1e25 with 12 fractional digits —
#: ample for unit-scaled features; the truncation (HALF_UP at 1e-12)
#: is itself deterministic.
_DEC = "decimal(38,12)"


def _dsum(term: Column) -> Column:
    return F.sum(term.cast(_DEC)).cast("double")


def logistic_irls(df: DataFrame, feature_cols: list[str], label_col: str,
                  iterations: int = 8) -> tuple[np.ndarray, float, int]:
    """Fit P(label=1 | x) = sigmoid(beta · x) → (beta, log_loss, n).

    ``feature_cols`` should include an explicit intercept column
    (constant 1.0) and be roughly unit-scaled — IRLS converges
    quadratically near the optimum but is not scale-invariant in a
    fixed iteration budget. Each iteration broadcasts the current beta
    into the plan as literals (k doubles — no broadcast variable
    machinery needed) and collects k + k² decimal-exact sums.
    """
    k = len(feature_cols)
    beta = np.zeros(k)
    y = F.col(label_col).cast("double")
    for _ in range(iterations):
        eta = sum((F.col(c) * float(b) for c, b in zip(feature_cols, beta)),
                  F.lit(0.0))
        mu = F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
        w = mu * (F.lit(1.0) - mu)
        aggs = [_dsum((y - mu) * F.col(c)).alias(f"g{i}")
                for i, c in enumerate(feature_cols)]
        aggs += [_dsum(w * F.col(a) * F.col(b)).alias(f"h{i}_{j}")
                 for i, a in enumerate(feature_cols)
                 for j, b in enumerate(feature_cols) if j >= i]
        row = df.agg(*aggs).collect()[0]
        if row["g0"] is None:  # SUM over zero rows
            raise ValueError("logistic_irls: empty input DataFrame")
        g = np.array([row[f"g{i}"] for i in range(k)])
        H = np.zeros((k, k))
        for i in range(k):
            for j in range(i, k):
                H[i, j] = H[j, i] = row[f"h{i}_{j}"]
        # Ridge jitter keeps the solve stable if a feature is degenerate.
        beta = beta + np.linalg.solve(H + 1e-9 * np.eye(k), g)
    eta = sum((F.col(c) * float(b) for c, b in zip(feature_cols, beta)),
              F.lit(0.0))
    mu = F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
    eps = F.lit(1e-12)
    stats = df.agg(
        _dsum(-(y * F.log(mu + eps)
                + (F.lit(1.0) - y) * F.log(F.lit(1.0) - mu + eps)))
        .alias("nll"),
        F.count(F.lit(1)).alias("n")).collect()[0]
    return beta, float(stats["nll"]) / int(stats["n"]), int(stats["n"])
