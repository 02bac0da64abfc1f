"""Distributed PCA over an embedding column.

The 100 TB-safe decomposition: the only thing that ever leaves the
executors is the d×d Gram matrix (d = embedding dim, 64 here → 32 KB),
accumulated as per-Arrow-batch partials and reduced element-wise with a
groupBy — the data itself is touched in exactly one mapInPandas pass.
The d×d eigendecomposition is driver-side NumPy (trivial at any corpus
size — the matrix does not grow with rows), and the projection is a
second embarrassingly-parallel Arrow pass against the broadcast
components. PCA whitening / dimensionality reduction before ANN
indexing is a standard step in large-scale embedding pipelines.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _gram_partials(vec_col: str, dim: int):
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            m = np.vstack(pdf[vec_col].to_numpy()).astype("float64")
            flat = np.concatenate([m.sum(axis=0), (m.T @ m).ravel()])
            yield pd.DataFrame({"n": [len(m)], "flat": [flat.tolist()]})
    return kernel


def fit_pca(df: DataFrame, vec_col: str = "embedding", dim: int = 64,
            k: int = 2) -> tuple[np.ndarray, np.ndarray, int]:
    """Fit PCA → (components [k×d], eigenvalues [k], n).

    Sign convention: each component's largest-|entry| coordinate is
    made positive, so the decomposition is unique (eigenvectors are
    otherwise sign-ambiguous between runs/libraries).
    """
    partials = df.select(vec_col).mapInPandas(
        _gram_partials(vec_col, dim), "n long, flat array<double>")
    reduced = (partials.select("n", F.posexplode("flat").alias("pos", "val"))
               .groupBy("pos").agg(F.sum("val").alias("s"))
               .collect())
    n = partials.agg(F.sum("n")).collect()[0][0]
    if not n:
        raise ValueError("fit_pca: empty input DataFrame")
    flat = np.zeros(dim + dim * dim)
    for r in reduced:
        flat[r.pos] = r.s
    mean = flat[:dim] / n
    cov = flat[dim:].reshape(dim, dim) / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return comps, vals[order], int(n)


def project(df: DataFrame, components: np.ndarray,
            vec_col: str = "embedding",
            out_cols: tuple[str, ...] = ("pc1", "pc2")) -> DataFrame:
    """Project each vector onto the fitted components (appended as
    double columns) — one Arrow pass, components ride along in the
    serialized closure (k×d floats)."""
    comp = components.astype("float64")
    other = [c for c in df.columns if c != vec_col]
    schema = ", ".join(f"`{c}` {dict(df.dtypes)[c]}" for c in other)
    schema += ", " + ", ".join(f"{c} double" for c in out_cols)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            m = np.vstack(pdf[vec_col].to_numpy()).astype("float64")
            proj = m @ comp.T
            out = pdf[other].copy()
            for i, c in enumerate(out_cols):
                out[c] = proj[:, i]
            yield out
    return df.mapInPandas(kernel, schema)


def power_iteration_grid(cov_rows, dim: int, iterations: int = 16,
                         squarings: int = 7):
    """Driver-side power iteration in EXACT grid arithmetic — the
    deterministic companion to :func:`fit_pca`'s LAPACK path, built so
    a SQL oracle can reproduce every step bit-for-bit (see
    queries/vectors.py:vec_pca_power).

    The contract that makes cross-engine parity possible with zero
    tolerance: (1) the covariance entries arrive on a 12-dp grid
    (exact decimal sums, rounded once); (2) each matvec term
    ``c_ij * v_j`` is an IEEE double product of identical grid doubles
    — identical on every engine; (3) terms are summed EXACTLY by
    quantizing each to the 1e-18 grid (matching both engines'
    double→DECIMAL(38,18) cast: a double's exact binary expansion
    never terminates on a decimal half, so every nearest-rounding mode
    agrees) and accumulating scaled integers; (4) the iterate is
    renormalized and snapped back to the 12-dp grid with HALF_UP
    (Spark's and DuckDB's ROUND; halves again unreachable). No LAPACK,
    no BLAS, no sum-order dependence anywhere.

    ``cov_rows``: iterable of (i, j, c) covariance entries (12-dp grid
    doubles). Returns the unit top-eigenvector as a list of 12-dp grid
    floats. Fixed iteration count — like pagerank/kcore, a fixed
    budget keeps every run (and the unrolled oracle) identical.
    """
    from decimal import ROUND_HALF_UP, Decimal

    q18 = Decimal(1).scaleb(-18)
    q12 = Decimal(1).scaleb(-12)

    def quant18(x: float) -> int:
        return int(Decimal(x).quantize(q18, ROUND_HALF_UP).scaleb(18))

    import math

    C: dict[tuple[int, int], float] = {}
    for i, j, c in cov_rows:
        C[(int(i), int(j))] = float(c)

    # Repeated squaring with Frobenius renormalization: a clustered
    # embedding corpus has a nearly-flat spectrum (measured λ2/λ1 =
    # 0.987 at sf0.01 → ~550 plain iterations for 1e-3), so square the
    # matrix ``squarings`` times first — C^(2^s) shares C's eigenbasis
    # and the gap compounds to ratio^(2^s · iterations). Renormalize
    # before each 12-dp snap or the entries underflow the grid
    # (λ^(2^s) ~ 0.03^128 → 0). Same exact-grid discipline as the
    # matvec: decimal-quantized term sums, IEEE sqrt, HALF_UP snap.
    B = dict(C)
    for _ in range(squarings):
        sq: dict[tuple[int, int], int] = {}
        for i in range(dim):
            for j in range(dim):
                sq[(i, j)] = sum(
                    quant18(B.get((i, k), 0.0) * B.get((k, j), 0.0))
                    for k in range(dim))
        fro_int = sum(quant18(float(Decimal(x).scaleb(-18))
                              * float(Decimal(x).scaleb(-18)))
                      for x in sq.values())
        fro = math.sqrt(float(Decimal(fro_int).scaleb(-18)))
        if fro == 0.0:
            break
        B = {k: float(Decimal(float(Decimal(x).scaleb(-18)) / fro)
                      .quantize(q12, ROUND_HALF_UP))
             for k, x in sq.items()}
    C = B

    v = [0.125] * dim                     # 1/8: exact in binary AND decimal
    for _ in range(iterations):
        w_int = [sum(quant18(C.get((i, j), 0.0) * v[j])
                     for j in range(dim)) for i in range(dim)]
        # exact decimal -> nearest double (matches CAST(... AS DOUBLE))
        w = [float(Decimal(wi).scaleb(-18)) for wi in w_int]
        n2_int = sum(quant18(wi * wi) for wi in w)
        nm = math.sqrt(float(Decimal(n2_int).scaleb(-18)))  # IEEE-exact sqrt
        # (math.sqrt is correctly rounded per IEEE 754, same as SQL
        # sqrt(); x ** 0.5 routes through pow() and is NOT guaranteed)
        if nm == 0.0:                     # degenerate (all-equal corpus)
            return v
        v = [float(Decimal(wi / nm).quantize(q12, ROUND_HALF_UP))
             for wi in w]
    return v
