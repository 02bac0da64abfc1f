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
