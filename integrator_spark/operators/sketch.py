"""Count-min sketch over a token column — distributed heavy-hitter
counting in fixed memory.

The sketch is a d×w counter matrix; every executor batch builds a
partial matrix (mapInPandas), matrices merge by element-wise sum (CMS
is a linear sketch — the property that makes it distributable), and
only the d×w ints (not the token stream) ever leave the executors.
Point estimates are min over the d hashed rows: never an underestimate,
overestimate ≤ εN (ε = e/w) with probability 1−(1/e)^d — the bound
tests/test_sketches.py asserts against exact counts.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CMS_DEPTH = 4
CMS_WIDTH = 1024


def _bucket(row: int, token: str) -> int:
    h = hashlib.md5(f"{row}:{token}".encode()).digest()
    return int.from_bytes(h[:8], "big") % CMS_WIDTH


def cms_build(tokens: DataFrame, col: str = "word") -> np.ndarray:
    """Aggregate the corpus into one d×w count-min matrix. The reduce
    collects exactly d*w scalars (32 KB) regardless of corpus size."""
    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            m = np.zeros((CMS_DEPTH, CMS_WIDTH), dtype="int64")
            for tok in pdf[col]:
                for r in range(CMS_DEPTH):
                    m[r, _bucket(r, tok)] += 1
            yield pd.DataFrame({"flat": [m.ravel().tolist()]})

    reduced = (tokens.select(col).mapInPandas(partials, "flat array<long>")
               .select(F.posexplode("flat").alias("pos", "val"))
               .groupBy("pos").agg(F.sum("val").alias("s"))
               .collect())
    flat = np.zeros(CMS_DEPTH * CMS_WIDTH, dtype="int64")
    for r in reduced:
        flat[r.pos] = r.s
    return flat.reshape(CMS_DEPTH, CMS_WIDTH)


def cms_estimate(matrix: np.ndarray, token: str) -> int:
    return int(min(matrix[r, _bucket(r, token)] for r in range(CMS_DEPTH)))
