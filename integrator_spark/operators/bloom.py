"""Distributed Bloom filter over a key column — the shuffle-reduction
primitive for incremental dedup at 100 TB.

Joining a new crawl batch against an existing corpus index shuffles the
FULL corpus key set every run. A Bloom filter of the corpus keys is
mergeable (bitwise OR), so it builds in one pass — each partition emits
its local bit array, the driver ORs the handful of arrays — and then
rides a broadcast to pre-filter the batch: keys the filter rejects are
*definitely* new and skip the join entirely; only the "maybe" survivors
(target false-positive rate ~1%) reach the exact verification anti-join.
Net: the shuffle carries ~fpp x |batch| rows instead of |corpus|.

Posture at scale: 1e9 corpus keys at 1% fpp is ~1.2 GB of bits — within
broadcast range; beyond that, shard the filter by key prefix. The filter
is advisory only (exactness comes from the verification join), so
undersizing degrades performance, never correctness.

Determinism: hash indices derive from md5 of the key string — identical
across builds, partitionings, and cluster sizes.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _params(n_keys: int, fpp: float = 0.01) -> tuple[int, int]:
    """(m bits, k hashes) for ``n_keys`` at target ``fpp``; m rounded up
    to a byte multiple with a small floor so toy inputs stay sane."""
    n = max(n_keys, 1)
    m = max(1024, int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))))
    m = (m + 7) // 8 * 8
    k = max(1, round(m / n * math.log(2)))
    return m, min(k, 16)


def _indices(key: str, m: int, k: int) -> list[int]:
    """k deterministic bit indices via double hashing over md5 halves."""
    d = hashlib.md5(key.encode()).hexdigest()
    h1, h2 = int(d[:16], 16), int(d[16:], 16) | 1
    return [(h1 + i * h2) % m for i in range(k)]


def build_bloom(keys: DataFrame, key_col: str, n_estimate: int,
                fpp: float = 0.01) -> tuple[bytes, int, int]:
    """One distributed pass: per-partition local bit arrays, OR'd on the
    driver (collects n_partitions rows of m/8 bytes — bounded by the
    filter size, never by |corpus|). Returns (bits, m, k)."""
    m, k = _params(n_estimate, fpp)

    def partition_bits(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bits = np.zeros(m // 8, dtype=np.uint8)
        seen = False
        for pdf in batches:
            seen = True
            for key in pdf[key_col].astype(str):
                for idx in _indices(key, m, k):
                    bits[idx >> 3] |= 1 << (idx & 7)
        if seen:
            yield pd.DataFrame({"bits": [bits.tobytes()]})

    parts = keys.select(key_col).mapInPandas(partition_bits, "bits binary")
    acc = np.zeros(m // 8, dtype=np.uint8)
    for row in parts.collect():
        acc |= np.frombuffer(row["bits"], dtype=np.uint8)
    return acc.tobytes(), m, k


def bloom_maybe_contains(df: DataFrame, key_col: str, bits: bytes,
                         m: int, k: int, out_col: str = "_maybe") -> DataFrame:
    """Adds a boolean column: False ⇒ key definitely NOT in the built
    set; True ⇒ verify exactly. Arrow-batched probe against the
    broadcast bit array."""
    sc = df.sparkSession.sparkContext
    bc = sc.broadcast(bits)

    @pandas_udf("boolean")
    def probe(keys: pd.Series) -> pd.Series:
        arr = np.frombuffer(bc.value, dtype=np.uint8)
        out = []
        for key in keys.astype(str):
            hit = all(arr[i >> 3] & (1 << (i & 7))
                      for i in _indices(key, m, k))
            out.append(bool(hit))
        return pd.Series(out)

    return df.withColumn(out_col, probe(F.col(key_col)))
