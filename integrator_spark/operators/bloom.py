"""Distributed Bloom filter over a key column — the shuffle-reduction
primitive for incremental dedup at 100 TB.

Joining a new crawl batch against an existing corpus index shuffles the
FULL corpus key set every run. A Bloom filter of the corpus keys is
mergeable (bitwise OR), so it builds in one pass — each partition emits
its local bit array, the arrays are OR-merged EXECUTOR-SIDE in a tree
(``treeReduce``) so the driver receives exactly one filter-sized array
no matter how many partitions the corpus scan has — and then the filter
rides a broadcast to pre-filter the batch: keys the filter rejects are
*definitely* new and skip the join entirely; only the "maybe" survivors
(target false-positive rate ~1%) reach the exact verification anti-join.
Net: the shuffle carries ~fpp x |batch| rows instead of |corpus|.

Posture at scale: 1e9 corpus keys at 1% fpp is ~1.2 GB of bits — within
broadcast range; beyond that, shard the filter by key prefix. The filter
is advisory only (exactness comes from the verification join), so
undersizing degrades performance, never correctness.

Hashing: the two base hashes are computed JVM-SIDE — ``xxhash64(key)``
and ``xxhash64(key, 1)`` (the constant second column perturbs the
hash, giving an independent second stream) — whole-stage-codegen
cheap — and the k Kirsch-Mitzenmacher indices ``(h1 + j*h2) mod m``
plus all bit get/set work are vectorized numpy over the Arrow batch. Nothing
hashes per-row in Python (the original md5-per-key loop measured 98 s
for a 6M-row probe at sf1; the vectorized kernel replaced it — see
SCALING.md). Determinism: xxhash64 is seed-stable across builds,
partitionings, and cluster sizes; keys are cast to string first so the
scheme is type-agnostic like the md5 one it replaced.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
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


def _hash_cols(key_col: str) -> tuple[Column, Column]:
    """The two JVM-side base hashes (seeded xxhash64 over the
    stringified key) that every index derives from."""
    s = F.col(key_col).cast("string")
    return F.xxhash64(s).alias("_bh1"), F.xxhash64(s, F.lit(1)).alias("_bh2")


def _index_batch(h1: np.ndarray, h2: np.ndarray, j: int, m: int) -> np.ndarray:
    """Vectorized Kirsch-Mitzenmacher index j for a batch: interpret the
    signed JVM hashes as uint64 (two's-complement view), force h2 odd
    so the k probes of one key never all collapse, wrap mod 2^64, then
    mod m. Identical arithmetic at build and probe."""
    a = h1.astype(np.uint64)
    b = h2.astype(np.uint64) | np.uint64(1)
    return ((a + np.uint64(j) * b) % np.uint64(m)).astype(np.int64)


def build_bloom(keys: DataFrame, key_col: str, n_estimate: int,
                fpp: float = 0.01) -> tuple[bytes, int, int]:
    """One distributed pass: per-partition local bit arrays, OR-merged
    executor-side in a tree. Driver memory is O(m/8) — ONE bitmap —
    independent of partition count: with P input partitions the naive
    ``collect()`` pattern would pull P full bitmaps through the driver
    (hundreds of GB at the module's stated 1e9-key posture); the tree
    keeps every merge on executors and hands back a single array.
    Returns (bits, m, k)."""
    m, k = _params(n_estimate, fpp)
    h1c, h2c = _hash_cols(key_col)
    hashed = keys.select(h1c, h2c)

    def partition_bits(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bits = np.zeros(m // 8, dtype=np.uint8)
        seen = False
        for pdf in batches:
            seen = True
            h1 = pdf["_bh1"].to_numpy()
            h2 = pdf["_bh2"].to_numpy()
            for j in range(k):
                idx = _index_batch(h1, h2, j, m)
                np.bitwise_or.at(bits, idx >> 3,
                                 (1 << (idx & 7)).astype(np.uint8))
        if seen:
            yield pd.DataFrame({"bits": [bits.tobytes()]})

    parts = hashed.mapInPandas(partition_bits, "bits binary")
    bitmaps = parts.rdd.map(lambda row: row["bits"])

    def or_bytes(a: bytes, b: bytes) -> bytes:
        return np.bitwise_or(np.frombuffer(a, dtype=np.uint8),
                             np.frombuffer(b, dtype=np.uint8)).tobytes()

    # Tree depth sized so each level fans in ~4x and the final driver-side
    # reduce sees at most ~4 partials (treeReduce stops shrinking once
    # numPartitions <= scale = P^(1/depth)): bounded driver memory at any P.
    n_parts = max(bitmaps.getNumPartitions(), 1)
    depth = max(2, math.ceil(math.log(n_parts, 4))) if n_parts > 4 else 2
    try:
        merged = bitmaps.treeReduce(or_bytes, depth)
    except ValueError:  # empty input: no partition yielded a bitmap
        merged = np.zeros(m // 8, dtype=np.uint8).tobytes()
    # A single-partition reduce can hand back the element itself, which
    # arrives as a bytearray — normalize so callers always see bytes.
    return bytes(merged), m, k


def bloom_maybe_contains(df: DataFrame, key_col: str, bits: bytes,
                         m: int, k: int, out_col: str = "_maybe") -> DataFrame:
    """Adds a boolean column: False ⇒ key definitely NOT in the built
    set; True ⇒ verify exactly. JVM-hashed, numpy-probed per Arrow
    batch against the broadcast bit array — no per-row Python."""
    sc = df.sparkSession.sparkContext
    bc = sc.broadcast(bits)

    @pandas_udf("boolean")
    def probe(h1s: pd.Series, h2s: pd.Series) -> pd.Series:
        arr = np.frombuffer(bc.value, dtype=np.uint8)
        h1 = h1s.to_numpy()
        h2 = h2s.to_numpy()
        ok = np.ones(len(h1), dtype=bool)
        for j in range(k):
            idx = _index_batch(h1, h2, j, m)
            ok &= (arr[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1 != 0
        return pd.Series(ok)

    # The SAME expressions build_bloom hashed with — a probe hashed
    # differently would produce false negatives, which callers trust
    # as "definitely absent". One definition, two call sites.
    h1c, h2c = _hash_cols(key_col)
    return df.withColumn(out_col, probe(h1c, h2c))
