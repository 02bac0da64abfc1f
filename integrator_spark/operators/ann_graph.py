"""Graph-based approximate nearest neighbors: distributed NN-Descent.

Completes the standard ANN triad next to LSH (queries/vectors.py
vec_ann_lsh) and IVF (queries/scale.py vec_ann_ivf). True HNSW insertion
is inherently sequential (every insert greedily searches the graph built
so far), which fights Spark's execution model; the distributed member of
the graph-ANN family is **NN-Descent** (Dong, Moses, Li — "Efficient
k-nearest neighbor graph construction for generic similarity measures",
WWW 2011): start from a random k-NN graph and repeatedly propose each
node's neighbors-of-neighbors as better neighbors, keeping the top-k.
The output k-NN graph is exactly what an HNSW-class searcher navigates
(its bottom layer), and every round is plain relational algebra — two
self-joins and a windowed top-k — so it inherits shuffle partitioning,
AQE, and skew handling like any other join pipeline.

Scale posture: round cost is bounded by |E|·k = n·k² candidate pairs
(k ~ 10-30, never n²), shuffled on node id; the classic ρ-sampling
refinement drops that further by sampling neighbor lists. Iterations are
fixed (convergence on random init is empirically 3-5 rounds for
recall@1 ≥ 0.9 on dim-64 corpora — asserted in tests); each round is
lineage-truncated with an eager localCheckpoint, without which the plan
tree doubles per round and the driver dies generating it long before
the data is big (same discipline as operators/graph.py).

Determinism: the random initial graph is hash-seeded
(xxhash64(vec_id, j, seed)), candidate scoring is exact cosine, and the
top-k window breaks ties on (cos DESC, neighbor ASC) — byte-identical
across runs, which the rows-only determinism gate checks.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .knn import _dot_expr

#: Broadcast-matrix scoring cutover for the graph BUILD: if the whole
#: normalized corpus fits this many bytes as float64 (n x dim x 8), the
#: per-round candidate scoring gathers rows from one broadcast numpy
#: matrix (skinny (src, dst) pairs shuffle; vectors never do) instead
#: of attaching vectors via two joins — which at 1.1M x 64 would
#: shuffle ~60 GB of vector payload PER ROUND. Same size-routing
#: discipline as operators/knn.py MAX_BROADCAST_CELLS; above the
#: budget the join path keeps working at any n.
MATRIX_BUDGET_BYTES = 1 << 30


def graph_ann_search(graph: DataFrame, base: DataFrame, queries: DataFrame,
                     k: int = 1, beam: int = 8, hops: int = 3,
                     n_entries: int = 4,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     exclude_self: bool = False) -> DataFrame:
    """Batch beam search over a k-NN graph for OUT-OF-SAMPLE queries —
    the HNSW-style navigate step, reshaped for Spark: instead of one
    sequential walk per query, every hop is one relational round over
    ALL queries at once (join current beam to the graph's adjacency,
    score proposals, keep the best ``beam`` per query), so Q concurrent
    searches cost H joins total, not Q·H sequential probes.

    Entry points are the ``n_entries`` smallest corpus ids (fixed and
    deterministic — a production index would persist medoid entries the
    same way). Per hop the candidate frontier is bounded by
    Q · beam · degree; with k-NN-graph degree ~15 and beam 8 that is
    ~120 proposals per query per hop, independent of corpus size — the
    whole point of graph ANN. Returns (query_id, neighbor_id, cos_sim,
    rank) with the usual (cos DESC, id ASC) tie-break."""
    norm = F.sqrt(F.aggregate(
        F.transform(F.col(vec_col), lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda a, x: a + x))
    b = (base.select(F.col(id_col).cast("long").alias("cand"),
                     F.transform(F.col(vec_col),
                                 lambda x: x.cast("double") / norm)
                      .alias("_bv"))
         .localCheckpoint(eager=True))
    q = (queries.select(F.col(id_col).cast("long").alias("qid"),
                        F.transform(F.col(vec_col),
                                    lambda x: x.cast("double") / norm)
                         .alias("_qv"))
         .localCheckpoint(eager=True))
    adj = graph.select(F.col("vec_id").alias("cand"),
                       F.col("neighbor_id").alias("_nbr"))

    entries = F.broadcast(b.orderBy("cand").limit(n_entries).select("cand"))
    # Bounded broadcast nested-loop: every query × n_entries entry rows.
    frontier = q.select("qid").join(entries)

    def score_and_beam(cand: DataFrame, width: int) -> DataFrame:
        if exclude_self:
            # in-corpus evaluation: a query must not return itself
            cand = cand.filter(F.col("qid") != F.col("cand"))
        scored = (cand.join(q, "qid").join(b, "cand")
                  .select("qid", "cand",
                          _dot_expr(F.col("_qv"), F.col("_bv")).alias("_cos")))
        w = Window.partitionBy("qid").orderBy(F.col("_cos").desc(),
                                              F.col("cand"))
        return (scored.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") <= width)
                .localCheckpoint(eager=True))

    best = score_and_beam(frontier, beam)
    for _ in range(hops):
        expand = (best.select("qid", "cand").join(adj, "cand")
                  .select("qid", F.col("_nbr").alias("cand")))
        cand = expand.unionByName(best.select("qid", "cand")).distinct()
        new_best = score_and_beam(cand, beam)
        best.unpersist()
        best = new_best
    return (best.filter(F.col("_rn") <= k)
            .select(F.col("qid").alias("query_id"),
                    F.col("cand").alias("neighbor_id"),
                    F.round("_cos", 6).alias("cos_sim"),
                    F.col("_rn").cast("int").alias("rank")))


def nn_descent(emb: DataFrame, k: int = 10, iters: int = 4,
               id_col: str = "vec_id", vec_col: str = "embedding",
               seed: int = 42,
               matrix_budget_bytes: int = MATRIX_BUDGET_BYTES) -> DataFrame:
    """Build an approximate k-NN graph (vec_id, neighbor_id, cos_sim,
    rank) by NN-Descent. Ids need not be contiguous: the random init
    draws hash-positions into a dense rank of the corpus ids.

    Scoring is size-routed (see MATRIX_BUDGET_BYTES): under the budget
    the normalized corpus rides one broadcast float64 matrix and each
    round's candidate pairs are scored by a C-level gather+rowdot in a
    mapInPandas kernel — the shuffle carries only (src, dst, cos), not
    vectors; above it, vectors attach via joins (works at any n).
    Both paths compute the same float64 dots; the property test pins
    identical edge sets."""
    spark = emb.sparkSession
    n = emb.count()
    if n < 2:
        return spark.createDataFrame(
            [], "vec_id long, neighbor_id long, cos_sim double, rank int")
    kk = min(k, n - 1)

    # L2-normalize once; cosine thereafter is a single dot fold.
    norm = F.sqrt(F.aggregate(
        F.transform(F.col(vec_col), lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda a, x: a + x))
    base = (emb.select(F.col(id_col).cast("long").alias("nid"),
                       F.transform(F.col(vec_col),
                                   lambda x: x.cast("double") / norm)
                        .alias("_v"))
            .localCheckpoint(eager=True))

    dim = len(base.select("_v").first()[0])
    mat_bc = None
    if n * dim * 8 <= matrix_budget_bytes:
        # Bounded driver collect (<= budget bytes by the route check),
        # sorted by id so executor-side lookups are one searchsorted.
        pdf = base.toPandas()
        order = np.argsort(pdf["nid"].to_numpy(), kind="stable")
        ids_sorted = pdf["nid"].to_numpy()[order]
        mat = np.array(pdf["_v"].tolist(), dtype=np.float64)[order]
        mat_bc = spark.sparkContext.broadcast((ids_sorted, mat))

    # Dense positions 0..n-1 so hash-draws always hit a real node.
    pos = base.select(
        "nid",
        (F.row_number().over(Window.orderBy("nid")) - 1).alias("_pos"))

    # Seeded random init: kk + 2 draws per node (a couple extra so
    # self-hits and duplicate draws still leave >= kk candidates).
    draws = base.select(
        F.col("nid").alias("src"),
        F.explode(F.sequence(F.lit(0), F.lit(kk + 1))).alias("_j"))
    init = (draws.select(
        "src",
        F.pmod(F.xxhash64("src", "_j", F.lit(seed)), F.lit(n)).alias("_pos"))
        .join(pos, "_pos")
        .select("src", F.col("nid").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct())

    def score_pairs(cand: DataFrame) -> DataFrame:
        if mat_bc is not None:
            def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                ids_s, m = mat_bc.value
                for pdf in batches:
                    src = pdf["src"].to_numpy()
                    dst = pdf["dst"].to_numpy()
                    si = np.searchsorted(ids_s, src)
                    di = np.searchsorted(ids_s, dst)
                    yield pd.DataFrame({
                        "src": src, "dst": dst,
                        "_cos": np.einsum("ij,ij->i", m[si], m[di])})
            return cand.mapInPandas(score, "src long, dst long, _cos double")
        return (cand
                .join(base.select(F.col("nid").alias("src"),
                                  F.col("_v").alias("_vs")), "src")
                .join(base.select(F.col("nid").alias("dst"),
                                  F.col("_v").alias("_vd")), "dst")
                .select("src", "dst",
                        _dot_expr(F.col("_vs"), F.col("_vd")).alias("_cos")))

    def top_k(cand: DataFrame) -> DataFrame:
        scored = score_pairs(cand)
        w = Window.partitionBy("src").orderBy(F.col("_cos").desc(),
                                              F.col("dst"))
        return (scored.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") <= kk)
                .select("src", "dst", "_cos", "_rn")
                .localCheckpoint(eager=True))

    graph = top_k(init)
    for _ in range(iters):
        edges = graph.select("src", "dst")
        # Neighbor-of-neighbor proposals over the UNDIRECTED graph —
        # reverse edges matter: x's good neighbors discover x back.
        sym = edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        non = (sym.alias("a")
               .join(sym.alias("b"), F.col("a.dst") == F.col("b.src"))
               .select(F.col("a.src").alias("src"), F.col("b.dst").alias("dst"))
               .filter(F.col("src") != F.col("dst")))
        cand = non.unionByName(edges).distinct()
        new_graph = top_k(cand)
        graph.unpersist()
        graph = new_graph
    return graph.select(F.col("src").alias("vec_id"),
                        F.col("dst").alias("neighbor_id"),
                        F.round("_cos", 6).alias("cos_sim"),
                        F.col("_rn").cast("int").alias("rank"))
