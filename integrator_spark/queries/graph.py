"""Graph-analytics queries: PageRank centrality over the document
similarity graph (SURVEY.md §2.10 adjacency — the "which duplicate is
canonical" / "which doc is central" signal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.dedup import ngram_jaccard_pairs
from ..operators.graph import bfs_levels, pagerank, triangle_census
from ..registry import register

#: Co-purchase graph: parts sharing an order, one undirected edge per
#: distinct pair (a < b). The standard market-basket projection — at
#: scale the self-join shuffles lineitem once on l_orderkey and the
#: per-order fan-out is C(lines_per_order, 2), bounded by TPC-H's ≤7
#: lines (C(7,2) = 21 pairs) — never a cartesian.
_COPURCHASE_SQL = """
SELECT DISTINCT a.l_partkey AS s, b.l_partkey AS d
FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
WHERE a.l_partkey < b.l_partkey
"""


def _copurchase_edges(spark: SparkSession, sf_dir: str,
                      min_weight: int = 1) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("k"),
                  F.col("l_partkey").alias("s"))
    b = li.select(F.col("l_orderkey").alias("k"),
                  F.col("l_partkey").alias("d"))
    pairs = (a.join(b, "k").filter(F.col("s") < F.col("d")))
    if min_weight <= 1:
        return pairs.select("s", "d").distinct()
    return (pairs.groupBy("s", "d").agg(F.count(F.lit(1)).alias("w"))
            .filter(F.col("w") >= min_weight).select("s", "d"))


@register("graph_pagerank", oracle=None, tags=("graph", "pagerank"))
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the undirected ≥0.5-Jaccard document similarity
    graph (each pair contributes both directions): ranks the central
    member of every near-dup cluster. Rows-only: iterative FP has no
    ANSI-SQL oracle; tests/test_operators.py property-checks the
    operator against a NumPy power iteration to 1e-9 on fuzzed graphs,
    and asserts mass conservation here."""
    d = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, k=3, threshold=0.5).select("d1", "d2")
    edges = pairs.unionByName(
        pairs.select(F.col("d2").alias("d1"), F.col("d1").alias("d2")))
    ranks = pagerank(edges, src="d1", dst="d2", iterations=10)
    return (ranks.select(F.col("node").alias("doc_id"),
                         F.round("rank", 9).alias("rank"))
            .orderBy(F.col("rank").desc(), "doc_id").limit(50))


@register("graph_triangles", oracle=f"""
WITH e AS ({_COPURCHASE_SQL}),
deg AS (
  SELECT node, COUNT(*) AS dg FROM (
    SELECT s AS node FROM e UNION ALL SELECT d FROM e) GROUP BY node
),
tri AS (
  SELECT COUNT(*) AS n_triangles
  FROM e ab JOIN e bc ON ab.d = bc.s
  JOIN e ac ON ac.s = ab.s AND ac.d = bc.d
)
SELECT (SELECT COUNT(*) FROM deg) AS n_nodes,
       (SELECT COUNT(*) FROM e) AS n_edges,
       (SELECT CAST(SUM(dg * (dg - 1) // 2) AS BIGINT) FROM deg) AS n_wedges,
       n_triangles,
       ROUND(3.0 * n_triangles
             / (SELECT SUM(dg * (dg - 1) / 2) FROM deg), 9)
         AS clustering_coeff
FROM tri
""", tags=("graph", "triangles"))
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census + global clustering coefficient of the
    part co-purchase graph (market-basket projection of lineitem):
    how clustered is "bought together"? The same census flags
    template/link-farm clusters in a web-corpus pipeline.

    The operator orients edges by (degree, id) before the wedge join —
    the compact-forward algorithm — so the join fan-out per middle
    vertex is O(sqrt(m)) regardless of degree skew; the oracle counts
    the identical triangle set with the orientation-free a<b<c 3-way
    join (any acyclic orientation preserves the census, so both
    formulations agree exactly). Single-row output assembled from
    bounded 1-row frames (allowlisted crossJoin). The co-purchase
    derivation already emits distinct s<d pairs, so the census skips
    its canonicalizing shuffle (assume_canonical)."""
    edges = _copurchase_edges(spark, sf_dir)
    return triangle_census(edges, src="s", dst="d", assume_canonical=True)


@register("graph_bfs", oracle=f"""
WITH RECURSIVE w AS (
  SELECT s, d FROM (
    SELECT a.l_partkey AS s, b.l_partkey AS d, COUNT(*) AS w
    FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
    WHERE a.l_partkey < b.l_partkey GROUP BY 1, 2) WHERE w >= 2
),
u AS (SELECT s, d FROM w UNION SELECT d, s FROM w),
r(node, lvl) AS (
  SELECT MIN(s), 0 FROM w HAVING MIN(s) IS NOT NULL
  UNION
  SELECT u.d, r.lvl + 1 FROM r JOIN u ON u.s = r.node WHERE r.lvl < 6
)
SELECT lvl AS level, COUNT(*) AS n_nodes
FROM (SELECT node, MIN(lvl) AS lvl FROM r GROUP BY node)
GROUP BY level ORDER BY level
""", tags=("graph", "bfs"))
def graph_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hop-distance profile (BFS levels, depth ≤ 6) from the
    lowest-numbered part over the ≥2-support co-purchase graph —
    the sparser repeat-co-purchase graph so the frontier takes several
    rounds to saturate (7 levels at sf0.01). Batch analog of
    crawl-frontier expansion / k-hop neighborhood queries.

    Spark side is bulk-synchronous frontier BFS (operators/graph.py
    bfs_levels): per round one shuffle join frontier×adjacency, a
    distinct, an anti-join against visited, lineage truncated per
    round. The oracle is the textbook recursive CTE bounded at the
    same depth with MIN(level) per node — identical minimal-hop
    semantics. Output is the per-level node count (small, stable);
    an empty edge set yields an empty result on both engines (the
    oracle's HAVING guard drops the NULL base row)."""
    edges = _copurchase_edges(spark, sf_dir, min_weight=2)
    source = edges.agg(F.min("s")).collect()[0][0]  # bounded 1-row scalar
    if source is None:  # no qualifying edges: empty graph, empty result
        return spark.createDataFrame([], "level int, n_nodes long")
    levels = bfs_levels(edges, source=int(source), max_depth=6,
                        src="s", dst="d", assume_canonical=True)
    return (levels.groupBy("level")
            .agg(F.count(F.lit(1)).alias("n_nodes"))
            .orderBy("level"))
