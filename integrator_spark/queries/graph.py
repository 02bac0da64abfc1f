"""Graph-analytics queries: PageRank centrality over the document
similarity graph (SURVEY.md §2.10 adjacency — the "which duplicate is
canonical" / "which doc is central" signal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.dedup import ngram_jaccard_pairs
from ..operators.graph import pagerank
from ..registry import register


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
