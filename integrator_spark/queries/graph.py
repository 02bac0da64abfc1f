"""Graph-analytics queries: PageRank centrality over the document
similarity graph (SURVEY.md §2.10 adjacency — the "which duplicate is
canonical" / "which doc is central" signal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.dedup import ngram_jaccard_pairs
from ..operators.graph import (bfs_levels, common_neighbor_pairs,
                               kcore_peel, pagerank, triangle_census)
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


def pagerank_iter_ctes(damping: float = 0.85,
                       iterations: int = 10) -> list[str]:
    """The unrolled power-iteration CTE triples, generic over node
    type — expects CTEs ``e(s, d)``, ``nodes(node)``, ``nn(n)``,
    ``outdeg(s, deg)`` and ``r0(node, rank)`` upstream. Shared by
    graph_pagerank (long doc ids) and web_host_rank (host strings)."""
    d, od = damping, 1.0 - damping
    its = []
    for i in range(1, iterations + 1):
        p = i - 1
        its.append(f"""
c{i} AS MATERIALIZED (
  SELECT e.d AS node, SUM(r.rank / o.deg) AS contrib
  FROM e JOIN outdeg o ON e.s = o.s JOIN r{p} r ON r.node = e.s
  GROUP BY e.d
), g{i} AS (
  SELECT COALESCE(SUM(r.rank), 0.0) AS dang
  FROM r{p} r LEFT JOIN outdeg o ON r.node = o.s WHERE o.s IS NULL
), r{i} AS MATERIALIZED (
  SELECT n.node,
         {od!r} / nn.n + {d!r} * (COALESCE(c.contrib, 0.0)
                                  + g.dang / nn.n) AS rank
  FROM nodes n LEFT JOIN c{i} c ON c.node = n.node, g{i} g, nn
)""")
    return its


def _pagerank_oracle_sql(damping: float = 0.85, iterations: int = 10,
                         limit: int = 50) -> str:
    """Unrolled power-iteration oracle (graduated graph_pagerank from
    rows-only in round 8, VERDICT r7 item 5b): the iteration count is
    FIXED, so instead of fighting recursive-CTE aggregate restrictions
    the oracle chains one (contrib, dangling, rank) CTE triple per
    iteration — each triple mirrors the operator's round verbatim
    (contrib = SUM(rank/deg) per dst, dangling mass folded back
    uniformly, rank = (1-d)/n + d*(contrib + dang/n)). Per-term
    arithmetic is IEEE-identical across engines (same doubles divided
    by the same integer degrees); only the sum ORDER differs, ~1e-16
    noise against the final ROUND(rank, 9) half-grid at 5e-10 — the
    same coarse-grid-over-noise discipline as the registry header."""
    its = pagerank_iter_ctes(damping, iterations)
    return f"""
WITH words AS MATERIALIZED (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS MATERIALIZED (SELECT DISTINCT doc_id,
              w[i] || '|' || w[i+1] || '|' || w[i+2] AS shingle
       FROM words, unnest(range(1, len(w) - 1)) t(i)),
cnt AS MATERIALIZED (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
prs AS MATERIALIZED (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS n_inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
sim AS MATERIALIZED (SELECT d1, d2 FROM prs
        JOIN cnt ca ON ca.doc_id = d1
        JOIN cnt cb ON cb.doc_id = d2
        WHERE n_inter * 1.0 / (ca.n + cb.n - n_inter) >= 0.5),
e AS MATERIALIZED (SELECT d1 AS s, d2 AS d FROM sim
      UNION ALL SELECT d2 AS s, d1 AS d FROM sim),
nodes AS MATERIALIZED (SELECT s AS node FROM e UNION SELECT d FROM e),
nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM nodes),
outdeg AS MATERIALIZED (SELECT s, COUNT(*) AS deg FROM e GROUP BY s),
r0 AS MATERIALIZED (SELECT node, 1.0 / nn.n AS rank FROM nodes, nn),{",".join(its)}
SELECT node AS doc_id, ROUND(rank, 9) AS rank
FROM r{iterations}
ORDER BY ROUND(rank, 9) DESC, node
LIMIT {limit}
"""


@register("graph_pagerank", oracle=_pagerank_oracle_sql(),
          tags=("graph", "pagerank"))
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the undirected ≥0.5-Jaccard document similarity
    graph (each pair contributes both directions): ranks the central
    member of every near-dup cluster. Oracle-backed since round 8: the
    fixed-iteration, fixed-damping power iteration unrolls into one
    chained CTE triple per round (see ``_pagerank_oracle_sql``); the
    similarity edges reuse dedup_ngram's shingle-join SQL at the 0.5
    threshold. tests/test_operators.py additionally property-checks
    the operator against a NumPy power iteration to 1e-9 on fuzzed
    graphs, and asserts mass conservation here."""
    from ..operators.ckpt import truncated_checkpoint

    d = load_table(spark, sf_dir, "documents")
    # r13 (guide §5 reuse rule): the shingle-join pair derivation is
    # the query's dominant cost and appears TWICE in the edge union
    # (forward + reversed orientation) — checkpoint it once so the
    # operator's eager edge materialization computes the join a single
    # time and the reversed side reads the persisted rows.
    pairs = truncated_checkpoint(
        ngram_jaccard_pairs(d, k=3, threshold=0.5).select("d1", "d2"),
        eager=False)
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


@register("graph_assortativity", oracle=f"""
WITH e AS ({_COPURCHASE_SQL}),
sym AS (
  SELECT s, d FROM e UNION ALL SELECT d AS s, s AS d FROM e
), deg AS (
  SELECT s AS node, CAST(COUNT(*) AS BIGINT) AS dg FROM sym GROUP BY s
), pts AS (
  SELECT ds.dg AS x, dd.dg AS y
  FROM sym JOIN deg ds ON sym.s = ds.node
           JOIN deg dd ON sym.d = dd.node
), sums AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM pts
)
SELECT m,
       ROUND((CAST(m AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sx)
             / (CAST(m AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 6)
         AS assortativity
FROM sums
""", tags=("graph", "stats"))
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the co-purchase graph — the Pearson
    correlation of endpoint degrees over (symmetrized) edges: positive
    means hubs link to hubs, negative means hub-and-spoke. On the
    symmetrized point set the x and y marginals are identical, so the
    formula collapses to one x-moment pair plus the cross term — all
    EXACT integer sums (degrees are ints) with a single float division
    at the end, the same sufficient-statistics shape as agg_moments.

    Shape: one self-join on l_orderkey for edges (per-order fan-out
    bounded like graph_triangles), a degree count, two joins of the
    degree dim onto the edge list, one global agg. The degree joins
    are deliberately NOT broadcast-hinted: deg scales with |V| (every
    part ever co-purchased), so a forced broadcast is exactly the hint
    that breaks first at corpus scale — measured at sf10 (2M nodes) it
    drove executor GC thrash and a 1.11 exponent; unhinted, AQE still
    broadcasts at fixture sizes and switches to a shuffle join when
    deg outgrows the threshold."""
    edges = _copurchase_edges(spark, sf_dir)
    sym = edges.unionByName(
        edges.select(F.col("d").alias("s"), F.col("s").alias("d")))
    deg = sym.groupBy(F.col("s").alias("node")).agg(
        F.count(F.lit(1)).alias("dg"))
    pts = (sym
           .join(deg.select(F.col("node").alias("s"),
                            F.col("dg").alias("x")), "s")
           .join(deg.select(F.col("node").alias("d"),
                            F.col("dg").alias("y")), "d"))
    sums = pts.agg(F.count(F.lit(1)).alias("m"),
                   F.sum("x").alias("sx"),
                   F.sum(F.col("x") * F.col("x")).alias("sxx"),
                   F.sum(F.col("x") * F.col("y")).alias("sxy"))
    m, sx, sxx, sxy = (F.col(c) for c in ("m", "sx", "sxx", "sxy"))
    return sums.select(
        "m",
        F.round((m.cast("double") * sxy - sx.cast("double") * sx)
                / (m.cast("double") * sxx - sx.cast("double") * sx), 6)
         .alias("assortativity"))


@register("graph_jaccard_links", oracle=f"""
WITH e AS ({_COPURCHASE_SQL}),
sym AS (
  SELECT s, d FROM e UNION ALL SELECT d AS s, s AS d FROM e
), deg AS (
  SELECT s AS node, CAST(COUNT(*) AS BIGINT) AS dg FROM sym GROUP BY s
), wedges AS (
  SELECT a.s AS n1, b.d AS n2, CAST(COUNT(*) AS BIGINT) AS cn
  FROM sym a JOIN sym b ON a.d = b.s AND a.s < b.d
  GROUP BY n1, n2 HAVING COUNT(*) >= 3
), cand AS (
  SELECT w.n1, w.n2, w.cn
  FROM wedges w ANTI JOIN e ON e.s = w.n1 AND e.d = w.n2
)
SELECT * FROM (
  SELECT c.n1, c.n2, c.cn,
         ROUND(CAST(c.cn AS DOUBLE) / (d1.dg + d2.dg - c.cn), 6) AS jaccard
  FROM cand c
  JOIN deg d1 ON c.n1 = d1.node
  JOIN deg d2 ON c.n2 = d2.node
)
ORDER BY jaccard DESC, n1, n2 LIMIT 1000
""", tags=("graph", "linkpred"))
def graph_jaccard_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor Jaccard link prediction: for NON-adjacent node
    pairs sharing >= 3 neighbors, score |N(a) n N(b)| / |N(a) u N(b)|
    — the classic "products bought together with the same things but
    never together yet" recommender signal, and the graph analog of
    dedup_ngram's shingle-candidate generation.

    Candidates come from the wedge join (bounded per-node like
    graph_triangles — never all pairs), existing edges are removed
    with an anti join, and the degree dimension joins broadcast.
    Scores are exact integer ratios rounded once; the output is the
    deterministic global top-1000 (rounded score desc, then pair keys
    — a TakeOrderedAndProject, no full-sort materialization). The
    >= 3 support floor plus the top-k cut are the hot-node guards at
    fixture scale; the production guard is the same degree cutoff as
    dedup_ngram_guarded."""
    edges = _copurchase_edges(spark, sf_dir)
    sym = edges.unionByName(
        edges.select(F.col("d").alias("s"), F.col("s").alias("d")))
    deg = sym.groupBy(F.col("s").alias("node")).agg(
        F.count(F.lit(1)).alias("dg"))
    # r12 (guide §4.2): the wedge join materialized Σ deg² = 298M rows
    # at sf0.1 (the ~25 s wall) only to count them per pair; the
    # common-neighbor counting now runs in the budget-gated CSR
    # bincount kernel (wedge-join fallback past the broadcast budget —
    # see operators/graph.py). est: each lineitem row contributes at
    # most a handful of distinct co-purchase partners; 4× row count
    # over-estimates the distinct edge list at every fixture scale.
    est_edges = 4 * load_table(spark, sf_dir, "lineitem").count()
    cand = common_neighbor_pairs(edges, src="s", dst="d", min_common=3,
                                 est_edges=est_edges)
    return (cand
            .join(F.broadcast(deg.select(F.col("node").alias("n1"),
                                         F.col("dg").alias("dg1"))), "n1")
            .join(F.broadcast(deg.select(F.col("node").alias("n2"),
                                         F.col("dg").alias("dg2"))), "n2")
            .select("n1", "n2", "cn",
                    F.round(F.col("cn").cast("double")
                            / (F.col("dg1") + F.col("dg2") - F.col("cn")), 6)
                     .alias("jaccard"))
            .orderBy(F.desc("jaccard"), "n1", "n2").limit(1000))


#: The ≥2-support co-purchase graph (same as graph_bfs): sparse enough
#: that the 3-core peel actually cascades — at sf0.01 it strips 945 of
#: 2000 parts over a 9-round cascade (the dense ≥1-support graph's
#: 3-core is everything: zero peels, no test value).
_COPURCHASE2_SQL = """
SELECT s, d FROM (
  SELECT a.l_partkey AS s, b.l_partkey AS d, COUNT(*) AS w
  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey < b.l_partkey GROUP BY 1, 2) WHERE w >= 2
"""


def _kcore_oracle_sql(k: int = 3, rounds: int = 10) -> str:
    """Unrolled fixed-round peeling oracle for graph_kcore (same
    unrolling idea as the pagerank oracle): each round is one
    (degree, survivors, surviving-edges) CTE triple mirroring
    ``kcore_peel``'s round verbatim. Pure integer arithmetic — the
    engines must agree bit-for-bit, no grid rounding needed."""
    its = []
    for i in range(1, rounds + 1):
        p = i - 1
        its.append(f"""
d{i} AS MATERIALIZED (SELECT s, COUNT(*) AS deg FROM e{p} GROUP BY s),
n{i} AS MATERIALIZED (SELECT s FROM d{i} WHERE deg >= {k}),
e{i} AS MATERIALIZED (
  SELECT e.s, e.d FROM e{p} e
  JOIN n{i} a ON e.s = a.s JOIN n{i} b ON e.d = b.s
)""")
    return f"""
WITH u AS ({_COPURCHASE2_SQL}),
e0 AS MATERIALIZED (SELECT s, d FROM u UNION ALL SELECT d, s FROM u),
{",".join(its)}
SELECT s AS node, CAST(COUNT(*) AS BIGINT) AS core_degree
FROM e{rounds}
GROUP BY s HAVING COUNT(*) >= {k}
ORDER BY node
"""


@register("graph_kcore", oracle=_kcore_oracle_sql(),
          tags=("graph", "kcore"))
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core of the repeat-co-purchase graph (≥2-support edges, as in
    graph_bfs): the maximal subgraph where every surviving part still
    co-occurs with ≥ 3 other surviving parts — the standard "dense
    backbone" extraction that strips hanging tendrils a raw degree
    filter would keep (a degree-50 node dies if its neighbors are all
    leaves). In a web-corpus pipeline the same peel separates
    densely-interlinked template / link-farm cores from organically-
    linked pages, complementing the triangle census's global number
    with per-node membership. At sf0.01 the peel is a genuine
    9-round cascade killing 945 of 2000 parts.

    Spark side is fixed-10-round BSP peeling (operators/graph.py
    kcore_peel — degree groupBy + two node-key joins per round,
    lineage truncated); the oracle unrolls the identical rounds into
    CTE triples, so both engines execute the same monotone cascade on
    exact integers (peeling is idempotent once stable — extra rounds
    are no-ops, and an unconverged deeper cascade is the same
    well-defined partial peel on both sides; non-oracle callers pass
    ``rounds=None`` for signature-terminated peeling to the TRUE
    k-core regardless of cascade depth). Output is
    (node, core_degree) sorted by node."""
    edges = _copurchase_edges(spark, sf_dir, min_weight=2)
    core = kcore_peel(edges, k=3, rounds=10, src="s", dst="d",
                      assume_canonical=True)
    return core.orderBy("node")


@register("graph_kcore_converged", oracle=_kcore_oracle_sql(rounds=12),
          tags=("graph", "kcore", "iterative"))
def graph_kcore_converged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same 3-core through the CONVERGENCE-DETECTED peel
    (``rounds=None``, round-9): the loop stops the first time the
    surviving edge set's (count, xxhash64-sum) signature repeats —
    the exact fixed point, however deep the cascade. The oracle is the
    fixed-round unrolling with margin (12 rounds vs the fixture's
    measured 9-round cascade): peeling is monotone and idempotent once
    stable, so ANY round count ≥ the cascade depth equals the
    converged result — the oracle-parity dial, valid at every gate
    fixture, while the engine needs no depth knowledge at all (the
    property test pins rounds=None against a pure-python full peel on
    graphs whose cascade exceeds any fixed budget)."""
    edges = _copurchase_edges(spark, sf_dir, min_weight=2)
    core = kcore_peel(edges, k=3, rounds=None, src="s", dst="d",
                      assume_canonical=True)
    return core.orderBy("node")


def _label_prop_oracle_sql(rounds: int = 8) -> str:
    """Unrolled synchronous-LPA oracle (the kcore/pagerank unrolling
    idea): each round is one (neighbor-label counts, winner, labels)
    CTE pair mirroring operators/graph.py::label_propagation verbatim.
    Pure integer arithmetic and explicit (count DESC, label ASC)
    tie-breaks — the engines must agree bit-for-bit."""
    its = []
    for i in range(1, rounds + 1):
        p = i - 1
        its.append(f"""
c{i} AS MATERIALIZED (
  SELECT e.d AS node, l.label, COUNT(*) AS c
  FROM e JOIN l{p} l ON l.node = e.s
  GROUP BY 1, 2
),
l{i} AS MATERIALIZED (
  SELECT l.node, COALESCE(w.label, l.label) AS label
  FROM l{p} l LEFT JOIN (
    SELECT node, label FROM (
      SELECT node, label,
             row_number() OVER (PARTITION BY node
                                ORDER BY c DESC, label) AS rn
      FROM c{i}) WHERE rn = 1) w ON w.node = l.node
)""")
    return f"""
WITH u AS ({_COPURCHASE2_SQL}),
e AS MATERIALIZED (SELECT s, d FROM u UNION ALL SELECT d, s FROM u),
l0 AS MATERIALIZED (SELECT DISTINCT s AS node, s AS label FROM e),
{",".join(its)}
SELECT l.node, l.label,
       CAST(COUNT(*) OVER (PARTITION BY l.label) AS BIGINT)
         AS community_size
FROM l{rounds} l
ORDER BY node
"""


@register("graph_label_prop", oracle=_label_prop_oracle_sql(),
          tags=("graph", "community", "iterative"))
def graph_label_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous modal label propagation over
    the repeat-co-purchase graph (same ≥2-support edges as
    graph_kcore/graph_bfs) — ORACLE-BACKED end to end: 8 fixed
    synchronous rounds with the deterministic (count DESC, label ASC)
    tie-break unroll into exact-integer CTE pairs, so DuckDB replays
    every labeling round bit-for-bit (operators/graph.py
    label_propagation has the algorithmic contract: why synchronous +
    deterministic tie-break is the engine-replayable formulation, and
    how LPA communities differ from connected components). Output is
    (node, label, community_size), node-sorted."""
    from ..operators.graph import label_propagation

    edges = _copurchase_edges(spark, sf_dir, min_weight=2)
    labels = label_propagation(edges, src="s", dst="d", rounds=8)
    w = Window.partitionBy("label")
    return (labels.select(
                "node", "label",
                F.count(F.lit(1)).over(w).cast("long")
                .alias("community_size"))
            .orderBy("node"))


@register("graph_harmonic", oracle=f"""
WITH RECURSIVE w AS (
  SELECT s, d FROM (
    SELECT a.l_partkey AS s, b.l_partkey AS d, COUNT(*) AS w
    FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
    WHERE a.l_partkey < b.l_partkey GROUP BY 1, 2) WHERE w >= 2
),
u AS (SELECT s, d FROM w UNION SELECT d, s FROM w),
nodes AS (SELECT DISTINCT s AS node FROM u),
seeds AS (SELECT node FROM (
    SELECT node, row_number() OVER (
        ORDER BY md5(CAST(node AS VARCHAR)), node) AS rn
    FROM nodes) WHERE rn <= 16),
r(src, node, lvl) AS (
  SELECT node, node, 0 FROM seeds
  UNION
  SELECT r.src, u.d, r.lvl + 1 FROM r JOIN u ON u.s = r.node
  WHERE r.lvl < 4
),
dist AS (SELECT src, node, MIN(lvl) AS dd FROM r GROUP BY 1, 2),
h AS (SELECT node,
             CAST(SUM(CASE dd WHEN 1 THEN 12 WHEN 2 THEN 6
                              WHEN 3 THEN 4 WHEN 4 THEN 3 END)
                  AS BIGINT) AS h12,
             COUNT(*) AS n_reached
      FROM dist WHERE dd >= 1 GROUP BY node)
SELECT node, h12 / 12.0 AS harmonic, n_reached
FROM h
ORDER BY h12 DESC, node
LIMIT 20
""", tags=("graph", "centrality"))
def graph_harmonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled-source harmonic centrality (Boldi & Vigna's harmonic
    axiomatization; Eppstein–Wang style source sampling) over the
    ≥2-support co-purchase graph — ORACLE-BACKED: 16 md5-ranked
    sample sources, multi-source frontier BFS to depth 4, and each
    node's score is Σ 1/d(s, ·) over the sampled sources. The exact
    all-pairs version is O(n·m) and inherently out of reach at scale;
    source sampling is THE production estimator (error ~ 1/sqrt(S),
    sources chosen by the same content-independent md5 rank every
    det-family query uses).

    Cross-engine float discipline: 1/3 is not exact in binary, and 16
    float adds in engine-dependent order could differ in the last bit
    — so both engines sum 12/d (exact small INTEGERS: 12, 6, 4, 3)
    and divide once at the end. Ordering and ties are decided on the
    integer sum; the oracle's recursive CTE takes MIN(lvl) per
    (source, node) exactly like the BFS operator's anti-join.

    Scale shape: state per round is one slim (src, node) frontier —
    16·|reached| rows, shuffled on node; the adjacency re-shuffles per
    round and AQE coalesces. Rounds are lineage-truncated
    (operators/ckpt.py). Depth and source count are the accuracy
    dials; neither changes the per-round plan."""
    from ..operators.ckpt import truncated_checkpoint

    edges = _copurchase_edges(spark, sf_dir, min_weight=2)
    adj = edges.unionByName(
        edges.select(F.col("d").alias("s"), F.col("s").alias("d")))
    adj = adj.select(F.col("s").alias("e_s"), F.col("d").alias("e_d"))
    adj = adj.localCheckpoint(eager=True)
    nodes = adj.select(F.col("e_s").alias("node")).distinct()
    # TakeOrderedAndProject, not a global row_number window: the seed
    # rank must not single-partition-sort |V| rows at scale (same
    # idiom as the IVF det fit's seed selection).
    seed_rows = (nodes.select(F.md5(F.col("node").cast("string"))
                              .alias("_h"), "node")
                 .orderBy("_h", "node").limit(16).collect())
    seeds = spark.createDataFrame(
        [(int(r["node"]),) for r in seed_rows], "src long")
    visited = seeds.select("src", F.col("src").alias("node"),
                           F.lit(0).alias("lvl"))
    frontier = visited.select("src", "node")
    for lvl in range(1, 5):
        # eager=False (r12, guide §1.2): the isEmpty probe / next
        # round's join materializes the lazy checkpoints — no dedicated
        # checkpoint job barrier per level.
        nxt = truncated_checkpoint(
            frontier.join(adj, frontier["node"] == adj["e_s"])
            .select("src", F.col("e_d").alias("node")).distinct()
            .join(visited, ["src", "node"], "left_anti"), eager=False)
        if nxt.isEmpty():
            break
        visited = truncated_checkpoint(visited.unionByName(
            nxt.select("src", "node", F.lit(lvl).alias("lvl"))),
            eager=False)
        frontier = nxt
    h12 = F.sum(F.when(F.col("lvl") == 1, 12)
                .when(F.col("lvl") == 2, 6)
                .when(F.col("lvl") == 3, 4)
                .when(F.col("lvl") == 4, 3)).cast("long")
    return (visited.filter(F.col("lvl") >= 1)
            .groupBy("node")
            .agg(h12.alias("h12"), F.count(F.lit(1)).alias("n_reached"))
            .orderBy(F.col("h12").desc(), "node").limit(20)
            .select("node", (F.col("h12") / 12.0).alias("harmonic"),
                    "n_reached"))


@register("graph_mst", oracle=None, tags=("graph", "mst"))
def graph_mst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAXIMUM spanning forest of the weighted co-purchase graph — the
    strongest-affinity backbone (for every pair of co-purchasable
    parts, the single highest-co-purchase path connecting them) — by
    distributed Borůvka (operators/graph.py::boruvka_msf): every
    component picks its best incident edge per round under the strict
    total order (w DESC, s, d), components star-contract, O(log n)
    rounds. The strict order makes the forest UNIQUE, so the test pins
    EXACT edge-set equality against a from-scratch Python Kruskal —
    rows-only only because Borůvka's per-round contraction doesn't fit
    a static SQL oracle (same posture as the converged iterative
    loops), with the external reference giving equality, not a bound.

    Scale: each round is two node-key joins + one component-window
    min + star CC over <= one-edge-per-component; rounds halve the
    component count, so 30 rounds cover 1B nodes. Weights (co-purchase
    counts) are exact ints."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("k"),
                  F.col("l_partkey").alias("s"))
    b = li.select(F.col("l_orderkey").alias("k"),
                  F.col("l_partkey").alias("d"))
    edges = (a.join(b, "k").filter(F.col("s") < F.col("d"))
             .groupBy("s", "d").agg(F.count(F.lit(1)).alias("w"))
             .filter(F.col("w") >= 2))
    from ..operators.graph import boruvka_msf

    msf = boruvka_msf(edges, maximum=True)
    return msf.select("s", "d", F.col("w").cast("long").alias("w")) \
        .orderBy("s", "d")
