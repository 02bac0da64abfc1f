"""Web-pipeline operators — the crawl-side preprocessing a 100 TB
training-data build runs BEFORE the text/dedup families: HTML
boilerplate extraction (the WET step), URL canonicalization +
canonical-URL dedup (the CCNet/RefinedWeb crawl-frontier rule), and
the host-level link graph (PageRank-style quality priors feed off
it — graph_pagerank composes downstream).

The documents fixture carries plain text, so each query first RENDERS
a deterministic single-line HTML page around the real text (nav + ad
block + <article> + cross-host link + footer) — the same
deterministic-synthesis-then-real-operator pattern as the multimodal
family (queries/multimodal.py paints pixels; here we emit markup).
The rendered URL varies case / default port / fragment / utm_*
tracking params by doc_id residues so canonicalization has real work
to do. Every operator is pure JVM column expressions (regexp +
higher-order array functions — no Python, no shuffle before the final
aggregate), and every render/extract step replays verbatim in DuckDB,
so the whole family is oracle hash-checked end to end.

Scale posture: render + extract are per-row (partition-parallel, no
shuffle); url-dedup shuffles once on the canonical key (hash-keyed,
never all-pairs); the link graph shuffles once on the (src,dst) host
pair — host cardinality, not page cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register

# --------------------------------------------------------------------------
# Deterministic page render — one expression, mirrored in SQL below.
# The cross-host "related" URL is the canonicalization workload:
#   host case flips on doc_id % 2, default :443 appears on % 3,
#   #fragment on % 4, utm_source / UTM_campaign / utm_content always
#   (utm_content carries the unique doc_id, so two docs with equal
#   doc_id % 40 share a canonical URL only after tracking removal —
#   the %5 host residue is implied since 5 | 40).


def _raw_url_col() -> F.Column:
    ref = (F.col("doc_id") % 40).cast("string")
    cdn = F.concat(F.lit("cdn.src"), (F.col("doc_id") % 5).cast("string"),
                   F.lit(".example.com"))
    cdn = F.when(F.col("doc_id") % 2 == 1, F.upper(cdn)).otherwise(cdn)
    port = F.when(F.col("doc_id") % 3 == 0, F.lit(":443")).otherwise(F.lit(""))
    frag = F.when(F.col("doc_id") % 4 == 2, F.lit("#sec2")).otherwise(F.lit(""))
    return F.concat(
        F.lit("https://"), cdn, port, F.lit("/doc/"), ref,
        F.lit("?utm_source=feed&id="), ref,
        F.lit("&UTM_campaign=c"), (F.col("doc_id") % 3).cast("string"),
        F.lit("&utm_content="), F.col("doc_id").cast("string"), frag)


def _page_col() -> F.Column:
    host = F.concat(F.lit("www."), F.col("source"), F.lit(".example.com"))
    return F.concat(
        F.lit("<html><head><title>"), F.col("source"), F.lit(" #"),
        F.col("doc_id").cast("string"), F.lit("</title></head><body>"),
        F.lit('<nav><a href="https://'), host, F.lit('/">Home</a> '),
        F.lit('<a href="https://'), host, F.lit('/about">About</a></nav>'),
        F.lit('<div class="ad">Subscribe now - best deals</div>'),
        F.lit("<article><p>"), F.col("text"), F.lit("</p></article>"),
        F.lit('<a href="'), _raw_url_col(), F.lit('">related</a>'),
        F.lit("<footer>(c) 2026 "), F.col("source"),
        F.lit(' <a href="/terms">Terms</a></footer></body></html>'))


_SQL_RAW_URL = """
'https://'
|| CASE WHEN doc_id % 2 = 1
        THEN upper('cdn.src' || CAST(doc_id % 5 AS VARCHAR) || '.example.com')
        ELSE 'cdn.src' || CAST(doc_id % 5 AS VARCHAR) || '.example.com' END
|| CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE '' END
|| '/doc/' || CAST(doc_id % 40 AS VARCHAR)
|| '?utm_source=feed&id=' || CAST(doc_id % 40 AS VARCHAR)
|| '&UTM_campaign=c' || CAST(doc_id % 3 AS VARCHAR)
|| '&utm_content=' || CAST(doc_id AS VARCHAR)
|| CASE WHEN doc_id % 4 = 2 THEN '#sec2' ELSE '' END
"""

_SQL_PAGE = f"""
'<html><head><title>' || source || ' #' || CAST(doc_id AS VARCHAR)
|| '</title></head><body>'
|| '<nav><a href="https://www.' || source || '.example.com/">Home</a> '
|| '<a href="https://www.' || source || '.example.com/about">About</a></nav>'
|| '<div class="ad">Subscribe now - best deals</div>'
|| '<article><p>' || text || '</p></article>'
|| '<a href="' || ({_SQL_RAW_URL}) || '">related</a>'
|| '<footer>(c) 2026 ' || source
|| ' <a href="/terms">Terms</a></footer></body></html>'
"""


@register("web_html_extract", oracle=f"""
WITH page AS (SELECT doc_id, ({_SQL_PAGE}) AS page FROM documents),
ext AS (SELECT doc_id, page,
               trim(regexp_replace(regexp_replace(
                   COALESCE(regexp_extract(page,
                       '<article>(.*)</article>', 1), ''),
                   '<[^>]*>', ' ', 'g'), ' +', ' ', 'g')) AS main_text
        FROM page)
SELECT doc_id, main_text,
       CAST(length(page) AS BIGINT) AS page_chars,
       CAST(length(main_text) AS BIGINT) AS main_chars,
       ROUND(1.0 - length(main_text) * 1.0 / length(page), 6)
         AS boilerplate_ratio
FROM ext
ORDER BY doc_id
""", tags=("web", "text"))
def web_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML MAIN-CONTENT extraction (the WET/trafilatura step of a
    crawl pipeline): isolate the <article> region, strip every tag to
    a space, collapse runs, trim — pure JVM regexp per row, no
    shuffle. Reports the extracted text plus the boilerplate ratio
    (share of page bytes that were chrome, not content) — the ratio
    itself is a standard crawl-quality filter input. The page is the
    deterministic render documented in the module header, so DuckDB
    rebuilds the identical markup and the extraction must reproduce
    the original document text exactly (pinned in tests)."""
    d = load_table(spark, sf_dir, "documents")
    page = d.select("doc_id", _page_col().alias("page"))
    main = F.trim(F.regexp_replace(F.regexp_replace(
        F.regexp_extract(F.col("page"), "<article>(.*)</article>", 1),
        "<[^>]*>", " "), " +", " "))
    return (page.withColumn("main_text", main)
            .select("doc_id", "main_text",
                    F.length("page").cast("long").alias("page_chars"),
                    F.length("main_text").cast("long").alias("main_chars"),
                    F.round(F.lit(1.0) - F.length("main_text")
                            / F.length("page").cast("double"), 6)
                     .alias("boilerplate_ratio"))
            .orderBy("doc_id"))


# Canonicalization, shared by the mapping and dedup queries:
# lowercase the host, strip the https default port, drop the
# fragment, remove utm_* params case-insensitively (an array filter,
# not a regex splice — param VALUES stay untouched), keep order.
_SQL_CANON = """
sp AS (SELECT doc_id, raw_url,
              lower(COALESCE(regexp_extract(raw_url,
                  '^https://([^/?#]+)', 1), '')) AS hostport,
              COALESCE(regexp_extract(raw_url,
                  '^https://[^/?#]+([^?#]*)', 1), '') AS path,
              COALESCE(regexp_extract(raw_url, '\\?([^#]*)', 1), '')
                AS query
       FROM raw),
canon AS (
  SELECT doc_id, raw_url,
         'https://' || regexp_replace(hostport, ':443$', '') || path ||
         CASE WHEN kept = '' THEN '' ELSE '?' || kept END AS canon_url
  FROM (SELECT doc_id, raw_url, hostport, path,
               array_to_string(list_filter(string_split(query, '&'),
                   x -> x <> '' AND NOT starts_with(lower(x), 'utm_')),
                   '&') AS kept
        FROM sp))
"""


def _canon_col(url: F.Column) -> F.Column:
    hostport = F.lower(F.regexp_extract(url, "^https://([^/?#]+)", 1))
    path = F.regexp_extract(url, "^https://[^/?#]+([^?#]*)", 1)
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    kept = F.array_join(
        F.filter(F.split(query, "&"),
                 lambda x: (x != "")
                 & ~F.lower(x).startswith("utm_")), "&")
    return F.concat(
        F.lit("https://"), F.regexp_replace(hostport, ":443$", ""), path,
        F.when(kept == "", F.lit("")).otherwise(F.concat(F.lit("?"), kept)))


@register("web_url_canonicalize", oracle=f"""
WITH raw AS (SELECT doc_id, ({_SQL_RAW_URL}) AS raw_url FROM documents),
{_SQL_CANON}
SELECT doc_id, raw_url, canon_url FROM canon ORDER BY doc_id
""", tags=("web", "url"))
def web_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL CANONICALIZATION — the crawl-frontier identity rule:
    lowercase the host, strip the scheme-default port, drop the
    fragment, and remove utm_* tracking params case-insensitively
    while preserving every other param (an array higher-order filter
    over the split query string — values are never regex-spliced, so
    a param VALUE containing 'utm_' survives). Per-row JVM
    expressions, no shuffle; the same rules replay in DuckDB over the
    same rendered raw URLs."""
    d = load_table(spark, sf_dir, "documents")
    raw = d.select("doc_id", _raw_url_col().alias("raw_url"))
    return (raw.withColumn("canon_url", _canon_col(F.col("raw_url")))
            .orderBy("doc_id"))


@register("web_url_dedup", oracle=f"""
WITH raw AS (SELECT doc_id, ({_SQL_RAW_URL}) AS raw_url FROM documents),
{_SQL_CANON}
SELECT canon_url,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id
FROM canon
GROUP BY canon_url
HAVING COUNT(*) > 1
ORDER BY canon_url
""", tags=("web", "url", "dedup"))
def web_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CANONICAL-URL dedup — the cheapest dedup tier of a crawl
    pipeline, run before any content hashing: group documents by
    canonical URL (distinct raw URLs that differ only in host case /
    default port / fragment / tracking params collapse together) and
    keep the first doc per group. Reports the colliding groups with
    their keeper. One hash-keyed shuffle on the canonical string —
    the 100 TB posture is identical to dedup_exact's."""
    d = load_table(spark, sf_dir, "documents")
    canon = d.select(
        "doc_id", _canon_col(_raw_url_col()).alias("canon_url"))
    return (canon.groupBy("canon_url")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.min("doc_id").alias("keep_doc_id"))
            .filter(F.col("n_docs") > 1)
            .orderBy("canon_url"))


@register("web_link_graph", oracle=f"""
WITH page AS (SELECT doc_id, source, ({_SQL_PAGE}) AS page FROM documents),
links AS (SELECT doc_id, source,
                 unnest(regexp_extract_all(page, 'href="([^"]*)"', 1))
                   AS href
          FROM page),
hosts AS (SELECT 'www.' || source || '.example.com' AS src_host,
                 CASE WHEN starts_with(href, 'https://')
                      THEN regexp_replace(lower(COALESCE(regexp_extract(
                               href, '^https://([^/?#]+)', 1), '')),
                           ':443$', '')
                      ELSE 'www.' || source || '.example.com' END AS dst_host
          FROM links)
SELECT src_host, dst_host, CAST(COUNT(*) AS BIGINT) AS n_links
FROM hosts
GROUP BY src_host, dst_host
ORDER BY src_host, dst_host
""", tags=("web", "graph"))
def web_link_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOST-LEVEL LINK GRAPH from the rendered pages: every href is
    pulled with one regexp_extract_all pass (nav + related + footer),
    relative links resolve against the page's own host, absolute
    links contribute their canonicalized (lowercased, default-port-
    stripped) target host, and edges aggregate to (src_host,
    dst_host, n_links). This is the input surface for link-based
    quality priors (graph_pagerank runs downstream on exactly this
    shape). The only shuffle is the final host-pair aggregation —
    host-pair cardinality, not page cardinality."""
    d = load_table(spark, sf_dir, "documents")
    page = d.select("doc_id", "source", _page_col().alias("page"))
    own = F.concat(F.lit("www."), F.col("source"), F.lit(".example.com"))
    links = page.select(
        "source", own.alias("src_host"),
        F.explode(F.regexp_extract_all(
            F.col("page"), F.lit('href="([^"]*)"'), 1)).alias("href"))
    dst = F.when(
        F.col("href").startswith("https://"),
        F.regexp_replace(
            F.lower(F.regexp_extract(F.col("href"),
                                     "^https://([^/?#]+)", 1)),
            ":443$", "")).otherwise(F.col("src_host"))
    return (links.withColumn("dst_host", dst)
            .groupBy("src_host", "dst_host")
            .agg(F.count(F.lit(1)).alias("n_links"))
            .orderBy("src_host", "dst_host"))


_WEB_CURATION_ORACLE = f"""
WITH raw AS (SELECT doc_id, ({_SQL_RAW_URL}) AS raw_url FROM documents),
{_SQL_CANON},
url_keep AS (
  SELECT doc_id FROM (
    SELECT doc_id, MIN(doc_id) OVER (PARTITION BY canon_url) AS k
    FROM canon) WHERE doc_id = k),
ext AS (SELECT d.doc_id,
               trim(regexp_replace(regexp_replace(
                   COALESCE(regexp_extract(({_SQL_PAGE}),
                       '<article>(.*)</article>', 1), ''),
                   '<[^>]*>', ' ', 'g'), ' +', ' ', 'g')) AS main_text
        FROM documents d),
quality AS (SELECT e.doc_id FROM ext e
            JOIN url_keep u ON u.doc_id = e.doc_id
            WHERE len(string_split(main_text, ' ')) >= 25),
eligible AS (SELECT d.* FROM documents d
             JOIN quality q ON q.doc_id = d.doc_id),
words AS (SELECT doc_id, string_split(text, ' ') AS w FROM eligible),
sh AS (SELECT DISTINCT doc_id,
              w[i] || '|' || w[i+1] || '|' || w[i+2] AS shingle
       FROM words, unnest(range(1, len(w) - 1)) t(i)),
hv AS (SELECT doc_id,
              CAST(CAST('0x' || substr(md5(shingle), 1, 8) AS UBIGINT)
                   % 2147483647 AS BIGINT) AS h
       FROM sh),
mh AS (SELECT doc_id, i,
              MIN(((1000003 + 7919 * i) * h + (12345 + 104729 * i))
                  % 2147483647) AS mh
       FROM hv CROSS JOIN (SELECT unnest(range(0, 16)) AS i)
       GROUP BY 1, 2),
bands AS (SELECT doc_id, i // 4 AS band,
                 string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i) AS val
          FROM mh GROUP BY doc_id, i // 4),
kept_b AS (SELECT doc_id, band, val FROM (
    SELECT doc_id, band, val,
           COUNT(*) OVER (PARTITION BY band, val) AS _df FROM bands)
  WHERE _df <= 50),
mcand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
          FROM kept_b a JOIN kept_b b
            ON a.band = b.band AND a.val = b.val AND a.doc_id < b.doc_id),
losers AS (
  SELECT DISTINCT c.d2 AS doc_id FROM mcand c
  JOIN mh x ON x.doc_id = c.d1
  JOIN mh y ON y.doc_id = c.d2 AND y.i = x.i
  GROUP BY c.d1, c.d2
  HAVING SUM(CASE WHEN x.mh = y.mh THEN 1 ELSE 0 END) >= 12),
final AS (SELECT doc_id FROM eligible
          WHERE doc_id NOT IN (SELECT doc_id FROM losers))
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(COUNT(u.doc_id) AS BIGINT) AS n_url_unique,
       CAST(COUNT(q.doc_id) AS BIGINT) AS n_quality,
       CAST(COUNT(f.doc_id) AS BIGINT) AS n_final
FROM documents d
LEFT JOIN url_keep u ON u.doc_id = d.doc_id
LEFT JOIN quality q ON q.doc_id = d.doc_id
LEFT JOIN final f ON f.doc_id = d.doc_id
GROUP BY d.source
ORDER BY d.source
"""


@register("pipeline_web_curation", oracle=_WEB_CURATION_ORACLE,
          tags=("web", "dedup", "pipeline", "mlprep"))
def pipeline_web_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CRAWL-side curation funnel end to end, under ONE oracle —
    the web counterpart of pipeline_semantic_curation, and the order
    a real corpus build runs its tiers (cheapest identity first, so
    each later, costlier stage sees fewer rows):

      (1) canonical-URL keep-first (web_url_dedup's rule — pure
          per-row string work + one hash shuffle),
      (2) main-content quality gate on the EXTRACTED text
          (web_html_extract's pipeline, >= 25 tokens),
      (3) deterministic-MinHash near-dup keep-first over the
          SURVIVORS only (dedup_minhash_keep's guarded-band rule —
          the shingle/signature pass runs on the reduced corpus),

    reported as the per-source funnel n_total -> n_url_unique ->
    n_quality -> n_final. Every stage is the registered operator's
    own rule, not a re-implementation; DuckDB replays the whole
    funnel (render, extraction, canonicalization, both keep-firsts)
    from the raw parquet."""
    from ..operators.dedup import minhash_det_pairs

    d = load_table(spark, sf_dir, "documents")
    canon = d.select("doc_id", _canon_col(_raw_url_col()).alias("canon_url"))
    wk = Window.partitionBy("canon_url")
    # The funnel report joins each stage set back to the fact, so the
    # stage OUTPUTS (tiny doc_id lists) are pinned with eager
    # localCheckpoints — without them Catalyst re-runs the render +
    # extraction subtree once per consumer (3x for url_keep: alone,
    # under quality, and under final; measured 10.8 s -> pinned
    # version re-measured below at sf0.1).
    url_keep = (canon.withColumn("_k", F.min("doc_id").over(wk))
                .filter(F.col("doc_id") == F.col("_k"))
                .select("doc_id").localCheckpoint(eager=True))
    page = d.select("doc_id", _page_col().alias("page"))
    main = F.trim(F.regexp_replace(F.regexp_replace(
        F.regexp_extract(F.col("page"), "<article>(.*)</article>", 1),
        "<[^>]*>", " "), " +", " "))
    quality = (page.join(url_keep, "doc_id", "left_semi")
               .withColumn("main_text", main)
               .filter(F.size(F.split("main_text", " ")) >= 25)
               .select("doc_id").localCheckpoint(eager=True))
    eligible = d.join(quality, "doc_id", "left_semi")
    losers = (minhash_det_pairs(eligible, k=3, n_hashes=16, n_bands=4,
                                max_band_freq=50)
              .filter(F.col("n_equal") >= 12)
              .select(F.col("d2").alias("doc_id"))
              .distinct())
    final = (eligible.join(losers, "doc_id", "left_anti")
             .select("doc_id").localCheckpoint(eager=True))
    mark = lambda s, name: s.withColumn(name, F.lit(1))  # noqa: E731
    return (d.select("doc_id", "source")
            .join(mark(url_keep, "_u"), "doc_id", "left")
            .join(mark(quality, "_q"), "doc_id", "left")
            .join(mark(final, "_f"), "doc_id", "left")
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_total"),
                 F.count("_u").alias("n_url_unique"),
                 F.count("_q").alias("n_quality"),
                 F.count("_f").alias("n_final"))
            .orderBy("source"))


def _host_rank_oracle_sql(damping: float = 0.85,
                          iterations: int = 10) -> str:
    from .graph import pagerank_iter_ctes
    its = pagerank_iter_ctes(damping, iterations)
    return f"""
WITH page AS (SELECT doc_id, source, ({_SQL_PAGE}) AS page FROM documents),
links AS (SELECT doc_id, source,
                 unnest(regexp_extract_all(page, 'href="([^"]*)"', 1))
                   AS href
          FROM page),
hosts AS (SELECT 'www.' || source || '.example.com' AS src_host,
                 CASE WHEN starts_with(href, 'https://')
                      THEN regexp_replace(lower(COALESCE(regexp_extract(
                               href, '^https://([^/?#]+)', 1), '')),
                           ':443$', '')
                      ELSE 'www.' || source || '.example.com' END AS dst_host
          FROM links),
e AS MATERIALIZED (SELECT DISTINCT src_host AS s, dst_host AS d
                   FROM hosts WHERE src_host <> dst_host),
nodes AS MATERIALIZED (SELECT s AS node FROM e UNION SELECT d FROM e),
nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM nodes),
outdeg AS MATERIALIZED (SELECT s, COUNT(*) AS deg FROM e GROUP BY s),
r0 AS MATERIALIZED (SELECT node, 1.0 / nn.n AS rank FROM nodes, nn),{
    ",".join(its)}
SELECT node AS host, ROUND(rank, 9) AS rank
FROM r{iterations}
ORDER BY ROUND(rank, 9) DESC, node
"""


def _host_rank_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(host, rank) over the extracted link graph — the shared body
    of web_host_rank and web_quality_prior."""
    from ..operators.graph import pagerank

    d = load_table(spark, sf_dir, "documents")
    page = d.select("doc_id", "source", _page_col().alias("page"))
    own = F.concat(F.lit("www."), F.col("source"), F.lit(".example.com"))
    links = page.select(
        own.alias("src_host"),
        F.explode(F.regexp_extract_all(
            F.col("page"), F.lit('href="([^"]*)"'), 1)).alias("href"))
    dst = F.when(
        F.col("href").startswith("https://"),
        F.regexp_replace(
            F.lower(F.regexp_extract(F.col("href"),
                                     "^https://([^/?#]+)", 1)),
            ":443$", "")).otherwise(F.col("src_host"))
    edges = (links.withColumn("dst_host", dst)
             .filter(F.col("src_host") != F.col("dst_host"))
             .select("src_host", "dst_host").distinct()
             .localCheckpoint(eager=True))
    hosts = (edges.select(F.col("src_host").alias("host"))
             .unionByName(edges.select(F.col("dst_host").alias("host")))
             .distinct()
             .select("host", F.xxhash64("host").alias("hid"))
             .localCheckpoint(eager=True))
    # Hash ids must be collision-free for the rank join-back to be a
    # bijection; host cardinality is tiny (it bounds this whole plan),
    # so the two-scalar check is a bounded collect.
    n_hosts, n_ids = hosts.agg(
        F.count(F.lit(1)), F.countDistinct("hid")).first()
    if n_hosts != n_ids:  # pragma: no cover - 2^-64-scale event
        raise ValueError("xxhash64 host id collision; re-key with salt")
    he = (edges
          .join(hosts.select(F.col("host").alias("src_host"),
                             F.col("hid").alias("s")), "src_host")
          .join(hosts.select(F.col("host").alias("dst_host"),
                             F.col("hid").alias("d")), "dst_host")
          .select("s", "d"))
    ranks = pagerank(he, src="s", dst="d", iterations=10)
    return (ranks.join(F.broadcast(hosts),
                       ranks.node == hosts.hid)
            .select("host", F.round("rank", 9).alias("rank")))


@register("web_host_rank", oracle=_host_rank_oracle_sql(),
          tags=("web", "graph", "pagerank"))
def web_host_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOST-LEVEL PageRank over the extracted link graph — the
    link-based quality prior a crawl pipeline joins back onto pages
    (the Common-Crawl-style host ranking): web_link_graph's distinct
    host edges (self-links excluded — nav/footer links to your own
    host are not endorsements) feed the shared power-iteration
    operator (operators/graph.py::pagerank, the graph_pagerank
    engine). String hosts ride through the long-keyed operator via a
    collision-checked xxhash64 id and join back to names afterwards —
    a broadcast-size dimension join, never a global window. Oracle:
    the generic unrolled CTE triples (pagerank_iter_ctes) run directly
    over VARCHAR nodes, same IEEE arithmetic, ROUND(rank, 9) grid."""
    return (_host_rank_df(spark, sf_dir)
            .orderBy(F.col("rank").desc(), "host"))


@register("web_quality_prior", oracle=_host_rank_oracle_sql().replace(
    """SELECT node AS host, ROUND(rank, 9) AS rank
FROM r10
ORDER BY ROUND(rank, 9) DESC, node
""", """SELECT d.doc_id,
       regexp_replace(lower(COALESCE(regexp_extract(({_RAW}),
           '^https://([^/?#]+)', 1), '')), ':443$', '') AS out_host,
       ROUND(r.rank, 9) AS out_host_rank
FROM documents d
JOIN r10 r ON r.node = regexp_replace(lower(COALESCE(regexp_extract(
         ({_RAW}), '^https://([^/?#]+)', 1), '')), ':443$', '')
ORDER BY doc_id
""".replace("{_RAW}", _SQL_RAW_URL)),
    tags=("web", "graph", "pagerank", "mlprep"))
def web_quality_prior(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-DOCUMENT link-quality prior — the join a corpus build
    actually runs: each document carries the PageRank of the host its
    content link points to (out_host = the canonicalized related-link
    host), the CCNet/RefinedWeb-style signal used to weight or gate
    pages from low-authority neighborhoods. The rank table is
    host-cardinality (tiny), so it broadcasts onto the fact scan —
    one map-side join, no extra shuffle at any corpus size. Oracle:
    the same unrolled power-iteration chain joined back through the
    identical host-canonicalization expression."""
    ranks = _host_rank_df(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents")
    out_host = F.regexp_replace(
        F.lower(F.regexp_extract(_raw_url_col(),
                                 "^https://([^/?#]+)", 1)),
        ":443$", "")
    return (d.select("doc_id", out_host.alias("out_host"))
            .join(F.broadcast(ranks),
                  F.col("out_host") == F.col("host"))
            .select("doc_id", "out_host",
                    F.col("rank").alias("out_host_rank"))
            .orderBy("doc_id"))
