"""Text-analysis operators over the documents corpus (SURVEY.md §2.10):
wordcount, per-language stats, token counting, tf-idf, language ID,
quality scoring, fingerprinting, chunking.

All pure column expressions (no Python in the hot path); the heuristic
operators (language ID, quality score) are deliberately simple,
deterministic formulas — at production scale you would swap the scoring
expression for a model-backed pandas_udf without touching the
surrounding plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.num import DEC, davg, sql_davg
from ..functions.text import FP_MOD, STOPWORDS, rolling_fingerprint, tokens
from ..io import load_table
from ..registry import register


@register("docs_wordcount", oracle="""
SELECT word, COUNT(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
WHERE length(word) > 3
GROUP BY word
ORDER BY n DESC, word
LIMIT 20
""", tags=("text",))
def docs_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic wordcount: split → explode → filter → count → top-20
    (deterministic tie-break on the word)."""
    d = load_table(spark, sf_dir, "documents")
    return (d.select(F.explode(tokens("text")).alias("word"))
            .filter(F.length("word") > 3)
            .groupBy("word").agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.col("n").desc(), F.col("word"))
            .limit(20))


@register("docs_by_lang", oracle=f"""
SELECT lang,
       COUNT(*) AS n_docs,
       {sql_davg('n_chars')} AS avg_chars,
       COUNT(DISTINCT source) AS n_sources
FROM documents
GROUP BY lang
""", tags=("text",))
def docs_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-sliced corpus stats."""
    d = load_table(spark, sf_dir, "documents")
    return (d.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 davg("n_chars").alias("avg_chars"),
                 F.countDistinct("source").alias("n_sources")))


@register("text_tokens", oracle=f"""
SELECT lang,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_ws_tokens,
       CAST(SUM(len(regexp_extract_all(text, '[a-z0-9]+'))) AS BIGINT)
         AS total_re_tokens,
       {sql_davg("len(string_split(text, ' '))")} AS avg_tokens_per_doc
FROM documents
GROUP BY lang
""", tags=("text", "tokens"))
def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace split and a regex tokenizer
    (the BPE-ish '[a-z0-9]+' word-piece pattern)."""
    d = load_table(spark, sf_dir, "documents")
    ws = F.size(tokens("text")).cast("long")
    re_t = F.size(F.regexp_extract_all("text", F.lit("[a-z0-9]+"), 0)).cast("long")
    return (d.groupBy("lang")
            .agg(F.sum(ws).alias("total_ws_tokens"),
                 F.sum(re_t).alias("total_re_tokens"),
                 davg(F.size(tokens("text"))).alias("avg_tokens_per_doc")))


@register("text_tfidf", oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
), tf AS (
  SELECT doc_id, word, COUNT(*) AS tf FROM tok GROUP BY doc_id, word
), df AS (
  SELECT word, COUNT(*) AS df FROM (SELECT DISTINCT doc_id, word FROM tf)
  GROUP BY word
), n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT tf.word AS word,
       CAST(df.df AS BIGINT) AS df,
       CAST(SUM(tf.tf) AS BIGINT) AS total_tf,
       ROUND(ln(n_docs * 1.0 / df.df), 8) AS idf,
       ROUND(CAST(SUM(CAST(tf.tf * ln(n_docs * 1.0 / df.df) AS DECIMAL(38,6)))
                  AS DOUBLE) / COUNT(*), 6) AS avg_tfidf
FROM tf, df, n
WHERE tf.word = df.word
GROUP BY tf.word, df.df, n_docs
""", tags=("text", "tfidf"))
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-SQL TF-IDF: term frequencies join document frequencies; the
    vocabulary-level aggregate keeps output compact and deterministic.

    (A spark.ml HashingTF+IDF pipeline computes the same weights for
    model consumers; this relational formulation is the oracle-checkable
    one and scales as two hash aggregations + one broadcast join.)
    """
    d = load_table(spark, sf_dir, "documents")
    n_docs = d.count()
    tok = d.select("doc_id", F.explode(tokens("text")).alias("word"))
    tf = tok.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    idf = F.round(F.log(F.lit(float(n_docs)) / F.col("df")), 8)
    tfidf_dec = (F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))) \
        .cast(DEC)
    return (tf.join(F.broadcast(df), "word")
            .groupBy("word", "df")
            .agg(F.sum("tf").alias("total_tf"),
                 F.first(idf).alias("idf"),
                 F.round(F.sum(tfidf_dec).cast("double") / F.count(F.lit(1)), 6)
                  .alias("avg_tfidf"))
            .select("word", F.col("df").cast("long").alias("df"),
                    "total_tf", "idf", "avg_tfidf"))


_LANG_CASE_DUCK = """
CASE WHEN list_contains(string_split(text, ' '), 'the') THEN 'en'
     WHEN list_contains(string_split(text, ' '), 'der') THEN 'de'
     WHEN list_contains(string_split(text, ' '), 'le')  THEN 'fr'
     WHEN list_contains(string_split(text, ' '), 'el')  THEN 'es'
     WHEN list_contains(string_split(text, ' '), 'de')  THEN 'es'
     ELSE 'und' END
"""


@register("text_lang_id", oracle=f"""
SELECT lang, {_LANG_CASE_DUCK} AS predicted, COUNT(*) AS n
FROM documents
GROUP BY 1, 2
""", tags=("text", "langid"))
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: function-word evidence → prediction,
    cross-tabulated against the labeled lang column.

    (The fixture corpus shares one vocabulary across langs, so this
    mostly exercises the plumbing: a real n-gram profile or fastText
    scorer slots in as a pandas_udf producing the same (doc → lang)
    shape.)
    """
    d = load_table(spark, sf_dir, "documents")
    w = tokens("text")
    predicted = (F.when(F.array_contains(w, "the"), "en")
                 .when(F.array_contains(w, "der"), "de")
                 .when(F.array_contains(w, "le"), "fr")
                 .when(F.array_contains(w, "el"), "es")
                 .when(F.array_contains(w, "de"), "es")
                 .otherwise("und"))
    return (d.select("lang", predicted.alias("predicted"))
            .groupBy("lang", "predicted")
            .agg(F.count(F.lit(1)).alias("n")))


_STOP_DUCK = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"


@register("text_quality", oracle=f"""
WITH scored AS (
  SELECT lang,
         len(string_split(text, ' ')) AS n_tokens,
         len(list_filter(string_split(text, ' '),
                         w -> list_contains({_STOP_DUCK}, w))) AS n_stop,
         length(text) AS n_ch
  FROM documents
), q AS (
  SELECT lang,
         0.4 * least(n_tokens / 50.0, 1.0)
         + 0.3 * (1.0 - n_stop * 1.0 / n_tokens)
         + 0.3 * least((n_ch * 1.0 / n_tokens) / 8.0, 1.0) AS quality
  FROM scored
)
SELECT lang,
       COUNT(*) AS n_docs,
       ROUND(CAST(SUM(CAST(quality AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*), 6)
         AS avg_quality,
       CAST(SUM(CASE WHEN quality > 0.75 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_high_quality
FROM q GROUP BY lang
""", tags=("text", "quality"))
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality score: length saturation + content-word ratio +
    mean word length, aggregated per language — the standard cheap
    pre-filter stage of an LLM data pipeline."""
    d = load_table(spark, sf_dir, "documents")
    w = tokens("text")
    n_tokens = F.size(w)
    n_stop = F.size(F.filter(w, lambda x: x.isin(STOPWORDS)))
    n_ch = F.length("text")
    quality = (F.lit(0.4) * F.least(n_tokens / F.lit(50.0), F.lit(1.0))
               + F.lit(0.3) * (F.lit(1.0) - n_stop * F.lit(1.0) / n_tokens)
               + F.lit(0.3) * F.least((n_ch * F.lit(1.0) / n_tokens) / F.lit(8.0),
                                      F.lit(1.0)))
    return (d.select("lang", quality.alias("quality"))
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.round(F.sum(F.col("quality").cast(DEC))
                          .cast("double") / F.count(F.lit(1)), 6)
                  .alias("avg_quality"),
                 F.sum(F.when(F.col("quality") > 0.75, 1).otherwise(0))
                  .alias("n_high_quality")))


@register("text_fingerprint", oracle=f"""
SELECT doc_id,
       md5(text) AS content_md5,
       substring(md5(text), 1, 2) AS bucket,
       list_reduce(
         list_prepend(0, list_transform(string_split(text, ' '),
             w -> CAST(ascii(substring(w, 1, 1)) * 7 + length(w) AS BIGINT))),
         (a, x) -> (a * 31 + x) % {FP_MOD}) AS rolling_fp
FROM documents
""", tags=("text", "fingerprint"))
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: content md5 (exact-dup key), 2-hex-char
    shard bucket, and an order-sensitive polynomial rolling hash —
    all cross-engine reproducible."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("content_md5"),
        F.substring(F.md5("text"), 1, 2).alias("bucket"),
        rolling_fingerprint("text").alias("rolling_fp"),
    )


@register("text_chunk", oracle="""
SELECT doc_id,
       CAST(i AS BIGINT) AS chunk_idx,
       array_to_string(w[(i * 20 + 1):(i * 20 + 20)], ' ') AS chunk,
       CAST(len(w[(i * 20 + 1):(i * 20 + 20)]) AS BIGINT) AS chunk_tokens
FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
     unnest(range(0, CAST(ceil(len(w) / 20.0) AS BIGINT))) t(i)
""", tags=("text", "chunk"))
def text_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-generating chunker: doc → fixed-size (20-token) chunks via
    sequence + slice + posexplode (the set-returning/UDTF shape without
    leaving the JVM)."""
    d = load_table(spark, sf_dir, "documents")
    w = tokens("text")
    n_chunks = F.ceil(F.size(w) / F.lit(20.0)).cast("int")
    chunks = F.transform(F.sequence(F.lit(0), n_chunks - 1),
                         lambda i: F.slice(w, i * 20 + 1, 20))
    return (d.select("doc_id", F.posexplode(chunks).alias("chunk_idx", "cw"))
            .select("doc_id",
                    F.col("chunk_idx").cast("long").alias("chunk_idx"),
                    F.concat_ws(" ", "cw").alias("chunk"),
                    F.size("cw").cast("long").alias("chunk_tokens")))


@register("text_unigram_nll", oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
), freq AS (
  SELECT word, COUNT(*) * 1.0 / (SELECT COUNT(*) FROM tok) AS p
  FROM tok GROUP BY word
), per_doc AS (
  SELECT t.doc_id,
         CAST(SUM(CAST(ROUND(-ln(f.p), 6) AS DECIMAL(38,6))) AS DOUBLE)
           / COUNT(*) AS nll
  FROM tok t JOIN freq f ON t.word = f.word
  GROUP BY t.doc_id
)
SELECT d.lang,
       COUNT(*) AS n_docs,
       ROUND(CAST(SUM(CAST(per_doc.nll AS DECIMAL(38,6))) AS DOUBLE)
             / COUNT(*), 6) AS avg_nll
FROM per_doc JOIN documents d ON d.doc_id = per_doc.doc_id
GROUP BY d.lang
""", tags=("text", "lm"))
def text_unigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level unigram language-model scoring: per-token negative
    log-likelihood against global unigram frequencies, averaged per
    document then per language — the cheap perplexity-style quality
    signal of LLM data pipelines, fully relational (two aggregations +
    one broadcast join of the vocabulary).

    Determinism: each -ln(p) is rounded to 6 decimals (ln differs by
    1 ULP across libm implementations) and summed as exact DECIMAL.
    """
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens("text")).alias("word"))
    total = tok.count()
    freq = (tok.groupBy("word")
            .agg((F.count(F.lit(1)) * F.lit(1.0) / F.lit(float(total))).alias("p")))
    term = F.round(-F.log(F.col("p")), 6).cast(DEC)
    per_doc = (tok.join(F.broadcast(freq), "word")
               .groupBy("doc_id")
               .agg((F.sum(term).cast("double") / F.count(F.lit(1))).alias("nll")))
    return (per_doc.join(d.select("doc_id", "lang"), "doc_id")
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.round(F.sum(F.col("nll").cast(DEC))
                          .cast("double") / F.count(F.lit(1)), 6)
                  .alias("avg_nll")))


@register("text_topk_sketch", oracle=None, tags=("text", "sketch", "approx"))
def text_topk_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via count-min sketch next to exact counts: the
    top-20 words' exact frequencies joined with their CMS point
    estimates (operators/sketch.py — a 4x1024 linear sketch merged
    element-wise across executors; 32 KB of state for any corpus size).
    Rows-only: the sketch layout is engine-specific;
    tests/test_sketches.py asserts the CM guarantee (never
    underestimates; overestimate bounded by eN) against the exact
    column carried alongside."""
    from ..operators.sketch import cms_build, cms_estimate

    d = load_table(spark, sf_dir, "documents")
    tok = d.select(F.explode(tokens("text")).alias("word"))
    matrix = cms_build(tok, "word")
    top = (tok.groupBy("word").agg(F.count(F.lit(1)).alias("exact_n"))
           .orderBy(F.col("exact_n").desc(), "word").limit(20).collect())
    rows = [(r.word, r.exact_n, cms_estimate(matrix, r.word)) for r in top]
    return spark.createDataFrame(rows, "word string, exact_n long, est_n long") \
        .orderBy("word")


@register("text_bigram_lm", oracle="""
WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
bigrams AS (
  SELECT w[i] AS w1, w[i+1] AS w2
  FROM words, unnest(range(1, len(w))) t(i)
),
uni AS (SELECT w1, COUNT(*) AS c1 FROM bigrams GROUP BY w1),
bi AS (SELECT w1, w2, COUNT(*) AS c12 FROM bigrams GROUP BY w1, w2)
SELECT bi.w1, bi.w2, bi.c12,
       ROUND(bi.c12 * 1.0 / uni.c1, 8) AS p_w2_given_w1
FROM bi JOIN uni ON uni.w1 = bi.w1
WHERE bi.c12 >= 20
ORDER BY bi.c12 DESC, bi.w1, bi.w2
LIMIT 50
""", tags=("text", "lm"))
def text_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model statistics: conditional probabilities
    P(w2|w1) from two aggregations + a join — the count-based core of
    n-gram LM training (KenLM-style) as pure relational algebra. The
    probability is an exact rational of identical ints in both engines
    (rounded only for display); the frequency floor keeps the checked
    output compact while the full conditional table is the same plan
    without the filter."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    w = tokens("text")
    # Codegen bigram positions (r12, guide §4.1 — the _trigram_per_doc
    # rewrite at order 2): lead(word, 1) over (doc, pos) IS w[pos + 1].
    words = d.select("doc_id", F.posexplode(w).alias("pos", "word"),
                     F.size(w).alias("n"))
    win = Window.partitionBy("doc_id").orderBy("pos")
    bigrams = (words.select("doc_id", "pos", "n",
                            F.col("word").alias("w1"),
                            F.lead("word", 1).over(win).alias("w2"))
               .filter(F.col("pos") <= F.col("n") - 2)
               .select("w1", "w2")
               # two grouped consumers below — evaluate the window once
               .localCheckpoint(eager=False))
    uni = bigrams.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    bi = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    return (bi.join(uni, "w1")
            .filter(F.col("c12") >= 20)
            .select("w1", "w2", "c12",
                    F.round(F.col("c12") / F.col("c1"), 8)
                     .alias("p_w2_given_w1"))
            .orderBy(F.col("c12").desc(), "w1", "w2")
            .limit(50))


@register("text_keywords", oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
), tf AS (
  SELECT doc_id, word, COUNT(*) AS tf FROM tok GROUP BY doc_id, word
), df AS (
  SELECT word, COUNT(*) AS df FROM tf GROUP BY word
), n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.word,
         ROUND(tf.tf * ln(n_docs * 1.0 / df.df), 8) AS tfidf
  FROM tf JOIN df ON df.word = tf.word CROSS JOIN n
)
SELECT doc_id, word, tfidf,
       CAST(rk AS BIGINT) AS rk
FROM (SELECT doc_id, word, tfidf,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, word) AS rk
      FROM scored)
WHERE rk <= 3 AND doc_id % 20 = 0
""", tags=("text", "keywords"))
def text_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword extraction: top-3 TF-IDF terms per document — the
    tf-idf relational core composed with a per-doc ranking window (the
    classic summarize/tag step before indexing a corpus). The idf join
    broadcasts the vocabulary; the window shuffles on doc_id; rounding
    happens BEFORE ranking so the rank ties break identically in both
    engines."""
    d = load_table(spark, sf_dir, "documents")
    n_docs = d.count()
    tok = d.select("doc_id", F.explode(tokens("text")).alias("word"))
    tf = tok.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    tfidf = F.round(
        F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 8)
    scored = (tf.join(F.broadcast(df), "word")
              .select("doc_id", "word", tfidf.alias("tfidf")))
    from pyspark.sql import Window
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "word")
    return (scored.withColumn("rk", F.row_number().over(w).cast("long"))
            .filter((F.col("rk") <= 3) & (F.col("doc_id") % 20 == 0))
            .select("doc_id", "word", "tfidf", "rk"))


@register("text_bm25", oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
), tf AS (
  SELECT doc_id, word, COUNT(*) AS tf FROM tok GROUP BY doc_id, word
), dl AS (
  SELECT doc_id, COUNT(*) AS dlen FROM tok GROUP BY doc_id
), stats AS (
  SELECT COUNT(*) AS n_docs,
         CAST(SUM(CAST(dlen AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)
           AS avgdl
  FROM dl
), df AS (
  SELECT word, COUNT(*) AS df FROM tf
  WHERE word IN ('spark', 'stream', 'window') GROUP BY word
),
scored AS (
  SELECT tf.doc_id,
         SUM(ln(1 + (n_docs - df.df + 0.5) / (df.df + 0.5))
             * tf.tf * 2.2
             / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dlen / stats.avgdl)))
           AS bm25
  FROM tf
  JOIN df ON df.word = tf.word
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id, ROUND(bm25, 6) AS bm25
FROM scored
ORDER BY bm25 DESC, doc_id
LIMIT 20
""", tags=("text", "ranking"))
def text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranking (k1=1.2, b=0.75) for a fixed 3-term query — the
    standard lexical retrieval scorer, fully relational: term
    frequencies join document frequencies and length normalization, no
    index structure needed for batch scoring. The probabilistic idf
    (ln(1 + (N-df+.5)/(df+.5))) and the length-normalized tf saturate
    exactly as in Robertson-Sparck Jones; scores are identical IEEE
    expressions in both engines, rounded for display. The per-query
    cost is one broadcast of the |query|-row df table against the
    (doc, term) matrix — batch-scoring 100 TB is a join, not an index
    lookup."""
    d = load_table(spark, sf_dir, "documents")
    terms = ["spark", "stream", "window"]
    tok = d.select("doc_id", F.explode(tokens("text")).alias("word"))
    tf = tok.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dlen"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum(F.col("dlen").cast(DEC)).cast("double")
         / F.count(F.lit(1))).alias("avgdl"))
    df = (tf.filter(F.col("word").isin(terms))
          .groupBy("word").agg(F.count(F.lit(1)).alias("df")))
    k1, b = 1.2, 0.75
    idf = F.log(1 + (F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5))
    score_term = (idf * F.col("tf") * (k1 + 1)
                  / (F.col("tf") + k1 * (1 - b + b * F.col("dlen")
                                         / F.col("avgdl"))))
    scored = (tf.join(F.broadcast(df), "word")
              .join(dl, "doc_id")
              .crossJoin(F.broadcast(stats))
              .groupBy("doc_id")
              .agg(F.sum(score_term).alias("bm25")))
    return (scored.select("doc_id", F.round("bm25", 6).alias("bm25"))
            .orderBy(F.col("bm25").desc(), "doc_id").limit(20))


@register("text_entropy", oracle="""
WITH tok AS (
  SELECT d.lang, unnest(string_split(d.text, ' ')) AS word
  FROM documents d
), lang_tot AS (
  SELECT lang, COUNT(*) AS total FROM tok GROUP BY lang
), freq AS (
  SELECT t.lang, t.word, COUNT(*) AS n
  FROM tok t GROUP BY t.lang, t.word
)
SELECT f.lang,
       CAST(lt.total AS BIGINT) AS n_tokens,
       COUNT(*) AS vocab,
       ROUND(CAST(SUM(CAST(f.n * ROUND(-ln(f.n * 1.0 / lt.total), 6)
                           AS DECIMAL(38,6))) AS DOUBLE) / lt.total, 6)
         AS entropy_nats
FROM freq f JOIN lang_tot lt ON lt.lang = f.lang
GROUP BY f.lang, lt.total
""", tags=("text", "quality"))
def text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language token Shannon entropy — the vocabulary-diversity
    quality signal (low entropy flags boilerplate/templated slices of a
    training corpus, high entropy flags noise). H = Σ n_w·(-ln p_w)/N
    computed as integer-count × 6-dp-rounded log summed in exact
    DECIMAL — the same determinism recipe as text_unigram_nll (libm ln
    differs by 1 ULP across engines; the integer weights and the
    rounded log keep every term on the 6-dp grid)."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("lang", F.explode(tokens("text")).alias("word"))
    lang_tot = tok.groupBy("lang").agg(F.count(F.lit(1)).alias("total"))
    freq = tok.groupBy("lang", "word").agg(F.count(F.lit(1)).alias("n"))
    term = (F.col("n")
            * F.round(-F.log(F.col("n") / F.col("total")), 6)).cast(DEC)
    return (freq.join(F.broadcast(lang_tot), "lang")
            .groupBy("lang", "total")
            .agg(F.count(F.lit(1)).alias("vocab"),
                 F.round(F.sum(term).cast("double") / F.col("total"), 6)
                  .alias("entropy_nats"))
            .select("lang", F.col("total").alias("n_tokens"), "vocab",
                    "entropy_nats"))


@register("text_repetition_filter", oracle="""
WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
bigrams AS (
  SELECT doc_id, w[i] || ' ' || w[i+1] AS g
  FROM words, unnest(range(1, len(w))) t(i)
),
per_doc AS (
  SELECT doc_id,
         CAST(SUM(cnt) AS BIGINT) AS n_grams,
         COUNT(*) AS n_distinct,
         MAX(cnt) AS top_gram_n
  FROM (SELECT doc_id, g, COUNT(*) AS cnt FROM bigrams GROUP BY doc_id, g)
  GROUP BY doc_id
)
SELECT doc_id,
       n_grams,
       ROUND(1.0 - n_distinct * 1.0 / n_grams, 6) AS dup_gram_frac,
       ROUND(top_gram_n * 1.0 / n_grams, 6) AS top_gram_frac,
       CAST(CASE WHEN 1.0 - n_distinct * 1.0 / n_grams > 0.2
                   OR top_gram_n * 1.0 / n_grams > 0.18
                 THEN 1 ELSE 0 END AS BIGINT) AS flagged
FROM per_doc
WHERE n_grams >= 10
ORDER BY dup_gram_frac DESC, doc_id
LIMIT 200
""", tags=("text", "quality", "filter"))
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality filter: per-document duplicate
    bigram fraction (1 - distinct/total) and most-frequent-bigram share
    — the signals that catch keyword-stuffed and loop-generated text
    that length/stopword heuristics (text_quality) miss. Documents
    exceeding either threshold are flagged for removal. Pure
    split/explode/two-level aggregation; per-doc state is its own
    bigram multiset, so the shuffle key is doc_id and skew is bounded
    by the longest document."""
    from ..operators.dedup import gram_rows

    d = load_table(spark, sf_dir, "documents")
    # Codegen bigram occurrences (r12, guide §4.1) — same byte-
    # identical lead-window form as dedup_substring_spans.
    bigrams = gram_rows(d, k=2).select("doc_id", F.col("gram").alias("g"))
    counts = bigrams.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("cnt"))
    per_doc = (counts.groupBy("doc_id")
               .agg(F.sum("cnt").alias("n_grams"),
                    F.count(F.lit(1)).alias("n_distinct"),
                    F.max("cnt").alias("top_gram_n")))
    dup_frac = F.round(1.0 - F.col("n_distinct") / F.col("n_grams"), 6)
    top_frac = F.round(F.col("top_gram_n") / F.col("n_grams"), 6)
    return (per_doc.filter(F.col("n_grams") >= 10)
            .select("doc_id", "n_grams",
                    dup_frac.alias("dup_gram_frac"),
                    top_frac.alias("top_gram_frac"),
                    F.when((dup_frac > 0.2) | (top_frac > 0.18), 1)
                     .otherwise(0).cast("long").alias("flagged"))
            .orderBy(F.col("dup_gram_frac").desc(), "doc_id")
            .limit(200))


@register("text_pii_redact", oracle="""
WITH injected AS (
  -- the fixture corpus carries no PII, so a deterministic synthetic
  -- contact line is appended to every 3rd document; the op under test
  -- is the detection + redaction, which both engines then apply to
  -- identical inputs
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0
              THEN text || ' contact user' || doc_id
                   || '@example.com or +1-555-'
                   || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || '.'
              ELSE text END AS text
  FROM documents
), redacted AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '[a-z0-9.]+@[a-z0-9.]+[a-z]')) AS n_emails,
         len(regexp_extract_all(text, '\\+1-[0-9]{3}-[0-9]{4}')) AS n_phones,
         regexp_replace(regexp_replace(text, '[a-z0-9.]+@[a-z0-9.]+[a-z]',
                                       '<EMAIL>', 'g'),
                        '\\+1-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS clean
  FROM injected
)
SELECT CAST(SUM(n_emails) AS BIGINT) AS total_emails,
       CAST(SUM(n_phones) AS BIGINT) AS total_phones,
       CAST(SUM(CASE WHEN n_emails + n_phones > 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS docs_with_pii,
       CAST(SUM(CASE WHEN clean LIKE '%<EMAIL>%' THEN 1 ELSE 0 END)
            AS BIGINT) AS docs_email_redacted,
       CAST(SUM(len(clean) - len(text)) AS BIGINT) AS length_delta
FROM redacted JOIN injected USING (doc_id)
""", tags=("text", "pii", "filter"))
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction — the scrub pass every training corpus
    gets: regex-extract emails/phone numbers, replace with typed
    placeholder tokens, report counts and the redaction length delta.
    The fixture has no real PII, so a deterministic synthetic contact
    line is appended to every 3rd document FIRST (identically in both
    engines) — the operator under test is the redaction itself.
    Patterns stay in the regex subset where Java and RE2 semantics
    coincide (character classes, bounded repeats — no backrefs or
    lookaround, which also keeps them linear-time at 100 TB)."""
    d = load_table(spark, sf_dir, "documents")
    phone_tail = F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0")
    injected = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.col("text"), F.lit(" contact user"),
                        F.col("doc_id").cast("string"),
                        F.lit("@example.com or +1-555-"), phone_tail,
                        F.lit(".")))
         .otherwise(F.col("text")).alias("text"))
    email_re = "[a-z0-9.]+@[a-z0-9.]+[a-z]"
    phone_re = r"\+1-[0-9]{3}-[0-9]{4}"
    red = injected.select(
        "doc_id", "text",
        F.size(F.regexp_extract_all("text", F.lit(email_re), F.lit(0)))
         .alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(phone_re), F.lit(0)))
         .alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace("text", email_re, "<EMAIL>"),
            phone_re, "<PHONE>").alias("clean"))
    return red.agg(
        F.sum("n_emails").cast("long").alias("total_emails"),
        F.sum("n_phones").cast("long").alias("total_phones"),
        F.sum(F.when(F.col("n_emails") + F.col("n_phones") > 0, 1)
              .otherwise(0)).cast("long").alias("docs_with_pii"),
        F.sum(F.when(F.col("clean").contains("<EMAIL>"), 1).otherwise(0))
         .cast("long").alias("docs_email_redacted"),
        F.sum(F.length("clean") - F.length("text")).cast("long")
         .alias("length_delta"))


@register("corpus_quality_filter", oracle=f"""
WITH q AS (
  SELECT doc_id, lang,
         0.4 * least(len(string_split(text, ' ')) / 50.0, 1.0)
         + 0.3 * (1.0 - len(list_filter(string_split(text, ' '),
                                        w -> list_contains({_STOP_DUCK}, w)))
                        * 1.0 / len(string_split(text, ' ')))
         + 0.3 * least((length(text) * 1.0
                        / len(string_split(text, ' '))) / 8.0, 1.0)
           AS quality
  FROM documents
), thr AS (
  SELECT quantile_cont(quality, 0.75) AS t FROM q
)
SELECT doc_id, lang, ROUND(quality, 6) AS quality
FROM q, thr
WHERE ROUND(quality, 6) >= ROUND(t, 6)
""", tags=("text", "quality", "mlprep"))
def corpus_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile-threshold corpus selection — 'keep the top quality
    quartile', the standard filter stage between scoring and training:
    score every document (text_quality's formula), reduce the corpus to
    ONE threshold scalar (exact p75), broadcast it back, filter.

    Determinism: both engines interpolate the same percentile
    definition over identical doubles, and the boundary comparison is
    made on 6-decimal-ROUNDED quality and threshold on BOTH sides —
    the interpolated p75 can differ between Spark and DuckDB in the
    last ulp, which would otherwise flip boundary-row membership.
    Scale posture: pass 1 is a
    map-side-combined percentile reduce to one row; pass 2 is a
    broadcast-join filter the scan absorbs — no sort, no shuffle of
    documents. At 100 TB swap the exact percentile for
    approx_percentile(1e-4) and re-validate the cut size; the plan
    shape is unchanged."""
    d = load_table(spark, sf_dir, "documents")
    w = tokens("text")
    n_tokens = F.size(w)
    n_stop = F.size(F.filter(w, lambda x: x.isin(STOPWORDS)))
    n_ch = F.length("text")
    quality = (F.lit(0.4) * F.least(n_tokens / F.lit(50.0), F.lit(1.0))
               + F.lit(0.3) * (F.lit(1.0) - n_stop * F.lit(1.0) / n_tokens)
               + F.lit(0.3) * F.least((n_ch * F.lit(1.0) / n_tokens) / F.lit(8.0),
                                      F.lit(1.0)))
    scored = d.select("doc_id", "lang", quality.alias("quality"))
    thr = scored.agg(F.percentile("quality", 0.75).alias("t"))
    return (scored.join(F.broadcast(thr))
            .filter(F.round("quality", 6) >= F.round("t", 6))
            .select("doc_id", "lang", F.round("quality", 6).alias("quality")))


@register("text_langid_eval", oracle=f"""
WITH cells AS (
  SELECT lang, {_LANG_CASE_DUCK} AS predicted, CAST(COUNT(*) AS BIGINT) AS n
  FROM documents GROUP BY 1, 2
), per_class AS (
  SELECT l.lang,
         CAST(COALESCE(SUM(c.n) FILTER (WHERE c.predicted = l.lang), 0)
              AS BIGINT) AS tp,
         CAST(SUM(c.n) AS BIGINT) AS support
  FROM (SELECT DISTINCT lang FROM documents) l
  JOIN cells c ON c.lang = l.lang
  GROUP BY l.lang
), pred_n AS (
  SELECT predicted AS lang, CAST(SUM(n) AS BIGINT) AS predicted_n
  FROM cells GROUP BY predicted
)
SELECT p.lang, p.support, p.tp,
       CAST(COALESCE(q.predicted_n, 0) AS BIGINT) AS predicted_n,
       ROUND(CASE WHEN COALESCE(q.predicted_n, 0) = 0 THEN 0.0
                  ELSE CAST(p.tp AS DOUBLE) / q.predicted_n END, 6)
         AS precision,
       ROUND(CAST(p.tp AS DOUBLE) / p.support, 6) AS recall
FROM per_class p LEFT JOIN pred_n q ON p.lang = q.lang
""", tags=("text", "langid", "eval"))
def text_langid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class precision/recall for the heuristic language
    identifier against the labeled lang column — the metric layer over
    text_lang_id's raw confusion cells, and the evaluation loop any
    classifier upgrade (n-gram profile, fastText pandas_udf) would be
    judged by before swapping in. The deliberately weak fixture
    heuristic scores low, which is the point: the harness measures, it
    does not flatter.

    Counts aggregate map-side to |langs x predictions| cells; metrics
    are exact integer ratios with a zero-prediction guard evaluated
    identically on both engines."""
    d = load_table(spark, sf_dir, "documents")
    w = tokens("text")
    predicted = (F.when(F.array_contains(w, "the"), "en")
                 .when(F.array_contains(w, "der"), "de")
                 .when(F.array_contains(w, "le"), "fr")
                 .when(F.array_contains(w, "el"), "es")
                 .when(F.array_contains(w, "de"), "es")
                 .otherwise("und"))
    cells = (d.select("lang", predicted.alias("predicted"))
             .groupBy("lang", "predicted")
             .agg(F.count(F.lit(1)).alias("n")))
    per_class = (cells.groupBy("lang")
                 .agg(F.coalesce(F.sum(F.when(F.col("predicted")
                                              == F.col("lang"),
                                              F.col("n"))), F.lit(0))
                      .alias("tp"),
                      F.sum("n").alias("support")))
    pred_n = (cells.groupBy(F.col("predicted").alias("lang"))
              .agg(F.sum("n").alias("predicted_n")))
    joined = (per_class.join(F.broadcast(pred_n), "lang", "left")
              .select("lang", "support", "tp",
                      F.coalesce(F.col("predicted_n"), F.lit(0))
                       .alias("predicted_n")))
    prec = F.when(F.col("predicted_n") == 0, 0.0).otherwise(
        F.col("tp").cast("double") / F.col("predicted_n"))
    return joined.select(
        "lang", "support", "tp", "predicted_n",
        F.round(prec, 6).alias("precision"),
        F.round(F.col("tp").cast("double") / F.col("support"), 6)
         .alias("recall"))


def _merge_fold_expr(l: str, r: str, merged: str) -> str:
    """Spark SQL expression applying ONE BPE merge rule to the
    space-joined symbol string ``seq`` — a left-fold over the token
    array with a string accumulator, the textbook greedy
    non-overlapping scan: merge when the previously-emitted token is
    exactly ``l`` and the incoming token is ``r``. Mirrors the
    oracle's DuckDB ``list_reduce`` lambda token-for-token. (The
    obvious padded-replace trick is WRONG for runs: consecutive
    merges share a boundary space, so ``a a a a`` merged only once —
    a hypothesis counterexample.) A merged token can never equal
    ``l`` (strictly longer), so the accumulator-tail check cannot
    mis-fire on a token merged earlier in the same pass."""
    def q(v: str) -> str:
        # Spark's default parser treats backslash as an escape inside
        # string literals (unlike DuckDB), so a learned symbol
        # containing `\` must be doubled or the fold expression is
        # corrupted; quotes double per ANSI.
        return v.replace("\\", "\\\\").replace("'", "''")
    return (
        f"aggregate(split(seq, ' '), '', (acc, x) -> CASE"
        f" WHEN acc = '' THEN x"
        f" WHEN x = '{q(r)}' AND (acc = '{q(l)}'"
        f"      OR endswith(acc, ' {q(l)}'))"
        f" THEN substring(acc, 1, length(acc) - {len(l)}) || '{q(merged)}'"
        f" ELSE acc || ' ' || x END)")


def _bpe_oracle_sql(merges: int = 10) -> str:
    """Unrolled fixed-merge BPE-training oracle (the pagerank/kcore
    unrolling pattern): each merge round is one (pair-counts, best-pair,
    re-segmented-vocab) CTE triple mirroring the operator's round.
    Pure string/integer arithmetic — zero floats, so the engines must
    agree exactly. The merge itself is a left-fold over the token
    array with a string accumulator (DuckDB ``list_reduce`` here,
    Spark ``aggregate`` in the operator): merge x into the accumulator
    when the previous emitted token is exactly ``sym_l`` and x is
    ``sym_r`` — the textbook greedy non-overlapping scan. (A padded
    ``replace(' l r ', ' m ')`` is NOT that scan: consecutive merges
    share a boundary space, so ``a a a a`` merged only once —
    hypothesis found the counterexample. A merged token can never
    equal ``sym_l`` (it is strictly longer), so the tail check is
    sound.)"""
    its = []
    for i in range(1, merges + 1):
        p = i - 1
        its.append(f"""
p{i} AS MATERIALIZED (
  SELECT s[j] AS sym_l, s[j+1] AS sym_r,
         CAST(SUM(freq) AS BIGINT) AS pair_count
  FROM (SELECT freq, string_split(seq, ' ') AS s FROM v{p}) t,
       unnest(range(1, len(s))) u(j)
  GROUP BY 1, 2
),
b{i} AS MATERIALIZED (
  SELECT sym_l, sym_r, sym_l || sym_r AS merged, pair_count
  FROM p{i}
  ORDER BY pair_count DESC, sym_l, sym_r LIMIT 1
),
v{i} AS MATERIALIZED (
  SELECT word, freq,
         list_reduce(string_split(seq, ' '),
           (acc, x) -> CASE
              WHEN x = b.sym_r
                   AND (acc = b.sym_l
                        OR ends_with(acc, ' ' || b.sym_l))
                THEN substring(acc, 1,
                               length(acc) - length(b.sym_l))
                     || b.merged
              ELSE acc || ' ' || x END) AS seq
  FROM v{p}, b{i} b
)""")
    finals = "\nUNION ALL\n".join(
        f"SELECT {i} AS step, sym_l, sym_r, merged, pair_count FROM b{i}"
        for i in range(1, merges + 1))
    return f"""
WITH w AS MATERIALIZED (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE word <> '' GROUP BY word
),
v0 AS MATERIALIZED (
  SELECT word, freq,
         trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS seq
  FROM w
),{",".join(its)}
SELECT * FROM ({finals}) ORDER BY step
"""


@register("text_bpe_train", oracle=_bpe_oracle_sql(),
          tags=("text", "tokenizer", "bpe"))
def text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-pair-encoding tokenizer training IN the engine — the first
    10 merge rules learned from the corpus, each round: count adjacent
    symbol pairs weighted by word frequency, take the most frequent
    pair ((count DESC, left, right) tie-break — the published BPE
    algorithm, Sennrich et al. 2016), merge it everywhere, repeat.
    This is how every modern LLM tokenizer's merge table starts; doing
    it relationally means the 100 TB corpus is scanned ONCE (the word-
    frequency aggregation) and all ten rounds run over the
    vocabulary-bounded (word, freq, seq) frame — the standard trick
    (word-level pre-count) that makes corpus size irrelevant to the
    merge loop.

    Per round one hash agg over exploded adjacent pairs + a 1-row
    driver collect of the winning pair (bounded by construction) that
    re-enters the plan as fold literals. The greedy merge is a
    left-fold over the token array (``_merge_fold_expr`` — Spark
    ``aggregate``, mirrored by the oracle's DuckDB ``list_reduce``):
    the textbook non-overlapping scan, property-tested against a pure
    python reference. Zero floats anywhere. Output:
    (step, sym_l, sym_r, merged, pair_count)."""
    return _bpe_train(spark, sf_dir, merges=10)


def _bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (word, freq, seq) vocabulary frame every BPE face starts
    from — ONE corpus scan, lazily checkpointed (eager=False: the first
    consumer's action materializes + persists it, so callers that both
    train rules and re-tokenize share a single scan with no extra job
    barrier — guide §1.2, don't pass over the corpus twice for the
    same frame)."""
    d = load_table(spark, sf_dir, "documents")
    return (d.select(F.explode(tokens("text")).alias("word"))
            .filter(F.col("word") != "")
            .groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
            .select("word", "freq",
                    F.trim(F.regexp_replace("word", "(.)", "$1 "))
                    .alias("seq"))
            .localCheckpoint(eager=False))


def _bpe_train(spark: SparkSession, sf_dir: str, merges: int,
               vocab: DataFrame | None = None) -> DataFrame:
    """Shared BPE merge loop (see text_bpe_train): one corpus scan to
    the (word, freq, seq) vocabulary, then ``merges`` greedy rounds
    over that bounded frame, each checkpointed lazily (eager=False —
    the round's own 1-row collect materializes it, so a round costs ONE
    driver action instead of two; the final round's never-consumed
    re-segmentation is never computed at all). Callers that also need
    the vocabulary (encode/tokenize) pass it in via ``vocab`` so the
    corpus is scanned once per query, not once per face."""
    vocab = vocab if vocab is not None else _bpe_vocab(spark, sf_dir)
    pair_expr = F.expr("""
        IF(size(s) >= 2,
           transform(sequence(1, size(s) - 1),
                     j -> struct(element_at(s, j) AS sym_l,
                                 element_at(s, j + 1) AS sym_r)),
           array())
    """)
    out_rows = []
    cur = vocab
    for step in range(1, merges + 1):
        pairs = (cur.select("freq", F.split("seq", " ").alias("s"))
                 .select("freq", F.explode(pair_expr).alias("p"))
                 .groupBy(F.col("p.sym_l").alias("sym_l"),
                          F.col("p.sym_r").alias("sym_r"))
                 .agg(F.sum("freq").alias("pair_count")))
        best = (pairs.orderBy(F.col("pair_count").desc(), "sym_l", "sym_r")
                .limit(1).collect())   # bounded 1-row driver collect
        if not best:
            break
        b = best[0]
        merged = b.sym_l + b.sym_r
        out_rows.append((step, b.sym_l, b.sym_r, merged,
                         int(b.pair_count)))
        cur = (cur.select(
            "word", "freq",
            F.expr(_merge_fold_expr(b.sym_l, b.sym_r, merged))
            .alias("seq"))
            .localCheckpoint(eager=False))
    return spark.createDataFrame(
        out_rows,
        "step int, sym_l string, sym_r string, merged string, "
        "pair_count long")


@register("text_bpe_train_deep", oracle=None,
          tags=("text", "tokenizer", "bpe", "iterative"))
def text_bpe_train_deep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """text_bpe_train pushed to 60 merge rules (round-9 verdict item
    6) — a realistic slice of a production merge table, exercising the
    loop's stats/lineage posture at 6× the oracle query's depth (each
    round re-checkpoints the vocabulary frame, so the per-merge cost
    must stay flat — the SCALING.md row measures exactly that, and the
    convergence-length-loop discipline operators/ckpt.py exists for).

    Rows-only BY DESIGN: the 10-rule oracle already proves the merge
    arithmetic cross-engine (each extra rule would multiply the
    unrolled CTE's size for no additional semantic coverage);
    determinism of the deeper run is pinned by the rerun test and by
    the 10-rule PREFIX PROPERTY asserted in tests — greedy BPE's rule
    sequence is prefix-stable in the merge count, so rows 1..10 of
    this output must equal text_bpe_train's output exactly."""
    return _bpe_train(spark, sf_dir, merges=60)


def _bpe_encode_oracle_sql(merges: int = 10) -> str:
    """Tokenization-effect oracle: reuse the BPE training chain's CTEs
    (same generator, same 10 rounds), then measure the corpus-level
    effect of the learned merges — per-word symbol counts before
    (characters) and after, frequency-weighted. Zero floats except the
    final rounded ratio."""
    body = _bpe_oracle_sql(merges)
    # strip the generator's final SELECT (everything after the last CTE
    # block) and substitute the encode aggregation over v{merges}.
    cut = body.rindex("SELECT * FROM")
    return body[:cut] + f"""
SELECT CAST(COUNT(*) AS BIGINT) AS vocab_size,
       CAST(SUM(freq) AS BIGINT) AS total_words,
       CAST(SUM(freq * length(word)) AS BIGINT) AS chars_total,
       CAST(SUM(freq * len(string_split(seq, ' '))) AS BIGINT)
         AS tokens_total,
       ROUND(SUM(freq * length(word)) * 1.0
             / SUM(freq * len(string_split(seq, ' '))), 6)
         AS compression
FROM v{merges}
"""


@register("text_bpe_encode", oracle=_bpe_encode_oracle_sql(),
          tags=("text", "tokenizer", "bpe"))
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus tokenization with the learned BPE merges — the effect
    side of text_bpe_train: after applying the 10 merge rules, how many
    tokens does the corpus cost vs its character count? This
    chars-per-token compression number is the metric every tokenizer
    change is judged by before a pretraining run commits to it.

    Same one-scan structure: the corpus collapses to the (word, freq,
    seq) vocabulary once, the merge rules replay as replace() literals
    over that bounded frame, and the answer is one frequency-weighted
    aggregation. Output: (vocab_size, total_words, chars_total,
    tokens_total, compression)."""
    vocab = _bpe_vocab(spark, sf_dir)
    # Rules re-derive from the SAME vocabulary frame (persisted by its
    # first action), so the corpus is scanned once per query run, not
    # once for training and again for the encode replay (guide §1.2).
    rules = _bpe_train(spark, sf_dir, merges=10,
                       vocab=vocab).collect()  # bounded: 10 rows
    cur = vocab
    for r in rules:
        cur = cur.select(
            "word", "freq",
            F.expr(_merge_fold_expr(r.sym_l, r.sym_r, r.merged))
            .alias("seq"))
    return cur.agg(
        F.count(F.lit(1)).alias("vocab_size"),
        F.sum("freq").alias("total_words"),
        F.sum(F.col("freq") * F.length("word")).alias("chars_total"),
        F.sum(F.col("freq") * F.size(F.split("seq", " ")))
        .alias("tokens_total"),
        F.round(F.sum(F.col("freq") * F.length("word")).cast("double")
                / F.sum(F.col("freq") * F.size(F.split("seq", " "))), 6)
        .alias("compression"))


def _bpe_tokenize_oracle_sql(merges: int = 10) -> str:
    """Per-document tokenization oracle: reuse the BPE training chain
    (same generator, same 10 rounds) through v{merges} = (word, freq,
    seq), then replay tokenization over every document position —
    word positions from the same space-split the trainer used, symbol
    positions from the learned seq, a dense symbol->token_id vocabulary
    (row_number over symbol ASC), and a per-doc global token position.
    Zero floats; every ordering is explicit, so the engines must agree
    row for row."""
    body = _bpe_oracle_sql(merges)
    cut = body.rindex("SELECT * FROM")
    return body[:cut] + f""",
wp AS MATERIALIZED (
  SELECT doc_id, j AS word_pos, ws[j + 1] AS word
  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) t,
       unnest(range(0, len(ws))) u(j)
  WHERE ws[j + 1] <> ''
),
sym AS MATERIALIZED (
  SELECT q.doc_id, q.word_pos, k AS sym_pos, ss[k + 1] AS symbol
  FROM (SELECT wp.doc_id, wp.word_pos, string_split(v.seq, ' ') AS ss
        FROM wp JOIN v{merges} v ON v.word = wp.word) q,
       unnest(range(0, len(ss))) u(k)
),
ids AS MATERIALIZED (
  SELECT symbol,
         CAST(row_number() OVER (ORDER BY symbol) - 1 AS INT) AS token_id
  FROM (SELECT DISTINCT symbol FROM sym)
)
SELECT s.doc_id,
       CAST(row_number() OVER (PARTITION BY s.doc_id
                               ORDER BY s.word_pos, s.sym_pos) - 1
            AS BIGINT) AS pos,
       i.token_id, s.symbol
FROM sym s JOIN ids i ON i.symbol = s.symbol
ORDER BY doc_id, pos
"""


@register("text_bpe_tokenize", oracle=_bpe_tokenize_oracle_sql(),
          tags=("text", "tokenizer", "bpe"))
def text_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document BPE tokenization — the operator a pretraining data
    pipeline actually feeds to sharding/packing (round-8 verdict item
    6): text_bpe_encode reports corpus-level compression; this emits
    (doc_id, pos, token_id, symbol), one row per token in reading
    order, with a dense deterministic vocabulary id (symbol ASC).

    Scale shape: the corpus is scanned once to the (word, freq, seq)
    vocabulary (the merge rules replay over that bounded frame, same
    as text_bpe_encode), then tokenization is a WORD-VOCABULARY JOIN —
    each document position joins its word's pre-tokenized seq, so the
    per-document work is linear in document length and never re-runs
    the merge fold per occurrence. The only per-doc operation is the
    global-position window (partitioned by doc_id — bounded by doc
    length, no global sort). Output is LINEAR in corpus size, the one
    BPE-family query that should scale ~1.0 in SCALING.md (train and
    encode are vocabulary-bounded and measured flat)."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    vocab = _bpe_vocab(spark, sf_dir)
    # Same shared-frame discipline as text_bpe_encode: the trainer
    # consumes the identical checkpointed vocabulary, so one corpus
    # scan feeds both rule learning and tokenization.
    rules = _bpe_train(spark, sf_dir, merges=10,
                       vocab=vocab).collect()  # bounded: 10 rows
    seqs = vocab.select("word", "seq")
    for r in rules:
        seqs = seqs.select(
            "word",
            F.expr(_merge_fold_expr(r.sym_l, r.sym_r, r.merged))
            .alias("seq"))
    # The 10 chained merge folds run INTERPRETED per row — checkpoint
    # the re-segmented vocabulary so they evaluate once over the
    # vocab-bounded frame, not once per consumer of the corpus-sized
    # join below (guide §4.1).
    seqs = seqs.localCheckpoint(eager=False)
    # The dense id table derives from the VOCABULARY's symbols, not the
    # corpus-sized exploded stream: every vocab word occurs in >= 1
    # document by construction (the vocab IS the corpus word set), so
    # DISTINCT symbols over the re-segmented seqs equals DISTINCT
    # symbols over the per-document explosion — same ids, but computed
    # without re-evaluating the corpus join a second time (guide §1.2).
    ids = (seqs.select(F.explode(F.split("seq", " ")).alias("symbol"))
           .distinct()
           .select("symbol",
                   (F.row_number().over(Window.orderBy("symbol")) - 1)
                   .cast("int").alias("token_id")))
    words = (d.select("doc_id",
                      F.posexplode(tokens("text"))
                      .alias("word_pos", "word"))
             .filter(F.col("word") != ""))
    syms = (words.join(seqs, "word")
            .select("doc_id", "word_pos",
                    F.posexplode(F.split("seq", " "))
                    .alias("sym_pos", "symbol")))
    w = Window.partitionBy("doc_id").orderBy("word_pos", "sym_pos")
    return (syms.join(F.broadcast(ids), "symbol")
            .select("doc_id",
                    (F.row_number().over(w) - 1).cast("long").alias("pos"),
                    "token_id", "symbol")
            .orderBy("doc_id", "pos"))


_RRF_CTES = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
), tf AS (
  SELECT doc_id, word, COUNT(*) AS tf FROM tok GROUP BY doc_id, word
), dl AS (
  SELECT doc_id, COUNT(*) AS dlen FROM tok GROUP BY doc_id
), stats AS (
  SELECT COUNT(*) AS n_docs,
         CAST(SUM(CAST(dlen AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)
           AS avgdl
  FROM dl
), df AS (
  SELECT word, COUNT(*) AS df FROM tf
  WHERE word IN ('spark', 'stream', 'window') GROUP BY word
), lex AS (
  SELECT tf.doc_id,
         ROUND(SUM(ln(1 + (n_docs - df.df + 0.5) / (df.df + 0.5))
             * tf.tf * 2.2
             / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dlen / stats.avgdl))), 6)
           AS bm25
  FROM tf
  JOIN df ON df.word = tf.word
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
), lexrank AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank_lex
  FROM lex
), qv AS (
  SELECT CAST(embedding AS DOUBLE[]) AS q FROM embeddings WHERE vec_id = 0
), sem AS (
  SELECT e.vec_id AS doc_id,
         ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                      qv.q), 6) AS cs
  FROM embeddings e, qv
), semrank AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY cs DESC, doc_id) AS rank_sem
  FROM sem
)"""

_RRF_ORACLE = _RRF_CTES + """
SELECT s.doc_id,
       CAST(l.rank_lex AS BIGINT) AS rank_lex,
       CAST(s.rank_sem AS BIGINT) AS rank_sem,
       ROUND(COALESCE(1.0 / (60 + l.rank_lex), 0.0)
             + 1.0 / (60 + s.rank_sem), 9) AS rrf
FROM semrank s LEFT JOIN lexrank l ON l.doc_id = s.doc_id
ORDER BY rrf DESC, s.doc_id
LIMIT 20
"""

_NDCG_ORACLE = _RRF_CTES.replace("WITH tok AS (", """WITH tok AS (""") + """,
rrfrank AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY rrf DESC, doc_id) AS rank_rrf
  FROM (SELECT s.doc_id,
               ROUND(COALESCE(1.0 / (60 + l.rank_lex), 0.0)
                     + 1.0 / (60 + s.rank_sem), 9) AS rrf
        FROM semrank s LEFT JOIN lexrank l ON l.doc_id = s.doc_id)),
grades AS (
  SELECT doc_id,
         CASE WHEN cs >= 0.5 THEN 3 WHEN cs >= 0.3 THEN 2
              WHEN cs >= 0.15 THEN 1 ELSE 0 END AS rel
  FROM sem),
pos AS (
  SELECT 'lex' AS ranking, r.rank_lex AS pos, g.rel
  FROM lexrank r JOIN grades g USING (doc_id) WHERE r.rank_lex <= 10
  UNION ALL
  SELECT 'sem', r.rank_sem, g.rel
  FROM semrank r JOIN grades g USING (doc_id) WHERE r.rank_sem <= 10
  UNION ALL
  SELECT 'rrf', r.rank_rrf, g.rel
  FROM rrfrank r JOIN grades g USING (doc_id) WHERE r.rank_rrf <= 10),
dcg AS (
  SELECT ranking,
         CAST(SUM(CAST(ROUND((POWER(2, rel) - 1) / log2(pos + 1), 9)
                       AS DECIMAL(28,9))) AS DOUBLE) AS dcg
  FROM pos GROUP BY ranking),
ideal AS (
  SELECT rel, row_number() OVER (ORDER BY rel DESC, doc_id) AS pos
  FROM grades QUALIFY pos <= 10),
idcg AS (
  SELECT CAST(SUM(CAST(ROUND((POWER(2, rel) - 1) / log2(pos + 1), 9)
                       AS DECIMAL(28,9))) AS DOUBLE) AS idcg
  FROM ideal)
SELECT d.ranking, ROUND(d.dcg, 6) AS dcg, ROUND(i.idcg, 6) AS idcg,
       ROUND(d.dcg / i.idcg, 6) AS ndcg
FROM dcg d CROSS JOIN idcg i
ORDER BY ranking
"""


@register("retrieval_rrf", oracle=_RRF_ORACLE, tags=("text", "ranking",
                                                     "vector", "hybrid"))
def retrieval_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval by reciprocal-rank fusion (Cormack et al.
    2009, k=60) — the standard way production search combines a
    lexical scorer with a semantic one without score calibration:
    rank the corpus under BM25 (the text_bm25 scorer, same fixed
    3-term query) and under embedding cosine to a fixed query vector
    (vec_id 0 — documents and embeddings share the id space), then
    fuse as sum of 1/(60 + rank) per list, missing-from-list
    contributing 0. Ranks are integers and the fused score is the
    same IEEE expression over them in both engines, so the whole
    pipeline is oracle-exact; per-leg scores are 6-dp-rounded BEFORE
    ranking (the text_keywords tie-parity discipline), ties break on
    doc_id.

    Scale: both legs are join+aggregate pipelines (no index); the
    rank windows order query-RELEVANT lists, not the corpus — the
    lexical list is term-posting-bounded, and a production semantic
    leg is the ANN top-k, so the global windows here rank bounded
    inputs. Fusion is one outer join on doc_id."""
    lexrank, semrank, _sem = _retrieval_leg_ranks(spark, sf_dir)
    fused = (semrank.join(lexrank, "doc_id", "left")
             .select("doc_id", "rank_lex", "rank_sem",
                     F.round(F.coalesce(F.lit(1.0)
                                        / (60 + F.col("rank_lex")),
                                        F.lit(0.0))
                             + F.lit(1.0) / (60 + F.col("rank_sem")), 9)
                     .alias("rrf")))
    return fused.orderBy(F.col("rrf").desc(), "doc_id").limit(20)


def _retrieval_leg_ranks(spark: SparkSession, sf_dir: str):
    """The two retrieval legs shared by retrieval_rrf and
    retrieval_ndcg: (lexrank, semrank, sem) — BM25 ranking over the
    fixed 3-term query, cosine ranking to the fixed query vector, and
    the raw 6-dp cosine frame (the relevance source for nDCG)."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    terms = ["spark", "stream", "window"]
    tok = d.select("doc_id", F.explode(tokens("text")).alias("word"))
    tf = tok.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dlen"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum(F.col("dlen").cast(DEC)).cast("double")
         / F.count(F.lit(1))).alias("avgdl"))
    dfq = (tf.filter(F.col("word").isin(terms))
           .groupBy("word").agg(F.count(F.lit(1)).alias("df")))
    k1, b = 1.2, 0.75
    idf = F.log(1 + (F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5))
    score_term = (idf * F.col("tf") * (k1 + 1)
                  / (F.col("tf") + k1 * (1 - b + b * F.col("dlen")
                                         / F.col("avgdl"))))
    lex = (tf.join(F.broadcast(dfq), "word")
           .join(dl, "doc_id")
           .crossJoin(F.broadcast(stats))
           .groupBy("doc_id")
           .agg(F.round(F.sum(score_term), 6).alias("bm25")))
    # Round 11: ranks via the range-partitioned two-phase prefix
    # count (operators/prefix.py) — no corpus-sized single-task sort;
    # descending score order via the exact numeric negation.
    from ..operators.prefix import ordered_prefix_sums
    lexrank = (ordered_prefix_sums(
        lex.withColumn("_neg", -F.col("bm25")), ["_neg", "doc_id"],
        {"rank_lex": F.lit(1)})
        .select("doc_id", F.col("rank_lex").cast("long").alias("rank_lex")))

    e = load_table(spark, sf_dir, "embeddings")
    qv = (e.filter(F.col("vec_id") == 0)
          .select(F.col("embedding").alias("_q")))
    cos = F.expr("""
        aggregate(zip_with(embedding, _q,
                           (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
                  0D, (acc, v) -> acc + v)
        / (sqrt(aggregate(embedding, 0D,
                 (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
           * sqrt(aggregate(_q, 0D,
                 (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
    """)
    sem = (e.crossJoin(F.broadcast(qv))
           .select(F.col("vec_id").alias("doc_id"),
                   F.round(cos, 6).alias("cs")))
    semrank = (ordered_prefix_sums(
        sem.withColumn("_neg", -F.col("cs")), ["_neg", "doc_id"],
        {"rank_sem": F.lit(1)})
        .select("doc_id", F.col("rank_sem").cast("long").alias("rank_sem")))
    return lexrank, semrank, sem


@register("retrieval_ndcg", oracle=_NDCG_ORACLE,
          tags=("text", "ranking", "vector", "quality"))
def retrieval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@10 of all three retrieval rankings (BM25 leg, semantic
    leg, RRF fusion) under graded relevance — the evaluation number a
    search/retrieval deployment reports before a ranking change ships,
    completing the retrieval story retrieval_rrf started. Relevance
    grades derive from the exact query-cosine (3/2/1/0 at >= 0.5 /
    0.3 / 0.15 buckets), so the semantic leg scores ~1 by construction
    and the interesting numbers are the LEXICAL leg's agreement with
    the semantic signal and how much fusion recovers — on real data
    the grades would come from human judgments through the same
    pipeline shape.

    Oracle-exact floats: each DCG term (2^rel − 1)/log2(pos + 1)
    snaps to the 9-dp grid (ulp-level log2 noise sits far below) and
    sums exactly as DECIMAL(28,9); nDCG = dcg/idcg rounded at 6 dp.
    Ideal ordering ties break on doc_id. Output: (ranking, dcg, idcg,
    ndcg), one row per ranking."""
    from pyspark.sql import Window

    lexrank, semrank, sem = _retrieval_leg_ranks(spark, sf_dir)
    rrf = (semrank.join(lexrank, "doc_id", "left")
           .select("doc_id",
                   F.round(F.coalesce(F.lit(1.0) / (60 + F.col("rank_lex")),
                                      F.lit(0.0))
                           + F.lit(1.0) / (60 + F.col("rank_sem")), 9)
                   .alias("rrf")))
    from ..operators.prefix import ordered_prefix_sums
    rrfrank = (ordered_prefix_sums(
        rrf.withColumn("_neg", -F.col("rrf")), ["_neg", "doc_id"],
        {"rank_rrf": F.lit(1)})
        .select("doc_id", F.col("rank_rrf").cast("long").alias("rank_rrf")))
    grades = sem.select(
        "doc_id",
        F.when(F.col("cs") >= 0.5, 3).when(F.col("cs") >= 0.3, 2)
        .when(F.col("cs") >= 0.15, 1).otherwise(0).alias("rel"))

    def dcg_term(pos_col):
        return F.round((F.pow(F.lit(2), F.col("rel")) - F.lit(1.0))
                       / F.log2(pos_col + F.lit(1)), 9) \
            .cast("decimal(28,9)")

    legs = [("lex", lexrank, "rank_lex"), ("sem", semrank, "rank_sem"),
            ("rrf", rrfrank, "rank_rrf")]
    pos = None
    for name, ranks, col in legs:
        part = (ranks.filter(F.col(col) <= 10)
                .join(grades, "doc_id")
                .select(F.lit(name).alias("ranking"),
                        F.col(col).alias("pos"), "rel"))
        pos = part if pos is None else pos.unionByName(part)
    dcg = (pos.groupBy("ranking")
           .agg(F.sum(dcg_term(F.col("pos"))).cast("double").alias("dcg")))
    ideal = (ordered_prefix_sums(
        grades.withColumn("_neg", -F.col("rel")), ["_neg", "doc_id"],
        {"pos": F.lit(1)})
        .select("doc_id", "rel", F.col("pos").cast("int").alias("pos"))
        .filter(F.col("pos") <= 10))
    idcg = (ideal.agg(F.sum(dcg_term(F.col("pos"))).cast("double")
                      .alias("idcg")))
    return (dcg.crossJoin(F.broadcast(idcg))
            .select("ranking", F.round("dcg", 6).alias("dcg"),
                    F.round("idcg", 6).alias("idcg"),
                    F.round(F.col("dcg") / F.col("idcg"), 6).alias("ndcg"))
            .orderBy("ranking"))


@register("text_topk_cm_det", oracle="""
WITH words AS (SELECT unnest(string_split(text, ' ')) AS word
               FROM documents),
exact AS (SELECT word, COUNT(*) AS exact_n FROM words GROUP BY word),
top AS (SELECT word, exact_n FROM exact
        ORDER BY exact_n DESC, word LIMIT 20),
hashes AS (SELECT word, r,
                  CAST(CAST('0x' || substr(md5(word || ':'
                             || CAST(r AS VARCHAR)), 1, 8)
                            AS UBIGINT) % 256 AS BIGINT) AS bucket
           FROM words, range(0, 4) t(r)),
counters AS (SELECT r, bucket, COUNT(*) AS c FROM hashes GROUP BY 1, 2),
est AS (SELECT h.word, MIN(c.c) AS est_n
        FROM (SELECT DISTINCT word, r, bucket FROM hashes) h
        JOIN counters c ON c.r = h.r AND c.bucket = h.bucket
        WHERE h.word IN (SELECT word FROM top)
        GROUP BY h.word)
SELECT t.word, CAST(t.exact_n AS BIGINT) AS exact_n,
       CAST(e.est_n AS BIGINT) AS est_n,
       CAST(e.est_n - t.exact_n AS BIGINT) AS overcount
FROM top t JOIN est e ON e.word = t.word
ORDER BY t.word
""", tags=("text", "sketch"))
def text_topk_cm_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Count-Min heavy hitters — ORACLE-BACKED, the
    second 'sketch itself replayed' twin (with agg_hll_det): md5 row
    hashes into a 4 x 256 counter grid, every counter an EXACT
    integer COUNT, per-word point estimate = MIN over the 4 rows —
    pure integer arithmetic end to end, so DuckDB rebuilds the whole
    sketch and the estimates hash-match. The xxhash/driver-merged
    production face stays ``text_topk_sketch`` (rows-only); the CM
    overestimate guarantee (est >= exact, slack <= eN/w per row) is
    asserted on BOTH faces in tests/test_sketches.py.

    Scale shape: two map-side-combinable groupBys (counters over
    4 x 256 keys; exact top-20 via TakeOrdered) and a
    distinct-triple join bounded by |top| x 4 — the sketch state is
    1 KB of counters for any corpus size, which is the entire point
    of CM at 100 TB."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(F.explode(F.split("text", " ")).alias("word"))
    hashes = tok.select(
        "word", F.explode(F.array(*[F.lit(r) for r in range(4)])).alias("r")
    ).select(
        "word", "r",
        (F.conv(F.substring(F.md5(F.concat_ws(
            ":", "word", F.col("r").cast("string"))), 1, 8), 16, 10)
         .cast("long") % 256).alias("bucket"))
    counters = hashes.groupBy("r", "bucket").agg(
        F.count(F.lit(1)).alias("c"))
    top = (tok.groupBy("word").agg(F.count(F.lit(1)).alias("exact_n"))
           .orderBy(F.col("exact_n").desc(), "word").limit(20))
    lookup = (hashes.join(F.broadcast(top.select("word")), "word")
              .select("word", "r", "bucket").distinct())
    est = (lookup.join(counters, ["r", "bucket"])
           .groupBy("word").agg(F.min("c").alias("est_n")))
    return (top.join(est, "word")
            .select("word", F.col("exact_n").cast("long").alias("exact_n"),
                    F.col("est_n").cast("long").alias("est_n"),
                    (F.col("est_n") - F.col("exact_n")).cast("long")
                    .alias("overcount"))
            .orderBy("word"))


# --------------------------------------------------------------------------
# Trigram interpolated-backoff LM (round-12 verdict item 7): the
# KenLM-style quality-scoring rung above text_unigram_nll /
# text_bigram_lm. All probabilities are self-consistent rationals over
# ONE exploded trigram-position table (c123/c12, c23/c2, c3/N), mixed
# with fixed interpolation weights; -ln terms round to the 6-dp grid
# and sum as exact DECIMAL — the same determinism recipe as the
# unigram face, so the whole chain stays oracle-expressible.

_TRIGRAM_CTES = """
words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
tri AS (
  SELECT doc_id, w[i] AS w1, w[i+1] AS w2, w[i+2] AS w3
  FROM words, unnest(range(1, len(w) - 1)) t(i)
  WHERE len(w) >= 3
),
n AS (SELECT COUNT(*) AS n_pos FROM tri),
c123 AS (SELECT w1, w2, w3, COUNT(*) AS c FROM tri GROUP BY 1, 2, 3),
c12 AS (SELECT w1, w2, COUNT(*) AS c FROM tri GROUP BY 1, 2),
c23 AS (SELECT w2, w3, COUNT(*) AS c FROM tri GROUP BY 1, 2),
c2 AS (SELECT w2, COUNT(*) AS c FROM tri GROUP BY 1),
c3 AS (SELECT w3, COUNT(*) AS c FROM tri GROUP BY 1),
scored AS (
  SELECT t.doc_id,
         CAST(ROUND(-ln(((0.6 * c123.c / c12.c)
                         + (0.3 * c23.c / c2.c))
                        + (0.1 * c3.c / n.n_pos)), 6)
              AS DECIMAL(38,6)) AS nll_term
  FROM tri t
  JOIN c123 ON c123.w1 = t.w1 AND c123.w2 = t.w2 AND c123.w3 = t.w3
  JOIN c12 ON c12.w1 = t.w1 AND c12.w2 = t.w2
  JOIN c23 ON c23.w2 = t.w2 AND c23.w3 = t.w3
  JOIN c2 ON c2.w2 = t.w2
  JOIN c3 ON c3.w3 = t.w3
  CROSS JOIN n
),
per_doc AS (
  SELECT doc_id,
         COUNT(*) AS n_trigrams,
         CAST(SUM(nll_term) AS DOUBLE) / COUNT(*) AS nll
  FROM scored GROUP BY doc_id
)"""


def _trigram_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_trigrams, nll): interpolated trigram NLL per doc —
    the shared head of text_trigram_lm and text_perplexity_filter.
    Six aggregations over one exploded trigram table; the count
    tables broadcast (vocabulary-sized)."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    w = tokens("text")
    # Codegen trigram positions (r12, guide §4.1 — same rewrite as
    # operators.dedup.gram_rows): posexplode + 2 window leads instead
    # of the interpreted transform + 3×element_at; lead(word, j) over
    # (doc, pos) IS w[pos + j], and pos <= n - 3 reproduces
    # sequence(0, size - 3)'s range, so the (doc_id, w1, w2, w3) rows
    # are byte-identical.
    words = d.select("doc_id", F.posexplode(w).alias("pos", "word"),
                     F.size(w).alias("n"))
    win = Window.partitionBy("doc_id").orderBy("pos")
    tri = (words.select("doc_id", "pos", "n",
                        F.col("word").alias("w1"),
                        F.lead("word", 1).over(win).alias("w2"),
                        F.lead("word", 2).over(win).alias("w3"))
           .filter(F.col("pos") <= F.col("n") - 3)
           .select("doc_id", "w1", "w2", "w3"))
    tri = tri.localCheckpoint(eager=False)  # 6 consumers, 1 scan
    n_pos = tri.count()
    c123 = tri.groupBy("w1", "w2", "w3").agg(F.count(F.lit(1)).alias("_c123"))
    c12 = tri.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("_c12"))
    c23 = tri.groupBy("w2", "w3").agg(F.count(F.lit(1)).alias("_c23"))
    c2 = tri.groupBy("w2").agg(F.count(F.lit(1)).alias("_c2"))
    c3 = tri.groupBy("w3").agg(F.count(F.lit(1)).alias("_c3"))
    # fixed association ((t3 + t2) + t1): bit-identical doubles across
    # engines given identical integer counts
    p = ((F.lit(0.6) * F.col("_c123") / F.col("_c12")
          + F.lit(0.3) * F.col("_c23") / F.col("_c2"))
         + F.lit(0.1) * F.col("_c3") / F.lit(float(n_pos)))
    term = F.round(-F.log(p), 6).cast(DEC)
    return (tri.join(F.broadcast(c123), ["w1", "w2", "w3"])
            .join(F.broadcast(c12), ["w1", "w2"])
            .join(F.broadcast(c23), ["w2", "w3"])
            .join(F.broadcast(c2), ["w2"])
            .join(F.broadcast(c3), ["w3"])
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_trigrams"),
                 (F.sum(term).cast("double")
                  / F.count(F.lit(1))).alias("nll")))


@register("text_trigram_lm", oracle="WITH " + _TRIGRAM_CTES + """
SELECT d.lang,
       COUNT(*) AS n_docs,
       CAST(SUM(p.n_trigrams) AS BIGINT) AS n_trigrams,
       ROUND(CAST(SUM(CAST(p.nll AS DECIMAL(38,6))) AS DOUBLE)
             / COUNT(*), 6) AS avg_nll
FROM per_doc p JOIN documents d ON d.doc_id = p.doc_id
GROUP BY d.lang
ORDER BY d.lang
""", tags=("text", "lm"))
def text_trigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated trigram language-model scoring — the
    higher-order rung of the LM-quality chain (unigram -> bigram ->
    this): per trigram position, P = 0.6*P(w3|w1w2) + 0.3*P(w3|w2) +
    0.1*P(w3), every component an exact integer rational from the
    SAME position table, so unseen-context smoothing is built in
    (the backoff legs are never zero for an observed position).
    Per-doc average NLL, reported per language. All five count
    tables are vocabulary-sized broadcasts; the fact-side cost is
    one explode + five broadcast joins — at 100 TB the counts come
    from the same map-side-combined aggregations, sharded if the
    vocabulary outgrows a broadcast."""
    d = load_table(spark, sf_dir, "documents")
    per_doc = _trigram_per_doc(spark, sf_dir)
    return (per_doc.join(d.select("doc_id", "lang"), "doc_id")
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_trigrams").cast("long").alias("n_trigrams"),
                 F.round(F.sum(F.col("nll").cast(DEC)).cast("double")
                         / F.count(F.lit(1)), 6).alias("avg_nll"))
            .orderBy("lang"))


#: Margin over the corpus-mean NLL for the perplexity gate. The gate
#: runs in NLL space (ppl > tau <=> avg_nll > ln tau — exp() would be
#: libm-ULP-fragile across engines) and RELATIVE to the corpus mean:
#: an n-gram LM's absolute NLL shifts with corpus size (rarer matches
#: at bigger vocabularies — measured 2.98 -> 3.36 mean from sf0.001
#: to sf0.1), so an absolute cutoff drops everything or nothing
#: outside the sf it was tuned at. mean+0.1 drops 47/500, 45/500 and
#: 62/5000 docs at the three fixtures; the nearest doc sits >= 5e-5
#: off the cutoff (and both engines compute bit-identical doubles
#: anyway).
_PPL_NLL_MARGIN = 0.1


@register("text_perplexity_filter", oracle="WITH " + _TRIGRAM_CTES + f"""
, cm AS (SELECT CAST(SUM(CAST(nll AS DECIMAL(38,6))) AS DOUBLE)
                / COUNT(*) + {_PPL_NLL_MARGIN} AS cut
         FROM per_doc)
SELECT d.lang,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN p.nll > cm.cut THEN 1 ELSE 0 END)
            AS BIGINT) AS n_dropped,
       CAST(SUM(CASE WHEN p.nll <= cm.cut THEN 1 ELSE 0 END)
            AS BIGINT) AS n_kept,
       ROUND(MAX(p.nll), 6) AS max_nll
FROM per_doc p
JOIN documents d ON d.doc_id = p.doc_id
CROSS JOIN cm
GROUP BY d.lang
ORDER BY d.lang
""", tags=("text", "lm", "quality", "filter"))
def text_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-based corpus filtering — the KenLM-style quality
    gate LLM pipelines run after training a small n-gram LM: drop
    documents whose trigram NLL exceeds the corpus mean by a margin
    (see _PPL_NLL_MARGIN for why relative + NLL-space). The cutoff is
    ONE scalar (a 1-row frame crossJoined onto the per-doc scores —
    broadcast, allowlisted shape). Per-lang funnel: total -> dropped
    -> kept, with max NLL as the tail telemetry a threshold tuner
    reads."""
    d = load_table(spark, sf_dir, "documents")
    per_doc = _trigram_per_doc(spark, sf_dir).localCheckpoint(eager=False)
    cut = (per_doc.agg(
        (F.sum(F.col("nll").cast(DEC)).cast("double")
         / F.count(F.lit(1)) + F.lit(_PPL_NLL_MARGIN)).alias("_cut")))
    return (per_doc.join(d.select("doc_id", "lang"), "doc_id")
            .crossJoin(F.broadcast(cut))
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(F.when(F.col("nll") > F.col("_cut"), 1)
                       .otherwise(0)).cast("long").alias("n_dropped"),
                 F.sum(F.when(F.col("nll") <= F.col("_cut"), 1)
                       .otherwise(0)).cast("long").alias("n_kept"),
                 F.round(F.max("nll"), 6).alias("max_nll"))
            .orderBy("lang"))
