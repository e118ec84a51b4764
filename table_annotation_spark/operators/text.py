"""Text-analysis operators for large-scale training-data pipelines:
language id, quality scoring, token counting, document fingerprinting.

Every operator is a pure JVM-side column expression (no Python UDFs) and has
a DuckDB oracle (ORACLES) with IDENTICAL arithmetic so the driver's
value-hash comparison holds bit-for-bit. Tokenization everywhere: lowercase,
trim, split on whitespace runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "for", "on", "with", "a"],
    "fr": ["le", "la", "les", "de", "des", "et", "est", "pour", "dans", "un"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "für", "ein", "zu"],
    "es": ["el", "la", "los", "de", "y", "es", "para", "en", "con", "un"],
}


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _tok_expr():
    return F.split(F.lower(F.trim(F.col("text"))), r"\s+")


def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token count per document + running corpus stats by lang."""
    d = _docs(spark, sf_dir)
    toks = F.when(F.trim("text") == "", F.lit(0)).otherwise(F.size(_tok_expr()))
    return (
        d.withColumn("n_tokens", toks.cast("bigint"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.min("n_tokens").cast("bigint").alias("min_tokens"),
            F.max("n_tokens").cast("bigint").alias("max_tokens"),
        )
        .orderBy("lang")
    )


TOKEN_COUNT_SQL = """
WITH t AS (
  SELECT lang,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(lower(trim(text)), '\\s+')) END
           AS n_tokens
  FROM documents
)
SELECT lang,
       count(*)::BIGINT AS n_docs,
       sum(n_tokens)::BIGINT AS total_tokens,
       min(n_tokens)::BIGINT AS min_tokens,
       max(n_tokens)::BIGINT AS max_tokens
FROM t GROUP BY lang ORDER BY lang
"""


def _stopword_hits(lang: str):
    pat = r"\b(" + "|".join(STOPWORDS[lang]) + r")\b"
    return F.size(F.regexp_extract_all(F.lower("text"), F.lit(pat), F.lit(0)))


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document quality: integer sub-scores only (exact across
    engines), per doc: token count band, stopword presence, digit ratio."""
    d = _docs(spark, sf_dir)
    n_tokens = F.when(F.trim("text") == "", F.lit(0)).otherwise(F.size(_tok_expr()))
    n_chars = F.length("text")
    n_digits = n_chars - F.length(F.regexp_replace("text", r"[0-9]", ""))
    sw = _stopword_hits("en")
    qd = d.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        n_tokens.cast("bigint").alias("n_tokens"),
        n_chars.cast("bigint").alias("n_chars"),
        n_digits.cast("bigint").alias("n_digits"),
        sw.cast("bigint").alias("stopword_hits"),
    )
    passes = (
        (F.col("n_tokens") >= 10)
        & (F.col("n_chars") >= 50)
        & (F.col("stopword_hits") >= 1)
        & (F.col("n_digits") * 2 < F.col("n_chars"))
    )
    return qd.withColumn("passes_quality", passes).orderBy("doc_id")


QUALITY_SCORE_SQL = """
WITH q AS (
  SELECT doc_id::BIGINT AS doc_id,
         (CASE WHEN trim(text) = '' THEN 0
               ELSE len(regexp_split_to_array(lower(trim(text)), '\\s+')) END)::BIGINT
           AS n_tokens,
         length(text)::BIGINT AS n_chars,
         (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))::BIGINT
           AS n_digits,
         len(regexp_extract_all(lower(text),
             '\\b(the|and|of|to|in|is|for|on|with|a)\\b'))::BIGINT AS stopword_hits
  FROM documents
)
SELECT *,
       (n_tokens >= 10 AND n_chars >= 50 AND stopword_hits >= 1
        AND n_digits * 2 < n_chars) AS passes_quality
FROM q ORDER BY doc_id
"""


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language id: argmax of per-language stopword hit
    counts (priority order en>fr>de>es on ties, 'und' = no hits)."""
    d = _docs(spark, sf_dir)
    hits = {lg: _stopword_hits(lg).cast("bigint") for lg in STOPWORDS}
    df = d.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("lang").alias("lang_true"),
        *[hits[lg].alias(f"hits_{lg}") for lg in ("en", "fr", "de", "es")],
    )
    best = F.greatest(*[F.col(f"hits_{lg}") for lg in ("en", "fr", "de", "es")])
    pred = (
        F.when(best == 0, "und")
        .when(F.col("hits_en") == best, "en")
        .when(F.col("hits_fr") == best, "fr")
        .when(F.col("hits_de") == best, "de")
        .otherwise("es")
    )
    return (
        df.withColumn("lang_pred", pred)
        .groupBy("lang_true", "lang_pred")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .orderBy("lang_true", "lang_pred")
    )


def _sql_hits(lang: str) -> str:
    pat = "\\b(" + "|".join(STOPWORDS[lang]) + ")\\b"
    return f"len(regexp_extract_all(lower(text), '{pat}'))::BIGINT"


LANG_ID_SQL = f"""
WITH h AS (
  SELECT doc_id, lang AS lang_true,
         {_sql_hits('en')} AS hits_en,
         {_sql_hits('fr')} AS hits_fr,
         {_sql_hits('de')} AS hits_de,
         {_sql_hits('es')} AS hits_es
  FROM documents
), p AS (
  SELECT lang_true,
         CASE WHEN greatest(hits_en, hits_fr, hits_de, hits_es) = 0 THEN 'und'
              WHEN hits_en = greatest(hits_en, hits_fr, hits_de, hits_es) THEN 'en'
              WHEN hits_fr = greatest(hits_en, hits_fr, hits_de, hits_es) THEN 'fr'
              WHEN hits_de = greatest(hits_en, hits_fr, hits_de, hits_es) THEN 'de'
              ELSE 'es' END AS lang_pred
  FROM h
)
SELECT lang_true, lang_pred, count(*)::BIGINT AS n_docs
FROM p GROUP BY lang_true, lang_pred ORDER BY lang_true, lang_pred
"""


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized-content fingerprint (md5 of lowercased whitespace-collapsed
    text) per document — the sha256-keyed mention-dedupe primitive of the
    north_star at document granularity."""
    d = _docs(spark, sf_dir)
    fp = F.md5(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "))
    return d.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        fp.alias("fingerprint"),
    ).orderBy("doc_id")


DOC_FINGERPRINT_SQL = """
SELECT doc_id::BIGINT AS doc_id,
       md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
FROM documents ORDER BY doc_id
"""

ORACLES = {
    "text_token_count": TOKEN_COUNT_SQL,
    "text_quality_score": QUALITY_SCORE_SQL,
    "text_lang_id": LANG_ID_SQL,
    "text_doc_fingerprint": DOC_FINGERPRINT_SQL,
}

QUERIES = {
    "text_token_count": token_count,
    "text_quality_score": quality_score,
    "text_lang_id": lang_id,
    "text_doc_fingerprint": doc_fingerprint,
}


def ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 word bigrams per language (frequency, ties by bigram asc) —
    corpus-statistics shape (explode → count → window top-k)."""
    from pyspark.sql import Window

    d = _docs(spark, sf_dir)
    toks = _tok_expr()
    bigrams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - 2),
        lambda i: F.concat_ws(" ", F.element_at(toks, i + 1), F.element_at(toks, i + 2)),
    )
    g = (
        d.where(F.size(toks) >= 2)
        .select("lang", F.explode(bigrams).alias("bigram"))
        .groupBy("lang", "bigram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("freq"), F.asc("bigram"))
    return (
        g.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rk") <= 5)
        .select("lang", "rk", "bigram", "freq")
        .orderBy("lang", "rk")
    )


NGRAM_TOPK_SQL = """
WITH toks AS (
  SELECT lang, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
  FROM documents
), bg AS (
  SELECT lang, t[i] || ' ' || t[i+1] AS bigram
  FROM (SELECT lang, t, unnest(generate_series(1, len(t)-1)) AS i FROM toks
        WHERE len(t) >= 2)
), cnt AS (
  SELECT lang, bigram, count(*)::BIGINT AS freq FROM bg GROUP BY lang, bigram
), rk AS (
  SELECT lang, bigram, freq,
         row_number() OVER (PARTITION BY lang ORDER BY freq DESC, bigram ASC)::BIGINT AS rk
  FROM cnt
)
SELECT lang, rk, bigram, freq FROM rk WHERE rk <= 5 ORDER BY lang, rk
"""

ORACLES["text_ngram_topk"] = NGRAM_TOPK_SQL
QUERIES["text_ngram_topk"] = ngram_topk
