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
    # token array bound as its own projection first: the transform lambda is
    # interpreted (CodegenFallback), so an inlined split() re-splits the text
    # per bigram position — O(tokens²) per doc (same fix as dedup._doc_ngrams)
    with_toks = d.select("lang", _tok_expr().alias("toks")).where(
        F.size("toks") >= 2
    )
    toks = F.col("toks")
    bigrams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - 2),
        lambda i: F.concat_ws(" ", F.element_at(toks, i + 1), F.element_at(toks, i + 2)),
    )
    g = (
        with_toks.select("lang", F.explode(bigrams).alias("bigram"))
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


def repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition quality filter (the Gopher/MassiveText
    repetition-removal family): per doc, distinct-token fraction and
    most-frequent-bigram fraction, with integer-only sub-scores so the gate
    arithmetic is exact across engines. A doc passes when distinct tokens
    are >= half its tokens AND its top bigram is <= 1/20 of all bigrams.

    Scale shape: the per-bigram counts go through explode -> map-side-
    combinable groupBy((doc_id, bigram)) -> max per doc_id — no per-doc
    quadratic array work, so arbitrarily long documents stay linear."""
    d = _docs(spark, sf_dir)
    toks = _tok_expr()
    empty = F.trim("text") == ""
    n_tokens = F.when(empty, F.lit(0)).otherwise(F.size(toks))
    n_distinct = F.when(empty, F.lit(0)).otherwise(F.size(F.array_distinct(toks)))
    base = d.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        n_tokens.cast("bigint").alias("n_tokens"),
        n_distinct.cast("bigint").alias("n_distinct_tokens"),
        F.greatest(n_tokens - 1, F.lit(0)).cast("bigint").alias("n_bigrams"),
    )
    # bound token-array projection before the interpreted transform lambda —
    # same O(tokens²) re-split fix as ngram_topk / dedup._doc_ngrams
    bg_toks = d.select(
        F.col("doc_id").cast("bigint").alias("doc_id"), _tok_expr().alias("toks")
    ).where(F.size("toks") >= 2)
    tk = F.col("toks")
    bigrams = F.transform(
        F.sequence(F.lit(0), F.size(tk) - 2),
        lambda i: F.concat_ws(" ", F.element_at(tk, i + 1), F.element_at(tk, i + 2)),
    )
    top = (
        bg_toks.select("doc_id", F.explode(bigrams).alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id")
        .agg(F.max("cnt").cast("bigint").alias("top_bigram_freq"))
    )
    out = base.join(top, "doc_id", "left").withColumn(
        "top_bigram_freq", F.coalesce("top_bigram_freq", F.lit(0)).cast("bigint")
    )
    passes = (F.col("n_distinct_tokens") * 2 >= F.col("n_tokens")) & (
        (F.col("n_bigrams") == 0)
        | (F.col("top_bigram_freq") * 20 <= F.col("n_bigrams"))
    )
    return out.withColumn("passes_repetition", passes).orderBy("doc_id")


REPETITION_FILTER_SQL = """
WITH toks AS (
  SELECT doc_id::BIGINT AS doc_id,
         CASE WHEN trim(text) = '' THEN []::VARCHAR[]
              ELSE regexp_split_to_array(lower(trim(text)), '\\s+') END AS t
  FROM documents
), base AS (
  SELECT doc_id, len(t)::BIGINT AS n_tokens,
         len(list_distinct(t))::BIGINT AS n_distinct_tokens,
         greatest(len(t) - 1, 0)::BIGINT AS n_bigrams
  FROM toks
), bg AS (
  SELECT doc_id, t[i] || ' ' || t[i+1] AS bigram
  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t)-1)) AS i FROM toks
        WHERE len(t) >= 2)
), top AS (
  SELECT doc_id, max(cnt)::BIGINT AS top_bigram_freq
  FROM (SELECT doc_id, bigram, count(*) AS cnt FROM bg GROUP BY 1, 2)
  GROUP BY 1
), j AS (
  SELECT b.doc_id, n_tokens, n_distinct_tokens, n_bigrams,
         coalesce(top_bigram_freq, 0)::BIGINT AS top_bigram_freq
  FROM base b LEFT JOIN top USING (doc_id)
)
SELECT *,
       (n_distinct_tokens * 2 >= n_tokens
        AND (n_bigrams = 0 OR top_bigram_freq * 20 <= n_bigrams))
         AS passes_repetition
FROM j ORDER BY doc_id
"""

ORACLES["text_repetition_filter"] = REPETITION_FILTER_SQL
QUERIES["text_repetition_filter"] = repetition_filter


# PII patterns shared by both engines (Java regex and RE2 agree on this
# subset: literal classes, \b, bounded repetition). Redaction order is part
# of the operator contract: email -> ipv4 -> phone.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\+?\d[\d -]{7,}\d"


def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing for training corpora: count and redact emails, IPv4
    addresses and phone-shaped numbers. The synthetic corpus carries no PII,
    so every doc with doc_id % 3 == 0 is first augmented with a deterministic
    contact line derived from doc_id (same formula in the DuckDB oracle) —
    the redaction path is then hash-gated on real matches, not on zeros.
    Output: per-doc match counts + md5 of the redacted text."""
    d = _docs(spark, sf_dir)
    did = F.col("doc_id")
    contact = F.concat(
        F.lit(" contact user"), did.cast("string"),
        F.lit("@example.com at 10.0."), (did % 256).cast("string"),
        F.lit(".7 or +1 555 01"), (did % 100).cast("string"),
    )
    aug = F.concat(F.col("text"),
                   F.when(did % 3 == 0, contact).otherwise(F.lit("")))
    n_emails = F.size(F.regexp_extract_all(aug, F.lit(PII_EMAIL), F.lit(0)))
    n_ipv4 = F.size(F.regexp_extract_all(aug, F.lit(PII_IPV4), F.lit(0)))
    n_phones = F.size(F.regexp_extract_all(aug, F.lit(PII_PHONE), F.lit(0)))
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(aug, PII_EMAIL, "<EMAIL>"), PII_IPV4, "<IP>"
        ),
        PII_PHONE,
        "<PHONE>",
    )
    return d.select(
        did.cast("bigint").alias("doc_id"),
        n_emails.cast("bigint").alias("n_emails"),
        n_ipv4.cast("bigint").alias("n_ipv4"),
        n_phones.cast("bigint").alias("n_phones"),
        F.md5(redacted).alias("redacted_md5"),
    ).orderBy("doc_id")


PII_REDACT_SQL = """
WITH aug AS (
  SELECT doc_id::BIGINT AS doc_id,
         text || CASE WHEN doc_id % 3 = 0
                      THEN ' contact user' || doc_id::VARCHAR
                           || '@example.com at 10.0.'
                           || (doc_id % 256)::VARCHAR
                           || '.7 or +1 555 01' || (doc_id % 100)::VARCHAR
                      ELSE '' END AS t
  FROM documents
)
SELECT doc_id,
       len(regexp_extract_all(t,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))::BIGINT
         AS n_emails,
       len(regexp_extract_all(t,
           '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b'))::BIGINT AS n_ipv4,
       len(regexp_extract_all(t, '\\+?\\d[\\d -]{7,}\\d'))::BIGINT AS n_phones,
       md5(regexp_replace(regexp_replace(regexp_replace(t,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g'),
           '\\+?\\d[\\d -]{7,}\\d', '<PHONE>', 'g')) AS redacted_md5
FROM aug ORDER BY doc_id
"""

ORACLES["text_pii_redact"] = PII_REDACT_SQL
QUERIES["text_pii_redact"] = pii_redact


# ---------------------------------------------------------------------------
# Deterministic stratified sampling (training-mixture construction)
# ---------------------------------------------------------------------------

# Per-language keep rates out of 256 (the first md5 byte of the doc id):
# the mixture weights a training-corpus builder applies per source/language.
MIXTURE_RATES_256 = {"en": 153, "fr": 102, "de": 102, "es": 102, "zh": 51}
MIXTURE_DEFAULT_256 = 26


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based stratified sampling: keep a document iff the
    first byte of md5(doc_id) falls under its language's mixture rate.
    Hash-gated sampling (not rand()) is the standard reproducible way to
    draw a training mixture — the same doc set is selected on every engine,
    every run, every partitioning.

    Scale posture: a single narrow projection + filter, no shuffle at all;
    the md5 is computed from the decimal string of the id so any engine
    agrees bit-for-bit."""
    d = _docs(spark, sf_dir)
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2), 16, 10)
        .cast("bigint")
        .alias("bucket")
    )
    rate = F.lit(MIXTURE_DEFAULT_256)
    for lang, r in MIXTURE_RATES_256.items():
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
    return (
        d.select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.col("lang"),
            bucket,
            rate.cast("bigint").alias("rate_256"),
        )
        .where(F.col("bucket") < F.col("rate_256"))
        .orderBy("doc_id")
    )


_RATE_CASES = "\n".join(
    f"           WHEN lang = '{lang}' THEN {r}"
    for lang, r in MIXTURE_RATES_256.items()
)

STRATIFIED_SAMPLE_SQL = f"""
WITH s AS (
  SELECT doc_id::BIGINT AS doc_id, lang,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 2))::BIGINT AS bucket,
         (CASE
{_RATE_CASES}
           ELSE {MIXTURE_DEFAULT_256} END)::BIGINT AS rate_256
  FROM documents
)
SELECT doc_id, lang, bucket, rate_256 FROM s
WHERE bucket < rate_256 ORDER BY doc_id
"""

ORACLES["text_stratified_sample"] = STRATIFIED_SAMPLE_SQL
QUERIES["text_stratified_sample"] = stratified_sample


# ---------------------------------------------------------------------------
# Token-length histogram (corpus profiling)
# ---------------------------------------------------------------------------

HIST_BIN_TOKENS = 16


def token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language histogram of document token counts in fixed-width bins
    (the corpus length profile a pipeline uses to pick sequence-packing and
    truncation budgets). Integer bin arithmetic only, so it is exact across
    engines.

    Scale posture: one map-side-combinable groupBy on (lang, bin) — the
    canonical histogram shape."""
    d = _docs(spark, sf_dir)
    n_tokens = F.when(F.trim("text") == "", F.lit(0)).otherwise(F.size(_tok_expr()))
    binned = d.select(
        F.col("lang"),
        (F.floor(n_tokens / F.lit(HIST_BIN_TOKENS)) * HIST_BIN_TOKENS)
        .cast("bigint")
        .alias("bin_lo"),
    )
    return (
        binned.groupBy("lang", "bin_lo")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .orderBy("lang", "bin_lo")
    )


TOKEN_HISTOGRAM_SQL = f"""
WITH t AS (
  SELECT lang,
         (CASE WHEN trim(text) = '' THEN 0
               ELSE len(regexp_split_to_array(lower(trim(text)), '\\s+')) END)
           AS n_tokens
  FROM documents
)
SELECT lang,
       ((n_tokens // {HIST_BIN_TOKENS}) * {HIST_BIN_TOKENS})::BIGINT AS bin_lo,
       count(*)::BIGINT AS n_docs
FROM t GROUP BY lang, bin_lo ORDER BY lang, bin_lo
"""

ORACLES["text_token_hist"] = TOKEN_HISTOGRAM_SQL
QUERIES["text_token_hist"] = token_histogram


# ---------------------------------------------------------------------------
# Exact rank-based percentiles (corpus length profiling)
# ---------------------------------------------------------------------------

PCT_TARGETS = (50, 90, 99)


def token_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentile_disc(p) of document token counts per language,
    computed by explicit rank arithmetic (row_number over a per-language
    sort; the element at rank ceil(p*n/100)) so Spark and any SQL engine
    agree bit-for-bit — no floating interpolation, no approx sketch.

    Scale posture: one exchange on lang + an in-partition sort; the
    conditional max over rank targets is map-side-combinable. For the
    100 TB version where a global sort per group is too hot, swap in
    approx_percentile with a documented error bound — this operator is the
    exact-twin gate for it."""
    from pyspark.sql import Window

    d = _docs(spark, sf_dir)
    n_tokens = F.when(F.trim("text") == "", F.lit(0)).otherwise(F.size(_tok_expr()))
    t = d.select(F.col("lang"), n_tokens.cast("bigint").alias("n_tokens"))
    w = Window.partitionBy("lang").orderBy("n_tokens")
    ranked = t.select(
        "lang",
        "n_tokens",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("lang")).alias("n"),
    )
    aggs = [
        F.max(
            F.when(
                F.col("rn") == F.expr(f"CAST((n * {p} + 99) DIV 100 AS BIGINT)"),
                F.col("n_tokens"),
            )
        ).alias(f"p{p}_tokens")
        for p in PCT_TARGETS
    ]
    return ranked.groupBy("lang").agg(*aggs).orderBy("lang")


_PCT_COLS = ",\n".join(
    f"       max(CASE WHEN rn = (n * {p} + 99) // 100 THEN n_tokens END)"
    f" AS p{p}_tokens"
    for p in PCT_TARGETS
)

TOKEN_PERCENTILES_SQL = f"""
WITH t AS (
  SELECT lang,
         (CASE WHEN trim(text) = '' THEN 0
               ELSE len(regexp_split_to_array(lower(trim(text)), '\\s+')) END)::BIGINT
           AS n_tokens
  FROM documents
), ranked AS (
  SELECT lang, n_tokens,
         row_number() OVER (PARTITION BY lang ORDER BY n_tokens) AS rn,
         count(*) OVER (PARTITION BY lang) AS n
  FROM t
)
SELECT lang,
{_PCT_COLS}
FROM ranked GROUP BY lang ORDER BY lang
"""

ORACLES["text_token_percentiles"] = TOKEN_PERCENTILES_SQL
QUERIES["text_token_percentiles"] = token_percentiles


# ---------------------------------------------------------------------------
# Benchmark decontamination (train/test n-gram overlap)
# ---------------------------------------------------------------------------

DECON_N = 8              # word n-gram width (13 is the common LLM default;
                         # 8 keeps the synthetic corpus non-vacuous)
DECON_MOD, DECON_REM = 11, 7   # deterministic benchmark subset: doc_id%11==7


def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-corpus decontamination: flag corpus documents sharing any
    word 8-gram with a held-out benchmark set (here the deterministic
    doc_id%11==7 subset — no external data). The standard pretraining
    hygiene pass (GPT-3/PaLM-style n-gram overlap decontamination).

    Scale posture: benchmark suites are tiny next to a 100 TB corpus, so
    the benchmark gram set is DISTINCT-ed and broadcast; the corpus side
    is one linear scan + JVM-side transform/explode (sequence+slice —
    no Python UDF) with ~L grams per doc, then a map-side-combinable
    groupBy(doc_id). No shuffle of raw text, no self-join."""
    d = _docs(spark, sf_dir).where(F.trim("text") != "")
    grams = (
        d.select("doc_id", _tok_expr().alias("t"))
        .where(F.size("t") >= DECON_N)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(t) - {DECON_N - 1}),"
                    f" i -> array_join(slice(t, i, {DECON_N}), ' '))"
                )
            ).alias("gram"),
        )
    )
    is_bench = F.col("doc_id") % DECON_MOD == DECON_REM
    bench = (
        grams.where(is_bench)
        .select("gram", F.col("doc_id").alias("bench_doc"))
        .distinct()
    )
    # corpus side deliberately NOT distinct-ed: both output aggregates are
    # countDistinct, so duplicate (doc_id, gram) rows cannot change the
    # result, and dropping the dedupe removes a full corpus-gram exchange —
    # the broadcast bench join filters the stream before it ever shuffles
    return (
        grams.where(~is_bench)
        .join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("bench_doc").cast("bigint").alias("n_bench_docs"),
            F.countDistinct("gram").cast("bigint").alias("n_shared_grams"),
        )
        .select(F.col("doc_id").cast("bigint").alias("doc_id"),
                "n_bench_docs", "n_shared_grams")
        .orderBy("doc_id")
    )


DECONTAMINATE_SQL = f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
  FROM documents WHERE trim(text) <> ''
), grams AS (
  SELECT DISTINCT doc_id, array_to_string(t[u.i:u.i+{DECON_N - 1}], ' ') AS gram
  FROM toks CROSS JOIN LATERAL unnest(range(1, len(t) - {DECON_N - 2})) AS u(i)
  WHERE len(t) >= {DECON_N}
), bench AS (
  SELECT DISTINCT gram, doc_id AS bench_doc FROM grams
  WHERE doc_id % {DECON_MOD} = {DECON_REM}
), corpus AS (
  SELECT doc_id, gram FROM grams WHERE doc_id % {DECON_MOD} <> {DECON_REM}
)
SELECT c.doc_id::BIGINT AS doc_id,
       count(DISTINCT b.bench_doc)::BIGINT AS n_bench_docs,
       count(DISTINCT c.gram)::BIGINT AS n_shared_grams
FROM corpus c JOIN bench b USING (gram)
GROUP BY c.doc_id ORDER BY doc_id
"""

ORACLES["text_decontaminate"] = DECONTAMINATE_SQL
QUERIES["text_decontaminate"] = decontaminate


# ---------------------------------------------------------------------------
# Sequence packing (pretraining batch assembly)
# ---------------------------------------------------------------------------

PACK_BUDGET = 512        # tokens per packed sequence
PACK_SHARD = 100_000     # docs per packing shard (bounds window partition)


def seq_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy contiguous sequence packing: assign docs (ordered by doc_id
    within a language shard) to fixed token-budget bins — the batch
    assembly step of a pretraining data pipeline. bin = floor(running
    token total BEFORE this doc / budget): deterministic, order-stable,
    oracle-able, and every bin holds ≥budget tokens once it closes.

    Scale posture: the window partitions on (lang, shard) where shard =
    floor(doc_id / 100k) — packing never needs global order, only
    within-shard contiguity, so partition size is BOUNDED and no single
    language becomes one giant window partition at 100 TB. At test scale
    every doc sits in shard 0 (documented: the shard key proves the plan
    shape, not the data split)."""
    from pyspark.sql import Window

    d = _docs(spark, sf_dir)
    toks = F.when(F.trim("text") == "", F.lit(0)).otherwise(F.size(_tok_expr()))
    shard = F.floor(F.col("doc_id") / PACK_SHARD).cast("bigint")
    w = (
        Window.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    binned = (
        d.withColumn("n_tokens", toks.cast("bigint"))
        .withColumn("shard", shard)
        .withColumn(
            "bin",
            F.floor(
                F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / PACK_BUDGET
            ).cast("bigint"),
        )
    )
    return (
        binned.groupBy("lang", "shard", "bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
        )
        .orderBy("lang", "shard", "bin")
    )


SEQ_PACK_SQL = f"""
WITH t AS (
  SELECT doc_id, lang,
         (doc_id // {PACK_SHARD})::BIGINT AS shard,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(lower(trim(text)), '\\s+')) END
           AS n_tokens
  FROM documents
), b AS (
  SELECT lang, shard, n_tokens,
         floor(coalesce(sum(n_tokens) OVER (
             PARTITION BY lang, shard ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           / {PACK_BUDGET})::BIGINT AS bin
  FROM t
)
SELECT lang, shard, bin,
       count(*)::BIGINT AS n_docs,
       sum(n_tokens)::BIGINT AS sum_tokens
FROM b GROUP BY lang, shard, bin ORDER BY lang, shard, bin
"""

ORACLES["text_seq_pack"] = SEQ_PACK_SQL
QUERIES["text_seq_pack"] = seq_pack


# ---------------------------------------------------------------------------
# Corpus-global TF-IDF keyword extraction (top-terms per document)
# ---------------------------------------------------------------------------


def tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document — the corpus-global-statistic shape:
    a document-local aggregate (term frequency) joined against a corpus-wide
    aggregate (document frequency + doc count) computed in the same plan.

    100 TB posture: two map-side-combinable shuffles (tf on (doc_id, token),
    df on token), one join on token (vocabulary-sized right side — orders of
    magnitude smaller than the corpus; AQE picks broadcast vs shuffle at
    runtime), and a per-doc window bounded by the document's own vocabulary.
    The doc count rides in as a broadcast 1-row cross join — no driver
    action, no collect.

    Cross-engine FP discipline (kmeans precedent, similarity.py): the score
    is rounded to 9 decimals BEFORE ranking so IEEE ln() noise (~1e-15
    relative) can never flip the row_number between Spark and DuckDB; ties
    break on token ASC in both engines."""
    from pyspark.sql import Window

    d = _docs(spark, sf_dir).where(F.trim("text") != "")
    toks = d.select("doc_id", F.explode(_tok_expr()).alias("token"))
    tf = toks.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    # tf is unique per (doc_id, token): count(*) over it IS the doc frequency
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    n = d.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")),
                9,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("token"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rk") <= 3)
        .select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            "rk",
            "token",
            F.round("score", 6).alias("score"),
        )
        .orderBy("doc_id", "rk")
    )


TFIDF_TOPTERMS_SQL = """
WITH d AS (
  SELECT doc_id::BIGINT AS doc_id, lower(trim(text)) AS t
  FROM documents WHERE trim(text) <> ''
), toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(t, '\\s+')) AS token FROM d
), tf AS (
  SELECT doc_id, token, count(*)::BIGINT AS tf FROM toks GROUP BY doc_id, token
), dfreq AS (
  SELECT token, count(*)::BIGINT AS df FROM tf GROUP BY token
), n AS (
  SELECT count(*)::BIGINT AS n_docs FROM d
), s AS (
  SELECT tf.doc_id, tf.token,
         round(tf.tf * ln(n.n_docs::DOUBLE / dfreq.df), 9) AS score
  FROM tf JOIN dfreq USING (token) CROSS JOIN n
), rk AS (
  SELECT doc_id, token, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, token ASC)::BIGINT AS rk
  FROM s
)
SELECT doc_id, rk, token, round(score, 6) AS score
FROM rk WHERE rk <= 3 ORDER BY doc_id, rk
"""

ORACLES["text_tfidf_topterms"] = TFIDF_TOPTERMS_SQL
QUERIES["text_tfidf_topterms"] = tfidf_topterms


# ---------------------------------------------------------------------------
# URL canonicalization dedup (web-crawl ingestion)
# ---------------------------------------------------------------------------

# The corpus carries no URL column, so each doc synthesizes one
# DETERMINISTICALLY from (doc_id, source) — same formula in the oracle, the
# pii_redact precedent — with the real-world noise a crawler sees: host case
# variants, tracking query params, fragments, trailing slashes. Path slot
# (doc_id // 20) % 8 guarantees non-degenerate duplicate groups at every SF
# (sources stripe doc_id % 20, so ~25 docs/source fold into 8 slots).
_URL_TRACKING_RE = r"(utm_[a-z_]+|ref|fbclid)=[^&#]*&?"


def url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalize noisy URLs (strip fragment, drop tracking params,
    case-fold, strip trailing slash) and dedup: one representative doc
    (min doc_id) per canonical URL, with duplicate-group size and the count
    of distinct raw variants that folded in.

    100 TB posture: pure JVM string expressions + ONE groupBy on the
    canonical URL (map-side combinable min/count) — the same shape as exact
    dedup; no window, no join."""
    d = _docs(spark, sf_dir)
    did = F.col("doc_id")
    host = F.concat(
        F.when(did % 5 == 0, F.upper("source")).otherwise(F.col("source")),
        F.lit(".example.org"),
    )
    slot = (F.floor(did / 20) % 8).cast("string")
    raw = F.concat(
        F.lit("https://"), host, F.lit("/articles/"), slot,
        F.when(did % 7 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(did % 3 == 0,
               F.concat(F.lit("?utm_source=feed&ref="), did.cast("string"))
               ).otherwise(F.lit("")),
        F.when(did % 2 == 0,
               F.concat(F.lit("#section-"), (did % 4).cast("string"))
               ).otherwise(F.lit("")),
    )
    canon = F.regexp_replace(                      # 4. strip trailing slash
        F.lower(                                   # 3. case-fold (host case)
            F.regexp_replace(                      # 2b. drop dangling ?/&
                F.regexp_replace(                  # 2a. drop tracking params
                    F.regexp_replace(raw, r"#.*$", ""),  # 1. strip fragment
                    _URL_TRACKING_RE, "",
                ),
                r"[?&]$", "",
            )
        ),
        r"/$", "",
    )
    return (
        d.select(did.cast("bigint").alias("doc_id"), raw.alias("raw_url"),
                 canon.alias("canon_url"))
        .groupBy("canon_url")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("keep_doc_id"),
            F.countDistinct("raw_url").cast("bigint").alias("n_raw_variants"),
        )
        .orderBy("canon_url")
    )


URL_CANONICAL_SQL = """
WITH u AS (
  SELECT doc_id::BIGINT AS doc_id,
         'https://'
         || CASE WHEN doc_id % 5 = 0 THEN upper(source) ELSE source END
         || '.example.org/articles/' || ((doc_id // 20) % 8)::VARCHAR
         || CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END
         || CASE WHEN doc_id % 3 = 0
                 THEN '?utm_source=feed&ref=' || doc_id::VARCHAR
                 ELSE '' END
         || CASE WHEN doc_id % 2 = 0
                 THEN '#section-' || (doc_id % 4)::VARCHAR
                 ELSE '' END AS raw_url
  FROM documents
), c AS (
  SELECT doc_id, raw_url,
         regexp_replace(
           lower(
             regexp_replace(
               regexp_replace(
                 regexp_replace(raw_url, '#.*$', ''),
                 '(utm_[a-z_]+|ref|fbclid)=[^&#]*&?', '', 'g'),
               '[?&]$', '')),
           '/$', '') AS canon_url
  FROM u
)
SELECT canon_url,
       count(*)::BIGINT AS n_docs,
       min(doc_id)::BIGINT AS keep_doc_id,
       count(DISTINCT raw_url)::BIGINT AS n_raw_variants
FROM c GROUP BY canon_url ORDER BY canon_url
"""

ORACLES["text_url_canonical"] = URL_CANONICAL_SQL
QUERIES["text_url_canonical"] = url_canonical_dedup


# ---------------------------------------------------------------------------
# Overlapping document chunking (context-window prep for training / RAG)
# ---------------------------------------------------------------------------

CHUNK_TOKENS = 64   # tokens per chunk
CHUNK_STRIDE = 48   # chunk start step → 16-token overlap between neighbors


def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split each document into overlapping fixed-size token windows —
    the context-window chunking step every embedding / RAG / training
    pipeline runs before encoding. Chunks start every CHUNK_STRIDE tokens
    and span CHUNK_TOKENS (the final chunk may be short); stride < size
    guarantees every token lands in at least one chunk.

    Output carries the chunk's md5 instead of its text so the driver's
    value-hash gate pins the exact chunk CONTENT cross-engine without
    shipping the corpus back out.

    100 TB posture: one narrow projection + a generator explode
    (sequence over chunk starts) + per-row slice/hash — NO shuffle at all
    until the output sort; each input row fans out to ceil(n/stride)
    rows inside its own partition. Python never sees a token."""
    d = _docs(spark, sf_dir).where(F.trim("text") != "")
    toks = _tok_expr()
    base = d.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        toks.alias("toks"),
    )
    s = F.col("s")
    chunk = F.slice(F.col("toks"), s, CHUNK_TOKENS)
    return (
        base.select(
            "doc_id",
            "toks",
            F.explode(
                F.sequence(F.lit(1), F.size("toks"), F.lit(CHUNK_STRIDE))
            ).alias("s"),
        )
        .select(
            "doc_id",
            ((s - 1) / CHUNK_STRIDE).cast("bigint").alias("chunk_id"),
            F.size(chunk).cast("bigint").alias("chunk_tokens"),
            F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"),
        )
        .orderBy("doc_id", "chunk_id")
    )


CHUNK_SQL = f"""
WITH d AS (
  SELECT doc_id::BIGINT AS doc_id,
         regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
  FROM documents WHERE trim(text) <> ''
)
SELECT doc_id,
       ((s - 1) // {CHUNK_STRIDE})::BIGINT AS chunk_id,
       len(list_slice(toks, s, s + {CHUNK_TOKENS - 1}))::BIGINT AS chunk_tokens,
       md5(array_to_string(list_slice(toks, s, s + {CHUNK_TOKENS - 1}), ' '))
         AS chunk_md5
FROM d, unnest(generate_series(1, len(toks), {CHUNK_STRIDE})) AS t(s)
ORDER BY doc_id, chunk_id
"""

ORACLES["text_chunk"] = CHUNK_SQL
QUERIES["text_chunk"] = chunk_documents


# ---------------------------------------------------------------------------
# Unigram LM quality filter (CCNet-style perplexity gate)
# ---------------------------------------------------------------------------

# CCNet (Wenzek et al. 2020) filters a crawl by the perplexity of a language
# model trained on a clean reference corpus. Same shape here with a unigram
# LM: train token counts on the in-domain slice (lang='en'), score EVERY doc
# by its mean negative log-likelihood under additive smoothing, and gate on
# a fixed threshold. Reference scope: the repo's quality filters are ratio
# heuristics (SURVEY §2 text ops) — this is the LM-based upgrade a training
# pipeline runs right after them.
LM_ALPHA = "0.5"   # additive-smoothing mass (exact decimal in both engines)
LM_NLL_KEEP = 6.0  # keep docs whose mean NLL is below this


def lm_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc mean negative log-likelihood under a corpus-trained unigram
    LM + keep/discard verdict.

    100 TB posture: the LM is ONE map-side-combinable groupBy over the
    training slice's tokens; the vocabulary is orders of magnitude smaller
    than the corpus, so the score join is vocabulary-sized on the right
    (AQE broadcasts it). Scoring is one corpus scan: explode → left join
    vocab → per-doc avg (map-side combinable). The two scalar totals ride
    in as a broadcast 1-row cross join — no collect, no driver loop.

    Cross-engine FP discipline (tfidf precedent): each token's ln() is
    rounded to 9 decimals before averaging so libm last-ulp noise can't
    accumulate; the mean is re-rounded to 9 before the threshold compare so
    the verdict flips identically in both engines."""
    d = _docs(spark, sf_dir).where(F.trim("text") != "")
    toks = d.select("doc_id", "lang", F.explode(_tok_expr()).alias("token"))
    lm = (
        toks.where(F.col("lang") == "en")
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    totals = lm.agg(
        F.sum("c").cast("bigint").alias("lm_total"),
        F.count(F.lit(1)).cast("bigint").alias("lm_vocab"),
    )
    alpha = F.expr(LM_ALPHA)
    # smoothed p(token) = (c + alpha) / (total + alpha * (vocab + 1));
    # unseen tokens take c = 0 (the +1 vocab slot is the OOV bucket)
    p = (F.coalesce(F.col("c"), F.lit(0)).cast("double") + alpha) / (
        F.col("lm_total").cast("double")
        + alpha * (F.col("lm_vocab").cast("double") + 1.0)
    )
    nll_tok = F.round(-F.log(p), 9)
    per_doc = (
        toks.join(lm, "token", "left")
        .crossJoin(F.broadcast(totals))
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.round(F.avg(nll_tok), 9).alias("nll9"),
        )
    )
    return per_doc.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "lang",
        "n_tokens",
        F.round("nll9", 6).alias("mean_nll"),
        F.when(F.col("nll9") < F.lit(LM_NLL_KEEP), F.lit("keep"))
        .otherwise(F.lit("discard"))
        .alias("verdict"),
    ).orderBy("doc_id")


LM_LOGPROB_SQL = f"""
WITH d AS (
  SELECT doc_id::BIGINT AS doc_id, lang, lower(trim(text)) AS t
  FROM documents WHERE trim(text) <> ''
), toks AS (
  SELECT doc_id, lang, unnest(regexp_split_to_array(t, '\\s+')) AS token
  FROM d
), lm AS (
  SELECT token, count(*)::BIGINT AS c FROM toks WHERE lang = 'en'
  GROUP BY token
), totals AS (
  SELECT sum(c)::BIGINT AS lm_total, count(*)::BIGINT AS lm_vocab FROM lm
), scored AS (
  SELECT toks.doc_id, toks.lang,
         round(-ln((coalesce(lm.c, 0)::DOUBLE + {LM_ALPHA}) /
                   (totals.lm_total::DOUBLE
                    + {LM_ALPHA} * (totals.lm_vocab::DOUBLE + 1.0))), 9)
           AS nll_tok
  FROM toks LEFT JOIN lm USING (token) CROSS JOIN totals
), per_doc AS (
  SELECT doc_id, lang, count(*)::BIGINT AS n_tokens,
         round(avg(nll_tok), 9) AS nll9
  FROM scored GROUP BY doc_id, lang
)
SELECT doc_id, lang, n_tokens, round(nll9, 6) AS mean_nll,
       CASE WHEN nll9 < {LM_NLL_KEEP} THEN 'keep' ELSE 'discard' END
         AS verdict
FROM per_doc ORDER BY doc_id
"""

ORACLES["text_lm_logprob"] = LM_LOGPROB_SQL
QUERIES["text_lm_logprob"] = lm_logprob
