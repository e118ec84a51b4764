"""Deduplication operators for training-data pipelines: exact, word-n-gram
Jaccard, MinHash+LSH banding, SimHash, and embedding-cosine near-dup.

All hashing is md5-hex-string based so the DuckDB oracles (ORACLES) compute
IDENTICAL values — md5 of the same bytes yields the same hex string in both
engines, and hex strings order identically lexicographically.

Scale posture: every operator is a shuffle-on-key groupBy/join; the n-gram
join drops hot shingles (df cap) on both sides symmetrically; MinHash banding
turns the quadratic candidate space into equality buckets (the standard
LSH shape for a 1000-executor dedup sweep over 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

NGRAM_N = 3
JACCARD_THRESHOLD = 0.4
HOT_GRAM_DF = 50
MINHASH_SEEDS = 8
MINHASH_BANDS = 2  # 2 bands × 4 rows
COSINE_DUP_THRESHOLD = 0.35  # synthetic embeddings: within-label max ≈ 0.47


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _norm_text():
    return F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")


def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-groupBy exact duplicate groups over normalized text.

    The synthetic corpus has no exact-duplicate normalized texts at the
    driver's gate SF, which made the oracle comparison vacuous (0 = 0 rows
    gates nothing — VERDICT r4). Like ``pii_redact``'s augmentation, every
    doc with ``doc_id % 7 == 0`` is first unioned back in under a shifted
    id (same formula in the oracle), so the duplicate-group path is
    hash-gated on real collisions at every SF. Narrow union + one
    groupBy — scale posture unchanged."""
    d = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("bigint").alias("doc_id"), "text"
    )
    dup = d.where(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
    )
    g = d.unionByName(dup).select(
        "doc_id", F.md5(_norm_text()).alias("fingerprint")
    )
    return (
        g.groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("keep_doc_id"),
        )
        .where(F.col("n_docs") > 1)
        .orderBy("fingerprint")
    )


EXACT_DEDUP_SQL = """
WITH aug AS (
  SELECT doc_id::BIGINT AS doc_id, text FROM documents
  UNION ALL
  SELECT doc_id::BIGINT + 10000000, text FROM documents WHERE doc_id % 7 = 0
), g AS (
  SELECT doc_id,
         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
  FROM aug
)
SELECT fingerprint, count(*)::BIGINT AS n_docs, min(doc_id)::BIGINT AS keep_doc_id
FROM g GROUP BY fingerprint HAVING count(*) > 1 ORDER BY fingerprint
"""


def _doc_ngrams(d: DataFrame) -> DataFrame:
    """(doc_id, gram) DISTINCT word-3-grams.

    The token array is bound as its own projection FIRST: the gram builder
    is a higher-order ``transform`` (CodegenFallback — interpreted, no
    common-subexpression elimination), so inlining the ``split`` expression
    into ``size`` + three ``element_at`` calls re-splits the text per gram
    position (O(tokens²) per doc). A separate non-cheap multi-referenced
    alias survives CollapseProject, so ``split`` runs once per row."""
    with_toks = d.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.split(F.lower(F.trim("text")), r"\s+").alias("toks"),
    ).where(F.size("toks") >= NGRAM_N)
    toks = F.col("toks")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - NGRAM_N),
        lambda i: F.concat_ws(
            " ", F.element_at(toks, i + 1), F.element_at(toks, i + 2),
            F.element_at(toks, i + 3),
        ),
    )
    return with_toks.select(
        "doc_id", F.explode(F.array_distinct(grams)).alias("gram")
    )


_NGRAMS_SQL = """
  SELECT DISTINCT doc_id::BIGINT AS doc_id,
         toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS gram
  FROM (
    SELECT doc_id, toks, unnest(generate_series(1, len(toks)-2)) AS i
    FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
          FROM documents)
    WHERE len(toks) >= 3
  )
"""


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by word-3-gram Jaccard ≥ threshold; hot grams
    (df > HOT_GRAM_DF) dropped symmetrically before the pair join."""
    d = _docs(spark, sf_dir)
    g = _doc_ngrams(d)
    hot = g.groupBy("gram").count().where(F.col("count") > HOT_GRAM_DF).select("gram")
    g = g.join(F.broadcast(hot), "gram", "left_anti")
    sizes = g.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = g.select(F.col("doc_id").alias("doc_a"), "gram")
    b = g.select(F.col("doc_id").alias("doc_b"), "gram")
    inter = (
        a.join(b, "gram")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    j = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .where(F.col("jaccard") >= JACCARD_THRESHOLD)
    )
    return j.select(
        "doc_a", "doc_b",
        F.col("inter").cast("bigint").alias("shared_grams"),
    ).orderBy("doc_a", "doc_b")


NGRAM_JACCARD_SQL = f"""
WITH grams AS ({_NGRAMS_SQL}),
cold AS (
  SELECT * FROM grams
  WHERE gram IN (SELECT gram FROM grams GROUP BY gram HAVING count(*) <= {HOT_GRAM_DF})
),
sizes AS (SELECT doc_id, count(*) AS sz FROM cold GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM cold a JOIN cold b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b, inter::BIGINT AS shared_grams
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE inter::DOUBLE / (sa.sz + sb.sz - inter) >= {JACCARD_THRESHOLD}
ORDER BY doc_a, doc_b
"""


def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (8 md5-seeded mins over word-3-grams) → 2 LSH bands
    → candidate pairs sharing a band bucket."""
    d = _docs(spark, sf_dir)
    g = _doc_ngrams(d)
    mins = g.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{s}:"), F.col("gram")))).alias(f"h{s}")
            for s in range(MINHASH_SEEDS)
        ]
    )
    band0 = F.md5(F.concat_ws("|", "h0", "h1", "h2", "h3"))
    band1 = F.md5(F.concat_ws("|", "h4", "h5", "h6", "h7"))
    banded = mins.select(
        "doc_id", F.explode(F.array(band0, band1)).alias("bucket")
    )
    a = banded.select(F.col("doc_id").alias("doc_a"), "bucket")
    b = banded.select(F.col("doc_id").alias("doc_b"), "bucket")
    return (
        a.join(b, "bucket")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


MINHASH_SQL = f"""
WITH grams AS ({_NGRAMS_SQL}),
sig AS (
  SELECT doc_id,
         {', '.join(f"min(md5('{s}:' || gram)) AS h{s}" for s in range(MINHASH_SEEDS))}
  FROM grams GROUP BY doc_id
),
banded AS (
  SELECT doc_id, md5(h0 || '|' || h1 || '|' || h2 || '|' || h3) AS bucket FROM sig
  UNION ALL
  SELECT doc_id, md5(h4 || '|' || h5 || '|' || h6 || '|' || h7) AS bucket FROM sig
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM banded a JOIN banded b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
ORDER BY doc_a, doc_b
"""


def jaccard_lsh_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-path near-dup: exact word-3-gram Jaccard computed ONLY over the
    MinHash-LSH candidate pairs (band-bucket join), instead of regenerating
    the quadratic pair space from shared grams. This is the 100 TB shape:
    candidate generation is the banded LSH join (linear in corpus + bucket
    collisions), and the expensive exact verify touches only those pairs.
    The all-pairs ``ngram_jaccard_pairs`` stays as the small-corpus twin.
    """
    d = _docs(spark, sf_dir)
    g = _doc_ngrams(d)
    # candidate pairs from the banded signatures (same plan as minhash_lsh_pairs)
    mins = g.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{s}:"), F.col("gram")))).alias(f"h{s}")
            for s in range(MINHASH_SEEDS)
        ]
    )
    band0 = F.md5(F.concat_ws("|", "h0", "h1", "h2", "h3"))
    band1 = F.md5(F.concat_ws("|", "h4", "h5", "h6", "h7"))
    banded = mins.select(
        "doc_id", F.explode(F.array(band0, band1)).alias("bucket")
    )
    cand = (
        banded.alias("a")
        .join(banded.alias("b"), "bucket")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    # exact verify on the candidates only: intersect FULL gram sets (no hot-
    # gram cap needed — the pair set is already bounded by the LSH buckets)
    sizes = g.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    ga = g.select(F.col("doc_id").alias("doc_a"), "gram")
    gb = g.select(F.col("doc_id").alias("doc_b"), "gram")
    inter = (
        cand.join(ga, "doc_a")
        .join(gb, ["doc_b", "gram"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    j = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
        .where(
            F.col("inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
            >= JACCARD_THRESHOLD
        )
    )
    return j.select(
        "doc_a", "doc_b",
        F.col("inter").cast("bigint").alias("shared_grams"),
    ).orderBy("doc_a", "doc_b")


JACCARD_LSH_VERIFIED_SQL = f"""
WITH grams AS ({_NGRAMS_SQL}),
sig AS (
  SELECT doc_id,
         {', '.join(f"min(md5('{s}:' || gram)) AS h{s}" for s in range(MINHASH_SEEDS))}
  FROM grams GROUP BY doc_id
),
banded AS (
  SELECT doc_id, md5(h0 || '|' || h1 || '|' || h2 || '|' || h3) AS bucket FROM sig
  UNION ALL
  SELECT doc_id, md5(h4 || '|' || h5 || '|' || h6 || '|' || h7) AS bucket FROM sig
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS inter
  FROM cand c
  JOIN grams ga ON ga.doc_id = c.doc_a
  JOIN grams gb ON gb.doc_id = c.doc_b AND gb.gram = ga.gram
  GROUP BY c.doc_a, c.doc_b
)
SELECT doc_a, doc_b, inter::BIGINT AS shared_grams
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE inter::DOUBLE / (sa.sz + sb.sz - inter) >= {JACCARD_THRESHOLD}
ORDER BY doc_a, doc_b
"""


def simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per document from token md5s: bit j = majority of the
    high bit of hex digit j across tokens (hex digit ≥ '8')."""
    d = _docs(spark, sf_dir)
    toks = d.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("tok"),
    ).where(F.length("tok") > 0)
    h = toks.withColumn("h", F.md5("tok"))
    bit_aggs = [
        F.sum(
            F.when(F.substring("h", j + 1, 1) >= "8", 1).otherwise(-1)
        ).alias(f"b{j}")
        for j in range(32)
    ]
    agg = h.groupBy("doc_id").agg(*bit_aggs)
    sim = F.concat(
        *[F.when(F.col(f"b{j}") > 0, "1").otherwise("0") for j in range(32)]
    )
    return agg.select("doc_id", sim.alias("simhash")).orderBy("doc_id")


SIMHASH_SQL = (
    "WITH toks AS (SELECT doc_id::BIGINT AS doc_id, md5(t.tok) AS h FROM ("
    "SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok"
    " FROM documents) t WHERE length(t.tok) > 0),\n"
    "agg AS (SELECT doc_id, "
    + ", ".join(
        f"sum(CASE WHEN substr(h, {j + 1}, 1) >= '8' THEN 1 ELSE -1 END) AS b{j}"
        for j in range(32)
    )
    + " FROM toks GROUP BY doc_id)\n"
    "SELECT doc_id, "
    + " || ".join(
        f"(CASE WHEN b{j} > 0 THEN '1' ELSE '0' END)" for j in range(32)
    )
    + " AS simhash FROM agg ORDER BY doc_id"
)


def embedding_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: cosine ≥ threshold within the same label
    block (blocked brute force; the label works as the coarse quantizer an
    IVF index would supply at scale). Score column intentionally excluded
    from the output — float summation order differs across engines."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("label"), F.col("embedding").alias("emb_a"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("label"), F.col("embedding").alias("emb_b"))
    j = a.join(b, "label").where(F.col("vec_a") < F.col("vec_b"))
    dot = F.aggregate(
        F.zip_with("emb_a", "emb_b", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(c, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    cos = dot / (norm(F.col("emb_a")) * norm(F.col("emb_b")))
    return (
        j.withColumn("cos", cos)
        .where(F.col("cos") >= COSINE_DUP_THRESHOLD)
        .select(
            F.col("vec_a").cast("bigint").alias("vec_a"),
            F.col("vec_b").cast("bigint").alias("vec_b"),
        )
        .orderBy("vec_a", "vec_b")
    )


EMBEDDING_COSINE_SQL = f"""
SELECT a.vec_id::BIGINT AS vec_a, b.vec_id::BIGINT AS vec_b
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
      >= {COSINE_DUP_THRESHOLD}
ORDER BY vec_a, vec_b
"""

ORACLES = {
    "dedup_exact": EXACT_DEDUP_SQL,
    "dedup_ngram_jaccard": NGRAM_JACCARD_SQL,
    "dedup_jaccard_lsh_verified": JACCARD_LSH_VERIFIED_SQL,
    "dedup_minhash_lsh": MINHASH_SQL,
    "dedup_simhash": SIMHASH_SQL,
    "dedup_embedding_cosine": EMBEDDING_COSINE_SQL,
}

QUERIES = {
    "dedup_exact": exact_dedup,
    "dedup_ngram_jaccard": ngram_jaccard_pairs,
    "dedup_jaccard_lsh_verified": jaccard_lsh_verified,
    "dedup_minhash_lsh": minhash_lsh_pairs,
    "dedup_simhash": simhash,
    "dedup_embedding_cosine": embedding_cosine_pairs,
}


PREFIX_LEN = 40


def prefix_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate/prefix dedup: documents sharing the same normalized
    40-char prefix (the cheap first-pass dedup used before shingling in
    production pipelines)."""
    d = _docs(spark, sf_dir)
    p = d.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.substring(F.lower(F.trim("text")), 1, PREFIX_LEN).alias("prefix"),
    )
    return (
        p.groupBy("prefix")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("keep_doc_id"),
        )
        .where(F.col("n_docs") > 1)
        .orderBy("prefix")
    )


PREFIX_DEDUP_SQL = f"""
WITH p AS (
  SELECT doc_id::BIGINT AS doc_id,
         substr(lower(trim(text)), 1, {PREFIX_LEN}) AS prefix
  FROM documents
)
SELECT prefix, count(*)::BIGINT AS n_docs, min(doc_id)::BIGINT AS keep_doc_id
FROM p GROUP BY prefix HAVING count(*) > 1 ORDER BY prefix
"""

ORACLES["dedup_prefix"] = PREFIX_DEDUP_SQL
QUERIES["dedup_prefix"] = prefix_dedup

# ---------------------------------------------------------------------------
# Duplicated-substring detection (character-shingle dedup)
# ---------------------------------------------------------------------------

SHINGLE_K = 40  # shingle (substring) length in characters
SHINGLE_STRIDE = 10  # stride between shingle starts
SHINGLE_HOT_DF = 50  # drop shingles shared by more docs (boilerplate cap)


def substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents sharing a duplicated 40-char substring (the training-data
    substring-dedup shape of Lee et al., "Deduplicating Training Data Makes
    Language Models Better"): stride-10 character shingles, md5-hashed to a
    fixed-width join key, df-capped to drop boilerplate, pairs counted by
    number of shared shingles.

    Scale posture: shingling is a JVM-side explode (rows × len/stride, no
    Python); the pair join runs ONLY over shingles with document frequency
    in [2, SHINGLE_HOT_DF], so per-key fanout is bounded — the standard
    suffix-free approximation of substring dedup for a 100 TB corpus where
    a true suffix array is impractical. Keys are 32-char md5, not raw
    grams (fixed-width shuffle keys, RUNBOOK §5)."""
    d = _docs(spark, sf_dir).where(F.length("text") >= SHINGLE_K)
    sh = (
        d.select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.col("text"),
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.floor(
                        (F.length("text") - F.lit(SHINGLE_K)) / F.lit(SHINGLE_STRIDE)
                    ).cast("int"),
                )
            ).alias("i"),
        )
        .select(
            "doc_id",
            F.md5(
                F.expr(
                    f"substring(text, CAST(i * {SHINGLE_STRIDE} + 1 AS INT),"
                    f" {SHINGLE_K})"
                )
            ).alias("gram_h"),
        )
        .distinct()
    )
    hot = (
        sh.groupBy("gram_h")
        .agg(F.count(F.lit(1)).alias("df"))
        .where((F.col("df") >= 2) & (F.col("df") <= SHINGLE_HOT_DF))
        .select("gram_h")
    )
    a = sh.join(hot, "gram_h").alias("a")
    b = sh.join(hot, "gram_h").alias("b")
    return (
        a.join(b, "gram_h")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared_grams"))
        .orderBy("doc_a", "doc_b")
    )


SUBSTRING_DEDUP_SQL = f"""
WITH sh AS (
  SELECT DISTINCT doc_id::BIGINT AS doc_id,
         md5(substr(text, (i * {SHINGLE_STRIDE} + 1)::INT, {SHINGLE_K})) AS gram_h
  FROM (SELECT doc_id, text,
               unnest(range(0, (length(text) - {SHINGLE_K}) // {SHINGLE_STRIDE} + 1)) AS i
        FROM documents WHERE length(text) >= {SHINGLE_K})
), hot AS (
  SELECT gram_h FROM sh GROUP BY gram_h
  HAVING count(*) BETWEEN 2 AND {SHINGLE_HOT_DF}
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS shared_grams
FROM sh a JOIN hot USING (gram_h) JOIN sh b USING (gram_h)
WHERE a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
ORDER BY doc_a, doc_b
"""

ORACLES["dedup_substring"] = SUBSTRING_DEDUP_SQL
QUERIES["dedup_substring"] = substring_dedup
