"""Driver-gated KG-pipeline queries: put the actual engine stages under the
DuckDB value-hash oracle (not just pytest).

Each query runs a REAL pipeline stage over testdata-derived inputs whose
ground truth is independently expressible in ANSI SQL:

- kg_cells_extract   : embedded-CSV extraction (mapInPandas CSV sniffing) vs
                       the cell grid DuckDB derives directly from nation/region
- kg_lookup_exact    : the lookup stage (blocking join + scoring + top-K) on
                       the synthesized label index vs the exact-match mapping
- kg_flagship_triples: the ENTIRE pipeline (extract → preprocess → lookup →
                       4-pass annotation → canonicalized triples) vs the
                       customer→nation / nation→region facts the tables encode
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..flagship import run_flagship, synth_kg, synth_source
from ..sources.embedded_tables import extract_cells
from . import lookup as lk


def cells_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extraction stage over the synthesized nations CSV: the engine builds
    the CSV string and parses it back; the oracle states the expected grid."""
    src = synth_source(spark, sf_dir, include_orders=False).where(
        F.col("path") == "data/nations.csv"
    )
    return (
        extract_cells(src)
        .select(
            F.col("row_idx").cast("bigint").alias("row_idx"),
            F.col("col_idx").cast("bigint").alias("col_idx"),
            "cell",
        )
        .orderBy("row_idx", "col_idx")
    )


CELLS_EXTRACT_SQL = """
WITH ranked AS (
  SELECT n_name, r_name,
         row_number() OVER (ORDER BY n_nationkey) AS rn
  FROM nation JOIN region ON n_regionkey = r_regionkey
)
SELECT 0::BIGINT AS row_idx, 0::BIGINT AS col_idx, 'nation' AS cell
UNION ALL SELECT 0::BIGINT, 1::BIGINT, 'region'
UNION ALL SELECT rn::BIGINT, 0::BIGINT, n_name FROM ranked
UNION ALL SELECT rn::BIGINT, 1::BIGINT, r_name FROM ranked
ORDER BY row_idx, col_idx
"""


def lookup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The real lookup scoring path (exact-norm blocking, fuzzy UDF, adaptive
    threshold, origin/PR/lexical scoring, top-K window) over customer-name
    mentions vs the synthesized label index. Ground truth: the identity
    mapping (each customer name resolves to its own entity)."""
    labels, _, _ = synth_kg(spark, sf_dir)
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    mentions = cust.select(F.lower(F.trim("c_name")).alias("mention_norm")).distinct()
    pairs = lk.candidate_pairs(mentions, labels, max_gram_df=0)
    scored = lk.score_candidates(pairs, lk.token_idf(labels), k=1)
    w = Window.partitionBy("mention_norm").orderBy(F.desc("score"), F.asc("entity"))
    return (
        scored.withColumn("r", F.row_number().over(w))
        .where(F.col("r") == 1)
        .select("mention_norm", "entity")
        .orderBy("mention_norm")
    )


LOOKUP_EXACT_SQL = """
SELECT DISTINCT lower(trim(c_name)) AS mention_norm,
       'Q' || (c_custkey + 3000000)::VARCHAR AS entity
FROM customer
ORDER BY mention_norm
"""


def flagship_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END: the full KG-construction pipeline on the customer/nation
    tables; output = distinct entity triples. Ground truth: the relational
    facts the synthesized tables encode (customer −P27→ nation from the
    customer tables; nation −P361/P17/(-)-free ties→ region handled by the
    P361 fixture edge)."""
    t = run_flagship(spark, sf_dir, include_orders=False, k=3)
    return (
        t.where(F.col("obj_kind") == "entity")
        .select("subj", "pred", "obj")
        .distinct()
        .orderBy("subj", "pred", "obj")
    )


FLAGSHIP_TRIPLES_SQL = """
SELECT DISTINCT 'Q' || (c_custkey + 3000000)::VARCHAR AS subj,
       'P27' AS pred,
       'Q' || (c_nationkey + 10000)::VARCHAR AS obj
FROM customer
UNION
SELECT DISTINCT 'Q' || (n_nationkey + 10000)::VARCHAR,
       'P361',
       'Q' || (n_regionkey + 20000)::VARCHAR
FROM nation
ORDER BY 1, 2, 3
"""

ORACLES = {
    "kg_cells_extract": CELLS_EXTRACT_SQL,
    "kg_lookup_exact": LOOKUP_EXACT_SQL,
    "kg_flagship_triples": FLAGSHIP_TRIPLES_SQL,
}

QUERIES = {
    "kg_cells_extract": cells_extract,
    "kg_lookup_exact": lookup_exact,
    "kg_flagship_triples": flagship_triples,
}
