"""Stage 3 — candidates: fuzzy entity lookup as a blocked join.

Replaces the reference's Elasticsearch round-trips
(/root/reference/lookup/es_lookup.py:27-217) with a candidate-pair-generation
join between the distinct mention set and ``kg_labels``:

1. **Column classification** (C1/C2, annotation_models.py:159-225): entity vs
   literal columns from preprocessing aggregates.
2. **Mention dedupe** (L8, annotation_models.py:242-247): DISTINCT normalized
   mentions — each distinct string is scored once globally.
3. **Blocking join** (replaces ES fuzziness=AUTO retrieval, L3): char-trigram
   keys on both sides (JVM-side `transform`+`explode`, no UDF) unioned with an
   exact-norm fast path; label-side hot grams (df > max_gram_df) are dropped —
   the exact path keeps head surface forms reachable, so hub labels like
   "USA" cannot explode the gram join (explicit skew control; AQE skew-join
   splitting handles residual imbalance).
4. **Length band** (es_lookup.py:207-210): 0.25·len ≤ label_len ≤ 4·len.
5. **Fuzzy re-score** (L5, es_lookup.py:123-174): Arrow pandas UDF over the
   surviving pairs (mixed indel/token_sort/token_set + partial-exact bypass).
6. **Adaptive threshold** (L6): fuzzy ≥ max(0.70, best−0.25) per mention.
7. **Final score** (L7): 0.7·fuzzy·origin + 0.1·PR-term + 0.2·lexical. The ES
   BM25 component is replaced by a deterministic IDF-weighted token-overlap
   score (documented deviation; SURVEY §2.4 L7).
8. **Top-K per mention** (K=20) via window.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..session import bcast, ckpt as _sckpt

from ..functions.similarity import fuzzy_pexact_batch

FUZZY_FACTOR = 0.7          # 1 - PR_FACTOR - LEX_FACTOR (settings.py:41,49)
PR_FACTOR = 0.1
LEX_FACTOR = 0.2
ORIGIN_WEIGHTS = {"LABEL": 1.0, "MAIN_ALIAS": 0.94, "SUB_ALIAS": 0.88}
MIN_FUZZY = 0.70            # settings.py:29
ADAPTIVE_MARGIN = 0.25      # settings.py:30
DEFAULT_K = 20

CONCEPTY = ("UNKNOWN", "PERSON", "ORG", "GPE", "LOC", "EVENT", "FAC", "NORP",
            "LAW", "PRODUCT", "WORK_OF_ART", "LANGUAGE")
DATE_TYPES = ("DATE", "TIME")
NUM_NOUNIT = ("CARDINAL", "PERCENT", "RANGE")
NUM_UNIT = ("DISTANCE", "MASS", "MONEY", "DURATION", "SPEED", "TEMPERATURE",
            "FREQUENCY", "DATA", "POWER", "VOLTAGE", "CURRENT", "AREA",
            "VOLUME")


# ------------------------------------------------------------ column classes
def classify_columns(column_meta: DataFrame, body: DataFrame) -> DataFrame:
    """C1/C2 → (table_id, col_idx, col_class) with col_class ∈
    {entity, date, numeral_unit, numeral, textual, index}.

    Entity columns: concept-typed score>0.5, <50% long cells (>150 chars),
    <50% cells with >3 distinct punctuation marks (annotation_models.py:159-187).
    """
    stats = body.groupBy("table_id", "col_idx").agg(
        F.avg((F.length("cell") > 150).cast("double")).alias("long_ratio"),
        F.avg(
            (
                F.size(
                    F.array_distinct(
                        F.split(F.regexp_replace("cell", r"[\w\s]", ""), "")
                    )
                )
                > 3
            ).cast("double")
        ).alias("punct_ratio"),
    )
    m = column_meta.join(stats, ["table_id", "col_idx"], "left").fillna(
        {"long_ratio": 0.0, "punct_ratio": 0.0}
    )
    is_index = (F.col("col_type") == "ORDINAL") & (F.col("col_idx") == 0)
    is_entity = (
        F.col("col_type").isin(list(CONCEPTY))
        & (F.col("col_type_score") > 0.5)
        & (F.col("long_ratio") < 0.5)
        & (F.col("punct_ratio") < 0.5)
    )
    cls = (
        F.when(is_index, "index")
        .when(is_entity, "entity")
        .when(F.col("col_type").isin(list(DATE_TYPES)) & (F.col("col_type_score") > 0.5), "date")
        .when(F.col("col_type").isin(list(NUM_UNIT)) & (F.col("col_type_score") > 0.5), "numeral_unit")
        .when(F.col("col_type").isin(list(NUM_NOUNIT)) & (F.col("col_type_score") > 0.5), "numeral")
        .otherwise("textual")
    )
    return m.select("table_id", "col_idx", cls.alias("col_class"))


# ------------------------------------------------------------ mentions
def norm_col(c):
    """es_lookup.py:202-204 normalization, JVM-side."""
    return F.lower(F.trim(F.regexp_replace(F.regexp_replace(c, '"', " "), r"\s+", " ")))


def extract_mentions(body: DataFrame, col_classes: DataFrame) -> DataFrame:
    """Cells of entity columns → (table_id, row_idx, col_idx, mention_norm);
    mentions of length ≤1 dropped (annotation_models.py:242-247)."""
    ent = col_classes.where(F.col("col_class") == "entity")
    return (
        body.join(ent, ["table_id", "col_idx"])
        .withColumn("mention_norm", norm_col(F.col("cell")))
        .where(F.length("mention_norm") > 1)
        .select("table_id", "row_idx", "col_idx", "cell", "mention_norm")
    )


# ------------------------------------------------------------ blocking
def _grams(col, n: int = 3):
    """Char n-gram array, JVM-side; short strings fall back to the whole
    string as a single key."""
    return F.when(
        F.length(col) < n, F.array(col)
    ).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.length(col) - n + 1),
                lambda i: col.substr(i, F.lit(n)),
            )
        )
    )


def _fuzzy_pexact_udf():
    """ONE Arrow pass computing (fuzzy, pexact) fused, batch-vectorized —
    ``fuzzy_pexact_batch`` runs the bit-parallel LCS as NumPy uint64 lane
    math over the whole Arrow batch for the dominant single-token-ASCII
    shape (bit-equal to the scalar kernel, which still handles multi-token/
    long/non-ASCII rows), and a single struct UDF halves the Arrow
    serialization vs two UDFs."""

    @F.pandas_udf("fuzzy double, pexact boolean")
    def fp(mention: pd.Series, label: pd.Series) -> pd.DataFrame:
        fuzzies, pexacts = fuzzy_pexact_batch(
            mention.to_numpy(), label.to_numpy(), MIN_FUZZY
        )
        return pd.DataFrame({"fuzzy": fuzzies, "pexact": pexacts})

    return fp


def token_idf(labels: DataFrame) -> DataFrame:
    """(token, idf) from kg_labels — the deterministic BM25 stand-in corpus
    statistic. Computed once per KG build, broadcast at use."""
    toks = labels.select(
        F.explode(F.split(F.col("label_norm"), r"\s+")).alias("token")
    ).where(F.length("token") > 0)
    n_docs = labels.count()
    return toks.groupBy("token").agg(
        F.log2(F.lit(float(n_docs + 1)) / (F.count(F.lit(1)) + 1)).alias("idf")
    )


def candidate_pairs(
    mentions_distinct: DataFrame,
    labels: DataFrame,
    max_gram_df: int | None = None,
    multi_resolution: bool = False,
    max_candidates_per_mention: int | None = None,
) -> DataFrame:
    """Blocked candidate pairs (mention_norm × entity/label rows), deduped.

    Two paths unioned: exact label_norm equality (covers hot labels even when
    their grams are dropped) and n-gram-key equality with the length band.

    ``multi_resolution`` adds a 6-gram blocking tier alongside the trigrams
    (both under the same label-side df cap). Rationale: the df cap is the
    skew control, but a mention whose EVERY trigram is hot (dense ID-like
    strings — "customer#000000001" corpora) would lose all blocking keys;
    longer grams are exponentially rarer, so the 6-gram tier restores recall
    for exactly those mentions while staying inside the cap. This is the
    standard multi-resolution blocking ladder for skewed surface-form
    corpora at scale.
    """
    m = mentions_distinct.select("mention_norm").distinct()

    # Dictionary-encode label rows (guide §8: shuffle a lightweight proxy,
    # attach the payload once): the shared-key count, top-N window and pair
    # dedupe below used to group/sort/shuffle the FULL 8-column string tuple
    # three times (measured 13 of the 15 s of this stage at sf0.1) — now
    # every heavy exchange carries (mention_norm, _lid) and the label
    # attributes are joined back exactly once onto the pruned pair set.
    # _lid = rank over the full attribute tuple, so the top-N tie-break
    # below (_lid asc) refines the previous (entity, label_norm) order
    # deterministically. The single-task ordering window is bounded by the
    # label-index size (same posture as the pipeline's table_id dictionary);
    # the lazy checkpoint pins one id assignment for all consumers.
    lbl = _sckpt(
        labels.select("entity", "label", "label_norm", "length", "origin", "pr")
        .distinct()
        .withColumn(
            "_lid",
            F.row_number().over(
                Window.orderBy(
                    "entity", "label_norm", "origin", "label", "length", "pr"
                )
            ),
        )
    )
    lbl_n = lbl.select("_lid", "label_norm", "length")

    exact = m.join(lbl_n, m["mention_norm"] == lbl_n["label_norm"]).select(
        "mention_norm", "_lid"
    )

    sizes = [3, 6] if multi_resolution else [3]
    grammed_parts = []
    for n in sizes:
        # per-tier df budget: 6-grams are exponentially rarer than trigrams,
        # so the longer tier can afford a 16× larger cap — that is what lets
        # it catch mentions whose trigrams are ALL hot without re-admitting
        # the trigram skew
        cap = None if max_gram_df is None else max_gram_df * (16 if n == 6 else 1)
        mg = m.select(
            "mention_norm",
            F.explode(_grams(F.col("mention_norm"), n=n)).alias("gram"),
        )
        lg = lbl_n.select(
            "_lid", "length",
            F.explode(_grams(F.col("label_norm"), n=n)).alias("gram"),
        )
        if cap is not None:
            hot = (
                lg.groupBy("gram")
                .count()
                .where(F.col("count") > cap)
                .select("gram")
            )
            lg = lg.join(bcast(hot), "gram", "left_anti")
        grammed_parts.append(
            mg.join(lg, "gram")
            .where(
                (F.col("length") >= 0.25 * F.length("mention_norm"))
                & (F.col("length") <= 4 * F.length("mention_norm"))
            )
            .select("mention_norm", "_lid")
        )
    grammed = grammed_parts[0]
    for part in grammed_parts[1:]:
        grammed = grammed.unionByName(part)
    if max_candidates_per_mention is not None:
        # count-based candidate pruning (PPJoin-style): rank labels per
        # mention by how many blocking keys they share — JVM-side — and keep
        # the top N BEFORE the Python fuzzy kernel sees a single pair. The
        # true match shares the most keys by construction; junk candidates
        # admitted through one mid-frequency gram drop out here instead of
        # burning UDF time. Exact-path hits are never pruned.
        # One upfront exchange on mention_norm serves BOTH the count groupBy
        # (clustering on a key subset is satisfied) and the ranking window —
        # previously each ran its own full-width exchange.
        counted = (
            grammed.repartition("mention_norm")
            .groupBy("mention_norm", "_lid")
            .agg(F.count(F.lit(1)).alias("_shared"))
        )
        w = Window.partitionBy("mention_norm").orderBy(
            F.desc("_shared"), F.asc("_lid")
        )
        grammed = (
            counted.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") <= max_candidates_per_mention)
            .select("mention_norm", "_lid")
        )
    ids = exact.unionByName(grammed).distinct()
    return ids.join(bcast(lbl), "_lid").select(
        "mention_norm",
        F.length("mention_norm").alias("m_len"),
        "entity", "label", "label_norm", "length", "origin", "pr",
    )


def score_candidates(
    pairs: DataFrame,
    idf: DataFrame,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Fuzzy re-score → adaptive threshold → origin factor → per-entity max →
    final L7 score → top-K. Returns (mention_norm, entity, best_label, score).

    The UDF-scored pair set feeds four downstream branches (threshold window,
    lexical join, per-entity max, final window) — materialize it once so the
    blocking join + Python scoring don't recompute per branch."""
    fp = _fuzzy_pexact_udf()

    # the reference multiplies the origin factor in BEFORE the adaptive
    # threshold (es_lookup.py:156-187: ratio *= factor, then max_ratio and
    # ratio_threshold are computed over the factored ratios) — so both the
    # per-mention best and the filter operate on fuzzy_w, not raw fuzzy.
    origin_w = (
        F.when(F.col("origin") == "MAIN_ALIAS", ORIGIN_WEIGHTS["MAIN_ALIAS"])
        .when(F.col("origin") == "SUB_ALIAS", ORIGIN_WEIGHTS["SUB_ALIAS"])
        .otherwise(ORIGIN_WEIGHTS["LABEL"])
    )
    # the Python fuzzy kernel is the one genuinely CPU-bound stage in lookup:
    # spread it over every core regardless of the (input-sized) global
    # shuffle-partition setting — the blocking join can emit 100-1000× more
    # pairs than it has input rows. Partitioning BY mention_norm also feeds
    # the adaptive-threshold window below without another exchange.
    par = pairs.sparkSession.sparkContext.defaultParallelism * 2
    scored = (
        pairs.repartition(par, "mention_norm")
        .withColumn("_fp", fp("mention_norm", "label_norm"))
        .withColumn("fuzzy", F.col("_fp.fuzzy"))
        .withColumn("pexact", F.col("_fp.pexact"))
        .drop("_fp")
        .withColumn("fuzzy_w", F.col("fuzzy") * origin_w)
        # pruned to what the downstream branches read (origin is folded into
        # fuzzy_w; m_len/length/raw fuzzy die here) — every retained column
        # is serialized into the checkpoint blocks at pair scale
        .select(
            "mention_norm", "entity", "label", "label_norm", "pr",
            "pexact", "fuzzy_w",
        )
        # lazy: truncate the plan under the UDF without a blocking job; the
        # four downstream branches share the one checkpointed RDD. The
        # checkpoint preserves the mention_norm partitioning, which the
        # threshold window, per-entity aggregate and final windows below all
        # reuse — zero further exchanges of the pair-scale frame.
        .transform(_sckpt)
    )

    w_mention = Window.partitionBy("mention_norm")
    scored = scored.withColumn("max_fuzzy", F.max("fuzzy_w").over(w_mention)).where(
        (
            F.col("fuzzy_w")
            >= F.greatest(F.lit(MIN_FUZZY), F.col("max_fuzzy") - ADAPTIVE_MARGIN)
        )
        | F.col("pexact")
    )

    # lexical (BM25 stand-in): IDF-weighted token overlap, per-mention max-normalized
    m_tok = scored.select("mention_norm", "entity", "label_norm").withColumn(
        "token", F.explode(F.split("label_norm", r"\s+"))
    )
    mention_tok = m_tok.withColumn(
        "m_tokens", F.split("mention_norm", r"\s+")
    ).where(F.array_contains(F.col("m_tokens"), F.col("token")))
    lex = (
        mention_tok.join(bcast(idf), "token", "left")
        .fillna({"idf": 0.0})
        .groupBy("mention_norm", "entity", "label_norm")
        .agg(F.sum("idf").alias("lex_raw"))
    )
    # size-gated broadcast: lex is bounded by pairs with ≥1 overlapping
    # token (tiny on real corpora), and a sort-merge join here would
    # re-partition the pair-scale frame by (mention, entity, label_norm),
    # breaking the mention_norm partitioning chain that the aggregate and
    # windows below reuse (large posture: AQE picks the strategy)
    scored = scored.join(
        bcast(lex), ["mention_norm", "entity", "label_norm"], "left"
    ).fillna({"lex_raw": 0.0})

    # per-entity max over its labels (es_lookup.py:148-152): keep best label
    per_entity = scored.groupBy("mention_norm", "entity").agg(
        F.max(F.struct("fuzzy_w", "lex_raw", "pr", "label")).alias("best")
    ).select(
        "mention_norm",
        "entity",
        F.col("best.fuzzy_w").alias("fuzzy_w"),
        F.col("best.lex_raw").alias("lex_raw"),
        F.col("best.pr").alias("pr"),
        F.col("best.label").alias("best_label"),
    )

    w = Window.partitionBy("mention_norm")
    final = (
        per_entity.withColumn("max_pr", F.max("pr").over(w))
        .withColumn("max_lex", F.max("lex_raw").over(w))
        .withColumn(
            "score",
            FUZZY_FACTOR * F.col("fuzzy_w")
            + PR_FACTOR
            * F.log2(F.col("pr") + 1.0)
            / F.log2(F.greatest(F.col("max_pr"), F.lit(1e-9)) + 1.0)
            + LEX_FACTOR
            * F.when(F.col("max_lex") > 0, F.col("lex_raw") / F.col("max_lex")).otherwise(0.0),
        )
    )
    w_rank = Window.partitionBy("mention_norm").orderBy(
        F.desc("score"), F.asc("entity")
    )
    return (
        final.withColumn("rank", F.row_number().over(w_rank))
        .where(F.col("rank") <= k)
        .select("mention_norm", "entity", "best_label", "score")
    )


def lookup(
    body: DataFrame,
    col_classes: DataFrame,
    labels: DataFrame,
    idf: DataFrame,
    k: int = DEFAULT_K,
    max_gram_df: int | None = None,
    min_coverage: float = 0.3,
    multi_resolution: bool = False,
    max_candidates_per_mention: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Full stage: returns (candidates, kept_entity_cols).

    candidates: (table_id, row_idx, col_idx, mention_norm, entity, best_label,
    score) — per-cell candidate set after the coverage demotion rule
    (annotation_models.py:261-277; we apply it uniformly, NOT replicating the
    reference's iterator-skip bug — documented deviation, SURVEY §3.1.d).
    """
    from .skew import salted_join

    mentions = extract_mentions(body, col_classes).transform(_sckpt)
    distinct_mentions = mentions.select("mention_norm").distinct()
    pairs = candidate_pairs(
        distinct_mentions, labels, max_gram_df=max_gram_df,
        multi_resolution=multi_resolution,
        max_candidates_per_mention=max_candidates_per_mention,
    )
    cand = score_candidates(pairs, idf, k=k).transform(_sckpt)

    # coverage per entity column: fraction of the column's data ROWS whose
    # cell has ≥1 candidate — the reference computes col_coverage per row over
    # ALL rows of the column, including short/empty cells that never reached
    # lookup (annotation_models.py:262-277), so a column dominated by one hot
    # covered mention stays entity-classed even when its distinct-mention
    # coverage would be low. Whether a cell is covered depends only on its
    # DISTINCT normalized mention, so coverage is computed from the tiny
    # covered-mention set (broadcast semi join) — the cells × candidates
    # expansion below runs only for the columns that survive the gate.
    ent = col_classes.where(F.col("col_class") == "entity").select(
        "table_id", "col_idx"
    )
    total_rows = (
        body.join(ent, ["table_id", "col_idx"])
        .groupBy("table_id", "col_idx")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    covered = cand.select("mention_norm").distinct()
    cov_rows = (
        mentions.join(bcast(covered), "mention_norm", "left_semi")
        .select("table_id", "col_idx", "row_idx")
        .distinct()
        .groupBy("table_id", "col_idx")
        .agg(F.count(F.lit(1)).alias("n_cov"))
    )
    cov = (
        total_rows.join(cov_rows, ["table_id", "col_idx"], "left")
        .fillna({"n_cov": 0})
        .select(
            "table_id", "col_idx",
            (F.col("n_cov") / F.col("n_rows")).alias("coverage"),
        )
    )
    kept = cov.where(F.col("coverage") >= min_coverage).select(
        "table_id", "col_idx", "coverage"
    )

    # head surface forms ("USA") appear in millions of cells but have ≤K
    # candidates — the classic hot probe key. Salt it explicitly.
    kept_mentions = mentions.join(
        bcast(kept.select("table_id", "col_idx")), ["table_id", "col_idx"]
    )
    candidates = salted_join(kept_mentions, cand, ["mention_norm"]).select(
        "table_id", "row_idx", "col_idx", "cell", "mention_norm", "entity",
        "best_label", "score",
    )
    return candidates, kept
