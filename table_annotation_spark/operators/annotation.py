"""Stage 4 — annotate: CEA / CTA / CPA via the reference's exactly-4-pass
dataflow, expressed entirely as DataFrame transformations.

Pass structure (mirrors /root/reference/annotation/table_annotation.py:51-112):

  pass 1: entity_scores¹ = 0.1·sim (context weights not yet known)
          CEA¹ (all candidates) → CPA¹ (voting, all pairs)
  pass 2: soft re-weighting (C10) + entity_scores² (CPA-scaled context)
          CEA² (all) → CTA² (all)
  pass 3: CEA³ (only_one, CTA²-boosted) → CTA³ (only_one) → CPA³ (from CEA³)
  pass 4: literal-context restriction (C10 onlyLiteralContext) +
          entity_scores³ (last_step: contextless cells, potential candidates)
          CEA⁴ → CTA⁴ → CPA⁴ (all only_one)

Every reference memo-dict is a join; every voting counter is a groupBy; every
ranking is a window. Where the reference breaks ties by dict/stable-sort
order we add deterministic tie-breaks (entity/rel ascending) — documented
deviation, SURVEY §3.1.

Scale notes: all intermediates are keyed by (table_id, …) and the KG-side
inputs arrive pre-deduped from annotation_context (global distinct pairs /
entities). No driver-side loops; the 4 passes are a fixed-depth DAG,
checkpointable between passes.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..session import bcast

from . import annotation_context as ctx

SEMANTIC_W = 1.0   # annotation_models.py:110
LITERAL_W = 0.3    # annotation_models.py:111
CTA_LEVEL_W = {1: 1.0, 2: 0.7, 3: 0.2}  # annotation_models.py:151


# --------------------------------------------------------------------- inputs
@dataclass
class AnnotInputs:
    cand: DataFrame = None        # (table_id,row_idx,col_idx,cell,entity,sim)
    ecols: DataFrame = None       # (table_id,col_idx)
    lcols: DataFrame = None       # (table_id,col_idx,lit_class)
    tbl: DataFrame = None         # (table_id,n_cols,n_data_rows)
    ecol_pairs: DataFrame = None  # (table_id,head_col,tail_col) entity-entity, head<tail
    el_pairs: DataFrame = None    # (table_id,head_col,tail_col) entity-literal, tail>head
    row_pairs: DataFrame = None   # per-row candidate pairs with gated ctx scores
    pair_rel: DataFrame = None    # (head_ent,tail_ent,rel,prox) all co-occurring pairs
    cached_rel: DataFrame = None  # pair_rel restricted to reliably-connected pairs
    lit_cpa: DataFrame = None     # (entity,lit_cell,pid) literal CPA cache
    lit_cells: DataFrame = None   # (table_id,row_idx,lit_col,lit_cell)
    ctx_entries: DataFrame = None # (t,r,c,entity,ctx_col,ctx_kind,score)
    ctx_rels: DataFrame = None    # (t,r,c,entity,ctx_col,rel)
    types: DataFrame = None       # (entity,type,level,rank)
    super_t: DataFrame = None     # (type,supertype)
    ent_pids: DataFrame = None    # (entity,pid)
    edges: DataFrame = None


def _frame_inputs(body: DataFrame, col_classes: DataFrame) -> dict:
    """Column-pair / table-shape inputs derived from body + column classes
    alone (no candidates, no KG) — cheap enough to rebuild on resume."""
    ecols = col_classes.where(F.col("col_class") == "entity").select(
        "table_id", "col_idx"
    )
    lcols = col_classes.where(
        F.col("col_class").isin("date", "numeral_unit", "numeral", "textual")
    ).select("table_id", "col_idx", F.col("col_class").alias("lit_class"))

    e1 = ecols.select("table_id", F.col("col_idx").alias("head_col"))
    e2 = ecols.select("table_id", F.col("col_idx").alias("tail_col"))
    ecol_pairs = e1.join(e2, "table_id").where(F.col("head_col") < F.col("tail_col"))
    el_pairs = (
        ecols.select("table_id", F.col("col_idx").alias("head_col"))
        .join(lcols.select("table_id", F.col("col_idx").alias("tail_col")), "table_id")
        .where(F.col("tail_col") > F.col("head_col"))
    )
    tbl = body.groupBy("table_id").agg(
        (F.max("col_idx") + 1).alias("n_cols"),
        F.countDistinct("row_idx").alias("n_data_rows"),
    )
    lit_cells = (
        body.withColumnRenamed("cell", "lit_cell")
        .join(lcols.select("table_id", "col_idx"), ["table_id", "col_idx"])
        .select("table_id", "row_idx", F.col("col_idx").alias("lit_col"), "lit_cell")
    )
    return {
        "ecols": ecols, "lcols": lcols, "ecol_pairs": ecol_pairs,
        "el_pairs": el_pairs, "tbl": tbl, "lit_cells": lit_cells,
    }


def build_light_inputs(body: DataFrame, col_classes: DataFrame) -> AnnotInputs:
    """Just the inputs emit_triples() consumes (ecol_pairs, el_pairs,
    lit_cells) — used on resume when cea/cta/cpa are already checkpointed and
    annotate() is skipped entirely."""
    fr = _frame_inputs(body, col_classes)
    return AnnotInputs(
        ecols=fr["ecols"], lcols=fr["lcols"], tbl=fr["tbl"],
        ecol_pairs=fr["ecol_pairs"], el_pairs=fr["el_pairs"],
        lit_cells=fr["lit_cells"],
    )


def _localize(df: DataFrame) -> DataFrame:
    """Driver-localize a tiny dim frame under the small-corpus posture:
    collect it once and rebuild it as a LocalRelation. Every later broadcast
    of the frame then costs a no-job local copy instead of a re-evaluated
    plan + collect job — the per-table / per-column-pair dims are hinted into
    ~20 joins across the 4 passes, and each hint used to re-run the dim's
    aggregation inside serial broadcast evaluation (the main per-job driver
    latency term at bench scale). Gated on the same conf as ``bcast``: in the
    large-corpus posture these frames grow with the corpus (O(#tables) rows)
    and must stay distributed — AQE picks their join strategies there."""
    spark = df.sparkSession
    try:
        if spark.conf.get("spark.graft.forcedBroadcast", "true") == "false":
            return df
    except Exception:
        pass
    return spark.createDataFrame(df.collect(), schema=df.schema)


def build_inputs(
    cand: DataFrame,
    body: DataFrame,
    col_classes: DataFrame,
    edges: DataFrame,
    degrees: DataFrame,
    multihop: bool = True,
    timings: dict | None = None,
) -> AnnotInputs:
    """Assemble all pass-invariant inputs (the scale-heavy KG joins)."""
    # ONE upfront exchange on table_id: every annotation-side join, groupBy
    # and window clusters on (table_id, ...), and HashPartitioning(table_id)
    # satisfies clustering on any superset of keys — so this single shuffle
    # replaces the per-operator exchanges across all four passes (the small
    # dims that join in are explicitly broadcast below; lazily-checkpointed
    # frames carry no stats, so auto-broadcast never fires with AQE off).
    import time as _t

    _marks: list[tuple[str, float]] = [("start", _t.time())]

    def _mark(label: str) -> None:
        _marks.append((label, _t.time()))

    cand = cand.select(
        "table_id", "row_idx", "col_idx", "cell", "entity",
        F.col("score").alias("sim"),
    ).repartition("table_id")
    fr = _frame_inputs(body, col_classes)
    lit_cells = fr["lit_cells"]
    ecols, lcols = _localize(fr["ecols"]), _localize(fr["lcols"])
    ecol_pairs, el_pairs = _localize(fr["ecol_pairs"]), _localize(fr["el_pairs"])
    tbl = _localize(fr["tbl"])
    _mark("localize")

    # Construction is INTERLEAVED with wave forcing: Dataset.localCheckpoint
    # plans eagerly even with eager=False, and physical planning evaluates
    # any broadcast child on the spot — so a frame's plan must only be built
    # once every heavy frame its broadcasts read is already materialized,
    # else the broadcast evaluation recomputes that ancestor serially at
    # plan-construction time (measured: bcast(best) inside row_pairs used to
    # recompute pair_rel + rp_base before wave 2 ever ran). Wave membership
    # still honors the force_parallel independence contract.

    # wave 0: the shared ancestors. edges arrives as a LAZY checkpoint from
    # the pipeline — nothing has materialized it yet, so its readers can't
    # go in the same wave; rp_base (the per-row candidate pair frame, C6
    # domain) reads only the eager candidates checkpoint and localized dims,
    # so it rides along. rp_base is computed ONCE and shared by BOTH
    # consumers of the row-level self-join — the distinct co-occurring pair
    # set that seeds pair_rel, and row_pairs (previously each ran its own
    # h ⋈ t ⋈ ecol_pairs, the single most expensive join here, twice).
    h = cand.select(
        "table_id", "row_idx", F.col("col_idx").alias("head_col"),
        F.col("entity").alias("head_ent"), F.col("sim").alias("head_sim"),
        F.length("cell").alias("head_len"),
    )
    t = cand.select(
        "table_id", "row_idx", F.col("col_idx").alias("tail_col"),
        F.col("entity").alias("tail_ent"), F.col("sim").alias("tail_sim"),
        F.length("cell").alias("tail_len"),
    )
    rp_base = _mat(
        h.join(t, ["table_id", "row_idx"])
        .join(bcast(ecol_pairs), ["table_id", "head_col", "tail_col"])
        .where(F.col("head_ent") != F.col("tail_ent"))
    )
    _force_wave("w0_edges_rpbase", [edges, rp_base], timings)
    _mark("w0")

    # wave 1: KG-side inputs — all read the now-materialized edges (degrees
    # is DERIVED from the checkpointed edges; j_lit's unit-symbol broadcast
    # scans edges at plan time, after wave 0)
    degrees_w = degrees
    j_lit = _mat(ctx.literal_match_join(cand, body, col_classes, edges))
    ents = cand.select("entity").distinct()
    types = _mat(ctx.entity_types(ents, edges))
    # pass-4's potential-candidates rule is ent_pids' only consumer, but it
    # sits under a wide edges join+distinct — materialize it with the other
    # KG-side inputs instead of inside pass 4's s3/ctxless/potential wave
    ent_pids = _mat(ctx.entity_pids(ents, edges))
    _force_wave("w1_kg_side", [degrees_w, j_lit, types, ent_pids], timings)
    _mark("w1")

    super_t = ctx.supertypes(types, edges)

    # wave 2: pair relations over the distinct co-occurring pair set (its
    # degree-damping broadcast reads wave-1's degrees) ∥ the C7 match kernel
    # over wave-1's distinct literal value tuples
    pair_rel = _mat(
        ctx.pair_relations_for_pairs(
            rp_base.select("head_ent", "tail_ent").distinct(),
            edges, degrees, multihop,
        )
    )
    lit_keys = _mat(ctx.literal_match_keys(j_lit))
    _force_wave("w2_pair_rel", [pair_rel, lit_keys], timings)
    _mark("w2")

    # the rejoin is a broadcast-hash lookup over the cached row-scale domain
    lit_match = _mat(ctx.literal_matches_from(j_lit, lit_keys))
    lit_cpa = lit_match.select("entity", "lit_cell", "pid").distinct()

    # wave 3: per-row context gates (C6, annotation_models.py:536-556).
    # best/cached_pairs/pair_rel are bounded by the DISTINCT co-occurring
    # pair set (not by rows), so under the small-corpus posture they
    # broadcast and the 100×-larger row-level frames never re-shuffle.
    best = pair_rel.groupBy("head_ent", "tail_ent").agg(F.max("prox").alias("best_prox"))
    rp = rp_base.join(bcast(best), ["head_ent", "tail_ent"], "left")
    thr_tail = F.when(F.col("tail_len") > 5, 0.7).otherwise(0.9)
    thr_head = F.when(F.col("head_len") > 5, 0.7).otherwise(0.9)
    head_score = F.when(
        F.col("best_prox").isNotNull() & (F.col("tail_sim") >= thr_tail),
        F.greatest(F.lit(0.1), F.col("best_prox") * F.col("tail_sim")),
    ).otherwise(0.1)
    tail_score = F.when(
        F.col("best_prox").isNotNull() & (F.col("head_sim") >= thr_head),
        F.greatest(F.lit(0.1), F.col("best_prox") * F.col("head_sim")),
    ).otherwise(0.1)
    row_pairs = rp.withColumn("head_score", head_score).withColumn(
        "tail_score", tail_score
    ).withColumn(
        "reliable", (F.col("head_score") > 0.1) | (F.col("tail_score") > 0.1)
    )
    # head_len/tail_len/best_prox are consumed by the score expressions
    # above; dropping them before the checkpoint saves their bytes in the
    # biggest materialized frame of the engine (row-pair scale)
    row_pairs = _mat(row_pairs.drop("head_len", "tail_len", "best_prox"))
    _force_wave("w3_row_pairs", [row_pairs, lit_match], timings)
    _mark("w3")

    # wave 4: everything derived from row_pairs + lit_match + pair_rel
    cached_pairs = (
        row_pairs.where("reliable").select("head_ent", "tail_ent").distinct()
    )
    # materialized: cpa_task joins this in passes 1, 3 AND 4 — without the
    # checkpoint each pass re-runs the pair_rel ⋈ reliable-pairs join
    cached_rel = _mat(pair_rel.join(bcast(cached_pairs), ["head_ent", "tail_ent"]))

    # context entries: domain = candidate × other entity cols ∪ literal cols ≥ col
    dom_e = cand.join(
        ecols.withColumnRenamed("col_idx", "ctx_col"), "table_id"
    ).where(F.col("ctx_col") != F.col("col_idx"))
    head_side = row_pairs.select(
        "table_id", "row_idx", F.col("head_col").alias("col_idx"),
        F.col("head_ent").alias("entity"), F.col("tail_col").alias("ctx_col"),
        F.col("head_score").alias("s"),
    )
    tail_side = row_pairs.select(
        "table_id", "row_idx", F.col("tail_col").alias("col_idx"),
        F.col("tail_ent").alias("entity"), F.col("head_col").alias("ctx_col"),
        F.col("tail_score").alias("s"),
    )
    scores_e = (
        head_side.unionByName(tail_side)
        .groupBy("table_id", "row_idx", "col_idx", "entity", "ctx_col")
        .agg(F.max("s").alias("s"))
    )
    ctx_e = (
        dom_e.join(scores_e, ["table_id", "row_idx", "col_idx", "entity", "ctx_col"], "left")
        .select(
            "table_id", "row_idx", "col_idx", "entity", "ctx_col",
            F.lit("entity").alias("ctx_kind"),
            F.coalesce("s", F.lit(0.1)).alias("score"),
        )
    )
    dom_l = cand.join(
        lcols.select("table_id", F.col("col_idx").alias("ctx_col")), "table_id"
    ).where(F.col("ctx_col") >= F.col("col_idx"))
    scores_l = lit_match.groupBy(
        "table_id", "row_idx", "col_idx", "entity", F.col("lit_col").alias("ctx_col")
    ).agg(F.max("match_score").alias("s"))
    ctx_l = (
        dom_l.join(scores_l, ["table_id", "row_idx", "col_idx", "entity", "ctx_col"], "left")
        .select(
            "table_id", "row_idx", "col_idx", "entity", "ctx_col",
            F.lit("literal").alias("ctx_kind"),
            F.coalesce("s", F.lit(0.1)).alias("score"),
        )
    )
    ctx_entries = _mat(ctx_e.unionByName(ctx_l))

    # one reliable-pairs ⋈ pair_rel join, cached, feeding BOTH orientations
    # (previously computed twice — once per side)
    rp_rel = _mat(
        row_pairs.where("reliable")
        .join(bcast(pair_rel), ["head_ent", "tail_ent"])
        .select("table_id", "row_idx", "head_col", "tail_col",
                "head_ent", "tail_ent", "rel")
    )
    # ctx_rels carries the ORIENTED pair columns (head_col, tail_col) from
    # birth: they are pure functions of the entry geometry (ecol_pairs is
    # built head<tail, el_pairs head=entity col — so rels_h/rels_t inherit
    # row_pairs' orientation and a literal entry's head is its entity col),
    # which lets entity_scores_soft's scale-factor lookup join ctx_rels
    # straight against the broadcast CPA pair set instead of first joining
    # the row-scale weighted-entries frame on the 5-column entry key (a
    # big-big sort-merge join that ran once per soft-scoring pass).
    rels_h = rp_rel.select(
        "table_id", "row_idx", F.col("head_col").alias("col_idx"),
        F.col("head_ent").alias("entity"), F.col("tail_col").alias("ctx_col"),
        "rel", "head_col", "tail_col",
    )
    rels_t = rp_rel.select(
        "table_id", "row_idx", F.col("tail_col").alias("col_idx"),
        F.col("tail_ent").alias("entity"), F.col("head_col").alias("ctx_col"),
        "rel", "head_col", "tail_col",
    )
    rels_l = lit_match.select(
        "table_id", "row_idx", "col_idx", "entity",
        F.col("lit_col").alias("ctx_col"), F.col("pid").alias("rel"),
        F.col("col_idx").alias("head_col"), F.col("lit_col").alias("tail_col"),
    )
    ctx_rels = _mat(rels_h.unionByName(rels_t).unionByName(rels_l).distinct())
    _force_wave("w4_ctx", [ctx_entries, ctx_rels, cached_rel], timings)
    _mark("w4")

    if timings is not None:
        for (lbl, tm), (_, prev) in zip(_marks[1:], _marks[:-1]):
            timings[f"bi_seg_{lbl}"] = round(tm - prev, 2)

    return AnnotInputs(
        cand=cand, ecols=ecols, lcols=lcols, tbl=tbl,
        ecol_pairs=ecol_pairs, el_pairs=el_pairs, row_pairs=row_pairs,
        pair_rel=pair_rel, cached_rel=cached_rel, lit_cpa=lit_cpa,
        lit_cells=lit_cells, ctx_entries=ctx_entries, ctx_rels=ctx_rels,
        types=types, super_t=super_t, ent_pids=ent_pids, edges=edges,
    )


# --------------------------------------------------------------------- scores
def entity_scores_pass1(inp: AnnotInputs) -> DataFrame:
    """entity_scoring_task(first_step=True) BEFORE any CPA exists: with >1
    column the context loop contributes nothing (cpa_annot empty) →
    score = 0.1·sim; single-column tables → sim
    (annotation_models.py:782-798)."""
    return inp.cand.join(bcast(inp.tbl), "table_id").select(
        "table_id", "row_idx", "col_idx", "entity", "sim",
        F.when(F.col("n_cols") > 1, 0.1 * F.col("sim"))
        .otherwise(F.col("sim"))
        .alias("score"),
    )


def _orient_pairs(inp: AnnotInputs):
    """Column-pair orientation for a (candidate col c, context col o) entry:
    (o,c) when o<c and o is an entity col, else (c,o)
    (annotation_models.py:725-728)."""
    is_entity_ctx = F.col("ctx_kind") == "entity"
    head = F.when(is_entity_ctx & (F.col("ctx_col") < F.col("col_idx")), F.col("ctx_col")).otherwise(F.col("col_idx"))
    tail = F.when(is_entity_ctx & (F.col("ctx_col") < F.col("col_idx")), F.col("col_idx")).otherwise(F.col("ctx_col"))
    return head.alias("head_col"), tail.alias("tail_col")


def update_context_weights(inp: AnnotInputs, cpa: DataFrame) -> DataFrame:
    """C10 soft re-weighting (annotation_models.py:352-379): per ctx entry,
    weight = max(floor, base·coverage·proximity·df) from the TOP CPA of the
    oriented pair; floor 0.05 (entity ctx) / 0.01 (literal ctx). Returns
    ctx_entries + (head_col, tail_col, weight)."""
    hc, tc = _orient_pairs(inp)
    entries = inp.ctx_entries.select("*", hc, tc)
    top_cpa = cpa.where(F.col("rank") == 1).select(
        "table_id", "head_col", "tail_col",
        F.col("coverage").alias("cpa_cov"), F.col("prox").alias("cpa_prox"),
    )
    min_ecol = inp.ecols.groupBy("table_id").agg(F.min("col_idx").alias("min_ecol"))
    e = entries.join(bcast(top_cpa), ["table_id", "head_col", "tail_col"], "left").join(
        bcast(min_ecol), "table_id"
    )
    df_col = 1.0 / (
        1.0
        + 4.0
        * F.least(
            F.abs(F.col("ctx_col") - F.col("min_ecol")),
            F.abs(F.col("col_idx") - F.col("min_ecol")),
        )
    )
    base = F.when(F.col("ctx_kind") == "entity", SEMANTIC_W).otherwise(LITERAL_W)
    floor = F.when(F.col("ctx_kind") == "entity", 0.05).otherwise(0.01)
    weight = F.when(
        F.col("cpa_cov").isNotNull(),
        F.greatest(floor, base * F.col("cpa_cov") * F.col("cpa_prox") * df_col),
    ).otherwise(floor)
    # pruned to what the soft-scoring passes read: this frame is
    # ctx-entries-scale and checkpointed once for passes 2+4, so every
    # column it carries is serialized + shuffled at row scale twice
    return e.withColumn("weight", weight).select(
        "table_id", "row_idx", "col_idx", "entity", "ctx_col",
        "ctx_kind", "score", "head_col", "tail_col", "weight",
    )


def entity_scores_soft(
    inp: AnnotInputs,
    weighted_entries: DataFrame,
    cpa: DataFrame,
    unrelated_pairs: DataFrame | None = None,
    last_step: bool = False,
) -> tuple[DataFrame, DataFrame | None, DataFrame | None]:
    """entity_scoring_task(first_step=False) (annotation_models.py:714-798).

    Only ctx entries whose oriented pair IS in cpa_annot (and not unrelated)
    participate. scale = (coverage·proximity) of the lowest-ranked CPA of the
    pair whose id appears in the entry's relation set, else 0.
    scaled = max(0.1, scale·score); numerator Σ weight·scaled, denominator
    Σ base_weight; final = ctx̄·σ(sim) when max weight>0.1 else 0.1·sim.

    Returns (scores, contextless, potential, scored) — contextless/potential
    only when last_step (loop 4, annotation_models.py:743-765); scored is
    the materialized shared interior frame (last_step only) so the caller
    can force it in its own wave before the three consumers run."""
    e = weighted_entries
    if unrelated_pairs is not None:
        e = e.join(
            bcast(unrelated_pairs), ["table_id", "head_col", "tail_col"],
            "left_anti",
        )
    cpa_k = cpa.select(
        "table_id", "head_col", "tail_col", "rel", "coverage", "prox", "rank"
    )
    considered = e.join(
        bcast(cpa_k.select("table_id", "head_col", "tail_col").distinct()),
        ["table_id", "head_col", "tail_col"],
    )

    key = ["table_id", "row_idx", "col_idx", "entity", "ctx_col"]
    # scale factor: first (lowest-rank) CPA of the pair present in entry
    # rels. ctx_rels carries its oriented (head_col, tail_col) from build
    # time, so this is ONE broadcast-hash join against the tiny CPA set plus
    # a map-side-combinable agg — no row-scale join with `considered`. Keys
    # outside `considered` (pair not in cpa_k is already excluded by the
    # join; pass-4 unrelated pairs) drop out in the left join below: a key
    # pins its (head_col, tail_col), so an excluded pair's keys simply never
    # appear on the `considered` side.
    rel_match = (
        inp.ctx_rels.withColumnRenamed("rel", "ctx_rel")
        .join(bcast(cpa_k), ["table_id", "head_col", "tail_col"])
        .where(F.col("rel") == F.col("ctx_rel"))
        .groupBy(*key)
        .agg(F.min(F.struct("rank", "coverage", "prox")).alias("m"))
        .select(*key, (F.col("m.coverage") * F.col("m.prox")).alias("scale"))
    )
    scored = considered.join(rel_match, key, "left").withColumn(
        "scaled",
        F.greatest(F.lit(0.1), F.coalesce("scale", F.lit(0.0)) * F.col("score")),
    )
    if last_step:
        # three outputs (scores, contextless, potential) consume this frame;
        # without a checkpoint each one re-derives the whole considered ⋈
        # rel_match ⋈ cpa subtree in its own job (the scored subtree is the
        # dominant pass-4 cost — measured 3× recompute at replicate-4).
        # Pruned to the union of the three consumers' columns before the
        # checkpoint: score/scale/sim never leave this function.
        scored = _mat(scored.select(
            "table_id", "row_idx", "col_idx", "entity", "ctx_col",
            "ctx_kind", "head_col", "tail_col", "weight", "scaled",
        ))
    base = F.when(F.col("ctx_kind") == "entity", SEMANTIC_W).otherwise(LITERAL_W)
    agg = scored.groupBy("table_id", "row_idx", "col_idx", "entity").agg(
        F.sum(F.col("weight") * F.col("scaled")).alias("num"),
        F.sum(base).alias("den"),
        F.max("weight").alias("max_w"),
    )
    cand_key = ["table_id", "row_idx", "col_idx", "entity"]
    s = inp.cand.join(agg, cand_key, "left").join(bcast(inp.tbl), "table_id")
    ctx_score = F.when(
        F.col("den").isNotNull() & (F.col("den") > 0), F.col("num") / F.col("den")
    ).otherwise(0.01)
    logistic = 1.0 / (
        1.0 + F.exp(-(F.pow(F.col("sim"), 2.5) / 0.5 - 1.0) / 0.2)
    )
    final = F.when(F.col("n_cols") <= 1, F.col("sim")).when(
        F.coalesce("max_w", F.lit(0.0)) > 0.1, ctx_score * logistic
    ).otherwise(0.1 * F.col("sim"))
    scores = s.select(*cand_key, "sim", final.alias("score"))

    if not last_step:
        return scores, None, None, None

    # contextless cells: max scaled per CELL; cells with no considered entries → 0.1
    ctxless = (
        inp.cand.select("table_id", "row_idx", "col_idx")
        .distinct()
        .join(
            scored.groupBy("table_id", "row_idx", "col_idx").agg(
                F.max("scaled").alias("ctxless")
            ),
            ["table_id", "row_idx", "col_idx"],
            "left",
        )
        .fillna({"ctxless": 0.1})
    )

    # potential candidates: candidate has a (direction-adjusted) CPA pid in its
    # pid set (annotation_models.py:750-765); composite "::" ids never match.
    # Derived from the MATERIALIZED scored frame (same columns as considered
    # plus score fields) so this consumer shares the checkpoint too.
    cand_pairs = scored.select(
        *cand_key, "ctx_col", "ctx_kind", "head_col", "tail_col"
    ).distinct()
    pc = cand_pairs.join(bcast(cpa_k), ["table_id", "head_col", "tail_col"]).where(
        ~F.col("rel").contains("::")
    )
    is_tail = (F.col("ctx_kind") == "entity") & (F.col("ctx_col") < F.col("col_idx"))
    adjusted = F.when(
        is_tail & F.col("rel").startswith("(-)"), F.expr("substring(rel, 4)")
    ).when(is_tail, F.concat(F.lit("(-)"), F.col("rel"))).otherwise(F.col("rel"))
    pc = pc.withColumn("need_pid", adjusted)
    ep = bcast(inp.ent_pids)
    matched = pc.join(
        ep,
        (pc["entity"] == ep["entity"]) & (pc["need_pid"] == ep["pid"]),
    ).select(pc["table_id"], pc["row_idx"], pc["col_idx"], pc["entity"],
             "coverage", "rel")
    potential = matched.groupBy(*cand_key).agg(
        F.max("coverage").alias("cpa_coeff"),
        F.count(F.lit(1)).alias("n_potential"),
    )
    return scores, ctxless, potential, scored


# --------------------------------------------------------------------- CEA
def cea_task(
    inp: AnnotInputs,
    scores: DataFrame,
    cta: DataFrame | None = None,
    only_one: bool = True,
    contextless: DataFrame | None = None,
    potential: DataFrame | None = None,
) -> DataFrame:
    """C12 (annotation_models.py:904-1031). Returns per-cell kept candidates:
    (table_id,row_idx,col_idx,entity,score,rank)."""
    cand_key = ["table_id", "row_idx", "col_idx", "entity"]
    s = scores
    if cta is not None:
        # per (column, candidate): best level-weighted CTA match.
        # The whole disambiguation credit is ROW-INDEPENDENT — cta_score is
        # per (table, col, type) and the level weight per (entity, type) —
        # so it is computed at the (table_id, col_idx, entity) grain
        # (bounded by column × candidate-entity combinations, ~100× smaller
        # than the candidate frame) and broadcast back onto the row-scale
        # scores; the row-scale frame never shuffles for CTA credit.
        cta_c = cta.select(
            "table_id", F.col("col_idx"), F.col("type").alias("cta_type"),
            F.col("score").alias("cta_score"), F.col("coverage").alias("cta_cov"),
        )
        col_ent = s.select("table_id", "col_idx", "entity").distinct()
        cmatch = col_ent.join(bcast(cta_c), ["table_id", "col_idx"])
        # candidate's own 3-level types (entity-bounded side frames —
        # size-gated broadcasts; large posture: AQE decides)
        own = inp.types.select(
            F.col("entity"), F.col("type").alias("cta_type"),
            F.col("level").alias("own_level"),
        )
        direct = cmatch.join(bcast(own), ["entity", "cta_type"], "left")
        # neighbor credit: cta_type neighbors ∩ candidate level-1/2 types
        ce_key = ["table_id", "col_idx", "entity"]
        tn = ctx.type_neighbors(
            cta_c.select(F.col("cta_type").alias("type")), inp.edges
        ).select(F.col("type").alias("cta_type"), "neighbor")
        nb = (
            cmatch.join(bcast(tn), "cta_type")
            .join(
                bcast(inp.types.where(F.col("level").isin(1, 2)).select(
                    "entity", F.col("type").alias("neighbor"),
                    F.col("level").alias("nb_level"),
                )),
                ["entity", "neighbor"],
            )
            .groupBy(*ce_key, "cta_type")
            .agg(F.min("nb_level").alias("nb_level"))
        )
        j = direct.join(nb, ce_key + ["cta_type"], "left")
        eff_level = (
            F.when(F.col("own_level") == 1, 1)
            .when((F.col("own_level") == 2) | (F.col("nb_level") == 1), 2)
            .when((F.col("own_level") == 3) | (F.col("nb_level") == 2), 3)
        )
        lvl_w = (
            F.when(eff_level == 1, CTA_LEVEL_W[1])
            .when(eff_level == 2, CTA_LEVEL_W[2])
            .when(eff_level == 3, CTA_LEVEL_W[3])
            .otherwise(F.lit(None))
        )
        disamb = j.withColumn("d", lvl_w * F.col("cta_score")).groupBy(*ce_key).agg(
            F.coalesce(F.max("d"), F.lit(0.0)).alias("cta_d")
        )
        cov_mean = cta_c.groupBy("table_id", "col_idx").agg(
            F.avg("cta_cov").alias("cov_mean")
        )
        s = (
            s.join(bcast(disamb), ce_key, "left")
            .join(bcast(cov_mean), ["table_id", "col_idx"], "left")
            .fillna({"cta_d": 0.0})
        )
        if contextless is not None:
            s = s.join(contextless, ["table_id", "row_idx", "col_idx"], "left")
            if potential is not None:
                s = s.join(potential, cand_key, "left")
            else:
                s = s.withColumn("cpa_coeff", F.lit(None)).withColumn(
                    "n_potential", F.lit(None)
                )
            is_ctxless = F.col("ctxless") <= 0.1
            boosted = F.when(
                is_ctxless & F.col("cpa_coeff").isNotNull(),
                F.least(F.lit(1.0), F.col("score") * (1.0 + F.col("cpa_coeff"))),
            ).otherwise(F.col("score"))
            coeff = F.when(is_ctxless, F.col("cov_mean")).otherwise(
                F.col("cov_mean") / 2.0
            )
            s = s.withColumn("score", boosted).withColumn("coeff", coeff)
        else:
            s = s.withColumn("coeff", F.col("cov_mean") / 2.0).withColumn(
                "n_potential", F.lit(None)
            )
        s = s.withColumn(
            "score",
            F.when(
                F.col("cov_mean").isNotNull(),
                (F.col("score") + F.col("coeff") * F.col("cta_d"))
                / (1.0 + F.col("coeff")),
            ).otherwise(F.col("score")),
        )
    else:
        s = s.withColumn("n_potential", F.lit(None))

    w = Window.partitionBy("table_id", "row_idx", "col_idx").orderBy(
        F.desc("score"),
        F.desc(F.coalesce("n_potential", F.lit(0))),
        F.desc("sim"),
        F.asc("entity"),
    )
    w_max = Window.partitionBy("table_id", "row_idx", "col_idx")
    ranked = s.withColumn("rank", F.row_number().over(w)).withColumn(
        "max_score", F.max("score").over(w_max)
    )
    if only_one:
        ranked = ranked.where(F.col("score") == F.col("max_score"))
    return ranked.select(*cand_key, "sim", "score", "rank")


# --------------------------------------------------------------------- CPA
def cpa_task(
    inp: AnnotInputs,
    cea: DataFrame,
    only_one: bool,
    unrelated_pairs: DataFrame | None = None,
    sim_scores: bool = False,
) -> DataFrame:
    """C13 voting (annotation_models.py:1033-1131). Returns kept CPAs:
    (table_id,head_col,tail_col,rel,score,coverage,prox,rank).

    ``sim_scores``: pass-1 mode. Pass-1 confidences are a pure function of
    sim (0.1·sim; sim on single-column tables) and the materialized row_pairs
    frame already carries both sides' sims for every co-occurring candidate
    pair, so the entity votes come straight off it — no re-run of the
    full-candidate-set self-join. Only valid with no unrelated_pairs (pass 1
    has none); ``cea`` still feeds the literal-vote head side."""
    pairs = inp.ecol_pairs.withColumn("tail_kind", F.lit("entity")).unionByName(
        inp.el_pairs.withColumn("tail_kind", F.lit("literal"))
    )
    if unrelated_pairs is not None:
        assert not sim_scores, "sim_scores is a pass-1 mode (no unrelated set)"
        pairs = pairs.join(
            bcast(unrelated_pairs), ["table_id", "head_col", "tail_col"],
            "left_anti",
        )

    head = cea.select(
        "table_id", "row_idx", F.col("col_idx").alias("head_col"),
        F.col("entity").alias("head_ent"), F.col("score").alias("head_conf"),
    )

    # entity-tail votes
    if sim_scores:
        # greatest(f(hs), f(ts)) = f(greatest(hs, ts)) — f monotone per table
        conf = lambda c: F.when(F.col("n_cols") > 1, 0.1 * c).otherwise(c)  # noqa: E731
        je = inp.row_pairs.join(bcast(inp.tbl), "table_id").join(
            bcast(inp.cached_rel), ["head_ent", "tail_ent"]
        )
        pair_score = F.col("prox") * conf(F.greatest("head_sim", "tail_sim"))
    else:
        tail_e = cea.select(
            "table_id", "row_idx", F.col("col_idx").alias("tail_col"),
            F.col("entity").alias("tail_ent"), F.col("score").alias("tail_conf"),
        )
        je = (
            head.join(
                bcast(pairs.where(F.col("tail_kind") == "entity")),
                ["table_id", "head_col"],
            )
            .join(tail_e, ["table_id", "row_idx", "tail_col"])
            .join(bcast(inp.cached_rel), ["head_ent", "tail_ent"])
        )
        pair_score = F.col("prox") * F.greatest("head_conf", "tail_conf")
    ve = je.select(
        "table_id", "head_col", "tail_col", "row_idx", "rel", "prox",
        pair_score.alias("pair_score"),
    )

    # literal-tail votes: tail "candidate" = raw mention with conf 0,
    # relation from the literal CPA cache keyed (entity, mention)
    jl = (
        head.join(
            bcast(pairs.where(F.col("tail_kind") == "literal")),
            ["table_id", "head_col"],
        )
        .join(
            bcast(inp.lit_cpa.select(
                F.col("entity").alias("head_ent"), "lit_cell",
                F.col("pid").alias("rel"),
            )),
            "head_ent",
        )
        .join(
            inp.lit_cells.select(
                "table_id", "row_idx", F.col("lit_col").alias("tail_col"), "lit_cell"
            ),
            ["table_id", "row_idx", "tail_col", "lit_cell"],
        )
    )
    vl = jl.select(
        "table_id", "head_col", "tail_col", "row_idx", "rel",
        F.lit(1.0).alias("prox"),
        (1.0 * F.greatest(F.col("head_conf"), F.lit(0.0))).alias("pair_score"),
    )

    votes = ve.unionByName(vl)
    per_row = votes.groupBy(
        "table_id", "head_col", "tail_col", "row_idx", "rel"
    ).agg(F.max("pair_score").alias("row_score"), F.min("prox").alias("row_prox"))
    agg = per_row.groupBy("table_id", "head_col", "tail_col", "rel").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("row_score").alias("total"),
        F.min("row_prox").alias("prox"),
    )
    w = Window.partitionBy("table_id", "head_col", "tail_col").orderBy(
        F.desc(F.col("cnt") * F.col("total")),
        F.desc("cnt"),
        F.desc("prox"),
        F.desc((~F.col("rel").contains("::")).cast("int")),
        F.desc((~F.col("rel").contains("(-)")).cast("int")),
        F.asc("rel"),
    )
    wp = Window.partitionBy("table_id", "head_col", "tail_col")
    # thresholds come from the TOP-ranked entry (reference threshold =
    # sorted[0], annotation_models.py:1108-1130), not from column-wide maxima
    ranked = (
        agg.withColumn("rank", F.row_number().over(w))
        .withColumn(
            "top_ct",
            F.max(F.when(F.col("rank") == 1, F.col("cnt") * F.col("total"))).over(wp),
        )
        .withColumn("top_cnt", F.max(F.when(F.col("rank") == 1, F.col("cnt"))).over(wp))
    )
    if only_one:
        kept = ranked.where(F.col("cnt") * F.col("total") >= F.col("top_ct"))
    else:
        kept = ranked.where(F.col("cnt") >= F.col("top_cnt"))
    return kept.join(bcast(inp.tbl), "table_id").select(
        "table_id", "head_col", "tail_col", "rel",
        (F.col("total") / F.col("n_data_rows")).alias("score"),
        (F.col("cnt") / F.col("n_data_rows")).alias("coverage"),
        "prox", "rank",
    )


# --------------------------------------------------------------------- CTA
def cta_task(inp: AnnotInputs, cea: DataFrame, only_one: bool) -> DataFrame:
    """C11 voting (annotation_models.py:800-902). Returns kept CTAs:
    (table_id,col_idx,type,score,coverage,rank)."""
    types = inp.types.select(
        "entity", "type", "level", F.col("rank").alias("type_rank")
    )
    # types is entity-bounded — broadcast under the small posture so the
    # row-scale CEA side (all candidates in pass 2) doesn't shuffle
    j = cea.select(
        "table_id", "row_idx", "col_idx", "entity", "score"
    ).join(bcast(types), "entity")
    lvl_w = (
        F.when(F.col("level") == 1, CTA_LEVEL_W[1])
        .when(F.col("level") == 2, CTA_LEVEL_W[2])
        .otherwise(CTA_LEVEL_W[3])
    )
    per_row = j.groupBy("table_id", "col_idx", "row_idx", "type").agg(
        F.max(lvl_w * F.col("score")).alias("row_score"),
        F.max("type_rank").alias("row_rank"),
    )
    agg = per_row.groupBy("table_id", "col_idx", "type").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("row_score").alias("total"),
        F.sum("row_rank").alias("total_ranks"),
    )
    w = Window.partitionBy("table_id", "col_idx").orderBy(
        F.desc(F.col("cnt") * F.col("total")), F.desc("total_ranks"), F.asc("type")
    )
    wp = Window.partitionBy("table_id", "col_idx")
    # thresholds from the TOP-ranked entry (annotation_models.py:869-898)
    ranked = (
        agg.withColumn("rank", F.row_number().over(w))
        .withColumn(
            "top_ct",
            F.max(F.when(F.col("rank") == 1, F.col("cnt") * F.col("total"))).over(wp),
        )
        .withColumn("top_cnt", F.max(F.when(F.col("rank") == 1, F.col("cnt"))).over(wp))
    )
    if only_one:
        top = ranked.where(F.col("cnt") * F.col("total") >= F.col("top_ct"))
        sups = (
            top.join(inp.super_t, "type")
            .select("table_id", "col_idx", F.col("supertype").alias("type"))
            .distinct()
        )
        extra = ranked.join(sups, ["table_id", "col_idx", "type"]).join(
            top.select("table_id", "col_idx", "type"),
            ["table_id", "col_idx", "type"],
            "left_anti",
        )
        kept = top.unionByName(extra)
    else:
        kept = ranked.where(F.col("cnt") >= F.col("top_cnt"))
    return kept.join(bcast(inp.tbl), "table_id").select(
        "table_id", "col_idx", "type",
        (F.col("total") / F.col("n_data_rows")).alias("score"),
        (F.col("cnt") / F.col("n_data_rows")).alias("coverage"),
        "rank",
    )


# --------------------------------------------------------------------- loop 4
def literal_context_restriction(inp: AnnotInputs, cpa: DataFrame) -> DataFrame:
    """C10 onlyLiteralContext (annotation_models.py:380-395): per literal col
    keep only the entity col whose TOP CPA has the best coverage (ties → the
    lowest entity col, matching the reference's strict-> scan); every other
    (entity, literal) pair becomes unrelated. Returns unrelated pairs."""
    top = cpa.where(F.col("rank") == 1).select(
        "table_id", "head_col", "tail_col", "coverage"
    )
    lit_pairs = inp.el_pairs
    j = lit_pairs.join(bcast(top), ["table_id", "head_col", "tail_col"], "left").fillna(
        {"coverage": -1.0}
    )
    w = Window.partitionBy("table_id", "tail_col").orderBy(
        F.desc("coverage"), F.asc("head_col")
    )
    ranked = j.withColumn("r", F.row_number().over(w))
    # match_column exists only when some coverage > 0
    keep = ranked.where((F.col("r") == 1) & (F.col("coverage") > 0))
    return lit_pairs.join(
        bcast(keep.select("table_id", "head_col", "tail_col")),
        ["table_id", "head_col", "tail_col"],
        "left_anti",
    )


# --------------------------------------------------------------------- driver
@dataclass
class AnnotationResult:
    cea: DataFrame   # final only_one CEA (all kept ties, rank 1 = output)
    cta: DataFrame
    cpa: DataFrame
    inputs: AnnotInputs


def _mat(df: DataFrame) -> DataFrame:
    """Mark a multi-consumer intermediate: LAZY localCheckpoint.

    Two properties, both needed:
    - **Logical-plan truncation** — downstream DataFrames see a LogicalRDD
      leaf, so analyzer/optimizer cost stays bounded per pass instead of
      accreting across the 4-pass DAG (a lazy ``persist()`` does NOT give
      this: cache substitution happens after analysis, so every withColumn
      re-analyzes the full tree — measured minutes of CheckAnalysis time).
    - **No blocking job per intermediate** — unlike the old eager variant
      (r1: ~20 serialized materialization jobs floored 8→32 end-to-end
      scaling efficiency at 0.29), eager=False defers execution: the shared
      RDD is computed ONCE inside the first job that needs it (the RDD DAG
      dedupes stages), checkpointed at that point, and reused by later jobs.

    On a cluster the pass OUTPUTS (cea/cta/cpa) additionally flow through the
    pipeline's reliable parquet checkpoints for resume; intermediates only
    need lineage-truncation semantics.

    Storage level: serialized memory+disk via session.ckpt — see its
    docstring (measured 10% off the replicate-4 flagship vs deserialized
    blocks on this memory-path-bound host)."""
    from ..session import ckpt

    return ckpt(df, eager=False)


def _force_wave(name: str, frames: list, timings: dict | None) -> None:
    """force_parallel + per-wave timing (build_inputs instrumentation)."""
    import time as _t

    t0 = _t.time()
    force_parallel(*frames)
    if timings is not None:
        timings[f"bi_{name}"] = round(_t.time() - t0, 2)


def force_parallel(*dfs: DataFrame | None) -> None:
    """Materialize a set of INDEPENDENT lazy localCheckpoint frames in ONE
    parallel union-of-counts job.

    Why: a lazily-checkpointed frame executes the first time an action
    touches it — and with the forced-broadcast hints on the small dims, that
    first touch used to happen inside *broadcast evaluation*, where Spark
    collects each broadcast child serially on a driver thread. At r2 scale
    that serial evaluation of the fused input DAG was the dominant
    wall-clock term of the flagship and the main scaling-efficiency sink.
    One union-of-counts job runs every frame's stages concurrently at full
    cluster parallelism and checkpoints them at job end; later passes'
    broadcast evaluations then collect from already-materialized RDDs.

    INDEPENDENCE CONTRACT: frames in one call must not share UNMATERIALIZED
    ancestors. Concurrent stages of one job race to compute uncached
    partitions of a shared parent (the block-cache dedupe is best-effort,
    not a barrier), so passing a frame together with something derived from
    it duplicates the whole parent computation — measured 937 s vs 731 s on
    the replicate-4 flagship when the input frames were forced in one flat
    call. Dependent frames go in SEPARATE calls, in dependency order
    (``force_waves``). ``None`` entries are skipped so optional frames
    (ctxless/potential) can be passed unconditionally.

    The contract is ENFORCED, not just documented: before submitting the
    union-of-counts job, ``_wave_violations`` walks each member's RDD
    lineage (driver-side, no job) and flags (a) a member whose lineage
    contains another member and (b) a checkpoint-marked-but-unmaterialized
    ancestor shared by ≥2 members. Violations warn by default and raise
    under ``SPARK_GRAFT_WAVE_ASSERT=1`` (set in tests), so a future edit
    that moves a frame into its parent's wave fails tests instead of
    silently recomputing the parent (the measured 937-vs-731 s class of
    regression)."""
    import os
    import warnings

    if os.environ.get("SPARK_GRAFT_NO_FORCE") == "1":
        return
    frames = [d for d in dfs if d is not None]
    if not frames:
        return
    try:
        if (
            frames[0].sparkSession.conf.get("spark.graft.forceMaterialize", "true")
            == "false"
        ):
            return  # fixture scale: per-job latency outweighs the wave win
    except Exception:
        pass
    bad = _wave_violations(frames)
    if bad:
        msg = "force_parallel independence contract violated: " + "; ".join(bad)
        if os.environ.get("SPARK_GRAFT_WAVE_ASSERT") == "1":
            raise AssertionError(msg)
        warnings.warn(msg, stacklevel=2)
    probe = frames[0].agg(F.count(F.lit(1)).alias("n"))
    for d in frames[1:]:
        probe = probe.unionAll(d.agg(F.count(F.lit(1)).alias("n")))
    probe.collect()


def _wave_violations(frames, max_nodes: int = 5000) -> list[str]:
    """Driver-side RDD-lineage audit of one force_parallel wave.

    Every engine intermediate reaches a wave as a LAZY localCheckpoint, so
    its analyzed plan is a LogicalRDD leaf whose RDD already exists (Spark
    plans the checkpoint RDD at ``Dataset.checkpoint`` time even when
    eager=False) but whose blocks do not. Two failure shapes:

    - **member-in-member**: frame A's checkpoint RDD lineage passes through
      frame B's checkpoint RDD — A derives from B, so running them in one
      job races A's stages against B's own materialization.
    - **shared unmaterialized checkpoint ancestor**: two members both read
      an RDD that is checkpoint-MARKED (``checkpointData.isDefined``) but
      not yet computed — concurrent stages race to compute it twice (the
      block-cache dedupe is best-effort, not a barrier).

    Plain shared subtrees (exchanges, parquet scans) are fine — exchange
    reuse dedupes them inside the one probe plan — and ancestors whose
    checkpoint has completed are fine, so neither is flagged. Pure RDD-DAG
    walk: no planning, no AQE stage submission, no job."""
    rdds = []
    for d in frames:
        try:
            plan = d._jdf.queryExecution().analyzed()
            rdds.append(plan.rdd() if plan.nodeName() == "LogicalRDD" else None)
        except Exception:
            rdds.append(None)
    member_ids = {r.id(): i for i, r in enumerate(rdds) if r is not None}
    problems: list[str] = []
    # ancestor checkpoint-marked-unmaterialized RDD id -> set of member idx
    shared: dict[int, set[int]] = {}
    for i, root in enumerate(rdds):
        if root is None:
            continue
        stack, seen = [root], set()
        while stack and len(seen) < max_nodes:
            cur = stack.pop()
            try:
                cid = cur.id()
            except Exception:
                continue
            if cid in seen:
                continue
            seen.add(cid)
            if cid != root.id():
                j = member_ids.get(cid)
                if j is not None and j != i:
                    problems.append(
                        f"wave member #{i} depends on wave member #{j} "
                        f"(rdd {root.id()} -> rdd {cid})"
                    )
                    continue  # B materializes itself; no need to walk past it
                try:
                    if cur.checkpointData().isDefined() and not cur.isCheckpointed():
                        shared.setdefault(cid, set()).add(i)
                except Exception:
                    pass
            try:
                deps = cur.dependencies().iterator()
                while deps.hasNext():
                    stack.append(deps.next().rdd())
            except Exception:
                continue
    for cid, members in shared.items():
        if len(members) > 1:
            problems.append(
                f"members {sorted(members)} share unmaterialized checkpoint "
                f"ancestor rdd {cid} — materialize it in an earlier wave"
            )
    return problems


def force_waves(*waves) -> None:
    """Sequential dependency waves of force_parallel: each wave's frames may
    depend on anything in EARLIER waves (already cached) but must be mutually
    independent within the wave."""
    for wave in waves:
        force_parallel(*wave)


def annotate(
    cand: DataFrame,
    body: DataFrame,
    col_classes: DataFrame,
    edges: DataFrame,
    degrees: DataFrame,
    multihop: bool = True,
    timings: dict | None = None,
) -> AnnotationResult:
    """Full 4-pass annotation (table_annotation.py:51-112)."""
    import time as _t

    from ..session import job_group

    timings = timings if timings is not None else {}
    spark = cand.sparkSession

    t0 = _t.time()
    with job_group(spark, "annot_build_inputs"):
        inp = build_inputs(
            cand, body, col_classes, edges, degrees, multihop, timings=timings
        )
    timings["build_inputs"] = round(_t.time() - t0, 2)

    # pass 1.
    # CEA¹ with only_one=False and no CTA is the IDENTITY on the candidate
    # set plus a per-cell rank that CPA voting never reads
    # (annotation_models.py:904-1031 vs :1033-1131 — the vote joins only on
    # (cell, entity, score)), so the scores frame feeds CPA¹ directly and
    # the full-candidate-set sort window is skipped.
    t0 = _t.time()
    with job_group(spark, "annot_pass1"):
        s1 = entity_scores_pass1(inp)
        cpa1 = _mat(cpa_task(inp, s1, only_one=False, sim_scores=True))
        force_parallel(cpa1)
    timings["pass1"] = round(_t.time() - t0, 2)

    # pass 2: soft re-weighting. Same identity: CEA² (only_one=False, no
    # CTA) adds only an unread rank, so CTA² votes straight over s2.
    # ``we`` is shared by pass 2 (s2) and pass 4 (the scored frame) — the
    # lazy checkpoint materializes inside s2's wave and pass 4 reuses the
    # blocks instead of re-deriving the ctx_entries ⋈ top-CPA join.
    t0 = _t.time()
    with job_group(spark, "annot_pass2"):
        we = _mat(update_context_weights(inp, cpa1))
        s2, _, _, _ = entity_scores_soft(inp, we, cpa1)
        s2 = _mat(s2)
        cta2 = _mat(cta_task(inp, s2, only_one=False))
        force_waves([s2], [cta2])  # cta2 reads s2
    timings["pass2"] = round(_t.time() - t0, 2)

    # pass 3: disambiguation
    t0 = _t.time()
    with job_group(spark, "annot_pass3"):
        cea3 = _mat(cea_task(inp, s2, cta=cta2, only_one=True))
        cta3 = _mat(cta_task(inp, cea3, only_one=True))
        cpa3 = _mat(cpa_task(inp, cea3, only_one=False))
        force_waves([cea3], [cta3, cpa3])  # cta3 ∥ cpa3, both read cea3
    timings["pass3"] = round(_t.time() - t0, 2)

    # pass 4: reinforced disambiguation.
    # NOTE: update_context_weight(onlyLiteralContext=True) in the reference
    # (annotation_models.py:380-395) only populates unrelated_col_pairs — the
    # entry WEIGHTS remain the ones computed from CPA¹ in pass 2; only the
    # CPA used for scale factors advances to CPA³.
    t0 = _t.time()
    with job_group(spark, "annot_pass4"):
        unrelated = _mat(literal_context_restriction(inp, cpa3))
        s3, ctxless, potential, scored = entity_scores_soft(
            inp, we, cpa3, unrelated_pairs=unrelated, last_step=True
        )
        s3 = _mat(s3)
        if ctxless is not None:
            ctxless = _mat(ctxless)
        if potential is not None:
            potential = _mat(potential)
        # the shared interior `scored` frame is checkpointed inside
        # entity_scores_soft and forced in its own wave (it reads
        # `unrelated`), so s3/ctxless/potential become mutually independent
        # consumers of a materialized ancestor — one parallel wave instead
        # of three sequential recomputes of the scored subtree
        force_waves([unrelated], [scored])
        timings["pass4_scored"] = round(_t.time() - t0, 2)
        t1 = _t.time()
        force_waves([s3, ctxless, potential])
        timings["pass4_s3wave"] = round(_t.time() - t1, 2)
        t1 = _t.time()
        cea4 = _mat(
            cea_task(
                inp, s3, cta=cta3, only_one=True, contextless=ctxless,
                potential=potential,
            )
        )
        force_parallel(cea4)
        timings["pass4_cea4"] = round(_t.time() - t1, 2)
        cta4 = _mat(cta_task(inp, cea4, only_one=True))
        cpa4 = _mat(cpa_task(inp, cea4, only_one=True, unrelated_pairs=unrelated))
    timings["pass4"] = round(_t.time() - t0, 2)
    return AnnotationResult(cea=cea4, cta=cta4, cpa=cpa4, inputs=inp)
