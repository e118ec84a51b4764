"""End-to-end pipeline: source repos → preprocessed cells → candidates →
CEA/CTA/CPA → canonicalized triples; with per-stage checkpoints, lineage and
metrics (north_star resumability requirement).

Stage layout mirrors SURVEY.md §7; each stage can persist its output to
parquet under a run directory and later runs resume from the newest completed
stage (per-partition checkpointing comes free from parquet task atomicity —
a stage is complete iff its _SUCCESS marker exists).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import lookup as lk
from ..operators.annotation import AnnotationResult, annotate
from ..operators.materialize import canonicalize, emit_triples, with_uris
from ..session import ckpt as _sckpt
from ..operators.preprocessing import body_cells, column_meta
from ..sources.embedded_tables import extract_manifest

STAGES = ["prep", "candidates", "cea", "cta", "cpa", "triples"]


@dataclass
class PipelineRun:
    spark: SparkSession
    labels: DataFrame
    edges: DataFrame
    degrees: DataFrame
    checkpoint_dir: str | None = None
    k: int = lk.DEFAULT_K
    max_gram_df: int | None = None
    multi_resolution: bool = False
    max_candidates_per_mention: int | None = None
    multihop: bool = True
    metrics: dict = field(default_factory=dict)

    # ------------------------------------------------------------ helpers
    def _ckpt_path(self, stage: str) -> str | None:
        if not self.checkpoint_dir:
            return None
        return os.path.join(self.checkpoint_dir, stage)

    def _is_done(self, stage: str) -> bool:
        p = self._ckpt_path(stage)
        return bool(p) and os.path.exists(os.path.join(p, "_SUCCESS"))

    def _checkpoint(self, stage: str, df: DataFrame) -> DataFrame:
        """Persist stage output to parquet and read it back (cuts lineage,
        enables resume). No-op passthrough when checkpointing is off."""
        p = self._ckpt_path(stage)
        if not p:
            return df
        t0 = time.time()
        df.write.mode("overwrite").parquet(p)
        self.metrics[f"{stage}_write_sec"] = round(time.time() - t0, 3)
        return self.spark.read.parquet(p)

    def _load(self, stage: str) -> DataFrame:
        return self.spark.read.parquet(self._ckpt_path(stage))

    def _cc_checkpoint(self):
        """Per-iteration lineage truncation for connected_components: route
        through reliable parquet storage when a checkpoint_dir exists (a
        cluster survives executor loss mid-loop), else executor-memory
        localCheckpoint."""
        if not self.checkpoint_dir:
            return None
        counter = {"i": 0}

        def ckpt(df: DataFrame) -> DataFrame:
            counter["i"] += 1
            p = os.path.join(self.checkpoint_dir, "cc", f"iter_{counter['i']}")
            df.write.mode("overwrite").parquet(p)
            return self.spark.read.parquet(p)

        return ckpt

    # ------------------------------------------------------------ stages
    def run(self, src: DataFrame) -> dict[str, DataFrame]:
        """Execute (or resume) the full pipeline. Returns all stage outputs."""
        t_start = time.time()

        from ..session import job_counts, job_group

        if self._is_done("prep"):
            prep = self._load("prep")
        else:
            t0 = time.time()
            with job_group(self.spark, "stage_prep"):
                from ..operators.preprocessing import preprocess_clean_cells
                from ..sources.embedded_tables import extract_cells_clean

                lazy_prep = preprocess_clean_cells(extract_cells_clean(src))
                prep = lazy_prep
                if not self.checkpoint_dir:
                    # materialize the stage's internal lazy checkpoint NOW:
                    # free() below must only run once prep's blocks exist
                    # (freed intermediates are not recomputable)
                    prep.count()
                prep = self._checkpoint("prep", prep)
                # prep is materialized now — release the stage-internal
                # checkpoint blocks (clean/sample/meta), which are otherwise
                # unevictable for the life of the context; when prep went to
                # parquet, its own blocks are redundant too
                from ..session import free

                free(*getattr(lazy_prep, "_graft_intermediates", []))
                if self.checkpoint_dir:
                    free(lazy_prep)
            self.metrics["prep_sec"] = round(time.time() - t0, 3)
        manifest = extract_manifest(src)

        # dictionary-encode table_id: the natural key is a ~70-byte string
        # (repo␟path␟commit) that rides on EVERY row of every shuffle and
        # checkpoint through lookup + all four annotation passes — on a
        # memory-path-bound host that is gigabytes of pure key traffic at
        # replicate scale. Encode it to a dense int at the prep boundary
        # (deterministic: rank in table_id order, so resumed runs rebuild
        # the identical map) and decode only on the final triples. The
        # single-task ordering window is bounded by #tables (not rows);
        # at true 100 TB table counts the map itself stays a few MB.
        from pyspark.sql import Window

        from ..operators.annotation import _localize

        tid_map = _localize(
            prep.select("table_id")
            .distinct()
            .withColumn(
                "tid", F.row_number().over(Window.orderBy("table_id"))
            )
        )
        prep_i = (
            prep.join(F.broadcast(tid_map), "table_id")
            .drop("table_id")
            .withColumnRenamed("tid", "table_id")
        )

        # pre-partition by table_id once: the annotation passes cluster every
        # join/groupBy/window on (table_id, ...) and reuse this partitioning
        body = body_cells(prep_i).repartition("table_id").transform(_sckpt)
        cols = column_meta(prep_i)
        classes = lk.classify_columns(cols, body).transform(_sckpt)

        if self._is_done("candidates"):
            cand = self._load("candidates")
        else:
            t0 = time.time()
            with job_group(self.spark, "stage_lookup"):
                idf = lk.token_idf(self.labels)
                cand, _kept = lk.lookup(
                    body, classes, self.labels, idf,
                    k=self.k, max_gram_df=self.max_gram_df,
                    multi_resolution=self.multi_resolution,
                    max_candidates_per_mention=self.max_candidates_per_mention,
                )
                if not self.checkpoint_dir:
                    cand = _sckpt(cand, eager=True)
                cand = self._checkpoint("candidates", cand)
            self.metrics["lookup_sec"] = round(time.time() - t0, 3)

        t0 = time.time()
        if all(self._is_done(s) for s in ("cea", "cta", "cpa")):
            # all annotation passes checkpointed — skip annotate() entirely;
            # emit_triples only needs the cheap frame inputs (column pairs,
            # literal cells), rebuilt without any KG join
            from ..operators.annotation import build_light_inputs

            cea, cta, cpa = self._load("cea"), self._load("cta"), self._load("cpa")
            result = AnnotationResult(
                cea=cea, cta=cta, cpa=cpa,
                inputs=build_light_inputs(body, classes),
            )
            self.metrics["annotate_resumed"] = True
        else:
            result = annotate(
                cand, body, classes, self.edges, self.degrees,
                multihop=self.multihop, timings=self.metrics,
            )
            cea = self._checkpoint("cea", result.cea)
            cta = self._checkpoint("cta", result.cta)
            cpa = self._checkpoint("cpa", result.cpa)
        self.metrics["annotate_sec"] = round(time.time() - t0, 3)

        t0 = time.time()
        self.spark.sparkContext.setJobGroup(
            "stage_materialize", "stage_materialize"
        )
        triples = emit_triples(result)
        cea_mentions = result.cea.join(
            cand.select("table_id", "row_idx", "col_idx", "entity", "mention_norm"),
            ["table_id", "row_idx", "col_idx", "entity"],
        )
        triples_canon = with_uris(
            canonicalize(triples, cea_mentions, checkpoint=self._cc_checkpoint())
        )
        # decode the dict-encoded table id back to the natural string key on
        # the public output (internal frames stay int-keyed). LEFT join +
        # raise_error on unmapped ids: if a checkpointed frame is ever
        # resumed against changed input, a tid outside the rebuilt map must
        # ERROR at materialization, not silently drop/relabel rows
        # (ADVICE r4).
        def _decode_tid(df: DataFrame) -> DataFrame:
            if "table_id" not in df.columns:
                return df
            decoded = (
                df.withColumnRenamed("table_id", "tid")
                .join(F.broadcast(tid_map), "tid", "left")
            )
            return decoded.withColumn(
                "table_id",
                F.when(
                    F.col("table_id").isNull(),
                    F.raise_error(
                        F.concat(
                            F.lit(
                                "dict-encoded table_id not in tid_map "
                                "(checkpoint resumed against changed "
                                "input?): tid="
                            ),
                            F.col("tid").cast("string"),
                        )
                    ),
                ).otherwise(F.col("table_id")),
            ).drop("tid")

        triples_canon = _decode_tid(triples_canon)
        triples_canon = self._checkpoint("triples", triples_canon)
        # the CC per-iteration parquet checkpoints are only alive while the
        # canonicalized-triples lineage still reads them; once "triples" is
        # persisted above they are dead weight — drop the whole cc/ tree so
        # reruns with fewer iterations can't leave stale iter_* dirs behind
        if self.checkpoint_dir:
            import shutil

            shutil.rmtree(os.path.join(self.checkpoint_dir, "cc"), ignore_errors=True)
        self.spark.sparkContext.setLocalProperty("spark.jobGroup.id", None)
        self.metrics["materialize_sec"] = round(time.time() - t0, 3)
        self.metrics["total_sec"] = round(time.time() - t_start, 3)
        # per-group cumulative job counts — the driver-floor term (per-job
        # latency × count) the r4 verdict asked to make legible in artifacts
        self.metrics["jobs"] = job_counts(self.spark)

        if self.checkpoint_dir:
            with open(
                os.path.join(self.checkpoint_dir, "metrics.json"), "w"
            ) as fh:
                json.dump(self.metrics, fh, indent=2)

        # every PUBLIC frame carries the natural string table_id: the dict
        # encoding is an internal shuffle-width optimization, so decode at
        # the API boundary (lazy broadcast join against the few-MB map —
        # costs nothing unless the frame is actually collected). Internal
        # variables (body/cand/result.*) stay int-keyed. _decode_tid (above)
        # errors loudly on ids missing from the rebuilt map.
        return {
            "manifest": manifest,
            "prep": prep,
            "body": _decode_tid(body),
            "classes": _decode_tid(classes),
            "candidates": _decode_tid(cand),
            "cea": _decode_tid(cea),
            "cta": _decode_tid(cta),
            "cpa": _decode_tid(cpa),
            "triples": triples_canon,
        }
