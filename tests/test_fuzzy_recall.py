"""Blocking-recall test: typo'd mentions (adjacent-char swap) must still
reach their entity through the trigram blocking + fuzzy re-score path —
the L3/L5 semantics at corpus volume (150 distinct mentions, sf0.001)."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from table_annotation_spark.flagship import synth_kg
from table_annotation_spark.operators import lookup as lk


class TestFuzzyRecall:
    def test_typo_mentions_resolve(self, spark):
        sf = "/root/testdata/sf0.001"
        labels, _, _ = synth_kg(spark, sf)
        cust = spark.read.parquet(f"{sf}/customer.parquet")
        # deterministic typo: swap chars 10 and 11 of the lowercased name
        norm = F.lower(F.trim("c_name"))
        typo = F.concat(
            F.substring(norm, 1, 9),
            F.substring(norm, 11, 1),
            F.substring(norm, 10, 1),
            F.expr("substring(lower(trim(c_name)), 12)"),
        )
        mentions = cust.select(
            typo.alias("mention_norm"),
            F.concat(F.lit("Q"), (F.col("c_custkey") + 3000000).cast("string")).alias(
                "expected"
            ),
        )
        pairs = lk.candidate_pairs(
            mentions.select("mention_norm").distinct(), labels, max_gram_df=None
        )
        scored = lk.score_candidates(pairs, lk.token_idf(labels), k=5)
        w = Window.partitionBy("mention_norm").orderBy(F.desc("score"), F.asc("entity"))
        top1 = (
            scored.withColumn("r", F.row_number().over(w))
            .where(F.col("r") == 1)
            .select("mention_norm", "entity")
        )
        j = mentions.join(top1, "mention_norm", "left")
        total = j.count()
        hit = j.where(F.col("entity") == F.col("expected")).count()
        recall = hit / total
        assert recall >= 0.95, f"typo recall {recall:.3f} ({hit}/{total})"


class TestMultiResolutionBlocking:
    """Skew-proof blocking ladder: mentions whose every trigram is hot still
    block through rare 6-grams; count-based pruning keeps the true match."""

    TARGET = "item#abbaba"

    def _labels(self, spark):
        from itertools import product

        from pyspark.sql import functions as F

        from table_annotation_spark.sources import kg_build

        # dense ID-like corpus: ids are ALL 6-char strings over {a,b}, so
        # every trigram appears in ~half the corpus (hot under a small cap)
        # while the full 6-char id is unique per label
        ids = ["".join(p) for p in product("ab", repeat=6)]
        rows = [(f"Q{1000+i}", f"item#{s}", "LABEL", 0.5)
                for i, s in enumerate(ids)]
        df = spark.createDataFrame(rows, ["entity", "label", "origin", "pr"])
        self.target_entity = f"Q{1000 + ids.index('abbaba')}"
        return kg_build.with_label_norm(
            df.select("entity", "label", F.length("label").alias("length"),
                      "origin", F.col("pr").cast("double").alias("pr"))
        )

    def test_six_gram_tier_restores_recall(self, spark):
        from table_annotation_spark.operators import lookup as lk

        labels = self._labels(spark)
        # typo in the prefix → no exact hit; trigram cap 4 drops every
        # shared gram (each {a,b}-trigram sits in ~half of 64 labels), so
        # the trigram-only path goes dark
        mentions = spark.createDataFrame([("jtem#abbaba",)], ["mention_norm"])
        tri_only = lk.candidate_pairs(mentions, labels, max_gram_df=4)
        assert tri_only.count() == 0
        multi = lk.candidate_pairs(
            mentions, labels, max_gram_df=4, multi_resolution=True
        )
        got = {r["entity"] for r in multi.select("entity").collect()}
        assert self.target_entity in got

    def test_candidate_pruning_keeps_true_match(self, spark):
        from table_annotation_spark.operators import lookup as lk

        labels = self._labels(spark)
        mentions = spark.createDataFrame([("jtem#abbaba",)], ["mention_norm"])
        pruned = lk.candidate_pairs(
            mentions, labels, max_gram_df=4, multi_resolution=True,
            max_candidates_per_mention=5,
        )
        rows = pruned.collect()
        assert len(rows) <= 5
        assert any(r["entity"] == self.target_entity for r in rows)
