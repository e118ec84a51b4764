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
