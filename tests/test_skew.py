"""Salted-join skew utility: result-identical to the plain join, load split."""

from pyspark.sql import functions as F

from table_annotation_spark.operators.skew import salted_join


class TestSaltedJoin:
    def test_equals_plain_join(self, spark):
        # skewed big side: one hot key with 5k rows, long tail of 100 keys
        big = spark.range(5000).select(
            F.lit("usa").alias("k"), F.col("id").alias("v")
        ).unionByName(
            spark.range(100).select(
                F.concat(F.lit("k"), F.col("id")).alias("k"),
                F.col("id").alias("v"),
            )
        )
        small = spark.createDataFrame(
            [("usa", "Q30"), ("k1", "Q1"), ("k2", "Q2")], ["k", "ent"]
        )
        plain = {tuple(r) for r in big.join(small, "k").collect()}
        salted = {tuple(r) for r in salted_join(big, small, ["k"]).collect()}
        assert salted == plain
        assert len(salted) == 5002

    def test_left_join_preserved(self, spark):
        big = spark.createDataFrame([("a", 1), ("b", 2)], ["k", "v"])
        small = spark.createDataFrame([("a", "X")], ["k", "t"])
        out = {tuple(r) for r in salted_join(big, small, ["k"], how="left").collect()}
        assert ("a", 1, "X") in out
        assert ("b", 2, None) in out

    def test_salt_splits_hot_key(self, spark):
        big = spark.range(4000).select(F.lit("hot").alias("k"), F.col("id").alias("v"))
        from table_annotation_spark.operators.skew import DEFAULT_SALTS

        salted = big.withColumn(
            "_salt", F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(DEFAULT_SALTS))
        )
        n = salted.select("_salt").distinct().count()
        assert n == DEFAULT_SALTS  # the hot key actually spreads
