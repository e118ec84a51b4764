"""Physical-plan assertions: the optimizations we rely on at 100 TB must be
visible in the plans at any scale — filter/column pushdown into parquet
scans, broadcast joins for small dims, partial (map-side) aggregation, and
no cartesian products in the blocking join.
"""

import pytest
from pyspark.sql import functions as F

from table_annotation_spark.operators import relational as rel

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


class TestPushdown:
    def test_filter_pushdown_into_scan(self, spark):
        df = rel.pricing_agg(spark, SF)
        plan = plan_of(df)
        assert "PushedFilters" in plan
        # the quantity predicate must reach the parquet scan
        assert "GreaterThan(l_quantity" in plan

    def test_column_pruning(self, spark):
        df = rel.pricing_agg(spark, SF)
        plan = plan_of(df)
        # ReadSchema must NOT include unused columns like l_shipdate/l_tax
        read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
        assert read_schema
        assert "l_shipdate" not in read_schema[0]
        assert "l_suppkey" not in read_schema[0]

    def test_projection_only_reads_needed_columns(self, spark):
        df = (
            spark.read.parquet(f"{SF}/lineitem.parquet")
            .select("l_orderkey", "l_quantity")
            .where(F.col("l_quantity") > 5)
        )
        plan = plan_of(df)
        line = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
        assert "l_orderkey" in line and "l_quantity" in line
        assert "l_extendedprice" not in line


class TestJoinStrategies:
    def test_star_join_broadcasts_dims(self, spark):
        plan = plan_of(rel.star_join(spark, SF))
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan

    def test_band_selfjoin_is_hash_join_on_brand(self, spark):
        plan = plan_of(rel.band_selfjoin(spark, SF))
        # equi-part on brand keeps it a hash join; the band predicate is a
        # post-join filter, NOT a cartesian product
        assert "CartesianProduct" not in plan
        assert "Join" in plan

    def test_blocking_join_no_cartesian(self, spark, kg):
        from table_annotation_spark.operators import lookup as lk

        labels, _ = kg
        m = spark.createDataFrame([("paris",), ("pulp fiction",)], ["mention_norm"])
        pairs = lk.candidate_pairs(m, labels)
        plan = plan_of(pairs)
        assert "CartesianProduct" not in plan


class TestAggregation:
    def test_partial_aggregation(self, spark):
        plan = plan_of(rel.pricing_agg(spark, SF))
        # map-side combine: two HashAggregate nodes (partial + final)
        assert plan.count("HashAggregate") >= 2

    def test_whole_stage_codegen_active(self, spark):
        # formatted mode marks codegen-compiled operators with a '*' prefix
        plan = plan_of(rel.pricing_agg(spark, SF))
        assert "* HashAggregate" in plan
        assert "* Filter" in plan


class TestBucketing:
    def test_bucketed_edges_join_without_exchange(self, spark, kg, tmp_path):
        """kg_edges bucketed by subj: an aggregation keyed on subj reads
        pre-bucketed data with NO Exchange before the final agg."""
        from table_annotation_spark.sources import kg_build

        _, edges = kg
        bucketed = kg_build.write_bucketed(edges, "kg_edges_bucketed", "subj", 4)
        agg = bucketed.groupBy("subj").count()
        plan = plan_of(agg)
        # bucketed scan satisfies the hash partitioning requirement: the only
        # acceptable plan has no shuffle Exchange between scan and aggregate
        assert "Exchange hashpartitioning(subj" not in plan
        assert "Scan parquet" in plan


class TestCCJobBudget:
    """The CC loop's driver-action diet: with the change flag folded into
    each round's own groupBy, a converged run submits exactly
    (2 init + rounds + probes) jobs — no per-check shuffle-join jobs."""

    def test_cc_job_count_is_bounded(self, spark):
        from pyspark.sql import functions as F

        from table_annotation_spark.operators.materialize import (
            connected_components,
        )

        # chain 1-2-3-4 plus isolated pair 10-11: diameter 3 → labels stop
        # changing after round 3; check_every=2 probes at rounds 2 and 4
        edges = spark.createDataFrame(
            [("1", "2"), ("2", "3"), ("3", "4"), ("10", "11")], ["src", "dst"]
        )
        sc = spark.sparkContext
        sc.setJobGroup("cc-budget", "cc job budget test")
        try:
            cc = connected_components(edges, max_iter=8, check_every=2)
            got = {(r["node"], r["component"]) for r in cc.collect()}
        finally:
            sc.setJobGroup(None, None)
        assert got == {
            ("1", "1"), ("2", "1"), ("3", "1"), ("4", "1"),
            ("10", "10"), ("11", "10"),
        }
        jobs = sc.statusTracker().getJobIdsForGroup("cc-budget")
        # 2 init checkpoints + 4 round checkpoints (converged flag seen at
        # the round-4 probe) + 2 limit(1) probes + 1 final collect = 9;
        # allow +2 slack for limit-probe job splitting, never the old
        # per-check join+count pattern (which added a multi-stage job per
        # probe on top of this budget)
        assert 7 <= len(jobs) <= 11, f"unexpected CC job count: {len(jobs)}"
