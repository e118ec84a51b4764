"""Canonicalization gating (VERDICT r1 item 3): one surface form CEA-assigned
to two entities in different tables pins the intended merge behavior —
confident agreement on a shared mention merges (duplicate-id dedupe), while a
low-confidence stray assignment must NOT collapse unrelated entities.

Also pins connected_components' non-convergence warning (ADVICE item 5).
"""

import pytest
from pyspark.sql import Row

from table_annotation_spark.operators.materialize import (
    canonicalize,
    connected_components,
)


def _cea(spark, rows):
    return spark.createDataFrame(
        [Row(mention_norm=m, entity=e, score=s) for (m, e, s) in rows]
    )


def _triples(spark, rows):
    return spark.createDataFrame(
        [
            Row(subj=s, pred=p, obj=o, obj_kind="entity",
                table_id=t, row_idx=0, score=0.9)
            for (s, p, o, t) in rows
        ]
    )


class TestCanonicalizeGate:
    def test_confident_shared_mention_merges(self, spark):
        """'paris' confidently resolved to Q100 (table A) and Q200 (table B)
        → duplicate ids for one real-world entity → merged to min rep."""
        cea = _cea(spark, [("paris", "Q100", 0.9), ("paris", "Q200", 0.9)])
        tri = _triples(spark, [("Q100", "P1", "Q999", "a"),
                               ("Q200", "P1", "Q999", "b")])
        out = canonicalize(tri, cea).select("subj").distinct().collect()
        assert {r["subj"] for r in out} == {"Q100"}

    def test_low_confidence_assignment_does_not_merge(self, spark):
        """'berlin' → Q300 at 0.95 but → Q400 at 0.1 (junk row): the weak
        edge is gated out, so Q300 and Q400 stay distinct entities."""
        cea = _cea(spark, [("berlin", "Q300", 0.95), ("berlin", "Q400", 0.1)])
        tri = _triples(spark, [("Q300", "P1", "Q999", "a"),
                               ("Q400", "P1", "Q999", "b")])
        out = canonicalize(tri, cea).select("subj").distinct().collect()
        assert {r["subj"] for r in out} == {"Q300", "Q400"}

    def test_distinct_mentions_never_merge(self, spark):
        cea = _cea(spark, [("tokyo", "Q500", 0.9), ("kyoto", "Q600", 0.9)])
        tri = _triples(spark, [("Q500", "P1", "Q999", "a"),
                               ("Q600", "P1", "Q999", "b")])
        out = canonicalize(tri, cea).select("subj").distinct().collect()
        assert {r["subj"] for r in out} == {"Q500", "Q600"}


class TestCCConvergence:
    def test_warns_on_max_iter_exhaustion(self, spark):
        # path graph a-b-c-d-e-f: min-label needs ~diameter rounds; cap at 1
        edges = spark.createDataFrame(
            [Row(src=x, dst=y) for x, y in
             [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("e", "f")]]
        )
        with pytest.warns(RuntimeWarning, match="max_iter"):
            connected_components(edges, max_iter=1)

    def test_converges_without_warning(self, spark):
        import warnings

        edges = spark.createDataFrame(
            [Row(src=x, dst=y) for x, y in
             [("a", "b"), ("b", "c"), ("x", "y")]]
        )
        with warnings.catch_warnings():
            warnings.simplefilter("error", RuntimeWarning)
            cc = connected_components(edges, max_iter=10)
        comp = {r["node"]: r["component"] for r in cc.collect()}
        assert comp == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}
