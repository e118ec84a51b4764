"""Iterative graph operators over a deterministic document link graph.

A web-scale training pipeline ranks crawl pages (PageRank) before sampling;
the reference's KG is itself a graph but its pipeline never ranks it
(SURVEY §2 lists no graph-iteration op), so this module extends the engine
the same way dedup/ANN do — first-class, oracle-gated.

The corpus carries no link column, so each doc synthesizes exactly TWO
out-links deterministically from doc_id (the pii_redact/url_canonical
augmentation precedent — same formula in the oracle at every SF):

  u -> (u*u + 1) mod N   (quadratic map: irregular in-degree, some nodes
                          get several preimages, many get none)
  u -> u // 2            (binary-tree map: low ids become hubs)

Every node has out-degree exactly 2, so there is no dangling mass and the
Google-matrix iteration needs no dangling redistribution term. Multi-edges
and self-loops the formulas produce are KEPT (both engines agree).
doc_id < N at every SF, and u*u stays inside int64 for N < 3e9; for a
larger id space, hash-fold ids first (noted, not needed at bench SFs).

Cross-engine FP discipline (kmeans_train precedent): ranks are pinned to a
1e-12 grid after EVERY iteration so summation-order noise cannot compound;
in-degree per node is small (≤ ~4 from the quadratic map + 2 from the tree
map), so per-node sums hold well above that grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PR_ITERS = 3
PR_DAMP = "0.85"     # exact decimal literal in both engines
PR_ROUND = 12        # per-iteration rank grid
PR_TOPK = 20


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PR_ITERS power iterations of PageRank (damping 0.85) over the
    synthesized link graph; returns the top-PR_TOPK nodes.

    100 TB posture (the classic Spark PageRank shape, DataFrame-native):
    edges derive NARROWLY from the doc scan (no edge shuffle to build);
    each iteration is one join on src + one map-side-combinable groupBy on
    dst + one left join back to the node set — rank state is only
    (node, double), never the document payload. At real scale the edge
    frame is persisted once and ranks are checkpointed per iteration to
    truncate lineage; at bench SFs the 3-deep composed plan is cheaper
    than the checkpoint round-trips. The scalar N rides in as a broadcast
    1-row cross join — no collect, no driver loop.
    """
    d = _docs(spark, sf_dir)
    n = d.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    nodes = d.select(F.col("doc_id").cast("bigint").alias("node")).crossJoin(
        F.broadcast(n)
    )
    damp = F.expr(PR_DAMP)
    edges = nodes.select(
        F.col("node").alias("src"),
        F.explode(
            F.array(
                (F.col("node") * F.col("node") + F.lit(1)) % F.col("n"),
                F.floor(F.col("node") / F.lit(2)).cast("bigint"),
            )
        ).alias("dst"),
    )
    ranks = nodes.select(
        "node", (F.lit(1.0) / F.col("n").cast("double")).alias("r")
    )
    for _ in range(PR_ITERS):
        contrib = (
            edges.join(ranks, edges.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(F.col("r") / F.lit(2)).alias("s"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .select(
                "node",
                F.round(
                    (F.lit(1.0) - damp) / F.col("n").cast("double")
                    + damp * F.coalesce(F.col("s"), F.lit(0.0)),
                    PR_ROUND,
                ).alias("r"),
            )
        )
    return (
        ranks.orderBy(F.desc("r"), F.asc("node"))
        .limit(PR_TOPK)
        .select(
            "node",
            F.round("r", 9).alias("pagerank"),
        )
    )


def _pagerank_sql(iters: int = PR_ITERS) -> str:
    ctes = [
        "n AS (SELECT count(*)::BIGINT AS n FROM documents)",
        "nodes AS (SELECT doc_id::BIGINT AS node FROM documents)",
        """edges AS (
  SELECT node AS src, ((node * node + 1) % n.n) AS dst FROM nodes, n
  UNION ALL
  SELECT node AS src, node // 2 AS dst FROM nodes
)""",
        "r0 AS (SELECT node, (1::DOUBLE) / n.n AS r FROM nodes, n)",
    ]
    for i in range(iters):
        ctes.append(
            f"""c{i + 1} AS (
  SELECT e.dst AS node, sum(r.r / 2) AS s
  FROM edges e JOIN r{i} r ON r.node = e.src GROUP BY e.dst
)"""
        )
        ctes.append(
            f"""r{i + 1} AS (
  SELECT nodes.node,
         round((1.0 - {PR_DAMP}) / n.n::DOUBLE
               + {PR_DAMP} * coalesce(c{i + 1}.s, 0::DOUBLE),
               {PR_ROUND}) AS r
  FROM nodes CROSS JOIN n LEFT JOIN c{i + 1} ON c{i + 1}.node = nodes.node
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT node, round(r, 9) AS pagerank
FROM r{iters} ORDER BY r DESC, node ASC LIMIT {PR_TOPK}
"""
    )


PAGERANK_SQL = _pagerank_sql()

QUERIES = {"graph_pagerank": pagerank}
ORACLES = {"graph_pagerank": PAGERANK_SQL}
