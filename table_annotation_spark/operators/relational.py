"""Engine-representative relational operators over the TPC-H-ish testdata.

Each query exercises one join/agg/window shape the annotation engine relies
on (SURVEY.md §2.7-2.8), stated over the driver's star schema so it can be
oracled by DuckDB:

- rel_pricing_agg      : map-side-combinable hash agg (A1/A2 counters shape)
- rel_star_join        : broadcast dim joins (C3/C11 entity-id equi-join shape)
- rel_topk_window      : per-group top-K (L8 candidate truncation shape)
- rel_twohop_selfjoin  : shared-neighbor self-join (C5 2-hop shape)
- rel_band_selfjoin    : range-band join (L3 length-band blocking shape)
- rel_ordinal_runs     : lag-window consecutive-int check (A2 ORDINAL shape)
- rel_events_window    : event-time tumbling window agg (streaming shape in
                         batch; the streaming module runs the same plan via
                         readStream)
- rel_asof_join        : nearest-earlier-event (as-of) join via the
                         union-tag + running-last window pattern — the
                         time-series attribution operator Spark lacks
                         natively; oracled by DuckDB's native ASOF JOIN
- rel_rollup_pricing   : hierarchical subtotals (GROUP BY ROLLUP) as one
                         Expand + hash agg — never per-level re-scans
- rel_cube_pricing     : full grouping-set lattice (GROUP BY CUBE) with
                         grouping_id disambiguation — same one-Expand plan
- rel_pivot_orders     : long→wide conditional agg with an EXPLICIT pivot
                         value list (no schema-discovery distinct job)
- rel_anti_join        : LEFT ANTI membership complement (NOT EXISTS)
- rel_semi_join        : LEFT SEMI existence test (no row multiplication)
- rel_distinct_agg     : exact per-group distinct counts — the exact twin
                         gating approx_count_distinct (HLL) at scale
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def pricing_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_quantity") > 10)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("sum_qty"),
            F.sum(
                F.floor(F.col("l_extendedprice") * 100).cast("bigint")
            ).alias("sum_price_cents"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


PRICING_AGG_SQL = """
SELECT l_returnflag, l_linestatus,
       count(*)::BIGINT AS n_items,
       sum(l_quantity::BIGINT)::BIGINT AS sum_qty,
       sum(floor(l_extendedprice * 100)::BIGINT)::BIGINT AS sum_price_cents
FROM lineitem WHERE l_quantity > 10
GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus
"""


def star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint")).alias(
                "total_cents"
            ),
        )
        .orderBy("r_name")
    )


STAR_JOIN_SQL = """
SELECT r_name, count(*)::BIGINT AS n_orders,
       sum(floor(o_totalprice * 100)::BIGINT)::BIGINT AS total_cents
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name ORDER BY r_name
"""


def topk_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select(
            F.col("o_custkey").cast("bigint").alias("custkey"),
            F.col("rk").cast("bigint").alias("rk"),
            F.col("o_orderkey").cast("bigint").alias("orderkey"),
        )
        .orderBy("custkey", "rk")
    )


TOPK_WINDOW_SQL = """
WITH r AS (
  SELECT o_custkey, o_orderkey,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
  FROM orders
)
SELECT o_custkey::BIGINT AS custkey, rk::BIGINT AS rk,
       o_orderkey::BIGINT AS orderkey
FROM r WHERE rk <= 3 ORDER BY custkey, rk
"""


def twohop_selfjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hop via shared node: customers and suppliers sharing a nation —
    the C5 subgraph-intersection join shape."""
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    return (
        c.join(s, c["c_nationkey"] == s["s_nationkey"])
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_paths"),
            F.countDistinct("c_custkey").cast("bigint").alias("n_customers"),
            F.countDistinct("s_suppkey").cast("bigint").alias("n_suppliers"),
        )
        .orderBy("nationkey")
    )


TWOHOP_SQL = """
SELECT c_nationkey AS nationkey, count(*)::BIGINT AS n_paths,
       count(DISTINCT c_custkey)::BIGINT AS n_customers,
       count(DISTINCT s_suppkey)::BIGINT AS n_suppliers
FROM customer JOIN supplier ON c_nationkey = s_nationkey
GROUP BY c_nationkey ORDER BY nationkey
"""


def band_selfjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-band self-join: parts of the same brand within a size band of
    ±2 — the L3 length-band blocking predicate shape."""
    p = _t(spark, sf_dir, "part")
    a = p.select(F.col("p_partkey").alias("pk_a"), F.col("p_brand").alias("brand"),
                 F.col("p_size").alias("size_a"))
    b = p.select(F.col("p_partkey").alias("pk_b"), F.col("p_brand").alias("brand"),
                 F.col("p_size").alias("size_b"))
    return (
        a.join(b, "brand")
        .where(
            (F.col("pk_a") < F.col("pk_b"))
            & (F.abs(F.col("size_a") - F.col("size_b")) <= 2)
        )
        .groupBy("brand")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
        .orderBy("brand")
    )


BAND_SQL = """
SELECT a.p_brand AS brand, count(*)::BIGINT AS n_pairs
FROM part a JOIN part b
  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
  AND abs(a.p_size - b.p_size) <= 2
GROUP BY a.p_brand ORDER BY brand
"""


def ordinal_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-int detection per order over linenumbers (lag window) —
    the A2 ORDINAL index-column check shape."""
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
    stepped = li.withColumn("prev", F.lag("l_linenumber").over(w)).withColumn(
        "ok",
        (F.col("prev").isNull() | (F.col("l_linenumber") == F.col("prev") + 1)).cast("int"),
    )
    return (
        stepped.groupBy("l_orderkey")
        .agg((F.min("ok") == 1).alias("is_consecutive"),
             F.count(F.lit(1)).cast("bigint").alias("n_lines"))
        .groupBy("is_consecutive")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"),
             F.sum("n_lines").cast("bigint").alias("n_lines"))
        .orderBy("is_consecutive")
    )


ORDINAL_SQL = """
WITH s AS (
  SELECT l_orderkey,
         CASE WHEN lag(l_linenumber) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) IS NULL
                   OR l_linenumber = lag(l_linenumber) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) + 1
              THEN 1 ELSE 0 END AS ok
  FROM lineitem
), per_order AS (
  SELECT l_orderkey, min(ok) = 1 AS is_consecutive, count(*) AS n_lines
  FROM s GROUP BY l_orderkey
)
SELECT is_consecutive, count(*)::BIGINT AS n_orders, sum(n_lines)::BIGINT AS n_lines
FROM per_order GROUP BY is_consecutive ORDER BY is_consecutive
"""


def events_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window aggregation (batch form of the
    streaming plan in streaming/events_stream.py)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", "ts").alias("window_start"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.sum(F.floor(F.col("value") * 1000).cast("bigint")).alias("value_milli"),
        )
        .orderBy("window_start", "event_type")
    )


EVENTS_WINDOW_SQL = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*)::BIGINT AS n_events,
       count(DISTINCT user_id)::BIGINT AS n_users,
       sum(floor(value * 1000)::BIGINT)::BIGINT AS value_milli
FROM events GROUP BY 1, 2 ORDER BY window_start, event_type
"""

def _us(col: str):
    """Epoch microseconds of a parquet timestamp: the testdata stores
    TIMESTAMP_NTZ, which unix_micros rejects — cast via TIMESTAMP under the
    session's pinned UTC zone (identical to DuckDB's epoch_us on naive)."""
    return F.unix_micros(F.col(col).cast("timestamp"))


def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase event picks the most recent view event at
    or before it by the same user — the nearest-earlier-event join Spark has
    no native operator for (time-series feature attribution at training-data
    scale). Implemented as the scalable union-tag pattern: tag both sides,
    sort within user by (ts, side) — views before purchases on equal ts so
    'at or before' is inclusive — and carry the last view forward with a
    running ``last(ignorenulls)`` window. One shuffle on user_id, no range
    self-join, linear in events per user; at 100 TB this partitions by the
    key exactly like the DuckDB ASOF JOIN the oracle states. View-side
    (user, ts) ties are deduped to the max event_id in BOTH engines so the
    pick is deterministic."""
    e = _t(spark, sf_dir, "events")
    views = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(
            F.max("event_id").alias("r_id"),
            F.max_by("value", "event_id").alias("r_value"),
        )
    )
    r = views.select(
        "user_id", "ts", F.lit(0).alias("side"),
        "r_id", _us("ts").alias("r_ts_us"), "r_value",
        F.lit(None).cast("bigint").alias("event_id"),
        F.lit(None).cast("double").alias("value"),
    )
    p = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(1).alias("side"),
        F.lit(None).cast("bigint").alias("r_id"),
        F.lit(None).cast("bigint").alias("r_ts_us"),
        F.lit(None).cast("double").alias("r_value"),
        "event_id", "value",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = (
        r.unionByName(p)
        .withColumn("view_id", F.last("r_id", ignorenulls=True).over(w))
        .withColumn("view_ts_us", F.last("r_ts_us", ignorenulls=True).over(w))
        .withColumn("view_value", F.last("r_value", ignorenulls=True).over(w))
    )
    return (
        u.where(F.col("side") == 1)
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").cast("bigint").alias("user_id"),
            _us("ts").alias("purchase_ts_us"),
            F.col("value").alias("purchase_value"),
            F.col("view_id").cast("bigint").alias("view_id"),
            F.col("view_ts_us").cast("bigint").alias("view_ts_us"),
            "view_value",
            (_us("ts") - F.col("view_ts_us"))
            .cast("bigint")
            .alias("gap_us"),
        )
        .orderBy("purchase_id")
    )


ASOF_SQL = """
WITH v AS (
  SELECT user_id, ts,
         max(event_id) AS r_id,
         arg_max(value, event_id) AS r_value
  FROM events WHERE event_type = 'view' GROUP BY user_id, ts
), p AS (
  SELECT * FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id::BIGINT AS purchase_id,
       p.user_id::BIGINT AS user_id,
       epoch_us(p.ts)::BIGINT AS purchase_ts_us,
       p.value AS purchase_value,
       v.r_id::BIGINT AS view_id,
       epoch_us(v.ts)::BIGINT AS view_ts_us,
       v.r_value AS view_value,
       (epoch_us(p.ts) - epoch_us(v.ts))::BIGINT AS gap_us
FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
ORDER BY purchase_id
"""

ORACLES = {
    "rel_pricing_agg": PRICING_AGG_SQL,
    "rel_star_join": STAR_JOIN_SQL,
    "rel_topk_window": TOPK_WINDOW_SQL,
    "rel_twohop_selfjoin": TWOHOP_SQL,
    "rel_band_selfjoin": BAND_SQL,
    "rel_ordinal_runs": ORDINAL_SQL,
    "rel_events_window": EVENTS_WINDOW_SQL,
    "rel_asof_join": ASOF_SQL,
}

QUERIES = {
    "rel_pricing_agg": pricing_agg,
    "rel_star_join": star_join,
    "rel_topk_window": topk_window,
    "rel_twohop_selfjoin": twohop_selfjoin,
    "rel_band_selfjoin": band_selfjoin,
    "rel_ordinal_runs": ordinal_runs,
    "rel_events_window": events_window,
    "rel_asof_join": asof_join,
}


# ---------------------------------------------------------------------------
# ROLLUP subtotal aggregation (hypertable-rollup shape)
# ---------------------------------------------------------------------------


def rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals over (l_returnflag, l_linestatus) via ROLLUP:
    leaf groups + per-flag subtotals + grand total in ONE pass — the rollup
    shape a time-series/hypertable engine materializes continuously.

    Scale posture: Spark expands rollup into a single hash aggregate over
    the grouping-set id (one exchange, map-side partial aggregation); no
    repeated scans per level. Money summed in integer cents."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("sum_qty"),
            F.sum(
                F.floor(F.col("l_extendedprice") * 100).cast("bigint")
            ).alias("sum_price_cents"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


ROLLUP_PRICING_SQL = """
SELECT l_returnflag, l_linestatus,
       count(*)::BIGINT AS n_items,
       sum(l_quantity::BIGINT)::BIGINT AS sum_qty,
       sum(floor(l_extendedprice * 100)::BIGINT)::BIGINT AS sum_price_cents
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
"""

ORACLES["rel_rollup_pricing"] = ROLLUP_PRICING_SQL
QUERIES["rel_rollup_pricing"] = rollup_pricing


# ---------------------------------------------------------------------------
# CUBE (full grouping-set lattice) — the grouping-sets twin of rollup
# ---------------------------------------------------------------------------


def cube_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All 2^2 grouping sets over (l_returnflag, l_linestatus) via CUBE,
    disambiguated by grouping_id (Spark's bitmask — MSB = first grouping
    column, bit set when the column is aggregated away — matches DuckDB's
    GROUPING(a, b), verified empirically). grouping_id, not NULL-sniffing:
    a genuine NULL data value in a grouping column is indistinguishable
    from a subtotal NULL without it.

    Scale posture: like rollup, Spark compiles CUBE into ONE Expand (4×
    row replication) feeding a single map-side-combinable hash aggregate —
    one scan, one exchange, never 4 re-scans (plan-pinned in
    tests/test_relational_shapes.py). Money in integer cents."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("sum_qty"),
            F.sum(
                F.floor(F.col("l_extendedprice") * 100).cast("bigint")
            ).alias("sum_price_cents"),
        )
        .select("l_returnflag", "l_linestatus", "gid",
                "n_items", "sum_qty", "sum_price_cents")
        .orderBy(
            F.col("gid"),
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


CUBE_PRICING_SQL = """
SELECT l_returnflag, l_linestatus,
       GROUPING(l_returnflag, l_linestatus)::BIGINT AS gid,
       count(*)::BIGINT AS n_items,
       sum(l_quantity::BIGINT)::BIGINT AS sum_qty,
       sum(floor(l_extendedprice * 100)::BIGINT)::BIGINT AS sum_price_cents
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
"""

ORACLES["rel_cube_pricing"] = CUBE_PRICING_SQL
QUERIES["rel_cube_pricing"] = cube_pricing


# ---------------------------------------------------------------------------
# PIVOT (long -> wide conditional aggregation)
# ---------------------------------------------------------------------------

PIVOT_STATUSES = ("F", "O", "P")


def pivot_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order counts per priority pivoted on order status (long -> wide).
    Spark's groupBy().pivot() with an EXPLICIT value list — never the
    value-discovering form, which costs an extra distinct scan and makes
    the output schema data-dependent (a breaking change waiting to happen
    at 100 TB).

    Scale posture: explicit-values pivot compiles to one hash aggregate
    with N conditional counters — map-side combinable, one exchange."""
    o = _t(spark, sf_dir, "orders")
    wide = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", list(PIVOT_STATUSES))
        .agg(F.count(F.lit(1)))
    )
    return wide.select(
        "o_orderpriority",
        *[
            F.coalesce(F.col(f"`{s}`"), F.lit(0))
            .cast("bigint")
            .alias(f"n_status_{s.lower()}")
            for s in PIVOT_STATUSES
        ],
    ).orderBy("o_orderpriority")


_PIVOT_COLS = ",\n".join(
    f"       count(*) FILTER (o_orderstatus = '{s}')::BIGINT AS n_status_{s.lower()}"
    for s in PIVOT_STATUSES
)

PIVOT_ORDERS_SQL = f"""
SELECT o_orderpriority,
{_PIVOT_COLS}
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""

ORACLES["rel_pivot_orders"] = PIVOT_ORDERS_SQL
QUERIES["rel_pivot_orders"] = pivot_orders


# ---------------------------------------------------------------------------
# Anti / semi join shapes (set-membership filtering)
# ---------------------------------------------------------------------------


ANTI_PRICE_FLOOR = 300_000  # non-vacuous at every testdata SF (3/30/~300 custs)


def anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no high-value order (o_totalprice > 300k), counted
    per nation — the LEFT ANTI join shape (TPC-H Q22's NOT EXISTS; in
    this engine: cells with no candidate after lookup, documents with no
    prior fingerprint).

    Scale posture: left_anti needs only the right side's join KEY — the
    price predicate is pushed into the orders scan and the projection is
    pruned to o_custkey (both asserted in test_plans), so the filtered
    key set is far smaller than the orders table and AQE can broadcast
    it even when the full table could never be broadcast. NOT EXISTS,
    not NOT IN, in the oracle: NOT IN returns an empty set if any NULL
    key slips in; anti-join semantics match NOT EXISTS."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    big = o.where(F.col("o_totalprice") > ANTI_PRICE_FLOOR).select("o_custkey")
    return (
        c.join(big, c.c_custkey == big.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_custs_no_big_order"),
            F.sum(
                F.floor(F.col("c_acctbal") * 100).cast("bigint")
            ).alias("sum_acctbal_cents"),
        )
        .orderBy("c_nationkey")
    )


ANTI_JOIN_SQL = f"""
SELECT c_nationkey,
       count(*)::BIGINT AS n_custs_no_big_order,
       sum(floor(c_acctbal * 100)::BIGINT)::BIGINT AS sum_acctbal_cents
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > {ANTI_PRICE_FLOOR})
GROUP BY c_nationkey ORDER BY c_nationkey
"""

ORACLES["rel_anti_join"] = ANTI_JOIN_SQL
QUERIES["rel_anti_join"] = anti_join_customers


def semi_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders containing at least one heavy line item (l_quantity > 45),
    counted per priority — the LEFT SEMI join shape (EXISTS): membership
    test without multiplying rows, so no downstream distinct is needed.

    Scale posture: the quantity predicate is pushed into the lineitem
    scan (PushedFilters) and only l_orderkey survives the projection;
    semi join never duplicates the left side, so the aggregate input
    stays exactly |orders| rows."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    heavy = li.where(F.col("l_quantity") > 45).select("l_orderkey")
    return (
        o.join(heavy, o.o_orderkey == heavy.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_heavy_orders"))
        .orderBy("o_orderpriority")
    )


SEMI_JOIN_SQL = """
SELECT o_orderpriority, count(*)::BIGINT AS n_heavy_orders
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""

ORACLES["rel_semi_join"] = SEMI_JOIN_SQL
QUERIES["rel_semi_join"] = semi_join_orders


# ---------------------------------------------------------------------------
# Exact distinct counts — the exact twin of approx_count_distinct (HLL)
# ---------------------------------------------------------------------------


def distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group distinct cardinalities (parts/suppliers touched per
    return flag). This is the EXACT twin that gates Spark's HLL sketch:
    at 100 TB the plan of record is approx_count_distinct (fixed-size
    sketch, one pass, mergeable map-side) and this query is the
    small-scale ground truth it is validated against — the same
    exact-twin discipline as dedup_ngram_jaccard vs the LSH path.
    tests/test_plans.py asserts the HLL estimate lands within rsd of
    these exact counts.

    Scale posture: countDistinct expands to a two-level aggregate
    (partial distinct per partition, then merge) — no row explosion, no
    driver collect."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").cast("bigint").alias("n_parts"),
            F.countDistinct("l_suppkey").cast("bigint").alias("n_supps"),
            F.countDistinct("l_orderkey").cast("bigint").alias("n_orders"),
        )
        .orderBy("l_returnflag")
    )


DISTINCT_AGG_SQL = """
SELECT l_returnflag,
       count(DISTINCT l_partkey)::BIGINT AS n_parts,
       count(DISTINCT l_suppkey)::BIGINT AS n_supps,
       count(DISTINCT l_orderkey)::BIGINT AS n_orders
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""

ORACLES["rel_distinct_agg"] = DISTINCT_AGG_SQL
QUERIES["rel_distinct_agg"] = distinct_agg
