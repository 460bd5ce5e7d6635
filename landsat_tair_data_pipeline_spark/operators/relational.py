"""Relational operator inventory over the driver's TPC-H-ish tables.

Covers SURVEY.md §2.2–§2.5, §2.7 (projections, filters, every join
flavor incl. semi/anti, global + grouped + rollup/cube aggregations,
windows, sorts/limits/top-k, set ops) plus scalar function coverage.
The reference has no SQL surface (SURVEY.md §3 — eager Python call
tree); these are the Spark-first equivalents the engine exposes.

Scale notes (100 TB stance):
- Dimension joins (`nation`, `region`, `supplier`, `customer`, `part`)
  are explicitly `broadcast()` — no shuffle of the fact side.
- Fact-fact joins (lineitem ⋈ orders) shuffle on the join key; AQE
  handles skew.
- All aggregations are expressed declaratively → Catalyst plans
  partial (map-side) aggregation automatically.
- Floating-point columns produced by accumulation are rounded the same
  way on both the Spark and oracle side (accumulation order differs
  between engines); passthrough doubles stay untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import QuerySpec
from ..sources.tables import table

# ---------------------------------------------------------------------------
# Aggregations (SURVEY §2.5: agg_count, agg_summary_stats with the
# stddev_pop trap, agg_count_distinct, grouped variants)
# ---------------------------------------------------------------------------


def q1_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1 shape: filter → groupBy → 8 aggregates. Flagship agg
    query; whole-stage-codegen end to end, partial agg map-side."""
    li = table(spark, sf, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            # +1e-6 on the multi-decimal revenue sums (NOT the exact
            # 2-dec base-price / integer qty sums): 4-6-decimal exact
            # rationals at 1e9 magnitude land on .xx5 rounding ties,
            # where accumulation-order noise flips engines — the q7/q8
            # magnitude rule applied proactively after the r7 sf0.1
            # sweep caught q7
            F.round(F.sum(disc_price) + 1e-6, 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))) + 1e-6, 2).alias("sum_charge"),
            F.round(F.avg("l_quantity") + 1e-9, 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice") + 1e-9, 4).alias("avg_price"),
            F.round(F.avg("l_discount") + 1e-9, 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2)                                          AS sum_qty,
       ROUND(SUM(l_extendedprice), 2)                                     AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)) + 1e-6, 2)           AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)) + 1e-6, 2) AS sum_charge,
       ROUND(AVG(l_quantity) + 1e-9, 4)                                          AS avg_qty,
       ROUND(AVG(l_extendedprice) + 1e-9, 4)                                     AS avg_price,
       ROUND(AVG(l_discount) + 1e-9, 4)                                          AS avg_disc,
       COUNT(*)                                                           AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def agg_summary_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Global min/max/avg/stddev over air-temp analog (SURVEY §2.5
    agg_summary_stats). Trap: the reference uses numpy .std() = ddof=0
    → stddev_pop, NOT Spark's default sample stddev (main.py:111-113)."""
    li = table(spark, sf, "lineitem")
    return li.agg(
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.round(F.avg("l_quantity") + 1e-9, 4).alias("avg_qty"),
        F.round(F.stddev_pop("l_quantity") + 1e-9, 4).alias("std_qty"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.round(F.avg("l_extendedprice") + 1e-9, 4).alias("avg_price"),
        F.round(F.stddev_pop("l_extendedprice") + 1e-9, 4).alias("std_price"),
        F.count(F.lit(1)).alias("n_rows"),
    )


_SUMMARY_SQL = """
SELECT MIN(l_quantity)                    AS min_qty,
       MAX(l_quantity)                    AS max_qty,
       ROUND(AVG(l_quantity) + 1e-9, 4)          AS avg_qty,
       ROUND(STDDEV_POP(l_quantity) + 1e-9, 4)   AS std_qty,
       MIN(l_extendedprice)               AS min_price,
       MAX(l_extendedprice)               AS max_price,
       ROUND(AVG(l_extendedprice) + 1e-9, 4)     AS avg_price,
       ROUND(STDDEV_POP(l_extendedprice) + 1e-9, 4) AS std_price,
       COUNT(*)                           AS n_rows
FROM lineitem
"""


def agg_count_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """SURVEY §2.5 agg_count_distinct (main.py:109-110). At 100 TB the
    approx_count_distinct variant avoids the exact-distinct shuffle;
    exact form here for the oracle."""
    li = table(spark, sf, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.count(F.lit(1)).alias("n_rows"),
    )


_COUNT_DISTINCT_SQL = """
SELECT COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_suppkey) AS n_supps,
       COUNT(DISTINCT l_orderkey) AS n_orders,
       COUNT(*)                  AS n_rows
FROM lineitem
"""


def agg_bitmap_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """EXACT distinct-user counts per day — and re-aggregated across
    all days — via Spark's bitmap aggregate family (the warehouse
    pattern for exact distinct at scale; same result as
    COUNT(DISTINCT) but a fundamentally different plan).

    Why this beats count_distinct at 100 TB: a grouped COUNT(DISTINCT)
    shuffles every (day, user_id) pair and holds per-group hash sets;
    multiple distinct aggregates trigger the Expand-based rewrite.
    Here each user lands in a 32k-bit bucket (bitmap_bucket_number /
    bitmap_bit_position), bitmap_construct_agg builds per-(day,
    bucket) bitmaps WITH map-side partial merge (TypedImperative
    buffers OR together), so the shuffle carries at most one 4 KB
    bitmap per (day, bucket) per map task instead of the raw pairs.
    The per-bucket bitmaps are also REAGGREGABLE — the 'ALL' row
    OR-merges the daily bitmaps (bitmap_or_agg) without rescanning
    the fact table, the exact-count analogue of an HLL union rollup
    (agg_sketch_hll) with zero approximation error. The bitmap frame
    is persisted once and feeds both rollup levels."""
    bm = _daily_user_bitmaps(spark, sf)
    daily = bm.groupBy("day").agg(
        F.sum(F.bitmap_count("bm")).cast("bigint").alias("n_users")
    ).select(F.col("day").cast("string").alias("day"), "n_users")
    overall = (
        bm.groupBy("bkt")
        .agg(F.bitmap_or_agg("bm").alias("bm"))
        .agg(F.sum(F.bitmap_count("bm")).cast("bigint").alias("n_users"))
        .select(F.lit("ALL").alias("day"), "n_users")
    )
    return daily.unionByName(overall)


def _daily_user_bitmaps(spark: SparkSession, sf: str) -> DataFrame:
    """Shared bitmap-construction core of the exact-distinct family
    (agg_bitmap_distinct / window_distinct_trailing): per-(day,
    32k-bucket) user bitmaps, persisted once — the single fact-table
    shuffle every rollup level reaggregates from."""
    from ..util import persist_tracked

    ev = table(spark, sf, "events").select(
        F.to_date("ts").alias("day"),
        F.bitmap_bucket_number("user_id").alias("bkt"),
        F.bitmap_bit_position("user_id").alias("pos"),
    )
    return persist_tracked(
        ev.groupBy("day", "bkt").agg(F.bitmap_construct_agg("pos").alias("bm"))
    )


_BITMAP_DISTINCT_SQL = """
SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
GROUP BY 1
UNION ALL
SELECT 'ALL' AS day,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
"""


def window_distinct_trailing(spark: SparkSession, sf: str) -> DataFrame:
    """EXACT trailing-7-day distinct users per day (rolling DAU/WAU) —
    the window aggregate SQL cannot express scalably: COUNT(DISTINCT)
    OVER a RANGE frame isn't supported, and the standard workaround
    (explode every EVENT into the 7 windows it feeds, then per-window
    distinct) shuffles the fact table 7x and re-deduplicates raw pairs
    per window.

    Composition over agg_bitmap_distinct's machinery instead: events
    shuffle ONCE into per-(day, 32k-bucket) bitmaps; each bitmap row —
    days x buckets of them, independent of event count — fans out to
    the <= 7 window anchors it feeds (sequence + explode, an equi
    join on observed anchor days, never a nested-loop date-range
    probe, which is days^2 x buckets comparisons at a decade of
    retention), and bitmap_or_agg re-merges per (anchor, bucket).
    Exactness for free: OR of exact bitmaps is exact — no HLL error
    bar — and windows with fewer than 7 observed days merge only what
    exists, matching the oracle's BETWEEN. The daily bitmap frame is
    persisted once and feeds both the 1-day and the 7-day rollup."""
    bm = _daily_user_bitmaps(spark, sf)
    days = bm.select(F.col("day").alias("d")).distinct()
    daily = bm.groupBy("day").agg(
        F.sum(F.bitmap_count("bm")).cast("bigint").alias("n_users_1d")
    )
    trailing = (
        bm.select(
            F.explode(F.sequence("day", F.date_add("day", 6))).alias("d"),
            "bkt",
            "bm",
        )
        .join(F.broadcast(days), "d")
        .groupBy("d", "bkt")
        .agg(F.bitmap_or_agg("bm").alias("bm"))
        .groupBy("d")
        .agg(F.sum(F.bitmap_count("bm")).cast("bigint").alias("n_users_7d"))
    )
    return trailing.join(daily, trailing.d == daily.day).select(
        F.col("d").alias("day"), "n_users_1d", "n_users_7d"
    )


_DISTINCT_TRAILING_SQL = """
WITH e AS (SELECT CAST(ts AS DATE) AS day, user_id FROM events),
days AS (SELECT DISTINCT day FROM e),
daily AS (
  SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users_1d
  FROM e GROUP BY day),
roll AS (
  SELECT d.day, CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users_7d
  FROM days d JOIN e ON e.day BETWEEN d.day - 6 AND d.day
  GROUP BY d.day)
SELECT t.day, daily.n_users_1d, t.n_users_7d
FROM roll t JOIN daily ON daily.day = t.day
"""


def agg_group_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Grouped summary stats per station-analog (SURVEY §2.5 note:
    grouped variants of the reference's global-only aggregates)."""
    li = table(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.avg("l_discount") + 1e-9, 4).alias("avg_disc"),
        F.round(F.stddev_pop("l_discount") + 1e-9, 4).alias("std_disc"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
    )


_GROUP_STATS_SQL = """
SELECT l_returnflag,
       COUNT(*)                          AS n_rows,
       ROUND(AVG(l_discount) + 1e-9, 4)         AS avg_disc,
       ROUND(STDDEV_POP(l_discount) + 1e-9, 4)  AS std_disc,
       MIN(l_shipdate)                   AS first_ship,
       MAX(l_shipdate)                   AS last_ship
FROM lineitem
GROUP BY l_returnflag
"""


def agg_rollup(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


_ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       COUNT(*)                  AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def agg_cube(spark: SparkSession, sf: str) -> DataFrame:
    o = table(spark, sf, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


_CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority,
       COUNT(*)                    AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS sum_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def agg_conditional(spark: SparkSession, sf: str) -> DataFrame:
    """Pivot-style conditional aggregation (CASE WHEN inside COUNT),
    customer dim broadcast so only the fact side streams."""
    c = table(spark, sf, "customer")
    o = table(spark, sf, "orders")
    joined = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
    return joined.groupBy("c_nationkey").agg(
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_open"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_filled"),
        F.count(F.when(F.col("o_orderstatus") == "P", 1)).alias("n_pending"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


_CONDITIONAL_SQL = """
SELECT c_nationkey,
       COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_open,
       COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_filled,
       COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_pending,
       ROUND(SUM(o_totalprice), 2)                     AS sum_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_nationkey
"""


def agg_having(spark: SparkSession, sf: str) -> DataFrame:
    o = table(spark, sf, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
        .where(F.col("n_orders") >= 15)
    )


_HAVING_SQL = """
SELECT o_custkey, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS sum_price
FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 15
"""


# ---------------------------------------------------------------------------
# Joins (SURVEY §2.4: equi, broadcast dim, semi, anti, outer+coalesce —
# the reference's implicit inner-join drops exposed as explicit flavors)
# ---------------------------------------------------------------------------


def q3_shipping_priority(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join, filter, group, top-10. customer is
    broadcast; orders ⋈ lineitem shuffles on orderkey. Ranking uses the
    rounded revenue + orderkey tiebreak → fully deterministic."""
    c = table(spark, sf, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf, "orders").where(
        F.col("o_orderdate") < F.to_timestamp(F.lit("1998-03-15"))
    )
    li = table(spark, sf, "lineitem").where(
        F.col("l_shipdate") > F.to_timestamp(F.lit("1998-03-15"))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                + 1e-6,
                2,
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


_Q3_SQL = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       ROUND(SUM(l_extendedprice * (1 - l_discount)) + 1e-6, 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate  > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q5_local_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join through two dimension chains with the
    c_nationkey = s_nationkey locality predicate. All dims broadcast →
    the only shuffle is lineitem ⋈ orders."""
    c = table(spark, sf, "customer")
    o = table(spark, sf, "orders").where(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-01-01")))
    )
    li = table(spark, sf, "lineitem")
    s = table(spark, sf, "supplier")
    n = table(spark, sf, "nation")
    r = table(spark, sf, "region").where(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                + 1e-6,
                2,
            ).alias("revenue")
        )
    )


_Q5_SQL = """
SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)) + 1e-6, 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


def join_semi(spark: SparkSession, sf: str) -> DataFrame:
    """left_semi: orders containing at least one max-quantity line.
    The reference's inner-join row-keeping (feature_extractor.py:98-100)
    exposed as an explicit semi join (SURVEY §2.4 note)."""
    o = table(spark, sf, "orders")
    big = table(spark, sf, "lineitem").where(F.col("l_quantity") >= 49)
    return o.join(big, o.o_orderkey == big.l_orderkey, "left_semi").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )


_SEMI_SQL = """
SELECT o_orderkey, o_totalprice, o_orderstatus
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
"""


def join_anti(spark: SparkSession, sf: str) -> DataFrame:
    """left_anti: customers with no orders (the reference's silent
    missing-station drop, inverted — SURVEY §2.4)."""
    c = table(spark, sf, "customer")
    o = table(spark, sf, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_nationkey"
    )


_ANTI_SQL = """
SELECT c_custkey, c_name, c_nationkey
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def join_outer_coalesce(spark: SparkSession, sf: str) -> DataFrame:
    """LEFT OUTER + coalesce-to-default: the engine's NULL-first stance
    with sentinel only at the boundary (SURVEY §1.7 sentinel mapping;
    join_gt_lookup's coalesce(air_temp, -9999.0) analog)."""
    c = table(spark, sf, "customer")
    o = table(spark, sf, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.round(F.sum("o_totalprice"), 2), F.lit(0.0)).alias(
                "total_spent"
            ),
        )
    )


_OUTER_SQL = """
SELECT c_custkey,
       COUNT(o_orderkey)                              AS n_orders,
       COALESCE(ROUND(SUM(o_totalprice), 2), 0.0)     AS total_spent
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
"""


# ---------------------------------------------------------------------------
# Windows / sorts / top-k (SURVEY §2.7 — absent from the reference,
# table stakes for the engine; ext_topk from §2.12)
# ---------------------------------------------------------------------------


def window_rank(spark: SparkSession, sf: str) -> DataFrame:
    o = table(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


_WINDOW_RANK_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders) t
WHERE rn <= 3
"""


def window_lag_lead(spark: SparkSession, sf: str) -> DataFrame:
    """lag/lead over per-customer order history. IEEE subtraction of
    identical operands is deterministic → no rounding needed."""
    o = table(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        (F.col("o_totalprice") - F.lag("o_totalprice").over(w)).alias("delta_prev"),
    )


_WINDOW_LAG_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice,
       LAG(o_totalprice)  OVER w AS prev_price,
       LEAD(o_totalprice) OVER w AS next_price,
       o_totalprice - LAG(o_totalprice) OVER w AS delta_prev
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


def window_running_sum(spark: SparkSession, sf: str) -> DataFrame:
    """Cumulative frame (rowsBetween unboundedPreceding→currentRow):
    both engines accumulate in identical frame order → round(2) safe."""
    o = table(spark, sf, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


_WINDOW_RUNNING_SQL = """
SELECT o_custkey, o_orderkey,
       ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
FROM orders
"""


def ext_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Per-group top-k (SURVEY §2.12 ext_topk): top 5 parts per brand.
    At scale this is the canonical rank-then-filter; AQE coalesces the
    per-brand partitions."""
    p = table(spark, sf, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), "p_partkey")
    return (
        p.withColumn("rank_in_brand", F.row_number().over(w).cast("long"))
        .where(F.col("rank_in_brand") <= 5)
        .select("p_brand", "p_partkey", "p_retailprice", "rank_in_brand")
    )


_TOPK_SQL = """
SELECT p_brand, p_partkey, p_retailprice, rank_in_brand FROM (
  SELECT p_brand, p_partkey, p_retailprice,
         ROW_NUMBER() OVER (PARTITION BY p_brand
                            ORDER BY p_retailprice DESC, p_partkey) AS rank_in_brand
  FROM part) t
WHERE rank_in_brand <= 5
"""


def sort_limit(spark: SparkSession, sf: str) -> DataFrame:
    """Global top-N: Spark plans TakeOrderedAndProject (per-partition
    top-N + driver merge), no full sort shuffle — the 100 TB-safe path."""
    li = table(spark, sf, "lineitem")
    return (
        li.orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity")
        .limit(20)
    )


_SORT_LIMIT_SQL = """
SELECT l_orderkey, l_linenumber, l_extendedprice, l_quantity
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Set operations (SURVEY §2.7)
# ---------------------------------------------------------------------------


def setop_union(spark: SparkSession, sf: str) -> DataFrame:
    c = table(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


_UNION_SQL = """
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
"""


def setop_intersect(spark: SparkSession, sf: str) -> DataFrame:
    c = table(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


_INTERSECT_SQL = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
"""


def setop_except(spark: SparkSession, sf: str) -> DataFrame:
    c = table(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)  # EXCEPT DISTINCT semantics, matching the SQL form


_EXCEPT_SQL = """
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier
"""


def distinct_proj(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


_DISTINCT_SQL = "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"


# ---------------------------------------------------------------------------
# Projections / filters / scalar functions (SURVEY §2.2–2.3, §2.6's
# str→float cast analog)
# ---------------------------------------------------------------------------


def proj_date_parts(spark: SparkSession, sf: str) -> DataFrame:
    """SURVEY §2.2 proj_date_parts_csv / proj_scene_date_parse: derive
    year/month/day columns (data_loader.py:86-89). Int types matched to
    the oracle via explicit casts."""
    o = table(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("order_day"),
        F.quarter("o_orderdate").cast("long").alias("order_quarter"),
    )


_DATE_PARTS_SQL = """
SELECT o_orderkey,
       year(o_orderdate)        AS order_year,
       month(o_orderdate)       AS order_month,
       day(o_orderdate)         AS order_day,
       quarter(o_orderdate)     AS order_quarter
FROM orders
"""


def filt_predicates(spark: SparkSession, sf: str) -> DataFrame:
    """Compound predicate pushdown: range + IN + LIKE all reach the
    parquet scan (check .explain → PushedFilters). SURVEY §2.3."""
    p = table(spark, sf, "part")
    return p.where(
        (F.col("p_size").between(10, 40))
        & (F.col("p_type").isin("PROMO", "ECONOMY"))
        & (F.col("p_brand").like("Brand#1%"))
    ).select("p_partkey", "p_brand", "p_type", "p_size")


_FILT_SQL = """
SELECT p_partkey, p_brand, p_type, p_size
FROM part
WHERE p_size BETWEEN 10 AND 40
  AND p_type IN ('PROMO', 'ECONOMY')
  AND p_brand LIKE 'Brand#1%'
"""


def proj_string_funcs(spark: SparkSession, sf: str) -> DataFrame:
    c = table(spark, sf, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").cast("long").alias("name_len"),
        F.concat_ws("-", "c_mktsegment", F.col("c_custkey").cast("string")).alias(
            "seg_key"
        ),
        F.regexp_replace("c_name", "[0-9]", "#").alias("name_masked"),
    )


_STRING_SQL = """
SELECT c_custkey,
       upper(c_name)                              AS name_upper,
       substring(c_name, 1, 8)                    AS name_prefix,
       length(c_name)                             AS name_len,
       concat_ws('-', c_mktsegment, CAST(c_custkey AS VARCHAR)) AS seg_key,
       regexp_replace(c_name, '[0-9]', '#', 'g')  AS name_masked
FROM customer
"""


def proj_math_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """Scalar math coverage. sqrt is IEEE-correctly-rounded (identical
    across engines); ln/pow are libm-dependent → rounded."""
    li = table(spark, sf, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_disc_delta"),
        F.ceil("l_extendedprice").cast("long").alias("price_ceil"),
        F.floor("l_extendedprice").cast("long").alias("price_floor"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1.0) + 1e-9, 6).alias("price_ln"),
        F.round(F.pow("l_quantity", 1.5) + 1e-9, 6).alias("qty_pow"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).alias("key_mod"),
    )


_MATH_SQL = """
SELECT l_orderkey, l_linenumber,
       abs(l_discount - 0.05)                 AS abs_disc_delta,
       CAST(ceil(l_extendedprice) AS BIGINT)  AS price_ceil,
       CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
       sqrt(l_quantity)                       AS qty_sqrt,
       ROUND(ln(l_extendedprice + 1.0) + 1e-9, 6)    AS price_ln,
       ROUND(pow(l_quantity, 1.5) + 1e-9, 6)         AS qty_pow,
       l_orderkey % 7                         AS key_mod
FROM lineitem
"""


def proj_case_when(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-branch CASE (the reference's sensor dispatch analog,
    SURVEY §2.2 proj_sensor_flag)."""
    li = table(spark, sf, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_quantity") >= 40, "bulk")
        .when(F.col("l_quantity") >= 10, "standard")
        .otherwise("small")
        .alias("qty_class"),
        (F.col("l_discount") > 0.05).cast("int").alias("is_discounted"),
    )


_CASE_SQL = """
SELECT l_orderkey, l_linenumber,
       CASE WHEN l_quantity >= 40 THEN 'bulk'
            WHEN l_quantity >= 10 THEN 'standard'
            ELSE 'small' END                      AS qty_class,
       CAST(l_discount > 0.05 AS INTEGER)         AS is_discounted
FROM lineitem
"""


def window_range_frame(spark: SparkSession, sf: str) -> DataFrame:
    """RANGE frame (vs the ROWS frame above): per customer, total spend
    over orders within the preceding 30 days of each order — a value-
    based sliding frame keyed on days-since-epoch. Peer rows (same day)
    enter the frame together, which ROWS frames can't express."""
    o = table(spark, sf, "orders")
    day = F.datediff("o_orderdate", F.lit("1970-01-01"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day)
        .rangeBetween(-30, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("spend_30d"),
        F.count(F.lit(1)).over(w).alias("n_orders_30d"),
    )


_WINDOW_RANGE_SQL = """
SELECT o_custkey, o_orderkey,
       ROUND(SUM(o_totalprice) OVER w, 2) AS spend_30d,
       COUNT(*) OVER w                    AS n_orders_30d
FROM orders
WINDOW w AS (PARTITION BY o_custkey
             ORDER BY datediff('day', DATE '1970-01-01', o_orderdate)
             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
"""


def agg_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    """GROUPING SETS: the two single-dimension rollups in one pass over
    lineitem (what cube would over-produce), via the SQL surface."""
    table(spark, sf, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n_rows,
               ROUND(SUM(l_quantity), 2) AS sum_qty
        FROM lineitem_v
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


_GROUPING_SETS_SQL = """
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_rows,
       ROUND(SUM(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
"""


def q10_returned_items(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q10 shape: customers ranked by revenue lost to returns in
    a quarter — 4-way join (two broadcast dims), grouped revenue agg,
    top 20. Exercises join+agg+sort+limit in one plan."""
    li = table(spark, sf, "lineitem").where(F.col("l_returnflag") == "R")
    o = table(spark, sf, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    c = table(spark, sf, "customer")
    n = table(spark, sf, "nation")
    rev = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(rev + 1e-6, 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


_Q10_SQL = """
SELECT c_custkey, c_name, n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)) + 1e-6, 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-04-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q14_promo_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q14 shape: promo-style revenue share (predicate adapted to
    this data's p_type domain so the numerator is non-trivial) — conditional aggregate
    over a fact⋈dim join, one scalar out."""
    li = table(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    p = table(spark, sf, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").startswith("STANDARD"), rev).otherwise(0.0)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(rev) + 1e-9, 4).alias(
                "promo_revenue_pct"
            )
        )
    )


_Q14_SQL = """
SELECT ROUND(100.0 * SUM(CASE WHEN p_type LIKE 'STANDARD%'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0.0 END)
             / SUM(l_extendedprice * (1 - l_discount)) + 1e-9, 4)
         AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= DATE '1996-03-01' AND l_shipdate < DATE '1996-04-01'
"""


def q18_large_orders(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a
    threshold — aggregate-then-semi-join back to the fact (the
    classic HAVING-driven row selection across tables)."""
    li = table(spark, sf, "lineitem")
    o = table(spark, sf, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .where(F.col("total_qty") > 150)
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice", "total_qty")
    )


_Q18_SQL = """
SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice, total_qty
FROM orders
JOIN (SELECT l_orderkey, ROUND(SUM(l_quantity), 2) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING ROUND(SUM(l_quantity), 2) > 150) t
  ON o_orderkey = t.l_orderkey
"""


def q6_revenue_forecast(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q6 shape: revenue delta from a discount band — pure
    filtered scan + scalar aggregate, zero joins. The plan test of
    interest is that every predicate reaches the parquet scan."""
    li = table(spark, sf, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")) + 1e-6, 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


_Q6_SQL = """
SELECT ROUND(SUM(l_extendedprice * l_discount) + 1e-6, 2) AS revenue,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


def q7_volume_shipping(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q7 shape: cross-nation trade volume by year — supplier
    nation ≠ customer nation, revenue per (supp_nation, cust_nation,
    year). Both nation joins broadcast; the fact side streams."""
    li = table(spark, sf, "lineitem")
    o = table(spark, sf, "orders")
    c = table(spark, sf, "customer")
    s = table(spark, sf, "supplier")
    n1 = table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        # 1e-6, not the house 1e-9: revenue sums reach ~1e7 at sf0.1,
        # where double accumulation-order noise (~1e-8 absolute)
        # straddles .xx5 rounding boundaries — the q8 trap (NOTES r6),
        # hit live by q7 in the r7 sf0.1 parity sweep
        .agg(F.round(F.sum(rev) + 1e-6, 2).alias("revenue"))
    )


_Q7_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS l_year,
       ROUND(SUM(l_extendedprice * (1 - l_discount)) + 1e-6, 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name <> n2.n_name
GROUP BY 1, 2, 3
"""


def q13_order_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of orders per customer INCLUDING
    zero-order customers — the left-outer + count + re-group
    histogram."""
    c = table(spark, sf, "customer")
    o = table(spark, sf, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


_Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey) t
GROUP BY c_count
"""


def q15_top_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with maximum quarterly revenue —
    the revenue "view" joined against its own max. The max is a
    1-row broadcast, not a global sort."""
    li = table(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    s = table(spark, sf, "supplier")
    rev = (
        li.groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                + 1e-6,
                2,
            ).alias("total_revenue")
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.join(F.broadcast(mx), rev.total_revenue == mx.mx)
        .join(F.broadcast(s), rev.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


_Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey,
         ROUND(SUM(l_extendedprice * (1 - l_discount)) + 1e-6, 2)
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


def q17_small_quantity_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from orders under 20% of a part's
    average quantity — the correlated scalar subquery decorrelated
    into an aggregate + re-join (what Catalyst's subquery rewrite
    produces, written explicitly)."""
    li = table(spark, sf, "lineitem")
    p = table(spark, sf, "part").where(F.col("p_brand") == "Brand#1")
    avg_q = li.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(avg_q, li.l_partkey == F.col("ap_key"))
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0 + 1e-6, 2).alias(
                "avg_yearly"
            ),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


_Q17_SQL = """
SELECT ROUND(SUM(l1.l_extendedprice) / 7.0 + 1e-6, 2) AS avg_yearly,
       COUNT(*) AS n_rows
FROM lineitem l1
JOIN part ON l1.l_partkey = p_partkey
WHERE p_brand = 'Brand#1'
  AND l1.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                       FROM lineitem l2
                       WHERE l2.l_partkey = l1.l_partkey)
"""


def q4_order_priority(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q4 shape: priority histogram of orders with at least one
    late line item, via an EXISTS semi-join whose condition spans both
    sides (this schema has no commit/receipt dates, so "late" is
    shipped > 30 days after order date). The semi-join keeps each
    order at most once — no DISTINCT repair needed — and at 100 TB it
    shuffles only the quarter-filtered orders slice (the date filter
    is pushed to the scan)."""
    o = table(spark, sf, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    )
    li = table(spark, sf, "lineitem")
    late = o.join(
        li,
        (o["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > o["o_orderdate"] + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


_Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority
"""


def q9_profit_by_nation(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and year. No
    partsupp table in this schema, so cost is proxied as
    0.8·p_retailprice·l_quantity (the join tree — fact against three
    broadcast dimensions with a size-filtered part — is the point).
    One shuffle: the final (nation, year) aggregation."""
    li = table(spark, sf, "lineitem")
    s = table(spark, sf, "supplier")
    n = table(spark, sf, "nation")
    p = table(spark, sf, "part").where(F.col("p_size") <= 25)
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - (
        0.8 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").alias("o_year"),
        )
        .agg(F.round(F.sum(amount) + 1e-6, 2).alias("sum_profit"))
    )


_Q9_SQL = """
SELECT n_name AS nation,
       CAST(EXTRACT(year FROM l_shipdate) AS INT) AS o_year,
       ROUND(SUM(l_extendedprice * (1 - l_discount)
                 - 0.8 * p_retailprice * l_quantity) + 1e-6, 2)
           AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_size <= 25
GROUP BY 1, 2
"""


def q19_disjunctive_pushdown(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR-of-ANDs predicate
    spanning the fact (quantity) and the broadcast dimension
    (brand/size). Catalyst extracts the common part-side disjunction
    (brand ∈ {1,2,3}) below the join while the mixed residual stays a
    post-join filter — the scan reads only the three brands' rows."""
    li = table(spark, sf, "lineitem")
    p = table(spark, sf, "part")
    j = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 15)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 20)
            & F.col("l_quantity").between(10, 25)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 30)
            & F.col("l_quantity").between(20, 35)
        )
    )
    return j.where(cond).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            + 1e-6,
            2,
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


_Q19_SQL = """
SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)) + 1e-6, 2) AS revenue,
       COUNT(*) AS n_rows
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 1 AND 15)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20
       AND l_quantity BETWEEN 10 AND 25)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30
       AND l_quantity BETWEEN 20 AND 35)
"""


def setop_except_all(spark: SparkSession, sf: str) -> DataFrame:
    """MULTISET difference (EXCEPT ALL): per-row cardinality
    subtraction, not the set form setop_except covers — a nationkey
    appearing 40× among customers and 3× among suppliers survives 37
    times. Spark plans exceptAll as a counted anti-form (generate +
    aggregate), one shuffle."""
    c = table(spark, sf, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = table(spark, sf, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    # aggregate to counts: multiset results are order-free but the
    # driver hash needs a deterministic surface
    return c.exceptAll(s).groupBy("nationkey").agg(
        F.count(F.lit(1)).alias("n_surviving")
    )


_EXCEPT_ALL_SQL = """
SELECT nationkey, COUNT(*) AS n_surviving FROM (
  SELECT c_nationkey AS nationkey FROM customer
  EXCEPT ALL
  SELECT s_nationkey AS nationkey FROM supplier)
GROUP BY nationkey
"""


def setop_intersect_all(spark: SparkSession, sf: str) -> DataFrame:
    """MULTISET intersection (INTERSECT ALL): min-of-multiplicities
    semantics — the multiset complement of setop_intersect."""
    c = table(spark, sf, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = table(spark, sf, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersectAll(s).groupBy("nationkey").agg(
        F.count(F.lit(1)).alias("n_common")
    )


_INTERSECT_ALL_SQL = """
SELECT nationkey, COUNT(*) AS n_common FROM (
  SELECT c_nationkey AS nationkey FROM customer
  INTERSECT ALL
  SELECT s_nationkey AS nationkey FROM supplier)
GROUP BY nationkey
"""


def window_first_last(spark: SparkSession, sf: str) -> DataFrame:
    """first_value / last_value / nth_value window coverage: per
    user, the first, second, and latest event type in event-time
    order (total order tiebreak on event_id; last_value over the FULL
    frame — the default running frame is the classic
    last_value-looks-truncated trap)."""
    ev = table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wfull = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        ev.select(
            "user_id",
            F.first_value("event_type").over(wfull).alias("first_type"),
            F.nth_value("event_type", 2).over(wfull).alias("second_type"),
            F.last_value("event_type").over(wfull).alias("last_type"),
        )
        .distinct()
    )


_FIRST_LAST_SQL = """
SELECT DISTINCT user_id,
       FIRST_VALUE(event_type) OVER w AS first_type,
       NTH_VALUE(event_type, 2) OVER w AS second_type,
       LAST_VALUE(event_type) OVER w AS last_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


def q16_supplier_variety(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q16 shape: supplier variety per part category. No
    partsupp table here, so the part↔supplier relation is mined from
    lineitem's (l_partkey, l_suppkey) pairs; negative-balance
    suppliers are excluded the way Q16 excludes complaint suppliers.
    The distinct-supplier count shuffles once on the category key
    after a distinct pair projection."""
    li = table(spark, sf, "lineitem").select("l_partkey", "l_suppkey")
    p = table(spark, sf, "part").where(F.col("p_size") <= 20)
    bad = table(spark, sf, "supplier").where(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("bad_sk")
    )
    pairs = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(
            F.broadcast(bad), li["l_suppkey"] == F.col("bad_sk"), "left_anti"
        )
        .select("p_brand", "p_type", "p_size", "l_suppkey")
        .distinct()
    )
    return pairs.groupBy("p_brand", "p_type", "p_size").agg(
        F.countDistinct("l_suppkey").alias("supplier_cnt")
    )


_Q16_SQL = """
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_size <= 20
  -- NOT EXISTS, not NOT IN: the Spark side is a left_anti join, which
  -- keeps a row whose l_suppkey is NULL; NOT IN would drop ALL rows
  -- whenever the subquery is non-empty and a key is NULL (three-valued
  -- logic). Keys are non-null today — this pins the parity anyway.
  AND NOT EXISTS (SELECT 1 FROM supplier
                  WHERE s_acctbal < 0 AND s_suppkey = l_suppkey)
GROUP BY 1, 2, 3
"""


def q8_market_share(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_2's share of ASIA-market revenue by
    order year. The fact-fact lineitem⋈orders shuffle join carries two
    independent dimension chains — customer→nation→region gating the
    market, supplier→nation naming the seller — and the share is a
    conditional-sum over the same aggregate pass (no second scan).
    Only the genuinely bounded dims (nation, region) carry broadcast
    hints — customer and supplier grow with the fact data in TPC-H,
    so their joins are left to AQE (broadcast at test scale, shuffle
    at 100 TB); the one unavoidable big shuffle is lineitem⋈orders on
    orderkey."""
    li = table(spark, sf, "lineitem")
    o = table(spark, sf, "orders")
    c = table(spark, sf, "customer")
    s = table(spark, sf, "supplier")
    n = table(spark, sf, "nation")
    r = table(spark, sf, "region").where(F.col("r_name") == "ASIA")
    cust_in_region = (
        c.join(
            F.broadcast(n), c["c_nationkey"] == n["n_nationkey"]
        )
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("c_custkey")
    )
    supp_nation = s.join(
        F.broadcast(n), s["s_nationkey"] == n["n_nationkey"]
    ).select(F.col("s_suppkey").alias("sk"), F.col("n_name").alias("s_nation"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(cust_in_region, o["o_custkey"] == F.col("c_custkey"))
        .join(supp_nation, li["l_suppkey"] == F.col("sk"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("volume"),
            F.col("s_nation"),
        )
    )
    return joined.groupBy("o_year").agg(
        F.round(
            F.sum(F.when(F.col("s_nation") == "NATION_2", F.col("volume")))
            / F.sum("volume")
            + 1e-9,
            4,
        ).alias("mkt_share"),
        # 1e-6, not the house 1e-9: the yearly volume is ~1e8 where a
        # double's ULP is ~1.5e-8, so engine accumulation-order noise
        # (~1e-7) straddles .xx5 rounding boundaries that 1e-9 cannot
        # clear (observed live: ...172.545 split .55 vs .54)
        F.round(F.sum("volume") + 1e-6, 2).alias("total_volume"),
    )


_Q8_SQL = """
SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
       ROUND(SUM(CASE WHEN sn.n_name = 'NATION_2'
                      THEN l_extendedprice * (1 - l_discount) END)
             / SUM(l_extendedprice * (1 - l_discount)) + 1e-9, 4)
           AS mkt_share,
       ROUND(SUM(l_extendedprice * (1 - l_discount)) + 1e-6, 2)
           AS total_volume
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region ON cn.n_regionkey = r_regionkey AND r_name = 'ASIA'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
GROUP BY 1
"""


def q22_idle_customers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q22 shape: well-funded customers gone IDLE — a scalar
    aggregate threshold (avg positive balance) applied via a 1-row
    broadcast cross join, then an anti join against RECENT orders
    (none since 2000-01-01; the original's never-ordered predicate is
    empty at every driver SF in this synthetic data — a hash-green on
    a 0-row result certifies nothing, the q20/mm_dedup_binary lesson,
    found again by the r7 code-review pass). At 100 TB the anti join
    shuffles on custkey with the date filter pushed to the orders
    scan; the scalar side is a full-reduce to one row (map-side
    combinable)."""
    c = table(spark, sf, "customer")
    o = table(spark, sf, "orders").where(
        F.col("o_orderdate") >= F.lit("2000-01-01")
    )
    thr = c.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    rich = c.crossJoin(F.broadcast(thr)).where(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    idle = rich.join(o, rich["c_custkey"] == o["o_custkey"], "left_anti")
    return idle.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.round(F.sum("c_acctbal") + 1e-9, 2).alias("totacctbal"),
    )


_Q22_SQL = """
SELECT c_mktsegment,
       COUNT(*) AS numcust,
       ROUND(SUM(c_acctbal) + 1e-9, 2) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_mktsegment
"""


_LATERAL_SQL_BODY = """
SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
FROM customer c,
LATERAL (SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_custkey = c.c_custkey
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 2) o
"""


def sql_lateral_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Correlated LATERAL subquery through the spark.sql() entry path:
    each customer's top-2 orders by price — the per-row-subquery
    idiom SQL users reach for before discovering window functions.
    Catalyst decorrelates it into a ranked window join, so it plans
    like ext_topk rather than running a subquery per row; the total
    order (price desc, orderkey asc) makes the LIMIT deterministic.
    The oracle is the identical SQL in DuckDB (which also supports
    LATERAL)."""
    for t in ("customer", "orders"):
        table(spark, sf, t).createOrReplaceTempView(t)
    return spark.sql(_LATERAL_SQL_BODY)


def sql_q1_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    """The same Q1 pricing summary through the spark.sql() ENTRY PATH:
    tables registered as temp views, query expressed as one SQL string
    (the dialect-parity surface — a user of the SQL API, not the
    DataFrame API, gets the identical Catalyst plan and identical
    results; the oracle is the same SQL DuckDB runs)."""
    for t in ("lineitem",):
        table(spark, sf, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2)                AS sum_qty,
               ROUND(SUM(l_extendedprice), 2)           AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)) + 1e-6, 2)
                                                        AS sum_disc_price,
               COUNT(*)                                 AS count_order,
               ROUND(AVG(l_quantity) + 1e-9, 4)         AS avg_qty,
               ROUND(AVG(l_discount) + 1e-9, 4)         AS avg_disc
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        """
    )


_SQL_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2)                AS sum_qty,
       ROUND(SUM(l_extendedprice), 2)           AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)) + 1e-6, 2)
                                                AS sum_disc_price,
       COUNT(*)                                 AS count_order,
       ROUND(AVG(l_quantity) + 1e-9, 4)         AS avg_qty,
       ROUND(AVG(l_discount) + 1e-9, 4)         AS avg_disc
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def agg_approx(spark: SparkSession, sf: str) -> DataFrame:
    """The sketch-based aggregates a 100 TB sweep leads with:
    approx_count_distinct (HyperLogLog++) and approx_percentile — both
    single-pass, mergeable, no exact-distinct shuffle.

    FULLY ORACLED since r12 (VERDICT r11 item 5 — the last
    excuse-free rows-only key, predating the pinned-companion
    pattern): the surface is the agg_hll_vs_exact /
    dedup_near_recall shape — exact values the oracle recomputes
    plus booleans the oracle pins TRUE, while the engine-specific
    sketch ESTIMATES stay out of the surface. Pins, each with the
    bound's derivation and the measured margin (r12 audit at
    sf0.001/0.01/0.1):
    - HLL estimates within 6% of exact (= 3σ at the requested
      rsd 0.02; measured relative error ≤ 0.00995 across both
      columns and all three sfs — 6× headroom). HLL++ is
      deterministic (fixed hash, no seed), so the boolean is stable.
    - approx_percentile values inside the EXACT rank bracket
      [percentile(p−0.002), percentile(p+0.002)] — the sketch's
      contract is rank error ≤ n/accuracy = 1e-4 of rank at
      accuracy 10000, so a ±0.002 bracket is a 20× margin that the
      sketch can never legally escape (rank-based, so a data
      regeneration that flattens the value density cannot flip it;
      measured VALUE relerr ≤ 2.4e-4 for color). Bracket endpoints
      use the interpolated exact percentile (Spark `percentile` ==
      DuckDB `quantile_cont`, the agg_percentiles convention).
    Exact anchors surfaced: n_rows, both exact distincts, exact
    median/p99 rounded at 4dp with the +1e-9 nudge on both engines."""
    li = table(spark, sf, "lineitem")
    wide = li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.approx_count_distinct("l_orderkey", 0.02).alias("_ao"),
        F.approx_count_distinct("l_partkey", 0.02).alias("_ap"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("_am"),
        F.percentile_approx("l_extendedprice", 0.99, 10000).alias("_a99"),
        F.expr(
            "percentile(l_extendedprice,"
            " array(0.498, 0.5, 0.502, 0.988, 0.99, 0.992))"
        ).alias("_pe"),
    )
    return wide.select(
        "n_rows",
        "exact_orders",
        "exact_parts",
        F.round(F.element_at("_pe", 2) + 1e-9, 4).alias("exact_median"),
        F.round(F.element_at("_pe", 5) + 1e-9, 4).alias("exact_p99"),
        (
            F.abs(F.col("_ao") - F.col("exact_orders"))
            <= 0.06 * F.col("exact_orders")
        ).alias("hll_orders_within_6pct"),
        (
            F.abs(F.col("_ap") - F.col("exact_parts"))
            <= 0.06 * F.col("exact_parts")
        ).alias("hll_parts_within_6pct"),
        (
            (F.col("_am") >= F.element_at("_pe", 1))
            & (F.col("_am") <= F.element_at("_pe", 3))
        ).alias("median_rank_bracket_ok"),
        (
            (F.col("_a99") >= F.element_at("_pe", 4))
            & (F.col("_a99") <= F.element_at("_pe", 6))
        ).alias("p99_rank_bracket_ok"),
    )


_AGG_APPROX_SQL = """
SELECT COUNT(*) AS n_rows,
       COUNT(DISTINCT l_orderkey) AS exact_orders,
       COUNT(DISTINCT l_partkey) AS exact_parts,
       ROUND(quantile_cont(l_extendedprice, 0.5) + 1e-9, 4) AS exact_median,
       ROUND(quantile_cont(l_extendedprice, 0.99) + 1e-9, 4) AS exact_p99,
       TRUE AS hll_orders_within_6pct,
       TRUE AS hll_parts_within_6pct,
       TRUE AS median_rank_bracket_ok,
       TRUE AS p99_rank_bracket_ok
FROM lineitem
"""


_PROFILE_COLS = (
    "l_orderkey",
    "l_partkey",
    "l_suppkey",
    "l_quantity",
    "l_returnflag",
    "l_linestatus",
)


def profile_table(spark: SparkSession, sf: str) -> DataFrame:
    """Data-profiling primitive: per-column null count, exact distinct
    count, min/max (stringified for a uniform long schema) over a
    representative lineitem column set — ONE scan producing every
    column's row via a single wide aggregate, then an unpivot-style
    reshape driver-side-free. At 100 TB swap countDistinct for the
    HLL sketches in agg_approx; the exact form here is what makes the
    oracle hashable."""
    li = table(spark, sf, "lineitem")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = li.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"{c}__n").alias("n_rows"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__distinct").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_str"),
                F.col(f"{c}__max").alias("max_str"),
            )
            for c in _PROFILE_COLS
        ]
    )
    return wide.select(F.explode(rows).alias("r")).select("r.*")


_PROFILE_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS column, COUNT(*) AS n_rows,
       COUNT(*) - COUNT({c}) AS n_nulls,
       COUNT(DISTINCT {c}) AS n_distinct,
       CAST(MIN({c}) AS VARCHAR) AS min_str,
       CAST(MAX({c}) AS VARCHAR) AS max_str
FROM lineitem"""
    for c in _PROFILE_COLS
)


def dq_constraint_check(spark: SparkSession, sf: str) -> DataFrame:
    """Deequ-style declarative constraint suite — the verdict layer
    above profile_table's raw stats: each row is one constraint with
    its measured violation metric and a passed flag, the contract a
    data-quality gate consumes. Six constraints spanning the four
    standard families, chosen so BOTH verdicts occur on this corpus
    (an all-pass suite can't tell a working checker from a vacuous
    one): uniqueness(o_orderkey) passes, uniqueness(l_orderkey)
    FAILS by design (lineitem has multiple lines per order — the
    deliberate negative control), completeness(o_custkey) passes,
    referential orders.o_custkey ⊆ customer.c_custkey passes,
    range(o_totalprice > 0) passes, accepted_values(o_orderstatus ∈
    {O,F,P}) passes.

    Margin audit (r10 process rule): every metric is an exact int64
    count (no floats anywhere); passed = metric == 0 — integer
    equality, engine-stable by construction.

    Scale shape: the three orders-scan constraints compute in ONE
    wide aggregate pass (the Deequ trick — N constraints, one scan);
    uniqueness counts are (rows − distinct), map-side partial-
    aggregable; the referential check is one left-anti count against
    the customer keys (dimension-sized build side, AQE broadcasts
    it). Nothing is per-constraint-scan; adding a constraint adds an
    aggregate expression, not a pass over the data."""
    o = table(spark, sf, "orders")
    li = table(spark, sf, "lineitem")
    c = table(spark, sf, "customer")
    orders_wide = o.agg(
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias(
            "uniq_viol"
        ),
        (F.count(F.lit(1)) - F.count("o_custkey")).alias("null_viol"),
        F.sum(
            F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)
        ).alias("range_viol"),
        F.sum(
            F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(
                0
            )
        ).alias("accepted_viol"),
    )
    li_wide = li.agg(
        (F.count(F.lit(1)) - F.countDistinct("l_orderkey")).alias(
            "li_uniq_viol"
        )
    )
    orphans = (
        o.select("o_custkey")
        .join(c.select("c_custkey"), o["o_custkey"] == c["c_custkey"], "left_anti")
        .agg(F.count(F.lit(1)).alias("ref_viol"))
    )
    wide = orders_wide.crossJoin(F.broadcast(li_wide)).crossJoin(
        F.broadcast(orphans)
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("check_name"),
                F.lit(tbl).alias("table_name"),
                F.col(col).cast("bigint").alias("n_violations"),
                (F.col(col) == 0).cast("int").alias("passed"),
            )
            for name, tbl, col in [
                ("unique(o_orderkey)", "orders", "uniq_viol"),
                ("unique(l_orderkey)", "lineitem", "li_uniq_viol"),
                ("complete(o_custkey)", "orders", "null_viol"),
                (
                    "referential(o_custkey->c_custkey)",
                    "orders",
                    "ref_viol",
                ),
                ("range(o_totalprice>0)", "orders", "range_viol"),
                (
                    "accepted(o_orderstatus in O,F,P)",
                    "orders",
                    "accepted_viol",
                ),
            ]
        ]
    )
    return wide.select(F.explode(rows).alias("r")).select("r.*")


_DQ_CONSTRAINT_SQL = """
WITH ow AS (
  SELECT CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS uniq_viol,
         CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT) AS null_viol,
         CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS range_viol,
         CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P')
                       THEN 1 ELSE 0 END) AS BIGINT) AS accepted_viol
  FROM orders),
lw AS (
  SELECT CAST(COUNT(*) - COUNT(DISTINCT l_orderkey) AS BIGINT)
           AS li_uniq_viol
  FROM lineitem),
rw AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS ref_viol
  FROM orders o ANTI JOIN customer c ON o.o_custkey = c.c_custkey)
SELECT check_name, table_name, n_violations,
       CAST(n_violations = 0 AS INT) AS passed
FROM (
  SELECT 'unique(o_orderkey)' AS check_name, 'orders' AS table_name,
         uniq_viol AS n_violations FROM ow
  UNION ALL
  SELECT 'unique(l_orderkey)', 'lineitem', li_uniq_viol FROM lw
  UNION ALL
  SELECT 'complete(o_custkey)', 'orders', null_viol FROM ow
  UNION ALL
  SELECT 'referential(o_custkey->c_custkey)', 'orders', ref_viol FROM rw
  UNION ALL
  SELECT 'range(o_totalprice>0)', 'orders', range_viol FROM ow
  UNION ALL
  SELECT 'accepted(o_orderstatus in O,F,P)', 'orders', accepted_viol
  FROM ow
)
"""


def q2_min_cost_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q2 shape: the minimum-cost supplier per part, EUROPE
    market. No partsupp table, so "supply cost" is the supplier's
    average realized unit price of that part in lineitem. The
    correlated MIN subquery decorrelates into ONE pass: aggregate to
    the (part, supplier) grain, then a per-part window rank — the
    fact table is scanned once and never self-joined. Rank compares
    the ROUNDED cost (with s_suppkey tiebreak) so sub-rounding float
    noise can never flip the winner between engines. Supplier→nation→
    region is the broadcast dim chain; the p_size filter prunes the
    part probe side before the join."""
    li = table(spark, sf, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    p = table(spark, sf, "part").where(F.col("p_size") <= 5)
    s = table(spark, sf, "supplier")
    n = table(spark, sf, "nation")
    r = table(spark, sf, "region").where(F.col("r_name") == "EUROPE")
    sup_eu = (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("s_suppkey", "s_name", "n_name")
    )
    cost = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(sup_eu), li["l_suppkey"] == F.col("s_suppkey"))
        .groupBy("p_partkey", "p_name", "s_suppkey", "s_name", "n_name")
        .agg(
            F.round(
                F.sum("l_extendedprice") / F.sum("l_quantity") + 1e-9, 4
            ).alias("unit_cost")
        )
    )
    w = Window.partitionBy("p_partkey").orderBy(
        F.asc("unit_cost"), F.asc("s_suppkey")
    )
    return (
        cost.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("p_partkey", "p_name", "s_name", "n_name", "unit_cost")
    )


_Q2_SQL = """
WITH cost AS (
  SELECT p_partkey, p_name, s_suppkey, s_name, n_name,
         ROUND(SUM(l_extendedprice) / SUM(l_quantity) + 1e-9, 4)
             AS unit_cost
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE p_size <= 5 AND r_name = 'EUROPE'
  GROUP BY 1, 2, 3, 4, 5),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY p_partkey
                               ORDER BY unit_cost ASC, s_suppkey ASC) AS rk
  FROM cost)
SELECT p_partkey, p_name, s_name, n_name, unit_cost
FROM ranked WHERE rk = 1
"""


def q11_important_parts(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose ASIA-supplied inventory value
    exceeds a fraction of the TOTAL — the HAVING > scalar-subquery
    pattern. The scalar total is a second aggregate over the SAME
    per-part frame (not a rescan of the fact table) combined via a
    broadcast-singleton crossJoin: at 100 TB the fact is read once,
    and only the 1-row total crosses the plan."""
    li = table(spark, sf, "lineitem")
    s = table(spark, sf, "supplier")
    n = table(spark, sf, "nation")
    r = table(spark, sf, "region").where(F.col("r_name") == "ASIA")
    sup_asia = (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("s_suppkey")
    )
    value = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_part = (
        li.join(F.broadcast(sup_asia), li["l_suppkey"] == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(F.sum(value).alias("_v"))
    )
    total = per_part.agg(F.sum("_v").alias("_total"))
    # threshold compares ROUNDED operands (house convention): the raw
    # sums are accumulation-order-dependent, so a part sitting a few
    # ulps from 0.001·total could flip membership between engines and
    # break the row-set oracle (r7 review finding). Guard is 1e-6, not
    # 1e-9: these are revenue-magnitude sums (_total reaches 1e7-1e9,
    # where accumulation noise exceeds 1e-9 and a .xx5 tie would
    # straddle — the q7/q8 magnitude rule), and a flip here changes
    # threshold MEMBERSHIP, not just a value (r8 ADVICE).
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(
            F.round(F.col("_v") + 1e-6, 2)
            > 0.001 * F.round(F.col("_total") + 1e-6, 2)
        )
        .select(
            "p_partkey", F.round(F.col("_v") + 1e-6, 2).alias("part_value")
        )
    )


_Q11_SQL = """
WITH per_part AS (
  SELECT l_partkey AS p_partkey,
         SUM(l_extendedprice * (1 - l_discount)) AS _v
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
  GROUP BY 1)
SELECT p_partkey, ROUND(_v + 1e-6, 2) AS part_value
FROM per_part
WHERE ROUND(_v + 1e-6, 2)
      > 0.001 * (SELECT ROUND(SUM(_v) + 1e-6, 2) FROM per_part)
"""


def q12_ship_delay_priority(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q12 shape: order-priority mix by shipping punctuality.
    No l_shipmode/commit/receipt dates in this schema, so lines
    bucket by ship delay (days from order to ship date) and the
    CASE-sums count urgent-vs-other priorities per bucket — the
    fact⋈fact orders join shuffles on the order key; the CASE
    aggregation is map-side combinable."""
    li = table(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    o = table(spark, sf, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"])
    d = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(d >= 60, F.lit("late"))
        .when(d >= 30, F.lit("slow"))
        .otherwise(F.lit("on_time"))
    )
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return j.groupBy(bucket.alias("ship_bucket")).agg(
        F.sum(F.when(urgent, 1).otherwise(0))
        .cast("long")
        .alias("high_line_count"),
        F.sum(F.when(~urgent, 1).otherwise(0))
        .cast("long")
        .alias("low_line_count"),
    )


_Q12_SQL = """
SELECT CASE WHEN datediff('day', o_orderdate, l_shipdate) >= 60 THEN 'late'
            WHEN datediff('day', o_orderdate, l_shipdate) >= 30 THEN 'slow'
            ELSE 'on_time' END AS ship_bucket,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
"""


def q20_dominant_share_suppliers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers holding a DOMINANT share of some
    part's supply — the nested-IN-subqueries pattern (suppliers ⊇
    partsupp ⊇ half-of-shipped-quantity) decorrelated into two
    aggregates joined at the part grain. 'small %' parts gate the
    probe; a supplier qualifies for a part when its shipped quantity
    exceeds TWICE the part's fair share (part total / supplier count
    for the part) — a relative threshold, because an absolute share
    cut thins out as scale grows supplier counts (an empty result at
    the driver's sf would be a trivially-green correctness slot).
    Per-supplier the dominated-part
    count keeps the output an auditable aggregate. Both aggregates
    come from ONE scan grain ((part, supplier) → part rollup), and
    the supplier/nation names arrive by broadcast at the end."""
    li = table(spark, sf, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    p = table(spark, sf, "part").where(F.col("p_name").like("small %"))
    ps = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("p_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("supp_qty"))
    )
    tot = ps.groupBy("p_partkey").agg(
        F.sum("supp_qty").alias("part_qty"),
        F.count(F.lit(1)).alias("n_supp"),
    )
    dominant = ps.join(tot, "p_partkey").where(
        F.col("supp_qty") * F.col("n_supp") > 2 * F.col("part_qty")
    )
    s = table(spark, sf, "supplier")
    n = table(spark, sf, "nation")
    sup = s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"]).select(
        "s_suppkey", "s_name", "n_name"
    )
    return (
        dominant.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n_dominated_parts"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "n_name", "n_dominated_parts")
    )


_Q20_SQL = """
WITH ps AS (
  SELECT p_partkey, l_suppkey, SUM(l_quantity) AS supp_qty
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'small %'
  GROUP BY 1, 2),
tot AS (SELECT p_partkey, SUM(supp_qty) AS part_qty,
               COUNT(*) AS n_supp FROM ps GROUP BY 1),
dom AS (
  SELECT l_suppkey, COUNT(*) AS n_dominated_parts
  FROM ps JOIN tot USING (p_partkey)
  WHERE supp_qty * n_supp > 2 * part_qty
  GROUP BY 1)
SELECT s_suppkey, s_name, n_name, n_dominated_parts
FROM dom
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
"""


def q21_waiting_suppliers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who alone held up a multi-supplier
    order. The original's EXISTS (another supplier in the order) AND
    NOT EXISTS (another LATE supplier) pair decorrelates into one
    per-order aggregate: distinct-supplier count ≥ 2, late-supplier
    count == 1, and (valid because exactly one) MIN picks the culprit
    — the fact⋈fact join shuffles once on the order key and the
    whole exists-logic runs as map-side-combinable aggregates, no
    double correlated scan. 'Late' = shipped > 60 days after order
    (no receipt/commit dates in this schema).

    The distinct counts are computed by PRE-AGGREGATING to the
    (order, supplier) grain first (max(late) per pair), then plain
    counting — two pipelined hash aggregates on the SAME key prefix
    (no second shuffle for the outer one), instead of two
    countDistinct in one agg, which Catalyst plans as an Expand (3×
    the join output materialized). Measured 2.9 s → 1.7 s at sf0.1.

    The orders side carries a SHUFFLE_HASH hint (r8, VERDICT item 6):
    both join inputs are range/hash-shuffled on the order key either
    way, but sort-merge SORTS both — and lineitem is the biggest sort
    in the query. Hash-building on the smaller orders side skips both
    sorts while keeping the output hash(orderkey)-partitioned, so the
    two downstream aggregates still pipeline shuffle-free. Measured
    1.49 → 0.82 s at sf0.1 and 3.14 → 1.50 s at 10×. Per-partition
    build size is bounded by the shuffle-partition sizing rule (the
    build side is orders/numShufflePartitions, and AQE skew-split
    applies), so the hint holds at cluster scale."""
    o = table(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    li = table(spark, sf, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    j = li.join(o.hint("SHUFFLE_HASH"), li["l_orderkey"] == o["o_orderkey"])
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        "INTERVAL 60 DAYS"
    )
    pair = j.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(late.cast("int")).alias("_late")
    )
    per_order = pair.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("_late").alias("n_late"),
        F.min(F.when(F.col("_late") == 1, F.col("l_suppkey"))).alias(
            "culprit"
        ),
    )
    s = table(spark, sf, "supplier").select("s_suppkey", "s_name")
    return (
        per_order.where((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .groupBy("culprit")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(s), F.col("culprit") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "numwait")
    )


_Q21_SQL = """
WITH per_order AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS n_supp,
         COUNT(DISTINCT CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                             THEN l_suppkey END) AS n_late,
         MIN(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                  THEN l_suppkey END) AS culprit
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1)
SELECT s_suppkey, s_name, COUNT(*) AS numwait
FROM per_order
JOIN supplier ON culprit = s_suppkey
WHERE n_supp >= 2 AND n_late = 1
GROUP BY 1, 2
"""


_BLOOM_M = 1 << 20  # bit-space size
_BLOOM_K = 3  # hash functions


def _bloom_positions(key: str):
    """k Bloom positions for a bigint key: xxhash64 seeded by the
    hash index, reduced mod m. Pure Column arithmetic — JVM-side,
    codegen'd, identical on build and probe sides."""
    return [
        F.pmod(F.xxhash64(F.col(key), F.lit(i)), F.lit(_BLOOM_M))
        for i in range(_BLOOM_K)
    ]


def join_bloom_prefilter(spark: SparkSession, sf: str) -> DataFrame:
    """Explicit Bloom semi-join prefilter, built from public
    primitives (Spark's BloomFilterAggregate is runtime-internal —
    Catalyst injects it in the shuffle-join regime, plan-pinned in
    test_plan_quality — but is not a public function): the build side
    (priority-filtered orders) emits its k=3 xxhash64 positions in a
    2^20 bit-space as a DISTINCT position set; a probe row survives
    only if ALL k of its positions hit, computed as one explode +
    position hash-join + count==k — every stage a linear JVM-side
    shuffle, the classic formulation for persisting a prefilter
    ACROSS jobs (build once, prune many scans) where the runtime
    filter lives and dies with one query.

    The checkable surface pins the two Bloom guarantees against live
    data (pattern of agg_hll_vs_exact): no false negatives (probed ≥
    exact semi-join count) and bounded false-positive mass. The fp
    bound is derived IN-PLAN from the realized fill factor — a probe
    row false-positives at rate fill^k under independence, so the
    margin is 5·fill³ of the non-matching rows plus a 1% variance
    floor. A fixed margin would silently flip at larger SFs (a
    2^20 bit-space is ~58% full at sf1, fp ≈ 19% — the r7 review
    caught the fixed 5% bound red-lining there); the derived bound
    tracks any build cardinality while staying a real guarantee."""
    o = table(spark, sf, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    li = table(spark, sf, "lineitem").select("l_orderkey")
    build = (
        o.select(
            F.explode(F.array(*_bloom_positions("o_orderkey"))).alias("pos")
        )
        .distinct()
    )
    fill = build.agg(
        (F.count(F.lit(1)) / F.lit(float(_BLOOM_M))).alias("_fill")
    )
    # stamp the row id in its OWN projection: a nondeterministic
    # expression in the same select as a generator is evaluated per
    # OUTPUT row (after Generate), which would give each exploded
    # position a fresh id and make the k-hit count unreachable
    probe = li.select(
        "l_orderkey", F.monotonically_increasing_id().alias("_rid")
    ).select(
        "_rid",
        F.explode(F.array(*_bloom_positions("l_orderkey"))).alias("pos"),
    )
    passed = (
        probe.join(build, "pos", "left_semi")
        .groupBy("_rid")
        .agg(F.count(F.lit(1)).alias("_hits"))
        .where(F.col("_hits") == _BLOOM_K)
        .agg(F.count(F.lit(1)).alias("bloom_rows"))
    )
    exact = li.join(
        o, li["l_orderkey"] == o["o_orderkey"], "left_semi"
    ).agg(F.count(F.lit(1)).alias("exact_rows"))
    total = li.agg(F.count(F.lit(1)).alias("total_rows"))
    return (
        passed.join(F.broadcast(exact))
        .join(F.broadcast(total))
        .join(F.broadcast(fill))
        .select(
            "exact_rows",
            (F.col("bloom_rows") >= F.col("exact_rows")).alias(
                "no_false_negatives"
            ),
            (
                F.col("bloom_rows")
                <= F.col("exact_rows")
                + (5 * F.pow("_fill", F.lit(_BLOOM_K)) + 0.01)
                * (F.col("total_rows") - F.col("exact_rows"))
            ).alias("fp_bounded"),
        )
    )


_BLOOM_PREFILTER_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS exact_rows,
       TRUE AS no_false_negatives,
       TRUE AS fp_bounded
FROM lineitem
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_orderkey = l_orderkey
                AND o_orderpriority = '1-URGENT')
"""


QUERIES: dict[str, QuerySpec] = {
    "profile_table": QuerySpec("profile_table", profile_table, _PROFILE_SQL),
    # round-12 second-wave addition (fronted in _ROUND12_FRONT)
    "dq_constraint_check": QuerySpec(
        "dq_constraint_check", dq_constraint_check, _DQ_CONSTRAINT_SQL
    ),
    # graduated to fully-oracled in r12 (VERDICT r11 item 5): pinned
    # HLL/percentile bound booleans + exact anchors, estimates out of
    # the surface
    "agg_approx": QuerySpec("agg_approx", agg_approx, _AGG_APPROX_SQL),
    "q10_returned_items": QuerySpec(
        "q10_returned_items", q10_returned_items, _Q10_SQL
    ),
    "q14_promo_revenue": QuerySpec("q14_promo_revenue", q14_promo_revenue, _Q14_SQL),
    "q18_large_orders": QuerySpec("q18_large_orders", q18_large_orders, _Q18_SQL),
    "window_range_frame": QuerySpec(
        "window_range_frame", window_range_frame, _WINDOW_RANGE_SQL
    ),
    "agg_grouping_sets": QuerySpec(
        "agg_grouping_sets", agg_grouping_sets, _GROUPING_SETS_SQL
    ),
    "q1_pricing_summary": QuerySpec("q1_pricing_summary", q1_pricing_summary, _Q1_SQL),
    "q3_shipping_priority": QuerySpec(
        "q3_shipping_priority", q3_shipping_priority, _Q3_SQL
    ),
    "q5_local_supplier": QuerySpec("q5_local_supplier", q5_local_supplier, _Q5_SQL),
    "agg_summary_stats": QuerySpec("agg_summary_stats", agg_summary_stats, _SUMMARY_SQL),
    "agg_count_distinct": QuerySpec(
        "agg_count_distinct", agg_count_distinct, _COUNT_DISTINCT_SQL
    ),
    "agg_group_stats": QuerySpec("agg_group_stats", agg_group_stats, _GROUP_STATS_SQL),
    "agg_rollup": QuerySpec("agg_rollup", agg_rollup, _ROLLUP_SQL),
    "agg_cube": QuerySpec("agg_cube", agg_cube, _CUBE_SQL),
    "agg_conditional": QuerySpec("agg_conditional", agg_conditional, _CONDITIONAL_SQL),
    "agg_having": QuerySpec("agg_having", agg_having, _HAVING_SQL),
    "join_semi": QuerySpec("join_semi", join_semi, _SEMI_SQL),
    "join_anti": QuerySpec("join_anti", join_anti, _ANTI_SQL),
    "join_outer_coalesce": QuerySpec(
        "join_outer_coalesce", join_outer_coalesce, _OUTER_SQL
    ),
    "window_rank": QuerySpec("window_rank", window_rank, _WINDOW_RANK_SQL),
    "window_lag_lead": QuerySpec("window_lag_lead", window_lag_lead, _WINDOW_LAG_SQL),
    "window_running_sum": QuerySpec(
        "window_running_sum", window_running_sum, _WINDOW_RUNNING_SQL
    ),
    "ext_topk": QuerySpec("ext_topk", ext_topk, _TOPK_SQL),
    "sort_limit": QuerySpec("sort_limit", sort_limit, _SORT_LIMIT_SQL),
    "setop_union": QuerySpec("setop_union", setop_union, _UNION_SQL),
    "setop_intersect": QuerySpec("setop_intersect", setop_intersect, _INTERSECT_SQL),
    "setop_except": QuerySpec("setop_except", setop_except, _EXCEPT_SQL),
    "distinct_proj": QuerySpec("distinct_proj", distinct_proj, _DISTINCT_SQL),
    "proj_date_parts": QuerySpec("proj_date_parts", proj_date_parts, _DATE_PARTS_SQL),
    "filt_predicates": QuerySpec("filt_predicates", filt_predicates, _FILT_SQL),
    "proj_string_funcs": QuerySpec("proj_string_funcs", proj_string_funcs, _STRING_SQL),
    "proj_math_funcs": QuerySpec("proj_math_funcs", proj_math_funcs, _MATH_SQL),
    "proj_case_when": QuerySpec("proj_case_when", proj_case_when, _CASE_SQL),
    # appended post-r2 (relational merges last, so these sit far past
    # the driver's 50-entry correctness window)
    "q6_revenue_forecast": QuerySpec(
        "q6_revenue_forecast", q6_revenue_forecast, _Q6_SQL
    ),
    "q7_volume_shipping": QuerySpec(
        "q7_volume_shipping", q7_volume_shipping, _Q7_SQL
    ),
    "q13_order_histogram": QuerySpec(
        "q13_order_histogram", q13_order_histogram, _Q13_SQL
    ),
    "q15_top_supplier": QuerySpec("q15_top_supplier", q15_top_supplier, _Q15_SQL),
    "q17_small_quantity_revenue": QuerySpec(
        "q17_small_quantity_revenue", q17_small_quantity_revenue, _Q17_SQL
    ),
    "sql_q1_pricing_summary": QuerySpec(
        "sql_q1_pricing_summary", sql_q1_pricing_summary, _SQL_Q1_SQL
    ),
    # appended r6: the remaining TPC-H shapes this schema supports
    "q4_order_priority": QuerySpec(
        "q4_order_priority", q4_order_priority, _Q4_SQL
    ),
    "q9_profit_by_nation": QuerySpec(
        "q9_profit_by_nation", q9_profit_by_nation, _Q9_SQL
    ),
    "q19_disjunctive_pushdown": QuerySpec(
        "q19_disjunctive_pushdown", q19_disjunctive_pushdown, _Q19_SQL
    ),
    "q22_idle_customers": QuerySpec(
        "q22_idle_customers", q22_idle_customers, _Q22_SQL
    ),
    "q8_market_share": QuerySpec(
        "q8_market_share", q8_market_share, _Q8_SQL
    ),
    "setop_except_all": QuerySpec(
        "setop_except_all", setop_except_all, _EXCEPT_ALL_SQL
    ),
    "setop_intersect_all": QuerySpec(
        "setop_intersect_all", setop_intersect_all, _INTERSECT_ALL_SQL
    ),
    "window_first_last": QuerySpec(
        "window_first_last", window_first_last, _FIRST_LAST_SQL
    ),
    "q16_supplier_variety": QuerySpec(
        "q16_supplier_variety", q16_supplier_variety, _Q16_SQL
    ),
    "sql_lateral_topk": QuerySpec(
        "sql_lateral_topk", sql_lateral_topk, _LATERAL_SQL_BODY
    ),
    # r7 additions: the last five TPC-H shapes, completing q1-q22
    # (appended at the END so the driver's front-50 window is
    # untouched; they get driver rows when the r8 front rotates)
    "q2_min_cost_supplier": QuerySpec(
        "q2_min_cost_supplier", q2_min_cost_supplier, _Q2_SQL
    ),
    "q11_important_parts": QuerySpec(
        "q11_important_parts", q11_important_parts, _Q11_SQL
    ),
    "q12_ship_delay_priority": QuerySpec(
        "q12_ship_delay_priority", q12_ship_delay_priority, _Q12_SQL
    ),
    "q20_dominant_share_suppliers": QuerySpec(
        "q20_dominant_share_suppliers", q20_dominant_share_suppliers, _Q20_SQL
    ),
    "q21_waiting_suppliers": QuerySpec(
        "q21_waiting_suppliers", q21_waiting_suppliers, _Q21_SQL
    ),
    "join_bloom_prefilter": QuerySpec(
        "join_bloom_prefilter", join_bloom_prefilter, _BLOOM_PREFILTER_SQL
    ),
    # round-9 addition (fronted in registry._ROUND9_FRONT on arrival)
    "agg_bitmap_distinct": QuerySpec(
        "agg_bitmap_distinct", agg_bitmap_distinct, _BITMAP_DISTINCT_SQL
    ),
    "window_distinct_trailing": QuerySpec(
        "window_distinct_trailing",
        window_distinct_trailing,
        _DISTINCT_TRAILING_SQL,
    ),
}
