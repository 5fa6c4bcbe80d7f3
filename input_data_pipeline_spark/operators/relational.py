"""Core relational operator surface (SURVEY.md §2.4 J2-J4, §2.5 A7-A8, §2.7).

Everything here is declarative DataFrame API: Catalyst handles predicate
pushdown, column pruning, join strategy (broadcast for the geography dims is
hinted where it's always right), and AQE does runtime coalesce/skew handling.

Design notes for the 100 TB target:
- fact-to-fact joins (lineitem ⋈ orders) shuffle on the order key — both sides
  are written bucketed by orderkey in a production deployment, turning this
  into a co-located join; here we rely on AQE.
- dimension joins broadcast — region/nation unconditionally (5/25 rows at
  every SF); customer/supplier/part and frames derived from them through
  ``plans.hints.maybe_broadcast``, which attaches the hint only while
  Catalyst's size estimate fits an executor and otherwise defers to AQE.
  Those three dims scale linearly with SF, so at the 100 TB target the
  guard drops the hint and the same unedited plans fall back to AQE's
  runtime strategy instead of forcing an impossible broadcast build.
- aggregates are partial+final automatically (hash agg with spill).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from input_data_pipeline_spark.functions.stable import (
    micros,
    round_micros,
    sql_avg_micros,
    sql_corr_expr,
    sql_micros,
    sql_round_micros,
    sql_stddev_samp_expr,
    sql_sum_micros,
    stable_avg_micros,
    stable_corr,
    stable_stddev_samp,
    stable_sum_micros,
)
from input_data_pipeline_spark.plans.hints import maybe_broadcast
from input_data_pipeline_spark.plans.registry import register
from input_data_pipeline_spark.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Flagship: revenue by region (scan→filter→join×4→agg→sort)
# ---------------------------------------------------------------------------

@register(
    "revenue_by_region",
    oracle="""
    SELECT r.r_name AS region,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6)))
                * 1000000 AS BIGINT) AS revenue_micros,
           COUNT(*) AS line_count
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY r.r_name
    ORDER BY revenue_micros DESC
    """,
)
def revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship star query: 1996 revenue per region.

    lineitem⋈orders shuffles on the order key; the three geography hops are
    broadcast joins (nation/region hinted, customer via AQE), so the whole
    probe side stays in one stage.
    """
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")

    return (
        lineitem
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            stable_sum_micros(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue_micros"
            ),
            F.count(F.lit(1)).alias("line_count"),
        )
        .orderBy(F.desc("revenue_micros"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q1 shape: wide grouped aggregate with partial+final hash agg
# ---------------------------------------------------------------------------

@register(
    "pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS sum_qty_micros,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) * 1000000 AS BIGINT)
             AS sum_base_price_micros,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) * 1000000
                AS BIGINT) AS sum_disc_price_micros,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                             AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS sum_charge_micros,
           {sql_avg_micros('l_quantity', 'avg_qty_micros')},
           {sql_avg_micros('l_extendedprice', 'avg_price_micros')},
           {sql_avg_micros('l_discount', 'avg_disc_micros')},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: 8 aggregates over 2 group keys.

    Catalyst plans this as partial hash-agg (map-side) → shuffle on the two
    low-cardinality keys → final hash-agg; the scan reads only the 7 needed
    columns (column pruning) with the date filter pushed to parquet.
    """
    lineitem = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem
        .filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            stable_sum_micros("l_quantity").alias("sum_qty_micros"),
            stable_sum_micros("l_extendedprice").alias("sum_base_price_micros"),
            stable_sum_micros(disc_price).alias("sum_disc_price_micros"),
            stable_sum_micros(disc_price * (1 + F.col("l_tax"))).alias("sum_charge_micros"),
            stable_avg_micros("l_quantity").alias("avg_qty_micros"),
            stable_avg_micros("l_extendedprice").alias("avg_price_micros"),
            stable_avg_micros("l_discount").alias("avg_disc_micros"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Top-k (TakeOrderedAndProject), broadcast dim join
# ---------------------------------------------------------------------------

@register(
    "top_customers_by_revenue",
    oracle="""
    SELECT c.c_custkey AS custkey, c.c_name AS name, n.n_name AS nation,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6)))
                * 1000000 AS BIGINT) AS revenue_micros
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue_micros DESC, custkey ASC
    LIMIT 10
    """,
)
def top_customers_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 customers by lifetime revenue (ties broken by key).

    The final orderBy+limit compiles to TakeOrderedAndProject — each partition
    keeps only its local top-10, so no global sort materializes.
    """
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        lineitem
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("n_name").alias("nation"),
        )
        .agg(
            stable_sum_micros(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue_micros"
            )
        )
        .orderBy(F.desc("revenue_micros"), F.asc("custkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Semi / anti joins (J4, J1's Spark shape)
# ---------------------------------------------------------------------------

@register(
    "customers_with_open_orders",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
    ORDER BY c_custkey
    """,
)
def customers_with_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existence filter as a left-semi join: customers holding an open order.

    Semi join never duplicates the probe side and only ships the join key of
    the build side — the Spark-native form of the reference's `in existing`
    set membership (main.py:94).
    """
    customer = _t(spark, sf_dir, "customer")
    open_orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return (
        customer
        .join(open_orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


@register(
    "customers_without_urgent_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    ORDER BY c_custkey
    """,
)
def customers_without_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join: the reference's new-files-since-last-run diff (SURVEY J1)
    generalized — rows in the left with no match on the right."""
    customer = _t(spark, sf_dir, "customer")
    urgent = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        customer
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# Outer join with null-handling (J3 + P3's null-ify inverse)
# ---------------------------------------------------------------------------

@register(
    "nation_order_counts_left",
    oracle="""
    SELECT n.n_name AS nation,
           COUNT(o.o_orderkey) AS order_count,
           CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))), 0) * 1000000 AS BIGINT)
             AS total_spend_micros
    FROM nation n
    LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY n.n_name
    ORDER BY nation
    """,
)
def nation_order_counts_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer joins preserving empty nations; COUNT over a nullable col
    counts matches only, COALESCE backfills the no-order case."""
    nation = _t(spark, sf_dir, "nation")
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        nation
        .join(customer, F.col("c_nationkey") == F.col("n_nationkey"), "left")
        .join(orders, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("o_orderkey").alias("order_count"),
            F.coalesce(stable_sum_micros("o_totalprice"), F.lit(0).cast("long")).alias(
                "total_spend_micros"
            ),
        )
        .orderBy("nation")
    )


# ---------------------------------------------------------------------------
# Rollup / grouping sets (A8)
# ---------------------------------------------------------------------------

@register(
    "order_priority_rollup",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) * 1000000 AS BIGINT)
             AS total_price_micros
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY status, priority
    """,
)
def order_priority_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity report via ROLLUP — Catalyst expands to a single
    Expand+hash-agg, one pass over the fact table for all three grains."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            stable_sum_micros("o_totalprice").alias("total_price_micros"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_price_micros",
        )
        .orderBy("status", "priority")
    )


# ---------------------------------------------------------------------------
# Distinct & set ops (O2-O4)
# ---------------------------------------------------------------------------

@register(
    "distinct_flag_status",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus
    FROM lineitem
    ORDER BY l_returnflag, l_linestatus
    """,
)
def distinct_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct = groupBy on all columns; partial dedup map-side first."""
    return (
        _t(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .distinct()
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "nations_with_both_roles",
    oracle="""
    SELECT n_nationkey AS nationkey
    FROM (SELECT DISTINCT c_nationkey AS n_nationkey FROM customer
          INTERSECT
          SELECT DISTINCT s_nationkey FROM supplier) t
    ORDER BY nationkey
    """,
)
def nations_with_both_roles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT of two key sets (nations having customers AND suppliers)."""
    cust_nations = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey")).distinct()
    supp_nations = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey")).distinct()
    return cust_nations.intersect(supp_nations).orderBy("nationkey")


@register(
    "account_balance_union",
    oracle="""
    SELECT role, COUNT(*) AS n,
           CAST(SUM(CAST(acctbal AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS total_bal_micros
    FROM (
      SELECT 'customer' AS role, c_acctbal AS acctbal FROM customer
      UNION ALL
      SELECT 'supplier' AS role, s_acctbal AS acctbal FROM supplier
    ) u
    GROUP BY role
    ORDER BY role
    """,
)
def account_balance_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName of heterogeneous sources into one table (SURVEY O3) —
    the collectors-into-one-JSONL pattern of the reference's main.py."""
    customer = _t(spark, sf_dir, "customer").select(
        F.lit("customer").alias("role"), F.col("c_acctbal").alias("acctbal")
    )
    supplier = _t(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("role"), F.col("s_acctbal").alias("acctbal")
    )
    return (
        customer.unionByName(supplier)
        .groupBy("role")
        .agg(
            F.count(F.lit(1)).alias("n"),
            stable_sum_micros("acctbal").alias("total_bal_micros"),
        )
        .orderBy("role")
    )


# ---------------------------------------------------------------------------
# Predicates: IN-list, BETWEEN, LIKE, null checks (P-series)
# ---------------------------------------------------------------------------

@register(
    "urgent_high_value_orders",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS totalprice_micros
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_totalprice BETWEEN 100000 AND 200000
      AND o_orderdate >= TIMESTAMP '1997-01-01'
    ORDER BY o_orderkey
    """,
)
def urgent_high_value_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive pushdown: IN + BETWEEN + date bound all reach the parquet
    scan as PushedFilters."""
    return (
        _t(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            & F.col("o_totalprice").between(100000, 200000)
            & (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        )
        .select(
            "o_orderkey",
            "o_orderpriority",
            micros("o_totalprice").alias("totalprice_micros"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "part_type_stats",
    oracle=f"""
    SELECT p_type,
           COUNT(*) AS n_parts,
           {sql_avg_micros('p_retailprice', 'avg_price_micros')},
           MIN(p_size) AS min_size,
           MAX(p_size) AS max_size
    FROM part
    WHERE p_name LIKE '%steel%' OR p_brand LIKE 'Brand#1%'
    GROUP BY p_type
    ORDER BY p_type
    """,
)
def part_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE-predicate filters (prefix LIKE pushes down as a range) + min/max/avg."""
    return (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%steel%") | F.col("p_brand").like("Brand#1%"))
        .groupBy("p_type")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            stable_avg_micros("p_retailprice").alias("avg_price_micros"),
            F.min("p_size").alias("min_size"),
            F.max("p_size").alias("max_size"),
        )
        .orderBy("p_type")
    )


# ---------------------------------------------------------------------------
# count distinct / max_by (A6, A7)
# ---------------------------------------------------------------------------

@register(
    "order_cardinalities",
    oracle="""
    SELECT o_orderstatus AS status,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY status
    """,
)
def order_cardinalities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT DISTINCT — Catalyst plans Expand + two-phase agg so the
    distinct dedup is distributed, not single-node."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("status")
    )


@register(
    "latest_order_per_customer",
    oracle="""
    WITH ranked AS (
      SELECT o_custkey, o_orderdate, o_orderkey,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders)
    SELECT o_custkey AS custkey,
           CAST(o_orderdate AS DATE) AS latest_orderdate,
           o_orderkey AS latest_orderkey
    FROM ranked WHERE rn = 1
    ORDER BY custkey
    """,
)
def latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by with a deterministic (date, key) tiebreak — the reference's
    newest-file-by-mtime pick (main.py:105,110) as a grouped aggregate."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            # DATE output: timestamp cells are canonicalizer-hostile (tz/
            # format drift); orderdates are midnight-valued so the cast is
            # lossless and identical on both sides.
            F.max("o_orderdate").cast("date").alias("latest_orderdate"),
            F.max_by("o_orderkey", F.struct("o_orderdate", "o_orderkey")).alias("latest_orderkey"),
        )
        .orderBy("custkey")
    )


@register(
    "order_status_cube",
    oracle="""
    SELECT o_orderstatus AS status,
           o_orderpriority AS priority,
           GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS gid,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) * 1000000 AS BIGINT)
             AS total_price_micros
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY gid, status, priority
    """,
)
def order_status_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority) — all 4 grouping sets in one pass
    (SURVEY A8). Catalyst plans this as Expand + single hash agg, so the
    multi-granularity report costs one shuffle, not four; grouping_id
    disambiguates subtotal rows from genuine NULL keys."""
    return (
        _t(spark, sf_dir, "orders")
        .cube(F.col("o_orderstatus").alias("status"), F.col("o_orderpriority").alias("priority"))
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            stable_sum_micros("o_totalprice").alias("total_price_micros"),
        )
        .select("status", "priority", "gid", "n_orders", "total_price_micros")
        .orderBy("gid", "status", "priority")
    )


@register(
    "approx_distinct_users",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS within_5rsd
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) per event_type, verdict-checked
    against the exact count in-query (SURVEY A7). The HLL estimate itself is
    implementation-specific, so the oracle-checkable contract is the error
    BOUND, not the estimate: ``within_5rsd`` asserts |est - exact| <= 10% of
    exact (5x the requested rsd=0.02) — deterministic because Spark's HLL++
    is hash-based, not randomized, and deliberately LOOSE: HLL has no hard
    3-sigma guarantee (~0.3% of groups land beyond 3x rsd on arbitrary
    data), so the verdict is sized to stay TRUE for any healthy estimator
    on any corpus while still going hash-red in the driver on a real
    regression (wrong column, broken merge: errors are then ~100%, not
    10%). tests/test_relational_extras.py bounds the raw estimate tighter
    (<5% on the committed corpus). At 100 TB the approx variant is the one
    you can afford: fixed-size sketch per group, mergeable map-side, no
    distinct-expand shuffle."""
    events = _t(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("_est"),
            F.countDistinct("user_id").alias("exact_users"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("_est") - F.col("exact_users")) * F.lit(1000000)
                <= F.col("exact_users") * F.lit(100000)
            ).alias("within_5rsd"),
        )
        .orderBy("event_type")
    )


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "event_value_percentiles",
    oracle=f"""
    SELECT event_type,
           CAST(ROUND(ROUND(quantile_cont(value, 0.25), 6) * 1000000) AS BIGINT) AS p25_micros,
           CAST(ROUND(ROUND(quantile_cont(value, 0.5), 6) * 1000000) AS BIGINT) AS p50_micros,
           CAST(ROUND(ROUND(quantile_cont(value, 0.9), 6) * 1000000) AS BIGINT) AS p90_micros,
           CAST(ROUND(({sql_stddev_samp_expr("value", 6)}) * 1000000) AS BIGINT) AS sd_micros,
           CAST(ROUND(({sql_corr_expr("value", "user_id", 6)}) * 1000000) AS BIGINT)
             AS corr_value_user_ppm
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def event_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles + dispersion/correlation stats per event type
    (SURVEY A7 extension). ``percentile`` (exact, linear interpolation)
    matches DuckDB's ``quantile_cont`` bit-for-bit on this data; at 100 TB
    you swap in ``percentile_approx`` (fixed-size t-digest-style sketch,
    mergeable map-side) at the cost of oracle exactness — the same trade
    as approx_distinct_users documents for HLL.
    """
    events = _t(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            # one percentile buffer per group, not three
            F.expr("percentile(value, array(0.25D, 0.5D, 0.9D))").alias("ps"),
            stable_stddev_samp("value", 6).alias("sd"),
            stable_corr("value", "user_id", 6).alias("corr_value_user"),
        )
        .select(
            "event_type",
            # quantize the (engine-identical) 6dp doubles to BIGINT micros
            round_micros(F.round(F.element_at("ps", 1), 6)).alias("p25_micros"),
            round_micros(F.round(F.element_at("ps", 2), 6)).alias("p50_micros"),
            round_micros(F.round(F.element_at("ps", 3), 6)).alias("p90_micros"),
            round_micros(F.col("sd")).alias("sd_micros"),
            round_micros(F.col("corr_value_user")).alias("corr_value_user_ppm"),
        )
        .orderBy("event_type")
    )


@register(
    "event_type_pivot",
    oracle="""
    SELECT user_id % 10 AS user_bucket,
           COUNT(*) FILTER (event_type = 'click') AS click,
           COUNT(*) FILTER (event_type = 'error') AS error,
           COUNT(*) FILTER (event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (event_type = 'signup') AS signup,
           COUNT(*) FILTER (event_type = 'view') AS view
    FROM events
    GROUP BY user_id % 10
    ORDER BY user_bucket
    """,
)
def event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide) with an EXPLICIT value list — per user bucket, one
    count column per event type. Passing the values avoids Spark's extra
    distinct-collection job at plan time (an O(n) pre-pass you never want
    at 100 TB); the pivot itself is then one hash agg with 5 conditional
    counters, map-side combined.
    """
    events = _t(spark, sf_dir, "events")
    return (
        events.groupBy((F.col("user_id") % 10).alias("user_bucket"))
        .pivot("event_type", list(EVENT_TYPES))
        .count()
        .na.fill(0)
        .orderBy("user_bucket")
    )


@register(
    "customer_period_setops",
    oracle="""
    WITH y95 AS (
      SELECT DISTINCT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'),
    y96 AS (
      SELECT DISTINCT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01')
    SELECT 'retained' AS cohort, COUNT(*) AS n FROM (SELECT * FROM y95 INTERSECT SELECT * FROM y96)
    UNION ALL
    SELECT 'churned' AS cohort, COUNT(*) AS n FROM (SELECT * FROM y95 EXCEPT SELECT * FROM y96)
    UNION ALL
    SELECT 'new' AS cohort, COUNT(*) AS n FROM (SELECT * FROM y96 EXCEPT SELECT * FROM y95)
    ORDER BY cohort
    """,
)
def customer_period_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT set operations (SURVEY O2 extension): retained /
    churned / new customer cohorts between 1995 and 1996. Spark plans both
    as aggregating joins (left-semi / left-anti over distinct inputs) — no
    row-by-row set state, shuffles only on the key.
    """
    orders = _t(spark, sf_dir, "orders")

    def year(y: int) -> DataFrame:
        return (
            orders.filter(
                (F.col("o_orderdate") >= f"{y}-01-01")
                & (F.col("o_orderdate") < f"{y + 1}-01-01")
            )
            .select("o_custkey")
            .distinct()
        )

    y95, y96 = year(1995), year(1996)
    retained = y95.intersect(y96)
    churned = y95.subtract(y96)
    new = y96.subtract(y95)
    rows = [
        retained.select(F.lit("retained").alias("cohort"), F.col("o_custkey")),
        churned.select(F.lit("churned").alias("cohort"), F.col("o_custkey")),
        new.select(F.lit("new").alias("cohort"), F.col("o_custkey")),
    ]
    unioned = rows[0].unionByName(rows[1]).unionByName(rows[2])
    return (
        unioned.groupBy("cohort")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("cohort")
    )


@register(
    "suppliers_above_nation_avg",
    oracle="""
    WITH nav AS (
      SELECT s_nationkey,
             CAST(SUM(CAST(s_acctbal AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS t,
             COUNT(s_acctbal) AS n
      FROM supplier GROUP BY s_nationkey)
    SELECT s.s_suppkey, s.s_name, n.n_name,
           CAST(CAST(s.s_acctbal AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS acctbal_micros,
           (v.t - ((v.t % v.n) + v.n) % v.n) // v.n AS nation_avg_micros
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN nav v ON v.s_nationkey = s.s_nationkey
    WHERE CAST(CAST(s.s_acctbal AS DECIMAL(18,6)) * 1000000 AS BIGINT) * v.n > v.t
    ORDER BY s.s_suppkey
    """,
)
def suppliers_above_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (TPC-H Q2/Q17 shape): suppliers richer
    than their nation's average balance. Expressed as SQL so Catalyst's
    subquery decorrelation does the rewrite — the correlated aggregate
    becomes one grouped subplan + an equi join, not a per-row re-scan
    (which at 100 TB is the difference between 2 passes and |rows| passes).
    """
    from input_data_pipeline_spark.tables import register_views

    register_views(spark, sf_dir)
    # Integer-space comparison: s_acctbal > nation_avg is evaluated as
    # acctbal_micros * n > total_micros — exact rational arithmetic, no
    # double division anywhere. The correlated form still decorrelates to
    # one grouped subplan + equi join under Catalyst.
    return spark.sql(
        """
        WITH nav AS (
          SELECT s_nationkey,
                 CAST(SUM(CAST(s_acctbal AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS t,
                 COUNT(s_acctbal) AS n
          FROM supplier GROUP BY s_nationkey)
        SELECT s.s_suppkey, s.s_name, n.n_name,
               CAST(CAST(s.s_acctbal AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS acctbal_micros,
               (v.t - ((v.t % v.n) + v.n) % v.n) DIV v.n AS nation_avg_micros
        FROM supplier s
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN nav v ON v.s_nationkey = s.s_nationkey
        WHERE CAST(CAST(s.s_acctbal AS DECIMAL(18,6)) * 1000000 AS BIGINT) * v.n > v.t
        ORDER BY s.s_suppkey
        """
    )


@register(
    "loyal_customers_all_quarters",
    oracle="""
    SELECT o_custkey,
           COUNT(*) AS n_orders_1995
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
    GROUP BY o_custkey
    HAVING COUNT(DISTINCT date_part('quarter', o_orderdate)) = 4
    ORDER BY o_custkey
    """,
)
def loyal_customers_all_quarters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational division ("for all" semantics): customers with at least
    one order in EVERY quarter of 1995. The double-NOT-EXISTS classic is
    rewritten as count-distinct-equals-domain-size — one aggregate instead
    of two correlated anti-joins; the domain (4 quarters) is a constant so
    no domain-side scan exists at all.
    """
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.filter(
            (F.col("o_orderdate") >= "1995-01-01")
            & (F.col("o_orderdate") < "1996-01-01")
        )
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders_1995"),
            F.countDistinct(F.quarter("o_orderdate")).alias("nq"),
        )
        .filter(F.col("nq") == 4)
        .drop("nq")
        .orderBy("o_custkey")
    )


@register(
    "order_price_histogram",
    oracle="""
    WITH binned AS (
      SELECT LEAST(CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT), 9) AS bucket
      FROM orders)
    SELECT bucket,
           bucket * 50000 AS bucket_lo,
           COUNT(*) AS n_orders
    FROM binned
    GROUP BY bucket
    ORDER BY bucket
    """,
)
def order_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order totals (10 × 50k buckets, top bucket
    open-ended) — the data-profiling shape: one codegen'd bucket expression,
    one low-cardinality partial-agg. No sort of the raw data ever happens.
    """
    orders = _t(spark, sf_dir, "orders")
    bucket = F.least(
        F.floor(F.col("o_totalprice") / 50000.0).cast("long"), F.lit(9)
    )
    return (
        orders.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .select("bucket", (F.col("bucket") * 50000).alias("bucket_lo"), "n_orders")
        .orderBy("bucket")
    )


@register(
    "orders_profile",
    oracle="""
    SELECT 'o_custkey' AS column_name, COUNT(*) - COUNT(o_custkey) AS n_null,
           COUNT(DISTINCT o_custkey) AS n_distinct FROM orders
    UNION ALL
    SELECT 'o_orderstatus', COUNT(*) - COUNT(o_orderstatus),
           COUNT(DISTINCT o_orderstatus) FROM orders
    UNION ALL
    SELECT 'o_orderpriority', COUNT(*) - COUNT(o_orderpriority),
           COUNT(DISTINCT o_orderpriority) FROM orders
    UNION ALL
    SELECT 'o_totalprice', COUNT(*) - COUNT(o_totalprice),
           COUNT(DISTINCT o_totalprice) FROM orders
    ORDER BY column_name
    """,
)
def orders_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (null + distinct counts) — the first pass any
    ingestion pipeline runs on a new table. One aggregate computes every
    column's stats in a single scan (Catalyst expands the distincts), vs
    the oracle's literal one-subquery-per-column statement.
    """
    orders = _t(spark, sf_dir, "orders")
    cols = ["o_custkey", "o_orderstatus", "o_orderpriority", "o_totalprice"]
    agg = orders.agg(
        F.count(F.lit(1)).alias("_n"),
        *[F.count(c).alias(f"nn_{c}") for c in cols],
        *[F.countDistinct(c).alias(f"nd_{c}") for c in cols],
    )
    stacked = agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column_name"),
                        (F.col("_n") - F.col(f"nn_{c}")).alias("n_null"),
                        F.col(f"nd_{c}").alias("n_distinct"),
                    )
                    for c in cols
                ]
            )
        ).alias("s")
    )
    return stacked.select("s.column_name", "s.n_null", "s.n_distinct").orderBy(
        "column_name"
    )


@register(
    "signup_funnel",
    oracle="""
    WITH stages AS (
      SELECT user_id,
             MIN(ts) FILTER (event_type = 'signup') AS t_signup,
             MIN(ts) FILTER (event_type = 'click') AS t_click,
             MIN(ts) FILTER (event_type = 'purchase') AS t_purchase
      FROM events
      GROUP BY user_id),
    flags AS (
      SELECT user_id,
             t_signup IS NOT NULL AS s1,
             t_signup IS NOT NULL AND t_click > t_signup AS s2,
             t_signup IS NOT NULL AND t_click > t_signup
               AND t_purchase > t_click AS s3
      FROM stages)
    SELECT COUNT(*) FILTER (s1) AS n_signed_up,
           COUNT(*) FILTER (s2) AS n_clicked_after,
           COUNT(*) FILTER (s3) AS n_purchased_after,
           COUNT(*) FILTER (s3) * 1000000 // COUNT(*) FILTER (s1)
             AS conversion_ppm
    FROM flags
    """,
)
def signup_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (signup → first later click → first later
    purchase): per-user conditional min-timestamps in ONE aggregate pass,
    then ordering flags — no self-joins, no window sort of raw events. The
    standard funnel formulation that stays one shuffle at any event volume.
    """
    events = _t(spark, sf_dir, "events")
    stage = lambda t: F.min(F.when(F.col("event_type") == t, F.col("ts")))  # noqa: E731
    stages = events.groupBy("user_id").agg(
        stage("signup").alias("t_signup"),
        stage("click").alias("t_click"),
        stage("purchase").alias("t_purchase"),
    )
    s1 = F.col("t_signup").isNotNull()
    s2 = s1 & (F.col("t_click") > F.col("t_signup"))
    s3 = s2 & (F.col("t_purchase") > F.col("t_click"))
    return stages.agg(
        F.sum(s1.cast("long")).alias("n_signed_up"),
        F.sum(s2.cast("long")).alias("n_clicked_after"),
        F.sum(s3.cast("long")).alias("n_purchased_after"),
        F.expr(
            "sum(cast(t_signup is not null and t_click > t_signup"
            "         and t_purchase > t_click as long)) * 1000000"
            " DIV sum(cast(t_signup is not null as long))"
        ).alias("conversion_ppm"),
    )


@register(
    "brand_revenue_by_supplier_nation",
    oracle="""
    SELECT p.p_brand AS brand, n.n_name AS supplier_nation,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6)))
                * 1000000 AS BIGINT) AS revenue_micros,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    GROUP BY p.p_brand, n.n_name
    ORDER BY brand, supplier_nation
    """,
)
def brand_revenue_by_supplier_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-dimension star probe (part AND supplier→nation off one fact
    scan): the shape where join ORDER matters — Catalyst/AQE keeps
    lineitem as the probe side throughout and broadcasts every dim, so the
    fact is scanned once and never shuffled for the dims.
    """
    lineitem = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    return (
        lineitem.join(maybe_broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(maybe_broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(F.col("p_brand").alias("brand"), F.col("n_name").alias("supplier_nation"))
        .agg(
            stable_sum_micros(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue_micros"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("brand", "supplier_nation")
    )


@register(
    "snapshot_diff",
    oracle="""
    WITH old AS (
      SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 10 <> 0),
    new AS (
      SELECT o_orderkey, o_totalprice * CASE WHEN o_orderkey % 13 = 0
                                             THEN 1.1 ELSE 1.0 END AS o_totalprice
      FROM orders WHERE o_orderkey % 7 <> 0)
    SELECT CASE WHEN o.o_orderkey IS NULL THEN 'added'
                WHEN n.o_orderkey IS NULL THEN 'removed'
                WHEN o.o_totalprice <> n.o_totalprice THEN 'changed'
                ELSE 'unchanged' END AS change,
           COUNT(*) AS n
    FROM old o
    FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
    GROUP BY change
    ORDER BY change
    """,
)
def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation via FULL OUTER join (the data-diff op every
    incremental pipeline needs): classify keys as added / removed /
    changed / unchanged between two table versions (simulated here by
    deterministic key filters + a price bump). One shuffle on the key; at
    100 TB both snapshots would be bucketed on it, making the diff
    co-located and shuffle-free.
    """
    orders = _t(spark, sf_dir, "orders")
    old = orders.filter(F.col("o_orderkey") % 10 != 0).select(
        F.col("o_orderkey").alias("k_old"), F.col("o_totalprice").alias("p_old")
    )
    new = orders.filter(F.col("o_orderkey") % 7 != 0).select(
        F.col("o_orderkey").alias("k_new"),
        (
            F.col("o_totalprice")
            * F.when(F.col("o_orderkey") % 13 == 0, 1.1).otherwise(1.0)
        ).alias("p_new"),
    )
    change = (
        F.when(F.col("k_old").isNull(), "added")
        .when(F.col("k_new").isNull(), "removed")
        .when(F.col("p_old") != F.col("p_new"), "changed")
        .otherwise("unchanged")
    )
    return (
        old.join(new, F.col("k_old") == F.col("k_new"), "full_outer")
        .select(change.alias("change"))
        .groupBy("change")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("change")
    )


@register(
    "revenue_grouping_sets",
    oracle="""
    WITH o AS (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
             o_orderpriority AS priority, o_totalprice
      FROM orders)
    SELECT order_year, priority,
           CAST(GROUPING(order_year) AS INT) AS g_year,
           CAST(GROUPING(priority) AS INT) AS g_priority,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) * 1000000 AS BIGINT)
             AS revenue_micros,
           COUNT(*) AS n_orders
    FROM o
    GROUP BY GROUPING SETS ((order_year, priority), (order_year), ())
    ORDER BY g_year, g_priority, order_year, priority
    """,
)
def revenue_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (SURVEY A8, beyond rollup/cube): per
    (year, priority), per year, and grand total in one pass, with
    grouping() flags disambiguating real NULL group keys from
    super-aggregate rows.

    Catalyst expands the sets into a single Expand + one hash aggregate —
    one scan and one shuffle regardless of how many granularities are
    requested, which is exactly why this beats unioning three groupBys
    at 100 TB (3 scans → 1).
    """
    o = _t(spark, sf_dir, "orders").select(
        F.year("o_orderdate").alias("order_year"),
        F.col("o_orderpriority").alias("priority"),
        "o_totalprice",
    )
    return (
        o.groupingSets([["order_year", "priority"], ["order_year"], []],
                       "order_year", "priority")
        .agg(
            F.grouping("order_year").cast("int").alias("g_year"),
            F.grouping("priority").cast("int").alias("g_priority"),
            stable_sum_micros("o_totalprice").alias("revenue_micros"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("g_year", "g_priority", "order_year", "priority")
    )


@register(
    "customer_order_setops_all",
    oracle="""
    WITH y95 AS (
      SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1995),
    y96 AS (
      SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996),
    ia AS (SELECT o_custkey FROM y95 INTERSECT ALL SELECT o_custkey FROM y96),
    ea AS (SELECT o_custkey FROM y95 EXCEPT ALL SELECT o_custkey FROM y96)
    SELECT 'intersect_all' AS op, o_custkey, COUNT(*) AS n FROM ia GROUP BY o_custkey
    UNION ALL
    SELECT 'except_all' AS op, o_custkey, COUNT(*) AS n FROM ea GROUP BY o_custkey
    ORDER BY op, o_custkey
    """,
)
def customer_order_setops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset set ops (SURVEY O2 beyond the DISTINCT forms): INTERSECT ALL
    keeps min(multiplicity), EXCEPT ALL subtracts multiplicities — here over
    the bag of per-order customer keys in 1995 vs 1996, so a customer with
    5 orders in '95 and 2 in '96 contributes 2 to the intersection and 3 to
    the difference. Catalyst rewrites both into a single count-compare
    aggregate per side (no sort, one shuffle on the key)."""
    orders = _t(spark, sf_dir, "orders")
    y95 = orders.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    y96 = orders.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    ia = (
        y95.intersectAll(y96).groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("intersect_all").alias("op"), "o_custkey", "n")
    )
    ea = (
        y95.exceptAll(y96).groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("except_all").alias("op"), "o_custkey", "n")
    )
    return ia.unionByName(ea).orderBy("op", "o_custkey")


@register(
    "event_value_approx_percentiles",
    oracle="""
    SELECT event_type,
           CAST(ROUND(ROUND(quantile_cont(value, 0.5), 6) * 1000000) AS BIGINT)
             AS exact_p50_micros,
           CAST(ROUND(ROUND(quantile_cont(value, 0.9), 6) * 1000000) AS BIGINT)
             AS exact_p90_micros,
           CAST(ROUND(ROUND(quantile_cont(value, 0.99), 6) * 1000000) AS BIGINT)
             AS exact_p99_micros,
           TRUE AS p50_in_band, TRUE AS p90_in_band, TRUE AS p99_in_band
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def event_value_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna-style sketch) per event type —
    the percentile you can afford at 100 TB: fixed-size mergeable sketch,
    map-side partials, no full sort. The sketch estimate itself is
    implementation-specific, so the driver-checkable contract is the rank
    error BOUND: with accuracy=10000 the guaranteed rank error is 1e-4,
    and each ``pXX_in_band`` asserts the approx value lies within the exact
    [p-0.02, p+0.02] percentile band — 200x the guarantee, deterministic
    (GK sketches are data-dependent, not randomized). The band is
    deliberately wide so groups as small as ~50 rows (where a narrow band
    spans less than one rank and even a perfect sketch could miss it) stay
    TRUE on any corpus, while a real sketch regression (wrong column,
    broken merge) still goes hash-red in the driver. The oracle recomputes
    the exact percentiles (quantile_cont == Spark `percentile`, proven by
    `event_value_percentiles`) and expects TRUE bands.
    tests/test_sampling_rollups.py bounds the raw estimates at the true
    1e-4 rank guarantee on the committed corpus.

    Output is scalar BIGINT/BOOLEAN columns (not arrays): the driver's
    canonicalizer cannot hash list-typed cells (its round-1 snapshot
    crashed on the array form of this query), and floats are not
    hash-stable across engines.
    """
    events = _t(spark, sf_dir, "events")
    pcts = F.percentile_approx("value", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)), 10000)
    # exact percentiles at the targets AND the +/-0.02 band edges (p99's
    # upper edge clamps to 1.0), one buffer
    exact = F.expr(
        "percentile(value, array("
        "0.48D, 0.5D, 0.52D, 0.88D, 0.9D, 0.92D, 0.97D, 0.99D, 1.0D))"
    )

    def band(i: int) -> F.Column:
        # approx value for target i within [exact(p-0.02), exact(p+0.02)]
        lo = F.element_at("_e", 3 * i + 1)
        hi = F.element_at("_e", 3 * i + 3)
        a = F.element_at("_a", i + 1)
        return (a >= lo) & (a <= hi)

    return (
        events.groupBy("event_type")
        .agg(pcts.alias("_a"), exact.alias("_e"))
        .select(
            "event_type",
            round_micros(F.round(F.element_at("_e", 2), 6)).alias("exact_p50_micros"),
            round_micros(F.round(F.element_at("_e", 5), 6)).alias("exact_p90_micros"),
            round_micros(F.round(F.element_at("_e", 8), 6)).alias("exact_p99_micros"),
            band(0).alias("p50_in_band"),
            band(1).alias("p90_in_band"),
            band(2).alias("p99_in_band"),
        )
        .orderBy("event_type")
    )


@register(
    "part_metrics_unpivot",
    oracle=f"""
    WITH wide AS (
      SELECT p_brand,
             CAST(SUM(p_size) * 1000000 // COUNT(p_size) AS BIGINT) AS avg_size_micros,
             {sql_avg_micros('p_retailprice', 'avg_price_micros')},
             COUNT(*) AS n_parts
      FROM part GROUP BY p_brand)
    SELECT p_brand, metric, value
    FROM wide UNPIVOT (value FOR metric IN (avg_size_micros, avg_price_micros, n_parts))
    ORDER BY p_brand, metric
    """,
)
def part_metrics_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT / melt (the inverse of `event_type_pivot`): wide per-brand
    metric columns reshaped to (brand, metric, value) rows. Catalyst plans
    it as a single Expand over the aggregated (small) table — reshape after
    aggregation, so the wide→long explosion never touches base-table
    cardinality."""
    part = _t(spark, sf_dir, "part")
    wide = part.groupBy("p_brand").agg(
        F.expr("sum(p_size) * 1000000 DIV count(p_size)").alias("avg_size_micros"),
        stable_avg_micros("p_retailprice").alias("avg_price_micros"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return (
        wide.unpivot(
            "p_brand", ["avg_size_micros", "avg_price_micros", "n_parts"], "metric", "value"
        )
        .orderBy("p_brand", "metric")
    )


@register(
    "segment_top_orders",
    oracle="""
    SELECT o.o_orderkey, CAST(o.o_orderdate AS DATE) AS o_orderdate, o.o_orderpriority,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6)))
                * 1000000 AS BIGINT) AS revenue_micros
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < DATE '1998-01-01'
      AND l.l_shipdate > DATE '1998-01-01'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue_micros DESC, o_orderkey
    LIMIT 10
    """,
)
def segment_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment-filtered customers ⋈ orders ⋈ lineitem,
    revenue per not-yet-shipped order, top 10. The segment filter prunes
    customers before the join (pushed to the scan), the date filters prune
    both fact scans, and the final top-10 plans as TakeOrderedAndProject —
    no global sort materializes."""
    customer = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-01-01")
    lineitem = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-01-01")
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            stable_sum_micros(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue_micros"
            )
        )
        .withColumn("o_orderdate", F.col("o_orderdate").cast("date"))
        .select("o_orderkey", "o_orderdate", "o_orderpriority", "revenue_micros")
        .orderBy(F.desc("revenue_micros"), "o_orderkey")
        .limit(10)
    )


@register(
    "returned_revenue_by_customer",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name AS nation,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6)))
                * 1000000 AS BIGINT) AS lost_revenue_micros,
           COUNT(*) AS n_returned_lines
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY lost_revenue_micros DESC, c_custkey
    LIMIT 20
    """,
)
def returned_revenue_by_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returned items per customer with
    their nation, top 20. Returnflag filter reaches the lineitem scan;
    nation broadcasts; the customer join shuffles once on the key that the
    aggregate then reuses (no second exchange between join and groupBy)."""
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(
            stable_sum_micros(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "lost_revenue_micros"
            ),
            F.count(F.lit(1)).alias("n_returned_lines"),
        )
        .orderBy(F.desc("lost_revenue_micros"), "c_custkey")
        .limit(20)
    )


@register(
    "part_name_fuzzy_pairs",
    oracle="""
    SELECT a.p_brand, a.p_partkey AS key_a, b.p_partkey AS key_b,
           a.p_name AS name_a, b.p_name AS name_b,
           levenshtein(a.p_name, b.p_name) AS dist
    FROM part a
    JOIN part b
      ON a.p_brand = b.p_brand
     AND a.p_partkey < b.p_partkey
     AND levenshtein(a.p_name, b.p_name) BETWEEN 1 AND 2
    ORDER BY a.p_brand, key_a, key_b
    """,
)
def part_name_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy matching (the entity-resolution cousin of
    n-gram dedup): near-identical part names within a brand, Levenshtein
    distance 1-2. Two-level blocking turns the quadratic self-join into
    small per-block quadratics: equi keys are (brand, length band), where
    one side explodes into its band and both neighbors — dist <= 2 implies
    a length difference <= 2, so banding loses nothing — and a cheap
    length-delta conjunct short-circuits before levenshtein ever runs.
    Blocking keys are the standard scale pattern for fuzzy joins; without
    the band, 800-part brand blocks cost 8M levenshtein calls at sf0.1
    (26s); with it, ~4s."""
    _BAND = 3
    part = _t(spark, sf_dir, "part").withColumn("nlen", F.length("p_name"))
    a = part.withColumn("band", (F.col("nlen") / _BAND).cast("int")).alias("a")
    b = part.withColumn(
        "probe",
        F.explode(
            F.array(
                (F.col("nlen") / _BAND).cast("int") - 1,
                (F.col("nlen") / _BAND).cast("int"),
                (F.col("nlen") / _BAND).cast("int") + 1,
            )
        ),
    ).alias("b")
    # Thresholded levenshtein (Spark 3.5+) runs the banded O(n·k) DP and
    # bails out early, returning -1 past the bound — the filter below then
    # rejects those. The vast majority of in-block pairs exceed distance 2,
    # so the early exit is where the time goes.
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"), 2)
    # Explicit repartition on the block keys: the inputs are only a few MB,
    # so AQE would coalesce the join to ~1 task — but the work here is the
    # per-pair levenshtein inside each block, invisible to size-based
    # planning. Compute-bound joins must pin their parallelism to the
    # blocks, not the bytes. Round 18: core-adaptive (the hard-coded 32
    # ruined the driver's 8-core scaling measurement and any cluster
    # deployment); 2x cores because only ~75 (brand, band) block keys
    # exist — a finer hash spreads the heavy blocks with fewer multi-
    # block collisions per task (guide §2.5 key-to-partition ratio).
    n_part = 2 * spark.sparkContext.defaultParallelism
    a = a.repartition(n_part, F.col("a.p_brand"), F.col("a.band"))
    b = b.repartition(n_part, F.col("b.p_brand"), F.col("b.probe"))
    return (
        a.join(
            b,
            (F.col("a.p_brand") == F.col("b.p_brand"))
            & (F.col("a.band") == F.col("b.probe"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey"))
            & (F.abs(F.col("a.nlen") - F.col("b.nlen")) <= 2)
            & dist.between(1, 2),
        )
        .select(
            F.col("a.p_brand").alias("p_brand"),
            F.col("a.p_partkey").alias("key_a"),
            F.col("b.p_partkey").alias("key_b"),
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            dist.alias("dist"),
        )
        .orderBy("p_brand", "key_a", "key_b")
    )


@register(
    "priority_nullsafe_join",
    oracle="""
    WITH o AS (
      SELECT o_orderkey, NULLIF(o_orderpriority, '3-MEDIUM') AS pr, o_totalprice
      FROM orders),
    dim AS (
      SELECT * FROM (VALUES ('1-URGENT', 'high'), ('2-HIGH', 'high'),
                            ('4-NOT SPECIFIED', 'low'), ('5-LOW', 'low'),
                            (NULL, 'default')) AS t(pr, tier))
    SELECT d.tier, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) * 1000000 AS BIGINT)
             AS total_micros
    FROM o JOIN dim d ON o.pr IS NOT DISTINCT FROM d.pr
    GROUP BY d.tier
    ORDER BY d.tier
    """,
)
def priority_nullsafe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    match the dimension's explicit NULL row instead of vanishing — the
    'unknown bucket' pattern for dirty keys. Plans as a regular broadcast
    hash join because null-safe equality is still an equi key."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.nullif("o_orderpriority", F.lit("3-MEDIUM")).alias("pr"),
        "o_totalprice",
    )
    dim = spark.createDataFrame(
        [("1-URGENT", "high"), ("2-HIGH", "high"),
         ("4-NOT SPECIFIED", "low"), ("5-LOW", "low"), (None, "default")],
        "pr string, tier string",
    )
    return (
        orders.join(F.broadcast(dim), orders["pr"].eqNullSafe(dim["pr"]))
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            stable_sum_micros("o_totalprice").alias("total_micros"),
        )
        .orderBy("tier")
    )


@register(
    "lateral_top_customers_per_nation",
    oracle="""
    SELECT n.n_name AS nation, t.c_name, t.bal_micros
    FROM nation n,
    LATERAL (SELECT c_name,
                    CAST(CAST(c_acctbal AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS bal_micros
             FROM customer c
             WHERE c.c_nationkey = n.n_nationkey
             ORDER BY c_acctbal DESC, c_name
             LIMIT 2) t
    ORDER BY nation, bal_micros DESC, c_name
    """,
)
def lateral_top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery through the SQL surface: top-2 customers
    by balance per nation, the per-row-subquery formulation of
    top-k-per-group. Catalyst decorrelates it into the same
    window/row_number plan the DataFrame form produces — proof the SQL and
    DataFrame surfaces share one optimizer, and that a correlated LIMIT
    subquery does NOT execute per driving row at scale."""
    _t(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql("""
        SELECT n.n_name AS nation, t.c_name, t.bal_micros
        FROM nation n,
        LATERAL (SELECT c_name,
                        CAST(CAST(c_acctbal AS DECIMAL(18,6)) * 1000000 AS BIGINT)
                          AS bal_micros
                 FROM customer c
                 WHERE c.c_nationkey = n.n_nationkey
                 ORDER BY c_acctbal DESC, c_name
                 LIMIT 2) t
        ORDER BY nation, bal_micros DESC, c_name
    """)


@register(
    "event_value_winsorized",
    oracle=f"""
    WITH cuts AS (
      SELECT event_type,
             quantile_cont(value, 0.05) AS p05,
             quantile_cont(value, 0.95) AS p95
      FROM events GROUP BY event_type),
    j AS (
      SELECT e.event_type, e.value,
             CAST(ROUND(LEAST(GREATEST(e.value, c.p05), c.p95) * 1000000) AS BIGINT) AS w_us,
             (e.value < c.p05 OR e.value > c.p95) AS clip
      FROM events e JOIN cuts c ON e.event_type = c.event_type)
    SELECT event_type,
           {sql_avg_micros('value', 'avg_raw_micros')},
           CAST((SUM(w_us) - ((SUM(w_us) % COUNT(*)) + COUNT(*)) % COUNT(*)) // COUNT(*)
             AS BIGINT) AS avg_winsorized_micros,
           COUNT(*) FILTER (clip) AS n_clipped
    FROM j
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def event_value_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization (clip to the 5th/95th percentile per group) — the
    standard robust preprocessing step before training-statistics
    aggregation. Same two-pass broadcast-back shape as the MAD outlier
    query: percentile cuts reduce to |groups| rows and rejoin broadcast."""
    events = _t(spark, sf_dir, "events")
    cuts = events.groupBy("event_type").agg(
        F.percentile("value", 0.05).alias("p05"),
        F.percentile("value", 0.95).alias("p95"),
    )
    # Per-row ROUND(x*1e6) (not a decimal cast): the clipped values carry
    # the full-precision percentile cuts, where decimal-cast tie handling
    # differs across engines; ROUND to integer agrees always because half-
    # integers are exactly representable in binary.
    clipped = F.least(F.greatest(F.col("value"), F.col("p05")), F.col("p95"))
    return (
        events.join(F.broadcast(cuts), "event_type")
        .withColumn("w_us", F.round(clipped * 1_000_000).cast("long"))
        .groupBy("event_type")
        .agg(
            stable_avg_micros("value").alias("avg_raw_micros"),
            F.expr(
                "(sum(w_us) - ((sum(w_us) % count(1)) + count(1)) % count(1))"
                " DIV count(1)"
            ).alias("avg_winsorized_micros"),
            F.count(
                F.when((F.col("value") < F.col("p05")) | (F.col("value") > F.col("p95")), 1)
            ).alias("n_clipped"),
        )
        .orderBy("event_type")
    )


@register(
    "orders_by_weekday",
    oracle="""
    WITH bounds AS (
      SELECT MIN(o_orderdate) AS lo, MAX(o_orderdate) AS hi FROM orders),
    calendar AS (
      SELECT CAST(g.d AS DATE) AS cal_date,
             CAST(isodow(g.d) - 1 AS INT) AS dow,  -- Monday=0, matching Spark weekday()
             CAST(EXTRACT(month FROM g.d) AS INT) AS month
      FROM bounds, UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS g(d))
    SELECT c.dow,
           COUNT(DISTINCT c.cal_date) AS n_days,
           COUNT(o.o_orderkey) AS n_orders,
           COUNT(o.o_orderkey) * 1000000 // COUNT(DISTINCT c.cal_date)
             AS orders_per_day_micros
    FROM calendar c
    LEFT JOIN orders o ON o.o_orderdate = c.cal_date
    GROUP BY c.dow
    ORDER BY c.dow
    """,
)
def orders_by_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generated calendar dimension (sequence+explode from a 1-row bounds
    aggregate, like the gap-fill grid) left-joined to the fact — the
    standard star-schema date-dim without ever storing one. The calendar
    side is |days| rows and broadcasts; weekday rates correctly count
    orderless days via the left join, which a plain GROUP BY over orders
    cannot see."""
    orders = _t(spark, sf_dir, "orders")
    bounds = orders.agg(F.min("o_orderdate").alias("lo"), F.max("o_orderdate").alias("hi"))
    calendar = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("cal_ts")
    ).select(
        F.to_date("cal_ts").alias("cal_date"),
        F.weekday("cal_ts").alias("dow"),
    )
    return (
        F.broadcast(calendar)
        .join(orders, F.to_date(orders["o_orderdate"]) == F.col("cal_date"), "left")
        .groupBy("dow")
        .agg(
            F.countDistinct("cal_date").alias("n_days"),
            F.count("o_orderkey").alias("n_orders"),
            F.expr("count(o_orderkey) * 1000000 DIV count(distinct cal_date)").alias(
                "orders_per_day_micros"
            ),
        )
        .orderBy("dow")
    )


# ---------------------------------------------------------------------------
# TPC-H Q5 shape: six-table regional supplier revenue
# ---------------------------------------------------------------------------


@register(
    "regional_supplier_revenue",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,6))) * 1000000 AS BIGINT)
             AS revenue_micros,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    ORDER BY revenue_micros DESC, n.n_name
    """,
)
def regional_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape — the deepest star join in the suite: local supplier
    revenue per nation within one region and order year, where "local"
    means the customer and the supplier share a nation
    (c_nationkey = s_nationkey — the theta half of the join that makes Q5
    the classic join-order benchmark).

    Scale plan: region→nation prune first (broadcast both, cutting
    supplier and customer to one region's nations before any fact
    shuffles); the orderdate filter pushes to the orders scan; the two
    fact joins (orders⋈lineitem on orderkey, then suppkey) shuffle only
    pre-filtered rows; supplier/customer/nation/region all broadcast.
    Exact split-long revenue sum (stable_sum_micros)."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1997-01-01")
        )
        .select("o_orderkey", "o_custkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")

    local_nations = F.broadcast(
        nation.join(
            F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"]
        ).select("n_nationkey", "n_name")
    )
    supp_r = maybe_broadcast(
        supp.join(local_nations, supp["s_nationkey"] == local_nations["n_nationkey"])
        .select("s_suppkey", "s_nationkey", "n_name"),
        gauge=supp,
    )
    cust_r = maybe_broadcast(
        cust.join(
            local_nations.select(F.col("n_nationkey").alias("cn_key")),
            cust["c_nationkey"] == F.col("cn_key"),
        ).select("c_custkey", "c_nationkey"),
        gauge=cust,
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust_r, orders["o_custkey"] == cust_r["c_custkey"])
        .join(
            supp_r,
            (li["l_suppkey"] == supp_r["s_suppkey"])
            & (cust_r["c_nationkey"] == supp_r["s_nationkey"]),
        )
        .groupBy("n_name")
        .agg(
            stable_sum_micros(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue_micros"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy(F.desc("revenue_micros"), "n_name")
    )


# ---------------------------------------------------------------------------
# TPC-H Q7 shape: two-nation shipping volume by year
# ---------------------------------------------------------------------------

_Q7_NATION_A = "NATION_1"
_Q7_NATION_B = "NATION_2"


@register(
    "nation_pair_volume",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(CAST(volume AS DECIMAL(18,6))) * 1000000 AS BIGINT)
             AS revenue_micros,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = '{_Q7_NATION_A}' AND n2.n_name = '{_Q7_NATION_B}')
          OR (n1.n_name = '{_Q7_NATION_B}' AND n2.n_name = '{_Q7_NATION_A}'))
        AND l.l_shipdate >= TIMESTAMP '1995-01-01'
        AND l.l_shipdate <  TIMESTAMP '1997-01-01')
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between an ordered pair of nations
    per ship year — the join topology where BOTH fact-side dimensions
    carry a selective filter and the pair predicate is a disjunction
    across the two join branches.

    Scale plan: nation prunes to the two names first; supplier and
    customer reduce against it via broadcast BEFORE touching facts, so
    the pair predicate's disjunction never sees unfiltered fact rows;
    lineitem's shipdate range pushes to the scan; the only fact shuffle
    is lineitem⋈orders on orderkey (both reduced sides broadcast into
    it). Exact split-long revenue sum."""
    pair = [_Q7_NATION_A, _Q7_NATION_B]
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name").isin(pair))
    supplier_base = load_table(spark, sf_dir, "supplier")
    customer_base = load_table(spark, sf_dir, "customer")
    supp2 = maybe_broadcast(
        supplier_base
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation")),
        gauge=supplier_base,
    )
    cust2 = maybe_broadcast(
        customer_base
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation")),
        gauge=customer_base,
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    a, b = pair
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(supp2, li["l_suppkey"] == supp2["s_suppkey"])
        .join(cust2, orders["o_custkey"] == cust2["c_custkey"])
        .filter(
            ((F.col("supp_nation") == a) & (F.col("cust_nation") == b))
            | ((F.col("supp_nation") == b) & (F.col("cust_nation") == a))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            stable_sum_micros(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue_micros"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# TPC-H Q17 shape: agg-derived threshold join (small-quantity order revenue)
# ---------------------------------------------------------------------------

@register(
    "small_qty_order_revenue",
    oracle="""
    WITH thr AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
             COUNT(*) AS cnt_qty
      FROM lineitem GROUP BY l_partkey)
    SELECT p.p_brand,
           COUNT(*) AS n_small_lines,
           CAST(COUNT(DISTINCT l.l_partkey) AS BIGINT) AS n_parts,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) * 1000000
                AS BIGINT) AS revenue_micros
    FROM lineitem l
    JOIN thr ON l.l_partkey = thr.l_partkey
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE 5 * CAST(l.l_quantity AS BIGINT) * thr.cnt_qty < thr.sum_qty
    GROUP BY p.p_brand
    ORDER BY p.p_brand
    """,
)
def small_qty_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue locked up in small-quantity lines — per
    brand, the lineitems whose quantity is below 20% of their part's own
    average order quantity (the 'stranded inventory' diagnostic). The
    classic pattern is an aggregate-derived threshold joined back to the
    fact that produced it.

    Exactness: the float predicate ``l_quantity < 0.2 * AVG(l_quantity)``
    is cross-multiplied into pure integers — ``5·qty·cnt < Σqty`` (the
    data contract pins quantities integral, asserted by the registry
    invariants test) — so neither engine evaluates a float average.

    Scale shape: the per-part threshold table is a map-side-combinable
    aggregate of the fact, one row per part — dimension-sized, so AQE
    broadcasts it back onto the fact when it fits (the observed plan
    here) and otherwise the join shuffles on ``l_partkey``, the key the
    aggregate already hashed. ``part`` is a dimension: broadcast hint.
    No window, no cartesian; the final per-brand rollup is tiny."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", F.col("l_quantity").cast("long").alias("qty"), "l_extendedprice"
    )
    thr = li.groupBy("l_partkey").agg(
        F.sum("qty").alias("sum_qty"), F.count(F.lit(1)).alias("cnt_qty")
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        li.join(thr, "l_partkey")
        .filter(5 * F.col("qty") * F.col("cnt_qty") < F.col("sum_qty"))
        .join(maybe_broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_small_lines"),
            F.countDistinct("l_partkey").alias("n_parts"),
            stable_sum_micros("l_extendedprice").alias("revenue_micros"),
        )
        .orderBy("p_brand")
    )


# ---------------------------------------------------------------------------
# Weighted PageRank over the supplier→customer nation trade graph
# ---------------------------------------------------------------------------

_PR_ITERS = 4
_PR_DAMP_PM = 850  # d = 0.85 in per-mille


def _pr_oracle() -> str:
    """Unrolled-CTE oracle for :func:`trade_pagerank`: the same edge
    derivation, then ``_PR_ITERS`` explicit iterations of the identical
    integer update — per-edge floor division inside the sum, so the fold
    is order-independent and bit-exact cross-engine."""
    base = [
        """
    edges AS (
      SELECT sn.n_name AS src, cn.n_name AS dst, COUNT(*) AS w
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation sn ON s.s_nationkey = sn.n_nationkey
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      GROUP BY sn.n_name, cn.n_name),
    nodes AS (
      SELECT src AS nation FROM edges
      UNION SELECT dst FROM edges),
    ncnt AS (SELECT COUNT(*) AS n_nodes FROM nodes),
    ow AS (SELECT src, SUM(w) AS ow FROM edges GROUP BY src),
    e AS (SELECT edges.src, edges.dst, edges.w, ow.ow
          FROM edges JOIN ow ON edges.src = ow.src),
    r0 AS (
      SELECT nd.nation, 1000000 // nc.n_nodes AS pr_ppm
      FROM nodes nd CROSS JOIN ncnt nc)"""
    ]
    for k in range(1, _PR_ITERS + 1):
        base.append(f"""
    c{k} AS (
      SELECT e.dst,
             SUM(({_PR_DAMP_PM} * r.pr_ppm * e.w) // (1000 * e.ow)) AS inc
      FROM e JOIN r{k - 1} r ON e.src = r.nation
      GROUP BY e.dst),
    r{k} AS (
      SELECT nd.nation,
             (1000 - {_PR_DAMP_PM}) * 1000 // nc.n_nodes
               + COALESCE(c.inc, 0) AS pr_ppm
      FROM nodes nd CROSS JOIN ncnt nc
      LEFT JOIN c{k} c ON c.dst = nd.nation)""")
    return (
        "    WITH "
        + ",".join(base)
        + f"""
    SELECT r.nation,
           CAST(r.pr_ppm AS BIGINT) AS pr_ppm,
           CAST(COALESCE((SELECT SUM(w) FROM edges WHERE src = r.nation), 0)
                AS BIGINT) AS out_weight,
           CAST(COALESCE((SELECT SUM(w) FROM edges WHERE dst = r.nation), 0)
                AS BIGINT) AS in_weight
    FROM r{_PR_ITERS} r
    ORDER BY pr_ppm DESC, nation
    """
    )


@register("trade_pagerank", oracle=_pr_oracle())
def trade_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (Page et al. 1999) over the supplier-nation →
    customer-nation trade graph: edge weight = lineitem count shipped
    from a supplier in ``src`` to a customer in ``dst``; damping 0.85,
    ``_PR_ITERS`` synchronous iterations — the fourth iterative-algorithm
    pattern in the engine (after connected components, Lloyd k-means and
    power iteration), in the shape GraphX/Pregel executes it.

    Exactness: ranks live in integer ppm; each iteration adds the
    teleport term ``150000 DIV n`` and per-edge contributions
    ``(850·pr·w) DIV (1000·out_w)`` — the floor division happens PER
    EDGE, inside the sum, so the fold is order-independent and both
    engines agree bit-for-bit (the float formulation would be
    order-dependent across shuffle partitionings).

    Scale shape (round 17): the edge table comes from ONE corpus-sized
    join+reduce (the ``nation_pair_volume`` shape: dimensions broadcast
    onto the fact, map-side-combinable count). The reduced table is
    nation²-bounded (≤ 625 rows at ANY corpus scale — the node set is
    the nation dimension, not the facts), so the four rank iterations
    run driver-side on the collected edge list — the same bounded-model
    pattern as the k-means centroid collect — instead of as four
    broadcast-join + shuffle rounds whose per-iteration data is 25 rows
    (the r16 plan carried 39 Exchanges / 10 SortMergeJoins of pure
    scheduling overhead; iterations on node-sized state belong on the
    driver exactly like centroids). Integer ppm arithmetic is identical
    (Python ``//`` == Spark ``DIV`` on these non-negative values), so
    the output is bit-for-bit the oracle's. Dangling nodes (no
    out-edges) keep receiving the teleport term and simply contribute
    nothing, deterministically."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supplier_base = _t(spark, sf_dir, "supplier")
    customer_base = _t(spark, sf_dir, "customer")
    supp = maybe_broadcast(
        supplier_base
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("src")),
        gauge=supplier_base,
    )
    cust = maybe_broadcast(
        customer_base
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("dst")),
        gauge=customer_base,
    )
    edge_rows = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
        .collect()  # nation²-bounded: ≤ |nation|² rows at any scale
    )
    edges = [(r["src"], r["dst"], int(r["w"])) for r in edge_rows]
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    n_nodes = len(nodes)
    if not nodes:
        # empty fact tables: the distributed formulation returned an empty
        # frame; the driver-side iteration must not divide by n_nodes == 0
        return spark.createDataFrame(
            [],
            "nation string, pr_ppm long, out_weight long, in_weight long",
        )
    ow: dict[str, int] = {}
    in_w: dict[str, int] = {}
    for s, d, w in edges:
        ow[s] = ow.get(s, 0) + w
        in_w[d] = in_w.get(d, 0) + w
    rank = {nd: 1_000_000 // n_nodes for nd in nodes}
    teleport = (1000 - _PR_DAMP_PM) * 1000 // n_nodes
    for _ in range(_PR_ITERS):
        inc = dict.fromkeys(nodes, 0)
        for s, d, w in edges:
            inc[d] += (_PR_DAMP_PM * rank[s] * w) // (1000 * ow[s])
        rank = {nd: teleport + inc[nd] for nd in nodes}
    out_rows = sorted(
        ((nd, rank[nd], ow.get(nd, 0), in_w.get(nd, 0)) for nd in nodes),
        key=lambda r: (-r[1], r[0]),
    )
    # already in (pr_ppm DESC, nation) order driver-side: a 25-row local
    # relation needs no Sort/Exchange job (the driver's comparator is
    # order-insensitive; the deterministic order is kept for readers)
    return spark.createDataFrame(
        out_rows,
        "nation string, pr_ppm long, out_weight long, in_weight long",
    )


# ---------------------------------------------------------------------------
# TPC-H Q21 shape: sole-late-supplier attribution (EXISTS/NOT-EXISTS folded
# into one aggregate pass)
# ---------------------------------------------------------------------------

@register(
    "sole_late_supplier_orders",
    oracle="""
    WITH per_order AS (
      SELECT l.l_orderkey,
             COUNT(DISTINCT l.l_suppkey) AS n_supp,
             COUNT(DISTINCT CASE WHEN l.l_shipdate
                                      > o.o_orderdate + INTERVAL 60 DAY
                                 THEN l.l_suppkey END) AS n_late,
             MIN(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                      THEN l.l_suppkey END) AS late_supp
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY l.l_orderkey)
    SELECT n.n_name AS nation,
           COUNT(*) AS n_orders,
           CAST(COUNT(DISTINCT p.late_supp) AS BIGINT) AS n_suppliers
    FROM per_order p
    JOIN supplier s ON p.late_supp = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.n_supp >= 2 AND p.n_late = 1
    GROUP BY n.n_name
    ORDER BY n_orders DESC, nation
    """,
)
def sole_late_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: multi-supplier orders held up by exactly ONE
    late supplier (shipped >60 days after the order date), attributed to
    that supplier's nation. The textbook formulation is an EXISTS plus a
    NOT-EXISTS correlated self-join on the fact; at scale both fold into
    ONE aggregate pass over lineitem⋈orders — per order, the distinct
    supplier count, the distinct LATE supplier count, and (when exactly
    one) that supplier's id via ``min(when(late, suppkey))``. One
    shuffle on the order key replaces two correlated fact self-joins;
    supplier/nation are broadcast dimensions. All-integer/date cells."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    late = F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60)
    per_order = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(F.when(late, F.col("l_suppkey"))).alias("n_late"),
            F.min(F.when(late, F.col("l_suppkey"))).alias("late_supp"),
        )
        .filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
    )
    supplier_base = _t(spark, sf_dir, "supplier")
    supp = maybe_broadcast(
        supplier_base
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation")),
        gauge=supplier_base,
    )
    return (
        per_order.join(supp, F.col("late_supp") == F.col("s_suppkey"))
        .groupBy("nation")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("late_supp").alias("n_suppliers"),
        )
        .orderBy(F.desc("n_orders"), "nation")
    )


# ---------------------------------------------------------------------------
# TPC-H Q22 shape: idle high-balance customers (broadcast scalar threshold
# + anti join)
# ---------------------------------------------------------------------------

@register(
    "idle_high_balance_customers",
    oracle="""
    WITH bal AS (
      SELECT c_custkey, c_mktsegment,
             CAST(CAST(c_acctbal AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS bal_us
      FROM customer),
    thr AS (
      SELECT CAST(SUM(bal_us) AS BIGINT) AS sum_us, COUNT(*) AS cnt
      FROM bal WHERE bal_us > 0)
    SELECT b.c_mktsegment,
           COUNT(*) AS n_customers,
           CAST(SUM(b.bal_us) AS BIGINT) AS total_balance_micros
    FROM bal b CROSS JOIN thr t
    WHERE b.bal_us * t.cnt > t.sum_us
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = b.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-08-01')
    GROUP BY b.c_mktsegment
    ORDER BY b.c_mktsegment
    """,
)
def idle_high_balance_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers whose account balance beats the
    average positive balance but placed no order in the dataset's final
    year (dormant since 2000-08-01) — the 'sales opportunity' report,
    per market segment. Composite of the two
    classic decorrelations: the scalar subquery becomes a broadcast
    1-row (Σ, n) aggregate with the comparison cross-multiplied into
    exact integers (``bal·n > Σ`` — no float average), and the NOT
    EXISTS becomes a left-anti join against the recent-order custkeys.
    The anti-join probe side is pre-projected to its key with the date
    filter pushed to the scan; the per-segment rollup is tiny."""
    bal = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", micros("c_acctbal").alias("bal_us")
    )
    thr = bal.filter(F.col("bal_us") > 0).agg(
        F.sum("bal_us").alias("sum_us"), F.count(F.lit(1)).alias("cnt")
    )
    recent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-08-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        bal.crossJoin(F.broadcast(thr))
        .filter(F.col("bal_us") * F.col("cnt") > F.col("sum_us"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("bal_us").alias("total_balance_micros"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# TPC-H Q2 shape (round 13): correlated-min supplier selection, adapted to
# the driver's schema (no partsupp table: lineitem is the part↔supplier
# fact and realized unit price stands in for ps_supplycost)
# ---------------------------------------------------------------------------

@register(
    "cheapest_supplier_per_part",
    oracle="""
    WITH offer AS (
      SELECT l.l_partkey AS partkey, l.l_suppkey AS suppkey,
             MIN(l.l_extendedprice / l.l_quantity) AS unit_price
      FROM lineitem l
      GROUP BY l.l_partkey, l.l_suppkey),
    best AS (
      SELECT partkey, MIN(unit_price) AS best_price
      FROM offer GROUP BY partkey)
    SELECT o.partkey AS p_partkey, p.p_brand, s.s_name, n.n_name AS nation,
           CAST(ROUND(o.unit_price * 1000000) AS BIGINT) AS unit_price_micros
    FROM offer o
    JOIN best b ON b.partkey = o.partkey AND o.unit_price = b.best_price
    JOIN part p ON p.p_partkey = o.partkey
    JOIN supplier s ON s.s_suppkey = o.suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_size >= 20
    ORDER BY p_partkey, s_name
    """,
)
def cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for every large part, the supplier(s) realizing the
    lowest unit price — the correlated scalar-min subquery re-expressed as
    aggregate + join-back (the decorrelation Catalyst would otherwise have
    to find). Ties keep every achieving supplier, Q2-style.

    Scale shape: one map-side-combinable (part, supp) aggregate over
    lineitem, a part-keyed min (tiny), an equi join-back on the SAME key
    the first aggregate already hashed (AQE broadcasts the min table when
    it fits), then broadcast dimension hops. The float min/equality
    compares identical IEEE divisions in both engines; rounding to micros
    happens only at output."""
    offer = (
        _t(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_partkey").alias("partkey"),
            F.col("l_suppkey").alias("suppkey"),
        )
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"))
    )
    best = offer.groupBy("partkey").agg(F.min("unit_price").alias("best_price"))
    part = _t(spark, sf_dir, "part").filter(F.col("p_size") >= 20)
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    return (
        offer.join(
            best,
            (offer["partkey"] == best["partkey"])
            & (F.col("unit_price") == F.col("best_price")),
        )
        .drop(best["partkey"])
        .join(part, F.col("partkey") == F.col("p_partkey"))
        .join(maybe_broadcast(supplier), F.col("suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "p_partkey",
            "p_brand",
            "s_name",
            F.col("n_name").alias("nation"),
            round_micros(F.col("unit_price")).alias("unit_price_micros"),
        )
        .orderBy("p_partkey", "s_name")
    )


# ---------------------------------------------------------------------------
# TPC-H Q9 shape (round 13): multi-dimension profit rollup by nation x year
# ---------------------------------------------------------------------------

@register(
    "widget_revenue_by_nation_year",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,6))) * 1000000 AS BIGINT)
             AS revenue_micros,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY n.n_name, EXTRACT(year FROM o.o_orderdate)
    ORDER BY nation, o_year
    """,
)
def widget_revenue_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (profit by supplier-nation and order year, LIKE
    filter on part name; revenue stands in for profit — the schema has no
    supplycost). Five-way join where the part filter PRUNES the fact scan
    early via the broadcast hash join, then a two-key rollup.

    Scale shape: part/supplier/nation broadcast; lineitem⋈orders is the
    only big shuffle, keyed on orderkey; the aggregate partial-combines
    map-side. The year extraction runs on UTC timestamps in both
    engines."""
    lineitem = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("widget"))
    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders")
    return (
        lineitem.join(maybe_broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(maybe_broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(
            stable_sum_micros(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue_micros"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("nation", "o_year")
    )


# ---------------------------------------------------------------------------
# TPC-H Q19 shape (round 13): disjunctive multi-clause join predicate
# ---------------------------------------------------------------------------

@register(
    "brand_size_qty_revenue",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,6))) * 1000000 AS BIGINT)
             AS revenue_micros
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#19' AND p.p_size BETWEEN 10 AND 25
           AND l.l_quantity >= 10 AND l.l_quantity <= 30)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 20 AND 35
           AND l.l_quantity >= 20 AND l.l_quantity <= 40)
    """,
)
def brand_size_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: an OR of three (brand, size-range, qty-range)
    conjunctions across the join — the disjunctive-predicate stress case.
    The join stays an EQUI hash join on partkey (the disjunction is a
    post-join filter, never a nested-loop condition), and Catalyst pushes
    the brand/size disjunction's common subexpressions to the part scan.
    Single-row output: global count + exact revenue micros."""
    lineitem = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    clause = (
        (F.col("p_brand") == "Brand#13")
        & F.col("p_size").between(1, 15)
        & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 20)
    ) | (
        (F.col("p_brand") == "Brand#19")
        & F.col("p_size").between(10, 25)
        & (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 30)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(20, 35)
        & (F.col("l_quantity") >= 20) & (F.col("l_quantity") <= 40)
    )
    return (
        lineitem.join(maybe_broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(clause)
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            stable_sum_micros(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue_micros"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q18 shape (round 13): large-quantity orders via agg-filtered semi join
# ---------------------------------------------------------------------------

_Q18_QTY = 250


@register(
    "large_quantity_orders",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) * 1000000 AS BIGINT)
               AS total_qty_micros
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > {_Q18_QTY})
    SELECT c.c_name, o.o_orderkey, CAST(o.o_orderdate AS DATE) AS o_orderdate,
           CAST(CAST(o.o_totalprice AS DECIMAL(18,6)) * 1000000 AS BIGINT)
             AS totalprice_micros,
           b.total_qty_micros
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o.o_orderkey
    """,
)
def large_quantity_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total line quantity exceeds
    {_Q18_QTY}, with their customer — the IN-(grouped-HAVING-subquery)
    pattern as aggregate + join (what the decorrelator produces). The
    heavy aggregate runs FIRST and its survivors are few, so the
    orders/customer joins probe with a filtered build side (AQE broadcasts
    it). The quantity threshold compares exact micros integers in both
    engines."""
    big = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(stable_sum_micros(F.col("l_quantity")).alias("total_qty_micros"))
        .filter(F.col("total_qty_micros") > _Q18_QTY * 1_000_000)
    )
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            micros(F.col("o_totalprice")).alias("totalprice_micros"),
            "total_qty_micros",
        )
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# TPC-H Q15 shape (round 13, post-window): top supplier(s) via max-over-agg
# ---------------------------------------------------------------------------

@register(
    "top_quarter_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(18,6))) * 1000000 AS BIGINT)
               AS total_revenue_micros
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey),
    mx AS (SELECT MAX(total_revenue_micros) AS m FROM rev)
    SELECT s.s_suppkey, s.s_name, r.total_revenue_micros
    FROM rev r JOIN mx ON r.total_revenue_micros = mx.m
    JOIN supplier s ON s.s_suppkey = r.l_suppkey
    ORDER BY s.s_suppkey
    """,
)
def top_quarter_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with the maximum 1996-Q1 revenue
    — the view-over-aggregate + scalar-max pattern, decorrelated to
    aggregate -> broadcast 1-row max -> integer-equality filter (exact
    micros, so the tie semantics are bit-identical in both engines; Q15
    keeps ALL maximum achievers).

    Scale shape: the quarter filter reaches the parquet scan; one
    map-combinable supplier aggregate; the max is one broadcast row; the
    supplier dimension broadcasts. No window, no second pass over
    lineitem."""
    rev = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            stable_sum_micros(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("total_revenue_micros")
        )
    )
    mx = rev.agg(F.max("total_revenue_micros").alias("m"))
    supplier = _t(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue_micros") == F.col("m"))
        .join(maybe_broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue_micros")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# TPC-H Q4 shape (round 13, post-window): EXISTS semi join by priority
# ---------------------------------------------------------------------------

@register(
    "late_shipment_orders_by_priority",
    oracle="""
    SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-01-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate >= o.o_orderdate + INTERVAL 90 DAY)
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def late_shipment_orders_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: 1995 orders with AT LEAST ONE line shipped 90+
    days after the order date (the schema has no commit/receipt dates, so
    ship-lag stands in for Q4's late-delivery predicate), counted by
    priority. The EXISTS subquery is a LEFT SEMI join — one probe per
    order no matter how many lines qualify — with the correlated date
    arithmetic in the join condition.

    Scale shape: the year filter reaches the orders scan; the semi join
    shuffles on the same orderkey both tables are naturally keyed by
    (bucketed in production: shuffle-free); the priority rollup is five
    groups, map-combinable."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    lineitem = _t(spark, sf_dir, "lineitem")
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")
    )
    return (
        orders.join(lineitem, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# TPC-H Q8 shape (round 14): nation market share inside a region market
# ---------------------------------------------------------------------------

@register(
    "nation_market_share",
    oracle="""
    WITH rev AS (
      SELECT year(o.o_orderdate) AS order_year,
             CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                           AS DECIMAL(18,6))) * 1000000 AS BIGINT)
               AS total_rev_micros,
             CAST(SUM(CAST(CASE WHEN sn.n_name = 'NATION_3'
                                THEN l.l_extendedprice * (1 - l.l_discount)
                                ELSE 0 END AS DECIMAL(18,6))) * 1000000
                  AS BIGINT) AS nation_rev_micros
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation cn ON cn.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = cn.n_regionkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation sn ON sn.n_nationkey = s.s_nationkey
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
      GROUP BY year(o.o_orderdate))
    SELECT order_year, nation_rev_micros, total_rev_micros,
           CAST(nation_rev_micros // (total_rev_micros // 1000000)
                AS BIGINT) AS share_ppm
    FROM rev
    ORDER BY order_year
    """,
)
def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: the share of PROMO-part revenue inside the ASIA
    customer market supplied by NATION_3, per order year. The classic
    CASE-inside-SUM market-share rollup: one conditional aggregate, not
    two scans.

    Scale shape: lineitem joins orders on the fact key (the one real
    shuffle), every dimension hop — customer side for the market filter,
    supplier side for the share tag, part for the type filter — is a
    broadcast, and the year rollup is map-combinable with BOTH sums in
    one pass. share_ppm uses the overflow-safe integer form
    num // (den // 1e6): micros totals grow with the corpus, so
    1e6 * num would overflow int64 long before 100 TB, while this form
    never leaves BIGINT and floors identically in both engines."""
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    supplier = _t(spark, sf_dir, "supplier")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    cust_market = (
        customer.join(
            F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .select("c_custkey")
    )
    supp_nation = supplier.join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("sn_key"),
                                  F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("sn_key"),
    ).select("s_suppkey", "supp_nation")
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    agg = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(maybe_broadcast(cust_market, gauge=customer),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(maybe_broadcast(supp_nation, gauge=supplier),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(maybe_broadcast(part.select("p_partkey")),
              F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            stable_sum_micros(rev).alias("total_rev_micros"),
            stable_sum_micros(
                F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(0.0)
            ).alias("nation_rev_micros"),
        )
    )
    return agg.select(
        "order_year",
        "nation_rev_micros",
        "total_rev_micros",
        F.expr(
            "nation_rev_micros div (total_rev_micros div 1000000)"
        ).alias("share_ppm"),
    ).orderBy("order_year")


# ---------------------------------------------------------------------------
# TPC-H Q13 shape (round 14): customer order-count distribution
# ---------------------------------------------------------------------------

@register(
    "customer_order_distribution",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_custkey,
             COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON o.o_custkey = c.c_custkey
       AND o.o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c.c_custkey)
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM per_cust
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: the distribution of per-customer order counts,
    counting only orders with a stated priority — customers with NO
    qualifying orders must appear in the zero bucket, which is why the
    join is LEFT OUTER with the predicate INSIDE the join condition
    (pushing it to a WHERE would silently drop them, the classic Q13
    trap).

    Scale shape: the filtered orders side aggregates per customer after
    one hash shuffle on o_custkey; the left join back to customer runs
    on the same key; the final distribution groupBy moves one row per
    customer COUNT VALUE (tiny). COUNT(o_orderkey) counts non-null
    matches only, exactly like the SQL."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        customer.join(
            orders,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("o_orderpriority") != "4-NOT SPECIFIED"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# ---------------------------------------------------------------------------
# TPC-H Q16 shape (round 14): supplier diversity per part segment
# ---------------------------------------------------------------------------

@register(
    "part_supplier_counts",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (1, 5, 9, 14, 20, 28, 36, 45)
      AND l.l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
)
def part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers serve each (brand,
    type, size) part segment, excluding one brand, off-list sizes, and a
    supplier denylist (negative account balance standing in for Q16's
    complaint predicate) — the NOT-IN-subquery + COUNT DISTINCT shape.

    Scale shape: the denylist is a tiny broadcast LEFT ANTI join (never
    a shuffled NOT IN); the part filter prunes before the fact join;
    distinct (segment, suppkey) pairs reduce map-side before the final
    count — the same two-level distinct-aggregate plan Catalyst picks
    for COUNT(DISTINCT) with a grouped key."""
    lineitem = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 9, 14, 20, 28, 36, 45)
    )
    denylist = _t(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        lineitem.join(
            maybe_broadcast(denylist),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(maybe_broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q14 shape (round 14): promo revenue share per ship month
# ---------------------------------------------------------------------------

@register(
    "promo_revenue_share",
    oracle="""
    WITH rev AS (
      SELECT CAST(date_trunc('month', l.l_shipdate) AS DATE) AS ship_month,
             CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                           AS DECIMAL(18,6))) * 1000000 AS BIGINT)
               AS total_rev_micros,
             CAST(SUM(CAST(CASE WHEN p.p_type = 'PROMO'
                                THEN l.l_extendedprice * (1 - l.l_discount)
                                ELSE 0 END AS DECIMAL(18,6))) * 1000000
                  AS BIGINT) AS promo_rev_micros
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE year(l.l_shipdate) = 1997
      GROUP BY date_trunc('month', l.l_shipdate))
    SELECT ship_month, promo_rev_micros, total_rev_micros,
           CAST(promo_rev_micros // (total_rev_micros // 1000000)
                AS BIGINT) AS promo_ppm
    FROM rev
    ORDER BY ship_month
    """,
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: the PROMO-part share of revenue per ship month of
    1997 — the other canonical CASE-inside-SUM ratio rollup, this one
    keyed on a date-truncated month (a DATE output cell, so the query
    also guards the hostile-TZ contract).

    Scale shape: the ship-year filter prunes the fact scan first; part
    is a broadcast dimension hop; the month rollup is map-combinable
    with both conditional sums in one pass; promo_ppm uses the same
    overflow-safe num // (den // 1e6) integer form as the Q8 shape."""
    lineitem = _t(spark, sf_dir, "lineitem").filter(
        F.year("l_shipdate") == 1997
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    agg = (
        lineitem.join(maybe_broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.trunc("l_shipdate", "month").alias("ship_month"))
        .agg(
            stable_sum_micros(rev).alias("total_rev_micros"),
            stable_sum_micros(
                F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)
            ).alias("promo_rev_micros"),
        )
    )
    return agg.select(
        "ship_month",
        "promo_rev_micros",
        "total_rev_micros",
        F.expr(
            "promo_rev_micros div (total_rev_micros div 1000000)"
        ).alias("promo_ppm"),
    ).orderBy("ship_month")
