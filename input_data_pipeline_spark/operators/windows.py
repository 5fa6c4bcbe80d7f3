"""Window functions + events analytics (SURVEY.md §2.6, J5, §2.9 batch forms).

Window specs shuffle once on the partition key and sort within partitions;
every function over the same (partitionBy, orderBy) shares that one exchange.
Sessionization is the batch form of streaming session windows: lag-gap flag +
cumulative sum — the DuckDB-checkable stand-in the streaming layer mirrors.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from input_data_pipeline_spark.functions.stable import (
    micros,
    round_micros,
    sql_micros,
    sql_sum_micros,
    stable_sum_micros,
    stable_sum_micros_over,
)
from input_data_pipeline_spark.plans.registry import register
from input_data_pipeline_spark.tables import load_table

SESSION_GAP_MINUTES = 30


@register(
    "top_events_per_user",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value
      FROM events),
    ranked AS (
      SELECT user_id, event_id, ts_us, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts_us DESC, event_id DESC) AS rn
      FROM ev)
    SELECT user_id, event_id, ts_us, {sql_micros("value", "value_micros")}, rn
    FROM ranked
    WHERE rn <= 3
    ORDER BY user_id, rn
    """,
)
def top_events_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 latest events per user: the canonical top-k-per-group.

    One shuffle on user_id; row_number is computed streaming over the sorted
    partition, and the rn<=3 filter cuts cardinality before anything wide.
    Integer-only cells (epoch-micros, exact millionths), and both engines
    rank over the truncated micros — immune to comparator canonicalization
    and to a nanos-precision oracle reader reordering same-µs events.
    """
    events = load_table(spark, sf_dir, "events")
    ev = events.select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "value"
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("ts_us"), F.desc("event_id"))
    return (
        ev
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("user_id", "event_id", "ts_us", micros("value").alias("value_micros"), "rn")
        .orderBy("user_id", "rn")
    )


@register(
    "event_value_deltas",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
             CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS value_micros
      FROM events
      WHERE event_type = 'purchase')
    SELECT user_id, event_id, ts_us, value_micros,
           value_micros - LAG(value_micros) OVER w AS delta_prev_micros,
           LEAD(value_micros) OVER w - value_micros AS delta_next_micros
    FROM ev
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
    ORDER BY user_id, ts_us, event_id
    """,
)
def event_value_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead deltas over each user's purchase history (SURVEY §2.6
    analytic functions); NULL at partition edges by construction. Values are
    quantized to exact millionths BEFORE differencing, so the deltas are
    integer arithmetic on both engines (a float subtract of rounded doubles
    can land on either side of the round boundary)."""
    events = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    ev = events.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        micros("value").alias("value_micros"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return (
        ev
        .select(
            "user_id",
            "event_id",
            "ts_us",
            "value_micros",
            (F.col("value_micros") - F.lag("value_micros").over(w)).alias("delta_prev_micros"),
            (F.lead("value_micros").over(w) - F.col("value_micros")).alias("delta_next_micros"),
        )
        .orderBy("user_id", "ts_us", "event_id")
    )


@register(
    "user_running_totals",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value
      FROM events)
    SELECT user_id, event_id, ts_us,
           CAST(SUM(CAST(value AS DECIMAL(18,6)))
                OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                * 1000000 AS BIGINT)
             AS running_value_micros,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS running_events
    FROM ev
    ORDER BY user_id, ts_us, event_id
    """,
)
def user_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative frame aggregates (rowsBetween unboundedPreceding→current);
    integer-only cells (epoch-micros, exact millionths running sum)."""
    events = load_table(spark, sf_dir, "events")
    ev = events.select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev
        .select(
            "user_id",
            "event_id",
            "ts_us",
            stable_sum_micros_over("value", w).alias("running_value_micros"),
            F.count(F.lit(1)).over(w).alias("running_events"),
        )
        .orderBy("user_id", "ts_us", "event_id")
    )


@register(
    "order_rank_in_priority",
    oracle="""
    SELECT o_orderkey, o_orderpriority AS priority,
           CAST(CAST(o_totalprice AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS totalprice_micros,
           RANK() OVER w AS price_rank,
           DENSE_RANK() OVER w AS price_dense_rank,
           NTILE(4) OVER w AS price_quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
    ORDER BY priority, price_rank, o_orderkey
    """,
)
def order_rank_in_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile sharing one window exchange."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders
        .select(
            "o_orderkey",
            F.col("o_orderpriority").alias("priority"),
            micros("o_totalprice").alias("totalprice_micros"),
            F.rank().over(w).alias("price_rank"),
            F.dense_rank().over(w).alias("price_dense_rank"),
            F.ntile(4).over(w).alias("price_quartile"),
        )
        .orderBy("priority", "price_rank", "o_orderkey")
    )


_GAP_US = SESSION_GAP_MINUTES * 60 * 1_000_000


@register(
    "user_sessions",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value
      FROM events),
    flagged AS (
      SELECT user_id, ts_us, value, event_id,
             CASE WHEN ts_us - LAG(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
                       > {_GAP_US}
                  OR LAG(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM ev),
    sessions AS (
      SELECT user_id, ts_us, value,
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM flagged)
    SELECT user_id, session_id,
           MIN(ts_us) AS session_start_us,
           MAX(ts_us) AS session_end_us,
           COUNT(*) AS n_events,
           {sql_sum_micros("value", "session_value_micros")}
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
)
def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: {SESSION_GAP_MINUTES}-min-gap sessions per user.

    Batch equivalent of streaming ``session_window`` (streaming/pipelines.py):
    lag-gap flag → running sum → grouped agg. Two window passes share the
    same (user_id; ts_us) shuffle+sort; the final groupBy is partial-aggregated.

    Cross-engine exactness: the gap is compared in integer MICROSECONDS on
    both sides (``unix_micros`` / ``epoch_us``) — the old whole-second cast
    sessionized gaps in (1800, 1801) s differently from the oracle's exact
    interval compare — and every output cell is an integer (epoch-micros
    bounds, exact millionths value sum), so no float- or timestamp-
    canonicalization difference in any comparator can bite. Both engines
    also ORDER BY the truncated micros, closing the tie-break divergence a
    nanos-precision reader would otherwise hit on same-microsecond events.
    """
    events = load_table(spark, sf_dir, "events")
    ev = events.select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "value"
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap = F.col("ts_us") - F.lag("ts_us").over(w)
    return (
        ev
        .withColumn(
            "is_new",
            F.when(gap.isNull() | (gap > _GAP_US), 1).otherwise(0),
        )
        .withColumn("session_id", F.sum("is_new").over(cum))
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts_us").alias("session_start_us"),
            F.max("ts_us").alias("session_end_us"),
            F.count(F.lit(1)).alias("n_events"),
            stable_sum_micros("value").alias("session_value_micros"),
        )
        .orderBy("user_id", "session_id")
    )


@register(
    "event_type_hourly",
    oracle="""
    SELECT epoch_us(DATE_TRUNC('hour', ts)) AS hour_us,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS total_value_micros
    FROM events
    GROUP BY 1, 2
    ORDER BY hour_us, event_type
    """,
)
def event_type_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window agg in batch form (date_trunc hour) — mirror of the
    streaming tumbling window in streaming/pipelines.py."""
    events = load_table(spark, sf_dir, "events")
    return (
        events
        .groupBy(F.unix_micros(F.date_trunc("hour", "ts")).alias("hour_us"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            stable_sum_micros("value").alias("total_value_micros"),
        )
        .orderBy("hour_us", "event_type")
    )


@register(
    "event_props_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) * 1000000
             // COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS avg_k_micros,
           MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def event_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction (SURVEY F8): parse the props JSON column
    with an explicit schema (from_json, JVM-side) and aggregate."""
    events = load_table(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "struct<k:int>").getField("k")
    return (
        events
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(k.cast("long")) * 1_000_000).cast("long").alias("_sk"),
            F.count(k).alias("_nk"),
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
        )
        .withColumn("avg_k_micros", F.expr("_sk DIV _nk"))
        .select("event_type", "n", "avg_k_micros", "min_k", "max_k")
        .orderBy("event_type")
    )


@register(
    "clicks_before_purchase",
    oracle="""
    WITH ev AS (
      SELECT event_id, user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
      FROM events)
    SELECT p.event_id AS purchase_id, c.event_id AS click_id,
           p.ts_us AS purchase_ts_us, c.ts_us AS click_ts_us
    FROM ev p
    JOIN ev c
      ON c.user_id = p.user_id
     AND c.ts_us >= p.ts_us - 600000000
     AND c.ts_us < p.ts_us
    WHERE p.event_type = 'purchase' AND c.event_type = 'click'
    ORDER BY purchase_id, click_id
    """,
)
def clicks_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join (SURVEY J5): clicks in the 10 minutes before each purchase
    by the same user. The equi part (user_id) keeps it a hash join; the range
    predicate filters post-probe, so this never degrades to a
    broadcast-nested-loop. At 100 TB you'd additionally band both sides on
    time buckets to bound the per-key fan-out. The range compares integer
    epoch-micros on both engines and the cells are integers — immune to a
    nanos-precision oracle reader at the 10-minute boundary."""
    events = load_table(spark, sf_dir, "events")
    ev = events.select(
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts_us").alias("purchase_ts_us"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts_us").alias("click_ts_us"),
    )
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts_us") >= F.col("purchase_ts_us") - 600_000_000)
        & (F.col("click_ts_us") < F.col("purchase_ts_us"))
    )
    return (
        purchases.join(clicks, cond)
        .select("purchase_id", "click_id", "purchase_ts_us", "click_ts_us")
        .orderBy("purchase_id", "click_id")
    )


@register(
    "purchase_click_attribution",
    oracle="""
    WITH ev AS (
      SELECT event_id, user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
      FROM events)
    SELECT p.event_id AS purchase_id, p.user_id,
           CAST(COUNT(c.event_id) AS BIGINT) AS n_clicks,
           MIN(c.event_id) AS first_click_id,
           COUNT(c.event_id) > 0 AS matched
    FROM ev p
    LEFT JOIN ev c
      ON c.user_id = p.user_id
     AND c.event_type = 'click'
     AND c.ts_us >= p.ts_us - 600000000
     AND c.ts_us < p.ts_us
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id, p.user_id
    ORDER BY purchase_id
    """,
)
def purchase_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER range join (round 13) — the batch differential face of
    ``streaming.pipelines.join_clicks_to_purchases_outer``: EVERY purchase
    emits, with the count of same-user clicks in the preceding 10 minutes
    and the earliest such click id, NULL/0 when none (the rows the
    streaming form null-emits on watermark expiry). Same scale contract
    as ``clicks_before_purchase``: the equi key keeps it a hash join, the
    range predicate filters post-probe, integer epoch-micros on both
    engines."""
    events = load_table(spark, sf_dir, "events")
    ev = events.select(
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("user_id"),
        F.col("ts_us").alias("purchase_ts_us"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts_us").alias("click_ts_us"),
    )
    cond = (
        (F.col("c_user") == F.col("user_id"))
        & (F.col("click_ts_us") >= F.col("purchase_ts_us") - 600_000_000)
        & (F.col("click_ts_us") < F.col("purchase_ts_us"))
    )
    return (
        purchases.join(clicks, cond, "left")
        .groupBy("purchase_id", "user_id")
        .agg(
            F.count("click_id").alias("n_clicks"),
            F.min("click_id").alias("first_click_id"),
            (F.count("click_id") > 0).alias("matched"),
        )
        .orderBy("purchase_id")
    )


@register(
    "session_window_native",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value
      FROM events),
    flagged AS (
      SELECT user_id, ts_us, value,
             CASE WHEN ts_us - LAG(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us)
                       > {_GAP_US}
                  OR LAG(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM ev),
    sessions AS (
      SELECT user_id, ts_us, value,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged)
    SELECT user_id,
           MIN(ts_us) AS session_start_us,
           MAX(ts_us) + {_GAP_US} AS session_end_us,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 4) * 1000000 AS BIGINT)
             AS session_value_micros
    FROM sessions
    GROUP BY user_id, sid
    ORDER BY user_id, session_start_us
    """,
)
def session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's native ``F.session_window`` run in batch mode, differentially
    checked against the classic lag-gap sessionization SQL (the two must
    agree exactly; session_window's end = last event + gap). This is the
    batch-checkable face of streaming/pipelines.py::session_windows.

    Scale: one shuffle on user_id; session assembly is then per-partition.
    Hot users are single-key-bound by nature of sessions — AQE skew-join
    doesn't apply to aggs, so at 100 TB the guard is the watermark (streaming)
    or date-partitioned input (batch) keeping any one user's span bounded.
    """
    from input_data_pipeline_spark.streaming.pipelines import session_windows

    events = load_table(spark, sf_dir, "events")
    # Batch mode ignores the watermark clause; reuse the exact streaming op.
    # The oracle-facing projection converts to integer cells (epoch-micros
    # bounds, millionths value) so the comparison is canonicalization-proof;
    # the streaming op itself keeps its timestamp/double schema for sinks.
    return (
        session_windows(events, gap=f"{SESSION_GAP_MINUTES} minutes")
        .select(
            "user_id",
            F.unix_micros("session_start").alias("session_start_us"),
            F.unix_micros("session_end").alias("session_end_us"),
            "n_events",
            micros("session_value").alias("session_value_micros"),
        )
        .orderBy("user_id", "session_start_us")
    )


@register(
    "sliding_window_counts",
    oracle="""
    WITH slid AS (
      SELECT e.event_type, e.value,
             time_bucket(INTERVAL '2 hours', e.ts) - k.off * INTERVAL '2 hours'
               AS window_start
      FROM events e,
           LATERAL (SELECT unnest([0, 1]) AS off) k)
    SELECT epoch_us(window_start) AS window_start_us,
           epoch_us(window_start + INTERVAL '4 hours') AS window_end_us,
           event_type,
           COUNT(*) AS n,
           CAST(ROUND(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 4) * 1000000) AS BIGINT)
             AS total_value_micros
    FROM slid
    GROUP BY window_start, event_type
    ORDER BY window_start_us, event_type
    """,
)
def sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows (4h wide, 2h slide) in batch mode — the
    batch-checkable face of streaming/pipelines.py::windowed_counts. Each
    event lands in exactly width/slide = 2 windows; the oracle replays that
    as an explicit 2-way window-start expansion over ``time_bucket``.

    Scale: F.window with slide explodes rows by width/slide *before* the
    partial agg, so keep that ratio small; the shuffle carries only
    (window, type) partials thanks to map-side combine.
    """
    from input_data_pipeline_spark.streaming.pipelines import windowed_counts

    events = load_table(spark, sf_dir, "events")
    # Oracle-facing projection in integer cells (epoch-micros bounds,
    # micros value); the streaming op keeps its timestamp/double schema.
    return (
        windowed_counts(events, size="4 hours", slide="2 hours")
        .select(
            F.unix_micros("window_start").alias("window_start_us"),
            F.unix_micros("window_end").alias("window_end_us"),
            "event_type",
            "n",
            round_micros(F.col("total_value")).alias("total_value_micros"),
        )
        .orderBy("window_start_us", "event_type")
    )


@register(
    "event_transitions",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events)
    SELECT event_type, next_type, COUNT(*) AS n,
           CAST(COUNT(*) * 1000000 // SUM(COUNT(*)) OVER (PARTITION BY event_type)
             AS BIGINT) AS p_next_ppm
    FROM ordered
    WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    ORDER BY event_type, next_type
    """,
)
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition matrix (first-order Markov estimate): lead()
    per user stream, then bigram counts normalized per source state — the
    behavioral-analytics primitive behind next-action prediction features.
    One shuffle for the window, one for the count; the normalizing window
    runs over the 25-row aggregate, not the events.
    """
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    norm = Window.partitionBy("event_type")
    return (
        pairs.withColumn("_tot", F.sum("n").over(norm))
        .withColumn("p_next_ppm", F.expr("n * 1000000 DIV _tot"))
        .drop("_tot")
        .orderBy("event_type", "next_type")
    )


@register(
    "weekly_cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, MIN(date_trunc('week', ts)) AS cohort_week
      FROM events GROUP BY user_id),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             CAST(datediff('week', f.cohort_week, date_trunc('week', e.ts)) AS BIGINT)
               AS week_offset
      FROM events e JOIN firsts f USING (user_id))
    SELECT cohort_week, week_offset, COUNT(*) AS n_active_users
    FROM activity
    GROUP BY cohort_week, week_offset
    ORDER BY cohort_week, week_offset
    """,
)
def weekly_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users bucketed by first-activity week, then
    counted per (cohort, weeks-since-first) — the retention-matrix shape.
    The cohort table is |users| rows and broadcasts; the activity distinct
    collapses events to (user, week) before the final count.
    """
    events = load_table(spark, sf_dir, "events")
    # to_date: DuckDB's week-trunc yields DATE; match the type exactly
    week = F.to_date(F.date_trunc("week", F.col("ts")))
    firsts = events.groupBy("user_id").agg(F.min(week).alias("cohort_week"))
    activity = (
        events.join(F.broadcast(firsts), "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(week, F.col("cohort_week")) / 7
            ).cast("long").alias("week_offset"),
        )
        .distinct()
    )
    return (
        activity.groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active_users"))
        .orderBy("cohort_week", "week_offset")
    )


@register(
    "customer_value_quartiles",
    oracle="""
    WITH spend AS (
      SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) * 1000000 AS BIGINT)
               AS spend_micros
      FROM orders GROUP BY o_custkey)
    SELECT o_custkey, spend_micros,
           CAST(NTILE(4) OVER w AS INT) AS quartile,
           CAST(ROUND(PERCENT_RANK() OVER w * 1000000) AS BIGINT) AS pct_rank_ppm,
           CAST(ROUND(CUME_DIST() OVER w * 1000000) AS BIGINT) AS cume_ppm
    FROM spend
    WINDOW w AS (ORDER BY spend_micros, o_custkey)
    ORDER BY spend_micros, o_custkey
    """,
)
def customer_value_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / percent_rank / cume_dist (SURVEY §2.6 ranking set): customer
    spend quartiles over a global ordering, deterministic via the custkey
    tiebreak.

    A window with no partitionBy is a single-task sort — acceptable here
    only because it runs *after* the groupBy collapsed orders to one row
    per customer (cardinality ≪ fact table). At 100 TB the same pattern
    holds: rank post-aggregation output, never raw facts; for fact-grain
    ranking use percentile cutpoints joined back instead.
    """
    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        stable_sum_micros("o_totalprice").alias("spend_micros")
    )
    w = Window.orderBy("spend_micros", "o_custkey")
    return spend.select(
        "o_custkey",
        "spend_micros",
        F.ntile(4).over(w).alias("quartile"),
        round_micros(F.percent_rank().over(w)).alias("pct_rank_ppm"),
        round_micros(F.cume_dist().over(w)).alias("cume_ppm"),
    ).orderBy("spend_micros", "o_custkey")


@register(
    "event_hourly_gapfill",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hour,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value) AS avg_v
      FROM events GROUP BY event_type, date_trunc('hour', ts)),
    bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS h0, date_trunc('hour', MAX(ts)) AS h1
      FROM events),
    grid AS (
      SELECT g.t AS hour FROM bounds, UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS g(t)),
    dense AS (
      SELECT et.event_type, grid.hour
      FROM (SELECT DISTINCT event_type FROM events) et CROSS JOIN grid)
    SELECT d.event_type,
           epoch_us(CAST(d.hour AS TIMESTAMP)) AS hour_us,
           COALESCE(h.n, 0) AS n_events,
           CAST(ROUND(last_value(h.avg_v IGNORE NULLS)
                 OVER (PARTITION BY d.event_type ORDER BY d.hour
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 1000000) AS BIGINT)
             AS ffill_avg_micros
    FROM dense d
    LEFT JOIN hourly h ON d.event_type = h.event_type AND d.hour = h.hour
    ORDER BY d.event_type, hour_us
    """,
)
def event_hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling: densify per-type hourly counts onto the full
    [min, max] hour grid (zero-fill) and forward-fill the last known hourly
    mean into empty hours (``last(ignorenulls)`` over a cumulative frame).

    The grid is sequence+explode from a 1-row bounds aggregate — generated,
    never materialized as input — and joins against the *aggregated* hourly
    table, so the dense side is |types| × |hours| regardless of event
    volume. At 100 TB the raw scan collapses to that same small table
    before anything cross-joins.
    """
    events = load_table(spark, sf_dir, "events")
    # |types| x |hours| bounded — materialized once (round 17): the
    # grid bounds and the type list re-derive from it exactly
    # (date_trunc is monotonic, so min/max of the truncated hours equal
    # the truncated min/max ts), collapsing 3 event scans to 1
    hourly = (
        events.groupBy("event_type", F.date_trunc("hour", "ts").alias("hour"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.col("value").cast("decimal(18,6)")).cast("double") / F.count("value"))
            .alias("avg_v"),
        )
        .localCheckpoint(eager=False)
    )
    bounds = hourly.agg(
        F.min("hour").alias("h0"),
        F.max("hour").alias("h1"),
    )
    grid = bounds.select(
        F.explode(F.sequence("h0", "h1", F.expr("interval 1 hour"))).alias("hour")
    )
    dense = hourly.select("event_type").distinct().crossJoin(F.broadcast(grid))
    w = (
        Window.partitionBy("event_type").orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        dense.join(hourly, ["event_type", "hour"], "left")
        .select(
            "event_type",
            F.unix_micros("hour").alias("hour_us"),
            F.coalesce("n", F.lit(0)).alias("n_events"),
            round_micros(F.last("avg_v", ignorenulls=True).over(w)).alias(
                "ffill_avg_micros"
            ),
        )
        .orderBy("event_type", "hour_us")
    )


@register(
    "user_trailing_window",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value
      FROM events)
    SELECT user_id, event_id, ts_us,
           CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS value_micros,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w * 1000000 AS BIGINT)
             AS trailing_7d_micros,
           COUNT(*) OVER w AS trailing_7d_events
    FROM ev
    WINDOW w AS (PARTITION BY user_id
                 ORDER BY ts_us // 1000000
                 RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)
    ORDER BY user_id, ts_us, event_id
    """,
)
def user_trailing_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based frame (rangeBetween, SURVEY §2.6): per-user trailing-7-day
    sum/count at every event. Unlike a row frame, the window is defined on
    the *time axis* (whole epoch seconds — derived by integer division from
    the same truncated micros on both engines, so peers at the same second
    aggregate together everywhere). One shuffle on user_id; the frame is
    evaluated by a sliding accumulator over the sorted partition, not by
    re-scanning 7 days per row. Integer-only output cells.
    """
    events = load_table(spark, sf_dir, "events")
    ev = events.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "value",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.expr("ts_us div 1000000"))  # integer floor-div, like // in the oracle
        .rangeBetween(-604800, 0)
    )
    return (
        ev.select(
            "user_id",
            "event_id",
            "ts_us",
            micros("value").alias("value_micros"),
            stable_sum_micros_over("value", w).alias("trailing_7d_micros"),
            F.count(F.lit(1)).over(w).alias("trailing_7d_events"),
        )
        .orderBy("user_id", "ts_us", "event_id")
    )


@register(
    "user_value_intervals",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value
      FROM events
      WHERE event_type = 'purchase')
    SELECT user_id,
           {sql_micros("value", "value_micros")},
           ts_us AS valid_from_us,
           LEAD(ts_us) OVER w AS valid_to_us,
           (LEAD(ts_us) OVER w IS NULL) AS is_current
    FROM ev
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
    ORDER BY user_id, valid_from_us
    """,
)
def user_value_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 (slowly-changing-dimension type 2) interval construction: each
    purchase's value holds from its own timestamp until the user's next
    purchase; the open-ended row is flagged current. One lead() over one
    shuffle — the standard way to turn an append-only change log into a
    point-in-time-joinable dimension (pair with ``asof_order_context`` for
    the lookup side). Integer cells: epoch-micros bounds, millionths value."""
    events = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    ev = events.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        micros("value").alias("value_micros"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    nxt = F.lead("ts_us").over(w)
    return (
        ev.select(
            "user_id",
            "value_micros",
            F.col("ts_us").alias("valid_from_us"),
            nxt.alias("valid_to_us"),
            nxt.isNull().alias("is_current"),
        )
        .orderBy("user_id", "valid_from_us")
    )


@register(
    "user_rolling_distinct_types",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_type
      FROM events)
    SELECT user_id, event_id, ts_us,
           len(list_distinct(list(event_type)
               OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                     ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))) AS distinct_types_10
    FROM ev
    ORDER BY user_id, ts_us, event_id
    """,
)
def user_rolling_distinct_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling distinct count — COUNT(DISTINCT) isn't a legal window
    aggregate in any engine, so the frame collects and dedups instead:
    size(array_distinct(collect_list over frame)). The frame is 10 rows,
    so per-row state is bounded; for unbounded frames use approx sketches
    per group, never a window."""
    events = load_table(spark, sf_dir, "events")
    ev = events.select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "event_type"
    )
    w = (
        Window.partitionBy("user_id").orderBy("ts_us", "event_id")
        .rowsBetween(-9, Window.currentRow)
    )
    return (
        ev.select(
            "user_id",
            "event_id",
            "ts_us",
            F.size(F.array_distinct(F.collect_list("event_type").over(w)))
             .alias("distinct_types_10"),
        )
        .orderBy("user_id", "ts_us", "event_id")
    )


# ---------------------------------------------------------------------------
# Retention cohorts (daily acquisition cohorts × activity offset)
# ---------------------------------------------------------------------------


@register(
    "user_retention_cohorts",
    oracle="""
    WITH act AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
    coh AS (SELECT user_id, MIN(d) AS cohort_day FROM act GROUP BY user_id),
    sized AS (
      SELECT cohort_day, COUNT(*) AS cohort_size FROM coh GROUP BY cohort_day),
    joined AS (
      SELECT c.cohort_day,
             CAST(date_diff('day', c.cohort_day, a.d) AS BIGINT) AS day_offset,
             COUNT(*) AS n_active
      FROM act a JOIN coh c USING (user_id)
      GROUP BY 1, 2)
    SELECT j.cohort_day, j.day_offset,
           CAST(j.n_active AS BIGINT) AS n_active,
           CAST(s.cohort_size AS BIGINT) AS cohort_size,
           CAST(j.n_active * 1000000 // s.cohort_size AS BIGINT) AS retention_ppm
    FROM joined j JOIN sized s USING (cohort_day)
    ORDER BY j.cohort_day, j.day_offset
    """,
)
def user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily acquisition-cohort retention matrix: users are cohorted by
    their first active day; each (cohort, day-offset) cell reports how
    many of that cohort were active offset days later, as exact ppm of
    the cohort size. COUNT(*) suffices for the active tally because the
    activity set is pre-deduplicated to (user, day) and a user maps to
    exactly one offset per day within its cohort.

    Scale shape: the (user, day) distinct and the per-user min are
    map-side-combinable aggregates; the activity×cohort join keys on
    user_id (both sides already reduced); the final matrix is tiny and
    its cohort-size join broadcasts. Dates derive from the UTC-pinned
    session, matching the oracle's naive-timestamp cast."""
    ev = load_table(spark, sf_dir, "events")
    # users x days bounded; materialized once so the cohort build and
    # the activity join stop re-executing the events scan + distinct
    # (3 corpus scans -> 1, round 17)
    act = (
        ev.select("user_id", F.col("ts").cast("date").alias("d"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    coh = act.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    sized = coh.groupBy("cohort_day").agg(F.count(F.lit(1)).alias("cohort_size"))
    joined = (
        act.join(coh, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff("d", "cohort_day").cast("long").alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    return (
        joined.join(F.broadcast(sized), "cohort_day")
        .select(
            "cohort_day",
            "day_offset",
            "n_active",
            "cohort_size",
            F.expr("n_active * 1000000 DIV cohort_size").alias("retention_ppm"),
        )
        .orderBy("cohort_day", "day_offset")
    )


# ---------------------------------------------------------------------------
# Active-user rollups (DAU / trailing WAU / trailing MAU + stickiness)
# ---------------------------------------------------------------------------


@register(
    "active_user_rollup",
    oracle="""
    WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
    days AS (SELECT DISTINCT d FROM act),
    wau AS (
      SELECT g.d, COUNT(DISTINCT a.user_id) AS wau
      FROM days g JOIN act a ON a.d BETWEEN g.d - 6 AND g.d GROUP BY g.d),
    mau AS (
      SELECT g.d, COUNT(DISTINCT a.user_id) AS mau
      FROM days g JOIN act a ON a.d BETWEEN g.d - 29 AND g.d GROUP BY g.d),
    dau AS (SELECT d, COUNT(*) AS dau FROM act GROUP BY d)
    SELECT dau.d, CAST(dau.dau AS BIGINT) AS dau, CAST(wau.wau AS BIGINT) AS wau,
           CAST(mau.mau AS BIGINT) AS mau,
           CAST(dau.dau * 1000000 // wau.wau AS BIGINT) AS stickiness_dw_ppm
    FROM dau JOIN wau USING (d) JOIN mau USING (d)
    ORDER BY dau.d
    """,
)
def active_user_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement rollup: per observed day, the exact distinct active
    users that day (DAU), over the trailing 7 days (WAU), the trailing
    30 days (MAU), and DAU/WAU stickiness in ppm.

    Scale shape: distinct-over-sliding-window can't map-side combine, so
    the engine uses the bounded FAN-OUT form instead of a nested-loop
    range join — each (user, day) activity row explodes to the <=7 (or
    <=30) trailing-window days it contributes to, then one count-distinct
    aggregate keyed by day; the observed-day grid is broadcast for the
    semi-join restriction. Fan-out is bounded by the window length, never
    by data skew. (The sketch-path alternative for petabyte corpora —
    per-day HLL registers merged bucket-wise over the trailing window —
    is `hll_union_sources`' register algebra applied temporally.)"""
    ev = load_table(spark, sf_dir, "events")
    # (user, day) activity pairs — users x days bounded, far smaller
    # than the event stream. Materialized once (round 17): the day
    # grid, DAU, WAU and MAU legs all consume it, and without the
    # checkpoint each leg re-executed the events scan + distinct
    # (5 corpus scans -> 1).
    act = (
        ev.select("user_id", F.col("ts").cast("date").alias("d"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    days = act.select("d").distinct()

    def trailing(n_days: int, name: str) -> DataFrame:
        fan = act.select(
            "user_id",
            F.explode(F.sequence(F.col("d"), F.date_add(F.col("d"), n_days - 1))).alias(
                "g"
            ),
        )
        return (
            fan.join(F.broadcast(days), fan["g"] == days["d"], "left_semi")
            .groupBy("g")
            .agg(F.count_distinct("user_id").alias(name))
            .withColumnRenamed("g", "d")
        )

    dau = act.groupBy("d").agg(F.count(F.lit(1)).alias("dau"))
    return (
        dau.join(trailing(7, "wau"), "d")
        .join(trailing(30, "mau"), "d")
        .select(
            "d",
            "dau",
            "wau",
            "mau",
            F.expr("dau * 1000000 DIV wau").alias("stickiness_dw_ppm"),
        )
        .orderBy("d")
    )


# ---------------------------------------------------------------------------
# Rolling distinct users via temporal HLL register merges
# ---------------------------------------------------------------------------


@register(
    "hll_rolling_active_users",
    oracle="""
    WITH act AS (
      SELECT DISTINCT CAST(user_id AS VARCHAR) AS token, CAST(ts AS DATE) AS d
      FROM events),
    days AS (SELECT DISTINCT d FROM act),
    hashed AS (
      SELECT d, token,
             CAST(('0x' || substr(md5(token), 1, 12)) AS BIGINT) AS h
      FROM act),
    regs AS (
      SELECT d, h // 4398046511104 AS bucket,
             MAX(CASE WHEN h % 4398046511104 = 0 THEN 43
                      ELSE 42 - length(bin(h % 4398046511104)) + 1 END) AS rho
      FROM hashed GROUP BY 1, 2),
    merged AS (
      SELECT g.d, r.bucket, MAX(r.rho) AS rho
      FROM days g JOIN regs r ON r.d BETWEEN g.d - 6 AND g.d
      GROUP BY 1, 2),
    folded AS (
      SELECT d, COUNT(*) AS n_buckets_used,
             SUM(CAST(4398046511104 AS BIGINT) >> CAST(rho AS INT)) AS s_int
      FROM merged GROUP BY d),
    exact AS (
      SELECT g.d, COUNT(DISTINCT a.token) AS exact_wau
      FROM days g JOIN act a ON a.d BETWEEN g.d - 6 AND g.d
      GROUP BY g.d),
    est AS (
      SELECT f.d, f.n_buckets_used, e.exact_wau,
             CASE
               WHEN 0.709 * 64 * 64 * 4398046511104
                    / (f.s_int + (64 - f.n_buckets_used)
                       * CAST(4398046511104 AS BIGINT)) <= 2.5 * 64
                AND f.n_buckets_used < 64
               THEN 64.0 * ln(64.0 / (64 - f.n_buckets_used))
               ELSE 0.709 * 64 * 64 * 4398046511104
                    / (f.s_int + (64 - f.n_buckets_used)
                       * CAST(4398046511104 AS BIGINT))
             END AS raw
      FROM folded f JOIN exact e USING (d))
    SELECT d, CAST(n_buckets_used AS BIGINT) AS n_buckets_used,
           CAST(exact_wau AS BIGINT) AS exact_wau,
           CAST(ROUND(raw) AS BIGINT) AS hll_wau_est,
           CAST(ROUND(abs(raw - exact_wau) * 1000000 / exact_wau) AS BIGINT)
             AS rel_err_ppm
    FROM est
    ORDER BY d
    """,
)
def hll_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct users per day, estimated by MERGING per-day
    HyperLogLog registers bucket-wise — the register algebra of
    ``hll_union_sources`` applied TEMPORALLY, and the petabyte-scale path
    that ``active_user_rollup``'s exact fan-out documents: per-day
    registers are 64 rows each, so the rolling merge fans out a
    days×64-row table (constant per day) instead of the raw activity set.
    The exact trailing distinct runs alongside for the oracle-checked
    relative-error column.

    Mechanics are shared verbatim with the token sketches
    (``textstats._hll_*``): md5-derived 48-bit hashes, bin()-length rho,
    exact dyadic harmonic fold, linear-counting correction — both engines
    compute identical registers, so even the merged estimates compare
    bit-exactly."""
    from input_data_pipeline_spark.operators.textstats import (
        _hll_fold,
        _hll_hashed,
        _hll_raw_estimate,
        _hll_registers,
    )

    ev = load_table(spark, sf_dir, "events")
    # users x days bounded, materialized once (round 17): register
    # build, day grid and the exact-WAU leg all read it (4 events
    # scans -> 1)
    act = ev.select(
        F.col("user_id").cast("string").alias("token"),
        F.col("ts").cast("date").alias("d"),
    ).distinct().localCheckpoint(eager=False)
    days = act.select("d").distinct()

    regs = _hll_registers(_hll_hashed(act, "d", "token"), "d")
    fan = regs.select(
        "bucket",
        "rho",
        F.explode(F.sequence(F.col("d"), F.date_add(F.col("d"), 6))).alias("g"),
    )
    merged = (
        fan.join(F.broadcast(days), fan["g"] == days["d"], "left_semi")
        .groupBy(F.col("g").alias("d"), "bucket")
        .agg(F.max("rho").alias("rho"))
    )
    folded = _hll_fold(merged, "d")

    exact = (
        act.select(
            "token",
            F.explode(F.sequence(F.col("d"), F.date_add(F.col("d"), 6))).alias("g"),
        )
        .join(F.broadcast(days), F.col("g") == days["d"], "left_semi")
        .groupBy(F.col("g").alias("d"))
        .agg(F.count_distinct("token").alias("exact_wau"))
    )
    return (
        folded.join(exact, "d")
        .withColumn("raw", _hll_raw_estimate())
        .select(
            "d",
            "n_buckets_used",
            "exact_wau",
            F.round(F.col("raw")).cast("long").alias("hll_wau_est"),
            F.round(
                F.abs(F.col("raw") - F.col("exact_wau"))
                * F.lit(1_000_000)
                / F.col("exact_wau")
            )
            .cast("long")
            .alias("rel_err_ppm"),
        )
        .orderBy("d")
    )


# ---------------------------------------------------------------------------
# Histogram quantile sketch (fixed-bin, mergeable, integer-exact)
# ---------------------------------------------------------------------------

_HQ_BINS = 1024
_HQ_QS = [500_000, 950_000, 990_000]  # q in ppm


def hq_bin_counts(vm: DataFrame, bounds: DataFrame) -> DataFrame:
    """(event_type, bin, cnt) over fixed per-type [lo, hi] bounds — the
    histogram sketch's state-building kernel, shared by the batch
    ``histogram_quantile_sketch`` (which derives bounds from the data)
    and the streaming ledger in ``streaming/pipelines.py`` (which takes
    bounds from a prior profile). Bin counts are pure sums, so per-shard
    or per-batch tables merge by addition.

    Values are clamped to [lo, hi] before binning: with data-derived
    bounds (the batch query) the clamp is an identity, but with external
    bounds (the streaming path) values that drift outside the profiled
    range would otherwise land in negative or >= {_HQ_BINS} bins — with
    truncating DIV even folding (lo-width, lo) into bin 0 — silently
    distorting merged quantile estimates. Clamped, they saturate into the
    first/last bin, the standard fixed-bound histogram behavior."""
    width = f"(((hi - lo) DIV {_HQ_BINS}) + 1)"
    return (
        vm.join(F.broadcast(bounds.select("event_type", "lo", "hi")), "event_type")
        .select(
            "event_type",
            F.expr(f"(LEAST(GREATEST(v, lo), hi) - lo) DIV {width}").alias("bin"),
        )
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "histogram_quantile_sketch",
    oracle=f"""
    WITH vm AS (
      SELECT event_type,
             CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS v
      FROM events),
    stats AS (
      SELECT event_type, MIN(v) AS lo, MAX(v) AS hi, COUNT(*) AS n
      FROM vm GROUP BY event_type),
    binned AS (
      SELECT vm.event_type,
             (vm.v - s.lo) // (((s.hi - s.lo) // {_HQ_BINS}) + 1) AS bin,
             COUNT(*) AS cnt
      FROM vm JOIN stats s USING (event_type)
      GROUP BY 1, 2),
    cum AS (
      SELECT event_type, bin, cnt,
             SUM(cnt) OVER (PARTITION BY event_type ORDER BY bin
                            ROWS UNBOUNDED PRECEDING) AS c
      FROM binned),
    qs AS (SELECT UNNEST([{", ".join(str(q) for q in _HQ_QS)}]) AS q_ppm),
    targets AS (
      SELECT s.event_type, q.q_ppm, s.lo, s.hi, s.n,
             (s.n * q.q_ppm + 999999) // 1000000 AS tgt
      FROM stats s CROSS JOIN qs q),
    est AS (
      SELECT t.event_type, t.q_ppm,
             CAST(MIN(t.lo + c.bin * (((t.hi - t.lo) // {_HQ_BINS}) + 1))
                  AS BIGINT) AS est_micros
      FROM targets t JOIN cum c ON c.event_type = t.event_type AND c.c >= t.tgt
      GROUP BY 1, 2),
    ranked AS (
      SELECT event_type, v,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v) AS rn
      FROM vm),
    exact AS (
      SELECT t.event_type, t.q_ppm, CAST(MIN(r.v) AS BIGINT) AS exact_micros
      FROM targets t JOIN ranked r ON r.event_type = t.event_type
                                  AND r.rn = t.tgt
      GROUP BY 1, 2)
    SELECT e.event_type, CAST(e.q_ppm AS BIGINT) AS q_ppm,
           x.exact_micros, e.est_micros,
           CAST(abs(e.est_micros - x.exact_micros) AS BIGINT) AS abs_err_micros
    FROM est e JOIN exact x USING (event_type, q_ppm)
    ORDER BY e.event_type, e.q_ppm
    """,
)
def histogram_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's fourth deterministic sketch (after Bloom / CMS / HLL):
    fixed-{nb}-bin histogram quantiles per event type — p50/p95/p99
    estimated from linear bin counts, reported against the exact
    rank-statistic with the absolute error. Like the other sketches the
    state is fixed-size ({nb} counters per group) and MERGEABLE (bin
    counts sum across shards/windows), which is what replaces a full
    sort-based percentile at 100 TB; the estimate's error is bounded by
    one bin width by construction.

    All arithmetic is integer: values quantize to exact micros, bin
    width is integer division (nonnegative offsets, so DuckDB ``//`` and
    Spark ``DIV`` agree), quantile targets are ceil(q·n) in pure integer
    form, and the exact counterpart is the ROW_NUMBER rank statistic —
    no percentile_approx, no float interpolation."""
    from input_data_pipeline_spark.functions.stable import micros

    ev = load_table(spark, sf_dir, "events")
    vm = ev.select("event_type", micros("value").alias("v"))
    # per-type bounds: |event types| rows, consumed by both the bin
    # pass and the quantile targets — materialized once so each
    # consumer stops re-running the full bounds scan (round 17). vm
    # itself stays unmaterialized deliberately: its two remaining
    # consumers (bin counts, exact rank leg) each re-scan parquet with
    # 2-column pruning, which beats checkpointing a raw row-per-event
    # projection at scale.
    stats = vm.groupBy("event_type").agg(
        F.min("v").alias("lo"), F.max("v").alias("hi"), F.count(F.lit(1)).alias("n")
    ).localCheckpoint(eager=False)
    width = f"(((hi - lo) DIV {_HQ_BINS}) + 1)"
    binned = hq_bin_counts(vm, stats)
    wcum = Window.partitionBy("event_type").orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = binned.withColumn("c", F.sum("cnt").over(wcum))

    qs = spark.createDataFrame([(q,) for q in _HQ_QS], "q_ppm long")
    targets = stats.crossJoin(F.broadcast(qs)).select(
        "event_type",
        "q_ppm",
        "lo",
        "hi",
        F.expr("(n * q_ppm + 999999) DIV 1000000").alias("tgt"),
    )
    est = (
        F.broadcast(targets)
        .join(cum, ["event_type"])
        .filter(F.col("c") >= F.col("tgt"))
        .groupBy("event_type", "q_ppm")
        .agg(F.min(F.expr(f"lo + bin * {width}")).alias("est_micros"))
    )
    wrank = Window.partitionBy("event_type").orderBy("v")
    ranked = vm.withColumn("rn", F.row_number().over(wrank))
    exact = (
        F.broadcast(targets)
        .join(
            ranked,
            (targets["event_type"] == ranked["event_type"])
            & (ranked["rn"] == targets["tgt"]),
        )
        .groupBy(targets["event_type"], "q_ppm")
        .agg(F.min("v").alias("exact_micros"))
    )
    return (
        est.join(exact, ["event_type", "q_ppm"])
        .select(
            "event_type",
            "q_ppm",
            "exact_micros",
            "est_micros",
            F.abs(F.col("est_micros") - F.col("exact_micros")).alias("abs_err_micros"),
        )
        .orderBy("event_type", "q_ppm")
    )


# ---------------------------------------------------------------------------
# Daily volume anomaly detection (fully-integer z-score test)
# ---------------------------------------------------------------------------

_ANOM_K = 3  # flag days beyond K sample standard deviations


@register(
    "event_daily_anomalies",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS n_events
      FROM events GROUP BY 1, 2),
    stats AS (
      SELECT event_type, COUNT(*) AS nd,
             SUM(n_events) AS s1, SUM(n_events * n_events) AS s2
      FROM daily GROUP BY event_type)
    SELECT d.event_type, d.d, CAST(d.n_events AS BIGINT) AS n_events,
           CAST((s.nd * d.n_events - s.s1) * (s.nd * d.n_events - s.s1)
                * (s.nd - 1) AS BIGINT) AS dev_sq_scaled,
           CAST({_ANOM_K * _ANOM_K} * s.nd * (s.nd * s.s2 - s.s1 * s.s1)
             AS BIGINT) AS threshold_scaled,
           (s.nd >= 2 AND
            (s.nd * d.n_events - s.s1) * (s.nd * d.n_events - s.s1)
            * (s.nd - 1)
            >= {_ANOM_K * _ANOM_K} * s.nd * (s.nd * s.s2 - s.s1 * s.s1))
             AS is_anomaly
    FROM daily d JOIN stats s USING (event_type)
    ORDER BY d.event_type, d.d
    """,
)
def event_daily_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-volume monitoring: flag days whose event count deviates
    from the type's mean by ≥ {k} SAMPLE standard deviations — the daily
    health check a production feed runs to catch silent drops and
    duplicate floods. The z-test is evaluated WITHOUT EVER LEAVING
    INTEGER ARITHMETIC: z² ≥ k² is cross-multiplied into
    (n·cnt − Σcnt)²·(n−1) ≥ k²·n·(n·Σcnt² − (Σcnt)²), so there is no
    float mean, no float variance, no rounding — bit-identical across
    engines by construction.

    Both sides of the comparison are emitted so the margin is auditable.
    Bounds: daily counts to ~5e4 over a year of days keep every term
    under 2^63; for feeds beyond ~1e6 events/day pre-scale the counts
    (cnt DIV 1000) — the test is scale-invariant. The daily rollup is
    map-side combinable; the per-type stats frame is tiny and
    broadcasts."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("nd"),
        F.sum("n_events").alias("s1"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("s2"),
    )
    k2 = _ANOM_K * _ANOM_K
    dev = F.col("nd") * F.col("n_events") - F.col("s1")
    dev_sq = (dev * dev * (F.col("nd") - 1)).alias("dev_sq_scaled")
    thr = (
        F.lit(k2) * F.col("nd") * (F.col("nd") * F.col("s2") - F.col("s1") * F.col("s1"))
    ).alias("threshold_scaled")
    return (
        daily.join(F.broadcast(stats), "event_type")
        .select(
            "event_type",
            "d",
            "n_events",
            dev_sq,
            thr,
            (
                (F.col("nd") >= 2)
                & (dev * dev * (F.col("nd") - 1)
                   >= F.lit(k2) * F.col("nd")
                   * (F.col("nd") * F.col("s2") - F.col("s1") * F.col("s1")))
            ).alias("is_anomaly"),
        )
        .orderBy("event_type", "d")
    )
