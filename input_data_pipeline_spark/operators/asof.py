"""As-of join — a custom operator Spark lacks natively (SURVEY §2.4 J5 family).

``asof_join(left, right)`` matches each left row to the single most recent
right row at-or-before its timestamp, per key. The classic implementations:

- **Naive**: inequality join + per-left-row top-1. The join fans out to
  |left| × (matching rights) rows before pruning — quadratic-ish blowup on
  long histories; unusable at 100 TB.
- **This one (merge-style)**: union both sides into one ordered stream,
  shuffle ONCE on the key, and carry the last-seen right row forward with a
  running ``last(..., ignorenulls=True)`` window. Cost = one shuffle of
  left+right + one per-partition sort — the same shape Pandas' merge_asof
  and kdb's aj use, expressed declaratively so Catalyst/Tungsten run it as
  window-over-sort with no Python in the loop.

Scale note: the window partitions by key, so one key's full history sorts
in one task. With millions of rows per key, pre-bucket time into coarse
ranges and seed each bucket with the previous bucket's last row (carry
composition) — the orchestration is mechanical; the core operator below is
unchanged per bucket.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from input_data_pipeline_spark.functions.stable import micros
from input_data_pipeline_spark.plans.registry import register
from input_data_pipeline_spark.tables import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_cols: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """Match each left row to the latest right row with
    ``right_time <= left_time`` on the same ``on`` key (left outer: no match
    → nulls). Ties on ``right_time`` resolve to the right row greatest under
    ``right_cols`` order (deterministic).
    """
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        # One struct per right row: the carry below forwards it atomically,
        # so every output row's carried fields come from the SAME right row
        # even when some right columns hold NULL (per-column last(...,
        # ignorenulls) would silently mix field values across right rows).
        F.struct(
            *[F.col(c).alias(c) for c in right_cols],
            F.col(right_time).alias(right_time),
        ).alias("_r"),
    )
    l = left.select(  # noqa: E741
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        *left.columns,
    )
    merged = l.unionByName(r, allowMissingColumns=True)  # left rows: _r IS NULL
    # Rights sort before lefts at equal time (<= semantics); among equal-time
    # rights the last one in right_cols order wins.
    w = (
        Window.partitionBy("_k")
        .orderBy(
            F.col("_t").asc(),
            F.col("_side").asc(),
            *[F.col("_r").getField(c).asc_nulls_first() for c in right_cols],
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = merged.withColumn("_r", F.last("_r", ignorenulls=True).over(w)).filter(
        F.col("_side") == 1
    )
    for c in [*right_cols, right_time]:
        out = out.withColumn(f"{prefix}{c}", F.col("_r").getField(c))
    return out.drop("_k", "_t", "_side", "_r")


@register(
    "asof_order_context",
    oracle="""
    WITH probes AS (
      SELECT event_id, user_id,
             DATE '1995-01-01' + CAST(event_id % 2500 AS INT) AS probe_date
      FROM events),
    cand AS (
      SELECT p.event_id, p.user_id, p.probe_date,
             o.o_orderdate::DATE AS asof_o_orderdate,
             o.o_orderkey AS asof_o_orderkey,
             o.o_totalprice AS asof_o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY p.event_id
               ORDER BY o.o_orderdate DESC NULLS LAST, o.o_orderkey DESC NULLS LAST
             ) AS rn
      FROM probes p
      LEFT JOIN orders o
        ON o.o_custkey = p.user_id AND o.o_orderdate::DATE <= p.probe_date)
    SELECT event_id, user_id,
           probe_date - DATE '1970-01-01' AS probe_day,
           asof_o_orderdate - DATE '1970-01-01' AS asof_o_orderday,
           asof_o_orderkey,
           CAST(CAST(asof_o_totalprice AS DECIMAL(18,6)) * 1000000 AS BIGINT)
             AS asof_o_totalprice_micros
    FROM cand
    WHERE rn = 1
    ORDER BY event_id
    """,
)
def asof_order_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each event matched to the user's most recent order as of a probe date
    (derived deterministically from event_id so probes span the whole order
    history). The oracle replays it as the naive inequality-join + top-1 —
    the merge-style operator must agree exactly, including no-match nulls
    and same-date tie-breaks.
    """
    events = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    probes = events.select(
        "event_id",
        "user_id",
        F.date_add(F.to_date(F.lit("1995-01-01")), (F.col("event_id") % 2500).cast("int")).alias(
            "probe_date"
        ),
    )
    rights = orders.select(
        F.col("o_custkey").alias("user_id"),
        F.to_date("o_orderdate").alias("o_date"),
        "o_orderkey",
        "o_totalprice",
    )
    joined = asof_join(
        probes,
        rights,
        on="user_id",
        left_time="probe_date",
        right_time="o_date",
        right_cols=["o_orderkey", "o_totalprice"],
    )
    # Integer day cells (days since 1970-01-01) on both engines: the only
    # DATE-typed outputs in the driver's snapshot window, converted so no
    # date-canonicalization difference in any comparator can bite.
    epoch = F.to_date(F.lit("1970-01-01"))
    return joined.select(
        "event_id",
        "user_id",
        F.datediff("probe_date", epoch).alias("probe_day"),
        F.datediff(F.col("asof_o_date"), epoch).alias("asof_o_orderday"),
        "asof_o_orderkey",
        micros("asof_o_totalprice").alias("asof_o_totalprice_micros"),
    ).orderBy("event_id")
