"""Skew mitigation: salted joins for hot keys (SURVEY §4 custom piece 3).

AQE's skew-join splitting handles sort-merge joins it can observe; manual
salting is the tool when a hot key must survive a hash-partitioned join or
when the dim side is small enough to replicate but too big to broadcast
whole. The pattern: the fact side gets a deterministic salt in
``[0, n_salt)``, the dim side is replicated once per salt value, and the
join key becomes (key, salt) — a hot key's rows now spread across
``n_salt`` shuffle partitions instead of one straggler task.

The salt here derives from a hash of a high-cardinality fact column (not
``rand()``) so results — and the driver's value-hash check — stay
deterministic.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from input_data_pipeline_spark.functions.stable import stable_sum_micros
from input_data_pipeline_spark.plans.registry import register
from input_data_pipeline_spark.tables import load_table

N_SALT = 8


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_src: Column | str,
    n_salt: int = N_SALT,
    how: str = "inner",
) -> DataFrame:
    """Join ``fact`` to ``dim`` on ``key`` with the fact side salted by a
    deterministic hash of ``salt_src`` and the dim side replicated
    ``n_salt`` times. Output = plain join (salt is internal)."""
    f = fact.withColumn(
        "_salt", F.pmod(F.hash(salt_src), F.lit(n_salt)).cast("int")
    )
    d = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return f.join(d, [key, "_salt"], how).drop("_salt")


@register(
    "skew_salted_user_join",
    oracle="""
    SELECT c.c_mktsegment AS segment,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(18,6))) * 1000000 AS BIGINT)
             AS total_value_micros
    FROM events e
    JOIN customer c ON c.c_custkey = e.user_id
    GROUP BY c.c_mktsegment
    ORDER BY segment
    """,
)
def skew_salted_user_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-profile join executed through the salted pattern (events
    salted on event_id, customer profiles replicated ×{N_SALT}), then
    aggregated by market segment. The oracle is the *plain* join — salting
    must be a pure execution-strategy change with identical results.

    At 100 TB with a genuinely hot user, this turns the one-straggler
    shuffle partition into {N_SALT} even slices; the cost is dim×{N_SALT}
    shuffle volume, which is why the salt count should track the observed
    skew factor, not a global constant.
    """
    events = load_table(spark, sf_dir, "events")
    profiles = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
    )
    joined = salted_join(events, profiles, key="user_id", salt_src="event_id")
    return (
        joined.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            stable_sum_micros("value").alias("total_value_micros"),
        )
        .orderBy("segment")
    )
