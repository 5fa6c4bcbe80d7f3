"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``input_data_pipeline_spark``; this module is a
thin adapter over its query registry (plans/registry.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from input_data_pipeline_spark.plans.registry import all_oracle_sql, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (revenue by region, 5-table star join) on sf0.001."""
    from input_data_pipeline_spark.operators.relational import revenue_by_region

    return revenue_by_region(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted → rows-only check)."""
    return all_oracle_sql()
