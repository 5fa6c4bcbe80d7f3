"""Driver-contract smoke tests: entry(), queries(), oracle_sql() coherence."""

from __future__ import annotations

import importlib

import __spark_entry__ as entry_mod


def test_queries_and_oracles_align():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert qs, "no queries registered"
    # every oracle key must be a declared query
    assert set(oracles) <= set(qs)


def test_entry_returns_rows(spark):
    importlib.reload(entry_mod)
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["region", "revenue_micros", "line_count"]


def test_each_query_runs_sf0001(spark, sf_dir):
    for name, fn in entry_mod.queries().items():
        df = fn(spark, sf_dir)
        assert df.columns, f"{name} produced no columns"
        df.limit(5).collect()  # plan executes


def test_sql_surface_over_registered_views(spark, sf_dir):
    """The engine is SQL-first too: register_views + spark.sql must agree
    with the DataFrame form of the same query."""
    import pyspark.sql.functions as F

    from input_data_pipeline_spark.tables import load_table, register_views

    register_views(spark, sf_dir)
    sql_rows = spark.sql(
        """
        SELECT o_orderstatus AS status, COUNT(*) AS n
        FROM orders GROUP BY o_orderstatus ORDER BY status
        """
    ).collect()
    df_rows = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("status")
        .collect()
    )
    assert sql_rows == df_rows
