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
    assert df.columns == ["region", "revenue", "line_count"]


def test_each_query_runs_sf0001(spark, sf_dir):
    for name, fn in entry_mod.queries().items():
        df = fn(spark, sf_dir)
        assert df.columns, f"{name} produced no columns"
        df.limit(5).collect()  # plan executes
