"""Physical-plan guards (the 100 TB design checks, SURVEY §4):
filters must reach the parquet scan, scans must prune columns, and
star-schema dimension joins must broadcast — a regression in any of these
is invisible at sf0.001 correctness but fatal at scale."""

from __future__ import annotations

import re

import pytest


def _executed_plan(df) -> str:
    df.collect()  # materialize so AQE settles on the final plan
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def revenue_plan(spark, sf_dir):
    from input_data_pipeline_spark.operators.relational import revenue_by_region

    return _executed_plan(revenue_by_region(spark, sf_dir))


def test_filter_pushed_to_scan(revenue_plan):
    assert re.search(r"PushedFilters: \[[^\]]*GreaterThanOrEqual\(l_shipdate", revenue_plan)
    assert re.search(r"PushedFilters: \[[^\]]*LessThan\(l_shipdate", revenue_plan)


def test_scan_prunes_columns(revenue_plan):
    m = re.search(r"ReadSchema: struct<(l_[^>]*)>", revenue_plan)
    assert m, "no lineitem scan found"
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"}, (
        f"lineitem scan reads {cols} — projection not pruned"
    )


def test_star_joins_broadcast(revenue_plan):
    assert "BroadcastHashJoin" in revenue_plan
    assert "SortMergeJoin" not in revenue_plan, (
        "dimension join fell back to sort-merge — broadcast regressed"
    )


def test_agg_is_partial_then_final(spark, sf_dir):
    """Hash aggregates must partial-combine map-side: two HashAggregate
    levels around one exchange, not a raw shuffle of detail rows."""
    from input_data_pipeline_spark.operators.relational import pricing_summary

    plan = _executed_plan(pricing_summary(spark, sf_dir))
    assert len(re.findall(r"HashAggregate", plan)) >= 2
    assert "partial_" in plan  # partial agg functions present map-side
