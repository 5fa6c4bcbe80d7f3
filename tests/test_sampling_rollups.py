"""Invariants for stratified sampling, percentile filtering, quartiles, and
grouping sets (the oracle check covers value parity; these pin semantics)."""

from __future__ import annotations

import pyspark.sql.functions as F

from input_data_pipeline_spark.operators.textstats import (
    quality_percentile_filter,
    stratified_doc_sample,
)
from input_data_pipeline_spark.operators.relational import revenue_grouping_sets
from input_data_pipeline_spark.operators.windows import customer_value_quartiles
from input_data_pipeline_spark.tables import load_table


def test_stratified_sample_rates(spark, sf_dir):
    rows = {r["lang"]: r for r in stratified_doc_sample(spark, sf_dir).collect()}
    assert set(rows) == {"en", "zh", "es", "de", "fr"}
    for lang, r in rows.items():
        assert 0 <= r["n_sampled"] <= r["n_total"]
        if lang != "en":
            # 100% strata keep everything.
            assert r["n_sampled"] == r["n_total"]
    en = rows["en"]
    # Hash buckets approximate the 25% rate; wide tolerance for tiny sf.
    assert 0.05 <= en["n_sampled"] / en["n_total"] <= 0.5


def test_stratified_sample_is_rerun_stable(spark, sf_dir):
    a = sorted(map(tuple, stratified_doc_sample(spark, sf_dir).collect()))
    b = sorted(map(tuple, stratified_doc_sample(spark, sf_dir).collect()))
    assert a == b


def test_percentile_filter_drops_about_a_quartile(spark, sf_dir):
    totals = {
        r["lang"]: r["n"]
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    kept = {r["lang"]: r["n_kept"] for r in quality_percentile_filter(spark, sf_dir).collect()}
    for lang, n_kept in kept.items():
        # Keeps the top ~75% of each stratum (ties can nudge the boundary).
        assert 0.5 * totals[lang] <= n_kept <= totals[lang]


def test_quartiles_are_balanced_and_monotone(spark, sf_dir):
    rows = customer_value_quartiles(spark, sf_dir).collect()
    sizes = [0] * 5
    for r in rows:
        sizes[r["quartile"]] += 1
    assert sizes[0] == 0 and max(sizes[1:]) - min(sizes[1:]) <= 1
    # cume_dist is non-decreasing along the declared ordering.
    cumes = [r["cume"] for r in rows]
    assert cumes == sorted(cumes)
    assert abs(cumes[-1] - 1.0) < 1e-9


def test_grouping_sets_granularities(spark, sf_dir):
    rows = revenue_grouping_sets(spark, sf_dir).collect()
    detail = [r for r in rows if r["g_year"] == 0 and r["g_priority"] == 0]
    per_year = [r for r in rows if r["g_year"] == 0 and r["g_priority"] == 1]
    grand = [r for r in rows if r["g_year"] == 1 and r["g_priority"] == 1]
    assert len(grand) == 1
    assert grand[0]["n_orders"] == sum(r["n_orders"] for r in per_year)
    assert grand[0]["n_orders"] == sum(r["n_orders"] for r in detail)
    assert abs(grand[0]["revenue"] - round(sum(r["revenue"] for r in detail), 2)) < 1.0
