"""Shuffle-bytes scale-growth bound for the anchor queries (the 6
LLM-core anchors plus the round-8 curation operators — whatever
plans.metrics.ANCHORS lists, 10 as of r8).

Complements the planted-skew tests (which bound the worst shuffle KEY):
this measures the actual end-to-end exchange at two scale factors and
asserts the growth exponent is ~linear. A quadratic shape (all-pairs
similarity join, un-broadcast probe side) would write ~100x the shuffle
for a 10x data step and fail the c*step bound immediately.

Same helpers and same bound as the committed SCALE_GROWTH_local.json
artifact (measure_scale_growth.py, run at sf0.01 -> sf0.1); here the step
is sf0.001 -> sf0.01 so the whole sweep stays test-suite cheap.
"""

from __future__ import annotations

import pytest

from input_data_pipeline_spark.plans.metrics import (
    ANCHORS,
    growth_report,
    measure_anchors,
    run_with_metrics,
)

SMALL = "/root/testdata/sf0.001"
LARGE = "/root/testdata/sf0.01"
LINEARITY_C = 1.5


@pytest.fixture(scope="module")
def report(spark):
    small = measure_anchors(spark, SMALL)
    large = measure_anchors(spark, LARGE)
    return growth_report(small, large)


def test_metrics_capture_sees_a_shuffle(spark):
    """The AppStatusStore capture itself: a groupBy must report shuffle
    writes > 0 and a parquet scan must report input bytes > 0."""
    import pyspark.sql.functions as F

    from input_data_pipeline_spark.tables import load_table

    def q(s, d):
        return (
            load_table(s, d, "documents")
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    m = run_with_metrics(spark, q, SMALL)
    assert m["rows"] > 0
    assert m["shuffle_write_bytes"] > 0
    assert m["input_bytes"] > 0
    assert m["n_stages"] >= 2  # scan/partial-agg stage + final-agg stage


@pytest.mark.parametrize("name", ANCHORS)
def test_anchor_shuffle_growth_is_linear(report, name):
    r = report[name]
    data_step = max(r["input_growth"], 10.0)
    assert r["shuffle_growth"] <= LINEARITY_C * data_step, (
        f"{name}: shuffle grew x{r['shuffle_growth']} for a x{data_step} data "
        f"step (small={r['small']}, large={r['large']}) — super-linear exchange"
    )
