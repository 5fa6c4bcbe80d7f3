"""plans.hints.maybe_broadcast: the size guard for SF-scaling join sides.

TPC-H ``part``/``supplier``/``customer`` grow linearly with SF; a hard
``F.broadcast`` on them is right at sf0.1 and impossible at the 100 TB
target. The helper must (a) keep the hint — and therefore today's
single-stage star probes — while Catalyst's estimate fits the bound, and
(b) return the frame UNHINTED above the bound so AQE's runtime size
measurement picks the strategy.
"""

import pandas as pd
import pyspark.sql.functions as F
import pytest

from input_data_pipeline_spark.plans.hints import maybe_broadcast


@pytest.fixture(scope="module")
def dim_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("hints")
    pd.DataFrame(
        {"k": list(range(1000)), "name": [f"dim-{i}" for i in range(1000)]}
    ).to_parquet(p / "dim.parquet", index=False)
    pd.DataFrame(
        {"k": [i % 1000 for i in range(20000)], "v": list(range(20000))}
    ).to_parquet(p / "fact.parquet", index=False)
    return p


def _joined_plan(spark, dim_path, max_bytes):
    dim = spark.read.parquet(str(dim_path / "dim.parquet"))
    fact = spark.read.parquet(str(dim_path / "fact.parquet"))
    out = fact.join(maybe_broadcast(dim, max_bytes=max_bytes), "k")
    return out, out._jdf.queryExecution().executedPlan().toString()


def test_hint_fires_under_the_bound(spark, dim_path):
    # auto-broadcast OFF and AQE OFF: only OUR hint can make this a
    # broadcast join — a vacuous version of this test once passed while
    # the helper silently returned every frame unhinted (the py4j
    # BigInteger-to-int conversion raised inside the try)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        out, plan = _joined_plan(spark, dim_path, max_bytes=512 << 20)
        assert "BroadcastHashJoin" in plan, plan[:800]
        assert "SortMergeJoin" not in plan, plan[:800]
        assert out.count() == 20000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.enabled")


def test_hint_disappears_above_the_bound(spark, dim_path):
    # a 1-byte bound mimics the 100 TB case: estimate exceeds it, so the
    # helper must NOT attach the hint. With AQE disabled and the auto
    # threshold forced to -1, an un-hinted join CANNOT be broadcast —
    # the plan goes sort-merge, proving the hint is genuinely absent.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        out, plan = _joined_plan(spark, dim_path, max_bytes=1)
        assert "BroadcastHashJoin" not in plan, plan[:800]
        assert "SortMergeJoin" in plan, plan[:800]
        assert out.count() == 20000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.enabled")


def test_unhinted_side_still_lets_aqe_broadcast(spark, dim_path):
    # above the bound the frame is unhinted, NOT anti-hinted: with the
    # default auto threshold the small dim still broadcasts via Spark's
    # own size rule — the guard only removes OUR override, it never
    # forbids the strategy.
    out, plan = _joined_plan(spark, dim_path, max_bytes=1)
    assert "BroadcastHashJoin" in plan, plan[:800]
    assert out.count() == 20000


def test_stats_failure_returns_unhinted(spark, monkeypatch):
    df = spark.range(10)

    class Boom:
        def queryExecution(self):
            raise RuntimeError("no stats")

    monkeypatch.setattr(
        type(df), "_jdf", property(lambda self: Boom()), raising=False
    )
    assert maybe_broadcast(df) is df


def test_gauge_overrides_multiplied_join_estimate(spark, dim_path):
    # Catalyst's size-only visitor MULTIPLIES child sizes at a join, so
    # a dim enriched through a tiny lookup gets an estimate far past any
    # bound even though the FK join cannot grow its row count. The gauge
    # (the scaling base table) must keep the hint alive.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        dim = spark.read.parquet(str(dim_path / "dim.parquet"))
        fact = spark.read.parquet(str(dim_path / "fact.parquet"))
        lookup = spark.range(1000).withColumnRenamed("id", "k")
        enriched = dim.join(F.broadcast(lookup), "k")
        est = int(
            enriched._jdf.queryExecution().optimizedPlan().stats()
            .sizeInBytes()
        )
        bound = 1 << 20
        assert est > bound, est  # the multiplied estimate IS inflated
        # without a gauge the inflated estimate suppresses the hint...
        p1 = fact.join(maybe_broadcast(enriched, max_bytes=bound), "k")
        assert "SortMergeJoin" in \
            p1._jdf.queryExecution().executedPlan().toString()
        # ...the gauge anchors the decision to the base table
        p2 = fact.join(
            maybe_broadcast(enriched, max_bytes=bound, gauge=dim), "k")
        plan2 = p2._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan2, plan2[:800]
        assert p2.count() == 20000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.enabled")
