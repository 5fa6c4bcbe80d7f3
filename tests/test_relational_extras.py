"""Unit tests for the as-of join operator, CUBE, and approx distinct."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from input_data_pipeline_spark.operators.asof import asof_join


def _d(s: str) -> dt.date:
    return dt.date.fromisoformat(s)


def test_asof_join_planted_cases(spark):
    """Planted semantics: at-or-before match, same-day inclusion, tie-break
    to greatest right key, and no-match → nulls."""
    left = spark.createDataFrame(
        [
            (1, "u1", _d("2024-01-10")),  # after both u1 orders → latest wins
            (2, "u1", _d("2024-01-05")),  # same-day order counts (<=)
            (3, "u1", _d("2024-01-01")),  # before any order → nulls
            (4, "u2", _d("2024-01-10")),  # tie: two orders same day → max key
            (5, "u3", _d("2024-01-10")),  # user with no orders at all
        ],
        "event_id long, user_id string, probe_date date",
    )
    right = spark.createDataFrame(
        [
            ("u1", _d("2024-01-03"), 100, 10.0),
            ("u1", _d("2024-01-05"), 101, 20.0),
            ("u2", _d("2024-01-04"), 200, 30.0),
            ("u2", _d("2024-01-04"), 201, 40.0),
        ],
        "user_id string, o_date date, o_orderkey long, o_totalprice double",
    )
    out = {
        r.event_id: (r.asof_o_orderkey, r.asof_o_totalprice, r.asof_o_date)
        for r in asof_join(
            left, right, on="user_id", left_time="probe_date",
            right_time="o_date", right_cols=["o_orderkey", "o_totalprice"],
        ).collect()
    }
    assert out[1] == (101, 20.0, _d("2024-01-05"))
    assert out[2] == (101, 20.0, _d("2024-01-05"))   # same-day inclusive
    assert out[3] == (None, None, None)
    assert out[4] == (201, 40.0, _d("2024-01-04"))   # tie → greatest key
    assert out[5] == (None, None, None)


def test_asof_join_null_right_field_not_mixed(spark):
    """A matched right row holding NULL in one carried column must surface
    that NULL — not a value forward-filled from an OLDER right row. Guards
    the atomic struct-carry (per-column last(..., ignorenulls) mixed rows)."""
    left = spark.createDataFrame(
        [(1, "u1", _d("2024-01-10"))],
        "event_id long, user_id string, probe_date date",
    )
    right = spark.createDataFrame(
        [
            ("u1", _d("2024-01-03"), 100, 10.0),   # older row, price present
            ("u1", _d("2024-01-05"), 101, None),   # latest row, price NULL
        ],
        "user_id string, o_date date, o_orderkey long, o_totalprice double",
    )
    row = asof_join(
        left, right, on="user_id", left_time="probe_date",
        right_time="o_date", right_cols=["o_orderkey", "o_totalprice"],
    ).collect()[0]
    assert row.asof_o_orderkey == 101
    assert row.asof_o_totalprice is None  # NOT 10.0 from the older row
    assert row.asof_o_date == _d("2024-01-05")


def test_asof_plan_has_single_shuffle(spark):
    """The merge-style as-of must shuffle once (on the key), never fan out
    through a nested-loop join."""
    left = spark.range(100).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 5).alias("k"),
        F.to_date(F.lit("2024-01-01")).alias("t"),
    )
    right = spark.range(50).select(
        (F.col("id") % 5).alias("k"),
        F.to_date(F.lit("2023-12-31")).alias("rt"),
        F.col("id").alias("rk"),
    )
    plan = asof_join(
        left, right, on="k", left_time="t", right_time="rt", right_cols=["rk"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # no join operator at all — union + window
    assert plan.count("Exchange hashpartitioning") == 1


def test_approx_distinct_error_bound(spark, sf_dir):
    from input_data_pipeline_spark.operators.relational import approx_distinct_users
    from input_data_pipeline_spark.tables import load_table

    rows = approx_distinct_users(spark, sf_dir).collect()
    assert rows and all(r.within_5rsd for r in rows)
    # raw <5% bound on the estimate itself (the query only exposes the verdict)
    raw = {
        r.event_type: (r.est, r.exact)
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("est"),
            F.countDistinct("user_id").alias("exact"),
        )
        .collect()
    }
    for et, (est, exact) in raw.items():
        assert abs(est - exact) / exact < 0.05, f"{et}: approx {est} vs exact {exact}"


def test_cube_totals_consistent(spark, sf_dir):
    from input_data_pipeline_spark.operators.relational import order_status_cube

    rows = order_status_cube(spark, sf_dir).collect()
    grand = [r for r in rows if r.gid == 3]
    assert len(grand) == 1
    by_status = sum(r.n_orders for r in rows if r.gid == 1)
    by_priority = sum(r.n_orders for r in rows if r.gid == 2)
    detail = sum(r.n_orders for r in rows if r.gid == 0)
    assert grand[0].n_orders == by_status == by_priority == detail


def test_salted_join_spreads_hot_key(spark):
    """A pathologically hot key must land in multiple salt buckets, and the
    salted join must still produce exactly the plain-join result."""
    import pyspark.sql.functions as F

    from input_data_pipeline_spark.operators.skew import salted_join

    fact = spark.range(10_000).select(
        F.col("id").alias("event_id"),
        F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise(F.col("id") % 100).alias("k"),
        F.lit(1.0).alias("v"),
    )  # ~90% of rows share k=1
    dim = spark.createDataFrame([(i, f"d{i}") for i in range(100)], ["k", "tag"])

    salted = salted_join(fact, dim, key="k", salt_src="event_id")
    plain = fact.join(dim, "k")
    assert salted.count() == plain.count()
    s = {(r.k, r.n) for r in salted.groupBy("k").agg(F.count("*").alias("n")).collect()}
    p = {(r.k, r.n) for r in plain.groupBy("k").agg(F.count("*").alias("n")).collect()}
    assert s == p
    # the hot key's rows really are spread across several salt buckets
    buckets = (
        fact.filter(F.col("k") == 1)
        .select(F.pmod(F.hash("event_id"), F.lit(8)).alias("b"))
        .distinct()
        .count()
    )
    assert buckets == 8


def test_retention_cohorts_day_zero_is_full(spark, sf_dir):
    """Every cohort is 100% retained at offset 0, offsets are non-negative,
    and no cell exceeds its cohort size."""
    from input_data_pipeline_spark.operators.windows import user_retention_cohorts

    rows = user_retention_cohorts(spark, sf_dir).collect()
    assert rows
    zero = {r.cohort_day: r for r in rows if r.day_offset == 0}
    assert set(zero) == {r.cohort_day for r in rows}
    assert all(r.retention_ppm == 1_000_000 and r.n_active == r.cohort_size
               for r in zero.values())
    assert all(r.day_offset >= 0 and r.n_active <= r.cohort_size for r in rows)


def test_active_user_rollup_invariants(spark, sf_dir):
    """DAU <= WAU <= MAU everywhere; WAU/MAU are non-decreasing in window
    length by construction; stickiness is DAU/WAU in ppm."""
    from input_data_pipeline_spark.operators.windows import active_user_rollup

    rows = active_user_rollup(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.dau <= r.wau <= r.mau
        assert r.stickiness_dw_ppm == r.dau * 1_000_000 // r.wau


def test_event_daily_anomalies_flags_planted_spike(spark, tmp_path):
    """Ten ~100-event days plus one 2000-event spike: exactly the spike
    day flags; the integer cross-multiplied z-test matches a float
    recomputation of the same rule."""
    import datetime as dt
    import statistics

    from input_data_pipeline_spark.operators.windows import event_daily_anomalies

    rows = []
    eid = 0
    counts = []
    for day in range(1, 12):
        n = 2000 if day == 11 else 100 + day  # slight variation, one spike
        counts.append(n)
        for _ in range(n):
            rows.append((eid, dt.datetime(2024, 3, day, 12, 0, 0), 1, "click", 1.0, "{}"))
            eid += 1
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    got = {r.d.day: r for r in event_daily_anomalies(spark, str(tmp_path)).collect()}
    assert len(got) == 11
    flagged = {day for day, r in got.items() if r.is_anomaly}
    mu = statistics.mean(counts)
    sd = statistics.stdev(counts)
    expect = {day for day, n in zip(range(1, 12), counts) if abs(n - mu) >= 3 * sd}
    assert flagged == expect == {11}
    for r in got.values():
        assert r.is_anomaly == (r.dev_sq_scaled >= r.threshold_scaled)


def test_small_qty_threshold_matches_independent_recompute(spark, sf_dir):
    """Q17 shape vs a driver-side pandas recompute at sf0.001: the same
    brands, line counts, and exact micros revenue."""
    import pandas as pd

    from input_data_pipeline_spark.operators.relational import (
        small_qty_order_revenue,
    )
    from input_data_pipeline_spark.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    ).toPandas()
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand"
    ).toPandas()
    g = li.groupby("l_partkey")["l_quantity"].agg(["sum", "count"])
    m = li.merge(g, left_on="l_partkey", right_index=True).merge(
        part, left_on="l_partkey", right_on="p_partkey"
    )
    small = m[5 * m["l_quantity"].astype(int) * m["count"] < m["sum"].astype(int)]
    expect = {
        brand: (
            len(sub),
            sub["l_partkey"].nunique(),
            int(sum(round(v * 1_000_000) for v in sub["l_extendedprice"])),
        )
        for brand, sub in small.groupby("p_brand")
    }
    got = {
        r.p_brand: (r.n_small_lines, r.n_parts, r.revenue_micros)
        for r in small_qty_order_revenue(spark, sf_dir).collect()
    }
    assert got == expect


def test_trade_pagerank_invariants(spark, sf_dir):
    """PageRank invariants: every nation node appears once; rank is at
    least the teleport floor; total mass never exceeds 1e6 (per-edge
    floor divisions only lose mass); rank correlates with receiving
    edges (the max-in-weight node outranks the min-in-weight node); and
    the computation is deterministic across runs."""
    from input_data_pipeline_spark.operators.relational import trade_pagerank

    rows = trade_pagerank(spark, sf_dir).collect()
    n = len(rows)
    assert n == len({r.nation for r in rows})
    teleport = 150_000 * 1000 // (1000 * n)  # (1000-850)*1000 DIV n
    for r in rows:
        assert r.pr_ppm >= teleport
        assert r.out_weight >= 0 and r.in_weight >= 0
    assert sum(r.pr_ppm for r in rows) <= 1_000_000
    hi = max(rows, key=lambda r: r.in_weight)
    lo = min(rows, key=lambda r: r.in_weight)
    assert hi.pr_ppm >= lo.pr_ppm
    again = trade_pagerank(spark, sf_dir).collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in rows]
