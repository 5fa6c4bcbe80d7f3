"""Registry enumeration contract — catches a broken oracle before the driver.

The round driver imports ``__spark_entry__``, enumerates ``queries()`` /
``oracle_sql()``, and runs every oracle string in DuckDB. A single oracle
with a syntax error (or an enumeration that takes minutes) poisons the whole
sequential correctness run, so we gate both properties here — no Spark
session needed.
"""

from __future__ import annotations

import time

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

SF_DIR = "/root/testdata/sf0.001"


def test_enumeration_is_fast_and_consistent():
    t0 = time.monotonic()
    import __spark_entry__ as mod

    queries = mod.queries()
    oracles = mod.oracle_sql()
    elapsed = time.monotonic() - t0
    assert elapsed < 2.0, f"queries()/oracle_sql() enumeration took {elapsed:.1f}s"
    assert len(queries) >= 100
    # every oracle key must be a registered query
    assert set(oracles) <= set(queries)
    # since r7 EVERY query is oracle-backed (engine-specific sketch
    # estimators emit exact cells + error-bound verdict BOOLEANs instead
    # of going rows-only) — a new rows-only query is a contract regression
    assert set(oracles) == set(queries)


def test_priority_window_is_valid_and_covers_the_llm_core():
    """_PRIORITY drives the externally-visible enumeration order; external
    snapshots truncate to the first 50 names. Guard: every priority name
    resolves (a rename/removal would crash enumeration at driver time),
    there are no duplicates, and the 50-window keeps the queries that need
    fresh differential evidence."""
    from input_data_pipeline_spark.plans.registry import (
        _load_all,
        _PRIORITY,
        _REGISTRY,
        all_queries,
    )

    _load_all()
    assert len(_PRIORITY) == len(set(_PRIORITY)), "duplicate priority names"
    missing = [n for n in _PRIORITY if n not in _REGISTRY]
    assert not missing, f"priority names not registered: {missing}"
    first50 = list(all_queries())[:50]
    assert first50 == _PRIORITY[:50]
    # the 6 LLM-core anchors stay in EVERY window (round-workflow rule);
    # everything else rotates on green counts
    for must in (
        "dedup_minhash_lsh",
        "ngram_jaccard_pairs",
        "embedding_near_pairs",
        "knn_ivf",
        "contamination_overlap",
        "doc_quality",
    ):
        assert must in first50, f"{must} fell out of the snapshot window"


def test_every_oracle_parses_and_plans_in_duckdb():
    """EXPLAIN each oracle over the real sf0.001 views: catches syntax errors,
    bad casts, and references to missing columns — everything short of a
    runtime data issue — in one cheap pass."""
    import __spark_entry__ as mod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    failures = []
    for name, sql in sorted(mod.oracle_sql().items()):
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as exc:  # noqa: BLE001 — collect all, report once
            failures.append(f"{name}: {type(exc).__name__}: {exc}")
    assert not failures, "oracle strings failed to plan:\n" + "\n".join(failures)


def test_stable_sum_data_invariants(spark):
    """The split-long stable sums are bit-equal to the DECIMAL(18,6) oracle
    form only while aggregated columns hold <= 6 true decimal places and
    |x| < 9e6. Assert that on the testdata so generator drift is loud."""
    import pyspark.sql.functions as F

    from input_data_pipeline_spark.tables import load_table

    checks = [
        ("lineitem", ["l_extendedprice", "l_discount", "l_quantity", "l_tax"]),
        ("orders", ["o_totalprice"]),
        ("customer", ["c_acctbal"]),
        ("supplier", ["s_acctbal"]),
        ("part", ["p_retailprice"]),
        ("events", ["value"]),
    ]
    for table, cols in checks:
        df = load_table(spark, SF_DIR, table)
        for c in cols:
            bad = df.filter(
                (F.round(c, 6) != F.col(c)) | (F.abs(F.col(c)) >= 9e6)
            ).count()
            assert bad == 0, f"{table}.{c}: {bad} rows violate the 6dp/9e6 contract"


def test_stable_sum_matches_decimal_form(spark):
    """stable_sum/stable_avg/stable_sum_over must be BIT-identical to the
    DECIMAL(18,6) formulation the oracles state, on real data including
    negatives (acctbal) and derived products (disc price)."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from input_data_pipeline_spark.functions.stable import (
        stable_avg,
        stable_sum,
        stable_sum_over,
    )
    from input_data_pipeline_spark.tables import load_table

    li = load_table(spark, SF_DIR, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    got = li.groupBy("l_returnflag").agg(
        stable_sum(disc, 2).alias("s"),
        stable_avg("l_extendedprice", 4).alias("a"),
    )
    want = li.groupBy("l_returnflag").agg(
        F.round(F.sum(disc.cast("decimal(18,6)")), 2).cast("double").alias("s"),
        F.round(
            F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast("double")
            / F.count("l_extendedprice"),
            4,
        ).alias("a"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    cust = load_table(spark, SF_DIR, "customer")  # negative acctbals present
    got_c = cust.groupBy("c_mktsegment").agg(stable_sum("c_acctbal", 2).alias("s"))
    want_c = cust.groupBy("c_mktsegment").agg(
        F.round(F.sum(F.col("c_acctbal").cast("decimal(18,6)")), 2)
        .cast("double")
        .alias("s")
    )
    assert sorted(map(tuple, got_c.collect())) == sorted(map(tuple, want_c.collect()))

    ev = load_table(spark, SF_DIR, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    got_w = ev.select(
        "event_id", stable_sum_over("value", w, 4).alias("r")
    )
    want_w = ev.select(
        "event_id",
        F.round(F.sum(F.col("value").cast("decimal(18,6)")).over(w), 4)
        .cast("double")
        .alias("r"),
    )
    assert sorted(map(tuple, got_w.collect())) == sorted(map(tuple, want_w.collect()))


def test_stable_sum_partition_invariant_at_round_boundary(spark):
    """Exercise stable_sum AT a rounding boundary in anger: 4096 planted
    values (<= 6 true decimals) adjusted so the EXACT total lands on a
    .00005 boundary. Chunked IEEE double summation then rounds to a
    different 4th decimal depending on the chunking (2 vs 32 chunks — the
    exact hazard of Spark's partial aggregation merging partials in
    partition order), while the split-long stable sums must produce the
    same bits under ANY partitioning and equal DuckDB's DECIMAL(18,6) sum.
    """
    import random
    from decimal import Decimal

    import duckdb
    import pandas as pd

    from input_data_pipeline_spark.functions.stable import (
        stable_sum,
        stable_sum_micros,
    )

    rng = random.Random(0)
    vals = [rng.randint(1, 999999) / 1e6 for _ in range(4096)]
    exact = sum(Decimal(str(round(v, 6))) for v in vals)
    adj = (Decimal("0.00005") - exact % Decimal("0.0001")) % Decimal("0.0001")
    vals[-1] = float(Decimal(str(round(vals[-1], 6))) + adj)
    exact = sum(Decimal(str(round(v, 6))) for v in vals)
    assert exact % Decimal("0.0001") == Decimal("0.00005"), "boundary not planted"

    def chunked(vs: list[float], k: int) -> float:
        m = (len(vs) + k - 1) // k
        return sum(sum(vs[i * m : (i + 1) * m]) for i in range(k))

    assert round(chunked(vals, 2), 4) != round(chunked(vals, 32), 4), (
        "planted set no longer order-sensitive in doubles — regenerate it"
    )

    df = spark.createDataFrame(list(enumerate(vals)), "id long, v double")
    got = {
        p: df.repartition(p)
        .agg(stable_sum("v", 4).alias("s"), stable_sum_micros("v").alias("m"))
        .first()
        for p in (1, 2, 32)
    }
    assert got[1] == got[2] == got[32], f"partition-dependent: {got}"

    con = duckdb.connect()
    con.register("t", pd.DataFrame({"v": vals}))
    want_s, want_m = con.execute(
        "SELECT CAST(ROUND(SUM(CAST(v AS DECIMAL(18,6))), 4) AS DOUBLE),"
        "       CAST(SUM(CAST(v AS DECIMAL(18,6))) * 1000000 AS BIGINT) FROM t"
    ).fetchone()
    assert (got[1].s, got[1].m) == (want_s, want_m)
    assert Decimal(got[1].m) == exact * 1_000_000


def test_oracle_checked_schemas_are_integer_string_date_only(spark):
    """Round-4 lesson: the driver's comparator diverged on every
    ROUND(double, 4) ratio/average cell while agreeing on every integer and
    string cell (DuckDB parallel float aggregation is order-dependent, and
    per-cell double rounding semantics differ across engines at ties).
    Oracle-compared queries must therefore emit ONLY integer / string /
    boolean / date cells — scaled-integer micros/ppm instead of doubles,
    epoch-micros or DATE instead of timestamps. Rows-only queries (no
    oracle) may keep native float/timestamp schemas for their sinks."""
    from pyspark.sql.types import (
        DoubleType,
        FloatType,
        TimestampNTZType,
        TimestampType,
    )

    from input_data_pipeline_spark.plans.registry import _load_all, _ordered

    _load_all()
    offenders = []
    for name, spec in _ordered().items():
        if spec.oracle is None:
            continue
        for f in spec.fn(spark, SF_DIR).schema.fields:
            if isinstance(
                f.dataType, (DoubleType, FloatType, TimestampType, TimestampNTZType)
            ):
                offenders.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not offenders, (
        "oracle-checked queries with float/timestamp result cells:\n"
        + "\n".join(offenders)
    )


def test_oracle_result_types_are_bigint_only():
    """Round-5 lesson (the DuckDB-side twin of the Spark-side schema test
    above): DuckDB widens SUM(BIGINT) and integer ``//`` chains to HUGEINT
    (int128). A fetchall() hands those back as exact Python ints — invisible
    locally — but a pandas/Arrow fetch (what the round driver does)
    materializes HUGEINT as float64, so a correct integer cell compares as
    '123.0' vs '123' and hash-fails. 19 in-window queries went red in r5
    from exactly this. Every oracle's RESULT types must therefore stay in
    the int64-or-narrower/string/bool/date set; fix sites by wrapping the
    output cell in CAST(... AS BIGINT)."""
    from input_data_pipeline_spark.plans.registry import _load_all, _ordered

    _load_all()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    allowed = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "VARCHAR", "BOOLEAN", "DATE"}
    offenders = []
    for name, spec in _ordered().items():
        if spec.oracle is None:
            continue
        rel = con.sql(spec.oracle)  # binds + resolves types, does not execute
        for col, typ in zip(rel.columns, rel.types):
            if str(typ) not in allowed:
                offenders.append(f"{name}.{col}: {typ}")
    assert not offenders, (
        "oracle result columns outside the driver-safe type set "
        "(HUGEINT → float64 under a pandas fetch):\n" + "\n".join(offenders)
    )


def test_timestamp_columns_resolve_to_session_tz(spark):
    """Dtype-drift canary (the class of environment change that silently
    killed round 4): every table loaded through load_table must resolve
    timestamp-like columns to plain session-tz TIMESTAMP — never
    TIMESTAMP_NTZ (which unix_micros() rejects at analysis time) and never
    a raw bigint leaking from the nanos fallback — whatever encoding the
    parquet generator shipped (nanos-bigint, us-NTZ, us-UTC)."""
    from input_data_pipeline_spark.tables import TABLE_NAMES, load_table

    expected_ts = {
        "events": ["ts"],
        "orders": ["o_orderdate"],
        "lineitem": ["l_shipdate"],
    }
    for table in TABLE_NAMES:
        dtypes = dict(load_table(spark, SF_DIR, table).dtypes)
        for col, dtype in dtypes.items():
            assert dtype != "timestamp_ntz", f"{table}.{col} resolved to NTZ"
        for col in expected_ts.get(table, []):
            assert dtypes.get(col) == "timestamp", (
                f"{table}.{col}: expected timestamp, got {dtypes.get(col)}"
            )


def test_all_result_schemas_are_scalar_only(spark):
    """The round driver's canonicalizer hashes cell values and crashes on
    list/map/struct cells (r1: event_value_approx_percentiles). Every
    query's RESULT schema must therefore be scalar-only — plan-build only,
    nothing executes."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    from input_data_pipeline_spark.plans.registry import all_queries

    offenders = []
    for name, fn in sorted(all_queries().items()):
        for f in fn(spark, SF_DIR).schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                offenders.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not offenders, "non-scalar result columns:\n" + "\n".join(offenders)
