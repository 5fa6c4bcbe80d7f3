"""Storage-layout scale patterns (SURVEY §4 physical design): bucketed
co-located joins (shuffle-free) and partition-pruned ingestion layout."""

from __future__ import annotations

import re

import pyspark.sql.functions as F


def test_bucketed_join_is_shuffle_free(spark, sf_dir, tmp_path):
    """Both sides bucketed by the join key into the same bucket count →
    the join runs with zero Exchange operators: the co-location bucketing
    buys at 100 TB, demonstrated for real through the catalog."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    try:
        (
            orders.write.mode("overwrite")
            .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
            .option("path", str(tmp_path / "orders_b"))
            .saveAsTable("orders_bucketed")
        )
        (
            lineitem.write.mode("overwrite")
            .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
            .option("path", str(tmp_path / "lineitem_b"))
            .saveAsTable("lineitem_bucketed")
        )
        joined = (
            spark.table("lineitem_bucketed")
            .join(
                spark.table("orders_bucketed"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        # disable broadcast so the join must pick a shuffle strategy — which
        # bucketing then elides entirely.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined.collect()
            plan = joined._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
            )
        join_section = plan.split("HashAggregate")[-1]
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in join_section, (
            "bucketed join still shuffles"
        )
        # expected row parity with the plain join
        plain = (
            lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, plain.collect())
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_bucketed")
        spark.sql("DROP TABLE IF EXISTS lineitem_bucketed")


def test_ingestion_layout_partition_pruning(spark, tmp_path):
    """Records written partitioned by (source_type, ingest date) — the §4
    layout — must prune partitions at read: a source_type filter reads only
    that directory subtree."""
    rows = [
        ("r1", "youtube_transcript", "2026-01-01", "a"),
        ("r2", "youtube_transcript", "2026-01-02", "b"),
        ("r3", "system_audio", "2026-01-01", "c"),
        ("r4", "youtube", "2026-01-02", "d"),
    ]
    df = spark.createDataFrame(
        rows, "id string, source_type string, ingest_date string, text string"
    )
    out = str(tmp_path / "records")
    df.write.partitionBy("source_type", "ingest_date").parquet(out)

    back = spark.read.parquet(out).filter(
        (F.col("source_type") == "youtube_transcript")
        & (F.col("ingest_date") == "2026-01-02")
    )
    assert [r.id for r in back.collect()] == ["r2"]
    plan = back._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "source_type" in m.group(1) and "ingest_date" in m.group(1), (
        "partition filters not applied at scan"
    )
    # data filters list must NOT contain the partition columns (they never
    # reach row-level evaluation)
    assert re.search(r"partition.*4|ReadSchema", plan)


def test_dynamic_partition_pruning_from_join(spark, sf_dir, tmp_path):
    """Join-driven pruning (the star-schema date-dim pattern at 100 TB):
    when the fact is partitioned on the join key and the dim side carries a
    selective filter, the fact scan must be pruned by a runtime subquery —
    visible as a dynamicpruning expression in its PartitionFilters — not
    scan all partitions and filter after the join."""
    from input_data_pipeline_spark.tables import load_table

    events = load_table(spark, sf_dir, "events")
    out = str(tmp_path / "events_by_type")
    events.write.partitionBy("event_type").parquet(out)
    fact = spark.read.parquet(out)

    dim = spark.createDataFrame(
        [("purchase", 1), ("signup", 2), ("click", 3)], "event_type string, pri int"
    ).filter(F.col("pri") == 1)

    joined = fact.join(dim, "event_type").groupBy("event_type").count()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    joined.collect()
    assert "dynamicpruning" in plan or "dynamicpruning" in (
        joined._jdf.queryExecution().executedPlan().toString()
    ), "no dynamic partition pruning subquery on the fact scan"
    got = {r["event_type"] for r in joined.collect()}
    assert got == {"purchase"}


def test_sorted_write_tightens_rowgroup_stats(spark, sf_dir, tmp_path):
    """Sorting within partitions before writing gives parquet row groups
    disjoint min/max ranges on the sort key — the layout that lets any
    engine skip row groups on a ts predicate. Unsorted writes interleave
    the key range across row groups and skip nothing."""
    import pyarrow.parquet as pq

    from input_data_pipeline_spark.tables import load_table

    # sf0.1: enough rows for multiple row groups at a small block size
    events = load_table(spark, "/root/testdata/sf0.1", "events")

    def rowgroup_spans(path):
        import glob
        spans = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = [md.schema.column(i).name for i in range(md.num_columns)].index("event_id")
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(idx).statistics
                spans.append((st.min, st.max))
        return spans

    small_groups = {"parquet.block.size": str(64 * 1024)}
    sorted_out = str(tmp_path / "sorted")
    (events.repartition(1).sortWithinPartitions("event_id")
     .write.options(**small_groups).parquet(sorted_out))
    unsorted_out = str(tmp_path / "unsorted")
    (events.orderBy(F.col("value")).repartition(1)
     .write.options(**small_groups).parquet(unsorted_out))

    s_spans = sorted(rowgroup_spans(sorted_out))
    u_spans = sorted(rowgroup_spans(unsorted_out))
    assert len(s_spans) > 1, "need multiple row groups for the comparison"
    # sorted: consecutive row-group ranges never overlap
    overlaps_sorted = sum(
        1 for (a, b) in zip(s_spans, s_spans[1:]) if a[1] > b[0]
    )
    assert overlaps_sorted == 0, s_spans
    # unsorted: nearly every row group spans nearly the whole ts range
    overlaps_unsorted = sum(
        1 for (a, b) in zip(u_spans, u_spans[1:]) if a[1] > b[0]
    )
    assert overlaps_unsorted > 0, "control: unsorted layout should overlap"


def test_z_order_key_matches_reference(spark):
    from input_data_pipeline_spark.functions.layout import z_order_key

    rows = [(a, b) for a in range(8) for b in range(8)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.select("a", "b", z_order_key([F.col("a"), F.col("b")], bits=3).alias("z")).collect()
    }

    def morton(a, b, bits=3):
        z = 0
        for i in range(bits):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    assert got == {(a, b): morton(a, b) for a, b in rows}


def test_z_order_layout_prunes_both_dimensions(spark, tmp_path):
    """Z-ordered writes must give row groups tight spans on BOTH interleaved
    dimensions, where a single-column sort is tight on one and spans
    everything on the other."""
    import glob

    import pyarrow.parquet as pq

    from input_data_pipeline_spark.functions.layout import scale_to_bits, z_order_key
    from input_data_pipeline_spark.tables import load_table

    events = load_table(spark, "/root/testdata/sf0.1", "events").select(
        "event_id", "user_id", F.unix_timestamp("ts").alias("epoch")
    )
    lo_u, hi_u, lo_t, hi_t = events.agg(
        F.min("user_id"), F.max("user_id"), F.min("epoch"), F.max("epoch")
    ).first()
    z = z_order_key(
        [scale_to_bits(F.col("user_id"), lo_u, hi_u, 12),
         scale_to_bits(F.col("epoch"), lo_t, hi_t, 12)],
        bits=12,
    )
    opts = {"parquet.block.size": str(64 * 1024)}

    def spans(path, col):
        out = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = [md.schema.column(i).name for i in range(md.num_columns)].index(col)
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(idx).statistics
                out.append(st.max - st.min)
        return out

    z_out = str(tmp_path / "zorder")
    (events.repartition(1).sortWithinPartitions(z)
     .write.options(**opts).parquet(z_out))
    t_out = str(tmp_path / "tsorted")
    (events.repartition(1).sortWithinPartitions("epoch")
     .write.options(**opts).parquet(t_out))

    full_u, full_t = hi_u - lo_u, hi_t - lo_t
    avg = lambda xs: sum(xs) / len(xs)
    # time-sorted: epoch spans tiny, user_id spans ~the whole range
    assert avg(spans(t_out, "epoch")) < 0.25 * full_t
    assert avg(spans(t_out, "user_id")) > 0.8 * full_u
    # z-ordered: BOTH dimensions materially tighter than the full range
    assert avg(spans(z_out, "user_id")) < 0.5 * full_u
    assert avg(spans(z_out, "epoch")) < 0.5 * full_t


def test_ivfpq_codes_bucketed_by_cell_halves_probe_shuffle(spark, sf_dir, tmp_path):
    """Pins the knn_ivf_pq scale claim: a codes table bucketed by ivf_cell
    joins the probe list without re-shuffling the corpus side — only the
    (tiny) probe side exchanges. Unbucketed, BOTH sides exchange."""
    from input_data_pipeline_spark.operators.similarity import (
        ivfpq_codebook_model,
        ivfpq_encode,
    )

    cb = ivfpq_codebook_model(spark, sf_dir)
    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .selectExpr("vec_id", "cast(embedding as array<double>) as e")
    )
    codes = ivfpq_encode(emb, cb).select("vec_id", "ivf_cell", "pq_codes")
    probes = spark.createDataFrame(
        [(q, c) for q in range(5) for c in range(2)], "query_id int, ivf_cell int"
    )
    try:
        (
            codes.write.mode("overwrite")
            .bucketBy(8, "ivf_cell")
            .option("path", str(tmp_path / "codes_b"))
            .saveAsTable("ivfpq_codes_bucketed")
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            bucketed = spark.table("ivfpq_codes_bucketed").join(probes, "ivf_cell")
            bucketed.collect()
            plan_b = bucketed._jdf.queryExecution().executedPlan().toString()
            plain = codes.join(probes, "ivf_cell")
            plain.collect()
            plan_p = plain._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
            )
        # AQE's toString echoes the Initial Plan after the Final Plan —
        # count exchanges in the final section only
        final_b = plan_b.split("== Initial Plan ==")[0]
        final_p = plan_p.split("== Initial Plan ==")[0]
        n_ex_bucketed = final_b.count("Exchange hashpartitioning(ivf_cell")
        n_ex_plain = final_p.count("Exchange hashpartitioning(ivf_cell")
        assert "Bucketed: true" in final_b
        assert n_ex_bucketed == 1, plan_b  # probe side only
        assert n_ex_plain == 2, plan_p     # both sides re-shuffle
        # parity: same (query, vec) candidate pairs either way
        a = {(r.query_id, r.vec_id) for r in bucketed.collect()}
        b = {(r.query_id, r.vec_id) for r in plain.collect()}
        assert a == b and a
    finally:
        spark.sql("DROP TABLE IF EXISTS ivfpq_codes_bucketed")
