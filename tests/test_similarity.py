"""Similarity-search property tests: ANN recall vs exact brute force."""

from __future__ import annotations

from pyspark.sql import functions as F

from input_data_pipeline_spark.operators.similarity import (
    TOP_K,
    knn_bruteforce,
    knn_bruteforce_np,
    knn_hyperplane_lsh,
)


def _topk_sets(df):
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def test_np_path_matches_expression_path(spark, sf_dir):
    """The mapInPandas/numpy tier must reproduce the expression tier exactly."""
    a = {(r.query_id, r.rank, r.neighbor_id) for r in knn_bruteforce(spark, sf_dir).collect()}
    b = {(r.query_id, r.rank, r.neighbor_id) for r in knn_bruteforce_np(spark, sf_dir).collect()}
    assert a == b


def test_lsh_recall_vs_bruteforce(spark, sf_dir):
    """Banded hyperplane LSH should recall >= 50% of true top-10 on average
    (2 bands of 8 bits is a coarse, fast setting; exact re-rank keeps
    precision at 1.0 by construction)."""
    truth = _topk_sets(knn_bruteforce(spark, sf_dir))
    approx = _topk_sets(knn_hyperplane_lsh(spark, sf_dir))
    recalls = [
        len(truth[q] & approx.get(q, set())) / min(TOP_K, len(truth[q])) for q in truth
    ]
    avg = sum(recalls) / len(recalls)
    assert avg >= 0.5, f"LSH avg recall {avg:.2f} < 0.5 ({recalls})"


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    """IVF with 2/8 probed cells must recover a reasonable share of the true
    top-10 (random pseudo-centroids, mid-cosine neighborhoods — we bound
    recall loosely but positively, and require exact scores on hits)."""
    from input_data_pipeline_spark.operators.similarity import knn_bruteforce, knn_ivf

    truth = {
        (r.query_id, r.neighbor_id): r.cosine_ppm
        for r in knn_bruteforce(spark, sf_dir).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id): r.cosine_ppm
        for r in knn_ivf(spark, sf_dir).collect()
    }
    hits = set(truth) & set(approx)
    assert len(hits) / len(truth) >= 0.2, f"IVF recall {len(hits)}/{len(truth)}"
    for k in hits:
        assert truth[k] == approx[k]  # exact re-rank: identical rounded scores


def test_kmeans_clusters_partition_corpus(spark, sf_dir):
    """Every vector lands in exactly one cluster; inertia improves (or is
    flat) when the assignment pass re-runs against the updated centroids —
    Lloyd's monotonicity, which integer floor-rounded centroids preserve up
    to the quantization slack (checked with a 1% tolerance)."""
    from input_data_pipeline_spark.operators.similarity import (
        KMEANS_K,
        _kmeans_assign,
        _kmeans_qvec,
        kmeans_embedding_clusters,
    )
    from input_data_pipeline_spark.tables import load_table

    out = kmeans_embedding_clusters(spark, sf_dir).collect()
    n_total = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r.n_vecs for r in out) == n_total
    assert 1 <= len(out) <= KMEANS_K
    assert all(1 <= r.cluster_id <= KMEANS_K for r in out)
    assert all(r.top_label_n <= r.n_vecs for r in out)

    # monotonicity: inertia after the update pass <= inertia at init + slack
    import pyspark.sql.functions as F

    qv = _kmeans_qvec(spark, sf_dir)
    seeds = (
        qv.select(F.md5(F.col("vec_id").cast("string")).alias("h"), "vec_id", "q")
        .orderBy("h", "vec_id")
        .limit(KMEANS_K)
        .collect()
    )
    c0 = [(i + 1, list(r["q"])) for i, r in enumerate(seeds)]
    inertia0 = _kmeans_assign(qv, c0).agg(F.sum("d2")).collect()[0][0]
    inertia1 = sum(r.inertia for r in out)
    assert inertia1 <= inertia0 * 1.01


def test_kmeans_deterministic_across_shuffle_partitions(spark, sf_dir):
    """The result must not depend on partitioning/parallelism — integer
    arithmetic end-to-end means any plan shape gives the same clusters."""
    from input_data_pipeline_spark.operators.similarity import (
        kmeans_embedding_clusters,
    )

    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        a = sorted(tuple(r) for r in kmeans_embedding_clusters(spark, sf_dir).collect())
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        b = sorted(tuple(r) for r in kmeans_embedding_clusters(spark, sf_dir).collect())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert a == b


def test_ivf_kmeans_recall_vs_bruteforce(spark, sf_dir):
    """IVF over the TRAINED quantizer with 2/8 probes: same loose-but-
    positive recall bound as the fixed-centroid tier, exact scores on
    hits (both paths emit the identical cosine fold)."""
    from input_data_pipeline_spark.operators.similarity import (
        knn_bruteforce,
        knn_ivf_kmeans,
    )

    truth = {
        (r.query_id, r.neighbor_id): r.cosine_ppm
        for r in knn_bruteforce(spark, sf_dir).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id): r.cosine_ppm
        for r in knn_ivf_kmeans(spark, sf_dir).collect()
    }
    hits = set(truth) & set(approx)
    assert len(hits) / len(truth) >= 0.2, f"recall {len(hits)}/{len(truth)}"
    assert all(truth[h] == approx[h] for h in hits)


def test_cluster_diversity_sample_quota_and_coverage(spark, sf_dir):
    """Per-cluster quota respected, picks are 1..min(quota, members), and
    every non-empty cluster is represented."""
    from input_data_pipeline_spark.operators.similarity import (
        _DIV_PER_CLUSTER,
        cluster_diversity_sample,
        kmeans_embedding_clusters,
    )

    picks = cluster_diversity_sample(spark, sf_dir).collect()
    by_cid: dict[int, list] = {}
    for r in picks:
        by_cid.setdefault(r.cid, []).append(r)
    clusters = {r.cluster_id: r.n_vecs for r in kmeans_embedding_clusters(spark, sf_dir).collect()}
    assert set(by_cid) == set(clusters)
    for cid, rows in by_cid.items():
        assert len(rows) == min(_DIV_PER_CLUSTER, clusters[cid])
        assert sorted(r.pick for r in rows) == list(range(1, len(rows) + 1))
        assert all(r.n_members == clusters[cid] for r in rows)


def test_principal_component_is_unit_and_dominant(spark, sf_dir):
    """The power-iteration output is ~unit norm (micros scale, truncation
    slack) and captures more variance than any single axis direction —
    i.e. the Rayleigh quotient of v beats the best coordinate axis."""
    from input_data_pipeline_spark.operators.similarity import (
        embedding_principal_component,
    )
    from input_data_pipeline_spark.tables import load_table

    v = [r.v_micros for r in embedding_principal_component(spark, sf_dir).collect()]
    assert len(v) == 64
    norm = sum(x * x for x in v) ** 0.5
    assert 0.98e6 <= norm <= 1.02e6

    rows = load_table(spark, sf_dir, "embeddings").select("embedding").collect()
    E = [list(r.embedding) for r in rows]
    vu = [x / norm for x in v]

    def rayleigh(direction):
        return sum(sum(e[i] * direction[i] for i in range(64)) ** 2 for e in E)

    best_axis = max(
        rayleigh([1.0 if i == j else 0.0 for i in range(64)]) for j in range(64)
    )
    assert rayleigh(vu) > best_axis


def test_large_k_assignment_uses_broadcast_numpy_path(spark, sf_dir):
    """A quantizer-scale codebook (K=256, K*dim=16384 > the literal-path
    cap) must (a) dispatch to the broadcast-ndarray kernel, (b) keep the
    map-only no-Exchange stage shape, (c) agree bit-for-bit with the
    literal path, and (d) complete a Lloyd-style assign+update within
    sane wall-time."""
    import time

    import pyspark.sql.functions as F

    from input_data_pipeline_spark.operators.similarity import (
        _KMEANS_LITERAL_MAX,
        _kmeans_assign,
        _kmeans_assign_literal,
        _kmeans_assign_np,
        _kmeans_qvec,
    )

    qv = _kmeans_qvec(spark, sf_dir)
    seeds = qv.orderBy("vec_id").limit(256).collect()
    cbig = [(i + 1, list(r["q"])) for i, r in enumerate(seeds)]
    assert len(cbig) * len(cbig[0][1]) > _KMEANS_LITERAL_MAX

    t0 = time.time()
    assigned = _kmeans_assign(qv, cbig)
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    # (a) broadcast-numpy kernel chosen: pandas UDF eval node in the plan
    assert "ArrowEvalPython" in plan
    # (b) assignment itself is shuffle-free (map-only over the cached scan)
    assert "Exchange" not in plan
    rows = assigned.collect()
    assert len(rows) == 500 and all(r.cid is not None for r in rows)
    # (d) one full K=256 Lloyd update (K-group agg) in sane wall-time
    upd = assigned.groupBy("cid").agg(F.count(F.lit(1)).alias("n")).collect()
    assert sum(r.n for r in upd) == 500
    assert time.time() - t0 < 60

    # (c) bit-identical to the literal path — same K=256 codebook. Every
    # seed vector must self-assign at distance 0 (sanity on exactness).
    lit = {r.vec_id: (r.d2, r.cid) for r in _kmeans_assign_literal(qv, cbig).collect()}
    npy = {r.vec_id: (r.d2, r.cid) for r in _kmeans_assign_np(qv, cbig).collect()}
    assert lit == npy
    seed_ids = {r["vec_id"]: i + 1 for i, r in enumerate(seeds)}
    for vid, cid in seed_ids.items():
        assert npy[vid] == (0, cid)


def test_hybrid_search_rrf_fuses_both_systems(spark, sf_dir):
    """RRF output invariants: dense ranks 1..k; every fused doc carries at
    least one system rank; the fused score is exactly the integer RRF of
    the recorded ranks; ordering follows (rrf_ppm DESC, doc_id)."""
    from input_data_pipeline_spark.operators.similarity import (
        _RRF_K,
        _RRF_POOL,
        hybrid_search_rrf,
    )

    rows = hybrid_search_rrf(spark, sf_dir).collect()
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    assert rows, "empty fusion"
    for r in rows:
        assert 0 <= r.lex_rank <= _RRF_POOL
        assert 0 <= r.sem_rank <= _RRF_POOL
        assert r.lex_rank > 0 or r.sem_rank > 0
        expect = (1_000_000 // (_RRF_K + r.lex_rank) if r.lex_rank else 0) + (
            1_000_000 // (_RRF_K + r.sem_rank) if r.sem_rank else 0
        )
        assert r.rrf_ppm == expect
    keys = [(-r.rrf_ppm, r.doc_id) for r in rows]
    assert keys == sorted(keys)


def test_sq8_recall_audit_bounds(spark, sf_dir):
    """Quantization audit invariants: recall in [0, 1e6] with overlap ≤ k
    and the exact ppm relation; 8-bit codes over these embeddings keep
    recall ≥ 80%; the reconstruction error is positive but far below the
    typical coordinate magnitude (quantization step ≪ range)."""
    from input_data_pipeline_spark.operators.similarity import (
        _SQ_TOPK,
        sq8_recall_audit,
    )

    rows = sq8_recall_audit(spark, sf_dir).collect()
    assert len(rows) == 3
    mae = rows[0].corpus_mae_micros
    for r in rows:
        assert 0 <= r.n_overlap <= _SQ_TOPK
        assert r.recall_ppm == r.n_overlap * 1_000_000 // _SQ_TOPK
        assert r.recall_ppm >= 800_000
        assert r.corpus_mae_micros == mae  # one corpus-wide error figure
    assert 0 < mae < 100_000  # step/2 ≈ range/510 ⇒ well under 0.1


def test_sq8_encode_half_away_parity_with_audit_round(spark):
    """sq8_encode must quantize half-AWAY-from-zero (matching the audit's
    F.round/ROUND), not numpy banker's rounding: with bounds (0, 510) the
    grid step is 2, so every odd integer x sits exactly on a k+0.5 tie.
    np.round would send x=1 -> code 0 (half-to-even); the published
    contract (and the DuckDB oracle) says code 1. Check every tie in the
    range against Spark's own F.round of the same expression."""
    from input_data_pipeline_spark.operators.similarity import sq8_encode

    bounds = [(0.0, 510.0)]
    ties = [float(x) for x in range(1, 510, 2)]  # all exact .5 grid points
    df = spark.createDataFrame(
        [(i, [v]) for i, v in enumerate(ties)], "vec_id int, e array<double>"
    )
    got = {
        r.vec_id: r.sq8_codes[0] for r in sq8_encode(df, bounds).collect()
    }
    audit = {
        r.vec_id: r.code
        for r in df.select(
            "vec_id",
            F.round(
                (F.col("e")[0] - F.lit(0.0)) * F.lit(255.0) / F.lit(510.0)
            ).cast("int").alias("code"),
        ).collect()
    }
    assert got == audit
    # spot-check the concrete ADVICE case: x=1 -> (1*255/510)=0.5 -> 1
    assert got[0] == 1


def test_knn_ivf_pq_audit_invariants(spark, sf_dir):
    """IVF-PQ ADC audit invariants: the ADC scan is bounded by the probed
    cells (candidates well under the corpus), overlap <= k with the exact
    ppm relation, and the float-re-ranked shortlist recovers at least one
    true neighbor per query on this corpus."""
    from input_data_pipeline_spark.operators.similarity import (
        TOP_K,
        knn_ivf_pq,
    )
    from input_data_pipeline_spark.tables import load_table

    n_corpus = load_table(spark, sf_dir, "embeddings").count()
    rows = knn_ivf_pq(spark, sf_dir).collect()
    assert [r.query_id for r in rows] == list(range(5))
    for r in rows:
        assert 0 < r.n_candidates < n_corpus  # probed cells, not a scan
        assert 0 <= r.n_overlap <= TOP_K
        assert r.recall_ppm == r.n_overlap * 1_000_000 // TOP_K
    assert sum(r.n_overlap for r in rows) >= len(rows)  # audit is not vacuous
