"""Invariant tests for the round-3 curation operators (beyond the oracle
hash checks)."""

from __future__ import annotations


def test_pii_redaction_counts_and_masking(spark, sf_dir):
    from input_data_pipeline_spark.operators.curation import pii_redaction_scaffold

    rows = {r.rec_id: r for r in pii_redaction_scaffold(spark, sf_dir).collect()}
    assert rows["p1"].n_emails == 2 and "[EMAIL]" in rows["p1"].redacted
    assert rows["p2"].n_phones == 2 and rows["p2"].redacted.count("[PHONE]") == 2
    assert rows["p3"].n_ips == 2 and rows["p3"].redacted.count("[IP]") == 2
    # the mixed record: one of each, fully masked
    p4 = rows["p4"]
    assert (p4.n_emails, p4.n_phones, p4.n_ips) == (1, 1, 1)
    for frag in ("@", "555-000-1111", "172.16.254.3"):
        assert frag not in p4.redacted
    assert rows["p5"].redacted == "nothing sensitive here at all"
    assert rows["p6"].n_emails == rows["p6"].n_phones == rows["p6"].n_ips == 0


def test_url_domain_stats_rollup(spark, sf_dir):
    from input_data_pipeline_spark.operators.curation import url_domain_stats

    rows = {r.domain: r for r in url_domain_stats(spark, sf_dir).collect()}
    assert rows["docs.example.com"].n_urls == 2
    assert rows["docs.example.com"].n_recs == 2
    assert rows["cdn.example.com"].n_urls == 2
    assert rows["localhost"].n_urls == 1  # port stripped by the domain group
    assert "other.org" in rows


def test_chunk_dedup_rate_bounds(spark, sf_dir):
    from input_data_pipeline_spark.operators.curation import chunk_dedup_rate

    rows = chunk_dedup_rate(spark, sf_dir).collect()
    assert rows, "no sources?"
    for r in rows:
        assert 0 <= r.n_redundant < r.n_chunks
        assert 0.0 <= r.dup_rate < 1.0
        assert abs(r.dup_rate - round(r.n_redundant / r.n_chunks, 4)) < 1e-9


def test_dup_cluster_histogram_conserves_docs(spark, sf_dir):
    from input_data_pipeline_spark.operators.curation import (
        dup_cluster_size_histogram,
    )
    from input_data_pipeline_spark.tables import load_table

    rows = dup_cluster_size_histogram(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        assert r.n_docs == r.cluster_size * r.n_clusters


def test_semdedup_clusters_are_consistent_with_pairs(spark, sf_dir):
    """Every near-pair must land in one cluster; every cluster's label is
    its min member; every clustered vector belongs to at least one pair."""
    from input_data_pipeline_spark.operators.curation import (
        semdedup_embedding_clusters,
    )
    from input_data_pipeline_spark.operators.dedup import embedding_near_pairs

    labels = {
        r.vec_id: r for r in semdedup_embedding_clusters(spark, sf_dir).collect()
    }
    pairs = [
        (r.vec_a, r.vec_b) for r in embedding_near_pairs(spark, sf_dir).collect()
    ]
    assert pairs, "fixture produced no near pairs"
    paired = {v for p in pairs for v in p}
    assert set(labels) == paired
    for a, b in pairs:
        assert labels[a].cluster_id == labels[b].cluster_id
    by_cluster: dict[int, list[int]] = {}
    for v, r in labels.items():
        by_cluster.setdefault(r.cluster_id, []).append(v)
    for cid, members in by_cluster.items():
        assert cid == min(members)
        assert len(members) >= 2
        for v in members:
            assert labels[v].cluster_size == len(members)
            assert labels[v].is_survivor == (v == cid)
