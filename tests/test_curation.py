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
        assert 0 <= r.dup_rate_ppm < 1_000_000
        assert r.dup_rate_ppm == r.n_redundant * 1_000_000 // r.n_chunks


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


def test_mixture_plan_probabilities_partition_budget(spark, sf_dir):
    from input_data_pipeline_spark.operators.curation import (
        _MIX_BUDGET,
        mixture_sampling_plan,
    )

    rows = mixture_sampling_plan(spark, sf_dir).collect()
    assert len(rows) >= 2
    # truncated ppm shares: sum within len(rows) ppm below exactly 1
    assert 1_000_000 - len(rows) <= sum(r.sample_prob_ppm for r in rows) <= 1_000_000
    assert sum(r.epoch_tokens for r in rows) <= _MIX_BUDGET  # floors round down
    assert sum(r.epoch_tokens for r in rows) > 0.999 * _MIX_BUDGET
    # alpha=0.5 smoothing: probabilities are LESS spread than raw shares
    tot = sum(r.n_tokens for r in rows)
    for r in rows:
        raw_ppm = r.n_tokens * 1_000_000 / tot
        if raw_ppm > 1_000_000 / len(rows):
            assert r.sample_prob_ppm <= raw_ppm + 1  # big langs down-weighted
        else:
            assert r.sample_prob_ppm >= raw_ppm - 1  # small langs up-weighted


def test_token_budget_selection_is_greedy_prefix(spark, sf_dir):
    import pyspark.sql.functions as F

    from input_data_pipeline_spark.functions import text as T
    from input_data_pipeline_spark.operators.curation import (
        _SELECT_BUDGET,
        token_budget_selection,
    )
    from input_data_pipeline_spark.tables import load_table

    rows = {r.lang: r for r in token_budget_selection(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents")
    per_lang = {
        r.lang: sorted(
            [(x.n, x.doc_id) for x in r.docs], key=lambda t: (-t[0], t[1])
        )
        for r in docs.select(
            "lang", F.struct(T.token_count("text").alias("n"), "doc_id").alias("d")
        )
        .groupBy("lang")
        .agg(F.collect_list("d").alias("docs"))
        .collect()
    }
    for lang, ordered in per_lang.items():
        total, n_sel = 0, 0
        for n, _ in ordered:
            if total >= _SELECT_BUDGET:
                break
            total += n
            n_sel += 1
        r = rows[lang]
        assert (r.n_selected, r.selected_tokens) == (n_sel, total), lang


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


def test_minhash_lsh_quality_bounds(spark, sf_dir):
    """The audit row must be internally consistent: counts non-negative,
    ratios in [0,1] and equal to their count ratios."""
    from input_data_pipeline_spark.operators.curation import minhash_lsh_quality

    r = minhash_lsh_quality(spark, sf_dir).collect()[0]
    assert r.tp >= 0 and r.fp >= 0 and r.fn >= 0
    if r.tp + r.fp:
        assert r.precision_ppm == r.tp * 1_000_000 // (r.tp + r.fp)
    if r.tp + r.fn:
        assert r.recall_ppm == r.tp * 1_000_000 // (r.tp + r.fn)


def test_curation_funnel_monotone_and_consistent(spark, sf_dir):
    """Funnel counts are monotone non-increasing, drops reconcile, and
    retention is relative to ingest."""
    from input_data_pipeline_spark.operators.curation import curation_funnel

    rows = sorted((r.stage, r) for r in curation_funnel(spark, sf_dir).collect())
    assert [s for s, _ in rows] == [0, 1, 2, 3, 4]
    ns = [r.n_docs for _, r in rows]
    assert all(a >= b for a, b in zip(ns, ns[1:]))
    for i, (_, r) in enumerate(rows):
        if i:
            assert r.n_dropped == ns[i - 1] - ns[i]
        assert r.retention_ppm == r.n_docs * 1_000_000 // ns[0]


def test_fasttext_lang_filter_learns_planted_signal(spark, tmp_path):
    """On a corpus where the target language has a distinctive vocabulary
    (the real fastText-langid regime), every document classifies
    correctly and the score cells sit inside their ppm domain."""
    import pandas as pd

    from input_data_pipeline_spark.operators.curation import (
        fasttext_lang_filter,
    )

    vocab_en = ["stream", "window", "batch", "shuffle", "plan"]
    vocab_de = ["strom", "fenster", "stapel", "mischen", "plan"]
    rows = []
    for d in range(24):
        en = d % 2 == 0
        words = [(vocab_en if en else vocab_de)[(d + k) % 5] for k in range(8)]
        rows.append(
            {
                "doc_id": d,
                "text": " ".join(words),
                "lang": "en" if en else "de",
                "source": f"src{d % 3}",
                "n_chars": 8,
            }
        )
    pd.DataFrame(rows).to_parquet(tmp_path / "documents.parquet", index=False)

    out = fasttext_lang_filter(spark, str(tmp_path)).collect()
    assert len(out) == 24
    for r in out:
        assert 0 <= r.score_ppm <= 1_000_000
        assert r.pred_target == (r.lang == "en")
        assert r.correct is True
    # the planted signal separates hard: en scores all above de scores
    assert min(r.score_ppm for r in out if r.lang == "en") > max(
        r.score_ppm for r in out if r.lang == "de"
    )


def test_semantic_contamination_is_consistent_and_sparse(spark, sf_dir):
    """Cells are internally consistent (contaminated <=> max over
    threshold; hits imply contamination) and the synthetic corpus plants
    a sparse, non-empty leak."""
    from input_data_pipeline_spark.operators.curation import (
        _SCON_COS,
        _SCON_EVAL,
        semantic_contamination,
    )

    rows = semantic_contamination(spark, sf_dir).collect()
    assert rows and all(r.vec_id >= _SCON_EVAL for r in rows)
    for r in rows:
        assert -1_000_000 <= r.max_eval_cos_ppm <= 1_000_000
        assert r.contaminated == (r.max_eval_cos_ppm >= _SCON_COS)
        assert (r.n_eval_hits > 0) == r.contaminated
        assert r.n_eval_hits <= _SCON_EVAL
    flagged = [r for r in rows if r.contaminated]
    assert flagged and len(flagged) < len(rows) // 10


def test_epoch_repetition_plan_invariants(spark, sf_dir):
    """Allocation = min(uniform target, 4 epochs of self); epochs cap at
    4e6 ppm; capped ⟺ positive shortfall; target is the same for every
    source (uniform mix of a 2x-corpus budget)."""
    from input_data_pipeline_spark.operators.curation import (
        _EPOCH_BUDGET_X,
        _EPOCH_CAP,
        epoch_repetition_plan,
    )

    rows = epoch_repetition_plan(spark, sf_dir).collect()
    assert rows, "no sources?"
    total = sum(r.n_tokens for r in rows)
    target = _EPOCH_BUDGET_X * total // len(rows)
    for r in rows:
        assert r.target_tokens == target
        assert r.allocated_tokens == min(target, _EPOCH_CAP * r.n_tokens)
        assert r.epochs_ppm == r.allocated_tokens * 1_000_000 // r.n_tokens
        assert r.epochs_ppm <= _EPOCH_CAP * 1_000_000
        assert r.capped == (_EPOCH_CAP * r.n_tokens < target)
        assert r.shortfall_tokens == target - r.allocated_tokens
        assert r.capped == (r.shortfall_tokens > 0)


def test_chunk_dedup_rewrite_reassembles_survivors(spark, sf_dir):
    """Rewrite invariants at sf0.001: kept ≤ total per doc; corpus-wide
    the kept count equals the number of DISTINCT chunks (each chunk has
    exactly one canonical occurrence); a doc that owns every first
    occurrence reassembles to exactly its normalized text (md5 parity);
    and the canonical occurrence is the lexicographic (doc_id, offset)
    minimum."""
    import hashlib
    import re

    from input_data_pipeline_spark.operators.curation import (
        _CHUNK_TOKENS,
        chunk_dedup_rewrite,
    )
    from input_data_pipeline_spark.tables import load_table

    rows = {r.doc_id: r for r in chunk_dedup_rewrite(spark, sf_dir).collect()}
    docs = {
        r.doc_id: re.sub(r"\s+", " ", r.text.strip().lower())
        for r in load_table(spark, sf_dir, "documents").collect()
        if r.text.strip()
    }
    chunks = {}
    per_doc = {}
    for did in sorted(docs):
        ts = docs[did].split(" ")
        cs = [
            " ".join(ts[i : i + _CHUNK_TOKENS])
            for i in range(0, len(ts), _CHUNK_TOKENS)
        ]
        per_doc[did] = cs
        for ck, c in enumerate(cs):
            chunks.setdefault(c, (did, ck))
    assert set(rows) == set(per_doc)
    assert sum(r.n_kept for r in rows.values()) == len(chunks)
    for did, r in rows.items():
        assert r.n_chunks == len(per_doc[did])
        assert 0 <= r.n_kept <= r.n_chunks
        kept = [
            c for ck, c in enumerate(per_doc[did]) if chunks[c] == (did, ck)
        ]
        new_text = " ".join(kept)
        assert r.n_kept == len(kept)
        assert r.rewrite_fp == hashlib.md5(new_text.encode()).hexdigest()
        assert r.n_chars_new == len(new_text)


def test_prototypicality_prune_decile_and_ordering(spark, sf_dir):
    """Per label: ranks are a 1..n permutation ordered by centroid cosine,
    the pruned flag is exactly the top decile (ceil semantics via the
    integer cross-multiplication), and the most prototypical example of
    every label is always pruned."""
    from input_data_pipeline_spark.operators.curation import (
        _PROTO_PRUNE_PCT,
        prototypicality_prune,
    )

    rows = prototypicality_prune(spark, sf_dir).collect()
    by_label: dict[int, list] = {}
    for r in rows:
        by_label.setdefault(r.label, []).append(r)
    assert by_label
    for label, members in by_label.items():
        n = len(members)
        members.sort(key=lambda r: r.proto_rank)
        assert [r.proto_rank for r in members] == list(range(1, n + 1))
        cos = [r.proto_cos_ppm for r in members]
        assert cos == sorted(cos, reverse=True)
        for r in members:
            assert r.pruned == (r.proto_rank * 100 <= n * _PROTO_PRUNE_PCT)
        if n >= 100 // _PROTO_PRUNE_PCT:
            assert members[0].pruned  # the archetype always goes
