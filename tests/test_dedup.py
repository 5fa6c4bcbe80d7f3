"""Property tests for dedup: LSH recall vs exact ground truth (SURVEY §5.4)."""

from __future__ import annotations

from input_data_pipeline_spark.operators.dedup import (
    dedup_minhash_lsh,
    ngram_jaccard_pairs,
    simhash_near_pairs,
)


def test_minhash_recall_vs_exact_jaccard(spark, sf_dir):
    """Every pair with true 2-gram Jaccard >= 0.8 must be recalled by the
    MinHash-LSH candidates (est >= 0.5) at >= 90%."""
    truth = {(r.doc_a, r.doc_b) for r in ngram_jaccard_pairs(spark, sf_dir).collect()}
    cand = {(r.doc_a, r.doc_b) for r in dedup_minhash_lsh(spark, sf_dir).collect()}
    assert truth, "ground-truth near-dup set is empty — fixture assumption broken"
    recall = len(truth & cand) / len(truth)
    assert recall >= 0.9, f"LSH recall {recall:.2f} < 0.9 ({len(truth)} true pairs)"


def test_simhash_close_on_near_duplicates(spark, sf_dir):
    """Pairs that are exact near-dups (Jaccard >= 0.8) should also be close
    in SimHash space (hamming <= 3) for the large majority."""
    truth = {(r.doc_a, r.doc_b) for r in ngram_jaccard_pairs(spark, sf_dir).collect()}
    sim = {(r.doc_a, r.doc_b) for r in simhash_near_pairs(spark, sf_dir).collect()}
    hit = len(truth & sim) / len(truth)
    # 32-bit SimHash over distinct-token sets is a coarser signal than
    # shingle Jaccard; ~0.75-0.8 overlap is its expected operating point here.
    assert hit >= 0.7, f"only {hit:.2f} of true near-dups are simhash-close"


def test_ml_minhash_recall_vs_exact(spark, sf_dir):
    """spark.ml MinHashLSH candidates must recover most of the exact
    Jaccard>=0.8 ground-truth pairs (its threshold 0.2 distance = 0.8 sim)."""
    from input_data_pipeline_spark.operators.dedup import (
        dedup_minhash_ml,
        ngram_jaccard_pairs,
    )

    truth = {(r.doc_a, r.doc_b) for r in ngram_jaccard_pairs(spark, sf_dir).collect()}
    got = {(r.doc_a, r.doc_b) for r in dedup_minhash_ml(spark, sf_dir).collect()}
    assert truth, "ground truth empty — fixture changed?"
    recall = len(truth & got) / len(truth)
    assert recall >= 0.8, f"ml LSH recall {recall:.2f} over {len(truth)} pairs"
    # and the est_jaccard threshold means no wildly-dissimilar pairs
    assert all(a < b for a, b in got)


def test_connected_components_transitive_chain(spark):
    from input_data_pipeline_spark.operators.dedup import connected_components

    # a-b-c-d chain + isolated pair (x, y): one 4-cluster, one 2-cluster.
    edges = spark.createDataFrame(
        [("b", "a"), ("b", "c"), ("c", "d"), ("y", "x")], ["src", "dst"]
    )
    got = {r["id"]: r["label"] for r in connected_components(edges).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a", "x": "x", "y": "x"}


def test_cluster_assignment_matches_pairs(spark, sf_dir):
    from input_data_pipeline_spark.operators.dedup import (
        dedup_cluster_assignment,
        ngram_jaccard_pairs,
    )

    labels = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup_cluster_assignment(spark, sf_dir).collect()
    }
    pairs = ngram_jaccard_pairs(spark, sf_dir).collect()
    assert pairs, "expected near-dup pairs at sf0.001"
    for p in pairs:
        # Every near-dup pair ends up in the same cluster,
        assert labels[p["doc_a"]] == labels[p["doc_b"]]
        # and the label is the lexicographic min of the component.
        assert labels[p["doc_a"]] <= min(p["doc_a"], p["doc_b"])
