#!/usr/bin/env python
"""Headline benchmark: runs the engine's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed end-to-end (plan + execute + collect). A warmup run of
the flagship query amortizes JVM/codegen startup out of the numbers.
"""

from __future__ import annotations

import json
import os
import time

from input_data_pipeline_spark.plans.registry import _load_all, _REGISTRY
from input_data_pipeline_spark.session import get_spark

# The headline set: one per operator family (star join, wide agg, top-k,
# windows, dedup, similarity, text stats). Extended as families land.
HEADLINE = [
    # relational star-schema core
    "revenue_by_region",
    "pricing_summary",
    "top_customers_by_revenue",
    "order_priority_rollup",
    "latest_order_per_customer",
    # windows / events analytics / streaming-native ops
    "user_sessions",
    "session_window_native",
    "sliding_window_counts",
    "asof_order_context",
    # text analysis
    "doc_token_stats",
    "doc_quality",
    # dedup + similarity at scale
    "dedup_minhash_lsh",
    "winnowing_fingerprints",
    "knn_bruteforce_np",
    "knn_ivf",
    # skew-mitigated join
    "skew_salted_user_join",
    # time-series resample / corpus curation / fuzzy matching
    "event_hourly_gapfill",
    "quality_percentile_filter",
    "part_name_fuzzy_pairs",
    # corpus hygiene + PQ (added round 2; not in the r1 floor table)
    "intradoc_repetition",
    "sequence_packing_plan",
    "contamination_overlap",
    "pq_reconstruction_stats",
    # shared-token-index consumers (added round 3; the three hygiene
    # queries above+below tokenize documents ONCE per session via
    # corpus.corpus_token_index)
    "corpus_boilerplate_shingles",
    "oov_rate_by_source",
    # deterministic sketches (added round 5; additive on the r5 floor —
    # their r5 numbers become the floor for r6)
    "bloom_dedup_precheck",
    "countmin_token_freq",
    "hll_distinct_tokens",
    # round 6: HLL register-merge (additive on the r5 floor)
    "hll_union_sources",
    # round 6 LLM-curation additions (additive): iterative clustering,
    # bigram-LM quality scoring, sliding-shingle exact-substring coverage
    "kmeans_embedding_clusters",
    "bigram_lm_doc_scores",
    "exact_substring_coverage",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    _load_all()
    names = [n for n in HEADLINE if n in _REGISTRY]
    spark = get_spark("bench")

    # Warmup: JVM + codegen + parquet footer caches.
    _REGISTRY[names[0]].fn(spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        _REGISTRY[name].fn(spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
