"""Query registry: every engine operator is exposed as a named query.

Each query is a ``(spark, sf_dir) -> DataFrame`` callable plus, when the
semantics are ANSI-SQL-expressible, a DuckDB oracle SQL string computing the
same result on the same parquet tables. The driver (``__spark_entry__.py``)
compares them at sf0.01 — row count, schema, and order-insensitive value
hash with columns sorted by name. Hence the two hard rules for authors:

1. alias every computed column identically in the DataFrame code and the SQL;
2. make float outputs comparison-stable (round aggregates; avoid
   non-deterministic functions — derive ids from content hashes, not uuid);
3. keep oracle RESULT types in {BIGINT, INTEGER, VARCHAR, BOOLEAN, DATE} —
   DuckDB widens SUM(BIGINT) and integer ``//`` to HUGEINT, which a pandas
   fetch (the driver's) turns into float64, hash-failing correct integer
   cells. Wrap such output cells in ``CAST(... AS BIGINT)``; enforced by
   tests/test_registry_contract.py::test_oracle_result_types_are_bigint_only.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None → driver does a rows-only check
    doc: str


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator registering a query under ``name`` with an optional oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")

        def wrapped(spark: SparkSession, sf_dir: str, **kwargs) -> DataFrame:
            # The caller may hand us an arbitrarily-configured session (the
            # round driver does). Timestamp semantics must not depend on it:
            # parquet instants + our literal date bounds are defined in UTC.
            # Extra keyword-only knobs (e.g. ccnet's top_n LM cap) pass
            # through for direct callers; the registry always calls with
            # the two positional args, so every oracle sees the defaults.
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            return fn(spark, sf_dir, **kwargs)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        _REGISTRY[name] = QuerySpec(name=name, fn=wrapped, oracle=oracle, doc=fn.__doc__ or "")
        return wrapped

    return deco


def _load_all() -> None:
    """Import every operator module for its registration side effects."""
    import input_data_pipeline_spark.operators.relational  # noqa: F401
    import input_data_pipeline_spark.operators.windows  # noqa: F401
    import input_data_pipeline_spark.operators.textstats  # noqa: F401
    import input_data_pipeline_spark.operators.dedup  # noqa: F401
    import input_data_pipeline_spark.operators.similarity  # noqa: F401
    import input_data_pipeline_spark.operators.multimodal  # noqa: F401
    import input_data_pipeline_spark.operators.ingest  # noqa: F401
    import input_data_pipeline_spark.operators.asof  # noqa: F401
    import input_data_pipeline_spark.operators.skew  # noqa: F401
    import input_data_pipeline_spark.operators.corpus  # noqa: F401
    import input_data_pipeline_spark.operators.curation  # noqa: F401
    import input_data_pipeline_spark.operators.tokenizer  # noqa: F401


# Externally-visible enumeration order. External snapshots of the registry
# truncate to a prefix (50 slots), so the queries that most need fresh
# differential evidence must enumerate first. Round-13 rotation: the r12
# window went 50/50 driver-green, so the stalest evidence is now the r6
# bucket (9 queries, last checked CORRECTNESS_r06) and the r7 bucket (25,
# last checked r07). The window is:
# (a) queries added THIS round (never driver-checked; each pre-verified
#     driver-canon at sf0.01 + hostile-TZ fresh-process mimic before
#     entering);
# (b) the full r6 bucket (9); (c) the full r7 bucket (25); (e) the 6
#     LLM-core anchors (driver-green r12) close the window at exactly 50
#     (the 10 round-13 additions displaced the r9-bucket head, which now
#     rotates in r14). Names not listed keep registration order after
# the listed ones.
_PRIORITY: list[str] = [
    # --- (a) added in round 13, never driver-checked ---
    "knn_ivf_pq",
    "mp3_decode_features",
    "purchase_click_attribution",
    "mp3_stereo_decode_features",
    "cheapest_supplier_per_part",
    "widget_revenue_by_nation_year",
    "brand_size_qty_revenue",
    "large_quantity_orders",
    "prototypicality_prune",
    "tiff_decode_features",
    # --- (b) last driver green r6 ---
    "embedding_norm_stats",
    "lang_distribution",
    "pii_redaction_scaffold",
    "pq_reconstruction_stats",
    "quality_calibration",
    "semdedup_embedding_clusters",
    "source_quota_cap",
    "stratified_doc_sample",
    "url_domain_stats",
    # --- (c) last driver green r7 ---
    "bigram_lm_doc_scores",
    "bloom_dedup_precheck",
    "bpe_token_estimate",
    "countmin_merge_sources",
    "countmin_token_freq",
    "curation_funnel",
    "doc_token_stats",
    "dup_cluster_size_histogram",
    "exact_substring_coverage",
    "hll_distinct_tokens",
    "hll_union_sources",
    "incremental_new_docs",
    "intradoc_repetition",
    "kmeans_embedding_clusters",
    "mixture_sampling_plan",
    "oov_rate_by_source",
    "quality_percentile_filter",
    "sequence_packing_plan",
    "source_dup_rates",
    "token_budget_selection",
    "user_rolling_distinct_types",
    "user_sessions",
    "user_trailing_window",
    "user_value_intervals",
    "weighted_doc_sample_pps",
    # --- (e) LLM-core anchors (stay in every window; workflow rule
    #     pinned by tests/test_registry_contract.py) ---
    "dedup_minhash_lsh",
    "ngram_jaccard_pairs",
    "embedding_near_pairs",
    "knn_ivf",
    "contamination_overlap",
    "doc_quality",
]
# Round-13 state: if this window goes driver-green, no query's evidence is
# older than r9, and the stalest remaining is `au_decode_features` and
# `top_quarter_supplier` / `late_shipment_orders_by_priority`
# (added late in r13, deliberately AFTER the window
# so they would not displace the stale r6/r7 evidence; locally
# sweep-green at both scales) plus
# the r9-bucket tail (account_balance_union ... user_retention_cohorts,
# 44 queries) — head the r14 window with them plus any r14 additions; the
# r10 bucket (44) follows.


def _ordered() -> dict[str, QuerySpec]:
    """Registry in external enumeration order: _PRIORITY first, then the
    rest in registration order."""
    out: dict[str, QuerySpec] = {}
    for name in _PRIORITY:
        out[name] = _REGISTRY[name]
    for name, spec in _REGISTRY.items():
        if name not in out:
            out[name] = spec
    return out


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return {name: spec.fn for name, spec in _ordered().items()}


def all_oracle_sql() -> dict[str, str]:
    _load_all()
    return {name: spec.oracle for name, spec in _ordered().items() if spec.oracle is not None}


def get(name: str) -> QuerySpec:
    _load_all()
    return _REGISTRY[name]
