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
# differential evidence must enumerate first. Round-14 rotation: the r13
# window went 50/50 driver-green, so the stalest evidence is the three
# queries registered late in r13 AFTER that window (never driver-checked)
# and the r9 bucket (44 queries, last checked CORRECTNESS_r09). The window
# is:
# (a) the 3 never-driver-checked late-r13 queries;
# (b) 41 of the 44 r9-bucket queries — the 6 LLM-core anchors (e) are
#     pinned in every window by tests/test_registry_contract.py, so 3 of
#     the 44 must wait for r15; the 3 chosen leftovers each have an
#     in-window same-family sibling exercising the same operator code
#     (`account_balance_union` ~ `union_source_batches`,
#     `customer_period_setops` ~ `customer_order_setops_all`,
#     `approx_distinct_users` ~ `hll_distinct_tokens`/`hll_union_sources`);
# (e) the 6 LLM-core anchors close the window at exactly 50.
# Round-14 additions register AFTER the window (the late-r13 precedent:
# pre-verified driver-canon at sf0.01 + sf0.1 and hostile-TZ fresh-process
# mimic locally, entering the driver rotation in r15 so they do not
# displace the stale r9 evidence). Names not listed keep registration
# order after the listed ones.
_PRIORITY: list[str] = [
    # --- (a) registered late in round 13, never driver-checked ---
    "au_decode_features",
    "top_quarter_supplier",
    "late_shipment_orders_by_priority",
    # --- (b) last driver green r9 (41 of 44; leftovers noted above) ---
    "active_user_rollup",
    "bm25_doc_search",
    "brand_revenue_by_supplier_nation",
    "c4_quality_flags",
    "ccnet_perplexity_buckets",
    "chunk_dedup_rate",
    "clicks_before_purchase",
    "cluster_diversity_sample",
    "cluster_top_terms",
    "collect_status_tally",
    "customer_order_setops_all",
    "customer_value_quartiles",
    "customers_with_open_orders",
    "customers_without_urgent_orders",
    "dataset_split_assignment",
    "dedup_keep_selection",
    "dedup_minhash_ml",
    "doc_chunk_windows",
    "dsir_importance_weights",
    "embedding_principal_component",
    "eta_formatting",
    "event_daily_anomalies",
    "event_hourly_gapfill",
    "event_value_approx_percentiles",
    "frequent_tokens_sketch",
    "gopher_quality_flags",
    "histogram_quantile_sketch",
    "hll_rolling_active_users",
    "knn_ivf_kmeans",
    "meta_map_ops",
    "minhash_lsh_quality",
    "nation_pair_volume",
    "orders_merge_upsert",
    "path_ops",
    "referential_integrity_audit",
    "regional_supplier_revenue",
    "table_profile",
    "text_encoding_audit",
    "union_source_batches",
    "url_canonical_dedup",
    "user_retention_cohorts",
    # --- (e) LLM-core anchors (stay in every window; workflow rule
    #     pinned by tests/test_registry_contract.py) ---
    "dedup_minhash_lsh",
    "ngram_jaccard_pairs",
    "embedding_near_pairs",
    "knn_ivf",
    "contamination_overlap",
    "doc_quality",
]
# Round-14 state: if this window goes driver-green, the stalest remaining
# evidence is the 3 r9 leftovers named above plus the round-14 additions
# (registered after the window, each pre-verified driver-canon at sf0.01 +
# sf0.1 and under the hostile-TZ fresh-process mimic:
# `mp3_shortblock_decode_features`, `mp3_pcm_decode_features`,
# `tiff_g4_decode_features`, `cross_codec_audio_dedup`,
# `mp3_huffman_tables_decode_features`, and the four TPC-H shapes
# `nation_market_share` / `customer_order_distribution` /
# `part_supplier_counts` / `promo_revenue_share`) — 9 additions + the 3
# r9 leftovers = 12 slots of the r15 head; then the r10 bucket (44
# queries, `asof_order_context` ... `winnowing_fingerprints`) fills to 50
# with the 6 anchors.


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
