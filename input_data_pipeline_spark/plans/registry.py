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

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # The caller may hand us an arbitrarily-configured session (the
            # round driver does). Timestamp semantics must not depend on it:
            # parquet instants + our literal date bounds are defined in UTC.
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            return fn(spark, sf_dir)

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


# Externally-visible enumeration order. External snapshots of the registry
# truncate to a prefix (50 slots), so the queries that most need fresh
# differential evidence must enumerate first. Round-8 rotation — the
# final evidence-closure round: (a) the 13-query backlog enters at the
# head: the 3 round-7 additions never driver-checked (bm25_doc_search,
# doc_chunk_windows, gopher_quality_flags) plus the 10 one-green utility
# queries deferred from the r7 window; after this window the
# never-checked set is empty and every registry query has driver-proven
# evidence; (b) the LLM-core anchors stay; (c) the remaining one-green
# queries (19, all green in r7) earn their second green; (d) the 4 new
# round-8 operators (c4/ccnet/dsir/url-canonical) enter at the head;
# (e) the last 8 slots go to the stalest two-green queries (last green
# r2) earning a third. Everything evicted holds >= 2 green rounds.
# Names not listed keep registration order after the listed ones.
_PRIORITY: list[str] = [
    # --- (a) never driver-checked (round-8 additions) ---
    "c4_quality_flags",
    "ccnet_perplexity_buckets",
    "dsir_importance_weights",
    "url_canonical_dedup",
    # --- (a) never driver-checked (round-7 additions) ---
    "bm25_doc_search",
    "doc_chunk_windows",
    "gopher_quality_flags",
    # --- (a) one-green utility backlog deferred from the r7 window ---
    "eta_formatting",
    "path_ops",
    "meta_map_ops",
    "collect_status_tally",
    "union_source_batches",
    "orders_merge_upsert",
    "event_hourly_gapfill",
    "dataset_split_assignment",
    "minhash_lsh_quality",
    "chunk_dedup_rate",
    # --- (b) LLM-core anchors (stay in every window) ---
    "dedup_minhash_lsh",
    "ngram_jaccard_pairs",
    "embedding_near_pairs",
    "knn_ivf",
    "contamination_overlap",
    "doc_quality",
    # --- (c) one green round (r7): earn the second green ---
    "approx_distinct_users",
    "event_value_approx_percentiles",
    "regional_supplier_revenue",
    "nation_pair_volume",
    "user_retention_cohorts",
    "active_user_rollup",
    "hll_rolling_active_users",
    "histogram_quantile_sketch",
    "event_daily_anomalies",
    "frequent_tokens_sketch",
    "text_encoding_audit",
    "dedup_minhash_ml",
    "dedup_keep_selection",
    "knn_ivf_kmeans",
    "cluster_diversity_sample",
    "embedding_principal_component",
    "cluster_top_terms",
    "table_profile",
    "referential_integrity_audit",
    # --- (d) stalest two-green queries (last green r2): earn a third ---
    "account_balance_union",
    "brand_revenue_by_supplier_nation",
    "clicks_before_purchase",
    "customer_order_setops_all",
    "customer_period_setops",
    "customer_value_quartiles",
    "customers_with_open_orders",
    "customers_without_urgent_orders",
]
# Round-8 state: with this window green, all 147 registry queries hold
# driver-proven evidence (never-checked set empty; minimum green count 2
# for every query that has appeared in a window).


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
