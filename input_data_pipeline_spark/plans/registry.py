"""Query registry: every engine operator is exposed as a named query.

Each query is a ``(spark, sf_dir) -> DataFrame`` callable plus, when the
semantics are ANSI-SQL-expressible, a DuckDB oracle SQL string computing the
same result on the same parquet tables. The driver (``__spark_entry__.py``)
compares them at sf0.01 — row count, schema, and order-insensitive value
hash with columns sorted by name. Hence the two hard rules for authors:

1. alias every computed column identically in the DataFrame code and the SQL;
2. make float outputs comparison-stable (round aggregates; avoid
   non-deterministic functions — derive ids from content hashes, not uuid).
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
# truncate to a prefix, so the queries that most need fresh differential
# evidence must enumerate first. Round-5 rotation: the eight round-3
# curation queries (pii scaffold … SemDeDup) had never appeared in any
# driver snapshot and move into the window, evicting eight queries that
# now hold two consecutive green driver rounds (r3+r4: the multimodal
# pair and six of the green dedup set). Names not listed keep
# registration order after the listed ones.
_PRIORITY: list[str] = [
    "user_sessions",
    # --- round-3 curation, never driver-checked before round 5 ---
    "pii_redaction_scaffold",
    "url_domain_stats",
    "chunk_dedup_rate",
    "dup_cluster_size_histogram",
    "mixture_sampling_plan",
    "token_budget_selection",
    "minhash_lsh_quality",
    "semdedup_embedding_clusters",
    # --- text analysis / corpus curation (textstats.py) ---
    "lang_distribution",
    "doc_token_stats",
    "top_tokens",
    "doc_quality",
    "doc_previews",
    "language_confusion",
    "youtube_id_extraction",
    "normalized_text_hash",
    "tfidf_top_terms",
    "charngram_language_id",
    "stratified_doc_sample",
    "quality_percentile_filter",
    "doc_length_outliers",
    "source_quota_cap",
    "frequent_tokens_sketch",
    "lang_rebalance_plan",
    "bpe_token_estimate",
    "quality_calibration",
    # --- deduplication (dedup.py) ---
    "dedup_minhash_lsh",
    "ngram_jaccard_pairs",
    "embedding_near_pairs",
    "dedup_minhash_ml",
    "incremental_batch_dedup",
    "source_dup_rates",
    # --- similarity search (similarity.py) ---
    "knn_bruteforce",
    "knn_bruteforce_np",
    "knn_hyperplane_lsh",
    "label_centroid_assignment",
    "knn_ivf",
    "semantic_doc_search",
    "embedding_norm_stats",
    "pq_reconstruction_stats",
    # --- corpus hygiene (corpus.py) ---
    "intradoc_repetition",
    "corpus_boilerplate_shingles",
    "contamination_overlap",
    "sequence_packing_plan",
    "oov_rate_by_source",
    # --- ingest / custom joins ---
    "toxic_label_scaffold",
    "segments_flatten",
    "asof_order_context",
    "skew_salted_user_join",
]


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
