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
# differential evidence must enumerate first. Round-12 rotation — NOTE:
# the round-11 window never produced a driver artifact (no
# CORRECTNESS_r11.json), so its never-checked head and the r4/r5/r6
# buckets it carried are still the stalest evidence and stay in:
# (a) never-driver-checked queries lead — the r10/r11 codec-and-selection
# eight plus the four added THIS round (small_qty_order_revenue /
# epoch_repetition_plan / hybrid_search_rrf / mp3_probe_features, each
# pre-verified driver-canon at sf0.01 and in a hostile-TZ fresh-process
# driver mimic before entering);
# (b) the three r4-era queries; (c) the full r5 bucket (20);
# (d) the whole r6 bucket (9 queries) defers to r13 — it rotates in
# with the r7 bucket as the r12 additions filled the head; (e) the 6 LLM-core anchors (all driver-green
# r10) fill the window to exactly 50. The 25 r7-era queries rotate in
# next round. Names not listed keep registration order after the listed
# ones.
_PRIORITY: list[str] = [
    # --- (a) never driver-checked (r10 + r11 + this round's four) ---
    "small_qty_order_revenue",
    "epoch_repetition_plan",
    "hybrid_search_rrf",
    "mp3_probe_features",
    "trade_pagerank",
    "flac_decode_features",
    "sole_late_supplier_orders",
    "idle_high_balance_customers",
    "chunk_dedup_rewrite",
    "sq8_recall_audit",
    "unigram_encode_fixed",
    "dedup_soft_weights",
    "tokenizer_fertility_audit",
    "audio_decode_features",
    "image_decode_features",
    "video_decode_features",
    "g711_decode_features",
    "fasttext_lang_filter",
    "image_dhash_near_dups",
    "semantic_contamination",
    "bpe_encode_fixed",
    # --- (b) last driver green r4 ---
    "dedup_bow_clusters",
    "dedup_cluster_assignment",
    "frame_sample",
    # --- (c) last driver green r5 ---
    "asof_order_context",
    "charngram_language_id",
    "corpus_boilerplate_shingles",
    "doc_length_outliers",
    "doc_previews",
    "incremental_batch_dedup",
    "knn_bruteforce",
    "knn_bruteforce_np",
    "knn_hyperplane_lsh",
    "label_centroid_assignment",
    "lang_rebalance_plan",
    "language_confusion",
    "normalized_text_hash",
    "segments_flatten",
    "semantic_doc_search",
    "skew_salted_user_join",
    "tfidf_top_terms",
    "top_tokens",
    "toxic_label_scaffold",
    "youtube_id_extraction",
    # --- (e) LLM-core anchors (stay in every window) ---
    "dedup_minhash_lsh",
    "ngram_jaccard_pairs",
    "embedding_near_pairs",
    "knn_ivf",
    "contamination_overlap",
    "doc_quality",
]
# Round-12 state: if this window goes driver-green, the stalest remaining
# evidence is the 25-query r7 bucket (bigram_lm_doc_scores ...
# weighted_doc_sample_pps) — head the r13 window with it plus any r13
# additions; the r9 bucket (44 queries) follows.


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
