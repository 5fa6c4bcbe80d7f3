"""Execution-metrics capture: per-query shuffle/input bytes from Spark's
AppStatusStore.

Why this exists: the 100 TB design claim for the LLM-core anchor queries is
"no super-linear exchange" — banded LSH self-joins, df-capped contamination
joins, and broadcast probe sides must keep shuffle volume O(data), never
O(data^2). The planted-skew tests bound the worst KEY; this module measures
the actual end-to-end EXCHANGE at two scale factors so the growth exponent
itself is evidence (see measure_scale_growth.py and
tests/test_scale_growth.py).

Implementation: Spark exposes per-stage ``shuffleWriteBytes`` /
``inputBytes`` through the same AppStatusStore that backs the UI/REST API,
which exists even with ``spark.ui.enabled=false``. We snapshot the set of
stage ids before a query, run it, and sum metrics over the NEW stages —
attributing exactly the work this query scheduled (a reused exchange or a
cached index built by an earlier query is attributed to the query that
first ran it; keep run order fixed when comparing scale factors).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession


def _stage_list(spark: SparkSession):
    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()
    gw = sc._gateway
    empty = gw.jvm.java.util.ArrayList()
    quantiles = gw.new_array(gw.jvm.double, 0)
    # stageList(statuses, details, withSummaries, unsortedQuantiles, taskStatus)
    return store.stageList(empty, False, False, quantiles, empty)


def _stage_ids(spark: SparkSession) -> set[int]:
    stages = _stage_list(spark)
    return {stages.apply(i).stageId() for i in range(stages.size())}


def run_with_metrics(
    spark: SparkSession, fn: Callable[[SparkSession, str], DataFrame], sf_dir: str
) -> dict:
    """Run ``fn(spark, sf_dir).collect()`` and return its exchange metrics:
    ``{rows, shuffle_write_bytes, shuffle_read_bytes, input_bytes,
    n_stages}`` summed over the stages the query scheduled."""
    before = _stage_ids(spark)
    rows = len(fn(spark, sf_dir).collect())
    out = {
        "rows": rows,
        "shuffle_write_bytes": 0,
        "shuffle_read_bytes": 0,
        "input_bytes": 0,
        "n_stages": 0,
    }
    stages = _stage_list(spark)
    for i in range(stages.size()):
        s = stages.apply(i)
        if s.stageId() in before:
            continue
        out["n_stages"] += 1
        out["shuffle_write_bytes"] += s.shuffleWriteBytes()
        out["shuffle_read_bytes"] += s.shuffleReadBytes()
        out["input_bytes"] += s.inputBytes()
    return out


# The 6 LLM-core anchor queries (every driver window keeps them) — the set
# whose exchange growth the scale artifact tracks — plus the round-8
# curation additions (C4 / CCNet / DSIR / URL-canonical), which make the
# same no-super-linear-exchange claim and so carry the same evidence.
ANCHORS = [
    "dedup_minhash_lsh",
    "ngram_jaccard_pairs",
    "embedding_near_pairs",
    "knn_ivf",
    "contamination_overlap",
    "doc_quality",
    "c4_quality_flags",
    "ccnet_perplexity_buckets",
    "dsir_importance_weights",
    "url_canonical_dedup",
    # round-11 additions: the trained-filter groupBy/broadcast shape and
    # the image banded-LSH join (linear ONLY because dup-cluster size is
    # bounded — exactly the property this sweep guards)
    "fasttext_lang_filter",
    "image_dhash_near_dups",
    # round-12 additions: the agg-derived-threshold self-join (two
    # corpus-sized passes over lineitem keyed on l_partkey) and the
    # PageRank edge build (corpus-sized join+reduce; iterations are
    # node-sized and contribute O(1) shuffle regardless of corpus)
    "small_qty_order_revenue",
    "trade_pagerank",
    # round-13 addition: IVF-PQ ADC search — the corpus crosses the wire
    # as 8-int code rows only; candidate count is bounded by the probed
    # cells, so shuffle must stay linear in corpus size
    "knn_ivf_pq",
    # round-14 addition: cross-codec audio dedup — per-doc decode fan-out
    # is map-only; the only exchange is the 32-byte-key hash aggregate
    # for the cross-doc cluster count, which must stay linear in docs
    "cross_codec_audio_dedup",
    # round-15 additions: the two CPU-dense r14 decode gates. Both are
    # map-only Python kernels whose cost is per-doc; the anchor catches a
    # future single-partition regression (the r13 trap: one parquet file
    # → one partition → the kernel runs single-threaded) mechanically,
    # because losing the repartition fan-out shows up as a super-linear
    # wall/shuffle bend at the 10x step
    "mp3_pcm_decode_features",
    "tiff_g4_decode_features",
    # round-15 additions: the G.72x state-machine gate (the repo's most
    # CPU-dense per-doc kernel) and the JPEG gate — both map-only; the
    # anchor catches a lost repartition fan-out mechanically
    "au_adpcm_decode_features",
    "jpeg_decode_features",
    # round-16 addition (r15 verdict task 9): the AVI container-walk +
    # audio-decode shape — distinct from the AU gates (RIFF re-pack +
    # the WAV matrix dispatch per doc), map-only, same fan-out guard
    "avi_audio_extract_features",
    # round-17 addition: the Layer II gate — the round's flagship codec
    # kernel (five allocation tables + polyphase synthesis per doc),
    # map-only, same fan-out guard
    "mpeg1_layer2_decode_features",
]


def measure_anchors(spark: SparkSession, sf_dir: str) -> dict[str, dict]:
    """Fixed-order anchor sweep at one scale factor."""
    from input_data_pipeline_spark.plans.registry import _load_all, _REGISTRY

    _load_all()
    return {name: run_with_metrics(spark, _REGISTRY[name].fn, sf_dir) for name in ANCHORS}


def fit_exponent(points: list[dict]) -> float:
    """Least-squares slope of log(shuffle_write_bytes) vs log(input_bytes)
    over >=2 scale points — the measured growth exponent (1.0 = linear,
    2.0 = the all-pairs failure mode). A single 10x ratio bounded at 15x
    can hide a quadratic term; two steps (three points) cannot: a shape
    that is c*n + d*n^2 bends the log-log line upward and the fitted
    slope exceeds the linear bound.

    Points whose shuffle is below a 64 KiB noise floor are DROPPED from
    the fit rather than clamped: clamping would lift the small-scale
    point and understate the slope — the exact curvature the three-point
    sweep exists to catch. If fewer than 2 real-shuffle points remain
    (map-only query), the exponent is 0.0 by definition. The per-step
    ratio bound still covers the dropped steps."""
    import math

    floor = 64 * 1024
    real = [p for p in points if p["shuffle_write_bytes"] >= floor]
    if len(real) < 2:
        return 0.0
    xs = [math.log(max(p["input_bytes"], floor)) for p in real]
    ys = [math.log(p["shuffle_write_bytes"]) for p in real]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    sxx = sum((x - mx) ** 2 for x in xs)
    if sxx == 0:
        return 0.0
    return sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sxx


def growth_report(small: dict[str, dict], large: dict[str, dict]) -> dict[str, dict]:
    """Per-anchor growth ratios large/small, with a 64 KiB floor on the
    small side so a map-only query's near-zero shuffle can't produce a
    spurious huge ratio out of fixed per-partition overhead."""
    floor = 64 * 1024
    out = {}
    for name in small:
        s, l = small[name], large[name]
        out[name] = {
            "small": s,
            "large": l,
            "shuffle_growth": round(
                l["shuffle_write_bytes"] / max(s["shuffle_write_bytes"], floor), 2
            ),
            "input_growth": round(l["input_bytes"] / max(s["input_bytes"], floor), 2),
        }
    return out
