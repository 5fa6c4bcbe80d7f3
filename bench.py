#!/usr/bin/env python
"""Headline benchmark: runs the engine's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Output contract (round-8 fix — the driver tail-captures only ~2 KB of
stdout, and round 7's all-in-one line overflowed that, leaving
BENCH_r07.json unparseable):
- the LAST stdout line is a COMPACT JSON summary (<2 KB):
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {per-query
   min}, "sf": ..., "runs_per_query": N}
- the FULL record (every sample per query + the host yardstick) is written
  to BENCH_FULL_local.json at the repo root, committed per round.

Noise self-defense (round-6 lesson: a uniformly ~1.4x slower host cost a
day of attribution work):
- each query runs $SPARK_GRAFT_BENCH_RUNS times (default 3) and reports
  the per-query MIN — min-of-N is the standard noise-robust statistic
  for wall-clock microbenchmarks (the minimum is the run least disturbed
  by interference);
- a `yardstick` block measures THIS host at bench time (single-core md5
  hash rate, numpy f64 matmul GFLOP/s, plus /proc loadavg and steal
  ticks), so a cross-round drift in query times can be attributed to the
  machine directly from the JSON, without archaeology;
- `queries_all_runs` keeps every sample so inter-run variance is visible.

A warmup run of the flagship query amortizes JVM/codegen startup out of
the numbers.
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
    # round 7 additions (additive): lexical retrieval + doc chunking
    "bm25_doc_search",
    "doc_chunk_windows",
    # round 8 additions (additive): C4 rule bundle + DSIR selection
    "c4_quality_flags",
    "dsir_importance_weights",
    # round 11 additions (additive): trained hashed-ngram lang filter +
    # perceptual-hash image near-dup dedup
    "fasttext_lang_filter",
    "image_dhash_near_dups",
    # round 12 additions (additive): agg-derived-threshold join, hybrid
    # RRF retrieval, iterative weighted PageRank
    "small_qty_order_revenue",
    "hybrid_search_rrf",
    "trade_pagerank",
    # round 13 additions (additive): IVF-PQ ADC vector search, MP3
    # sample-layer decode gate, and the Q9-shape five-way star rollup
    "knn_ivf_pq",
    "mp3_decode_features",
    "widget_revenue_by_nation_year",
    # round 14 additions (additive): full MP3-to-PCM chain (polyphase
    # synthesis + roundtrip), cross-codec audio dedup (4 decoders, one
    # identity, hash-agg cluster check), CCITT fax matrix gate
    "mp3_pcm_decode_features",
    "cross_codec_audio_dedup",
    "tiff_g4_decode_features",
    # round 15 additions (additive): G.72x ADPCM-in-AU gate (the
    # costliest new kernel — a per-sample Python state machine, so its
    # wall time is tracked here on purpose), JPEG oracle gate, JVM-side
    # PII redaction, AVI audio extraction
    "au_adpcm_decode_features",
    "jpeg_decode_features",
    "pii_redaction_stats",
    "avi_audio_extract_features",
    # round 16 additions (additive): MP3-in-WAV/AVI container routing,
    # the closed stereo matrix, the 48/32 kHz Table B.8 profiles,
    # MP4/ISO-BMFF audio extraction, and lossless (SOF3) JPEG
    "mp3_container_routing_features",
    "mp3_stereo_matrix_decode_features",
    "mp3_rate_profiles_decode_features",
    "mp4_audio_extract_features",
    "jpeg_lossless_decode_features",
    # round 16 stragglers the r16 verdict asked into the headline set:
    # the ADTS header walk and the MPEG-1 Layer I sample-decode gate
    "adts_probe_features",
    "mpeg1_layer1_decode_features",
    # round 17 additions (additive): MPEG-1 Layer II sample decode —
    # the last MPEG-1 audio layer, all four Table B.2 allocation tables —
    # and the MPEG-2/2.5 LSF Layer III gate over all six low rates
    "mpeg1_layer2_decode_features",
    "mp3_lsf_decode_features",
    "jpeg_in_tiff_decode_features",
    # round 17 continuation (additive): the container/format sweep —
    # MS ADPCM, AIFF/AIFF-C, CAF, Ogg probe, extensible/RF64 WAV,
    # netpbm+TGA, YUV4MPEG2
    "ms_adpcm_decode_features",
    "aiff_decode_features",
    "caf_decode_features",
    "ogg_probe_features",
    "wav_ext_decode_features",
    "netpbm_tga_decode_features",
    "y4m_decode_features",
    "audio_tags_features",
    "mp4_pcm_variants_features",
    "jpeg_precision12_features",
    # round 17 final session (additive): REAL Ogg Vorbis sample decode
    # (self-describing codebooks, floor 1, residues 0/1/2, coupling)
    # and hierarchical (DHP/EXP/SOF5) JPEG
    "vorbis_decode_features",
    "jpeg_hierarchical_features",
    # r17 final session (additive): the audio training-prep DSP trio —
    # rational resampling, VAD segmentation, MFCC features
    "audio_resample_features",
    "audio_vad_features",
    "audio_mfcc_features",
]

# Per-query floors for queries newer than the r1 floor table (driver-run
# BENCH_r12.json @ sf0.1, local[32]). The driver's acceptance rule is
# <= 2x the floor; the bench reports violations in `floor_violations`
# (empty list = all within bound) so a regression on these five is
# visible in the committed artifact, not just in archaeology.
FLOORS = {
    "small_qty_order_revenue": 1.043,
    "hybrid_search_rrf": 1.517,
    "trade_pagerank": 2.748,
    "fasttext_lang_filter": 2.604,
    "image_dhash_near_dups": 2.408,
    # round-13 headline additions (driver-run BENCH_r13.json @ sf0.1)
    "knn_ivf_pq": 1.633,
    "mp3_decode_features": 1.236,
    "widget_revenue_by_nation_year": 0.883,
    # round-14 headline additions (mp3_pcm/tiff_g4: driver-run
    # BENCH_r14.json @ sf0.1; cross_codec: r15 local best-of-3 AFTER the
    # double-compute fix — the r14 driver value, 10.18 s, predates the
    # localCheckpoint and would bake the defect into the bound)
    "mp3_pcm_decode_features": 5.52,
    "tiff_g4_decode_features": 1.26,
    "cross_codec_audio_dedup": 6.59,
    # round-15 first entries (driver-run BENCH_r15.json @ sf0.1,
    # local[32] — replacing the interim bench-session values per the
    # comment that shipped them, so the 2x gate tracks driver reality)
    "au_adpcm_decode_features": 8.166,
    "jpeg_decode_features": 2.669,
    "pii_redaction_stats": 1.391,
    "avi_audio_extract_features": 0.997,
    # round-16 first entries (driver-run BENCH_r16.json @ sf0.1,
    # local[32] — replacing the interim bench-session values per the
    # comment that shipped them, so the 2x gate tracks driver reality)
    "mp3_container_routing_features": 2.052,
    "mp3_stereo_matrix_decode_features": 1.480,
    "mp3_rate_profiles_decode_features": 1.017,
    "mp4_audio_extract_features": 1.680,
    "jpeg_lossless_decode_features": 0.658,
    # round-17 entries, updated in round 18 to the BENCH_r17 DRIVER
    # numbers (sf0.1, local[32], cold JVM) per the "replace with
    # BENCH_r17 driver numbers when recorded" notes that shipped the
    # interim session-measured values — the 2x acceptance gate now
    # tracks driver reality (VERDICT r17, next-round item 6)
    "adts_probe_features": 0.301,
    "mpeg1_layer1_decode_features": 1.027,
    "mpeg1_layer2_decode_features": 1.298,
    "mp3_lsf_decode_features": 0.862,
    "jpeg_in_tiff_decode_features": 1.234,
    "jpeg_precision12_features": 0.887,
    "ms_adpcm_decode_features": 0.743,
    "aiff_decode_features": 0.408,
    "caf_decode_features": 0.348,
    "ogg_probe_features": 0.331,
    "wav_ext_decode_features": 0.346,
    "netpbm_tga_decode_features": 0.368,
    "y4m_decode_features": 0.392,
    "audio_tags_features": 0.307,
    "mp4_pcm_variants_features": 0.335,
    "vorbis_decode_features": 0.888,
    "jpeg_hierarchical_features": 0.810,
    "audio_resample_features": 0.623,
    "audio_vad_features": 0.333,
    "audio_mfcc_features": 0.511,
}


def _proc_stat() -> dict:
    """loadavg + cumulative steal ticks from /proc (Linux; zeros elsewhere)."""
    out = {"loadavg_1m": 0.0, "steal_ticks": 0}
    try:
        with open("/proc/loadavg") as f:
            out["loadavg_1m"] = float(f.read().split()[0])
        with open("/proc/stat") as f:
            cpu = f.readline().split()  # cpu user nice sys idle iowait irq sirq steal
            if len(cpu) > 8:
                out["steal_ticks"] = int(cpu[8])
    except OSError:
        pass
    return out


def yardstick() -> dict:
    """Fixed-work host-speed probes: comparable across rounds, ~1 s total."""
    import hashlib

    stat0 = _proc_stat()
    # single-core hash rate: 200k md5 digests of a 64-byte block
    blk = b"x" * 64
    t0 = time.perf_counter()
    for _ in range(200_000):
        hashlib.md5(blk).digest()
    md5_k_per_s = round(200.0 / (time.perf_counter() - t0), 1)

    gflops = None
    try:
        import numpy as np

        a = np.random.default_rng(0).random((1024, 1024))
        a @ a  # warm the BLAS path
        t0 = time.perf_counter()
        for _ in range(5):
            a @ a
        gflops = round(5 * 2 * 1024**3 / (time.perf_counter() - t0) / 1e9, 1)
    except ImportError:
        pass

    return {
        "md5_1core_k_per_s": md5_k_per_s,
        "matmul_f64_gflops": gflops,
        "loadavg_1m_at_start": stat0["loadavg_1m"],
        "steal_ticks_at_start": stat0["steal_ticks"],
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    _load_all()
    names = [n for n in HEADLINE if n in _REGISTRY]
    ystick = yardstick()
    spark = get_spark("bench")

    # Warmup: JVM + codegen + parquet footer caches.
    _REGISTRY[names[0]].fn(spark, sf_dir).collect()

    # Run the full set n_runs times round-robin (not per-query back-to-back:
    # a transient host stall then hits ONE sweep, not all samples of one
    # query), keep every sample, report the per-query min. A wall-clock
    # budget guards against an unknown caller timeout: if a completed sweep
    # leaves less time than that sweep took, stop — min over the completed
    # sweeps still holds (>= 1 sweep always runs).
    budget_s = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_S", "480"))
    bench_t0 = time.perf_counter()
    samples: dict[str, list[float]] = {n: [] for n in names}
    sweeps_done = 0
    for _ in range(n_runs):
        sweep_t0 = time.perf_counter()
        for name in names:
            t0 = time.perf_counter()
            _REGISTRY[name].fn(spark, sf_dir).collect()
            samples[name].append(round(time.perf_counter() - t0, 3))
        sweeps_done += 1
        elapsed = time.perf_counter() - bench_t0
        if elapsed + (time.perf_counter() - sweep_t0) > budget_s:
            break

    timings = {n: min(ts) for n, ts in samples.items()}
    stat1 = _proc_stat()
    ystick["loadavg_1m_at_end"] = stat1["loadavg_1m"]
    ystick["steal_ticks_delta"] = stat1["steal_ticks"] - ystick.pop("steal_ticks_at_start")

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    violations = [
        {"query": n, "sec": timings[n], "floor": FLOORS[n]}
        for n in timings
        if n in FLOORS and timings[n] > 2.0 * FLOORS[n]
    ]
    compact = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "runs_per_query": sweeps_done,
        "floor_violations": violations,
    }
    full = dict(compact, queries_all_runs=samples, yardstick=ystick)
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL_local.json")
    try:
        with open(full_path, "w") as f:
            json.dump(full, f, indent=1)
            f.write("\n")
    except OSError:
        pass  # read-only checkout: the compact stdout line still lands
    # Compact summary LAST so a tail-capture always gets a complete JSON line.
    print(json.dumps(compact))
    spark.stop()


if __name__ == "__main__":
    main()
