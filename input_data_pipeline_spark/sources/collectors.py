"""Collector pipelines: the reference's entry points re-expressed on Spark.

Reference shapes covered (SURVEY §3):
- §3.2 batch collection (``inputs/transcript_collector.py:47-68``):
  ``source list → fan-out fetch → validate → union → append sink + status
  tally``. The sequential per-URL loop becomes partition-parallel
  ``mapInPandas``; the ok/fail counters become ``groupBy('status').count()``.
- §3.1 flagship fallback (``main.py:25-161``): try transcript; on failure
  fall through to audio download → normalize → STT. The try/except
  coalesce of two sub-pipelines becomes a *union of branches*: the STT
  branch's input is the transcript branch's failure set, so when everything
  succeeds the fallback stage gets zero tasks — the reference's early-exit
  (``main.py:68``) for free, with no custom control flow.

External engines (youtube-transcript-api, yt-dlp, ffmpeg, Google STT) are
injected as batch functions so production swaps in real network/subprocess
calls (with per-executor singletons + tenacity retry, SURVEY U1-U4) while
tests and CI use the deterministic fakes below — no network, same plumbing.

Scale notes: fetch stages are map-only (no shuffle); ``repartition(n)``
on the URL list is the fan-out knob (the reference's loop parallelism=1
becomes n partitions × arrow batches). The fallback union re-plans per
branch, and AQE collapses empty branches to zero tasks.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator
from typing import TYPE_CHECKING

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from input_data_pipeline_spark.functions import text as T
from input_data_pipeline_spark.sources.ingest_model import append_jsonl

if TYPE_CHECKING:
    import pandas as pd

# Result schema of every fetch stage: an IngestRecord projection plus a
# status column driving branch routing (SURVEY P6 error-row routing).
FETCH_RESULT_SCHEMA = (
    "url string, video_id string, id string, source_type string, "
    "text string, status string"
)

BatchFn = Callable[["pd.DataFrame"], "pd.DataFrame"]


def fake_transcript_fetch(pdf: "pd.DataFrame") -> "pd.DataFrame":
    """Deterministic stand-in for the YouTube transcript API (SURVEY S1).

    Success iff the URL has an extractable video id whose md5 is even —
    a stable ~50/50 split exercising both branches. Success rows carry a
    content-derived record id (the deterministic replacement for uuid ids,
    SURVEY F7) and a fake transcript.
    """
    import pandas as pd

    out = []
    for url, vid in zip(pdf["url"], pdf["video_id"]):
        if vid is None:
            out.append((url, vid, None, None, None, "ERR_NO_ID"))
        elif int(hashlib.md5(vid.encode()).hexdigest(), 16) % 2 == 0:
            rec_id = "yt_" + hashlib.sha256(vid.encode()).hexdigest()[:12]
            out.append(
                (url, vid, rec_id, "youtube_transcript",
                 f"transcript of {vid}", "OK")
            )
        else:
            out.append((url, vid, None, None, None, "SKIP_NO_TRANSCRIPT"))
    return pd.DataFrame(
        out, columns=["url", "video_id", "id", "source_type", "text", "status"]
    )


def fake_download_and_stt(pdf: "pd.DataFrame") -> "pd.DataFrame":
    """Deterministic stand-in for yt-dlp download + ffmpeg 16k normalize +
    STT (SURVEY S2/U1/U3). Produces the ``source_type='youtube'`` records
    the reference builds at ``main.py:134-138``."""
    import pandas as pd

    out = []
    for url, vid in zip(pdf["url"], pdf["video_id"]):
        rec_id = "yta_" + hashlib.sha256(vid.encode()).hexdigest()[:12]
        out.append(
            (url, vid, rec_id, "youtube", f"stt transcript of {vid}", "OK_STT")
        )
    return pd.DataFrame(
        out, columns=["url", "video_id", "id", "source_type", "text", "status"]
    )


def _map_batches(df: DataFrame, fn: BatchFn) -> DataFrame:
    def runner(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if len(pdf):
                yield fn(pdf)

    return df.mapInPandas(runner, FETCH_RESULT_SCHEMA)


def collect_batch(
    spark: SparkSession,
    urls: list[str],
    fetch: BatchFn = fake_transcript_fetch,
    n_partitions: int = 4,
) -> tuple[DataFrame, DataFrame]:
    """§3.2 batch collection. Returns (records, status_tally).

    ``repartition(n_partitions)`` is the fan-out: each partition fetches its
    URLs inside one Arrow-batched UDF call (the reference's sequential loop,
    parallelized). The tally aggregates the per-item OK/SKIP/ERR taxonomy.
    """
    urls_df = (
        spark.createDataFrame([(u,) for u in urls], ["url"])
        .repartition(n_partitions)
        .withColumn("video_id", T.youtube_id("url"))
    )
    fetched = _map_batches(urls_df, fetch)
    records = fetched.filter(F.col("status") == "OK").drop("status")
    tally = fetched.groupBy("status").agg(F.count(F.lit(1)).alias("n"))
    return records, tally


def ingest_with_fallback(
    spark: SparkSession,
    urls: list[str],
    transcript_fetch: BatchFn = fake_transcript_fetch,
    stt_fetch: BatchFn = fake_download_and_stt,
    out_dir: str | None = None,
) -> DataFrame:
    """§3.1 flagship pipeline: transcript path ∪ (failures → STT path).

    The fallback branch's input is exactly the transcript branch's
    SKIP/timeout set (not hard errors — those have no video id to retry),
    so transcript success prunes the expensive download+STT work per row,
    like the reference's early return. Output rows are IngestRecord
    projections from BOTH branches unioned by name; optionally appended
    to a JSONL sink (K1).
    """
    urls_df = (
        spark.createDataFrame([(u,) for u in urls], ["url"])
        .withColumn("video_id", T.youtube_id("url"))
    )
    primary = _map_batches(urls_df, transcript_fetch)
    ok = primary.filter(F.col("status") == "OK")
    retryable = primary.filter(F.col("status") == "SKIP_NO_TRANSCRIPT").select(
        "url", "video_id"
    )
    fallback = _map_batches(retryable, stt_fetch).filter(
        F.col("status") == "OK_STT"
    )
    records = ok.drop("status").unionByName(fallback.drop("status"))
    out = records.select(
        "id",
        "source_type",
        "text",
        F.lit(None).cast(
            "array<struct<start:double,duration:double,text:string>>"
        ).alias("segments"),
        F.lit(None).cast("string").alias("binary_path"),
        F.create_map(F.lit("video_id"), F.col("video_id")).alias("meta"),
    )
    if out_dir is not None:
        append_jsonl(out, out_dir)
    return out


# ---------------------------------------------------------------------------
# REAL external-engine adapters (round 13)
#
# The factories below build BatchFns around the actual network libraries,
# through the SAME injection seam the fakes use — so production swaps
# `fetch=real_transcript_fetch()` into :func:`collect_batch` /
# :func:`ingest_with_fallback` with no other change. CI has no network and
# no youtube-transcript-api/yt-dlp wheels, so:
# - the pure response->row mapping (`transcript_raw_to_row`) is tested
#   against recorded fixtures of the libraries' documented payload shapes;
# - the adapters' call signatures are tested against an in-process stand-in
#   module serving those fixtures (tests/test_collectors_integration.py);
# - the true end-to-end network run is a @pytest.mark.integration test that
#   importorskips the real libraries.
# ---------------------------------------------------------------------------

_REAL_ENGINES: dict = {}  # per-python-worker singletons (SURVEY U2)


def transcript_raw_to_row(url: str, vid: str, raw: list[dict]) -> tuple:
    """Map youtube-transcript-api's public ``to_raw_data()`` payload (a list
    of ``{"text", "start", "duration"}`` dicts — the shape the reference
    consumes at ``inputs/transcript_collector.py:27-34``) to a
    FETCH_RESULT_SCHEMA row: newline-joined stripped text, content-derived
    record id (SURVEY F7 — not uuid)."""
    text = "\n".join(x["text"] for x in raw).strip()
    rec_id = "yt_" + hashlib.sha256(vid.encode()).hexdigest()[:12]
    return (url, vid, rec_id, "youtube_transcript", text, "OK")


def real_transcript_fetch(
    languages: tuple[str, ...] = ("vi", "en"), max_attempts: int = 2
) -> BatchFn:
    """BatchFn wrapping the REAL youtube-transcript-api (reference
    ``inputs/transcript_collector.py:14-43``): per-worker API singleton,
    ``fetch(video_id, languages=[...])``, the reference's status taxonomy
    (TranscriptsDisabled/NoTranscriptFound -> SKIP_NO_TRANSCRIPT so the
    fallback branch retries them; anything else -> ERR_FETCH after a
    bounded retry). Import happens inside the returned function — on the
    executor, only when the adapter is actually invoked."""
    langs = [str(x).strip() for x in languages if str(x).strip()] or ["vi", "en"]

    def fetch(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd
        from youtube_transcript_api import (
            NoTranscriptFound,
            TranscriptsDisabled,
            YouTubeTranscriptApi,
        )

        api = _REAL_ENGINES.setdefault("yta", YouTubeTranscriptApi())
        out = []
        for url, vid in zip(pdf["url"], pdf["video_id"]):
            if vid is None:
                out.append((url, vid, None, None, None, "ERR_NO_ID"))
                continue
            for _ in range(max_attempts):
                try:
                    raw = api.fetch(vid, languages=langs).to_raw_data()
                    out.append(transcript_raw_to_row(url, vid, raw))
                    break
                except (TranscriptsDisabled, NoTranscriptFound):
                    out.append(
                        (url, vid, None, None, None, "SKIP_NO_TRANSCRIPT")
                    )
                    break
                except Exception:  # transient network: bounded retry (U3)
                    continue
            else:
                out.append((url, vid, None, None, None, "ERR_FETCH"))
        return pd.DataFrame(
            out,
            columns=["url", "video_id", "id", "source_type", "text", "status"],
        )

    return fetch


def real_download_and_stt(
    out_dir: str,
    stt: Callable[[str], str],
    codec: str = "m4a",
    max_attempts: int = 2,
) -> BatchFn:
    """BatchFn wrapping the REAL yt-dlp download (reference
    ``inputs/youtube_audio_extractor.py:17-57``: bestaudio-m4a-first
    format, id-templated outtmpl, ffmpeg audio extraction) followed by an
    injected ``stt(path) -> text`` callable (the STT engine stays
    injectable — Vosk/cloud STT in production, a local decoder in tests).
    One YoutubeDL singleton per worker; rows route to OK_STT /
    ERR_DOWNLOAD / ERR_STT."""
    import os

    def fetch(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd
        import yt_dlp

        os.makedirs(out_dir, exist_ok=True)
        key = ("ydl", out_dir, codec)
        if key not in _REAL_ENGINES:
            _REAL_ENGINES[key] = yt_dlp.YoutubeDL(
                {
                    "format": f"bestaudio[ext={codec}]/bestaudio/best",
                    "outtmpl": os.path.join(out_dir, "%(id)s.%(ext)s"),
                    "noplaylist": True,
                    "quiet": True,
                    "no_warnings": True,
                    "retries": max_attempts,
                }
            )
        ydl = _REAL_ENGINES[key]
        out = []
        for url, vid in zip(pdf["url"], pdf["video_id"]):
            # mirror real_transcript_fetch: a row whose URL yielded no
            # video id routes to an error row up front — otherwise
            # vid.encode() below would raise AFTER a successful
            # download+STT and fail the whole Spark task
            if vid is None or (isinstance(vid, float) and pd.isna(vid)):
                out.append((url, vid, None, None, None, "ERR_NO_ID"))
                continue
            try:
                info = ydl.extract_info(url, download=True)
                path = ydl.prepare_filename(info)
            except Exception:
                out.append((url, vid, None, None, None, "ERR_DOWNLOAD"))
                continue
            try:
                text = stt(path)
            except Exception:
                out.append((url, vid, None, None, None, "ERR_STT"))
                continue
            rec_id = "yta_" + hashlib.sha256(vid.encode()).hexdigest()[:12]
            out.append((url, vid, rec_id, "youtube", text, "OK_STT"))
        return pd.DataFrame(
            out,
            columns=["url", "video_id", "id", "source_type", "text", "status"],
        )

    return fetch
