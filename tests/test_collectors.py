"""Collector pipeline tests (SURVEY §3.1/§3.2): fan-out fetch, status
taxonomy, fallback branch routing, and JSONL sink round-trip."""

from __future__ import annotations

import pyspark.sql.functions as F

from input_data_pipeline_spark.sources.collectors import (
    collect_batch,
    ingest_with_fallback,
)
from input_data_pipeline_spark.sources.ingest_model import read_jsonl

URLS = [
    # 8 valid watch URLs with distinct ids → deterministic OK/SKIP split
    *[f"https://www.youtube.com/watch?v=AAAAAAAAAA{i}" for i in range(8)],
    "https://example.com/not-a-video",  # → ERR_NO_ID
]


def test_collect_batch_tally_and_records(spark):
    records, tally = collect_batch(spark, URLS)
    t = {r.status: r.n for r in tally.collect()}
    assert t.get("ERR_NO_ID") == 1
    assert t.get("OK", 0) + t.get("SKIP_NO_TRANSCRIPT", 0) == 8
    assert t.get("OK", 0) >= 1 and t.get("SKIP_NO_TRANSCRIPT", 0) >= 1
    recs = records.collect()
    assert len(recs) == t["OK"]
    for r in recs:
        assert r.source_type == "youtube_transcript"
        assert r.id.startswith("yt_") and len(r.id) == 15  # content-hash id
        assert r.text == f"transcript of {r.video_id}"


def test_fallback_union_covers_all_fetchable(spark, tmp_path):
    """Every URL with a video id ends up as a record: transcript branch OR
    STT fallback — the union-of-branches restatement of main.py's
    try/except coalesce. Hard errors (no id) are excluded."""
    out_dir = str(tmp_path / "sink")
    records = ingest_with_fallback(spark, URLS, out_dir=out_dir)
    rows = records.collect()
    assert len(rows) == 8  # all fetchable URLs, none double-counted
    by_type = {t: n for t, n in
               records.groupBy("source_type").count().collect()}
    assert set(by_type) == {"youtube_transcript", "youtube"}
    assert sum(by_type.values()) == 8
    # ids are disjoint across branches (yt_ vs yta_ prefix)
    assert len({r.id for r in rows}) == 8
    # sink round-trip: written records re-read with the full ingest schema
    back = read_jsonl(spark, out_dir, mode="FAILFAST")
    assert back.count() == 8
    assert {r["video_id"] for r in back.select(
        F.col("meta")["video_id"].alias("video_id")).collect()} == {
        f"AAAAAAAAAA{i}" for i in range(8)
    }


def test_fallback_prunes_when_all_succeed(spark):
    """If the primary fetch succeeds for every URL, the fallback branch
    receives zero rows (the reference's early-exit, as plan pruning)."""
    import pandas as pd

    def always_ok(pdf):
        return pd.DataFrame(
            [
                (u, v, f"yt_{v}", "youtube_transcript", f"t {v}", "OK")
                for u, v in zip(pdf["url"], pdf["video_id"])
            ],
            columns=["url", "video_id", "id", "source_type", "text", "status"],
        )

    calls = []

    def tracking_stt(pdf):
        calls.append(len(pdf))
        import pandas as pd

        return pd.DataFrame(
            columns=["url", "video_id", "id", "source_type", "text", "status"]
        )

    records = ingest_with_fallback(
        spark, URLS[:8], transcript_fetch=always_ok, stt_fetch=tracking_stt
    )
    assert records.count() == 8
    assert all(r.source_type == "youtube_transcript" for r in records.collect())
