"""Real-collector seam tests (SURVEY §2.10 U1-U4, round-13 item).

Two tiers prove the REAL adapters in ``sources/collectors.py`` without
network in CI:

1. **Recorded-fixture tier** (always runs): the adapters are invoked
   driver-side as plain BatchFns against stand-in modules that serve
   recorded payloads in the real libraries' documented shapes
   (``to_raw_data()`` list-of-dicts; ``extract_info``/``prepare_filename``)
   — proving the call signatures, kwargs, retry bounds, and status routing
   the fakes never exercised.
2. **Live tier** (``@pytest.mark.integration``): importorskips the real
   ``youtube_transcript_api`` / ``yt_dlp`` wheels and runs the same
   adapters through ``collect_batch`` on Spark — runnable on a networked
   dev box, skipped in this container.
"""

from __future__ import annotations

import sys
import types
from collections import deque

import pandas as pd
import pytest

# Recorded youtube-transcript-api payload: the documented to_raw_data()
# shape — list of {"text", "start", "duration"} (float seconds).
RAW_FIXTURE = [
    {"text": "xin chào", "start": 0.0, "duration": 1.54},
    {"text": "các bạn", "start": 1.54, "duration": 2.0},
    {"text": "hello world", "start": 3.54, "duration": 1.2},
]


def _install_yta_stub(monkeypatch, behaviors: dict[str, object]):
    """Stand-in ``youtube_transcript_api`` module: per-video-id behavior is
    either a raw payload (success), an exception instance to raise every
    call, or a deque of outcomes consumed call-by-call (retry proof)."""
    mod = types.ModuleType("youtube_transcript_api")

    class TranscriptsDisabled(Exception):
        pass

    class NoTranscriptFound(Exception):
        pass

    calls: list[tuple[str, tuple[str, ...]]] = []

    class _Fetched:
        def __init__(self, raw):
            self._raw = raw

        def to_raw_data(self):
            return self._raw

    class YouTubeTranscriptApi:
        def fetch(self, video_id, languages=None):
            calls.append((video_id, tuple(languages)))
            b = behaviors[video_id]
            if isinstance(b, deque):  # scripted call-by-call sequence
                b = b.popleft()
            if isinstance(b, Exception):
                raise b
            return _Fetched(b)

    mod.TranscriptsDisabled = TranscriptsDisabled
    mod.NoTranscriptFound = NoTranscriptFound
    mod.YouTubeTranscriptApi = YouTubeTranscriptApi
    monkeypatch.setitem(sys.modules, "youtube_transcript_api", mod)
    return mod, calls


def test_real_transcript_fetch_against_recorded_fixture(monkeypatch):
    """The adapter must call fetch(video_id, languages=[...]) with the
    configured language priority, map to_raw_data() through
    transcript_raw_to_row, route TranscriptsDisabled/NoTranscriptFound to
    SKIP_NO_TRANSCRIPT, retry transient errors once, and give up with
    ERR_FETCH after max_attempts."""
    from input_data_pipeline_spark.sources import collectors as C

    behaviors: dict[str, object] = {}
    mod, calls = _install_yta_stub(monkeypatch, behaviors)
    behaviors.update(
        {
            "okvid": RAW_FIXTURE,
            "disabled": mod.TranscriptsDisabled("off"),
            "notfound": mod.NoTranscriptFound("none"),
            "flaky": deque([ConnectionError("net"), RAW_FIXTURE]),
            "dead": deque([ConnectionError("net"), ConnectionError("net")]),
        }
    )

    C._REAL_ENGINES.clear()
    fetch = C.real_transcript_fetch(languages=("vi", "en"), max_attempts=2)
    pdf = pd.DataFrame(
        {
            "url": [f"https://youtu.be/{v}" for v in behaviors] + ["junk"],
            "video_id": list(behaviors) + [None],
        }
    )
    out = fetch(pdf)
    by_vid = {r.video_id: r for r in out.itertuples() if r.video_id}
    assert by_vid["okvid"].status == "OK"
    assert by_vid["okvid"].text == "xin chào\ncác bạn\nhello world"
    assert by_vid["okvid"].id == C.transcript_raw_to_row(
        "u", "okvid", RAW_FIXTURE
    )[2]
    assert by_vid["disabled"].status == "SKIP_NO_TRANSCRIPT"
    assert by_vid["notfound"].status == "SKIP_NO_TRANSCRIPT"
    assert by_vid["flaky"].status == "OK"  # retried once, then succeeded
    assert by_vid["dead"].status == "ERR_FETCH"  # both attempts failed
    null_row = out[out["video_id"].isnull()]
    assert list(null_row["status"]) == ["ERR_NO_ID"]
    # language priority passed through verbatim on every attempt
    assert all(langs == ("vi", "en") for _, langs in calls)
    # retry bound respected: flaky called twice, dead twice, others once
    n_calls = {}
    for vid, _ in calls:
        n_calls[vid] = n_calls.get(vid, 0) + 1
    assert n_calls == {"okvid": 1, "disabled": 1, "notfound": 1,
                       "flaky": 2, "dead": 2}
    # per-worker singleton: one API instance across batches
    fetch(pdf.head(1))
    assert len([k for k in C._REAL_ENGINES if k == "yta"]) == 1


def test_real_download_and_stt_against_stub_ydl(monkeypatch, tmp_path):
    """The yt-dlp adapter must construct YoutubeDL with the id-templated
    outtmpl, call extract_info(url, download=True), resolve the local path
    via prepare_filename, feed it to the injected stt callable, and route
    download/stt failures to distinct statuses."""
    import os

    from input_data_pipeline_spark.sources import collectors as C

    mod = types.ModuleType("yt_dlp")
    made = {}

    class YoutubeDL:
        def __init__(self, opts):
            made["opts"] = opts

        def extract_info(self, url, download=True):
            assert download is True
            vid = url.rsplit("/", 1)[-1]
            if vid == "down_fail":
                raise RuntimeError("403")
            info = {"id": vid, "ext": "m4a"}
            path = made["opts"]["outtmpl"] % {"id": vid, "ext": "m4a"}
            with open(path, "wb") as f:
                f.write(b"FAKEAUDIO:" + vid.encode())
            return info

        def prepare_filename(self, info):
            return made["opts"]["outtmpl"] % info

    mod.YoutubeDL = YoutubeDL
    monkeypatch.setitem(sys.modules, "yt_dlp", mod)

    def stt(path: str) -> str:
        with open(path, "rb") as f:
            data = f.read()
        if b"stt_fail" in data:
            raise ValueError("undecodable")
        return "stt::" + data.decode().split(":", 1)[1]

    C._REAL_ENGINES.clear()
    fetch = C.real_download_and_stt(str(tmp_path / "audio"), stt)
    pdf = pd.DataFrame(
        {
            "url": [
                "https://youtu.be/goodvid",
                "https://youtu.be/down_fail",
                "https://youtu.be/stt_fail",
            ],
            "video_id": ["goodvid", "down_fail", "stt_fail"],
        }
    )
    out = fetch(pdf)
    st = dict(zip(out["video_id"], out["status"]))
    assert st == {
        "goodvid": "OK_STT",
        "down_fail": "ERR_DOWNLOAD",
        "stt_fail": "ERR_STT",
    }
    ok = out[out["status"] == "OK_STT"].iloc[0]
    assert ok["text"] == "stt::goodvid"
    assert ok["source_type"] == "youtube"
    assert os.path.exists(str(tmp_path / "audio" / "goodvid.m4a"))
    # outtmpl is the id-templated reference shape
    assert made["opts"]["outtmpl"].endswith("%(id)s.%(ext)s")
    assert made["opts"]["format"].startswith("bestaudio[ext=m4a]")


@pytest.mark.integration
def test_live_transcript_fetch_through_spark(spark):
    """LIVE network tier: the real youtube-transcript-api wheel through the
    full collect_batch plumbing. Skipped wherever the wheel or the network
    is absent (this container has neither)."""
    pytest.importorskip("youtube_transcript_api")
    import socket

    try:
        socket.create_connection(("www.youtube.com", 443), timeout=5).close()
    except OSError:
        pytest.skip("no network")

    from input_data_pipeline_spark.sources.collectors import (
        collect_batch,
        real_transcript_fetch,
    )

    records, tally = collect_batch(
        spark,
        ["https://www.youtube.com/watch?v=dQw4w9WgXcQ"],
        fetch=real_transcript_fetch(languages=("en",)),
        n_partitions=1,
    )
    rows = records.collect()
    statuses = {r["status"]: r["n"] for r in tally.collect()}
    assert sum(statuses.values()) == 1
    if rows:  # OK path: a real transcript came back
        assert rows[0].source_type == "youtube_transcript"
        assert len(rows[0].text) > 0
