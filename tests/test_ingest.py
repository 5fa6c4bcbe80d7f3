"""Ingestion data model tests (SURVEY §1, §5.2): schema enforcement at read,
JSONL round-trip fidelity (the golden-serialization check), union of
heterogeneous batches, and the anti-join manifest pattern."""

from __future__ import annotations

import json

import pyspark.sql.functions as F
import pytest

from input_data_pipeline_spark.sources.ingest_model import (
    anti_join_manifest,
    append_jsonl,
    flatten_segments_text,
    read_jsonl,
    union_batches,
)

# A golden record with the exact field shape the reference serializes
# (inputs/schema.py:12-18 + observed meta keys): nested segments, multimodal
# binary_path pointer, open meta map, non-ASCII text (ensure_ascii=False).
GOLDEN = {
    "id": "sysaudio_rec_0001",
    "source_type": "system_audio",
    "text": "xin chào thế giới",
    "segments": [
        {"start": 0.0, "duration": 1.5, "text": "xin chào"},
        {"start": 1.5, "duration": 1.25, "text": "thế giới"},
    ],
    "binary_path": "out/audio/rec_0001.wav",
    "meta": {
        "device": "Stereo Mix",
        "sec": "8",
        "sr": "16000",
        "channels": "1",
        "engine": "vosk",
        "created_at": "2026-01-28T00:00:00Z",
    },
}


@pytest.fixture()
def jsonl_dir(tmp_path):
    p = tmp_path / "ingest"
    p.mkdir()
    (p / "records.jsonl").write_text(
        json.dumps(GOLDEN, ensure_ascii=False) + "\n", encoding="utf-8"
    )
    return str(p)


def test_jsonl_read_golden_record(spark, jsonl_dir):
    df = read_jsonl(spark, jsonl_dir, mode="FAILFAST")
    [row] = df.collect()
    assert row.id == GOLDEN["id"]
    assert row.source_type == "system_audio"
    assert row.text == "xin chào thế giới"  # non-ASCII survives
    assert [s.asDict() for s in row.segments] == GOLDEN["segments"]
    assert row.binary_path == GOLDEN["binary_path"]
    assert row.meta["engine"] == "vosk"


def test_jsonl_roundtrip(spark, jsonl_dir, tmp_path):
    """read → write(append) → read re-produces identical rows, and the bytes
    keep non-ASCII unescaped (the ensure_ascii=False contract, K1)."""
    out = str(tmp_path / "out")
    df = read_jsonl(spark, jsonl_dir, mode="FAILFAST")
    append_jsonl(df, out)
    back = read_jsonl(spark, out, mode="FAILFAST")
    assert back.schema == df.schema
    assert back.collect() == df.collect()
    raw = b"".join(
        p.read_bytes() for p in (tmp_path / "out").glob("part-*.json")
    ).decode("utf-8")
    assert "xin chào thế giới" in raw
    assert "\\u" not in raw.split('"text"')[1][:60]


def test_permissive_routes_corrupt_rows(spark, tmp_path):
    p = tmp_path / "mixed"
    p.mkdir()
    (p / "data.jsonl").write_text(
        json.dumps(GOLDEN, ensure_ascii=False) + "\n" + "{not json at all\n",
        encoding="utf-8",
    )
    df = read_jsonl(spark, str(p), mode="PERMISSIVE").cache()
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert good.count() == 1 and bad.count() == 1
    assert bad.collect()[0]._corrupt_record.startswith("{not json")


def test_union_batches_null_fills_missing_columns(spark):
    a = spark.createDataFrame(
        [("a1", "youtube_transcript", "hello")], ["id", "source_type", "text"]
    )
    b = spark.createDataFrame([("b1", "system_audio")], ["id", "source_type"])
    u = union_batches(a, b)
    rows = {r.id: r for r in u.collect()}
    assert set(rows) == {"a1", "b1"}
    assert rows["b1"].text is None


def test_anti_join_manifest(spark):
    incoming = spark.createDataFrame([(f"r{i}",) for i in range(10)], ["id"])
    manifest = spark.createDataFrame([("r0",), ("r5",), ("zz",)], ["id"])
    fresh = anti_join_manifest(incoming, manifest)
    assert sorted(r.id for r in fresh.collect()) == sorted(
        f"r{i}" for i in range(10) if i not in (0, 5)
    )


def test_flatten_segments_prefers_array_order(spark):
    df = spark.createDataFrame(
        [("x", None, [(0.0, 1.0, "first"), (1.0, 1.0, "second")])],
        "id string, text string, segments array<struct<start:double,duration:double,text:string>>",
    )
    [row] = flatten_segments_text(df).collect()
    assert row.text == "first\nsecond"


def test_multiline_json_manifest_roundtrip(spark, tmp_path):
    """SURVEY S6 + K2: the run manifest — a single pretty-printed JSON doc —
    written via coalesce(1) overwrite and read back with multiLine."""
    import json

    manifest = {
        "timestamp": "2026-01-28T00:00:00Z",
        "url": "https://www.youtube.com/watch?v=dQw4w9WgXcQ",
        "title": "t",
        "source": "youtube_transcript",
        "record_id": "yt_abc",
    }
    src = tmp_path / "last_run.json"
    src.write_text(json.dumps(manifest, indent=2), encoding="utf-8")
    df = spark.read.option("multiLine", "true").json(str(src))
    [row] = df.collect()
    assert row.record_id == "yt_abc" and row.source == "youtube_transcript"

    out = str(tmp_path / "manifest_out")
    df.coalesce(1).write.mode("overwrite").json(out)
    again = spark.read.json(out)
    assert again.collect() == df.collect()
    # overwrite semantics: second write replaces, not appends
    df.coalesce(1).write.mode("overwrite").json(out)
    assert spark.read.json(out).count() == 1


def test_reference_golden_record_roundtrip(spark, tmp_path):
    """FIXTURES §1's byte-level target: the reference's one real captured
    record (/root/reference/out/audio.jsonl) must survive
    read → schema-typed DataFrame → write → read with every field intact,
    including Vietnamese text and float segment timings."""
    import shutil

    src = "/root/reference/out/audio.jsonl"
    if not __import__("os").path.exists(src):
        pytest.skip("reference golden record not available")
    d = tmp_path / "golden"
    d.mkdir()
    shutil.copy(src, d / "audio.jsonl")
    df = read_jsonl(spark, str(d), mode="FAILFAST")
    [row] = df.collect()
    original = json.loads(open(src, encoding="utf-8").read())
    assert row.id == original["id"]
    assert row.source_type == original["source_type"]
    assert row.text == original["text"]          # Vietnamese survives typed read
    assert row.binary_path == original["binary_path"]
    assert [s.asDict() for s in row.segments] == original["segments"]
    assert dict(row.meta) == {k: str(v) for k, v in original["meta"].items()}

    out = str(tmp_path / "golden_out")
    append_jsonl(df, out)
    back = read_jsonl(spark, out, mode="FAILFAST")
    assert back.collect() == df.collect()
    raw = b"".join(p.read_bytes() for p in (tmp_path / "golden_out").glob("part-*.json"))
    assert original["text"].encode("utf-8") in raw  # ensure_ascii=False bytes


def test_csv_roundtrip_hostile_values(spark, tmp_path):
    from input_data_pipeline_spark.sources.ingest_model import (
        LABELED_SCHEMA,
        read_csv,
        write_csv,
    )

    rows = [
        ("plain sentence.", False),
        ('quoted "inner" text', True),
        ("comma, separated, values", False),
        ("line\nbreak inside", True),
        ("tiếng Việt — 中文 ümlauts", False),
        (None, None),
    ]
    df = spark.createDataFrame(rows, LABELED_SCHEMA)
    out = str(tmp_path / "labeled_csv")
    write_csv(df, out)
    back = read_csv(spark, out, LABELED_SCHEMA)
    assert back.schema == LABELED_SCHEMA
    assert sorted(map(repr, back.collect())) == sorted(map(repr, df.collect()))


def test_orc_roundtrip_nested_record(spark, tmp_path):
    from input_data_pipeline_spark.sources.ingest_model import (
        INGEST_SCHEMA,
        read_orc,
        write_orc,
    )

    rows = [
        (
            "rec_1",
            "youtube_transcript",
            "hello\nworld",
            [(0.0, 1.5, "hello"), (1.5, 2.0, "world")],
            None,
            {"video_id": "dQw4w9WgXcQ", "languages": "vi,en"},
        ),
        ("rec_2", "system_audio", None, None, "out/audio/a.wav", {"engine": "vosk"}),
    ]
    df = spark.createDataFrame(rows, INGEST_SCHEMA)
    out = str(tmp_path / "records_orc")
    write_orc(df, out)
    back = read_orc(spark, out)
    assert [f.name for f in back.schema.fields] == [f.name for f in INGEST_SCHEMA.fields]
    a = sorted(map(repr, df.select("id", "text", "segments", "binary_path").collect()))
    b = sorted(map(repr, back.select("id", "text", "segments", "binary_path").collect()))
    assert a == b
    metas = {r["id"]: r["meta"] for r in back.collect()}
    assert metas["rec_1"]["video_id"] == "dQw4w9WgXcQ"


def test_observe_ingest_quality_counters(spark):
    from input_data_pipeline_spark.sources.ingest_model import (
        INGEST_SCHEMA,
        observe_ingest_quality,
    )

    rows = [
        ("r1", "youtube_transcript", "hi", [(0.0, 1.0, "hi")], None, {}),
        ("r2", "system_audio", None, None, "a.wav", {}),
        ("r3", "youtube", "yo", None, "b.wav", {}),
    ]
    df = spark.createDataFrame(rows, INGEST_SCHEMA)
    observed, obs = observe_ingest_quality(df)
    assert observed.count() == 3  # the action that populates the observation
    got = obs.get
    assert got["n_rows"] == 3
    assert got["n_null_text"] == 1
    assert got["n_null_segments"] == 2
    assert got["n_source_types"] == 3


def test_referential_integrity_audit_detects_planted_orphans(spark, tmp_path):
    """A lineitem pointing at a missing order and an order pointing at a
    missing customer must be counted as orphans; intact edges stay true."""
    from input_data_pipeline_spark.operators.ingest import referential_integrity_audit

    def w(name, schema, rows):
        spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
            str(tmp_path / f"{name}.parquet")
        )

    w("orders", "o_orderkey long, o_custkey long", [(1, 10), (2, 99)])  # 99 orphan
    w("lineitem", "l_orderkey long, l_suppkey long, l_partkey long",
      [(1, 100, 1000), (7, 100, 1000)])  # order 7 missing
    w("customer", "c_custkey long, c_nationkey long", [(10, 0)])
    w("supplier", "s_suppkey long, s_nationkey long", [(100, 0)])
    w("part", "p_partkey long", [(1000,)])
    w("nation", "n_nationkey long, n_regionkey long", [(0, 0)])
    w("region", "r_regionkey long", [(0,)])

    got = {r.fk: r for r in referential_integrity_audit(spark, str(tmp_path)).collect()}
    assert got["lineitem.l_orderkey -> orders"].n_orphans == 1
    assert not got["lineitem.l_orderkey -> orders"].intact
    assert got["orders.o_custkey -> customer"].n_orphans == 1
    assert got["lineitem.l_suppkey -> supplier"].intact
    assert got["lineitem.l_partkey -> part"].intact
    assert got["customer.c_nationkey -> nation"].intact
    assert got["nation.n_regionkey -> region"].intact
