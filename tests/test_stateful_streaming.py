"""applyInPandasWithState tests: incremental utterance assembly — the
recognizer's partial/final contract across micro-batches."""

from __future__ import annotations

import json

from input_data_pipeline_spark.streaming.stateful import (
    WORD_SCHEMA,
    _segments_from,
    assemble_utterances,
)

_SEQ = 0


def _unique(n: str) -> str:
    global _SEQ
    _SEQ += 1
    return f"{n}_{_SEQ}"


def _word(rec, s, e, w, eos=False):
    return {"rec_id": rec, "w_start": s, "w_end": e, "word": w, "eos": eos}


def test_segments_from_pure():
    buf = [(0.0, 0.3, "a"), (0.4, 0.7, "b"), (2.0, 2.2, "c"), (2.3, 2.5, "d")]
    closed, tail = _segments_from(buf, gap_sec=0.8, flush_tail=False)
    assert closed == [(0.0, 0.7, "a b")]
    assert tail == [(2.0, 2.2, "c"), (2.3, 2.5, "d")]
    closed, tail = _segments_from(buf, gap_sec=0.8, flush_tail=True)
    assert closed == [(0.0, 0.7, "a b"), (2.0, 2.5, "c d")]
    assert tail == []


def test_incremental_assembly_across_batches(spark, tmp_path):
    src = tmp_path / "words"
    src.mkdir()

    def write(fname, rows):
        (src / fname).write_text("\n".join(json.dumps(r) for r in rows) + "\n")

    name = _unique("utt")
    words = spark.readStream.schema(WORD_SCHEMA).json(str(src))
    # batch 1: one full utterance + the start of a second (stays in state)
    write("b1.jsonl", [
        _word("r1", 0.0, 0.3, "hello"),
        _word("r1", 0.35, 0.6, "world"),
        _word("r1", 2.0, 2.3, "open"),
    ])
    q = (
        assemble_utterances(words, gap_sec=0.8)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.table(name).collect()
        assert [(r.seg_text, r.seg_start, r.seg_duration) for r in rows] == [
            ("hello world", 0.0, 0.6)
        ]
        # batch 2: continue the open utterance, then a gap, then EOS flush
        write("b2.jsonl", [
            _word("r1", 2.35, 2.6, "tail"),
            _word("r1", 5.0, 5.2, "bye"),
            _word("r1", 99.0, 99.0, "", eos=True),
        ])
        q.processAllAvailable()
        rows = {r.seg_text: r for r in spark.table(name).collect()}
        assert set(rows) == {"hello world", "open tail", "bye"}
        # cross-batch continuation: 'open' (b1) + 'tail' (b2) joined
        assert rows["open tail"].seg_start == 2.0
        assert abs(rows["open tail"].seg_duration - 0.6) < 1e-9
        assert rows["bye"].is_final_flush  # tail flushed by sentinel
        assert not rows["hello world"].is_final_flush
    finally:
        q.stop()


def test_keys_are_isolated(spark, tmp_path):
    src = tmp_path / "words2"
    src.mkdir()
    rows = [
        _word("a", 0.0, 0.2, "one"),
        _word("b", 0.1, 0.4, "uno"),
        _word("a", 0.0, 0.0, "", eos=True),
    ]
    (src / "b1.jsonl").write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    name = _unique("iso")
    words = spark.readStream.schema(WORD_SCHEMA).json(str(src))
    q = (
        assemble_utterances(words)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        out = {(r.rec_id, r.seg_text) for r in spark.table(name).collect()}
        # 'a' flushed by its sentinel; 'b' still open (no output yet)
        assert out == {("a", "one")}
    finally:
        q.stop()
