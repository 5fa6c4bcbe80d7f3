"""Custom stateful streaming: incremental utterance assembly
(``applyInPandasWithState``).

The reference's Vosk loop (``inputs/system_audio_collector.py:39-63``) is an
incremental stateful consumer: it feeds fixed-size audio chunks to a
recognizer, receives *final* results per utterance as silence gaps appear,
and flushes the *partial* tail with ``FinalResult()`` at end of stream.
This module is that operator generalized to a distributed stream: per-key
(recording id) state accumulates timed words; a silence gap longer than
``gap_sec`` finalizes a segment (first word start → last word end, SURVEY
A3); an explicit end-of-stream sentinel flushes the partial tail.

Why ``applyInPandasWithState``: the built-in window/session aggregates can't
express "emit variable-length segments as they close while holding an open
tail" — this is genuinely custom state, the designed escape hatch. State per
key is a compact word buffer (bounded by utterance length, not stream
length), stored as three parallel arrays; the GroupState timeout would evict
abandoned recordings in production (kept off here for test determinism).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:
    import pandas as pd

# input: one row per recognized word (or the end-of-stream sentinel)
WORD_SCHEMA = (
    "rec_id string, w_start double, w_end double, word string, eos boolean"
)

SEGMENT_SCHEMA = StructType(
    [
        StructField("rec_id", StringType()),
        StructField("seg_start", DoubleType()),
        StructField("seg_duration", DoubleType()),
        StructField("seg_text", StringType()),
        StructField("is_final_flush", BooleanType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("starts", ArrayType(DoubleType())),
        StructField("ends", ArrayType(DoubleType())),
        StructField("words", ArrayType(StringType())),
    ]
)

DEFAULT_GAP_SEC = 0.8


def _segments_from(
    buf: list[tuple[float, float, str]], gap_sec: float, flush_tail: bool
) -> tuple[list[tuple[float, float, str]], list[tuple[float, float, str]]]:
    """Split a word buffer into (closed segments, remaining tail).

    A segment closes when the next word starts more than ``gap_sec`` after
    the previous word ends (the recognizer's silence boundary). With
    ``flush_tail`` the open tail closes too (FinalResult semantics).
    """
    if not buf:
        return [], []
    segments: list[list[tuple[float, float, str]]] = [[buf[0]]]
    for w in buf[1:]:
        if w[0] - segments[-1][-1][1] > gap_sec:
            segments.append([w])
        else:
            segments[-1].append(w)
    tail = [] if flush_tail else segments.pop()
    closed = [
        (seg[0][0], seg[-1][1], " ".join(w[2] for w in seg)) for seg in segments
    ]
    return closed, tail


def _assemble(gap_sec: float):
    def fn(
        key: tuple[str], pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        (rec_id,) = key
        if state.exists:
            starts, ends, words = state.get
            buf = list(zip(starts, ends, words))
        else:
            buf = []
        eos = False
        for pdf in pdfs:
            pdf = pdf.sort_values(["w_start"])
            eos = eos or bool(pdf["eos"].any())
            buf.extend(
                (float(s), float(e), str(w))
                for s, e, w, is_eos in zip(
                    pdf["w_start"], pdf["w_end"], pdf["word"], pdf["eos"]
                )
                if not is_eos
            )
        buf.sort(key=lambda t: (t[0], t[1]))
        closed, tail = _segments_from(buf, gap_sec, flush_tail=eos)
        if eos:
            state.remove()
        else:
            state.update(
                ([t[0] for t in tail], [t[1] for t in tail], [t[2] for t in tail])
            )
        if closed:
            yield pd.DataFrame(
                {
                    "rec_id": rec_id,
                    "seg_start": [c[0] for c in closed],
                    "seg_duration": [round(c[1] - c[0], 9) for c in closed],
                    "seg_text": [c[2] for c in closed],
                    "is_final_flush": [
                        eos and i == len(closed) - 1 for i in range(len(closed))
                    ],
                }
            )

    return fn


def assemble_utterances(
    words: DataFrame, gap_sec: float = DEFAULT_GAP_SEC
) -> DataFrame:
    """Per-recording incremental segment assembly over a word stream.

    Emits one row per *closed* segment (silence gap passed or end-of-stream
    sentinel seen); the open tail persists in group state across
    micro-batches — exactly the recognizer's partial-vs-final contract.
    """
    return words.groupBy("rec_id").applyInPandasWithState(
        _assemble(gap_sec),
        outputStructType=SEGMENT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
