"""Multimodal-column operators (SURVEY §1.3, §2.10 U1-U4; BASELINE N★).

The reference treats media as out-of-band WAV files referenced by
``binary_path`` and runs decode/transcode/ASR through external engines
(ffmpeg at ``inputs/speech_to_text.py:14-30``, Vosk at
``inputs/system_audio_collector.py:29-65``). The Spark generalization:
media is an opaque ``binary`` column with typed metadata, and every
decode / feature-extract / frame-sample step is an Arrow-batched
``mapInPandas`` stage.

The actual codec calls are STUBBED here (no media libraries in this
container — see ``decode_media_stub``); what is real and tested is the
Spark-side plumbing: binary column handling, UDF signatures, output
schemas, one-to-many frame expansion, and per-executor batch shapes.
The fake decoder is deterministic (hash/length math over the payload
bytes) so every query still hash-matches a DuckDB oracle.

Scale notes: mapInPandas stages here are map-only — no shuffle; Arrow
batch size (``spark.sql.execution.arrow.maxRecordsPerBatch``) bounds
executor memory per batch, which is what makes the same plan safe when
payloads are megabyte images instead of kilobyte fakes. Heavy decoders
follow the per-executor singleton pattern (load the model/codec once per
worker process, reference U2) — see ``tests/test_multimodal.py``.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from input_data_pipeline_spark.plans.registry import register
from input_data_pipeline_spark.tables import load_table

if TYPE_CHECKING:
    import pandas as pd

# Fake "sample rate" for duration estimation: 16 kHz mono s16le (the
# reference's ASR input format, speech_to_text.py:24-26) → 32000 bytes/sec.
_BYTES_PER_SEC = 32000.0

_FRAME_CHARS = 64  # fake frame size (chars) for frame-sampling plumbing
_FRAME_STRIDE = 2  # keep every 2nd frame


def decode_media_stub(payload: bytes, modality: str) -> object:
    """Placeholder for the real codec call (ffmpeg/PIL/torchaudio).

    Deliberately NotImplemented: this container has no media libraries.
    On a real cluster this body becomes the external-engine call and MUST
    be invoked through a per-executor singleton (one codec/model instance
    per worker process), never per row — reference pattern U2.
    """
    raise NotImplementedError(
        f"real {modality} decode requires external media libraries; "
        "wire ffmpeg/PIL here on a real cluster (SURVEY §2.10 U1/U2)"
    )


def attach_binary_payload(docs: DataFrame) -> DataFrame:
    """Deterministic stand-in for ``spark.read.format('binaryFile')``:
    promote text to an opaque binary ``payload`` column (UTF-8 bytes).
    Real ingestion replaces this with the binaryFile source (SURVEY S5)."""
    return docs.withColumn("payload", F.encode("text", "UTF-8"))


@register(
    "multimodal_binary_meta",
    oracle="""
    SELECT doc_id,
           source,
           octet_length(encode(text)) AS n_bytes,
           substr(sha256(text), 1, 16) AS fingerprint,
           octet_length(encode(text)) * 1000000 // 32000 AS est_duration_micros
    FROM documents
    ORDER BY doc_id
    """,
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata extraction from an opaque binary column via
    Arrow-batched ``mapInPandas`` (SURVEY U1's metadata half): byte size,
    content fingerprint (sha256 — the deterministic replacement for the
    reference's uuid artifact names, speech_to_text.py:40), and estimated
    duration at the reference's 16 kHz mono s16le ASR format.
    """
    docs = load_table(spark, sf_dir, "documents")
    payloads = attach_binary_payload(docs).select("doc_id", "source", "payload")

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import hashlib

        for pdf in batches:
            out = pdf[["doc_id", "source"]].copy()
            out["n_bytes"] = pdf["payload"].map(len)
            out["fingerprint"] = pdf["payload"].map(
                lambda b: hashlib.sha256(bytes(b)).hexdigest()[:16]
            )
            out["est_duration_micros"] = out["n_bytes"] * 1_000_000 // _BYTES_PER_SEC
            yield out

    schema = (
        "doc_id long, source string, n_bytes long, "
        "fingerprint string, est_duration_micros long"
    )
    return payloads.mapInPandas(extract, schema).orderBy("doc_id")


@register(
    "frame_sample",
    oracle=f"""
    SELECT d.doc_id,
           g.n AS frame_idx,
           length(substr(d.text, g.n * {_FRAME_CHARS} + 1, {_FRAME_CHARS})) AS frame_len,
           substr(sha256(substr(d.text, g.n * {_FRAME_CHARS} + 1, {_FRAME_CHARS})), 1, 12)
             AS frame_sig
    FROM documents d,
         LATERAL (SELECT unnest(generate_series(
             0, CAST((length(d.text) - 1) // {_FRAME_CHARS} AS INT), {_FRAME_STRIDE}))
             AS n) g
    ORDER BY d.doc_id, g.n
    """,
)
def frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over opaque media (SURVEY U1/U2 shape; the Vosk loop
    consumes audio in fixed 4000-frame chunks, system_audio_collector.py:39).

    One-to-many mapInPandas: each payload expands into its every-``stride``-th
    fixed-size frame with an index and a content signature — exactly the
    batch shape video frame-sampling or audio chunking produces. The fake
    "decode" is char-windowing so the DuckDB oracle can replay it.
    """
    docs = load_table(spark, sf_dir, "documents")

    def sample(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import hashlib

        import pandas as pd

        for pdf in batches:
            ids, idxs, lens, sigs = [], [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                frames = [
                    text[i : i + _FRAME_CHARS]
                    for i in range(0, len(text), _FRAME_CHARS)
                ]
                for k in range(0, len(frames), _FRAME_STRIDE):
                    ids.append(doc_id)
                    idxs.append(k)
                    lens.append(len(frames[k]))
                    sigs.append(
                        hashlib.sha256(frames[k].encode("utf-8")).hexdigest()[:12]
                    )
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_len": lens, "frame_sig": sigs}
            )

    schema = "doc_id long, frame_idx int, frame_len int, frame_sig string"
    return (
        docs.select("doc_id", "text")
        .mapInPandas(sample, schema)
        .orderBy("doc_id", "frame_idx")
    )


CHUNK_BYTES = 4000  # mirrors the reference's 4000-frame chunked WAV read


def chunk_binary_payloads(docs_with_payload: DataFrame) -> DataFrame:
    """Split each opaque binary payload into fixed-size chunk rows
    ``(doc_id, chunk_idx, byte_start, byte_len, chunk)`` — the distributed
    form of the reference's chunked recognizer feed
    (``inputs/system_audio_collector.py:39-41``: readframes(4000) loop).

    mapInPandas so the slicing happens per Arrow batch with zero JVM↔Python
    row chatter; chunk rows inherit the input partitioning, so a downstream
    per-chunk inference UDF (ASR, embedding) runs map-side with no shuffle.
    The last chunk is short, never padded, matching the reference loop.
    """
    import pandas as pd

    def slice_batches(batches):
        for pdf in batches:
            out = {"doc_id": [], "chunk_idx": [], "byte_start": [], "byte_len": [], "chunk": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload or b"")
                n = len(data)
                idx = 0
                for start in range(0, max(n, 1), CHUNK_BYTES):
                    piece = data[start:start + CHUNK_BYTES]
                    out["doc_id"].append(doc_id)
                    out["chunk_idx"].append(idx)
                    out["byte_start"].append(start)
                    out["byte_len"].append(len(piece))
                    out["chunk"].append(piece)
                    idx += 1
            yield pd.DataFrame(out)

    return docs_with_payload.mapInPandas(
        slice_batches,
        "doc_id long, chunk_idx int, byte_start long, byte_len long, chunk binary",
    )
