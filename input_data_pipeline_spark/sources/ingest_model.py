"""Ingestion data model: the reference's record schema on Spark (SURVEY §1).

The reference normalizes every ingested asset (YouTube transcript, downloaded
audio, live capture) into one row shape — ``IngestRecord`` with a nested
``segments`` array-of-struct, a multimodal ``binary_path`` pointer, and an
open ``meta`` map (reference ``inputs/schema.py:6-18``) — appended to JSONL
(``inputs/schema.py:21-35``). Here that becomes an explicit ``StructType``
plus JSONL read/write helpers, so schema enforcement happens at the read
boundary (Spark's analog of the reference's Pydantic validation).

Scale notes (100 TB design point):
- JSONL is kept only as the *compatibility boundary* format; bulk storage
  should be parquet partitioned by ``source_type`` + ingest date.
- Reads take the explicit schema — no sampling-based inference pass, which
  at 100 TB would be a full extra scan.
- The incremental "skip already-ingested" pattern (reference
  ``main.py:81-96``, yt-dlp ``overwrites: False``) is a left-anti join
  against a committed manifest — a broadcast join while the manifest is
  small, a shuffle join once it isn't; Spark/AQE picks per run.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    MapType,
    StringType,
    StructField,
    StructType,
)

# Segment: one time-aligned transcript span (reference inputs/schema.py:6-9).
SEGMENT_TYPE = StructType(
    [
        StructField("start", DoubleType()),
        StructField("duration", DoubleType()),
        StructField("text", StringType()),
    ]
)

# IngestRecord (reference inputs/schema.py:12-18). ``meta`` is the open part
# of the schema; the ~10 observed keys stay in the map (string-typed) because
# queries that need one promote it with ``F.element_at(meta, 'key')``.
INGEST_SCHEMA = StructType(
    [
        StructField("id", StringType(), nullable=False),
        StructField("source_type", StringType(), nullable=False),
        StructField("text", StringType()),
        StructField("segments", ArrayType(SEGMENT_TYPE)),
        StructField("binary_path", StringType()),
        StructField("meta", MapType(StringType(), StringType())),
    ]
)


def read_jsonl(
    spark: SparkSession, path: str, mode: str = "PERMISSIVE"
) -> DataFrame:
    """Schema-enforced JSONL read (reference's Pydantic validation at scan).

    ``mode='FAILFAST'`` rejects malformed lines outright;
    the default PERMISSIVE routes them to ``_corrupt_record`` (SURVEY P6) so
    error rows can be filtered and audited instead of killing the job.
    """
    schema = INGEST_SCHEMA
    if mode == "PERMISSIVE":
        schema = StructType(
            [*INGEST_SCHEMA.fields, StructField("_corrupt_record", StringType())]
        )
    return (
        spark.read.schema(schema)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def append_jsonl(df: DataFrame, path: str) -> None:
    """Append-only JSONL sink (reference ``append_jsonl``, schema.py:21-35).

    Spark's JSON writer emits newline-delimited UTF-8 without escaping
    non-ASCII — the ``ensure_ascii=False`` behavior the reference relies on.
    ``ignoreNullFields=false`` keeps optional-but-null keys present, matching
    Pydantic's ``model_dump`` output shape.
    """
    df.write.mode("append").option("ignoreNullFields", "false").json(path)


def union_batches(*dfs: DataFrame) -> DataFrame:
    """Union collector batches into one table (SURVEY O3).

    ``unionByName(allowMissingColumns=True)`` aligns by column name and
    null-fills gaps, so collectors that emit schema subsets (the reference's
    three collectors populate different optional fields) still union cleanly.
    """
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    return out


def anti_join_manifest(
    incoming: DataFrame, manifest: DataFrame, key: str = "id"
) -> DataFrame:
    """Keep only not-yet-ingested rows (SURVEY J1; reference main.py:81-96).

    Left-anti join against the committed manifest. The manifest side is the
    small one in steady state — broadcast it explicitly so the incoming scan
    never shuffles. (On 100 TB of incoming data this is the difference
    between a map-only stage and a full shuffle.)
    """
    return incoming.join(F.broadcast(manifest.select(key)), key, "left_anti")


def flatten_segments_text(df: DataFrame, sep: str = "\n") -> DataFrame:
    """Derive full text from the segments array (SURVEY A1, reference
    ``"\\n".join(x["text"] for x in raw)`` at transcript_collector.py:32).

    Array-level concat — no explode/re-group shuffle; segment order inside
    the array is the authoritative order.
    """
    return df.withColumn(
        "text",
        F.when(
            F.col("segments").isNotNull(),
            F.array_join(F.col("segments.text"), sep),
        ).otherwise(F.col("text")),
    )


# Labeled-dataset shape (reference inputs/json_to_toxic_label.py:14):
# flat rows, so CSV is a legal interchange format for it (CSV cannot carry
# the nested IngestRecord — that stays JSONL/parquet/ORC).
LABELED_SCHEMA = StructType(
    [
        StructField("sentence", StringType()),
        StructField("toxic", BooleanType()),
    ]
)


def write_csv(df: DataFrame, path: str) -> None:
    """CSV sink for flat datasets: header, full quoting/escaping so
    embedded commas, quotes, and newlines round-trip."""
    (
        df.write.mode("overwrite")
        .option("header", True)
        .option("escape", '"')
        .csv(path)
    )


def read_csv(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Schema-enforced CSV read — explicit schema, never inference (at
    100 TB inference is a full extra scan), multiLine for quoted newlines."""
    return (
        spark.read.schema(schema)
        .option("header", True)
        .option("escape", '"')
        .option("multiLine", True)
        .csv(path)
    )


def write_orc(df: DataFrame, path: str) -> None:
    """ORC sink: columnar alternative to parquet that fully supports the
    nested IngestRecord (array-of-struct segments, string map meta)."""
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def observe_ingest_quality(df: DataFrame, name: str = "ingest_quality"):
    """Attach in-flight data-quality metrics to a batch: row count, null
    text/segments, distinct sources — collected as a side effect of
    whatever action runs the DataFrame (``Observation``), so quality
    reporting costs zero extra scans. At 100 TB that's the difference
    between free counters and a second pass over the corpus.

    Returns ``(observed_df, observation)``; read ``observation.get`` after
    an action. (Reference behavior generalized: the collectors' ok/fail
    tally, ``inputs/transcript_collector.py:54-68``.)
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("text").isNull(), 1).otherwise(0)).alias("n_null_text"),
        F.sum(F.when(F.col("segments").isNull(), 1).otherwise(0)).alias("n_null_segments"),
        F.approx_count_distinct("source_type").alias("n_source_types"),
    )
    return observed, obs
