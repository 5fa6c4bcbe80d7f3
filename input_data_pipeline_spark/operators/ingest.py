"""Ingestion-pipeline operators (SURVEY §1, §2.2, §3.2) as oracle-checked queries.

These re-express the reference's batch-collection shape — ``source list →
fan-out → validate → union → append sink + status tally`` (reference
``inputs/transcript_collector.py:47-68``, ``main.py:81-96``,
``inputs/json_to_toxic_label.py``) — on the driver's testdata. The JSONL
read/write/round-trip half of the data model lives in
``sources/ingest_model.py`` and is exercised by ``tests/test_ingest.py``
(filesystem side effects don't belong in driver-run queries).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from input_data_pipeline_spark.functions.stable import round_micros
from input_data_pipeline_spark.plans.registry import register
from input_data_pipeline_spark.tables import load_table

# Fixture for the sentence splitter: multi-sentence, blank-tail, unicode, and
# punctuation-free cases (the testdata documents contain no [.!?], so the
# splitter is exercised on literals — same pattern as youtube_id_extraction).
_SENTENCE_FIXTURE = [
    ("r1", "One plus one. Two minus two! Is it three? Yes."),
    ("r2", "No terminal punctuation here"),
    ("r3", "Trailing spaces after stop.   And a tab\tinside. End!  "),
    ("r4", "Đây là câu một. Và câu thứ hai! ¿Tercera frase?"),
    ("r5", ""),
]

_SENTENCE_VALUES = ",\n      ".join(
    "('{}', '{}')".format(rid, txt.replace("'", "''")) for rid, txt in _SENTENCE_FIXTURE
)


@register(
    "toxic_label_scaffold",
    oracle=f"""
    WITH recs(rec_id, text) AS (VALUES
      {_SENTENCE_VALUES}),
    split AS (
      SELECT rec_id,
             unnest(string_split(
               regexp_replace(text, '([.!?])\\s+', '\\1' || chr(1), 'g'),
               chr(1))) AS s
      FROM recs)
    SELECT rec_id, trim(s) AS sentence, FALSE AS toxic
    FROM split
    WHERE trim(s) <> ''
    ORDER BY rec_id, sentence
    """,
)
def toxic_label_scaffold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence-split labeling dataset (SURVEY F3/P2/P4; reference
    ``inputs/json_to_toxic_label.py:10-14``): lookbehind regex split →
    explode → blank filter → constant ``toxic=false`` label column.

    The label column is the designed seam for a future classifier UDF
    (SURVEY U5); today it is the reference's human-in-the-loop default.
    """
    recs = spark.createDataFrame(_SENTENCE_FIXTURE, ["rec_id", "text"])
    return (
        recs.select(
            "rec_id",
            F.explode(F.split("text", r"(?<=[.!?])\s+")).alias("s"),
        )
        .select("rec_id", F.trim("s").alias("sentence"), F.lit(False).alias("toxic"))
        .filter(F.col("sentence") != "")
        .orderBy("rec_id", "sentence")
    )


@register(
    "incremental_new_docs",
    oracle="""
    SELECT d.source, COUNT(*) AS n_new
    FROM documents d
    ANTI JOIN (SELECT doc_id FROM documents WHERE doc_id % 7 = 0) m
      USING (doc_id)
    GROUP BY d.source
    ORDER BY d.source
    """,
)
def incremental_new_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-already-ingested anti-join (SURVEY J1/O2; reference
    ``main.py:81-96`` dir-diff and yt-dlp ``overwrites: False``).

    The manifest (here: every 7th doc, standing in for the committed-ids
    table) is broadcast — incoming data never shuffles, which is the only
    acceptable plan when "incoming" is a 100 TB scan.
    """
    docs = load_table(spark, sf_dir, "documents")
    manifest = docs.filter(F.col("doc_id") % 7 == 0).select("doc_id")
    return (
        docs.join(F.broadcast(manifest), "doc_id", "left_anti")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_new"))
        .orderBy("source")
    )


@register(
    "collect_status_tally",
    oracle="""
    SELECT CASE WHEN n_chars < 100 THEN 'SKIP'
                WHEN doc_id % 13 = 0 THEN 'ERR'
                ELSE 'OK' END AS status,
           COUNT(*) AS n
    FROM documents
    GROUP BY status
    ORDER BY status
    """,
)
def collect_status_tally(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OK/SKIP/ERR tally (SURVEY A5; reference's ok/fail counters at
    ``inputs/transcript_collector.py:54-68``). The per-item try/except
    taxonomy becomes a status column + low-cardinality hash aggregate —
    partial (map-side) combine makes this a near-free pass at any scale.
    """
    docs = load_table(spark, sf_dir, "documents")
    status = (
        F.when(F.col("n_chars") < 100, "SKIP")
        .when(F.col("doc_id") % 13 == 0, "ERR")
        .otherwise("OK")
    )
    return (
        docs.select(status.alias("status"))
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("status")
    )


@register(
    "union_source_batches",
    oracle="""
    WITH unioned AS (
      SELECT doc_id, lang FROM documents WHERE source IN ('src0','src1','src2')
      UNION ALL
      SELECT doc_id, NULL AS lang FROM documents WHERE source NOT IN ('src0','src1','src2')
    )
    SELECT COALESCE(lang, 'unknown') AS lang, COUNT(*) AS n_docs
    FROM unioned
    GROUP BY COALESCE(lang, 'unknown')
    ORDER BY lang
    """,
)
def union_source_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union of heterogeneous collector batches (SURVEY O3; reference writes
    all three collectors into one JSONL, ``main.py:14,140``).

    Batch B lacks the ``lang`` column — ``unionByName(allowMissingColumns)``
    null-fills it, the Spark analog of Pydantic's optional fields across
    collectors with different metadata.
    """
    docs = load_table(spark, sf_dir, "documents")
    head_sources = ("src0", "src1", "src2")
    batch_a = docs.filter(F.col("source").isin(*head_sources)).select("doc_id", "lang")
    batch_b = docs.filter(~F.col("source").isin(*head_sources)).select("doc_id")
    unioned = batch_a.unionByName(batch_b, allowMissingColumns=True)
    return (
        unioned.select(F.coalesce("lang", F.lit("unknown")).alias("lang"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang")
    )


@register(
    "segments_flatten",
    oracle="""
    WITH recs(id, source_type) AS (VALUES
      ('rec_a', 'youtube_transcript'), ('rec_b', 'system_audio'), ('rec_c', 'youtube')),
    segs AS (
      SELECT r.id, r.source_type, g.n AS seg_idx,
             (g.n * 2.5)::DOUBLE AS start,
             2.0::DOUBLE AS duration,
             'seg ' || r.id || ' #' || g.n AS text
      FROM recs r CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS n) g)
    SELECT id, source_type,
           string_agg(text, chr(10) ORDER BY seg_idx) AS text,
           COUNT(*) AS n_segments,
           CAST(ROUND(MIN(start) * 1000000) AS BIGINT) AS first_start_micros,
           CAST(ROUND((MAX(start + duration) - MIN(start)) * 1000000) AS BIGINT)
             AS span_sec_micros
    FROM segs
    GROUP BY id, source_type
    ORDER BY id
    """,
)
def segments_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested segments array → flat transcript + span stats (SURVEY A1/A3;
    reference flattens at ``transcript_collector.py:32`` and derives segment
    spans from first/last word timings at ``system_audio_collector.py:49-63``).

    Spark side builds the nested array-of-struct shape of ``INGEST_SCHEMA``
    and reduces it with array expressions — no explode/re-group shuffle; the
    array order inside each record is authoritative.
    """
    from input_data_pipeline_spark.sources.ingest_model import flatten_segments_text

    recs = spark.createDataFrame(
        [("rec_a", "youtube_transcript"), ("rec_b", "system_audio"), ("rec_c", "youtube")],
        ["id", "source_type"],
    )
    seg = lambda n: F.struct(  # noqa: E731
        (F.lit(n) * 2.5).alias("start"),
        F.lit(2.0).alias("duration"),
        F.concat(F.lit("seg "), F.col("id"), F.lit(f" #{n}")).alias("text"),
    )
    nested = recs.select(
        "id",
        "source_type",
        F.lit(None).cast("string").alias("text"),
        F.array(*[seg(n) for n in range(4)]).alias("segments"),
    )
    flat = flatten_segments_text(nested)
    last = F.element_at("segments", -1)
    return flat.select(
        "id",
        "source_type",
        "text",
        F.size("segments").cast("long").alias("n_segments"),
        round_micros(F.element_at("segments", 1)["start"]).alias("first_start_micros"),
        round_micros(
            last["start"] + last["duration"] - F.element_at("segments", 1)["start"]
        ).alias("span_sec_micros"),
    ).orderBy("id")


@register(
    "eta_formatting",
    oracle="""
    SELECT event_id,
           CAST(floor(abs(value) * 60) AS BIGINT) AS eta_sec,
           printf('%02d:%02d', CAST(floor(abs(value) * 60) AS BIGINT) // 60,
                  CAST(floor(abs(value) * 60) AS BIGINT) % 60) AS eta_mmss
    FROM events
    WHERE event_id % 100 = 0
    ORDER BY event_id
    """,
)
def eta_formatting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mm:ss progress formatting (SURVEY F10; the reference's download-ETA
    display at ``inputs/youtube_audio_extractor.py:12``) as a pure
    ``format_string`` projection over a sampled event subset. floor+abs
    keeps the double→int conversion identical across engines (Spark casts
    truncate, DuckDB casts round)."""
    events = load_table(spark, sf_dir, "events")
    eta = F.floor(F.abs(F.col("value")) * 60).cast("long")
    return (
        events.filter(F.col("event_id") % 100 == 0)
        .select(
            "event_id",
            eta.alias("eta_sec"),
            F.format_string("%02d:%02d", (eta / 60).cast("long"), eta % 60).alias(
                "eta_mmss"
            ),
        )
        .orderBy("event_id")
    )


@register(
    "path_ops",
    oracle="""
    WITH files(path) AS (VALUES
      ('out/audio/rec_0001.wav'),
      ('out/audio/nested/dir/clip.final.mp3'),
      ('toplevel.json'),
      ('out/audio/no_extension'),
      ('out/audio/rec_0002_16k.wav')),
    parts AS (
      SELECT path,
             CASE WHEN path LIKE '%/%'
                  THEN regexp_extract(path, '([^/]+)$', 1)
                  ELSE path END AS basename
      FROM files)
    SELECT path, basename,
           CASE WHEN basename LIKE '%.%'
                THEN regexp_replace(basename, '\\.[^.]*$', '')
                ELSE basename END AS stem,
           CASE WHEN basename LIKE '%.%'
                THEN regexp_extract(basename, '(\\.[^.]*)$', 1)
                ELSE '' END AS ext,
           CASE WHEN basename LIKE '%.%'
                THEN regexp_replace(basename, '\\.[^.]*$', '') || '_16k.wav'
                ELSE basename || '_16k.wav' END AS normalized_name
    FROM parts
    ORDER BY path
    """,
)
def path_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path manipulation as column expressions (SURVEY F5: basename /
    splitext at reference ``main.py:132`` and ``speech_to_text.py:18``, and
    the idempotent ``_16k.wav`` artifact naming). Fixture literals shared
    with the oracle; the same expressions apply to ``binaryFile`` source
    ``path`` columns in production.
    """
    paths = [
        "out/audio/rec_0001.wav",
        "out/audio/nested/dir/clip.final.mp3",
        "toplevel.json",
        "out/audio/no_extension",
        "out/audio/rec_0002_16k.wav",
    ]
    files = spark.createDataFrame([(p,) for p in paths], ["path"])
    basename = F.when(
        F.col("path").contains("/"),
        F.regexp_extract("path", r"([^/]+)$", 1),
    ).otherwise(F.col("path"))
    with_base = files.select("path", basename.alias("basename"))
    has_ext = F.col("basename").contains(".")
    stem = F.when(
        has_ext, F.regexp_replace("basename", r"\.[^.]*$", "")
    ).otherwise(F.col("basename"))
    ext = F.when(
        has_ext, F.regexp_extract("basename", r"(\.[^.]*)$", 1)
    ).otherwise(F.lit(""))
    return with_base.select(
        "path",
        "basename",
        stem.alias("stem"),
        ext.alias("ext"),
        F.concat(stem, F.lit("_16k.wav")).alias("normalized_name"),
    ).orderBy("path")


@register(
    "meta_map_ops",
    oracle="""
    WITH recs AS (
      SELECT 'rec_yt' AS id,
             MAP {'video_id': 'dQw4w9WgXcQ', 'languages': 'vi,en',
                  'created_at': '2026-01-28T00:00:00Z'} AS meta
      UNION ALL
      SELECT 'rec_sys',
             MAP {'device': 'Stereo Mix', 'sec': '8', 'sr': '16000',
                  'channels': '1', 'engine': 'vosk'}
      UNION ALL
      SELECT 'rec_stt', MAP {'provider': 'google', 'language': 'vi-VN'}),
    exploded AS (
      SELECT r.id, u.e.key AS meta_key, u.e.value AS meta_value,
             len(map_keys(r.meta)) AS n_keys,
             coalesce(r.meta['engine'][1], 'none') AS engine
      FROM recs r, UNNEST(map_entries(r.meta)) AS u(e))
    SELECT id, meta_key, meta_value, n_keys, engine
    FROM exploded
    ORDER BY id, meta_key
    """,
)
def meta_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open ``meta`` map surface (SURVEY F12 + §1's dynamic column):
    construction with ``create_map``, key counting, typed promotion of one
    key (``element_at``), and entry explosion — the operations queries use
    to reach into the reference's schemaless metadata. Fixture literals
    mirror the three collectors' observed meta shapes
    (transcript_collector.py:34, system_audio_collector.py:92-99,
    speech_to_text.py:96-99).
    """
    fixtures = [
        ("rec_yt", {"video_id": "dQw4w9WgXcQ", "languages": "vi,en",
                    "created_at": "2026-01-28T00:00:00Z"}),
        ("rec_sys", {"device": "Stereo Mix", "sec": "8", "sr": "16000",
                     "channels": "1", "engine": "vosk"}),
        ("rec_stt", {"provider": "google", "language": "vi-VN"}),
    ]
    rows = []
    for rid, meta in fixtures:
        kv = []
        for k, v in meta.items():
            kv.extend([F.lit(k), F.lit(v)])
        rows.append((rid, kv))
    recs = None
    for rid, kv in rows:
        one = spark.range(1).select(
            F.lit(rid).alias("id"), F.create_map(*kv).alias("meta")
        )
        recs = one if recs is None else recs.unionByName(one)
    return (
        recs.select(
            "id",
            F.explode("meta").alias("meta_key", "meta_value"),
            F.size(F.map_keys("meta")).alias("n_keys"),
            F.coalesce(F.element_at("meta", "engine"), F.lit("none")).alias("engine"),
        )
        .orderBy("id", "meta_key")
    )


@register(
    "dataset_split_assignment",
    oracle="""
    WITH assigned AS (
      SELECT lang,
             CASE WHEN CAST(('0x' || substr(md5('split:' || doc_id), 1, 8)) AS BIGINT)
                       % 100 < 80 THEN 'train'
                  WHEN CAST(('0x' || substr(md5('split:' || doc_id), 1, 8)) AS BIGINT)
                       % 100 < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents)
    SELECT split, lang, COUNT(*) AS n_docs
    FROM assigned
    GROUP BY split, lang
    ORDER BY split, lang
    """,
)
def dataset_split_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split by content-keyed hash —
    the training-data split pattern that stays stable under reruns,
    repartitioning, and incremental appends (unlike ``df.sample``, whose
    seed is partition-layout-dependent). A document's split is a pure
    function of its id: new data lands in splits without reshuffling old
    assignments, and any engine (here: DuckDB) reproduces the exact split.
    """
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.conv(
        F.substring(F.md5(F.concat(F.lit("split:"), F.col("doc_id"))), 1, 8), 16, 10
    ).cast("long") % 100
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        docs.select("lang", split.alias("split"))
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("split", "lang")
    )


@register(
    "orders_merge_upsert",
    oracle="""
    WITH updates AS (
      SELECT o_orderkey, 'P' AS o_orderstatus,
             (CAST(ROUND(o_totalprice * 100) AS BIGINT) * 110 + 50) // 100 AS price_cents
      FROM orders WHERE o_orderkey % 10 = 0
      UNION ALL
      SELECT o_orderkey + 100000000, 'N', 10000
      FROM orders WHERE o_orderkey % 1000 = 0),
    merged AS (
      SELECT COALESCE(u.o_orderkey, t.o_orderkey) AS o_orderkey,
             COALESCE(u.o_orderstatus, t.o_orderstatus) AS o_orderstatus,
             COALESCE(u.price_cents, CAST(ROUND(t.o_totalprice * 100) AS BIGINT))
               AS price_cents,
             CASE WHEN t.o_orderkey IS NULL THEN 'insert'
                  WHEN u.o_orderkey IS NULL THEN 'keep'
                  ELSE 'update' END AS action
      FROM orders t FULL OUTER JOIN updates u ON t.o_orderkey = u.o_orderkey)
    SELECT action, o_orderstatus,
           COUNT(*) AS n,
           CAST(SUM(price_cents) AS BIGINT) AS total_cents
    FROM merged
    GROUP BY action, o_orderstatus
    ORDER BY action, o_orderstatus
    """,
)
def orders_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics (upsert) as a full-outer join + coalesce — the
    batch CDC pattern behind the streaming ``write_idempotent_merge`` sink:
    matched keys take the update's values, unmatched updates insert,
    unmatched targets pass through. The deterministic 'updates' batch is
    derived from the target itself so the oracle can replay it. At 100 TB
    both sides hash-shuffle once on the key — or zero times if the target
    is bucketed by key, which is how the idempotent sink stores it.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    # All money flows in integer CENTS: the 10% uplift on a 2-decimal price
    # lands exactly on half-cent ties, where cross-engine double rounding
    # (BigDecimal shortest-repr vs multiply-round) disagrees per row.
    # (cents * 110 + 50) DIV 100 is half-up in exact integer space.
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    updates = (
        orders.filter(F.col("o_orderkey") % 10 == 0)
        .select(
            "o_orderkey",
            F.lit("P").alias("o_orderstatus"),
            F.expr(
                "(CAST(ROUND(o_totalprice * 100) AS BIGINT) * 110 + 50) DIV 100"
            ).alias("price_cents"),
        )
        .unionByName(
            orders.filter(F.col("o_orderkey") % 1000 == 0).select(
                (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
                F.lit("N").alias("o_orderstatus"),
                F.lit(10000).cast("long").alias("price_cents"),
            )
        )
    )
    t, u = orders.withColumn("price_cents", cents).alias("t"), updates.alias("u")
    merged = t.join(u, F.col("t.o_orderkey") == F.col("u.o_orderkey"), "full_outer").select(
        F.coalesce("u.o_orderkey", "t.o_orderkey").alias("o_orderkey"),
        F.coalesce("u.o_orderstatus", "t.o_orderstatus").alias("o_orderstatus"),
        F.coalesce("u.price_cents", "t.price_cents").alias("price_cents"),
        F.when(F.col("t.o_orderkey").isNull(), "insert")
        .when(F.col("u.o_orderkey").isNull(), "keep")
        .otherwise("update")
        .alias("action"),
    )
    return (
        merged.groupBy("action", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("price_cents").alias("total_cents"))
        .orderBy("action", "o_orderstatus")
    )


# ---------------------------------------------------------------------------
# Generic table profiler (per-column data-quality audit)
# ---------------------------------------------------------------------------

# (column, kind) drives both the Spark aggregate and the generated oracle;
# rendering per kind keeps min/max cells engine-identical: integers and
# strings render natively, doubles as exact micros, timestamps as epoch-us.
_PROFILE_COLS: list[tuple[str, str]] = [
    ("o_custkey", "bigint"),
    ("o_orderdate", "ts"),
    ("o_orderkey", "bigint"),
    ("o_orderpriority", "str"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "double"),
]


def _profile_oracle() -> str:
    cells, rows = [], []
    for i, (col, kind) in enumerate(_PROFILE_COLS):
        if kind == "bigint":
            mn, mx = f"CAST(MIN({col}) AS VARCHAR)", f"CAST(MAX({col}) AS VARCHAR)"
        elif kind == "str":
            mn, mx = f"MIN({col})", f"MAX({col})"
        elif kind == "double":
            mn = f"CAST(CAST(CAST(MIN({col}) AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS VARCHAR)"
            mx = f"CAST(CAST(CAST(MAX({col}) AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS VARCHAR)"
        else:  # ts
            mn = f"CAST(epoch_us(MIN({col})) AS VARCHAR)"
            mx = f"CAST(epoch_us(MAX({col})) AS VARCHAR)"
        cells.append(
            f"COUNT(*) - COUNT({col}) AS nn{i}, COUNT(DISTINCT {col}) AS nd{i},"
            f" {mn} AS mn{i}, {mx} AS mx{i}"
        )
        rows.append(
            f"SELECT '{col}' AS column_name, CAST(n_rows AS BIGINT) AS n_rows,"
            f" CAST(nn{i} AS BIGINT) AS n_nulls, CAST(nd{i} AS BIGINT) AS n_distinct,"
            f" mn{i} AS min_repr, mx{i} AS max_repr FROM a"
        )
    return (
        "WITH a AS (SELECT COUNT(*) AS n_rows, "
        + ", ".join(cells)
        + " FROM orders)\n"
        + "\nUNION ALL ".join(rows)
        + "\nORDER BY column_name"
    )


@register("table_profile", oracle=_profile_oracle())
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile of a table (here ``orders``): row count, null
    count, exact distinct count, and engine-stable min/max renderings —
    the data-quality audit run before a table joins the pipeline. Doubles
    render as exact micros and timestamps as epoch-us so the cells are
    canonicalization-proof; exact COUNT(DISTINCT) is deliberate (the
    approximate cousin exists as ``approx_distinct_users``) — Spark plans
    the multi-distinct aggregate with one Expand pass, still a single
    scan with map-side partials, which is the standard profile cost.

    Scale note: the stack() unpivot runs on ONE aggregated row; nothing
    per-row crosses the wire except the expanded distinct keys."""
    orders = load_table(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for i, (col, kind) in enumerate(_PROFILE_COLS):
        c = F.col(col)
        if kind == "bigint":
            mn, mx = F.min(c).cast("string"), F.max(c).cast("string")
        elif kind == "str":
            mn, mx = F.min(c), F.max(c)
        elif kind == "double":
            mn = F.floor(F.min(c) * 1_000_000 + F.lit(0.5)).cast("long").cast("string")
            mx = F.floor(F.max(c) * 1_000_000 + F.lit(0.5)).cast("long").cast("string")
        else:  # ts
            mn = F.unix_micros(F.min(c)).cast("string")
            mx = F.unix_micros(F.max(c)).cast("string")
        aggs += [
            F.sum(c.isNull().cast("long")).alias(f"nn{i}"),
            F.count_distinct(c).alias(f"nd{i}"),
            mn.alias(f"mn{i}"),
            mx.alias(f"mx{i}"),
        ]
    one = orders.agg(*aggs)
    stack_args = ", ".join(
        f"'{col}', nn{i}, nd{i}, mn{i}, mx{i}" for i, (col, _) in enumerate(_PROFILE_COLS)
    )
    return (
        one.select(
            F.expr(
                f"stack({len(_PROFILE_COLS)}, {stack_args})"
                " AS (column_name, n_nulls, n_distinct, min_repr, max_repr)"
            ),
            "n_rows",
        )
        .select("column_name", "n_rows", "n_nulls", "n_distinct", "min_repr", "max_repr")
        .orderBy("column_name")
    )


# ---------------------------------------------------------------------------
# Referential-integrity audit (star-schema FK checks)
# ---------------------------------------------------------------------------

_FK_CHECKS: list[tuple[str, str, str, str, str]] = [
    # (label, fact table, fk col, dim table, pk col)
    ("lineitem.l_orderkey -> orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders.o_custkey -> customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem.l_suppkey -> supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("lineitem.l_partkey -> part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("customer.c_nationkey -> nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("nation.n_regionkey -> region", "nation", "n_regionkey", "region", "r_regionkey"),
]


def _fk_oracle() -> str:
    parts = []
    for label, fact, fk, dim, pk in _FK_CHECKS:
        parts.append(
            f"SELECT '{label}' AS fk, COUNT(*) AS n_rows,"
            f" SUM(CASE WHEN d.{pk} IS NULL THEN 1 ELSE 0 END) AS n_orphans"
            f" FROM {fact} f LEFT JOIN {dim} d ON f.{fk} = d.{pk}"
        )
    return (
        "WITH checks AS (" + " UNION ALL ".join(parts) + ") "
        "SELECT fk, CAST(n_rows AS BIGINT) AS n_rows, "
        "CAST(n_orphans AS BIGINT) AS n_orphans, (n_orphans = 0) AS intact "
        "FROM checks ORDER BY fk"
    )


@register("referential_integrity_audit", oracle=_fk_oracle())
def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema FK audit: for every fact→dimension edge, the row count,
    the number of orphan fact rows (FK with no matching PK), and an
    intact verdict — the load-time gate that catches partial ingests and
    broken dimension snapshots before queries silently drop or duplicate
    rows. The check list drives both the Spark plan and the generated
    oracle.

    Scale shape: each check projects the fact side to its single FK
    column before the probe join, so only keys cross the wire; small
    dimensions (nation, region) broadcast by hint, the rest are left to
    the optimizer — at warehouse scale the orders/customer probes become
    shuffle joins, which is the correct plan, not a regression. The six
    verdicts union into one 6-row frame."""
    frames = []
    for label, fact, fk, dim, pk in _FK_CHECKS:
        dimdf = load_table(spark, sf_dir, dim).select(pk)
        if dim in ("nation", "region"):
            dimdf = F.broadcast(dimdf)
        joined = (
            load_table(spark, sf_dir, fact)
            .select(fk)
            .join(dimdf, F.col(fk) == F.col(pk), "left")
        )
        frames.append(
            joined.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col(pk).isNull().cast("long")).alias("n_orphans"),
            ).select(F.lit(label).alias("fk"), "n_rows", "n_orphans")
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return (
        out.withColumn("intact", F.col("n_orphans") == 0)
        .orderBy("fk")
    )
