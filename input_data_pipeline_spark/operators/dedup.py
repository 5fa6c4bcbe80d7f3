"""Deduplication operators (BASELINE N★: exact, MinHash-LSH, SimHash,
n-gram Jaccard, embedding-cosine).

Every variant here is built so the SAME deterministic signature is computable
in DuckDB (md5-based hashing, explicit summation order), making even the
LSH pipelines oracle-checkable — the driver's hash compare covers not just
"some duplicates found" but the exact candidate set.

Scale design (100 TB):
- exact dedup: one shuffle on the 32-byte fingerprint; survivors via min-key.
- MinHash LSH: explode to (band, band_key) — shuffle keys are the band
  hashes, so candidate generation is an equi self-join, never O(n²).
- SimHash: pigeonhole banding (4×8-bit chunks) turns hamming<=3 search into
  an equi join as well; the exact hamming filter runs post-probe.
- embedding pairs: expression-only cosine for the oracle-checked variant;
  the similarity module adds the blocked/LSH paths for real ANN workloads.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from input_data_pipeline_spark.functions import text as T
from input_data_pipeline_spark.plans.registry import register
from input_data_pipeline_spark.tables import load_table

# shared DuckDB fragments -----------------------------------------------------
_DUCK_TOKENS = r"list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '')"
_DUCK_SHINGLES2 = (
    "list_distinct(list_transform(range(1, greatest(len(ts) - 1, 1) + 1), "
    "i -> ts[i] || ' ' || coalesce(ts[i + 1], '')))"
)

N_MINHASH = 12
N_BANDS = 4
ROWS_PER_BAND = N_MINHASH // N_BANDS


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

@register(
    "dedup_exact",
    oracle="""
    WITH fp AS (
      SELECT doc_id,
             sha256(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
      FROM documents)
    SELECT fingerprint,
           MIN(doc_id) AS survivor_id,
           COUNT(*) AS n_copies
    FROM fp
    GROUP BY fingerprint
    ORDER BY survivor_id
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: normalized sha256 fingerprint → one survivor per cluster.

    One shuffle on the fingerprint; at 100 TB the map-side partial agg means
    only (fingerprint, local-min, local-count) crosses the wire.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", T.fingerprint("text").alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("survivor_id"), F.count(F.lit(1)).alias("n_copies"))
        .orderBy("survivor_id")
    )


@register(
    "dedup_bow_clusters",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, {_DUCK_TOKENS} AS ts FROM documents),
    fp AS (
      SELECT doc_id,
             sha256(array_to_string(list_sort(list_distinct(ts)), ' ')) AS bow_fp
      FROM tok)
    SELECT bow_fp, MIN(doc_id) AS survivor_id, COUNT(*) AS n_docs
    FROM fp
    GROUP BY bow_fp
    HAVING COUNT(*) > 1
    ORDER BY survivor_id
    """,
)
def dedup_bow_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-of-words dedup: docs identical under token-set normalization
    (reorderings / repetitions collapse). Finds the real clusters the
    byte-exact pass misses."""
    docs = load_table(spark, sf_dir, "documents")
    bow_fp = F.sha2(F.concat_ws(" ", F.array_sort(F.array_distinct(T.tokens("text")))), 256)
    return (
        docs.select("doc_id", bow_fp.alias("bow_fp"))
        .groupBy("bow_fp")
        .agg(F.min("doc_id").alias("survivor_id"), F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") > 1)
        .orderBy("survivor_id")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH banding
# ---------------------------------------------------------------------------

def _shingles2(col: Column | str) -> Column:
    return F.array_distinct(T.word_shingles(col, 2))



def _docs_with_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, sig) with the signature computed in codegen, not in
    higher-order array functions.

    Shape matters for speed: explode shingles to rows, evaluate the 12
    md5(i|shingle) hashes as ordinary projected columns (whole-stage
    codegen — interpreted lambda-transforms over arrays are ~10× slower),
    then min-aggregate back per doc. The shuffle carries only the 12
    partial mins per doc (map-side combine), so this scales linearly in
    corpus size regardless of shingle fan-out. MinHash is duplicate-
    insensitive (min over a multiset), so no array_distinct pass is needed.
    """
    docs = load_table(spark, sf_dir, "documents")
    shingled = docs.select(
        "doc_id", F.explode(T.word_shingles("text", 2)).alias("sh")
    )
    hashed = shingled.select(
        "doc_id",
        *[F.md5(F.concat(F.lit(f"{i}|"), F.col("sh"))).alias(f"h{i}") for i in range(N_MINHASH)],
    )
    return (
        hashed.groupBy("doc_id")
        .agg(*[F.min(f"h{i}").alias(f"h{i}") for i in range(N_MINHASH)])
        .select("doc_id", F.array(*[f"h{i}" for i in range(N_MINHASH)]).alias("sig"))
    )


@register(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, {_DUCK_TOKENS} AS ts FROM documents),
    sh AS (
      SELECT doc_id, {_DUCK_SHINGLES2} AS shs FROM tok),
    sig AS (
      SELECT doc_id,
             [list_min(list_transform(shs, s -> md5(h::VARCHAR || '|' || s)))
              FOR h IN range({N_MINHASH})] AS sig
      FROM sh),
    bands AS (
      SELECT doc_id, b,
             md5(sig[b * {ROWS_PER_BAND} + 1] || sig[b * {ROWS_PER_BAND} + 2]
                 || sig[b * {ROWS_PER_BAND} + 3]) AS band_key
      FROM sig, UNNEST(range({N_BANDS})) AS t(b)),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a
      JOIN bands b ON a.band_key = b.band_key AND a.b = b.b AND a.doc_id < b.doc_id),
    est AS (
      SELECT c.doc_a, c.doc_b,
             ROUND(len(list_filter(range({N_MINHASH}), i -> sa.sig[i + 1] = sb.sig[i + 1]))
                   / {N_MINHASH}.0, 4) AS est_jaccard
      FROM cand c
      JOIN sig sa ON sa.doc_id = c.doc_a
      JOIN sig sb ON sb.doc_id = c.doc_b)
    SELECT doc_a, doc_b, est_jaccard
    FROM est
    WHERE est_jaccard >= 0.5
    ORDER BY doc_a, doc_b
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidate pairs via MinHash + LSH banding (12 hashes,
    4 bands × 3 rows), est_jaccard >= 0.5.

    Candidate generation is an equi self-join on (band, band_key) — the
    only shuffle keys are band hashes, so cost scales with collisions,
    not with |docs|². Each side carries its fixed-size signature, so the
    Jaccard estimate falls out of the join with no further lookups.
    """
    sigs = _docs_with_sigs(spark, sf_dir)

    # Bands carry the (small, fixed-size) signature with them so the
    # candidate self-join yields both signatures directly — no signature
    # re-join, and the signature subplan is evaluated once per join side
    # instead of once per downstream consumer.
    bands = sigs.select(
        "doc_id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("b"),
                        F.md5(
                            F.concat(
                                *[F.element_at("sig", b * ROWS_PER_BAND + r + 1) for r in range(ROWS_PER_BAND)]
                            )
                        ).alias("band_key"),
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "sig", "band.b", "band.band_key")

    matches = F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m))
    return (
        bands.alias("a")
        .join(
            bands.alias("bb"),
            (F.col("a.band_key") == F.col("bb.band_key"))
            & (F.col("a.b") == F.col("bb.b"))
            & (F.col("a.doc_id") < F.col("bb.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("bb.doc_id").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("bb.sig").alias("sig_b"),
        )
        .distinct()
        .select(
            "doc_a",
            "doc_b",
            F.round(matches / F.lit(float(N_MINHASH)), 4).alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= 0.5)
        .orderBy("doc_a", "doc_b")
    )


@register(
    "ngram_jaccard_pairs",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, {_DUCK_TOKENS} AS ts FROM documents),
    sh AS (
      SELECT doc_id, {_DUCK_SHINGLES2} AS shs FROM tok)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           ROUND(len(list_intersect(a.shs, b.shs)) * 1.0
                 / len(list_distinct(a.shs || b.shs)), 4) AS jaccard
    FROM sh a
    JOIN sh b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.shs, b.shs)) * 1.0
          / len(list_distinct(a.shs || b.shs)) >= 0.8
    ORDER BY doc_a, doc_b
    """,
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 2-gram Jaccard >= 0.8 over all pairs — the ground-truth near-dup
    set the LSH variant approximates (its pytest recall test compares the
    two). The all-pairs form is the ORACLE shape; at scale you'd seed it
    with LSH candidates instead — same filter, same output schema."""
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select("doc_id", _shingles2("text").alias("shs"))
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("shs").alias("shs_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("shs").alias("shs_b"))
    inter = F.size(F.array_intersect("shs_a", "shs_b"))
    union = F.size(F.array_union("shs_a", "shs_b"))
    jac = inter / union
    return (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .filter(jac >= 0.8)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

_SIMHASH_BITS = 32
_HAMMING_MAX = 3
_SIM_BANDS = 4  # pigeonhole: hamming<=3 ⇒ at least one of 4 bands equal


def _simhash_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per doc from md5-derived token hashes.

    Explode distinct tokens → 32 signed bit-votes aggregated per doc →
    majority bit. Explode+partial-agg keeps the shuffle at |doc|×32 ints.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.array_distinct(T.tokens("text"))).alias("token"))
    h = F.conv(F.substring(F.md5("token"), 1, 8), 16, 10).cast("long")
    votes = [
        F.sum(F.when(F.shiftright(h, j).bitwiseAND(1) == 1, 1).otherwise(-1)).alias(f"v{j}")
        for j in range(_SIMHASH_BITS)
    ]
    voted = tok.groupBy("doc_id").agg(*votes)
    simhash = None
    for j in range(_SIMHASH_BITS):
        term = F.when(F.col(f"v{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        simhash = term if simhash is None else simhash + term
    return voted.select("doc_id", simhash.cast("long").alias("simhash"))


def _duck_simhash_cte() -> str:
    votes = ", ".join(
        f"SUM(CASE WHEN (h // {1 << j}) % 2 = 1 THEN 1 ELSE -1 END) AS v{j}"
        for j in range(_SIMHASH_BITS)
    )
    combine = " + ".join(
        f"(CASE WHEN v{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(_SIMHASH_BITS)
    )
    return f"""
    tok AS (
      SELECT doc_id, UNNEST(list_distinct({_DUCK_TOKENS})) AS token FROM documents),
    hashed AS (
      SELECT doc_id, ('0x' || substr(md5(token), 1, 8))::BIGINT AS h FROM tok),
    voted AS (
      SELECT doc_id, {votes} FROM hashed GROUP BY doc_id),
    sim AS (
      SELECT doc_id, ({combine})::BIGINT AS simhash FROM voted)
    """


@register(
    "dedup_simhash",
    oracle=f"""
    WITH {_duck_simhash_cte()}
    SELECT doc_id, simhash FROM sim ORDER BY doc_id
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc 32-bit SimHash (md5 bit votes) — cross-engine deterministic."""
    return _simhash_df(spark, sf_dir).orderBy("doc_id")


@register(
    "simhash_near_pairs",
    oracle=f"""
    WITH {_duck_simhash_cte()}
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM sim a JOIN sim b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {_HAMMING_MAX}
    ORDER BY doc_a, doc_b
    """,
)
def simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (hamming <= 3) via pigeonhole banding.

    Split the 32-bit hash into 4 bytes; any pair within hamming 3 must agree
    on >= 1 byte, so candidates come from an equi self-join on (band, byte) —
    never the O(n²) cross join the oracle (correctly, but unscalably) runs.
    """
    sim = _simhash_df(spark, sf_dir)
    bands = sim.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("b"),
                        F.shiftright("simhash", 8 * b).bitwiseAND(0xFF).alias("chunk"),
                    )
                    for b in range(_SIM_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "simhash", "band.b", "band.chunk")

    cand = (
        bands.alias("x")
        .join(
            bands.alias("y"),
            (F.col("x.b") == F.col("y.b"))
            & (F.col("x.chunk") == F.col("y.chunk"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.col("x.simhash").alias("sim_a"),
            F.col("y.simhash").alias("sim_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        cand.filter(hamming <= _HAMMING_MAX)
        .select("doc_a", "doc_b", hamming.cast("int").alias("hamming"))
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup
# ---------------------------------------------------------------------------

@register(
    "embedding_near_pairs",
    oracle="""
    WITH v AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
    pairs AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label_a, b.label AS label_b,
             list_sum(list_transform(range(1, len(a.e) + 1), i -> a.e[i] * b.e[i]))
               / (sqrt(list_sum(list_transform(a.e, x -> x * x)))
                  * sqrt(list_sum(list_transform(b.e, x -> x * x)))) AS cos
      FROM v a JOIN v b ON a.vec_id < b.vec_id)
    SELECT vec_a, vec_b, label_a, label_b, ROUND(cos, 4) AS cosine
    FROM pairs
    WHERE ROUND(cos, 4) >= 0.45
    ORDER BY vec_a, vec_b
    """,
)
def embedding_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: cosine >= 0.45, expression-only math.

    Dot and norms are sequential index-order folds in BOTH engines, so the
    doubles agree bit-for-bit and the rounded threshold can't flip. This
    all-pairs form is the oracle shape; the similarity module holds the
    blocked/LSH variants used at real scale.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("e")
    )
    a = emb.select(
        F.col("vec_id").alias("vec_a"), F.col("label").alias("label_a"), F.col("e").alias("ea")
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"), F.col("label").alias("label_b"), F.col("e").alias("eb")
    )

    def _dot(x: Column, y: Column) -> Column:
        return F.aggregate(F.zip_with(x, y, lambda p, q: p * q), F.lit(0.0), lambda acc, v: acc + v)

    def _norm(x: Column) -> Column:
        return F.sqrt(F.aggregate(F.transform(x, lambda p: p * p), F.lit(0.0), lambda acc, v: acc + v))

    cos = F.round(_dot(F.col("ea"), F.col("eb")) / (_norm(F.col("ea")) * _norm(F.col("eb"))), 4)
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= 0.45)
        .select("vec_a", "vec_b", "label_a", "label_b", "cosine")
        .orderBy("vec_a", "vec_b")
    )


# ---------------------------------------------------------------------------
# Winnowing (rolling-hash) document fingerprints
# ---------------------------------------------------------------------------

GRAM_CHARS = 8     # char k-gram size
WINNOW_WINDOW = 16  # grams per winnowing window


@register(
    "winnowing_fingerprints",
    oracle=f"""
    WITH norm AS (
      SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS s
      FROM documents),
    grams AS (
      SELECT doc_id,
             list_transform(range(1, greatest(length(s) - {GRAM_CHARS - 1}, 1) + 1),
                            i -> md5(substr(s, i::INT, {GRAM_CHARS}))) AS gs
      FROM norm),
    winnowed AS (
      SELECT doc_id, gs,
             list_sort(list_distinct(
               list_transform(range(1, greatest(len(gs) - {WINNOW_WINDOW - 1}, 1) + 1),
                              w -> list_min(list_slice(gs, w::INT, w::INT + {WINNOW_WINDOW - 1})))
             )) AS fps
      FROM grams)
    SELECT doc_id,
           len(gs) AS n_grams,
           len(fps) AS n_fingerprints,
           md5(array_to_string(fps, '')) AS fp_digest
    FROM winnowed
    ORDER BY doc_id
    """,
)
def winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (MOSS-style rolling-hash selection):
    hash every char {GRAM_CHARS}-gram, slide a {WINNOW_WINDOW}-gram window,
    keep each window's minimum hash — the classic guarantee that any match
    of length >= window+gram-1 chars shares at least one fingerprint.

    Expression-only (sequence/transform/slice/array_min stay JVM-side), so
    the fingerprint pass is a map-only scan: no shuffle at all until
    fingerprints are joined for plagiarism/near-dup candidate generation.
    The md5 rolling hash is shared verbatim with the DuckDB oracle.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    s = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    # Explode gram positions to rows so the md5s and the windowed min run in
    # whole-stage codegen / a window operator — the interpreted
    # transform/slice/array_min formulation is ~10× slower (same lesson as
    # the MinHash signature pass above).
    normed = docs.select(
        "doc_id",
        s.alias("s"),
        F.greatest(F.length(s) - (GRAM_CHARS - 1), F.lit(1)).alias("n_grams"),
    )
    grams = normed.select(
        "doc_id",
        "n_grams",
        F.explode(F.sequence(F.lit(1), F.col("n_grams"))).alias("i"),
        "s",
    ).select(
        "doc_id", "n_grams", "i", F.md5(F.substring(F.col("s"), F.col("i"), GRAM_CHARS)).alias("gh")
    )
    # window w covers grams [w, w+WINDOW-1]; the frame clips at partition end
    # exactly like list_slice clamps, so short docs degenerate identically.
    frame = (
        Window.partitionBy("doc_id")
        .orderBy("i")
        .rowsBetween(Window.currentRow, WINNOW_WINDOW - 1)
    )
    mins = grams.withColumn("wm", F.min("gh").over(frame)).filter(
        F.col("i") <= F.greatest(F.col("n_grams") - (WINNOW_WINDOW - 1), F.lit(1))
    )
    return (
        mins.groupBy("doc_id", "n_grams")
        .agg(F.array_sort(F.collect_set("wm")).alias("fps"))
        .select(
            "doc_id",
            "n_grams",
            F.size("fps").alias("n_fingerprints"),
            F.md5(F.concat_ws("", "fps")).alias("fp_digest"),
        )
        .orderBy("doc_id")
    )
