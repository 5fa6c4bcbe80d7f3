"""Distributed BPE tokenizer training (round-11 addition).

Byte-Pair Encoding merge learning (Sennrich, Haddow & Birch 2016,
"Neural Machine Translation of Rare Words with Subword Units", ACL —
the algorithm behind every GPT/LLaMA-family tokenizer) re-expressed for
Spark's execution model. The reference pipeline's tokenizer surface is
budget estimation only (``textstats.bpe_token_estimate``); this module
adds the TRAINING side a large-scale pipeline needs before a tokenizer
exists.

Scale design (the part that matters at 100 TB):

- The corpus-sized scan happens ONCE — ``word_freqs`` is a single
  tokenize+explode+groupBy producing the weighted word table. Classic
  BPE trains on (word, frequency), never on raw text, so every
  subsequent iteration touches a VOCABULARY-sized table (Heaps-law
  sublinear in the corpus), not the corpus.
- Each merge iteration is: (1) a map-side-combinable pair-count
  aggregation over the word table, (2) a 1-row TakeOrderedAndProject to
  pick the best pair (ties break on the pair string, so training is
  deterministic), (3) an Arrow-batched merge application over the word
  table. Driver state is ONE row per iteration — the merge itself.
- The word table is localCheckpointed every iteration: each step's
  symbols depend on the previous step, and without truncation the
  lineage (and the replayed pandas stages) would grow linearly with the
  merge count.
- Serving (``encode_with_merges``) broadcasts the learned merge ranks —
  a fixed-size published model, the same ship-the-model seam as
  ``fasttext_stream_model`` / ``dsir_stream_thresholds`` — and encodes
  map-only.

No DuckDB oracle: merge learning is argmax-then-rewrite iterative and
not SQL-expressible, so correctness is pinned by tests against an
independent pure-Python reference implementation of the published
algorithm (``tests/test_tokenizer.py``), the same stance as the
streaming operators.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.functions import pandas_udf

from input_data_pipeline_spark.functions import text as T

_END = "</w>"  # end-of-word marker, per the published algorithm


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq): the weighted training vocabulary — the ONLY
    corpus-sized aggregation in BPE training (map-side combinable)."""
    return (
        docs.select(F.explode(T.tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _initial_symbols(words: DataFrame) -> DataFrame:
    """(syms: array<string>, freq): each word split to characters plus the
    ``</w>`` marker — the starting segmentation."""
    return words.select(
        F.concat(
            F.split("word", ""),  # Spark splits to single chars
            F.array(F.lit(_END)),
        ).alias("syms"),
        "freq",
    )


def _merge_pair_udf(left: str, right: str):
    """Arrow-batched application of ONE merge to a symbol-array column:
    replace adjacent (left, right) with left+right, leftmost-first and
    non-overlapping (the published algorithm's scan order — 'aaa' under
    merge (a,a) becomes ('aa','a'))."""
    merged = left + right

    @pandas_udf("array<string>")
    def apply(col: pd.Series) -> pd.Series:
        out = []
        for syms in col:
            n = len(syms)
            res = []
            i = 0
            while i < n:
                if i + 1 < n and syms[i] == left and syms[i + 1] == right:
                    res.append(merged)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            out.append(res)
        return pd.Series(out)

    return apply


def train_bpe_merges(
    docs: DataFrame, n_merges: int, min_freq: int = 2
) -> list[tuple[str, str, int]]:
    """Learn up to ``n_merges`` BPE merges from a document corpus.

    Returns ``[(left, right, pair_freq), ...]`` in merge order. Training
    stops early when no remaining pair reaches ``min_freq`` (the
    published stopping rule). Ties on frequency break on the
    (left, right) pair ascending, making the result deterministic and
    partition-order independent.
    """
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    words = _initial_symbols(word_freqs(docs)).localCheckpoint()
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs = words.select(
            "freq",
            F.explode(
                F.zip_with(
                    F.slice(
                        "syms", 1, F.greatest(F.size("syms") - 1, F.lit(0))
                    ),
                    F.slice(
                        "syms", 2, F.greatest(F.size("syms") - 1, F.lit(0))
                    ),
                    lambda a, b: F.struct(
                        a.alias("left"), b.alias("right")
                    ),
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy("p.left", "p.right")
            .agg(F.sum("freq").alias("pf"))
            .orderBy(F.desc("pf"), "left", "right")
            .limit(1)  # TakeOrderedAndProject: never a global sort
            .collect()
        )
        if not best or best[0]["pf"] < min_freq:
            break
        left, right, pf = best[0]["left"], best[0]["right"], best[0]["pf"]
        merges.append((left, right, pf))
        words = words.withColumn(
            "syms", _merge_pair_udf(left, right)(F.col("syms"))
        ).localCheckpoint()  # truncate per-iteration lineage
    return merges


def encode_with_merges(
    docs: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """Serving path: tokenize ``text_col`` and segment every word with the
    learned merges (applied in rank order — the published greedy
    encoder). Appends ``bpe_tokens array<string>`` and ``n_bpe_tokens``.

    Map-only: the merge table broadcasts (fixed-size published model)
    and each Arrow batch encodes independently — no shuffle at any
    corpus size."""
    ranks = {(m[0], m[1]): i for i, m in enumerate(merges)}
    sc = docs.sparkSession.sparkContext
    bc = sc.broadcast(ranks)

    @pandas_udf("array<string>")
    def encode(col: pd.Series) -> pd.Series:
        rk = bc.value

        def seg(word: str) -> list[str]:
            syms = list(word) + [_END]
            while len(syms) > 1:
                cand = [
                    (rk[(a, b)], i)
                    for i, (a, b) in enumerate(zip(syms, syms[1:]))
                    if (a, b) in rk
                ]
                if not cand:
                    break
                _, i = min(cand)
                a, b = syms[i], syms[i + 1]
                res, i, n = [], 0, len(syms)
                while i < n:
                    if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                        res.append(a + b)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                syms = res
            return syms

        out = []
        for toks in col:
            enc: list[str] = []
            for w in toks:
                enc.extend(seg(w))
            out.append(enc)
        return pd.Series(out)

    prefix = "_bpe"
    while any(c.startswith(prefix) for c in docs.columns):
        prefix += "_x"
    toks_col = f"{prefix}_toks"
    return (
        docs.withColumn(toks_col, T.tokens(text_col))
        .withColumn("bpe_tokens", encode(F.col(toks_col)))
        .withColumn("n_bpe_tokens", F.size("bpe_tokens"))
        .drop(toks_col)
    )


# ---------------------------------------------------------------------------
# Fixed-model BPE encoding under the differential oracle gate
# ---------------------------------------------------------------------------

# A PUBLISHED merge table (the serving regime: the tokenizer model is a
# shipped artifact, not re-trained per query). The four merges are chosen
# letter-disjoint and non-chaining — no merged token can participate in a
# later pair, and no two pairs share a character — which makes the greedy
# encoder's subword count CLOSED-FORM: each pair contributes exactly its
# left-to-right non-overlapping occurrence count, expressible in SQL as
# (len(w) - len(replace(w, pair, ''))) / 2. Any encoder defect (rank
# order, overlap scan, end-marker handling) breaks the equality.
BPE_FIXED_MERGES: list[tuple[str, str]] = [
    ("t", "h"),
    ("e", _END),
    ("a", "n"),
    ("o", "r"),
]

_BPE_CNT_SQL = " + ".join(
    f"(length(w) - length(replace(w, '{a}{b}', ''))) // 2"
    for a, b in BPE_FIXED_MERGES
    if b != _END
)
_BPE_END_SQL = " + ".join(
    f"CASE WHEN w LIKE '%{a}' THEN 1 ELSE 0 END"
    for a, b in BPE_FIXED_MERGES
    if b == _END
)


def _register_bpe_query() -> None:
    from input_data_pipeline_spark.functions.text import DUCK_TOKENS
    from input_data_pipeline_spark.plans.registry import register
    from input_data_pipeline_spark.tables import load_table

    @register(
        "bpe_encode_fixed",
        oracle=f"""
        WITH words AS (
          SELECT doc_id, UNNEST({DUCK_TOKENS}) AS w FROM documents)
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(length(w) + 1
                        - ({_BPE_CNT_SQL})
                        - ({_BPE_END_SQL})) AS BIGINT) AS n_bpe_tokens
        FROM words GROUP BY doc_id ORDER BY doc_id
        """,
    )
    def bpe_encode_fixed(spark, sf_dir):
        """The REAL BPE greedy encoder under the differential oracle gate:
        every document is segmented with the published
        ``BPE_FIXED_MERGES`` table through :func:`encode_with_merges`
        (broadcast ranks, Arrow-batched rank-order merging — the exact
        serving path a shipped tokenizer runs at 100 TB), and per-doc
        token/subword counts are emitted. Because the fixed merges are
        letter-disjoint and non-chaining, the oracle recomputes the
        subword count from pure string arithmetic — per word,
        ``len + 1 - sum(non-overlapping pair occurrences) - (1 if the
        end-of-word merge fires)`` — so a defect anywhere in the greedy
        loop (rank order, leftmost-first scan, ``</w>`` handling) breaks
        the hash. Map-only: tokenize + encode + per-doc count, no
        shuffle before the output sort. The TRAINED path
        (:func:`train_bpe_merges`) stays test-gated against the
        independent reference implementation — argmax iteration is not
        SQL-expressible."""
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        enc = encode_with_merges(docs, BPE_FIXED_MERGES)
        return (
            enc.select(
                "doc_id",
                F.size(T.tokens("text")).cast("long").alias("n_tokens"),
                F.col("n_bpe_tokens").cast("long").alias("n_bpe_tokens"),
            )
            .orderBy("doc_id")
        )


_register_bpe_query()
