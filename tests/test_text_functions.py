"""Unit tests for functions/text.py column expressions."""

from __future__ import annotations

import pyspark.sql.functions as F

from input_data_pipeline_spark.functions import text as T


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_youtube_id_patterns(spark):
    cases = {
        "https://www.youtube.com/watch?v=dQw4w9WgXcQ": "dQw4w9WgXcQ",
        "https://youtu.be/abc123DEF45?t=9": "abc123DEF45",
        "https://www.youtube.com/embed/zyx987WVU65": "zyx987WVU65",
        "https://www.youtube.com/shorts/qwe456RTY78": "qwe456RTY78",
        "dQw4w9WgXcQ": "dQw4w9WgXcQ",
        "  dQw4w9WgXcQ  ": "dQw4w9WgXcQ",  # reference trims first
        "https://example.com/": None,
        "short": None,
    }
    for url, expected in cases.items():
        assert _one(spark, T.youtube_id(F.lit(url))) == expected, url


def test_sentences_split_and_filter(spark):
    got = _one(spark, T.sentences(F.lit("One. Two!  Three? four")))
    assert got == ["One.", "Two!", "Three? four"] or got == ["One.", "Two!", "Three?", "four"]
    # lookbehind split keeps the punctuation attached to the left sentence
    assert got[0] == "One."
    assert _one(spark, T.sentences(F.lit("   "))) == []


def test_preview_truncation(spark):
    assert _one(spark, T.preview(F.lit("x" * 150))) == "x" * 100 + "..."
    assert _one(spark, T.preview(F.lit("short"))) == "short"


def test_content_id_deterministic(spark):
    a = _one(spark, T.content_id(F.lit("hello world"), "doc"))
    b = _one(spark, T.content_id(F.lit("hello world"), "doc"))
    assert a == b and a.startswith("doc_") and len(a) == 4 + 12


def test_tokens_and_counts(spark):
    assert _one(spark, T.tokens(F.lit("  a  b\tc "))) == ["a", "b", "c"]
    assert _one(spark, T.token_count(F.lit("one two three"))) == 3
    assert _one(spark, T.token_count(F.lit(""))) == 0


def test_word_shingles(spark):
    got = _one(spark, T.word_shingles(F.lit("a b c d"), 3))
    assert got == ["a b c", "b c d"]
    # short doc → one whole-text shingle
    assert _one(spark, T.word_shingles(F.lit("a b"), 3)) == ["a b"]


def test_stopword_ratio_bounds(spark):
    assert _one(spark, T.stopword_ratio(F.lit("the cat"), "en")) == 0.5
    assert _one(spark, T.stopword_ratio(F.lit(""), "en")) == 0.0


def test_bigram_lm_scores_tiny_corpus(spark, tmp_path):
    """Hand-computed bigram LM on a 4-doc corpus with empty/single-token
    edge docs (which must drop out — they have no bigram to score)."""
    from input_data_pipeline_spark.operators.textstats import bigram_lm_doc_scores

    rows = [
        (0, "a b a b", "en", "s", 7),
        (1, "a", "en", "s", 1),
        (2, "", "en", "s", 0),
        (3, "b c", "en", "s", 3),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    got = sorted(tuple(r) for r in bigram_lm_doc_scores(spark, str(tmp_path)).collect())
    # instances: ab, ba, ab, bc -> c2: ab=2 ba=1 bc=1; c1: a=2 b=2
    # p_ppm: ab=1000000, ba=500000, bc=500000
    # doc0: (2*1000000 + 1*500000) // 3 = 833333 ; doc3: 500000
    assert got == [(0, "en", 3, 833333), (3, "en", 1, 500000)]


def test_encoding_audit_flags_planted_hygiene_issues(spark, tmp_path):
    """Planted control char, U+FFFD mojibake, CJK text, and a clean doc:
    the audit must count each exactly once and get the non-ASCII ppm
    right (CJK chars are 1 char each in both engines' length())."""
    from input_data_pipeline_spark.operators.textstats import text_encoding_audit

    rows = [
        (0, "clean ascii text", "a", "en", 16),
        (1, "broken\x07bell", "a", "en", 12),
        (2, "moji�bake", "b", "en", 9),
        (3, "中文 text", "b", "zh", 7),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    got = {r.source: r for r in text_encoding_audit(spark, str(tmp_path)).collect()}
    a, b = got["a"], got["b"]
    assert (a.n_docs, a.n_with_ctrl, a.n_with_replchar, a.n_with_cjk) == (2, 1, 0, 0)
    assert a.non_ascii_ppm == 0
    assert (b.n_docs, b.n_with_ctrl, b.n_with_replchar, b.n_with_cjk) == (2, 0, 1, 1)
    # source b: texts "moji?bake" (9 chars, 1 non-ascii) + "中文 text" (7 chars,
    # 2 non-ascii) -> 3/16 of the chars
    assert b.non_ascii_ppm == 3 * 1_000_000 // 16
