"""Distributed BPE training vs an independent reference implementation.

The trainer has no SQL oracle (argmax-then-rewrite iteration is not
SQL-expressible), so the differential gate is a pure-Python transcription
of the PUBLISHED algorithm (Sennrich et al. 2016, Figure 2) — written
dict-at-a-time with none of the engine's machinery, so a Spark-side slip
(pair weighting, tie-break, overlap handling, lineage bug across
checkpoints) cannot be mirrored here.
"""

from __future__ import annotations

import re

import pytest


def _ref_bpe(word_freq: dict[str, int], n_merges: int, min_freq: int = 2):
    """Reference BPE: greedy most-frequent adjacent pair, ties broken on
    the (left, right) pair ascending; leftmost-first non-overlapping
    application; stop under min_freq."""
    vocab: dict[tuple, int] = {}
    for w, f in word_freq.items():
        key = tuple(list(w) + ["</w>"])
        vocab[key] = vocab.get(key, 0) + f
    merges = []
    for _ in range(n_merges):
        pairs: dict[tuple, int] = {}
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + f
        if not pairs:
            break
        (a, b), pf = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if pf < min_freq:
            break
        merges.append((a, b, pf))
        new: dict[tuple, int] = {}
        for syms, f in vocab.items():
            res, i, n = [], 0, len(syms)
            while i < n:
                if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            key = tuple(res)
            new[key] = new.get(key, 0) + f
        vocab = new
    return merges


def _corpus_word_freq(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("text")
        .collect()
    )
    wf: dict[str, int] = {}
    for r in rows:
        for w in re.split(r"\s+", r.text):
            if w:
                wf[w] = wf.get(w, 0) + 1
    return wf


def test_train_bpe_merges_match_reference(spark):
    """Every learned merge (pair AND frequency AND order) equals the
    reference algorithm's on the real sf0.001 corpus."""
    from input_data_pipeline_spark.operators.tokenizer import (
        train_bpe_merges,
    )

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    got = train_bpe_merges(docs, n_merges=16)
    want = _ref_bpe(_corpus_word_freq(spark, sf), n_merges=16)
    assert got == want
    assert len(got) == 16  # the corpus supports at least 16 merges
    # frequencies are non-increasing only within equal segmentations is
    # NOT guaranteed by BPE; but every accepted merge met the floor
    assert all(pf >= 2 for _, _, pf in got)


def test_train_bpe_overlap_and_tiebreak_semantics(spark):
    """Planted corpus pinning the two subtle rules: 'aaa' under merge
    (a,a) yields ('aa','a') — leftmost-first, non-overlapping — and
    frequency ties break on the pair string ascending."""
    from input_data_pipeline_spark.operators.tokenizer import (
        train_bpe_merges,
    )

    docs = spark.createDataFrame(
        [("aaa aaa", ), ("bc bc", )],
        "text string",
    )
    # pair counts round 1: (a,a) appears 2x per 'aaa' (overlapping counted
    # per adjacency) * 2 docs? -> zip counts adjacencies: 'aaa</w>' has
    # (a,a),(a,a),(a,</w>): (a,a)=4 total; (b,c)=2, (c,</w>)=2, (a,</w>)=2
    got = train_bpe_merges(docs, n_merges=2)
    want = _ref_bpe({"aaa": 2, "bc": 2}, n_merges=2)
    assert got == want
    assert got[0][:2] == ("a", "a") and got[0][2] == 4
    # after merging: 'aa','a','</w>' -> next best is a tie between
    # ('a','</w>')=2, ('aa','a')=2, ('b','c')=2, ('c','</w>')=2 ->
    # lexicographic pair order picks ('a','</w>')
    assert got[1][:2] == ("a", "</w>")


def test_encode_with_merges_roundtrip_and_reference(spark):
    """The serving encoder: concatenating a doc's bpe_tokens (markers
    stripped) reproduces its whitespace-joined tokens exactly, and each
    word's segmentation equals an independent greedy rank-order encode."""
    from input_data_pipeline_spark.operators.tokenizer import (
        encode_with_merges,
        train_bpe_merges,
    )

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    merges = train_bpe_merges(docs, n_merges=12)
    ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}

    def ref_seg(word):
        syms = list(word) + ["</w>"]
        while len(syms) > 1:
            cand = [
                (ranks[p], i)
                for i, p in enumerate(zip(syms, syms[1:]))
                if p in ranks
            ]
            if not cand:
                break
            _, i = min(cand)
            a, b = syms[i], syms[i + 1]
            res, j, n = [], 0, len(syms)
            while j < n:
                if j + 1 < n and syms[j] == a and syms[j + 1] == b:
                    res.append(a + b)
                    j += 2
                else:
                    res.append(syms[j])
                    j += 1
            syms = res
        return syms

    out = encode_with_merges(docs.limit(8), merges).collect()
    assert out
    for r in out:
        toks = [w for w in re.split(r"\s+", r.text) if w]
        assert r.n_bpe_tokens == len(r.bpe_tokens)
        # lossless: strip markers, concatenation reproduces the text's tokens
        assert "".join(r.bpe_tokens).replace("</w>", "") == "".join(toks)
        # word-by-word equality with the reference greedy encoder
        want = [s for w in toks for s in ref_seg(w)]
        assert r.bpe_tokens == want


def test_encode_with_merges_is_collision_safe_and_validates(spark):
    from input_data_pipeline_spark.operators.tokenizer import (
        encode_with_merges,
        train_bpe_merges,
    )

    with pytest.raises(ValueError, match="n_merges"):
        train_bpe_merges(spark.createDataFrame([("x",)], "text string"), 0)

    df = spark.createDataFrame(
        [("aa ab", "keep")], "text string, _bpe_toks string"
    )
    out = encode_with_merges(df, [("a", "a", 2)])
    row = out.collect()[0]
    assert row["_bpe_toks"] == "keep"
    assert row.bpe_tokens == ["aa", "</w>", "a", "b", "</w>"]


def test_bpe_encode_fixed_closed_form_on_planted_words(spark, tmp_path):
    """The fixed-merge subword count equals the closed form on words
    chosen to stress each rule: chained letters ('tthh' merges ONCE),
    repeated non-overlapping pairs ('ththt' merges twice... per the
    leftmost scan), the end-of-word merge, and merge-free words."""
    import pandas as pd

    from input_data_pipeline_spark.plans.registry import get

    words = {
        # word: expected subword count for merges th, e</w>, an, or
        "tthh": 4 + 1 - 1,      # t th h </w>
        "ththt": 5 + 1 - 2,     # th th t </w>
        "the": 3 + 1 - 1 - 1,   # th e</w>
        "order": 5 + 1 - 1 - 0, # or d e r </w> ('e' not terminal)
        "anor": 4 + 1 - 2,      # an or </w>
        "xyz": 3 + 1,           # no merges
        "e": 1 + 1 - 1,         # e</w>
    }
    pd.DataFrame(
        {
            "doc_id": range(len(words)),
            "text": list(words),
            "lang": "en",
            "source": "s",
            "n_chars": [len(w) for w in words],
        }
    ).to_parquet(tmp_path / "documents.parquet", index=False)

    rows = {r.doc_id: r for r in get("bpe_encode_fixed").fn(spark, str(tmp_path)).collect()}
    for i, (w, want) in enumerate(words.items()):
        assert rows[i].n_tokens == 1
        assert rows[i].n_bpe_tokens == want, (w, rows[i].n_bpe_tokens, want)


def test_encode_with_merges_works_on_a_stream(spark, tmp_path):
    """The greedy encoder is stateless map-only, so the SAME call works
    unchanged on an unbounded stream (the ingest-time tokenize-count
    pattern) and its tags match the batch encode bit-for-bit."""
    import shutil

    from input_data_pipeline_spark.operators.tokenizer import (
        BPE_FIXED_MERGES,
        encode_with_merges,
    )
    from input_data_pipeline_spark.streaming.pipelines import run_to_memory

    sf = "/root/testdata/sf0.001"
    src = tmp_path / "docs"
    src.mkdir()
    shutil.copy(f"{sf}/documents.parquet", src / "part-0.parquet")
    sdf = spark.readStream.schema(
        "doc_id long, text string, lang string, source string, n_chars long"
    ).parquet(str(src))

    name = "bpestream_tags"
    q = run_to_memory(
        encode_with_merges(sdf, BPE_FIXED_MERGES).select(
            "doc_id", "n_bpe_tokens"
        ),
        name,
    )
    try:
        q.processAllAvailable()
        got = {r.doc_id: r.n_bpe_tokens for r in spark.table(name).collect()}
    finally:
        q.stop()

    batch = {
        r.doc_id: r.n_bpe_tokens
        for r in encode_with_merges(
            spark.read.parquet(f"{sf}/documents.parquet"), BPE_FIXED_MERGES
        ).collect()
    }
    assert batch and got == batch


# ---------------------------------------------------------------------------
# Unigram-LM trainer vs an independent reference implementation (round 12)
# ---------------------------------------------------------------------------


def _ref_viterbi(word, logp, unk, max_len):
    """Reference DP, written backwards (suffix-first) so a shared
    off-by-one with the engine's prefix-first DP cannot cancel out."""
    n = len(word)
    best = {n: (0.0, 0, [])}

    def at(i):
        if i in best:
            return best[i]
        cand = None
        for l in range(1, min(max_len, n - i) + 1):
            piece = word[i : i + l]
            lp = logp.get(piece)
            if lp is None:
                if l != 1:
                    continue
                lp = unk
            tail = at(i + l)
            c = (lp + tail[0], 1 + tail[1], [piece] + tail[2])
            if (
                cand is None
                or c[0] > cand[0]
                or (c[0] == cand[0] and c[1] < cand[1])
                or (c[0] == cand[0] and c[1] == cand[1] and c[2] < cand[2])
            ):
                cand = c
        best[i] = cand
        return cand

    return at(0)[2]


def _ref_unigram(
    word_freq: dict[str, int],
    vocab_size: int,
    seed_size: int,
    max_len: int = 4,
    shrink: float = 0.25,
    em_iters: int = 2,
    max_rounds: int = 20,
):
    """Reference unigram-LM trainer: seed substring counts, hard-EM
    Viterbi counting, shrink-fraction pruning with (count DESC, piece
    ASC) ranks, single characters never pruned."""
    import math

    subs: dict[str, int] = {}
    for w, f in word_freq.items():
        for l in range(1, max_len + 1):
            for i in range(len(w) - l + 1):
                p = w[i : i + l]
                subs[p] = subs.get(p, 0) + f
    chars = {p for p in subs if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in subs.items() if len(p) > 1),
        key=lambda pc: (-pc[1], pc[0]),
    )[:seed_size]
    pieces = dict(multi)
    for ch in chars:
        pieces[ch] = subs[ch]

    def logps(tbl):
        total = sum(tbl.values())
        return (
            {p: math.log(c) - math.log(total) for p, c in tbl.items() if c > 0},
            -math.log(total) - math.log(total),
        )

    for _ in range(max_rounds):
        for _ in range(em_iters):
            lp, unk = logps(pieces)
            counts: dict[str, int] = {}
            for w, f in word_freq.items():
                for piece in _ref_viterbi(w, lp, unk, max_len):
                    counts[piece] = counts.get(piece, 0) + f
            pieces = {p: c for p, c in counts.items() if len(p) > 1 and c > 0}
            for ch in chars:
                pieces[ch] = max(counts.get(ch, 0), 1)
        n_multi = sum(1 for p in pieces if len(p) > 1)
        target_multi = max(vocab_size - len(chars), 0)
        if len(pieces) <= vocab_size or n_multi <= target_multi:
            break
        keep = max(int(n_multi * (1.0 - shrink)), target_multi)
        ranked = sorted(
            ((p, c) for p, c in pieces.items() if len(p) > 1),
            key=lambda pc: (-pc[1], pc[0]),
        )
        pieces = {p: c for p, c in ranked[:keep]}
        for ch in chars:
            pieces[ch] = max(pieces.get(ch, 0), 1)
    ranked = sorted(
        ((p, c) for p, c in pieces.items() if len(p) > 1),
        key=lambda pc: (-pc[1], pc[0]),
    )[: max(vocab_size - len(chars), 0)]
    final = dict(ranked)
    for ch in chars:
        final[ch] = pieces.get(ch, 1)
    return sorted(final.items(), key=lambda pc: (-pc[1], pc[0]))


def test_unigram_trainer_matches_reference_on_real_corpus(spark, sf_dir):
    """Piece-for-piece, count-for-count equality between the distributed
    trainer and the independent reference on the sf0.001 corpus."""
    from input_data_pipeline_spark.operators.tokenizer import train_unigram

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    wf = _corpus_word_freq(spark, sf_dir)
    got = train_unigram(docs, vocab_size=120, seed_size=300)
    want = _ref_unigram(wf, vocab_size=120, seed_size=300)
    assert got == want


def test_unigram_encode_is_lossless_and_planted_piece_wins(spark):
    """A planted high-frequency string becomes a vocabulary piece; every
    encoded word reassembles to its source text."""
    from input_data_pipeline_spark.operators.tokenizer import (
        encode_with_unigram,
        train_unigram,
    )

    rows = [(i, ("wxyz qq " * 5) + f"tail{i % 3}") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    vocab = train_unigram(docs, vocab_size=30, seed_size=80)
    pieces = dict(vocab)
    assert "wxyz" in pieces  # the planted 4-char string survives pruning
    enc = encode_with_unigram(docs, vocab).collect()
    for r in enc:
        words = r.text.split()
        rebuilt, cur = [], ""
        it = iter(r.unigram_tokens)
        for w in words:
            cur = ""
            while cur != w:
                cur += next(it)
            rebuilt.append(cur)
        assert rebuilt == words
        assert next(it, None) is None


def test_unigram_viterbi_unk_and_tiebreak():
    """Unknown characters segment as themselves at the UNK score; equal
    scores prefer fewer pieces, then the lexicographically smaller
    sequence."""
    import math

    from input_data_pipeline_spark.operators.tokenizer import (
        _viterbi_segment,
    )

    lp = {"ab": math.log(0.25), "a": math.log(0.25), "b": math.log(0.25)}
    # score("ab") = log .25 beats score(a)+score(b) = 2 log .25
    assert _viterbi_segment("ab", lp, -50.0, 4) == ["ab"]
    # unknown char ⇒ UNK fallback keeps the DP total
    assert _viterbi_segment("a§b", lp, -50.0, 4) == ["a", "§", "b"]
    # tie: {"aa": p} vs {"a": p}: "aaa" → ("aa","a") and ("a","aa") tie on
    # score and length; lexicographic prefers ("a","aa")
    lp2 = {"aa": math.log(0.5), "a": math.log(0.5)}
    assert _viterbi_segment("aaa", lp2, -50.0, 4) == ["a", "aa"]


def test_merge_apply_plan_is_jvm_only(spark):
    """Round-18 optimization contract: applying a merge to the symbol
    table is a pure-Catalyst aggregate fold — no Python-eval node ships
    the vocabulary-sized column across the JVM/Python boundary in the
    training loop (guide section 4.1)."""
    import pyspark.sql.functions as F

    from input_data_pipeline_spark.operators.tokenizer import (
        _initial_symbols,
        _merge_pair_expr,
    )

    words = _initial_symbols(
        spark.createDataFrame(
            [("aaa", 3), ("aab", 2)], "word string, freq long"
        )
    )
    stepped = words.withColumn(
        "syms", _merge_pair_expr("a", "a", F.col("syms"))
    )
    plan = stepped._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "MapInPandas" not in plan
    # the fold replays the published leftmost-first non-overlap scan
    got = {tuple(r["syms"]) for r in stepped.collect()}
    assert ("aa", "a", "</w>") in got and ("aa", "b", "</w>") in got
