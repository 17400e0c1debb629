"""Property-based tests (Hypothesis): the Spark operators vs
pure-Python reference implementations on randomized inputs — catching
edge cases the fixture tables can't (empty strings, exotic
whitespace, unicode, negative/boundary numbers)."""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from dfs_w_mapreduce_spark.jobs.question_pct import question_percentage
from dfs_w_mapreduce_spark.jobs.wordcount import wordcount

SET = settings(max_examples=8, deadline=None)

line_st = st.text(
    alphabet=st.sampled_from(list("ab?! \t.éX9")), min_size=0, max_size=30
)


@given(lines=st.lists(line_st, min_size=1, max_size=20))
@SET
def test_wordcount_matches_python_oracle(spark, lines):
    """Spark wordcount == Go strings.Fields semantics, reimplemented
    in Python (str.split() also drops empty fields)."""
    want = Counter(w for line in lines for w in line.split())
    df = spark.createDataFrame([(l,) for l in lines], "value string")
    got = {(r.word, r.cnt) for r in wordcount(df).collect()}
    assert got == set(want.items())


utter_st = st.text(alphabet=st.sampled_from(list("abc? .")), min_size=0, max_size=15)


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), utter_st), min_size=1, max_size=25
    )
)
@SET
def test_question_pct_matches_python_oracle(spark, rows):
    """Integer-division percentage fidelity on random dialogs
    (reference questionpercentagejob.go:54: (totalQ*100)/total)."""
    lines = [
        f"L{i} +++$+++ u{cid} +++$+++ m0 +++$+++ NAME{cid} +++$+++ {utt}"
        for i, (cid, utt) in enumerate(rows)
    ]
    agg: dict[str, list[int]] = {}
    for cid, utt in rows:
        k = f"u{cid} NAME{cid}"
        q = 1 if "?" in utt else 0
        tot_q, tot = agg.get(k, [0, 0])
        agg[k] = [tot_q + q, tot + 1]
    want = {(k, f"{(tq * 100) // t}%") for k, (tq, t) in agg.items()}
    df = spark.createDataFrame([(l,) for l in lines], "value string")
    got = {(r.character, r.pct) for r in question_percentage(df).collect()}
    assert got == want


@given(
    kvs=st.lists(
        st.tuples(st.sampled_from(["hot", "a", "b"]), st.integers(0, 99)),
        min_size=1,
        max_size=30,
    )
)
@SET
def test_group_values_matches_python(spark, kvs):
    from dfs_w_mapreduce_spark.operators.mapreduce import group_values

    df = spark.createDataFrame([(k, str(v)) for k, v in kvs], "key string, value string")
    want: dict[str, list[str]] = {}
    for k, v in kvs:
        want.setdefault(k, []).append(str(v))
    want_set = {(k, tuple(sorted(vs))) for k, vs in want.items()}
    got = {(r.key, tuple(r.values)) for r in group_values(df).collect()}
    assert got == want_set


@given(
    texts=st.lists(
        st.text(alphabet=st.sampled_from(list("ab c")), min_size=0, max_size=20),
        min_size=1,
        max_size=10,
    )
)
@SET
def test_shingles_match_python(spark, texts):
    """zip_with shingle builder == python 2-gram reference."""
    from dfs_w_mapreduce_spark.operators.dedup import _shingles_from_tokens

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    toks = F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != F.lit(""))
    out = df.select(
        "text", _shingles_from_tokens(toks).alias("sh")
    ).collect()
    for r in out:
        w = r.text.split()
        want = list(dict.fromkeys(f"{w[i]} {w[i+1]}" for i in range(len(w) - 1)))
        assert list(r.sh) == want, (r.text, list(r.sh), want)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=15), min_size=1, max_size=800)
)
def test_gif_lzw_roundtrip_property(seq):
    """LZW encode->decode is the identity for arbitrary 4-bit index
    streams (the GIF min-code-size-4 case), across the width-bump and
    KwKwK regimes hypothesis will wander into."""
    from dfs_w_mapreduce_spark.operators.multimodal import (
        _lzw_decode,
        _lzw_encode,
    )

    assert _lzw_decode(_lzw_encode(seq, 4), 4) == seq
