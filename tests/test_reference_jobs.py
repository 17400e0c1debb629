"""Reference-fidelity unit tests: hand-computed golden outputs for the
two built-in jobs, exercising the exact byte-level semantics called out
in SURVEY.md §2.3-2.4 (whitespace runs, empty-token dropping, integer
division, '%' suffix)."""

from __future__ import annotations

from dfs_w_mapreduce_spark.jobs.question_pct import (
    parse_dialog,
    question_percentage,
    question_percentage_typed,
)
from dfs_w_mapreduce_spark.jobs.wordcount import wordcount


def _lines(spark, rows):
    return spark.createDataFrame([(r,) for r in rows], "value string")


def test_wordcount_golden(spark):
    lines = _lines(
        spark,
        [
            "the quick  brown\tfox",  # run of spaces + tab
            "",  # empty line -> no tokens (strings.Fields)
            "the the THE",  # case-sensitive counts
            "  leading and trailing  ",
            "punct, stays! as-is",
        ],
    )
    got = {(r.word, r.cnt) for r in wordcount(lines).collect()}
    assert got == {
        ("the", 3),
        ("quick", 1),
        ("brown", 1),
        ("fox", 1),
        ("THE", 1),
        ("leading", 1),
        ("and", 1),
        ("trailing", 1),
        ("punct,", 1),
        ("stays!", 1),
        ("as-is", 1),
    }


DIALOG = [
    # character u0 BIANCA: 1 of 3 questions -> 33% (integer division)
    "L1 +++$+++ u0 +++$+++ m0 +++$+++ BIANCA +++$+++ Can you help?",
    "L2 +++$+++ u0 +++$+++ m0 +++$+++ BIANCA +++$+++ No.",
    "L3 +++$+++ u0 +++$+++ m0 +++$+++ BIANCA +++$+++ Fine then.",
    # character u2 CAMERON: 0% (no questions)
    "L4 +++$+++ u2 +++$+++ m0 +++$+++ CAMERON +++$+++ Sure thing.",
    # character u3 JOEY: 100%, '?' mid-sentence counts
    "L5 +++$+++ u3 +++$+++ m1 +++$+++ JOEY +++$+++ what? now",
]


def test_question_percentage_golden(spark):
    got = {(r.character, r.pct) for r in question_percentage(_lines(spark, DIALOG)).collect()}
    assert got == {("u0 BIANCA", "33%"), ("u2 CAMERON", "0%"), ("u3 JOEY", "100%")}


def test_question_percentage_typed_golden(spark):
    got = {
        (r.character, r.pct)
        for r in question_percentage_typed(_lines(spark, DIALOG)).collect()
    }
    assert got == {("u0 BIANCA", 33), ("u2 CAMERON", 0), ("u3 JOEY", 100)}


def test_parse_dialog(spark):
    rows = parse_dialog(_lines(spark, DIALOG[:1])).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.line_id, r.character_id, r.movie_id, r.character_name, r.utterance) == (
        "L1",
        "u0",
        "m0",
        "BIANCA",
        "Can you help?",
    )
