"""Invariant tests for the round-9 batch — properties the oracle-parity
hash check cannot express: the posting-cap candidate bound actually
engages (and preserves rare-shingle recall) on a synthetic hot-shingle
corpus, Python replicas of the paragraph-canonicalization and
within-doc repetition signals, and the exact integer-log2 identity the
audio filterbank's oracle relies on.
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np

from dfs_w_mapreduce_spark.catalog import load_table


def _toks(text: str) -> list[str]:
    return [t for t in re.split(r"\s+", text, flags=re.ASCII) if t]


def _shingles(text: str) -> set[str]:
    w = _toks(text)
    return {f"{a} {b}" for a, b in zip(w, w[1:])}


# ------------------------------------------------------ posting cap


def test_posting_cap_bounds_hot_shingle_fanout(spark, monkeypatch):
    """A boilerplate shingle shared by many docs must contribute at
    most cap^2/2 candidate pairs, while pairs that ALSO share rare
    shingles keep their exact jaccard. Build a corpus where one
    shingle spans every doc (df = 40 >> cap = 8) and two docs are
    genuine near-dups through rare shingles."""
    from dfs_w_mapreduce_spark.operators import dedup as D

    monkeypatch.setattr(D, "NGRAM_POSTING_CAP", 8)
    docs = [(i, f"hot boiler x{i} y{i} z{i} w{i}") for i in range(40)]
    # docs 100/101: near-dups sharing rare shingles plus the hot one
    docs += [
        (100, "hot boiler alpha beta gamma delta"),
        (101, "hot boiler alpha beta gamma delta epsilon"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    sh = D._shingles_of(df)
    common, sizes = D._capped_common_counts(spark, sh, sf_dir=None)
    pairs = {(r.doc_a, r.doc_b): r.common for r in common.collect()}
    # candidate mass is bounded by the cap, not df^2: the hot shingle
    # alone could emit C(41,2) = 820 pairs uncapped; capped, pairs
    # without any rare link can only arise among its 8 kept docs
    assert len(pairs) <= (8 * 7) // 2 + 2, len(pairs)
    # the genuine near-dup pair survives with its EXACT common count
    a, b = _shingles(docs[-2][1]), _shingles(docs[-1][1])
    assert pairs[(100, 101)] == len(a & b)


def test_capped_counts_equal_uncapped_when_cap_exceeds_df(spark, sf_dir):
    """At fixture scale (max shingle df 47 at sf0.001 < cap 512) the
    capped core must be bit-identical to the uncapped join."""
    from dfs_w_mapreduce_spark.operators import dedup as D

    sh = D._doc_shingles(spark, sf_dir)
    capped, _ = D._capped_common_counts(spark, sh, sf_dir)
    uncapped, _ = D._common_shingle_counts(sh)
    got = {(r.doc_a, r.doc_b): r.common for r in capped.collect()}
    want = {(r.doc_a, r.doc_b): r.common for r in uncapped.collect()}
    assert got == want


# ------------------------------------------- paragraph canonicalization


def test_dedup_paragraph_matches_python_replica(spark, sf_dir):
    from dfs_w_mapreduce_spark.operators.text_analysis import (
        SEG_LEN,
        _SEG_KEY_SHIFT,
        q_dedup_paragraph,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    keeper: dict[str, int] = {}
    occs: list[tuple[int, int, str]] = []
    for r in docs:
        w = _toks(r.text)
        for si in range(0, (len(w) + SEG_LEN - 1) // SEG_LEN):
            seg = " ".join(w[si * SEG_LEN:(si + 1) * SEG_LEN])
            norm = " ".join(
                t for t in re.split(
                    r"\s+", re.sub(r"[^a-z0-9 ]", " ", seg.lower()), flags=re.ASCII
                ) if t
            )
            k = r.doc_id * _SEG_KEY_SHIFT + si
            occs.append((r.doc_id, k, norm))
            keeper[norm] = min(keeper.get(norm, k), k)
    expect: dict[int, tuple[int, int]] = {}
    for doc_id, k, norm in occs:
        n, d = expect.get(doc_id, (0, 0))
        expect[doc_id] = (n + 1, d + (1 if keeper[norm] != k else 0))
    got = {
        r.doc_id: (r.n_segs, r.n_dup_segs)
        for r in q_dedup_paragraph(spark, sf_dir).collect()
    }
    assert got == expect
    # the fixture must actually exercise the dedup (non-trivial signal)
    assert sum(d for _, d in expect.values()) > 0


# ------------------------------------------------ within-doc repetition


def test_quality_repeated_matches_python_replica(spark, sf_dir):
    from dfs_w_mapreduce_spark.operators.text_analysis import (
        REP_SEG_LEN,
        q_quality_repeated,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    expect = {}
    nonzero = 0
    for r in docs:
        w = _toks(r.text)
        segs = [
            " ".join(w[i * REP_SEG_LEN:(i + 1) * REP_SEG_LEN])
            for i in range(0, (len(w) + REP_SEG_LEN - 1) // REP_SEG_LEN)
        ]
        c = Counter(segs)
        n, d = len(segs), len(c)
        expect[r.doc_id] = (n, d)
        nonzero += n > d
    got = {
        r.doc_id: (r.n_segs, r.n_distinct_segs)
        for r in q_quality_repeated(spark, sf_dir).collect()
    }
    assert got == expect
    assert nonzero > 0  # the finer REP_SEG_LEN must yield real repeats


def test_quality_repeated_fraction_consistency(spark, sf_dir):
    from dfs_w_mapreduce_spark.operators.text_analysis import q_quality_repeated

    for r in q_quality_repeated(spark, sf_dir).collect():
        assert r.n_distinct_segs <= r.n_segs
        # engines round HALF_UP (1/32 -> 0.0313); Python round() is
        # HALF_EVEN, so compare with a half-ulp-of-4dp tolerance
        assert abs(
            r.dup_line_frac - (r.n_segs - r.n_distinct_segs) / r.n_segs
        ) <= 5.0001e-5
        assert 0.0 <= r.dup_char_frac <= 1.0
        assert r.keep == (r.dup_line_frac <= 0.30 and r.dup_char_frac <= 0.20)


# ------------------------------------------------------ audio filterbank


def test_audio_fbank_matches_python_replica(spark, sf_dir):
    """Recompute the filterbank features from the closed-form waveform
    with plain-int bit_length (no numpy, no frexp) — pins both the
    decode path and the exact-log2 identity the oracle uses."""
    from dfs_w_mapreduce_spark.operators.multimodal import (
        AUDIO_FRAME,
        q_multimodal_audio_fbank,
    )

    meta = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars").collect()
    expect = {}
    for r in meta:
        doc_id = r.doc_id
        nv = (r.n_chars % 1000 + 1) * (1 + doc_id % 2)
        v = [(doc_id * 7 + i * 13) % 4096 - 2048 for i in range(nv)]
        il = [0, 0, 0]
        dom = [0, 0, 0]
        for f0 in range(0, nv, AUDIO_FRAME):
            fr = v[f0:f0 + AUDIO_FRAME]
            dc = sum(fr)
            qc = sum(s * (1, 0, -1, 0)[(f0 + j) % 4] for j, s in enumerate(fr))
            qs = sum(s * (0, 1, 0, -1)[(f0 + j) % 4] for j, s in enumerate(fr))
            ny = sum(s * (1, -1)[(f0 + j) % 2] for j, s in enumerate(fr))
            e = (dc * dc, qc * qc + qs * qs, ny * ny)
            for bi in range(3):
                il[bi] += e[bi].bit_length()
            dom[max(range(3), key=lambda i: (e[i], -i))] += 1
        dominant = ("dc", "quarter", "nyquist")[max(range(3), key=lambda i: (dom[i], -i))]
        expect[doc_id] = (
            (nv + AUDIO_FRAME - 1) // AUDIO_FRAME, il[0], il[1], il[2],
            il[0] - il[2], il[0] - 2 * il[1] + il[2], dominant,
        )
    got = {
        r.doc_id: (
            r.n_frames, r.il_dc, r.il_quarter, r.il_nyquist,
            r.cep1, r.cep2, r.dominant,
        )
        for r in q_multimodal_audio_fbank(spark, sf_dir).collect()
    }
    assert got == expect


def test_frexp_exponent_is_bit_length():
    """The numpy shortcut the UDF uses must equal int.bit_length for
    every representable band energy (ints exact in float64)."""
    e = np.array([0, 1, 2, 3, 4, 255, 256, (1 << 39) - 1, 1 << 39], dtype=np.int64)
    got = np.where(e > 0, np.frexp(e.astype(np.float64))[1], 0)
    assert list(got) == [int(x).bit_length() for x in e]


# ------------------------------------------------- mimic hardening


def test_oracle_comparator_rejects_hugeint():
    """The round-8 escape: an uncast sum(BIGINT) oracle passes
    fetchall comparison but fails the driver's pandas hash. The
    comparator must now refuse HUGEINT results outright."""
    import duckdb
    import pytest

    from tests.conftest import assert_matches_oracle

    con = duckdb.connect()

    class FakeDF:  # minimal stand-in; must fail BEFORE any Spark use
        columns = ["s"]

        def collect(self):
            return [(1,)]

    with pytest.raises(AssertionError, match="HUGEINT"):
        assert_matches_oracle(
            FakeDF(), con, "SELECT sum(x) AS s FROM (SELECT CAST(1 AS BIGINT) AS x)"
        )
