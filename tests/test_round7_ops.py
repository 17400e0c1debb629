"""Invariant tests for the round-7 operator batch — semantic
properties the oracle-parity hash check cannot express (perceptron
update law against a plain-Python replica, matryoshka recall
monotonicity, resize pixel provenance)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from dfs_w_mapreduce_spark.catalog import load_table
from dfs_w_mapreduce_spark.operators.pipeline import (
    PERCEPTRON_ROUNDS,
    q_quality_perceptron,
)


def test_perceptron_matches_python_replica(spark, sf_dir):
    """The distributed batch perceptron must compute EXACTLY the same
    integer weight trajectory as a from-scratch Python replica over
    the collected features — round 1 must mark every doc misclassified
    (w=0 => y*0 <= 0), and each round's update must equal the sum of
    y*x over the entering misclassified set."""
    d = load_table(spark, sf_dir, "documents")
    rows = d.select("lang", "text", "n_chars").collect()
    feats = []
    for r in rows:
        y = 1 if r.lang == "en" else -1
        # mirror the query's Java-regex split(text, '\\s+') exactly:
        # ASCII whitespace only (str.split() would also break on
        # Unicode spaces like NBSP and could diverge on such fixtures)
        tc = len([t for t in re.split(r"\s+", r.text or "", flags=re.ASCII) if t])
        feats.append((y, 1, tc, int(r.n_chars)))

    w = [0, 0, 0]
    expect = []
    for k in range(1, PERCEPTRON_ROUNDS + 1):
        mis = [(y, b, tc, nc) for (y, b, tc, nc) in feats
               if y * (w[0] * b + w[1] * tc + w[2] * nc) <= 0]
        w = [
            w[0] + sum(y * b for y, b, tc, nc in mis),
            w[1] + sum(y * tc for y, b, tc, nc in mis),
            w[2] + sum(y * nc for y, b, tc, nc in mis),
        ]
        expect.append((k, len(mis), w[0], w[1], w[2]))

    got = [
        (r.round, r.n_mis, r.w_bias, r.w_tokens, r.w_chars)
        for r in q_quality_perceptron(spark, sf_dir).orderBy("round").collect()
    ]
    assert got == expect
    assert got[0][1] == len(feats)  # round 1: everything misclassified


def test_matryoshka_recall_monotone(spark, sf_dir):
    """More prefix dimensions can only help: recall@K must be
    nondecreasing in the truncation dim, every hit count must fit the
    Q*K budget, and n_total must equal the exact top-K mass."""
    from dfs_w_mapreduce_spark.operators.similarity import (
        MATRYOSHKA_DIMS,
        N_QUERIES,
        TOP_K,
        q_embedding_matryoshka,
        q_knn_bruteforce,
    )

    rows = {r.dim: r for r in q_embedding_matryoshka(spark, sf_dir).collect()}
    assert set(rows) == set(MATRYOSHKA_DIMS)
    n_total = q_knn_bruteforce(spark, sf_dir).count()
    recalls = []
    for d in MATRYOSHKA_DIMS:
        r = rows[d]
        assert r.n_total == n_total
        assert 0 <= r.n_hits <= min(n_total, N_QUERIES * TOP_K)
        recalls.append(r.recall)
    # monotone up to sampling jitter (random fixture coords: a longer
    # prefix is a strictly better estimator of the full cosine)
    for lo, hi in zip(recalls, recalls[1:]):
        assert hi >= lo - 0.02, f"recall not ~monotone: {recalls}"
    assert recalls[-1] > recalls[0], f"no truncation signal: {recalls}"


def test_semdedup_matches_python_replica(spark, sf_dir):
    """SemDeDup's min-keeper rule against a from-scratch replica over
    the collected Lloyd assignment: per-cluster drop counts and kept
    fingerprints must match exactly, and the lowest vec_id of every
    cluster can never be dropped (nothing below it exists). The
    replica mirrors the query's sequential-fold dot product so the
    6-dp rounding boundary is bit-identical."""
    from dfs_w_mapreduce_spark.operators.similarity import (
        SEMDEDUP_T,
        _lloyd_final,
        q_semdedup_prune,
    )

    final = _lloyd_final(spark, sf_dir)
    assert final is not None
    members = final.select("cid", "vec_id", "v").collect()
    by_cluster: dict = {}
    for r in members:
        by_cluster.setdefault(r.cid, []).append((r.vec_id, r.v))

    def dot(x, y):
        acc = 0.0
        for p, q in zip(x, y):
            acc = acc + p * q  # same left fold as the query's _dot
        return acc

    expect = {}
    for cid, ms in by_cluster.items():
        ms.sort()
        nrm = {vid: dot(v, v) ** 0.5 for vid, v in ms}
        dropped = set()
        for i, (va, xa) in enumerate(ms):
            for vb, xb in ms[:i]:
                if round(dot(xa, xb) / (nrm[va] * nrm[vb]), 6) >= SEMDEDUP_T:
                    dropped.add(va)
                    break
        kept_sum = sum(vid for vid, _ in ms if vid not in dropped)
        assert ms[0][0] not in dropped  # min member is always a keeper
        expect[cid] = (len(ms), len(dropped), kept_sum)

    got = {
        r.cluster: (r.n_members, r.n_dropped, r.kept_id_sum)
        for r in q_semdedup_prune(spark, sf_dir).collect()
    }
    assert got == expect


def test_dedup_agreement_consistency(spark, sf_dir):
    """The agreement matrix must be exactly the Venn decomposition of
    the three member pair sets — recomputed here from the individual
    queries — and the exact ground-truth pairs must be dominated by
    the minhash column (the S-curve's >=0.7-recall config)."""
    from collections import Counter

    from dfs_w_mapreduce_spark.operators import dedup as D

    ex = {(r.doc_a, r.doc_b) for r in D.q_dedup_ngram_pairs(spark, sf_dir).collect()}
    mh = {(r.doc_a, r.doc_b) for r in D.q_dedup_minhash_pairs(spark, sf_dir).collect()}
    sh = {(r.doc_a, r.doc_b) for r in D.q_dedup_simhash_pairs(spark, sf_dir).collect()}
    # each method's per-pair verdict is doc-local, so the sampled
    # table must equal the full member sets restricted to the sample
    from dfs_w_mapreduce_spark.catalog import load_table
    from pyspark.sql import functions as F

    d = load_table(spark, sf_dir, "documents")
    hh = D._h31_spark(F.col("doc_id").cast("string"))
    ids = {
        r.doc_id
        for r in d.select("doc_id", hh.alias("hh"))
        .orderBy("hh", "doc_id")
        .limit(D.AGREEMENT_SAMPLE)
        .collect()
    }
    keep = lambda s: {p for p in s if p[0] in ids and p[1] in ids}  # noqa: E731
    ex, mh, sh = keep(ex), keep(mh), keep(sh)
    want = Counter(
        (p in ex) + 2 * (p in mh) + 4 * (p in sh) for p in ex | mh | sh
    )
    got = {r.mask: r.n_pairs for r in D.q_dedup_agreement(spark, sf_dir).collect()}
    assert got == dict(want)
    if ex:
        hit = sum(n for m, n in got.items() if (m & 1) and (m & 2))
        assert hit / len(ex) >= 0.7


def test_resize_nn_identity_and_mapping():
    """resize_nn at the source size must reproduce the decoded buffer
    exactly (floor mapping is the identity there), and a genuine
    downscale must pick exactly the floor-mapped source pixels —
    checked against the pixel generator's closed form on a non-square
    image (a transposed or off-by-one mapping fails these probes)."""
    from dfs_w_mapreduce_spark.operators.multimodal import (
        build_png,
        decode_png_pixels,
        resize_nn,
    )

    doc_id, w, h = 1234, 10, 6
    png = build_png(w, h, doc_id)
    _, _, px = decode_png_pixels(png)
    assert resize_nn(png, w, h) == px  # identity at native size

    tw, th = 4, 4
    thumb = resize_nn(png, tw, th)
    assert len(thumb) == tw * th * 3
    for i in range(th):
        for j in range(tw):
            sx, sy = j * w // tw, i * h // th
            o = (i * tw + j) * 3
            assert thumb[o] == (doc_id + sx) % 256
            assert thumb[o + 1] == (doc_id + sy) % 256
            assert thumb[o + 2] == (sx + sy) % 256
