"""Invariant tests for the round-7 operator batch — semantic
properties the oracle-parity hash check cannot express (perceptron
update law against a plain-Python replica, matryoshka recall
monotonicity, resize pixel provenance)."""

from __future__ import annotations

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
        tc = len([t for t in (r.text or "").split() if t])
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
