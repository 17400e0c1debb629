"""Invariant tests for the round-8 operator batch — semantic
properties the oracle-parity hash check cannot express (LPA against a
plain-Python replica, IVFADC cell-membership structure, audio frame
features against the closed-form waveform, crossing-pair laws of the
fuzzy decontaminator)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dfs_w_mapreduce_spark.catalog import load_table


def test_label_prop_matches_python_replica(spark, sf_dir):
    """The distributed synchronous LPA must compute EXACTLY the same
    label trajectory as a from-scratch Python replica of the contract:
    label0 = node id; each round, most frequent neighbor label, ties
    to the smallest label."""
    from dfs_w_mapreduce_spark.operators.analytics import (
        LPA_ITERS,
        q_graph_label_prop,
    )

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    rows = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select("o_custkey", "l_partkey")
        .distinct()
        .collect()
    )
    adj: dict[str, list[str]] = {}
    for r in rows:
        a, b = f"c{r.o_custkey}", f"p{r.l_partkey}"
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    labels = {n: n for n in adj}
    for _ in range(LPA_ITERS):
        nxt = {}
        for n, nbrs in adj.items():
            counts: dict[str, int] = {}
            for m in nbrs:
                lab = labels[m]
                counts[lab] = counts.get(lab, 0) + 1
            # most frequent, ties -> smallest label
            nxt[n] = min(counts, key=lambda lab: (-counts[lab], lab))
        labels = nxt
    sizes: dict[str, int] = {}
    for lab in labels.values():
        sizes[lab] = sizes.get(lab, 0) + 1
    expect = {(n, lab, sizes[lab]) for n, lab in labels.items()}
    got = {
        (r.node, r.community, r.community_size)
        for r in q_graph_label_prop(spark, sf_dir).collect()
    }
    assert got == expect


def test_ivfpq_structure(spark, sf_dir):
    """Every reported neighbor must live in one of its query's probed
    cells (the inverted-file contract), ranks must be 1..K with
    nondecreasing ADC distance, and no query may be its own
    neighbor."""
    from decimal import ROUND_HALF_UP, Decimal

    from dfs_w_mapreduce_spark.operators.similarity import (
        N_CENTROIDS_MOD,
        N_PROBE,
        N_QUERIES,
        TOP_K,
        _vecs,
        q_knn_ivfpq,
    )

    vecs = {
        r.vec_id: r.v for r in _vecs(spark, sf_dir).select("vec_id", "v").collect()
    }
    cents = sorted(c for c in vecs if c % N_CENTROIDS_MOD == 0)

    def d2_6(x, y):
        # mirror the query's left-fold + HALF_UP 6-dp round exactly
        xx = xy = yy = 0.0
        for a, b in zip(x, y):
            xx += a * a
            xy += a * b
            yy += b * b
        return Decimal(repr(xx + yy - 2 * xy)).quantize(
            Decimal("0.000001"), rounding=ROUND_HALF_UP
        )

    assign: dict[int, list[int]] = {}
    for vid in vecs:
        ranked = sorted(cents, key=lambda c: (d2_6(vecs[vid], vecs[c]), c))
        assign[vid] = ranked
    member_list = {vid: assign[vid][0] for vid in vecs}
    probed = {q: set(assign[q][:N_PROBE]) for q in vecs if q < N_QUERIES}

    out = q_knn_ivfpq(spark, sf_dir).collect()
    by_q: dict[int, list] = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) <= set(probed)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rk)
        assert [r.rk for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= TOP_K
        d2s = [r.approx_d2 for r in rs]
        assert d2s == sorted(d2s)
        for r in rs:
            assert r.neighbor_id != q
            # the IVF contract: candidates come from probed cells only
            assert member_list[r.neighbor_id] in probed[q]


def test_audio_frames_match_closed_form(spark, sf_dir):
    """Frame features computed from the REAL decoded bytes must equal
    the closed-form waveform recomputation, row by row."""
    from dfs_w_mapreduce_spark.operators.multimodal import (
        AUDIO_FRAME,
        _wav_sample,
        q_multimodal_audio_frames,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars").collect()
    expect = {}
    for r in d:
        doc_id, n_chars = int(r.doc_id), int(r.n_chars)
        nv = (n_chars % 1000 + 1) * (1 + doc_id % 2)
        s = [_wav_sample(doc_id, i) for i in range(nv)]
        nf = math.ceil(nv / AUDIO_FRAME)
        fsq = [
            sum(x * x for x in s[f * AUDIO_FRAME : (f + 1) * AUDIO_FRAME])
            for f in range(nf)
        ]
        zcr = sum(
            1
            for i in range(1, nv)
            if i % AUDIO_FRAME != 0 and (s[i] >= 0) != (s[i - 1] >= 0)
        )
        mi = max(range(nf), key=lambda f: (fsq[f], -f))
        expect[doc_id] = (nf, zcr, fsq[mi], mi)
    got = {
        r.doc_id: (r.n_frames, r.total_zcr, r.max_frame_sq, r.max_frame_idx)
        for r in q_multimodal_audio_frames(spark, sf_dir).collect()
    }
    assert got == expect


def test_decontaminate_minhash_laws(spark, sf_dir):
    """Crossing-pair laws: corpus side is never a benchmark doc, the
    benchmark side always is, and every reported max_jaccard equals
    the exact shingle-set Jaccard recomputed in Python (and clears the
    threshold)."""
    from dfs_w_mapreduce_spark.operators.dedup import _doc_shingles
    from dfs_w_mapreduce_spark.operators.pipeline import (
        DECON_MINHASH_MOD,
        DECON_MINHASH_T,
        q_decontaminate_minhash,
    )

    sh = {
        r.doc_id: set(r.sh) for r in _doc_shingles(spark, sf_dir).collect()
    }
    out = q_decontaminate_minhash(spark, sf_dir).collect()
    for r in out:
        assert r.corpus_id % DECON_MINHASH_MOD != 0
        assert r.bench_id % DECON_MINHASH_MOD == 0
        assert r.n_hits >= 1
        a, b = sh[r.corpus_id], sh[r.bench_id]
        jac = round(len(a & b) / (len(a) + len(b) - len(a & b)), 4)
        assert jac == r.max_jaccard
        assert r.max_jaccard >= DECON_MINHASH_T


def test_hilbert_matches_python_replica(spark, sf_dir):
    """The unrolled in-engine Hilbert walk must agree with the classic
    xy2d reference exactly, bucket report included."""
    from dfs_w_mapreduce_spark.operators.layout import (
        ZBITS,
        ZBUCKET_SHIFT,
        q_hilbert_layout,
    )

    def xy2d(x, y):
        d = 0
        s = 1 << (ZBITS - 1)
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * (3 * rx + ry * (1 - 2 * rx))
            if ry == 0:
                if rx == 1:
                    x = s - 1 - x
                    y = s - 1 - y
                x, y = y, x
            s //= 2
        return d

    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    rows = li.collect()
    pmin = min(r.l_partkey for r in rows); pmax = max(r.l_partkey for r in rows)
    smin = min(r.l_suppkey for r in rows); smax = max(r.l_suppkey for r in rows)
    buckets: dict[int, list] = {}
    for r in rows:
        x = (r.l_partkey - pmin) * (1 << ZBITS) // (pmax - pmin + 1)
        y = (r.l_suppkey - smin) * (1 << ZBITS) // (smax - smin + 1)
        buckets.setdefault(xy2d(x, y) >> ZBUCKET_SHIFT, []).append((x, y))
    expect = {
        b: (
            len(pts),
            min(x for x, _ in pts), max(x for x, _ in pts),
            min(y for _, y in pts), max(y for _, y in pts),
        )
        for b, pts in buckets.items()
    }
    got = {
        r.bucket: (r.n_rows, r.min_x, r.max_x, r.min_y, r.max_y)
        for r in q_hilbert_layout(spark, sf_dir).collect()
    }
    assert got == expect
    # sanity: the curve is a bijection on the visited cells
    seen = {}
    for b, pts in buckets.items():
        for x, y in pts:
            d = xy2d(x, y)
            assert seen.setdefault(d, (x, y)) == (x, y)


def test_postings_build_matches_python_replica(spark, sf_dir):
    """Posting lists, delta gaps, varint byte accounting, and the
    stream fingerprint must equal a from-scratch Python index build."""
    import hashlib

    from dfs_w_mapreduce_spark.operators.text_analysis import q_postings_build

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    tf: dict[str, dict[int, int]] = {}
    for r in d:
        for t in (r.text or "").lower().split():
            tf.setdefault(t, {}).setdefault(int(r.doc_id), 0)
            tf[t][int(r.doc_id)] += 1
    expect = {}
    for term, posting in tf.items():
        docs = sorted(posting)
        gaps = [docs[0]] + [b - a for a, b in zip(docs, docs[1:])]
        varint = sum(1 if g < 128 else 2 if g < 16384 else 3 if g < 1 << 21 else 4
                     for g in gaps)
        stream = ",".join(f"{g}:{posting[doc]}" for g, doc in zip(gaps, docs))
        expect[term] = (
            len(docs), sum(posting.values()), docs[0], varint,
            8 * len(docs) - varint,
            hashlib.md5(stream.encode()).hexdigest(),
        )
    got = {
        r.term: (r.df, r.cf, r.first_doc, r.varint_bytes, r.bytes_saved,
                 r.postings_fp)
        for r in q_postings_build(spark, sf_dir).collect()
    }
    assert got == expect


def test_pca_power_matches_unquantized_replica(spark, sf_dir):
    """The quantized in-engine power iteration must land within
    rounding distance of the same 5-round iteration run unquantized in
    numpy (per-round drift is ~1e-8), and the loading must be unit
    norm up to the 8-dp rounding."""
    import numpy as np

    from dfs_w_mapreduce_spark.operators.similarity import (
        PCA_ROUNDS,
        q_embedding_pca_power,
    )

    e = load_table(spark, sf_dir, "embeddings").select("embedding").collect()
    X = np.array([r.embedding for r in e], dtype=np.float64)
    C = np.cov(X, rowvar=False, bias=True)
    v = np.full(X.shape[1], 0.125)
    lam = 0.0
    for _ in range(PCA_ROUNDS):
        w = C @ v
        lam = float(np.sqrt(w @ w))
        v = w / lam
    out = sorted(q_embedding_pca_power(spark, sf_dir).collect(),
                 key=lambda r: r.pos)
    loading = np.array([r.loading for r in out])
    assert abs(np.linalg.norm(loading) - 1.0) < 1e-6
    assert abs(float(np.dot(loading, v))) > 0.9999
    assert abs(out[0].eigenvalue - lam) / lam < 1e-4


def test_coreset_greedy_law(spark, sf_dir):
    """Coverage radius must be non-increasing, ranks 1..K, picks
    distinct, and each reported radius must equal (to rounding) the
    true max-min distance to the chosen prefix recomputed in numpy."""
    import numpy as np

    from dfs_w_mapreduce_spark.operators.similarity import (
        CORESET_K,
        q_sample_coreset,
    )

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in e])
    X = np.array([r.embedding for r in e], dtype=np.float64)
    out = sorted(q_sample_coreset(spark, sf_dir).collect(), key=lambda r: r.sel_rank)
    assert [r.sel_rank for r in out] == list(range(1, CORESET_K + 1))
    assert len({r.vec_id for r in out}) == CORESET_K
    radii = [r.radius for r in out]
    assert radii == sorted(radii, reverse=True)
    assert out[0].vec_id == int(ids.min())
    by_id = {int(i): X[k] for k, i in enumerate(ids)}
    chosen = []
    for r in out:
        chosen.append(by_id[r.vec_id])
        C = np.array(chosen)
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2).min(axis=1)
        assert abs(d2.max() - r.radius) < 1e-4


def test_kmv_set_ops_laws(spark, sf_dir):
    """The exact-calibration column must equal a Python recomputation
    of per-pair token Jaccard, and the sketch algebra must obey
    inter <= union and jaccard in [0, 1]."""
    from dfs_w_mapreduce_spark.operators.sketches import q_kmv_set_ops

    d = load_table(spark, sf_dir, "documents").select("source", "text").collect()
    toks: dict[str, set] = {}
    for r in d:
        ws = (r.text or "").lower().split()
        if ws:  # the query's source set comes from hh (>=1 token)
            toks.setdefault(r.source, set()).update(ws)
    out = q_kmv_set_ops(spark, sf_dir).collect()
    assert len(out) == len(toks) * (len(toks) - 1) // 2
    for r in out:
        a, b = toks[r.src_a], toks[r.src_b]
        exact = round(len(a & b) / len(a | b), 4)
        assert abs(r.jaccard_exact - exact) < 1e-9
        assert 0 <= r.inter_est <= r.union_est
        assert 0.0 <= r.jaccard_est <= 1.0


def test_abtt_removes_anisotropy(spark, sf_dir):
    """Projecting out the top component must collapse the mean |cos|
    to near zero in every label group, and the before column must
    match a numpy recomputation against the query's own component."""
    import numpy as np

    from dfs_w_mapreduce_spark.operators.similarity import (
        q_embedding_abtt,
        q_embedding_pca_power,
    )

    v = np.array([
        r.loading
        for r in sorted(q_embedding_pca_power(spark, sf_dir).collect(),
                        key=lambda r: r.pos)
    ])
    e = load_table(spark, sf_dir, "embeddings").select("label", "embedding").collect()
    by_label: dict[str, list[float]] = {}
    for r in e:
        x = np.array(r.embedding, dtype=np.float64)
        nrm = np.linalg.norm(x)
        if nrm > 0:
            by_label.setdefault(r.label, []).append(
                abs(round(float(x @ v), 8)) / nrm
            )
    out = {r.label: r for r in q_embedding_abtt(spark, sf_dir).collect()}
    assert set(out) == set(by_label)
    for lab, vals in by_label.items():
        assert abs(out[lab].mean_cos_before - np.mean([round(c, 8) for c in vals])) < 1e-4
        assert out[lab].mean_cos_after < 1e-4
        assert out[lab].mean_cos_before > out[lab].mean_cos_after


def test_plan_pick_sides(spark, sf_dir):
    """The cost model must put the fixture corpus on the dense side
    and the Zipf corpus on the skewed side of the boundary."""
    from dfs_w_mapreduce_spark.operators.text_analysis import (
        TFIDF_DENSE_FRAC,
        q_tfidf_plan_pick,
    )

    out = {r.corpus: r for r in q_tfidf_plan_pick(spark, sf_dir).collect()}
    assert out["fixture"].plan == "inverted-index"
    assert out["fixture"].mean_df_frac > TFIDF_DENSE_FRAC
    assert out["zipf"].plan == "prefix-allpairs"
    assert out["zipf"].mean_df_frac < TFIDF_DENSE_FRAC


def test_readability_matches_python_replica(spark, sf_dir):
    """Per-source FRE report vs a from-scratch Python replica of the
    documented heuristic contract."""
    import re

    from dfs_w_mapreduce_spark.operators.text_analysis import (
        FRE_EASY,
        q_text_readability,
    )

    d = load_table(spark, sf_dir, "documents").select("source", "text").collect()
    per: dict[str, list[float]] = {}
    for r in d:
        t = r.text or ""
        w = len([x for x in re.split(r"\s+", t) if x])
        if w == 0:
            continue
        s = max(1, len(re.findall(r"[.!?]+", t)))
        syl = len(re.findall(r"[aeiouy]+", t.lower()))
        per.setdefault(r.source, []).append(
            round(206.835 - 1.015 * w / s - 84.6 * syl / w, 4)
        )
    out = {r.source: r for r in q_text_readability(spark, sf_dir).collect()}
    assert set(out) == set(per)
    for src, fres in per.items():
        scaled = sum(int(round(f * 10000)) for f in fres)
        assert abs(out[src].mean_fre - round(scaled / 10000 / len(fres), 4)) < 1e-9
        assert out[src].n_docs == len(fres)
        easy = sum(1 for f in fres if f >= FRE_EASY)
        assert abs(out[src].easy_frac - round(easy / len(fres), 4)) < 1e-9
