"""Invariant tests for the round-11 batch — properties the
oracle-parity hash check cannot express: the audio fingerprint LOOKUP
matches a full pure-Python third-engine replica (decode -> peak ->
event hash -> vote -> argmax) built from the closed-form waveform; the
graph-ANN beam search only ever returns nodes reachable from the fixed
entry within the round budget; the domain ensemble and governance
rollups are consistent with independent recomputation; the image
corpus-out partitions the corpus exactly against the cluster keepers.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import pyspark.sql.functions as F

from dfs_w_mapreduce_spark.catalog import load_table
from dfs_w_mapreduce_spark.operators.multimodal import (
    AUDIO_FRAME,
    FP_FANOUT,
    FP_PROBE_MOD,
    FP_PROBE_RES,
    FP_SNIP_START,
)


def _fp_events(doc_id: int, n_chars: int, skip_frames: int):
    """Plain-Python replica of _audio_fp_events_builder on the
    closed-form waveform s(i) = (doc*7 + i*13) % 4096 - 2048."""
    ch = 1 + doc_id % 2
    nv = (n_chars % 1000 + 1) * ch
    v = [(doc_id * 7 + i * 13) % 4096 - 2048 for i in range(skip_frames * AUDIO_FRAME, nv)]
    if not v:
        return []
    nf = (len(v) + AUDIO_FRAME - 1) // AUDIO_FRAME
    dom, il = [], []
    for f in range(nf):
        fr = v[f * AUDIO_FRAME : (f + 1) * AUDIO_FRAME]
        dc = sum(fr)
        qc = sum(s * (1, 0, -1, 0)[i % 4] for i, s in enumerate(fr))
        qs = sum(s * (0, 1, 0, -1)[i % 4] for i, s in enumerate(fr))
        ny = sum(s * (1, -1)[i % 2] for i, s in enumerate(fr))
        e = [dc * dc, qc * qc + qs * qs, ny * ny]
        d = e.index(max(e))
        dom.append(d)
        il.append(int(e[d]).bit_length())
    evs = []
    for f in range(nf):
        for dt in range(1, FP_FANOUT + 1):
            if f + dt >= nf:
                break
            dil = max(-8, min(7, il[f] - il[f + dt]))
            base = ((dom[f] * 3 + dom[f + dt]) * 4 + dt) * 16 + dil + 8
            evs.append((base * 64 + min(il[f], 63), f))
    return evs


def _lookup_replica(docs):
    """Full vote/argmax replica over [(doc_id, n_chars)] rows,
    including the FP_INDEX_DOC_CAP posting-list cap (md5-lowest docs
    per hash, whole documents kept)."""
    import hashlib

    from dfs_w_mapreduce_spark.operators.multimodal import FP_INDEX_DOC_CAP

    index = defaultdict(list)  # fp_hash -> [(doc, anchor)]
    for doc_id, n_chars in docs:
        for h, a in _fp_events(doc_id, n_chars, 0):
            index[h].append((doc_id, a))
    for h, evs in index.items():
        kept = sorted(
            {d for d, _ in evs},
            key=lambda d: (hashlib.md5(str(d).encode()).hexdigest(), d),
        )[:FP_INDEX_DOC_CAP]
        keep = set(kept)
        index[h] = [(d, a) for d, a in evs if d in keep]
    out = {}
    for doc_id, n_chars in docs:
        if doc_id % FP_PROBE_MOD != FP_PROBE_RES:
            continue
        votes = Counter()
        for h, pa in _fp_events(doc_id, n_chars, FP_SNIP_START):
            for cand, ia in index[h]:
                votes[(cand, ia - pa)] += 1
        if not votes:
            continue
        best = min(votes.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (cand, off), n = best
        out[doc_id] = (cand, off, n, len({c for c, _ in votes}))
    return out


def test_audio_fp_lookup_matches_python_replica(spark, sf_dir):
    docs = [
        (r.doc_id, r.n_chars)
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "n_chars")
        .collect()
    ]
    expected = _lookup_replica(docs)
    from dfs_w_mapreduce_spark.operators.multimodal import (
        q_multimodal_audio_fp_lookup,
    )

    got = {
        r.probe_id: (r.match_id, r.match_offset, r.votes, r.n_cands)
        for r in q_multimodal_audio_fp_lookup(spark, sf_dir).collect()
    }
    assert got == expected
    # every probe's own snippet votes at offset FP_SNIP_START, so any
    # self-matching winner must sit exactly there
    for pid, (cand, off, _, _) in got.items():
        if cand == pid:
            assert off == FP_SNIP_START


def test_graph_search_stays_within_round_reachability(spark, sf_dir):
    """Beam search can only visit entry + GRAPH_SEARCH_ROUNDS hops of
    graph edges; every returned neighbor must be in that reachable
    set (and never the query itself, and ranked 1..K)."""
    from dfs_w_mapreduce_spark.operators.similarity import (
        GRAPH_SEARCH_ENTRY,
        GRAPH_SEARCH_ROUNDS,
        TOP_K,
        q_knn_graph,
        q_knn_graph_search,
    )

    adj = defaultdict(set)
    for r in q_knn_graph(spark, sf_dir).collect():
        adj[r.vec_id].add(r.neighbor_id)
    reach = {GRAPH_SEARCH_ENTRY}
    for _ in range(GRAPH_SEARCH_ROUNDS):
        reach |= {n for v in reach for n in adj[v]}
    rows = q_knn_graph_search(spark, sf_dir).collect()
    assert rows
    per_q = defaultdict(list)
    for r in rows:
        assert r.neighbor_id in reach
        assert r.neighbor_id != r.query_id
        per_q[r.query_id].append((r.rk, r.cosine, r.neighbor_id))
    for q, lst in per_q.items():
        lst.sort()
        assert [rk for rk, _, _ in lst] == list(range(1, len(lst) + 1))
        assert len(lst) <= TOP_K
        # rank order is cosine-desc with id tie-break
        for (rk1, c1, n1), (rk2, c2, n2) in zip(lst, lst[1:]):
            assert c1 > c2 or (c1 == c2 and n1 < n2)


def test_ann_recall_has_graph_row(spark, sf_dir):
    from dfs_w_mapreduce_spark.operators.similarity import q_ann_recall

    rows = {r.method: r for r in q_ann_recall(spark, sf_dir).collect()}
    assert set(rows) == {"lsh", "ivf", "pq", "graph"}
    g = rows["graph"]
    assert 0 <= g.n_hits <= g.n_total


def test_domain_ensemble_consistent_with_gopher(spark, sf_dir):
    """n_docs sums to the corpus, n_pass per domain equals an
    independent regroup of the shared verdict frame, and the keep
    flag equals its formula."""
    from dfs_w_mapreduce_spark.operators.corpus import (
        ENSEMBLE_MAX_DUP,
        ENSEMBLE_MIN_KEEP,
        q_quality_domain_ensemble,
    )
    from dfs_w_mapreduce_spark.operators.text_analysis import (
        gopher_verdict_frame,
    )

    d = load_table(spark, sf_dir, "documents")
    rows = q_quality_domain_ensemble(spark, sf_dir).collect()
    assert sum(r.n_docs for r in rows) == d.count()
    # independent regroup: source maps 1:1 onto registrable domain
    verd = {
        r.source: r.n_pass
        for r in gopher_verdict_frame(d)
        .groupBy("source")
        .agg(F.sum(F.col("verdict").cast("long")).alias("n_pass"))
        .collect()
    }
    for r in rows:
        src = r.domain.rsplit(".", 1)[0]
        assert verd[src] == r.n_pass
        assert r.domain_keep == (
            r.keep_rate >= ENSEMBLE_MIN_KEEP and r.dup_rate <= ENSEMBLE_MAX_DUP
        )


def test_governance_flags_partition_and_formula(spark, sf_dir):
    from dfs_w_mapreduce_spark.operators.corpus import (
        q_corpus_governance_flags,
    )

    d = load_table(spark, sf_dir, "documents")
    rows = q_corpus_governance_flags(spark, sf_dir).collect()
    assert sum(r.n_docs for r in rows) == d.count()
    exp_retainable = d.filter(
        (F.col("doc_id") % 7 <= 4) & (F.col("doc_id") % 11 != 3)
    ).count()
    assert sum(r.n_retainable for r in rows) == exp_retainable
    for r in rows:
        assert r.n_retainable <= r.n_docs
        if r.license in ("proprietary", "unknown"):
            assert r.n_retainable == 0 and r.n_words_retained == 0


def test_mix_doremi_eg_invariants(spark, sf_dir):
    """EG properties that must hold regardless of fixture: weights are
    a distribution (sum ~ 1), and with a uniform start each round
    multiplies every domain by exp(eta*L_d) times a shared
    normalizer — so the final weight is strictly increasing in the
    domain loss."""
    from dfs_w_mapreduce_spark.operators.pipeline import q_mix_doremi

    rows = q_mix_doremi(spark, sf_dir).collect()
    assert rows
    assert abs(sum(r.weight for r in rows) - 1.0) < 1e-6
    by_loss = sorted(rows, key=lambda r: r.loss)
    for a, b in zip(by_loss, by_loss[1:]):
        if a.loss < b.loss:
            assert a.weight < b.weight
    for r in rows:
        assert abs(r.boost - round(r.weight / r.ref_share, 4)) < 1e-9


def test_image_apply_partitions_corpus(spark, sf_dir):
    """kept(dedup_image_apply) == corpus - non-keepers(clusters), and
    every cluster keeper is kept."""
    from dfs_w_mapreduce_spark.operators.multimodal import (
        q_dedup_image_apply,
        q_dedup_image_clusters,
    )

    clusters = q_dedup_image_clusters(spark, sf_dir).collect()
    non_keepers = {r.doc_id for r in clusters if not r.is_keeper}
    keepers = {r.doc_id for r in clusters if r.is_keeper}
    all_ids = {
        r.doc_id
        for r in load_table(spark, sf_dir, "documents").select("doc_id").collect()
    }
    kept = {r.doc_id for r in q_dedup_image_apply(spark, sf_dir).collect()}
    assert kept == all_ids - non_keepers
    assert keepers <= kept
