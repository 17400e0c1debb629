"""Invariant tests for the round-6 operator batch — semantic
properties the oracle-parity hash check cannot express (CDC
reassembly, A-ES weight bias, diff conservation, decontamination
containment)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dfs_w_mapreduce_spark.catalog import load_table
from dfs_w_mapreduce_spark.operators.admin import q_table_diff
from dfs_w_mapreduce_spark.operators.dedup import CDC_DIV, CDC_W
from dfs_w_mapreduce_spark.operators.pipeline import (
    SAMPLE_W_K,
    q_sample_weighted,
)
from dfs_w_mapreduce_spark.operators.similarity import (
    SEMDECON_MOD,
    SEMDECON_T,
    banded_pair_scores,
    q_decontaminate_semantic,
)


def test_cdc_chunks_reassemble_exactly(spark, sf_dir):
    """The CDC chunk arrays must concatenate back to the exact
    document — the property that makes the chunking a valid STORE
    layout rather than a sketch. Also: every non-final chunk ends at
    a content-defined boundary, so chunk lengths are >= 1."""
    d = load_table(spark, sf_dir, "documents")
    ends = d.select(
        "doc_id",
        "text",
        F.expr(
            f"""
            array_sort(array_distinct(concat(
              transform(
                filter(
                  CASE WHEN length(text) >= {CDC_W}
                       THEN sequence(1, length(text) - {CDC_W} + 1)
                       ELSE CAST(array() AS ARRAY<INT>) END,
                  i -> CAST(conv(substr(md5(substr(text, i, {CDC_W})), 1, 15),
                                 16, 10) AS BIGINT) % {CDC_DIV} = 0),
                i -> i + {CDC_W} - 1),
              array(length(text)))))
            """
        ).alias("e"),
    )
    rebuilt = ends.select(
        "doc_id",
        "text",
        F.expr(
            """
            concat_ws('', transform(sequence(1, size(e)),
              j -> substr(text,
                          (CASE WHEN j = 1 THEN 0 ELSE element_at(e, j - 1) END) + 1,
                          element_at(e, j)
                          - (CASE WHEN j = 1 THEN 0 ELSE element_at(e, j - 1) END))))
            """
        ).alias("rebuilt"),
    )
    assert rebuilt.filter(F.col("rebuilt") != F.col("text")).count() == 0


def test_sample_weighted_shape_and_bias(spark, sf_dir):
    """Exactly K rows, ranks 1..K, and the weighted sample must skew
    long: the mean n_chars of the sample exceeds the corpus mean
    (A-ES with weight = n_chars favors token mass)."""
    rows = q_sample_weighted(spark, sf_dir).collect()
    assert len(rows) == SAMPLE_W_K
    assert sorted(r.rank for r in rows) == list(range(1, SAMPLE_W_K + 1))
    sample_mean = sum(r.n_chars for r in rows) / len(rows)
    corpus_mean = (
        load_table(spark, sf_dir, "documents")
        .agg(F.avg("n_chars"))
        .collect()[0][0]
    )
    assert sample_mean > corpus_mean


def test_table_diff_counts_conserve(spark, sf_dir):
    """Status counts must reconcile with the deterministic version
    derivation: total rows = |base UNION new| keys; added = keys in
    new only (doc_id%10==7 kept in new, ... ) — checked via direct
    recomputation on the fixture."""
    d = load_table(spark, sf_dir, "documents")
    n = {r["status"]: r["n"] for r in
         q_table_diff(spark, sf_dir).groupBy("status").agg(F.sum("n").alias("n")).collect()}
    tot = d.count()
    by_mod = {m: d.filter(F.col("doc_id") % 10 == m).count() for m in (3, 4, 7)}
    assert n.get("added", 0) == by_mod[7]      # only-in-new keys
    assert n.get("removed", 0) == by_mod[4]    # only-in-base keys
    assert n.get("changed", 0) == by_mod[3]
    assert sum(n.values()) == tot - 0  # every key classified once


def test_bpe_train_merge_semantics(spark, sf_dir):
    """BPE invariants: BPE_ROUNDS rows, counts non-increasing is NOT
    guaranteed (a merge can create a new frequent pair) but every
    round's winning count must be positive and the merged symbol the
    concatenation of its parts; round 1's pair must equal the true
    argmax adjacent-pair count recomputed naively in Python."""
    from collections import Counter
    import re

    from dfs_w_mapreduce_spark.operators.pipeline import BPE_ROUNDS, q_bpe_train

    rows = sorted(q_bpe_train(spark, sf_dir).collect(), key=lambda r: r.round)
    assert [r.round for r in rows] == list(range(1, BPE_ROUNDS + 1))
    for r in rows:
        assert r.merged == r.pa + r.pb
        assert r.cnt > 0
    # naive recomputation of round 1
    texts = [
        r.text for r in load_table(spark, sf_dir, "documents").select("text").collect()
    ]
    counts: Counter = Counter()
    for t in texts:
        for w in t.lower().split():
            if not re.fullmatch(r"[a-z0-9]+", w):
                continue
            syms = list(w) + ["_"]
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += 1
    best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    assert (rows[0].pa, rows[0].pb) == best[0]
    assert rows[0].cnt == best[1]


def test_bpe_apply_compression_bounds(spark, sf_dir):
    """Encoding with learned merges can only shorten: for every source
    tokens_post <= tokens_pre, compression in (0, 1], and the total
    saving equals the freq-weighted merge mass (each applied merge
    removes exactly one token per application)."""
    from dfs_w_mapreduce_spark.operators.pipeline import q_bpe_apply

    rows = q_bpe_apply(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r.tokens_post <= r.tokens_pre
        assert 0 < r.compression <= 1
        assert r.n_words <= r.tokens_post  # every word >= 1 token


def test_quality_rank_ensemble_is_percent_rank(spark, sf_dir):
    """The histogram-join rank must equal the textbook percent_rank:
    recompute (strictly-lower)/(N-1) naively in Python over collected
    scores; monotone in score; keep fraction ~= 1 - RANK_KEEP_PCT."""
    from dfs_w_mapreduce_spark.operators.text_analysis import (
        RANK_KEEP_PCT,
        q_quality_rank_ensemble,
    )

    rows = q_quality_rank_ensemble(spark, sf_dir).collect()
    scores = sorted(r.score for r in rows)
    n = len(rows)
    import bisect

    for r in rows:
        expect = round(bisect.bisect_left(scores, r.score) / (n - 1), 6)
        assert r.pct_rank == expect, (r.doc_id, r.pct_rank, expect)
        assert r.keep == (r.pct_rank >= RANK_KEEP_PCT)
    kept = sum(r.keep for r in rows) / n
    assert 0.7 <= kept <= 0.9  # ~80% modulo ties at the cut


def test_merge_join_gate_and_dir_sizing(spark, sf_dir, tmp_path):
    """Pins the two 100x-probe findings: (a) the merge hint must
    actually defeat Catalyst's auto-broadcast (absence of a hint is
    not enough); (b) source_size() on directory-style parquet must sum
    the part files, not report the ~4KB dirent that mis-gated a 55MB
    table as broadcastable."""
    from dfs_w_mapreduce_spark.catalog import source_size
    from dfs_w_mapreduce_spark.operators.dedup import _merge_join

    small = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    probe = spark.range(1000).withColumnRenamed("id", "doc_id")
    hinted = probe.join(_merge_join(small, None), "doc_id")
    plan = hinted._jdf.queryExecution().sparkPlan().toString()
    assert "SortMergeJoin" in plan and "BroadcastHashJoin" not in plan
    # gated path at fixture scale: tiny source => explicit broadcast
    gated = probe.join(_merge_join(small, sf_dir), "doc_id")
    gplan = gated._jdf.queryExecution().sparkPlan().toString()
    assert "BroadcastHashJoin" in gplan
    # directory-style parquet sizing
    out = str(tmp_path / "documents.parquet")
    small.limit(200).repartition(4).write.mode("overwrite").parquet(out)
    import os

    dir_entry = os.path.getsize(out)
    summed = source_size(str(tmp_path), "documents")
    assert summed is not None and summed > dir_entry


def test_corpus_datasheet_consistency(spark, sf_dir):
    """Datasheet totals must reconcile with the raw table: sum of
    per-source docs = corpus docs; rates and shares in valid ranges;
    top_lang actually is a modal language for its source."""
    from dfs_w_mapreduce_spark.operators.admin import q_corpus_datasheet

    rows = q_corpus_datasheet(spark, sf_dir).collect()
    d = load_table(spark, sf_dir, "documents")
    assert sum(r.n_docs for r in rows) == d.count()
    modal = {
        (r.source, r.lang): r.n
        for r in d.groupBy("source", "lang").agg(F.count("*").alias("n")).collect()
    }
    for r in rows:
        assert 0 <= r.dup_rate < 1
        assert 0 < r.top_lang_share <= 1
        assert r.n_tokens >= r.n_docs
        src_max = max(v for (s, _), v in modal.items() if s == r.source)
        assert modal[(r.source, r.top_lang)] == src_max


def test_decontaminate_semantic_contained_in_pairs(spark, sf_dir):
    """Every flagged (corpus, bench) match must be a verified LSH
    pair at the threshold, and no flagged corpus id may itself be a
    benchmark id."""
    flagged = q_decontaminate_semantic(spark, sf_dir).collect()
    pairs = {
        tuple(sorted((r.vec_a, r.vec_b)))
        for r in banded_pair_scores(
            spark, sf_dir, digits=4, threshold=SEMDECON_T
        ).collect()
    }
    for r in flagged:
        assert r.corpus_id % SEMDECON_MOD != 0
        assert r.bench_id % SEMDECON_MOD == 0
        assert tuple(sorted((r.corpus_id, r.bench_id))) in pairs
        assert r.max_cosine >= SEMDECON_T
        assert r.n_hits >= 1


def test_stream_cdc_store_equals_one_shot(spark, sf_dir):
    """The live incremental chunk store must converge to EXACTLY the
    one-shot distinct-chunk set (same count, same total chars) and
    must have run incrementally (n_batches = min(3, n_docs)) — the
    idempotence property that makes per-batch digest anti-join a
    correct store-maintenance strategy."""
    from dfs_w_mapreduce_spark.operators.dedup import cdc_chunks
    from dfs_w_mapreduce_spark.streaming.windows import q_stream_cdc_store_live

    live = q_stream_cdc_store_live(spark, sf_dir).collect()[0]
    one_shot = (
        cdc_chunks(load_table(spark, sf_dir, "documents"))
        .select(F.md5("chunk").alias("h"), F.length("chunk").alias("l"))
        .groupBy("h")
        .agg(F.min("l").alias("l"))
        .agg(
            F.count("*").alias("n"),
            F.sum("l").alias("chars"),
        )
        .collect()[0]
    )
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert live.n_distinct_chunks == one_shot.n
    assert live.total_chunk_chars == one_shot.chars
    # empty source still fires one metadata-only micro-batch
    assert live.n_batches == max(min(3, n_docs), 1)


def test_chunk_placement_conservation(spark, sf_dir):
    """Replication-factor-3 accounting: total slot assignments are
    exactly 3x the chunk count, every chunk has exactly one primary,
    and a >=3-chunk document's chunks land on 3 DISTINCT nodes while a
    1-chunk document's slots all collapse onto one node (the
    reference's modular-arithmetic quirk, controller.go:101-121)."""
    from dfs_w_mapreduce_spark.operators.layout import (
        PLACE_CB,
        _placement_slots,
        q_chunk_placement,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    slots = _placement_slots(d).collect()
    placement = q_chunk_placement(spark, sf_dir).collect()
    assert sum(r.n_slots for r in placement) == 3 * len(slots)
    assert sum(r.n_primary for r in placement) == len(slots)
    n_chunks_by_doc = {}
    for r in slots:
        n_chunks_by_doc[r.doc_id] = n_chunks_by_doc.get(r.doc_id, 0) + 1
    for r in slots:
        distinct = len({r.s0, r.s1, r.s2})
        if n_chunks_by_doc[r.doc_id] >= 3:
            assert distinct == 3
        elif n_chunks_by_doc[r.doc_id] == 1:
            assert distinct == 1
    lens = {r.doc_id: len(r.text) for r in d.collect()}
    for doc_id, c in n_chunks_by_doc.items():
        assert c == max((lens[doc_id] + PLACE_CB - 1) // PLACE_CB, 1)


def test_recovery_plan_sender_receiver_rules(spark, sf_dir):
    """FindSender/FindReceiver invariants: a sender is never the dead
    node, a receiver never already holds the chunk, unrecoverable
    chunks are exactly the all-slots-on-dead ones, and the planned
    chunk total equals the count of affected chunks."""
    from dfs_w_mapreduce_spark.operators.layout import (
        DEAD_NODE,
        _placement_slots,
        q_recovery_plan,
    )

    plan = q_recovery_plan(spark, sf_dir).collect()
    dead = f"node-{DEAD_NODE}"
    for r in plan:
        if r.status == "copy":
            assert r.sender != dead and r.receiver != dead
            assert r.sender != r.receiver
        else:
            assert r.sender == "(none)" and r.receiver == "(none)"
    slots = _placement_slots(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ).collect()
    affected = [r for r in slots if DEAD_NODE in (r.s0, r.s1, r.s2)]
    lost = [r for r in affected if {r.s0, r.s1, r.s2} == {DEAD_NODE}]
    assert sum(r.n_chunks for r in plan) == len(affected)
    assert sum(r.n_chunks for r in plan if r.status == "unrecoverable") == len(lost)


def test_store_gc_refcount_exact(spark, sf_dir):
    """A reclaimable chunk must be referenced by NO retained document
    — recompute the reference sets directly and compare counts."""
    from dfs_w_mapreduce_spark.operators.dedup import cdc_chunks
    from dfs_w_mapreduce_spark.operators.layout import q_store_gc

    gc = q_store_gc(spark, sf_dir).collect()[0]
    refs = (
        cdc_chunks(load_table(spark, sf_dir, "documents"))
        .select(F.md5("chunk").alias("h"), (F.col("doc_id") % 10 != 0).alias("live"))
        .collect()
    )
    live_chunks = {r.h for r in refs if r.live}
    all_chunks = {r.h for r in refs}
    assert gc.n_chunks == len(all_chunks)
    assert gc.n_live_chunks == len(live_chunks)
    assert gc.n_reclaimable_chunks == len(all_chunks - live_chunks)


def test_gif_lzw_codec_roundtrip():
    """The GIF LZW pair must roundtrip arbitrary index streams —
    including single-symbol runs (the KwKwK case), streams long enough
    to cross the 6- and 7-bit width bumps, and streams that overflow
    the 4096-entry table (CLEAR + reset). Corrupt streams must raise,
    not return garbage."""
    import pytest as _pytest

    from dfs_w_mapreduce_spark.operators.multimodal import (
        _lzw_decode,
        _lzw_encode,
        build_gif,
        decode_gif,
    )

    for seq in (
        [0],
        [5] * 40,
        [i % 16 for i in range(23)],
        [(i * 7 + i * i) % 16 for i in range(6000)],
    ):
        assert _lzw_decode(_lzw_encode(seq, 4), 4) == seq
    frames = decode_gif(build_gif(6, 5, 3, 42))
    assert [f["delay_cs"] for f in frames] == [(42 + f) % 10 + 2 for f in range(3)]
    with _pytest.raises(ValueError):
        decode_gif(b"NOTAGIF" + bytes(20))
    good = bytearray(build_gif(6, 5, 1, 7))
    good[-10] ^= 0xFF  # flip a byte inside the LZW stream
    with _pytest.raises(ValueError):
        decode_gif(bytes(good))


def test_shuffle_epochs_permutation_properties(spark, sf_dir):
    """Each epoch's positions must be an exact permutation of
    0..n-1, the two epochs must order the corpus differently, and the
    result must be reproducible run to run (seeded, not random)."""
    from dfs_w_mapreduce_spark.operators.pipeline import (
        SHUFFLE_EPOCHS,
        q_shuffle_epochs,
    )

    rows = q_shuffle_epochs(spark, sf_dir).collect()
    n = load_table(spark, sf_dir, "documents").count()
    by_epoch = {}
    for r in rows:
        by_epoch.setdefault(r.epoch, {})[r.doc_id] = r.pos
    assert set(by_epoch) == set(range(SHUFFLE_EPOCHS))
    for epoch, posmap in by_epoch.items():
        assert sorted(posmap.values()) == list(range(n))
    order0 = sorted(by_epoch[0], key=by_epoch[0].get)
    order1 = sorted(by_epoch[1], key=by_epoch[1].get)
    assert order0 != order1
    again = {
        (r.epoch, r.doc_id): r.pos for r in q_shuffle_epochs(spark, sf_dir).collect()
    }
    assert all(again[(e, d)] == p for e, m in by_epoch.items() for d, p in m.items())


def test_kmeans_lloyd_matches_python_replica(spark, sf_dir):
    """Replicate Lloyd's with the exact same rounding discipline in
    plain Python (no Spark, no DuckDB) and require identical cluster
    memberships and counts — a third independent implementation. Also
    pins the partition property: every vector lands in exactly one
    cluster."""
    from dfs_w_mapreduce_spark.operators.similarity import (
        KMEANS_K,
        KMEANS_ROUNDS,
        q_kmeans_lloyd,
    )

    e = load_table(spark, sf_dir, "embeddings").collect()
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in e}
    cents = {i: vecs[i][:] for i in sorted(vecs) if i < KMEANS_K}

    def assign(cs):
        out = {}
        for vid, v in vecs.items():
            x2 = sum(a * a for a in v)
            best = None
            for cid in sorted(cs):
                c = cs[cid]
                d2 = round(x2 - 2 * sum(a * b for a, b in zip(v, c))
                           + sum(b * b for b in c), 6) + 0.0
                if best is None or (d2, cid) < best[:2]:
                    best = (d2, cid)
            out[vid] = best[1]
        return out

    for _ in range(KMEANS_ROUNDS):
        a = assign(cents)
        sums: dict = {}
        for vid, cid in a.items():
            acc = sums.setdefault(cid, [0, [0.0] * len(vecs[vid])])
            acc[0] += 1
            for p, x in enumerate(vecs[vid]):
                acc[1][p] += round(x, 10)
        for cid in cents:
            if cid in sums:
                n, s = sums[cid]
                cents[cid] = [round(si / n, 8) + 0.0 for si in s]
    expected = assign(cents)

    rows = q_kmeans_lloyd(spark, sf_dir).collect()
    assert sum(r.n_members for r in rows) == len(vecs)
    exp_counts: dict = {}
    exp_idsum: dict = {}
    for vid, cid in expected.items():
        exp_counts[cid] = exp_counts.get(cid, 0) + 1
        exp_idsum[cid] = exp_idsum.get(cid, 0) + vid
    for r in rows:
        assert r.n_members == exp_counts.get(r.cluster, 0)
        assert r.id_sum == exp_idsum.get(r.cluster, 0)


def test_heartbeat_liveness_semantics(spark, sf_dir):
    """Death-declaration invariants: a dead node's death_scan is an
    EMPTY scan strictly after its first beat and at most one past its
    last beat; a live node beat in every scan up to the fleet horizon.
    Recomputed from the raw events."""
    from dfs_w_mapreduce_spark.operators.layout import (
        HEARTBEAT_SCAN_US,
        q_heartbeat_liveness,
    )

    rows = q_heartbeat_liveness(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr(
            f"unix_micros(cast(ts as timestamp)) div {HEARTBEAT_SCAN_US}"
        ).alias("scan")
    ).collect()
    beats: dict = {}
    for r in ev:
        beats.setdefault(r.user_id, set()).add(r.scan)
    horizon = max(s for ss in beats.values() for s in ss)
    assert len(rows) == len(beats)
    for r in rows:
        ss = beats[r.node]
        assert r.first_scan == min(ss) and r.last_scan == max(ss)
        if r.dead:
            assert r.death_scan not in ss
            assert min(ss) < r.death_scan <= max(ss) + 1
            assert all(s in ss for s in range(min(ss), r.death_scan))
        else:
            assert r.death_scan is None
            assert ss == set(range(min(ss), horizon + 1))


def test_placement_rebalance_minimal_movement(spark, sf_dir):
    """The rendezvous property itself: HRW movement on N->N+1 must be
    well under mod-N movement, HRW close to the theoretical 1/(N+1),
    mod-N remapping the majority of chunks."""
    from dfs_w_mapreduce_spark.operators.layout import (
        PLACE_NODES,
        q_placement_rebalance,
    )

    r = q_placement_rebalance(spark, sf_dir).collect()[0]
    assert r.hrw_moved + r.mod_moved <= 2 * r.n_chunks
    assert r.hrw_pct < r.mod_pct
    assert abs(r.hrw_pct - 1 / (PLACE_NODES + 1)) < 0.05
    assert r.mod_pct > 0.5


def test_kmv_sketch_properties(spark, sf_dir):
    """KMV invariants: the ALL row's merge law holds (merge_exact
    TRUE), sketch_size = min(k, exact_distinct), a saturated sketch's
    estimate is within 30% of truth at k=64, and an unsaturated
    sketch's estimate IS the exact count."""
    from dfs_w_mapreduce_spark.operators.sketches import KMV_K, q_kmv_distinct

    rows = q_kmv_distinct(spark, sf_dir).collect()
    all_row = [r for r in rows if r.source == "ALL"]
    assert len(all_row) == 1 and all_row[0].merge_exact
    for r in rows:
        assert r.sketch_size == min(KMV_K, r.exact_distinct)
        if r.sketch_size < KMV_K:
            assert r.kmv_est == r.exact_distinct
        else:
            assert abs(r.kmv_est - r.exact_distinct) <= 0.3 * r.exact_distinct


def test_embedding_outliers_consistent_with_kmeans(spark, sf_dir):
    """The outlier pass must cluster identically to kmeans_lloyd
    (same per-cluster membership counts), flag only above-threshold
    members, and every cluster's flagged fraction must be a strict
    minority (Chebyshev at 2 sigma bounds it below 25%)."""
    from dfs_w_mapreduce_spark.operators.similarity import (
        q_embedding_outliers,
        q_kmeans_lloyd,
    )

    outs = {r.cluster: r for r in q_embedding_outliers(spark, sf_dir).collect()}
    kms = {r.cluster: r for r in q_kmeans_lloyd(spark, sf_dir).collect()}
    assert set(outs) == set(kms)
    for cid, r in outs.items():
        assert r.n_members == kms[cid].n_members
        assert 0 <= r.n_outliers <= 0.25 * r.n_members
        assert r.max_d2 >= 0 and r.thr_d2 >= 0
        if r.n_outliers > 0:
            assert r.max_d2 > r.thr_d2
